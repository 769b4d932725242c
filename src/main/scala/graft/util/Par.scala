package graft.util

/** Overlap independent driver-submitted Spark jobs (optimization
  * guide §2.6): the streaming harnesses write their ingest waves as
  * 3–4 INDEPENDENT filter+coalesce(1) parquet jobs whose tails leave
  * the box idle when run sequentially. Running them from one thread
  * each lets the scheduler back-fill — the wave files themselves are
  * byte-for-byte the files the sequential loop wrote (same filter,
  * same single-file coalesce, same source row order), only the wall
  * clock changes.
  *
  * Failure contract: every job runs to completion (no cancellation
  * cascade — Spark jobs are independent); the FIRST throwable, if
  * any, is rethrown on the calling thread so a failed wave write
  * fails the query exactly like the sequential loop did.
  *
  * Concurrency is BOUNDED (guide §2.6: "2-3 jobs in flight is
  * plenty: enough to fill the tail, not so many that they fight for
  * executors"). The r17 driver run died mid-test-suite with
  * "SparkContext has been shutdown" right after this util landed
  * unbounded: N concurrent wave-write jobs on the shared local[4]
  * test session can exhaust the executor heap, and a fatal error in
  * a local-mode executor thread takes the whole context down. Each
  * element still gets a FRESH thread created by the CALLING thread
  * (never a shared pool), so Spark's InheritableThreadLocal job
  * properties — description, job group, the cloned session — are
  * inherited from the caller at the moment of the call. */
object Par {
  /** Max wave jobs in flight; small per the §2.6 rule and safe on a
    * local[4] test session. */
  val MaxConcurrent = 2

  def foreach[T](xs: Iterable[T])(f: T => Unit): Unit = {
    val seq = xs.toSeq
    if (seq.sizeIs <= 1) { seq.foreach(f); return }
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val gate = new java.util.concurrent.Semaphore(MaxConcurrent)
    val threads = seq.map { x =>
      new Thread(() =>
        try f(x)
        catch { case t: Throwable => failure.compareAndSet(null, t) }
        finally gate.release())
    }
    // acquire on the calling thread BEFORE start so no more than
    // MaxConcurrent threads are ever runnable at once
    threads.foreach { t => gate.acquire(); t.start() }
    threads.foreach(_.join())
    val t = failure.get()
    if (t != null) throw t
  }
}
