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
  * fails the query exactly like the sequential loop did. */
object Par {
  def foreach[T](xs: Iterable[T])(f: T => Unit): Unit = {
    val seq = xs.toSeq
    if (seq.sizeIs <= 1) { seq.foreach(f); return }
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val threads = seq.map { x =>
      new Thread(() =>
        try f(x)
        catch { case t: Throwable => failure.compareAndSet(null, t) })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val t = failure.get()
    if (t != null) throw t
  }
}
