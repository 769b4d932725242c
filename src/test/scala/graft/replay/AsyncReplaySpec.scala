package graft.replay

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

/** R7/R8 (+ R5 in its real form): the asynchronous producer path —
  * backpressure semaphore, per-partition async writer with record
  * TTL, and the genuine un-acked low-watermark tracker. */
class AsyncReplaySpec extends AnyFunSuite {

  private val fixture = "src/test/resources/trips_tiny.jsonl"
  private lazy val fixtureLines =
    scala.io.Source.fromFile(fixture, "UTF-8").getLines().toSeq
  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("watermark tracker advances only past the un-acked low watermark (R5)") {
    val t = new WatermarkTracker
    Seq(100L, 200L, 300L).foreach(t.track)
    assert(t.watermark == Long.MinValue) // nothing acked yet
    t.complete(200L) // 100 still in flight -> no advance
    assert(t.watermark == Long.MinValue && t.inFlightCount == 2)
    t.complete(100L) // oldest acked -> watermark = 100
    assert(t.watermark == 100L)
    t.complete(300L) // nothing in flight -> watermark = 300
    assert(t.watermark == 300L)
    // duplicate timestamps: both must ack before the wm passes them
    Seq(400L, 400L, 500L).foreach(t.track)
    t.complete(400L)
    assert(t.watermark == 400L) // 400 <= remaining {400, 500} head
    t.complete(500L)
    assert(t.watermark == 400L) // 400 still in flight blocks 500
    t.complete(400L)
    assert(t.watermark == 500L)
  }

  test("watermark tracker invariants hold under random interleavings (property)") {
    // deterministic pseudo-random interleavings modelling the real
    // producer: submissions arrive in non-decreasing event time (the
    // replay reader is event-time-ordered, like the reference's
    // trip_id-ordered stream) while completions ack in ARBITRARY
    // order (async writers race). After every step: (1) the watermark
    // never exceeds an un-acked event's timestamp, (2) the watermark
    // is monotone non-decreasing.
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val t = new WatermarkTracker
      val inFlight = scala.collection.mutable.ArrayBuffer.empty[Long]
      var lastWm = Long.MinValue
      var clock = 0L
      for (_ <- 1 to 200) {
        if (inFlight.isEmpty || rnd.nextBoolean()) {
          clock += rnd.nextInt(5)
          t.track(clock); inFlight += clock
        } else {
          val i = rnd.nextInt(inFlight.size)
          val ts = inFlight.remove(i)
          t.complete(ts)
        }
        val wm = t.watermark
        val minInFlight = inFlight.minOption
        assert(minInFlight.forall(wm <= _),
          s"watermark $wm passed un-acked event $minInFlight")
        assert(wm >= lastWm, s"watermark regressed $lastWm -> $wm")
        lastWm = wm
      }
    }
  }

  test("backpressure semaphore bounds outstanding records (R7)") {
    val dir = tmp("async-bp")
    val gate = new CountDownLatch(1)
    // writer whose (single) partition thread is blocked behind the gate
    val w = new AsyncPartitionFileWriter(dir, partitions = 1,
      execFactory = () => {
        val e = Executors.newSingleThreadExecutor()
        e.execute(() => gate.await())
        e
      })
    val sem = new BackpressureSemaphore(2)
    val submitted = new java.util.concurrent.atomic.AtomicInteger(0)
    val producer = new Thread(() => (1 to 5).foreach { i =>
      sem.acquire()
      submitted.incrementAndGet()
      w.addRecord(0, s"""{"n": $i}""").whenComplete((_, _) => sem.release())
    })
    producer.start()
    // the producer must stall at exactly maxOutstanding submissions
    Thread.sleep(300)
    assert(submitted.get() == 2, "producer was not backpressured at 2")
    assert(sem.outstanding == 2)
    gate.countDown() // writer drains -> permits release -> producer finishes
    producer.join(5000)
    assert(!producer.isAlive && submitted.get() == 5)
    w.close()
    assert(Files.readAllLines(
      Paths.get(dir, "part-00000-00000.jsonl")).size() == 5)
    assert(sem.outstanding == 0)
  }

  test("records queued past the TTL fail instead of being written (R8)") {
    val dir = tmp("async-ttl")
    var clock = 0L
    val gate = new CountDownLatch(1)
    val w = new AsyncPartitionFileWriter(dir, partitions = 1, ttlMs = 1000L,
      now = () => clock,
      execFactory = () => {
        val e = Executors.newSingleThreadExecutor()
        e.execute(() => gate.await())
        e
      })
    val f = w.addRecord(0, """{"n": 1}""") // enqueued at clock=0
    clock = 1001L // ages out in the queue
    gate.countDown()
    val err = intercept[java.util.concurrent.ExecutionException] {
      f.get(5, TimeUnit.SECONDS)
    }
    assert(err.getCause.isInstanceOf[java.util.concurrent.TimeoutException])
    val f2 = w.addRecord(0, """{"n": 2}""") // fresh record still writes
    assert(f2.get(5, TimeUnit.SECONDS) != null)
    w.close()
    val lines = Files.readAllLines(Paths.get(dir, "part-00000-00000.jsonl"))
    assert(lines.size() == 1 && lines.get(0).contains("\"n\": 2"))
  }

  test("async populate writes the same trip lines as sync; real low-watermark lines") {
    val in = tmp("async-pop-in")
    Files.writeString(Paths.get(in, "a.jsonl"),
      fixtureLines.mkString("", "\n", "\n"))
    def tripLines(dir: String): Seq[String] =
      (0 until 3).flatMap(i => Files.readAllLines(
          Paths.get(dir, f"part-$i%05d-00000.jsonl")).toArray.map(_.toString))
        .filter(_.contains("\"trip\"")).sorted

    val outSync = tmp("async-pop-sync")
    new StreamPopulator(in, outSync, partitions = 3, speedup = 1e12,
      sleep = _ => (), statsEveryMs = Long.MaxValue).populate()
    val outAsync = tmp("async-pop-async")
    val pop = new StreamPopulator(in, outAsync, partitions = 3,
      speedup = 1e12, sleep = _ => (), statsEveryMs = Long.MaxValue,
      maxOutstanding = 4)
    val (events, skipped) = pop.populate()
    assert(events == 15 && skipped == 1 && pop.failedWrites == 0)
    assert(tripLines(outAsync) == tripLines(outSync))
    // the final watermark is broadcast to every partition and equals
    // the low watermark of the fully-acked stream = max event time
    val maxTs = fixtureLines.flatMap(ReplayJson.timestampOf).max
    (0 until 3).foreach { i =>
      val lines = Files.readAllLines(
        Paths.get(outAsync, f"part-$i%05d-00000.jsonl"))
      val last = lines.get(lines.size() - 1)
      assert(last.contains("\"watermark\""))
      assert(last.contains(ReplayJson.toIso(maxTs)))
    }
  }
}
