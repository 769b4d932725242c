package graft.operators

import graft.SparkSessionSpec
import org.scalatest.funsuite.AnyFunSuite

/** Pins of the q259 Page–Hinkley semantics: exact agreement with a
  * plain sequential reference, alarm on a sustained shift, silence
  * on the stable prefix, and self-adaptation (contrast with q150's
  * fixed-baseline CUSUM). */
class PageHinkleySpec extends AnyFunSuite with SparkSessionSpec {

  /** Hourly counts -> an events frame with that many rows per
    * hour. */
  private def eventsOf(counts: Seq[Int]) = {
    import spark.implicits._
    counts.zipWithIndex.flatMap { case (n, h) =>
      (0 until n).map(i => ("a", h.toLong * 3600000L + i, 1L, 0.0))
    }.toDF("event_type", "ts_ms", "user_id", "value")
  }

  /** The sequential reference: m_t and the prefix-min identity. */
  private def reference(counts: Seq[Int])
      : Seq[(Double, Boolean)] = {
    val n = counts.length
    val sx = counts.map(_.toLong).sum
    val sq = counts.map(c => c.toLong * c).sum
    val sigma = math.sqrt((n.toLong * sq - sx * sx).toDouble) / n
    var rsum = 0L
    var m = 0.0
    var minM = Double.MaxValue
    counts.zipWithIndex.map { case (c, i) =>
      rsum += c
      val dev = c.toDouble - rsum.toDouble / (i + 1) -
        EventsQueries.PhDelta * sigma
      m += dev
      minM = math.min(minM, m)
      val ph = m - minM
      (ph, ph > EventsQueries.PhLambda * sigma)
    }
  }

  test("q259 matches the sequential reference bit-for-bit and " +
      "alarms on a sustained level shift but not on the stable " +
      "prefix") {
    val counts = Seq.fill(20)(10) ++ Seq.fill(10)(30)
    val out = EventsQueries.pageHinkley(eventsOf(counts)).collect()
      .sortBy(_.getAs[Long]("hour_id"))
    val ref = reference(counts)
    assert(out.length == 30)
    for ((r, i) <- out.zipWithIndex) {
      assert(r.getAs[Double]("ph") == ref(i)._1,
        s"ph mismatch at hour $i")
      assert(r.getAs[Boolean]("alarm") == ref(i)._2,
        s"alarm mismatch at hour $i")
    }
    assert(!out.take(20).exists(_.getAs[Boolean]("alarm")),
      "the stable prefix must stay silent")
    assert(out.drop(20).exists(_.getAs[Boolean]("alarm")),
      "the sustained shift must alarm")
  }

  test("q259 adapts to its own level: a constant series never " +
      "alarms regardless of its magnitude") {
    for (level <- Seq(1, 1000)) {
      val out = EventsQueries.pageHinkley(eventsOf(Seq.fill(12)(level)))
        .collect()
      assert(out.forall(!_.getAs[Boolean]("alarm")),
        s"constant level $level must not alarm")
      assert(out.forall(_.getAs[Double]("ph") == 0.0))
    }
  }

  test("the q259 plan: windows are type-partitioned (no single-" +
      "partition exchange), stats join broadcasts") {
    val plan = EventsQueries.pageHinkley(eventsOf(Seq(1, 2, 3)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"unpartitioned window in:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      "the sigma join must broadcast")
  }
}
