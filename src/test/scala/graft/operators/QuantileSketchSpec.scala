package graft.operators

import graft.SparkSessionSpec
import org.apache.spark.sql.graft.MrlSketch
import org.scalatest.funsuite.AnyFunSuite

class QuantileSketchSpec extends AnyFunSuite with SparkSessionSpec {

  private def rankOf(sorted: Array[Double], v: Double): Double =
    sorted.count(_ <= v).toDouble / sorted.length

  test("sketch rank error stays within the deterministic bound on " +
      "uniform, skewed, sorted-adversarial and few-distinct data " +
      "(k=1024, n up to 200k)") {
    val rnd = new scala.util.Random(42)
    val datasets = Seq(
      "uniform" -> Array.fill(200000)(rnd.nextDouble()),
      "pareto" -> Array.fill(100000)(
        math.pow(1.0 - rnd.nextDouble(), -1.5)),
      "sorted" -> Array.tabulate(150000)(_.toDouble),
      "reverse" -> Array.tabulate(150000)(i => (150000 - i).toDouble),
      "fewdistinct" -> Array.fill(100000)(rnd.nextInt(10).toDouble))
    for ((name, xs) <- datasets) {
      val s = new MrlSketch(1024)
      xs.foreach(s.update)
      val sorted = xs.sorted
      for (p <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
        val est = s.quantile(p)
        val rLe = rankOf(sorted, est)
        val rLt = sorted.count(_ < est).toDouble / sorted.length
        assert(rLe >= p - 0.03 && rLt <= p + 0.03,
          s"$name p=$p est=$est rankLe=$rLe rankLt=$rLt")
      }
    }
  }

  test("merge trees: splitting the data into 16 shards, merging in " +
      "forward, reverse and pairwise-tree order, keeps every " +
      "estimate within the bound (the distributed-aggregation " +
      "contract: task order must not matter for correctness)") {
    val rnd = new scala.util.Random(7)
    val xs = Array.fill(160000)(rnd.nextGaussian() * 100)
    val sorted = xs.sorted
    val shards = xs.grouped(10000).toSeq
    def freshShards: Seq[MrlSketch] = shards.map { sh =>
      val s = new MrlSketch(1024)
      sh.foreach(s.update)
      s
    }
    def check(s: MrlSketch, how: String): Unit = {
      assert(s.count == xs.length, s"$how count")
      for (p <- Seq(0.1, 0.5, 0.9)) {
        val est = s.quantile(p)
        val rLe = rankOf(sorted, est)
        val rLt = sorted.count(_ < est).toDouble / sorted.length
        assert(rLe >= p - 0.03 && rLt <= p + 0.03, s"$how p=$p")
      }
    }
    val fwd = freshShards
    val a = fwd.head; fwd.tail.foreach(a.merge); check(a, "forward")
    val rev = freshShards.reverse
    val b = rev.head; rev.tail.foreach(b.merge); check(b, "reverse")
    var tree = freshShards
    while (tree.size > 1) {
      tree = tree.grouped(2).map { g =>
        if (g.size == 2) { g(0).merge(g(1)); g(0) } else g(0)
      }.toSeq
    }
    check(tree.head, "pairwise")
  }

  test("serialization roundtrip preserves count, levels and every " +
      "estimate bit-for-bit; buffer size is O(k log n), not O(n)") {
    val rnd = new scala.util.Random(3)
    val s = new MrlSketch(1024)
    (1 to 500000).foreach(_ => s.update(rnd.nextDouble() * 1e6))
    val bytes = s.serialize()
    // 500k doubles raw = 4 MB; the sketch must be far smaller
    assert(bytes.length < 200000, s"buffer ${bytes.length} bytes")
    val back = MrlSketch.deserialize(bytes)
    assert(back.count == s.count)
    for (p <- Seq(0.05, 0.5, 0.95))
      assert(back.quantile(p) == s.quantile(p), s"p=$p")
  }

  test("graded q337 shape: per-type counts exact, every rank-error " +
      "boolean TRUE on the events fixture") {
    val events = EventsQueries.events(spark, "/root/testdata/sf0.001")
    val rows = RelationalQueries.typeQuantileSketch(events).collect()
    assert(rows.nonEmpty)
    val exact = events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_events") ==
        exact(r.getAs[String]("event_type")))
      Seq("p10_ok", "p50_ok", "p90_ok", "p99_ok").foreach(c =>
        assert(r.getAs[Boolean](c), s"${r.getString(0)} $c"))
    }
  }
}
