package graft.operators

import graft.SparkSessionSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._

  private def mortonRef(a: Long, b: Long): Long = {
    // bit-by-bit reference implementation
    var z = 0L
    for (i <- 0 until 31) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("compaction rewrites small files near the target size") {
    // simulate a streaming sink's small-files problem: one table
    // scattered across 64 tiny files
    val src = java.nio.file.Files.createTempDirectory("compact-src").toString
    spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .repartition(64).write.mode("overwrite").parquet(src)
    val scattered = spark.read.parquet(src)
    def files(dir: String) = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files(src).length == 64)
    val inputBytes = files(src).map(_.length()).sum
    val target = inputBytes / 4 // aim for ~4 output files
    val out = java.nio.file.Files.createTempDirectory("compact-out").toString
    val n = Layout.compactTo(scattered, out, target)
    val outFiles = files(out)
    assert(outFiles.length == n)
    // estimate is plan-stats-based: partition count lands in a sane
    // band around the 4-file aim, never back at 64 and never 1
    assert(n >= 2 && n <= 12, s"unexpected partition count $n")
    // rewrite is lossless
    assert(spark.read.parquet(out).count() == scattered.count())
    // and files are size-balanced (round-robin): max ≤ 3× min
    val sizes = outFiles.map(_.length())
    assert(sizes.max <= 3 * sizes.min,
      s"unbalanced output files: ${sizes.toSeq}")
  }

  test("zValue matches a bit-by-bit Morton reference") {
    val rnd = new scala.util.Random(11)
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L),
      ((1L << 31) - 1, (1L << 31) - 1)) ++
      Seq.fill(100)((rnd.nextInt(Int.MaxValue).toLong,
        rnd.nextInt(Int.MaxValue).toLong))
    val got = pairs.toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == pairs.map { case (a, b) => mortonRef(a, b) })
  }

  test("z-order layout bounds BOTH dimensions per partition") {
    // 64x64 grid; z-layout must give each partition a tight bounding
    // box in (a, b), where sorting by `a` alone leaves `b` unbounded
    val grid = (for (a <- 0 until 64; b <- 0 until 64)
      yield (a.toLong, b.toLong)).toDF("a", "b")
    // one aggregate per layout yields both pruning metrics: the
    // bounding-box area sum and the worst per-partition b-range
    def boxStats(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("a") - min("a")).as("ra"), (max("b") - min("b")).as("rb"))
        .agg(sum(expr("(ra + 1) * (rb + 1)")), max("rb"))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val (zArea, zMaxB) = boxStats(Layout.zorderLayout(grid, "a", "b", 16))
    val (aArea, aMaxB) = boxStats(grid.repartitionByRange(16, col("a"))
      .sortWithinPartitions(col("a")))
    // min-max pruning on `b` is what z-order buys: column-sorted
    // partitions span (nearly) all of b, z-ordered ones a fraction
    assert(zMaxB < aMaxB,
      s"z layout b-range $zMaxB not tighter than column sort $aMaxB")
    assert(zArea <= aArea)
  }

  test("rendezvous placement: scale-out moves ~1/(k+1) of keys (vs " +
      "~k/(k+1) for modulo), every mover lands on the NEW shard, and " +
      "the assignment is balanced") {
    import spark.implicits._
    val n = 4096
    val docs = (0L until n.toLong).toDF("doc_id")
    val p = Layout.shardPlacement(docs).collect()
    assert(p.length == n)
    val moved = p.count(_.getAs[Boolean]("moved"))
    val modMoved = p.count(_.getAs[Boolean]("mod_moved"))
    // rendezvous: only keys whose new argmax IS the added shard move
    p.filter(_.getAs[Boolean]("moved")).foreach(r =>
      assert(r.getAs[Long]("shard_b") == Layout.ShardsAfter - 1,
        s"mover ${r.getAs[Long]("doc_id")} went to an old shard"))
    val movedFrac = moved.toDouble / n
    val modFrac = modMoved.toDouble / n
    info(f"rendezvous moved $movedFrac%.3f vs modulo $modFrac%.3f")
    // expectation 1/17 ≈ 0.059 vs 16/17 ≈ 0.94
    assert(movedFrac < 0.12, s"rendezvous moved $movedFrac")
    assert(modFrac > 0.8, s"modulo moved only $modFrac")
    // balance: no shard above 2x the mean under either shard count
    Seq("shard_a", "shard_b").foreach { c =>
      val sizes = p.groupBy(_.getAs[Long](c)).map(_._2.length)
      val mean = n.toDouble / (if (c == "shard_a") Layout.ShardsBefore
        else Layout.ShardsAfter)
      assert(sizes.max < 2 * mean, s"$c max ${sizes.max} vs mean $mean")
    }
  }

  test("consistent-hash ring: well-formed sorted ring, movers land " +
      "ONLY on the added shard, movement near the 1/(k+1) arc mass, " +
      "and the wrap key maps to the ring head") {
    import spark.implicits._
    // ring table well-formed: shards x vnodes points, sorted, in-range
    val pts = Layout.ringPoints(Layout.ShardsBefore)
    assert(pts.length == Layout.ShardsBefore * Layout.RingVnodes)
    assert(pts == pts.sorted)
    pts.foreach { case (p, s) =>
      assert(p >= 0 && p < 1048576 && s >= 0 && s < Layout.ShardsBefore)
    }
    val n = 4096
    val docs = (0L until n.toLong).toDF("doc_id")
    val r = Layout.ringPlacement(docs).collect()
    assert(r.length == n)
    // the consistent-hashing guarantee, EXACT: a mover's new shard is
    // the added one (its key fell on an arc the new vnodes claimed)
    r.filter(_.getAs[Boolean]("moved")).foreach(row =>
      assert(row.getAs[Long]("ring_b") == Layout.ShardsAfter - 1,
        s"mover ${row.getAs[Long]("doc_id")} went to an old shard"))
    val movedFrac = r.count(_.getAs[Boolean]("moved")).toDouble / n
    info(f"ring moved $movedFrac%.3f (arc-mass expectation ~1/17)")
    assert(movedFrac > 0.0, "scale-out moved nothing — ring inert")
    assert(movedFrac < 0.2, s"ring moved $movedFrac")
    // wrap: a key hashing past the last ring point belongs to the
    // ring HEAD's shard (find one by replaying the exact hash)
    val K = graft.operators.Sampling.HashMult
    def h(id: Long) = (((id % 1048576L) * K) / 1048576L) % 1048576L
    val maxPt = pts.map(_._1).max
    val wrapId = (0L until 100000L).find(h(_) > maxPt)
    wrapId.foreach { id =>
      val one = Layout.ringPlacement(Seq(id).toDF("doc_id")).collect()(0)
      assert(one.getAs[Long]("ring_a") == pts.head._2.toLong,
        s"wrap key $id missed the ring head")
    }
    assert(wrapId.nonEmpty, "no wrap key below 100k ids — widen search")
  }
}
