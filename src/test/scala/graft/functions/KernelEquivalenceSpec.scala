package graft.functions

import graft.SparkSessionSpec
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd kernels (MinHashSignature, SimHashExpr, DotProduct,
  * HyperplaneBands) replaced interpreted higher-order-function
  * formulations that the DuckDB oracle mirrors term-for-term. These
  * tests pin kernel == fold-formulation on randomized inputs, so any
  * future kernel edit that drifts from the oracle arithmetic fails
  * here first. */
class KernelEquivalenceSpec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private lazy val hashArrays: Seq[Seq[Long]] =
    (1 to 50).map(_ => (1 to rnd.nextInt(120) + 1)
      .map(_ => rnd.nextLong().abs % (1L << 60)))

  test("MinHashSignature kernel == per-permutation fold formulation") {
    val df = hashArrays.toDF("hashes")
    val foldSig = array(Dedup.perms.map { case (a, b) =>
      array_min(transform(col("hashes"),
        x => (lit(a) * (x % Dedup.P) + lit(b)) % Dedup.P))
    }: _*)
    val rows = df.select(
      Dedup.signature(col("hashes")).as("kernel"),
      foldSig.as("fold")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("SimHashExpr kernel == per-bit fold formulation") {
    val df = hashArrays.toDF("hs")
    val foldSim = (0 until TextAnalysis.SimHashBits).map { b =>
      when(aggregate(transform(col("hs"),
        x => (shiftright(x, b) % 2) * 2L - 1L), lit(0L),
        (acc, x) => acc + x) > 0, 1L << b).otherwise(0L)
    }.reduce(_ + _)
    val rows = df.select(
      TextAnalysis.simhashFromHashes(col("hs")).as("kernel"),
      foldSim.as("fold")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("Digest60Array kernel == per-element conv(md5) formulation") {
    val docs = (1 to 40).map(_ =>
      (1 to rnd.nextInt(30) + 1).map(_ =>
        rnd.alphanumeric.take(rnd.nextInt(20) + 1).mkString))
    val df = docs.toDF("ss")
    val rows = df.select(
      Dedup.digest60Array(col("ss")).as("kernel"),
      transform(col("ss"), s => Dedup.digest60(s)).as("fold")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("RollingHashes kernel == per-gram from-scratch fold formulation") {
    val texts = (1 to 40).map(_ =>
      rnd.alphanumeric.take(rnd.nextInt(60) + 8).mkString)
    val (k, b, m) = (8, 131L, 2147483647L)
    val df = texts.toDF("text")
    // from-scratch: each gram folds (a*B + charCode) % M from 0
    val foldExpr = org.apache.spark.sql.functions.expr(
      s"""transform(sequence(0, length(text) - $k),
         |  i -> aggregate(
         |    transform(sequence(1, $k), j -> ascii(substr(text, i + j, 1))),
         |    0L, (a, c) -> (a * $b + CAST(c AS BIGINT)) % $m))""".stripMargin)
    val kernel = Bridge.column(org.apache.spark.sql.graft.RollingHashes(
      Bridge.expression(col("text")), k, b, m))
    df.select(kernel.as("k"), foldExpr.as("f")).collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("RollingHashes stride samples exactly positions 0, s, 2s, ...") {
    val texts = (1 to 40).map(_ =>
      rnd.alphanumeric.take(rnd.nextInt(60) + 8).mkString)
    val (k, b, m, s) = (8, 131L, 2147483647L, 3)
    val df = texts.toDF("text")
    val all = Bridge.column(org.apache.spark.sql.graft.RollingHashes(
      Bridge.expression(col("text")), k, b, m))
    val strided = Bridge.column(org.apache.spark.sql.graft.RollingHashes(
      Bridge.expression(col("text")), k, b, m, s))
    df.select(all.as("a"), strided.as("s")).collect().foreach { r =>
      val expect = r.getSeq[Long](0).zipWithIndex
        .collect { case (h, i) if i % s == 0 => h }
      assert(r.getSeq[Long](1) == expect)
    }
  }

  test("LongestRun kernel == struct-state fold; sorted == max multiplicity") {
    val arrays = (1 to 60).map(_ =>
      Seq.fill(rnd.nextInt(40) + 1)(s"w${rnd.nextInt(5)}"))
    arrays.foreach { a =>
      def runOf(xs: Seq[String]): Long = {
        var best = 1L; var run = 1L
        xs.sliding(2).foreach {
          case Seq(p, c) =>
            if (p == c) { run += 1; best = math.max(best, run) } else run = 1L
          case _ => ()
        }
        best
      }
      val df = Seq(Tuple1(a)).toDF("w")
      val kernel = df.select(
        Bridge.column(org.apache.spark.sql.graft.LongestRun(
          Bridge.expression(col("w")), sortFirst = false)),
        Bridge.column(org.apache.spark.sql.graft.LongestRun(
          Bridge.expression(col("w")), sortFirst = true))).collect()(0)
      assert(kernel.getLong(0) == runOf(a))
      assert(kernel.getLong(1) ==
        a.groupBy(identity).values.map(_.size).max.toLong)
    }
  }

  test("TokenCounts kernel == explode + groupBy count") {
    val arrays = (1 to 40).map(_ =>
      Seq.fill(rnd.nextInt(50) + 1)(s"t${rnd.nextInt(8)}"))
    arrays.foreach { a =>
      val df = Seq(Tuple1(a)).toDF("w")
      val pairs = df.select(explode(
          Bridge.column(org.apache.spark.sql.graft.TokenCounts(
            Bridge.expression(col("w"))))).as("tc"))
        .select(col("tc.term"), col("tc.tf"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expect = a.groupBy(identity).map { case (t, xs) =>
        t -> xs.size.toLong }
      assert(pairs == expect)
    }
  }

  test("WindowMinima kernel == transform(array_min(slice)) formulation") {
    val arrays = (1 to 40).map(_ =>
      Seq.fill(rnd.nextInt(30) + 4)(rnd.nextLong()))
    val w = 4
    val df = arrays.toDF("hs")
    val fold = transform(sequence(lit(0), size(col("hs")) - w),
      i => array_min(slice(col("hs"), i + 1, lit(w))))
    val kernel = Bridge.column(org.apache.spark.sql.graft.WindowMinima(
      Bridge.expression(col("hs")), w))
    df.select(kernel.as("k"), fold.as("f")).collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("WordShingles kernel == transform(concat_ws) formulation") {
    val docs = (1 to 40).map(_ =>
      (1 to rnd.nextInt(30) + 3).map(_ =>
        rnd.alphanumeric.take(rnd.nextInt(8) + 1).mkString).mkString(" "))
    val df = docs.toDF("text").select(split(col("text"), " ").as("w"))
    val fold = transform(sequence(lit(0), size(col("w")) - 3),
      i => concat_ws(" ", element_at(col("w"), i + 1),
        element_at(col("w"), i + 2), element_at(col("w"), i + 3)))
    val kernel = Bridge.column(org.apache.spark.sql.graft.WordShingles(
      Bridge.expression(col("w")), 3))
    df.select(kernel.as("k"), fold.as("f")).collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("DotProduct kernel == sequential zip_with fold, bit-exact") {
    val vecs = (1 to 50).map(_ => (
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = vecs.toDF("a", "b")
    val fold = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val kernel = Bridge.column(org.apache.spark.sql.graft.DotProduct(
      Bridge.expression(col("a")), Bridge.expression(col("b"))))
    df.select(kernel.as("k"), fold.as("f")).collect().foreach { r =>
      // bit-exact, not approximately equal: the oracle depends on it
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("HyperplaneBands kernel == per-plane sign-bit fold formulation") {
    import graft.operators.SimilarityParams._
    val vecs = (1 to 30).map(_ => Seq.fill(Dim)(rnd.nextDouble() * 2 - 1))
    val df = vecs.toDF("v")
    val foldKeys = array((0 until NumBands).map { j =>
      (0 until BitsPerBand).map { t =>
        val p = planes(j * BitsPerBand + t)
        val dot = aggregate(zip_with(array(p.map(lit(_)): _*), col("v"),
          (pi, x) => pi * x), lit(0.0), (acc, x) => acc + x)
        when(dot >= 0.0, lit(1 << t)).otherwise(lit(0))
      }.reduce(_ + _)
    }: _*)
    val rows = df.select(
      graft.operators.Similarity.bandKeysArray(col("v")).as("kernel"),
      foldKeys.as("fold")).collect()
    rows.foreach(r => assert(r.getSeq[Int](0) == r.getSeq[Int](1)))
  }

  test("OphSignature kernel == per-bin min + rotation densification " +
      "(randomized driver replay)") {
    val df = hashArrays.toDF("hashes")
    val k = Dedup.NumHashes
    val (a, b) = Dedup.perms.head
    val rows = df.select(col("hashes"),
      Dedup.ophSignature(col("hashes")).as("sig")).collect()
    rows.foreach { r =>
      val hs = r.getSeq[Long](0)
      val bins = Array.fill(k)(-1L)
      hs.foreach { x =>
        val h = (a * (x % Dedup.P) + b) % Dedup.P
        val bn = (h % k).toInt
        if (bins(bn) < 0 || h < bins(bn)) bins(bn) = h
      }
      val exp = (0 until k).map { i =>
        if (bins(i) >= 0) bins(i)
        else (1 until k).find(j => bins((i + j) % k) >= 0)
          .map(j => bins((i + j) % k) + j * Dedup.OphC).getOrElse(0L)
      }
      assert(r.getSeq[Long](1) == exp)
    }
  }

  test("HashedCounts kernel == groupBy-count + digest + h-sort replay " +
      "(randomized)") {
    import org.apache.spark.sql.graft.{DigestOps, HashedCounts}
    import org.apache.spark.unsafe.types.UTF8String
    val docs = (1 to 40).map(_ =>
      (1 to rnd.nextInt(30) + 1).map(_ => "w" + rnd.nextInt(12)))
    val df = docs.toDF("ws")
    val rows = df.select(col("ws"),
      Bridge.column(HashedCounts(Bridge.expression(col("ws"))))
        .as("hc")).collect()
    rows.foreach { r =>
      val ws = r.getSeq[String](0)
      val exp = ws.groupBy(identity).toSeq
        .map { case (t, g) =>
          (DigestOps.digest60(UTF8String.fromString(t)), g.size.toLong) }
        .groupBy(_._1).toSeq
        .map { case (h, g) => (h, g.map(_._2).sum) }
        .sortBy(_._1)
      val got = r.getSeq[org.apache.spark.sql.Row](1)
        .map(s => (s.getLong(0), s.getLong(1)))
      assert(got == exp)
    }
  }

  test("WeightedJaccard kernel == map-based Σmin/Σmax (randomized)") {
    import org.apache.spark.sql.graft.WeightedJaccard
    def tcArr(): Seq[(Long, Long)] =
      (1 to rnd.nextInt(20) + 1)
        .map(_ => rnd.nextInt(15).toLong -> (rnd.nextInt(9) + 1).toLong)
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
        .sortBy(_._1)
    val pairs = (1 to 40).map(_ => (tcArr(), tcArr()))
    val df = pairs.toDF("a", "b")
      .selectExpr(
        "transform(a, x -> struct(x._1 AS h, x._2 AS tf)) AS a",
        "transform(b, x -> struct(x._1 AS h, x._2 AS tf)) AS b")
    val rows = df.select(Bridge.column(WeightedJaccard(
      Bridge.expression(col("a")), Bridge.expression(col("b"))))
      .as("wj")).collect()
    rows.zip(pairs).foreach { case (r, (a, b)) =>
      val ma = a.toMap.withDefaultValue(0L)
      val mb = b.toMap.withDefaultValue(0L)
      val keys = (ma.keySet ++ mb.keySet).toSeq
      val num = keys.map(k => math.min(ma(k), mb(k))).sum
      val den = keys.map(k => math.max(ma(k), mb(k))).sum
      val exp = if (den == 0) 0.0 else num.toDouble / den
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(exp))
    }
  }

  test("PhraseCounts kernel == brute-force occurrence scan (randomized, " +
      "overlapping + nested phrases)") {
    import org.apache.spark.sql.graft.PhraseCounts
    // phrases deliberately nest ("aba" contains "ab"/"ba"; "abcab"
    // ends in "ab") so the automaton's failure-link output merging is
    // exercised on every row
    val phrases = Seq("ab", "ba", "aba", "ca", "abcab")
    val texts = (1 to 60).map(_ =>
      (1 to rnd.nextInt(80) + 1).map(_ => "abc"(rnd.nextInt(3))).mkString)
    val rows = texts.toDF("text").select(col("text"),
      Bridge.column(PhraseCounts(Bridge.expression(col("text")), phrases))
        .as("pc")).collect()
    rows.foreach { r =>
      val t = r.getString(0)
      val exp = phrases.map(p =>
        (0 to t.length - p.length)
          .count(i => t.regionMatches(i, p, 0, p.length)).toLong)
      assert(r.getSeq[Long](1) == exp, s"text=$t")
    }
  }
}
