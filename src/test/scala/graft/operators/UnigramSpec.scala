package graft.operators

import graft.SparkSessionSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.graft.UnigramOps

/** Unigram-LM tokenizer (q172/q173): serial-equivalence against a
  * pure-Scala driver twin (bit-identical model), kernel tie rules,
  * coverage floors, and the apply-side length fallback. */
class UnigramSpec extends AnyFunSuite with SparkSessionSpec {

  // ---- pure-Scala driver twin of the full training schedule ----
  private def twinLogp(c: Long, t: Long): Double = Unigram.logp(c, t)

  private def twinViterbi(word: String,
      m: Map[String, Double]): Seq[String] = {
    val cps = word.codePoints().toArray
    val n = cps.length
    val NEG = Double.NegativeInfinity
    val score = Array.fill(n + 1)(NEG)
    val back = new Array[Int](n + 1)
    score(0) = 0.0
    for (i <- 1 to n; len <- 1 to math.min(Unigram.MaxPieceLen, i)) {
      val j = i - len
      if (score(j) != NEG) {
        m.get(new String(cps, j, len)).foreach { p =>
          val s = score(j) + p
          if (s > score(i)) { score(i) = s; back(i) = len }
        }
      }
    }
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      val len = back(pos)
      out.prepend(new String(cps, pos - len, len))
      pos -= len
    }
    out.toList
  }

  private def twinTrain(texts: Seq[String]): Seq[(String, Long, Double)] = {
    val words = texts.flatMap(_.split(" "))
      .filter(w => w.nonEmpty && w.length <= Unigram.MaxWordLen)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val seed = words.toSeq.flatMap { case (w, c) =>
      for (i <- 0 until w.length;
           l <- 1 to math.min(Unigram.MaxPieceLen, w.length - i))
        yield (w.substring(i, i + l), c)
    }.groupBy(_._1).map { case (p, g) => p -> g.map(_._2).sum }
    val chars = seed.keySet.filter(_.length == 1)
    def toModel(counts: Map[String, Long]): Map[String, Double] = {
      val t = counts.values.sum
      counts.map { case (p, c) => p -> twinLogp(c, t) }
    }
    def estep(m: Map[String, Double]): Map[String, Long] =
      words.toSeq.flatMap { case (w, c) =>
        twinViterbi(w, m).map(_ -> c)
      }.groupBy(_._1).map { case (p, g) => p -> g.map(_._2).sum }
    def pruneMap(counts: Map[String, Long]): Map[String, Long] = {
      val kept = counts.toSeq.sortWith((a, b) =>
          a._2 > b._2 || (a._2 == b._2 && Unigram.utf8Less(a._1, b._1)))
        .take(Unigram.VocabTarget)
      val keptSet = kept.map(_._1).toSet
      (kept ++ chars.filterNot(keptSet).toSeq
        .map(c => c -> counts.getOrElse(c, 1L))).toMap
    }
    val v1 = pruneMap(estep(toModel(seed)))
    val v2 = pruneMap(estep(toModel(v1)))
    val t = v2.values.sum
    v2.toSeq.map { case (p, c) => (p, c, twinLogp(c, t)) }
  }

  /** Deterministic richer-than-fixture corpus: enough distinct words
    * that the VocabTarget prune actually cuts. */
  private def richTexts: Seq[String] = {
    var s = 7L
    def next(): Long = {
      s = s * 6364136223846793005L + 1442695040888963407L; s >>> 33
    }
    val alpha = "abcdef"
    def word(): String = {
      val len = 1 + (next() % 9).toInt
      (0 until len).map(_ => alpha((next() % 6).toInt)).mkString
    }
    (0 until 60).map(_ => (0 until 25).map(_ => word()).mkString(" "))
  }

  test("serial equivalence: distributed trainer is bit-identical to " +
      "the pure-Scala twin (pieces, counts, and logp bits) on a " +
      "corpus where the prune genuinely cuts") {
    import spark.implicits._
    val docs = richTexts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Unigram.modelTable(spark, docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    val want = twinTrain(richTexts).sortBy(_._1)
    assert(got.length == want.length,
      s"${got.length} pieces vs twin ${want.length}")
    // prune must have genuinely cut the seed inventory
    assert(got.length >= Unigram.VocabTarget,
      "fixture too small to exercise the prune")
    got.zip(want).foreach { case ((p1, c1, l1), (p2, c2, l2)) =>
      assert(p1 == p2 && c1 == c2, s"$p1/$c1 vs $p2/$c2")
      assert(java.lang.Double.doubleToLongBits(l1) ==
        java.lang.Double.doubleToLongBits(l2), s"logp bits differ at $p1")
    }
  }

  test("viterbi kernel: equal-score paths pick the SHORTEST last " +
      "piece; unknown-char words fall back to per-char pieces") {
    val m = new UnigramOps.Model(Array("a", "aa"),
      Array(-1.0, -2.0), 2)
    // [a][a] = -2.0 ties [aa] = -2.0 -> len-1 branch wins
    val segs = UnigramOps.viterbi(
      org.apache.spark.unsafe.types.UTF8String.fromString("aa"), m)
    assert(segs.numElements() == 2)
    assert(segs.getUTF8String(0).toString == "a")
    assert(segs.getUTF8String(1).toString == "a")
    // strictly better longer piece IS taken
    val m2 = new UnigramOps.Model(Array("a", "aa"),
      Array(-2.0, -3.0), 2)
    val segs2 = UnigramOps.viterbi(
      org.apache.spark.unsafe.types.UTF8String.fromString("aa"), m2)
    assert(segs2.numElements() == 1)
    assert(segs2.getUTF8String(0).toString == "aa")
    // coverage guard: 'b' absent -> per-char fallback
    val segs3 = UnigramOps.viterbi(
      org.apache.spark.unsafe.types.UTF8String.fromString("ab"), m)
    assert((0 until segs3.numElements())
      .map(segs3.getUTF8String(_).toString) == Seq("a", "b"))
  }

  test("prune: single chars absent from the viterbi counts re-enter " +
      "at count 1; ranked chars keep their counts") {
    val counts = Array(("ab", 10L), ("a", 3L), ("b", 2L))
    val pruned = Unigram.prune(counts, Set("a", "b", "z")).toMap
    assert(pruned("ab") == 10L && pruned("a") == 3L && pruned("b") == 2L)
    assert(pruned("z") == 1L) // coverage floor
  }

  test("apply fallback: words beyond MaxWordLen count one token per " +
      "character; n_words counts every word") {
    import spark.implicits._
    val long = "x" * 20
    val docs = Seq((1L, s"ab ab $long")).toDF("doc_id", "text")
    val out = Unigram.segmentCounts(docs).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("n_words") == 3L)
    // 'ab' trains to a single piece (it dominates), long word = 20
    val nt = out(0).getAs[Long]("n_tokens")
    assert(nt == 2L + 20L || nt == 4L + 20L, s"n_tokens $nt")
  }

  test("greedy vs Viterbi (q193): greedy strands the tail into " +
      "singles where Viterbi finds the 2-piece split; greedy never " +
      "under-counts the Viterbi optimum on the fixture") {
    import org.apache.spark.unsafe.types.UTF8String
    // hand model: 'abcd' outranks 'abc' for greedy's first bite, but
    // the remainder 'efg' has no piece — greedy = abcd|e|f|g (4),
    // Viterbi = abc|defg (2). Every char is a piece (coverage).
    val pieces = Array("abcd", "abc", "defg") ++
      "abcdefg".map(_.toString)
    val lp = pieces.map {
      case p if p.length > 1 => -1.0
      case _ => -10.0
    }
    val m = new UnigramOps.Model(pieces, lp, 4)
    def seg(f: (UTF8String, UnigramOps.Model) =>
        org.apache.spark.sql.catalyst.util.ArrayData, w: String) =
      f(UTF8String.fromString(w), m).toObjectArray(
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    assert(seg(UnigramOps.greedy, "abcdefg") ==
      Seq("abcd", "e", "f", "g"))
    assert(seg(UnigramOps.viterbi, "abcdefg") == Seq("abc", "defg"))
    // fixture-wide: the serve-time greedy budget is >= the Viterbi
    // optimum per document, and equals it wherever greedy's bites
    // happen to be optimal
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val vit = Unigram.segmentCounts(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens"))
      .toMap
    val gre = Unigram.greedyCounts(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens"))
      .toMap
    assert(gre.keySet == vit.keySet)
    gre.foreach { case (id, g) =>
      assert(g >= vit(id), s"doc $id: greedy $g < viterbi ${vit(id)}")
    }
  }
}
