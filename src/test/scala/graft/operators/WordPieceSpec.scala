package graft.operators

import graft.SparkSessionSpec
import org.scalatest.funsuite.AnyFunSuite

class WordPieceSpec extends AnyFunSuite with SparkSessionSpec {

  private def fixtureWords: Seq[String] = {
    import spark.implicits._
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").as[String].collect()
      .flatMap(_.split(" ")).filter(_.nonEmpty).toSeq
  }

  /** Naive WordPiece scorer over a symbolized corpus: pair counts,
    * unit counts, score = c / (u(l)·u(r)) with the SAME double
    * arithmetic as the trainer (long → double casts, one multiply,
    * one divide). */
  private def naiveScores(corpus: Map[List[String], Long])
      : Map[(String, String), (Long, Double)] = {
    val pair = scala.collection.mutable.Map.empty[(String, String), Long]
    val unit = scala.collection.mutable.Map.empty[String, Long]
    corpus.foreach { case (syms, cnt) =>
      syms.foreach(s => unit(s) = unit.getOrElse(s, 0L) + cnt)
      syms.zip(syms.tail).foreach { p =>
        pair(p) = pair.getOrElse(p, 0L) + cnt
      }
    }
    pair.map { case ((l, r), c) =>
      (l, r) -> (c, c.toDouble / (unit(l).toDouble * unit(r).toDouble))
    }.toMap
  }

  private def applyMerge(corpus: Map[List[String], Long], l: String,
      r: String): Map[List[String], Long] =
    corpus.groupMapReduce { case (syms, _) =>
      syms.foldLeft(List.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
        else acc :+ x
      }
    }(_._2)(_ + _)

  private def symbolize(words: Seq[String]): Map[List[String], Long] =
    words.groupBy(identity).map { case (w, ws) =>
      w.map(_.toString).toList -> ws.size.toLong
    }

  test("likelihood scoring is load-bearing: on the fixture the first " +
      "WordPiece merge differs from the first BPE (frequency) merge, " +
      "and equals the naive score argmax with the (score DESC, l, r) " +
      "tiebreak") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val wp = WordPiece.trainRounds(docs, rounds = 1, batchSize = 1)
    val bpe = Bpe.trainMerges(docs, 1)
    assert(wp.size == 1 && bpe.size == 1)
    val scores = naiveScores(symbolize(fixtureWords))
    val ((el, er), (ec, es)) = scores.toSeq.minBy {
      case ((l, r), (_, s)) => (-s, l, r)
    }
    assert((wp.head.left_sym, wp.head.right_sym) == ((el, er)))
    assert(wp.head.pair_count == ec && wp.head.score == es)
    assert((wp.head.left_sym, wp.head.right_sym) !=
      ((bpe.head.left_sym, bpe.head.right_sym)),
      "fixture must separate the scorers — else the test is vacuous")
  }

  test("batched trainer: every recorded (pair_count, score) is the " +
      "TRUE corpus value at its own substep (blanket disjointness " +
      "is the right invariance for the likelihood score)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    for (bs <- Seq(2, 4)) {
      val merges = WordPiece.trainRounds(docs, rounds = 3,
        batchSize = bs)
      assert(merges.size == 3 * bs)
      var corpus = symbolize(fixtureWords)
      merges.foreach { m =>
        val scores = naiveScores(corpus)
        val (c, s) = scores.getOrElse((m.left_sym, m.right_sym),
          (0L, 0.0))
        assert(c == m.pair_count && s == m.score,
          s"bs=$bs step ${m.step} (${m.left_sym},${m.right_sym}): " +
            s"recorded (${m.pair_count},${m.score}) vs true ($c,$s)")
        corpus = applyMerge(corpus, m.left_sym, m.right_sym)
      }
    }
  }

  test("greedy batch accept == iterated argmax under recounting, " +
      "when no mid-batch-created pair intervenes: each acceptance " +
      "is the naive score argmax among batch-start candidates " +
      "disjoint from earlier acceptances") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = WordPiece.trainRounds(docs, rounds = 1, batchSize = 4)
    val scores = naiveScores(symbolize(fixtureWords))
    val used = scala.collection.mutable.Set.empty[String]
    merges.foreach { m =>
      val ((el, er), _) = scores.toSeq
        .filter { case ((l, r), _) =>
          !used(l) && !used(r) }
        .minBy { case ((l, r), (_, s)) => (-s, l, r) }
      assert((m.left_sym, m.right_sym) == ((el, er)),
        s"step ${m.step}")
      used += m.left_sym; used += m.right_sym; used += m.merged
    }
  }

  test("apply-side token counts: vocab-folded counts under the " +
      "trained merges equal a naive per-word fold") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = WordPiece.trainRounds(docs)
    val got = WordPiece.trainAndCount(docs)
      .select($"doc_id", $"n_words", $"n_tokens")
      .as[(Long, Long, Long)].collect()
      .map { case (id, w, t) => id -> (w, t) }.toMap
    val naive = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, text) =>
        val words = text.split(" ").filter(_.nonEmpty)
        val toks = words.map { w =>
          merges.foldLeft(w.map(_.toString).toList) { (syms, m) =>
            syms.foldLeft(List.empty[String]) { (acc, x) =>
              if (acc.nonEmpty && acc.last == m.left_sym &&
                  x == m.right_sym) acc.init :+ m.merged
              else acc :+ x
            }
          }.size
        }.sum
        id -> (words.length.toLong, toks.toLong)
      }.toMap
    assert(got == naive)
  }
}
