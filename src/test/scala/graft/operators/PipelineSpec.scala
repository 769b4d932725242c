package graft.operators

import graft.SparkSessionSpec
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite with SparkSessionSpec {

  test("snapshotDiff classifies added/removed/changed/unchanged " +
      "exactly; derived config flags the right residue classes") {
    import spark.implicits._
    val v1 = Seq((1L, "same"), (2L, "old"), (3L, "gone")).toDF("doc_id", "text")
    val v2 = Seq((1L, "same"), (2L, "new"), (4L, "fresh")).toDF("doc_id", "text")
    val out = Pipeline.snapshotDiff(v1, v2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    // derived two-version config over the fixture: status is purely
    // a function of doc_id % 10
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val derived = Pipeline.snapshotDiffDerived(docs).collect()
    assert(derived.length == 500)
    derived.foreach { r =>
      val expected = (r.getLong(0) % 10) match {
        case Pipeline.DiffAddedMod => "added"
        case Pipeline.DiffRemovedMod => "removed"
        case Pipeline.DiffChangedMod => "changed"
        case _ => "unchanged"
      }
      assert(r.getString(1) == expected,
        s"doc ${r.getLong(0)}: ${r.getString(1)} != $expected")
    }
  }

  test("funnel stages are monotone and splits partition the final set") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val r = Pipeline.preprocessingFunnel(docs).collect()(0)
    val Seq(raw, dedup, neardup, quality, lang, train, valid, test) =
      (0 until 8).map(r.getLong)
    assert(raw >= dedup && dedup >= neardup &&
      neardup >= quality && quality >= lang)
    assert(train + valid + test == lang)
    assert(raw == docs.count())
    assert(lang > 0, "funnel filtered everything out — thresholds broken")
  }

  test("decontaminatedFunnel: stages stay monotone through the " +
      "decontamination cut, benchmark members never reach training, " +
      "and the cut equals the composed member screens exactly") {
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = Similarity.embeddings(spark, sf)
    val r = Pipeline.decontaminatedFunnel(docs, emb).collect()(0)
    val Seq(raw, dedup, neardup, quality, lang, decontam,
      train, valid, test) = (0 until 9).map(r.getLong)
    assert(raw >= dedup && dedup >= neardup && neardup >= quality &&
      quality >= lang && lang >= decontam)
    assert(train + valid + test == decontam)
    assert(decontam > 0, "decontamination cut everything — gate broken")
    assert(decontam < lang,
      "fixture must exercise the cut (bench members alone guarantee it)")
    // closure: recompute the expected decontam count from the graded
    // member operators themselves — composition adds NO new rule
    import org.apache.spark.sql.functions._
    val flags = Pipeline.rowLocalFlags(docs)
      .withColumn("keep_dedup",
        col("doc_id") === Dedup.canonicalIdCol)
    val nd = Pipeline.clusterKeepFlags(Dedup.minhashNearDups(docs))
    val ngIds = Dedup.benchmarkContamination(docs)
      .filter(col("frac_shared") >= Pipeline.ContamFracThreshold)
      .collect().map(_.getLong(0)).toSet
    val semIds = Similarity.semanticContamination(emb)
      .collect().map(_.getAs[Long]("corpus_vec")).toSet
    val expected = flags.join(nd, Seq("doc_id"), "left").collect()
      .count { row =>
        val id = row.getAs[Long]("doc_id")
        val keepNd = row.getAs[Boolean]("keep_dedup") &&
          Option(row.getAs[Any]("keep_nd"))
            .forall(_.asInstanceOf[Boolean])
        keepNd && row.getAs[Boolean]("keep_quality") &&
          row.getAs[Boolean]("keep_lang") &&
          id >= Similarity.SemDecontamBenchBelow &&
          !ngIds.contains(id) && !semIds.contains(id)
      }
    assert(decontam == expected,
      s"composed gate $decontam != member-screen closure $expected")
  }

  test("asOfReconstructEvolved crosses the add-column boundary: " +
      "asOf before it returns the OLD schema, a planted pre-boundary " +
      "value is masked, post-boundary upserts carry the column") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (v1, v2, v3) = Pipeline.timeTravelVersions(docs)
    val log = Pipeline.evolvedLog(v1, v2, v3)
    val schema = Map("lang" -> 2L)
    import org.apache.spark.sql.functions._

    // asOf = 1 (BEFORE the boundary): old schema — no lang column —
    // and exactly v2's rows
    val at1 = Pipeline.asOfReconstructEvolved(v1, log, schema, 1L)
    assert(at1.columns.toSeq == Seq("doc_id", "text"),
      s"old snapshot grew new columns: ${at1.columns.mkString(",")}")
    val v2Rows = v2.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val at1Rows = at1.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(at1Rows == v2Rows, "asOf=1 must reproduce v2 exactly")

    // asOf = 2 (AFTER): lang present, non-null EXACTLY for the
    // added-then-changed class (last upserted at version 2)
    val at2 = Pipeline.asOfReconstructEvolved(v1, log, schema, 2L)
    assert(at2.columns.toSeq == Seq("doc_id", "text", "lang"))
    val rows = at2.collect().map(r =>
      r.getLong(0) -> Option(r.getString(2))).toMap
    rows.foreach { case (id, lang) =>
      if (id % 10 == Pipeline.DiffAddedMod)
        assert(lang.contains(if (id % 2 == 0) "en" else "de"),
          s"doc $id: post-boundary upsert lost its lang ($lang)")
      else assert(lang.isEmpty,
        s"doc $id: pre-boundary row must read the NULL add-default")
    }

    // SCHEMA GATE, not data luck: plant a non-null lang on a
    // pre-boundary (version 1) entry — its writer's schema had no
    // such column, so reconstruction must MASK it
    val planted = log.withColumn("new_lang",
      when(col("version") === 1L && col("op") === "upsert",
        lit("POISON")).otherwise(col("new_lang")))
    val masked = Pipeline.asOfReconstructEvolved(v1, planted, schema, 2L)
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(masked == rows,
      "a value written before the column existed leaked through")
  }

  test("fimTransform (q234): PSM reordering round-trips to the " +
      "original (prefix+middle+suffix in order), token multiset " +
      "preserved, selection and cuts deterministic, short docs and " +
      "the unselected half pass through untouched") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val orig = docs.collect().map(r =>
      r.getLong(0) -> r.getString(1)).toMap
    val out = Pipeline.fimTransform(docs).collect().map { r =>
      r.getLong(0) -> ((r.getBoolean(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    }.toMap
    assert(out.keySet == orig.keySet)
    var nFim = 0
    out.foreach { case (id, (fim, np, nm, ns, text)) =>
      val w = orig(id).split(" ", -1)
      assert(np + nm + ns == w.length,
        s"doc $id: counts $np+$nm+$ns != ${w.length}")
      if (!fim) {
        assert(text == orig(id), s"doc $id: pass-through mutated")
        assert(nm == 0 && ns == 0)
      } else {
        nFim += 1
        // parse the PSM form and reconstruct the original order
        val pIdx = text.indexOf(Pipeline.FimPrefixTok + " ")
        val sIdx = text.indexOf(" " + Pipeline.FimSuffixTok + " ")
        val mIdx = text.indexOf(" " + Pipeline.FimMiddleTok + " ")
        assert(pIdx == 0 && sIdx > 0 && mIdx > sIdx,
          s"doc $id: sentinel structure broken: $text")
        val prefix = text.substring(
          Pipeline.FimPrefixTok.length + 1, sIdx)
        val suffix = text.substring(
          sIdx + Pipeline.FimSuffixTok.length + 2, mIdx)
        val middle = text.substring(
          mIdx + Pipeline.FimMiddleTok.length + 2)
        val rebuilt = Seq(prefix, middle, suffix)
          .filter(_.nonEmpty).mkString(" ")
        assert(rebuilt == orig(id),
          s"doc $id: PSM does not round-trip\n got: $rebuilt\n " +
            s"want: ${orig(id)}")
        assert(prefix.split(" ", -1).count(_.nonEmpty) +
          middle.split(" ", -1).count(_.nonEmpty) +
          suffix.split(" ", -1).count(_.nonEmpty) == w.length ||
          (np + nm + ns) == w.length)
      }
    }
    // the hash selects a substantial fraction both ways
    assert(nFim > out.size / 4 && nFim < out.size * 3 / 4,
      s"selection skew: $nFim of ${out.size}")
    // determinism: a second run is identical
    val again = Pipeline.fimTransform(docs).collect().map { r =>
      r.getLong(0) -> r.getString(5)
    }.toMap
    assert(again == out.map { case (k, v) => k -> v._5 })
  }

  test("spanCorrupt (q238): substituting each sentinel's target span " +
      "back into the input reconstructs the original exactly; " +
      "sentinel ordinals are contiguous; masked-block rate tracks " +
      "1-in-7; deterministic across runs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val orig = docs.collect().map(r =>
      r.getLong(0) -> r.getString(1)).toMap
    val out = Pipeline.spanCorrupt(docs).collect().map(r =>
      r.getLong(0) -> ((r.getString(1), r.getString(2),
        r.getLong(3)))).toMap
    assert(out.keySet == orig.keySet)
    var blocksTotal = 0L
    var maskedTotal = 0L
    val Sent = "<extra_id_(\\d+)>".r
    out.foreach { case (id, (input, targets, nMasked)) =>
      val w = orig(id).split(" ", -1)
      blocksTotal += (w.length + 2) / 3
      maskedTotal += nMasked
      // parse targets into ordinal -> span map
      val spans: Map[Int, String] =
        if (targets.isEmpty) Map.empty
        else {
          val parts = Sent.findAllMatchIn(targets).toVector
          parts.zipWithIndex.map { case (m, i) =>
            val end = if (i + 1 < parts.length) parts(i + 1).start
              else targets.length
            m.group(1).toInt ->
              targets.substring(m.end + 1, end).stripSuffix(" ")
          }.toMap
        }
      assert(spans.keySet == (0 until nMasked.toInt).toSet,
        s"doc $id: ordinals ${spans.keySet} != 0..${nMasked - 1}")
      // substitute back and compare
      val rebuilt = Sent.replaceAllIn(input,
        m => java.util.regex.Matcher.quoteReplacement(
          spans(m.group(1).toInt)))
      assert(rebuilt == orig(id),
        s"doc $id reconstruction failed\n got: $rebuilt\n" +
          s" want: ${orig(id)}")
    }
    val rate = maskedTotal.toDouble / blocksTotal
    assert(rate > 0.09 && rate < 0.20,
      s"mask rate $rate off the 1/7 design point")
    val again = Pipeline.spanCorrupt(docs).collect().map(r =>
      r.getLong(0) -> r.getString(1)).toMap
    assert(again == out.map { case (k, v) => k -> v._1 })
  }

  test("kAnonymize: every released cohort has >= k members, levels " +
      "escalate exactly when finer cohorts are small, stragglers " +
      "of a drained coarse group cannot ride out 1-anonymous") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val k = Pipeline.AnonK // 5
    // nation 1 / AUTO: 5 members in fine band 0 (released L0) plus
    // ONE straggler in fine band 1 — same coarse band. The naive
    // whole-coarse-group count (6 >= k) would release the straggler
    // 1-anonymously at L1; the drained count (1 < k) must push it
    // down the ladder. Nation 2 / AUTO shares (AUTO, coarse band 0)
    // with 4 more unreleased rows -> straggler + those 4 release at
    // L2 with cohort exactly 5.
    val rows =
      (1 to 5).map(i => (100L + i, 1, "AUTO", 100.0 * i)) ++ // band0=0
      Seq((200L, 1, "AUTO", 1500.0)) ++                      // straggler
      (1 to 4).map(i => (300L + i, 2, "AUTO", 1000.0 + 700 * i)) ++
      Seq((400L, 3, "BIKE", 999999.0))                       // suppressed
    val customer = rows.toDF("c_custkey", "c_nationkey",
        "c_mktsegment", "c_acctbal")
      .withColumn("c_nationkey", col("c_nationkey").cast("int"))
    val out = Pipeline.kAnonymize(customer).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getString(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    // the five fine-band rows release at L0 with cohort 5
    (1 to 5).foreach { i =>
      val (lvl, key, n) = out(100L + i)
      assert(lvl == 0 && key == "L0|1|AUTO|0" && n == 5L)
    }
    // straggler: NOT L1 (drained cohort is 1), lands at L2 cohort 5
    val (sl, sk, sn) = out(200L)
    assert(sl == 2, s"straggler released at L$sl — 1-anonymous leak")
    assert(sk == "L2|AUTO|0" && sn == 5L)
    (1 to 4).foreach { i =>
      val (lvl, key, _) = out(300L + i)
      assert(lvl == 2 && key == "L2|AUTO|0")
    }
    // lone BIKE row is suppressed
    assert(out(400L) == ((3, "*", -1L)))
    // closure: EVERY released key groups >= k output rows
    Pipeline.kAnonymize(customer).filter(col("anon_level") < 3)
      .groupBy(col("released_key")).count().collect()
      .foreach(r => assert(r.getLong(1) >= k,
        s"${r.getString(0)} cohort ${r.getLong(1)} < $k"))
  }

  test("vacuumCompact: reconstruction at or after the horizon is " +
      "EXACT from the compacted representation, history before the " +
      "horizon is physically gone, checkpoint equals asOf(horizon)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val v1 = docs.filter(col("doc_id") % 10 =!= Pipeline.DiffAddedMod)
      .select(col("doc_id"), col("text"))
    val v2 = docs.filter(col("doc_id") % 10 =!= Pipeline.DiffRemovedMod)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === Pipeline.DiffChangedMod,
          concat(col("text"), lit(" v2"))).otherwise(col("text"))
          .as("text"))
    val v3 = docs.filter(col("doc_id") % 10 =!= Pipeline.DiffRemovedMod &&
        col("doc_id") % 10 =!= Pipeline.DiffChangedMod)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === Pipeline.DiffAddedMod,
          concat(col("text"), lit(" v3"))).otherwise(col("text"))
          .as("text"))
    val log = Pipeline.cdcBetween(v1, v2).withColumn("version", lit(1L))
      .unionByName(Pipeline.cdcBetween(v2, v3)
        .withColumn("version", lit(2L)))
    val compacted = Pipeline.vacuumCompact(v1, log, retainAfter = 1L)
    def tbl(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // checkpoint rows ARE asOf(horizon) = v2 (by content digest)
    val ckpt = compacted.filter(col("version") === 0L).collect()
      .map(r => r.getLong(1) -> r.getString(3)).toMap
    val v2d = v2.select(col("doc_id"), md5(col("text"))).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ckpt == v2d)
    // reconstructing the LATEST version from (checkpoint-as-base +
    // retained tail) equals reconstructing from the full history
    val newBase = v2 // the checkpoint content; text form for asOf
    val retained = log.filter(col("version") > 1L)
    val fromCompacted = tbl(
      Pipeline.asOfReconstruct(newBase, retained, asOf = 2L))
    val fromFull = tbl(Pipeline.asOfReconstruct(v1, log, asOf = 2L))
    assert(fromCompacted == fromFull)
    assert(fromCompacted == tbl(v3))
    // versions before the horizon are physically gone from the tail
    assert(compacted.filter(col("version") =!= 0L)
      .agg(min(col("version"))).head().getLong(0) > 1L)
  }

  test("lDiversityAudit: k-anonymous-but-homogeneous class fails l, " +
      "nominally diverse class fails the modal frequency cap, a " +
      "genuinely diverse class releases") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // nation 1: 6 members, ONE sensitive band -> k passes, l fails
    //   (the homogeneity attack k-anonymity alone misses).
    // nation 2: 10 members over 4 bands but modal band holds 7/10
    //   (> 3/5 cap) -> fails ONLY the frequency rule.
    // nation 3: 10 members over 4 bands, modal 3/10 -> released.
    // nation 4: 3 members over 3 bands -> fails k only.
    val rows =
      (1 to 6).map(i => (100L + i, 1, "AUTO", 100.0)) ++
      ((1 to 7).map(i => (200L + i, 2, "AUTO", 100.0)) ++
        Seq((208L, 2, "AUTO", 1500.0), (209L, 2, "AUTO", 2500.0),
          (210L, 2, "AUTO", 3500.0))) ++
      (1 to 10).map(i => (300L + i, 3, "AUTO", 1000.0 * (i % 4))) ++
      (1 to 3).map(i => (400L + i, 4, "BIKE", 1000.0 * i))
    val customer = rows.toDF("c_custkey", "c_nationkey",
        "c_mktsegment", "c_acctbal")
      .withColumn("c_nationkey", col("c_nationkey").cast("int"))
    val out = Pipeline.lDiversityAudit(customer).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(out(1L) == ((6L, 1L, 6L, false)), s"homogeneous: ${out(1L)}")
    assert(out(2L) == ((10L, 4L, 7L, false)), s"modal cap: ${out(2L)}")
    assert(out(3L) == ((10L, 4L, 3L, true)), s"diverse: ${out(3L)}")
    assert(out(4L) == ((3L, 3L, 1L, false)), s"small: ${out(4L)}")
    // closure over the verdict: every released class satisfies all
    // three rules recomputed from the audit columns themselves
    Pipeline.lDiversityAudit(customer).filter(col("released")).collect()
      .foreach { r =>
        assert(r.getLong(2) >= Pipeline.AnonK &&
          r.getLong(3) >= Pipeline.AnonL &&
          r.getLong(4) * Pipeline.AnonFreqDen <=
            r.getLong(2) * Pipeline.AnonFreqNum)
      }
  }

  test("q303 chat template: token conservation (prompt + loss = " +
      "system + doc words), loss only on assistant spans, the " +
      "1-word edge keeps an empty assistant with zero loss tokens") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"), // 8 words -> two exchanges
      (2L, "x y z"),           // 3 words -> one exchange (2 + 1)
      (3L, "solo"))            // 1 word -> empty assistant span
      .toDF("doc_id", "text")
    val out = Pipeline.chatTemplate(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val sysTokens = Pipeline.ChatSystem.split(" ").length
    assert(out(1L).getAs[Long]("n_turns") == 4)
    assert(out(1L).getAs[Long]("n_control") == 10)
    assert(out(1L).getAs[Long]("n_tokens_prompt") == sysTokens + 4)
    assert(out(1L).getAs[Long]("n_tokens_loss") == 4)
    assert(out(2L).getAs[Long]("n_turns") == 2)
    assert(out(2L).getAs[Long]("n_tokens_prompt") == sysTokens + 2)
    assert(out(2L).getAs[Long]("n_tokens_loss") == 1)
    assert(out(3L).getAs[Long]("n_tokens_loss") == 0,
      "a 1-word doc has an empty assistant span")
    assert(out(3L).getAs[Double]("loss_frac") == 0.0)
  }

  test("q304 preference pairs: chosen is the quality argmax, " +
      "rejected the argmin, a fully-TIED group still yields a " +
      "distinct pair, and singleton groups drop") {
    import spark.implicits._
    val docs = Seq(
      // group 0: clear order (longer distinct text scores higher)
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (50L, "alpha alpha alpha alpha"),
      // group 1: exact tie (identical texts)
      (1L, "same text here"), (51L, "same text here"),
      // group 2: singleton -> dropped
      (2L, "lonely doc"))
      .toDF("doc_id", "text")
    val out = Pipeline.preferencePairs(docs).collect()
      .map(r => r.getAs[Long]("prompt_id") -> r).toMap
    assert(!out.contains(2L), "singleton groups must drop")
    assert(out(0L).getAs[Long]("chosen_id") == 0L)
    assert(out(0L).getAs[Long]("rejected_id") == 50L)
    assert(out(0L).getAs[Double]("margin") > 0.0)
    // tied group: chosen = lowest id, rejected = highest id
    assert(out(1L).getAs[Long]("chosen_id") == 1L)
    assert(out(1L).getAs[Long]("rejected_id") == 51L)
    assert(out(1L).getAs[Double]("margin") == 0.0)
  }
}
