package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-data preprocessing funnel — the composition
  * query that chains the graded pipeline operators the way a corpus
  * build actually runs them: exact dedup → near-dup cluster
  * canonicalization → quality cut → language cut →
  * train/validation/test split, reporting the survivor count of
  * every stage in one row.
  *
  * The point of this operator is compositionality: each stage is THE
  * graded operator ([[Dedup.exactDedup]], [[TextAnalysis.textStats]],
  * [[TextAnalysis.langId]], [[Sampling.trainSplit]]), not a re-derived
  * copy — so the funnel's oracle mirror composes those operators'
  * oracle SQL verbatim and any drift in a component surfaces in two
  * graded queries at once.
  *
  * Scale design (100 TB): the row-local stages (quality, language,
  * split) are fused into ONE corpus scan as shared-builder columns;
  * exact dedup's canonical-min is a window on the content digest over
  * that same fused frame (one shuffle of skinny flags, no join); the
  * near-dup cluster stage is the single remaining join branch —
  * genuinely iterative, so it cannot fuse. The final rollup is a
  * global aggregate of boolean flags — partial-aggregated to a single
  * row per partition before the 1-row merge, so no driver-side row
  * funnel exists anywhere. */
object Pipeline {

  /** Quality cut: keep docs scoring at or above the corpus median
    * (measured 0.36 on the sf0.1 fixture). */
  val QualityThreshold = 0.35

  /** Language cut: keep docs the stopword profiler calls this. */
  val KeepLang = "en"

  /** The fused row-local gate projection — quality, language and
    * split evaluated as columns of ONE pass over (doc_id, text), each
    * built from the same shared Column builders as its graded
    * operator (q6/q7/q32), plus the content digest that keys exact
    * dedup. Works identically on a batch or STREAMING frame (every
    * gate is row-local), which is how
    * [[graft.streaming.StreamingFunnel]] reuses it verbatim. */
  def rowLocalFlags(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      Dedup.contentHashCol(col("text")).as("content_hash"),
      (TextAnalysis.qualityScoreCol(col("text")) >= QualityThreshold)
        .as("keep_quality"),
      (TextAnalysis.langGuessCol(col("text")) === KeepLang)
        .as("keep_lang"),
      Sampling.splitFromBucket(Sampling.splitBucketCol("doc_id"))
        .as("split"))

  /** Near-dup keep flags from a pair set: a doc survives iff it is
    * its own cluster canonical (docs in no pair are vacuously
    * canonical via the rollup's left join + coalesce). Shared by the
    * batch funnel and the streaming finalize. */
  def clusterKeepFlags(pairs: DataFrame): DataFrame =
    Dedup.dedupClusters(pairs.select(col("doc_a"), col("doc_b")))
      .select(col("doc_id"),
        (col("doc_id") === col("canonical_id")).as("keep_nd"))

  /** Final one-row survivor rollup over per-doc flags
    * (doc_id, keep_dedup, keep_quality, keep_lang, split) left-joined
    * with near-dup keep flags (doc_id, keep_nd) — the single join the
    * funnel genuinely needs. */
  def funnelRollup(flags: DataFrame, neardup: DataFrame): DataFrame = {
    val keepNd = col("keep_dedup") && coalesce(col("keep_nd"), lit(true))
    val kept = keepNd && col("keep_quality") && col("keep_lang")
    flags
      .join(neardup, Seq("doc_id"), "left")
      .agg(
        count(lit(1)).as("n_raw"),
        sum(col("keep_dedup").cast("long")).as("n_after_dedup"),
        sum(keepNd.cast("long")).as("n_after_neardup"),
        sum((keepNd && col("keep_quality")).cast("long"))
          .as("n_after_quality"),
        sum(kept.cast("long")).as("n_after_lang"),
        sum((kept && col("split") === "train").cast("long")).as("n_train"),
        sum((kept && col("split") === "validation").cast("long"))
          .as("n_validation"),
        sum((kept && col("split") === "test").cast("long")).as("n_test"))
  }

  /** Deterministic two-version derivation of the snapshot-diff
    * fixture (q120): v1 drops ids ≡ 7 (mod 10) (later "added"), v2
    * drops ids ≡ 5 ("removed") and rewrites the text of ids ≡ 3
    * ("changed"). Production diffs two real corpus snapshots; this
    * derivation exists so the oracle can rebuild both sides from the
    * one documents table. */
  val DiffAddedMod = 7
  val DiffRemovedMod = 5
  val DiffChangedMod = 3

  /** Corpus snapshot diff (q120) — the CDC/versioning operator every
    * managed-corpus pipeline runs between ingests: classify every
    * doc_id as added / removed / changed / unchanged by comparing
    * content digests across two snapshot frames.
    *
    * Scale design (100 TB): ONE id-keyed full-outer join (both sides
    * co-partitioned on the join key — with the corpus bucketed by
    * doc_id on disk this is a zero-shuffle sort-merge); the digest is
    * row-local md5, so the join carries (id, 32-byte hash), never the
    * text. */
  def snapshotDiff(v1: DataFrame, v2: DataFrame): DataFrame = {
    val a = v1.select(col("doc_id"), md5(col("text")).as("old_hash"))
    val b = v2.select(col("doc_id"), md5(col("text")).as("new_hash"))
    a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") === col("new_hash"), "unchanged")
          .otherwise("changed"))
      .select(col("doc_id"), col("status"), col("old_hash"),
        col("new_hash"))
  }

  /** [[snapshotDiff]] over the deterministic two-version derivation
    * of the documents table (the graded q120 configuration). */
  def snapshotDiffDerived(docs: DataFrame): DataFrame = {
    val v1 = docs.filter(col("doc_id") % 10 =!= DiffAddedMod)
      .select(col("doc_id"), col("text"))
    val v2 = docs.filter(col("doc_id") % 10 =!= DiffRemovedMod)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === DiffChangedMod,
          concat(col("text"), lit(" v2"))).otherwise(col("text"))
          .as("text"))
    snapshotDiff(v1, v2)
  }

  /** Bucket count for the graded MERGE (q171) — fixture-scale;
    * production sizes buckets to file-size targets like
    * [[Layout.compactionPartitions]]. */
  val MergeBuckets = 16

  /** Lakehouse MERGE / CDC-apply (q171) — the table-maintenance
    * ACTION between q120's snapshot diff and the next funnel pass:
    * apply a CDC batch (`doc_id`, `op` ∈ upsert/delete, `new_text`)
    * to a bucketed corpus table and return the post-merge table.
    *
    * Copy-on-write per bucket: the COLD buckets (no CDC key hashes
    * into them) pass through untouched via one broadcast anti-join —
    * at 100 TB the merge cost is proportional to the TOUCHED buckets
    * (a daily CDC batch touches a sliver), never the table. Only hot-
    * bucket rows enter the id-keyed full-outer merge; with the table
    * bucket-partitioned on disk the cold side is pure partition
    * pruning and the hot join is co-located ([[mergeApplyTable]] is
    * the file-backed form). The bucket key is `doc_id % buckets` —
    * deterministic and oracle-mirrorable; production swaps in any
    * stable hash.
    *
    * IDEMPOTENT by construction (the exact-retry contract): an upsert
    * overwrites to the same value, a delete of an absent key is a
    * no-op — so a re-delivered batch leaves the table bit-identical
    * (MergeApplySpec pins apply∘apply = apply). */
  def mergeApply(base: DataFrame, cdc: DataFrame,
      buckets: Int = MergeBuckets): DataFrame = {
    val cdcB = cdc.select(col("doc_id"), col("op"), col("new_text"))
      .withColumn("bucket", col("doc_id") % buckets)
    val touched = cdcB.select(col("bucket")).distinct()
    val withB = base.select(col("doc_id"), col("text"))
      .withColumn("bucket", col("doc_id") % buckets)
    val cold = withB.join(broadcast(touched), Seq("bucket"), "left_anti")
    val hot = withB.join(broadcast(touched), Seq("bucket"))
    val merged = hot.select(col("doc_id"), col("bucket"), col("text"))
      .join(cdcB.select(col("doc_id"), col("op"), col("new_text"),
        col("bucket").as("cdc_bucket")), Seq("doc_id"), "full_outer")
      .filter(coalesce(col("op"), lit("keep")) =!= "delete")
      .select(col("doc_id"),
        coalesce(col("bucket"), col("cdc_bucket")).as("bucket"),
        when(col("op") === "upsert", col("new_text"))
          .otherwise(col("text")).as("text"))
    cold.select(col("doc_id"), col("bucket"), col("text"))
      .unionByName(merged)
  }

  /** CDC batch derived from the graded q120 diff: added/changed →
    * upsert carrying the v2 text, removed → delete (unchanged rows
    * never enter a CDC batch). */
  def cdcFromDiff(docs: DataFrame): DataFrame = {
    val v2text = docs.select(col("doc_id"),
      when(col("doc_id") % 10 === DiffChangedMod,
        concat(col("text"), lit(" v2"))).otherwise(col("text"))
        .as("new_text"))
    snapshotDiffDerived(docs)
      .filter(col("status").isin("added", "changed", "removed"))
      .withColumn("op",
        when(col("status") === "removed", "delete").otherwise("upsert"))
      .join(v2text, Seq("doc_id"), "left")
      .select(col("doc_id"), col("op"),
        when(col("op") === "upsert", col("new_text")).as("new_text"))
  }

  /** Graded q171 configuration — the ADVERSARIAL CLOSURE: base = v1,
    * CDC = the diff against v2; the merge must reproduce v2 exactly
    * (the oracle rebuilds v2 directly from the documents table, so
    * any drift in diff classification, CDC translation, bucket
    * routing, or merge arithmetic fails the row hash). */
  def mergeApplyDerived(docs: DataFrame): DataFrame = {
    val v1 = docs.filter(col("doc_id") % 10 =!= DiffAddedMod)
      .select(col("doc_id"), col("text"))
    mergeApply(v1, cdcFromDiff(docs))
  }

  /** File-backed copy-on-write MERGE — the table-maintenance action
    * on a bucket-partitioned parquet directory (`bucket=<b>/`
    * subdirs): rewrites ONLY the touched buckets' files, leaves cold
    * bucket files physically untouched (MergeApplySpec asserts their
    * bytes and mtimes survive), and is exact-retry idempotent.
    *
    * Execution shape (the 100 TB argument): the touched buckets are
    * read as ONE multi-path scan (partition pruning by explicit path
    * list — cold buckets contribute zero input splits), merged with
    * the CDC frame in one join, and rewritten by ONE dynamic-
    * partition-overwrite write job — every touched bucket's rewrite
    * runs in parallel across the cluster. MergeApplySpec pins the
    * job count constant in the number of touched buckets (the r10
    * version submitted one serial Spark job PER bucket: wall-clock
    * O(#touched × job latency) — the scale-killer at thousands of
    * touched buckets). Only hot-bucket rows ever move; the exchange
    * is bounded by |touched data| + |CDC|, never the table.
    *
    * Crash safety: the write goes through Spark's commit protocol
    * (staged in `_temporary`, atomically promoted per partition at
    * job commit), replacing the r10 delete-then-`renameTo` swap whose
    * failure window could drop a bucket. A retry after ANY crash
    * point re-applies the same CDC batch against the surviving table
    * state and converges: upserts overwrite to equal values, deletes
    * of absent keys are no-ops (apply∘apply = apply, spec-pinned). */
  def mergeApplyTable(spark: org.apache.spark.sql.SparkSession,
      dir: String, cdc: DataFrame,
      buckets: Int = MergeBuckets): Unit = {
    val cdcB = cdc.select(col("doc_id"), col("op"), col("new_text"))
      .withColumn("bucket", col("doc_id") % buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bounded collect: one long per touched bucket, ≤ `buckets` rows
    val touched = cdcB.select(col("bucket")).distinct()
      .collect().map(_.getLong(0)).sorted
    if (touched.isEmpty) { cdcB.unpersist(); return }
    val existingPaths = touched.map(b => s"$dir/bucket=$b")
      .filter(p => new java.io.File(p).exists())
    val existing =
      if (existingPaths.nonEmpty)
        spark.read.option("basePath", dir)
          .parquet(existingPaths.toIndexedSeq: _*)
          .select(col("doc_id"), col("text"),
            col("bucket").cast("long").as("bucket"))
      else spark.range(0).select(col("id").as("doc_id"),
        lit("").as("text"), col("id").as("bucket"))
    val merged = existing
      .join(cdcB.select(col("doc_id"), col("op"), col("new_text"),
        col("bucket").as("cdc_bucket")), Seq("doc_id"), "full_outer")
      .filter(coalesce(col("op"), lit("keep")) =!= "delete")
      .select(col("doc_id"),
        coalesce(col("bucket"), col("cdc_bucket")).as("bucket"),
        when(col("op") === "upsert", col("new_text"))
          .otherwise(col("text")).as("text"))
      // hot rows only; read twice (surviving-bucket probe + write)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // a touched bucket whose rows were ALL deleted emits no output
    // partition, which dynamic overwrite would silently leave stale —
    // probe the surviving bucket set (bounded: ≤ |touched| longs)
    val surviving = merged.select(col("bucket")).distinct()
      .collect().map(_.getLong(0)).toSet
    // ONE write job; `dynamic` replaces exactly the partitions present
    // in the output, cold buckets are never listed, staged, or touched.
    // repartition by bucket so each touched bucket lands as one file.
    merged.repartition(col("bucket"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(dir)
    merged.unpersist()
    cdcB.unpersist()
    touched.filterNot(surviving).foreach { b =>
      val dead = new java.io.File(s"$dir/bucket=$b")
      if (dead.exists()) {
        dead.listFiles().foreach(_.delete())
        if (!dead.delete())
          throw new java.io.IOException(s"could not clear emptied $dead")
      }
    }
  }

  /** FIM sentinel tokens — the public StarCoder/SantaCoder
    * convention for the fill-in-the-middle objective. */
  val FimPrefixTok = "<fim_prefix>"
  val FimSuffixTok = "<fim_suffix>"
  val FimMiddleTok = "<fim_middle>"

  /** FILL-IN-THE-MIDDLE transform (q234) — the code-training data
    * permutation (Bavarian et al. 2022; the StarCoder pipeline's
    * standard pass): for a deterministic ~half of the corpus, split
    * the token sequence at two hash-derived cut points and emit the
    * PSM reordering `<fim_prefix> P <fim_suffix> S <fim_middle> M`,
    * teaching the model to infill; the rest pass through unchanged.
    * FIM PERMUTES, never drops — the spec pins exact token-multiset
    * preservation and round-trip reconstruction from the parts.
    * Document selection and both cut points are the house Knuth mix
    * (high-bit extraction, ids masked < 2³¹ before the multiply), so
    * the oracle mirrors every split exactly.
    *
    * Scale design (100 TB): entirely row-local — one projection, no
    * shuffle, no state; the transform composes anywhere in the
    * funnel at scan cost. */
  def fimTransform(docs: DataFrame): DataFrame = {
    import Sampling.HashMult
    val staged = docs
      .select(col("doc_id"), col("text"),
        split(col("text"), " ").as("w"))
      .withColumn("n", size(col("w")).cast("long"))
      .withColumn("mixA",
        expr(s"((doc_id & 2147483647) * ${HashMult}L) DIV 1048576"))
      .withColumn("mixB", expr(
        s"((((doc_id & 2147483647) * 31 + 7) & 2147483647) * ${HashMult}L) DIV 1048576"))
      .withColumn("fim", col("mixA") % 2 === 0 && col("n") >= 3)
      .withColumn("m1", col("mixA") % (col("n") + 1))
      .withColumn("m2", col("mixB") % (col("n") + 1))
      .withColumn("a", least(col("m1"), col("m2")))
      .withColumn("b", greatest(col("m1"), col("m2")))
    staged.select(col("doc_id"), col("fim"),
      when(col("fim"), col("a")).otherwise(col("n")).as("n_prefix"),
      when(col("fim"), col("b") - col("a")).otherwise(0L)
        .as("n_middle"),
      when(col("fim"), col("n") - col("b")).otherwise(0L)
        .as("n_suffix"),
      when(col("fim"), concat(
        lit(FimPrefixTok + " "),
        array_join(slice(col("w"), lit(1), col("a").cast("int")), " "),
        lit(" " + FimSuffixTok + " "),
        array_join(slice(col("w"), (col("b") + 1).cast("int"),
          (col("n") - col("b")).cast("int")), " "),
        lit(" " + FimMiddleTok + " "),
        array_join(slice(col("w"), (col("a") + 1).cast("int"),
          (col("b") - col("a")).cast("int")), " ")))
        .otherwise(col("text")).as("text"))
  }

  /** Span-corruption knobs (q238): aligned block width and the
    * 1-in-[[CorruptDen]] block-mask rate (≈14% of tokens — the
    * T5 recipe's ~15% with mean span 3). */
  val CorruptBlock = 3
  val CorruptDen = 7

  /** SPAN-CORRUPTION transform (q238) — the T5 denoising objective's
    * data pass (Raffel et al. 2020), the sibling of q234's FIM:
    * token positions partition into aligned [[CorruptBlock]]-token
    * blocks, a deterministic 1-in-[[CorruptDen]] of blocks (house
    * Knuth mix on (doc_id, block), ids masked < 2³¹) is masked, the
    * INPUT replaces each masked block with its ordinal sentinel
    * `<extra_id_k>`, and the TARGET lists each sentinel followed by
    * the tokens it hides — the (inputs, targets) pair a denoising
    * trainer consumes. Aligned blocks make the mask per-position
    * independent (no sequential "already in a span" state), so both
    * engines derive identical spans from pure arithmetic; sentinel
    * ordinals are the running count of masked blocks before each
    * block (a bounded per-row list fold, row-local).
    *
    * Scale design (100 TB): one projection over per-row list
    * kernels — no shuffle, no state; block count per doc is
    * len/3, and the ordinal fold is O(blocks²) on ≤ tens of blocks
    * per document, constant per row. */
  def spanCorrupt(docs: DataFrame): DataFrame = {
    import Sampling.HashMult
    // per-block mask flag: mixed high bits of (doc_id, block)
    val staged = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("nb",
        ceil(size(col("w")) / lit(CorruptBlock.toDouble)).cast("int"))
      .withColumn("flags", expr(
        s"""transform(sequence(0, nb - 1), b ->
           (((((doc_id & 2147483647) * 97 + b) & 2147483647) * ${HashMult}L)
             DIV 1048576) % $CorruptDen = 0)"""))
      // ordinal of each masked block = masked blocks strictly before
      .withColumn("ord", expr(
        """transform(sequence(0, nb - 1), b ->
           size(filter(slice(flags, 1, b), x -> x)))"""))
    staged.select(col("doc_id"),
      // NOTE: Spark's arr[i] is 0-based (DuckDB's is 1-based; the
      // oracle mirrors with [b + 1])
      expr(s"""array_join(transform(sequence(0, nb - 1), b ->
          CASE WHEN flags[b]
               THEN concat('<extra_id_', ord[b], '>')
               ELSE array_join(slice(w, b * $CorruptBlock + 1,
                 $CorruptBlock), ' ') END), ' ')""").as("input_text"),
      expr(s"""array_join(transform(
          filter(sequence(0, nb - 1), b -> flags[b]), b ->
          concat('<extra_id_', ord[b], '> ',
            array_join(slice(w, b * $CorruptBlock + 1,
              $CorruptBlock), ' '))), ' ')""").as("targets_text"),
      expr("size(filter(flags, x -> x))").cast("long")
        .as("n_masked_blocks"))
  }

  /** Added-column table READ (q230): buckets written before an ADD
    * COLUMN physically lack it (schema evolution rewrites no cold
    * data), so the table read is schema-MERGED and null-fills files
    * that predate the column — the Delta/Iceberg read contract,
    * where the schema lives in metadata and old files are never
    * touched. */
  def readEvolvedTable(spark: org.apache.spark.sql.SparkSession,
      dir: String, addedCols: Seq[String]): DataFrame = {
    val base = spark.read.option("mergeSchema", "true").parquet(dir)
    addedCols.foldLeft(base) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast("string"))
    }
  }

  /** Schema-EVOLVING file-backed MERGE (q230) — [[mergeApplyTable]]
    * across an ADD COLUMN boundary: the CDC batch carries
    * `new_<col>` for each added column, and applying it EVOLVES the
    * table — rewritten (touched) buckets gain the column, cold
    * buckets stay physically untouched (spec pins bytes + mtimes
    * across the boundary) and null-fill at read via
    * [[readEvolvedTable]]. An upsert REPLACES the whole row (text
    * AND added columns — the MERGE ... UPDATE SET semantics);
    * untouched rows in rewritten buckets keep their prior values
    * (null for rows that predate the column). Idempotent like the
    * base merge: re-applying the batch is a bit-identical no-op.
    *
    * Scale design (100 TB): identical to [[mergeApplyTable]] (the
    * ONE dynamic-overwrite write job over touched buckets only);
    * ADD COLUMN itself costs ZERO data movement — no backfill job
    * exists, old files simply read as null through the merged
    * schema. */
  def mergeApplyTableEvolved(spark: org.apache.spark.sql.SparkSession,
      dir: String, cdc: DataFrame, addedCols: Seq[String],
      buckets: Int = MergeBuckets): Unit = {
    val cdcB = cdc.select(Seq(col("doc_id"), col("op"),
        col("new_text")) ++ addedCols.map(c => col(s"new_$c")): _*)
      .withColumn("bucket", col("doc_id") % buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bounded collect: one long per touched bucket, ≤ `buckets` rows
    val touched = cdcB.select(col("bucket")).distinct()
      .collect().map(_.getLong(0)).sorted
    if (touched.isEmpty) { cdcB.unpersist(); return }
    val existingPaths = touched.map(b => s"$dir/bucket=$b")
      .filter(p => new java.io.File(p).exists())
    val existing =
      if (existingPaths.nonEmpty) {
        val read0 = spark.read.option("basePath", dir)
          .option("mergeSchema", "true")
          .parquet(existingPaths.toIndexedSeq: _*)
        val filled = addedCols.foldLeft(read0) { (df, c) =>
          if (df.columns.contains(c)) df
          else df.withColumn(c, lit(null).cast("string"))
        }
        filled.select(Seq(col("doc_id"), col("text"),
          col("bucket").cast("long").as("bucket")) ++
          addedCols.map(col): _*)
      } else {
        val empty0 = spark.range(0).select(col("id").as("doc_id"),
          lit("").as("text"), col("id").as("bucket"))
        addedCols.foldLeft(empty0)((df, c) =>
          df.withColumn(c, lit(null).cast("string")))
      }
    val merged = existing
      .join(cdcB.select(Seq(col("doc_id"), col("op"), col("new_text"),
          col("bucket").as("cdc_bucket")) ++
          addedCols.map(c => col(s"new_$c")): _*),
        Seq("doc_id"), "full_outer")
      .filter(coalesce(col("op"), lit("keep")) =!= "delete")
      .select(Seq(col("doc_id"),
        coalesce(col("bucket"), col("cdc_bucket")).as("bucket"),
        when(col("op") === "upsert", col("new_text"))
          .otherwise(col("text")).as("text")) ++
        addedCols.map(c =>
          when(col("op") === "upsert", col(s"new_$c"))
            .otherwise(col(c)).as(c)): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val surviving = merged.select(col("bucket")).distinct()
      .collect().map(_.getLong(0)).toSet
    merged.repartition(col("bucket"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(dir)
    merged.unpersist()
    cdcB.unpersist()
    touched.filterNot(surviving).foreach { b =>
      val dead = new java.io.File(s"$dir/bucket=$b")
      if (dead.exists()) {
        dead.listFiles().foreach(_.delete())
        if (!dead.delete())
          throw new java.io.IOException(s"could not clear emptied $dead")
      }
    }
  }

  /** Bucket counts per partition-spec generation of the q245
    * respec table: spec 0 writes doc_id % 4, the respec commit
    * moves the ACTIVE spec to doc_id % 8. */
  val RespecBuckets: Seq[Int] = Seq(4, 8)

  /** PARTITION-SPEC evolution merge (q245) — the Iceberg sibling of
    * q224/q230's schema evolution: a bucket-count change mid-log is
    * a METADATA commit; existing files keep their old layout
    * (`spec=<id>/bucket=<b>` directories), new/rewritten data is
    * written under the ACTIVE spec, and old-layout data migrates
    * LAZILY — exactly the files a merge touches, never a table
    * rewrite (Iceberg's copy-on-write rule: a rewritten file adopts
    * the current spec). Readers resolve BOTH layouts; a row's
    * physical home is wherever its last rewrite put it.
    *
    * One merge under `activeSpec`:
    * (1) the CDC keys locate their buckets under EVERY spec
    *     generation (bounded collects, ≤ Σ bucket counts longs);
    * (2) touched OLD-spec buckets are read WHOLE — their co-resident
    *     untouched rows ride along and MIGRATE (the copy-on-write
    *     file rewrite), so each old-spec directory is consumed
    *     exactly once and deleted after the write;
    * (3) the output active-spec buckets (cdc keys ∪ migrating rows)
    *     are read too — dynamic overwrite replaces whole partitions,
    *     so any partition the write lands in must carry its prior
    *     rows through the merge;
    * (4) latest-wins merge (the unchanged [[mergeApplyTable]] rule),
    *     one dynamic-overwrite write under `spec=activeSpec`, then
    *     the consumed old-spec directories drop and emptied active
    *     buckets clear.
    * Cold buckets — any spec — are never listed, read, staged, or
    * touched: PipelineSpec pins their bytes AND mtimes across a
    * post-respec merge (the q230 discipline).
    *
    * Scale design (100 TB): cost is |cdc| + |touched buckets|, never
    * |table|; the spec change itself costs ZERO data movement (a
    * constant in this function's arguments — the metadata commit),
    * and migration debt is paid per-bucket exactly when a bucket is
    * next written, the Iceberg lazy-migration contract. */
  def mergeApplyTableRespec(spark: org.apache.spark.sql.SparkSession,
      dir: String, cdc: DataFrame, activeSpec: Int,
      specBuckets: Seq[Int] = RespecBuckets): Unit = {
    val bAct = specBuckets(activeSpec)
    val cdcB = cdc.select(col("doc_id"), col("op"), col("new_text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keys = cdcB.select(col("doc_id")).distinct()
    // (1) touched buckets per OLD spec — bounded collect each
    val oldSpecPaths: Seq[(Int, Long, String)] =
      specBuckets.indices.filterNot(_ == activeSpec).flatMap { s =>
        keys.select((col("doc_id") % specBuckets(s)).as("b"))
          .distinct().collect().map(_.getLong(0)).sorted
          .map(b => (s, b, s"$dir/spec=$s/bucket=$b"))
          .filter(t => new java.io.File(t._3).exists())
      }
    def readParts(paths: Seq[String]): DataFrame =
      if (paths.nonEmpty)
        spark.read.option("basePath", dir).parquet(paths: _*)
          .select(col("doc_id"), col("text"))
      else spark.range(0).select(col("id").as("doc_id"),
        lit("").as("text"))
    // (2) old-layout rows — co-residents migrate with this write
    val oldRows = readParts(oldSpecPaths.map(_._3))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // (3) every active bucket this write can land in (bounded ≤ bAct)
    val outBuckets = keys.select((col("doc_id") % bAct).as("b"))
      .unionByName(oldRows.select((col("doc_id") % bAct).as("b")))
      .distinct().collect().map(_.getLong(0)).sorted
    if (outBuckets.isEmpty) {
      oldRows.unpersist(); cdcB.unpersist(); return
    }
    val activePaths = outBuckets
      .map(b => s"$dir/spec=$activeSpec/bucket=$b")
      .filter(p => new java.io.File(p).exists())
    val existing = oldRows.unionByName(readParts(activePaths.toSeq))
    val merged = existing
      .join(cdcB, Seq("doc_id"), "full_outer")
      .filter(coalesce(col("op"), lit("keep")) =!= "delete")
      .select(col("doc_id"), (col("doc_id") % bAct).as("bucket"),
        when(col("op") === "upsert", col("new_text"))
          .otherwise(col("text")).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val surviving = merged.select(col("bucket")).distinct()
      .collect().map(_.getLong(0)).toSet
    merged.withColumn("spec", lit(activeSpec))
      .repartition(col("bucket"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("spec", "bucket")
      .parquet(dir)
    merged.unpersist(); oldRows.unpersist(); cdcB.unpersist()
    // consumed old-layout directories: their rows migrated above
    oldSpecPaths.foreach { case (_, _, p) =>
      val d = new java.io.File(p)
      if (d.exists()) {
        d.listFiles().foreach(_.delete())
        if (!d.delete())
          throw new java.io.IOException(s"could not drop migrated $d")
      }
    }
    // emptied active buckets (every row deleted) must not stay stale
    outBuckets.filterNot(surviving).foreach { b =>
      val dead = new java.io.File(s"$dir/spec=$activeSpec/bucket=$b")
      if (dead.exists()) {
        dead.listFiles().foreach(_.delete())
        if (!dead.delete())
          throw new java.io.IOException(s"could not clear emptied $dead")
      }
    }
  }

  /** Read a respec table across ALL spec layouts:
    * (doc_id, spec, bucket, text). */
  def readRespecTable(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    spark.read.option("basePath", dir).parquet(dir)
      .select(col("doc_id"), col("spec").cast("long").as("spec"),
        col("bucket").cast("long").as("bucket"), col("text"))

  /** CDC batch between ANY two snapshot versions (generalizes
    * [[cdcFromDiff]], whose derivation is hardwired to the graded
    * v1→v2 pair): added/changed → upsert carrying the TARGET text,
    * removed → delete. One full-outer hash join on the id — the q120
    * diff shape — plus a target-side text fetch folded into the same
    * join (no second pass over either snapshot). */
  def cdcBetween(va: DataFrame, vb: DataFrame): DataFrame = {
    val a = va.select(col("doc_id"), md5(col("text")).as("old_hash"))
    val b = vb.select(col("doc_id"), md5(col("text")).as("new_hash"),
      col("text").as("new_text"))
    a.join(b, Seq("doc_id"), "full_outer")
      .filter(col("old_hash").isNull || col("new_hash").isNull ||
        col("old_hash") =!= col("new_hash"))
      .select(col("doc_id"),
        when(col("new_hash").isNull, "delete").otherwise("upsert")
          .as("op"),
        when(col("new_hash").isNotNull, col("new_text")).as("new_text"))
  }

  /** As-of snapshot reconstruction (q188) — lakehouse TIME TRAVEL
    * from a base snapshot plus an ordered CDC log (`version`,
    * `doc_id`, `op`, `new_text`; one op per key per version, the
    * contract every CDC batch here satisfies by construction):
    * rebuild the table exactly as of version `asOf` WITHOUT replaying
    * batches one at a time.
    *
    * The scalable path: a key's state at `asOf` depends only on its
    * LATEST log entry ≤ `asOf` — so the reconstruction is ONE window
    * over the version-filtered log (partitioned by id, ordered by
    * version DESC — the log is the skinny side, orders of magnitude
    * smaller than the table) and ONE full-outer join with the base
    * snapshot. Cost is |log ≤ asOf| + |base|, INDEPENDENT of how many
    * versions the log spans — the property that makes deep version
    * histories readable at 100 TB, where sequential
    * [[mergeApply]]-per-batch replay would pay a table-sized join per
    * version. (The two designs must agree; the spec pins
    * asOf(k) ≡ the k-fold sequential merge on the graded log.) */
  def asOfReconstruct(base: DataFrame, log: DataFrame,
      asOf: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val latest = log.filter(col("version") <= asOf)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("version").desc)))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("op"), col("new_text"))
    base.select(col("doc_id"), col("text"))
      .join(latest, Seq("doc_id"), "full_outer")
      .filter(coalesce(col("op"), lit("keep")) =!= "delete")
      .select(col("doc_id"),
        when(col("op") === "upsert", col("new_text"))
          .otherwise(col("text")).as("text"))
  }

  /** Graded q188 configuration — the derivation chain EXTENDED to a
    * third version with adversarial cross-version interactions:
    * v3 deletes the docs v2 CHANGED (changed-then-deleted: the
    * latest-wins rule must pick the delete over the upsert) and
    * changes the docs v2 ADDED (added-then-changed: the base never
    * saw the key; the version-2 upsert must win over version 1's).
    * The log is batch 1 = cdc(v1→v2) ∪ batch 2 = cdc(v2→v3);
    * asOf = 2 must reproduce v3 exactly, and the oracle rebuilds v3
    * directly from the documents table (the q171 closure
    * discipline). */
  def timeTravelDerived(docs: DataFrame): DataFrame = {
    val (v1, v2, v3) = timeTravelVersions(docs)
    val log = cdcBetween(v1, v2).withColumn("version", lit(1L))
      .unionByName(cdcBetween(v2, v3).withColumn("version", lit(2L)))
    asOfReconstruct(v1, log, asOf = 2L)
  }

  /** SCHEMA-EVOLVED as-of reconstruction (q224) — lakehouse time
    * travel across an ADD COLUMN boundary: `schemaAddVersions` maps
    * each added column name to the version whose commit added it
    * (the Delta/Iceberg metadata-log entry), the data log physically
    * carries `new_<col>` for every added column, and reconstruction
    * at `asOf` must pick the RIGHT SCHEMA PER VERSION — three rules,
    * each easy to get wrong with a naive latest-wins join:
    * (1) a column added after `asOf` is ABSENT from the output
    * (reading an old snapshot must not grow new columns);
    * (2) a log entry written BEFORE the column's add version can
    * never populate it, even if the physical log row carries a
    * value there (the writer's schema didn't have the column — the
    * value is noise, and the spec plants one to prove it's masked);
    * (3) base rows and pre-boundary winners read NULL (the add
    * default), post-boundary upserts carry their written values.
    * The data winner per key is the same single log window + one
    * full-outer join as [[asOfReconstruct]] — schema evolution adds
    * projection logic, never another pass.
    *
    * Scale design (100 TB): identical to q188 (skinny latest-entry
    * window + one co-partitioned full-outer join); the schema log is
    * metadata (a handful of entries, a driver-side Map), never a
    * data-path frame. */
  def asOfReconstructEvolved(base: DataFrame, log: DataFrame,
      schemaAddVersions: Map[String, Long], asOf: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val visible = schemaAddVersions.filter(_._2 <= asOf).keys.toSeq.sorted
    val latest = log.filter(col("version") <= asOf)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("version").desc)))
      .filter(col("rn") === 1)
      .select(Seq(col("doc_id"), col("op"), col("new_text"),
        col("version")) ++
        visible.map(c => col(s"new_$c")): _*)
    val joined = base.select(col("doc_id"), col("text"))
      .join(latest, Seq("doc_id"), "full_outer")
      .filter(coalesce(col("op"), lit("keep")) =!= "delete")
    val out = Seq(col("doc_id"),
      when(col("op") === "upsert", col("new_text"))
        .otherwise(col("text")).as("text")) ++
      visible.map { c =>
        when(col("op") === "upsert" &&
            col("version") >= schemaAddVersions(c), col(s"new_$c"))
          .otherwise(lit(null).cast("string")).as(c)
      }
    joined.select(out: _*)
  }

  /** Deterministic language tag carried by post-boundary upserts in
    * the q224 fixture (a pure doc_id function, oracle-mirrorable). */
  def evolvedLangCol(id: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    when(id % 2 === 0, "en").otherwise("de")

  /** Graded q224 configuration — the q188 three-version chain with a
    * `lang` column ADDED at version 2 (the v2→v3 commit): batch-1
    * entries predate the schema (new_lang null — their writer had no
    * such column), batch-2 upserts carry [[evolvedLangCol]].
    * asOf = 2 must produce v3's rows where ONLY docs last upserted at
    * version 2 (the added-then-changed ≡ 7 class) carry lang, every
    * pre-boundary row reads the NULL add-default, and the oracle
    * rebuilds the whole frame directly from the documents table (the
    * q171/q188 closure discipline). PipelineSpec crosses the boundary
    * the gate can't: asOf = 1 returns the OLD schema (no lang column
    * at all) with exactly v2's rows, and a planted pre-boundary
    * new_lang value is proven masked. */
  def schemaEvolutionDerived(docs: DataFrame): DataFrame = {
    val (v1, v2, v3) = timeTravelVersions(docs)
    asOfReconstructEvolved(v1, evolvedLog(v1, v2, v3),
      Map("lang" -> 2L), asOf = 2L)
  }

  /** The q188 v1/v2/v3 derivation, shared by q188/q215/q224. */
  def timeTravelVersions(docs: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val v1 = docs.filter(col("doc_id") % 10 =!= DiffAddedMod)
      .select(col("doc_id"), col("text"))
    val v2 = docs.filter(col("doc_id") % 10 =!= DiffRemovedMod)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === DiffChangedMod,
          concat(col("text"), lit(" v2"))).otherwise(col("text"))
          .as("text"))
    val v3 = docs.filter(col("doc_id") % 10 =!= DiffRemovedMod &&
        col("doc_id") % 10 =!= DiffChangedMod)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === DiffAddedMod,
          concat(col("text"), lit(" v3"))).otherwise(col("text"))
          .as("text"))
    (v1, v2, v3)
  }

  /** The evolved two-batch CDC log of [[schemaEvolutionDerived]]:
    * batch 1 (version 1, PRE-boundary) with null new_lang, batch 2
    * (version 2, the add-column commit) whose upserts carry the tag. */
  def evolvedLog(v1: DataFrame, v2: DataFrame, v3: DataFrame)
      : DataFrame =
    cdcBetween(v1, v2).withColumn("version", lit(1L))
      .withColumn("new_lang", lit(null).cast("string"))
      .unionByName(cdcBetween(v2, v3).withColumn("version", lit(2L))
        .withColumn("new_lang",
          when(col("op") === "upsert", evolvedLangCol(col("doc_id")))
            .otherwise(lit(null).cast("string"))))

  /** Retention VACUUM of a versioned table (q215) — the lifecycle
    * complement of q188's time travel: history older than the
    * retention horizon is FOLDED into a new base checkpoint
    * (one [[asOfReconstruct]] at the horizon — the same
    * latest-entry-wins window, so folding k versions costs one pass,
    * not k replays), and only log entries NEWER than the horizon are
    * retained. The compacted representation — checkpoint rows at
    * version 0 plus the retained tail — reconstructs any version ≥
    * the horizon EXACTLY (spec-pinned equivalence) while versions
    * before it become unreachable: that forgetting is the storage
    * reclamation (and the GDPR-erasure mechanism — a deleted
    * record's history physically leaves the log).
    *
    * Scale design (100 TB): the checkpoint is the q188 shape (skinny
    * log window + ONE full-outer join with the base); the retained
    * tail is a filter; content travels as 16-byte digests in the
    * audit output, never text. */
  def vacuumCompact(base: DataFrame, log: DataFrame,
      retainAfter: Long): DataFrame = {
    val checkpoint = asOfReconstruct(base, log, retainAfter)
      .select(lit(0L).as("version"), col("doc_id"),
        lit("base").as("op"), md5(col("text")).as("content"))
    val retained = log.filter(col("version") > retainAfter)
      .select(col("version"), col("doc_id"), col("op"),
        md5(coalesce(col("new_text"), lit(""))).as("content"))
    checkpoint.unionByName(retained)
  }

  /** Graded q215 configuration: the q188 three-version chain with
    * the horizon at version 1 — the checkpoint must equal v2 and the
    * retained tail must be exactly the v2→v3 CDC batch. */
  def vacuumDerived(docs: DataFrame): DataFrame = {
    val (v1, v2, v3) = timeTravelVersions(docs)
    val log = cdcBetween(v1, v2).withColumn("version", lit(1L))
      .unionByName(cdcBetween(v2, v3).withColumn("version", lit(2L)))
    vacuumCompact(v1, log, retainAfter = 1L)
  }

  def preprocessingFunnel(docs: DataFrame): DataFrame = {
    // ONE scan computes every row-local gate as a column; exact
    // dedup's canonical-min is a window over the content digest
    // evaluated on this same fused frame: one shuffle of the skinny
    // flag columns instead of a separate branch + join.
    val flags = rowLocalFlags(docs)
      .withColumn("keep_dedup", col("doc_id") === Dedup.canonicalIdCol)
      .drop("content_hash")
    // near-dup stage is the only genuine join branch: cluster labels
    // come from the iterative pair propagation, which cannot be a
    // row-local column.
    funnelRollup(flags,
      clusterKeepFlags(Dedup.minhashNearDups(docs)))
  }

  /** n-gram contamination cut of the decontaminated funnel (q223): a
    * document sharing at least this fraction of its winnow
    * fingerprints with the benchmark set is removed. The bar sits
    * high because fingerprint overlap has a vocabulary-driven floor
    * (the fixture corpus medians ~0.63 against a 20-doc benchmark);
    * the gate exists to cut verbatim/near-verbatim leaks, not
    * same-domain text. */
  val ContamFracThreshold = 0.75

  /** END-TO-END DECONTAMINATED funnel (q223) — the q36 preprocessing
    * funnel with the decontamination stage modern pipelines run
    * between quality filtering and the split (GPT-3 appendix C /
    * phi-style): dedup → near-dup → quality → language →
    * DECONTAMINATE → split, where decontaminate composes BOTH graded
    * screens — q43's n-gram overlap (winnow fingerprints vs the
    * broadcast benchmark gram set, cut at [[ContamFracThreshold]])
    * and q219's semantic screen (cross-set LSH + exact cosine
    * removal list over the embedding table) — plus removal of the
    * benchmark documents themselves (they ARE the eval set; training
    * on them is the leak the stage exists to prevent). A document
    * survives the stage iff it is not a benchmark member, not
    * n-gram-contaminated, and not semantically contaminated. The
    * oracle embeds the q43 and q219 oracle queries VERBATIM as CTEs,
    * so the composed gate is graded against exactly the screens it
    * composes.
    *
    * Scale design (100 TB): the two contamination screens are the
    * graded operators unchanged (benchmark side broadcast in both;
    * the corpus never meets itself); their output flag frames join
    * the funnel's flag frame on the SAME doc_id key as the near-dup
    * join — one partitioning serves all three joins — and everything
    * else is the q36 row-local single-scan design collapsing to one
    * 9-column row. */
  def decontaminatedFunnel(docs: DataFrame, emb: DataFrame): DataFrame = {
    val flags = rowLocalFlags(docs)
      .withColumn("keep_dedup", col("doc_id") === Dedup.canonicalIdCol)
      .drop("content_hash")
    val nd = clusterKeepFlags(Dedup.minhashNearDups(docs))
    val ng = Dedup.benchmarkContamination(docs)
      .filter(col("frac_shared") >= ContamFracThreshold)
      .select(col("doc_id"), lit(true).as("ng_hit"))
    val sem = Similarity.semanticContamination(emb)
      .select(col("corpus_vec").as("doc_id")).distinct()
      .withColumn("sem_hit", lit(true))
    decontamRollup(flags, nd, ng, sem)
  }

  /** The q223 one-row rollup over already-computed stage flags —
    * shared by the batch funnel above and the q246 streaming
    * finalize (whose flags/hits arrive from the wave queries).
    * `flags` = (doc_id, keep_dedup, keep_quality, keep_lang, split);
    * `nd` = (doc_id, keep_nd); `ng`/`sem` = hit doc_ids. */
  def decontamRollup(flags: DataFrame, nd: DataFrame, ng: DataFrame,
      sem: DataFrame): DataFrame = {
    val keepNd = col("keep_dedup") && coalesce(col("keep_nd"), lit(true))
    val kept = keepNd && col("keep_quality") && col("keep_lang")
    val clean = kept &&
      col("doc_id") >= Similarity.SemDecontamBenchBelow &&
      !coalesce(col("ng_hit"), lit(false)) &&
      !coalesce(col("sem_hit"), lit(false))
    flags
      .join(nd, Seq("doc_id"), "left")
      .join(ng, Seq("doc_id"), "left")
      .join(sem, Seq("doc_id"), "left")
      .agg(
        count(lit(1)).as("n_raw"),
        sum(col("keep_dedup").cast("long")).as("n_after_dedup"),
        sum(keepNd.cast("long")).as("n_after_neardup"),
        sum((keepNd && col("keep_quality")).cast("long"))
          .as("n_after_quality"),
        sum(kept.cast("long")).as("n_after_lang"),
        sum(clean.cast("long")).as("n_after_decontam"),
        sum((clean && col("split") === "train").cast("long"))
          .as("n_train"),
        sum((clean && col("split") === "validation").cast("long"))
          .as("n_validation"),
        sum((clean && col("split") === "test").cast("long")).as("n_test"))
  }

  /** k-anonymity knobs (q181): suppression threshold k and the fine/
    * coarse account-balance band widths of the generalization
    * ladder. */
  val AnonK = 5
  val AnonBandFine = 1000.0
  val AnonBandCoarse = 5000.0

  /** k-anonymous release with a generalization ladder (q181): each
    * customer's quasi-identifiers (nation, segment, balance band)
    * are released at the FINEST ladder level whose cohort still has
    * ≥ k members — level 0 (fine band), level 1 (coarse band),
    * level 2 (nation dropped), else fully suppressed. The subtlety
    * every naive implementation gets wrong: a coarser level's cohort
    * counts only the rows NOT already released at a finer level —
    * counting the whole coarse group would let a single straggler
    * ride a cohort that already left, releasing a 1-anonymous
    * record. Here r1/r2 count exactly the still-unreleased rows, so
    * every released cohort provably has ≥ k members (spec-pinned as
    * a closure over the output itself). The released key embeds the
    * ladder level (L0/L1/L2) so equal band VALUES at different
    * widths can never alias.
    *
    * Scale design (100 TB): cohort tables are bounded by the
    * quasi-identifier domain (|nations|·|segments|·bands — thousands
    * of rows however large the corpus), each built by one map-side-
    * combined aggregation and broadcast back; the record side is one
    * scan with row-local band arithmetic and three broadcast joins —
    * nothing corpus-sized ever shuffles. */
  def kAnonymize(customer: DataFrame, k: Int = AnonK): DataFrame = {
    val base = customer.select(col("c_custkey"),
      col("c_nationkey").cast("long").as("nation"),
      col("c_mktsegment").as("segment"),
      floor(col("c_acctbal") / AnonBandFine).as("band0"),
      floor(col("c_acctbal") / AnonBandCoarse).as("band1"))
    val g0 = base.groupBy(col("nation"), col("segment"), col("band0"))
      .agg(count(lit(1)).as("n0"))
    val b0 = base.join(broadcast(g0), Seq("nation", "segment", "band0"))
      .withColumn("rel0", col("n0") >= k)
    val g1 = b0.groupBy(col("nation"), col("segment"), col("band1"))
      .agg(sum(when(!col("rel0"), 1L).otherwise(0L)).as("r1"))
    val b1 = b0.join(broadcast(g1), Seq("nation", "segment", "band1"))
      .withColumn("rel1", !col("rel0") && col("r1") >= k)
    val g2 = b1.groupBy(col("segment"), col("band1"))
      .agg(sum(when(!col("rel0") && !col("rel1"), 1L).otherwise(0L))
        .as("r2"))
    b1.join(broadcast(g2), Seq("segment", "band1"))
      .withColumn("rel2", !col("rel0") && !col("rel1") && col("r2") >= k)
      .select(col("c_custkey"),
        when(col("rel0"), lit(0)).when(col("rel1"), lit(1))
          .when(col("rel2"), lit(2)).otherwise(lit(3)).as("anon_level"),
        when(col("rel0"), concat_ws("|", lit("L0"), col("nation"),
            col("segment"), col("band0")))
          .when(col("rel1"), concat_ws("|", lit("L1"), col("nation"),
            col("segment"), col("band1")))
          .when(col("rel2"), concat_ws("|", lit("L2"), col("segment"),
            col("band1")))
          .otherwise(lit("*")).as("released_key"),
        when(col("rel0"), col("n0")).when(col("rel1"), col("r1"))
          .when(col("rel2"), col("r2"))
          .otherwise(lit(null).cast("long")).as("cohort_size"))
  }

  /** l-diversity knobs (q197): minimum distinct sensitive values per
    * released class, and the frequency cap of the simplified
    * (c,l)-rule — the most common sensitive value may hold at most
    * [[AnonFreqNum]]/[[AnonFreqDen]] of a class (60%), compared by
    * exact integer cross-multiplication so Spark and DuckDB agree
    * bit-for-bit. */
  val AnonL = 3
  val AnonFreqNum = 3
  val AnonFreqDen = 5

  /** l-diverse release audit (q197) — the attribute-disclosure
    * complement of [[kAnonymize]]'s identity protection: a class
    * that is k-anonymous but whose members all share one sensitive
    * value still leaks that value (the homogeneity attack
    * l-diversity exists to stop). Equivalence classes are the
    * quasi-identifier pair (nation, segment); the sensitive
    * attribute is the fine account-balance band. A class is released
    * only when (1) it has ≥ [[AnonK]] members, (2) its members span
    * ≥ [[AnonL]] DISTINCT sensitive values, and (3) no single
    * sensitive value exceeds the [[AnonFreqNum]]/[[AnonFreqDen]]
    * frequency cap — the simplified recursive-(c,l) guard against a
    * class that is nominally diverse but 95% one value. Output is
    * the per-class audit table (size, distinct count, modal count,
    * release verdict), the artifact a privacy review signs off on.
    *
    * Scale design (100 TB): both aggregations are map-side-combined
    * rollups onto keys bounded by the quasi-identifier × band domain
    * (thousands of rows at any corpus size — |nations|·|segments|·
    * bands); nothing record-sized survives the first shuffle, every
    * verdict is exact-integer arithmetic on the reduced frame, and
    * the audit table itself is broadcastable back against the record
    * corpus for suppression at release time. */
  def lDiversityAudit(customer: DataFrame, k: Int = AnonK,
      l: Int = AnonL): DataFrame = {
    val base = customer.select(
      col("c_nationkey").cast("long").as("nation"),
      col("c_mktsegment").as("segment"),
      floor(col("c_acctbal") / AnonBandFine).as("sens"))
    val perSens = base.groupBy(col("nation"), col("segment"), col("sens"))
      .agg(count(lit(1)).as("n_sens"))
    perSens.groupBy(col("nation"), col("segment"))
      .agg(sum(col("n_sens")).as("class_size"),
        count(lit(1)).as("l_distinct"),
        max(col("n_sens")).as("modal_count"))
      .withColumn("released",
        col("class_size") >= k && col("l_distinct") >= l &&
          col("modal_count") * AnonFreqDen <=
            col("class_size") * AnonFreqNum)
  }

  // ---------------------------------------------------------------
  // SFT chat-template assembly (q303) — pretraining packs raw text;
  // instruction tuning renders CONVERSATIONS into a template with
  // control tokens and computes loss only on assistant spans. The
  // render and the loss-mask accounting are the operator; both are
  // row-local.
  // ---------------------------------------------------------------

  val ChatSystem = "You are a helpful assistant."
  private val ImS = "<|im_start|>"
  private val ImE = "<|im_end|>"

  /** Whitespace token count of a possibly-empty span (split('')
    * yields [''] — size 1 — so the empty case is explicit). */
  private def spanTokens(s: Column): Column =
    when(length(s) === 0, lit(0L))
      .otherwise(size(split(s, " ")).cast("long"))

  /** q303: documents → a ChatML-rendered conversation (the widely
    * published `<|im_start|>role\n…<|im_end|>` template): docs with
    * ≥ 4 words become TWO user/assistant exchanges (word quarters),
    * shorter docs one (halves; a 1-word doc keeps an empty
    * assistant span — rendered, zero loss tokens, never a crash).
    * Output: (doc_id, n_turns, n_control, n_tokens_prompt,
    * n_tokens_loss, loss_frac, n_chars, template_md5). The LOSS
    * MASK rule, stated: loss tokens are the assistant spans'
    * whitespace tokens ONLY — system/user text and every control
    * token are masked (the standard SFT recipe). Row-local; the
    * template digest makes the render auditable byte-for-byte. */
  def chatTemplate(docs: DataFrame): DataFrame = {
    val w = split(col("text"), " ")
    val n = size(w)
    val n4 = floor(n / lit(4)).cast("int")
    val n2 = floor(n / lit(2)).cast("int")
    val n34 = floor(n * lit(3) / lit(4)).cast("int")
    val nc = ceil(n / lit(2.0)).cast("int")
    def join(from: Column, to: Column): Column =
      array_join(slice(w, from, greatest(to - from + 1, lit(0))), " ")
    val two = n >= 4
    val u1 = when(two, join(lit(1), n4)).otherwise(join(lit(1), nc))
    val a1 = when(two, join(n4 + 1, n2)).otherwise(join(nc + 1, n))
    val u2 = when(two, join(n2 + 1, n34)).otherwise(lit(""))
    val a2 = when(two, join(n34 + 1, n)).otherwise(lit(""))
    def turn(role: String, text: Column): Column =
      concat(lit(ImS + role + "\n"), text, lit(ImE + "\n"))
    val rendered = concat(
      turn("system", lit(ChatSystem)),
      turn("user", u1), turn("assistant", a1),
      when(two, concat(turn("user", u2), turn("assistant", a2)))
        .otherwise(lit("")))
    val nTurns = when(two, lit(4L)).otherwise(lit(2L))
    val prompt = spanTokens(lit(ChatSystem)) + spanTokens(u1) +
      spanTokens(u2)
    val loss = spanTokens(a1) + spanTokens(a2)
    docs.select(col("doc_id"),
      nTurns.as("n_turns"),
      ((nTurns + 1) * 2).as("n_control"),
      prompt.as("n_tokens_prompt"),
      loss.as("n_tokens_loss"),
      (loss.cast("double") /
        greatest(prompt + loss, lit(1L)).cast("double"))
        .as("loss_frac"),
      length(rendered).cast("long").as("n_chars"),
      md5(rendered).as("template_md5"))
  }

  // ---------------------------------------------------------------
  // preference-pair construction (q304) — the DPO/RLHF data step:
  // per prompt group, the best and worst candidate responses by the
  // q6 quality score become the (chosen, rejected) pair
  // ---------------------------------------------------------------

  /** Prompt-group modulus of [[preferencePairs]]. */
  val PromptGroups = 50L

  /** q304: documents bucketed into [[PromptGroups]] prompt groups
    * (doc_id % groups — the fixture's stand-in for "responses to
    * one prompt"); per group the CHOSEN is the quality argmax
    * (ties → lowest doc_id) and the REJECTED the argmin (ties →
    * highest doc_id — so a fully-tied group still yields a distinct
    * pair), groups of one are dropped: (prompt_id, chosen_id,
    * rejected_id, chosen_q, rejected_q, margin, n_candidates).
    * One map-side-combined rollup; no window, no self-join. */
  def preferencePairs(docs: DataFrame): DataFrame = {
    val q = TextAnalysis.qualityScoreCol(col("text"))
    docs.select((col("doc_id") % PromptGroups).as("prompt_id"),
      col("doc_id"), q.as("q"))
      .groupBy(col("prompt_id"))
      .agg(
        max(struct(col("q"), (-col("doc_id")).as("nid"))).as("c"),
        min(struct(col("q"), (-col("doc_id")).as("nid"))).as("r"),
        count(lit(1)).as("n_candidates"))
      .filter(col("n_candidates") >= 2)
      .select(col("prompt_id"),
        (-col("c.nid")).as("chosen_id"),
        (-col("r.nid")).as("rejected_id"),
        col("c.q").as("chosen_q"),
        col("r.q").as("rejected_q"),
        (col("c.q") - col("r.q")).as("margin"),
        col("n_candidates"))
  }
}
