package graft.operators

import graft.SparkSessionSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The lakehouse MERGE / CDC-apply operator (q171): closure against
  * the direct v2 derivation, EXACT-RETRY idempotence (the re-delivery
  * contract), and the file-backed copy-on-write form's physical
  * guarantee — cold bucket files are not rewritten. */
class MergeApplySpec extends AnyFunSuite with SparkSessionSpec {

  private def docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def tableHash(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(r => s"${r.getLong(0)}|${r.getString(1)}").toSet

  test("merge closure: merge(v1, cdc(v1->v2)) reproduces v2 exactly; " +
      "bucket routing is doc_id % buckets") {
    val merged = Pipeline.mergeApplyDerived(docs).collect()
    val v2 = docs
      .filter(col("doc_id") % 10 =!= Pipeline.DiffRemovedMod)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === Pipeline.DiffChangedMod,
          concat(col("text"), lit(" v2"))).otherwise(col("text"))
          .as("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(merged.length == v2.size)
    merged.foreach { r =>
      assert(v2(r.getAs[Long]("doc_id")) == r.getAs[String]("text"))
      assert(r.getAs[Long]("bucket") ==
        r.getAs[Long]("doc_id") % Pipeline.MergeBuckets)
    }
  }

  test("exact-retry idempotence: re-applying the same CDC batch " +
      "leaves the table identical (upsert overwrites equal, absent " +
      "delete is a no-op)") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (17L, "q"), (33L, "z"))
      .toDF("doc_id", "text")
    val cdc = Seq((2L, "upsert", "b2"), (5L, "upsert", "new"),
      (17L, "delete", null.asInstanceOf[String]),
      (99L, "delete", null.asInstanceOf[String])) // absent key delete
      .toDF("doc_id", "op", "new_text")
    val once = Pipeline.mergeApply(base, cdc)
    val onceRows = tableHash(once.select(col("doc_id"), col("text")))
    assert(onceRows == Set("1|a", "2|b2", "5|new", "33|z"))
    val twice = Pipeline.mergeApply(once.select(col("doc_id"), col("text")), cdc)
    assert(tableHash(twice.select(col("doc_id"), col("text"))) == onceRows)
  }

  test("file-backed copy-on-write: cold bucket files physically " +
      "untouched (bytes + mtime), touched buckets rewritten, " +
      "re-delivery leaves the table identical") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("merge_apply").toString
    // base table: ids 0..63 over 16 buckets (4 per bucket)
    val base = (0L until 64L).map(i => (i, s"text$i")).toDF("doc_id", "text")
      .withColumn("bucket", col("doc_id") % Pipeline.MergeBuckets)
    base.write.partitionBy("bucket").mode("overwrite").parquet(dir)
    // CDC touches ONLY buckets 3 (upsert id 3 -> id 3+16k) and 7
    val cdc = Seq((3L, "upsert", "patched"), (19L, "delete",
      null.asInstanceOf[String]), (71L, "upsert", "inserted"))
      .toDF("doc_id", "op", "new_text") // 71 % 16 = 7
    def snapshot(b: Long): Map[String, (Long, Long)] = {
      val d = new java.io.File(s"$dir/bucket=$b")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    }
    val coldBefore = (0L until 16L).filterNot(Set(3L, 7L))
      .map(b => b -> snapshot(b)).toMap
    Thread.sleep(1100) // mtime granularity
    Pipeline.mergeApplyTable(spark, dir, cdc)
    // cold buckets: identical file names, lengths AND mtimes
    coldBefore.foreach { case (b, before) =>
      assert(snapshot(b) == before, s"cold bucket $b was rewritten")
    }
    // logical result correct
    val after = spark.read.parquet(dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after(3L) == "patched")
    assert(!after.contains(19L))
    assert(after(71L) == "inserted")
    assert(after.size == 64 - 1 + 1)
    // re-delivery: identical table afterwards
    Pipeline.mergeApplyTable(spark, dir, cdc)
    val again = spark.read.parquet(dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == after)
  }

  test("schema-evolving merge (q230): ADD COLUMN rewrites NO cold " +
      "data (bytes + mtime pinned across the boundary), old files " +
      "null-fill through the merged-schema read, upserts carry the " +
      "column, re-delivery is idempotent") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("merge_evolve").toString
    val base = (0L until 64L).map(i => (i, s"text$i"))
      .toDF("doc_id", "text")
      .withColumn("bucket", col("doc_id") % Pipeline.MergeBuckets)
    base.write.partitionBy("bucket").mode("overwrite").parquet(dir)
    // the add-column batch touches ONLY buckets 5 and 9
    val cdc = Seq(
      (5L, "upsert", "patched5", "en"),
      (21L, "delete", null.asInstanceOf[String],
        null.asInstanceOf[String]),
      (73L, "upsert", "inserted73", "de")) // 73 % 16 = 9
      .toDF("doc_id", "op", "new_text", "new_lang")
    def snapshot(b: Long): Map[String, (Long, Long)] = {
      val d = new java.io.File(s"$dir/bucket=$b")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    }
    val coldBefore = (0L until 16L).filterNot(Set(5L, 9L))
      .map(b => b -> snapshot(b)).toMap
    Thread.sleep(1100) // mtime granularity
    Pipeline.mergeApplyTableEvolved(spark, dir, cdc, Seq("lang"))
    // the ADD COLUMN moved zero cold bytes
    coldBefore.foreach { case (b, before) =>
      assert(snapshot(b) == before,
        s"cold bucket $b was rewritten by the ADD COLUMN")
    }
    val after = Pipeline.readEvolvedTable(spark, dir, Seq("lang"))
      .select(col("doc_id"), col("text"), col("lang")).collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        Option(r.getString(2)))).toMap
    // upserts carry the column; the kept row in a TOUCHED bucket
    // (37 % 16 = 5) reads the null add-default; cold-bucket rows
    // null-fill through the merged-schema read
    assert(after(5L) == ("patched5", Some("en")))
    assert(after(73L) == ("inserted73", Some("de")))
    assert(!after.contains(21L))
    assert(after(37L) == ("text37", None),
      "kept row in a rewritten bucket must read the add-default")
    assert(after(0L) == ("text0", None),
      "cold-bucket row must null-fill through the merged schema")
    assert(after.size == 64 - 1 + 1)
    // exact-retry idempotence across the schema boundary
    Pipeline.mergeApplyTableEvolved(spark, dir, cdc, Seq("lang"))
    val again = Pipeline.readEvolvedTable(spark, dir, Seq("lang"))
      .select(col("doc_id"), col("text"), col("lang")).collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        Option(r.getString(2)))).toMap
    assert(again == after)
    // a SECOND evolved batch against the half-evolved table (some
    // touched buckets already carry lang, some don't) merges cleanly
    val cdc2 = Seq((9L, "upsert", "patched9", "fr"))
      .toDF("doc_id", "op", "new_text", "new_lang")
    Pipeline.mergeApplyTableEvolved(spark, dir, cdc2, Seq("lang"))
    val third = Pipeline.readEvolvedTable(spark, dir, Seq("lang"))
      .select(col("doc_id"), col("text"), col("lang")).collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        Option(r.getString(2)))).toMap
    assert(third(9L) == ("patched9", Some("fr")))
    assert(third(73L) == ("inserted73", Some("de")),
      "prior evolved values must survive a later touch of their bucket")
  }

  test("one parallel rewrite, not one job per bucket: Spark job count " +
      "stays constant as touched buckets grow; a fully-deleted " +
      "bucket's directory is cleared") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("merge_jobs").toString
    val base = (0L until 64L).map(i => (i, s"text$i")).toDF("doc_id", "text")
      .withColumn("bucket", col("doc_id") % Pipeline.MergeBuckets)
    base.write.partitionBy("bucket").mode("overwrite").parquet(dir)
    // CDC touches 8 buckets: upserts in 0..7 (except 5), and bucket 5
    // loses ALL FOUR of its rows (5, 21, 37, 53) — the emptied-bucket
    // case dynamic partition overwrite cannot express by itself
    val cdc = ((0L until 8L).filterNot(_ == 5L)
      .map(i => (i, "upsert", s"patched$i")) ++
      Seq(5L, 21L, 37L, 53L).map(i =>
        (i, "delete", null.asInstanceOf[String])))
      .toDF("doc_id", "op", "new_text")
    def countJobs(body: => Unit): Int = {
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet(): Unit
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        body
        // listener events are asynchronous; give the bus a beat to drain
        Thread.sleep(500)
      } finally spark.sparkContext.removeSparkListener(listener)
      jobs.get()
    }
    // warm-up apply on a single-bucket CDC measures the FIXED job
    // overhead (collect + probe + write + AQE stage jobs + listing);
    // the pin is that 8 touched buckets cost the SAME jobs, not 8×—
    // the r10 serial loop submitted ≥1 write job per touched bucket.
    val oneBucket = Seq((15L, "upsert", "warm"))
      .toDF("doc_id", "op", "new_text")
    val nOne = countJobs(Pipeline.mergeApplyTable(spark, dir, oneBucket))
    val nEight = countJobs(Pipeline.mergeApplyTable(spark, dir, cdc))
    assert(nOne > 0 && nEight > 0)
    assert(nEight <= nOne + 2,
      s"job count grew with touched buckets: 1 bucket -> $nOne jobs, " +
        s"8 buckets -> $nEight jobs")
    // bucket 5 emptied: directory gone (or empty of parquet files)
    val b5 = new java.io.File(s"$dir/bucket=5")
    assert(!b5.exists() ||
      b5.listFiles().forall(!_.getName.endsWith(".parquet")),
      "emptied bucket still holds stale files")
    // logical result: deletes applied, upserts applied, cold rows kept
    val after = spark.read.parquet(dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after.size == 64 - 4)
    (0L until 8L).filterNot(_ == 5L).foreach(i =>
      assert(after(i) == s"patched$i"))
    Seq(5L, 21L, 37L, 53L).foreach(i => assert(!after.contains(i)))
    assert(after(33L) == "text33")
    // retry converges on the emptied bucket too
    Pipeline.mergeApplyTable(spark, dir, cdc)
    val again = spark.read.parquet(dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == after)
  }

  test("as-of time travel (q188): one-window reconstruction equals " +
      "the sequential merge replay at every version; cross-version " +
      "latest-wins (changed-then-deleted, added-then-changed)") {
    val v1 = docs.filter(col("doc_id") % 10 =!= Pipeline.DiffAddedMod)
      .select(col("doc_id"), col("text"))
    val v2 = docs.filter(col("doc_id") % 10 =!= Pipeline.DiffRemovedMod)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === Pipeline.DiffChangedMod,
          concat(col("text"), lit(" v2"))).otherwise(col("text"))
          .as("text"))
    val v3 = docs
      .filter(col("doc_id") % 10 =!= Pipeline.DiffRemovedMod &&
        col("doc_id") % 10 =!= Pipeline.DiffChangedMod)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === Pipeline.DiffAddedMod,
          concat(col("text"), lit(" v3"))).otherwise(col("text"))
          .as("text"))
    val b1 = Pipeline.cdcBetween(v1, v2)
    val b2 = Pipeline.cdcBetween(v2, v3)
    val log = b1.withColumn("version", lit(1L))
      .unionByName(b2.withColumn("version", lit(2L)))
    // asOf 0: no ops apply — the base snapshot verbatim
    assert(tableHash(Pipeline.asOfReconstruct(v1, log, 0L)) ==
      tableHash(v1))
    // asOf k equals the k-fold SEQUENTIAL merge replay (the two
    // designs must agree; the window path never replays)
    val m1 = Pipeline.mergeApply(v1, b1).select(col("doc_id"), col("text"))
    assert(tableHash(Pipeline.asOfReconstruct(v1, log, 1L)) ==
      tableHash(m1))
    assert(tableHash(m1) == tableHash(v2))
    val m2 = Pipeline.mergeApply(m1, b2).select(col("doc_id"), col("text"))
    val asOf2 = Pipeline.asOfReconstruct(v1, log, 2L)
    assert(tableHash(asOf2) == tableHash(m2))
    assert(tableHash(asOf2) == tableHash(v3))
    // cross-version interactions on concrete keys: %10==3 was CHANGED
    // at version 1 then DELETED at version 2 — the delete must win;
    // %10==7 was ADDED at version 1 then CHANGED at version 2 — the
    // version-2 text must win
    val byId = asOf2.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val changedThenDeleted = byId.keys.filter(_ % 10 == Pipeline.DiffChangedMod)
    assert(changedThenDeleted.isEmpty)
    val addedThenChanged = byId.filter(_._1 % 10 == Pipeline.DiffAddedMod)
    assert(addedThenChanged.nonEmpty)
    addedThenChanged.values.foreach(t => assert(t.endsWith(" v3")))
  }

  test("partition-spec evolution (q245): the respec commit moves " +
      "ZERO data, a post-respec merge migrates ONLY the old-spec " +
      "buckets its keys live in (cold spec-0 buckets byte+mtime " +
      "identical), time travel is layout-independent across the " +
      "boundary, re-delivery is idempotent") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("merge_respec").toString
    // base: ids 0..63 under spec 0 (doc_id % 4 -> 16 rows/bucket)
    (0L until 64L).map(i => (i, s"text$i")).toDF("doc_id", "text")
      .withColumn("spec", lit(0))
      .withColumn("bucket", col("doc_id") % Pipeline.RespecBuckets(0))
      .write.partitionBy("spec", "bucket").mode("overwrite").parquet(dir)
    // batch 1 under spec 0: touches bucket 1 only (id 1)
    val b1 = Seq((1L, "upsert", "patched1")).toDF("doc_id", "op", "new_text")
    Pipeline.mergeApplyTableRespec(spark, dir, b1, activeSpec = 0)
    val afterB1 = Pipeline.readRespecTable(spark, dir)
      .select(col("doc_id"), col("text"))
    val afterB1Rows = tableHash(afterB1)
    def snapshot(spec: Int, b: Long): Map[String, (Long, Long)] = {
      val d = new java.io.File(s"$dir/spec=$spec/bucket=$b")
      if (!d.exists()) Map.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    }
    val coldBefore = Seq(0L, 1L, 3L).map(b => b -> snapshot(0, b)).toMap
    Thread.sleep(1100) // mtime granularity
    // ---- the respec COMMIT (metadata only) + batch 2 under spec 1:
    // keys 2 (upsert) and 6 (delete) both live in spec-0 bucket 2 —
    // that bucket migrates WHOLE; 0/1/3 must not move a byte
    val b2 = Seq((2L, "upsert", "patched2"),
      (6L, "delete", null.asInstanceOf[String]))
      .toDF("doc_id", "op", "new_text")
    Pipeline.mergeApplyTableRespec(spark, dir, b2, activeSpec = 1)
    coldBefore.foreach { case (b, before) =>
      assert(snapshot(0, b) == before,
        s"cold spec-0 bucket $b was rewritten by the respec merge")
    }
    // the consumed old-layout directory is gone; migrated rows sit
    // under spec 1 at doc_id % 8 (buckets 2 and 6)
    assert(!new java.io.File(s"$dir/spec=0/bucket=2").exists())
    val after = Pipeline.readRespecTable(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("spec"), r.getAs[Long]("bucket"),
          r.getAs[String]("text"))).toMap
    assert(after(2L) == ((1L, 2L, "patched2")))
    assert(!after.contains(6L))
    assert(after(10L) == ((1L, 2L, "text10")), "co-resident row must " +
      "migrate with the copy-on-write rewrite")
    assert(after(14L) == ((1L, 6L, "text14")))
    assert(after(0L) == ((0L, 0L, "text0")), "cold rows keep layout")
    assert(after(1L) == ((0L, 1L, "patched1")))
    // time travel is layout-independent across the respec boundary:
    // asOf 1 = the pre-respec physical state, asOf 2 = the final one
    val base = (0L until 64L).map(i => (i, s"text$i"))
      .toDF("doc_id", "text")
    val log = b1.withColumn("version", lit(1L))
      .unionByName(b2.withColumn("version", lit(2L)))
    assert(tableHash(Pipeline.asOfReconstruct(base, log, 1L)) ==
      afterB1Rows)
    assert(tableHash(Pipeline.asOfReconstruct(base, log, 2L)) ==
      after.map { case (id, (_, _, t)) => s"$id|$t" }.toSet)
    // re-delivery: the old-spec source is gone; the merge re-lands
    // in the active layout with identical content
    Pipeline.mergeApplyTableRespec(spark, dir, b2, activeSpec = 1)
    val again = Pipeline.readRespecTable(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("spec"), r.getAs[Long]("bucket"),
          r.getAs[String]("text"))).toMap
    assert(again == after)
  }
}
