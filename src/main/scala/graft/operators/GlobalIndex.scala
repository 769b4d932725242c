package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Global row indexing under a TOTAL order without a global sort
  * funnel — the scalable form of `row_number() OVER (ORDER BY ...)`,
  * which Spark's window operator executes in ONE partition (the
  * classic 100 TB cliff: every row through a single reducer).
  *
  * Shape: range-repartition on the sort key (each partition owns a
  * contiguous key range), sort within partitions, count rows per
  * partition (a bounded collect — one long per partition), prefix-sum
  * the counts into partition offsets, then stream each partition once
  * adding `offset + local position`. Total cost: one range exchange +
  * one tiny job; no single-reducer stage anywhere.
  *
  * The ranged frame is persisted before the counting pass:
  * RangePartitioner SAMPLES its boundaries per evaluation, so the
  * count job and the index job must observe the SAME materialized
  * partitioning — recomputing would legally re-sample different
  * boundaries and silently corrupt the offsets. (In a production
  * layout job the ranged data is written out anyway — the persist IS
  * that materialization.) Callers release it after their final action
  * via [[globalRowIndexWithHandle]]'s [[graft.util.CacheHandle]].
  *
  * The sort key must be a total order (append a unique tiebreaker
  * column); ties would otherwise make the index nondeterministic.
  */
object GlobalIndex {

  /** Number of range partitions for the graded query — at fixture
    * scale this exercises the multi-partition path; a cluster run
    * sizes it to data/parallelism. */
  val Q57Partitions = 8

  def globalRowIndex(df: DataFrame, sortCols: Seq[Column],
      partitions: Int): DataFrame =
    globalRowIndexWithHandle(df, sortCols, partitions)._1

  /** [[globalRowIndex]] plus the [[graft.util.CacheHandle]] releasing
    * the range-materialized frame. The persist is CORRECTNESS-bearing
    * (see object doc: the sampled range boundaries must be observed
    * identically by the count job and the index pass), so it cannot
    * be dropped before the caller's final action; release the handle
    * after consuming the result. */
  def globalRowIndexWithHandle(df: DataFrame, sortCols: Seq[Column],
      partitions: Int): (DataFrame, graft.util.CacheHandle) = {
    // The range-partition id is BAKED INTO the cached rows (evaluated
    // in the stage that fills the cache, whose task ids are the range
    // partition ids). Downstream operators may be fused into
    // differently-numbered tasks — a coalesce(1) sink collapses
    // everything into task 0 — so reading TaskContext.getPartitionId
    // at index-assignment time would silently mis-offset; the data
    // column survives any narrow re-wiring.
    val ranged = df.repartitionByRange(partitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one row per partition: bounded by the partition count, never
    // by the data
    val counts = ranged.groupBy(col("__pid"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = new Array[Long](partitions)
    var acc = 0L
    var pid = 0
    while (pid < partitions) {
      offsets(pid) = acc
      acc += counts.getOrElse(pid, 0L)
      pid += 1
    }
    val bc = df.sparkSession.sparkContext.broadcast(offsets)
    val pidIdx = df.schema.length // __pid sits after the user columns
    val outSchema = df.schema.add("global_idx", LongType, nullable = false)
    val out = ranged.mapPartitions { rows =>
      // a fused task may stream several source partitions back to
      // back (each internally sorted); restart the counter at each
      // partition boundary
      var cur = -1
      var i = 0L
      rows.map { r =>
        val p = r.getInt(pidIdx)
        if (p != cur) { cur = p; i = bc.value(p) }
        val out = Row.fromSeq(r.toSeq.dropRight(1) :+ i)
        i += 1
        out
      }
    }(Encoders.row(outSchema))
    (out, graft.util.CacheHandle(ranged))
  }

  /** Graded global index (q57): documents totally ordered by
    * (n_chars, doc_id) — the layout step that gives every training
    * document a stable global position (shard assignment, resumable
    * data loading). Oracle: `row_number() OVER (ORDER BY ...) - 1`,
    * which DuckDB runs directly and Spark would funnel through one
    * reducer — the operator exists precisely to avoid that plan. */
  def docGlobalIndex(docs: DataFrame): DataFrame =
    globalRowIndex(
      docs.select(col("doc_id"), col("n_chars")),
      Seq(col("n_chars"), col("doc_id")), Q57Partitions)

  /** Distributed GLOBAL PREFIX SUM under a total order — the value
    * sibling of [[globalRowIndexWithHandle]] and the scalable form
    * of `SUM(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`
    * (which Spark executes in ONE partition): range-partition on the
    * sort key, sort within partitions, reduce each partition to its
    * value TOTAL (one long per partition to the driver), prefix-sum
    * the totals into offsets, then stream each partition once
    * accumulating `offset + running value`. The emitted
    * `prefix_sum` is INCLUSIVE of the current row. Same
    * materialization contract as the row-index form (the sampled
    * range boundaries must be observed identically by both jobs) —
    * release the returned handle after the final action.
    *
    * The value column must be integral (LONG) — exact partials, so
    * the distributed sum is bit-equal to the sequential one. */
  def globalPrefixSumWithHandle(df: DataFrame, sortCols: Seq[Column],
      valueCol: String, partitions: Int)
      : (DataFrame, graft.util.CacheHandle) = {
    val ranged = df.repartitionByRange(partitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val totals = ranged.groupBy(col("__pid"))
      .agg(sum(col(valueCol)).cast("long").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = new Array[Long](partitions)
    var acc = 0L
    var pid = 0
    while (pid < partitions) {
      offsets(pid) = acc
      acc += totals.getOrElse(pid, 0L)
      pid += 1
    }
    val bc = df.sparkSession.sparkContext.broadcast(offsets)
    val valueIdx = df.schema.fieldIndex(valueCol)
    val pidIdx = df.schema.length
    val outSchema = df.schema.add("prefix_sum", LongType,
      nullable = false)
    val out = ranged.mapPartitions { rows =>
      var cur = -1
      var running = 0L
      rows.map { r =>
        val p = r.getInt(pidIdx)
        if (p != cur) { cur = p; running = bc.value(p) }
        running += r.getLong(valueIdx)
        Row.fromSeq(r.toSeq.dropRight(1) :+ running)
      }
    }(Encoders.row(outSchema))
    (out, graft.util.CacheHandle(ranged))
  }

  /** Token budget of [[budgetPack]] (q155). */
  val PackBudgetTokens = 20000L

  /** Token-budget greedy selection (q155) — the "best corpus that
    * fits" assembly step: rank documents by quality DENSITY
    * (quality score per estimated BPE token — the knapsack greedy,
    * optimal as the budget grows large relative to item size),
    * accumulate token costs in that order, keep every document
    * whose INCLUSIVE cumulative cost fits [[PackBudgetTokens]].
    * The cumulative is [[globalPrefixSumWithHandle]] — no
    * single-reducer running-sum window anywhere (the oracle's
    * `SUM OVER (ORDER BY)` states the same semantics as the plan
    * this operator exists to avoid).
    *
    * Density ties order by doc_id; density doubles are the q6
    * hash-graded quality tree over exact token counts — identical
    * in both engines, so the greedy order matches exactly. */
  def budgetPack(docs: DataFrame,
      budget: Long = PackBudgetTokens): DataFrame = {
    val scored = docs.select(col("doc_id"),
      ceil(length(col("text")) / 4.0).cast("long").as("est_tokens"),
      TextAnalysis.qualityScoreCol(col("text")).as("quality_score"))
      .withColumn("density",
        col("quality_score") / col("est_tokens"))
    val (pref, handle) = globalPrefixSumWithHandle(scored,
      Seq(col("density").desc, col("doc_id").asc), "est_tokens",
      Q57Partitions)
    val out = pref.filter(col("prefix_sum") <= budget)
      .select(col("doc_id"), col("est_tokens"), col("density"),
        col("prefix_sum").as("cum_tokens"))
      .localCheckpoint()
    handle.release()
    out
  }

  /** DETERMINISTIC GLOBAL SHUFFLE (q78): every document's position
    * in a reproducible random permutation of the corpus — the
    * epoch-shuffle a training loader needs, computed as
    * [[globalRowIndex]] over the Knuth-mixed doc_id (with doc_id as
    * total-order tiebreak). Same operator, different sort key: a
    * range exchange on the hash (uniform by construction, so range
    * partitions are balanced) and NO single-reducer stage — where
    * `ORDER BY random()` is both nondeterministic and a global-sort
    * funnel. Re-running yields the identical permutation; a new
    * epoch re-keys by salting the id before mixing. */
  def shuffledIndex(docs: DataFrame): DataFrame =
    globalRowIndex(
      docs.select(col("doc_id"),
        Sampling.mixed("doc_id").as("shuffle_key")),
      Seq(col("shuffle_key"), col("doc_id")), Q57Partitions)
}
