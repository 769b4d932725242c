package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-ORDER (Morton) clustering — the
  * multi-dimensional sort that makes file/row-group min-max pruning
  * work on EVERY clustered column instead of just the leading sort
  * key. A corpus laid out by z(a, b) keeps both `a` and `b` in tight
  * ranges within each partition, so a predicate on either column
  * skips most of the data at the scan; a plain ORDER BY a gives that
  * for `a` only.
  *
  * The z-value is pure column arithmetic (magic-mask bit spreading,
  * whole-stage-codegen'd by Catalyst) — no UDF, no custom expression
  * needed, and the DuckDB oracle mirrors the identical shift/mask
  * chain (q63).
  */
object Layout {

  /** Spread the low 31 bits of `x` to the even bit positions of a
    * 62-bit value (standard Morton magic masks, 64-bit form). Inputs
    * must be non-negative and < 2^31. */
  def spreadBits(x: Column): Column = {
    // each step doubles the gap between occupied bit groups
    val m = Seq(
      (16, lit(0x0000ffff0000ffffL)),
      (8, lit(0x00ff00ff00ff00ffL)),
      (4, lit(0x0f0f0f0f0f0f0f0fL)),
      (2, lit(0x3333333333333333L)),
      (1, lit(0x5555555555555555L)))
    m.foldLeft(x.cast("long").bitwiseAND(lit(0x7fffffffL))) {
      case (acc, (s, mask)) =>
        (acc.bitwiseOR(shiftleft(acc, s))).bitwiseAND(mask)
    }
  }

  /** 62-bit Morton interleave: bit i of `a` lands at position 2i,
    * bit i of `b` at 2i+1. */
  def zValue(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** The DuckDB twin of [[spreadBits]]/[[zValue]] (identical
    * shift/mask chain; `$a`/`$b` are SQL expressions). */
  def zValueSql(a: String, b: String): String = {
    def spread(x: String): String = {
      // decimal mask literals: DuckDB 1.0 has no 0x syntax
      val steps = Seq(
        (16, 0x0000ffff0000ffffL.toString),
        (8, 0x00ff00ff00ff00ffL.toString),
        (4, 0x0f0f0f0f0f0f0f0fL.toString),
        (2, 0x3333333333333333L.toString),
        (1, 0x5555555555555555L.toString))
      steps.foldLeft(s"(CAST($x AS BIGINT) & 2147483647)") {
        case (acc, (s, mask)) => s"((($acc) | (($acc) << $s)) & $mask)"
      }
    }
    s"(${spread(a)} | (${spread(b)} << 1))"
  }

  /** Cluster `df` into `partitions` z-ordered ranges (each partition
    * owns a contiguous z-range, rows sorted by z within it) — the
    * write-side layout step before a partitioned/bucketed sink. One
    * range exchange; no global single-reducer sort. */
  def zorderLayout(df: DataFrame, a: String, b: String,
      partitions: Int): DataFrame = {
    val z = zValue(col(a), col(b)).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Graded z-value computation (q63): lineitem keys interleaved —
    * the layout key a lakehouse writer would range-cluster on. */
  def zOrderKeys(lineitem: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey"), col("l_linenumber"),
      col("l_partkey"), col("l_suppkey"),
      zValue(col("l_partkey"), col("l_suppkey")).as("z"))

  /** Partition count that lands output files near `targetBytes`,
    * estimated from the optimized plan's size statistics (for a
    * parquet scan that is the compressed input size — the right
    * proxy when compacting files of the same table back together).
    * The SMALL-FILES COMPACTION operator: a streaming sink or
    * per-partition ingest writing a 100 TB table leaves millions of
    * KB-scale files whose open/seek overhead then dominates every
    * scan; periodic rewrite at a few hundred MB per file is the
    * standard fix (every lakehouse ships an OPTIMIZE/rewrite for
    * exactly this). */
  def compactionPartitions(df: DataFrame, targetBytes: Long,
      maxPartitions: Int = 1 << 20): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // plans without computed stats default sizeInBytes to
    // spark.sql.defaultSizeInBytes (Long.MaxValue) and joins multiply
    // children's sizes — both would saturate the division into a
    // repartition(Int.MaxValue) death; demand a real statistic
    require(estBytes < BigInt(Long.MaxValue),
      "plan has no usable size statistic — compact a frame whose " +
        "size Spark can estimate (a file scan / persisted frame), " +
        "or repartition explicitly")
    val n = (estBytes.toDouble / targetBytes).ceil.toInt
    math.min(maxPartitions, math.max(1, n))
  }

  /** Rewrite `df` as parquet under `dir` in files of roughly
    * `targetBytes` each (round-robin repartition — size-balanced
    * without any shuffle key; pass a `zorderLayout`ed frame instead
    * when min-max clustering should survive the rewrite). Returns
    * the partition count used. */
  def compactTo(df: DataFrame, dir: String, targetBytes: Long): Int = {
    val n = compactionPartitions(df, targetBytes)
    df.repartition(n).write.mode("overwrite").parquet(dir)
    n
  }

  /** Graded shard counts of the rendezvous placement (q174): the
    * before/after of a one-shard scale-out. */
  val ShardsBefore = 16
  val ShardsAfter = 17

  /** Rendezvous (highest-random-weight) hash of (doc_id, shard) —
    * overflow-safe double Knuth mix (every intermediate stays far
    * inside Long range, the [[Sampling.HashMult]] discipline DuckDB's
    * erroring BIGINT arithmetic requires): mask the id to 20 bits
    * FIRST (ids ≥ ~3.47e9 would otherwise overflow the first multiply
    * — Spark wraps silently where DuckDB errors, so the unmasked form
    * diverges between engines on large-id corpora), fold to 20 mixed
    * bits, re-mix with the shard index, extract the high bits. Pure
    * column arithmetic — codegen'd, zero shuffle. */
  def rendezvousWeight(idCol: String, shard: Int): Column = {
    val K = Sampling.HashMult
    expr(s"((((((($idCol % 1048576) * ${K}L) DIV 1048576) % 1048576) + " +
      s"${shard * 31 + 1}L) * ${K}L) DIV 1048576) % 1048576")
  }

  /** Shard of `idCol` under rendezvous hashing with `k` shards: the
    * shard with the highest weight wins, ties to the lowest shard
    * (array_position returns the FIRST occurrence of the max). */
  def rendezvousShard(idCol: String, k: Int): Column = {
    val hs = array((0 until k).map(rendezvousWeight(idCol, _)): _*)
    (array_position(hs, array_max(hs)) - 1).cast("long")
  }

  /** Rendezvous shard placement with a scale-out diff (q174) — the
    * data-placement operator of a sharded corpus store: assign every
    * document a shard under [[ShardsBefore]] and [[ShardsAfter]]
    * shards, flag movers, and contrast with naive modulo placement.
    *
    * Why this operator exists at 100 TB: adding one shard under
    * `id % k` placement moves ~(k−1)/k of every byte in the store
    * (the q174 fixture measures ~94%); rendezvous moves only the
    * ~1/(k+1) of keys whose new shard IS the added one — scale-out
    * cost proportional to the new capacity, not the fleet. Per-row
    * arithmetic only: the assignment never shuffles, and the diff is
    * the row-local comparison of two expressions. The spec pins the
    * movement bound and the balance of the assignment. */
  def shardPlacement(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        rendezvousShard("doc_id", ShardsBefore).as("shard_a"),
        rendezvousShard("doc_id", ShardsAfter).as("shard_b"),
        (col("doc_id") % ShardsBefore).as("mod_a"),
        (col("doc_id") % ShardsAfter).as("mod_b"))
      .withColumn("moved", col("shard_a") =!= col("shard_b"))
      .withColumn("mod_moved", col("mod_a") =!= col("mod_b"))

  /** Virtual nodes per shard on the consistent-hash ring (q190) —
    * vnodes smooth per-shard arc mass (variance ∝ 1/vnodes) and are
    * what real stores (Dynamo/Cassandra lineage) tune. */
  val RingVnodes = 8

  /** Ring point of flat vnode index `i`: two Knuth rounds (low-bits
    * fold, then middle-bit extract) on a SMALL integer — computed
    * here in exact Scala and inlined as literals into BOTH engines'
    * plans, so the ring table cannot diverge between Spark and the
    * mirror (only the per-key hash is computed in-engine). */
  def ringPoint(i: Long): Long = {
    val p1 = ((i + 1) * Sampling.HashMult) % 1048576L
    ((p1 * Sampling.HashMult) / 1048576L) % 1048576L
  }

  /** The sorted ring: (point, shard) for every shard × vnode,
    * ascending (point, shard) — the tie order both engines share. */
  def ringPoints(shards: Int, vnodes: Int = RingVnodes): Seq[(Long, Int)] =
    (for (s <- 0 until shards; v <- 0 until vnodes)
      yield (ringPoint(s.toLong * vnodes + v), s))
      .sortBy(identity)

  /** Shard of `idCol` under consistent hashing: the key's clockwise
    * successor on the ring (first point ≥ hash, wrapping to the
    * ring's first point). The successor scan is a 128-literal array
    * probe — codegen'd row-local arithmetic, zero shuffle, exactly
    * like [[rendezvousShard]]. */
  def ringShard(idCol: String, shards: Int,
      vnodes: Int = RingVnodes): Column = {
    val pts = ringPoints(shards, vnodes)
    val pointsArr = array(pts.map(p => lit(p._1)): _*)
    val shardsArr = array(pts.map(p => lit(p._2.toLong)): _*)
    val K = Sampling.HashMult
    val h = expr(
      s"((($idCol % 1048576) * ${K}L) DIV 1048576) % 1048576")
    val idx0 = array_position(
      transform(pointsArr, p => p >= h), lit(true))
    element_at(shardsArr,
      when(idx0 === 0, lit(1)).otherwise(idx0).cast("int"))
  }

  /** Consistent-hash ring placement with a scale-out diff (q190) —
    * the OTHER classic minimal-movement placement next to q174's
    * rendezvous (a store migrating between them, or validating a
    * ring config, needs both sides): assign every document its ring
    * shard under [[ShardsBefore]] and [[ShardsAfter]] shards and
    * flag movers.
    *
    * The consistent-hashing guarantee — adding shard k changes an
    * assignment ONLY where the new shard's vnodes landed (arcs they
    * claim from their predecessors), so every mover's new shard IS
    * the added one (spec-pinned exactly, not statistically) and the
    * moved fraction is the new vnodes' arc mass ≈ 1/(k+1). Per-row
    * literal-array arithmetic; never shuffles. */
  def ringPlacement(docs: DataFrame): DataFrame = {
    val K = Sampling.HashMult
    docs.select(col("doc_id"),
      expr(s"(((doc_id % 1048576) * ${K}L) DIV 1048576) % 1048576")
        .as("h"),
      ringShard("doc_id", ShardsBefore).as("ring_a"),
      ringShard("doc_id", ShardsAfter).as("ring_b"))
      .withColumn("moved", col("ring_a") =!= col("ring_b"))
  }
}
