package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot join keys at scale.
  *
  * Spark's AQE skew-join handles sort-merge cases adaptively; this is
  * the explicit salting construction for when the planner can't —
  * e.g. a dimension too large to broadcast joined on a key where one
  * value dominates the fact side. The fact side picks a
  * deterministic salt in [0, salts); the dimension is replicated
  * across all salts, so the join key becomes (key, salt) and the hot
  * key's rows spread over `salts` reducers instead of one.
  */
object Skew {

  /** Deterministic per-row salt: hash of the whole row spread over
    * [0, salts) — no RNG, so retries/replays are stable. */
  private def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(hash(df.columns.map(col): _*), lit(salts))

  /** Equi-join `fact ⋈ dim` on `key`, salted `salts` ways. Result is
    * row-identical to the unsalted join (verified in SkewSpec). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    val factS = fact.withColumn("_salt", rowSalt(fact, salts))
    val dimS = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    factS.join(dimS, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase salted aggregation for per-key COUNT/SUM when a single
    * key dominates: phase 1 aggregates on (key, salt), phase 2
    * combines partials per key. (For plain count/sum Spark's map-side
    * partial aggregation usually suffices; this is the explicit
    * construction for buffer-heavy aggregates.) */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame =
    df.withColumn("_salt", rowSalt(df, salts))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_cnt"), sum(col(valueCol)).as("_sum"))
      .groupBy(col(key))
      .agg(sum(col("_cnt")).as("n"), sum(col("_sum")).as("total"))
}
