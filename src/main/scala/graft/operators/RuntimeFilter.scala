package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{Bridge, BloomMightContain}
import org.apache.spark.util.sketch.BloomFilter

/** Runtime join filtering: build a Bloom filter over the join keys
  * of a selective (already-filtered) dimension side and apply it to
  * the fact side BEFORE the join's shuffle — the explicit form of the
  * engine-internal runtime filters (dynamic partition pruning /
  * bloom-filter joins) that decide 100 TB join cost.
  *
  * Contract: the Bloom pass keeps a superset of the matching rows
  * (false positives only, never false negatives), and the exact join
  * that follows removes the false positives — so the composed result
  * is row-identical to the plain join while the fact side entering
  * the exchange shrinks by ~the dimension's selectivity.
  *
  * Scale design:
  *  - the filter is built by a distributed aggregate
  *    (`stat.bloomFilter`: per-partition blooms OR-merged at the
  *    driver) — driver memory is bounded by the bloom's BIT SIZE
  *    (~1.2 MB per million keys at 1% fpp), never by the data;
  *  - the fact side is filtered by a codegen'd native expression
  *    ([[org.apache.spark.sql.graft.BloomMightContain]]) inside the
  *    scan's WholeStageCodegen span — no UDF, no serialization per
  *    row, and the filter composes with parquet pushdown of ordinary
  *    predicates;
  *  - a real cluster would broadcast the filter once per executor;
  *    plan references give exactly that (the expression tree ships
  *    with the task closure, deserialized once per executor).
  */
object RuntimeFilter {

  /** Build a Bloom filter of `keyCol` (LongType) over `keys`.
    * `expectedItems` sizes the filter — overestimating costs bits,
    * underestimating costs false positives, never correctness. */
  def bloomOf(keys: DataFrame, keyCol: String, expectedItems: Long,
      fpp: Double): BloomFilter =
    keys.stat.bloomFilter(keyCol, expectedItems, fpp)

  /** Fact rows whose `keyCol` MIGHT be in the filter (superset of
    * the exact matches). */
  def bloomPreFilter(fact: DataFrame, keyCol: String,
      bloom: BloomFilter): DataFrame =
    fact.filter(Bridge.column(BloomMightContain(
      Bridge.expression(col(keyCol)), bloom)))

  /** Sizing/selectivity constants of the graded query (q56). */
  val Q56ExpectedKeys = 1L << 16
  val Q56Fpp = 0.03

  /** Graded bloom-join (q56): urgent orders' line items by return
    * flag. The lineitem side passes through the bloom of the urgent
    * orders' keys before the exact equi-join, which the oracle runs
    * plainly — row-identical results prove the no-false-negative
    * contract end-to-end. */
  def bloomJoin(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bloom = bloomOf(urgent, "o_orderkey", Q56ExpectedKeys, Q56Fpp)
    bloomPreFilter(lineitem, "l_orderkey", bloom)
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_price"))
  }
}
