/* Catalyst-facing bridge. Lives under org.apache.spark.sql so it can
 * use the private[sql] expression APIs (AbstractDataType,
 * ExpressionUtils) — the same technique used by Spark-native
 * extension libraries. Keep this file thin; engine logic lives in
 * the graft.* packages. */
package org.apache.spark.sql.graft

import graft.geo.Geohash
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helpers invoked from generated code (must be statically
  * reachable from Janino-compiled Java). */
object GeohashOps {
  def encodeUTF8(lat: Double, lon: Double, precision: Int): UTF8String =
    UTF8String.fromString(Geohash.encode(lat, lon, precision))
}

/** `geohash_encode(lat, lon, precision)` as a native Catalyst
  * expression with whole-stage-codegen support — the engine
  * equivalent of the reference's
  * `GeoHash.geoHashStringWithCharacterPrecision(lat, lon, 6)`
  * (flink-taxi-stream-processor/.../ProcessTaxiStream.java:97).
  *
  * Null-intolerant: any null input yields null. Precision outside
  * [1,12] raises (matches [[Geohash.encode]]).
  */
case class GeohashEncode(first: Expression, second: Expression,
    third: Expression)
  extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(DoubleType, DoubleType, IntegerType)
  override def dataType: DataType = StringType
  override def prettyName: String = "geohash_encode"

  override def nullSafeEval(lat: Any, lon: Any, prec: Any): Any =
    GeohashOps.encodeUTF8(lat.asInstanceOf[Double],
      lon.asInstanceOf[Double], prec.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lat, lon, p) =>
      s"org.apache.spark.sql.graft.GeohashOps.encodeUTF8($lat, $lon, $p)")

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): GeohashEncode = copy(f, s, t)
}

/** Column <-> Expression bridging for graft code. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Execute a (possibly rule-rewritten) logical plan as a DataFrame —
    * used by plan-rule tests. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
