package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` re-implementation of the reference's windowed
  * average (ProcessTaxiStream.java:122-136): running (sum, count)
  * over per-trip floored minutes, finished as double division of sum
  * by count — exactly the A2 semantics. Exists to exercise the
  * engine's UDAF surface (SURVEY.md §4.3 item 5); the production
  * queries use the built-in codegen'd `avg`, and AggregatorSpec
  * proves the two agree.
  */
object AvgDurationAggregator
    extends Aggregator[Long, (Long, Long), Double] {

  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(b: (Long, Long), a: Long): (Long, Long) =
    (b._1 + a, b._2 + 1L)

  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(r: (Long, Long)): Double =
    r._1.toDouble / r._2

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
