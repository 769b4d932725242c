package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Deterministic mergeable quantile sketch — the Manku–Rajagopalan–
  * Lindsay "collapsing buffers" family (the deterministic ancestor
  * of KLL): level l holds up to k values of weight 2^l; a full level
  * sorts and keeps every second element (alternating offset per
  * compaction, the classic fairness trick), promoting survivors one
  * level up. Deterministic by construction — no RNG — so repeated
  * runs agree bit-for-bit for a fixed merge tree, and the rank-error
  * guarantee (≤ Σ_l compactions_l · 2^l ≤ ~levels·n/k) holds for
  * ANY merge tree, which is what a distributed aggregation needs:
  * Spark merges partial buffers in whatever order tasks finish.
  *
  * Space is O(k · log(n/k)) per group — the property that makes
  * percentiles over 100 TB a partial-aggregate problem instead of a
  * sort: map-side partials build sketches, only sketch bytes cross
  * the exchange. (Spark ships approx_percentile built-in; this
  * exists to carry the pattern at the Catalyst layer — a custom
  * [[TypedImperativeAggregate]] with a binary buffer — which the
  * built-in Aggregator API rung (AvgDurationAggregator) cannot
  * show: SURVEY.md §4.3's aggregate-function rung.) */
final class MrlSketch(val k: Int) extends Serializable {
  var count: Long = 0L
  // levels(l) = values of weight 2^l, UNSORTED between compactions
  var levels: Array[Array[Double]] = Array(Array.empty)
  // per-level alternation bit for the compaction offset
  var alt: Array[Boolean] = Array(false)
  // level-0 insertion buffer (amortized growth)
  private var buf0 = new scala.collection.mutable.ArrayBuffer[Double]

  private def ensureLevel(l: Int): Unit =
    if (l >= levels.length) {
      levels = levels ++ Array.fill(l - levels.length + 1)(
        Array.empty[Double])
      alt = alt ++ Array.fill(l - alt.length + 1)(false)
    }

  private def flush0(): Unit =
    if (buf0.nonEmpty) {
      levels(0) = levels(0) ++ buf0
      buf0.clear()
    }

  def update(v: Double): Unit = {
    buf0 += v
    count += 1
    if (buf0.length >= k) { flush0(); compactCascade() }
  }

  private def compactCascade(): Unit = {
    var l = 0
    while (l < levels.length) {
      if (levels(l).length > k) {
        val sorted = levels(l).sorted
        val off = if (alt(l)) 1 else 0
        alt(l) = !alt(l)
        val kept = Array.tabulate(sorted.length / 2)(i =>
          sorted(2 * i + off) match { case v => v })
        // odd leftover stays at this level (weight-preserving: the
        // unpaired element cannot be half-dropped)
        val leftover =
          if (sorted.length % 2 == 1)
            Array(sorted(if (off == 1) 0 else sorted.length - 1))
          else Array.empty[Double]
        levels(l) = leftover
        ensureLevel(l + 1)
        levels(l + 1) = levels(l + 1) ++ kept
      }
      l += 1
    }
  }

  def merge(o: MrlSketch): Unit = {
    o.flush0()
    flush0()
    ensureLevel(o.levels.length - 1)
    var l = 0
    while (l < o.levels.length) {
      levels(l) = levels(l) ++ o.levels(l)
      l += 1
    }
    count += o.count
    compactCascade()
  }

  /** Rank-weighted quantile estimate at probability p. */
  def quantile(p: Double): Double = {
    flush0()
    val items = Seq.newBuilder[(Double, Long)]
    var l = 0
    while (l < levels.length) {
      val w = 1L << l
      levels(l).foreach(v => items += (v -> w))
      l += 1
    }
    val sorted = items.result().sortBy(_._1)
    require(sorted.nonEmpty, "quantile of empty sketch")
    val target = p * count
    var cum = 0L
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2
      if (cum >= target) return sorted(i)._1
      i += 1
    }
    sorted.last._1
  }

  def serialize(): Array[Byte] = {
    flush0()
    val bos = new java.io.ByteArrayOutputStream
    val d = new java.io.DataOutputStream(bos)
    d.writeInt(k)
    d.writeLong(count)
    d.writeInt(levels.length)
    levels.indices.foreach { l =>
      d.writeBoolean(alt(l))
      d.writeInt(levels(l).length)
      levels(l).foreach(d.writeDouble)
    }
    d.flush()
    bos.toByteArray
  }
}

object MrlSketch {
  def deserialize(bytes: Array[Byte]): MrlSketch = {
    val d = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val s = new MrlSketch(d.readInt())
    s.count = d.readLong()
    val n = d.readInt()
    s.levels = Array.fill(n)(Array.empty[Double])
    s.alt = new Array[Boolean](n)
    (0 until n).foreach { l =>
      s.alt(l) = d.readBoolean()
      s.levels(l) = Array.fill(d.readInt())(d.readDouble())
    }
    s
  }
}

/** `quantile_sketch(x, k, probs)` — grouped quantile estimates via
  * the mergeable [[MrlSketch]], as a Catalyst
  * TypedImperativeAggregate: partial sketches build map-side, the
  * binary buffer crosses the exchange, merge is levelwise. Returns
  * array<double> of the estimates at `probs`. */
case class QuantileSketchAgg(
    child: Expression,
    k: Int,
    probs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MrlSketch]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): MrlSketch = new MrlSketch(k)

  override def update(b: MrlSketch, input: InternalRow): MrlSketch = {
    val v = child.eval(input)
    if (v != null) b.update(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: java.lang.Number => l.doubleValue()
    })
    b
  }

  override def merge(b: MrlSketch, o: MrlSketch): MrlSketch = {
    b.merge(o); b
  }

  override def eval(b: MrlSketch): Any =
    if (b.count == 0) null
    else new GenericArrayData(probs.map(b.quantile).toArray)

  override def serialize(b: MrlSketch): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): MrlSketch =
    MrlSketch.deserialize(bytes)

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "quantile_sketch"

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): QuantileSketchAgg =
    copy(child = c)
}
