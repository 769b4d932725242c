package org.apache.spark.sql.graft

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.JoinedRow
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Whole-operator top-k-per-group — the custom
  * `LogicalPlan + SparkStrategy + SparkPlan` rung of the extension
  * ladder (SURVEY.md §4.3), for the one relational shape where the
  * built-in plan is structurally suboptimal at scale:
  * `row_number() OVER (PARTITION BY g ORDER BY o) <= k` plans as
  * Exchange(ALL rows) → full sort per partition → WindowExec → filter,
  * shuffling and sorting the entire input to keep k rows per group.
  *
  * This operator plans as partial → exchange → final, like
  * aggregation: the PARTIAL node scans each input partition once into
  * per-group bounded heaps of size k (O(n log k), no sort) and emits
  * at most k rows per (partition, group); only those survivors cross
  * the exchange — at 100 TB with bounded group cardinality that is
  * the difference between shuffling the corpus and shuffling
  * k·groups·partitions rows. The FINAL node re-heaps its group's
  * ≤ k·partitions candidates and emits rows with a 1-based `rank`
  * column, identical to the window formulation (proven row-for-row in
  * TopKOperatorSpec and by the q50 oracle, which runs the window SQL).
  *
  * The order must be a TOTAL order of each group's rows (add a unique
  * tiebreak column) — same requirement any deterministic top-k has.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "top-k needs k > 0")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rank is CREATED here, not consumed — without this the analyzer
  // counts it as a missing input reference
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : TopKPerGroup = copy(child = newChild)
}

/** Physical top-k-per-group: bounded per-group heaps per partition.
  * The PARTIAL node (`rankAttr = None`) emits unranked survivors
  * before the exchange and carries no rank attribute at all — a
  * phantom rank field would register as a permanently missing input
  * reference and mark the plan invalid; the FINAL node
  * (`rankAttr = Some`) requires clustering on the group keys and
  * emits the ranked rows. */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Option[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  def partial: Boolean = rankAttr.isEmpty

  override def output: Seq[Attribute] = child.output ++ rankAttr

  override def producedAttributes: AttributeSet =
    AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerGroupExec = copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val g = groupExprs
    val o = order
    val limit = k
    val rank = rankAttr
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(g, childOutput)
      // codegen'd row comparator for the requested sort order; the
      // heap keeps the CURRENT WORST (greatest under the order) at
      // its head so one compare decides replace-or-skip
      val ord = GenerateOrdering.generate(o, childOutput)
      val heaps =
        mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < limit) heap.enqueue(row.copy())
            else if (ord.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(row.copy())
            }
          case None =>
            val heap = mutable.PriorityQueue.empty[InternalRow](ord)
            heap.enqueue(row.copy())
            heaps.put(key.copy(), heap)
        }
      }
      if (rank.isEmpty) heaps.valuesIterator.flatMap(_.iterator)
      else {
        val resultProj = UnsafeProjection.create(
          childOutput :+ rank.get, childOutput :+ rank.get)
        val joined = new JoinedRow
        val rankRow = new GenericInternalRow(1)
        heaps.valuesIterator.flatMap { heap =>
          // dequeueAll yields greatest-first; reverse = ascending order
          val sorted = heap.dequeueAll.reverseIterator
          sorted.zipWithIndex.map { case (row, i) =>
            rankRow.update(0, (i + 1).toLong)
            resultProj(joined(row, rankRow))
          }
        }
      }
    }
  }
}

/** Planner strategy: TopKPerGroup → partial heap → (exchange inserted
  * by EnsureRequirements) → final heap + rank. */
object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, rank, child) =>
      TopKPerGroupExec(g, o, k, Some(rank),
        TopKPerGroupExec(g, o, k, None, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level entry: `TopK.perGroup(df, Seq("g"), Seq("a" -> true,
  * "id" -> true), 5)` — order pairs are (column, ascending). Builds
  * the already-resolved logical node from the analyzed child, so no
  * analyzer extension is needed; the session must carry
  * [[graft.plans.GraftExtensions]] (all graft entry points do) for
  * the strategy to plan it. */
object TopK {
  def perGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"no column $name in ${analyzed.output.map(_.name)}"))
    val group = groupCols.map(attr)
    val order = orderCols.map { case (c, asc) =>
      SortOrder(attr(c), if (asc) Ascending else Descending)
    }
    val rankAttr = AttributeReference("rank", LongType, nullable = false)()
    Bridge.ofRows(df.sparkSession,
      TopKPerGroup(group, order, k, rankAttr, analyzed))
  }
}
