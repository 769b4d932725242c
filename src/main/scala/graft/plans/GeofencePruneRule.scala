package graft.plans

import graft.geo.Geohash
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LeafNode, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.{GeohashCode, GeohashEncode}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule rewriting geofence membership tests
  * `geohash_encode(lat, lon, p) IN (cell literals)` into a
  * disjunction of bounding-box range predicates
  * `lat >= a AND lat < b AND lon >= c AND lon < d` (one conjunct per
  * cell).
  *
  * Semantics-preserving because a geohash cell IS its half-open
  * bounding box under the index-formula encode ([[Geohash.bbox]];
  * upper edges belong to the next cell, matching floor semantics).
  * Cells touching the world boundary (lat 90 / lon 180), where encode
  * CLAMPS and the box upper edge is closed, are left unrewritten —
  * none of the reference fences touch it, but the rule must not
  * assume that.
  *
  * Why: the rewritten predicate is 4 double comparisons per cell with
  * no string building, base-32 encoding or allocation — cheaper per
  * row at 100 TB, and range predicates over the raw columns are
  * visible to Parquet min/max skipping when lat/lon are stored
  * columns (the geohash string never is).
  *
  * Registered through [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`) — the
  * engine's SparkSessionExtensions surface.
  */
object GeofencePruneRule extends Rule[LogicalPlan] {

  private def boxPredicate(lat: Expression, lon: Expression,
      box: Geohash.BBox): Option[Expression] = {
    // clamped world edge would need closed upper bounds; bail out
    if (box.latMax >= 90.0 || box.lonMax >= 180.0) None
    else Some(And(
      And(GreaterThanOrEqual(lat, Literal(box.latMin)),
        LessThan(lat, Literal(box.latMax))),
      And(GreaterThanOrEqual(lon, Literal(box.lonMin)),
        LessThan(lon, Literal(box.lonMax)))))
  }

  private def cellBoxes(list: Seq[Expression],
      precision: Int): Option[Seq[Geohash.BBox]] = {
    // a code outside [0, 2^(5·precision)) can never equal a real cell
    // code (the membership test is always false for it); de-interleaving
    // only its low bits would fabricate a REAL bounding box and turn an
    // always-false predicate into a sometimes-true one — bail out
    if (precision < 1 || precision > 12) return None // 5·p must fit a Long
    val maxCode = 1L << (5 * precision)
    val boxes = list.collect {
      case Literal(s: UTF8String, org.apache.spark.sql.types.StringType)
          if s.toString.length == precision =>
        Geohash.bbox(s.toString)
      case Literal(code: Long, org.apache.spark.sql.types.LongType)
          if 0 <= code && code < maxCode =>
        Geohash.bboxOfCode(code, precision)
    }
    if (boxes.length == list.length) Some(boxes) else None
  }

  /** The rewrite duplicates `lat`/`lon` 2× per cell (8-cell fence →
    * 32 references). That is a win only when the copies are
    * references to STORED columns — then the range predicates reach
    * the Parquet scan as min/max skipping. If the attribute is an
    * alias of a derived expression tree in a Project below, predicate
    * pushdown later inlines one copy of that tree per reference and
    * blows the generated code past the codegen limits (measured on the
    * synthetic-trip fixture: q1 2.4 s → 3.8 s at sf0.1, with Spark
    * falling back to interpreted filters and 2 MiB task binaries). So
    * the guard is TRANSITIVE: trace the attribute through the plan
    * below and accept only leaf-relation outputs (stored columns),
    * literals, and casts/re-aliases of those. */
  private def cheap(e: Expression, scope: Seq[LogicalPlan]): Boolean = e match {
    case _: Literal => true
    case a: Attribute => cheapAttr(a, scope)
    case c: Cast => cheap(c.child, scope)
    case _ => false
  }

  private def cheapAttr(a: Attribute, scope: Seq[LogicalPlan]): Boolean =
    scope.find(_.outputSet.contains(a)) match {
      case None => false // unknown provenance — assume expensive
      case Some(_: LeafNode) => true // stored/materialized column
      case Some(p: Project) =>
        p.projectList.find(_.exprId == a.exprId) match {
          case Some(Alias(child, _)) => cheap(child, Seq(p.child))
          case Some(attr: Attribute) => cheapAttr(attr, Seq(p.child))
          case _ => false
        }
      case Some(agg: Aggregate) =>
        // pushdown through Aggregate substitutes grouping-expr aliases
        // the same way Project aliases substitute
        agg.aggregateExpressions.find(_.exprId == a.exprId) match {
          case Some(Alias(child, _)) => cheap(child, agg.children)
          case Some(attr: Attribute) => cheapAttr(attr, agg.children)
          case _ => false
        }
      case Some(u: Union) =>
        // Union.output reuses the FIRST child's exprIds — tracing only
        // there would certify a rewrite that blows up the other legs.
        // Pushdown clones the predicate into EVERY leg, so the
        // attribute's positional twin must be cheap in ALL of them.
        u.output.indexWhere(_.exprId == a.exprId) match {
          case -1 => false
          case i => u.children.forall(c =>
            i < c.output.length && cheapAttr(c.output(i), Seq(c)))
        }
      case Some(other) if other.children.exists(_.outputSet.contains(a)) =>
        cheapAttr(a, other.children) // pass-through node (Filter, Join, …)
      case Some(_) => false // node-generated attribute (Window, Generate, …)
    }

  private def rewrite(in: In, lat: Expression, lon: Expression,
      p: Int, list: Seq[Expression]): Expression =
    (for {
      boxes <- cellBoxes(list, p)
      preds <- {
        val ps = boxes.map(boxPredicate(lat, lon, _))
        if (ps.forall(_.isDefined)) Some(ps.flatten) else None
      }
    } yield preds.reduce(Or)).getOrElse(in)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transform {
      case node => node.transformExpressions {
        case in @ In(GeohashEncode(lat, lon, Literal(p: Int, _)), list)
            if list.nonEmpty && cheap(lat, node.children) &&
              cheap(lon, node.children) =>
          rewrite(in, lat, lon, p, list)
        case in @ In(GeohashCode(lat, lon, Literal(p: Int, _)), list)
            if list.nonEmpty && cheap(lat, node.children) &&
              cheap(lon, node.children) =>
          rewrite(in, lat, lon, p, list)
      }
    }
}

/** SparkSessionExtensions entry point: injects the geofence-pruning
  * optimizer rule and the top-k-per-group planner strategy
  * ([[org.apache.spark.sql.graft.TopKStrategy]]). Usable via config
  * (`spark.sql.extensions=graft.plans.GraftExtensions`) or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => GeofencePruneRule)
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.TopKStrategy)
  }
}
