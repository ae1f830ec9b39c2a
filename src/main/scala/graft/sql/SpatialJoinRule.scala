package graft.sql

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Optimizer rule (SURVEY.md §7 step 8 stretch goal): rewrite a join
 * whose only predicate is `st_contains_xy(geom, lon, lat)` /
 * `st_intersects_xy(geom, lon, lat)` — an O(|L|·|R|) nested-loop
 * join — into a cell equi-join:
 *
 *   L ⋈_{containsXY(g,x,y)} R
 *   ⇒ Project(L.out ++ R.out)(
 *       (L + cellId(x,y))  ⋈_{__cell = __cell ∧ containsXY}
 *       Generate(explode(covering(g)), R))
 *
 * The polygon side explodes to its (disjoint) covering cells, the
 * point side maps to exactly one cell, so the equi-join emits each
 * candidate pair at most once and Catalyst picks BroadcastHashJoin or
 * SortMergeJoin on the cell key — the hand-written plan from
 * SpatialJoins.broadcastPipJoin, derived automatically.
 *
 * Registered via `spark.experimental.extraOptimizations` (see
 * functions.registerOptimizations) or GraftExtensions.
 */
case class SpatialJoinRule(level: Int = 6) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if isRewritableTopPredicate(cond, left, right) =>
      val (geomE, lonE, latE) = extract(cond)
      // which side holds the polygon geometry?
      val geomOnRight = geomE.references.subsetOf(right.outputSet)
      val (ptSide, polySide) = if (geomOnRight) (left, right) else (right, left)
      if (!lonE.references.subsetOf(ptSide.outputSet) ||
          !latE.references.subsetOf(ptSide.outputSet) ||
          !geomE.references.subsetOf(polySide.outputSet)) j
      else {
        val cellAttrPt = AttributeReference("__cell_pt", org.apache.spark.sql.types.LongType,
          nullable = false)()
        val ptProj = Project(ptSide.output :+
          Alias(StCellId(Literal(level), lonE, latE), "__cell_pt")(
            exprId = cellAttrPt.exprId), ptSide)

        val cellAttrPoly = AttributeReference("__cell_poly",
          org.apache.spark.sql.types.LongType, nullable = false)()
        val gen = Generate(
          ExplodeBase2(StCovering(Literal(level), geomE)),
          unrequiredChildIndex = Nil,
          outer = false,
          qualifier = None,
          generatorOutput = Seq(cellAttrPoly),
          child = polySide)

        val newCond = And(EqualTo(cellAttrPt, cellAttrPoly), cond)
        val joined = Join(ptProj, gen, Inner, Some(newCond), hint)
        Project(left.output ++ right.output, joined)
      }
  }

  /** explode() for the generator position. */
  private def ExplodeBase2(child: Expression): Generator = Explode(child)

  private def isRewritableTopPredicate(cond: Expression,
      left: LogicalPlan, right: LogicalPlan): Boolean = cond match {
    case StContainsXY(g, lon, lat) => splitSides(g, lon, lat, left, right)
    case StIntersectsXY(g, lon, lat) => splitSides(g, lon, lat, left, right)
    case _ => false
  }

  private def splitSides(g: Expression, lon: Expression, lat: Expression,
      left: LogicalPlan, right: LogicalPlan): Boolean = {
    val geomLeft = g.references.subsetOf(left.outputSet)
    val geomRight = g.references.subsetOf(right.outputSet)
    val ptLeft = lon.references.subsetOf(left.outputSet) && lat.references.subsetOf(left.outputSet)
    val ptRight = lon.references.subsetOf(right.outputSet) && lat.references.subsetOf(right.outputSet)
    (geomRight && ptLeft) || (geomLeft && ptRight)
  }

  private def extract(cond: Expression): (Expression, Expression, Expression) = cond match {
    case StContainsXY(g, lon, lat) => (g, lon, lat)
    case StIntersectsXY(g, lon, lat) => (g, lon, lat)
    case _ => throw new IllegalStateException("unreachable")
  }
}
