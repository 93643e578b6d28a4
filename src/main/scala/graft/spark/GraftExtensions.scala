package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/**
 * SparkSessionExtensions entry point:
 *   spark.sql.extensions=graft.spark.GraftExtensions
 *
 * Injects [[SpatialJoinRewrite]], which turns a theta join on
 * s2_intersects / s2_contains / s2_dwithin(constant radius) into the
 * scalable cover-then-refine equi-join (SURVEY §2.8). Without the rule such
 * joins execute as BroadcastNestedLoopJoin — O(|L|*|R|) predicate
 * evaluations; with it they shuffle once on covering cells and evaluate the
 * exact predicate only on cell-colocated candidates.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectOptimizerRule(_ => SpatialJoinRewrite)
  }
}

object SpatialJoinRewrite extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  private val CoveringLevel = 4

  private def isFn(u: ScalaUDF, fn: AnyRef, name: String): Boolean =
    (u.function.asInstanceOf[AnyRef] eq fn) || u.udfName.contains(name)

  /** Recognize our registered predicate UDFs by function identity (Column
    * DSL) or registered name (SQL surface). Returns (geogA, geogB,
    * probeMeters): probeMeters is None for intersects/contains, the constant
    * radius for dwithin. The predicate expression itself is reused verbatim
    * as the refine filter, so argument order (contains is asymmetric) is
    * never disturbed. */
  private def spatialPredicate(e: Expression): Option[(Expression, Expression, Option[Double])] =
    e match {
      case GeogExpressions.S2IntersectsExpr(g1, g2) => Some((g1, g2, None))
      case GeogExpressions.S2ContainsExpr(g1, g2) => Some((g1, g2, None))
      case GeogExpressions.S2DwithinExpr(g1, g2, m) if m.foldable =>
        m.eval() match {
          case d: java.lang.Double if d > 0 => Some((g1, g2, Some(d)))
          case _ => None
        }
      case u: ScalaUDF if u.children.size == 2 &&
          (isFn(u, S2Functions.intersects, "s2_intersects") ||
            isFn(u, S2Functions.contains, "s2_contains")) =>
        Some((u.children(0), u.children(1), None))
      case u: ScalaUDF if u.children.size == 3 && isFn(u, S2Functions.dwithin, "s2_dwithin") &&
          u.children(2).foldable =>
        u.children(2).eval() match {
          case m: java.lang.Double if m > 0 => Some((u.children(0), u.children(1), Some(m)))
          case _ => None
        }
      case _ => None
    }

  /** The rewrite's own output (and S2Join's hand-built plans) carry these
    * marker columns; matching them again would re-rewrite the refine filter
    * after it gets pushed into the cell join — an unbounded loop across
    * optimizer iterations. */
  private def alreadyCellJoin(p: LogicalPlan): Boolean =
    p.output.exists { a =>
      a.name == "__l_cov" || a.name == "__r_cov" || a.name == "__l_cell" ||
        a.name == "__r_cell" || a.name == "__lcov" || a.name == "__rcov" ||
        a.name == "__cell"
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(left, right, Inner, Some(cond), _)
        if !alreadyCellJoin(left) && !alreadyCellJoin(right) =>
      // a spatial predicate ANYWHERE among the conjuncts drives the rewrite
      // (real joins carry extra conditions — id ordering, attribute
      // filters); the FULL original condition stays as the refine filter,
      // so semantics are independent of which conjunct was picked
      val conjuncts = splitConjunctivePredicates(cond)
      val matched = conjuncts.iterator
        .map(c => (c, spatialPredicate(c)))
        .collectFirst { case (c, Some(m)) => (c, m) }
      matched match {
        case Some((spatial, (g1, g2, meters)))
            if g1.references.subsetOf(left.outputSet) && g2.references.subsetOf(right.outputSet) =>
          rewrite(j, left, right, spatial, conjuncts.filterNot(_ eq spatial), g1, g2, meters)
        case Some((spatial, (g1, g2, meters)))
            if g2.references.subsetOf(left.outputSet) && g1.references.subsetOf(right.outputSet) =>
          rewrite(j, left, right, spatial, conjuncts.filterNot(_ eq spatial), g2, g1, meters)
        case _ => j
      }
  }

  /**
   * Cover-then-refine with smallest-common-cell reporting:
   *
   *   explode(covering(geog)) on each side, equi-join on the cell, then keep
   *   a candidate pair only where the matched cell is the minimum cell the
   *   two covering arrays share, and finally apply the exact predicate.
   *
   * Each qualifying row pair survives on exactly ONE cell, so the rewrite
   * preserves inner-join multiplicity bit-for-bit (duplicate rows, rows
   * differing only in null placement, map-typed columns — nothing is hashed
   * or grouped) and needs no dedupe shuffle. Null geographies cover nothing
   * and drop out of the explode, matching the null-predicate semantics of
   * the plan being replaced.
   *
   * For dwithin the left side's cells are expanded to the full
   * 8-neighborhood at a level whose min cell width exceeds the radius, so
   * every within-radius pair shares a probe cell.
   */
  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      spatial: Expression, others: Seq[Expression],
                      geogL: Expression, geogR: Expression, meters: Option[Double]): LogicalPlan = {
    val level = meters.fold(CoveringLevel)(S2Join.levelForDistance)

    def covered(child: LogicalPlan, geog: Expression, side: String,
                withNeighbors: Boolean): (LogicalPlan, Attribute, Attribute) = {
      val cov: Expression =
        if (withNeighbors) ScalaUDF(
          function = S2Functions.coveringFixedLevelWithNeighbors,
          dataType = ArrayType(LongType, containsNull = false),
          children = Seq(geog, Literal(level)),
          inputEncoders = Seq(scala.None, scala.None),
          udfName = Some("s2_covering_fixed_level_with_neighbors"))
        else GeogExpressions.S2CoveringFixedLevelExpr(geog, Literal(level))
      val covAlias = Alias(cov, s"__${side}_cov")()
      val tagged = Project(child.output :+ covAlias, child)
      val cellAttr = AttributeReference(s"__${side}_cell", LongType, nullable = false)()
      val gen = Generate(Explode(covAlias.toAttribute), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(cellAttr), child = tagged)
      (gen, covAlias.toAttribute, cellAttr)
    }

    val (lPlan, lCov, lCell) = covered(left, geogL, "l", withNeighbors = meters.isDefined)
    val (rPlan, rCov, rCell) = covered(right, geogR, "r", withNeighbors = false)

    val cellJoin = Join(lPlan, rPlan, Inner, Some(EqualTo(lCell, rCell)), j.hint)
    // evaluation-order discipline (same as S2Join.refineDedupe): the cheap
    // non-spatial conjuncts run first inside an If the optimizer cannot
    // split or reorder, then the exact spatial predicate (same
    // per-candidate work as the replaced plan), then the array reporting
    // condition on surviving pairs only
    val smallestCommonCell = EqualTo(lCell, ArrayMin(ArrayIntersect(lCov, rCov)))
    val spatialThenReport = And(spatial, smallestCommonCell)
    val refineCond = others.reduceOption(And) match {
      case Some(cheap) => If(cheap, spatialThenReport, Literal.FalseLiteral)
      case scala.None => spatialThenReport
    }
    val refined = Filter(refineCond, cellJoin)
    Project(j.output, refined)
  }
}
