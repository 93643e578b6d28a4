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
 * s2_intersects/s2_contains into the scalable cover-then-refine equi-join
 * (SURVEY §2.8). Without the rule such joins execute as
 * BroadcastNestedLoopJoin — O(|L|*|R|) predicate evaluations; with it they
 * shuffle once on covering cells and evaluate the exact predicate only on
 * cell-colocated candidates.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectOptimizerRule(_ => SpatialJoinRewrite)
  }
}

object SpatialJoinRewrite extends Rule[LogicalPlan] {

  private val CoveringLevel = 4

  /** Recognize our registered predicate UDFs by function identity (Column
    * DSL) or registered name (SQL surface). */
  private def spatialPredicate(e: Expression): Option[(Expression, Expression)] = e match {
    case u: ScalaUDF if u.children.size == 2 &&
        ((u.function.asInstanceOf[AnyRef] eq S2Functions.intersects) ||
          u.udfName.contains("s2_intersects")) =>
      Some((u.children(0), u.children(1)))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      spatialPredicate(cond) match {
        case Some((g1, g2))
            if g1.references.subsetOf(left.outputSet) && g2.references.subsetOf(right.outputSet) =>
          rewrite(j, left, right, cond, g1, g2)
        case Some((g1, g2))
            if g2.references.subsetOf(left.outputSet) && g1.references.subsetOf(right.outputSet) =>
          rewrite(j, left, right, cond, g2, g1)
        case _ => j
      }
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, geogL: Expression, geogR: Expression): LogicalPlan = {
    def tagAndExplode(child: LogicalPlan, geog: Expression, side: String)
        : (LogicalPlan, Attribute, Attribute) = {
      val rowId = Alias(MonotonicallyIncreasingID(), s"__${side}_rowid")()
      val tagged = Project(child.output :+ rowId, child)
      val covering = ScalaUDF(
        function = S2Functions.coveringFixedLevel,
        dataType = ArrayType(LongType, containsNull = false),
        children = Seq(geog, Literal(CoveringLevel)),
        inputEncoders = Seq(scala.None, scala.None),
        udfName = Some("s2_covering_fixed_level"))
      val cellAttr = AttributeReference(s"__${side}_cell", LongType, nullable = false)()
      val gen = Generate(Explode(covering), unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(cellAttr), child = tagged)
      (gen, rowId.toAttribute, cellAttr)
    }

    val (lPlan, lId, lCell) = tagAndExplode(left, geogL, "l")
    val (rPlan, rId, rCell) = tagAndExplode(right, geogR, "r")

    val cellJoin = Join(lPlan, rPlan, Inner, Some(EqualTo(lCell, rCell)), j.hint)
    val refined = Filter(cond, cellJoin)
    // dedupe multi-cell matches per original row pair; grouping on the row
    // ids (plus the functionally-dependent outputs) emits each pair once
    // (Deduplicate is not legal this late in the optimizer, Aggregate is)
    val groupCols: Seq[Expression] = Seq(lId, rId) ++ j.output
    Aggregate(groupCols, j.output.map(_.asInstanceOf[NamedExpression]), refined)
  }
}
