package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.expressions.aggregate.First
import org.apache.spark.sql.types.{ArrayType, LongType, MapType}

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

  /** The rewrite hashes and groups whole rows; map columns are neither
    * hashable nor groupable, so such joins keep the nested-loop plan. */
  private def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: MapType => true
    case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
    case a: ArrayType => hasMap(a.elementType)
    case _ => false
  }

  private def rewritable(j: Join): Boolean = j.output.forall(a => !hasMap(a.dataType))

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(left, right, Inner, Some(cond), hint) if rewritable(j) =>
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
      // deterministic 128-bit content fingerprint (stable under stage retry,
      // unlike MonotonicallyIncreasingID — see S2Join.withCells)
      val rowId = Alias(CreateStruct(Seq(
        new XxHash64(Literal(1L) +: child.output),
        new XxHash64(Literal(2L) +: child.output))), s"__${side}_rowid")()
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
    // dedupe multi-cell matches per original row pair: group on the row-id
    // pair only — every output column is functionally dependent on it, so
    // first() recovers them without shuffling whole geography blobs as keys
    // (Deduplicate is not legal this late in the optimizer, Aggregate is)
    val aggs = j.output.map { a =>
      Alias(First(a, ignoreNulls = false).toAggregateExpression(), a.name)(exprId = a.exprId)
    }
    Aggregate(Seq(lId, rId), aggs, refined)
  }
}
