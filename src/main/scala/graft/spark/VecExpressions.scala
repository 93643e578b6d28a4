package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native codegen kernels for embedding-vector scoring (`ARRAY<FLOAT>`
 * dot product and L2 norm). These sit on every candidate pair of the
 * LSH / IVF / near-dup joins — the UDF form pays a catalyst→Scala
 * converter that ALLOCATES AND COPIES both arrays per pair; the native
 * expressions read the UnsafeArrayData buffers in place inside
 * whole-stage codegen, so a candidate pair costs one float loop and
 * zero allocations.
 */
object VecNative {
  def vecDot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def vecNorm(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = a.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }
}

object VecExpressions {

  case class VecDotExpr(left: Expression, right: Expression) extends BinaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      VecNative.vecDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.spark.VecNative.vecDot($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
    override def prettyName: String = "vec_dot"
  }

  case class VecNormExpr(child: Expression) extends UnaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any): Any =
      VecNative.vecNorm(a.asInstanceOf[ArrayData])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.spark.VecNative.vecNorm($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "vec_norm"
  }

  /** Idempotent session registration — the ANN join paths call this at
    * build time so library users need no explicit register step. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def put(name: String, n: Int)(f: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, { args: Seq[Expression] =>
        require(args.size == n, s"$name expects $n arguments")
        f(args)
      }, "built-in")
    def arrF(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) => e
      case _ => Cast(e, ArrayType(FloatType))
    }
    put("vec_dot", 2)(a => VecDotExpr(arrF(a(0)), arrF(a(1))))
    put("vec_norm", 1)(a => VecNormExpr(arrF(a(0))))
  }
}
