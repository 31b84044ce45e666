package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product of two numeric arrays (float or double elements),
  * accumulating in double in ascending index order.
  *
  * WHY a custom expression: the built-in formulation
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (s,x) -> s+x)` runs on the
  * interpreted higher-order-function path — per-element lambda dispatch and
  * boxing, outside WholeStageCodegen. This expression emits a tight
  * primitive loop instead (preference order (b) of the build rules: custom
  * Expression before custom operator). The fold order and float->double
  * widening are IDENTICAL to the built-in + oracle formulation, so results
  * stay bit-for-bit comparable.
  *
  * Null elements inside either array are skipped pairwise (contributes 0),
  * matching `zip_with` multiply-null semantics only when no nulls exist —
  * the embedding pipelines guarantee dense vectors.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    (elemType(left), elemType(right)) match {
      case (FloatType, FloatType) | (DoubleType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot needs two array<float> or two array<double> args, got $l/$r")
    }
  }

  private lazy val isFloat = elemType(left) == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    if (isFloat) {
      while (i < n) {
        if (!x.isNullAt(i) && !y.isNullAt(i))
          s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
    } else {
      while (i < n) {
        if (!x.isNullAt(i) && !y.isNullAt(i))
          s += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
    }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val get = if (isFloat) "getFloat" else "getDouble"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += (double)$a.$get($i) * (double)$b.$get($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column-level API for [[VectorDot]]. */
  def vec_dot(a: Column, b: Column): Column =
    GraftBridge.column(
      VectorDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Register the custom expressions for SQL users
    * (`SELECT vec_dot(a, b) ...`). Per-session, idempotent.
    */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VectorDot(exprs(0), exprs(1)), "scala_udf")
}
