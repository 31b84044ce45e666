package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Codegen'd IEEE-754 order-preserving bits: a long whose SIGNED order
  * equals the double's numeric order — the missing piece that lets
  * float/double columns participate in the fixed-width key/stats encoding
  * (`Manifest.keyEncoding` v3) and therefore in file-level range skipping.
  *
  * Transform: positives keep their bit pattern (sign bit 0, ascending);
  * negatives flip the magnitude bits (sign bit stays 1, so they sort
  * below positives, and more-negative values sort lower). `-0.0`
  * normalizes to `+0.0` first — Spark predicates treat them equal, so the
  * encodings must too (a file whose max is -0.0 must not be skipped for
  * `>= 0.0`). NaN canonicalizes via `doubleToLongBits` and lands above
  * +Infinity, matching Spark's sort order.
  *
  * WHY a custom expression: no Spark builtin exposes raw float bits, and
  * a UDF would drop the stats-collection pass out of whole-stage codegen.
  */
case class OrderedDoubleBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ordered_double_bits needs a double argument, got $other")
  }

  override def nullSafeEval(v: Any): Any = java.lang.Long.valueOf(
    OrderedDoubleBits.orderedBits(v.asInstanceOf[Double]))

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = OrderedDoubleBits.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.orderedBits($a);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): OrderedDoubleBits = copy(child = newChild)
}

object OrderedDoubleBits {
  /** Signed-monotone long for any double (see class doc). */
  def orderedBits(d0: Double): Long = {
    val d = if (d0 == 0.0d) 0.0d else d0 // -0.0 == 0.0 in predicates
    val bits = java.lang.Double.doubleToLongBits(d) // canonical NaN
    bits ^ (if (bits < 0L) 0x7FFFFFFFFFFFFFFFL else 0L)
  }
}
