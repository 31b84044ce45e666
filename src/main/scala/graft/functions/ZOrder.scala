package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Codegen'd 2-D Morton (Z-order) interleave: bit i of each input becomes
  * bits 2i / 2i+1 of the output, so sorting by the result clusters rows
  * that are close in BOTH dimensions — the multi-column generalization of
  * [[graft.table.CowTable]]'s single-column cluster-by. Files written in
  * Z-order carry tight min/max statistics on BOTH columns simultaneously,
  * so 2-D range predicates prune row groups that a single-column sort
  * order could only prune on one axis (the standard lakehouse Z-ordering
  * trick; at 100 TB layout is the difference between scanning a stripe
  * and scanning everything).
  *
  * Inputs are masked to their low 31 bits (callers normalize wider domains
  * first — rank or range-scale): 31 bits per dimension keeps every
  * intermediate, including the odd-bit spread, inside positive signed-64
  * range, which also makes the arithmetic expressible in engines that
  * overflow-check shifts (the DuckDB oracle).
  *
  * WHY a custom expression: the magic-mask spread is 12 shift/mask steps
  * per row; as a Column expression tree that is ~24 nested nodes
  * re-evaluated through codegen'd but deeply nested projections, and a UDF
  * would leave codegen entirely. This emits the tight straight-line loop.
  */
case class BitInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) | (IntegerType, IntegerType) |
           (LongType, IntegerType) | (IntegerType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bit_interleave needs two integral args, got $l/$r")
    }

  private def toLong(v: Any): Long = v match {
    case i: java.lang.Integer => i.toLong
    case l: java.lang.Long => l
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(BitInterleave.morton(toLong(a), toLong(b)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = BitInterleave.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.morton((long)$a, (long)$b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitInterleave =
    copy(left = newLeft, right = newRight)
}

object BitInterleave {
  /** Spread the low 31 bits of x to even bit positions (magic masks). */
  def spread(x0: Long): Long = {
    var x = x0 & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code of (a, b), 31 bits each: a on even bits, b on odd. */
  def morton(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}

object ZOrder {
  /** Column API for [[BitInterleave]]: `zorder2(a, b)` as a sort key. */
  def zorder2(a: Column, b: Column): Column =
    GraftBridge.column(
      BitInterleave(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** The identical computation as engine-portable SQL (generated from the
    * same mask constants — parity by construction), for oracles and
    * engines without the expression.
    */
  def mortonSql(a: String, b: String): String = {
    def spread(v: String): String = {
      val s0 = s"($v & 2147483647)"
      val s1 = s"(($s0 | ($s0 << 16)) & 281470681808895)"
      val s2 = s"(($s1 | ($s1 << 8)) & 71777214294589695)"
      val s3 = s"(($s2 | ($s2 << 4)) & 1085102592571150095)"
      val s4 = s"(($s3 | ($s3 << 2)) & 3689348814741910323)"
      s"(($s4 | ($s4 << 1)) & 6148914691236517205)"
    }
    s"(${spread(a)} | (${spread(b)} << 1))"
  }
}
