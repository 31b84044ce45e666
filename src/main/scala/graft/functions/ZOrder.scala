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

  /** N-dimensional Morton code: bit i of dimension d lands at output bit
    * i*n + d (dimension 0 lowest — for n = 2 this is exactly [[morton]]).
    * Each value is masked to its low `bits` bits; callers keep
    * n * bits <= 63. A plain loop, not magic masks (those are per-arity);
    * ~n*bits ops per row, emitted as one straight-line call under codegen.
    */
  def mortonN(vs: Array[Long], bits: Int): Long = {
    val n = vs.length
    var out = 0L
    var i = 0
    while (i < bits) {
      var d = 0
      while (d < n) {
        out |= ((vs(d) >>> i) & 1L) << (i * n + d)
        d += 1
      }
      i += 1
    }
    out
  }
}

/** N-ary sibling of [[BitInterleave]] for 3+ clustering axes (2-D keeps
  * the magic-mask fast path). Same contract: integral inputs, masked to
  * `bits` low bits each, null if any input is null.
  */
case class BitInterleaveN(children: Seq[Expression], bits: Int)
    extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size < 2)
      TypeCheckResult.TypeCheckFailure("bit_interleave_n needs >= 2 args")
    else if (children.size * bits > 63)
      TypeCheckResult.TypeCheckFailure(
        s"${children.size} dims * $bits bits exceeds 63 output bits")
    else children.map(_.dataType).find(t =>
      t != LongType && t != IntegerType) match {
      case Some(t) => TypeCheckResult.TypeCheckFailure(
        s"bit_interleave_n needs integral args, got $t")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val arr = new Array[Long](children.size)
    var i = 0
    while (i < arr.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      arr(i) = v match {
        case x: java.lang.Integer => x.toLong
        case x: java.lang.Long => x
      }
      i += 1
    }
    java.lang.Long.valueOf(BitInterleave.mortonN(arr, bits))
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val cls = BitInterleave.getClass.getName.stripSuffix("$")
    val arr = ctx.freshName("zvals")
    val childCode = evals.map(_.code).reduce(_ + _)
    val anyNull =
      if (nullable) evals.map(_.isNull.toString).mkString(" || ")
      else "false"
    val vals = evals.map(e => s"(long)(${e.value})").mkString(", ")
    ev.copy(code = childCode + code"""
      boolean ${ev.isNull} = $anyNull;
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        long[] $arr = new long[]{$vals};
        ${ev.value} = $cls.mortonN($arr, $bits);
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitInterleaveN =
    copy(children = newChildren)
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

  /** Column API for [[BitInterleaveN]]: 3+ clustering axes; 2 cols route
    * to the magic-mask fast path when bits = 31.
    */
  def zorderN(cols: Seq[Column], bits: Int): Column =
    // 2-D always takes the magic-mask path: inputs are pre-masked to
    // `bits` low bits by the caller, so spreading 31 bits is identical
    if (cols.size == 2 && bits <= 31) zorder2(cols(0), cols(1))
    else GraftBridge.column(
      BitInterleaveN(cols.map(GraftBridge.expression), bits))

  /** Engine-portable SQL for [[BitInterleave.mortonN]] — generated from
    * the same bit placement (i*n + d), for oracles. n * bits <= 63.
    */
  def mortonNSql(cols: Seq[String], bits: Int): String = {
    val n = cols.size
    val terms = for (i <- 0 until bits; d <- 0 until n)
      yield s"((((${cols(d)}) >> $i) & 1) << ${i * n + d})"
    terms.mkString("(", " | ", ")")
  }
}
