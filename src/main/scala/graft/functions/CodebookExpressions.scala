package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Compact codebook scoring expressions for the IVF/PQ hot paths.
  *
  * WHY: inlining a codebook as `array(struct(round(cosine(v, lit(c0))), …),
  * …)` re-derives the whole scoring tree per centroid, and past ~16
  * centroids (or 128 PQ cells) the generated method for the enclosing
  * stage crosses the JVM's 64 KB limit — Janino fails and Spark silently
  * falls back to INTERPRETED execution for the stage, a 5-10× slowdown
  * measured on `semantic_dedup` (0.6 s → 3.5 s at sf0.1). These
  * expressions hold the codebook as a plain field and LOOP over it in one
  * `eval` call (CodegenFallback: the surrounding stage still codegens;
  * the per-row cost is one virtual call into JIT-compiled Scala loops),
  * so code size is constant in k and the scoring arithmetic is written
  * once.
  *
  * Every arithmetic step replicates the built-in expression semantics
  * BIT-FOR-BIT (the battery rows are certified on them): dot products
  * accumulate in double ascending-index (as [[VectorDot]]), `round(x, 6)`
  * is Spark's Round (BigDecimal.valueOf, HALF_UP, NaN/∞ passthrough),
  * comparisons use `java.lang.Double.compare` (NaN greatest — the
  * `array_max`/`array_min`/`array_sort` ordering).
  */
object CodebookArith {
  def dotF(x: ArrayData, from: Int, n: Int, c: Array[Double],
      isFloat: Boolean): Double = {
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (isFloat) x.getFloat(from + i).toDouble
        else x.getDouble(from + i)
      s += xv * c(i)
      i += 1
    }
    s
  }

  def selfDot(x: ArrayData, from: Int, n: Int, isFloat: Boolean): Double = {
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (isFloat) x.getFloat(from + i).toDouble
        else x.getDouble(from + i)
      s += xv * xv
      i += 1
    }
    s
  }

  def selfDot(c: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  }

  /** Spark's `round(x, 6)` for doubles: NaN/∞ pass through, else
    * BigDecimal.valueOf → setScale(6, HALF_UP).
    */
  def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def checkVec(e: Expression): TypeCheckResult = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"expected array<float|double> vector, got $t")
  }

  val cellStruct: StructType = StructType(Seq(
    StructField("sim", DoubleType, nullable = false),
    StructField("centroid_id", LongType, nullable = false)))
}

/** argmax-cosine cell pick: `struct(sim, centroid_id)` with
  * `sim = round(cosine(v, c), 6)`, ties to the LOWEST centroid id —
  * the `array_max(struct(sim, -cid))` / window (`sim desc, cid asc`)
  * ordering, evaluated as one loop.
  */
case class NearestCentroidCosine(child: Expression, ids: Seq[Long],
    cents: Seq[Seq[Double]]) extends UnaryExpression with CodegenFallback {
  import CodebookArith._

  override def dataType: DataType = cellStruct
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = checkVec(child)
  override def prettyName: String = "nearest_centroid_cosine"

  @transient private lazy val isFloat = elemIsFloat(child)
  @transient private lazy val cvs: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  @transient private lazy val idArr: Array[Long] = ids.toArray
  @transient private lazy val norms: Array[Double] =
    cvs.map(c => math.sqrt(selfDot(c)))

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val normX = math.sqrt(selfDot(x, 0, x.numElements(), isFloat))
    var bestSim = java.lang.Double.NEGATIVE_INFINITY
    var bestId = Long.MaxValue
    var first = true
    var i = 0
    while (i < cvs.length) {
      val c = cvs(i)
      val s = round6(
        dotF(x, 0, math.min(x.numElements(), c.length), c, isFloat) /
          (normX * norms(i)))
      val cmp = java.lang.Double.compare(s, bestSim)
      if (first || cmp > 0 || (cmp == 0 && idArr(i) < bestId)) {
        bestSim = s; bestId = idArr(i); first = false
      }
      i += 1
    }
    InternalRow(bestSim, bestId)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Top-`nProbe` cells by cosine, sorted `(csim desc, centroid_id asc)` —
  * the `slice(reverse(array_sort(struct(csim, -cid))), 1, n)` ordering as
  * one loop; returns `array<struct<sim, centroid_id>>`.
  */
case class TopCellsCosine(child: Expression, ids: Seq[Long],
    cents: Seq[Seq[Double]], nProbe: Int, micro: Boolean = false)
    extends UnaryExpression with CodegenFallback {
  import CodebookArith._

  override def dataType: DataType = ArrayType(cellStruct, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = checkVec(child)
  override def prettyName: String = "top_cells_cosine"

  @transient private lazy val isFloat = elemIsFloat(child)
  @transient private lazy val cvs: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  @transient private lazy val idArr: Array[Long] = ids.toArray
  @transient private lazy val norms: Array[Double] =
    cvs.map(c => math.sqrt(selfDot(c)))

  /** `micro = true` quantizes with `floor(x·1e6 + 0.5)/1e6` (the micro6
    * contract of `ivfPqSearch`'s probe); false uses Spark `round(x, 6)`
    * (the `semanticDecontaminateIvf` probe contract).
    */
  private def quant(x: Double): Double =
    if (micro) math.floor(x * 1.0e6 + 0.5) / 1.0e6 else round6(x)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val normX = math.sqrt(selfDot(x, 0, x.numElements(), isFloat))
    val sims = new Array[Double](cvs.length)
    var i = 0
    while (i < cvs.length) {
      sims(i) = quant(
        dotF(x, 0, math.min(x.numElements(), cvs(i).length), cvs(i),
          isFloat) / (normX * norms(i)))
      i += 1
    }
    val order = (0 until cvs.length).sortWith { (p, q) =>
      val c = java.lang.Double.compare(sims(p), sims(q))
      if (c != 0) c > 0 else idArr(p) < idArr(q)
    }.take(math.min(nProbe, cvs.length))
    new GenericArrayData(
      order.map(j => InternalRow(sims(j), idArr(j))).toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** argmin-L2 centroid pick: `struct(dist2, centroid_id)` with raw
  * `dist2 = (dot(x,x) - 2·dot(x,c)) + dot(c,c)` (k-means assignment),
  * ties to the lowest id.
  */
case class NearestCentroidL2(child: Expression, ids: Seq[Long],
    cents: Seq[Seq[Double]]) extends UnaryExpression with CodegenFallback {
  import CodebookArith._

  override def dataType: DataType = StructType(Seq(
    StructField("dist2", DoubleType, nullable = false),
    StructField("centroid_id", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = checkVec(child)
  override def prettyName: String = "nearest_centroid_l2"

  @transient private lazy val isFloat = elemIsFloat(child)
  @transient private lazy val cvs: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  @transient private lazy val idArr: Array[Long] = ids.toArray
  @transient private lazy val selfDots: Array[Double] = cvs.map(selfDot)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val xx = selfDot(x, 0, x.numElements(), isFloat)
    var bestD = java.lang.Double.POSITIVE_INFINITY
    var bestId = Long.MaxValue
    var first = true
    var i = 0
    while (i < cvs.length) {
      val d = (xx - 2.0 * dotF(x, 0,
        math.min(x.numElements(), cvs(i).length), cvs(i), isFloat)) +
        selfDots(i)
      val cmp = java.lang.Double.compare(d, bestD)
      if (first || cmp < 0 || (cmp == 0 && idArr(i) < bestId)) {
        bestD = d; bestId = idArr(i); first = false
      }
      i += 1
    }
    InternalRow(bestD, bestId)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Product-quantization pack: per subspace `m`, the argmin of
  * `floor(((dot(sv,sv) - 2·dot(sv,c)) + dot(c,c))·1e6 + 0.5)` (ties to
  * the lowest centroid id — [[graft.sim.Similarity.pqAssign]]'s window
  * ordering), packed `Σ_m code_m · k^m` into one BIGINT.
  */
case class PqPackCode(child: Expression, subDim: Int, kPow: Seq[Long],
    ids: Seq[Seq[Long]], cents: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with CodegenFallback {
  import CodebookArith._

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = checkVec(child)
  override def prettyName: String = "pq_pack_code"

  @transient private lazy val isFloat = elemIsFloat(child)
  @transient private lazy val cvs: Array[Array[Array[Double]]] =
    cents.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val idArr: Array[Array[Long]] =
    ids.map(_.toArray).toArray
  @transient private lazy val selfDots: Array[Array[Double]] =
    cvs.map(_.map(selfDot))
  @transient private lazy val pows: Array[Long] = kPow.toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var code = 0L
    var m = 0
    while (m < cvs.length) {
      val from = m * subDim
      val sxx = selfDot(x, from, subDim, isFloat)
      var bestD = java.lang.Double.POSITIVE_INFINITY
      var bestId = Long.MaxValue
      var first = true
      var i = 0
      while (i < cvs(m).length) {
        val d = math.floor(
          ((sxx - 2.0 * dotF(x, from, subDim, cvs(m)(i), isFloat)) +
            selfDots(m)(i)) * 1.0e6 + 0.5)
        val cmp = java.lang.Double.compare(d, bestD)
        if (first || cmp < 0 || (cmp == 0 && idArr(m)(i) < bestId)) {
          bestD = d; bestId = idArr(m)(i); first = false
        }
        i += 1
      }
      code += bestId * pows(m)
      m += 1
    }
    java.lang.Long.valueOf(code)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Per-QUERY-row ADC lookup table: `array<long>` of numSub×k micro-unit
  * squared-L2 distances from the query's m-th subvector to subspace m's
  * centroids, indexed `m·k + centroid_id` — the batched twin of the
  * driver-collected LUT in [[graft.sim.Similarity.pqSearchIndexed]]
  * (identical arithmetic: `floor(d2·1e6 + 0.5)` as LONG).
  */
case class PqQueryLut(child: Expression, subDim: Int, k: Int,
    ids: Seq[Seq[Long]], cents: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with CodegenFallback {
  import CodebookArith._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = checkVec(child)
  override def prettyName: String = "pq_query_lut"

  @transient private lazy val isFloat = elemIsFloat(child)
  @transient private lazy val cvs: Array[Array[Array[Double]]] =
    cents.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val idArr: Array[Array[Long]] =
    ids.map(_.toArray).toArray
  @transient private lazy val selfDots: Array[Array[Double]] =
    cvs.map(_.map(selfDot))

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val lut = new Array[Long](cvs.length * k)
    var m = 0
    while (m < cvs.length) {
      val from = m * subDim
      val sxx = selfDot(x, from, subDim, isFloat)
      var i = 0
      while (i < cvs(m).length) {
        val d = math.floor(
          ((sxx - 2.0 * dotF(x, from, subDim, cvs(m)(i), isFloat)) +
            selfDots(m)(i)) * 1.0e6 + 0.5)
        lut(m * k + idArr(m)(i).toInt) = d.toLong
        i += 1
      }
      m += 1
    }
    new GenericArrayData(lut)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Batched ADC distance: the integer micro-unit sum of LUT entries
  * selected by the packed code's base-k digits — the per-row scan of
  * [[graft.sim.Similarity.pqSearchIndexed]] with the LUT coming from a
  * COLUMN (one per query row) instead of a driver literal. Returns the
  * raw micro-unit LONG sum; divide once by 1e6 downstream.
  */
case class PqAdcFromLut(left: Expression, right: Expression, numSub: Int,
    k: Int) extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc_from_lut"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_from_lut needs (array<bigint> lut, bigint code), got $l/$r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    var code = b.asInstanceOf[Long]
    var s = 0L
    var m = 0
    while (m < numSub) {
      s += lut.getLong(m * k + (code % k).toInt)
      code /= k
      m += 1
    }
    java.lang.Long.valueOf(s)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqAdcFromLut = copy(left = l, right = r)
}

object CodebookExpressions {
  def nearestCentroidCosine(v: Column,
      cb: Seq[(Long, List[Double])]): Column =
    GraftBridge.column(NearestCentroidCosine(GraftBridge.expression(v),
      cb.map(_._1), cb.map(_._2)))

  def topCellsCosine(v: Column, cb: Seq[(Long, List[Double])],
      nProbe: Int, micro: Boolean = false): Column =
    GraftBridge.column(TopCellsCosine(GraftBridge.expression(v),
      cb.map(_._1), cb.map(_._2), nProbe, micro))

  def nearestCentroidL2(v: Column, cb: Seq[(Long, List[Double])]): Column =
    GraftBridge.column(NearestCentroidL2(GraftBridge.expression(v),
      cb.map(_._1), cb.map(_._2)))

  def pqPackCode(v: Column, subDim: Int, k: Int,
      pq: Map[Int, Seq[(Long, List[Double])]]): Column = {
    val numSub = pq.size
    val kPow = (0 until numSub).map(m => math.pow(k.toDouble, m).toLong)
    GraftBridge.column(PqPackCode(GraftBridge.expression(v), subDim, kPow,
      (0 until numSub).map(m => pq(m).map(_._1)),
      (0 until numSub).map(m => pq(m).map(_._2))))
  }

  def pqQueryLut(v: Column, subDim: Int, k: Int,
      pq: Map[Int, Seq[(Long, List[Double])]]): Column = {
    val numSub = pq.size
    require((0 until numSub).forall(m =>
      pq(m).map(_._1).sorted == (0L until k.toLong)),
      s"pq_query_lut needs dense centroid ids 0 until $k per subspace")
    GraftBridge.column(PqQueryLut(GraftBridge.expression(v), subDim, k,
      (0 until numSub).map(m => pq(m).map(_._1)),
      (0 until numSub).map(m => pq(m).map(_._2))))
  }

  def pqAdcFromLut(lut: Column, code: Column, numSub: Int, k: Int): Column =
    GraftBridge.column(PqAdcFromLut(GraftBridge.expression(lut),
      GraftBridge.expression(code), numSub, k))
}
