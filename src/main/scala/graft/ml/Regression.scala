package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass distributed model fitting over integer-valued features.
  *
  * The training-data pipeline's quality models (length/stopword/punct
  * regressors, per-language calibration lines) must be *trained* at corpus
  * scale, not just applied. The ops here fit closed-form linear models in a
  * single `groupBy().agg()` pass over exact integer moments:
  *
  *   - ONE shuffle of (group → constant-width moment vector); map-side
  *     partial aggregation collapses each partition to one row per group
  *     before the exchange, so the shuffle payload is ∝ groups, not rows —
  *     the shape that survives a 100-TB corpus on 1000 executors.
  *   - Exact integer arithmetic end-to-end: moments accumulate as
  *     DECIMAL(38,0) (int128 — overflow-checked, never wrapped), and the
  *     normal-equation solution is emitted as exact integer
  *     numerator/denominator pairs rather than engine-divided floats, so
  *     results are bit-identical across engines, parallelism levels and
  *     partial-agg merge orders (the battery's determinism contract).
  *
  * Consumers divide `num/den` at whatever precision they need (or keep the
  * exact rational for downstream algebra). Degenerate groups — fewer than
  * two points, or a constant regressor (den = 0) — emit NULL solutions
  * rather than a divide-by-zero.
  */
object Regression {

  private val D38 = "decimal(38,0)"

  /** Grouped simple OLS `y ≈ intercept + slope·x`, one aggregation pass.
    *
    * Output per group (sorted by the group columns for deterministic
    * ordering): `n, sum_x, sum_y` (BIGINT moments) and the closed-form
    * normal-equation solution as exact DECIMAL(38,0) integers
    *
    * {{{
    *   slope     = slope_num / den   = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *   intercept = icept_num / den   = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)
    * }}}
    *
    * `x` and `y` must be integral (cast to LONG internally); for
    * fractional features scale to fixed-point integers first — division is
    * deliberately left to the caller so the engine never emits
    * engine-version-sensitive float arithmetic.
    */
  def fitOlsGrouped(df: DataFrame, groupCols: Seq[String],
      x: Column, y: Column): DataFrame = {
    val g = groupCols.map(col)
    val m = df
      .select(g :+ x.cast("long").as("__x") :+ y.cast("long").as("__y"): _*)
      .groupBy(g: _*)
      .agg(
        count(lit(1)).as("n"),
        // first moments in DECIMAL(38,0) too: a LONG sum would silently
        // wrap past Σx ≈ 9·10¹⁸ while the squares stayed exact
        sum(col("__x").cast(D38)).as("sum_x"),
        sum(col("__y").cast(D38)).as("sum_y"),
        sum(col("__x").cast(D38) * col("__x")).as("sum_xx"),
        sum(col("__x").cast(D38) * col("__y")).as("sum_xy"))
    val n = col("n").cast(D38)
    val sx = col("sum_x").cast(D38)
    val sy = col("sum_y").cast(D38)
    val den = (n * col("sum_xx") - sx * sx).as("den")
    val slopeNum = (n * col("sum_xy") - sx * sy).as("slope_num")
    val iceptNum = (sy * col("sum_xx") - sx * col("sum_xy")).as("icept_num")
    m.select(g ++ Seq(col("n"), col("sum_x"), col("sum_y"),
        slopeNum, iceptNum, den): _*)
      .select(g ++ Seq(col("n"), col("sum_x"), col("sum_y"),
        when(col("den") === 0, lit(null)).otherwise(col("slope_num"))
          .as("slope_num"),
        when(col("den") === 0, lit(null)).otherwise(col("icept_num"))
          .as("icept_num"),
        when(col("den") === 0, lit(null)).otherwise(col("den")).as("den")): _*)
      .orderBy(groupCols.map(asc_nulls_first): _*)
  }

  /** Convenience float view of [[fitOlsGrouped]] for interactive use:
    * slope/intercept as DOUBLE (exact-integer division done once, at the
    * end). Not battery-certified — the exact num/den form is.
    */
  def fitOls(df: DataFrame, groupCols: Seq[String],
      x: Column, y: Column): DataFrame =
    fitOlsGrouped(df, groupCols, x, y).select(
      groupCols.map(col) ++ Seq(col("n"),
        (col("slope_num").cast("double") / col("den").cast("double"))
          .as("slope"),
        (col("icept_num").cast("double") / col("den").cast("double"))
          .as("intercept")): _*)

  /** Train-then-apply in one plan: fit [[fitOlsGrouped]] per group, then
    * score every row with its group's model — the residual
    * `y − (β0 + β1·x)` as the exact rational `residual_num / den`
    * (`residual_num = y·den − icept_num − slope_num·x`). Within a group
    * `den` is shared, so ranking by `residual_num` ranks by residual —
    * the outlier/miscalibration sweep a quality pipeline runs after
    * calibrating. The fitted model is a per-group constant-width table,
    * broadcast back against the corpus: train + apply is one moment
    * shuffle plus one map-side join, no iteration, no float op. Rows in
    * singular groups get NULL residuals.
    */
  def olsResiduals(df: DataFrame, groupCols: Seq[String],
      xCol: String, yCol: String): DataFrame = {
    // the two appended output columns must not collide with caller data;
    // model internals ride __-prefixed through the join
    Seq("residual_num", "den").foreach(c => require(
      !df.columns.contains(c),
      s"olsResiduals appends a `$c` column; rename the input's `$c`"))
    val fit = fitOlsGrouped(df, groupCols, col(xCol), col(yCol))
      .select(groupCols.map(col) ++ Seq(
        col("slope_num").as("__ols_slope"),
        col("icept_num").as("__ols_icept"),
        col("den").as("__ols_den")): _*)
    val joined =
      if (groupCols.isEmpty) df.crossJoin(broadcast(fit))
      else df.join(broadcast(fit), groupCols)
    joined
      .withColumn("residual_num",
        col(yCol).cast(D38) * col("__ols_den") - col("__ols_icept")
          - col("__ols_slope") * col(xCol).cast(D38))
      .withColumn("den", col("__ols_den"))
      .drop("__ols_slope", "__ols_icept", "__ols_den")
  }

  /** Multivariate Gram moments for `y ≈ Xβ` (with intercept): one pass
    * emitting every entry of `XᵀX` and `Xᵀy` as exact DECIMAL(38,0)
    * moments, one row per group. Features must be integral (fixed-point
    * scale fractional inputs first). Columns: the group cols, `n`, then
    * `m_i_j` = Σ xᵢ·xⱼ for 0 ≤ i ≤ j < p and `v_i` = Σ xᵢ·y and `v_y` = Σy
    * (feature 0 is the implicit intercept regressor 1, so `m_0_j` = Σxⱼ).
    * Solving the p×p system is a driver-side O(p³) on constant-size
    * output — the distributed work is exactly this one moment pass.
    */
  def gramMoments(df: DataFrame, groupCols: Seq[String],
      features: Seq[Column], y: Column): DataFrame = {
    val g = groupCols.map(col)
    val p = features.size + 1
    val xs = lit(1L) +: features.map(_.cast("long"))
    val named = xs.zipWithIndex.map { case (c, i) => c.as(s"__x$i") }
    val base = df.select(g ++ named :+ y.cast("long").as("__y"): _*)
    val crossAggs = for (i <- 0 until p; j <- i until p) yield
      sum(col(s"__x$i").cast(D38) * col(s"__x$j")).as(s"m_${i}_$j")
    val yAggs = (0 until p).map(i =>
      sum(col(s"__x$i").cast(D38) * col("__y")).as(s"v_$i"))
    base.groupBy(g: _*)
      .agg(count(lit(1)).as("n"), crossAggs ++ yAggs: _*)
      .orderBy(groupCols.map(asc_nulls_first): _*)
  }

  /** Grouped two-feature OLS `y ≈ β0 + β1·x1 + β2·x2`, fully distributed:
    * the [[gramMoments]] pass plus a per-group 3×3 Cramer solve expressed
    * as exact DECIMAL(38,0) column arithmetic — no driver-side solve, no
    * float op anywhere, so the result is bit-identical across engines and
    * parallelism. Output per group: `n`, coefficient numerators
    * `icept_num`/`x1_num`/`x2_num` and the shared `den` (= det XᵀX);
    * βᵢ = numᵢ/den. Singular groups (collinear features, < 3 points)
    * emit NULL solutions. Determinant terms are triple products of
    * moments — callers must keep |moment|³ < 10³⁸ (fixed-point-scale or
    * center large features first; at 10⁶-row groups with |x| ≤ 10³ the
    * bound holds with ~9 digits to spare).
    */
  def fitPlaneGrouped(df: DataFrame, groupCols: Seq[String],
      x1: Column, x2: Column, y: Column): DataFrame = {
    val gram = gramMoments(df, groupCols, Seq(x1, x2), y)
    def m(i: Int, j: Int): Column =
      col(if (i <= j) s"m_${i}_$j" else s"m_${j}_$i")
    def v(i: Int): Column = col(s"v_$i")
    def a(repl: Int)(i: Int, j: Int): Column =
      if (j == repl) v(i) else m(i, j)
    val den = det3(m).as("den")
    val nums = Seq("icept_num", "x1_num", "x2_num").zipWithIndex.map {
      case (nm, j) => det3(a(j)).as(nm)
    }
    gram.select(groupCols.map(col) ++
        (col("n") +: nums :+ den): _*)
      .select(groupCols.map(col) ++ (col("n") +:
        Seq("icept_num", "x1_num", "x2_num", "den").map(c =>
          when(col("den") === 0, lit(null)).otherwise(col(c)).as(c))): _*)
      .orderBy(groupCols.map(asc_nulls_first): _*)
  }

  /** Quantize an exact rational coefficient `num/den` to a BIGINT
    * micro-unit integer `⌊10⁶·num/den⌋` (floor division, sign-correct:
    * `pmod` keeps the remainder in `[0, den)` so negative numerators
    * floor toward −∞ exactly like `BigInt` floor-div). Requires
    * `den > 0` — always true for the Gram determinants here (XᵀX is
    * positive-definite whenever it is non-singular). NULL-in → NULL-out,
    * so singular groups stay NULL.
    *
    * This is the battery's cross-engine output form: the raw numerators
    * exceed 2⁶³ (den ≈ 8·10¹⁹ at sf0.1) and a >2⁶³ HUGEINT→DECIMAL cast
    * is engine-version-dependent in DuckDB (older versions route it
    * through DOUBLE), while the quantized coefficients are ~10⁶–10⁹ and
    * survive any engine's cast path exactly. The multiply stays inside
    * DECIMAL(38,0): |num|·10⁶ ≈ 8·10²⁵ ≪ 10³⁸.
    */
  def microCoef(num: Column, den: Column, unit: Long = 1000000L): Column = {
    val scaled = num.cast(D38) * lit(unit)
    val floored = scaled - pmod(scaled, den.cast(D38))
    // exact multiple of den, so the decimal divide is exact and the
    // LONG cast truncates nothing
    (floored / den.cast(D38)).cast("long")
  }

  /** [[fitPlaneGrouped]] with the coefficients quantized to BIGINT
    * micro-units via [[microCoef]]: per group `n` and
    * `icept_micro / x1_micro / x2_micro` = ⌊10⁶·βᵢ⌋. Same single
    * moment-pass plan — the projection is a per-group constant-time
    * expression on the already-aggregated row.
    */
  def fitPlaneGroupedMicro(df: DataFrame, groupCols: Seq[String],
      x1: Column, x2: Column, y: Column): DataFrame = {
    val fit = fitPlaneGrouped(df, groupCols, x1, x2, y)
    fit.select(groupCols.map(col) ++ Seq(col("n"),
        microCoef(col("icept_num"), col("den")).as("icept_micro"),
        microCoef(col("x1_num"), col("den")).as("x1_micro"),
        microCoef(col("x2_num"), col("den")).as("x2_micro")): _*)
      .orderBy(groupCols.map(asc_nulls_first): _*)
  }

  /** 3×3 determinant by cofactor expansion over an element accessor.
    * [[det3Sql]] renders the identical expansion as SQL text, so the
    * Spark plan and the generated oracle evaluate the exact same integer
    * expression tree.
    */
  private def det3(e: (Int, Int) => Column): Column = {
    def minor(r0: Int, r1: Int, c0: Int, c1: Int): Column =
      e(r0, c0) * e(r1, c1) - e(r0, c1) * e(r1, c0)
    e(0, 0) * minor(1, 2, 1, 2) - e(0, 1) * minor(1, 2, 0, 2) +
      e(0, 2) * minor(1, 2, 0, 1)
  }

  /** The [[det3]] expansion rendered as SQL text over an element naming
    * function — the oracle-side twin of the column form above.
    */
  def det3Sql(e: (Int, Int) => String): String = {
    def minor(r0: Int, r1: Int, c0: Int, c1: Int): String =
      s"(${e(r0, c0)}*${e(r1, c1)} - ${e(r0, c1)}*${e(r1, c0)})"
    s"(${e(0, 0)}*${minor(1, 2, 1, 2)} - ${e(0, 1)}*${minor(1, 2, 0, 2)}" +
      s" + ${e(0, 2)}*${minor(1, 2, 0, 1)})"
  }

  /** Solve the [[gramMoments]] normal equations on the driver with exact
    * rational Gaussian elimination (`BigInt` Cramer-style fraction-free
    * Bareiss), returning per-group coefficient fractions
    * `(num(0..p-1), den)` — exact, so engine- and order-independent.
    * Input rows are the constant-size gram output: this is O(groups · p³)
    * driver work on already-aggregated data, not a data collect.
    */
  def solveGram(gram: DataFrame, groupCols: Seq[String], p: Int)
      : Seq[(Seq[String], Seq[BigInt], BigInt)] = {
    val rows = gram.collect()
    rows.toSeq.map { r =>
      val key = groupCols.map(c => String.valueOf(r.getAs[Any](c)))
      def cell(n: String): BigInt =
        BigInt(r.getAs[java.math.BigDecimal](n).toBigInteger)
      val a = Array.tabulate(p, p) { (i, j) =>
        if (i <= j) cell(s"m_${i}_$j") else cell(s"m_${j}_$i")
      }
      val b = Array.tabulate(p)(i => cell(s"v_$i"))
      val (nums, den) = solveBareiss(a.map(_.clone()), b.clone())
      (key, nums.toSeq, den)
    }
  }

  /** Fraction-free Gaussian elimination (Bareiss): returns (nums, den)
    * with βᵢ = numsᵢ/den exactly. Throws on a singular system.
    */
  private def solveBareiss(a: Array[Array[BigInt]], b: Array[BigInt])
      : (Array[BigInt], BigInt) = {
    val p = a.length
    var prev = BigInt(1)
    for (k <- 0 until p) {
      // partial pivot on nonzero (exact arithmetic: any nonzero works)
      val piv = (k until p).find(a(_)(k) != 0)
        .getOrElse(throw new IllegalArgumentException(
          "singular normal equations (collinear features)"))
      if (piv != k) {
        val t = a(k); a(k) = a(piv); a(piv) = t
        val tb = b(k); b(k) = b(piv); b(piv) = tb
        // row swap flips the determinant's sign; negate the swapped-in
        // pivot row to keep the Bareiss invariant exact
        for (j <- 0 until p) a(k)(j) = -a(k)(j)
        b(k) = -b(k)
      }
      for (i <- k + 1 until p) {
        for (j <- k + 1 until p)
          a(i)(j) = (a(k)(k) * a(i)(j) - a(i)(k) * a(k)(j)) / prev
        b(i) = (a(k)(k) * b(i) - a(i)(k) * b(k)) / prev
        a(i)(k) = 0
      }
      prev = a(k)(k)
    }
    // back substitution over exact fractions with common denominator det
    val det = a(p - 1)(p - 1)
    val nums = new Array[BigInt](p)
    for (i <- (p - 1) to 0 by -1) {
      var acc = b(i) * det
      for (j <- i + 1 until p) acc -= a(i)(j) * nums(j)
      val q = acc / a(i)(i)
      require(q * a(i)(i) == acc, "exact division invariant violated")
      nums(i) = q
    }
    (nums, det)
  }
}
