package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Model/retrieval EVALUATION in exact arithmetic — the measurement side
  * of the training loop ([[Regression]]/[[KMeansExact]] train,
  * [[FeatureSelection]] picks features, this judges the result at corpus
  * scale without a single float op).
  */
object Eval {

  private val D38 = "decimal(38,0)"

  /** Exact ROC-AUC via the Mann-Whitney U statistic with mid-rank tie
    * handling, as the exact rational `auc_num / auc_den`:
    *
    * {{{
    *   AUC = (Σ_pos midrank − n⁺(n⁺+1)/2) / (n⁺·n⁻)
    * }}}
    *
    * Mid-ranks are half-integers, so everything is carried ×2:
    * `auc_num = Σ_pos (2c + cnt + 1) − n⁺(n⁺+1)` over the score blocks
    * (c = rows strictly below the block, cnt = block size) and
    * `auc_den = 2·n⁺·n⁻`. Integer counts end-to-end in DECIMAL(38,0) —
    * engine- and parallelism-exact, unlike any float-ranked AUC.
    *
    * Scale shape: one `groupBy(score)` collapse (map-side combined — the
    * shuffle carries one row per DISTINCT score, which a quantized score
    * keeps bounded), then a window over the block table. One output row:
    * `(n_pos, n_neg, auc_num, auc_den)`.
    */
  def binaryAuc(df: DataFrame, score: Column, positive: Column)
      : DataFrame = {
    val blocks = df
      .select(score.as("s"),
        when(positive, 1L).otherwise(0L).as("p"))
      .groupBy("s")
      .agg(count(lit(1)).as("cnt"), sum(col("p")).as("pos"))
    // The block table is one row per DISTINCT score — bounded by the
    // caller's score quantization (the documented contract above), so the
    // single-group scan is safe. Rank under a non-foldable single group
    // ([[graft.text.TextOps.boundedSingleGroup]]) rather than an empty
    // partition spec: WindowExec's "No Partition Defined" warning then
    // stays reserved for REAL unbounded funnels in the bench log.
    // xxhash64 keeps the key non-null for any score type.
    val below = Window
      .partitionBy(graft.text.TextOps.boundedSingleGroup(
        xxhash64(col("s"))))
      .orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    blocks
      .withColumn("c", coalesce(sum(col("cnt")).over(below), lit(0L)))
      .select(
        sum(col("pos")).cast(D38).as("np"),
        sum(col("cnt") - col("pos")).cast(D38).as("nn"),
        sum(col("pos").cast(D38) *
          (lit(2) * col("c") + col("cnt") + 1)).as("two_ranks"))
      .select(Seq(col("np").cast("long").as("n_pos"),
        col("nn").cast("long").as("n_neg")) ++ aucFraction: _*)
  }

  /** AUC num/den columns with the single-class degenerate case (n⁺ = 0 or
    * n⁻ = 0 → den 0) emitted as NULLs — the same divide-safely contract
    * as [[Regression]]'s singular fits.
    */
  private def aucFraction: Seq[Column] = {
    val den = lit(2).cast(D38) * col("np") * col("nn")
    Seq(
      when(col("np") === 0 || col("nn") === 0, lit(null))
        .otherwise(col("two_ranks") - col("np") * (col("np") + 1))
        .as("auc_num"),
      when(col("np") === 0 || col("nn") === 0, lit(null)).otherwise(den)
        .as("auc_den"))
  }

  /** Per-group [[binaryAuc]]: one exact AUC row per group (e.g. per-class
    * one-vs-rest quality of a multi-class scorer, or per-slice eval of
    * one scorer). Same block/mid-rank algebra with every window and
    * aggregation partitioned by the group columns — the block shuffle
    * carries one row per (group, distinct score). Output per group:
    * `(groupCols…, n_pos, n_neg, auc_num, auc_den)`, sorted by group.
    */
  def binaryAucGrouped(df: DataFrame, groupCols: Seq[String],
      score: Column, positive: Column): DataFrame = {
    val g = groupCols.map(col)
    val blocks = df
      .select(g :+ score.as("s") :+
        when(positive, 1L).otherwise(0L).as("p"): _*)
      .groupBy(g :+ col("s"): _*)
      .agg(count(lit(1)).as("cnt"), sum(col("p")).as("pos"))
    val below = Window.partitionBy(g: _*).orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    blocks
      .withColumn("c", coalesce(sum(col("cnt")).over(below), lit(0L)))
      .groupBy(g: _*)
      .agg(
        sum(col("pos")).cast(D38).as("np"),
        sum(col("cnt") - col("pos")).cast(D38).as("nn"),
        sum(col("pos").cast(D38) *
          (lit(2) * col("c") + col("cnt") + 1)).as("two_ranks"))
      .select(g ++ (Seq(col("np").cast("long").as("n_pos"),
        col("nn").cast("long").as("n_neg")) ++ aucFraction): _*)
      .orderBy(groupCols.map(asc_nulls_first): _*)
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic — the drift check
    * between two corpus slices (yesterday's shard vs today's, one source
    * vs another) over any ordered value. The ECDF gap at value v is
    * `|cumA(v)·n_b − cumB(v)·n_a| / (n_a·n_b)` — an exact integer
    * rational, so the statistic is `ks_num / ks_den` with
    * `ks_num = max_v |·|` and `ks_den = n_a·n_b`: engine- and
    * parallelism-exact, no float ECDF anywhere.
    *
    * Scale shape: one `groupBy(value)` collapse (shuffle ∝ distinct
    * values), a cumulative window over the block table, one max. One
    * output row: `(n_a, n_b, ks_num, ks_den)`.
    */
  def ksStatistic(df: DataFrame, value: Column, inA: Column): DataFrame = {
    val blocks = df
      .select(value.as("v"), when(inA, 1L).otherwise(0L).as("a"))
      .groupBy("v")
      .agg(sum(col("a")).as("ca"),
        (count(lit(1)) - sum(col("a"))).as("cb"))
      // tiny (one row per distinct value) and consumed twice — totals
      // and the gap scan — so pin it: the source is scanned ONCE
      .localCheckpoint()
    // one row per distinct value — bounded by value quantization (the
    // contract above); non-foldable single group, see binaryAuc's note
    val upTo = Window
      .partitionBy(graft.text.TextOps.boundedSingleGroup(
        xxhash64(col("v"))))
      .orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    blocks
      .select(col("v"),
        sum(col("ca")).over(upTo).as("cum_a"),
        sum(col("cb")).over(upTo).as("cum_b"))
      .crossJoin(broadcast(blocks.select(
        sum(col("ca")).cast(D38).as("na"),
        sum(col("cb")).cast(D38).as("nb"))))
      .select(col("na"), col("nb"),
        abs(col("cum_a").cast(D38) * col("nb")
          - col("cum_b").cast(D38) * col("na")).as("gap"))
      .groupBy()
      .agg(first(col("na")).as("na"), first(col("nb")).as("nb"),
        max(col("gap")).as("ks_num0"))
      .select(col("na").cast("long").as("n_a"),
        col("nb").cast("long").as("n_b"),
        // an empty side has no ECDF to compare: NULL, not a 0 denominator
        when(col("na") === 0 || col("nb") === 0, lit(null))
          .otherwise(col("ks_num0")).as("ks_num"),
        when(col("na") === 0 || col("nb") === 0, lit(null))
          .otherwise(col("na") * col("nb")).as("ks_den"))
  }

  /** Exact Spearman rank-correlation moments per group — metric-agreement
    * analysis between two scorers (do they RANK documents the same way?),
    * robust to the scale/outliers that break Pearson. Each column is
    * mid-ranked within its group via the block algebra (ranks carried ×2
    * so ties stay integers), then one moment pass emits
    *
    * {{{
    *   rho_num  = n·Σrxry − Σrx·Σry        (the covariance numerator)
    *   varx_num = n·Σrx² − (Σrx)²,  vary_num analogous
    *   ρ = rho_num / √(varx_num · vary_num)   (the ×2 scaling cancels)
    * }}}
    *
    * as exact DECIMAL(38,0) integers — the certified quantities; the one
    * irrational step (the square root) is left to the consumer. A
    * constant column in a group yields var 0: ρ undefined, emitted as
    * NULL rho_num (the divide-safely convention).
    *
    * Scale shape: two block collapses (one row per (group, distinct
    * value)), two join-backs of the tiny rank tables, one moment
    * aggregation. Group values must be non-null (using-column joins).
    */
  def spearmanMoments(df: DataFrame, groupCols: Seq[String],
      xCol: String, yCol: String): DataFrame = {
    val g = groupCols.map(col)
    def rank2(c: String, as: String): DataFrame = {
      val blocks = df.groupBy(g :+ col(c): _*)
        .agg(count(lit(1)).as("__cnt"))
      val below = Window.partitionBy(g: _*).orderBy(c)
        .rowsBetween(Window.unboundedPreceding, -1)
      blocks
        .withColumn("__c", coalesce(sum(col("__cnt")).over(below), lit(0L)))
        .select(g ++ Seq(col(c),
          (lit(2) * col("__c") + col("__cnt") + 1).as(as)): _*)
    }
    val withRanks = df
      .join(rank2(xCol, "__rx"), groupCols :+ xCol)
      .join(rank2(yCol, "__ry"), groupCols :+ yCol)
    val rx = col("__rx").cast(D38)
    val ry = col("__ry").cast(D38)
    val m = withRanks.groupBy(g: _*).agg(
      count(lit(1)).as("n"),
      sum(rx).as("sx"), sum(ry).as("sy"),
      sum(rx * rx).as("sxx"), sum(ry * ry).as("syy"),
      sum(rx * ry).as("sxy"))
    val n = col("n").cast(D38)
    val varx = (n * col("sxx") - col("sx") * col("sx")).as("varx_num")
    val vary = (n * col("syy") - col("sy") * col("sy")).as("vary_num")
    m.select(g ++ Seq(col("n"),
        (n * col("sxy") - col("sx") * col("sy")).as("rho_num"),
        varx, vary): _*)
      .select(g ++ Seq(col("n"),
        when(col("varx_num") === 0 || col("vary_num") === 0, lit(null))
          .otherwise(col("rho_num")).as("rho_num"),
        col("varx_num"), col("vary_num")): _*)
      .orderBy(groupCols.map(asc_nulls_first): _*)
  }

  /** Calibration / reliability table: document counts and positive counts
    * per score bin — the exact integer backbone of a reliability diagram
    * (bin accuracy = `pos/cnt` as a ratio the caller divides). `bin` is
    * any integral bucketing expression of the score (e.g. a micro-unit
    * score integer-divided by the bin width). One combined aggregation.
    */
  def calibrationBins(df: DataFrame, bin: Column, positive: Column)
      : DataFrame =
    df.select(bin.cast("long").as("bin"),
        when(positive, 1L).otherwise(0L).as("p"))
      .groupBy("bin")
      .agg(count(lit(1)).as("cnt"), sum(col("p")).as("pos"))
      .orderBy("bin")
}
