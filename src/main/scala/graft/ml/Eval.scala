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
    val below = Window.orderBy("s")
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
    val upTo = Window.orderBy("v")
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
