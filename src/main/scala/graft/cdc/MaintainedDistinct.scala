package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.table.CowTable

/** Maintained EXACT per-group COUNT(DISTINCT value) — the textbook
  * non-abelian aggregate, made maintainable by stacking two abelian
  * folds (the DBToaster-style higher-order IVM arrangement):
  *
  *   - level 1 (`support`): a [[MaintainedAgg]] grouped by
  *     (groupCols..., valueCol) — its `cnt` is each distinct value's
  *     multiplicity, maintained from the SOURCE table's change feed.
  *     A support row exists iff the (group, value) pair occurs.
  *   - level 2 (`counts`): a [[MaintainedAgg]] grouped by groupCols,
  *     maintained from the SUPPORT table's own change feed
  *     (`trackStateVersions` stamps it): its `cnt` counts live support
  *     rows = the number of distinct values; its `total` sums support
  *     multiplicities = COUNT(valueCol). NULL values are excluded at
  *     this level (`rowFilter`), matching SQL COUNT(DISTINCT) exactly.
  *
  * Each refresh touches the CHURN at both levels: level 1 folds the
  * source window's ±rows; level 2 folds only the support rows level 1
  * actually changed. A value update (v1 → v2) flows naturally: level 1
  * retracts (g,v1) and adds (g,v2); if v1's multiplicity hits zero its
  * support row is deleted, which level 2 sees as a −1 on g's distinct
  * count. No sketch, no approximation — the answer equals
  * `SELECT g, count(DISTINCT v) FROM src GROUP BY g` after every
  * refresh, at delta cost. (KMV sketches — `kmv_distinct` in the query
  * catalog — remain the one-pass approximate alternative; this is the
  * exact, incrementally-maintained one.)
  */
final class MaintainedDistinct(
    spark: SparkSession,
    path: String,
    src: CowTable,
    groupCols: Seq[String],
    valueCol: String,
    /** Buckets for the SUPPORT state (one row per distinct
      * (group, value) pair — the big level). Bucketing keeps each fold's
      * rewrite scoped to the buckets the window's churn touches instead
      * of the whole support state; size it so support-rows/bucket stays
      * a comfortable file size (the usual numBuckets guidance).
      */
    supportBuckets: Int = 16,
    /** Per-file key-index entries for the SUPPORT state (0 = off; see
      * [[MaintainedAgg.stateIndexEntries]]). The support level is the
      * many-group state this knob exists for — its key space is every
      * live (group, value) pair — but measured at the probe's default
      * shape (100k support rows, 16 buckets, 20k-row churn windows) the
      * index LOSES ~2s/fold: a window's churn touches every bucket, so
      * the point-read prune saves no scan while the index adds
      * per-commit stats/bloom work and a probe job (DistinctProbe
      * `--ab`, ABBA-paired; BASELINE.md round-23). Turn it on only when
      * a window's churned (group, value) keys concentrate in a small
      * fraction of the state's files — many buckets, skewed or
      * key-local churn — which is the same locality condition the
      * source-table index needs to pay.
      */
    supportIndexEntries: Int = 0) {

  /** Level 1: per-(group, value) multiplicity, fed by the source. */
  val support = new MaintainedAgg(spark, s"$path/support", src,
    IncrementalAgg.AggSpec(groupCols :+ valueCol, valueCol),
    trackStateVersions = true, stateBuckets = supportBuckets,
    stateIndexEntries = supportIndexEntries)

  /** Level 2: per-group distinct/value counts, fed by the support table.
    * The filter drops NULL-value support rows: SQL COUNT(DISTINCT v)
    * and COUNT(v) both ignore NULLs.
    */
  val counts = new MaintainedAgg(spark, s"$path/counts", support.table,
    IncrementalAgg.AggSpec(groupCols, "cnt"),
    rowFilter = Some(col(valueCol).isNotNull))

  /** Fold both levels up to the source head. Returns [[current]].
    *
    * Fold PIPELINING: when level 1's refresh was a plain incremental
    * fold, level 2 consumes the fold's in-memory window feed
    * ([[MaintainedAgg.lastFoldFeed]] — the exact U/B subset the support
    * table's change feed would carry for that window) instead of
    * re-reading the just-written support files and point-reading their
    * preimages. Every other level-1 outcome (seed, reseed, no-op — or a
    * level-2 mark that lags the window after a crash between the two
    * folds) falls back to the table-feed refresh, which remains the
    * source of truth.
    */
  def refresh(): DataFrame = {
    support.refresh()
    support.lastFoldFeed match {
      case Some((since, head, ub)) => counts.refreshFromFeed(ub, since, head)
      case None => counts.refresh()
    }
    current
  }

  /** groupCols..., `distinct_cnt` (= COUNT(DISTINCT valueCol)),
    * `value_cnt` (= COUNT(valueCol), NULLs excluded). Groups whose only
    * value is NULL carry distinct_cnt = 0 — present iff the group has
    * source rows, exactly like SQL GROUP BY.
    */
  def current: DataFrame = {
    // a group whose every value is NULL vanishes from `counts` (the
    // filter removed all its support rows) but still exists in SQL
    // GROUP BY terms; recover it from the support level at cost
    // O(|support state|), never a source scan
    val live = support.current.select(groupCols.map(col): _*).distinct()
    val cnts = counts.current
    val cond = groupCols.map(c => live(c) <=> cnts(c)).reduce(_ && _)
    live.join(cnts, cond, "left")
      .select((groupCols.map(c => live(c).as(c)) :+
        coalesce(cnts("cnt"), lit(0L)).as("distinct_cnt") :+
        coalesce(cnts("total").cast("long"), lit(0L))
          .as("value_cnt")): _*)
  }
}
