package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.table.CowTable

/** FEED-DRIVEN maintained grouped aggregate: COUNT + SUM state over any
  * commit-stamped table, kept current from the table's own change feed
  * ([[CowTable.changeFeedWithPreimages]]) — no pipeline hook required, so
  * it chains off anything that commits: a CDC-written table, a
  * [[MaintainedJoin]] view with `trackViewVersions = true` (the star-schema
  * pipeline fact ⟕ dim → GROUP BY, maintained end-to-end), or a table fed
  * by the streaming sink.
  *
  * Delta algebra straight off the feed: U rows add (+1, +value), B
  * (preimage) rows retract (-1, -value), D rows contribute nothing (their
  * retraction IS their B row). COUNT/SUM are abelian, and the sum runs in
  * DECIMAL(28,6) ([[IncrementalAgg]]'s exactness argument), so
  * fold∘feed over any commit sequence equals recomputing from the
  * snapshot — per refresh the engine touches the churn, not the table.
  *
  * The high-water mark (last folded source version) rides the aggregate
  * table's own commit metrics (monotone — survives service commits), the
  * same exactly-once ledger as [[MaintainedJoin]]. A mark that ages out of
  * the source's retained timeline reseeds by full recompute.
  *
  * vs [[IncrementalAgg.MaintainedView]]: that form captures deltas inside
  * the CDC pipeline's pre-merge hook (no stamps needed on the source);
  * this form needs `trackCommitVersions` but decouples maintenance from
  * writing entirely — refresh on YOUR cadence, fold many source commits
  * in one window.
  */
final class MaintainedAgg(
    spark: SparkSession,
    aggPath: String,
    src: CowTable,
    spec: IncrementalAgg.AggSpec) {

  require(src.trackCommitVersions,
    "MaintainedAgg sources must track commit versions (change feeds)")

  /** The aggregate state table, keyed by the group columns. */
  val table = new CowTable(spark, aggPath, keyCols = spec.groupCols)

  private val Mark = CowTable.MonotoneMarkPrefix + "ma_src_version"
  private val ct = CowTable.ChangeTypeCol

  /** The maintained aggregate as stored: groupCols..., cnt, total. */
  def current: DataFrame =
    table.snapshot().select(
      (spec.groupCols.map(col) :+ col("cnt") :+ col("total")): _*)

  private def dec(c: org.apache.spark.sql.Column) =
    c.cast(org.apache.spark.sql.types.DecimalType(28, 6))

  /** Fold all source commits since the last refresh — or seed/reseed by
    * recompute when the state doesn't exist or the mark fell behind
    * retention. Returns the refreshed aggregate.
    */
  def refresh(): DataFrame = {
    val head = src.manifest.version
    if (!table.exists) {
      table.bulkInsert(IncrementalAgg.recompute(src.snapshot(), spec),
        extraMetrics = Map(Mark -> head))
      return current
    }
    val mark = table.manifest.metrics.getOrElse(Mark, 0L)
    if (mark == head) return current
    val feed =
      try src.changeFeedWithPreimages(mark, head).localCheckpoint()
      catch {
        // mark aged out of the source's retained timeline: reseed
        case _: IllegalArgumentException | _: java.io.FileNotFoundException =>
          table.overwrite(IncrementalAgg.recompute(src.snapshot(), spec),
            extraMetrics = Map(Mark -> head))
          return current
      }
    val signed = feed.filter(col(ct).isin("U", "B")).select(
      (spec.groupCols.map(col) :+
        when(col(ct) === "U", 1L).otherwise(-1L).as("w") :+
        when(col(ct) === "U", dec(col(spec.valueCol)))
          .otherwise(-dec(col(spec.valueCol))).as("v")): _*)
    val delta = signed.groupBy(spec.groupCols.map(col): _*)
      .agg(sum(col("w")).as("d_cnt"), sum(col("v")).as("d_total"))
    val marksM = Map(Mark -> head)
    if (delta.isEmpty) {
      // stamp-filtered feed held nothing: still advance the ledger
      table.delete(current.limit(0), extraMetrics = marksM)
      return current
    }
    val next =
      IncrementalAgg.apply(current, delta, spec).localCheckpoint()
    // groups fully retracted this window (cnt hit zero): next no longer
    // carries them, so route them through the merge's delete branch.
    // ONE commit applies updates + deletes + the mark advance atomically —
    // a two-commit fold could crash with the mark already advanced and
    // the deletes lost, and (unlike MaintainedJoin's image folds) an agg
    // delta re-applied on replay would double-count.
    val gone = current.select(spec.groupCols.map(col): _*)
      .except(next.select(spec.groupCols.map(col): _*))
      .withColumn("cnt", lit(0L))
      .withColumn("total", lit(null).cast(next.schema("total").dataType))
      .withColumn("_ma_del", lit(true))
    table.mergeInto(next.withColumn("_ma_del", lit(false))
        .unionByName(gone),
      whenMatchedDelete = col("i._ma_del"),
      insertCondition = !col("i._ma_del"),
      conditionCols = Seq("_ma_del"),
      extraMetrics = marksM)
    current
  }
}
