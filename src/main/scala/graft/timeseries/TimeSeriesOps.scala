package graft.timeseries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization over event streams: resampling onto a fixed
  * grid plus gap filling — the shape feature pipelines need before
  * windowed models (irregular event times → one row per (key, bucket),
  * carrying the last observation forward through silent periods).
  */
object TimeSeriesOps {

  /** Hourly resample with forward fill, per user: one row for EVERY hour
    * between a user's first and last event (inclusive); hours with events
    * carry the hour's LATEST value (ties by ts, then event_id —
    * deterministic), silent hours repeat the previous observation and are
    * flagged `is_gap`.
    *
    * Plan shape: the per-hour latest pick is one row_number window
    * sharded by (user, hour); the grid is a per-user `sequence()` explode
    * bounded by that user's observed span (never a global cross join);
    * the forward fill is a running `last(ignoreNulls)` over rows
    * partitioned by user — every stage shuffles by user id only, and
    * per-user state is one value. Grid size is Σ_user span-hours, which
    * the caller controls via the bucket granularity.
    */
  def resampleHourlyFfill(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"),
      date_trunc("hour", col("ts")).as("hour"),
      col("ts"), col("event_id"), col("value"))
    val latestInHour = Window.partitionBy("user_id", "hour")
      .orderBy(col("ts").desc, col("event_id").desc)
    val hourly = e
      .withColumn("rn", row_number().over(latestInHour))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("hour"), col("value"))
    val grid = events.groupBy("user_id")
      .agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour")))
          .as("hour"))
    val ffill = Window.partitionBy("user_id").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(hourly, Seq("user_id", "hour"), "left")
      .withColumn("filled_value",
        last(col("value"), ignoreNulls = true).over(ffill))
      .withColumn("is_gap", col("value").isNull)
      .select("user_id", "hour", "filled_value", "is_gap")
  }
}
