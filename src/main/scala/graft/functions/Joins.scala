package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join utilities beyond Spark's built-in strategies: skew salting, as-of
  * (temporal) joins, and interval range joins.
  *
  * AQE's skew-join splitting handles most runtime skew automatically; manual
  * salting remains the tool when one join key dominates so heavily that even
  * split shuffle partitions overwhelm a task (the classic hot-key problem at
  * 100 TB). Results are IDENTICAL to the plain join — salting only changes
  * the shuffle distribution — so correctness oracles stay the plain-join SQL.
  */
object Joins {

  /** As-of (temporal) join: for every left row, attach the payload of the
    * LATEST right row with the same key whose `tsCol` is <= the left row's
    * (time-series "last known state": trades->quotes, events->dimension
    * snapshots). Left rows with no prior right row get nulls (ASOF LEFT
    * JOIN semantics).
    *
    * Spark has no asof strategy; the naive formulations are a per-row
    * range subquery (quadratic) or a windowed equi-join. This is the
    * scalable union form — ONE shuffle by key, no join at all: tag both
    * sides, interleave them in (ts, side) order per key, and carry the
    * last right payload forward with an `ignoreNulls` running window. Right
    * rows sort before left rows at equal ts, giving `>=` semantics. Cost
    * is one hash shuffle + one sort of |L|+|R|, independent of time-gap
    * distribution — the formulation that survives 100 TB, unlike
    * interval-expansion joins.
    *
    * The right payload travels as ONE struct so a null payload FIELD in
    * the latest right row correctly shadows older non-null values.
    *
    * Requires: payload column names disjoint from left's; right unique per
    * (key, ts) if deterministic output is needed (pre-aggregate otherwise).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      toleranceSec: Double = 0.0): DataFrame = {
    val payload = right.columns.toSeq
      .filterNot(c => keys.contains(c) || c == tsCol)
    val clash = payload.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"right payload collides with left columns: $clash")
    requireNoReserved(Seq("__r", "__side"), left, right)
    // the right timestamp rides inside the payload struct so a tolerance
    // (max staleness) can invalidate carried matches after the fact
    val rStruct = struct(payload.map(col) :+ col(tsCol).as("__rts"): _*)
    val rSide = right.select(
      (keys :+ tsCol).map(col) :+ rStruct.as("__r") :+ lit(0).as("__side"): _*)
    val lSide = left.withColumn("__r",
        lit(null).cast(rSide.schema("__r").dataType))
      .withColumn("__side", lit(1))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lSide.unionByName(rSide, allowMissingColumns = true)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
    // tolerance: a match older than toleranceSec (fractional seconds ok)
    // behaves as no-match — same null payload as a key with no history
    val bounded = if (toleranceSec <= 0) carried
      else carried.withColumn("__r",
        when(col(tsCol).cast("double") - col("__r.__rts").cast("double")
          <= toleranceSec, col("__r")))
    bounded
      .filter(col("__side") === 1)
      .select(left.columns.toSeq.map(col) ++
        payload.map(c => col(s"__r.$c").as(c)): _*)
  }

  /** Interval range join: pair every point with every interval containing
    * it (`start <= point < end`), with NO equi-key to hash on.
    *
    * A plain theta-join degenerates to broadcast-nested-loop (fine only
    * while one side broadcasts). This is the bucketed form that scales to
    * large interval tables: quantize the axis into `bucketWidth`-sized
    * cells, explode each interval over the cells it overlaps, and
    * equi-join on the cell — shuffle-partitionable on both sides. The
    * residual exact range predicate filters within cells, and each (point,
    * interval) pair meets in exactly one cell (the point's), so no dedup
    * pass is needed. Pick `bucketWidth` near the typical interval length:
    * replication factor is ~len/width+1 per interval.
    *
    * `pointExpr`/`startExpr`/`endExpr` must be numeric (cast times to epoch
    * seconds/days first).
    */
  def rangeJoin(
      points: DataFrame, pointExpr: Column,
      intervals: DataFrame, startExpr: Column, endExpr: Column,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    requireNoReserved(Seq("__pv", "__bucket", "__s", "__e"), points, intervals)
    val p = points.withColumn("__pv", pointExpr.cast("long"))
      .withColumn("__bucket", floor(col("__pv") / bucketWidth))
    val i = intervals.withColumn("__s", startExpr.cast("long"))
      .withColumn("__e", endExpr.cast("long"))
      // empty/inverted intervals (end <= start) match nothing; dropping
      // them here also prevents sequence() from walking DOWNWARD (its
      // implicit step would be -1) and exploding a huge bucket fan-out
      // that the residual predicate would only discard later
      .filter(col("__e") > col("__s"))
      .withColumn("__bucket", explode(sequence(
        floor(col("__s") / bucketWidth),
        // end is exclusive: a point at exactly __e never matches, so the
        // last cell is the one containing __e - 1
        floor((col("__e") - 1) / bucketWidth))))
    p.join(i, p("__bucket") === i("__bucket") &&
        col("__pv") >= col("__s") && col("__pv") < col("__e"))
      .drop("__pv", "__bucket", "__s", "__e")
  }

  /** Inner equi-join with the left (large, skewed) side salted.
    *
    * Each left row gets a deterministic salt in [0, saltFactor) derived from
    * a high-entropy differentiator column (NOT the join key — rows of one
    * hot key must spread across salts). The right side is replicated once
    * per salt value via an exploded literal range, then the join key becomes
    * (key, salt) — splitting each hot key's shuffle partition into
    * `saltFactor` pieces.
    *
    * @param differentiator column with per-row entropy (a line number, a
    *   unique id, any column whose hash spreads rows of one key)
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      differentiator: Column,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    requireNoReserved(Seq("__salt"), left, right)
    val salted = left.withColumn("__salt",
      pmod(xxhash64(differentiator), lit(saltFactor.toLong)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** An input frame already containing one of an operator's working columns
    * would be silently overwritten by withColumn and dropped from the
    * output — refuse up front instead (mirrors the payload-clash guard).
    */
  private def requireNoReserved(
      reserved: Seq[String], frames: DataFrame*): Unit = {
    val hit = for {
      f <- frames
      c <- f.columns if reserved.contains(c)
    } yield c
    require(hit.isEmpty,
      s"input columns collide with reserved working names: ${hit.distinct.mkString(", ")}")
  }
}
