package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join utilities for skewed data.
  *
  * AQE's skew-join splitting handles most runtime skew automatically; manual
  * salting remains the tool when one join key dominates so heavily that even
  * split shuffle partitions overwhelm a task (the classic hot-key problem at
  * 100 TB). Results are IDENTICAL to the plain join — salting only changes
  * the shuffle distribution — so correctness oracles stay the plain-join SQL.
  */
object Joins {

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
    val salted = left.withColumn("__salt",
      pmod(xxhash64(differentiator), lit(saltFactor.toLong)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
