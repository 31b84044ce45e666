package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Hot-bucket LSH skew probe: a boilerplate group of identical docs
  * planted in a diverse corpus makes one LSH bucket per band hold the
  * whole group, and the uncapped all-pairs expansion is quadratic in
  * group size — the dedup scale-killer `maxBucket` exists for. Measures
  * `lshNearDupPairs` with and without the cap as the planted group
  * grows (diverse base corpus fixed at 20k docs).
  *
  * `runMain graft.SkewBucketProbe [groupSizesCsv] [maxBucket]` —
  * results recorded in BASELINE.md.
  */
object SkewBucketProbe {
  def main(args: Array[String]): Unit = {
    val sizes = (if (args.length > 0) args(0) else "1000,4000,8000")
      .split(',').map(_.trim.toInt).toSeq
    val cap = if (args.length > 1) args(1).toInt else 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // diverse side: 8-token docs drawn from a 50k vocab by row hash
    val base = spark.range(0, 20000).select(col("id").as("doc_id"),
      concat_ws(" ", (1 to 8).map(i =>
        concat(lit("w"), pmod(xxhash64(col("id") * 31 + i), lit(50000L)))): _*)
        .as("text"))

    sizes.foreach { g =>
      val planted = base.unionByName(
        spark.range(100000, 100000L + g).select(col("id").as("doc_id"),
          lit("the same boilerplate template text repeated verbatim "
            + "across every mirrored page of the corpus").as("text")))
      val t0 = System.nanoTime()
      val nCap = TextOps.lshNearDupPairs(planted, 3, 2, 8, 10,
        maxBucket = cap).count()
      val capSecs = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val nAll = TextOps.lshNearDupPairs(planted, 3, 2, 8, 10).count()
      val allSecs = (System.nanoTime() - t1) / 1e9
      println(f"[skewbucket] group=$g%d capped($cap%d)=$nCap%d " +
        f"in $capSecs%.2fs uncapped=$nAll%d in $allSecs%.2fs")
    }
    spark.stop()
  }
}
