package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cdc.{IncrementalAgg, MaintainedAgg}
import graft.sources.{MvRegistry, MvRewriteRule}
import graft.table.CowTable

/** Materialized-view rewrite payoff probe: the same `GROUP BY` over an
  * N-row fact table, answered (a) by scanning the fact and (b) by the
  * freshness-gated rewrite to the maintained state
  * ([[graft.sources.MvRewriteRule]]) — plus the maintenance cost of
  * folding a churn window vs reseeding, so the full trade (refresh cost
  * amortized against per-query savings) is on the table.
  * `runMain graft.MvProbe [rows] [reps]`
  */
object MvProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 10000000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tmp(tag: String) =
      java.nio.file.Files.createTempDirectory(s"mvp-$tag").toString

    // the documented IVM source shape: a PARTITIONED fact (the CDC
    // reality — churn lands in recent partitions) with a record-key
    // file index, so both the churn upsert and the fold's feed reads
    // are scoped to the touched partitions, never the table
    val stripe = math.max(rows / 50L, 1L)
    val src = new CowTable(spark, tmp("src"), keyCols = Seq("id"),
      partitionCols = Seq("p"),
      trackCommitVersions = true, fileIndexEntries = 200000)
    src.bulkInsert(spark.range(rows).select(col("id"),
      concat(lit("p"), expr(s"id div $stripe")).as("p"),
      concat(lit("g"), col("id") % 50).as("grp"),
      ((col("id") % 100000) + 1).cast("decimal(12,2)").as("v")),
      parallelism = 32)

    val t0 = System.nanoTime()
    val ma = new MaintainedAgg(spark, tmp("view"), src,
      IncrementalAgg.AggSpec(Seq("grp"), "v"), minMaxCols = Seq("v"))
    ma.refresh()
    println(f"[mvprobe] seed refresh (full recompute, $rows%,d rows): " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    MvRegistry.register(ma)

    def query() = spark.read.format("graft").load(src.basePath)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("total"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))

    def time(tag: String, enabled: Boolean): Double = {
      spark.conf.set("spark.graft.mvRewrite.enabled", enabled.toString)
      val times = (0 until reps).map { _ =>
        val s = System.nanoTime()
        query().collect()
        (System.nanoTime() - s) / 1e9
      }
      println(f"[mvprobe] $tag: best ${times.min}%.3f s of " +
        times.map(x => f"$x%.3f").mkString("[", ", ", "]"))
      times.min
    }
    val scan = time("group-by via fact scan (rewrite off)", enabled = false)
    val hitsBefore = MvRewriteRule.hitLog.getOrElse(ma.table.basePath, 0L)
    val mv = time("group-by via maintained view (rewrite on)",
      enabled = true)
    require(MvRewriteRule.hitLog(ma.table.basePath) - hitsBefore
      >= reps, "rewrite did not fire")
    println(f"[mvprobe] speedup: ${scan / mv}%.1fx")

    // maintenance: fold a 0.1%-churn window localized to the LAST
    // partition (the CDC shape — recent data churns), mid-range values
    // so no group extreme is retracted (the tie-an-extreme repair path
    // is MaintainedAggSpec's job), vs the full reseed above
    val base = 49L * stripe + 1
    val churn = spark.range(rows / 1000).select(
      (col("id") + base).as("id"),
      concat(lit("p"), expr(s"(id + $base) div $stripe")).as("p"),
      concat(lit("g"), (col("id") + base) % 50).as("grp"),
      lit(50000).cast("decimal(12,2)").as("v"))
    src.upsert(churn)
    val t1 = System.nanoTime()
    ma.refresh()
    println(f"[mvprobe] churn fold (0.1%% of rows): " +
      f"${(System.nanoTime() - t1) / 1e9}%.2f s")
    // the refreshed view must still serve the head
    val n = query().collect().map(_.getLong(1)).sum
    require(n == rows, s"post-churn count mismatch: $n vs $rows")
    spark.stop()
  }
}
