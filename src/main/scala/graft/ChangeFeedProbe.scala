package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.table.CowTable

/** Change-feed cost probe: the feed over a small commit window must cost
  * the WINDOW'S churn (files the window's commits added + tombstones),
  * never a table scan — the property that makes table-to-table chaining
  * viable at 100 TB. Builds a wide table, applies a small update + delete,
  * and compares the feed's scanned-file count and wall time against the
  * full snapshot scan. Results recorded in BASELINE.md.
  *
  * `runMain graft.ChangeFeedProbe [rows] [parts]`
  */
object ChangeFeedProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 2000000
    val parts = if (args.length > 1) args(1).toInt else 16
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def drive(tag: String, indexEntries: Int): Unit = {
      val t = new CowTable(spark,
        java.nio.file.Files.createTempDirectory(s"cfprobe-$tag").toString,
        keyCols = Seq("id"), partitionCols = Seq("p"),
        precombineField = "v", trackCommitVersions = true,
        clusterCols = Seq("id"), fileIndexEntries = indexEntries)
      t.bulkInsert(spark.range(rows).select(col("id"),
        (col("id") % parts).cast("string").as("p"),
        col("id").cast("double").as("v")), parallelism = parts)
      // small CLUSTERED update (one partition) + small delete (another):
      // the workload shape of a CDC trickle into a big table
      t.upsert(spark.range(100).select(col("id") * parts, lit("0").as("p"),
        lit(-1.0).as("v")).toDF("id", "p", "v"))
      t.delete(spark.range(100).select(col("id") * parts + 1,
        lit("1").as("p"), lit(0.0).as("v")).toDF("id", "p", "v"))

      def timed[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }
      val fs = new org.apache.hadoop.fs.Path(t.basePath).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      def mb(paths: Seq[String]): Double = paths.map(p =>
        fs.getFileStatus(new org.apache.hadoop.fs.Path(p)).getLen).sum / 1e6
      val (full, fullSec) = timed(t.snapshot().count())
      val feedDf = t.changeFeed(1L, 3L)
      val ((u, d), feedSec) = timed {
        val rows = feedDf.groupBy(col(CowTable.ChangeTypeCol)).count()
          .as[(String, Long)].collect().toMap
        (rows.getOrElse("U", 0L), rows.getOrElse("D", 0L))
      }
      val feedMb = mb(feedDf.inputFiles.toSeq)
      val totalMb = mb(t.snapshot().inputFiles.toSeq)
      println(f"[cfprobe] $tag: table rows=$full ${totalMb}%.1f MB " +
        f"full-scan ${fullSec}%.2fs")
      println(f"[cfprobe] $tag: feed(1,3] U=$u D=$d reads ${feedMb}%.1f MB" +
        f" (${feedMb * 100.0 / totalMb}%.1f%% of table) ${feedSec}%.2fs")
    }
    drive("plain", 0)
    drive("indexed", 60000)
    spark.stop()
  }
}
