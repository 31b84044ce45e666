package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.table.CowTable

/** Storage-lifecycle probe: (a) retention on a day-partitioned table —
  * metadata-only `dropPartitions` vs the row-level tombstone delete of
  * the same rows (wall time + files written); (b) small-file debris —
  * read cost before/after `compactBySize`. The two maintenance paths a
  * 100-TB deployment runs on a cadence. Results recorded in BASELINE.md.
  *
  * `runMain graft.LifecycleProbe [rows] [days]`
  */
object LifecycleProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 4000000
    val days = if (args.length > 1) args(1).toInt else 16
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def build(tag: String): CowTable = {
      val t = new CowTable(spark,
        java.nio.file.Files.createTempDirectory(s"lcprobe-$tag").toString,
        keyCols = Seq("id"), partitionCols = Seq("day"),
        fileIndexEntries = 60000)
      t.bulkInsert(spark.range(rows).select(col("id"),
        concat(lit("2026-01-"), lpad((col("id") % days + 1).cast("string"),
          2, "0")).as("day"),
        col("id").cast("double").as("v")), parallelism = days)
      t
    }

    // --- (a) retention: drop the oldest quarter of the days
    val cutoff = f"2026-01-${days / 4 + 1}%02d"
    val dropT = build("drop")
    val preFiles = dropT.manifest.baseFiles.size
    val (dropped, dropSec) = timed(dropT.expirePartitions("day", cutoff))
    val dropWrote = dropT.manifest.metrics.getOrElse("files_added", 0L)
    println(f"[lcprobe] rows=$rows days=$days " +
      f"drop_partitions: units=$dropped sec=$dropSec%.2f " +
      f"files_written=$dropWrote (of $preFiles)")

    val delT = build("del")
    val (_, delSec) = timed {
      delT.delete(delT.snapshot().filter(col("day") < cutoff)
        .select("id", "day", "v"))
    }
    val delWrote = delT.manifest.metrics.getOrElse("files_added", 0L)
    println(f"[lcprobe] row_delete same rows: sec=$delSec%.2f " +
      f"files_written=$delWrote -> drop is ${delSec / dropSec}%.0fx " +
      "faster and write-free")

    // --- (b) small-file debris: trickle appends, then fold
    val szT = build("size")
    (0 until 8).foreach { b =>
      szT.upsert(spark.range(2000).select((col("id") + rows + b * 2000),
        lit("2026-01-01").as("day"), col("id").cast("double").as("v"))
        .toDF("id", "day", "v"), parallelism = 1)
    }
    val filesBefore = szT.manifest.baseFiles.size
    val (_, readBefore) = timed(szT.snapshot().agg(sum("v")).collect())
    val (_, foldSec) = timed(
      szT.compactBySize(targetBytes = 64L << 20, smallBytes = 8L << 20))
    val filesAfter = szT.manifest.baseFiles.size
    val (_, readAfter) = timed(szT.snapshot().agg(sum("v")).collect())
    println(f"[lcprobe] compact_by_size: files $filesBefore -> $filesAfter " +
      f"(fold ${foldSec}%.2fs), full-scan ${readBefore}%.2fs -> " +
      f"${readAfter}%.2fs")
    spark.stop()
  }
}
