package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.table.CowTable

/** Snapshot-diff cost probe: the claim under test is that
  * [[graft.table.CowTable.diff]] reads only the files REWRITTEN between
  * two versions, so its cost tracks the CHURN of the window — not the
  * table size — while the naive alternative (full-outer join of the two
  * snapshots) rescans everything. Table size grows; the churned batch
  * stays fixed.
  *
  * `runMain graft.DiffProbe [rowsCsv] [churnRows]` — results in
  * BASELINE.md.
  */
object DiffProbe {
  def main(args: Array[String]): Unit = {
    val sizes = (if (args.length > 0) args(0) else "1000000,4000000")
      .split(',').map(_.trim.toLong).toSeq
    val churn = if (args.length > 1) args(1).toLong else 5000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    sizes.foreach { n =>
      val path = java.nio.file.Files.createTempDirectory("diffprobe")
        .toString
      // 128 partitions; the churned batch lands in ONE of them (the
      // realistic CDC shape: updates concentrate in recent partitions).
      // Churn spread uniformly over key-hash buckets would rewrite every
      // unit and diff would rightly read everything — partition locality
      // is what the pruning monetizes.
      val t = new CowTable(spark, path, keyCols = Seq("id"),
        partitionCols = Seq("p"))
      t.bulkInsert(spark.range(n).select(col("id"),
        (col("id") % 128).cast("int").as("p"),
        (col("id") % 1000).cast("double").as("v")), parallelism = 128)
      t.upsert(spark.range(churn).select((col("id") * 128).as("id"),
        lit(0).cast("int").as("p"), lit(-1.0).as("v")))
      val head = t.manifest.version
      val t0 = System.nanoTime()
      val changed = t.diff(1L, head).count()
      val diffSecs = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      // the naive full-snapshot comparison the pruned diff replaces
      val s1 = t.snapshotAt(1L).select(col("id"), col("p"),
        col("v").as("v1"))
      val s2 = t.snapshotAt(head).select(col("id"), col("p"),
        col("v").as("v2"))
      val naive = s1.join(s2, Seq("id", "p"), "full_outer")
        .filter(!(col("v1") <=> col("v2"))).count()
      val naiveSecs = (System.nanoTime() - t1) / 1e9
      spark.catalog.clearCache()
      println(f"[diff] rows=$n%d churn=$churn%d changed=$changed%d " +
        f"prunedDiff=$diffSecs%.2fs naiveJoin=$naiveSecs%.2fs " +
        f"(naive changed=$naive%d)")
    }
    spark.stop()
  }
}
