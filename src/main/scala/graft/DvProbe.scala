package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.table.CowTable

/** Deletion-vector cost probe: the claim under test is that a VECTORED
  * delete's cost tracks the candidate files' KEY COLUMNS plus a tiny
  * positional sidecar, while the copy-on-write delete rewrites the full
  * width of every candidate file — so on a wide table with scattered
  * victims (every file holds a few) the write amplification gap is the
  * payload width. Also measured: the post-delete snapshot read, i.e. what
  * the positional anti-join costs readers before compaction folds it.
  *
  * `runMain graft.DvProbe [rows] [victims]` — results in BASELINE.md.
  */
object DvProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val victims = if (args.length > 1) args(1).toLong else 1000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~200-byte payload: the width a rewrite pays and a key scan doesn't
    val data = spark.range(n).select(col("id"),
      (col("id") % 16).cast("int").as("p"),
      sha2(concat_ws("-", col("id"), lit("pay")), 512).as("pay1"),
      sha2(concat_ws("-", col("id"), lit("load")), 512).as("pay2"))
    // every (n/victims)-th key: victims scatter across ALL files — the
    // worst case for a rewrite (every candidate file is touched), the
    // shape DVs are built for
    val stride = math.max(1L, n / victims)
    val dead = spark.range(n).filter(col("id") % stride === 0)
      .select(col("id"), (col("id") % 16).cast("int").as("p"))

    def build(dv: Boolean): CowTable = {
      val path = java.nio.file.Files.createTempDirectory(
        if (dv) "dvprobe-dv" else "dvprobe-cow").toString
      val t = new CowTable(spark, path, keyCols = Seq("id"),
        partitionCols = Seq("p"), fileIndexEntries = 200000,
        deleteVectors = dv)
      t.bulkInsert(data, parallelism = 32)
      t
    }
    def commitBytes(t: CowTable): Long = {
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      val m = t.manifest
      val newFiles = m.baseFiles.filter(_.startsWith(
        s"files/c${m.version}-")) ++ m.dvSidecarFiles
      newFiles.map(f => fs.getFileStatus(
        new org.apache.hadoop.fs.Path(t.basePath, f)).getLen).sum
    }
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    Seq(false, true).foreach { dv =>
      val t = build(dv)
      val (_, warm) = timed(t.snapshot().count())
      val (_, delSecs) = timed(t.delete(dead))
      val bytes = commitBytes(t)
      val (cnt, readSecs) = timed(t.snapshot().count())
      spark.catalog.clearCache()
      val mode = if (dv) "dv " else "cow"
      println(f"[dvprobe] mode=$mode rows=$n victims=$victims " +
        f"delete=$delSecs%.2fs commit_kb=${bytes / 1024.0}%.1f " +
        f"read_after=$readSecs%.2fs (warm_read=$warm%.2fs) rows_after=$cnt")
      require(cnt == n - dead.count(), s"row count off in mode $mode")
    }

    // same shape for UPDATES: a scattered small batch against wide files
    val upd = dead.select(col("id"), col("p"),
      lit("fresh").as("pay1"), lit("fresh").as("pay2"))
    Seq(false, true).foreach { dv =>
      val t = build(dv)
      t.snapshot().count()
      val (_, upSecs) = timed(
        if (dv) t.upsertVectored(upd) else t.upsert(upd))
      val bytes = commitBytes(t)
      val (cnt, readSecs) = timed(t.snapshot().count())
      spark.catalog.clearCache()
      val mode = if (dv) "dv " else "cow"
      println(f"[dvprobe] mode=$mode rows=$n updates=$victims " +
        f"upsert=$upSecs%.2fs commit_kb=${bytes / 1024.0}%.1f " +
        f"read_after=$readSecs%.2fs rows_after=$cnt")
      require(cnt == n, s"row count off in upsert mode $mode")
    }
    spark.stop()
  }
}
