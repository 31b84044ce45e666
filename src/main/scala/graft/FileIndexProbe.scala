package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.table.CowTable

/** File-index (bloom) pruning probe: point-key upserts against a table
  * whose units hold MANY files — the workload Hudi's default BLOOM index
  * exists for. Builds the same multi-file table twice (with and without
  * `fileIndexEntries`), applies small keyed update batches, and times each
  * commit plus reports the candidate/kept file counts from the commit
  * metrics. Results recorded in BASELINE.md.
  *
  * `runMain graft.FileIndexProbe [sfDir] [appends] [batches] [batchRows]`
  */
object FileIndexProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val appends = if (args.length > 1) args(1).toInt else 15
    val nBatches = if (args.length > 2) args(2).toInt else 3
    val batchRows = if (args.length > 3) args(3).toInt else 50
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val inflate = if (args.length > 4) args(4).toInt else 10
    val base = spark.read.parquet(s"$sfDir/events.parquet")
      .transform(graft.queries.QueryCatalog.normalizeEventsTs)
    val baseN = base.count()
    // inflate the corpus (disjoint id ranges) so per-file payload dominates
    // fixed job overhead — the regime the index exists for
    val events = base.crossJoin(
        spark.range(inflate).select(col("id").as("__rep")))
      .withColumn("event_id", col("event_id") + col("__rep") * baseN)
      .drop("__rep")
    val n = baseN * inflate
    val slice = (n / appends).toInt

    def build(tag: String, indexEntries: Int): CowTable = {
      val t = new CowTable(spark,
        java.nio.file.Files.createTempDirectory(s"fiprobe-$tag").toString,
        keyCols = Seq("event_id"), fileIndexEntries = indexEntries)
      // one bulkInsert + appends-1 insertAppends -> `appends` files in the
      // single unit, each holding a contiguous event_id range
      t.bulkInsert(events.filter(col("event_id") < slice), parallelism = 1)
      (1 until appends).foreach { i =>
        t.insertAppend(events.filter(col("event_id") >= i.toLong * slice &&
          col("event_id") < (i + 1).toLong * slice), parallelism = 1)
      }
      println(s"[fiprobe] $tag built: ${t.manifest.partitions("").size} files")
      t
    }

    def drive(tag: String, t: CowTable): Unit = {
      var total = 0.0
      (0 until nBatches).foreach { b =>
        // batch keys live inside ONE file's range
        val lo = (b % appends).toLong * slice
        val batch = events.filter(col("event_id") >= lo &&
            col("event_id") < lo + batchRows)
          .withColumn("value", col("value") + 1000.0)
        val t0 = System.nanoTime()
        t.upsert(batch)
        val sec = (System.nanoTime() - t0) / 1e9
        total += sec
        val man = t.manifest
        val m = man.metrics
        // bytes this commit physically rewrote = size of its new data dirs
        // (commit dirs carry a per-attempt unique token since round 7)
        val fs = new org.apache.hadoop.fs.Path(t.basePath).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val dirs = man.files.map(_.split('/')(1))
          .filter(_.startsWith(s"c${man.version}-")).distinct
        val mb = dirs.map(d => fs.getContentSummary(
          new org.apache.hadoop.fs.Path(t.basePath, s"files/$d"))
          .getLength).sum / 1e6
        println(f"[fiprobe] $tag batch#$b upsert ${sec}%.2fs " +
          f"rewrote ${mb}%.1f MB " +
          s"candidate=${m.getOrElse("files_candidate", -1L)} " +
          s"kept=${m.getOrElse("files_kept", -1L)}")
      }
      println(f"[fiprobe] $tag total upsert ${total}%.2fs " +
        s"rows=${t.snapshot().count()}")
    }

    val plain = build("plain", 0)
    val indexed = build("bloom", 60000)
    drive("plain", plain)
    drive("bloom", indexed)
    spark.stop()
  }
}
