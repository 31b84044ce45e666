package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.table.CowTable

/** Clustering-service probe: measures what [[CowTable.recluster]] buys
  * point reads on a table whose file key ranges have interleaved — the
  * state any table reaches after shuffled appends. Builds a multi-file
  * table where EVERY file spans ~the whole key range (bloom pruning still
  * works per key, but the range phase passes everything and the blooms of
  * all files must be loaded/consulted), then reclusters and repeats the
  * same point lookups against disjoint ranges. Reports candidate files,
  * bytes read, and wall time per phase. Results recorded in BASELINE.md.
  *
  * `runMain graft.ReclusterProbe [sfDir] [files] [lookups] [inflate]`
  */
object ReclusterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nFiles = if (args.length > 1) args(1).toInt else 16
    val nLookups = if (args.length > 2) args(2).toInt else 20
    val inflate = if (args.length > 3) args(3).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/events.parquet")
      .transform(graft.queries.QueryCatalog.normalizeEventsTs)
    val baseN = base.count()
    val events = base.crossJoin(
        spark.range(inflate).select(col("id").as("__rep")))
      .withColumn("event_id", col("event_id") + col("__rep") * baseN)
      .drop("__rep")
    val n = baseN * inflate

    // key-SHUFFLED writes: round-robin rows across commits so every file's
    // [min,max] key range spans ~the whole table
    val t = new CowTable(spark,
      java.nio.file.Files.createTempDirectory("rcprobe").toString,
      keyCols = Seq("event_id"), fileIndexEntries = 60000)
    t.bulkInsert(events.filter(pmod(col("event_id"), lit(nFiles)) === 0),
      parallelism = 1)
    (1 until nFiles).foreach(i =>
      t.insertAppend(
        events.filter(pmod(col("event_id"), lit(nFiles)) === i),
        parallelism = 1))
    println(s"[rcprobe] built ${t.manifest.partitions("").size} files, " +
      s"$n rows, interleaved key ranges")

    // Block probes (a contiguous key range per lookup — the "re-read this
    // id range" access pattern): single keys are already 1-file via blooms
    // regardless of layout, but a BLOCK of consecutive keys lives in every
    // interleaved file and in ~1 clustered file — the range layout is what
    // bounds the fan-out.
    val blockRows = 2000L
    def drive(tag: String): Unit = {
      import spark.implicits._
      var files = 0L; var bytes = 0L
      val t0 = System.nanoTime()
      (0 until nLookups).foreach { i =>
        val lo = n / nLookups * i + 7L
        val hit = t.lookupByKeys(
          (lo until lo + blockRows).toDF("event_id"))
        hit.count() // materialize the read
        val in = hit.inputFiles
        files += in.length
        val fs = new org.apache.hadoop.fs.Path(t.basePath).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        bytes += in.map(f => fs.getFileStatus(
          new org.apache.hadoop.fs.Path(f)).getLen).sum
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[rcprobe] $tag: $nLookups block lookups " +
        f"($blockRows keys each) in ${sec}%.2fs, " +
        f"files read=$files (${files.toDouble / nLookups}%.1f/lookup), " +
        f"${bytes / 1e6}%.1f MB")
    }

    drive("interleaved")
    val t0 = System.nanoTime()
    t.recluster(Seq("event_id"), parallelism = nFiles)
    println(f"[rcprobe] recluster ${(System.nanoTime() - t0) / 1e9}%.2fs " +
      s"-> ${t.manifest.partitions("").size} files, disjoint ranges")
    drive("clustered")
    println(s"[rcprobe] rows=${t.snapshot().count()} (must equal $n)")
    spark.stop()
  }
}
