package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.table.CowTable

/** Random-point-key lookup probe: the documented file-index caveat is that
  * UNIFORMLY RANDOM record keys make every file's key range span the whole
  * key space, so a point lookup must consult EVERY file's bloom — O(files
  * in the unit) sidecar loads per lookup even though only ~1 file is read.
  * Key-hash bucketing (`numBuckets`) bounds that: the probe key routes to
  * one bucket, so only that bucket's files are consulted —
  * O(files/bucket), independent of table growth in other buckets.
  *
  * Builds the same random-key table twice (flat vs bucketed), runs point
  * lookups, and reports blooms-consulted + files-read per lookup.
  * Results recorded in BASELINE.md.
  *
  * `runMain graft.BucketLookupProbe [rows] [appends] [buckets] [lookups]`
  */
object BucketLookupProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 1000000
    val appends = if (args.length > 1) args(1).toInt else 4
    val buckets = if (args.length > 2) args(2).toInt else 16
    val lookups = if (args.length > 3) args(3).toInt else 20
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // deterministic pseudo-random keys: xxhash64 scrambles the id space so
    // every append's file covers (almost) the full key range
    def slice(a: Int) = spark.range(rows / appends)
      .select((xxhash64(col("id") + lit(a.toLong * rows)))
        .as("k"), col("id").cast("double").as("v"))

    def build(tag: String, nb: Int): CowTable = {
      val t = new CowTable(spark,
        java.nio.file.Files.createTempDirectory(s"blprobe-$tag").toString,
        keyCols = Seq("k"), numBuckets = nb,
        fileIndexEntries = rows / appends / buckets + 1)
      // SAME file count/size either way (flat writes `buckets` files per
      // commit too) — the probe isolates routing, not file granularity
      t.bulkInsert(slice(0), parallelism = buckets)
      (1 until appends).foreach(a =>
        t.insertAppend(slice(a), parallelism = buckets))
      println(s"[blprobe] $tag: ${t.manifest.baseFiles.size} files, " +
        s"${t.manifest.partitions.size} units")
      t
    }

    def drive(tag: String, t: CowTable): Unit = {
      val keys = (0 until lookups).map(i =>
        spark.range(1).select(xxhash64(lit(i.toLong * 37L)).as("k"))
          .head().getLong(0))
      var blooms = 0L; var filesRead = 0L; var hits = 0L
      val t0 = System.nanoTime()
      keys.foreach { k =>
        val before = CowTable.bloomLoads.get()
        val hit = t.lookupByKeys(Seq(k).toDF("k"))
        filesRead += hit.inputFiles.length
        hits += hit.count()
        blooms += CowTable.bloomLoads.get() - before
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[blprobe] $tag: ${blooms.toDouble / lookups}%.1f blooms/" +
        f"lookup, ${filesRead.toDouble / lookups}%.2f files/lookup, " +
        f"$hits hits, ${sec / lookups}%.3fs/lookup")
    }

    val flat = build("flat", 0)
    val bucketed = build(s"bucket$buckets", buckets)
    drive("flat", flat)
    drive(s"bucket$buckets", bucketed)
    spark.stop()
  }
}
