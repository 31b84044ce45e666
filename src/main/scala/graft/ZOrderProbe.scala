package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.table.CowTable

/** Z-order clustering probe: measures what [[CowTable.reclusterZOrder]]
  * buys 2-D range scans over [[CowTable.recluster]]'s single-column sort.
  * Builds a multi-file table with per-file column stats on two INDEPENDENT
  * columns (`event_id`, `user_id` — corr ≈ 0.01 in the testdata), written
  * key-shuffled so every file initially spans both domains, then measures
  * `filesForRange` candidates for narrow range predicates on EACH axis
  * under three layouts: interleaved, linear-clustered on event_id, and
  * Z-ordered on (event_id, user_id). Expectation: linear ≈ 1 file on the
  * sort axis but ~all files on the other; Z-order ≈ sqrt(F) on BOTH.
  * Results recorded in BASELINE.md.
  *
  * `runMain graft.ZOrderProbe [sfDir] [files] [inflate]`
  */
object ZOrderProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nFiles = if (args.length > 1) args(1).toInt else 32
    val inflate = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_id", "user_id", "event_type", "value")
    val baseN = base.count()
    val events = base.crossJoin(
        spark.range(inflate).select(col("id").as("__rep")))
      .withColumn("event_id", col("event_id") + col("__rep") * baseN)
      .drop("__rep")
    val n = baseN * inflate
    val maxUser = events.agg(max("user_id")).head.getLong(0)

    val t = new CowTable(spark,
      java.nio.file.Files.createTempDirectory("zprobe").toString,
      keyCols = Seq("event_id"), fileIndexEntries = 60000,
      statsCols = Seq("event_id", "user_id"))
    t.bulkInsert(events.filter(pmod(col("event_id"), lit(nFiles)) === 0),
      parallelism = 1)
    (1 until nFiles).foreach(i =>
      t.insertAppend(
        events.filter(pmod(col("event_id"), lit(nFiles)) === i),
        parallelism = 1))
    val total = t.manifest.baseFiles.size
    println(s"[zprobe] built $total files, $n rows, shuffled on both axes")

    // one narrow (~1/nFiles-wide) range predicate per axis
    def candidates(columnName: String, lo: Long, hi: Long): Int =
      CowTable.filesForRange(spark, t.manifest, columnName,
        Some(lo), Some(hi)).size
    def drive(tag: String): Unit = {
      val idF = candidates("event_id", n / 2, n / 2 + n / nFiles)
      val userF = candidates("user_id", maxUser / 2,
        maxUser / 2 + math.max(maxUser / nFiles, 1))
      println(s"[zprobe] $tag: narrow event_id range -> $idF/$total files, " +
        s"narrow user_id range -> $userF/$total files")
    }

    drive("interleaved")
    var t0 = System.nanoTime()
    t.recluster(Seq("event_id"), parallelism = nFiles)
    println(f"[zprobe] linear recluster(event_id) " +
      f"${(System.nanoTime() - t0) / 1e9}%.2fs -> " +
      s"${t.manifest.baseFiles.size} files")
    drive("linear")
    t0 = System.nanoTime()
    t.reclusterZOrder("event_id", "user_id", parallelism = nFiles)
    println(f"[zprobe] reclusterZOrder(event_id,user_id) " +
      f"${(System.nanoTime() - t0) / 1e9}%.2fs -> " +
      s"${t.manifest.baseFiles.size} files")
    drive("zorder")
    println(s"[zprobe] rows=${t.snapshot().count()} (must equal $n)")
    spark.stop()
  }
}
