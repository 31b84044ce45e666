package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.GraftRuntimeScan
import graft.table.CowTable

/** Runtime-file-pruning probe: the same star-schema join run with
  * Spark's dynamic pruning rule on (the graft scan advertises prunable
  * columns via `SupportsRuntimeFiltering`) and off — reporting files
  * read, rows scanned and wall time. The 100-TB claim being measured:
  * a fact table ingested in time-ordered commits is key-striped across
  * its files, so a join against a selective dimension needs only the
  * stripes holding the surviving keys — and the scan discovers WHICH
  * stripes at runtime from the broadcast build side, with no static
  * predicate on the fact in the query text.
  *
  * `runMain graft.DppProbe [sfDir] [inflate] [commits]` — inflate
  * replicates events rows to scale the fact side; commits is the number
  * of time-ordered ingest stripes (files). Results in BASELINE.md.
  */
object DppProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val inflate = if (args.length > 1) args(1).toInt else 20
    val commits = if (args.length > 2) args(2).toInt else 32
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // fact: inflated events keyed by a synthetic unique id that rides
    // ingest order — each commit is an id stripe with recorded stats
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value").cast("double").as("value"))
    val fact = ev.crossJoin(
        spark.range(inflate).select(col("id").as("rep")))
      .select((col("event_id") * inflate + col("rep")).as("k"),
        col("user_id"), col("event_type"), col("value"))
    val (nRows, maxK) = {
      val r = fact.agg(count(lit(1)), max(col("k"))).head()
      (r.getLong(0), r.getLong(1))
    }
    println(s"[dppprobe] fact rows: $nRows, commits: $commits")

    val path = java.nio.file.Files.createTempDirectory("dppprobe").toString
    val tbl = new CowTable(spark, path, keyCols = Seq("k"),
      fileIndexEntries = 1 << 20, statsCols = Seq("k"))
    val stripe = math.max(maxK / commits + 1, 1L)
    val t0 = System.nanoTime
    (0 until commits).foreach { i =>
      val part = fact.filter(
        col("k") >= i * stripe && col("k") < (i + 1) * stripe)
      if (i == 0) tbl.bulkInsert(part, parallelism = 1)
      else tbl.insertAppend(part, parallelism = 1)
    }
    println(f"[dppprobe] build: ${(System.nanoTime - t0) / 1e9}%.1fs")

    // dim: 200 keys, all inside the LAST two stripes — a selective
    // "recent flagged ids" dimension, parquet-backed like a real one
    val dimPath = java.nio.file.Files.createTempDirectory("dppdim").toString
    val lo = (commits - 2) * stripe
    spark.range(200)
      .select((col("id") * 37 % (2 * stripe) + lo).as("k"),
        lit("flagged").as("tag"))
      .write.mode("overwrite").parquet(dimPath)

    def drive(tag: String, dppOn: Boolean): Unit = {
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", dppOn)
      // a FRESH DataFrame per rep: BatchScanExec caches its filtered
      // partition listing per plan instance, so reusing one frame would
      // measure a pre-pruned scan and never re-fire the runtime filter
      def q() = spark.read.format("graft").load(path)
        .join(spark.read.parquet(dimPath).filter(col("tag") === "flagged"),
          Seq("k"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
      q().collect() // warm (fs cache, parquet footers, broadcast build)
      GraftRuntimeScan.pruneLog.remove(path)
      val reps = (1 to 3).map { _ =>
        val t = System.nanoTime
        val row = q().collect()(0)
        ((System.nanoTime - t) / 1e9, row.getLong(0))
      }
      val pruned = Option(GraftRuntimeScan.pruneLog.get(path))
        .map { case (b, a) => s"$a/$b" }.getOrElse(s"$commits/$commits")
      val timing = Option(GraftRuntimeScan.timingLog.get(path))
        .map { case (p, r) => f" (prune ${p}%.0fms, rebuild ${r}%.0fms)" }
        .getOrElse("")
      println(f"[dppprobe] $tag: ${reps.map(_._1).min}%.2fs " +
        s"(reps ${reps.map(r => f"${r._1}%.2f").mkString("/")}), " +
        s"files read $pruned, rows=${reps.head._2}$timing")
    }
    drive("runtime pruning OFF", dppOn = false)
    drive("runtime pruning ON ", dppOn = true)
    spark.stop()
  }
}
