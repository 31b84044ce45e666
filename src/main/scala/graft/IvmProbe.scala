package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cdc.IncrementalAgg
import graft.cdc.IncrementalAgg.AggSpec
import graft.table.CowTable

/** Incremental-view-maintenance probe: per-batch cost of maintaining a
  * grouped count/sum aggregate by [[IncrementalAgg]] deltas versus
  * re-aggregating the whole table after each upsert. Delta cost scales
  * with batch size (indexed before-image lookup + tiny agg), recompute
  * with table size — the gap is the whole point at 100 TB. Results
  * recorded in BASELINE.md.
  *
  * `runMain graft.IvmProbe [sfDir] [inflate] [batches] [batchRows]`
  */
object IvmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val inflate = if (args.length > 1) args(1).toInt else 10
    val nBatches = if (args.length > 2) args(2).toInt else 5
    val batchRows = if (args.length > 3) args(3).toInt else 200
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
      .select("event_id", "event_type", "value")
    val n = baseN * inflate

    val t = new CowTable(spark,
      java.nio.file.Files.createTempDirectory("ivmprobe").toString,
      keyCols = Seq("event_id"), fileIndexEntries = 200000)
    val files = 15
    val slice = n / files
    t.bulkInsert(events.filter(col("event_id") < slice), parallelism = 1)
    (1 until files).foreach { i =>
      t.insertAppend(events.filter(col("event_id") >= i * slice &&
        col("event_id") < (i + 1) * slice), parallelism = 1)
    }
    println(s"[ivmprobe] table built: $n rows, " +
      s"${t.manifest.partitions("").size} files")

    val spec = AggSpec(Seq("event_type"), "value")
    var agg = IncrementalAgg.recompute(t.snapshot(), spec).localCheckpoint()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val rnd = new scala.util.Random(7)
    (1 to nBatches).foreach { b =>
      // CDC batches cluster in the keyspace (hot entities / recent ids):
      // draw the batch from one narrow window so the bloom index can prune
      // — uniformly random point keys would fan out to every file and the
      // before-image read would degrade to the full scan (same as Hudi's
      // bloom index under uniform updates)
      val lo = rnd.nextLong(n - batchRows * 10L)
      val batch = (0 until batchRows).map { _ =>
        (lo + rnd.nextLong(batchRows * 10L), "update",
          rnd.nextInt(100).toDouble)
      }.toSeq
      import spark.implicits._
      val ups = batch.toDF("event_id", "event_type", "value")
      val (_, dDelta) = time {
        agg = IncrementalAgg.apply(
          agg, IncrementalAgg.delta(t, ups, ups.limit(0), spec), spec)
          .localCheckpoint()
      }
      t.upsert(ups)
      val (fresh, dRecompute) = time {
        IncrementalAgg.recompute(t.snapshot(), spec).localCheckpoint()
      }
      val drift = agg.join(fresh,
        agg("event_type") === fresh("event_type"), "full_outer")
        .filter(agg("cnt") =!= fresh("cnt") ||
          agg("total") =!= fresh("total")).count()
      println(f"[ivmprobe] batch#$b delta=${dDelta}%.2fs " +
        f"recompute=${dRecompute}%.2fs drift=$drift")
    }
    spark.stop()
  }
}
