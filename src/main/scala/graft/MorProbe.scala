package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.table.{CowTable, MorTable}

/** Write-amplification probe: COW vs MOR under a stream of small upsert
  * batches against a large table — the workload MOR exists for. Loads the
  * sf0.1 events table (150k rows), then applies small keyed update batches
  * to each storage type, timing each commit, the post-batch read, and the
  * final MOR compaction. Results recorded in BASELINE.md.
  *
  * `runMain graft.MorProbe [sfDir] [batches] [batchRows]`
  */
object MorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = if (args.length > 1) args(1).toInt else 5
    val batchRows = if (args.length > 2) args(2).toInt else 2000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .transform(graft.queries.QueryCatalog.normalizeEventsTs)
      .withColumn("ts", unix_micros(col("ts")))
      .select("event_id", "user_id", "event_type", "value", "ts")
    val n = events.count()
    def batch(i: Int) = events
      .filter(pmod(xxhash64(col("event_id"), lit(i)), lit(n / batchRows)) === 0)
      .withColumn("value", col("value") + i)
      .withColumn("ts", col("ts") + i)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    for (storage <- Seq("cow", "mor")) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"probe-$storage").toString
      val t =
        if (storage == "mor")
          new MorTable(spark, dir, Seq("event_id"), Seq("event_type"),
            precombineField = "ts", compactEvery = 0)
        else
          new CowTable(spark, dir, Seq("event_id"), Seq("event_type"),
            precombineField = "ts")
      val (_, tLoad) = time(t.bulkInsert(events, parallelism = 32))
      val upTimes = (1 to nBatches).map { i =>
        time(t.upsert(batch(i), parallelism = 32))._2
      }
      val (cnt, tRead) = time(t.snapshot().count())
      val tCompact = t match {
        case m: MorTable => Some(time(m.compactLogs(32))._2)
        case _ => None
      }
      val (cnt2, tRead2) = time(t.snapshot().count())
      println(f"[probe] $storage load=$tLoad%.2f upserts=" +
        upTimes.map(x => f"$x%.2f").mkString(",") +
        f" sumUpserts=${upTimes.sum}%.2f read=$tRead%.2f rows=$cnt" +
        tCompact.map(c => f" compact=$c%.2f readAfter=$tRead2%.2f rows2=$cnt2")
          .getOrElse(""))
    }
    spark.stop()
  }
}
