package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.{LshDedupIndex, TextOps}

/** Incremental-dedup cost probe: ingesting a FIXED-size new batch against
  * a persisted [[graft.text.LshDedupIndex]] vs re-running the corpus-wide
  * batch near-dup, as the existing corpus grows. The claim under test is
  * the asymptotic: the batch rerun re-bands everything (cost ∝ corpus),
  * the index ingest bands only the batch and reads only matched index
  * files (cost ∝ batch + matches, ~FLAT in corpus size).
  *
  * `runMain graft.LshIngestProbe [corpusSizesCsv] [batchRows]` — results
  * recorded in BASELINE.md.
  */
object LshIngestProbe {
  def main(args: Array[String]): Unit = {
    val sizes = (if (args.length > 0) args(0) else "100000,400000")
      .split(',').map(_.trim.toLong).toSeq
    val batchRows = if (args.length > 1) args(1).toLong else 2000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~30-token docs over a wide hash vocab; every 500th doc duplicates
    // its predecessor's text (a small planted near-dup rate so candidate
    // verification is exercised without dominating)
    def corpus(from: Long, n: Long) =
      spark.range(from, from + n).select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(30)), i =>
          concat(lit("w"), pmod(xxhash64(
            (when(col("id") % 500 === 0, col("id") - 1)
              .otherwise(col("id"))) * 100 + i, lit(7L)), lit(200000L)))))
          .as("text"))

    sizes.foreach { n =>
      val existing = corpus(0, n)
      val batch = corpus(n, batchRows)
      val all = existing.unionAll(batch)
      val idxPath =
        java.nio.file.Files.createTempDirectory("lshprobe").toString
      val idx = new LshDedupIndex(spark, idxPath)
      // seed the index with the existing corpus (untimed)
      idx.ingest(existing, existing, 8, 10)
      val t0 = System.nanoTime()
      val incPairs = idx.ingest(batch, all, 8, 10).count()
      val incSecs = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val batchPairs = TextOps.lshNearDupPairs(all, 3, 2, 8, 10).count()
      val batchSecs = (System.nanoTime() - t1) / 1e9
      spark.catalog.clearCache()
      println(f"[lshingest] corpus=$n%d batch=$batchRows%d " +
        f"incremental=$incSecs%.2fs ($incPairs%d pairs) " +
        f"fullBatch=$batchSecs%.2fs ($batchPairs%d pairs)")
    }
    spark.stop()
  }
}
