package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sim.AnnIndex

/** Incremental ANN-index cost probe: ingesting a FIXED-size new batch
  * of embeddings into a persisted [[graft.sim.AnnIndex]] vs re-encoding
  * the whole corpus, as the existing corpus grows. The claim under test:
  * the full rebuild re-assigns and re-encodes everything (cost ∝ corpus)
  * while index ingest encodes only the batch against the FROZEN
  * codebooks and key-upserts it (cost ∝ batch, ~flat in corpus size) —
  * and a served search touches only the probed cells' code stripes.
  *
  * Synthetic 64-dim embeddings derived from the row id (deterministic,
  * no data files needed at probe scale).
  *
  * `runMain graft.AnnIngestProbe [corpusSizesCsv] [batchRows]` — results
  * recorded in BASELINE.md.
  */
object AnnIngestProbe {
  def main(args: Array[String]): Unit = {
    val sizes = (if (args.length > 0) args(0) else "100000,400000,1600000")
      .split(',').map(_.trim.toLong).toSeq
    val batchRows = if (args.length > 1) args(1).toLong else 10000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def corpus(from: Long, n: Long) =
      spark.range(from, from + n).select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(64)), i =>
          (pmod(xxhash64(col("id") * 131 + i), lit(1000L)).cast("double")
            / 500.0 - 1.0).cast("float")).as("embedding"))

    sizes.foreach { n =>
      val existing = corpus(0, n)
      val batch = corpus(n, batchRows)
      val path =
        java.nio.file.Files.createTempDirectory("annprobe").toString
      val ix = new AnnIndex(spark, path, numSub = 8, subDim = 8,
        pqK = 16, nCells = 64)
      val t0 = System.nanoTime()
      ix.build(existing)
      val buildSecs = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      ix.ingest(batch)
      val ingestSecs = (System.nanoTime() - t1) / 1e9
      val all = existing.unionAll(batch)
      val t2 = System.nanoTime()
      val hits = ix.search(all, 0L, nProbe = 8, shortlist = 200,
        topK = 10).count()
      val searchSecs = (System.nanoTime() - t2) / 1e9
      spark.catalog.clearCache()
      println(f"[anningest] corpus=$n%d batch=$batchRows%d " +
        f"build=$buildSecs%.2fs ingest=$ingestSecs%.2fs " +
        f"search=$searchSecs%.2fs ($hits%d hits)")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(path))
    }
    spark.stop()
  }
}
