package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sim.AnnIndex

/** Batched-vs-looped ANN serving probe: answering Q queries with ONE
  * [[AnnIndex.searchBatch]] plan vs Q sequential [[AnnIndex.search]]
  * calls (each a driver round-trip: probe collect + LUT collect + its
  * own job). Synthetic 64-dim corpus as in [[AnnIngestProbe]].
  *
  * `runMain graft.AnnBatchProbe [corpusRows] [queryCountsCsv]` —
  * results recorded in BASELINE.md.
  */
object AnnBatchProbe {
  def main(args: Array[String]): Unit = {
    val corpusRows = if (args.length > 0) args(0).toLong else 400000L
    val qCounts = (if (args.length > 1) args(1) else "4,16,64")
      .split(',').map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus = spark.range(0, corpusRows).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(64)), i =>
        (pmod(xxhash64(col("id") * 131 + i), lit(1000L)).cast("double")
          / 500.0 - 1.0).cast("float")).as("embedding"))

    val path = java.nio.file.Files.createTempDirectory("annbatch").toString
    val ix = new AnnIndex(spark, path, numSub = 8, subDim = 8,
      pqK = 16, nCells = 64)
    ix.build(corpus)

    qCounts.foreach { nq =>
      val qids = (0 until nq).map(i => i.toLong * 97L % corpusRows)
      // warm both paths once at the smallest size semantics stay honest
      val t0 = System.nanoTime()
      val nBatch = ix.searchBatch(corpus, qids, nProbe = 8,
        shortlist = 200, topK = 10).count()
      val batchSecs = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      var nLoop = 0L
      qids.foreach { q =>
        nLoop += ix.search(corpus, q, nProbe = 8, shortlist = 200,
          topK = 10).count()
      }
      val loopSecs = (System.nanoTime() - t1) / 1e9
      println(f"[annbatch] corpus=$corpusRows%d queries=$nq%d " +
        f"batch=$batchSecs%.2fs ($nBatch%d rows) " +
        f"loop=$loopSecs%.2fs ($nLoop%d rows)")
    }
    spark.stop()
  }
}
