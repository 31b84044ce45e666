package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** Product-quantization ANN cost probe: query-time cost of the PQ-ADC
  * two-stage search (code-index scan + shortlist re-rank,
  * [[graft.sim.Similarity.pqSearch]]) versus exact brute-force cosine
  * ([[graft.sim.Similarity.cosineTopK]]) as the corpus grows, plus the
  * achieved top-10 recall of the approximate stage.
  *
  * The claim under test: both scans are linear, but the ADC pass touches 8
  * packed bytes per vector instead of 256 float bytes (plus the full
  * dot-product arithmetic), so the per-vector constant is far smaller —
  * at 100 TB that factor is the difference between an in-memory code index
  * and re-reading the raw embedding corpus per query. The encode cost
  * (index build, amortized over all queries) is reported separately.
  *
  * `runMain graft.PqProbe [corpusSizesCsv]` — results in BASELINE.md.
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sizes = (if (args.length > 0) args(0) else "200000,800000")
      .split(',').map(_.trim.toLong).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic synthetic 64-dim corpus in [-1, 1): coordinate j of
    // vector i hashes (i, j) — reproducible across runs, no RNG
    def corpus(n: Long) =
      spark.range(0, n).select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(64)), j =>
          (pmod(xxhash64(col("id") * 100 + j), lit(2000L)).cast("double")
            - 1000d) / 1000d).as("embedding"))

    sizes.foreach { n =>
      val embs = corpus(n)
      // also materialize the raw vectors so the brute-force side reads
      // parquet like the index side does (fair IO comparison)
      embs.write.mode("overwrite").parquet("/tmp/pqprobe-embs")
      val stored = spark.read.parquet("/tmp/pqprobe-embs")
      // build the code index once (the stored artifact), timed separately
      val t0 = System.nanoTime()
      Similarity.pqEncode(stored, 8, 8, 16)
        .write.mode("overwrite").parquet("/tmp/pqprobe-codes")
      val encodeSecs = (System.nanoTime() - t0) / 1e9
      val codes = spark.read.parquet("/tmp/pqprobe-codes")
      val cents = Similarity.pqCodebook(stored, 8, 8, 16)
      val t1 = System.nanoTime()
      val approx = Similarity.pqSearchIndexed(stored, codes, 0L, cents,
        8, 8, 16, shortlist = 1000, topK = 10)
        .select("vec_id").collect().map(_.getLong(0))
      val pqSecs = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val exact = Similarity.cosineTopK(stored, 0L, 10)
        .select("vec_id").collect().map(_.getLong(0))
      val exactSecs = (System.nanoTime() - t2) / 1e9
      val recall = approx.toSet.intersect(exact.toSet).size
      spark.catalog.clearCache()
      println(f"[pq] corpus=$n%d encode=$encodeSecs%.2fs " +
        f"adcIndexedSearch=$pqSecs%.2fs exactSearch=$exactSecs%.2fs " +
        f"recall@10=$recall%d/10")
    }
    spark.stop()
  }
}
