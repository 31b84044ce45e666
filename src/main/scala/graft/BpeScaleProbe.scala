package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BPE training scale probe: sequential one-merge-per-round
  * ([[graft.text.TextOps.bpeTrain]]) vs the batched trainer
  * ([[graft.text.TextOps.bpeTrainBatched]]) on the documents corpus.
  * The measured object is the driver-sequenced job-round count — the
  * production-vocabulary bottleneck (a 30k-merge vocabulary is ~60k
  * sequenced jobs sequential, ~60k/batch batched); wall-clock at probe
  * scale tracks rounds almost linearly because each round's work is a
  * small fixed set of jobs over the (shrinking) word-shape vocab.
  *
  * `runMain graft.BpeScaleProbe [sfDir] [merges] [batch] [mode]`
  * (defaults sf0.01, 64, 16, both) — results recorded in BASELINE.md.
  * `mode=batched` skips the sequential arm: at production-shaped merge
  * counts (>=1k) the sequential trainer's wall time is the already-
  * measured ~2 jobs/merge chain and re-running it adds nothing but
  * minutes; the batched arm is the one whose per-round flatness the
  * probe certifies.
  */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val merges = if (args.length > 1) args(1).toInt else 64
    val batch = if (args.length > 2) args(2).toInt else 16
    val batchedOnly = args.length > 3 && args(3) == "batched"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("text"))
    (1 to 2).foreach { rep =>
      var t0 = System.nanoTime
      val (seqS, seqN) =
        if (batchedOnly) (-1.0, -1L)
        else {
          val n = graft.text.TextOps.bpeTrain(docs, "text", merges).count()
          (((System.nanoTime - t0) / 1e9), n)
        }
      t0 = System.nanoTime
      val batN = graft.text.TextOps
        .bpeTrainBatched(docs, "text", merges, batch).count()
      val batS = (System.nanoTime - t0) / 1e9
      println(f"[bpeprobe] rep=$rep merges=$merges batch=$batch " +
        f"sequential=$seqS%.1fs ($seqN) batched=$batS%.1fs ($batN)")
    }
    spark.stop()
  }
}
