package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Duplicate-span-removal scaling probe: wall time of
  * [[graft.text.TextOps.dupSpanRemoval]] as the corpus grows with a FIXED
  * planted-boilerplate rate — the claimed asymptotic is linear in corpus
  * token count (window hashing is per-row; the first-occurrence rank and
  * span rollup shuffle only compact (doc_id, pos, hash) triples), so
  * doubling rows should ~double seconds, not quadruple them (an all-pairs
  * formulation would). Also reports detection: every 20th doc embeds a
  * fixed 20-token passage, so the expected flagged-token count is known.
  *
  * `runMain graft.DupSpanProbe [rowsCsv] [tokensPerDoc]` — results
  * recorded in BASELINE.md.
  */
object DupSpanProbe {
  def main(args: Array[String]): Unit = {
    val sizes = (if (args.length > 0) args(0) else "100000,400000")
      .split(',').map(_.trim.toLong).toSeq
    val tokensPerDoc = if (args.length > 1) args(1).toInt else 80
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    sizes.foreach { rows =>
      // vocab large enough that RANDOM 10-gram repeats are negligible:
      // every detected span is a planted one (every 20th doc carries the
      // fixed passage at positions 10..29)
      val docs = spark.range(rows).select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(tokensPerDoc)), i =>
          when(col("id") % 20 === 0 && i > lit(10) && i <= lit(30),
            concat(lit("boiler"), i))
            .otherwise(concat(lit("w"),
              pmod(xxhash64(col("id") * 1000 + i), lit(50000L))))))
          .as("text"))
      val t0 = System.nanoTime()
      val agg = TextOps.dupSpanRemoval(docs, 10)
        .agg(sum("n_dup_tokens").as("dup_toks"),
          sum("n_dup_spans").as("dup_spans"),
          count(lit(1)).as("docs"))
        .collect().head
      val secs = (System.nanoTime() - t0) / 1e9
      // all planted docs except the global first occurrence are flagged
      val expectedDupToks = (rows / 20 - 1) * 20
      println(f"[dupspan] rows=$rows%d tokens=${rows * tokensPerDoc}%d " +
        f"secs=$secs%.2f dup_tokens=${agg.getLong(0)}%d " +
        f"(expected $expectedDupToks%d) dup_spans=${agg.getLong(1)}%d " +
        f"docs=${agg.getLong(2)}%d")
    }
    spark.stop()
  }
}
