package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Capstone composition: the full training-data preparation flow built
  * from the library's operators — exact dedup, near-dup clustering,
  * quality filtering, deterministic mixture sampling, sequence packing —
  * with end-to-end invariants and a determinism re-run.
  */
class PipelineIntegrationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def runPipeline() = {
    // 1. exact dedup: one canonical doc per distinct text
    val exact = TextOps.exactDedup(docs).select("doc_id")
      .join(docs, Seq("doc_id"))
      .select("doc_id", "text", "lang")

    // 2. near-dup removal: cluster LSH pairs, drop non-canonical members
    val pairs = TextOps.lshNearDupPairs(exact, n = 3, rows = 4,
      num = 8, den = 10)
    val clusters = TextOps.dedupClusters(pairs)
    val nonCanonical = clusters.filter(!col("is_canonical"))
      .select(col("doc_id"))
    val deduped = exact.join(nonCanonical, Seq("doc_id"), "left_anti")

    // 3. quality filter: enough tokens, not too repetitive
    val quality = TextOps.repetitionStats(deduped)
      .join(TextOps.tokenStats(deduped), Seq("doc_id"))
      .filter(col("n_tokens") >= 10 && col("top_token_frac") <= 0.5)
      .join(deduped, Seq("doc_id"))

    // 4. deterministic mixture: keep all en, half of everything else
    val mixed = TextOps.stratifiedSample(quality, "doc_id", "lang",
      Map("en" -> 100), defaultPct = 50)

    // 5. pack into 1024-token sequences by doc_id order
    TextOps.sequencePacking(
      mixed.select(col("doc_id"), col("lang"),
        col("n_tokens").cast("long").as("n_tokens")),
      "n_tokens", "doc_id", capacity = 1024L)
  }

  test("training-data pipeline composes with end-to-end invariants") {
    val packed = runPipeline().cache()
    val n = packed.count()
    assert(n > 50, s"pipeline should retain a meaningful corpus, got $n")

    // dedup invariant: every surviving doc_id unique
    assert(packed.select("doc_id").distinct().count() == n)

    // quality invariant holds on every survivor
    assert(packed.filter(col("n_tokens") < 10).isEmpty)

    // packing invariants: pack ids contiguous from 0; every pack except
    // possibly the last holds > capacity - max_doc tokens (prefix binning)
    val packs = packed.groupBy("pack_id")
      .agg(sum("n_tokens").as("tok"), count(lit(1)).as("docs"))
      .orderBy("pack_id")
      .as[(Long, Long, Long)].collect()
    assert(packs.map(_._1).toSeq == packs.indices.map(_.toLong))
    val maxDoc = packed.agg(max("n_tokens")).as[Long].collect()(0)
    packs.dropRight(1).foreach { case (id, tok, _) =>
      assert(tok > 1024L - maxDoc,
        s"pack $id underfilled: $tok tokens (maxDoc=$maxDoc)")
    }
    packed.unpersist()
  }

  test("the pipeline is deterministic across reruns") {
    val a = runPipeline().select("doc_id", "pack_id")
      .as[(Long, Long)].collect().sorted.toSeq
    val b = runPipeline().select("doc_id", "pack_id")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(a == b)
  }

  test("the pipeline_e2e battery row holds its composed invariants") {
    // The six-stage catalog row (html strip → normalize → capped LSH
    // dedup → quality filter → leakage-safe split → sharded packing) is
    // oracle-certified cross-engine; this pins its in-tree invariants so
    // a stage-contract regression fails fast without the oracle.
    val out = graft.queries.QueryCatalog
      .queries("pipeline_e2e")(spark, "/root/testdata/sf0.001")
      .cache()
    try {
      val rows = out.select("doc_id", "split", "q_score", "n_tokens",
          "cum_tokens", "pack_id")
        .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
      assert(rows.nonEmpty && rows.size < 500,
        s"dedup+quality must drop SOME docs: ${rows.size} of 500 kept")
      // survivors are unique and every emitted q_score passed the filter
      assert(rows.map(_._1).distinct.size == rows.size)
      assert(rows.forall(_._3 >= 0L))
      assert(rows.forall(r => Set("train", "val", "test")(r._2)))
      // the sharded prefix sum equals the sequential fold in doc_id order
      var cum = 0L
      rows.sortBy(_._1).foreach { case (id, _, _, n, c, p) =>
        cum += n
        assert(c == cum, s"doc $id: cum_tokens $c != running sum $cum")
        assert(p == (c - n) / 2048L, s"doc $id: pack_id $p")
      }
    } finally out.unpersist()
  }
}
