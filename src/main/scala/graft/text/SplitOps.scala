package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus SPLIT and DECONTAMINATION operators — the train/val/test
  * hygiene layer of a training-data pipeline, sitting between dedup
  * ([[TextOps.dedupClusters]]) and what ships to the trainer.
  *
  * All three operators are engine-portable by construction (pure BIGINT
  * arithmetic / string n-grams), so the DuckDB oracle battery certifies
  * them value-exact — the same property every other certified row here
  * has.
  */
object SplitOps {

  /** Knuth multiplicative-hash bucket in [0, 100) over an integral key.
    * Deterministic and engine-portable: the key is reduced mod 2^31
    * FIRST so the product stays under 2^63 for ANY BIGINT key ((2^31-1)
    * * 2654435761 < 2^62.4 — no overflow, ANSI-safe), and the same
    * expression evaluates identically in any engine with exact 64-bit
    * integers.
    *
    * Why a multiplicative hash and not `key % 100`: sequential ids would
    * stripe every 100th doc into the same split (correlated with crawl
    * order, shard, time); the golden-ratio multiplier decorrelates the
    * bucket from id structure while keeping the assignment a pure
    * function of the key — stable under corpus growth, reordering and
    * re-partitioning.
    */
  def splitBucket(key: Column): Column =
    pmod(pmod(key, lit(2147483648L)) * lit(2654435761L),
      lit(4294967296L)) % 100

  /** Deterministic hash split: every row gains `split_bucket` (0-99) and
    * `split` (the named slice whose cumulative weight range contains the
    * bucket). Weights must sum to 100. A doc's assignment is a pure
    * function of its key — appending new data or re-running never moves
    * an existing doc across splits, the property batch re-trains rely
    * on. Per-row projection, no shuffle.
    */
  def hashSplit(docs: DataFrame, keyCol: String,
      splits: Seq[(String, Int)] =
        Seq("train" -> 80, "val" -> 10, "test" -> 10)): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 100,
      s"split weights must sum to 100, got $splits")
    val b = splitBucket(col(keyCol))
    val cums = splits.scanLeft(0)(_ + _._2).tail
    val label = splits.zip(cums).reverse
      .foldLeft(lit(null).cast("string")) {
        case (acc, ((name, _), cum)) => when(b < cum, lit(name)).otherwise(acc)
      }
    docs.withColumn("split_bucket", b).withColumn("split", label)
  }

  /** LEAKAGE-SAFE split: near-duplicate cluster members are assigned to
    * the SAME split, so a doc's near-copy can never leak from train into
    * val/test. `clusters` is [[TextOps.dedupClusters]] output (doc_id,
    * cluster_id, ...); unclustered docs key on their own id. The split
    * key is the cluster's canonical (min) id, hashed exactly like
    * [[hashSplit]].
    *
    * Scale shape: the cluster table is DUPLICATE-sized, not
    * corpus-sized (only docs with at least one near-dup edge appear), so
    * the join broadcasts; the split itself stays a per-row projection.
    */
  def leakageSafeSplit(docs: DataFrame, clusters: DataFrame,
      splits: Seq[(String, Int)] =
        Seq("train" -> 80, "val" -> 10, "test" -> 10)): DataFrame = {
    val cl = clusters.select(col("doc_id"), col("cluster_id"))
    val keyed = docs.join(cl, Seq("doc_id"), "left")
      .withColumn("split_key", coalesce(col("cluster_id"), col("doc_id")))
    hashSplit(keyed, "split_key", splits)
  }

  /** Deterministic SOURCE-MIXTURE downsampling — the data-mixing knob of
    * a training run (up/down-weight web vs code vs reference sources to
    * hit a target token mixture): keep a doc iff its hash bucket falls
    * under its source's keep-rate (percent). The SAME
    * [[splitBucket]] hash as the splits, so a doc kept at rate r stays
    * kept at any rate >= r (nested samples — raising a source's weight
    * only ADDS docs, it never swaps the sample) and the decision is
    * reproducible from the key alone. Per-row filter, no shuffle; at
    * 100 TB this is a scan that writes less than it reads.
    */
  def mixtureSample(docs: DataFrame, sourceCol: String, keyCol: String,
      rates: Map[String, Int], defaultRate: Int = 100): DataFrame = {
    require((defaultRate +: rates.values.toSeq)
      .forall(r => r >= 0 && r <= 100), s"rates must be 0-100: $rates")
    val rate = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultRate)) { case (acc, (src, r)) =>
        when(col(sourceCol) === src, lit(r)).otherwise(acc)
      }
    docs.filter(splitBucket(col(keyCol)) < rate)
  }

  /** Word-n-gram DECONTAMINATION (the Brown et al. 2020 / GPT-3 appendix
    * shape, which used 13-grams): a training doc is contaminated if any
    * of its word n-grams appears in the held-out evaluation corpus.
    * Returns (doc_id, n_shared) for contaminated docs only — n_shared =
    * how many DISTINCT n-grams of the doc hit the holdout set, the
    * severity signal a filtering threshold reads.
    *
    * Scale shape: the holdout side (eval benchmarks) is tiny next to a
    * training corpus, so its distinct-gram set broadcasts; the train
    * side is one tokenize+explode pass (grams dedup per doc before the
    * join so counts are well-defined). No corpus x corpus term — cost is
    * train-grams x 1 broadcast probe. Complements the EMBEDDING-space
    * decontamination in [[graft.sim.Similarity.semanticDecontaminate]]:
    * n-grams catch verbatim inclusion, embeddings catch paraphrase.
    */
  def ngramDecontaminate(train: DataFrame, holdout: DataFrame,
      n: Int): DataFrame = {
    def grams(df: DataFrame): DataFrame = df
      .select(col("doc_id"), TextOps.tokens(col("text")).as("_tk"))
      .select(col("doc_id"), explode(TextOps.shingles(col("_tk"), n))
        .as("gram"))
    val hold = grams(holdout).select("gram").distinct()
    grams(train).distinct()
      .join(hold, Seq("gram"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
  }
}
