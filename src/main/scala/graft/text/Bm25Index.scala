package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.table.CowTable

/** Persistent BM25 postings index — the production shape of lexical
  * retrieval over a GROWING corpus. [[TextOps.bm25TopDocs]] re-tokenizes
  * and re-counts the whole corpus per query (cost ∝ corpus text); here the
  * term statistics live in two graft tables so a query touches only the
  * query terms' postings and a narrow doc-length table:
  *
  *   - `postings/` — one row per (term, doc_id): `tf` + denormalized `dl`.
  *     Record key (term, doc_id); term-clustered with term min/max stats
  *     AND a term bloom sidecar, so [[CowTable.snapshotForValues]] prunes
  *     the read to the files actually holding the query terms — at corpus
  *     scale a query reads a few postings stripes, never the corpus.
  *   - `doclens/` — one row per doc (`dl`), 2 longs/doc: serves N (exact
  *     from manifest row counts, zero data pages) and avgdl (one narrow
  *     scan; cacheable — it changes only on ingest).
  *
  * Ingest cost is batch-proportional: tokenize the batch, one grouped
  * count, two keyed upserts. Re-ingesting the same docs is IDEMPOTENT —
  * postings and doclens overwrite to identical rows and the derived
  * stats recount rather than accumulate (nothing increments blindly).
  *
  * Ranking reuses [[TextOps.bm25RankHits]] verbatim, so an index-served
  * top-k is provably identical to the corpus-scan ranking (spec-pinned:
  * split-batch ingest == corpus scan, re-ingest included).
  *
  * Documents are immutable corpus units (the training-data contract); a
  * (term, doc) pair never spans batches, so incremental ingest needs no
  * read-modify-write on tf.
  */
final class Bm25Index(spark: SparkSession, path: String) {

  private val postingsPath = s"$path/postings"
  private val doclensPath = s"$path/doclens"

  private def openOr(p: String)(create: => CowTable): CowTable =
    if (CowTable.existsAt(spark, p)) CowTable.open(spark, p) else create

  private def postingsTable(): CowTable = openOr(postingsPath)(
    new CowTable(spark, postingsPath, keyCols = Seq("term", "doc_id"),
      clusterCols = Seq("term"), statsCols = Seq("term"),
      bloomCols = Seq("term"), fileIndexEntries = 100000))

  private def doclensTable(): CowTable = openOr(doclensPath)(
    new CowTable(spark, doclensPath, keyCols = Seq("doc_id")))

  /** Index one batch of (doc_id, text) rows. */
  def ingest(docs: DataFrame): Unit = {
    // ScanPar measured and REJECTED here (r13): the ingest's cost is the
    // postings upsert's commit chain, not the scan-stage tokenize — the
    // added exchange was a paired-run wash at sf0.1
    val withDl = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // r14: range-cluster the batch by term before the keyed upsert
    // (guide §6 — partition/sort on write decides what readers can
    // skip): the grouped batch arrives HASH-partitioned, so every
    // written file would span the whole term range and the per-file
    // term min/max+bloom stats exclude nothing until maintain()
    // re-stripes. Range-clustered, each commit writes few
    // term-contiguous stripes (the write path's clusterCols sort makes
    // each file's range tight) and query-term probes prune
    // freshly-ingested files too. The stripe count derives from the
    // batch's MEASURED cached bytes over the scan split size — one
    // stripe locally, input-proportional at corpus scale (AQE cannot
    // size this: explicit repartitions are exempt from its coalescing).
    // The materializing count is work the upsert's file-prune pass paid
    // anyway; it now fills the cache that pass reuses.
    withDl.count()
    val stripes: Int = {
      val target =
        try spark.sessionState.conf.filesMaxPartitionBytes
        catch { case scala.util.control.NonFatal(_) => 128L * 1024 * 1024 }
      val bytes =
        try withDl.queryExecution.optimizedPlan.stats.sizeInBytes
        catch { case scala.util.control.NonFatal(_) => BigInt(-1) }
      if (bytes < 0 || !bytes.isValidLong) 0
      else math.min(1 << 20,
        math.max(1L, (bytes.toLong + target - 1) / target)).toInt
    }
    val grouped = withDl
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .select("term", "doc_id", "tf", "dl")
    val postings =
      if (stripes > 0) grouped.repartitionByRange(stripes, col("term"))
      else grouped.repartitionByRange(col("term"))
    val pt = postingsTable()
    if (pt.exists) pt.upsert(postings) else pt.bulkInsert(postings)
    val dl = withDl.select("doc_id", "dl")
    val dt = doclensTable()
    if (dt.exists) dt.upsert(dl) else dt.bulkInsert(dl)
    withDl.unpersist()
    ()
  }

  /** Periodic index maintenance: range-recluster the postings by term so
    * each file holds a contiguous term stripe and query-term reads prune
    * to a few files (ingest upserts keep term clustering within the files
    * they rewrite; a growing index benefits from an occasional global
    * re-stripe, exactly like any clustered lake table). `parallelism`
    * bounds the stripe count.
    */
  def maintain(parallelism: Int = 0): Unit = {
    if (CowTable.existsAt(spark, postingsPath))
      postingsTable().recluster(Seq("term"), parallelism)
    ()
  }

  /** Top-k BM25 ranking for `queryTerms`, served from the index: postings
    * reads are file-pruned to the query terms, corpus stats come from the
    * doc-length table. Same output columns, scores and tie-breaks as
    * [[TextOps.bm25TopDocs]] on the ingested corpus.
    */
  def topDocs(queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 index: empty query")
    val dt = doclensTable()
    val lens = dt.snapshot()
    val n = dt.fastCount().getOrElse(lens.count())
    val avgdl = lens.agg(sum(col("dl")).cast("double") / count(lit(1)))
      .head.getDouble(0)
    val hits = postingsTable().snapshotForValues("term", queryTerms)
      .filter(col("term").isin(queryTerms: _*))
      .select(col("doc_id"), col("dl"), col("term"),
        col("tf").cast("double").as("tf"))
    TextOps.bm25RankHits(hits, n, avgdl, k1, b, topK)
  }
}
