package graft.text

import graft.SparkSpec
import graft.table.CowTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class LshDedupIndexSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"
  lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  private def canon(df: DataFrame): Set[(Long, Long)] =
    df.select(least(col("doc_a"), col("doc_b")),
      greatest(col("doc_a"), col("doc_b")))
      .as[(Long, Long)].collect().toSet

  test("incremental two-batch ingest equals the one-shot batch run") {
    val path = tmpDir("lshidx")
    val idx = new LshDedupIndex(spark, path)
    val b1 = docs.filter(col("doc_id") < 250)
    val b2 = docs.filter(col("doc_id") >= 250)
    val p1 = canon(idx.ingest(b1, docs, 8, 10))
    val p2 = canon(idx.ingest(b2, docs, 8, 10))
    assert((p1 & p2).isEmpty, "a pair must be reported by exactly one batch")
    val batch = canon(TextOps.lshNearDupPairs(docs, 3, 2, 8, 10))
    assert((p1 | p2) == batch,
      "incremental union must equal the corpus-wide batch result")
    assert(batch.nonEmpty, "corpus contains planted near-dups")
  }

  test("re-ingesting an indexed batch is idempotent on the index") {
    val path = tmpDir("lshidx-re")
    val idx = new LshDedupIndex(spark, path)
    val b1 = docs.filter(col("doc_id") < 100)
    idx.ingest(b1, docs, 8, 10)
    val rowsBefore = CowTable.open(spark, path).snapshot().count()
    val verBefore = CowTable.open(spark, path).manifest.version
    // same docs again: no self-pairs, and the upsert rewrites keys in
    // place (record key = (band, bh, doc_id)) — index size is unchanged
    val again = idx.ingest(b1, docs, 8, 10)
    assert(again.filter(col("doc_a") === col("doc_b")).count() == 0)
    val after = CowTable.open(spark, path)
    assert(after.snapshot().count() == rowsBefore)
    assert(after.manifest.version > verBefore, "re-ingest still commits")
  }
}
