package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("ingestion produces the canonical asset schema with binary payloads") {
    val assets = Multimodal.ingestDocumentsAsAssets(docs)
    assert(assets.schema.fieldNames.toSeq ==
      Multimodal.AssetSchema.fieldNames.toSeq)
    assert(assets.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(assets.count() == docs.count())
  }

  test("partition-batched decode emits metadata + features, deterministic") {
    val assets = Multimodal.ingestDocumentsAsAssets(docs)
    val decoded = Multimodal.decodeAssets(assets).cache()
    assert(decoded.schema.json == Multimodal.DecodedSchema.json)
    assert(decoded.count() == docs.count())
    // n_bytes matches the utf-8 payload length
    val check = decoded.join(docs, col("asset_id") === col("doc_id"))
      .filter(col("n_bytes") =!= octet_length(col("text")).cast("long"))
    assert(check.isEmpty)
    // features deterministic across runs
    val a = decoded.select("asset_id", "features")
      .as[(Long, Seq[Float])].collect().toMap
    val b = Multimodal.decodeAssets(assets).select("asset_id", "features")
      .as[(Long, Seq[Float])].collect().toMap
    assert(a == b)
    assert(a.values.forall(_.length == 8))
    decoded.unpersist()
  }

  test("balanceByContent yields the requested partitioning") {
    val assets = Multimodal.ingestDocumentsAsAssets(docs)
    val balanced = Multimodal.balanceByContent(assets, 8)
    assert(balanced.rdd.getNumPartitions == 8)
    assert(balanced.count() == docs.count())
  }

  test("decoded features feed the similarity operators") {
    val decoded = Multimodal.decodeAssets(
      Multimodal.ingestDocumentsAsAssets(docs))
      .select(col("asset_id").as("vec_id"), col("features").as("embedding"))
    val topk = graft.sim.Similarity.cosineTopK(decoded, 0L, 3)
    assert(topk.count() == 3)
  }
}
