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

  test("a custom MediaCodec plugs into the decode stage and roundtrips") {
    // a "real" codec for a toy format: payload = "WxH:" header followed by
    // comma-separated floats — decode must surface exactly those values
    object ToyCodec extends Multimodal.MediaCodec {
      override def decode(mediaType: String, payload: Array[Byte])
          : (Int, Int, Array[Float]) = {
        if (payload == null) return (0, 0, Array.empty[Float])
        val s = new String(payload, "UTF-8")
        val Array(dims, feats) = s.split(':')
        val Array(w, h) = dims.split('x').map(_.toInt)
        (w, h, feats.split(',').map(_.toFloat))
      }
    }
    val assets = Seq(
      (1L, "image", "640x480:0.5,-0.25".getBytes("UTF-8")),
      (2L, "image", "1920x1080:1.0,2.0".getBytes("UTF-8")))
      .toDF("asset_id", "media_type", "payload")
    val decoded = Multimodal.decodeAssets(assets, ToyCodec)
      .select("asset_id", "decoded_width", "decoded_height", "features")
      .as[(Long, Int, Int, Seq[Float])].collect()
      .map { case (k, w, h, f) => k -> ((w, h, f)) }.toMap
    assert(decoded(1L) == ((640, 480, Seq(0.5f, -0.25f))),
      s"codec output must roundtrip: $decoded")
    assert(decoded(2L) == ((1920, 1080, Seq(1.0f, 2.0f))))
    // the default path still runs the labeled stub
    val stub = Multimodal.decodeAssets(assets).select("decoded_width")
      .as[Int].collect()
    assert(stub.forall(_ >= 64), "stub dimensions are hash-derived")
  }

  test("balanceByContent yields the requested partitioning") {
    val assets = Multimodal.ingestDocumentsAsAssets(docs)
    val balanced = Multimodal.balanceByContent(assets, 8)
    assert(balanced.rdd.getNumPartitions == 8)
    assert(balanced.count() == docs.count())
  }

  test("resize preserves aspect ratio and only shrinks") {
    val decoded = Multimodal.decodeAssets(
      Multimodal.ingestDocumentsAsAssets(docs))
    val resized = Multimodal.resizeMeta(decoded, 256)
    val bad = resized.filter(
      col("resized_width") > 256 && col("resized_height") > 256)
    assert(bad.isEmpty)
    // unscaled rows keep dimensions
    val kept = resized.filter(col("decoded_width") <= 256 &&
      col("decoded_height") <= 256)
      .filter(col("resized_width") =!= col("decoded_width"))
    assert(kept.isEmpty)
  }

  test("frame sampling emits every Nth frame with timestamps") {
    import spark.implicits._
    val assets = Seq(
      (1L, "video", 2000L), // 2s @ 10fps -> frames 0..19
      (2L, "image", 0L)
    ).toDF("asset_id", "media_type", "duration_ms")
    val frames = Multimodal.sampleFrames(assets, fps = 10, everyNth = 5)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(frames.map(_._1).distinct.toSeq == Seq(1L), "images skipped")
    assert(frames.map(_._2).toSeq == Seq(0L, 5L, 10L, 15L))
    assert(frames.map(_._3).toSeq == Seq(0L, 500L, 1000L, 1500L))
  }

  test("decoded features feed the similarity operators") {
    val decoded = Multimodal.decodeAssets(
      Multimodal.ingestDocumentsAsAssets(docs))
      .select(col("asset_id").as("vec_id"), col("features").as("embedding"))
    val topk = graft.sim.Similarity.cosineTopK(decoded, 0L, 3)
    assert(topk.count() == 3)
  }
}
