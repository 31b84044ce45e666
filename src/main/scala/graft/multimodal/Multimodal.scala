package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payload
  * columns with typed metadata, processed in per-partition batches.
  *
  * The DECODE step is a clearly-marked deterministic stub (no codec
  * libraries exist in this environment — see `fakeDecode`); everything
  * Spark-side is real and tested: the asset schema, binary ingestion,
  * partition-batched transformation (`mapPartitions`, the JVM analog of
  * `mapInPandas` batch shape), metadata extraction, and content-hash
  * partitioning for storage balance.
  *
  * Scale notes: payloads stay off the driver at all times; per-partition
  * iterators bound memory to one batch; `repartition(hash(asset_id))`
  * spreads hot sources; feature vectors come back as `array<float>` columns
  * ready for graft.sim.Similarity.
  */
object Multimodal {

  /** Canonical multimodal asset schema: opaque payload + typed metadata. */
  val AssetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),   // images/video
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true) // audio/video
  ))

  /** Wrap a text/binary-ish table (e.g. `documents`) into the asset shape —
    * the ingestion path a real pipeline would run over raw object storage.
    */
  def ingestDocumentsAsAssets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      lit("image").as("media_type"),
      to_binary(col("text"), lit("utf-8")).as("payload"),
      col("source"),
      lit(null).cast(IntegerType).as("width"),
      lit(null).cast(IntegerType).as("height"),
      lit(null).cast(LongType).as("duration_ms"))

  /** The pluggable decode seam: one payload in, metadata + features out.
    * Implementations MUST be serializable (they execute inside
    * `mapPartitions` on executors) and are expected to be stateless or to
    * lazily initialize native resources per JVM (the standard codec-jar
    * pattern). Drop a real libjpeg/ffmpeg-backed implementation in and
    * every pipeline stage ([[decodeAssets]], [[resizeMeta]], downstream
    * similarity search) works unchanged.
    */
  trait MediaCodec extends Serializable {
    /** Decode one payload to (width, height, feature vector). Null/empty
      * payloads must return a deterministic zero shape, never throw.
      */
    def decode(mediaType: String, payload: Array[Byte])
        : (Int, Int, Array[Float])
  }

  /** STUB — the default deterministic fake codec.
    *
    * ??? A REAL IMPLEMENTATION REQUIRES A CODEC (libjpeg/ffmpeg/…): none
    * are available in this offline container. The fake derives stable
    * pseudo metadata + an 8-dim pseudo feature vector from the payload
    * bytes so the surrounding plumbing (batching, schema, joins) is fully
    * testable; production swaps in a [[MediaCodec]] backed by real codec
    * libraries.
    */
  object StubCodec extends MediaCodec {
    override def decode(mediaType: String, payload: Array[Byte])
        : (Int, Int, Array[Float]) = {
      if (payload == null) return (0, 0, Array.fill(8)(0f))
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
      val w = 64 + math.floorMod(h, 1024).toInt
      val ht = 64 + math.floorMod(h >> 10, 1024).toInt
      val vec = Array.tabulate(8)(j =>
        (math.floorMod(h >> (j * 7), 2048) / 1024.0f) - 1.0f)
      (w, ht, vec)
    }
  }

  /** Back-compat alias for the stub (see [[StubCodec]]). */
  def fakeDecode(payload: Array[Byte]): (Int, Int, Array[Float]) =
    StubCodec.decode("image", payload)

  /** Decoded-asset output schema: metadata + feature vector. */
  val DecodedSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("decoded_width", IntegerType, nullable = false),
    StructField("decoded_height", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false),
      nullable = false)
  ))

  /** Partition-batched decode/feature-extract: the `mapInPandas`-shaped
    * stage. Rows stream through per-partition iterators — constant memory,
    * no driver involvement, parallelism = partition count. The codec is
    * pluggable ([[MediaCodec]]); the default is the labeled stub.
    */
  def decodeAssets(
      assets: DataFrame, codec: MediaCodec = StubCodec): DataFrame = {
    val enc = Encoders.row(DecodedSchema)
    val idxId = assets.schema.fieldIndex("asset_id")
    val idxType = assets.schema.fieldIndex("media_type")
    val idxPayload = assets.schema.fieldIndex("payload")
    assets.mapPartitions { rows =>
      rows.map { r =>
        val payload =
          if (r.isNullAt(idxPayload)) null else r.getAs[Array[Byte]](idxPayload)
        val mediaType = r.getString(idxType)
        val (w, h, feat) = codec.decode(mediaType, payload)
        Row(r.getLong(idxId), mediaType,
          if (payload == null) 0L else payload.length.toLong,
          w, h, feat.toSeq)
      }
    }(enc)
  }

  /** Storage-balancing repartition by content hash — avoids hot-source skew
    * when payload sizes correlate with source.
    */
  def balanceByContent(assets: DataFrame, partitions: Int): DataFrame =
    assets.repartition(partitions, xxhash64(col("asset_id")))

  /** Resize stage: recompute target dimensions preserving aspect ratio.
    * The pixel transform itself is part of the stubbed codec (see
    * [[fakeDecode]]); the metadata arithmetic, schema and batching are the
    * real Spark surface a resize stage needs.
    */
  def resizeMeta(decoded: DataFrame, maxSide: Int): DataFrame = {
    val longest = greatest(col("decoded_width"), col("decoded_height"))
    val scale = when(longest > maxSide,
      lit(maxSide.toDouble) / longest).otherwise(lit(1.0))
    decoded
      .withColumn("resized_width",
        ceil(col("decoded_width") * scale).cast("int"))
      .withColumn("resized_height",
        ceil(col("decoded_height") * scale).cast("int"))
  }

  /** Frame sampling: emit every `everyNth` synthetic frame index of a
    * video-typed asset (duration-derived), the standard decimation step
    * before per-frame feature extraction. Pure `sequence`+`explode` —
    * distributed, no driver loops; frames per row bounded by duration.
    */
  def sampleFrames(
      assets: DataFrame, fps: Int, everyNth: Int): DataFrame = {
    val nFrames = (col("duration_ms") * fps / 1000).cast("long")
    assets
      .filter(col("media_type") === "video" && col("duration_ms").isNotNull)
      .withColumn("frame_idx",
        explode(sequence(lit(0L), greatest(nFrames - 1, lit(0L)),
          lit(everyNth.toLong))))
      .select(col("asset_id"), col("frame_idx"),
        (col("frame_idx") * 1000 / fps).cast("long").as("frame_ts_ms"))
  }
}
