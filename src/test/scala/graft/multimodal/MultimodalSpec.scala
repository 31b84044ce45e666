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

  test("ImageIoCodec really decodes PNG/BMP: exact dims and channel means") {
    // PNG and BMP are lossless -> recovered channel means equal the fill
    // colour exactly; dimensions are the true pixel dimensions.
    for (fmt <- Seq("png", "bmp")) {
      val payload = Multimodal.encodeSolidImage(37, 21, 200, 50, 125, fmt)
      val (w, h, feat) = Multimodal.ImageIoCodec.decode("image", payload)
      assert((w, h) == ((37, 21)), s"$fmt dims")
      assert(math.round(feat(0) * 255) == 200, s"$fmt meanR ${feat(0)}")
      assert(math.round(feat(1) * 255) == 50, s"$fmt meanG")
      assert(math.round(feat(2) * 255) == 125, s"$fmt meanB")
      // luma of (200,50,125) = 103.3 -> all pixels in bin 1
      assert(feat(4) == 1.0f, s"$fmt luma hist")
      assert(math.abs(feat(7) - 37.0f / 58) < 1e-6, s"$fmt aspect")
    }
  }

  test("ImageIoCodec decodes JPEG with lossy-tolerant means") {
    val payload = Multimodal.encodeSolidImage(64, 48, 180, 90, 30, "jpg")
    val (w, h, feat) = Multimodal.ImageIoCodec.decode("image", payload)
    assert((w, h) == ((64, 48)))
    assert(math.abs(feat(0) * 255 - 180) < 6, s"jpeg meanR ${feat(0) * 255}")
    assert(math.abs(feat(1) * 255 - 90) < 6)
    assert(math.abs(feat(2) * 255 - 30) < 6)
  }

  test("ImageIoCodec never throws: garbage and empty payloads -> zero shape") {
    for (bad <- Seq(Array[Byte](9), Array[Byte](1, 2, 3), null,
        Array.empty[Byte])) {
      val (w, h, f) = Multimodal.ImageIoCodec.decode("image", bad)
      assert(w == 0 && h == 0 && f.length == 8 && f.forall(_ == 0f))
    }
  }

  test("encodeConstWav round-trips exactly through WavCodec") {
    val amp = 12345
    val (ch, hz, feat) = Multimodal.WavCodec.decode("audio",
      Multimodal.encodeConstWav(11000, 901, amp))
    assert(ch == 1 && hz == 11000)
    assert(math.round(feat(0) * 11000) == 901L, "n_frames from duration")
    // constant signal: rms == peak == amp/32768 EXACTLY (power-of-two div)
    assert(feat(1) == amp / 32768.0f && feat(3) == amp / 32768.0f)
    assert(feat(2) == 0f, "no zero crossings")
  }

  test("WavCodec really parses PCM WAV: rate, channels, duration, envelope") {
    // synthesize 0.5 s of stereo 16-bit PCM at 8 kHz: silence in the first
    // half, full-scale square wave at 400 Hz in the second half
    val rate = 8000
    val n = rate / 2
    val pcm = new Array[Byte](n * 4)
    for (i <- n / 2 until n) {
      val v: Short = if ((i * 400 * 2 / rate) % 2 == 0) 30000 else -30000
      for (c <- 0 until 2) {
        pcm(i * 4 + 2 * c) = (v & 0xff).toByte
        pcm(i * 4 + 2 * c + 1) = ((v >> 8) & 0xff).toByte
      }
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 2, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val (channels, hz, feat) =
      Multimodal.WavCodec.decode("audio", bos.toByteArray)
    assert(channels == 2 && hz == rate)
    assert(math.abs(feat(0) - 0.5f) < 1e-3, s"duration ${feat(0)}")
    assert(feat(4) == 0f && feat(5) == 0f, "first half silent")
    assert(feat(6) > 0.8f && feat(7) > 0.8f, "second half loud")
    assert(feat(3) > 0.9f, "peak near full scale")
    // garbage payload -> zero shape, no throw
    val (zw, zh, zf) = Multimodal.WavCodec.decode("audio", Array[Byte](1, 2))
    assert(zw == 0 && zh == 0 && zf.forall(_ == 0f))
  }

  test("JdkCodec routes by media type; video stays the labeled stub") {
    val png = Multimodal.encodeSolidImage(10, 10, 1, 2, 3)
    assert(Multimodal.JdkCodec.decode("image", png)._1 == 10)
    val viaStub = Multimodal.StubCodec.decode("video", png)
    val viaJdk = Multimodal.JdkCodec.decode("video", png)
    assert(viaJdk._1 == viaStub._1 && viaJdk._3.toSeq == viaStub._3.toSeq)
  }

  test("resizeAssets really rescales pixels, preserving aspect and colour") {
    import spark.implicits._
    val big = Multimodal.encodeSolidImage(400, 100, 10, 200, 60)
    val small = Multimodal.encodeSolidImage(50, 40, 7, 8, 9)
    val assets = Seq(
      (1L, "image", big, "src", 400, 100, Option.empty[Long]),
      (2L, "image", small, "src", 50, 40, Option.empty[Long]),
      (3L, "audio", Array[Byte](1, 2, 3), "src", 0, 0, Option.empty[Long]))
      .toDF("asset_id", "media_type", "payload", "source", "width",
        "height", "duration_ms")
    val resized = Multimodal.resizeAssets(assets, maxSide = 200)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(resized(1L).getInt(4) == 200 && resized(1L).getInt(5) == 50)
    // re-decode the resized payload: its REAL pixels are 200x50 and keep
    // the fill colour (bilinear over a solid image is exact)
    val (rw, rh, rf) = Multimodal.ImageIoCodec.decode(
      "image", resized(1L).getAs[Array[Byte]](2))
    assert((rw, rh) == ((200, 50)))
    assert(math.round(rf(0) * 255) == 10 && math.round(rf(1) * 255) == 200)
    // already-small image passes through byte-identical
    assert(resized(2L).getAs[Array[Byte]](2).toSeq == small.toSeq)
    // non-image passes through untouched
    assert(resized(3L).getAs[Array[Byte]](2).toSeq == Seq[Byte](1, 2, 3))
  }

  test("decodeAssets with the real codec runs distributed over synthetic PNGs") {
    import spark.implicits._
    val ids = spark.range(0, 64).select(col("id").as("asset_id"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("asset_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("media_type",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.BinaryType, nullable = true)))
    val assets = ids.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        org.apache.spark.sql.Row(id, "image",
          Multimodal.encodeSolidImage((id % 30 + 4).toInt, (id % 20 + 4).toInt,
            (id % 256).toInt, 0, 0))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
    val dec = Multimodal.decodeAssets(assets, Multimodal.ImageIoCodec)
      .select($"asset_id", $"decoded_width", $"decoded_height")
      .as[(Long, Int, Int)].collect()
    assert(dec.length == 64)
    assert(dec.forall { case (id, w, h) =>
      w == (id % 30 + 4).toInt && h == (id % 20 + 4).toInt })
  }

  test("decoded features feed the similarity operators") {
    val decoded = Multimodal.decodeAssets(
      Multimodal.ingestDocumentsAsAssets(docs))
      .select(col("asset_id").as("vec_id"), col("features").as("embedding"))
    val topk = graft.sim.Similarity.cosineTopK(decoded, 0L, 3)
    assert(topk.count() == 3)
  }

  test("encodeAnimatedGif round-trips every frame's colour exactly") {
    val colors = Seq((10, 200, 30), (255, 0, 128), (0, 0, 0), (1, 2, 3))
    val gif = Multimodal.encodeAnimatedGif(9, 5, colors)
    val fs = Multimodal.GifVideoCodec.frames("video", gif)
    assert(fs.size == 4, s"4 stored frames, got ${fs.size}")
    fs.zip(colors).foreach { case ((i, w, h, feat), (r, g, b)) =>
      assert(w == 9 && h == 5, s"frame $i dims ($w,$h)")
      assert(math.round(feat(0) * 255) == r &&
        math.round(feat(1) * 255) == g &&
        math.round(feat(2) * 255) == b,
        s"frame $i colour ${feat.toSeq} vs ($r,$g,$b)")
    }
    // undecodable / empty payloads: empty sequence, never a throw
    assert(Multimodal.GifVideoCodec.frames("video",
      Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.GifVideoCodec.frames("video", null).isEmpty)
  }

  test("decodeFrames samples every Nth REAL frame distributed") {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val assets = spark.range(0, 20).toDF("id")
      .repartition(4)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val n = 2 + (id % 5).toInt
          val colors = (0 until n).map(i =>
            (((id + 17 * i) % 256).toInt, ((id * 3 + 29 * i) % 256).toInt,
              ((id * 5 + 41 * i) % 256).toInt))
          Row(id, if (id % 7 == 3) "image" else "video",
            Multimodal.encodeAnimatedGif((id % 13 + 3).toInt, 6, colors))
        }
      }(Encoders.row(schema))
    val got = Multimodal.decodeFrames(assets, everyNth = 2)
      .select($"asset_id", $"frame_idx", $"n_frames", $"width", $"height",
        round(element_at($"features", 1) * 255).cast("int").as("r"))
      .as[(Long, Int, Int, Int, Int, Int)].collect()
      .map(t => (t._1, t._2) -> t).toMap
    // non-video assets never decode
    assert(got.keys.forall { case (id, _) => id % 7 != 3 })
    (0L until 20L).filter(_ % 7 != 3).foreach { id =>
      val n = 2 + (id % 5).toInt
      val expectIdx = (0 until n by 2).toSet
      val mine = got.keys.filter(_._1 == id).map(_._2).toSet
      assert(mine == expectIdx, s"asset $id sampled $mine vs $expectIdx")
      expectIdx.foreach { i =>
        val (_, _, nf, w, h, r) = got((id, i))
        assert(nf == n && w == (id % 13 + 3).toInt && h == 6)
        assert(r == ((id + 17 * i) % 256).toInt,
          s"asset $id frame $i decoded red $r")
      }
    }
  }
}
