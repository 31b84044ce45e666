package graft.streaming

import graft.SparkSpec
import graft.table.{CowTable, MorTable}

/** Exactly-once semantics of the streaming upsert sink. */
class GraftSinkSpec extends SparkSpec {
  import spark.implicits._

  test("streaming upsert sink is exactly-once under batch replay") {
    val src = tmpDir("sink-src")
    val path = tmpDir("sink-table")
    Seq((1L, 1.0), (2L, 2.0)).toDF("user_id", "v")
      .write.mode("append").parquet(src)
    val open = () => new CowTable(spark, path, keyCols = Seq("user_id"))
    val sink = new GraftSink(open)
    val schema = spark.read.parquet(src).schema
    sink.start(spark.readStream.schema(schema).parquet(src),
      tmpDir("sink-ckpt")).awaitTermination()
    val t = open()
    assert(t.snapshot().as[(Long, Double)].collect().toMap ==
      Map(1L -> 1.0, 2L -> 2.0))
    assert(t.manifest.metrics(GraftSink.BatchIdKey) == 0L)

    // foreachBatch redelivery: the SAME batchId must be skipped
    val replayed = spark.read.parquet(src)
    assert(!sink.applyBatch(replayed, 0L), "replayed batch must be skipped")
    assert(open().manifest.version == t.manifest.version, "no new commit")

    // the next batch id applies as a keyed upsert
    assert(sink.applyBatch(
      Seq((2L, 20.0), (3L, 3.0)).toDF("user_id", "v"), 1L))
    assert(open().snapshot().as[(Long, Double)].collect().toMap ==
      Map(1L -> 1.0, 2L -> 20.0, 3L -> 3.0))

    // a service commit AFTER the batch must not reset the high-water mark
    open().recluster(Seq("user_id"))
    assert(!sink.applyBatch(replayed, 1L),
      "mark must survive interleaved service commits")
  }

  test("replay mark survives past the retention window") {
    // keepCommits=2 with MOR inline compaction: each batch can burn
    // several timeline slots (log append + compaction + clean), so the
    // batch's OWN commit ages out almost immediately. The carry-forward
    // in writeManifest must keep the high-water mark in the head manifest
    // forever — a delayed replay of batch 0 must still be rejected.
    val path = tmpDir("sink-retention")
    val open = () => {
      if (CowTable.existsAt(spark, path)) CowTable.open(spark, path)
      else new MorTable(spark, path, keyCols = Seq("user_id"),
        keepCommits = 2, compactEvery = 2)
    }
    val sink = new GraftSink(open)
    assert(sink.applyBatch(Seq((1L, 1.0)).toDF("user_id", "v"), 0L))
    for (b <- 1L to 4L)
      assert(sink.applyBatch(Seq((1L, b.toDouble)).toDF("user_id", "v"), b))
    // service commits after the last batch push the timeline further
    val t = open()
    t.recluster(Seq("user_id"))
    // batch-0's commit is long gone from the retained timeline...
    val retained = (1L to t.manifest.version).flatMap(v =>
      scala.util.Try(t.manifestAt(v)).toOption)
    assert(retained.size <= 3, s"retention must have trimmed: ${retained.size}")
    // ...but the head still carries the mark, so replays stay rejected
    assert(t.manifest.metrics(GraftSink.BatchIdKey) == 4L,
      s"head must carry the high-water mark: ${t.manifest.metrics}")
    assert(!sink.applyBatch(Seq((1L, 99.0)).toDF("user_id", "v"), 0L))
    assert(!sink.applyBatch(Seq((1L, 99.0)).toDF("user_id", "v"), 4L))
    assert(open().snapshot().select("user_id", "v").as[(Long, Double)]
      .collect().toMap == Map(1L -> 4.0))
  }

  test("sink into a MOR table stays log-append per batch") {
    val path = tmpDir("sink-mor")
    val open = () => {
      if (CowTable.existsAt(spark, path))
        CowTable.open(spark, path)
      else new MorTable(spark, path, keyCols = Seq("user_id"))
    }
    val sink = new GraftSink(open)
    assert(sink.applyBatch(Seq((1L, 1.0)).toDF("user_id", "v"), 0L))
    assert(sink.applyBatch(Seq((1L, 10.0)).toDF("user_id", "v"), 1L))
    val t = open().asInstanceOf[MorTable]
    assert(t.manifest.deltaCommits == 1, "batch 2 must be a log append")
    assert(t.realtime().select("user_id", "v").as[(Long, Double)]
      .collect().toMap == Map(1L -> 10.0))
    assert(!sink.applyBatch(Seq((1L, 99.0)).toDF("user_id", "v"), 1L))
  }
}
