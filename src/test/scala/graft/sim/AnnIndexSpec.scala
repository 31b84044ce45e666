package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persistent IVF-PQ index ([[AnnIndex]]): incremental ingest equals the
  * full build, search equals the per-run [[Similarity.ivfPqSearch]],
  * re-ingest is idempotent, updates move cells, deletes drop rows.
  */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val embs = spark.read.parquet(s"$sf/embeddings.parquet")

  private def codesOf(ix: AnnIndex, path: String): Map[Long, (Long, Long)] =
    graft.table.CowTable.open(spark, s"$path/codes").snapshot()
      .select("vec_id", "centroid_id", "code")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  private def searchRows(df: DataFrame): Seq[(Long, Double, Double)] =
    df.select("vec_id", "adist", "sim")
      .as[(Long, Double, Double)].collect().toSeq

  test("two-batch ingest equals the full build; search equals ivfPqSearch") {
    val pFull = tmpDir("ann-full"); val pInc = tmpDir("ann-inc")
    val full = new AnnIndex(spark, pFull, 8, 8, 16, 16)
    full.build(embs)
    // same codebooks (trained on vec_id < 16, present in batch 1),
    // corpus ingested in two halves
    val inc = new AnnIndex(spark, pInc, 8, 8, 16, 16)
    inc.build(embs.filter($"vec_id" < 100))
    inc.ingest(embs.filter($"vec_id" >= 100))
    assert(codesOf(full, pFull) == codesOf(inc, pInc),
      "same codebooks, split ingest => identical codes")

    val a = searchRows(full.search(embs, 0L, 4, 50, 10))
    val coarse = Similarity.firstKCodebook(embs, 16)
    val pqc = Similarity.pqCodebook(embs, 8, 8, 16)
    val index = Similarity.ivfPqIndex(embs, coarse, pqc, 8, 8, 16)
    val b = searchRows(Similarity.ivfPqSearch(embs, index, 0L, coarse, pqc,
      8, 8, 16, nProbe = 4, shortlist = 50, topK = 10))
    assert(a == b, s"stored-index search must equal the per-run search:\n" +
      s" got  $a\n want $b")
  }

  test("re-ingest is idempotent; update moves cell; delete drops") {
    val p = tmpDir("ann-churn")
    val ix = new AnnIndex(spark, p, 8, 8, 16, 16)
    ix.build(embs)
    val before = codesOf(ix, p)
    ix.ingest(embs.filter($"vec_id".between(20, 40)))
    assert(codesOf(ix, p) == before, "re-ingest must be a no-op")
    // update: give vec 99 the exact embedding of centroid vector 3 — it
    // must re-encode to cell 3 with centroid 3's own repeated code
    val moved = embs.filter($"vec_id" === 3L)
      .select(lit(99L).as("vec_id"), col("embedding"))
    ix.ingest(moved)
    val after = codesOf(ix, p)
    assert(after(99L) == after(3L), s"updated vector must move cells: " +
      s"${after(99L)} vs ${after(3L)}")
    assert((after - 99L) == (before - 99L), "only the updated key changed")
    ix.delete(Seq(99L).toDF("vec_id"))
    assert(!codesOf(ix, p).contains(99L), "deleted key must drop")
    // deleted vectors never surface in search results
    val got = searchRows(ix.search(embs, 0L, 16, 200, 50)).map(_._1)
    assert(!got.contains(99L))
  }

  test("searchBatch equals per-query search for every query in the batch") {
    val p = tmpDir("ann-batch")
    val ix = new AnnIndex(spark, p, 8, 8, 16, 16)
    ix.build(embs)
    val qids = Seq(0L, 7L, 42L)
    val batch = ix.searchBatch(embs, qids, nProbe = 4, shortlist = 50,
      topK = 10)
      .select("q_id", "vec_id", "adist", "sim")
      .as[(Long, Long, Double, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3, r._4))
        .sortBy(t => (-t._3, t._1)).toSeq).toMap
    qids.foreach { q =>
      val single = searchRows(ix.search(embs, q, 4, 50, 10))
      assert(batch(q) == single, s"query $q: batch != single")
    }
    assert(batch.keySet == qids.toSet)
  }

  test("nearDupCheck flags arriving duplicates of indexed vectors") {
    val p = tmpDir("ann-neardup")
    val ix = new AnnIndex(spark, p, 8, 8, 16, 16)
    val indexed = embs.filter($"vec_id" < 250)
    ix.build(indexed)
    // arriving batch: fresh vectors 250+ plus two exact copies of
    // indexed vectors 5 and 17
    val copies = Seq(5L -> 900L, 17L -> 901L).map { case (src, nid) =>
      embs.filter($"vec_id" === src)
        .select(lit(nid).as("vec_id"), $"embedding")
    }.reduce(_ unionByName _)
    val batch = embs.filter($"vec_id" >= 250)
      .select("vec_id", "embedding").unionByName(copies)
    val got = ix.nearDupCheck(batch, indexed.select("vec_id", "embedding"),
      threshold = 0.9999, nProbe = 16, shortlist = 50)
      .as[(Long, Boolean, Option[Long], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got.keySet == batch.select("vec_id").as[Long].collect().toSet)
    assert(!got(900L)._2 && got(900L)._3.contains(5L), s"${got(900L)}")
    assert(!got(901L)._2 && got(901L)._3.contains(17L), s"${got(901L)}")
    assert(got(900L)._4.contains(1.0))
    // at this threshold nothing else in the synthetic corpus collides
    assert(got.valuesIterator.count(!_._2) == 2,
      got.valuesIterator.filter(!_._2).mkString(", "))
    // check -> ingest loop: after ingesting, re-delivery of the same
    // ids never matches itself, and a fresh copy of 900 now dups to it
    ix.ingest(batch)
    val again = ix.nearDupCheck(
      embs.filter($"vec_id" === 5L)
        .select(lit(902L).as("vec_id"), $"embedding"),
      indexed.select("vec_id", "embedding")
        .unionByName(batch), 0.9999, 16, 50)
      .as[(Long, Boolean, Option[Long], Option[Double])].collect()
    assert(again.length == 1 && !again(0)._2 && again(0)._3.contains(5L),
      again.mkString(", "))
  }

  test("streaming ingest: table-as-stream micro-batches equal the full build") {
    // embeddings land in a graft lake table commit by commit; a stream
    // over the table encodes each micro-batch into the persisted index —
    // the streaming twin of the two-batch ingest spec
    import org.apache.spark.sql.streaming.Trigger
    val lakePath = tmpDir("ann-stream-lake")
    val lake = new graft.table.CowTable(spark, lakePath,
      keyCols = Seq("vec_id"), trackCommitVersions = true)
    lake.bulkInsert(embs.filter($"vec_id" < 100)
      .select("vec_id", "embedding"))
    lake.upsert(embs.filter($"vec_id" >= 100)
      .select("vec_id", "embedding"))

    // the first micro-batch builds (codebooks train on it — it holds
    // vec_id < 16, the deterministic first-k set, so they equal the
    // full-corpus codebooks); later batches ingest against the frozen
    // codebooks
    val pInc = tmpDir("ann-stream-idx")
    val inc = new AnnIndex(spark, pInc, 8, 8, 16, 16)
    val pFull = tmpDir("ann-stream-full")
    var batches = 0
    val q = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "1")
      .load(lakePath)
      .writeStream
      .option("checkpointLocation", tmpDir("ann-stream-ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        batches += 1
        val batch = b.select("vec_id", "embedding")
        if (!inc.exists) inc.build(batch) else inc.ingest(batch)
        ()
      }
      .start()
    q.awaitTermination()
    assert(batches == 2, s"one micro-batch per commit, got $batches")
    val full = new AnnIndex(spark, pFull, 8, 8, 16, 16)
    full.build(embs)
    assert(codesOf(inc, pInc) == codesOf(full, pFull),
      "stream-built index must equal the one-shot build")
  }

  test("rebuild over an existing index drops stale codes") {
    val p = tmpDir("ann-rebuild"); val pRef = tmpDir("ann-rebuild-ref")
    val ix = new AnnIndex(spark, p, 8, 8, 16, 16)
    ix.build(embs)
    // retrain on a SHRUNK corpus with TRAINED codebooks: the books
    // differ from the original first-k ones AND vec_ids >= 150 must
    // vanish — any upsert-style rebuild would leave both kinds of
    // stale rows behind
    val shrunk = embs.filter($"vec_id" < 150)
    ix.build(shrunk, trained = true, kmeansIters = 2)
    val fresh = new AnnIndex(spark, pRef, 8, 8, 16, 16)
    fresh.build(shrunk, trained = true, kmeansIters = 2)
    assert(codesOf(ix, p) == codesOf(fresh, pRef),
      "rebuilt index must equal a fresh build on the new corpus — no " +
        "rows encoded against the replaced codebooks may survive")
    assert(searchRows(ix.search(shrunk, 60L, 4, 50, 10)) ==
      searchRows(fresh.search(shrunk, 60L, 4, 50, 10)))
  }

  test("maintain re-stripes by cell and preserves the index exactly") {
    val p = tmpDir("ann-maint")
    val ix = new AnnIndex(spark, p, 8, 8, 16, 16)
    ix.build(embs.filter($"vec_id" < 200))
    ix.ingest(embs.filter($"vec_id" >= 200))
    val before = codesOf(ix, p)
    val a = searchRows(ix.search(embs, 0L, 4, 50, 10))
    ix.maintain(parallelism = 4)
    assert(codesOf(ix, p) == before, "maintain must not change content")
    assert(searchRows(ix.search(embs, 0L, 4, 50, 10)) == a)
  }
}
