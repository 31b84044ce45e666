package graft.table

import graft.SparkSpec
import graft.streaming.GraftSink
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Change feed (CDF analog): U/D typed rows over a commit window, across
  * COW deletes, conditional merges, MOR delete logs and compaction, and
  * chained table-to-table streaming with deletes applied.
  */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def feed(t: CowTable, s: Long, e: Long) =
    t.changeFeed(s, e)
      .select(col("id"), col("v"), col(CowTable.ChangeTypeCol).as("op"))
      .as[(String, Option[Double], String)].collect()
      .map { case (k, v, op) => (k, op, v) }.toSet

  test("COW: deletes surface as D rows; re-inserts supersede them") {
    val t = new CowTable(spark, tmpDir("cf-cow"), keyCols = Seq("id"),
      precombineField = "v", trackCommitVersions = true)
    t.bulkInsert(Seq(("k1", 1.0), ("k2", 2.0), ("k3", 3.0)).toDF("id", "v"))
    t.upsert(Seq(("k2", 20.0)).toDF("id", "v"))    // v2
    t.delete(Seq(("k3", 0.0)).toDF("id", "v"))     // v3
    val head = t.manifest.version
    assert(head == 3L)

    // full-window feed: final images + the delete
    assert(feed(t, 0L, head) == Set(
      ("k1", "U", Some(1.0)), ("k2", "U", Some(20.0)), ("k3", "D", None)))
    // delete-only window
    assert(feed(t, 2L, 3L) == Set(("k3", "D", None)))
    // a re-insert in the window supersedes the D
    t.upsert(Seq(("k3", 33.0)).toDF("id", "v"))    // v4
    assert(feed(t, 2L, 4L) == Set(("k3", "U", Some(33.0))))
    // the old window still reports the delete (replayable)
    assert(feed(t, 2L, 3L) == Set(("k3", "D", None)))
  }

  test("conditional mergeInto deletes are tombstoned too") {
    val t = new CowTable(spark, tmpDir("cf-merge"), keyCols = Seq("id"),
      trackCommitVersions = true)
    t.bulkInsert(Seq(("k1", 1.0), ("k2", 2.0)).toDF("id", "v"))
    t.mergeInto(
      Seq(("k1", -1.0, "D"), ("k2", 22.0, "U"), ("k9", 9.0, "U"))
        .toDF("id", "v", "op"),
      whenMatchedDelete = col("i.op") === "D",
      insertCondition = col("i.op") =!= "D",
      conditionCols = Seq("op"))
    assert(feed(t, 1L, 2L) == Set(
      ("k1", "D", None), ("k2", "U", Some(22.0)), ("k9", "U", Some(9.0))))
  }

  test("MOR: delete logs and compaction both surface D") {
    val t = new MorTable(spark, tmpDir("cf-mor"), keyCols = Seq("id"),
      compactEvery = 0)
    t.bulkInsert(Seq(("k1", 1.0), ("k2", 2.0)).toDF("id", "v"))
    t.upsert(Seq(("k1", 10.0)).toDF("id", "v"))    // v2 log
    t.delete(Seq(("k2", 0.0)).toDF("id", "v"))     // v3 log tombstone
    assert(feed(t, 1L, 3L) == Set(
      ("k1", "U", Some(10.0)), ("k2", "D", None)))
    // compaction folds the logs; the same window must still answer
    assert(t.compactLogs())
    val head = t.manifest.version // v4
    assert(feed(t, 1L, head) == Set(
      ("k1", "U", Some(10.0)), ("k2", "D", None)),
      "a feed spanning the compaction keeps the delete")
  }

  test("chained tables stay equal THROUGH deletes (streaming feed)") {
    val pathA = tmpDir("cf-a"); val pathB = tmpDir("cf-b")
    val ckpt = tmpDir("cf-ckpt")
    val a = new CowTable(spark, pathA, keyCols = Seq("id"),
      partitionCols = Seq("p"), precombineField = "v",
      trackCommitVersions = true)
    a.bulkInsert((1 to 10).map(i => (s"k$i", s"p${i % 2}", i.toDouble))
      .toDF("id", "p", "v"))
    a.upsert(Seq(("k1", "p1", 100.0), ("k11", "p1", 11.0))
      .toDF("id", "p", "v"))
    a.delete(Seq(("k4", "p0", 0.0), ("k5", "p1", 0.0)).toDF("id", "p", "v"))

    val openB = () => {
      if (CowTable.existsAt(spark, pathB)) CowTable.open(spark, pathB)
      else new CowTable(spark, pathB, keyCols = Seq("id"),
        partitionCols = Seq("p"), precombineField = "v")
    }
    val sink = new GraftSink(openB)
    def drain(): Unit = sink.start(
      spark.readStream.format("graft")
        .option("includeChangeType", "true").load(pathA),
      ckpt, Trigger.AvailableNow()).awaitTermination()
    def snap(t: CowTable) = t.snapshot().select("id", "v")
      .as[(String, Double)].collect().toMap

    drain()
    assert(snap(openB()) == snap(a), "deletes must chain through")
    assert(!snap(openB()).contains("k4") && snap(openB()).size == 9)

    // restart leg: late deletes and updates still converge
    a.delete(Seq(("k1", "p1", 0.0)).toDF("id", "p", "v"))
    a.upsert(Seq(("k2", "p0", 222.0)).toDF("id", "p", "v"))
    drain()
    assert(snap(openB()) == snap(a),
      "chained table equals source across a restart with deletes")
    assert(!snap(openB()).contains("k1") &&
      snap(openB())("k2") == 222.0)
  }
}
