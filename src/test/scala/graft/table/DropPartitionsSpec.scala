package graft.table

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Partition lifecycle: metadata-only drops (`dropPartitions` /
  * `expirePartitions`), their change-feed "D" synthesis on COW and MOR,
  * retention interplay, and time travel across a drop.
  */
class DropPartitionsSpec extends SparkSpec {
  import spark.implicits._

  private def dataDirs(base: String): Set[String] = {
    val d = new java.io.File(base, "files")
    if (!d.exists()) Set.empty
    else d.listFiles().map(_.getName).toSet
  }

  test("COW: dropPartitions is metadata-only and prunes the snapshot") {
    val path = tmpDir("dp-cow")
    val t = new CowTable(spark, path, keyCols = Seq("id"),
      partitionCols = Seq("p"), trackCommitVersions = true)
    t.bulkInsert((1 to 12).map(i => (s"k$i", s"p${i % 3}", i.toDouble))
      .toDF("id", "p", "v"))
    val dirsBefore = dataDirs(path)

    assert(t.dropPartitions(col("p") === "p1") == 1)
    // no data was read or written: the files/ dir gained nothing
    assert(dataDirs(path) == dirsBefore)
    val m = t.manifest
    assert(m.operation == "drop_partitions")
    assert(m.metrics("units_dropped") == 1L)
    assert(!m.partitions.contains("p=p1"))
    assert(m.drops.contains(m.version.toString))
    assert(t.snapshot().select("p").distinct().as[String].collect().toSet
      == Set("p0", "p2"))
    // dropping nothing is a no-op commit-wise
    val v = m.version
    assert(t.dropPartitions(col("p") === "nope") == 0)
    assert(t.manifest.version == v)
    // time travel before the drop still sees the partition
    assert(t.snapshotAt(1L).filter($"p" === "p1").count() == 4L)
  }

  test("COW: change feed surfaces dropped rows as D at the drop version") {
    val t = new CowTable(spark, tmpDir("dp-feed"), keyCols = Seq("id"),
      partitionCols = Seq("p"), trackCommitVersions = true)
    t.bulkInsert(Seq(("k1", "a", 1.0), ("k2", "a", 2.0), ("k3", "b", 3.0))
      .toDF("id", "p", "v"))                       // v1
    assert(t.dropPartitions(col("p") === "a") == 1) // v2
    def feed(s: Long, e: Long) = t.changeFeed(s, e)
      .select($"id", col(CowTable.ChangeTypeCol).as("op"),
        col(CowTable.CommitVerCol).as("ver"))
      .as[(String, String, Long)].collect().toSet
    assert(feed(1L, 2L) == Set(("k1", "D", 2L), ("k2", "D", 2L)))
    // full-window feed: survivor is U, dropped keys are D
    assert(feed(0L, 2L).map(r => (r._1, r._2)) ==
      Set(("k1", "D"), ("k2", "D"), ("k3", "U")))
    // a re-insert into the dropped partition AFTER the drop supersedes
    // the D inside a window spanning both
    t.upsert(Seq(("k1", "a", 10.0)).toDF("id", "p", "v")) // v3
    assert(feed(1L, 3L).map(r => (r._1, r._2)) ==
      Set(("k1", "U"), ("k2", "D")))
    // the drop-only window is still replayable as it was
    assert(feed(1L, 2L) == Set(("k1", "D", 2L), ("k2", "D", 2L)))
  }

  test("COW: preimages ride the drop window") {
    val t = new CowTable(spark, tmpDir("dp-pre"), keyCols = Seq("id"),
      partitionCols = Seq("p"), trackCommitVersions = true)
    t.bulkInsert(Seq(("k1", "a", 1.0), ("k2", "b", 2.0)).toDF("id", "p", "v"))
    t.dropPartitions(col("p") === "a")
    val f = t.changeFeedWithPreimages(1L, 2L)
      .select($"id", col(CowTable.ChangeTypeCol).as("op"), $"v")
      .as[(String, String, Option[Double])].collect().toSet
    assert(f == Set(("k1", "D", None), ("k1", "B", Some(1.0))))
  }

  test("MOR: drop folds pending logs — log-dead keys stay dead") {
    val t = new MorTable(spark, tmpDir("dp-mor"), keyCols = Seq("id"),
      partitionCols = Seq("p"), compactEvery = 0)
    t.bulkInsert(Seq(("k1", "a", 1.0), ("k2", "a", 2.0), ("k3", "b", 3.0))
      .toDF("id", "p", "v"))                         // v1
    t.delete(Seq(("k1", "a", 0.0)).toDF("id", "p", "v"))  // v2: log D
    t.upsert(Seq(("k9", "a", 9.0)).toDF("id", "p", "v"))  // v3: log-only key
    assert(t.dropPartitions(col("p") === "a") == 1)       // v4
    val f = t.changeFeed(3L, 4L)
      .select($"id", col(CowTable.ChangeTypeCol).as("op"))
      .as[(String, String)].collect().toSet
    // k2 (base, live) and k9 (log-only, live) die at the drop; k1 was
    // already dead and must NOT resurface
    assert(f == Set(("k2", "D"), ("k9", "D")))
    assert(t.snapshot().select("p").distinct().as[String].collect().toSet
      == Set("b"))
  }

  test("expirePartitions drops below the cutoff; nulls survive") {
    val t = new CowTable(spark, tmpDir("dp-ttl"), keyCols = Seq("id"),
      partitionCols = Seq("day"))
    t.bulkInsert(Seq(
      ("k1", java.sql.Date.valueOf("2026-01-01"), 1.0),
      ("k2", java.sql.Date.valueOf("2026-02-01"), 2.0),
      ("k3", java.sql.Date.valueOf("2026-03-01"), 3.0),
      ("k4", null.asInstanceOf[java.sql.Date], 4.0)).toDF("id", "day", "v"))
    assert(t.expirePartitions("day",
      java.sql.Date.valueOf("2026-02-15")) == 2)
    val left = t.snapshot().select($"day".cast("string"))
      .as[Option[String]].collect().toSet
    assert(left == Set(Some("2026-03-01"), None),
      "null partition value never satisfies a < cutoff")
  }

  test("cleaner keeps dropped files while the record is in the window") {
    val path = tmpDir("dp-clean")
    val t = new CowTable(spark, path, keyCols = Seq("id"),
      partitionCols = Seq("p"), keepCommits = 3,
      trackCommitVersions = true)
    t.bulkInsert(Seq(("k1", "a", 1.0), ("k2", "b", 2.0)).toDF("id", "p", "v"))
    t.dropPartitions(col("p") === "a")               // v2
    val droppedDir = t.manifest.drops("2").files.head.split('/')(1)
    assert(dataDirs(path).contains(droppedDir))
    // stay inside the window: the feed still answers from the dropped file
    t.upsert(Seq(("k2", "b", 20.0)).toDF("id", "p", "v")) // v3
    assert(dataDirs(path).contains(droppedDir))
    assert(t.changeFeed(1L, 2L).count() == 1L)
    // age the record out (keepCommits=3): once NO retained manifest
    // carries the entry (the last one to do so is v4, gone after v7),
    // the files are reclaimed
    t.upsert(Seq(("k2", "b", 21.0)).toDF("id", "p", "v")) // v4
    t.upsert(Seq(("k2", "b", 22.0)).toDF("id", "p", "v")) // v5
    t.upsert(Seq(("k2", "b", 23.0)).toDF("id", "p", "v")) // v6
    t.upsert(Seq(("k2", "b", 24.0)).toDF("id", "p", "v")) // v7
    assert(t.manifest.drops.isEmpty)
    assert(!dataDirs(path).contains(droppedDir),
      "aged-out drop record no longer anchors its files")
  }

  test("drop round-trips through the manifest (open by path)") {
    val path = tmpDir("dp-open")
    val t = new CowTable(spark, path, keyCols = Seq("id"),
      partitionCols = Seq("p"), trackCommitVersions = true)
    t.bulkInsert(Seq(("k1", "a", 1.0), ("k2", "b", 2.0)).toDF("id", "p", "v"))
    t.dropPartitions(col("p") === "a")
    val re = CowTable.open(spark, path)
    assert(re.manifest.drops.keySet == Set("2"))
    val f = re.changeFeed(1L, 2L)
      .select($"id", col(CowTable.ChangeTypeCol).as("op"))
      .as[(String, String)].collect().toSet
    assert(f == Set(("k1", "D")))
  }
}
