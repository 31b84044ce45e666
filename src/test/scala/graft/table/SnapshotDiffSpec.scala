package graft.table

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Version-to-version snapshot diff: A/R/C classification, file-pruned
  * reads, service-commit transparency, and the apply-diff replay
  * invariant.
  */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def typed(df: DataFrame): Set[(String, String, Option[Double])] =
    df.select(col(CowTable.ChangeTypeCol), col("id"), col("v"))
      .as[(String, String, Option[Double])].collect()
      .map { case (ct, k, v) => (ct, k, v) }.toSet

  test("upserts/deletes classify as A/R/C; untouched rows never appear") {
    val t = new CowTable(spark, tmpDir("diff-basic"), keyCols = Seq("id"))
    t.bulkInsert(Seq(("k1", 1.0), ("k2", 2.0), ("k3", 3.0), ("k4", 4.0))
      .toDF("id", "v"))                            // v1
    t.upsert(Seq(("k2", 20.0), ("k5", 5.0)).toDF("id", "v")) // v2: C + A
    t.delete(Seq(("k3", 0.0)).toDF("id", "v"))     // v3: R
    val got = typed(t.diff(1L, 3L))
    assert(got == Set(
      ("A", "k5", Some(5.0)),
      ("C", "k2", Some(20.0)),
      ("R", "k3", Some(3.0))),
      s"got $got")
    // zero-width and equal-version windows are empty
    assert(t.diff(3L, 3L).count() == 0)
  }

  test("service-only windows (compact/recluster/clean) diff EMPTY") {
    val t = new CowTable(spark, tmpDir("diff-svc"), keyCols = Seq("id"),
      clusterCols = Seq("id"))
    t.bulkInsert((1 to 200).map(i => (s"k$i", i.toDouble)).toDF("id", "v"))
    t.upsert(Seq(("k7", 77.0)).toDF("id", "v"))
    val before = t.manifest.version
    assert(t.recluster(Seq("id"), parallelism = 4))
    t.compact(maxFilesPerUnit = 1)
    val after = t.manifest.version
    assert(after > before, "service commits must have happened")
    assert(t.diff(before, after).count() == 0,
      "rows carried identically through rewrites must not report")
    // and the cross-window diff still sees only the real change
    assert(typed(t.diff(1L, after)) == Set(("C", "k7", Some(77.0))))
  }

  test("apply-diff replays snapshot(from) into snapshot(to) exactly") {
    val t = new CowTable(spark, tmpDir("diff-replay"), keyCols = Seq("id"),
      partitionCols = Seq("p"))
    def df(rows: Seq[(String, String, Double)]) = rows.toDF("id", "p", "v")
    t.bulkInsert(df(Seq(("a", "x", 1), ("b", "x", 2), ("c", "y", 3),
      ("d", "y", 4))))
    t.upsert(df(Seq(("a", "x", 10), ("e", "y", 5))))
    t.delete(df(Seq(("b", "x", 0))))
    // a partition MOVE is delete+insert under the merge identity
    t.delete(df(Seq(("c", "y", 0))))
    t.upsert(df(Seq(("c", "x", 30))))
    val from = 1L; val to = t.manifest.version
    val d = t.diff(from, to)
    val removedOrChanged = d
      .filter(col(CowTable.ChangeTypeCol).isin("R", "C"))
      .select(col("id"), col("p")).as[(String, String)].collect().toSet
    val addedOrChanged = d
      .filter(col(CowTable.ChangeTypeCol).isin("A", "C"))
      .select("id", "p", "v").as[(String, String, Double)].collect().toSet
    val base = t.snapshotAt(from)
      .select("id", "p", "v").as[(String, String, Double)].collect().toSet
    val replayed = base.filterNot { case (id, p, _) =>
      removedOrChanged.contains((id, p)) } ++ addedOrChanged
    val target = t.snapshotAt(to)
      .select("id", "p", "v").as[(String, String, Double)].collect().toSet
    assert(replayed == target,
      s"replay mismatch: ${replayed -- target} / ${target -- replayed}")
  }

  test("scd2History: validity intervals reconstruct every snapshot") {
    val t = new CowTable(spark, tmpDir("scd2"), keyCols = Seq("id"))
    t.bulkInsert(Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)).toDF("id", "v"))
    t.upsert(Seq(("a", 10.0), ("d", 4.0)).toDF("id", "v"))   // v2
    t.delete(Seq(("b", 0.0)).toDF("id", "v"))                // v3
    t.upsert(Seq(("a", 100.0), ("b", 22.0)).toDF("id", "v")) // v4: re-insert b
    val hist = t.scd2History()
      .select(col("id"), col("v"), col("valid_from"),
        col("valid_to"))
      .as[(String, Double, Long, Option[Long])].collect().toSet
    assert(hist == Set(
      ("a", 1.0, 1L, Some(2L)), ("a", 10.0, 2L, Some(4L)),
      ("a", 100.0, 4L, None),
      ("b", 2.0, 1L, Some(3L)), ("b", 22.0, 4L, None),
      ("c", 3.0, 1L, None),
      ("d", 4.0, 2L, None)), s"got $hist")
    // the interval table reconstructs EVERY retained snapshot
    (1L to 4L).foreach { k =>
      val fromHist = hist.filter { case (_, _, f, to) =>
        f <= k && to.forall(_ > k) }
        .map { case (id, v, _, _) => (id, v) }
      val snap = t.snapshotAt(k).select("id", "v")
        .as[(String, Double)].collect().toSet
      assert(fromHist == snap, s"version $k: $fromHist vs $snap")
    }
  }

  test("scd2History skips service commits and respects fromVersion") {
    val t = new CowTable(spark, tmpDir("scd2-svc"), keyCols = Seq("id"),
      clusterCols = Seq("id"))
    t.bulkInsert((1 to 50).map(i => (s"k$i", i.toDouble)).toDF("id", "v"))
    t.upsert(Seq(("k1", 11.0)).toDF("id", "v"))              // v2
    assert(t.recluster(Seq("id"), parallelism = 2))          // v3 service
    t.upsert(Seq(("k1", 111.0)).toDF("id", "v"))             // v4
    val hist = t.scd2History().filter(col("id") === "k1")
      .select(col("v"), col("valid_from"), col("valid_to"))
      .as[(Double, Long, Option[Long])].collect().toSet
    assert(hist == Set(
      (1.0, 1L, Some(2L)), (11.0, 2L, Some(4L)), (111.0, 4L, None)),
      s"got $hist")
    // a later fromVersion starts intervals at that snapshot
    val tail = t.scd2History(fromVersion = 2L)
      .filter(col("id") === "k1")
      .select(col("v"), col("valid_from"), col("valid_to"))
      .as[(Double, Long, Option[Long])].collect().toSet
    assert(tail == Set((11.0, 2L, Some(4L)), (111.0, 4L, None)),
      s"got $tail")
  }

  test("schema evolution: new column null on removed-row images") {
    val t = new CowTable(spark, tmpDir("diff-evolve"), keyCols = Seq("id"))
    t.bulkInsert(Seq(("k1", 1.0), ("k2", 2.0)).toDF("id", "v"))
    t.upsert(Seq(("k3", 3.0, "fresh")).toDF("id", "v", "note"))
    t.delete(Seq(("k1", 0.0)).toDF("id", "v"))
    val d = t.diff(1L, t.manifest.version)
    val rows = d.select(col(CowTable.ChangeTypeCol), col("id"),
        col("note"))
      .as[(String, String, Option[String])].collect().toSet
    assert(rows == Set(("A", "k3", Some("fresh")), ("R", "k1", None)),
      s"got $rows")
  }
}
