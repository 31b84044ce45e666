package graft.cdc

import graft.SparkSpec
import graft.table.CowTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact maintained COUNT(DISTINCT): the two-level fold must equal a
  * from-scratch `count(DISTINCT v)` after every churn window — value
  * moves, multiplicity drops, NULLs, vanishing groups, filtered aggs.
  */
class MaintainedDistinctSpec extends SparkSpec {
  import spark.implicits._

  private def rows(xs: (String, String, java.lang.Double)*): DataFrame =
    xs.toDF("k", "grp", "v")

  private def state(md: MaintainedDistinct): Map[String, (Long, Long)] =
    md.current.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2)))).toMap

  private def oracle(t: CowTable): Map[String, (Long, Long)] =
    t.snapshot().groupBy("grp")
      .agg(count_distinct(col("v")).as("d"), count(col("v")).as("c"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap

  test("stacked folds equal count(DISTINCT) across churn windows") {
    val src = new CowTable(spark, tmpDir("md-src"), keyCols = Seq("k"),
      precombineField = "v", trackCommitVersions = true)
    src.bulkInsert(rows(("a", "g1", 1.0), ("b", "g1", 1.0),
      ("c", "g1", 2.0), ("d", "g2", 5.0)))
    val md = new MaintainedDistinct(spark, tmpDir("md-st"), src,
      Seq("grp"), "v")
    assert({ md.refresh(); state(md) } == oracle(src))
    assert(state(md) == Map("g1" -> ((2L, 3L)), "g2" -> ((1L, 1L))))

    // multiplicity drop without distinct change: one of the two 1.0s
    // moves to 2.0 (distinct stays 2); then the LAST 1.0 moves (drops)
    src.upsert(rows(("b", "g1", 2.0)))
    assert({ md.refresh(); state(md) } == oracle(src))
    assert(state(md)("g1") == ((2L, 3L)))
    src.upsert(rows(("a", "g1", 2.0)))
    assert({ md.refresh(); state(md) } == oracle(src))
    assert(state(md)("g1") == ((1L, 3L)))

    // new value, cross-group move, delete; multi-commit window
    src.upsert(rows(("e", "g1", 9.0), ("d", "g1", 5.0)))
    src.delete(rows(("c", "g1", 0.0)))
    assert({ md.refresh(); state(md) } == oracle(src))
    assert(!state(md).contains("g2") && state(md)("g1") == ((3L, 4L)))

    // NULL values: excluded from both counts, group kept alive
    src.upsert(rows(("f", "g3", null), ("g", "g3", 7.0)))
    assert({ md.refresh(); state(md) } == oracle(src) + ("g3" -> ((1L, 1L))))
    src.delete(rows(("g", "g3", 0.0)))
    md.refresh()
    // SQL count(distinct) still reports the all-NULL group with 0
    assert(state(md)("g3") == ((0L, 0L)))

    // group fully vanishes
    src.delete(rows(("f", "g3", 0.0)))
    assert({ md.refresh(); state(md) } == oracle(src))
    assert(!state(md).contains("g3"))

    // no-op refresh advances nothing
    val v = md.table.manifest.version
    md.refresh()
    assert(md.table.manifest.version == v)
  }

  test("both levels land in ONE commit per refresh (fused atomicity)") {
    // The fused design's whole point: a refresh folds level-1 support
    // pairs AND level-2 rollups in a single manifest publish — no crash
    // window between levels, no lag mark. Pin it: every non-empty fold
    // advances the state table's version by EXACTLY one, and the two
    // levels inside that one version are mutually consistent (the rollup
    // equals re-deriving it from the stored support pairs).
    val src = new CowTable(spark, tmpDir("mdp-src"), keyCols = Seq("k"),
      precombineField = "v", trackCommitVersions = true)
    src.bulkInsert(rows(("a", "g1", 1.0), ("b", "g2", 2.0)))
    val md = new MaintainedDistinct(spark, tmpDir("mdp-st"), src,
      Seq("grp"), "v")
    md.refresh() // seed: one bulkInsert commit carrying both levels
    assert(md.table.manifest.version == 1L)
    def levelsConsistent(): Unit = {
      val st = md.table.snapshot()
      val fromSupport = st.filter(col("lvl") === 1 && col("v").isNotNull)
        .groupBy("grp")
        .agg(count(lit(1)).as("d"), sum("cnt").as("c"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2)))).toMap
      val rollup = st.filter(col("lvl") === 2)
        .collect().map(r => r.getAs[String]("grp") ->
          ((r.getAs[Long]("cnt"), r.getAs[Long]("vcnt")))).toMap
      assert(rollup == fromSupport, "levels diverged inside one version")
    }
    levelsConsistent()
    // multi-commit churn window → ONE state commit
    src.upsert(rows(("c", "g1", 3.0), ("b", "g2", 9.0)))
    src.upsert(rows(("d", "g3", 4.0), ("a", "g1", 3.0)))
    src.delete(rows(("b", "g2", 0.0)))
    val v0 = md.table.manifest.version
    assert({ md.refresh(); state(md) } == oracle(src))
    assert(md.table.manifest.version == v0 + 1,
      "a fold window must publish exactly one commit")
    levelsConsistent()
    // a second window stays exact and single-commit too
    src.upsert(rows(("e", "g1", 1.0)))
    val v1 = md.table.manifest.version
    assert({ md.refresh(); state(md) } == oracle(src))
    assert(md.table.manifest.version == v1 + 1)
    levelsConsistent()
  }

  test("rowFilter maintains a filtered aggregate exactly") {
    val src = new CowTable(spark, tmpDir("mf-src"), keyCols = Seq("k"),
      precombineField = "v", trackCommitVersions = true)
    src.bulkInsert(rows(("a", "g1", 1.0), ("b", "g1", -2.0),
      ("c", "g2", 3.0)))
    val ma = new MaintainedAgg(spark, tmpDir("mf-st"), src,
      IncrementalAgg.AggSpec(Seq("grp"), "v"),
      rowFilter = Some(col("v") > 0))
    def st: Map[String, (Long, Double)] =
      ma.current.select(col("grp"), col("cnt"),
          col("total").cast("double"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getDouble(2)))).toMap
    ma.refresh()
    assert(st == Map("g1" -> ((1L, 1.0)), "g2" -> ((1L, 3.0))))

    // updates CROSS the filter boundary both ways: b enters (-2 -> 5),
    // a leaves (1 -> -1); c updates within
    src.upsert(rows(("b", "g1", 5.0), ("a", "g1", -1.0),
      ("c", "g2", 4.0)))
    ma.refresh()
    assert(st == Map("g1" -> ((1L, 5.0)), "g2" -> ((1L, 4.0))))

    // delete a passing row; group g2 leaves the filtered state entirely
    src.delete(rows(("c", "g2", 0.0)))
    ma.refresh()
    assert(st == Map("g1" -> ((1L, 5.0))))
    // recompute oracle agrees (filter applied on the seed path too)
    assert(st == ma.recompute(src.snapshot())
      .select(col("grp"), col("cnt"), col("total").cast("double"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap)
  }
}
