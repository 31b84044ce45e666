package graft.sources

import graft.SparkSpec
import graft.cdc.{IncrementalAgg, MaintainedAgg}
import graft.table.CowTable
import org.apache.spark.sql.functions._

/** Materialized-view rewrite: a GROUP BY over a registered source table
  * must answer from the maintained state when fresh — and must NOT when
  * the view is stale, the query doesn't match the view's shape, or the
  * scan carries time-travel options.
  */
class MvRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def freshPair(): (CowTable, MaintainedAgg) = {
    val src = new CowTable(spark, tmpDir("mv-src"), keyCols = Seq("id"),
      trackCommitVersions = true)
    val rows = (1 to 200).map(i =>
      (i.toLong, s"g${i % 5}", BigDecimal(i).setScale(2)))
      .toDF("id", "g", "v")
      .select($"id", $"g", $"v".cast("decimal(12,2)").as("v"))
    src.bulkInsert(rows)
    val ma = new MaintainedAgg(spark, tmpDir("mv-view"), src,
      IncrementalAgg.AggSpec(Seq("g"), "v"), minMaxCols = Seq("v"))
    ma.refresh()
    (src, ma)
  }

  private def hits(ma: MaintainedAgg): Long =
    MvRewriteRule.hitLog.getOrElse(ma.table.basePath, 0L)

  test("fresh view rewrites count/sum/min/max and matches recompute") {
    val (src, ma) = freshPair()
    assert(MvRegistry.register(ma))
    try {
      val before = hits(ma)
      val q = spark.read.format("graft").load(src.basePath)
        .groupBy($"g")
        .agg(count(lit(1)).as("cnt"), sum($"v").as("total"),
          min($"v").as("mn"), max($"v").as("mx"))
      val got = q.collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).toString, r.getDecimal(3).toString,
        r.getDecimal(4).toString)).sortBy(_._1)
      assert(hits(ma) == before + 1, "rewrite did not fire")
      // the rewritten plan must not scan the source table's files
      val phys = q.queryExecution.executedPlan.toString
      assert(!phys.contains(src.basePath),
        s"rewritten plan still scans the source:\n$phys")
      val want = src.snapshot().groupBy($"g")
        .agg(count(lit(1)).as("cnt"), sum($"v").as("total"),
          min($"v").as("mn"), max($"v").as("mx"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getDecimal(2).toString, r.getDecimal(3).toString,
          r.getDecimal(4).toString)).sortBy(_._1)
      assert(got.toSeq == want.toSeq)
    } finally MvRegistry.unregister(src.basePath)
  }

  test("stale view does not rewrite; refresh re-enables it") {
    val (src, ma) = freshPair()
    assert(MvRegistry.register(ma))
    try {
      src.upsert(Seq((1000L, "g9", BigDecimal(7).setScale(2)))
        .toDF("id", "g", "v")
        .select($"id", $"g", $"v".cast("decimal(12,2)").as("v")))
      val before = hits(ma)
      val q = spark.read.format("graft").load(src.basePath)
        .groupBy($"g").agg(count(lit(1)).as("cnt"))
      val rows = q.collect()
      assert(hits(ma) == before, "stale view must not rewrite")
      assert(rows.map(_.getLong(1)).sum == 201L) // fresh truth, from source
      ma.refresh()
      spark.read.format("graft").load(src.basePath)
        .groupBy($"g").agg(count(lit(1)).as("cnt")).collect()
      assert(hits(ma) == before + 1, "refreshed view must rewrite again")
    } finally MvRegistry.unregister(src.basePath)
  }

  test("non-matching shapes and time travel fall through to the source") {
    val (src, ma) = freshPair()
    assert(MvRegistry.register(ma))
    try {
      val before = hits(ma)
      val p = src.basePath
      // filtered aggregate: not the view's state
      spark.read.format("graft").load(p).filter($"id" <= 10)
        .groupBy($"g").agg(count(lit(1))).collect()
      // different grouping
      spark.read.format("graft").load(p)
        .groupBy($"g", $"id").agg(sum($"v")).collect()
      // avg is not rewritable (only count/sum/min/max fold exactly)
      val avgRows = spark.read.format("graft").load(p)
        .groupBy($"g").agg(avg($"v").as("a")).collect()
      assert(avgRows.length == 5)
      // count(col) counts non-nulls — not the stored cnt
      spark.read.format("graft").load(p)
        .groupBy($"g").agg(count($"v")).collect()
      // time travel to a version BEHIND the head reads pinned data
      // (head moves to v2; the view refresh keeps the rewrite armed
      // for head reads, but the v1 scan must not use it)
      src.upsert(Seq((2000L, "g0", BigDecimal(5).setScale(2)))
        .toDF("id", "g", "v")
        .select($"id", $"g", $"v".cast("decimal(12,2)").as("v")))
      ma.refresh()
      val v1 = spark.read.format("graft").option("versionAsOf", 1).load(p)
        .groupBy($"g").agg(count(lit(1)).as("c")).collect()
      assert(v1.map(_.getLong(1)).sum == 200L)
      assert(hits(ma) == before,
        "none of these shapes may answer from the view")
      // sanity: the exact view shape still rewrites
      spark.read.format("graft").load(p)
        .groupBy($"g").agg(sum($"v")).collect()
      assert(hits(ma) == before + 1)
    } finally MvRegistry.unregister(src.basePath)
  }

  test("roll-up rewrite: subset and global groupings fold the state") {
    val src = new CowTable(spark, tmpDir("mv-src2"), keyCols = Seq("id"),
      trackCommitVersions = true)
    val rows = (1 to 300).map(i => (i.toLong, s"a${i % 5}", s"b${i % 3}",
      BigDecimal(i).setScale(2))).toDF("id", "g1", "g2", "v")
      .select($"id", $"g1", $"g2", $"v".cast("decimal(12,2)").as("v"))
    src.bulkInsert(rows)
    val ma = new MaintainedAgg(spark, tmpDir("mv-view2"), src,
      IncrementalAgg.AggSpec(Seq("g1", "g2"), "v"),
      minMaxCols = Seq("v"))
    ma.refresh()
    assert(MvRegistry.register(ma))
    try {
      def hits = MvRewriteRule.hitLog.getOrElse(ma.table.basePath, 0L)
      val before = hits
      // coarser grouping: g1 only
      val q = spark.read.format("graft").load(src.basePath)
        .groupBy($"g1")
        .agg(count(lit(1)).as("cnt"), sum($"v").as("total"),
          min($"v").as("mn"), max($"v").as("mx"))
      val got = q.collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).toString, r.getDecimal(3).toString,
        r.getDecimal(4).toString)).sortBy(_._1)
      assert(hits == before + 1, "roll-up rewrite did not fire")
      assert(!q.queryExecution.executedPlan.toString
        .contains(src.basePath))
      val want = src.snapshot().groupBy($"g1")
        .agg(count(lit(1)).as("cnt"), sum($"v").as("total"),
          min($"v").as("mn"), max($"v").as("mx"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getDecimal(2).toString, r.getDecimal(3).toString,
          r.getDecimal(4).toString)).sortBy(_._1)
      assert(got.toSeq == want.toSeq)
      // global aggregate: the empty subset
      val g = spark.read.format("graft").load(src.basePath)
        .agg(count(lit(1)).as("cnt"), sum($"v").as("total"))
      val row = g.collect().head
      assert(hits == before + 2, "global rewrite did not fire")
      assert(row.getLong(0) == 300L)
      assert(row.getDecimal(1).toString ==
        src.snapshot().agg(sum($"v")).head.getDecimal(0).toString)
      // grouping by a non-view column is NOT a subset: falls through
      spark.read.format("graft").load(src.basePath)
        .groupBy($"g1", $"id").agg(count(lit(1))).collect()
      assert(hits == before + 2)
    } finally MvRegistry.unregister(src.basePath)
  }

  test("SQL text over a catalog table rewrites too") {
    val (src, ma) = freshPair()
    assert(MvRegistry.register(ma))
    try {
      val wh = new java.io.File(src.basePath).getParent
      spark.conf.set("spark.sql.catalog.mvcat", classOf[GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.mvcat.warehouse", wh)
      val name = new java.io.File(src.basePath).getName
      val before = hits(ma)
      val rows = spark.sql(
        s"SELECT g, count(*) AS cnt, sum(v) AS total FROM mvcat.`$name` " +
          "GROUP BY g").collect()
      assert(rows.length == 5)
      assert(hits(ma) == before + 1,
        "the SQL path must rewrite like the DataFrame path")
    } finally MvRegistry.unregister(src.basePath)
  }

  test("registerPath re-arms a view from its durable sidecar") {
    val (src, ma) = freshPair()
    // simulate a NEW session: no in-memory registration at all
    MvRegistry.unregister(src.basePath)
    try {
      assert(MvRegistry.registerPath(spark, ma.table.basePath))
      val before = hits(ma)
      spark.read.format("graft").load(src.basePath)
        .groupBy($"g").agg(count(lit(1))).collect()
      assert(hits(ma) == before + 1, "sidecar registration must rewrite")
      // absent sidecar refuses
      assert(!MvRegistry.registerPath(spark, tmpDir("mv-nothing")))
    } finally MvRegistry.unregister(src.basePath)
  }

  test("filtered views refuse registration") {
    val src = new CowTable(spark, tmpDir("mv-srcf"), keyCols = Seq("id"),
      trackCommitVersions = true)
    src.bulkInsert(Seq((1L, "a", BigDecimal(1).setScale(2)))
      .toDF("id", "g", "v")
      .select($"id", $"g", $"v".cast("decimal(12,2)").as("v")))
    val ma = new MaintainedAgg(spark, tmpDir("mv-viewf"), src,
      IncrementalAgg.AggSpec(Seq("g"), "v"),
      rowFilter = Some($"id" > 0))
    ma.refresh()
    assert(!MvRegistry.register(ma))
  }
}
