package graft.sources

import graft.SparkSpec
import graft.table.CowTable

/** Name-based SQL over the graft catalog: DDL, keyed INSERT, MERGE by
  * name, time travel, DROP — no temp views, no paths in user SQL.
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wh = tmpDir("gcat-wh")
  private def init(): Unit = {
    spark.conf.set("spark.sql.catalog.gcat",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat.warehouse", wh)
  }

  test("CREATE TABLE + INSERT + SELECT, fully by name") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.lake")
    spark.sql("""CREATE TABLE gcat.lake.users (id BIGINT, p STRING,
      v DOUBLE) USING graft PARTITIONED BY (p)
      TBLPROPERTIES ('keyCols'='id', 'precombineField'='v')""")
    assert(spark.sql("SHOW TABLES IN gcat.lake").collect()
      .map(_.getString(1)).contains("users"))
    assert(spark.sql("SELECT * FROM gcat.lake.users").isEmpty)

    spark.sql("INSERT INTO gcat.lake.users VALUES " +
      "(1, 'a', 1.0), (2, 'b', 2.0)")
    // keyed semantics by name: same key upserts, not appends
    spark.sql("INSERT INTO gcat.lake.users VALUES (2, 'b', 20.0)")
    val got = spark.sql("SELECT id, v FROM gcat.lake.users")
      .as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 1.0, 2L -> 20.0), s"INSERT must upsert: $got")

    // the directory is a normal graft table, path API interoperable
    val t = CowTable.open(spark, s"$wh/lake/users")
    assert(t.keyCols == Seq("id") && t.partitionCols == Seq("p"))
    assert(t.manifest.partitions.keySet == Set("p=a", "p=b"))
  }

  test("MERGE INTO by catalog name routes through the table format") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.lake")
    spark.sql("""CREATE TABLE gcat.lake.m (id BIGINT, v DOUBLE)
      USING graft TBLPROPERTIES ('keyCols'='id')""")
    spark.sql("INSERT INTO gcat.lake.m VALUES (1, 1.0), (2, 2.0)")
    Seq((1L, -1.0, "D"), (2L, 22.0, "U"), (3L, 3.0, "U"))
      .toDF("id", "v", "op").createOrReplaceTempView("gcat_src")
    spark.sql("""MERGE INTO gcat.lake.m t USING gcat_src s ON t.id = s.id
      WHEN MATCHED AND s.op = 'D' THEN DELETE
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT *""")
    val got = spark.sql("SELECT id, v FROM gcat.lake.m")
      .as[(Long, Double)].collect().toMap
    assert(got == Map(2L -> 22.0, 3L -> 3.0), s"merge by name: $got")
    spark.sql("UPDATE gcat.lake.m SET v = v + 0.5 WHERE id = 3")
    spark.sql("DELETE FROM gcat.lake.m WHERE id = 2")
    assert(spark.sql("SELECT id, v FROM gcat.lake.m")
      .as[(Long, Double)].collect().toMap == Map(3L -> 3.5))
  }

  test("VERSION AS OF time travel over the commit timeline") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.lake")
    spark.sql("""CREATE TABLE gcat.lake.tt (id BIGINT, v DOUBLE)
      USING graft TBLPROPERTIES ('keyCols'='id')""")
    spark.sql("INSERT INTO gcat.lake.tt VALUES (1, 1.0)") // v2
    spark.sql("INSERT INTO gcat.lake.tt VALUES (1, 2.0)") // v3
    assert(spark.sql("SELECT v FROM gcat.lake.tt VERSION AS OF 2")
      .as[Double].collect().toSeq == Seq(1.0))
    assert(spark.sql("SELECT v FROM gcat.lake.tt VERSION AS OF 3")
      .as[Double].collect().toSeq == Seq(2.0))
    assert(spark.sql("SELECT count(*) FROM gcat.lake.tt VERSION AS OF 1")
      .as[Long].head() == 0L, "v1 is the empty creation commit")
  }

  test("DROP TABLE and table listing") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.lake2")
    spark.sql("""CREATE TABLE gcat.lake2.tmp (id BIGINT) USING graft
      TBLPROPERTIES ('keyCols'='id')""")
    assert(spark.sql("SHOW TABLES IN gcat.lake2").count() == 1)
    spark.sql("DROP TABLE gcat.lake2.tmp")
    assert(spark.sql("SHOW TABLES IN gcat.lake2").count() == 0)
    // missing keyCols fails loudly at creation
    val ex = intercept[Exception] {
      spark.sql("CREATE TABLE gcat.lake2.bad (id BIGINT) USING graft")
    }
    assert(ex.getMessage.contains("keyCols"))
  }

  test("MOR storage type through DDL properties") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.lake")
    spark.sql("""CREATE TABLE gcat.lake.morp (id BIGINT, v DOUBLE)
      USING graft TBLPROPERTIES ('keyCols'='id', 'storageType'='mor',
      'precombineField'='v')""")
    // MOR tracks commit versions, so the stamp column is part of the
    // declared schema — inserts name their columns (the write stamps it)
    spark.sql("INSERT INTO gcat.lake.morp (id, v) VALUES (1, 1.0)")
    spark.sql("INSERT INTO gcat.lake.morp (id, v) VALUES (1, 10.0)")
    val t = CowTable.open(spark, s"$wh/lake/morp")
    assert(t.manifest.storageType == "mor")
    assert(t.manifest.deltaCommits >= 1, "second insert must log-append")
    // catalog/path reads serve the READ-OPTIMIZED view (Hudi _ro): the
    // cold-start base write is visible, the later log append waits for
    // compaction; the merged state comes from the realtime API
    assert(spark.sql("SELECT v FROM gcat.lake.morp")
      .as[Double].collect().toSeq == Seq(1.0),
      "read-optimized view serves the base files")
    assert(t.asInstanceOf[graft.table.MorTable].realtime()
      .select("v").as[Double].collect().toSeq == Seq(10.0))
  }

  test("CALL procedures drive the table services from SQL") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.lake")
    spark.sql("""CREATE TABLE gcat.lake.svc (id BIGINT, day STRING,
      v DOUBLE) USING graft PARTITIONED BY (day)
      TBLPROPERTIES ('keyCols'='id', 'trackCommitVersions'='true')""")
    spark.sql("INSERT INTO gcat.lake.svc (id, day, v) VALUES " +
      "(1, '2026-01-01', 1.0), (2, '2026-02-01', 2.0), " +
      "(3, '2026-03-01', 3.0)")

    // metadata-only TTL drop, result row surfaced to SQL
    val r = spark.sql("CALL gcat.system.expire_partitions(" +
      "table => 'lake.svc', column => 'day', older_than => '2026-02-15')")
      .as[(String, Long)].collect().toMap
    assert(r == Map("units_dropped" -> 2L), s"got $r")
    val t = CowTable.open(spark, s"$wh/lake/svc")
    assert(t.manifest.operation == "drop_partitions")
    assert(spark.sql("SELECT id FROM gcat.lake.svc")
      .as[Long].collect().toSeq == Seq(3L))

    // predicate-form drop + maintenance calls run end to end
    spark.sql(
      "INSERT INTO gcat.lake.svc (id, day, v) VALUES (4, '2026-04-01', 4.0)")
    val r2 = spark.sql("CALL gcat.system.drop_partitions(" +
      "table => 'lake.svc', predicate => \"day = '2026-03-01'\")")
      .as[(String, Long)].collect().toMap
    assert(r2 == Map("units_dropped" -> 1L))
    assert(spark.sql("CALL gcat.system.compact(table => 'lake.svc')")
      .as[(String, Long)].collect().toMap.keySet == Set("compacted"))
    assert(spark.sql(
      "CALL gcat.system.compact_by_size(table => 'lake.svc')")
      .as[(String, Long)].collect().toMap.keySet == Set("compacted"))
    assert(spark.sql("CALL gcat.system.vacuum(table => 'lake.svc')")
      .as[(String, Long)].collect().toMap == Map("orphans_removed" -> 0L))
    assert(spark.sql("CALL gcat.system.clean(table => 'lake.svc')")
      .as[(String, Long)].collect().toMap == Map("cleaned" -> 1L))
    // restore the pre-drop state by version
    val preDrop = t.manifest.version - 1
    spark.sql(s"CALL gcat.system.restore(" +
      s"table => 'lake.svc', version => $preDrop)")
    assert(spark.sql("SELECT id FROM gcat.lake.svc")
      .as[Long].collect().toSet == Set(3L, 4L))

    // unknown procedure fails loudly with the known set
    val ex = intercept[Exception] {
      spark.sql("CALL gcat.system.nope(table => 'lake.svc')").collect()
    }
    assert(ex.getMessage.contains("no such procedure") ||
      ex.getMessage.contains("nope"), ex.getMessage)
  }

  test("CREATE TABLE AS SELECT seeds a keyed table in one statement") {
    init()
    Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
      .toDF("id", "tag", "v").createOrReplaceTempView("ctas_src")
    spark.sql("""CREATE TABLE gcat.lake.ctas
      USING graft TBLPROPERTIES ('keyCols'='id')
      AS SELECT id, tag, v FROM ctas_src""")
    assert(spark.sql("SELECT count(*) AS n FROM gcat.lake.ctas")
      .collect().head.getLong(0) == 3L)
    // and the result is a NORMAL keyed table: INSERT upserts by key
    spark.sql("INSERT INTO gcat.lake.ctas VALUES (2, 'B', 9.9), " +
      "(4, 'd', 4.5)")
    val got = spark.sql("SELECT id, tag FROM gcat.lake.ctas ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d")),
      s"CTAS table must behave keyed: $got")
  }

  test("CREATE OR REPLACE TABLE AS SELECT swaps data, schema and key") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.lake")
    Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
      .createOrReplaceTempView("rtas_v1")
    spark.sql("""CREATE OR REPLACE TABLE gcat.lake.rt
      USING graft TBLPROPERTIES ('keyCols'='id')
      AS SELECT id, tag FROM rtas_v1""")
    assert(spark.sql("SELECT count(*) FROM gcat.lake.rt")
      .head().getLong(0) == 2L)
    // replace with a DIFFERENT schema and key column: the old
    // definition must be gone entirely, not merged into
    Seq(("x", 10.0), ("y", 20.0), ("z", 30.0)).toDF("name", "score")
      .createOrReplaceTempView("rtas_v2")
    spark.sql("""CREATE OR REPLACE TABLE gcat.lake.rt
      USING graft TBLPROPERTIES ('keyCols'='name')
      AS SELECT name, score FROM rtas_v2""")
    val got = spark.sql("SELECT name, score FROM gcat.lake.rt " +
      "ORDER BY name").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got == Seq(("x", 10.0), ("y", 20.0), ("z", 30.0)),
      s"replaced table must serve only the new definition: $got")
    // the replacement is a normal keyed table on its NEW key
    spark.sql("INSERT INTO gcat.lake.rt VALUES ('y', 99.0)")
    assert(spark.sql("SELECT score FROM gcat.lake.rt WHERE name = 'y'")
      .head().getDouble(0) == 99.0, "INSERT must upsert on the new key")
    // and the commit timeline restarted: no version from the old
    // definition survives the swap
    val t = graft.table.CowTable.open(spark, s"$wh/lake/rt")
    assert(t.keyCols == Seq("name"), s"new key recorded: ${t.keyCols}")
    // REPLACE of a missing table refuses; OR CREATE form succeeds
    val ex = intercept[Exception] {
      spark.sql("""REPLACE TABLE gcat.lake.rt_missing
        USING graft TBLPROPERTIES ('keyCols'='name')
        AS SELECT name, score FROM rtas_v2""")
    }
    assert(ex.getMessage.toLowerCase.contains("table"), ex.getMessage)
  }

  test("column DEFAULT values fill omitted columns on INSERT") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.lake")
    spark.sql("""CREATE TABLE gcat.lake.dflt (id BIGINT,
      status STRING DEFAULT 'new', score DOUBLE DEFAULT 0.0)
      USING graft TBLPROPERTIES ('keyCols'='id')""")
    // omitted trailing columns take their declared defaults
    spark.sql("INSERT INTO gcat.lake.dflt (id) VALUES (1)")
    // the DEFAULT keyword works positionally too
    spark.sql("INSERT INTO gcat.lake.dflt VALUES (2, DEFAULT, 7.5)")
    spark.sql("INSERT INTO gcat.lake.dflt VALUES (3, 'done', DEFAULT)")
    val got = spark.sql(
      "SELECT id, status, score FROM gcat.lake.dflt ORDER BY id")
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, "new", 0.0), (2L, "new", 7.5),
      (3L, "done", 0.0)), s"defaults must fill: $got")
    // defaults survive the manifest round trip: a fresh session load
    // (new table instance) still serves them
    spark.sql("INSERT INTO gcat.lake.dflt (id) VALUES (4)")
    assert(spark.sql(
      "SELECT status FROM gcat.lake.dflt WHERE id = 4")
      .head().getString(0) == "new")
    // ALTER-added defaults refuse loudly: old files would read NULL
    // where the DDL promised a value
    val ex = intercept[Exception] {
      spark.sql(
        "ALTER TABLE gcat.lake.dflt ADD COLUMNS (tag STRING DEFAULT 'x')")
    }
    assert(ex.getMessage.contains("DEFAULT"), ex.getMessage)
  }

  test("TRUNCATE TABLE empties the table as a normal commit") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.lake")
    spark.sql("""CREATE TABLE gcat.lake.tr (id BIGINT, v DOUBLE)
      USING graft TBLPROPERTIES ('keyCols'='id',
        'trackCommitVersions'='true')""")
    spark.sql("INSERT INTO gcat.lake.tr (id, v) VALUES (1, 1.0), (2, 2.0)")
    val vBefore = graft.table.CowTable
      .open(spark, s"$wh/lake/tr").manifest.version
    spark.sql("TRUNCATE TABLE gcat.lake.tr")
    assert(spark.sql("SELECT count(*) FROM gcat.lake.tr")
      .head().getLong(0) == 0L)
    // truncation is a commit on the timeline, not an erase: the table
    // stays keyed and writable, and time travel still sees the old rows
    spark.sql("INSERT INTO gcat.lake.tr (id, v) VALUES (3, 3.0)")
    assert(spark.sql("SELECT id FROM gcat.lake.tr").head().getLong(0) == 3L)
    assert(spark.sql(
      s"SELECT count(*) FROM gcat.lake.tr VERSION AS OF $vBefore")
      .head().getLong(0) == 2L, "pre-truncate version must survive")
    // the change feed surfaces the truncation as DELETES, so chained
    // consumers converge instead of silently keeping stale rows
    val t = graft.table.CowTable.open(spark, s"$wh/lake/tr")
    val feed = t.changeFeed(vBefore, vBefore + 1)
      .select(graft.table.CowTable.ChangeTypeCol, "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(feed == Set(("D", 1L), ("D", 2L)),
      s"truncate must emit D rows for every live key: $feed")
    // the CALL surface drives the same commit
    val got = spark.sql("CALL gcat.system.truncate('lake.tr')")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("units_dropped") == 1L, got.toString)
    assert(spark.sql("SELECT count(*) FROM gcat.lake.tr")
      .head().getLong(0) == 0L)
  }
}
