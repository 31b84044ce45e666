package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcOpsSpec extends SparkSpec {
  import spark.implicits._

  def cdc = Seq(
    // (op, id, value, txn)
    ("I", "k1", 10.0, "001"),
    ("U", "k1", 20.0, "002"),
    ("I", "k2", 30.0, "003"),
    ("D", "k2", 30.0, "004"),
    ("I", "k3", 40.0, "005")
  ).toDF("Op", "ID", "value", "transaction_id")

  test("P1 lowercases column names") {
    val got = CdcOps.lowercaseColumns(cdc).columns.toSeq
    assert(got == Seq("op", "id", "value", "transaction_id"))
  }

  test("P2 drops bookkeeping cols, tolerant of absent ones") {
    val df = CdcOps.lowercaseColumns(cdc)
    assert(CdcOps.dropBookkeeping(df).columns.toSeq == Seq("id", "value"))
    // full-load shape: no CDC columns at all
    val full = Seq(("k1", 1.0)).toDF("id", "value")
    assert(CdcOps.dropBookkeeping(full).columns.toSeq == Seq("id", "value"))
  }

  test("W1 keeps only the latest event per key, string-ordered txn id") {
    val df = CdcOps.lowercaseColumns(cdc)
    val latest = CdcOps.latestPerKey(df, Seq("id"))
    val byKey = latest.select("id", "op").as[(String, String)].collect().toMap
    assert(byKey == Map("k1" -> "U", "k2" -> "D", "k3" -> "I"))
    // string ordering: "10" > "09" but "9" > "10" lexically — preserved as-is
    val tricky = Seq(("a", "9"), ("a", "10")).toDF("id", "transaction_id")
    val win = CdcOps.latestPerKey(tricky, Seq("id"))
      .select("transaction_id").as[String].collect()
    assert(win.toSeq == Seq("9"))
  }

  test("W1 composite keys partition on all columns") {
    val df = Seq(
      ("k1", "t1", "A", "001"), ("k1", "t2", "B", "002"),
      ("k1", "t1", "C", "003")
    ).toDF("id", "sub", "payload", "transaction_id")
    val got = CdcOps.latestPerKey(df, Seq("id", "sub"))
      .select("payload").as[String].collect().toSet
    assert(got == Set("C", "B"))
  }

  test("W1 agg form (max_by) is equivalent to the window form") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .transform(graft.queries.QueryCatalog.normalizeEventsTs)
    val win = CdcOps.latestPerKey(ev, Seq("user_id"), "ts",
        Seq(col("event_id").desc)).drop(CdcOps.SeqByPk)
      .select("user_id", "event_id").as[(Long, Long)].collect().toMap
    val agg = CdcOps.latestPerKeyAgg(ev, Seq("user_id"), Seq("ts", "event_id"))
      .select("user_id", "event_id").as[(Long, Long)].collect().toMap
    assert(win == agg)
  }

  test("W1 SQL entry point is equivalent to the DataFrame form") {
    val df = CdcOps.lowercaseColumns(cdc)
    val viaSql = CdcOps.latestPerKeySql(spark, df, Seq("id"))
      .select("id", "op").as[(String, String)].collect().toMap
    val viaDf = CdcOps.latestPerKey(df, Seq("id"))
      .select("id", "op").as[(String, String)].collect().toMap
    assert(viaSql == viaDf)
    // composite key splicing
    val comp = Seq(("k1", "x", "A", "1"), ("k1", "x", "B", "2"))
      .toDF("id", "sub", "payload", "transaction_id")
    val got = CdcOps.latestPerKeySql(spark, comp, Seq("id", "sub"))
      .select("payload").as[String].collect().toSeq
    assert(got == Seq("B"))
  }

  test("precombine keeps greatest value per key (decimal-safe)") {
    val df = Seq(
      ("k1", BigDecimal("10.05")), ("k1", BigDecimal("10.50")),
      ("k2", BigDecimal("1.00"))
    ).toDF("id", "v")
    val got = CdcOps.precombine(df, Seq("id"), "v")
      .select("id", "v").as[(String, BigDecimal)].collect().toMap
    assert(got("k1") == BigDecimal("10.50"))
    assert(got("k2") == BigDecimal("1.00"))
  }

  test("op routing P3-P6 with null-Op three-valued logic") {
    val df = Seq(
      (Some("I"), "a"), (Some("U"), "b"), (Some("D"), "c"), (None, "d")
    ).toDF("op", "id")
    assert(CdcOps.inserts(df).select("id").as[String].collect().toSeq ==
      Seq("a"))
    assert(CdcOps.updates(df).select("id").as[String].collect().toSeq ==
      Seq("b"))
    assert(CdcOps.deletes(df).select("id").as[String].collect().toSeq ==
      Seq("c"))
    // null op falls out of BOTH nonDeletes and deletes (SURVEY.md §7.4)
    assert(CdcOps.nonDeletes(df).select("id").as[String].collect().toSet ==
      Set("a", "b"))
  }
}
