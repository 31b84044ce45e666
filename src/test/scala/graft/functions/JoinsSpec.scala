package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin result is identical to the plain join") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(o, Seq("l_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_totalprice")
      .as[(Long, Int, Double)].collect().toSet
    val salted = Joins.saltedJoin(li, o, Seq("l_orderkey"),
        col("l_linenumber"), 8)
      .select("l_orderkey", "l_linenumber", "o_totalprice")
      .as[(Long, Int, Double)].collect().toSet
    assert(salted == plain)
  }

  test("salting spreads one hot key across salt values") {
    val hot = Seq.tabulate(1000)(i => (1L, i)).toDF("k", "line")
    val salted = hot.withColumn("__salt",
      pmod(xxhash64(col("line")), lit(8L)))
    val spread = salted.select("__salt").distinct().count()
    assert(spread == 8, s"expected all 8 salts used, got $spread")
  }

  test("asofJoin attaches the latest right row at-or-before each left row") {
    val left = Seq((1L, 5L, "l5"), (1L, 15L, "l15"), (1L, 20L, "l20"),
      (1L, 25L, "l25"), (2L, 10L, "x10")).toDF("k", "t", "tag")
    val right = Seq((1L, 10L, "a", 1.0), (1L, 20L, "b", 2.0),
      (3L, 1L, "z", 9.0)).toDF("k", "t", "v", "score")
    val got = Joins.asofJoin(left, right, Seq("k"), "t")
      .select("k", "t", "tag", "v", "score")
      .as[(Long, Long, String, Option[String], Option[Double])]
      .collect().toSet
    assert(got == Set(
      (1L, 5L, "l5", None, None),            // before any right row
      (1L, 15L, "l15", Some("a"), Some(1.0)),
      (1L, 20L, "l20", Some("b"), Some(2.0)), // equal ts: right wins (>=)
      (1L, 25L, "l25", Some("b"), Some(2.0)),
      (2L, 10L, "x10", None, None)))         // key with no right rows
  }

  test("asofJoin: a null payload FIELD in the latest right row shadows") {
    val left = Seq((1L, 30L)).toDF("k", "t")
    val right = Seq((1L, 10L, Some("old")), (1L, 20L, None: Option[String]))
      .toDF("k", "t", "v")
    val got = Joins.asofJoin(left, right, Seq("k"), "t")
      .select("v").as[Option[String]].collect().toSeq
    assert(got == Seq(None), "latest right row's null must win, not 'old'")
  }

  test("asofJoin matches a naive per-row computation on real data") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .transform(graft.queries.QueryCatalog.normalizeEventsTs)
      .withColumn("ts", unix_micros(col("ts")))
    val clicks = ev.filter($"event_type" === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .groupBy("user_id", "ts").agg(max("value").as("rv"))
    val got = Joins.asofJoin(clicks, purchases, Seq("user_id"), "ts")
      .select("event_id", "rv").as[(Long, Option[Double])].collect().toMap
    val ps = purchases.as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val naive = clicks.as[(Long, Long, Long)].collect().map {
      case (eid, u, t) =>
        eid -> ps.get(u).flatMap(_.reverseIterator.find(_._2 <= t)).map(_._3)
    }.toMap
    assert(got == naive)
  }

  test("rangeJoin: inverted/empty intervals match nothing, no bucket blowup") {
    val pts = Seq(Tuple1(5L)).toDF("p")
    // end < start spanning ~20k buckets if the sequence walked downward
    val ivs = Seq((1L, 1700000000L, 0L), (2L, 5L, 5L)).toDF("iv", "s", "e")
    val got = Joins.rangeJoin(pts, col("p"), ivs, col("s"), col("e"), 86400L)
    assert(got.count() == 0)
  }

  test("rangeJoin pairs points with exactly the containing intervals") {
    val pts = Seq(0L, 5L, 10L, 15L, 29L, 30L, 45L, 100L).map(Tuple1(_))
      .toDF("p")
    val ivs = Seq((1L, 0L, 10L), (2L, 5L, 30L), (3L, 30L, 31L),
      (4L, 90L, 120L)).toDF("iv", "s", "e")
    // bucketWidth smaller, equal, and larger than interval lengths
    for (width <- Seq(3L, 10L, 64L)) {
      val got = Joins.rangeJoin(pts, col("p"), ivs, col("s"), col("e"), width)
        .select("p", "iv").as[(Long, Long)].collect().toSet
      val expected = Set((0L, 1L), (5L, 1L), (5L, 2L), (10L, 2L), (15L, 2L),
        (29L, 2L), (30L, 3L), (100L, 4L))
      assert(got == expected, s"width=$width")
    }
  }
}
