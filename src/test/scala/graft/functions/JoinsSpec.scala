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
}
