package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Storage-partitioned-join probe: the same fact-to-fact join run (a) as
  * an ordinary shuffle join over two keyed graft tables and (b) as an SPJ
  * over the same data co-bucketed — reporting exchange counts, shuffle
  * bytes and wall time. The 100-TB claim being measured: co-bucketing at
  * WRITE time removes both network re-partitions from every subsequent
  * join on the key, which is the dominant cost of large joins.
  *
  * `runMain graft.SpjProbe [sfDir] [inflate] [buckets]` — inflate
  * replicates orders rows to scale the fact side. Results in BASELINE.md.
  */
object SpjProbe extends AdaptiveSparkPlanHelper {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val inflate = if (args.length > 1) args(1).toInt else 10
    val buckets = if (args.length > 2) args(2).toInt else 16
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.catalog.spjp", "graft.sources.GraftCatalog")
      .config("spark.sql.catalog.spjp.warehouse",
        java.nio.file.Files.createTempDirectory("spjprobe-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // two fact-sized sides sharing the key space: inflated orders, keyed
    // by a synthetic unique id, joined on that id
    val base = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("double").as("price"))
    val inflated = base.crossJoin(
        spark.range(inflate).select(col("id").as("rep")))
      .select((col("o_orderkey") * inflate + col("rep")).as("k"),
        col("o_custkey"), col("price"))
    println(s"[spjprobe] rows per side: ${inflated.count()}")

    spark.sql("CREATE NAMESPACE IF NOT EXISTS spjp.lake")
    def mk(name: String, bucketed: Boolean, df: DataFrame): Unit = {
      val nb = if (bucketed) s", 'numBuckets'='$buckets'" else ""
      spark.sql(s"""CREATE TABLE spjp.lake.$name
        (k BIGINT, o_custkey BIGINT, price DOUBLE) USING graft
        TBLPROPERTIES ('keyCols'='k'$nb)""")
      df.createOrReplaceTempView(s"src_$name")
      val t0 = System.nanoTime
      spark.sql(s"INSERT INTO spjp.lake.$name SELECT * FROM src_$name")
      println(f"[spjprobe] build $name: ${(System.nanoTime - t0) / 1e9}%.1fs")
    }
    mk("flat_a", bucketed = false, inflated)
    mk("flat_b", bucketed = false,
      inflated.withColumn("price", col("price") * 2))
    mk("spj_a", bucketed = true, inflated)
    mk("spj_b", bucketed = true,
      inflated.withColumn("price", col("price") * 2))

    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set(
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def drive(tag: String, a: String, b: String): Unit = {
      val q = s"""SELECT count(*) AS cnt, sum(x.price + y.price) AS s
        FROM spjp.lake.$a x JOIN spjp.lake.$b y ON x.k = y.k"""
      // warm once (fs cache), then measure
      spark.sql(q).collect()
      val t0 = System.nanoTime
      val df = spark.sql(q)
      val row = df.collect()(0)
      val secs = (System.nanoTime - t0) / 1e9
      val exchanges = collectWithSubqueries(
        df.queryExecution.executedPlan) {
        case s: ShuffleExchangeExec => s }
      println(f"[spjprobe] $tag: $secs%.2fs, " +
        s"exchanges=${exchanges.size}, rows=${row.getLong(0)}")
    }
    drive("shuffle-join (flat)", "flat_a", "flat_b")
    drive("storage-partitioned (bucketed)", "spj_a", "spj_b")
    spark.stop()
  }
}
