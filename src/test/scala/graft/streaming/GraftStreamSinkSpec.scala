package graft.streaming

import graft.SparkSpec
import graft.table.CowTable
import org.apache.spark.sql.functions._

/** Native `writeStream.format("graft")` sink — the V1 StreamSinkProvider
  * spelling of [[GraftSink]]. Uses a parquet file stream source (same
  * deterministic pattern as GraftSinkSpec) rather than sleeps.
  */
class GraftStreamSinkSpec extends SparkSpec {
  import spark.implicits._

  test("writeStream.format(graft) creates, upserts, and survives restart") {
    val src = tmpDir("wss-src")
    val path = tmpDir("wss-table")
    val chk = tmpDir("wss-ckpt")
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    def run(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .writeStream.format("graft")
        .option("checkpointLocation", chk)
        .option("keyCols", "id")
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(path)
      q.awaitTermination()
    }
    run()
    val t = CowTable.open(spark, path)
    assert(t.snapshot().as[(Long, Double)].collect().toMap ==
      Map(1L -> 1.0, 2L -> 2.0))
    assert(t.manifest.metrics(GraftSink.BatchIdKey) == 0L)

    // second run: new file upserts key 2, inserts key 3 — and the
    // checkpoint restart must not replay batch 0
    Seq((2L, 20.0), (3L, 3.0)).toDF("id", "v")
      .write.mode("append").parquet(src)
    run()
    val t2 = CowTable.open(spark, path)
    assert(t2.snapshot().as[(Long, Double)].collect().toMap ==
      Map(1L -> 1.0, 2L -> 20.0, 3L -> 3.0))

    // nothing new: a third run commits no batch
    val vBefore = t2.manifest.version
    run()
    assert(CowTable.open(spark, path).manifest.version == vBefore)
  }

  test("complete mode and partitionBy refuse loudly") {
    val src = tmpDir("wss-src2")
    Seq((1L, "a")).toDF("id", "g").write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val agg = spark.readStream.schema(schema).parquet(src)
      .groupBy($"g").agg(count(lit(1)).as("n"))
    val e = intercept[Exception] {
      agg.writeStream.format("graft")
        .option("checkpointLocation", tmpDir("wss-ckpt2"))
        .option("keyCols", "g")
        .outputMode("complete")
        .start(tmpDir("wss-t2"))
    }
    def msgs(x: Throwable): String =
      if (x == null) "" else x.getMessage + "|" + msgs(x.getCause)
    assert(msgs(e).toLowerCase.contains("complete"), msgs(e))
  }
}
