package graft.util

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The scan-parallelism floor's gate contract (r13): redistribute ONLY
  * when the input provably cannot split to the session's core count —
  * tiny single-file inputs repartition to defaultParallelism; inputs with
  * enough files OR enough potential byte-range splits pass through with
  * their plan untouched; values are always preserved.
  */
class ScanParSpec extends SparkSpec {
  import spark.implicits._

  private def cores = spark.sparkContext.defaultParallelism

  private def partsOf(df: org.apache.spark.sql.DataFrame): Int =
    df.rdd.getNumPartitions

  test("un-splittable single-file input redistributes to the core count") {
    val dir = tmpDir("scanpar-one")
    (1L to 1000L).map(i => (i, s"t$i")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val out = ScanPar(df, col("doc_id"))
    assert(partsOf(out) == cores,
      s"single tiny file must fan out to defaultParallelism ($cores)")
    // values unchanged, only placement
    assert(out.orderBy("doc_id").as[(Long, String)].collect().toSeq ==
      (1L to 1000L).map(i => (i, s"t$i")))
  }

  test("enough input files short-circuits to a pass-through") {
    val dir = tmpDir("scanpar-many")
    (1L to 1000L).map(i => (i, s"t$i")).toDF("doc_id", "text")
      .repartition(cores + 2, col("doc_id"))
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val out = ScanPar(df, col("doc_id"))
    // the gate returns the SAME frame — no repartition node added
    assert(out eq df, "files >= cores must pass through untouched")
  }

  test("enough potential byte-range splits passes through (the 100 TB case)") {
    val dir = tmpDir("scanpar-big")
    (1L to 20000L).map(i => (i, "x" * 64)).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    // shrink the split size so the ONE file counts as >= cores potential
    // splits — the production shape where the scan self-parallelizes
    val key = "spark.sql.files.maxPartitionBytes"
    val old = spark.conf.get(key)
    spark.conf.set(key, "1024")
    try {
      val out = ScanPar(df, col("doc_id"))
      assert(out eq df,
        "an input with >= cores potential splits must pass through")
    } finally spark.conf.set(key, old)
  }

  test("non-file-backed input passes through") {
    val df = (1L to 10L).toDF("doc_id")
    assert(ScanPar(df, col("doc_id")) eq df)
  }
}
