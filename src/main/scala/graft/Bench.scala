package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/codegen/parquet-reader paths so the first timed query
    // doesn't absorb one-time session costs.
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("sum(l_quantity)").collect()
    spark.read.parquet(s"$sfDir/events.parquet").limit(100).collect()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        // Force FULL evaluation of every output column: a bare count()
        // lets Catalyst prune unreferenced projections, so projection-only
        // queries would measure parquet row-count metadata instead of the
        // operator (round-2 verdict finding). Hashing all columns into one
        // aggregate keeps the driver-side result tiny while making every
        // cell load-bearing. Fold with XOR, not sum: ANSI mode makes a
        // long-sum of 64-bit hashes overflow-fail on any non-tiny result.
        val df = fn(spark, sfDir)
        df.select(org.apache.spark.sql.functions.xxhash64(
            df.columns.toIndexedSeq.map(df.col): _*).as("h"))
          .agg(org.apache.spark.sql.functions.bit_xor(
            org.apache.spark.sql.functions.col("h"))).collect()
      } catch {
        case e: Throwable =>
          // a failed query must be VISIBLE, not a fast-looking -1
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
