package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {

  /** Force FULL evaluation of every output column: a bare count() lets
    * Catalyst prune unreferenced projections, so projection-only queries
    * would measure parquet row-count metadata instead of the operator
    * (round-2 verdict finding). Hashing all columns into one aggregate
    * keeps the driver-side result tiny while making every cell
    * load-bearing. Fold with XOR, not sum: ANSI mode makes a long-sum of
    * 64-bit hashes overflow-fail on any non-tiny result.
    */
  private def materialize(df: DataFrame): Unit = {
    import org.apache.spark.sql.functions.{bit_xor, col, xxhash64}
    df.select(xxhash64(df.columns.toIndexedSeq.map(df.col): _*).as("h"))
      .agg(bit_xor(col("h"))).collect()
    ()
  }

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
    // Warmup pass: run every query once untimed so per-query codegen/JIT
    // compiles before measurement — the timed pass then reports
    // steady-state execution, the basis BASELINE.md's reference total was
    // measured on ("after JIT warmup"). First-execution timings were
    // observed 1.5-5x steady state.
    SparkEntry.queries.foreach { case (_, fn) =>
      try materialize(fn(spark, sfDir))
      catch { case _: Throwable => () } // failures surface in the timed pass
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try materialize(fn(spark, sfDir))
      catch {
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
