package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.table.CowTable

/** CHECK-constraint overhead probe: constraints are enforced FUSED into
  * the write scan (a filter whose violation branch raises), so the claim
  * is ~zero marginal cost — no second pass, no count job. Writes the
  * same rows into an unconstrained and a 2-constraint table and reports
  * wall times. `runMain graft.CheckProbe [rows] [reps]`
  */
object CheckProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 10000000
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def data = spark.range(rows).select(col("id"),
      (col("id") % 1000).cast("double").as("v"),
      concat(lit("u"), (col("id") % 97)).as("tag"))

    def run(tag: String, checks: Seq[String]): Double = {
      val times = (0 until reps).map { _ =>
        val t = new CowTable(spark,
          java.nio.file.Files.createTempDirectory(s"ckp-$tag").toString,
          keyCols = Seq("id"), checkConstraints = checks)
        val t0 = System.nanoTime()
        t.bulkInsert(data, parallelism = 32)
        (System.nanoTime() - t0) / 1e9
      }
      val best = times.min
      println(f"[ckprobe] $tag: best $best%.2f s of " +
        times.map(x => f"$x%.2f").mkString("[", ", ", "]"))
      best
    }
    run("warmup", Nil)
    val plain = run("unconstrained", Nil)
    val checked = run("2-constraints",
      Seq("v >= 0", "length(tag) <= 8"))
    println(f"[ckprobe] overhead: ${(checked / plain - 1) * 100}%.1f%%")
    spark.stop()
  }
}
