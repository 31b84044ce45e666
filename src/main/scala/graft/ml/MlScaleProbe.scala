package graft.ml

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the exact-training ops: the OLS gram-moment pass and
  * one exact k-means iteration swept over synthetic corpus sizes. The
  * claims under test: OLS cost is ONE scan + a groups-width exchange
  * (flat per row as groups stay fixed), and a k-means iteration is one
  * shuffle-free assignment scan + one map-side-combined groupBy —
  * both linear in rows with no corpus×corpus term anywhere.
  * `runMain graft.ml.MlScaleProbe [rowsCsv] [dim]` (defaults
  * 1000000,4000000,16000000 rows, dim 16). Results in BASELINE.md.
  */
object MlScaleProbe {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("1000000,4000000,16000000")
      .split(',').map(_.trim.toLong).toSeq
    val dim = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    println("[mlscale] rows ols_line_s ols_plane_s kmeans_iter_s")
    sizes.foreach { n =>
      // deterministic synthetic features: 40 groups, integer x/y
      val docs = spark.range(n).select(
        (col("id") % 40).cast("string").as("g"),
        (col("id") % 997).as("x1"),
        ((col("id") * 31) % 983).as("x2"),
        ((col("id") * 13) % 1009).as("y"))
      val (_, tLine) = time {
        Regression.fitOlsGrouped(docs, Seq("g"), col("x1"), col("y"))
          .collect()
      }
      val (_, tPlane) = time {
        Regression.fitPlaneGrouped(docs, Seq("g"),
          col("x1"), col("x2"), col("y")).collect()
      }
      // one exact Lloyd iteration over n/8 vectors of `dim` dims (vector
      // rows are dim× wider than the scalar feature rows above)
      val vecs = spark.range(n / 8).select(col("id").as("vec_id"),
        array((0 until dim).map(d =>
          (sin(col("id") * (d + 1)) * 0.5).cast("double")): _*)
          .as("embedding"))
      val (_, tKm) = time { KMeansExact.train(vecs, 8, 1) }
      println(f"[mlscale] $n%9d ${tLine}%6.2f ${tPlane}%6.2f ${tKm}%6.2f")
    }
    spark.stop()
  }
}
