package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("kmvDistinct is exact below k") {
    val df = (0 until 500).map(i => i % 37).toDF("v")
    val row = Sketches.kmvDistinct(df, col("v"), k = 256).collect().head
    assert(row.getDouble(0) == 37.0)
    assert(row.getLong(1) == 37L)
  }

  test("kmvDistinct estimates above k within the sketch's error bound") {
    val n = 5000
    val df = (0 until n).toDF("v")
    val row = Sketches.kmvDistinct(df, col("v"), k = 64).collect().head
    val est = row.getDouble(0)
    // expected relative std error ~ 1/sqrt(k-2) ≈ 12.7%; 4 sigma bound
    assert(math.abs(est - n) / n < 0.5, s"estimate $est for true $n")
    assert(row.getLong(1) == 64L)
  }

  test("kmvDistinct is partitioning-independent") {
    val df = (0 until 2000).map(i => i % 700).toDF("v")
    val a = Sketches.kmvDistinct(df.repartition(1), col("v"), k = 64)
      .collect().head.getDouble(0)
    val b = Sketches.kmvDistinct(df.repartition(13), col("v"), k = 64)
      .collect().head.getDouble(0)
    assert(a == b, "sketch state is a pure function of the input set")
  }
}
