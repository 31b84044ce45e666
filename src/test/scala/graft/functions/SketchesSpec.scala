package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("cms estimates are never under, exact at ample width") {
    // 200 values with known frequencies: value i appears i+1 times.
    val df = (0 until 200).flatMap(i => Seq.fill(i + 1)(s"v$i")).toDF("v")
    val cands = (0 until 200 by 17).map(i => (s"v$i", (i + 1).toLong))
      .toDF("v", "exact_n")
    // ample width: no collisions plausible at 200 values x 8192 buckets?
    // not guaranteed — so assert the CMS invariant (>=) at narrow width
    // and exactness of at least half the candidates at wide width.
    val wide = Sketches.cmsLookup(
      Sketches.cmsBuild(df, 3, 8192), cands, 3, 8192)
      .as[(String, Long, Long)].collect()
    assert(wide.forall { case (_, ex, est) => est >= ex })
    assert(wide.count { case (_, ex, est) => est == ex } >= wide.length / 2)
    val narrow = Sketches.cmsLookup(
      Sketches.cmsBuild(df, 3, 16), cands, 3, 16)
      .as[(String, Long, Long)].collect()
    assert(narrow.forall { case (_, ex, est) => est >= ex })
    // absent value reads 0 (or a collision count), never negative
    val absent = Sketches.cmsLookup(
      Sketches.cmsBuild(df, 3, 8192),
      Seq(("nope", 0L)).toDF("v", "exact_n"), 3, 8192)
      .as[(String, Long, Long)].collect().head
    assert(absent._3 >= 0L)
  }

  test("cms sketch state is bounded by depth x width") {
    val df = (0 until 5000).map(i => s"t$i").toDF("v")
    assert(Sketches.cmsBuild(df, 3, 32).count() <= 3 * 32)
  }

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
