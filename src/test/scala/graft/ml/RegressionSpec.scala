package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RegressionSpec extends SparkSpec {
  import spark.implicits._

  test("grouped OLS solves hand-computed lines exactly") {
    val df = Seq(
      // group a: y = 2x exactly
      ("a", 1L, 2L), ("a", 2L, 4L), ("a", 3L, 6L),
      // group b: constant regressor -> singular -> null solution
      ("b", 5L, 1L), ("b", 5L, 9L),
      // group c: least-squares over noisy points
      ("c", 0L, 1L), ("c", 1L, 3L), ("c", 2L, 4L)
    ).toDF("g", "x", "y")
    val out = Regression.fitOlsGrouped(df, Seq("g"), col("x"), col("y"))
      .collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    val a = out(0)
    // n=3 Σx=6 Σy=12 Σxx=14 Σxy=28 → den=6, slope=12/6=2, icept=0/6
    assert(a.getLong(1) == 3)
    assert(a.getDecimal(2).longValueExact == 6)
    assert(a.getDecimal(3).longValueExact == 12)
    assert(a.getDecimal(4).longValueExact == 12)
    assert(a.getDecimal(5).longValueExact == 0)
    assert(a.getDecimal(6).longValueExact == 6)
    val b = out(1)
    assert(b.isNullAt(4) && b.isNullAt(5) && b.isNullAt(6))
    val c = out(2)
    // n=3 Σx=3 Σy=8 Σxx=5 Σxy=11 → den=6, slope_num=9 (1.5), icept_num=7
    assert(c.getDecimal(4).longValueExact == 9)
    assert(c.getDecimal(5).longValueExact == 7)
    assert(c.getDecimal(6).longValueExact == 6)
  }

  test("OLS moments are partitioning-independent (exact integer fold)") {
    val df = spark.range(1000).select(
      (col("id") % 7).cast("string").as("g"),
      (col("id") % 97).as("x"),
      ((col("id") * 31) % 1009).as("y"))
    val one = Regression.fitOlsGrouped(df.coalesce(1), Seq("g"),
      col("x"), col("y")).collect().toSeq
    val many = Regression.fitOlsGrouped(df.repartition(13), Seq("g"),
      col("x"), col("y")).collect().toSeq
    assert(one.map(_.toString) == many.map(_.toString))
  }

  test("float view divides the exact fit") {
    val df = Seq(("a", 0L, 10L), ("a", 2L, 14L)).toDF("g", "x", "y")
    val r = Regression.fitOls(df, Seq("g"), col("x"), col("y")).collect()(0)
    assert(r.getDouble(2) == 2.0) // slope
    assert(r.getDouble(3) == 10.0) // intercept
  }

  test("distributed plane fit matches the exact driver-side solve") {
    val df = spark.range(600).select(
      (col("id") % 3).cast("string").as("g"),
      (col("id") % 23).as("x1"),
      ((col("id") * 7) % 41).as("x2"),
      ((col("id") * 13) % 101).as("y"))
    val dist = Regression.fitPlaneGrouped(df, Seq("g"),
      col("x1"), col("x2"), col("y")).collect()
    val gram = Regression.gramMoments(df, Seq("g"),
      Seq(col("x1"), col("x2")), col("y"))
    val exact = Regression.solveGram(gram, Seq("g"), 3)
      .map { case (k, nums, den) => k.head -> ((nums, den)) }.toMap
    assert(dist.length == 3)
    dist.foreach { r =>
      val (nums, den) = exact(r.getString(0))
      // Cramer numerators relate to the Bareiss fractions by the shared
      // determinant: num_i/den must be equal as exact rationals
      val cd = BigInt(r.getDecimal(5).toBigInteger)
      val cn = Seq(2, 3, 4).map(i => BigInt(r.getDecimal(i).toBigInteger))
      assert(cd != 0)
      cn.zip(nums).foreach { case (c, b) => assert(c * den == b * cd) }
    }
  }

  test("plane fit emits null solutions on collinear features") {
    val pts = (0 to 9).map(i => ("g", i.toLong, 3L * i, i + 2L))
    val df = pts.toDF("g", "x1", "x2", "y")
    val r = Regression.fitPlaneGrouped(df, Seq("g"),
      col("x1"), col("x2"), col("y")).collect()(0)
    assert(r.getLong(1) == 10)
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
  }

  test("plane fit is partitioning-independent") {
    val df = spark.range(500).select(
      lit("g").as("g"), (col("id") % 19).as("x1"),
      ((col("id") * 3) % 29).as("x2"), ((col("id") * 11) % 53).as("y"))
    val one = Regression.fitPlaneGrouped(df.coalesce(1), Seq("g"),
      col("x1"), col("x2"), col("y")).collect().map(_.toString).toSeq
    val many = Regression.fitPlaneGrouped(df.repartition(17), Seq("g"),
      col("x1"), col("x2"), col("y")).collect().map(_.toString).toSeq
    assert(one == many)
  }

  test("residuals score rows with their group's exact model") {
    // group a: y = 2x exactly -> all residuals 0; group b singular -> null
    val df = Seq(
      ("a", 1L, 2L), ("a", 2L, 4L), ("a", 3L, 7L),
      ("b", 5L, 1L), ("b", 5L, 9L)
    ).toDF("g", "x", "y")
    val out = Regression.olsResiduals(df, Seq("g"), "x", "y")
      .orderBy("g", "x", "y").collect()
    // group a: n=3 Σx=6 Σy=13 Σxx=14 Σxy=31 -> den=6, slope_num=15,
    // icept_num=(13*14-6*31)=-4; residual_num = 6y + 4 - 15x
    val expectA = Seq((1L, 2L, 1L), (2L, 4L, -2L), (3L, 7L, 1L))
    out.take(3).zip(expectA).foreach { case (r, (x, y, res)) =>
      assert(r.getLong(1) == x && r.getLong(2) == y)
      assert(r.getDecimal(3).longValueExact == res) // residual_num
      assert(r.getDecimal(4).longValueExact == 6L) // den
    }
    out.drop(3).foreach(r => assert(r.isNullAt(3) && r.isNullAt(4)))
  }

  test("residuals refuse inputs whose columns collide with the outputs") {
    val df = Seq(("a", 1L, 2L, 9L)).toDF("g", "x", "y", "den")
    val e = intercept[IllegalArgumentException] {
      Regression.olsResiduals(df, Seq("g"), "x", "y")
    }
    assert(e.getMessage.contains("den"))
  }

  test("residuals are partitioning-independent") {
    val df = spark.range(400).select(
      (col("id") % 4).cast("string").as("g"), col("id").as("doc"),
      (col("id") % 13).as("x"), ((col("id") * 17) % 37).as("y"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Regression.olsResiduals(d, Seq("g"), "x", "y")
        .orderBy("doc").collect().map(_.toString).toSeq
    assert(run(df.coalesce(1)) == run(df.repartition(11)))
  }

  test("gram moments + exact solve recover a plane bit-exactly") {
    // y = 3 + 2*x1 - x2 on a 4x3 integer grid: exact recovery expected
    val pts = for (x1 <- 0 to 3; x2 <- 0 to 2)
      yield ("g", x1.toLong, x2.toLong, 3L + 2 * x1 - x2)
    val df = pts.toDF("g", "x1", "x2", "y")
    val gram = Regression.gramMoments(df, Seq("g"),
      Seq(col("x1"), col("x2")), col("y"))
    val Seq((key, nums, den)) = Regression.solveGram(gram, Seq("g"), 3)
    assert(key == Seq("g"))
    assert(den != 0)
    assert(nums(0) == BigInt(3) * den)
    assert(nums(1) == BigInt(2) * den)
    assert(nums(2) == BigInt(-1) * den)
  }

  test("micro-unit plane coefficients equal BigInt floor division") {
    // mixed-sign coefficients: y = -2 + 3*x1 - 2*x2 + noise so the
    // rationals are non-integral and negative numerators exercise the
    // sign-correct floor (pmod) path
    val df = spark.range(900).select(
      (col("id") % 3).cast("string").as("g"),
      (col("id") % 23).as("x1"),
      ((col("id") * 7) % 41).as("x2"),
      ((col("id") * 3) % 41 - lit(20) + (col("id") % 23) * 3
        - ((col("id") * 7) % 41) * 2).as("y"))
    val full = Regression.fitPlaneGrouped(df, Seq("g"),
      col("x1"), col("x2"), col("y")).collect()
    val micro = Regression.fitPlaneGroupedMicro(df, Seq("g"),
      col("x1"), col("x2"), col("y")).collect()
    assert(micro.length == full.length)
    full.zip(micro).foreach { case (f, m) =>
      assert(f.getString(0) == m.getString(0))
      assert(f.getLong(1) == m.getLong(1))
      val den = BigInt(f.getDecimal(5).toBigInteger)
      assert(den > 0) // positive-definite Gram: microCoef's precondition
      Seq(2, 3, 4).zip(Seq(2, 3, 4)).foreach { case (fi, mi) =>
        val num = BigInt(f.getDecimal(fi).toBigInteger)
        // BigInt floorDiv: BigInt's / truncates, so adjust explicitly
        val scaled = num * 1000000
        val q = (scaled - (((scaled % den) + den) % den)) / den
        assert(BigInt(m.getLong(mi)) == q,
          s"group ${f.getString(0)} col $mi")
      }
    }
    // at least one coefficient must be negative and non-integral for the
    // floor path to count as exercised
    assert(micro.exists(r => (2 to 4).exists(i => r.getLong(i) < 0)))
    assert(micro.exists(r =>
      (2 to 4).exists(i => r.getLong(i) % 1000000 != 0)))
  }

  test("micro-unit plane fit emits nulls on singular groups") {
    val pts = (0 to 9).map(i => ("g", i.toLong, 3L * i, i + 2L))
    val df = pts.toDF("g", "x1", "x2", "y")
    val r = Regression.fitPlaneGroupedMicro(df, Seq("g"),
      col("x1"), col("x2"), col("y")).collect()(0)
    assert(r.getLong(1) == 10)
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }

  test("collinear features are rejected, not silently mis-solved") {
    val pts = (0 to 5).map(i => ("g", i.toLong, 2L * i, i + 1L))
    val df = pts.toDF("g", "x1", "x2", "y")
    val gram = Regression.gramMoments(df, Seq("g"),
      Seq(col("x1"), col("x2")), col("y"))
    intercept[IllegalArgumentException] {
      Regression.solveGram(gram, Seq("g"), 3)
    }
  }
}
