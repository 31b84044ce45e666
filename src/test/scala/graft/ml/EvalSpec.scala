package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: Seq[(Long, Boolean)]): (Long, Long, BigInt, BigInt) = {
    val r = Eval.binaryAuc(rows.toDF("s", "y"), col("s"), col("y"))
      .collect()(0)
    (r.getLong(0), r.getLong(1),
      BigInt(r.getDecimal(2).toBigInteger), BigInt(r.getDecimal(3).toBigInteger))
  }

  test("perfect separation scores AUC 1, inverted scores 0") {
    val (np, nn, num, den) =
      auc(Seq((10L, true), (9L, true), (2L, false), (1L, false)))
    assert(np == 2 && nn == 2 && num == den && den == 8)
    val (_, _, n2, d2) =
      auc(Seq((1L, true), (2L, true), (9L, false), (10L, false)))
    assert(n2 == 0 && d2 == 8)
  }

  test("all-tied scores give AUC exactly 1/2") {
    val (_, _, num, den) =
      auc(Seq((5L, true), (5L, true), (5L, false), (5L, false), (5L, false)))
    assert(num * 2 == den) // 1/2 exactly via mid-ranks
  }

  test("hand-computed mixed case with ties") {
    // scores: 1-,2+,2-,3+  ranks: 1, {2,3} midrank 2.5, 4
    // sum pos midranks = 2.5 + 4 = 6.5; U = 6.5 - 3 = 3.5; AUC = 3.5/4
    val (np, nn, num, den) =
      auc(Seq((1L, false), (2L, true), (2L, false), (3L, true)))
    assert(np == 2 && nn == 2)
    assert(num == 7 && den == 8) // 2U / 2·n⁺·n⁻
  }

  test("AUC equals the brute-force pair count") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(20).toLong, rnd.nextBoolean()))
    val (np, nn, num, den) = auc(rows)
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    // 2·Σ pairs[pos>neg] + Σ pairs[pos==neg] over 2·n⁺·n⁻
    val wins = (for (p <- pos; q <- neg) yield
      if (p > q) 2L else if (p == q) 1L else 0L).sum
    assert(num == BigInt(wins) && den == BigInt(2L * np * nn))
  }

  test("single-class input gives NULL AUC, not a zero denominator") {
    val r = Eval.binaryAuc(Seq((1L, true), (2L, true)).toDF("s", "y"),
      col("s"), col("y")).collect()(0)
    assert(r.getLong(0) == 2 && r.getLong(1) == 0)
    assert(r.isNullAt(2) && r.isNullAt(3))
    val g = Eval.binaryAucGrouped(
      Seq(("a", 1L, true), ("a", 2L, false), ("b", 1L, true))
        .toDF("g", "s", "y"), Seq("g"), col("s"), col("y"))
      .collect().map(r => r.getString(0) -> r.isNullAt(4)).toMap
    assert(!g("a") && g("b"))
    val k = Eval.ksStatistic(Seq((1L, true)).toDF("v", "a"),
      col("v"), col("a")).collect()(0)
    assert(k.isNullAt(2) && k.isNullAt(3))
  }

  test("AUC is partitioning-independent") {
    val df = spark.range(500).select((col("id") % 37).as("s"),
      (col("id") % 3 === 0).as("y"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Eval.binaryAuc(d, col("s"), col("y")).collect()(0).toString
    assert(run(df.coalesce(1)) == run(df.repartition(11)))
  }

  test("grouped AUC matches per-group single-shot AUC") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(300)(
      ((rnd.nextInt(3)).toString, rnd.nextInt(15).toLong, rnd.nextBoolean()))
    val df = rows.toDF("g", "s", "y")
    val grouped = Eval.binaryAucGrouped(df, Seq("g"), col("s"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDecimal(3), r.getDecimal(4)))
      .toMap
    for (g <- Seq("0", "1", "2")) {
      val single = Eval.binaryAuc(df.filter(col("g") === g),
        col("s"), col("y")).collect()(0)
      val (np, nn, num, den) = grouped(g)
      assert(np == single.getLong(0) && nn == single.getLong(1))
      assert(num == single.getDecimal(2) && den == single.getDecimal(3))
    }
  }

  test("KS statistic: identical distributions give zero, disjoint give 1") {
    val same = Seq((1L, true), (2L, true), (1L, false), (2L, false))
      .toDF("v", "a")
    val r0 = Eval.ksStatistic(same, col("v"), col("a")).collect()(0)
    assert(BigInt(r0.getDecimal(2).toBigInteger) == 0)
    val disj = Seq((1L, true), (2L, true), (8L, false), (9L, false))
      .toDF("v", "a")
    val r1 = Eval.ksStatistic(disj, col("v"), col("a")).collect()(0)
    assert(r1.getDecimal(2).toBigInteger == r1.getDecimal(3).toBigInteger)
  }

  test("KS matches a hand ECDF computation") {
    // A: {1,3}, B: {2,3,4}; gaps×6 at v=1:|1·3-0·2|=3, v=2:|3-2|=1,
    // v=3:|6-4|=2, v=4:|6-6|=0 -> ks = 3/6
    val df = Seq((1L, true), (3L, true), (2L, false), (3L, false),
      (4L, false)).toDF("v", "a")
    val r = Eval.ksStatistic(df, col("v"), col("a")).collect()(0)
    assert(r.getLong(0) == 2 && r.getLong(1) == 3)
    assert(BigInt(r.getDecimal(2).toBigInteger) == 3)
    assert(BigInt(r.getDecimal(3).toBigInteger) == 6)
  }

  test("KS is partitioning-independent") {
    val df = spark.range(600).select((col("id") % 41).as("v"),
      (col("id") % 2 === 0).as("a"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Eval.ksStatistic(d, col("v"), col("a")).collect()(0).toString
    assert(run(df.coalesce(1)) == run(df.repartition(13)))
  }

  test("Spearman moments: monotone gives rho 1, reversed gives -1") {
    val mono = Seq(("g", 1L, 10L), ("g", 2L, 20L), ("g", 3L, 25L))
      .toDF("g", "x", "y")
    val r = Eval.spearmanMoments(mono, Seq("g"), "x", "y").collect()(0)
    val (num, vx, vy) = (BigInt(r.getDecimal(2).toBigInteger),
      BigInt(r.getDecimal(3).toBigInteger),
      BigInt(r.getDecimal(4).toBigInteger))
    assert(num * num == vx * vy && num > 0) // ρ = +1 exactly
    val rev = Seq(("g", 1L, 9L), ("g", 2L, 5L), ("g", 3L, 1L))
      .toDF("g", "x", "y")
    val r2 = Eval.spearmanMoments(rev, Seq("g"), "x", "y").collect()(0)
    val n2 = BigInt(r2.getDecimal(2).toBigInteger)
    assert(n2 * n2 == BigInt(r2.getDecimal(3).toBigInteger) *
      BigInt(r2.getDecimal(4).toBigInteger) && n2 < 0)
  }

  test("Spearman handles ties by mid-rank, constant column gives NULL") {
    // x ranks(x2): 1->2, {2,2}->avg(2,3)*2=5, 3->8 ; y all distinct
    val df = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 2L, 3L), ("g", 3L, 4L))
      .toDF("g", "x", "y")
    val r = Eval.spearmanMoments(df, Seq("g"), "x", "y").collect()(0)
    // rx2 = (2,5,5,8), ry2 = (2,4,6,8): n=4 sx=20 sy=20 sxx=118 syy=120
    // sxy=118 -> rho_num=4*118-400=72, varx=4*118-400=72, vary=4*120-400=80
    assert(BigInt(r.getDecimal(2).toBigInteger) == 72)
    assert(BigInt(r.getDecimal(3).toBigInteger) == 72)
    assert(BigInt(r.getDecimal(4).toBigInteger) == 80)
    val const = Seq(("g", 7L, 1L), ("g", 7L, 2L)).toDF("g", "x", "y")
    val rc = Eval.spearmanMoments(const, Seq("g"), "x", "y").collect()(0)
    assert(rc.isNullAt(2) && rc.getDecimal(3).longValueExact == 0)
  }

  test("Spearman is partitioning-independent") {
    val df = spark.range(400).select((col("id") % 2).cast("string").as("g"),
      (col("id") % 23).as("x"), ((col("id") * 7) % 31).as("y"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Eval.spearmanMoments(d, Seq("g"), "x", "y")
        .collect().map(_.toString).toSeq
    assert(run(df.coalesce(1)) == run(df.repartition(9)))
  }

  test("calibration bins count exactly") {
    val df = Seq((5L, true), (5L, false), (14L, true), (25L, true))
      .toDF("s", "y")
    val out = Eval.calibrationBins(df, col("s") / 10, col("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 2L, 1L), (1L, 1L, 1L), (2L, 1L, 1L)))
  }
}
