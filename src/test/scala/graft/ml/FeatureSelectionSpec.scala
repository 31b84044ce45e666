package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FeatureSelectionSpec extends SparkSpec {
  import spark.implicits._

  test("chi-square ranks a perfectly discriminative token first") {
    // "alpha" appears in every A doc and no B doc; "noise" in all docs of
    // both (dropped: tok_n == n); "mix" in half of EACH label's docs —
    // label-independent, so ad == bc and chi2 is exactly zero
    val docs = (1 to 8).map { i =>
      val lab = if (i <= 4) "A" else "B"
      val base = if (lab == "A") "alpha noise" else "beta noise"
      val text = if (i % 2 == 0) s"$base mix" else base
      (i.toLong, text, lab)
    }.toDF("doc_id", "text", "lab")
    val out = FeatureSelection
      .chiSquareTopTokens(docs, "lab", topK = 2, minDf = 2)
      .collect()
    val byLabel = out.groupBy(_.getString(0))
    // perfect separator: a=4,b=0,c=0,d=4 -> chi2 = 8*16*16/(4*4*4*4) = 8
    for ((lab, rows) <- byLabel) {
      val first = rows.minBy(_.getLong(1))
      assert(first.getString(2) == (if (lab == "A") "alpha" else "beta"))
      assert(first.getLong(5) == 8000000L, s"$lab chi2")
    }
    // label-independent token scores zero: a=4 d=4 b=4 c=4 -> ad=bc
    val mix = out.filter(_.getString(2) == "mix")
    assert(mix.nonEmpty && mix.forall(_.getLong(5) == 0L))
    // the everywhere-token is excluded (degenerate 2x2)
    assert(!out.exists(_.getString(2) == "noise"))
  }

  test("chi-square matches the closed form on a hand 2x2 table") {
    // token "t": a=3 of 4 A docs, b=1 of 4 B docs
    val docs = Seq(
      (1L, "t x", "A"), (2L, "t y", "A"), (3L, "t z", "A"), (4L, "q w", "A"),
      (5L, "t u", "B"), (6L, "p q", "B"), (7L, "p r", "B"), (8L, "p s", "B")
    ).toDF("doc_id", "text", "lab")
    val row = FeatureSelection
      .chiSquareTopTokens(docs, "lab", topK = 10, minDf = 2)
      .filter(col("token") === "t" && col("label") === "A")
      .collect()(0)
    // a=3 b=1 c=1 d=3: chi2 = 8*(9-1)^2/(4*4*4*4) = 512/256 = 2
    assert(row.getLong(3) == 3 && row.getLong(4) == 4)
    assert(row.getLong(5) == 2000000L)
  }

  test("selection is partitioning-independent") {
    val docs = spark.range(300).select(col("id").as("doc_id"),
      concat_ws(" ",
        concat(lit("w"), (col("id") % 17).cast("string")),
        concat(lit("v"), (col("id") % 5).cast("string")),
        concat(lit("u"), ((col("id") * 7) % 11).cast("string"))).as("text"),
      (col("id") % 3).cast("string").as("lab"))
    def run(d: org.apache.spark.sql.DataFrame) =
      FeatureSelection.chiSquareTopTokens(d, "lab", 5, minDf = 3)
        .collect().map(_.toString).toSeq
    assert(run(docs.coalesce(1)) == run(docs.repartition(13)))
  }
}
