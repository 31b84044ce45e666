package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec

class KMeansExactSpec extends SparkSpec {
  import spark.implicits._

  private def embs(rows: (Long, Seq[Double])*) =
    rows.toDF("vec_id", "embedding")

  test("hand-computed 1-D clustering converges to exact integer means") {
    val df = embs(
      (0L, Seq(0.0)), (1L, Seq(1.0)), // init centroids 0 / 1000000
      (2L, Seq(0.1)), (3L, Seq(0.2)),
      (4L, Seq(0.9)), (5L, Seq(1.1)))
    // iter1: {0, .1, .2} -> 100000, {.9, 1.0, 1.1} -> 1000000; iter2 fixed
    val out = KMeansExact.train(df, 2, 2)
    assert(out == Seq((0L, Seq(100000L)), (1L, Seq(1000000L))))
  }

  test("centroid mean rounds half-up, including negatives") {
    // cluster 0: {1, 2} micro-units -> mean 1.5 -> 2
    // cluster 1: {-1, -2} -> mean -1.5 -> floor(-1.5 + 0.5) = -1
    val df = embs(
      (0L, Seq(1e-6)), (1L, Seq(-1e-6)),
      (2L, Seq(2e-6)), (3L, Seq(-2e-6)))
    val out = KMeansExact.train(df, 2, 1)
    assert(out == Seq((0L, Seq(2L)), (1L, Seq(-1L))))
  }

  test("training is partitioning-independent") {
    val df = spark.range(300).select(col("id").as("vec_id"),
      array((0 until 8).map(d =>
        (sin(col("id") * (d + 1)) * 0.5).cast("double")): _*)
        .as("embedding"))
    val one = KMeansExact.train(df.coalesce(1), 4, 3)
    val many = KMeansExact.train(df.repartition(13), 4, 3)
    assert(one == many)
  }

  test("empty clusters drop from the model") {
    // init centroids 0, 1000000, 0 (vec_id 2 duplicates vec_id 0);
    // ties break to the smaller centroid id, so cluster 2 captures
    // nothing and drops
    val df = embs(
      (0L, Seq(0.0)), (1L, Seq(1.0)), (2L, Seq(0.0)),
      (3L, Seq(0.1)), (4L, Seq(0.9)))
    val out = KMeansExact.train(df, 3, 1)
    assert(out.map(_._1) == Seq(0L, 1L))
  }

  test("trainedCentroids explodes the model in total order") {
    val df = embs(
      (0L, Seq(0.0, 1.0)), (1L, Seq(1.0, 0.0)),
      (2L, Seq(0.2, 0.8)), (3L, Seq(0.8, 0.2)))
    val rows = KMeansExact.trainedCentroids(df, 2, 2).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)))
    val model = KMeansExact.train(df, 2, 2).toMap
    rows.foreach(r => assert(model(r.getLong(0))(r.getLong(1).toInt)
      == r.getLong(2)))
  }

  test("tracks the float trainer on well-separated clusters") {
    val df = spark.range(200).select(col("id").as("vec_id"),
      array(
        (when(col("id") % 2 === 0, 0.1).otherwise(0.9)
          + (col("id") % 7) * 1e-3).cast("double"),
        (when(col("id") % 2 === 0, 0.8).otherwise(0.2)
          + (col("id") % 5) * 1e-3).cast("double")).as("embedding"))
    val exact = KMeansExact.train(df, 2, 3).toMap
    val float = graft.sim.Similarity.kmeansCentroids(df, 2, 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(exact.keySet == float.keySet)
    for ((id, cv) <- exact; (c, d) <- cv.zip(float(id)))
      assert(math.abs(c - d * 1e6) <= 1.0, s"centroid $id drifted")
  }
}
