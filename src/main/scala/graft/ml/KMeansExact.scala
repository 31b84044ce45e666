package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lloyd's k-means in exact integer arithmetic — the cross-engine-
  * certifiable twin of [[graft.sim.Similarity.kmeansCentroids]] (the IVF /
  * PQ codebook trainer).
  *
  * The float trainer's per-dimension `avg()` makes its centroids depend on
  * partial-aggregation merge order and engine summation, so its output can
  * never be hash-certified. This trainer removes every float op from the
  * training loop:
  *
  *   1. Each embedding component quantizes once to micro-unit integers
  *      `q = floor(x·10⁶ + 0.5)` (single IEEE ops — bit-identical in any
  *      engine; the battery's standard quantization).
  *   2. Assignment is nearest-centroid by squared L2 over integer-valued
  *      doubles. Components are bounded by the quantization scale, so
  *      every intermediate (self-dots ≤ dim·max², cross terms) stays below
  *      2^53 and the expanded-form distance is an EXACT integer — equal to
  *      the direct Σ(q−c)² any other engine computes. Ties break to the
  *      smallest centroid id.
  *   3. The centroid update is the half-up integer mean
  *      `c = ⌊(2·Σq + n) / (2n)⌋` via `pmod` floor-division — pure integer
  *      ops, sign-correct, identical everywhere.
  *
  * Result: training is deterministic across engines, parallelism levels
  * and merge orders, so a distributed TRAINING run can be certified
  * value-exact against an independent oracle — not just spot-checked.
  *
  * Scale shape (the same contract as the float trainer): assignment is a
  * shuffle-free per-row expression (the k×dim codebook inlines into one
  * looping expression); the update is one `groupBy` whose map-side combine
  * reduces the exchange to (k·dim) rows per partition; the model collects
  * to the driver between iterations (k·dim longs — bounded, like every
  * codebook collect in [[graft.sim.Similarity]]). Per-iteration cost is
  * one corpus scan regardless of k. Empty clusters drop from the model.
  *
  * Bounds: assignment needs dim·(2·s·X)² < 2^53 (with scale s and
  * |x| ≤ X — at dim 64, s = 10⁶, |x| ≤ 1 there are ~6 bits of headroom);
  * the centroid update accumulates and divides in DECIMAL(38,0), so the
  * per-cluster row count is bounded only by 10³⁸/(s·X) ≈ 10³² — never the
  * binding constraint.
  */
object KMeansExact {

  /** Micro-unit quantization of a float/double vector column. */
  def quantize(vec: Column, scale: Long = 1000000L): Column =
    transform(vec.cast("array<double>"),
      x => floor(x * scale + lit(0.5)).cast("long"))

  /** Train `k` centroids for `iters` Lloyd iterations over
    * `embs(idCol, vecCol)`. Init is the deterministic first-k rows by id
    * (same convention as the float trainer). Returns the final model as
    * (centroid_id, micro-unit component vector), sorted by id.
    */
  def train(embs: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      scale: Long = 1000000L): Seq[(Long, Seq[Long])] = {
    val q = embs.select(col(idCol).as("__id"),
      quantize(col(vecCol), scale).as("__q"))
    var cents: Seq[(Long, Seq[Long])] = q.filter(col("__id") < k)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
      .sortBy(_._1)
    for (_ <- 1 to iters) {
      val cb = cents.map { case (id, cv) =>
        (id, cv.map(_.toDouble).toList)
      }
      val best = graft.functions.CodebookExpressions
        .nearestCentroidL2(transform(col("__q"), _.cast("double")), cb)
      val assigned = q.select(col("__q"),
        best.getField("centroid_id").as("__cid"))
      // half-up integer mean: floor((2·Σq + n) / (2n)) via pmod floor-div
      // in DECIMAL(38,0) — the remainder-stripped decimal divide is exact
      // at any count the 38-digit moments admit (a LONG/double form would
      // silently lose exactness past Σq ≈ 2^52)
      val a = lit(2).cast("decimal(38,0)") * col("s") + col("n")
      val b = lit(2).cast("decimal(38,0)") * col("n")
      cents = assigned
        .select(col("__cid"), posexplode(col("__q")))
        .groupBy(col("__cid"), col("pos"))
        .agg(count(lit(1)).as("n"),
          sum(col("col").cast("decimal(38,0)")).as("s"))
        .select(col("__cid"), col("pos"),
          ((a - pmod(a, b)) / b).cast("long").as("c"))
        .groupBy("__cid")
        .agg(array_sort(collect_list(struct(col("pos"), col("c"))))
          .as("pc"))
        .select(col("__cid"),
          transform(col("pc"), x => x.getField("c")).as("cv"))
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
        .sortBy(_._1)
    }
    cents
  }

  /** [[train]] exploded to certification shape: one row per
    * (centroid_id, pos, c) in total order — integer micro-unit components,
    * hashable against any engine's replay of the same iterations.
    */
  def trainedCentroids(embs: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      scale: Long = 1000000L): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    train(embs, k, iters, idCol, vecCol, scale)
      .flatMap { case (id, cv) =>
        cv.zipWithIndex.map { case (c, p) => (id, p.toLong, c) }
      }
      .toDF("centroid_id", "pos", "c")
      .orderBy("centroid_id", "pos")
  }
}
