package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed cardinality sketching.
  *
  * The production-default estimator for `COUNT(DISTINCT)` at corpus scale is
  * a sketch, not an exact shuffle (the reference's stack exposes this as
  * Spark's own `approx_count_distinct`). The variant here is a KMV
  * (K-Minimum-Values / bottom-k) sketch chosen for a property HLL lacks:
  * its state — the k smallest distinct hash values — is a pure function of
  * the input SET, independent of partitioning, merge order, and engine, so
  * the estimate is bit-for-bit reproducible in the DuckDB oracle and stable
  * across cluster sizes. (Bar-Yossef et al. 2002, "Counting distinct
  * elements in a data stream"; expected relative error ~ 1/sqrt(k-2).)
  */
object Sketches {

  /** Scale factor mapping a [[Hashing.hash60]] value into [0, 1): 2^60 as
    * an exactly-representable double (the oracle embeds the same literal,
    * avoiding any engine-specific pow()).
    */
  val Hash60Range: Long = 1L << 60

  /** KMV distinct-count estimate of `expr` over `df`.
    *
    * Plan shape (the part that must survive 100 TB): one hash-shuffle
    * `distinct` over the 8-byte hash column — NOT the raw values — followed
    * by a `TakeOrderedAndProject` for the k smallest (per-partition top-k
    * then a k-row driver merge; no global sort). With k = 1024 the driver
    * sees 8 KB regardless of input size.
    *
    * Estimator: if fewer than k distinct hashes exist the count is exact;
    * otherwise `(k-1) * 2^60 / h_k` where `h_k` is the k-th smallest hash
    * (the unbiased KMV form). Collisions in a 60-bit space are negligible
    * below ~2^30 distinct values.
    *
    * Returns one row: `distinct_est` (double), `sketch_size` (long, =
    * min(k, true distinct count)).
    */
  def kmvDistinct(df: DataFrame, expr: Column, k: Int = 256): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val hashes = df.select(Hashing.hash60(expr.cast("string")).as("h"))
      .distinct()
    hashes.orderBy(col("h")).limit(k)
      .agg(count(lit(1)).as("n"), max(col("h")).as("hk"))
      .select(
        when(col("n") < k, col("n").cast("double"))
          .otherwise(lit(k - 1).cast("double") *
            lit(Hash60Range).cast("double") / col("hk").cast("double"))
          .as("distinct_est"),
        col("n").cast("long").as("sketch_size"))
  }

  /** DuckDB SQL computing the identical estimate (same hash, same literal
    * 2^60, same operation order) over table `table`, column expression `e`.
    */
  /** Per-group KMV distinct-count estimates: bottom-k of the distinct
    * hashes WITHIN each group (rank<=k plans with `WindowGroupLimit`, so
    * each partition pre-prunes to its local bottom-k per group before the
    * shuffle — per-group state stays k values no matter the group size).
    * The grouped form of [[kmvDistinct]], same estimator and portability.
    */
  def kmvDistinctByGroup(
      df: DataFrame, groupCol: String, expr: Column,
      k: Int = 256): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val hashes = df.select(col(groupCol),
      Hashing.hash60(expr.cast("string")).as("h")).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("h"))
    hashes.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"), max(col("h")).as("hk"))
      .select(col(groupCol),
        when(col("n") < k, col("n").cast("double"))
          .otherwise(lit(k - 1).cast("double") *
            lit(Hash60Range).cast("double") / col("hk").cast("double"))
          .as("distinct_est"),
        col("n").cast("long").as("sketch_size"))
  }

  def kmvDistinctByGroupSql(
      table: String, groupCol: String, e: String, k: Int = 256): String =
    s"""WITH h AS (SELECT DISTINCT $groupCol,
       |    ${Hashing.hash60Sql(s"CAST($e AS VARCHAR)")} AS h
       |  FROM $table),
       |r AS (SELECT $groupCol, h, row_number() OVER (
       |    PARTITION BY $groupCol ORDER BY h) AS rn FROM h)
       |SELECT $groupCol,
       |  CASE WHEN count(*) < $k THEN CAST(count(*) AS DOUBLE)
       |    ELSE CAST(${k - 1} AS DOUBLE) * CAST($Hash60Range AS DOUBLE)
       |         / CAST(max(h) AS DOUBLE) END AS distinct_est,
       |  CAST(count(*) AS BIGINT) AS sketch_size
       |FROM r WHERE rn <= $k GROUP BY $groupCol""".stripMargin

  /** Count-Min Sketch build: `depth × width` bounded counter state over a
    * single string column `v` (Cormode & Muthukrishnan 2005). Each value
    * lands in one bucket per row via the portable salted hash
    * `hash60('cms' || seed || '|' || v) mod width`, so the sketch — like
    * every sketch in this file — is a pure function of the input multiset:
    * partitioning-, merge-order- and engine-independent, hence
    * oracle-checkable.
    *
    * Plan shape: one explode (×depth) of 8-byte (seed, bucket) pairs and
    * one map-side-combinable groupBy — per-partition state collapses to at
    * most depth×width counters before the shuffle, so the shuffled volume
    * is O(depth × width × partitions) no matter how many input rows. This
    * is the 100-TB path for frequency stats: a (3 × 64k) sketch answers
    * point-frequency queries over any corpus size with ~1.5 MB of state,
    * where the exact groupBy shuffles the full token stream.
    */
  def cmsBuild(values: DataFrame, depth: Int = 3, width: Int = 1024)
      : DataFrame = {
    require(depth >= 1 && width >= 2, "need depth >= 1, width >= 2")
    values
      .select(col("v"),
        explode(typedLit((0 until depth).toList)).as("seed"))
      .select(col("seed"),
        (Hashing.hash60(concat(lit("cms"), col("seed"), lit("|"), col("v")))
          % width).as("bucket"))
      .groupBy("seed", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates for `candidates` (column `v`, other columns
    * carried through): `min` over the depth rows of the candidate's bucket
    * counters — never an underestimate, overestimates bounded by
    * `e·N/width` with probability `1 - e^-depth`. The probe side is a
    * candidate-list × depth nested-loop against a depth×width sketch —
    * both tiny; broadcastable at any corpus size.
    */
  def cmsLookup(
      sketch: DataFrame, candidates: DataFrame,
      depth: Int = 3, width: Int = 1024): DataFrame = {
    val carried = candidates.columns.toSeq
    val probes = candidates
      .select(col("*"), explode(typedLit((0 until depth).toList)).as("seed"))
      .select(col("*"),
        (Hashing.hash60(concat(lit("cms"), col("seed"), lit("|"), col("v")))
          % width).as("bucket"))
    probes
      .join(broadcast(sketch), Seq("seed", "bucket"), "left")
      .groupBy(carried.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_n"))
  }

  def kmvDistinctSql(table: String, e: String, k: Int = 256): String =
    s"""WITH h AS (SELECT DISTINCT ${Hashing.hash60Sql(s"CAST($e AS VARCHAR)")} AS h
       |  FROM $table),
       |k AS (SELECT h FROM h ORDER BY h LIMIT $k)
       |SELECT CASE WHEN count(*) < $k THEN CAST(count(*) AS DOUBLE)
       |    ELSE CAST(${k - 1} AS DOUBLE) * CAST($Hash60Range AS DOUBLE)
       |         / CAST(max(h) AS DOUBLE) END AS distinct_est,
       |  CAST(count(*) AS BIGINT) AS sketch_size
       |FROM k""".stripMargin
}
