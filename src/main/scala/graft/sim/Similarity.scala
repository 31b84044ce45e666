package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-similarity operators (SURVEY.md §7 north-star set): exact
  * cosine top-k as the correctness baseline, plus two sub-linear scale
  * paths — sign-LSH bucketing and IVF (inverted-file) cell assignment.
  *
  * Vector math is done with higher-order array functions over
  * `array<double>` (`zip_with` + ordered `aggregate` fold), entirely inside
  * codegen — no UDFs, no driver-side loops. Results are bit-reproducible in
  * engines that fold in array order, which the DuckDB oracle does.
  *
  * Scale notes: brute-force top-k against ONE query is a single scan
  * (broadcast of the query vector). All-pairs similarity must go through
  * [[signBuckets]] / [[ivfAssign]] so the join key (bucket/cell) bounds the
  * candidate set; never cross-join the full corpus.
  */
object Similarity {

  /** Element-wise cast to double — fix the arithmetic type BEFORE any fold
    * so Spark and the oracle accumulate identically. Uses Cast (codegen'd),
    * not a `transform` lambda (interpreted).
    */
  def toDoubleVec(v: Column): Column = v.cast("array<double>")

  /** Dot product via the codegen'd [[graft.functions.VectorDot]] expression:
    * same ascending-index double fold as the built-in
    * `aggregate(zip_with(...))` formulation (bit-identical results), minus
    * the interpreted higher-order-function overhead.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.vec_dot(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Semantic train/eval decontamination: flag training vectors whose max
    * cosine similarity against ANY holdout vector reaches `threshold` —
    * the embedding-space complement of the verbatim n-gram check
    * ([[graft.text.TextOps.decontaminate]]); paraphrased eval leakage has
    * no shared n-grams but survives in embedding space. The holdout side
    * broadcasts (eval corpora are small by construction): one scan of the
    * training corpus, a narrow per-vector max — the big side never
    * shuffles. Per-pair sims round to 6 digits before the max (matching
    * the oracle), and max is order-independent, so the threshold cut is
    * deterministic.
    */
  def semanticDecontaminate(
      train: DataFrame, holdout: DataFrame, threshold: Double): DataFrame = {
    val ev = broadcast(holdout.select(toDoubleVec(col("embedding")).as("ev")))
    train
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("tv"))
      .crossJoin(ev)
      .select(col("vec_id"), round(cosine(col("tv"), col("ev")), 6).as("sim"))
      .groupBy("vec_id").agg(max(col("sim")).as("max_sim"))
      .filter(col("max_sim") >= threshold)
  }

  /** Cell-bucketed semantic decontamination — the shape of
    * [[semanticDecontaminate]] that survives a holdout too large to
    * broadcast (multi-benchmark eval unions, dedup-against-prior-corpus):
    * both sides bucket into IVF cells from a codebook trained on the
    * TRAIN side (the holdout arrives later; `firstKCodebook` here for the
    * reproducible-oracle contract, [[kmeansCentroids]] in deployments),
    * each holdout vector replicates into its `nProbe` nearest cells, and
    * train rows compare ONLY against the holdout rows probing their cell.
    * One shuffle by cell id on each side; the pair count is bounded by
    * cell population × nProbe, never |train|·|holdout| — and the holdout
    * never broadcasts. Same SemDeDup recall contract as [[semanticDedup]]:
    * a contaminated pair is missed only if the holdout vector's nProbe
    * cells all miss the train vector's cell (spec-pinned: nProbe = nCells
    * degenerates to the exact broadcast result).
    *
    * Returns flagged train rows `(vec_id, max_sim, n_hits)` — max in-cell
    * holdout similarity (6-dp micro-unit quantized, engine-portable) and
    * the number of holdout witnesses at or above `threshold`.
    */
  def semanticDecontaminateIvf(
      train: DataFrame, holdout: DataFrame, threshold: Double,
      nCells: Int, nProbe: Int): DataFrame = {
    require(nCells > 0 && nProbe > 0, "need nCells > 0 and nProbe > 0")
    val cents = firstKCodebook(train, nCells)
    val cb = collectCodebook(cents)
    // train side: one scan carrying cell + vector (no join back)
    val ta = ivfAssignCarry(train, cents)
      .select(col("vec_id"), col("centroid_id"), col("ev").as("tv"))
    // holdout side: per-row top-nProbe cells over the collected codebook
    // (compact looping expression; (csim desc, centroid_id asc) order),
    // exploded — zero shuffle before the cell join.
    val hv0 = toDoubleVec(col("embedding"))
    val hProbe = holdout
      .select(col("vec_id").as("h_id"), hv0.as("hv"),
        explode(graft.functions.CodebookExpressions
          .topCellsCosine(hv0, cb, nProbe)).as("__probe"))
      .select(col("__probe.centroid_id").as("centroid_id"), col("h_id"),
        col("hv"))
    ta.join(hProbe, Seq("centroid_id"))
      .withColumn("sim", micro6(cosine(col("tv"), col("hv"))))
      .filter(col("sim") >= threshold)
      .groupBy("vec_id")
      .agg(max(col("sim")).as("max_sim"), count(lit(1)).as("n_hits"))
  }

  /** MMR (maximal-marginal-relevance) diversified top-k: greedily select
    * `k` results from the query's top-`n` shortlist, each pick maximizing
    * `λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)` — the standard
    * redundancy-suppressing re-rank for retrieval serving and eval-set
    * construction (near-duplicate shortlist entries stop crowding out
    * coverage).
    *
    * Scale shape: the SHORTLIST is the distributed work — one corpus scan
    * + TakeOrdered (swap in [[graft.sim.AnnIndex.search]] for a 100-TB
    * corpus); the greedy loop is O(n·k) over the bounded collected
    * shortlist, the same driver-bounded-model contract as every codebook
    * collect. Exactness: similarities quantize to micro-unit integers
    * (`floor(cos·10⁶ + 0.5)` — cosines computed with the engine's exact
    * sequential-fold dot), λ is the exact rational `lambdaNum/lambdaDen`,
    * and every greedy comparison is pure integer arithmetic with ties to
    * the smaller vec_id — so the selection is bit-reproducible in any
    * engine. Returns (rank, vec_id, rel_m, score_num): `rel_m` the
    * micro-unit query cosine, `score_num` the pick's integer MMR score
    * over the implicit `lambdaDen` denominator (rank 1 scores
    * `lambdaNum·rel_m`; the empty selected set contributes 0).
    */
  def mmrSelect(embs: DataFrame, queryId: Long, n: Int, k: Int,
      lambdaNum: Long = 7, lambdaDen: Long = 10): DataFrame = {
    require(k <= n && lambdaNum >= 0 && lambdaNum <= lambdaDen)
    val spark = embs.sparkSession
    val q = embs.filter(col("vec_id") === queryId)
      .select(toDoubleVec(col("embedding")).as("qv"))
    val shortlist = embs.crossJoin(broadcast(q))
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"),
        floor(cosine(toDoubleVec(col("embedding")), col("qv"))
          * lit(1.0e6) + lit(0.5)).cast("long").as("rel_m"))
      .filter(col("vec_id") =!= queryId)
      .orderBy(col("rel_m").desc, col("vec_id"))
      .limit(n)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getLong(2)))
    // driver-side micro-unit cosine — the exact arithmetic twin of the
    // distributed form: sequential-fold dots, one divide, one floor
    def dotd(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def simM(a: Array[Double], b: Array[Double]): Long =
      math.floor(dotd(a, b) / (math.sqrt(dotd(a, a)) *
        math.sqrt(dotd(b, b))) * 1.0e6 + 0.5).toLong
    val mu = lambdaDen - lambdaNum
    val selected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long)] // (vec_id, rel_m, score_num)
    val remaining = scala.collection.mutable.LinkedHashMap(
      shortlist.map(c => c._1 -> c): _*)
    val maxSim = scala.collection.mutable.HashMap.empty[Long, Long]
    while (selected.size < k && remaining.nonEmpty) {
      val best = remaining.valuesIterator.map { case (id, _, rel) =>
        (lambdaNum * rel - mu * maxSim.getOrElse(id, 0L), id, rel)
      }.reduceLeft { (x, y) =>
        if (y._1 > x._1 || (y._1 == x._1 && y._2 < x._2)) y else x
      }
      val picked = remaining.remove(best._2).get
      selected += ((best._2, best._3, best._1))
      remaining.valuesIterator.foreach { case (id, v, _) =>
        val s = simM(v, picked._2)
        if (s > maxSim.getOrElse(id, Long.MinValue)) maxSim(id) = s
      }
    }
    import spark.implicits._
    selected.toSeq.zipWithIndex
      .map { case ((id, rel, sc), i) => (i + 1L, id, rel, sc) }
      .toDF("rank", "vec_id", "rel_m", "score_num")
  }

  /** Exact cosine top-k of `embs` (`vec_id`, `embedding`) against the stored
    * vector `queryId`. The single-row query side is broadcast; one scan of
    * the corpus, one narrow top-k.
    */
  def cosineTopK(embs: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = embs.filter(col("vec_id") === queryId)
      .select(toDoubleVec(col("embedding")).as("qv"))
    embs
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosine(toDoubleVec(col("embedding")), col("qv")), 6).as("sim"))
      .filter(col("vec_id") =!= queryId)
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Hard-negative mining for contrastive training: for every query vector
    * in a bounded query set, the k most-similar corpus vectors carrying a
    * DIFFERENT label — the "close but wrong" examples a contrastive /
    * embedding-finetune pipeline pairs with each anchor (in-batch easy
    * negatives teach nothing; mined hard negatives carry the gradient).
    *
    * Plan shape: the query set is broadcast, so the corpus is scanned ONCE
    * with a BroadcastNestedLoopJoin fanning each row out to |Q| (query,
    * candidate) pairs filtered on label mismatch; the per-query top-k
    * ranks with `row_number <= k`, which Spark plans as WindowGroupLimit —
    * each partition pre-prunes to its local top-k per query BEFORE the
    * shuffle, so the exchange carries at most |partitions|·|Q|·k rows, not
    * the corpus. Corpus-scale cost is |corpus|·|Q| dot products; for large
    * query sets, route through the IVF/sign-LSH candidates instead
    * ([[ivfSearchWith]]) and rank only within probed cells.
    */
  def hardNegatives(embs: DataFrame, queryIds: Seq[Long], k: Int)
      : DataFrame = {
    require(queryIds.nonEmpty && k > 0, "need query ids and k > 0")
    val q = broadcast(embs
      .filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        toDoubleVec(col("embedding")).as("qv")))
    val w = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("vec_id"))
    embs
      .select(col("vec_id"), col("label"),
        toDoubleVec(col("embedding")).as("v"))
      .join(q, col("label") =!= col("q_label"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("v"), col("qv")), 6).as("sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Reciprocal-rank fusion — the standard hybrid-retrieval combiner
    * (lexical BM25 ranks ⊕ semantic cosine ranks, or any two rankers):
    * score(d) = Σ_r 1/(k + rank_r(d)), documents absent from a ranker
    * contribute 0 from it. Inputs are (id, rnk) frames (first column =
    * id); both are top-N lists, so the fuse is a join of two bounded
    * sides — cost is independent of corpus size. The fused score rounds
    * to 9 dp (two fixed-order double terms — deterministic cross-engine)
    * and ties break on id.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int = 60,
      topK: Int = 20): DataFrame = {
    require(k > 0 && topK > 0, "rrf: k and topK must be positive")
    def shaped(df: DataFrame, tag: String) =
      df.select(col(df.columns(0)).as("id"), col("rnk").as(s"rnk_$tag"))
    val fused = shaped(a, "a").join(shaped(b, "b"), Seq("id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(k) + col("rnk_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k) + col("rnk_b")), lit(0.0)), 9))
    // The fuse input is ≤ |a|+|b| rows (two top-N lists), so the global
    // rank is safe — but rank it under a bounded non-foldable single
    // group ([[graft.text.TextOps.boundedSingleGroup]]) rather than an
    // empty partition spec, so WindowExec's "No Partition Defined"
    // warning stays reserved for REAL unbounded funnels in the bench
    // log. The coalesce is non-null: every full-outer row carries at
    // least one rank.
    val w = Window
      .partitionBy(graft.text.TextOps.boundedSingleGroup(
        coalesce(col("rnk_a"), col("rnk_b"))))
      .orderBy(col("rrf").desc, col("id"))
    fused.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select("id", "rnk_a", "rnk_b", "rrf", "rnk")
  }

  /** Sign-LSH bucket code from the first `bits` coordinates: bit i set iff
    * coordinate i is non-negative. Vectors sharing a bucket are ANN
    * candidates; expected bucket population is corpus/2^bits.
    */
  def signBucket(emb: Column, bits: Int): Column =
    (1 to bits).map(i =>
      when(element_at(emb, i) >= 0, lit(1L << (i - 1))).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Per-vector bucket assignment plus bucket population counts. */
  def signBuckets(embs: DataFrame, bits: Int): DataFrame =
    embs.select(col("vec_id"), signBucket(col("embedding"), bits).as("bucket"))
      .withColumn("bucket_size",
        count(lit(1)).over(Window.partitionBy(col("bucket"))))

  /** The trivial deterministic codebook: the first `n` stored vectors.
    * Kept for reproducible oracle queries; real deployments should train
    * the codebook with [[kmeansCentroids]] (see [[ivfAssignWith]]).
    */
  def firstKCodebook(embs: DataFrame, n: Int): DataFrame =
    embs.filter(col("vec_id") < n)
      .select(col("vec_id").as("centroid_id"),
        toDoubleVec(col("embedding")).as("cv"))

  /** IVF cell assignment against an explicit codebook (`centroid_id, cv`):
    * each vector goes to the centroid with maximal cosine (ties by centroid
    * id). The codebook is COLLECTED (metadata-bounded: k centroids of dim
    * doubles — the same driver-side model the k-means trainer already
    * holds) and inlined as array literals, so assignment is a PURE PER-ROW
    * expression: one corpus scan, k×dim multiply-adds per row inside
    * whole-stage codegen, ZERO shuffle — where the earlier formulation
    * fanned every vector out ×k and shuffled the fan-out through a window.
    * At scale the per-cell candidate lists replace full scans for
    * query-time search. Values are bit-identical to the join form: the
    * literals are the exact collected doubles and the tie-break (max sim,
    * then min centroid id) matches the window's ordering.
    */
  def ivfAssignWith(embs: DataFrame, cents: DataFrame): DataFrame =
    ivfAssignCarry(embs, cents)
      .select(col("vec_id"), col("centroid_id"), col("sim"))

  /** [[ivfAssignWith]] keeping the (double-cast) vector in the output —
    * `(vec_id, centroid_id, sim, ev)` — so callers that need both the
    * cell and the vector (dedup, decontamination, PQ encode) avoid a
    * corpus-sized join back to the embeddings.
    */
  private[sim] def ivfAssignCarry(embs: DataFrame,
      cents: DataFrame): DataFrame = {
    val cb = collectCodebook(cents)
    val v = toDoubleVec(col("embedding"))
    embs
      .select(col("vec_id"), v.as("ev"), bestCellStruct(v, cb).as("__best"))
      .select(col("vec_id"), col("__best.centroid_id").as("centroid_id"),
        col("__best.sim").as("sim"), col("ev"))
  }

  /** Per-row argmax-cosine cell pick over the collected codebook —
    * `struct(sim, centroid_id)`, highest sim, ties to the lowest id.
    * One compact looping expression ([[graft.functions.CodebookExpressions]]):
    * inlining k scoring trees as literals blows the 64 KB codegen method
    * limit past ~16 centroids and silently de-optimizes the whole stage
    * to interpreted execution.
    */
  private def bestCellStruct(v: Column,
      cb: Seq[(Long, List[Double])]): Column =
    graft.functions.CodebookExpressions.nearestCentroidCosine(v, cb)

  /** Collect a `(centroid_id, cv)` codebook to the driver — metadata-
    * bounded (k × dim doubles); guarded so a corpus can never be
    * mistaken for a codebook.
    */
  private[sim] def collectCodebook(cents: DataFrame): Seq[(Long, List[Double])] = {
    val cb = cents.select(col("centroid_id"), col("cv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toList))
      .sortBy(_._1).toSeq
    require(cb.nonEmpty, "empty codebook")
    require(cb.length <= 65536,
      s"codebook with ${cb.length} centroids: not an inlineable codebook")
    cb
  }

  /** [[ivfAssignWith]] on the deterministic first-k codebook. */
  def ivfAssign(embs: DataFrame, nCentroids: Int): DataFrame =
    ivfAssignWith(embs, firstKCodebook(embs, nCentroids))

  /** Lloyd's k-means over the embedding corpus: the IVF codebook trainer.
    *
    * Assignment is a broadcast of the (tiny) codebook against the corpus —
    * one scan per iteration, no corpus×corpus work; new centroids are
    * per-dimension means via posexplode + two aggregations. The codebook is
    * collected to the driver between iterations (k×dim doubles) to break
    * lineage growth — the standard pattern for iterative algorithms whose
    * model fits on the driver. Deterministic init (first k vectors);
    * clusters that empty out drop from the codebook.
    */
  def kmeansCentroids(embs: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = embs.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val centSchema = StructType(Seq(
      StructField("centroid_id", LongType, nullable = false),
      StructField("cv", ArrayType(DoubleType, containsNull = false),
        nullable = false)))
    def centsDf(rows: Seq[(Long, Seq[Double])]) =
      spark.createDataFrame(
        java.util.Arrays.asList(rows.map(r => Row(r._1, r._2)): _*),
        centSchema)
    var cents: Seq[(Long, Seq[Double])] = embs.filter(col("vec_id") < k)
      .select(col("vec_id"), toDoubleVec(col("embedding")))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    for (_ <- 1 to iters) {
      val assigned = assignToCentroids(embs, centsDf(cents))
      val next = assigned
        .select(col("centroid_id"),
          posexplode(toDoubleVec(col("embedding"))))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy("centroid_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
          .as("pm"))
        .select(col("centroid_id"),
          transform(col("pm"), x => x.getField("m")).as("cv"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
      cents = next.sortBy(_._1)
    }
    centsDf(cents)
  }

  /** Nearest-centroid assignment by squared L2 distance (ties by centroid
    * id): `vec_id, embedding, centroid_id, dist2`. The codebook inlines
    * as literals (same contract as [[ivfAssignWith]]), so each k-means
    * iteration is one shuffle-free corpus projection instead of a ×k
    * fan-out through a window exchange.
    */
  def assignToCentroids(embs: DataFrame, cents: DataFrame): DataFrame = {
    val cb = collectCodebook(cents)
    val best = graft.functions.CodebookExpressions
      .nearestCentroidL2(toDoubleVec(col("embedding")), cb)
    embs.select(col("vec_id"), col("embedding"),
      best.getField("centroid_id").as("centroid_id"),
      best.getField("dist2").as("dist2"))
  }

  /** IVF search: approximate top-k for a stored query vector, scanning only
    * the `nProbe` cells whose centroids are nearest the query — the
    * query-time counterpart of [[ivfAssign]]. At corpus scale this reads
    * candidates/corpus ≈ nProbe/nCentroids of the data instead of all of it;
    * recall is bounded by cell assignment, precision is exact.
    */
  def ivfSearch(
      embs: DataFrame, queryId: Long, nCentroids: Int, nProbe: Int,
      k: Int): DataFrame =
    ivfSearchWith(embs, queryId, firstKCodebook(embs, nCentroids), nProbe, k)

  /** [[ivfSearch]] against an explicit — typically [[kmeansCentroids]]-
    * trained — codebook. A trained codebook tracks the corpus distribution,
    * so the nProbe nearest cells hold the true neighbors far more often
    * than the arbitrary first-k codebook (recall improvement verified in
    * `SimilaritySpec`).
    */
  def ivfSearchWith(
      embs: DataFrame, queryId: Long, cents: DataFrame, nProbe: Int,
      k: Int): DataFrame = {
    val assignments = ivfAssignWith(embs, cents)
      .select(col("vec_id"), col("centroid_id"))
    val q = embs.filter(col("vec_id") === queryId)
      .select(toDoubleVec(col("embedding")).as("qv"))
    val nearestCells = cents.crossJoin(broadcast(q))
      .select(col("centroid_id"),
        round(cosine(col("cv"), col("qv")), 6).as("csim"))
      .orderBy(col("csim").desc, col("centroid_id"))
      .limit(nProbe)
      .select("centroid_id")
    val candidates = assignments
      .join(broadcast(nearestCells), Seq("centroid_id"), "left_semi")
      .filter(col("vec_id") =!= queryId)
    embs.join(candidates, Seq("vec_id"), "left_semi")
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosine(toDoubleVec(col("embedding")), col("qv")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Sign-LSH code width for a corpus of `n` vectors targeting an expected
    * bucket population of `targetBucketSize`: the per-bucket pair expansion
    * is quadratic in population, so bits MUST grow with the corpus —
    * expected population n/2^bits stays <= target, keeping total candidate
    * pairs ~n*target/2 (linear in n). A fixed bits (the pre-round-4 caller
    * contract) goes quadratic at 100 TB.
    */
  def bitsForCorpus(n: Long, targetBucketSize: Int = 64): Int = {
    require(targetBucketSize > 0, "targetBucketSize must be positive")
    var bits = 1
    while (bits < 62 && (n >> bits) > targetBucketSize) bits += 1
    bits
  }

  /** [[cosineNearDupPairs]] with the code width derived from the corpus
    * size (one scalar count — never a data collect).
    */
  def cosineNearDupPairs(
      embs: DataFrame, threshold: Double, targetBucketSize: Int): DataFrame =
    cosineNearDupPairs(embs, bitsForCorpus(embs.count(), targetBucketSize),
      threshold)

  /** Embedding near-duplicate pairs: cosine >= threshold within sign-LSH
    * buckets (the scalable variant of all-pairs cosine dedup). Prefer the
    * corpus-size-derived overload; a caller-fixed `bits` must itself scale
    * with the corpus (see [[bitsForCorpus]]).
    *
    * `maxBucket` is the hot-bucket guard (see
    * `TextOps.minhashCandidatePairs`): growing `bits` bounds the EXPECTED
    * bucket population but identical embeddings share a bucket at any
    * width. Oversized buckets keep only their min vec id on the left join
    * side — each member pairs once with the hub (sim 1.0 for true dups,
    * so the edge survives the threshold and components stay connected).
    * Default 0 = exact enumeration.
    */
  def cosineNearDupPairs(
      embs: DataFrame, bits: Int, threshold: Double,
      maxBucket: Int = 0): DataFrame = {
    val b = embs.select(col("vec_id"),
      signBucket(col("embedding"), bits).as("bucket"),
      toDoubleVec(col("embedding")).as("v"))
    val left =
      if (maxBucket <= 0) b
      else {
        val stats = b.groupBy("bucket")
          .agg(min(col("vec_id")).as("__hub"), count(lit(1)).as("__bsz"))
        b.join(stats, Seq("bucket"))
          .filter(col("__bsz") <= maxBucket ||
            col("vec_id") === col("__hub"))
          .select("vec_id", "bucket", "v")
      }
    left.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(cosine(col("a.v"), col("b.v")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Per-subspace slices of the embedding: `(vec_id, m, sv)` with
    * `sv = embedding[m*subDim .. (m+1)*subDim)` for m in [0, numSub).
    * The slice set is produced by ONE posexplode over an array of slices —
    * a single pass per row, no self-joins.
    */
  def pqSubvectors(embs: DataFrame, numSub: Int, subDim: Int): DataFrame = {
    require(numSub > 0 && subDim > 0, "pq: numSub and subDim must be positive")
    val v = toDoubleVec(col("embedding"))
    val slices = array((0 until numSub).map(m =>
      slice(v, m * subDim + 1, subDim)): _*)
    embs.select(col("vec_id"), posexplode(slices).as(Seq("m", "sv")))
  }

  /** The deterministic product-quantization codebook: subspace `m`'s
    * centroids are the m-th subvectors of the first `k` stored vectors
    * (`m, centroid_id, cv`). Like [[firstKCodebook]] this is the
    * reproducible-oracle variant; training each subspace's codebook with
    * k-means over [[pqSubvectors]] output drops in the same shape.
    */
  def pqCodebook(embs: DataFrame, numSub: Int, subDim: Int, k: Int)
      : DataFrame =
    pqSubvectors(embs.filter(col("vec_id") < k), numSub, subDim)
      .select(col("m"), col("vec_id").as("centroid_id"), col("sv").as("cv"))

  /** Train a product-quantization codebook with per-subspace k-means
    * (the production path; [[pqCodebook]] is the reproducible-oracle
    * default). Each subspace trains independently on its slice of the
    * corpus via [[kmeansCentroids]] — numSub small trainings whose models
    * are k×subDim doubles each.
    */
  def pqTrainedCodebook(embs: DataFrame, numSub: Int, subDim: Int, k: Int,
      iters: Int): DataFrame = {
    val sub = pqSubvectors(embs, numSub, subDim)
    (0 until numSub).map { m =>
      kmeansCentroids(
        sub.filter(col("m") === m)
          .select(col("vec_id"), col("sv").as("embedding")), k, iters)
        .select(lit(m).as("m"), col("centroid_id"), col("cv"))
    }.reduce(_ unionAll _)
  }

  /** Squared L2 between two double vectors via three dot products,
    * quantized to 6-dp MICRO-UNIT LONGS: `floor(raw·1e6 + 0.5)`. Every
    * operation (same-order dot fold, ×1e6, +0.5, floor) is a single IEEE
    * double op, so any engine — independent of its decimal `round()`
    * implementation or double↔decimal cast version — produces the SAME
    * integer. `round(x, 6)` here was the round-7 driver-hash flag on
    * `pq_search`/`ivf_pq_search`: Java's exact-BigDecimal HALF_UP and a
    * SQL engine's double-space round disagree on half-way cells, and
    * DOUBLE→DECIMAL casts drifted across oracle-engine versions.
    */
  private def d2Micro(x: Column, c: Column): Column =
    floor((dot(x, x) - lit(2.0) * dot(x, c) + dot(c, c)) * lit(1.0e6)
      + lit(0.5))

  /** 6-dp quantized value as an exact DOUBLE: micro-unit long / 1e6.
    * Both the quantization (see [[d2Micro]]) and the final division are
    * single IEEE ops — bit-identical cross-engine, unlike `round(x, 6)`.
    */
  private[sim] def micro6(c: Column): Column =
    floor(c * lit(1.0e6) + lit(0.5)).cast("double") / lit(1.0e6)

  /** Product-quantization assignment: each vector's nearest centroid per
    * subspace (squared-L2 argmin, ties by centroid id) —
    * `(vec_id, m, centroid_id)`. The codebook (numSub*k rows) broadcasts;
    * the corpus is scanned once and fans out to numSub rows per vector.
    */
  def pqAssign(embs: DataFrame, cents: DataFrame, numSub: Int,
      subDim: Int): DataFrame = {
    val scored = pqSubvectors(embs, numSub, subDim)
      .join(broadcast(cents), Seq("m"))
      .select(col("vec_id"), col("m"), col("centroid_id"),
        d2Micro(col("sv"), col("cv")).as("dist2"))
    val w = Window.partitionBy(col("vec_id"), col("m"))
      .orderBy(col("dist2"), col("centroid_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "m", "centroid_id")
  }

  /** Product-quantization encode: pack each vector's per-subspace codes
    * into ONE BIGINT (`code = Σ_m code_m · k^m`, so k^numSub must fit 63
    * bits — e.g. 16 centroids × 8 subspaces = 32 bits). This is the stored
    * PQ index: 8 bytes/vector versus 4·dim for the raw floats (32× for
    * dim 64) — the compression that lets a 100-TB embedding corpus's index
    * live in cluster memory. The pack multiplies longs by an exact power
    * (k^m < 2^63), and the per-vector sum is order-independent.
    */
  def pqEncode(embs: DataFrame, numSub: Int, subDim: Int, k: Int)
      : DataFrame = {
    require(numSub * math.log(k.toDouble) / math.log(2) <= 62,
      s"pq: $k^$numSub codes overflow a long")
    pqEncodeWith(embs, pqCodebook(embs, numSub, subDim, k), numSub, subDim, k)
  }

  /** [[pqEncode]] against an explicit codebook. */
  def pqEncodeWith(embs: DataFrame, cents: DataFrame, numSub: Int,
      subDim: Int, k: Int): DataFrame = {
    val pq = collectPqCodebook(cents, numSub)
    val v = toDoubleVec(col("embedding"))
    embs.select(col("vec_id"),
      pqCodeCol(v, pq, numSub, subDim, k).as("code"))
  }

  /** Per-row PQ pack over an inlined per-subspace codebook: subspace m's
    * code is the lexicographic MIN of `struct(d2Micro, centroid_id)`
    * (= nearest centroid, ties to the lowest id — [[pqAssign]]'s window
    * ordering as a pure expression), packed `Σ_m code_m · k^m`. One
    * narrow projection inside whole-stage codegen — the encode never
    * fans out ×numSub or shuffles, where the [[pqAssign]] formulation
    * paid a numSub× explode, a window exchange and a re-aggregation.
    */
  private def pqCodeCol(v: Column, pq: Map[Int, Seq[(Long, List[Double])]],
      numSub: Int, subDim: Int, k: Int): Column =
    graft.functions.CodebookExpressions.pqPackCode(v, subDim, k, pq)

  /** Collect a `(m, centroid_id, cv)` PQ codebook to the driver —
    * metadata-bounded (numSub × k × subDim doubles), grouped by
    * subspace, centroids sorted by id.
    */
  private def collectPqCodebook(cents: DataFrame,
      numSub: Int): Map[Int, Seq[(Long, List[Double])]] = {
    val pq = cents
      .select(col("m").cast("int"), col("centroid_id").cast("long"),
        col("cv"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toList))
      .groupBy(_._1)
      .map { case (m, rs) =>
        m -> rs.map(t => (t._2, t._3)).sortBy(_._1).toSeq
      }
    require((0 until numSub).forall(m => pq.get(m).exists(_.nonEmpty)),
      s"pq codebook must cover subspaces 0 until $numSub, has ${pq.keys}")
    pq
  }

  /** PQ-ADC approximate search with exact re-rank — the classical two-stage
    * ANN query (Jégou et al.'s IVFADC scan stage, expressed Spark-first):
    *
    *   1. the query's per-subspace distance to every centroid forms a
    *      numSub×k LOOKUP TABLE — bounded (128 doubles here), collected
    *      once and inlined as a LITERAL array, never corpus-derived;
    *   2. each corpus vector's approximate distance is the SUM of table
    *      entries selected by the nibbles of its stored packed code —
    *      a PER-ROW expression over the 8-byte code column: the ADC scan
    *      is one narrow pass with ZERO joins and ZERO shuffles, and its
    *      `shortlist` cut plans as TakeOrdered, not a global sort;
    *   3. the shortlist re-ranks with EXACT cosine against the raw
    *      vectors — a broadcast join pulls only those rows.
    *
    * Per-subspace distances quantize to 6-dp micro-unit longs
    * ([[d2Micro]]) and accumulate as exact integers (addition order
    * irrelevant), so the shortlist cut and final ranking are
    * deterministic cross-engine. Ties break by vec_id.
    *
    * This self-contained form ENCODES the corpus first (one broadcast
    * assign + pack, the index build); production queries should store
    * [[pqEncode]]'s output once and serve repeated queries through
    * [[pqSearchIndexed]], whose cost is just the per-row code scan.
    */
  def pqSearch(embs: DataFrame, queryId: Long, numSub: Int, subDim: Int,
      k: Int, shortlist: Int, topK: Int): DataFrame =
    pqSearchWith(embs, queryId, pqCodebook(embs, numSub, subDim, k),
      numSub, subDim, k, shortlist, topK)

  /** [[pqSearch]] against an explicit — typically [[pqTrainedCodebook]]-
    * trained — codebook.
    */
  def pqSearchWith(embs: DataFrame, queryId: Long, cents: DataFrame,
      numSub: Int, subDim: Int, k: Int, shortlist: Int, topK: Int)
      : DataFrame = {
    val codes = pqEncodeWith(embs.filter(col("vec_id") =!= queryId),
      cents, numSub, subDim, k)
    pqSearchIndexed(embs, codes, queryId, cents, numSub, subDim, k,
      shortlist, topK)
  }

  /** The ADC query over a PRECOMPUTED packed-code index ([[pqEncode]]
    * output, typically a stored table): scan cost is numSub decimal adds
    * per 8-byte code row — no joins, no shuffles, no float math — plus a
    * shortlist-sized exact re-rank. This is why the index pays off: the
    * brute-force scan reads 4·dim bytes and folds dim multiplies per
    * vector; this reads 8 bytes and adds numSub table entries.
    */
  def pqSearchIndexed(embs: DataFrame, codes: DataFrame, queryId: Long,
      cents: DataFrame, numSub: Int, subDim: Int, k: Int, shortlist: Int,
      topK: Int): DataFrame = {
    val qsub = pqSubvectors(embs.filter(col("vec_id") === queryId),
      numSub, subDim).select(col("m"), col("sv").as("qsv"))
    // numSub×k query-to-centroid distances, rounded exactly like the
    // joined formulation; indexed m*k + centroid_id. Stored as MICRO-UNIT
    // LONGS (the 6-dp values scaled by 1e6): the hot scan then does
    // numSub integer lookups + adds per row — no decimal arithmetic —
    // and the exact DECIMAL(28,6) total is recovered by one final
    // power-of-ten shift (every term is an exact multiple of 1e-6, so
    // the integer sum IS the unscaled decimal).
    val lutMicros: List[Long] = cents.join(qsub, Seq("m"))
      .select(col("m"), col("centroid_id"), d2Micro(col("qsv"), col("cv")))
      .collect()
      .map(r => (r.getInt(0) * k + r.getLong(1).toInt, r.getLong(2)))
      .sortBy(_._1).map(_._2).toList
    require(lutMicros.length == numSub * k,
      s"ADC lookup table incomplete: ${lutMicros.length} of ${numSub * k}")
    val lut = typedLit(lutMicros)
    val adistTerms = (0 until numSub).map { m =>
      val cm = (col("code") / lit(math.pow(k.toDouble, m))).cast("long") % k
      element_at(lut, (lit(m * k) + cm + 1).cast("int"))
    }
    // the integer micro-sum is exact (addition order irrelevant) and the
    // single long→double divide is IEEE-identical cross-engine; a decimal
    // cast here was the round-7 driver-hash flag (double↔decimal casts
    // drift across oracle-engine versions)
    val adist = codes
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"),
        (adistTerms.reduce(_ + _).cast("double") / lit(1.0e6)).as("adist"))
      .orderBy(col("adist"), col("vec_id"))
      .limit(shortlist)
    val q = embs.filter(col("vec_id") === queryId)
      .select(toDoubleVec(col("embedding")).as("qv"))
    embs.join(broadcast(adist), Seq("vec_id"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("adist"),
        micro6(cosine(toDoubleVec(col("embedding")), col("qv"))).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(topK)
      .select("vec_id", "adist", "sim")
  }

  /** The combined IVF+PQ index — Jégou et al.'s IVFADC layout: every
    * vector carries its inverted-file CELL (cosine-nearest coarse
    * centroid) and its packed PQ code. Stored clustered by `centroid_id`,
    * a query reads only the probed cells' stripes of an 16-byte-per-vector
    * table.
    */
  def ivfPqIndex(embs: DataFrame, coarse: DataFrame, pqCents: DataFrame,
      numSub: Int, subDim: Int, k: Int): DataFrame = {
    // both codebooks inline: cell pick AND code pack are per-row
    // expressions over ONE corpus scan — no self-join on vec_id
    val cb = collectCodebook(coarse)
    val pq = collectPqCodebook(pqCents, numSub)
    val v = toDoubleVec(col("embedding"))
    embs
      .select(col("vec_id"), bestCellStruct(v, cb).as("__best"),
        pqCodeCol(v, pq, numSub, subDim, k).as("code"))
      .select(col("vec_id"), col("__best.centroid_id").as("centroid_id"),
        col("code"))
  }

  /** IVFADC search over a stored [[ivfPqIndex]]: probe the `nProbe`
    * cells whose coarse centroids are nearest the query, run the per-row
    * ADC scan ONLY over those cells' code rows (≈ nProbe/nCells of the
    * index, file-prunable when the index table clusters by cell), then
    * exact-re-rank the shortlist. With `nProbe` = all cells this equals
    * [[pqSearchIndexed]] exactly (spec-pinned).
    */
  def ivfPqSearch(embs: DataFrame, index: DataFrame, queryId: Long,
      coarse: DataFrame, pqCents: DataFrame, numSub: Int, subDim: Int,
      k: Int, nProbe: Int, shortlist: Int, topK: Int): DataFrame = {
    val q = embs.filter(col("vec_id") === queryId)
      .select(toDoubleVec(col("embedding")).as("qv"))
    val probed = coarse.crossJoin(broadcast(q))
      .select(col("centroid_id"),
        micro6(cosine(col("cv"), col("qv"))).as("csim"))
      .orderBy(col("csim").desc, col("centroid_id"))
      .limit(nProbe)
      .select("centroid_id")
    val cellCodes = index
      .join(broadcast(probed), Seq("centroid_id"), "left_semi")
      .select("vec_id", "code")
    pqSearchIndexed(embs, cellCodes, queryId, pqCents, numSub, subDim, k,
      shortlist, topK)
  }

  /** Batched IVFADC: the SERVING shape of [[ivfPqSearch]] — one plan
    * answers a whole query set instead of a driver round-trip per query.
    * Per query row (no driver LUT collect): the probe is a per-row
    * top-nProbe cell pick and the ADC table is a per-row `array<long>`
    * column ([[graft.functions.PqQueryLut]]); the (tiny) probe side
    * broadcasts against the cell-keyed index, the ADC distance is an
    * integer LUT walk per (query, candidate), and both the shortlist and
    * final top-k rank per query via `row_number` (plans as
    * WindowGroupLimit — partitions pre-prune before the exchange).
    * Per-query output is IDENTICAL to [[ivfPqSearch]] on the same
    * codebooks (spec-pinned): `(q_id, vec_id, adist, sim)`.
    */
  def ivfPqSearchBatch(embs: DataFrame, index: DataFrame,
      queryIds: Seq[Long], coarse: DataFrame, pqCents: DataFrame,
      numSub: Int, subDim: Int, k: Int, nProbe: Int, shortlist: Int,
      topK: Int): DataFrame = {
    require(queryIds.nonEmpty, "need at least one query id")
    ivfPqSearchBatchDf(embs, index,
      embs.filter(col("vec_id").isInCollection(queryIds)), coarse,
      pqCents, numSub, subDim, k, nProbe, shortlist, topK)
  }

  /** [[ivfPqSearchBatch]] with an explicit query frame
    * (`vec_id, embedding`) — the queries need not live in `embs`
    * (dedup-on-arrival probes a NEW batch against the indexed corpus).
    * Candidates matching a query's own `vec_id` are excluded, as in the
    * id-based form.
    */
  def ivfPqSearchBatchDf(embs: DataFrame, index: DataFrame,
      queries: DataFrame, coarse: DataFrame, pqCents: DataFrame,
      numSub: Int, subDim: Int, k: Int, nProbe: Int, shortlist: Int,
      topK: Int): DataFrame = {
    val cb = collectCodebook(coarse)
    val pq = collectPqCodebook(pqCents, numSub)
    val X = graft.functions.CodebookExpressions
    val v = toDoubleVec(col("embedding"))
    val qpr = queries
      .select(col("vec_id").as("q_id"), v.as("qv"),
        X.pqQueryLut(v, subDim, k, pq).as("lut"),
        explode(X.topCellsCosine(v, cb, nProbe, micro = true)).as("__p"))
      .select(col("q_id"), col("qv"), col("lut"),
        col("__p.centroid_id").as("centroid_id"))
    val wShort = Window.partitionBy(col("q_id"))
      .orderBy(col("adist"), col("vec_id"))
    val short = index.join(broadcast(qpr), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("qv"), col("vec_id"),
        (X.pqAdcFromLut(col("lut"), col("code"), numSub, k)
          .cast("double") / lit(1.0e6)).as("adist"))
      .withColumn("__rn", row_number().over(wShort))
      .filter(col("__rn") <= shortlist)
      .drop("__rn")
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    short
      .join(embs.select(col("vec_id"), v.as("ev")), Seq("vec_id"))
      .select(col("q_id"), col("vec_id"), col("adist"),
        micro6(cosine(col("ev"), col("qv"))).as("sim"))
      .withColumn("__rn", row_number().over(wTop))
      .filter(col("__rn") <= topK)
      .drop("__rn")
  }

  /** Symmetric int8 quantization of an embedding column — the standard
    * 4x storage/bandwidth compression applied before shipping a corpus's
    * vectors to an ANN index or a training job: per row, scale by
    * `127 / max|x_i|` and round each coordinate to an integer in
    * [-127, 127].
    *
    * Entirely per-row (no shuffle, nothing to co-ordinate across
    * partitions). The arithmetic is fixed-order IEEE — float→double widen,
    * one divide to form the scale, one multiply, one round-half-away —
    * so the oracle reproduces it bit-for-bit. All-zero vectors (scale
    * undefined) quantize to all zeros rather than NaN.
    */
  def quantizeInt8(embs: DataFrame, vecCol: String): DataFrame = {
    val v = toDoubleVec(col(vecCol))
    val maxAbs = array_max(transform(v, x => abs(x)))
    embs
      .withColumn("__m", maxAbs)
      .withColumn(
        "qvec",
        when(col("__m") === 0d,
          transform(v, _ => lit(0L)))
          .otherwise(transform(v,
            x => round(x * (lit(127d) / col("__m"))).cast("long"))))
      .drop("__m")
  }

  /** SemDeDup-style semantic deduplication: cluster the corpus into IVF
    * cells (broadcast codebook, one scan), compare vectors ONLY within
    * their cell, and prune every vector that has a LOWER-id neighbor at
    * or above `simThreshold` in the same cell (min-id survivor; the
    * witness may itself be pruned — the same deterministic greedy rule
    * MinHash-LSH dedup uses). The quadratic term is bounded by cell
    * population (corpus/k on average), never corpus² — the SemDeDup
    * trick: embeddings make "different words, same meaning" dedup a
    * clustered geometric problem instead of an all-pairs one.
    *
    * Returns every vector with its cell, keep flag, and (for pruned
    * rows) the min-id witness and the rounded max in-cell similarity.
    */
  /** `maxCell` is the hot-cell guard (the embedding twin of
    * `TextOps.minhashCandidatePairs`' `maxBucket`): a crowd of identical
    * or near-identical embeddings (boilerplate docs embed identically)
    * lands in ONE cell and the within-cell pairing is quadratic in its
    * population. With `maxCell > 0`, a cell above the cap restricts the
    * WITNESS side to two rows per member: the cell's MIN vec id (keeps a
    * cross-crowd witness path) and the min id of the member's
    * EXACT-vector group (identical embeddings always witness each other
    * at sim 1.0) — so a true-duplicate crowd still collapses to its
    * min-id survivor exactly as uncapped, at linear instead of quadratic
    * pair cost; merely-similar members of an oversized cell lose non-hub
    * witnesses (documented recall trade). `maxCell = 0` (default) keeps
    * the exact enumeration the battery certifies.
    */
  def semanticDedup(embs: DataFrame, nCentroids: Int,
      simThreshold: Double, maxCell: Int = 0): DataFrame = {
    // one corpus scan carries both the cell and the vector — no join
    // back to the embeddings
    val a = ivfAssignCarry(embs, firstKCodebook(embs, nCentroids))
      .select(col("vec_id"), col("centroid_id"), col("ev"))
    val assign = a.select(col("vec_id"), col("centroid_id"))
    val lAll = a.select(col("centroid_id"), col("vec_id").as("id_a"),
      col("ev").as("va"))
    val l =
      if (maxCell <= 0) lAll
      else {
        val stats = lAll.groupBy("centroid_id")
          .agg(min(col("id_a")).as("__hub"), count(lit(1)).as("__csz"))
        val gmin = lAll.groupBy("centroid_id", "va")
          .agg(min(col("id_a")).as("__gmin"), count(lit(1)).as("__gsz"))
        // witnesses in an oversized cell: the cell hub, plus the min id
        // of each MULTI-member exact-vector group (a unique vector is
        // trivially its own group min — admitting it would keep every
        // member a witness and make the cap a no-op)
        lAll.join(stats, Seq("centroid_id"))
          .join(gmin, Seq("centroid_id", "va"))
          .filter(col("__csz") <= maxCell ||
            col("id_a") === col("__hub") ||
            (col("id_a") === col("__gmin") && col("__gsz") > 1))
          .select("centroid_id", "id_a", "va")
      }
    val r = a.select(col("centroid_id"), col("vec_id").as("id_b"),
      col("ev").as("vb"))
    val dup = l.join(r, Seq("centroid_id"))
      .filter(col("id_a") < col("id_b"))
      // micro6, not round(): the threshold cut and max() witness must not
      // sit on an engine-version-dependent half-way cell
      .withColumn("sim", micro6(cosine(col("va"), col("vb"))))
      .filter(col("sim") >= simThreshold)
    val pruned = dup.groupBy(col("id_b").as("vec_id"))
      .agg(min(col("id_a")).as("dup_of"), max(col("sim")).as("max_sim"))
    assign.join(pruned, Seq("vec_id"), "left")
      .select(col("vec_id"), col("centroid_id"),
        col("dup_of").isNull.as("keep"), col("dup_of"), col("max_sim"))
  }
}
