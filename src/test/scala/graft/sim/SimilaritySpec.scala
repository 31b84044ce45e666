package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"
  lazy val embs = spark.read.parquet(s"$sf/embeddings.parquet")

  test("dot and cosine on known vectors") {
    val d = Seq((1L, Seq(1.0f, 2.0f, 2.0f)), (2L, Seq(2.0f, 4.0f, 4.0f)),
      (3L, Seq(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = d.filter($"vec_id" === 1).select(
      Similarity.toDoubleVec(col("embedding")).as("qv"))
    val sims = d.crossJoin(q).select(col("vec_id"),
      Similarity.cosine(Similarity.toDoubleVec(col("embedding")), col("qv"))
        .as("sim")).as[(Long, Double)].collect().toMap
    assert(math.abs(sims(1L) - 1.0) < 1e-12)
    assert(math.abs(sims(2L) - 1.0) < 1e-12, "colinear => cosine 1")
    assert(math.abs(sims(3L) - (-1.0 / 3.0)) < 1e-12)
  }

  test("cosineTopK matches a naive in-test computation") {
    val rows = embs.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect()
    val q = rows.find(_._1 == 0L).get._2.map(_.toDouble)
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = rows.filter(_._1 != 0L)
      .map { case (id, v) =>
        (id, BigDecimal(cos(v.map(_.toDouble), q))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSeq
    val got = Similarity.cosineTopK(embs, 0L, 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == expected)
  }

  test("hardNegatives: same-label excluded, ranked by sim, self allowed out") {
    val d = Seq(
      (0L, Seq(1.0f, 0.0f), 1),   // anchor, label 1
      (1L, Seq(1.0f, 0.1f), 1),   // same label: must never appear
      (2L, Seq(0.9f, 0.1f), 2),   // hard negative (closest, wrong label)
      (3L, Seq(0.0f, 1.0f), 2),   // easy negative
      (4L, Seq(0.8f, 0.3f), 3))   // mid negative
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(d, Seq(0L), 2)
      .select("q_id", "vec_id", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(got == Set((0L, 2L, 1), (0L, 4L, 2)))
  }

  test("hardNegatives: real corpus rows never share the anchor's label") {
    val got = Similarity.hardNegatives(embs, Seq(0L, 1L), 5)
    val labels = embs.select(col("vec_id"), col("label")).as[(Long, Int)]
      .collect().toMap
    val rows = got.select("q_id", "vec_id").as[(Long, Long)].collect()
    assert(rows.length == 10)
    assert(rows.forall { case (q, v) => labels(q) != labels(v) })
  }

  test("signBucket splits corpus into expected code space") {
    val got = Similarity.signBuckets(embs, 8)
    assert(got.count() == embs.count())
    val buckets = got.select("bucket").as[Long].collect()
    assert(buckets.forall(b => b >= 0 && b < 256))
    assert(buckets.distinct.length > 10, "64-dim random vecs spread buckets")
  }

  test("ivfAssign: centroids assign to themselves with sim 1") {
    val own = Similarity.ivfAssign(embs, 16)
      .filter($"vec_id" < 16)
      .select("vec_id", "centroid_id", "sim")
      .as[(Long, Long, Double)].collect()
    assert(own.length == 16)
    own.foreach { case (v, c, s) => assert(v == c && s == 1.0) }
  }

  test("ivfSearch: exact on probed cells, reasonable recall vs brute force") {
    val approx = Similarity.ivfSearch(embs, 0L, 16, 4, 10)
      .select("vec_id").as[Long].collect().toSet
    val exact = Similarity.cosineTopK(embs, 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    assert(approx.size == 10)
    val recall = (approx & exact).size / 10.0
    assert(recall >= 0.3, s"suspiciously low ivf recall: $recall")
    // probing ALL cells must reproduce brute force exactly
    val full = Similarity.ivfSearch(embs, 0L, 16, 16, 10)
      .select("vec_id").as[Long].collect().toSet
    assert(full == exact)
  }

  test("kmeans recovers planted clusters") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(7)
    val centers = Seq(Seq(10f, 0f, 0f), Seq(0f, 10f, 0f), Seq(0f, 0f, 10f))
    val pts = (0 until 90).map { i =>
      val c = centers(i % 3)
      Row(i.toLong, c.map(x => x + rnd.nextFloat() * 0.5f), i % 3)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, false), nullable = false),
      StructField("label", IntegerType, nullable = false)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(pts: _*), schema)
    val cents = Similarity.kmeansCentroids(df, 3, 5)
    assert(cents.count() == 3)
    // every point must sit with all points of its own planted cluster
    val assigned = Similarity.assignToCentroids(df, cents)
      .join(df.select("vec_id", "label"), "vec_id")
      .select("label", "centroid_id").as[(Int, Long)].collect()
    val byLabel = assigned.groupBy(_._1).values
    byLabel.foreach(grp =>
      assert(grp.map(_._2).distinct.length == 1,
        s"planted cluster split: ${grp.toSeq}"))
  }

  test("cosineNearDupPairs returns only in-bucket pairs above threshold") {
    val pairs = Similarity.cosineNearDupPairs(embs, 6, 0.4)
      .as[(Long, Long, Double)].collect()
    pairs.foreach { case (a, b, s) => assert(a < b && s >= 0.4) }
  }

  test("bitsForCorpus bounds the expected bucket population") {
    // expected population n/2^bits must be <= target for every n
    for (n <- Seq(100L, 1000L, 1000000L, 10000000000L);
         target <- Seq(16, 64, 256)) {
      val bits = Similarity.bitsForCorpus(n, target)
      assert((n >> bits) <= target,
        s"n=$n target=$target bits=$bits leaves ${n >> bits} per bucket")
      // and bits is minimal (one fewer would blow the target), so the
      // code space is not oversized either
      if (bits > 1)
        assert((n >> (bits - 1)) > target, s"bits oversized for n=$n")
    }
    // corpus-size-derived overload: actual mean population within 4x of
    // target on the real (roughly sign-balanced) embedding corpus
    val n = embs.count()
    val bits = Similarity.bitsForCorpus(n, 16)
    val sizes = Similarity.signBuckets(embs, bits)
      .select("bucket").groupBy("bucket").count()
      .select("count").as[Long].collect()
    assert(sizes.sum == n)
    assert(sizes.sum.toDouble / sizes.length <= 16 * 4,
      s"mean bucket population ${sizes.sum.toDouble / sizes.length}")
    val derived = Similarity.cosineNearDupPairs(embs, 0.4, 16)
      .as[(Long, Long, Double)].collect()
    derived.foreach { case (a, b, s) => assert(a < b && s >= 0.4) }
  }

  test("trained IVF codebook beats the first-k codebook on recall") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // Two well-separated clusters; the FIRST k vectors all sit in cluster
    // A, so the first-k codebook is degenerate (both centroids in A) and
    // nProbe=1 search splits cluster B across cells arbitrarily. Lloyd's
    // iterations must separate the clusters and recover full recall.
    val rnd = new scala.util.Random(11)
    def jitter(c: Seq[Float]) = c.map(x => x + rnd.nextFloat() * 0.2f)
    // Clusters: A around (10,0,.5,0), B around (0,10,z,0) with z spread
    // over [-1,1]. The first TWO stored vectors are A-members split only
    // by z sign — so the first-k codebook's two cells cut the corpus on
    // the z axis, which is NOISE with respect to true similarity. The
    // query sits at z=0, the middle of B's spread: its true neighbors
    // straddle the z boundary, so nProbe=1 search on the degenerate
    // codebook misses the half on the other side. Lloyd's iterations
    // escape the degenerate init (A is biased to z=+.5, so the z-split is
    // unstable) and converge to one-cell-per-cluster, restoring recall.
    val pts =
      Seq(Row(0L, Seq(10f, 0f, 1f, 0f)), Row(1L, Seq(10f, 0f, -1f, 0f))) ++
      (2 until 27).map(i => Row(i.toLong, jitter(Seq(10f, 0f, 0.5f, 0f)))) ++
      (27 until 52).map(i =>
        Row(i.toLong, Seq(0f, 10f, (i - 39) / 12.0f, 0f)))
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, false), nullable = false)))
    val df = spark.createDataFrame(java.util.Arrays.asList(pts: _*), schema)

    val queryId = 39L // the z=0 midpoint of cluster B
    val exact = Similarity.cosineTopK(df, queryId, 10)
      .select("vec_id").as[Long].collect().toSet
    assert(exact.forall(_ >= 27L), "true neighbors are the B-cluster mates")

    def recall(cents: org.apache.spark.sql.DataFrame): Double = {
      val got = Similarity.ivfSearchWith(df, queryId, cents, nProbe = 1, k = 10)
        .select("vec_id").as[Long].collect().toSet
      (got & exact).size / 10.0
    }
    val firstK = recall(Similarity.firstKCodebook(df, 2))
    val trained = recall(Similarity.kmeansCentroids(df, 2, 5))
    assert(firstK <= 0.7, s"degenerate codebook should lose neighbors " +
      s"across the z boundary, got recall $firstK")
    assert(trained == 1.0, s"trained codebook recall $trained")
  }

  test("quantizeInt8: symmetric scale, zero-vector guard, range bound") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, false), nullable = false)))
    val df = spark.createDataFrame(java.util.Arrays.asList(
      Row(0L, Seq(2.0f, -4.0f, 1.0f)),
      Row(1L, Seq(0.0f, 0.0f, 0.0f))), schema)
    val got = Similarity.quantizeInt8(df, "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Long](r.fieldIndex("qvec")).toList).toMap
    // scale = 127/4 = 31.75: 2 -> round(63.5) = 64, -4 -> -127, 1 -> 32
    assert(got(0L) == List(64L, -127L, 32L))
    assert(got(1L) == List(0L, 0L, 0L), "all-zero vector quantizes to zeros")
    assert(got.values.flatten.forall(q => q >= -127L && q <= 127L))
  }

  test("semanticDecontaminate flags planted leaks, spares orthogonal vectors") {
    val train = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),   // exact copy of eval vec -> sim 1.0
      (2L, Seq(0.9f, 0.1f, 0.0f)),   // near-copy -> high sim
      (3L, Seq(0.0f, 0.0f, 1.0f)))   // orthogonal to all eval -> sim 0
      .toDF("vec_id", "embedding")
    val holdout = Seq(
      (100L, Seq(1.0f, 0.0f, 0.0f)),
      (101L, Seq(0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.semanticDecontaminate(train, holdout, 0.9)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == Set(1L, 2L), s"expected leaks {1,2}, got $got")
    assert(got(1L) == 1.0)
    assert(got(2L) > 0.99, "max over eval vecs, not any single one")
  }

  test("pqEncode: codebook vectors encode to their own repeated code") {
    val got = Similarity.pqEncode(embs, numSub = 8, subDim = 8, k = 16)
    assert(got.count() == embs.count())
    // vec i < 16 is its own nearest centroid in EVERY subspace, so its
    // packed code is i replicated across all 8 nibbles: i * 0x11111111
    val own = got.filter($"vec_id" < 16)
      .as[(Long, Long)].collect().toMap
    (0L until 16L).foreach(i => assert(own(i) == i * 0x11111111L))
    val codes = got.select("code").as[Long].collect()
    assert(codes.forall(c => c >= 0L && c < (1L << 32)))
  }

  test("pqSearch with corpus-wide shortlist degrades to exact top-k") {
    val exact = Similarity.cosineTopK(embs, 0L, 10)
      .select("vec_id").as[Long].collect().toSeq
    val pq = Similarity.pqSearch(embs, 0L, numSub = 8, subDim = 8, k = 16,
      shortlist = 1000, topK = 10)
      .select("vec_id").as[Long].collect().toSeq
    assert(pq == exact,
      "shortlist covering the corpus must re-rank to the exact result")
  }

  test("pqSearch: bounded shortlist keeps shape and descending order") {
    val got = Similarity.pqSearch(embs, 0L, numSub = 8, subDim = 8, k = 16,
      shortlist = 50, topK = 10)
      .select("vec_id", "sim").as[(Long, Double)].collect()
    assert(got.length == 10)
    assert(got.map(_._2).sliding(2).forall(p => p(0) >= p(1)),
      "re-ranked sims must be non-increasing")
    assert(!got.map(_._1).contains(0L), "query never returns itself")
  }

  test("pqSearchIndexed over stored codes equals the self-contained search") {
    val dir = java.nio.file.Files.createTempDirectory("pqidx").toString
    Similarity.pqEncode(embs, 8, 8, 16)
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val fromIndex = Similarity.pqSearchIndexed(embs, stored, 0L,
      Similarity.pqCodebook(embs, 8, 8, 16), 8, 8, 16, 50, 10)
      .as[(Long, Double, Double)].collect().toSeq
    val direct = Similarity.pqSearch(embs, 0L, 8, 8, 16, 50, 10)
      .as[(Long, Double, Double)].collect().toSeq
    assert(fromIndex == direct,
      "stored-code ADC must reproduce the inline search exactly")
  }

  test("ivfPqSearch: all-cells probe equals the plain indexed PQ search") {
    val coarse = Similarity.firstKCodebook(embs, 16)
    val pqc = Similarity.pqCodebook(embs, 8, 8, 16)
    val index = Similarity.ivfPqIndex(embs, coarse, pqc, 8, 8, 16)
    val full = Similarity.ivfPqSearch(embs, index, 0L, coarse, pqc,
      8, 8, 16, nProbe = 16, shortlist = 50, topK = 10)
      .as[(Long, Double, Double)].collect().toSeq
    val plain = Similarity.pqSearchIndexed(embs,
      index.select("vec_id", "code"), 0L, pqc, 8, 8, 16, 50, 10)
      .as[(Long, Double, Double)].collect().toSeq
    assert(full == plain, "probing every cell must equal the full scan")
    // a bounded probe returns valid, correctly-shaped results from a
    // strict subset of the index
    val narrow = Similarity.ivfPqSearch(embs, index, 0L, coarse, pqc,
      8, 8, 16, nProbe = 4, shortlist = 50, topK = 10)
      .select("vec_id", "sim").as[(Long, Double)].collect()
    assert(narrow.length == 10)
    assert(narrow.map(_._2).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("trained PQ codebook matches or beats first-k on recall@10") {
    val exact = Similarity.cosineTopK(embs, 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    def recall(cents: org.apache.spark.sql.DataFrame) =
      Similarity.pqSearchWith(embs, 0L, cents, numSub = 8, subDim = 8,
        k = 16, shortlist = 50, topK = 10)
        .select("vec_id").as[Long].collect().toSet.intersect(exact).size
    val firstK = recall(Similarity.pqCodebook(embs, 8, 8, 16))
    val trained = recall(Similarity.pqTrainedCodebook(embs, 8, 8, 16,
      iters = 3))
    assert(trained >= firstK,
      s"trained codebook recall $trained < first-k recall $firstK")
    assert(trained >= 5, s"trained recall@10 unreasonably low: $trained")
  }

  test("rrfFuse combines two rank lists, absent sides contribute zero") {
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rnk")
    val sem = Seq((20L, 1), (40L, 2)).toDF("vec_id", "rnk")
    val got = Similarity.rrfFuse(lex, sem, k = 60, topK = 10)
      .select("id", "rrf", "rnk")
      .as[(Long, Double, Int)].collect().sortBy(_._3)
    // doc 20 is in both lists (rank 2 + rank 1): best fused score
    assert(got.head._1 == 20L)
    assert(math.abs(got.head._2 - (1.0 / 62 + 1.0 / 61)) < 1e-9)
    // singles follow by their own rank; ranks are a permutation
    assert(got.map(_._1).toSeq == Seq(20L, 10L, 40L, 30L),
      got.mkString(", "))
    assert(got.map(_._3).toSeq == Seq(1, 2, 3, 4))
  }

  test("semanticDedup prunes planted duplicates to the min-id survivor") {
    // plant: 900/901 duplicate vec 5 exactly; 902 is its near-copy
    val planted = embs.unionByName(
      embs.filter(col("vec_id") === 5L).select(lit(900L).as("vec_id"),
        col("embedding"), col("label"))
        .unionByName(embs.filter(col("vec_id") === 5L)
          .select(lit(901L).as("vec_id"), col("embedding"),
            col("label"))))
    val got = Similarity.semanticDedup(planted, 16, 0.9999)
      .as[(Long, Long, Boolean, Option[Long], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got(5L)._3, "min-id copy survives")
    assert(!got(900L)._3 && got(900L)._4.contains(5L))
    assert(!got(901L)._3 && got(901L)._4.contains(5L))
    // high threshold: nothing else in the synthetic corpus collides
    assert(got.valuesIterator.count(!_._3) == 2)
    // partitioning-independence of the whole pipeline
    val rep = Similarity.semanticDedup(planted.repartition(7), 16, 0.9999)
      .as[(Long, Long, Boolean, Option[Long], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(rep == got)
  }

  test("cosineNearDupPairs maxBucket caps identical-embedding crowds") {
    val crowd = embs.filter(col("vec_id") === 5L)
    val planted = embs.unionByName(
      spark.range(900, 960).crossJoin(crowd.drop("vec_id"))
        .select($"id".as("vec_id"), $"embedding", $"label"))
    val capped = Similarity.cosineNearDupPairs(planted, 8, 0.9999,
      maxBucket = 30)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val uncapped = Similarity.cosineNearDupPairs(planted, 8, 0.9999)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(uncapped))
    // the crowd {5, 900..959} sits in one bucket (identical sign pattern):
    // capped emits only hub edges from the bucket min; every crowd member
    // still pairs with that hub at sim 1.0
    val crowdIds = Set(5L) ++ (900L until 960L)
    val inCrowd = capped.filter(p => crowdIds(p._1) && crowdIds(p._2))
    val hub = inCrowd.map(_._1).min
    assert(inCrowd == crowdIds.filter(_ != hub).map(x =>
      (math.min(hub, x), math.max(hub, x))))
    assert(uncapped.count(p => crowdIds(p._1) && crowdIds(p._2)) ==
      61 * 60 / 2)
  }

  test("semanticDedup maxCell keeps identical-crowd verdicts, bounds pairs") {
    // 90 identical copies of vec 5: one hot cell; hub = min planted id
    val crowd = embs.filter(col("vec_id") === 5L)
    val planted = embs.unionByName(
      spark.range(900, 990).crossJoin(crowd.drop("vec_id"))
        .select($"id".as("vec_id"), $"embedding", $"label"))
    val exact = Similarity.semanticDedup(planted, 16, 0.9999)
      .as[(Long, Long, Boolean, Option[Long], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val capped = Similarity.semanticDedup(planted, 16, 0.9999, maxCell = 40)
      .as[(Long, Long, Boolean, Option[Long], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    // identical-crowd verdicts unchanged: every copy still dups to vec 5
    (900L until 990L).foreach { id =>
      assert(!capped(id)._3 && capped(id)._4.contains(5L), s"vec $id")
      assert(capped(id) == exact(id), s"vec $id verdict changed")
    }
    assert(capped(5L)._3, "min-id survivor keeps")
    // rows and cells agree everywhere; only non-hub witnesses may drop
    assert(capped.keySet == exact.keySet)
    capped.foreach { case (id, row) =>
      assert(row._2 == exact(id)._2, s"cell moved for $id")
      if (row._4.isDefined)
        assert(exact(id)._4.isDefined, s"cap invented a dup for $id")
    }
    // the cap must genuinely shrink the witness side on oversized cells
    // of UNIQUE vectors (regression: a group-min clause that admits
    // every unique vector as its own witness makes the cap a no-op):
    // at a low threshold, some merely-similar dup loses its witness
    val lowExact = Similarity.semanticDedup(planted, 4, 0.3)
      .as[(Long, Long, Boolean, Option[Long], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val lowCapped = Similarity.semanticDedup(planted, 4, 0.3, maxCell = 40)
      .as[(Long, Long, Boolean, Option[Long], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(lowCapped != lowExact,
      "cap over 4 cells of ~150 unique vectors must drop some witness")
    assert(lowCapped.valuesIterator.count(!_._3) <=
      lowExact.valuesIterator.count(!_._3), "cap can only lose dups")
  }

  test("semanticDecontaminateIvf: all-cells probe equals the broadcast scan") {
    val train = embs.filter(pmod(col("vec_id"), lit(50L)) =!= 0)
    val hold = embs.filter(pmod(col("vec_id"), lit(50L)) === 0)
    val exact = Similarity.semanticDecontaminate(train, hold, 0.3)
      .as[(Long, Double)].collect().toMap
    val got = Similarity
      .semanticDecontaminateIvf(train, hold, 0.3, nCells = 8, nProbe = 8)
      .select("vec_id", "max_sim").as[(Long, Double)].collect().toMap
    assert(got.keySet == exact.keySet,
      s"flag sets differ: ${got.keySet.diff(exact.keySet)} / ${exact.keySet.diff(got.keySet)}")
    got.foreach { case (id, s) =>
      assert(math.abs(s - exact(id)) <= 1.001e-6, s"vec $id: $s vs ${exact(id)}")
    }
    assert(got.nonEmpty, "fixture must actually flag something")
  }

  test("semanticDecontaminateIvf: narrow probe flags a subset, never more") {
    val train = embs.filter(pmod(col("vec_id"), lit(50L)) =!= 0)
    val hold = embs.filter(pmod(col("vec_id"), lit(50L)) === 0)
    val exact = Similarity.semanticDecontaminate(train, hold, 0.3)
      .as[(Long, Double)].collect().toMap
    val narrow = Similarity
      .semanticDecontaminateIvf(train, hold, 0.3, nCells = 8, nProbe = 2)
      .select("vec_id", "max_sim").as[(Long, Double)].collect().toMap
    assert(narrow.keySet.subsetOf(exact.keySet),
      "cell restriction can only LOSE witnesses")
    narrow.foreach { case (id, s) =>
      assert(s <= exact(id) + 1.001e-6, s"vec $id: subset max above full max")
    }
    // partitioning-independence (the hazard class DeterminismProbe pins)
    val rep = Similarity
      .semanticDecontaminateIvf(train.repartition(7), hold.repartition(3),
        0.3, nCells = 8, nProbe = 2)
      .select("vec_id", "max_sim").as[(Long, Double)].collect().toMap
    assert(rep == narrow)
  }

  test("mmrSelect diversifies a redundant shortlist") {
    // query 0 at e1; ids 1,2 nearly duplicate each other close to the
    // query; id 3 is a distinct direction with lower relevance. Pure
    // relevance ranks (1, 2, 3); at diversity weight 7/10 the near-dup's
    // ~1.0 penalty outweighs its relevance edge and id 3 moves up.
    val d = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f)), (2L, Seq(0.9f, 0.11f)),
      (3L, Seq(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val mmr = Similarity.mmrSelect(d, 0L, n = 3, k = 3,
      lambdaNum = 3, lambdaDen = 10)
      .select("vec_id", "rank").as[(Long, Long)].collect().toMap
    assert(mmr == Map(1L -> 1L, 2L -> 3L, 3L -> 2L))
  }

  test("mmrSelect with lambda=1 degenerates to pure relevance order") {
    val byRel = Similarity.cosineTopK(embs, 0L, 6)
      .select("vec_id").as[Long].collect().toSeq
    val mmr = Similarity.mmrSelect(embs, 0L, n = 6, k = 6,
      lambdaNum = 1, lambdaDen = 1)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(mmr == byRel)
  }

  test("mmrSelect is partitioning-independent") {
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.mmrSelect(d, 0L, n = 12, k = 5)
        .orderBy("rank").collect().map(_.toString).toSeq
    assert(run(embs.coalesce(1)) == run(embs.repartition(9)))
  }
}
