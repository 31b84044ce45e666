package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SplitOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("hashSplit is a pure function of the key and covers 0-99") {
    val d = (0L until 1000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val s1 = SplitOps.hashSplit(d, "doc_id").select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    // re-run over a REORDERED, GROWN corpus: existing assignments frozen
    val d2 = (1999L to 0L by -1L).map(i => (i, s"x$i")).toDF("doc_id", "text")
    val s2 = SplitOps.hashSplit(d2, "doc_id").select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    s1.foreach { case (id, sp) => assert(s2(id) == sp) }
    // weights land near 80/10/10 (hash uniformity, loose band)
    val n = s1.size.toDouble
    val frac = s1.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.06, frac)
    assert(math.abs(frac("val") - 0.1) < 0.05, frac)
    assert(math.abs(frac("test") - 0.1) < 0.05, frac)
    // buckets in range, split matches its bucket's threshold range
    val b = SplitOps.hashSplit(d, "doc_id")
      .select("split_bucket", "split").as[(Long, String)].collect()
    assert(b.forall { case (x, _) => x >= 0 && x < 100 })
    assert(b.forall { case (x, s) =>
      (x < 80 && s == "train") || (x >= 80 && x < 90 && s == "val") ||
        (x >= 90 && s == "test") })
  }

  test("hashSplit stays exact for keys beyond 2^32 (no overflow)") {
    val big = Seq(5000000000L, Long.MaxValue - 1, 4294967296L * 7 + 13)
      .map(i => (i, "t")).toDF("doc_id", "text")
    val out = SplitOps.hashSplit(big, "doc_id")
      .select("doc_id", "split_bucket").as[(Long, Long)].collect().toMap
    // the key reduces mod 2^31 first: key and key+k*2^31 share a bucket
    out.foreach { case (id, bkt) =>
      val expect = ((id % 2147483648L) * 2654435761L) % 4294967296L % 100
      assert(bkt == expect, s"$id")
    }
  }

  test("hashSplit refuses weights that do not sum to 100") {
    intercept[IllegalArgumentException] {
      SplitOps.hashSplit(docs((1L, "a")), "doc_id", Seq("train" -> 50))
    }
  }

  test("leakageSafeSplit co-assigns every near-dup pair") {
    // three exact-ish near-dup families plus singletons
    val d = docs(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"),
      (3L, "a b c d e f g x"),
      (10L, "p q r s t u v w"), (11L, "p q r s t u v w"),
      (20L, "lone wolf document one"),
      (21L, "another unrelated text here"))
    val pairs = TextOps.lshNearDupPairs(d, 3, rows = 2, num = 8, den = 10)
    val clusters = TextOps.dedupClusters(pairs)
    val split = SplitOps.leakageSafeSplit(d, clusters)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    pairs.select("doc_a", "doc_b").as[(Long, Long)].collect()
      .foreach { case (a, b) =>
        assert(split(a) == split(b), s"pair ($a,$b) crossed splits") }
    // every doc is assigned
    assert(split.size == 7)
    // singletons use their own id as key
    val keys = SplitOps.leakageSafeSplit(d, clusters)
      .select("doc_id", "split_key").as[(Long, Long)].collect().toMap
    assert(keys(20L) == 20L && keys(21L) == 21L)
  }

  test("mixtureSample keeps nested samples as rates rise") {
    val d = (0L until 500L).map(i => (i, s"s${i % 4}", s"t$i"))
      .toDF("doc_id", "source", "text")
    def kept(r: Map[String, Int]) =
      SplitOps.mixtureSample(d, "source", "doc_id", r, defaultRate = 0)
        .select("doc_id").as[Long].collect().toSet
    val lo = kept(Map("s0" -> 20))
    val hi = kept(Map("s0" -> 60))
    assert(lo.subsetOf(hi), "raising a rate must only ADD docs")
    // rate 0 drops everything from that source; default applies to rest
    val out = SplitOps.mixtureSample(d, "source", "doc_id",
      Map("s1" -> 0), defaultRate = 100)
      .select("source").as[String].collect()
    assert(!out.contains("s1") && out.nonEmpty)
    intercept[IllegalArgumentException] {
      SplitOps.mixtureSample(d, "source", "doc_id", Map("s0" -> 101))
    }
  }

  test("ngramDecontaminate matches a brute-force shared-gram count") {
    val hold = docs((100L, "the quick brown fox jumps over the lazy dog"))
    val train = docs(
      (1L, "xx the quick brown fox jumps yy"), // shares 5-grams
      (2L, "the quick brown cat sleeps all day"), // no shared 5-gram
      (3L, "quick brown fox jumps over the lazy dog extra")) // shares many
    val out = SplitOps.ngramDecontaminate(train, hold, 5)
      .as[(Long, Long)].collect().toMap
    def grams(t: String) =
      t.split(" ").sliding(5).map(_.mkString(" ")).toSet
    val hg = grams("the quick brown fox jumps over the lazy dog")
    val expect = Map(
      1L -> grams("xx the quick brown fox jumps yy").count(hg),
      3L -> grams("quick brown fox jumps over the lazy dog extra").count(hg))
      .filter(_._2 > 0).view.mapValues(_.toLong).toMap
    assert(out == expect)
    assert(!out.contains(2L))
  }

  test("ngramDecontaminate counts distinct grams once per doc") {
    // the same shared gram repeated in a doc counts ONCE
    val hold = docs((9L, "a b c d e"))
    val train = docs((1L, "a b c d e z a b c d e"))
    val out = SplitOps.ngramDecontaminate(train, hold, 5)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L))
  }
}
