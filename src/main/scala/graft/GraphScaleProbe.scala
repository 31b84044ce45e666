package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Giant-regime graph-iteration probe: pageRank and hopDistances forced
  * onto the SHUFFLE-JOIN path (`broadcastMaxNodes = 0` — the 100-TB
  * regime where the rank/reach vector cannot broadcast) over a synthetic
  * power-law-ish graph, timing the full iteration loop. The measured
  * object is the per-round exchange structure: with the edge cache
  * hash-partitioned on the join key the steady-state round carries ONE
  * exchange (the contribution aggregation); an edge re-exchange per
  * round shows up directly in these times at this edge count.
  *
  * `runMain graft.GraphScaleProbe [edges] [iters]` (defaults 5M, 5) —
  * A/B protocol as in BASELINE.md: paired back-to-back runs (git stash
  * the candidate), min per arm; results recorded in BASELINE.md.
  */
object GraphScaleProbe {
  def main(args: Array[String]): Unit = {
    val nEdges = if (args.length > 0) args(0).toLong else 5000000L
    val iters = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // the regime under test is "the rank/reach vector CANNOT broadcast"
      // (1e9-node graphs); at probe scale AQE would happily broadcast a
      // 500k-row vector and neither arm would ever exchange the edge
      // table — disable broadcast so the probe exercises the shuffle-join
      // rounds the flag models
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // hub-skewed directed graph: dst = id % sqrt-ish modulus so in-degrees
    // skew, src spread uniform; string ids match the operator contract
    val m = math.max(1000L, math.sqrt(nEdges.toDouble).toLong)
    val edges = spark.range(nEdges).select(
      concat(lit("n"), (col("id") % (nEdges / 10)).cast("string")).as("src"),
      concat(lit("n"), pmod(xxhash64(col("id")), lit(m)).cast("string"))
        .as("dst"))
    (1 to 2).foreach { rep =>
      var t0 = System.nanoTime
      val pr = graft.graph.GraphOps.pageRank(edges, iters,
        broadcastMaxNodes = 0)
      val nPr = pr.count()
      val prS = (System.nanoTime - t0) / 1e9
      spark.catalog.clearCache()
      t0 = System.nanoTime
      val hd = graft.graph.GraphOps.hopDistances(edges, Seq("n1"), iters,
        broadcastMaxNodes = 0)
      val nHd = hd.count()
      val hdS = (System.nanoTime - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[gprobe] rep=$rep edges=$nEdges iters=$iters " +
        f"pagerank=$prS%.2fs (nodes=$nPr) hop=$hdS%.2fs (reached=$nHd)")
    }
    spark.stop()
  }
}
