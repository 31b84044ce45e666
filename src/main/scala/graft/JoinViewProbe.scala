package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cdc.MaintainedJoin
import graft.table.CowTable

/** Maintained-join cost probe: what [[MaintainedJoin.refresh]] costs per
  * churn window vs recomputing the join. Builds a 1M-row fact ⟕ 15k-dim
  * view, Z-orders it on (A-key, fk) — the layout that serves BOTH
  * maintenance probes — then measures three refresh shapes:
  *
  *   1. fact-only churn (the common case: orders stream in, dims sit
  *      still): no view scan at all — feed + dim point-lookup + rewrite
  *      of the files the churned keys live in;
  *   2. dim-only churn: pays ONE view scan to find affected rows (the
  *      price of fk-probe discovery without a secondary index — the
  *      scan is the map phase of one shuffle-free semi join), then
  *      rewrites only the matched rows' files;
  *   3. the alternative: full recompute INCLUDING the view rewrite.
  *
  * Wall + scanned bytes per phase (task input metrics). Results in
  * BASELINE.md.
  *
  * `runMain graft.JoinViewProbe [sfDir] [inflate]`
  */
object JoinViewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val inflate = if (args.length > 1) args(1).toInt else 7
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bytesRead = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    })
    def measure[T](tag: String)(f: => T): T = {
      bytesRead.set(0L)
      val t0 = System.nanoTime()
      val r = f
      org.apache.spark.sql.GraftBridge.drainListeners(spark.sparkContext)
      println(f"[jvprobe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs, " +
        f"${bytesRead.get / 1e6}%.1f MB scanned")
      r
    }

    val ordersBase = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val baseN = ordersBase.count()
    val orders = ordersBase.crossJoin(
        spark.range(inflate).select(col("id").as("__rep")))
      .withColumn("o_orderkey", col("o_orderkey") + col("__rep") * baseN)
      .drop("__rep")
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_acctbal", "c_mktsegment")
    val nOrders = baseN * inflate
    val nCust = cust.count()

    def tmp(tag: String) =
      java.nio.file.Files.createTempDirectory(s"jvprobe-$tag").toString
    val a = new CowTable(spark, tmp("a"), keyCols = Seq("o_orderkey"),
      trackCommitVersions = true, fileIndexEntries = 60000)
    val b = new CowTable(spark, tmp("b"), keyCols = Seq("c_custkey"),
      trackCommitVersions = true, fileIndexEntries = 60000)
    a.bulkInsert(orders, parallelism = 32)
    b.bulkInsert(cust, parallelism = 4)
    println(s"[jvprobe] fact $nOrders rows, dim $nCust rows")
    val mj = new MaintainedJoin(spark, tmp("v"), a, b,
      on = Seq("o_custkey" -> "c_custkey"))
    measure("seed view (full join + write)") { mj.refresh() }
    // the service layout that serves BOTH maintenance probes: A-key
    // ranges prune fact-churn rewrites, fk ranges prune dim-churn hits.
    // The view DECLARES clusterCols = fk, so the z-order rewrite records
    // its files as unordered (the bucket scan stops claiming in-file
    // order) instead of refusing — two-axis FILE pruning with sound SMJ.
    // 256 files: churn maps to a small FRACTION of files only when the
    // table has realistic file granularity (at 100 TB it has thousands)
    measure("reclusterZOrder(o_orderkey, o_custkey)") {
      mj.table.reclusterZOrder("o_orderkey", "o_custkey", parallelism = 256)
    }
    val viewFiles = mj.table.manifest.baseFiles.size
    def rewritten(): Unit = println(s"[jvprobe]   view files rewritten: " +
      s"${mj.table.manifest.metrics.getOrElse("files_candidate", -1L)} " +
      s"of $viewFiles")

    // window 1 — fact-only churn: a HOT RANGE of 0.1% of keys (recent
    // orders), dim untouched
    val hot = nOrders / 1000
    a.upsert(orders.filter(col("o_orderkey").between(nOrders / 2,
        nOrders / 2 + hot))
      .withColumn("o_totalprice", col("o_totalprice") + 1.0))
    measure(s"refresh after fact-only churn ($hot rows)") { mj.refresh() }
    rewritten()

    // window 2 — dim-only churn: 1% of customers re-labeled
    b.upsert(cust.filter(col("c_custkey") % 100 === 0)
      .withColumn("c_acctbal", col("c_acctbal") * 2))
    measure(s"refresh after dim-only churn (${nCust / 100} keys)") {
      mj.refresh()
    }
    rewritten()

    // --- MOR-backed view: same churn shapes, logs instead of rewrites
    val mjm = new MaintainedJoin(spark, tmp("vm"), a, b,
      on = Seq("o_custkey" -> "c_custkey"), viewStorage = "mor")
    measure("mor view: seed") { mjm.refresh() }
    measure("mor view: reclusterZOrder") {
      mjm.table.reclusterZOrder("o_orderkey", "o_custkey", parallelism = 256)
    }
    a.upsert(orders.filter(col("o_orderkey").between(nOrders / 4,
        nOrders / 4 + hot))
      .withColumn("o_totalprice", col("o_totalprice") + 2.0))
    measure(s"refresh after fact-only churn ($hot rows) [cow]") {
      mj.refresh()
    }
    rewritten()
    measure(s"refresh after fact-only churn ($hot rows) [mor]") {
      mjm.refresh()
    }
    b.upsert(cust.filter(col("c_custkey") % 100 === 50)
      .withColumn("c_acctbal", col("c_acctbal") * 3))
    measure(s"refresh after dim-only churn (${nCust / 100} keys) [cow]") {
      mj.refresh()
    }
    rewritten()
    measure(s"refresh after dim-only churn (${nCust / 100} keys) [mor]") {
      mjm.refresh()
    }

    // --- fk-LINEAR-clustered MOR view + LOCALIZED dim churn (a key
    // range — "this batch of customers re-scored"): discovery prunes to
    // the churn's fk stripe (snapshotForValues over the fk stats) and
    // the fold is a log append — the best-case dim-churn refresh.
    // Scattered churn (above) cannot prune: 150 uniform keys land in
    // every ~59-value stripe, and under COW the REWRITE (driven by the
    // hit rows' scattered A-keys) dominates regardless of discovery.
    val mjl = new MaintainedJoin(spark, tmp("vl"), a, b,
      on = Seq("o_custkey" -> "c_custkey"), viewStorage = "mor")
    measure("mor fk-linear view: seed") { mjl.refresh() }
    measure("recluster(o_custkey) linear") {
      mjl.table.recluster(Seq("o_custkey"), parallelism = 256)
    }
    b.upsert(cust.filter(col("c_custkey").between(3000, 3150))
      .withColumn("c_acctbal", col("c_acctbal") * 5))
    measure("refresh after LOCALIZED dim churn (151 keys) " +
        "[mor fk-linear]") {
      mjl.refresh()
    }

    // the alternative at every window: full recompute. Raw parquet is the
    // floor (loses the file index, stats, change feed); the REAL
    // alternative reseeds through the table so the view keeps serving.
    measure("recompute -> raw parquet (floor)") {
      mj.recompute().write.mode("overwrite").parquet(tmp("rw"))
    }
    measure("recompute -> reseed through table (real alternative)") {
      mj.table.overwrite(mj.recompute())
    }
    println(s"[jvprobe] view rows=${mj.current.count()} (expect $nOrders)")
    println(s"[jvprobe] mor view rows=${mjm.current.count()}")
    spark.stop()
  }
}
