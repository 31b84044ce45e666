package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.table.CowTable

/** Column-bloom data-skipping probe: equality/IN probes on a
  * HIGH-CARDINALITY NON-CLUSTERED column — the case where per-file
  * [min, max] ranges span the whole domain and prune nothing. With
  * `bloomCols` on, each file carries a sidecar bloom over the column's
  * encoded values; a probe consults blooms (lazily, range survivors
  * only) and reads only files that can contain a probed value.
  *
  * Builds one table with ranges-only stats and one with ranges+blooms
  * over the same scrambled data, probes k-value IN sets, reports files
  * read and wall time. Results recorded in BASELINE.md.
  *
  * `runMain graft.BloomSkipProbe [rows] [files] [probes] [valsPerProbe]`
  */
object BloomSkipProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 10000000
    val nFiles = if (args.length > 1) args(1).toInt else 32
    val probes = if (args.length > 2) args(2).toInt else 10
    val k = if (args.length > 3) args(3).toInt else 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // fk = scrambled id: uniformly random across files — every file's
    // [min, max] covers ~the full 64-bit domain (worst case for ranges)
    def data = spark.range(rows).select(
      col("id"), xxhash64(col("id")).as("fk"),
      (col("id") % 97).cast("double").as("v"))

    def build(tag: String, blooms: Boolean): CowTable = {
      val t = new CowTable(spark,
        java.nio.file.Files.createTempDirectory(s"bsprobe-$tag").toString,
        keyCols = Seq("id"), fileIndexEntries = rows / nFiles + 1,
        statsCols = Seq("fk"),
        bloomCols = if (blooms) Seq("fk") else Nil)
      t.bulkInsert(data, parallelism = nFiles)
      println(s"[bsprobe] $tag: ${t.manifest.baseFiles.size} files")
      t
    }

    // probe EXISTING fks (hashes of known ids) — the selective-join /
    // point-lookup shape; computed once, sliced per probe
    import spark.implicits._
    val probeVals = spark.range(probes.toLong * k)
      .select(xxhash64(col("id")).as("h")).as[Long].collect()

    def drive(tag: String, t: CowTable): Unit = {
      var files = 0L
      var readRows = 0L
      val t0 = System.nanoTime
      (0 until probes).foreach { p =>
        val vals: Seq[Any] =
          probeVals.slice(p * k, p * k + k).toSeq
        val df = t.snapshotForValues("fk", vals)
        files += df.inputFiles.length
        readRows += df.filter(col("fk").isInCollection(vals.map(_.asInstanceOf[Long]))).count()
      }
      val sec = (System.nanoTime - t0) / 1e9
      println(f"[bsprobe] $tag: ${files / probes.toDouble}%.1f files/probe" +
        f" (of ${t.manifest.baseFiles.size}), $readRows rows matched, " +
        f"$sec%.2f s total")
    }

    val ranges = build("ranges", blooms = false)
    val blooms = build("blooms", blooms = true)
    // warm both once, then measure
    drive("warmup-ranges", ranges)
    drive("warmup-blooms", blooms)
    drive("ranges-only", ranges)
    drive("ranges+blooms", blooms)
    spark.stop()
  }
}
