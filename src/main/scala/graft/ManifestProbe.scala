package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.table.CowTable

/** Manifest scalability probe: the manifest is the table's single
  * metadata unit (schema + file listing + per-file index stats), parsed
  * on every operation and rewritten on every commit — so its costs must
  * stay sane as the FILE COUNT grows, or the table format itself becomes
  * the bottleneck long before 100 TB (a 100-TB table at a healthy 512 MB
  * per file is ~200k files). Measures, per file count:
  *
  *   - manifest bytes on disk (compact rendering kicks in >2000 files)
  *   - commit latency for a SMALL upsert (pays render + one rewrite)
  *   - cold manifest parse vs cached re-read (`readManifestFile` cache —
  *     write-once version files make caching sound)
  *   - `lookupByKeys` point-read latency (driver-side pruning walks the
  *     manifest's stats; the read touches few files)
  *
  * `runMain graft.ManifestProbe [fileCountsCsv]` — results in
  * BASELINE.md.
  */
object ManifestProbe {
  def main(args: Array[String]): Unit = {
    val counts = (if (args.length > 0) args(0) else "1000,4000,16000")
      .split(',').map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    counts.foreach { nFiles =>
      val rowsPerFile = 64L
      val n = nFiles * rowsPerFile
      val base =
        java.nio.file.Files.createTempDirectory("mprobe").toString
      val t = new CowTable(spark, base, keyCols = Seq("k"),
        fileIndexEntries = 64)
      // parallelism = nFiles → one small file per shuffle partition
      t.bulkInsert(
        spark.range(n).select(col("id").as("k"), rand(7).as("v")),
        parallelism = nFiles)
      def timeS[A](body: => A): (A, Double) = {
        val t0 = System.nanoTime
        val r = body
        (r, (System.nanoTime - t0) / 1e9)
      }
      val mBytes = {
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val v = t.manifest.version
        fs.getFileStatus(new org.apache.hadoop.fs.Path(
          base, s"_commits/v$v.json")).getLen
      }
      val (_, commitS) = timeS {
        t.upsert(Seq((0L, 0.5), (n / 2, 0.5)).toDF("k", "v"))
      }
      // cold parse: a fresh open() bypasses nothing, but the cache key
      // (path, mtime, len) is shared JVM-wide — measure cold by parsing
      // the text directly, then the cached path via manifestAt
      val fs2 = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val vHead = t.manifest.version
      val p = new org.apache.hadoop.fs.Path(base, s"_commits/v$vHead.json")
      val (_, parseColdS) = timeS {
        val in = fs2.open(p)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        CowTable.parseManifest(txt)
      }
      val (_, parseCachedS) = timeS { t.manifestAt(vHead) }
      val (hit, lookupS) = timeS {
        t.lookupByKeys(Seq(n / 3).toDF("k")).count()
      }
      require(hit == 1L, s"point lookup must find its row, got $hit")
      println(f"[mprobe] files=$nFiles manifest=${mBytes / 1024}%dKiB " +
        f"commit=$commitS%.2fs parseCold=${parseColdS * 1000}%.0fms " +
        f"parseCached=${parseCachedS * 1000}%.1fms lookup=$lookupS%.2fs")
    }
    spark.stop()
  }
}
