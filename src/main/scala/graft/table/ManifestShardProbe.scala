package graft.table

import org.apache.hadoop.fs.Path

/** Manifest SHARDING probe — the scale evidence for the ~1M-file limit
  * the earlier ManifestProbe documented (at 100 TB / 128 MB files a
  * table is ~800k files; the monolithic manifest extrapolated to ~72 MB
  * and ~0.5 s per cold parse at 200k files, single-threaded). This
  * probe fabricates listings of N files (64 partitions, per-file stats
  * with key ranges + one column's min/max — the production shape;
  * synthesizing the listing rather than writing a million real parquet
  * files is what makes a 1M-file metadata measurement tractable) and
  * drives the REAL serialization paths:
  *
  *   - monolithic: `renderManifest` / `parseManifest` (the
  *     below-threshold json4s format)
  *   - sharded: `shardSplit` → Jackson-streamed content-addressed shard
  *     files + root, then a COLD `readManifestFile` (cache cleared) —
  *     parallel shard parse + merge, the exact production read
  *   - small commit: one partition's one file replaced → slot-equality
  *     reuse (`publishText`'s arrangement): split, compare to the
  *     previous slots, render + write ONLY the changed shards
  *
  * `sbt "runMain graft.table.ManifestShardProbe [fileCountsCsv]"` —
  * results in BASELINE.md.
  */
object ManifestShardProbe {
  def main(args: Array[String]): Unit = {
    val counts = (if (args.length > 0) args(0)
      else "200000,1000000").split(',').map(_.trim.toInt).toSeq
    val conf = new org.apache.hadoop.conf.Configuration()
    def timeS[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime
      val r = body
      (r, (System.nanoTime - t0) / 1e9)
    }
    counts.foreach { nFiles0 =>
      val nParts = 64
      val nFiles = nFiles0 / nParts * nParts
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType)))
      val partitions = (0 until nParts).map { p =>
        s"p=$p" -> (0 until nFiles / nParts).map(i =>
          f"files/c1-seed/p=$p/part-$i%06d-0000.parquet": String)
      }.toMap
      val fileStats = partitions.iterator.flatMap { case (_, fls) =>
        fls.iterator.zipWithIndex.map { case (f, i) =>
          f -> FileStat(f"k$i%012d", f"k${i + 63}%012d", "",
            Map("v" -> Seq("0.0", "1.0")), rows = 64L, bytes = 16384L)
        }
      }.toMap
      val m = Manifest(version = 1L, schemaJson = schema.json,
        keyCols = Seq("k"), partitionCols = Seq("p"),
        precombineField = "", partitions = partitions,
        fileStats = fileStats, operation = "bulk_insert",
        metrics = Map.empty, commitTimeMs = 1L)

      // --- monolithic baseline (the below-threshold format) ---
      val (monoTxt, renderS) = timeS(CowTable.renderManifest(m))
      val (_, parseS) = timeS(CowTable.parseManifest(monoTxt))

      // --- sharded: write real files, cold-read through production ---
      val base = java.nio.file.Files
        .createTempDirectory("msprobe").toString
      val commits = new Path(base, "_commits")
      val shardsDir = new Path(commits, "shards")
      val fs = shardsDir.getFileSystem(conf)
      fs.mkdirs(shardsDir)
      def writeSlot(i: Int, s: CowTable.ShardSlot): String = {
        val bytes = CowTable.renderShardDoc(s).getBytes("UTF-8")
        val md = java.security.MessageDigest.getInstance("MD5")
        val name = s"s$i-" +
          md.digest(bytes).take(8).map(b => f"$b%02x").mkString + ".json"
        val dst = new Path(shardsDir, name)
        if (!fs.exists(dst)) {
          val o = fs.create(dst, true)
          try o.write(bytes) finally o.close()
        }
        name
      }
      val (firstWrite, shardWriteS) = timeS {
        CowTable.shardSplit(m).zipWithIndex.toSeq
          .collect { case (s, i) if !s.isEmpty => i -> writeSlot(i, s) }
      }
      val names1 = firstWrite.map(_._2)
      val nameBySlot = firstWrite.toMap
      val root = new Path(commits, "v1.json")
      val rootTxt = CowTable.renderManifest(m.copy(shardRefs = names1))
      val o = fs.create(root, true)
      try o.write(rootTxt.getBytes("UTF-8")) finally o.close()

      CowTable.clearManifestCacheForTest()
      val (back, coldOpenS) = timeS(CowTable.readManifestFile(fs, root))
      require(back.baseFiles.size == nFiles,
        s"round trip lost files: ${back.baseFiles.size} of $nFiles")
      require(back.fileStats.size == nFiles, "round trip lost stats")
      val (_, warmOpenS) = timeS(CowTable.readManifestFile(fs, root))
      if (sys.env.contains("MSPROBE_PHASES")) {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        def slurp(f: Path): String = {
          val in = fs.open(f)
          try new String(in.readAllBytes(), "UTF-8") finally in.close()
        }
        val (shards, parParseS) = timeS(Await.result(
          Future.sequence(names1.toList.map(n =>
            Future(CowTable.parseShard(slurp(new Path(shardsDir, n)))))),
          Duration.Inf))
        val (_, mergeS) = timeS(
          CowTable.mergeShards(m.copy(shardRefs = names1), shards))
        val (_, oneParseS) = timeS(
          CowTable.parseShard(slurp(new Path(shardsDir, names1.head))))
        println(f"[msprobe-phases] parParse=$parParseS%.2fs merge=$mergeS%.2fs oneParse=$oneParseS%.2fs")
      }

      // --- small commit: one partition's one file replaced; production
      // reuse = split + slot-equality + render only the changed slots ---
      val pk = "p=7"
      val touched = m.partitions(pk)
      val m2 = m.copy(version = 2L,
        partitions = m.partitions + (pk -> (touched.tail :+
          "files/c2-churn/p=7/part-000000-0001.parquet")),
        fileStats = (m.fileStats - touched.head) +
          ("files/c2-churn/p=7/part-000000-0001.parquet" ->
            FileStat("k0", "k1", "", Map.empty, 64L, 16384L)))
      val (rewritten, commitShardS) = timeS {
        val prevSlots = CowTable.shardSplit(back)
        var written = 0
        CowTable.shardSplit(m2).zipWithIndex.foreach { case (s, i) =>
          if (!s.isEmpty && prevSlots(i) != s) {
            writeSlot(i, s); written += 1
          }
        }
        written
      }
      // production MEMOIZED path (same-JVM repeat committer, the
      // streaming-ingest shape): the previous split was cached at its own
      // publish, so a commit pays split(new) + compare + changed renders
      val memoPrev = CowTable.shardSplit(back)
      val (_, commitMemoS) = timeS {
        var written = 0
        CowTable.shardSplit(m2).zipWithIndex.foreach { case (s, i) =>
          if (!s.isEmpty && memoPrev(i) != s) written += 1
        }
        written
      }

      println(f"[msprobe] files=$nFiles monoRender=$renderS%.2fs " +
        f"monoParse=$parseS%.2fs monoBytes=${monoTxt.length / 1048576}%dMiB " +
        f"shards=${names1.size} shardWrite=$shardWriteS%.2fs " +
        f"coldOpen=$coldOpenS%.2fs warmOpen=${warmOpenS * 1000}%.1fms " +
        f"smallCommitShards=$rewritten/${names1.size} " +
        f"smallCommitWrite=$commitShardS%.2fs " +
        f"smallCommitMemoized=$commitMemoS%.2fs")
      require(nameBySlot.nonEmpty)
      fs.delete(new Path(base), true)
    }
  }
}
