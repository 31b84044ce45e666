package graft.table

import scala.collection.immutable.ListMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.cdc.CdcOps

/** Snapshot manifest: the complete file listing of one table version.
  *
  * Plays the role of Hudi's commit timeline (reference:
  * hoodie commit metadata + `hoodie.cleaner.commits.retained`,
  * processData.py:196-197): the newest `v{N}.json` under `_commits/` IS the
  * current snapshot; a manifest file appearing (atomic tmp+rename) IS the
  * commit. Readers never see partial writes because data files are written
  * under a per-commit directory before the manifest referencing them exists.
  *
  * `partitions` maps a partition key string (`"col=value[/col2=value2]"`,
  * values unescaped; `""` for unpartitioned tables) to the data files
  * (basePath-relative) holding that partition's current rows.
  *
  * Merge-on-read extensions (empty/zero for copy-on-write tables):
  * `logPartitions` lists each partition's delta-log files (parquet rows
  * carrying `_graft_log_op`/`_graft_log_commit` columns, merged at read by
  * [[MorTable]]); `deltaCommits` counts log commits since the last
  * compaction (drives the reference's every-N-delta-commits inline cadence,
  * processData.py:152-153); `lastCompaction` is the version of the last
  * compaction commit (bounds exact log-based incremental reads).
  */
final case class Manifest(
    version: Long,
    schemaJson: String,
    keyCols: Seq[String],
    partitionCols: Seq[String],
    precombineField: String,
    partitions: Map[String, Seq[String]],
    logPartitions: Map[String, Seq[String]] = Map.empty,
    deltaCommits: Long = 0L,
    lastCompaction: Long = 0L,
    /** The write operation that produced this version (commit-metadata
      * audit trail, the `hoodie.commit` operation-type analog).
      */
    operation: String = "",
    /** Cheap per-commit counters (files/units — derived from the write's
      * own listings, never an extra Spark action).
      */
    metrics: Map[String, Long] = Map.empty) {
  def schema: StructType =
    org.apache.spark.sql.types.DataType.fromJson(schemaJson)
      .asInstanceOf[StructType]
  /** All live data files — base AND delta logs (cleaner keys off this). */
  def files: Seq[String] =
    (partitions.valuesIterator ++ logPartitions.valuesIterator).flatten.toSeq
  /** Base files only (the read-optimized listing). */
  def baseFiles: Seq[String] = partitions.valuesIterator.flatten.toSeq
}

/** A keyed, partitioned, mutable table over plain Parquet — the native
  * re-implementation of the subset of Hudi copy-on-write semantics the
  * reference relies on (SURVEY.md §2.4): bulk insert (K1), keyed upsert (K2),
  * keyed delete (K3), cheap append for pure inserts (K4), commit
  * timeline + retention cleaning (K8).
  *
  * Scale design:
  *   - Copy-on-write rewrites ONLY partitions containing matched keys
  *     (partition-scoped rewrite — SURVEY.md §4): incoming keys are grouped by
  *     partition value, the current snapshot is read for just those
  *     partitions, merged via a single shuffle (`left_anti` + union), and
  *     written back. Untouched partitions keep their existing files.
  *   - Data files RETAIN the partition columns (the hive-style directory
  *     layout uses duplicated `__p_*` columns), so every file carries
  *     min==max column statistics for its partition value — scans over an
  *     explicit file list still get row-group-level partition pruning for
  *     free, and no fragile directory-schema inference is needed at read.
  *   - The merge anti-join shuffles both sides by the record key; small
  *     incoming batches against large snapshots broadcast automatically via
  *     AQE (threshold-based) — no driver-side collect of data ever happens
  *     (only the distinct partition VALUES, which are bounded by partition
  *     count, not row count).
  *
  * Concurrency: single writer assumed, as in the reference
  * (`maxConcurrentRuns: 1`, lib/glue-stack.ts:49).
  *
  * Not final: [[MorTable]] subclasses this to swap the write path for
  * delta-log appends and the read path for a read-time merge.
  */
class CowTable(
    val spark: SparkSession,
    val basePath: String,
    val keyCols: Seq[String],
    val partitionCols: Seq[String] = Nil,
    val precombineField: String = "",
    val keepCommits: Int = 10,
    val numBuckets: Int = 0,
    /** Columns to sort by WITHIN each written file (cluster-by): tightens
      * per-row-group min/max statistics so range predicates on these
      * columns prune row groups at scan time — the lightweight sibling of
      * Z-ordering for single-column locality.
      */
    val clusterCols: Seq[String] = Nil,
    /** Stamp each row with the commit version that last wrote it (the
      * `_hoodie_commit_time` analog, column [[CowTable.CommitVerCol]]).
      * Unchanged rows copied by a rewrite KEEP their original stamp, so
      * [[changesSince]] can filter to exactly the changed rows.
      */
    val trackCommitVersions: Boolean = false) {

  import CowTable._

  /** Key-hash bucket expression (numBuckets > 0): Hudi-file-group-style
    * sub-partitioning. Records hash-route to a stable bucket, so a merge
    * rewrites only the buckets that contain matched keys — at 100 TB the
    * rewrite unit drops from whole partitions to partition/numBuckets.
    */
  private def bucketExpr: org.apache.spark.sql.Column =
    pmod(xxhash64(keyCols.map(col): _*), lit(numBuckets.toLong))

  protected def dirColsAll: Seq[String] =
    partitionCols.map(dirCol) ++
      (if (numBuckets > 0) Seq(dirCol(BucketCol)) else Nil)

  private val hadoopConf: Configuration =
    spark.sparkContext.hadoopConfiguration
  protected def fs: FileSystem = new Path(basePath).getFileSystem(hadoopConf)
  private def commitsDir = new Path(basePath, "_commits")
  private def commitDataDir(v: Long) = new Path(basePath, s"files/c$v")

  /** Initial-vs-incremental branch driver — the reference's
    * `isInitalLoad := NOT tableExists` catalog probe (processData.py:134-141).
    */
  def exists: Boolean = latestVersion.isDefined

  def latestVersion: Option[Long] =
    listVersions(fs, commitsDir).maxOption

  def manifest: Manifest = manifestAt(latestVersion.getOrElse(
    throw new IllegalStateException(s"table does not exist at $basePath")))

  def manifestAt(v: Long): Manifest = {
    val p = new Path(commitsDir, s"v$v.json")
    if (!fs.exists(p))
      throw new IllegalArgumentException(
        s"version $v is not retained at $basePath " +
          s"(cleaner keeps the latest $keepCommits commits)")
    readManifestFile(fs, p)
  }

  /** Current snapshot as a DataFrame (Hudi snapshot query equivalent). */
  def snapshot(): DataFrame = readFiles(manifest, manifest.baseFiles)

  /** Time travel: the table exactly as of `version` (any retained commit —
    * Hudi's "as.of.instant" queries; retention bounds how far back).
    */
  def snapshotAt(version: Long): DataFrame = {
    val m = manifestAt(version)
    readFiles(m, m.baseFiles)
  }

  /** Incremental query: rows changed after `sinceVersion` (Hudi
    * incremental-query shape). Only files added by later commits are read;
    * with [[trackCommitVersions]] the result is EXACTLY the rows written
    * after `sinceVersion` (row-level filter on the commit stamp, pushed to
    * the parquet scan). Without tracking it is the file-granularity
    * superset — every row of each rewritten unit — which consumers de-dup
    * by key.
    */
  def changesSince(sinceVersion: Long): DataFrame = {
    val cur = manifest
    val before = manifestAt(sinceVersion).baseFiles.toSet
    val added = readFiles(cur, cur.baseFiles.filterNot(before))
    if (trackCommitVersions) added.filter(col(CommitVerCol) > sinceVersion)
    else added
  }

  /** Snapshot restricted to the given manifest partition keys — the
    * partition-pruned read used by upsert/delete merges.
    */
  def snapshotFor(m: Manifest, partKeys: Set[String]): DataFrame =
    readFiles(m, partKeys.toSeq.sorted.flatMap(k =>
      m.partitions.getOrElse(k, Nil)))

  protected def readFiles(m: Manifest, files: Seq[String]): DataFrame =
    readFilesWithSchema(m.schema, files)

  /** Read an explicit file list with an explicit row schema (the schema may
    * include extra columns absent from some files — parquet null-fills).
    */
  protected def readFilesWithSchema(
      schema: StructType, files: Seq[String]): DataFrame = {
    val cols = schema.fieldNames.toIndexedSeq.map(col)
    if (files.isEmpty)
      spark.createDataFrame(
        java.util.Collections.emptyList[Row](), schema)
    else
      spark.read.schema(addDirCols(schema))
        .parquet(files.map(f => s"$basePath/$f"): _*)
        .select(cols: _*)
  }

  // Reads pass an explicit schema that includes the duplicated __p_* dir
  // columns so no footer-merging/inference pass is needed; the select above
  // immediately prunes them back out.
  private def addDirCols(schema: StructType): StructType = {
    val byName = schema.fields.map(f => f.name -> f).toMap
    partitionCols.foldLeft(schema)((s, c) => s.add(dirCol(c), byName(c).dataType))
  }

  /** K1 — bulk insert: first write of a brand-new table
    * (reference: processData.py:337-342, bulk_insert config :207-213).
    */
  def bulkInsert(df: DataFrame, parallelism: Int = 0): Unit = {
    require(!exists, s"bulkInsert on existing table $basePath")
    val data = stamp(df, 1L)
    val files = writeCommit(data, 1L, parallelism)
    writeManifest(Manifest(1L, data.schema.json, keyCols, partitionCols,
      precombineField, files,
      operation = "bulk_insert", metrics = CowTable.writeStats(files)))
  }

  /** Commit-version stamp for incoming rows (no-op unless tracking). */
  protected def stamp(df: DataFrame, v: Long): DataFrame =
    if (trackCommitVersions) df.withColumn(CommitVerCol, lit(v)) else df

  /** K4 fast path — append rows without merging (the `cdc_split_upsert`
    * routing of pure inserts through the cheap insert path,
    * reference: processData.py:348-358). No anti-join, no rewrite: new files
    * are ADDED to each partition's listing.
    */
  def insertAppend(df: DataFrame, parallelism: Int = 0): Unit = {
    val m = manifest
    val v = m.version + 1
    val stamped = stamp(df, v)
    val evolved = evolveSchema(m.schema, stamped.schema)
    val incoming = pad(stamped, evolved)
    val newFiles = writeCommit(incoming, v, parallelism)
    val merged = mergeListings(m.partitions, newFiles)
    writeManifest(m.copy(version = v, schemaJson = evolved.json,
      partitions = merged,
      operation = "insert_append", metrics = CowTable.writeStats(newFiles)))
    clean()
  }

  /** K2 — keyed upsert (merge): each incoming row replaces the stored row
    * with the same record key, inserting if absent; intra-batch same-key
    * conflicts resolved by the precombine field (greatest wins)
    * (reference: processData.py:368-374, upsert config :193-199,
    * precombine :161).
    *
    * Index semantics are Hudi's DEFAULT (non-global) index, as the reference
    * uses it: record identity is (record key, partition value) — an update
    * arriving with a different partition value creates a new row in that
    * partition rather than moving the old one.
    */
  def upsert(df: DataFrame, parallelism: Int = 0): Unit =
    mergeCommit(df, parallelism, "upsert") { (cur, incoming) =>
      cur.join(incoming, keyCols, "left_anti").unionByName(incoming)
    }

  /** Partial-column upsert: like [[upsert]], but incoming NULLs mean "keep
    * the stored value" (changed-columns-only CDC payloads). Insert-if-absent
    * still applies; for brand-new keys the null columns stay null.
    * Implemented as a full-outer merge with per-column coalesce — one
    * shuffle, same partition/bucket-scoped rewrite as the full upsert.
    */
  def upsertPartial(df: DataFrame, parallelism: Int = 0): Unit =
    mergeCommit(df, parallelism, "upsert_partial") { (cur, incoming) =>
      val payload = cur.columns.filterNot(keyCols.contains).toIndexedSeq
      cur.as("c").join(incoming.as("i"), keyCols, "full_outer")
        .select(keyCols.map(col) ++ payload.map(c =>
          coalesce(col(s"i.$c"), col(s"c.$c")).as(c)): _*)
    }

  /** K3 — keyed delete: stored rows matching incoming record keys are
    * removed (Hudi `EmptyHoodieRecordPayload` tombstone semantics,
    * reference: processData.py:376-382, delete config :215-218).
    */
  def delete(df: DataFrame, parallelism: Int = 0): Unit =
    mergeCommit(df, parallelism, "delete") { (cur, incoming) =>
      cur.join(incoming.select(keyCols.map(col): _*), keyCols, "left_anti")
    }

  private def mergeCommit(df: DataFrame, parallelism: Int, opName: String)(
      merge: (DataFrame, DataFrame) => DataFrame): Unit = {
    val m = manifest
    val v = m.version + 1
    val stamped = stamp(df, v)
    val evolved = evolveSchema(m.schema, stamped.schema)
    val incoming0 = pad(stamped, evolved)
    val incoming = (if (precombineField.nonEmpty)
      CdcOps.precombine(incoming0, keyCols, precombineField)
    else incoming0).persist()
    try {
      val touched = touchedPartitionKeys(incoming)
      val rewritten = touched.intersect(m.partitions.keySet)
      val cur = pad(snapshotFor(m, rewritten), evolved)
      val merged = merge(cur, incoming)
      val newFiles = writeCommit(merged, v, parallelism)
      // Partitions whose merged result is empty (fully deleted) simply have
      // no entry in newFiles and drop out of the snapshot.
      writeManifest(m.copy(version = v, schemaJson = evolved.json,
        partitions = m.partitions -- touched ++ newFiles,
        operation = opName, metrics = CowTable.writeStats(newFiles) +
          // only pre-existing partitions are read+rewritten; brand-new
          // partitions in the batch are pure writes
          ("units_rewritten" -> rewritten.size.toLong)))
      clean()
    } finally incoming.unpersist()
  }

  /** Additive schema evolution (Hudi-style): columns new in the batch are
    * APPENDED to the table schema; stored rows read back as null for them.
    * Existing columns keep their stored type (incoming values are cast).
    */
  protected def evolveSchema(cur: StructType, in: StructType): StructType = {
    val known = cur.fieldNames.toSet
    StructType(cur.fields ++ in.fields.filterNot(f => known(f.name)))
  }

  /** Conform a frame to the target schema: order columns, cast to stored
    * types, null-fill columns the frame lacks (absent payload columns in
    * delete batches; newly evolved columns in old snapshots).
    */
  protected def pad(df: DataFrame, target: StructType): DataFrame = {
    val have = df.columns.toSet
    df.select(target.fields.toIndexedSeq.map(f =>
      if (have(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)): _*)
  }

  /** Distinct partition values of the incoming batch, as manifest keys.
    * Collects only partition VALUES (bounded by partition cardinality) —
    * never data rows.
    */
  protected def touchedPartitionKeys(incoming: DataFrame): Set[String] = {
    if (partitionCols.isEmpty && numBuckets == 0) return Set("")
    val sel = partitionCols.map(c => col(c).cast("string")) ++
      (if (numBuckets > 0) Seq(bucketExpr.cast("string")) else Nil)
    incoming.select(sel.toIndexedSeq: _*).distinct().collect().iterator
      .map { r =>
        val parts = partitionCols.zipWithIndex.map { case (c, i) =>
          val v = if (r.isNullAt(i)) HiveDefaultPartition else r.getString(i)
          s"$c=$v"
        }
        val bucket =
          if (numBuckets > 0) Seq(s"$BucketCol=${r.getString(partitionCols.length)}")
          else Nil
        (parts ++ bucket).mkString("/")
      }.toSet
  }

  /** Write one commit's data under `files/c{v}` and return the partition →
    * relative-file listing. Partition columns are duplicated into `__p_*`
    * columns for the hive-style directory layout so the data files keep the
    * originals (see class doc).
    */
  protected def writeCommit(
      df: DataFrame, v: Long, parallelism: Int): Map[String, Seq[String]] = {
    val dir = commitDataDir(v)
    val dup0 = partitionCols.foldLeft(df)(
      (d, c) => d.withColumn(dirCol(c), col(c)))
    val dup =
      if (numBuckets > 0) dup0.withColumn(dirCol(BucketCol), bucketExpr)
      else dup0
    // Shuffle-parallelism knob from table config (reference:
    // hoodie.*.shuffle.parallelism, processData.py:194,202,208). Partitioned
    // or bucketed writes co-locate rows of one rewrite unit to minimize
    // files per unit; AQE handles residual skew.
    val unitCols = dirColsAll.map(col)
    val shaped0 =
      if (parallelism <= 0) dup
      else if (unitCols.nonEmpty)
        dup.repartition(parallelism, unitCols.toIndexedSeq: _*)
      else dup.repartition(parallelism)
    // cluster-by: sort dir cols first (keeps the writer single-pass per
    // partition dir), then the user's locality columns
    val shaped =
      if (clusterCols.isEmpty) shaped0
      else shaped0.sortWithinPartitions(
        (dirColsAll ++ clusterCols).map(col).toIndexedSeq: _*)
    val w = shaped.write.mode("overwrite")
    (if (dirColsAll.nonEmpty) w.partitionBy(dirColsAll.toIndexedSeq: _*)
    else w).parquet(dir.toString)
    listCommitFiles(dir)
  }

  /** Recursively list a commit dir's parquet files, keyed by partition. */
  private def listCommitFiles(dir: Path): Map[String, Seq[String]] = {
    val base = new Path(basePath)
    val out = scala.collection.mutable.Map.empty[String, Vector[String]]
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.endsWith(".parquet")) {
        val relToCommit = relativize(dir, f)
        val partKey = relToCommit.split('/').dropRight(1).iterator
          .filter(_.startsWith(DirColPrefix))
          .map { seg =>
            val eq = seg.indexOf('=')
            seg.substring(DirColPrefix.length, eq) + "=" +
              unescapePathName(seg.substring(eq + 1))
          }.mkString("/")
        val relToBase = relativize(base, f)
        out.update(partKey, out.getOrElse(partKey, Vector.empty) :+ relToBase)
      }
    }
    out.toMap
  }

  private def relativize(base: Path, f: Path): String = {
    val b = base.toUri.getPath.stripSuffix("/")
    val p = f.toUri.getPath
    require(p.startsWith(b + "/"), s"$f not under $base")
    p.substring(b.length + 1)
  }

  protected def mergeListings(
      old: Map[String, Seq[String]],
      add: Map[String, Seq[String]]): Map[String, Seq[String]] =
    (old.keySet ++ add.keySet).iterator.map(k =>
      k -> (old.getOrElse(k, Nil) ++ add.getOrElse(k, Nil))).toMap

  /** Atomic publish: manifest written to a tmp name then renamed into place.
    * (Consistency-check role of `hoodie.consistency.check.enabled`,
    * reference: processData.py:164.) Readers never see a partial file.
    *
    * Conflict detection between racing writers is BEST-EFFORT: the exists()
    * probe below catches most races, but local filesystems implement
    * Hadoop rename via POSIX rename(2), which silently replaces an existing
    * destination — so a true same-millisecond race can still last-write-win.
    * (HDFS/object-store committers do refuse the overwrite.) Correctness
    * relies on the reference's serialized-runs assumption
    * (`maxConcurrentRuns: 1`), matching its single-writer model.
    */
  protected def writeManifest(m: Manifest): Unit = {
    fs.mkdirs(commitsDir)
    val tmp = new Path(commitsDir, s".v${m.version}.json.tmp")
    val dst = new Path(commitsDir, s"v${m.version}.json")
    val out = fs.create(tmp, true)
    try out.write(renderManifest(m).getBytes("UTF-8")) finally out.close()
    if (fs.exists(dst)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"commit conflict: $dst already published by another writer")
    }
    if (!fs.rename(tmp, dst))
      throw new IllegalStateException(s"commit rename failed: $dst")
  }

  /** Compaction: rewrite any partition/bucket unit whose file count exceeds
    * `maxFilesPerUnit` into freshly-written files (one commit). The
    * append fast path (insertAppend) accumulates small files per unit —
    * this is the table service that folds them back, the COW analog of
    * MOR log-compaction (reference cadence knob: `hoodie.compact.inline*`,
    * processData.py:152-153).
    */
  def compact(maxFilesPerUnit: Int = 4, parallelism: Int = 0): Boolean = {
    val m = manifest
    val crowded = m.partitions.filter(_._2.length > maxFilesPerUnit).keySet
    if (crowded.isEmpty) return false
    val data = readFiles(m, crowded.toSeq.sorted.flatMap(m.partitions))
    val v = m.version + 1
    // default shuffle width = one task per rewritten unit -> one output
    // file per unit (the point of compaction)
    val width = if (parallelism > 0) parallelism else crowded.size
    val newFiles = writeCommit(data, v, width)
    writeManifest(m.copy(version = v,
      partitions = m.partitions -- crowded ++ newFiles,
      operation = "compact", metrics = CowTable.writeStats(newFiles) +
        ("units_rewritten" -> crowded.size.toLong)))
    clean()
    true
  }

  /** Roll back crashed commits: delete `files/c{v}` data directories that
    * no retained manifest references AND that belong to no committed
    * version — the debris of a writer that died after writing data but
    * before publishing its manifest (data-before-manifest ordering makes
    * such dirs invisible to readers, but nothing else ever reclaims them).
    * The Hudi failed-commit rollback analog. MUST only run when no write
    * is in flight (single-writer operation, like every write path here):
    * a concurrent writer's not-yet-published commit dir looks exactly like
    * an orphan. Returns the removed directory names.
    */
  def vacuumOrphans(): Seq[String] = {
    val committed = listVersions(fs, commitsDir).toSet
    val referenced: Set[Long] = committed.flatMap(v =>
      scala.util.Try(manifestAt(v)).toOption.toSeq.flatMap(_.files))
      .map(_.split('/')(1).stripPrefix("c").toLong)
    val filesDir = new Path(basePath, "files")
    if (!fs.exists(filesDir)) return Nil
    fs.listStatus(filesDir).toSeq.map(_.getPath).filter { p =>
      val name = p.getName
      name.startsWith("c") && name.drop(1).forall(_.isDigit) && {
        val v = name.drop(1).toLong
        !referenced.contains(v) && !committed.contains(v)
      }
    }.map { p => fs.delete(p, true); p.getName }
  }

  /** Commit timeline as a DataFrame (Hudi's `show commits` analog): one
    * row per RETAINED version with its operation and write metrics.
    * Reads only the manifest JSONs — bounded by `keepCommits`, never data.
    */
  def history(): DataFrame = {
    import spark.implicits._
    // flatMap + re-check: a concurrent writer's clean() may drop the
    // oldest manifest between the listing and the read — skip vanished
    // versions instead of failing the whole timeline query
    listVersions(fs, commitsDir).sorted.flatMap { v =>
      scala.util.Try(manifestAt(v)).toOption
    }.map { m =>
      (m.version, m.operation,
        m.metrics.getOrElse("files_added", 0L),
        m.metrics.getOrElse("units_written", 0L),
        m.metrics.getOrElse("units_rewritten", 0L),
        m.deltaCommits, m.lastCompaction)
    }.toDF("version", "operation", "files_added", "units_written",
      "units_rewritten", "delta_commits", "last_compaction")
  }

  /** K6 — catalog integration: expose the current snapshot as a temp view
    * (the manifest remains the source of truth; this is the `spark.catalog`
    * surface of the reference's Glue-catalog sync, processData.py:160-169).
    */
  def registerView(name: String): Unit =
    snapshot().createOrReplaceTempView(name)

  /** K8 — cleaner: keep the latest `keepCommits` manifests
    * (reference: KEEP_LATEST_COMMITS, 10 retained, processData.py:196-197)
    * and delete commit data dirs no retained manifest references.
    */
  def clean(): Unit = {
    val versions = listVersions(fs, commitsDir).sorted
    val retained = versions.takeRight(keepCommits)
    val dropped = versions.dropRight(keepCommits)
    dropped.foreach(v => fs.delete(new Path(commitsDir, s"v$v.json"), false))
    if (dropped.nonEmpty) {
      val live: Set[Long] = retained.flatMap(v => manifestAt(v).files).iterator
        .map(_.split('/')(1).stripPrefix("c").toLong).toSet
      val filesDir = new Path(basePath, "files")
      if (fs.exists(filesDir)) fs.listStatus(filesDir).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith("c") &&
            name.drop(1).forall(_.isDigit) &&
            !live.contains(name.drop(1).toLong))
          fs.delete(st.getPath, true)
      }
    }
  }
}

object CowTable {
  private val ManifestName = "v(\\d+)\\.json".r

  /** Cheap commit counters from the write's own file listing. */
  private[table] def writeStats(
      newFiles: Map[String, Seq[String]]): Map[String, Long] = Map(
    "files_added" -> newFiles.valuesIterator.map(_.size.toLong).sum,
    "units_written" -> newFiles.size.toLong)

  /** Commit versions present under a table's `_commits` dir (unsorted). */
  private[table] def listVersions(
      fs: FileSystem, commitsDir: Path): Seq[Long] =
    if (!fs.exists(commitsDir)) Nil
    else fs.listStatus(commitsDir).iterator.map(_.getPath.getName)
      .collect { case ManifestName(n) => n.toLong }.toSeq

  private[table] def readManifestFile(fs: FileSystem, p: Path): Manifest = {
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    parseManifest(txt)
  }

  /** Read a table's manifest given only its path — the entry point for
    * integrations (e.g. [[graft.sources.GraftDataSource]]) that discover
    * key/partition metadata FROM the manifest instead of requiring it.
    */
  def openManifest(
      spark: SparkSession,
      basePath: String,
      version: Option[Long] = None): Manifest = {
    val fs = new Path(basePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commits = new Path(basePath, "_commits")
    require(fs.exists(commits), s"not a graft table (no _commits): $basePath")
    val v = version.getOrElse {
      val vs = listVersions(fs, commits)
      require(vs.nonEmpty, s"no committed versions at $basePath")
      vs.max
    }
    val p = new Path(commits, s"v$v.json")
    require(fs.exists(p), s"version $v is not retained at $basePath")
    readManifestFile(fs, p)
  }
  val DirColPrefix = "__p_"
  val BucketCol = "__bucket"
  /** Row-level commit stamp column (see `trackCommitVersions`). */
  val CommitVerCol = "_graft_commit_version"
  val HiveDefaultPartition = "__HIVE_DEFAULT_PARTITION__"

  def dirCol(c: String): String = DirColPrefix + c

  /** Inverse of Hive/Spark's partition-path escaping (%XX sequences). */
  def unescapePathName(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 3 <= s.length) {
        try {
          sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } catch { case _: NumberFormatException => sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def listing(ps: Map[String, Seq[String]]): JObject =
    JObject(ps.toSeq.sortBy(_._1).map {
      case (k, fsq) => k -> JArray(fsq.toList.map(JString(_)))
    }.toList)

  private[table] def renderManifest(m: Manifest): String =
    JsonMethods.pretty(JsonMethods.render(JObject(List(
      "version" -> JInt(m.version),
      "schemaJson" -> JString(m.schemaJson),
      "keyCols" -> JArray(m.keyCols.toList.map(JString(_))),
      "partitionCols" -> JArray(m.partitionCols.toList.map(JString(_))),
      "precombineField" -> JString(m.precombineField),
      "partitions" -> listing(m.partitions),
      // merge-on-read state (empty/zero on COW tables; parse defaults keep
      // old manifests readable)
      "logPartitions" -> listing(m.logPartitions),
      "deltaCommits" -> JInt(m.deltaCommits),
      "lastCompaction" -> JInt(m.lastCompaction),
      "operation" -> JString(m.operation),
      "metrics" -> JObject(m.metrics.toSeq.sortBy(_._1).map {
        case (k, v) => k -> (JInt(v): JValue)
      }.toList)))))

  private[table] def parseManifest(txt: String): Manifest = {
    val j = JsonMethods.parse(txt)
    def strs(v: JValue): Seq[String] =
      v match { case JArray(xs) => xs.collect { case JString(s) => s }
                case _ => Nil }
    def long(v: JValue, dflt: Long): Long = v match {
      case JInt(n) => n.toLong; case JLong(n) => n; case _ => dflt
    }
    def files(v: JValue): Map[String, Seq[String]] = v match {
      case JObject(fs) => ListMap(fs.map { case (k, w) => k -> strs(w) }: _*)
      case _ => ListMap.empty
    }
    Manifest(
      version = (j \ "version") match {
        case JInt(n) => n.toLong; case JLong(n) => n
        case other => throw new IllegalArgumentException(s"bad version $other")
      },
      schemaJson = (j \ "schemaJson").asInstanceOf[JString].s,
      keyCols = strs(j \ "keyCols"),
      partitionCols = strs(j \ "partitionCols"),
      precombineField = (j \ "precombineField") match {
        case JString(s) => s; case _ => "" },
      partitions = files(j \ "partitions"),
      logPartitions = files(j \ "logPartitions"),
      deltaCommits = long(j \ "deltaCommits", 0L),
      lastCompaction = long(j \ "lastCompaction", 0L),
      operation = (j \ "operation") match {
        case JString(s) => s; case _ => "" },
      metrics = (j \ "metrics") match {
        case JObject(fs) => fs.collect {
          case (k, JInt(n)) => k -> n.toLong
          case (k, JLong(n)) => k -> n
        }.toMap
        case _ => Map.empty
      })
  }
}
