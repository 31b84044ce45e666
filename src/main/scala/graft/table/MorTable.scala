package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

import graft.cdc.CdcOps

/** Merge-on-read table: the MOR storage type the reference selects via
  * `hudi_storage_type` (reference: processData.py:150-155, 220-221).
  *
  * Write path: [[upsert]]/[[delete]] APPEND small delta-log parquet files
  * (payload + `_graft_log_op` U/D + the `_graft_commit_version` stamp)
  * instead of rewriting base files — the write amplification of a COW merge
  * (read + anti-join + rewrite of every touched partition) drops to one
  * append, which is what makes MOR the right storage type for hot,
  * frequently-updated tables at scale.
  *
  * Read paths, named after the reference's `_ro`/`_rt` Hive tables
  * (processData.py:131-132):
  *   - [[readOptimized]] (`_ro`): base files only — cheap, possibly stale.
  *   - [[realtime]] (`_rt`, also [[snapshot]], matching Hudi's MOR snapshot
  *     query): base files merged with delta logs at read time. Only
  *     partitions that HAVE pending logs pay the merge (a window over the
  *     record key within those partitions); untouched partitions stream
  *     through file-pruned, so read-merge cost scales with the amount of
  *     un-compacted change, not table size.
  *
  * Merge semantics match the COW sequence of the same operations: for each
  * record key (non-global index — key includes the partition value) the
  * record with the highest commit version wins; a winning delete tombstone
  * drops the key. Rows carry their writing commit in
  * [[CowTable.CommitVerCol]] ([[CowTable.trackCommitVersions]] is forced on)
  * so appended base files and delta logs order correctly against each other.
  *
  * Compaction ([[compactLogs]]): folds each logged partition's base + logs
  * into fresh base files and resets the delta-commit counter — the
  * every-N-delta-commits cadence of `hoodie.compact.inline.max.delta.commits`
  * (reference: processData.py:152-153, cadence 20; the reference runs it
  * out-of-line, here `compactEvery` also supports inline triggering).
  */
class MorTable(
    spark: SparkSession,
    basePath: String,
    keyCols: Seq[String],
    partitionCols: Seq[String] = Nil,
    precombineField: String = "",
    keepCommits: Int = 10,
    numBuckets: Int = 0,
    clusterCols: Seq[String] = Nil,
    /** Inline-compact after this many delta commits; 0 disables (the
      * reference's `hoodie.compact.inline=false` mode, :152).
      */
    val compactEvery: Int = 20,
    fileIndexEntries: Int = 0,
    statsCols: Seq[String] = Nil,
    bloomCols: Seq[String] = Nil,
    checkConstraints: Seq[String] = Nil)
  extends CowTable(spark, basePath, keyCols, partitionCols, precombineField,
    keepCommits, numBuckets, clusterCols, trackCommitVersions = true,
    fileIndexEntries = fileIndexEntries, statsCols = statsCols,
    bloomCols = bloomCols, checkConstraints = checkConstraints) {

  import CowTable._
  import MorTable._

  override protected def storageTypeName: String = "mor"

  override protected def inlineCompactEvery: Int = compactEvery

  // ------------------------------------------------------------- write path

  /** K2 on MOR: append an upsert delta log (no base rewrite). Cold-start
    * exception: a table with NO files at all (DDL-created empty) has
    * nothing to merge against, so the first batch writes BASE files —
    * the read-optimized view starts non-empty instead of hiding the
    * initial data behind the compaction cadence.
    */
  override def upsert(df: DataFrame, parallelism: Int = 0,
      extraMetrics: Map[String, Long] = Map.empty): Unit = {
    val m = manifest
    if (m.files.isEmpty) {
      // intra-batch conflict resolution still applies on the cold start
      val incoming =
        if (precombineField.nonEmpty)
          CdcOps.precombine(df, mergeIdCols, precombineField)
        else df
      insertAppend(incoming, parallelism, extraMetrics)
    } else logAppend(df, parallelism, LogUpsert, extraMetrics)
  }

  /** K3 on MOR: append delete tombstones (no base rewrite). */
  override def delete(df: DataFrame, parallelism: Int = 0,
      extraMetrics: Map[String, Long] = Map.empty): Unit =
    logAppend(df, parallelism, LogDelete, extraMetrics)

  /** Partial-column upsert needs the stored values to coalesce against, so
    * it cannot be expressed as a pure log append: compact pending logs
    * first, then run the COW full-outer merge against clean base files.
    */
  override def upsertPartial(df: DataFrame, parallelism: Int = 0): Unit = {
    compactLogs(parallelism)
    super.upsertPartial(df, parallelism)
  }

  /** Conditional merge reads stored values (its conditions reference
    * `c.*`), so like [[upsertPartial]] it compacts pending logs first and
    * merges against clean base files.
    */
  override def mergeInto(df: DataFrame, parallelism: Int = 0,
      whenMatchedDelete: org.apache.spark.sql.Column = lit(false),
      whenMatchedUpdate: org.apache.spark.sql.Column = lit(true),
      insertUnmatched: Boolean = true,
      insertCondition: org.apache.spark.sql.Column = lit(true),
      conditionCols: Seq[String] = Nil,
      tombstonesFromIncoming: Boolean = false,
      extraMetrics: Map[String, Long] = Map.empty,
      touchedKeys: Option[Set[String]] = None): Unit = {
    compactLogs(parallelism)
    super.mergeInto(df, parallelism, whenMatchedDelete, whenMatchedUpdate,
      insertUnmatched, insertCondition, conditionCols,
      tombstonesFromIncoming, extraMetrics, touchedKeys)
  }

  private def logAppend(df: DataFrame, parallelism: Int, op: String,
      extraMetrics: Map[String, Long] = Map.empty): Unit = {
    val m = manifest
    val v = m.version + 1
    val stamped = stamp(df, v)
    val evolved = evolveSchema(m, stamped.schema)
    val incoming0 = pad(stamped, evolved)
    // Same intra-batch conflict resolution as the COW write path.
    val incoming =
      if (op == LogUpsert && precombineField.nonEmpty)
        CdcOps.precombine(incoming0, mergeIdCols, precombineField)
      else incoming0
    // delta logs never receive FileStats — skip the key-stats tracker
    val newLogs = writeCommit(incoming.withColumn(LogOpCol, lit(op)), v,
      parallelism, idSchema = evolved, collectKeyStats = false)
    writeManifest(m.copy(version = v, schemaJson = evolved.json,
      logPartitions = mergeListings(m.logPartitions, newLogs),
      deltaCommits = m.deltaCommits + 1,
      operation = if (op == LogUpsert) "log_upsert" else "log_delete",
      metrics = CowTable.writeStats(newLogs) ++ extraMetrics))
    clean()
    if (compactEvery > 0 && manifest.deltaCommits >= compactEvery)
      compactLogs(parallelism)
  }

  // -------------------------------------------------------------- read path

  /** `_ro` — base files only: no merge cost, staleness bounded by the
    * compaction cadence.
    */
  def readOptimized(): DataFrame = readFiles(manifest, manifest.baseFiles)

  /** `_rt` — read-time merged current state. */
  def realtime(): DataFrame = realtimeFrom(manifest)

  /** Time travel on the merged view (any retained commit). */
  def realtimeAt(version: Long): DataFrame = realtimeFrom(manifestAt(version))

  /** MOR snapshot == Hudi's MOR snapshot query == the realtime view. */
  override def snapshot(): DataFrame = realtime()

  override def snapshotAt(version: Long): DataFrame = realtimeAt(version)

  private def realtimeFrom(m: Manifest): DataFrame = {
    if (m.logPartitions.isEmpty) return readFiles(m, m.baseFiles)
    val logged = m.logPartitions.keySet
    // Partitions without pending logs need no merge: pass through pruned.
    val untouched = readFiles(m,
      (m.partitions -- logged).toSeq.sortBy(_._1).flatMap(_._2))
    val touchedBase = readFiles(m,
      logged.toSeq.sorted.flatMap(k => m.partitions.getOrElse(k, Nil)))
    val logs = readLogs(m, logged)
    untouched.unionByName(
      mergeBaseWithLogs(m, touchedBase, logs).select(
        m.schema.fieldNames.toIndexedSeq.map(col): _*))
  }

  private def readLogs(m: Manifest, partKeys: Set[String]): DataFrame =
    readFilesWithSchema(logSchema(m.schema),
      partKeys.toSeq.sorted.flatMap(k => m.logPartitions.getOrElse(k, Nil)))

  /** Latest-commit-wins window keeping each winner's [[LogOpCol]] (and
    * any extra columns the caller attached). Input rows must already
    * carry [[LogOpCol]]. Record identity is (key, partition value) — the
    * non-global index, as in the COW merge. U and D never share a commit
    * (separate write calls), so (identity, commit) is unique; the op
    * tie-break only makes the window deterministic against misuse.
    */
  private def mergeWinners(m: Manifest, all: DataFrame): DataFrame = {
    val identity = (keyCols ++ partitionCols).distinct.map(col)
    val w = Window.partitionBy(identity: _*)
      .orderBy(col(CommitVerCol).desc, col(LogOpCol).desc)
    all.withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") === 1).drop("_graft_rn")
  }

  /** Latest-commit-wins merge of base rows and delta-log records. */
  private def mergeBaseWithLogs(
      m: Manifest, base: DataFrame, logs: DataFrame): DataFrame =
    mergeWinners(m,
      base.withColumn(LogOpCol, lit(LogUpsert)).unionByName(logs))
      .filter(col(LogOpCol) === LogUpsert)
      .drop(LogOpCol)

  /** Incremental query on MOR: rows written after `sinceVersion`, from only
    * the base/log files that commits after it added, merged so each changed
    * key surfaces once (deletes don't surface, matching the COW shape).
    */
  override def changesBetween(
      sinceVersion: Long, asOfVersion: Long): DataFrame =
    changeWindow(sinceVersion, asOfVersion)
      .filter(col(LogOpCol) === LogUpsert)
      .drop(ChangedFlagCol, LogOpCol)

  /** Winners of the window's merge with their log op and changed-row flag
    * retained — the shared core of [[changesBetween]] (drops deletes) and
    * [[changeFeed]] (types them "D").
    */
  private def changeWindow(
      sinceVersion: Long, asOfVersion: Long): DataFrame = {
    require(sinceVersion <= asOfVersion,
      s"changesBetween: since=$sinceVersion > asOf=$asOfVersion")
    val cur = manifestAt(asOfVersion)
    val oldFiles =
      if (sinceVersion == 0L) Set.empty[String]
      else manifestAt(sinceVersion).files.toSet
    val newBase = cur.baseFiles.filterNot(oldFiles)
    val newLogKeys = cur.logPartitions.filter {
      case (_, fs) => fs.exists(f => !oldFiles(f))
    }.keySet
    // the changed-row predicate reads input_file_name: evaluate AT SCAN,
    // carry the flag through the merge window on the winning row
    def flagged(df: DataFrame) = df.withColumn(ChangedFlagCol,
      CowTable.changedRowPredicate(sinceVersion))
    val base = flagged(readFiles(cur, newBase))
      .withColumn(LogOpCol, lit(LogUpsert))
    val merged =
      if (newLogKeys.isEmpty) base
      else mergeWinners(cur,
        base.unionByName(flagged(readLogs(cur, newLogKeys))))
    merged.filter(col(ChangedFlagCol))
  }

  // ------------------------------------------------------------- compaction

  /** Fold pending delta logs into fresh base files (one commit). Only
    * logged partitions are rewritten; empty merge results (fully deleted
    * partitions) drop out of the snapshot. Returns false when there was
    * nothing to compact.
    */
  def compactLogs(parallelism: Int = 0): Boolean = {
    val m = manifest
    if (m.logPartitions.isEmpty) return false
    val logged = m.logPartitions.keySet
    val base = readFiles(m,
      logged.toSeq.sorted.flatMap(k => m.partitions.getOrElse(k, Nil)))
    val winners = mergeWinners(m,
      base.withColumn(LogOpCol, lit(LogUpsert))
        .unionByName(readLogs(m, logged))).persist()
    try {
      val merged = winners.filter(col(LogOpCol) === LogUpsert)
        .select(m.schema.fieldNames.toIndexedSeq.map(col): _*)
      val v = m.version + 1
      val width = if (parallelism > 0) parallelism else logged.size
      val newFiles = writeCommit(merged, v, width, idSchema = m.schema)
      // compaction folds delete-log records away: record them as feed
      // tombstones (original stamps kept) so a change feed spanning the
      // compaction still surfaces them
      val dWinners = winners.filter(col(LogOpCol) === LogDelete)
        .select(((keyCols ++ partitionCols).distinct :+ CommitVerCol)
          .map(col): _*)
      val tombstones =
        if (dWinners.limit(1).isEmpty) m.tombstones
        else m.tombstones + (v.toString -> writeTombstones(dWinners, v))
      writeManifest(withFileStats(
        m.copy(version = v,
          partitions = m.partitions -- logged ++ newFiles,
          logPartitions = Map.empty, deltaCommits = 0, lastCompaction = v,
          tombstones = tombstones,
          operation = "log_compaction",
          metrics = CowTable.writeStats(newFiles) +
            ("units_rewritten" -> logged.size.toLong)),
        newFiles, m.schema))
    } finally winners.unpersist()
    clean()
    true
  }

  /** Change feed on MOR: window winners typed U, delete-log winners and
    * compaction-folded tombstones typed D (see [[CowTable.changeFeed]]).
    */
  override def changeFeed(
      sinceVersion: Long, asOfVersion: Long): DataFrame = {
    val cur = manifestAt(asOfVersion)
    val win = changeWindow(sinceVersion, asOfVersion)
    val ups = win.filter(col(LogOpCol) === LogUpsert)
      .drop(ChangedFlagCol, LogOpCol)
      .withColumn(CowTable.ChangeTypeCol, lit("U"))
    val idAndVer = ((keyCols ++ partitionCols).distinct :+ CommitVerCol)
    val logDels = win.filter(col(LogOpCol) === LogDelete)
      .select(idAndVer.map(col): _*)
    val dels = tombstoneRows(cur, sinceVersion, asOfVersion) match {
      case Some(ts) => ts.unionByName(logDels)
      case None => logDels
    }
    shapeFeed(ups, Some(dels), cur.schema)
  }

  /** Value-set skipping on MOR: prune BASE files by stats (superset
    * contract holds — a pruned base row cannot match the probe), but keep
    * ALL pending logs in the merge (log rows are unindexed; a log winner
    * whose base row was pruned still surfaces on its own).
    */
  /** MOR-aware [[CowTable.diff]]: a log append changes rows WITHOUT
    * touching base files, so the COW file-set comparison would miss
    * unmerged deltas. Units whose (base files, log files) signature
    * differs between the two versions are read MERGED on both sides and
    * classified by the shared join; unchanged units are skipped entirely
    * (same churn-proportional cost model, at unit granularity — rows
    * carried identically through a log fold or compaction pair up and
    * drop).
    */
  override def diff(fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion,
      s"diff: from=$fromVersion > to=$toVersion")
    val m1 = manifestAt(fromVersion)
    val m2 = manifestAt(toVersion)
    def sig(m: Manifest, k: String) =
      (m.partitions.get(k), m.logPartitions.get(k))
    val units = (m1.partitions.keySet ++ m2.partitions.keySet ++
      m1.logPartitions.keySet ++ m2.logPartitions.keySet)
      .filter(k => sig(m1, k) != sig(m2, k))
    diffFrames(realtimeUnits(m1, units), realtimeUnits(m2, units), m1, m2)
  }

  /** [[realtimeFrom]] restricted to a unit subset: base files of those
    * units, merged with their pending logs.
    */
  private def realtimeUnits(m: Manifest, units: Set[String]): DataFrame = {
    val logged = m.logPartitions.keySet & units
    val untouched = readFiles(m, (units -- logged).toSeq.sorted
      .flatMap(k => m.partitions.getOrElse(k, Nil)))
    if (logged.isEmpty) untouched
    else {
      val touchedBase = readFiles(m,
        logged.toSeq.sorted.flatMap(k => m.partitions.getOrElse(k, Nil)))
      untouched.unionByName(
        mergeBaseWithLogs(m, touchedBase, readLogs(m, logged)).select(
          m.schema.fieldNames.toIndexedSeq.map(col): _*))
    }
  }

  override def snapshotForValues(
      column: String, values: Seq[Any]): DataFrame =
    morSnapshotForValues(manifest, column, values)

  override def snapshotForValuesAt(
      version: Long, column: String, values: Seq[Any]): DataFrame =
    morSnapshotForValues(manifestAt(version), column, values)

  private def morSnapshotForValues(
      m: Manifest, column: String, values: Seq[Any]): DataFrame = {
    val cand =
      CowTable.filesForValues(spark, m, column, values, basePath).toSet
    if (m.logPartitions.isEmpty) return readFiles(m, m.baseFiles.filter(cand))
    val logged = m.logPartitions.keySet
    val untouched = readFiles(m,
      (m.partitions -- logged).toSeq.sortBy(_._1).flatMap(_._2)
        .filter(cand))
    val touchedBase = readFiles(m,
      logged.toSeq.sorted.flatMap(k => m.partitions.getOrElse(k, Nil))
        .filter(cand))
    val logs = readLogs(m, logged)
    untouched.unionByName(
      mergeBaseWithLogs(m, touchedBase, logs).select(
        m.schema.fieldNames.toIndexedSeq.map(col): _*))
  }

  /** Preimages on MOR must merge delta logs — unmerged log rows are
    * invisible to the base-file index — so resolve through the realtime
    * view pinned at `version` (unpruned; bounded by the probe semi join).
    */
  override protected def preimagesAt(
      version: Long, probe: DataFrame): DataFrame = {
    val rt = realtimeAt(version)
    val idCols = (keyCols ++ partitionCols).distinct
    val p = probe.select(idCols.map(col): _*).distinct()
    rt.join(p, idCols.map(c => rt(c) <=> p(c)).reduce(_ && _), "left_semi")
  }

  /** Drop-record identities on MOR fold the dropped partitions' pending
    * delta logs: a key whose latest log record is a delete was already
    * dead before the drop and must not resurface as a drop "D"; a key
    * living only in logs (inserted after the last compaction) must.
    */
  override protected def droppedIdentities(
      m: Manifest, rec: DropRecord): DataFrame = {
    if (rec.logPartitions.isEmpty) return super.droppedIdentities(m, rec)
    val idCols = (keyCols ++ partitionCols).distinct
    val base = readFiles(m, rec.partitions.valuesIterator.flatten.toSeq)
    val logs = readFilesWithSchema(MorTable.logSchema(m.schema),
      rec.logPartitions.valuesIterator.flatten.toSeq)
    mergeBaseWithLogs(m, base, logs).select(idCols.map(col): _*)
  }

  // ---------------------------------------------------------------- catalog

  /** K6 on MOR: sync BOTH query views, named like the reference's Hive
    * tables `<name>_ro` / `<name>_rt` (processData.py:131-132).
    */
  override def registerView(name: String): Unit = {
    readOptimized().createOrReplaceTempView(s"${name}_ro")
    realtime().createOrReplaceTempView(s"${name}_rt")
    // plain name resolves to the snapshot (= realtime) view, like Hudi's
    // default MOR snapshot query
    realtime().createOrReplaceTempView(name)
  }
}

object MorTable {
  /** Delta-log record type column: U (upsert payload) or D (tombstone). */
  val LogOpCol = "_graft_log_op"
  val LogUpsert = "U"
  val LogDelete = "D"
  /** Scan-time changed-row flag carried through the merge window (the
    * predicate reads input_file_name, which blanks after a shuffle).
    */
  val ChangedFlagCol = "_graft_changed"

  private[table] def logSchema(tableSchema: StructType): StructType =
    tableSchema.add(LogOpCol, StringType)
}
