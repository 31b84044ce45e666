package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.table.CowTable

/** External-catalog bridge — the offline analog of the reference's
  * per-write Hive/Glue catalog sync (`processData.py:160-169`,
  * `hoodie.datasource.hive_sync.*`): make graft tables discoverable by
  * tools that look in a CATALOG rather than at a path. Two seams, both
  * shaped like their production equivalents:
  *
  *  1. [[syncToSessionCatalog]] — register the table in Spark's own
  *     session catalog (`CREATE TABLE <name> USING graft LOCATION ...`,
  *     the `saveAsTable` shape): `spark.catalog.listTables` lists it,
  *     `spark.table(name)` / SQL-by-name read it, and because the graft
  *     source resolves its manifest at scan time the registration never
  *     goes stale — a sync is per TABLE, not per write. With a
  *     Hive-backed session catalog the same call lands the entry in the
  *     metastore, which IS the hive-sync integration point.
  *  2. [[writeSymlinkManifest]] — export the CURRENT snapshot's file
  *     listing in the `_symlink_format_manifest/` layout Presto, Trino
  *     and Athena consume for Delta/Hudi tables
  *     (SymlinkTextInputFormat: one text file per partition listing
  *     absolute data-file URIs). A non-Spark engine pointed at the
  *     manifest reads EXACTLY the committed snapshot — never the dead
  *     files a raw directory listing would include.
  */
object CatalogSync {

  /** Register `table` under `name` in the SESSION catalog. Id-style
    * `db.table` names work when the database exists; `replace` drops an
    * existing registration first (the sync-on-every-write caller shape).
    * Metadata-only — no data moves; reads by name always serve the
    * manifest head.
    */
  def syncToSessionCatalog(spark: SparkSession, name: String,
      table: CowTable, replace: Boolean = false): Unit = {
    require(name.matches("[A-Za-z0-9_.]+"),
      s"catalog sync: unsupported table name $name")
    if (replace) spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(
      s"CREATE TABLE $name USING graft LOCATION '${table.basePath}'")
    ()
  }

  /** Write the SymlinkTextInputFormat-shaped manifest export under
    * `<basePath>/_symlink_format_manifest/[<partition dir>/]manifest`:
    * each text file lists the absolute URIs of the partition's CURRENT
    * data files, one per line. Returns the manifest file paths written.
    *
    * Refuses table states an external parquet reader cannot serve
    * faithfully: deletion-vector masks and un-compacted MOR delta logs
    * both carry row-level state a plain file listing cannot express —
    * run `maintain()`/`compact()` first (their folds clear both), the
    * same contract Delta's `GENERATE symlink_format_manifest` has with
    * DVs. Stale manifests are the caller's lifecycle to manage: re-run
    * after every commit (the reference syncs per write) or from
    * `maintain()`.
    */
  def writeSymlinkManifest(spark: SparkSession, table: CowTable)
      : Seq[String] = {
    val m = table.manifest
    require(m.dvs.isEmpty,
      s"symlink manifest: ${table.basePath} carries deletion vectors — " +
        "an external parquet reader would resurrect deleted rows; " +
        "compact()/maintain() folds them first")
    require(m.logPartitions.valuesIterator.forall(_.isEmpty),
      s"symlink manifest: ${table.basePath} has un-compacted MOR delta " +
        "logs — an external parquet reader would miss them; compact() " +
        "first")
    val base = new Path(table.basePath)
    val fs = base.getFileSystem(
      spark.sessionState.newHadoopConf())
    val absBase = fs.makeQualified(base)
    val root = new Path(absBase, "_symlink_format_manifest")
    // overwrite wholesale: a leftover per-partition manifest from a
    // dropped partition would otherwise keep serving its files
    fs.delete(root, true)
    m.partitions.toSeq.sortBy(_._1).map { case (partKey, files) =>
      val dir = if (partKey.isEmpty) root else new Path(root, partKey)
      val out = new Path(dir, "manifest")
      val os = fs.create(out, true)
      try {
        files.sorted.foreach { f =>
          val abs = fs.makeQualified(
            new Path(CowTable.resolveFile(table.basePath, f)))
          os.write((abs.toString + "\n").getBytes("UTF-8"))
        }
      } finally os.close()
      out.toString
    }
  }
}
