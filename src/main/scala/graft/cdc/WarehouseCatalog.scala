package graft.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Persistent warehouse-level catalog: the cross-session counterpart of the
  * reference's per-write Glue-catalog sync (processData.py:160-169), which
  * makes every written table visible to LATER jobs and other engines
  * without re-running the pipeline that created it.
  *
  * Temp views die with the session, so the durable state lives next to the
  * data: `<warehouse>/_catalog.json` holds one control record per table,
  * rendered with the reference's own field names — the catalog file IS a
  * valid control file ([[TableConfig.fromJson]] parses it back). A new
  * session calls [[attachAll]] to re-register every table's session views
  * (including a MOR table's `_ro`/`_rt` pair) straight from the manifests
  * on disk.
  *
  * Writes are atomic (tmp + rename), matching the manifest-commit protocol;
  * single-writer assumed like the rest of the pipeline
  * (`maxConcurrentRuns: 1`, lib/glue-stack.ts:49).
  */
final class WarehouseCatalog(spark: SparkSession, warehousePath: String) {

  private def fs = new Path(warehousePath)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def catPath = new Path(warehousePath, "_catalog.json")

  /** All registered table records (empty if no catalog exists yet). */
  def tables(): Seq[TableConfig] = {
    if (!fs.exists(catPath)) return Nil
    val in = fs.open(catPath)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    TableConfig.fromJson(txt)
  }

  /** Upsert one table's record (identity: db/schema/table). */
  def sync(cfg: TableConfig): Unit = {
    val others = tables().filterNot(c =>
      c.dbName == cfg.dbName && c.schemaName == cfg.schemaName &&
        c.tableName == cfg.tableName)
    val tmp = new Path(warehousePath, "._catalog.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(TableConfig.renderJson(others :+ cfg).getBytes("UTF-8"))
    finally out.close()
    fs.delete(catPath, false)
    if (!fs.rename(tmp, catPath))
      throw new IllegalStateException(s"catalog publish failed: $catPath")
  }

  /** Re-register session views for every cataloged table that exists on
    * disk (K6 for a fresh session). Returns the attached view names.
    */
  def attachAll(pipe: CdcPipeline): Seq[String] =
    tables().flatMap { cfg =>
      val table = pipe.tableFor(cfg)
      if (table.exists) {
        table.registerView(pipe.viewName(cfg))
        Some(pipe.viewName(cfg))
      } else None
    }
}
