package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.table.CowTable

/** DataSource V2 read integration: any Spark job (SQL-only included) reads
  * a graft table through the standard source API —
  *
  * {{{
  *   spark.read.format("graft").load("/warehouse/db/schema/table")
  *   spark.read.format("graft").option("versionAsOf", 3).load(path)
  *   CREATE TABLE t USING graft LOCATION '/warehouse/...'
  * }}}
  *
  * The provider resolves the table's CURRENT manifest (or `versionAsOf`
  * for time travel), and serves exactly that snapshot's base-file listing
  * through Spark's native parquet V2 table — so column pruning, filter
  * pushdown, row-group pruning via the retained partition-column stats,
  * and vectorized reading all come from the stock parquet path. No schema
  * inference pass: the manifest's schema is authoritative.
  *
  * Semantics: a snapshot AS OF LOAD TIME (the file list is pinned when the
  * DataFrame is created — later commits don't shift a running query, the
  * same isolation CowTable.snapshot gives). For merge-on-read tables this
  * is the read-optimized (`_ro`) view; the merged `_rt` view needs
  * [[graft.table.MorTable.realtime]].
  */
class GraftDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  // Spark calls inferSchema before getTable; the manifest IS the schema.
  override def supportsExternalMetadata(): Boolean = true

  private def basePath(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "graft source needs a table path: .load(path) or option(\"path\", ...)")
    p
  }

  // Resolve the manifest ONCE per (path, version) for this provider
  // instance: Spark calls inferSchema and then getTable separately, and a
  // commit landing between the two would otherwise serve the new file
  // list under the old schema. Caching pins schema AND files to the same
  // table version (also halves manifest I/O).
  @volatile private var cached:
      Option[((String, Option[String]), graft.table.Manifest)] = None

  private def manifest(options: CaseInsensitiveStringMap) = {
    val key = (basePath(options), Option(options.get("versionAsOf")))
    cached match {
      case Some((k, m)) if k == key => m
      case _ =>
        val m = CowTable.openManifest(SparkSession.active, key._1,
          key._2.map(_.toLong))
        cached = Some((key, m))
        m
    }
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    manifest(options).schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val base = basePath(options)
    val m = manifest(options)
    val files = m.baseFiles.map(f => s"$base/$f")
    ParquetTable(
      s"graft:$base@v${m.version}",
      SparkSession.active,
      options,
      files.toIndexedSeq,
      Some(schema),
      classOf[ParquetFileFormat])
  }
}
