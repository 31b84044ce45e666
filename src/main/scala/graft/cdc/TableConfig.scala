package graft.cdc

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Per-table processing configuration.
  *
  * Mirror of the reference's DynamoDB control record
  * (reference: scripts/config/control_file.json:1-16, fetched at
  * lib/assets/scripts/processData.py:43-54). The reference enriches the raw
  * record with derived booleans (`isCompositePk`, `isPartitionKey`,
  * `isInitalLoad` — processData.py:101-142); here the derivations are methods.
  *
  * Key lists are `;`- or `,`-separated in the source record and split exactly
  * as the reference does (processData.py:109-126, str.replace(';', ',')).
  */
final case class TableConfig(
    dbName: String,
    schemaName: String,
    tableName: String,
    primaryKey: String,
    partitionKey: String = "",
    storageType: String = "cow",
    glueJobName: String = "",
    precombineField: String = "",
    dmsFullLoadPartitioned: Boolean = false,
    bulkInsertParallelism: Int = 3,
    upsertParallelism: Int = 2,
    cdcSplitUpsert: Boolean = false,
    /** graft extension (no reference counterpart): key-hash bucket count
      * for bucket-scoped copy-on-write rewrites; 0 = unbucketed.
      */
    numBuckets: Int = 0
) {
  /** Composite PKs split on ';' or ',' (reference: processData.py:109-113). */
  def pkCols: Seq[String] = TableConfig.splitKeys(primaryKey)

  /** Partition columns; empty => unpartitioned table
    * (reference: processData.py:117-126, NonpartitionedKeyGenerator :187-191).
    */
  def partitionCols: Seq[String] = TableConfig.splitKeys(partitionKey)

  def isCompositePk: Boolean = pkCols.lengthCompare(1) > 0
  def isPartitioned: Boolean = partitionCols.nonEmpty

  /** Target layout `db/schema/table` (reference: processData.py:290). */
  def relativePath: String = s"$dbName/$schemaName/$tableName"

  /** Catalog database name `dl_<db>_<schema>` (reference: processData.py:276). */
  def catalogDb: String = s"dl_${dbName}_$schemaName"
}

object TableConfig {
  def splitKeys(s: String): Seq[String] =
    Option(s).getOrElse("").split("[;,]").iterator.map(_.trim)
      .filter(k => k.nonEmpty && k != "none").toSeq

  /** Inverse of [[fromJValue]]: control-record field names, so a rendered
    * catalog is itself a valid control file.
    */
  def toJValue(c: TableConfig): JObject = JObject(List(
    "db_name" -> JString(c.dbName),
    "schema_name" -> JString(c.schemaName),
    "table_name" -> JString(c.tableName),
    "primary_key" -> JString(c.primaryKey),
    "partition_key" -> JString(c.partitionKey),
    "hudi_storage_type" -> JString(c.storageType),
    "glue_job_name" -> JString(c.glueJobName),
    "precombine_field" -> JString(c.precombineField),
    "dms_full_load_partitioned" ->
      JString(if (c.dmsFullLoadPartitioned) "yes" else "no"),
    "hudi_bulkinsert_shuffle_parallelism" ->
      JString(c.bulkInsertParallelism.toString),
    "hudi_upsert_shuffle_parallelism" ->
      JString(c.upsertParallelism.toString),
    "cdc_split_upsert" -> JString(if (c.cdcSplitUpsert) "yes" else "no"),
    "graft_num_buckets" -> JString(c.numBuckets.toString)))

  def renderJson(configs: Seq[TableConfig]): String =
    JsonMethods.pretty(JsonMethods.render(JArray(configs.toList.map(toJValue))))

  private def str(o: JValue, k: String, dflt: String = ""): String =
    o \ k match { case JString(v) => v; case _ => dflt }

  /** Parse one control record object (reference field names:
    * scripts/config/control_file.json:2-15).
    */
  def fromJValue(o: JValue): TableConfig = TableConfig(
    dbName = str(o, "db_name"),
    schemaName = str(o, "schema_name"),
    tableName = str(o, "table_name"),
    primaryKey = str(o, "primary_key"),
    partitionKey = str(o, "partition_key"),
    storageType = str(o, "hudi_storage_type", "cow").toLowerCase,
    glueJobName = str(o, "glue_job_name"),
    precombineField = str(o, "precombine_field"),
    dmsFullLoadPartitioned = str(o, "dms_full_load_partitioned") == "yes",
    bulkInsertParallelism =
      str(o, "hudi_bulkinsert_shuffle_parallelism", "3").toInt,
    upsertParallelism = str(o, "hudi_upsert_shuffle_parallelism", "2").toInt,
    cdcSplitUpsert = str(o, "cdc_split_upsert") == "yes",
    numBuckets = str(o, "graft_num_buckets", "0").toInt
  )

  /** Load a control file: either a single JSON object or an array of them. */
  def fromJson(json: String): Seq[TableConfig] =
    JsonMethods.parse(json) match {
      case JArray(items) => items.map(fromJValue)
      case o: JObject    => Seq(fromJValue(o))
      case other => throw new IllegalArgumentException(
        s"control file must be a JSON object or array, got ${other.getClass}")
    }

  def fromFile(path: String): Seq[TableConfig] =
    fromJson(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  /** Records for one job, like the reference's DynamoDB Query on
    * `glue_job_name` (processData.py:43-54).
    */
  def forJob(configs: Seq[TableConfig], jobName: String): Seq[TableConfig] =
    configs.filter(_.glueJobName == jobName)
}
