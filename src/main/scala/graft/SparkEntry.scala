package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.QueryCatalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The query battery itself lives in [[graft.queries.QueryCatalog]].
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the 6-table regional-revenue join (TPC-H Q5 shape).
    */
  def entry(spark: SparkSession): DataFrame =
    QueryCatalog.queries("q5_nation_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ §7 extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryCatalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = QueryCatalog.oracleSql
}
