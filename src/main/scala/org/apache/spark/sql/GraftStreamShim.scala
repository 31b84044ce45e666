package org.apache.spark.sql

/** The one `private[sql]` door a V1 streaming source needs: micro-batch
  * planning asserts that the DataFrame a `Source.getBatch` returns has
  * `isStreaming = true`, and the only way to build one over an arbitrary
  * logical plan is `SparkSession.internalCreateDataFrame` — package-private
  * to `org.apache.spark.sql`. Declaring this shim inside that package is
  * the standard connector technique (Delta's `DeltaSource`, spark-avro,
  * and most third-party streaming sources ship an identical bridge).
  * Everything else in the repo stays on public API.
  */
object GraftStreamShim {

  /** Re-wrap a (lazily planned) batch DataFrame as a streaming one with
    * the identical schema and physical plan.
    */
  def asStreamingDataFrame(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val spark = ds.sparkSession
    spark.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = true)
  }

  /** The inverse door, for a V1 streaming SINK: `Sink.addBatch` receives
    * a DataFrame bound to the micro-batch's INCREMENTAL execution — new
    * queries over it (the joins/aggregations a table merge needs) assert.
    * Re-wrapping its physical RDD as a plain batch DataFrame detaches it
    * (the `DeltaSink` technique); downstream actions re-run the
    * micro-batch lineage, which is deterministic for the planned offsets.
    */
  def asBatchDataFrame(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val spark = ds.sparkSession
    spark.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = false)
  }

  /** DataFrame over an already-resolved logical plan (`Dataset.ofRows` is
    * `private[sql]`) — lets a runnable SQL command re-enter the DataFrame
    * API with the plan the analyzer handed it.
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
