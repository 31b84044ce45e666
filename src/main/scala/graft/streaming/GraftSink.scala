package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.table.CowTable

/** Exactly-once streaming upsert sink into a graft table.
  *
  * `foreachBatch` has an at-least-once contract: after a failure between
  * the table commit and the checkpoint commit, the SAME micro-batch is
  * re-delivered with the SAME batchId. The sink records each applied
  * batchId in the commit's manifest metrics and skips any batch at or
  * below the recorded high-water mark — the table commit itself is the
  * transaction log, so no side ledger can drift from the data
  * (the standard idempotent-foreachBatch pattern, Hudi/Delta sinks do the
  * same with their commit metadata).
  *
  * {{{
  *   val sink = new GraftSink(() =>
  *     new CowTable(spark, path, keyCols = Seq("user_id")))
  *   val q = sink.start(transformedStream, checkpointDir)
  * }}}
  *
  * Scope: upsert semantics per batch (insert-or-replace by key), COW or
  * MOR (a MOR table's batches become log appends). Batch ordering is
  * guaranteed by Structured Streaming — batch N+1 only runs after N's
  * foreachBatch returns. Requires this sink to be the table's only
  * writer, same single-writer model as every other write path here.
  */
final class GraftSink(open: () => CowTable) {

  /** Apply one micro-batch; returns false when the batch was already
    * committed (replay) and was skipped.
    *
    * A batch carrying [[CowTable.ChangeTypeCol]] (a change FEED — e.g.
    * `readStream.format("graft").option("includeChangeType", true)`)
    * applies as ONE conditional merge commit: matched "D" rows delete,
    * everything else upserts, unmatched "D" rows no-op. One commit keeps
    * the batch atomic under replay — splitting into upsert + delete
    * commits would let a crash between them replay only half. For the
    * same reason the sink deliberately stays on the REWRITE merge paths
    * even when the table has `deleteVectors = true`: the vectored
    * delete/upsert are separate commits, and exactly-once beats cheap
    * writes here. Batch writers with replay protection of their own can
    * use `deleteVectored`/`upsertVectored` directly.
    */
  def applyBatch(batch: DataFrame, batchId: Long): Boolean = {
    val t = open()
    // scan the retained timeline, not just the head manifest: a service
    // commit (inline compaction, clean) may have landed after the sink's
    // last batch and its manifest carries fresh metrics
    val last =
      if (t.exists)
        t.maxMetricOverHistory(GraftSink.BatchIdKey).getOrElse(-1L)
      else -1L
    if (batchId <= last) false
    else {
      val stamp = Map(GraftSink.BatchIdKey -> batchId)
      val typed = batch.columns.contains(CowTable.ChangeTypeCol)
      if (!t.exists) {
        val rows = if (!typed) batch else batch
          .filter(org.apache.spark.sql.functions.col(
            CowTable.ChangeTypeCol) =!= "D")
          .drop(CowTable.ChangeTypeCol)
        t.bulkInsert(rows, extraMetrics = stamp)
      } else if (typed) {
        import org.apache.spark.sql.functions.{col, lit}
        t.mergeInto(batch,
          whenMatchedDelete = col(CowTable.ChangeTypeCol) === "D",
          whenMatchedUpdate = lit(true),
          insertUnmatched = true,
          insertCondition = col(CowTable.ChangeTypeCol) =!= "D",
          conditionCols = Seq(CowTable.ChangeTypeCol),
          extraMetrics = stamp)
      } else t.upsert(batch, extraMetrics = stamp)
      true
    }
  }

  /** Start the sink query. AvailableNow by default (drain-then-stop, the
    * bookmark-style run); pass a processing-time trigger for continuous
    * ingestion.
    */
  def start(
      stream: DataFrame,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(batch, id); ()
      }
      .start()
    q
  }
}

object GraftSink {
  /** Manifest-metrics key holding the last applied streaming batch id.
    * Every table commit carries the mark forward (see
    * [[graft.table.CowTable.StreamBatchIdKey]]), so on post-round-7
    * tables the HEAD manifest alone answers; the history scan in
    * [[GraftSink.applyBatch]] remains for tables whose newest commits
    * predate the carry-forward.
    */
  val BatchIdKey = CowTable.StreamBatchIdKey
}
