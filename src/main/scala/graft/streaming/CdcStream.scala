package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.cdc.{CdcPipeline, TableConfig}

/** Incremental file tracking as Structured Streaming — the Spark-native
  * equivalent of the reference's Glue job bookmarks (S2: each run processes
  * only raw files not consumed by a prior run; reference:
  * `transformation_ctx` processData.py:298 + `--job-bookmark-enable`
  * lib/glue-stack.ts:51).
  *
  * A file-source stream over the raw directory, checkpointed, driven with
  * `Trigger.AvailableNow` (process-everything-new-then-stop), feeds each
  * micro-batch through the SAME batch pipeline via `foreachBatch` — so one
  * code path implements both the scripted re-run model of the reference and
  * continuous ingestion.
  *
  * Scale notes: the checkpoint (file-source log) replaces Glue bookmark
  * state; `maxFilesPerTrigger` bounds batch size for backfills; the
  * downstream CowTable merge is already partition-scoped.
  *
  * Retry semantics: `foreachBatch` may re-deliver a batch after a failure.
  * The upsert and delete paths are idempotent (re-merging the same keys
  * reproduces the same state), so the default pipeline tolerates retries.
  * The `cdc_split_upsert` fast path is NOT: `insertAppend` would duplicate
  * rows on re-delivery — keep split mode off for streaming ingestion, as
  * the reference does (control_file.json: `cdc_split_upsert: "no"`).
  */
final class CdcStream(
    spark: SparkSession,
    pipeline: CdcPipeline,
    checkpointRoot: String) {

  /** Run one AvailableNow pass: consume all unseen files under `rawPath`
    * (recursive, like S1) and apply them to `cfg`'s table. Returns after the
    * backlog is drained — exactly the reference's "start job run" semantics.
    */
  def runAvailableNow(
      cfg: TableConfig,
      rawPath: String,
      schema: StructType,
      maxFilesPerTrigger: Option[Int] = None): Unit = {
    val reader = spark.readStream
      .schema(schema)
      .option("recursiveFileLookup", "true")
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    val stream = reader.parquet(rawPath)
    val q = stream.writeStream
      .queryName(s"cdc-${cfg.tableName}")
      .option("checkpointLocation", s"$checkpointRoot/${cfg.relativePath}")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) { pipeline.run(cfg, batch); () }
      }
      .start()
    q.awaitTermination()
  }
}

/** Streaming analytics shapes (the batch equivalents live in
  * QueryCatalog as `events_hourly` / `sessionize`): tumbling-window
  * aggregation with watermarked late-data handling.
  */
object StreamOps {

  /** Hourly tumbling-window counts over a watermarked event stream.
    * Works on any DataFrame with (ts: timestamp, event_type, value) —
    * streaming or batch (same plan, Spark unifies them).
    */
  def hourlyWindowAgg(events: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark)
      else events
    src.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
  }

  /** Session windows per user with a 30-minute inactivity gap (streaming
    * native `session_window`; batch equivalent is QueryCatalog.sessionize).
    */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", "1 hour")
      else events
    src.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
  }

  /** Stream-stream interval join: each left event pairs with right events
    * of the same key whose timestamp falls in [left.ts - before,
    * left.ts + after]. Both sides MUST be watermarked (callers of the
    * streaming path) so Spark can bound the join state — state per side is
    * O(events within watermark + interval), the only formulation that
    * survives unbounded streams. Works identically on batch frames (no
    * watermark needed).
    *
    * Column convention: left carries (keyCol, ts, ...), right is renamed to
    * `r_ts` + payload to keep the join condition unambiguous.
    *
    * `joinType` supports "left_outer" as well: unmatched left events emit
    * with null right columns once the right-side watermark passes their
    * interval's upper bound (Spark holds them in state exactly that long —
    * the time condition is what makes outer emission decidable on an
    * unbounded stream). Identical semantics on batch frames, immediately.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      before: String,
      after: String,
      joinType: String = "inner"): DataFrame = {
    val r = right.withColumnRenamed("ts", "r_ts")
    left.join(r, left(keyCol) === r(keyCol) &&
        col("r_ts") >= col("ts") - expr(s"INTERVAL $before") &&
        col("r_ts") <= col("ts") + expr(s"INTERVAL $after"), joinType)
      .drop(r(keyCol))
  }

  /** Start a memory-sink query for tests/demos and drain all available
    * input synchronously.
    */
  def runToMemory(df: DataFrame, name: String, outputMode: String): StreamingQuery = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(outputMode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q
  }
}

/** Typed event for the stateful operators. */
final case class KeyedEvent(user_id: Long, event_id: Long,
    ts: java.sql.Timestamp, value: Double)

/** Current per-key state emitted by [[StatefulOps.latestPerKeyStateful]]. */
final case class LatestState(user_id: Long, event_id: Long,
    ts: java.sql.Timestamp, value: Double, updates: Long)

/** A closed session emitted by [[StatefulOps.sessionizeStateful]]. */
final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

/** Open-session state for [[StatefulOps.sessionizeStateful]] (epoch ms). */
final case class SessionState(start: Long, last: Long, n: Long, total: Double)

/** A document arriving on the ingest stream, already reduced to its
  * 8-byte content hash (hash upstream — e.g. `Hashing.hash60(text)` — so
  * no text ever enters the state store).
  */
final case class HashedDoc(doc_id: Long, content_hash: Long)

/** First-occurrence admission emitted by [[StatefulOps.firstSeenStateful]]. */
final case class FirstSeen(content_hash: Long, doc_id: Long)

/** Per-hash state for [[StatefulOps.firstSeenStateful]]. */
final case class SeenState(first_doc_id: Long, n_dups: Long)

/** Custom streaming state via `mapGroupsWithState`: the W1 latest-per-key
  * dedup maintained as LIVE state across micro-batches — each batch emits
  * the current winner per key plus how many events have ever updated it.
  * (The stateful generalization of the batch `CdcOps.latestPerKey`; state
  * store size is O(distinct keys), sharded by the groupBy shuffle.)
  */
object StatefulOps {
  import org.apache.spark.sql.{Dataset, Encoders}
  import org.apache.spark.sql.streaming.GroupStateTimeout

  /** Streaming sessionization via `flatMapGroupsWithState` with an
    * event-time timeout — the custom-state generalization of the batch
    * `sessionize` query: a session closes either INLINE (a new event for
    * the key arrives past the gap, so the prior run is provably over) or
    * on TIMEOUT (the watermark passes last-event + gap, proving no
    * further event can extend it). Append-mode output: exactly one row
    * per closed session, never updated. State is one open session per
    * active key — O(active keys), sharded by the groupBy shuffle, and
    * self-cleaning: every timeout removes its key's state.
    *
    * Input must carry a watermark on `ts` (the caller picks the lateness
    * bound); without one, EventTimeTimeout never fires and only inline
    * closes are emitted.
    */
  def sessionizeStateful(
      events: Dataset[KeyedEvent], gapMs: Long): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val keyEnc = Encoders.scalaLong
    // Event time carries MICROSECOND precision (parquet micros); folding
    // through Timestamp.getTime (millis) would truncate session bounds and
    // break parity with batch session_window. State keeps epoch micros.
    def toUs(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    def fromUs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    val gapUs = gapMs * 1000L
    def close(key: Long, s: SessionState) =
      SessionOut(key, fromUs(s.start), fromUs(s.last), s.n, s.total)
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) { (key, evs, state) =>
        if (state.hasTimedOut) {
          val out = close(key, state.get)
          state.remove()
          Iterator(out)
        } else {
          // Micro-batch arrival order is not event-time order: sort the
          // batch before folding it into the open session.
          val sorted = evs.toSeq.sortBy(e => (toUs(e.ts), e.event_id))
          var closed = List.empty[SessionOut]
          var cur = state.getOption
          // Cross-batch LATE events older than the open session's merge
          // range (t + gap <= start) form their own EARLIER sessions.
          // Sorted order puts them in a prefix; fold that prefix with the
          // normal gap logic so multiple late events within gap of each
          // other become ONE session (batch session_window parity), not
          // per-event singletons. The final late run can reach the open
          // session's merge range once accumulated — then it merges in.
          val late = cur match {
            case Some(s) =>
              val (older, rest) = sorted.span(e => toUs(e.ts) + gapUs <= s.start)
              var o: Option[SessionState] = None
              for (e <- older) {
                val t = toUs(e.ts)
                o = o match {
                  case Some(os) if t - os.last < gapUs =>
                    Some(SessionState(os.start, t, os.n + 1, os.total + e.value))
                  case Some(os) =>
                    closed ::= close(key, os)
                    Some(SessionState(t, t, 1L, e.value))
                  case None => Some(SessionState(t, t, 1L, e.value))
                }
              }
              o.foreach { os =>
                if (os.last + gapUs > s.start)
                  cur = Some(SessionState(math.min(os.start, s.start), s.last,
                    s.n + os.n, s.total + os.total))
                else closed ::= close(key, os)
              }
              rest
            case None => sorted
          }
          for (e <- late) {
            val t = toUs(e.ts)
            cur = cur match {
              case Some(s) if t >= s.last && t - s.last < gapUs =>
                Some(SessionState(s.start, t, s.n + 1, s.total + e.value))
              case Some(s) if t < s.last =>
                // Cross-batch late event inside the open session's reach
                // (the too-old prefix was handled above): merge, extending
                // start backward if needed but NEVER moving `last`
                // backward — that would shorten the timeout deadline and
                // break the "never closes before last-event + gap"
                // guarantee.
                Some(SessionState(math.min(s.start, t), s.last,
                  s.n + 1, s.total + e.value))
              case Some(s) =>
                closed ::= close(key, s)
                Some(SessionState(t, t, 1L, e.value))
              case None =>
                Some(SessionState(t, t, 1L, e.value))
            }
          }
          cur.foreach { s =>
            state.update(s)
            // timeout API is millisecond-granular: round UP so a session
            // can never close before its true last-event + gap. Clamp above
            // the current watermark — with allowed lateness > gap, a late
            // event's deadline can already be in the past, and Spark
            // rejects timeouts at/below the watermark.
            val deadline = Math.floorDiv(s.last + gapUs + 999L, 1000L)
            state.setTimeoutTimestamp(
              math.max(deadline, state.getCurrentWatermarkMs() + 1))
          }
          closed.reverseIterator
        }
      }
  }

  /** Streaming exact dedup with ALL-TIME state: only the first occurrence
    * of each content hash — across every micro-batch since stream start —
    * is admitted downstream; replays and late duplicates emit nothing.
    *
    * This is the corpus-ingestion shape `dropDuplicatesWithinWatermark`
    * cannot provide: watermark state EXPIRES, so a duplicate arriving
    * after the horizon is re-admitted — correct for event streams, wrong
    * for training-corpus dedup where "seen once, ever" is the contract.
    * The price is state that grows with distinct content: 16 bytes per
    * hash (the input is pre-hashed; no text enters the store), sharded by
    * the groupBy shuffle — at 10^10 distinct docs that is ~160 GB across
    * the cluster's RocksDB state stores, which is exactly what they're
    * for. Within one micro-batch the winner is the smallest doc_id
    * (deterministic under replay); `n_dups` counts suppressed arrivals.
    */
  def firstSeenStateful(docs: Dataset[HashedDoc]): Dataset[FirstSeen] = {
    implicit val stateEnc = Encoders.product[SeenState]
    implicit val outEnc = Encoders.product[FirstSeen]
    implicit val keyEnc = Encoders.scalaLong
    docs.groupByKey(_.content_hash)
      .flatMapGroupsWithState[SeenState, FirstSeen](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) { (key, rows, state) =>
        val batch = rows.toSeq
        state.getOption match {
          case Some(s) =>
            state.update(SeenState(s.first_doc_id, s.n_dups + batch.size))
            Iterator.empty
          case None =>
            val first = batch.minBy(_.doc_id)
            state.update(SeenState(first.doc_id, batch.size - 1L))
            Iterator.single(FirstSeen(key, first.doc_id))
        }
      }
  }

  def latestPerKeyStateful(events: Dataset[KeyedEvent]): Dataset[LatestState] = {
    implicit val stateEnc = Encoders.product[LatestState]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .mapGroupsWithState[LatestState, LatestState](
        GroupStateTimeout.NoTimeout()) { (key, evs, state) =>
        val prior = state.getOption
        val batch = evs.toSeq
        val newest = (prior.map(p =>
          KeyedEvent(p.user_id, p.event_id, p.ts, p.value)).toSeq ++ batch)
          .maxBy(e => (e.ts.getTime, e.event_id))
        val next = LatestState(key, newest.event_id, newest.ts, newest.value,
          prior.map(_.updates).getOrElse(0L) + batch.size)
        state.update(next)
        next
      }
  }
}
