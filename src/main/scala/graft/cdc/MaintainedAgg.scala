package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.table.CowTable

/** FEED-DRIVEN maintained grouped aggregate: COUNT + SUM (and optionally
  * MIN/MAX) state over any commit-stamped table, kept current from the
  * table's own change feed ([[CowTable.changeFeedWithPreimages]]) — no
  * pipeline hook required, so it chains off anything that commits: a
  * CDC-written table, a [[MaintainedJoin]] view with
  * `trackViewVersions = true` (the star-schema pipeline fact ⟕ dim →
  * GROUP BY, maintained end-to-end), or a table fed by the streaming sink.
  *
  * Delta algebra straight off the feed: U rows add (+1, +value), B
  * (preimage) rows retract (-1, -value), D rows contribute nothing (their
  * retraction IS their B row). COUNT/SUM are abelian, and the sum runs in
  * DECIMAL(28,6) ([[IncrementalAgg]]'s exactness argument), so
  * fold∘feed over any commit sequence equals recomputing from the
  * snapshot — per refresh the engine touches the churn, not the table.
  *
  * MIN/MAX (`minMaxCols`) are NOT retractable — the textbook non-abelian
  * case — so they maintain optimistically: window inserts fold with
  * `least`/`greatest`; a retracted image STRICTLY inside a group's stored
  * (min, max) cannot move either bound and costs nothing; only a
  * retraction that ties a stored extreme triggers an authoritative
  * re-aggregation OF THAT GROUP from the source, group-scoped through
  * [[CowTable.snapshotForValuesAt]] (value-set file skipping, pinned at
  * the window end) — so the repair cost scales with the hit groups'
  * stripes, not the table.
  *
  * The high-water mark (last folded source version) rides the aggregate
  * table's own commit metrics (monotone — survives service commits), the
  * same exactly-once ledger as [[MaintainedJoin]]; the whole fold
  * (updates + vanished-group deletes + mark) lands in ONE `mergeInto`
  * commit, so there is no crash window where the mark outruns the state.
  * A mark that ages out of the source's retained timeline reseeds by
  * full recompute.
  *
  * vs [[IncrementalAgg.MaintainedView]]: that form captures deltas inside
  * the CDC pipeline's pre-merge hook (no stamps needed on the source);
  * this form needs `trackCommitVersions` but decouples maintenance from
  * writing entirely — refresh on YOUR cadence, fold many source commits
  * in one window.
  */
final class MaintainedAgg(
    spark: SparkSession,
    aggPath: String,
    src: CowTable,
    spec: IncrementalAgg.AggSpec,
    /** Columns to maintain min/max over (optimistic + group-scoped
      * repair). Empty = count/sum only.
      */
    minMaxCols: Seq[String] = Nil,
    /** Also maintain the sum of squares (`total_sq`) of the value column —
      * squares are as abelian as sums, so it folds exactly through the
      * same +U/−B algebra, and variance/stddev derive at read time:
      * `var = total_sq/cnt − (total/cnt)²`. What makes per-group quality
      * dashboards (mean ± σ of a score column) maintainable without ever
      * rescanning the table.
      */
    trackSquares: Boolean = false,
    /** Maintain the aggregate over only the rows satisfying this
      * predicate (a maintained FILTERED aggregate, e.g. revenue of
      * non-cancelled orders). Applied identically to the recompute seed
      * and to both feed sides, so a row UPDATE that crosses the filter
      * boundary folds correctly: the new image adds iff it passes, the
      * preimage retracts iff it passed.
      */
    rowFilter: Option[Column] = None,
    /** Stamp the STATE table's own commits so it can feed further
      * consumers — the [[MaintainedJoin]] `trackViewVersions` analog;
      * what [[MaintainedDistinct]] stacks on.
      */
    trackStateVersions: Boolean = false,
    /** Key-hash buckets for the STATE table. Essential when the state is
      * large (many groups — [[MaintainedDistinct]]'s support level is
      * |distinct (group, value)| rows): an unbucketed state table is ONE
      * copy-on-write unit, so every fold rewrites the whole state and
      * maintenance cost degenerates to state size. Bucketed, a fold
      * rewrites only the buckets its delta touches.
      */
    stateBuckets: Int = 0,
    /** Per-file group-key index entries for the STATE table (0 = off).
      * The fold's point read of the churned groups ([[CowTable
      * .lookupByKeys]]) and the merge's candidate pruning both use it —
      * at many-group scale ([[MaintainedDistinct]]'s support level) this
      * is what keeps a fold's reads churn-proportional instead of
      * state-proportional. Write-side cost is near zero now that index
      * stats ride the commit's own write job (the write-tracker path);
      * the default stays off for small states, where the merge's extra
      * prune probe job outweighs the scan it saves.
      */
    stateIndexEntries: Int = 0) {

  require(src.trackCommitVersions,
    "MaintainedAgg sources must track commit versions (change feeds)")

  /** The aggregate state table, keyed by the group columns. */
  val table = new CowTable(spark, aggPath, keyCols = spec.groupCols,
    trackCommitVersions = trackStateVersions, numBuckets = stateBuckets,
    fileIndexEntries = stateIndexEntries)

  // registration surface for the automatic materialized-view rewrite
  // (graft.sources.MvRegistry.register(this))
  private[graft] def sourceTable: CowTable = src
  private[graft] def aggSpec: IncrementalAgg.AggSpec = spec
  private[graft] def aggMinMaxCols: Seq[String] = minMaxCols
  private[graft] def aggTracksSquares: Boolean = trackSquares
  private[graft] def hasRowFilter: Boolean = rowFilter.nonEmpty

  private val Mark = MaintainedAgg.SrcVersionMark
  private val ct = CowTable.ChangeTypeCol
  private val g = spec.groupCols

  private def stateCols: Seq[String] =
    g ++ Seq("cnt", "total") ++
      (if (trackSquares) Seq("total_sq") else Nil) ++
      minMaxCols.flatMap(c => Seq(s"min_$c", s"max_$c"))

  /** The maintained aggregate as stored: groupCols..., cnt, total
    * [, min_c, max_c per minMaxCols entry].
    */
  def current: DataFrame =
    table.snapshot().select(stateCols.map(col): _*)

  private def dec(c: Column) =
    c.cast(org.apache.spark.sql.types.DecimalType(28, 6))

  /** v² at a FIXED decimal type: recompute and the signed fold must
    * produce bit-identical values or retraction drifts, so both route
    * through this one expression. Inputs cast to (18,6) so the product
    * lands at (37,12) — within Spark's 38-digit cap, so no precision-loss
    * scale adjustment fires and the square is EXACT for any |v| < 10¹²
    * (beyond that the (18,6) cast nulls, a loud failure, not drift).
    */
  private def sq(c: Column) = {
    val d18 = org.apache.spark.sql.types.DecimalType(18, 6)
    (c.cast(d18) * c.cast(d18))
      .cast(org.apache.spark.sql.types.DecimalType(38, 12))
  }

  /** The full aggregate state of `df` from scratch (seed/reseed path and
    * the recompute oracle for tests).
    */
  def recompute(df0: DataFrame): DataFrame = {
    val df = rowFilter.map(df0.filter).getOrElse(df0)
    val aggs = Seq(count(lit(1)).as("cnt"),
        sum(dec(col(spec.valueCol))).as("total")) ++
      (if (trackSquares)
         Seq(sum(sq(col(spec.valueCol))).as("total_sq")) else Nil) ++
      minMaxCols.flatMap(c =>
        Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy(g.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** [[current]] plus derived `mean`, `variance` (population) and
    * `stddev` — the read-time payoff of `trackSquares`: per-group
    * dispersion stats that stay current off the change feed without ever
    * rescanning the source. Doubles (dispersion is inherently a
    * floating-point readout); the STORED state stays exact decimal.
    */
  def currentWithStats: DataFrame = {
    require(trackSquares, "currentWithStats requires trackSquares = true")
    val m = col("total").cast("double") / col("cnt")
    current
      .withColumn("mean", m)
      // clamp: total_sq/cnt - mean² can go ~-1e-12 under double rounding
      .withColumn("variance", greatest(
        col("total_sq").cast("double") / col("cnt") - m * m, lit(0.0)))
      .withColumn("stddev", sqrt(col("variance")))
  }

  /** Persist the view's definition next to its state (`_mv.json`) so a
    * NEW session can re-arm the rewrite from the path alone
    * ([[graft.sources.MvRegistry.registerPath]]) — the in-memory
    * registry is per-process; the sidecar is the durable record (the
    * catalog-of-MV-definitions a warehouse engine keeps).
    */
  private def writeMvSidecar(): Unit = {
    def js(s: String) = "\"" + s.replace("\\", "\\\\")
      .replace("\"", "\\\"") + "\""
    def arr(xs: Seq[String]) = xs.map(js).mkString("[", ",", "]")
    val txt = s"""{"srcPath":${js(src.basePath)},""" +
      s""""groupCols":${arr(spec.groupCols)},""" +
      s""""valueCol":${js(spec.valueCol)},""" +
      s""""minMaxCols":${arr(minMaxCols)},""" +
      s""""trackSquares":$trackSquares,""" +
      s""""rewriteEligible":${rowFilter.isEmpty}}"""
    val fs = new org.apache.hadoop.fs.Path(aggPath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(aggPath, MaintainedAgg.MvSidecar), true)
    try out.write(txt.getBytes("UTF-8")) finally out.close()
  }

  /** Fold all source commits since the last refresh — or seed/reseed by
    * recompute when the state doesn't exist or the mark fell behind
    * retention. Returns the refreshed aggregate.
    */
  private def T[X](tag: String)(f: => X): X = {
    val t0 = System.nanoTime(); val r = f
    if (sys.env.contains("GRAFT_TRACE_MERGE"))
      println(f"[matrace] $tag%-12s ${(System.nanoTime()-t0)/1e9}%6.2fs")
    r }
  /** Seed/reseed frame + the mark it must claim: the snapshot is PINNED
    * at the version the mark records. Seeding from an unpinned
    * `snapshot()` while stamping an earlier head would let a source
    * commit that lands mid-(re)seed be present in the seeded state AND
    * folded again by the next refresh — and agg deltas are not
    * replay-idempotent (double-count). Pins at the NOW-current head (the
    * newest version is always inside retention).
    */
  private def pinnedRecompute(): (DataFrame, Long) = {
    val h = src.manifest.version
    (recompute(src.snapshotAt(h)), h)
  }

  /** The last successful fold's OWN change-feed window, for STACKED
    * consumers (a second MaintainedAgg fed by this one's state table —
    * [[MaintainedDistinct]]'s level 2): `(stateVersionBefore,
    * stateVersionAfter, U∪B rows)`. The frame is exactly the U/B subset
    * `changeFeedWithPreimages(before, after)` on the state table would
    * return — U = the fold's written next-state rows (the only rows
    * stamped with the new version), B = the fold's point-read preimages
    * (`affected` covers every touched-or-deleted stored group) — derived
    * from the fold's already-checkpointed churn frames, so a consumer
    * that takes it skips re-reading the just-written files AND the
    * preimage point-read. D rows are omitted: the feed-fold algebra is
    * "+U, −B, ignore D" (a delete's retraction rides its B row). None
    * whenever the incremental feed does not exist: seed, reseed, no-op
    * refresh, or a failed fold. Consumers MUST verify their mark equals
    * `stateVersionBefore` and fall back to the table feed otherwise —
    * [[refreshFromFeed]] does.
    */
  private[cdc] var lastFoldFeed: Option[(Long, Long, DataFrame)] = None

  /** [[refresh]] for a stacked consumer, taking the upstream state
    * table's window feed directly from [[lastFoldFeed]] instead of
    * re-reading it from disk. Safe by construction: the in-memory path
    * engages only when this aggregate's mark equals the window's start
    * version (anything else — lag from a crash between the two levels'
    * folds, a reseeded upstream, a no-op — falls back to the plain
    * table-feed [[refresh]], which is always correct), and any failure
    * inside the in-memory fold falls back the same way (the fold is one
    * atomic commit, so a crash leaves no partial state).
    */
  private[cdc] def refreshFromFeed(ub: DataFrame, sinceVer: Long,
      headVer: Long): DataFrame = {
    lastFoldFeed = None
    if (!table.exists) return refresh()
    val mark = table.manifest.metrics.getOrElse(Mark, 0L)
    if (mark != sinceVer) return refresh()
    if (mark == headVer) return current
    try {
      val feed = T("feed-mem")(rowFilter.map(ub.filter).getOrElse(ub)
        .localCheckpoint(false))
      foldWindow(feed, headVer)
    } catch {
      case t if scala.util.control.NonFatal(t) => refresh()
    }
  }

  def refresh(): DataFrame = {
    lastFoldFeed = None // a stale window never survives a new refresh
    val head = src.manifest.version
    if (!table.exists) {
      val (seedDf, h) = pinnedRecompute()
      table.bulkInsert(seedDf, extraMetrics = Map(Mark -> h))
      writeMvSidecar()
      return current
    }
    val mark = table.manifest.metrics.getOrElse(Mark, 0L)
    if (mark == head) return current
    // LAZY localCheckpoint(false) on the feed: it has exactly ONE
    // consumer (the delta aggregation below — the extremes algebra rides
    // the delta since it carries per-group insert/retraction min/max),
    // so the lazy form truncates lineage like the eager one but
    // materializes INSIDE the delta job instead of paying a dedicated
    // checkpoint round. Everything multi-consumer below stays EAGER: a
    // lazy checkpoint referenced twice inside one job computes its
    // subtree twice (measured slower, not faster).
    val feed =
      try {
        val f0 = src.changeFeedWithPreimages(mark, head)
        // filtered aggregates: U adds iff the new image passes, B
        // retracts iff the old image passed — one row-level filter
        T("feed")(rowFilter.map(f0.filter).getOrElse(f0).localCheckpoint(false))
      } catch {
        // mark aged out of the source's retained timeline (driver-side
        // manifest miss) or a data file already cleaned at DataFrame
        // construction: reseed
        case t: Throwable if t.isInstanceOf[IllegalArgumentException] ||
            MaintainedJoin.sourceRetentionRace(t,
              Seq(src.basePath), table.basePath) =>
          val (seedDf, h) = pinnedRecompute()
          table.overwrite(seedDf, extraMetrics = Map(Mark -> h))
          return current
      }
    // the lazily-checkpointed feed reads its data files inside the fold's
    // jobs; a retention clean racing the fold surfaces there as a
    // (Spark-wrapped) FileNotFoundException — route it to the same reseed
    // as a driver-side manifest miss. Safe: the fold is a single commit,
    // so a caught crash left no partial state behind, and the reseed
    // overwrite is correct from any prior state.
    try foldWindow(feed, head)
    catch {
      case t: Throwable if MaintainedJoin.sourceRetentionRace(t,
          Seq(src.basePath), table.basePath) =>
        val (seedDf, h) = pinnedRecompute()
        table.overwrite(seedDf, extraMetrics = Map(Mark -> h))
        current
    }
  }

  /** Apply one change-feed window to the state as a single merge commit
    * (updates + deletes + mark advance atomically).
    */
  private def foldWindow(feed: DataFrame, head: Long): DataFrame = {
    // internal aliases are _ma_-reserved: a GROUP column may legitimately
    // be named "v"/"w" (e.g. MaintainedDistinct's support level groups by
    // the value column)
    val signed = feed.filter(col(ct).isin("U", "B")).select(
      (g.map(col) :+
        when(col(ct) === "U", 1L).otherwise(-1L).as("_ma_w") :+
        when(col(ct) === "U", dec(col(spec.valueCol)))
          .otherwise(-dec(col(spec.valueCol))).as("_ma_v")) ++
      (if (trackSquares)
         Seq(when(col(ct) === "U", sq(col(spec.valueCol)))
           .otherwise(-sq(col(spec.valueCol))).as("_ma_vsq")) else Nil) ++
      // extremes bookkeeping rides the SAME row pass: per-group min/max
      // of inserted values (optimistic fold input) and of retracted
      // values (tie detection: a retracted value ties the stored min iff
      // min(retracted) == stored min — all retracted values are >= it)
      minMaxCols.flatMap(c => Seq(
        when(col(ct) === "U", col(c)).as(s"_ma_u_$c"),
        when(col(ct) === "B", col(c)).as(s"_ma_r_$c"))): _*)
    val dAggs = Seq(sum(col("_ma_w")).as("d_cnt"),
        sum(col("_ma_v")).as("d_total")) ++
      (if (trackSquares)
        Seq(sum(col("_ma_vsq")).as("d_total_sq")) else Nil) ++
      minMaxCols.flatMap(c => Seq(
        min(col(s"_ma_u_$c")).as(s"u_min_$c"),
        max(col(s"_ma_u_$c")).as(s"u_max_$c"),
        min(col(s"_ma_r_$c")).as(s"r_min_$c"),
        max(col(s"_ma_r_$c")).as(s"r_max_$c")))
    // The delta aggregation and the state point-read are INDEPENDENT
    // jobs: the lookup's probe keys are the feed's distinct U/B groups —
    // exactly the delta's group set, available without waiting for the
    // aggregation. Run them on two threads (both scan the feed's lazily
    // checkpointed blocks; concurrent block computation is
    // single-flighted by the block manager), halving this stage of the
    // fold's sequential job-round chain. The empty-window gate probe
    // rides the delta's own thread (a tiny scan of the just-checkpointed
    // blocks), so it costs no sequential job round of its own.
    // fold ONLY the touched groups: a POINT READ of the churned group
    // keys (bucket/file-index pruned on a bucketed state table) replaces
    // a full state scan, so refresh cost scales with the window's churn
    // — never with the number of groups the state has accumulated. The
    // untouched groups are simply not part of the merge.
    val ((delta, deltaEmpty), (affected, touchedKeys)) =
      graft.util.Overlap.withBg(
      T("delta"){
        val d0 = signed.groupBy(g.map(col): _*)
          .agg(dAggs.head, dAggs.tail: _*).localCheckpoint()
        (d0, d0.isEmpty)
      }) { d =>
      // the lookup's probe routing doubles as the merge's touched-keys
      // hint: every merge output group (next/gone) comes from the probed
      // churn groups, so the probe's unit set is a sound superset
      val aff = T("affected") {
        val (rows, tk) = table.lookupByKeysTouched(
          feed.filter(col(ct).isin("U", "B"))
            .select(g.map(col): _*).distinct())
        (rows.select(stateCols.map(col): _*).localCheckpoint(), tk)
      }
      (d(), aff)
    }
    val marksM = Map(Mark -> head)
    if (T("gate-delta")(deltaEmpty)) {
      // stamp-filtered feed held nothing: still advance the ledger
      // (the concurrently point-read state subset is simply unused)
      val verBefore = table.manifest.version
      table.delete(current.limit(0), extraMetrics = marksM)
      // the ledger-advance commit carries an EMPTY window: hand stacked
      // consumers the empty feed so they advance without a disk read.
      // Claim the window ONLY if our commit is exactly verBefore+1 — a
      // concurrent OCC writer landing first would otherwise hide its
      // window inside ours (see the mergeInto handoff below).
      if (table.manifest.version == verBefore + 1)
        lastFoldFeed = Some((verBefore, verBefore + 1,
          current.limit(0).withColumn(ct, lit("U").cast("string"))))
      return current
    }
    // FUSED next state: counts, sums AND the optimistic min/max fold all
    // ride ONE union + aggregation. least(stored_min, inserted_min) over
    // a full-outer group join is exactly min() over the two sides
    // union'd (min/max skip nulls, and a side with no row contributes
    // nothing — the same algebra as an absent join match), so the
    // extremes need no join of their own: the stored extremes enter as
    // the affected side's min_c/max_c, the window-insert extremes as the
    // delta side's u_min_c/u_max_c, and the aggregate folds both. What
    // this buys per fold: the former full-outer (stored ⊕ inserts) and
    // left (state ⟕ extremes) joins vanish from the plan — two fewer
    // exchanges in the commit's write job and a visibly shorter catalyst
    // planning stretch (the fold's biggest driver-side cost). Hit groups
    // (a retraction TIED a stored bound — the only case optimism can't
    // answer) are repaired by a small override join afterwards.
    val sums = Seq("cnt", "total") ++
      (if (trackSquares) Seq("total_sq") else Nil)
    val affSide = affected.select((g.map(col) ++ sums.map(col) ++
      minMaxCols.flatMap(c => Seq(col(s"min_$c"), col(s"max_$c")))): _*)
    val deltaSide = delta.select(((g.map(col) :+
        col("d_cnt").as("cnt") :+ col("d_total").as("total")) ++
      (if (trackSquares) Seq(col("d_total_sq").as("total_sq")) else Nil) ++
      minMaxCols.flatMap(c => Seq(col(s"u_min_$c").as(s"min_$c"),
        col(s"u_max_$c").as(s"max_$c")))): _*)
    val fusedAggs = Seq(sum(col("cnt")).as("cnt"),
        sum(col("total")).as("total")) ++
      (if (trackSquares) Seq(sum(col("total_sq")).as("total_sq")) else Nil) ++
      minMaxCols.flatMap(c => Seq(min(col(s"min_$c")).as(s"min_$c"),
        max(col(s"max_$c")).as(s"max_$c")))
    // Groups whose count reaches zero are dropped (fully retracted) —
    // same contract as IncrementalAgg.apply.
    val nextBase = T("nextBase")(affSide.unionByName(deltaSide)
      .groupBy(g.map(col): _*).agg(fusedAggs.head, fusedAggs.tail: _*)
      .filter(col("cnt") =!= 0))
    // The final state is NOT checkpointed at all: its single consumer is
    // the merge commit's input, which mergeInto persist()s before its
    // first job — the blocks materialize exactly once there either way,
    // and a localCheckpoint(false) here would only buy a SECOND full
    // optimizer/physical-planning pass (measured ~0.3-0.5s of pure
    // driver latency per fold; the round-18 lazy-ck guidance predates
    // the fused plan). Attribute-id hygiene holds without it: every
    // state-table-reading frame it references (affected) is already an
    // eagerly checkpointed LogicalRDD, so the merge's cur ⋈ incoming
    // self-join sees no shared scan attributes.
    // groups fully retracted this window (cnt hit zero): derived from the
    // checkpointed churn frames ALONE — state stores only cnt != 0 rows,
    // so a stored group vanishes iff the window's delta exactly cancels
    // it (affected ⋈ delta with cnt + d_cnt == 0; a stored group absent
    // from the delta keeps its nonzero cnt, and a delta-only group has no
    // stored row to delete). Equivalent to an anti-join of `affected`
    // against `next`'s keys.
    val goneCond = g.map(c => affected(c) <=> delta(c)).reduce(_ && _)
    val goneKeys = affected.join(delta, goneCond, "inner")
      .filter(affected("cnt") + delta("d_cnt") === 0)
      .select(g.map(c => affected(c).as(c)): _*)
    val next =
      if (minMaxCols.isEmpty) nextBase
      else T("extremes")(withExtremes(nextBase, delta, head, affected))
    // ONE commit applies updates + deletes + the mark advance
    // atomically — a two-commit fold could crash with the mark already
    // advanced and the deletes lost, and (unlike MaintainedJoin's image
    // folds) an agg delta re-applied on replay would double-count.
    val goneBase = {
      val b = goneKeys
        .withColumn("cnt", lit(0L))
        .withColumn("total", lit(null).cast(next.schema("total").dataType))
      if (trackSquares)
        b.withColumn("total_sq",
          lit(null).cast(next.schema("total_sq").dataType))
      else b
    }
    val gone = minMaxCols.foldLeft(goneBase) { (df, c) =>
        df.withColumn(s"min_$c",
            lit(null).cast(next.schema(s"min_$c").dataType))
          .withColumn(s"max_$c",
            lit(null).cast(next.schema(s"max_$c").dataType))
      }
      .withColumn("_ma_del", lit(true))
    // the delete branch is ALWAYS routed (no vanished-group pre-gate):
    // the incoming-only tombstone pass is a filter + distinct over the
    // already-cached merge input, run on a background thread UNDER the
    // commit's write job — so discovering "no gone groups" there costs
    // zero wall time, where the old pre-gate spent a dedicated
    // emptiness-probe JOB on every fold (fully sequential in the
    // no-extremes fold, which has no planning work to hide it behind).
    // writeTombstones records nothing when the key set turns out empty
    // (footer row-count guard). Routed by one flag column, so
    // delete/insert conditions are disjoint — the incoming-only
    // tombstone pass applies (and gone keys are stored groups by
    // construction, so it never over-approximates here).
    val verBefore = table.manifest.version
    table.mergeInto(next.withColumn("_ma_del", lit(false))
        .unionByName(gone),
      whenMatchedDelete = col("i._ma_del"),
      insertCondition = !col("i._ma_del"),
      conditionCols = Seq("_ma_del"),
      tombstonesFromIncoming = true,
      extraMetrics = marksM,
      touchedKeys = Some(touchedKeys))
    // Window feed for stacked consumers (see [[lastFoldFeed]]): U rows
    // are exactly the merge's incoming next-state rows (the only rows
    // the new version stamps; the gone branch writes tombstones, not
    // data), B rows are exactly the point-read preimages (`affected` =
    // every churned STORED group = next's updated groups ∪ the gone
    // groups). Both sides derive from checkpointed churn frames, so a
    // consumer evaluating this never touches the just-written files.
    // Claim the window ONLY if our commit is exactly verBefore+1: under
    // OCC a concurrent writer's rebased commit could land between our
    // mergeInto and this manifest read, and a (verBefore, laterVersion)
    // claim would silently swallow that foreign window — the version
    // check routes that case to the table-feed fallback, which reads
    // both windows. And only when extremes are OFF: with minMaxCols a
    // tie-hit window's `next` embeds withExtremes' authoritative source
    // re-aggregation, so a stacked consumer evaluating the handoff would
    // re-run source-reading jobs at its own fold time — correct, but
    // breaking this feed's "already checkpointed, no source reads" cost
    // contract and racing source retention. The only current consumer
    // (MaintainedDistinct's count level) never tracks extremes; an
    // extremes-tracking upstream simply routes consumers to the
    // table-feed path, which reads the committed window.
    if (minMaxCols.isEmpty && table.manifest.version == verBefore + 1)
      lastFoldFeed = Some((verBefore, verBefore + 1,
        next.select(stateCols.map(col): _*)
          .withColumn(ct, lit("U").cast("string"))
          .unionByName(affected.select(stateCols.map(col): _*)
            .withColumn(ct, lit("B").cast("string")))))
    current
  }

  /** Repair the fused state's min/max where optimism can't answer.
    * `nextBase` already carries the OPTIMISTIC extremes (they rode the
    * fused union + aggregation); the one case that fold cannot decide is
    * a retraction that TIES a stored bound — the bound may shrink and
    * needs source truth. This method detects those hit groups and, in
    * the COMMON window where there are none, returns `nextBase`
    * untouched — zero extra joins, zero extra jobs beyond the one tiny
    * gate probe. Hit windows override exactly the hit groups' extremes
    * with an authoritative group-scoped re-aggregation.
    *
    * Null-safe group joins throughout — a null group value (e.g. the
    * unmatched side of a maintained left join) is a real group. `st` is
    * the point-read state subset for the window's touched groups; both
    * it and `delta` are tiny, churn-sized, already checkpointed: the
    * retraction extremes (r_min/r_max) rode the delta aggregation, so
    * no re-scan of the feed happens here. Tie detection needs only the
    * retraction extremes: every retracted value is >= the stored min,
    * so SOME retracted value equals it iff min(retracted) does (plain
    * `===` — null-false — is exactly right: a stored null min means the
    * group has no non-null values, and retracting a null can never
    * shrink a bound).
    */
  private def withExtremes(nextBase: DataFrame, delta: DataFrame,
      head: Long, st: DataFrame): DataFrame = {
    // hit groups: a retracted image TIES a stored extreme
    val hitCond = g.map(c => delta(c) <=> st(c)).reduce(_ && _)
    val hits = T("ext-hits-plan")(delta.join(st, hitCond, "inner")
      .filter(minMaxCols.map(c =>
          delta(s"r_min_$c") === st(s"min_$c") ||
          delta(s"r_max_$c") === st(s"max_$c"))
        .reduce(_ || _))
      // LAZY: in the common no-hit window the isEmpty gate below scans
      // every partition (finding nothing) and IS the materialization —
      // an eager checkpoint would be a redundant extra job
      .select(g.map(c => delta(c).as(c)): _*).localCheckpoint(false))

    // ONE probe job doubles as the emptiness gate AND the repair read's
    // bounded value collect (single group column): the separate
    // isEmpty-then-collect pair was two jobs over the same tiny frame
    val hitVals: Either[Boolean, Seq[Any]] = T("ext-hits-gate")(
      if (g.size == 1)
        Right(hits.limit(MaintainedAgg.MaxRepairGroups + 1)
          .collect().map(_.get(0)).toSeq)
      else Left(hits.isEmpty))
    // the COMMON window ties no stored extreme: the fused optimistic
    // fold is already the whole answer
    if (hitVals.fold(identity, _.isEmpty)) return nextBase

    // authoritative re-aggregation of the hit groups, group-scoped and
    // pinned at the window end (same row filter as every other read)
    val srcRows0 = hitVals match {
      case Right(vals) if vals.size <= MaintainedAgg.MaxRepairGroups =>
        src.snapshotForValuesAt(head, g.head, vals)
      case _ => src.snapshotAt(head)
    }
    val srcRows = rowFilter.map(srcRows0.filter).getOrElse(srcRows0)
    val recCond = g.map(c => srcRows(c) <=> hits(c)).reduce(_ && _)
    val recAggs = minMaxCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    // the marker column distinguishes "repaired, bound is genuinely
    // NULL" (an all-null hit group) from "not a hit group" after the
    // left join below — a bare coalesce would silently fall back to the
    // optimistic bound on the former
    val rec = srcRows.join(hits, recCond, "left_semi")
      .groupBy(g.map(col): _*).agg(recAggs.head, recAggs.tail: _*)
      .withColumn("_ma_rep", lit(true))

    // override ONLY the hit groups' extremes; counts/sums and every
    // non-hit group pass through unchanged. A hit group always has a
    // stored row (a tie needs a stored bound), so it is present in
    // nextBase unless it fully vanished this window — in which case the
    // left join drops its repair row with it, matching the gone-delete.
    val ovCond = g.map(c => nextBase(c) <=> rec(c)).reduce(_ && _)
    nextBase.join(rec, ovCond, "left")
      .select((g.map(c => nextBase(c).as(c)) ++
        Seq(nextBase("cnt"), nextBase("total")) ++
        (if (trackSquares) Seq(nextBase("total_sq")) else Nil) ++
        minMaxCols.flatMap(c => Seq(
          when(rec("_ma_rep"), rec(s"min_$c"))
            .otherwise(nextBase(s"min_$c")).as(s"min_$c"),
          when(rec("_ma_rep"), rec(s"max_$c"))
            .otherwise(nextBase(s"max_$c")).as(s"max_$c"))))
        .toIndexedSeq: _*)
  }

}

object MaintainedAgg {
  /** Commit-metrics key carrying the last folded source version — the
    * freshness signal the materialized-view rewrite gate reads
    * ([[graft.sources.MvRewriteRule]]).
    */
  val SrcVersionMark: String = CowTable.MonotoneMarkPrefix + "ma_src_version"

  /** Durable view-definition sidecar file name (see writeMvSidecar). */
  val MvSidecar: String = "_mv.json"

  /** Hit-group cap for the group-scoped repair read: beyond this many
    * groups the repair reads the pinned snapshot (the driver-side value
    * collect stays bounded; at that churn stripes cover the table).
    */
  val MaxRepairGroups = 10000
}
