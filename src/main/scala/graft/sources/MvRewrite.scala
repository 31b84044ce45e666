package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, AttributeReference, Cast, Expression, KnownNotNull,
  Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types._

import graft.cdc.MaintainedAgg
import graft.table.CowTable

/** Session-wide registry of [[graft.cdc.MaintainedAgg]] views eligible for
  * automatic query rewrite: a `GROUP BY` over the SOURCE table answers
  * from the maintained state table instead — the classic materialized-view
  * rewrite (Calcite / warehouse-engine style), which at 100 TB turns a
  * full fact-table aggregation into a read of the (tiny) group state.
  *
  * Registration is explicit and in-memory (`register(ma)`), mirroring how
  * an engine's catalog would record MV definitions; the REWRITE decision
  * is made per query by [[MvRewriteRule]] with a freshness gate: the
  * view's folded high-water mark must equal the source table's current
  * head version, so a rewrite NEVER serves stale data — an unfolded
  * source commit simply disables the rewrite until the next `refresh()`.
  * Filtered views (`rowFilter`) never register: their state is not the
  * unconditional aggregate a bare GROUP BY asks for.
  */
object MvRegistry {
  final case class Entry(
      srcPath: String,
      viewPath: String,
      groupCols: Seq[String],
      valueCol: String,
      minMaxCols: Seq[String],
      trackSquares: Boolean)

  // keyed by normalized source path; latest registration wins
  private val entries = TrieMap.empty[String, Entry]

  private[sources] def norm(p: String): String =
    new org.apache.hadoop.fs.Path(p).toString.stripSuffix("/")

  /** Register a maintained aggregate for rewrite. Refused (returns false)
    * for filtered views — their state answers a different query.
    */
  def register(ma: MaintainedAgg): Boolean = {
    if (ma.hasRowFilter) return false
    val spec = ma.aggSpec
    entries.put(norm(ma.sourceTable.basePath),
      Entry(norm(ma.sourceTable.basePath), ma.table.basePath,
        spec.groupCols, spec.valueCol, ma.aggMinMaxCols,
        ma.aggTracksSquares))
    true
  }

  def unregister(srcPath: String): Unit = entries.remove(norm(srcPath))
  def clear(): Unit = entries.clear()
  def isEmpty: Boolean = entries.isEmpty
  def lookup(srcPath: String): Option[Entry] = entries.get(norm(srcPath))

  /** Re-arm a view from its durable `_mv.json` sidecar (written by the
    * MaintainedAgg that owns the state — see
    * [[graft.cdc.MaintainedAgg.MvSidecar]]): what a NEW session calls so
    * rewrites survive process restarts without re-constructing the
    * MaintainedAgg object. Returns false when the sidecar is absent or
    * the view is rewrite-ineligible (filtered).
    */
  def registerPath(spark: SparkSession, viewPath: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(
      viewPath, graft.cdc.MaintainedAgg.MvSidecar)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return false
    val in = fs.open(p)
    val txt =
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 65536, false)
        new String(bytes.toByteArray, "UTF-8")
      } finally in.close()
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val j = JsonMethods.parse(txt)
    def str(n: String) = (j \ n).asInstanceOf[JString].s
    def strs(n: String) = (j \ n) match {
      case JArray(xs) => xs.collect { case JString(s) => s }
      case _ => Nil
    }
    val eligible = (j \ "rewriteEligible") match {
      case JBool(b) => b; case _ => false
    }
    if (!eligible) return false
    val squares = (j \ "trackSquares") match {
      case JBool(b) => b; case _ => false
    }
    entries.put(norm(str("srcPath")),
      Entry(norm(str("srcPath")), viewPath, strs("groupCols"),
        str("valueCol"), strs("minMaxCols"), squares))
    true
  }
}

/** Optimizer rule (installed by [[graft.functions.GraftExtensions]],
  * running inside the operator-optimization batch, BEFORE
  * V2ScanRelationPushDown turns relations into scans): rewrites
  *
  * {{{ SELECT g..., count(*), sum(v), min(m), max(m) FROM src GROUP BY g }}}
  *
  * over a registered source into a projection of the maintained state
  * table, when — and only when — ALL of:
  *
  *  - the aggregate's child is the BARE graft relation of the source (a
  *    column-pruning Project of plain attributes is seen through; any
  *    Filter, time-travel / range option, or non-COW storage disables
  *    the rewrite);
  *  - the relation reads the source's CURRENT head version with the FULL
  *    file listing (so `versionAsOf` / `rangeColumn` reads keep their
  *    own semantics);
  *  - the view's folded mark equals that head version (freshness);
  *  - grouping is the view's group columns (as attributes) — exactly
  *    (direct state projection) or a SUBSET including the empty global
  *    aggregate (roll-up: the group-cardinality state re-aggregates) —
  *    and every aggregate is `count(literal)`, `sum(valueCol)` or
  *    `min/max(minMaxCol)` — no DISTINCT, no FILTER clause;
  *  - the sum's input type folds EXACTLY through the state's
  *    DECIMAL(28,6) accumulator: integral types, or decimals with scale
  *    ≤ 6 and ≤ 22 integer digits. `sum(double)` is NOT rewritten — the
  *    stored decimal sum is a 6-dp rounding of it, and "close" is not
  *    "equal".
  *
  * The rewritten output carries the ORIGINAL expression ids (aliased
  * one-for-one), so the surrounding plan — joins, sorts, further
  * projections — is untouched. Result types are preserved via exact
  * casts from the stored accumulator types.
  */
class MvRewriteRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (MvRegistry.isEmpty ||
      !session.conf.get("spark.graft.mvRewrite.enabled", "true").toBoolean)
      return plan
    plan.transformUp {
      case agg: Aggregate =>
        try rewrite(agg).getOrElse(agg)
        catch { case scala.util.control.NonFatal(_) => agg }
    }
  }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    val rel = bareGraftRelation(agg.child).filter(r =>
      r.table.isInstanceOf[GraftWritableTable])
    val table = rel.map(_.table.asInstanceOf[GraftWritableTable])
    val entry = table.flatMap(t => MvRegistry.lookup(t.graftBasePath))
    (table, entry) match {
      case (Some(t), Some(e)) if isFreshHeadScan(t, e) =>
        buildRewrite(agg, e)
      case _ => None
    }
  }

  /** The aggregate child stripped to its V2 relation — but ONLY through a
    * pure column-pruning Project; anything else changes semantics.
    */
  private def bareGraftRelation(
      plan: LogicalPlan): Option[DataSourceV2Relation] = plan match {
    case r: DataSourceV2Relation => Some(r)
    case Project(ps, r: DataSourceV2Relation)
        if ps.forall(_.isInstanceOf[AttributeReference]) => Some(r)
    case _ => None
  }

  /** Freshness + scan-shape gate (see class doc). Any manifest-read
    * failure (dropped table, mid-vacuum) simply disables the rewrite.
    */
  private def isFreshHeadScan(
      t: GraftWritableTable, e: MvRegistry.Entry): Boolean = {
    val scanM = t.graftScanManifest.getOrElse(return false)
    if (scanM.storageType != "cow") return false
    // option-pruned listings (rangeColumn etc.) read a SUBSET of the head
    val full = t.graftScanFiles.exists(_.toSet == scanM.baseFiles.toSet)
    if (!full) return false
    val srcHead = CowTable.openManifest(session, e.srcPath).version
    if (scanM.version != srcHead) return false // versionAsOf time travel
    val viewM = CowTable.openManifest(session, e.viewPath)
    viewM.metrics.get(MaintainedAgg.SrcVersionMark).contains(srcHead)
  }

  private def buildRewrite(
      agg: Aggregate, e: MvRegistry.Entry): Option[LogicalPlan] = {
    // grouping must be plain attributes covering the view's group
    // columns EXACTLY (direct projection of the state) or a SUBSET of
    // them (roll-up: the state re-aggregates — count and sum are sums
    // of the per-group state, min/max fold through min/max — the
    // classic cube-materialization rewrite; a global aggregate is the
    // empty subset)
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference => a
      case _ => return None
    }
    val groupNames = groupAttrs.map(_.name.toLowerCase).toSet
    val viewGroups = e.groupCols.map(_.toLowerCase).toSet
    if (groupAttrs.size != groupNames.size ||
      !groupNames.subsetOf(viewGroups)) return None
    if (groupNames == viewGroups) buildDirect(agg, e)
    else buildRollup(agg, e, groupAttrs)
  }

  private def viewPlan(e: MvRegistry.Entry): LogicalPlan =
    session.read.format("graft").load(e.viewPath)
      .queryExecution.analyzed

  private def tz = Some(session.sessionState.conf.sessionLocalTimeZone)
  private def exactCast(from: Expression, to: DataType): Expression =
    if (from.dataType == to) from else Cast(from, to, tz)
  private def shaped(ne: NamedExpression, expr: Expression)
      : NamedExpression = {
    val typed = exactCast(expr, ne.dataType)
    val narrowed =
      if (!ne.nullable && typed.nullable) KnownNotNull(typed) else typed
    Alias(narrowed, ne.name)(exprId = ne.exprId)
  }

  private def buildDirect(
      agg: Aggregate, e: MvRegistry.Entry): Option[LogicalPlan] = {
    val groupNames = agg.groupingExpressions
      .collect { case a: AttributeReference => a.name.toLowerCase }.toSet
    val view = viewPlan(e)
    // a missing state column throws; apply()'s NonFatal catch keeps the
    // original aggregate (can only happen on a view schema mismatch)
    def viewCol(n: String): Attribute =
      view.output.find(_.name.equalsIgnoreCase(n)).get
    val projectList: Seq[NamedExpression] = agg.aggregateExpressions.map {
      ne =>
        val rewritten: Expression = ne match {
          case a: AttributeReference if groupNames(a.name.toLowerCase) =>
            viewCol(a.name)
          case Alias(ae: AggregateExpression, _) =>
            rewriteAgg(ae, e, viewCol).getOrElse(return None)
          case _ => return None
        }
        shaped(ne, rewritten)
    }
    MvRewriteRule.logHit(e.viewPath)
    Some(Project(projectList, view))
  }

  /** Coarser-grain rewrite: GROUP BY a strict subset of the view's group
    * columns re-aggregates the (group-cardinality) state instead of the
    * fact — `count(*)` = Σ cnt, `sum(v)` = Σ total (exact decimals),
    * `min/max(c)` = min/max of the stored extremes. The global-aggregate
    * case (empty subset) coalesces Σ cnt to 0: an aggregate over an
    * EMPTY table still returns one row, and its count is 0, not null.
    */
  private def buildRollup(agg: Aggregate, e: MvRegistry.Entry,
      groupAttrs: Seq[AttributeReference]): Option[LogicalPlan] = {
    val viewDf = session.read.format("graft").load(e.viewPath)
    def stateCol(ae: AggregateExpression)
        : Option[org.apache.spark.sql.Column] = {
      if (ae.isDistinct || ae.filter.nonEmpty || ae.mode != Complete)
        return None
      import org.apache.spark.sql.functions.{
        coalesce, lit, max => fmax, min => fmin, sum => fsum}
      ae.aggregateFunction match {
        case Count(Seq(Literal(_, _))) =>
          Some(coalesce(fsum(viewDf.col("cnt")), lit(0L)))
        case Sum(a: AttributeReference, _)
            if a.name.equalsIgnoreCase(e.valueCol) &&
              sumFoldsExactly(a.dataType) =>
          Some(fsum(viewDf.col("total")))
        case Min(a: AttributeReference)
            if e.minMaxCols.exists(_.equalsIgnoreCase(a.name)) =>
          Some(fmin(viewDf.col(s"min_${a.name}")))
        case Max(a: AttributeReference)
            if e.minMaxCols.exists(_.equalsIgnoreCase(a.name)) =>
          Some(fmax(viewDf.col(s"max_${a.name}")))
        case _ => None
      }
    }
    val groupNames = groupAttrs.map(_.name.toLowerCase).toSet
    // one synthetic output column per original aggregate call, in order
    var i = -1
    val aggCols = agg.aggregateExpressions.collect {
      case Alias(ae: AggregateExpression, _) =>
        i += 1
        stateCol(ae).getOrElse(return None).as(s"_mv_$i")
    }
    val rolled0 = viewDf.groupBy(
      groupAttrs.map(a => viewDf.col(a.name)): _*)
    val rolledDf = aggCols match {
      case head +: tail => rolled0.agg(head, tail: _*)
      case _ => return None // grouping-only aggregate: nothing to fold
    }
    val rolled = rolledDf.queryExecution.analyzed
    def out(n: String): Attribute =
      rolled.output.find(_.name.equalsIgnoreCase(n)).get
    var j = -1
    val projectList: Seq[NamedExpression] = agg.aggregateExpressions.map {
      ne =>
        val rewritten: Expression = ne match {
          case a: AttributeReference if groupNames(a.name.toLowerCase) =>
            out(a.name)
          case Alias(_: AggregateExpression, _) =>
            j += 1
            out(s"_mv_$j")
          case _ => return None
        }
        shaped(ne, rewritten)
    }
    MvRewriteRule.logHit(e.viewPath)
    Some(Project(projectList, rolled))
  }

  /** The state column (exact-cast later) answering one aggregate call —
    * None refuses the whole rewrite.
    */
  private def rewriteAgg(ae: AggregateExpression, e: MvRegistry.Entry,
      viewCol: String => Attribute): Option[Expression] = {
    if (ae.isDistinct || ae.filter.nonEmpty || ae.mode != Complete)
      return None
    ae.aggregateFunction match {
      case Count(Seq(Literal(_, _))) => Some(viewCol("cnt"))
      case Sum(a: AttributeReference, _)
          if a.name.equalsIgnoreCase(e.valueCol) &&
            sumFoldsExactly(a.dataType) => Some(viewCol("total"))
      case Min(a: AttributeReference)
          if e.minMaxCols.exists(_.equalsIgnoreCase(a.name)) =>
        Some(viewCol(s"min_${a.name}"))
      case Max(a: AttributeReference)
          if e.minMaxCols.exists(_.equalsIgnoreCase(a.name)) =>
        Some(viewCol(s"max_${a.name}"))
      case _ => None
    }
  }

  /** Types whose sum is represented EXACTLY by the state's DECIMAL(28,6)
    * accumulator (see class doc — floats/doubles are refused).
    */
  private def sumFoldsExactly(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case d: DecimalType => d.scale <= 6 && d.precision - d.scale <= 22
    case _ => false
  }
}

object MvRewriteRule {
  /** viewPath -> rewrite count; observability for tests and probes. */
  val hitLog = TrieMap.empty[String, Long]
  private[sources] def logHit(viewPath: String): Unit =
    hitLog.updateWith(viewPath) { c => Some(c.getOrElse(0L) + 1L) }
}
