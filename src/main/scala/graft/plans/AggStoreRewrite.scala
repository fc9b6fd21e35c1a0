package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, sum}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DateType, DecimalType, LongType}

/** Transparent MATERIALIZED-VIEW routing: an optimizer rule that
  * rewrites the canonical daily rollup over a registered fact source —
  *
  * {{{ facts.groupBy(to_date($"ts"), $"event_type")
  *        .agg(count(lit(1)), sum($"value".cast("decimal(18,2)"))) }}}
  *
  * — to a keys-sized merge over the committed
  * [[graft.sources.AggStore]] partials, so the declarative query a
  * user writes (DataFrame or SQL; the rule sees one logical plan)
  * silently stops scanning the fact history. At 100 TB this is the
  * difference between a full fact scan and reading days×types rows:
  * the IVM store pays O(|batch|) at ingest ONCE, and every dashboard
  * query of the view rides it for free.
  *
  * Registration is two session confs — the MV contract every engine
  * with materialized views has:
  *
  *   - `spark.graft.aggstore.source`: the fact location (matched
  *     against the scan's root path, anchored on a path-separator
  *     boundary). Registering it asserts the store at `...path` is
  *     MAINTAINED against that source (the ingest pipeline's job —
  *     [[graft.streaming.StreamingSync.aggMaintSink]]; a stale store
  *     serves stale rows, exactly like any MV with a freshness SLA).
  *   - `spark.graft.aggstore.path`: the committed store.
  *
  * FILTER COMPENSATION: a filter between the aggregate and the scan is
  * routable iff every conjunct, resolved through the projection chain,
  * reduces to an expression over the VIEW KEYS alone — the day key
  * (`to_date(ts)` in either loader form) and the `event_type`
  * attribute. Group-key predicates are constant within each group, so
  * filtering the store's partials is exactly filtering the facts —
  * the compensated plan pushes the translated predicate onto the
  * partials (where it prunes the store's day-partitioned files) and
  * merges what remains. This is what makes the COMMON dashboard query
  * ("this week's rollup", "clicks and views only") ride the MV
  * instead of silently paying the full fact scan the view exists to
  * avoid. Any conjunct touching a non-key column (a `value` bound, a
  * `user_id` probe — not derivable from partials), any
  * non-deterministic or subquery-bearing predicate, blocks the
  * rewrite.
  *
  * SOUNDNESS over coverage: the rule fires only on an Aggregate whose
  * child chain down to the registered scan is Project/Filter-only
  * (joins and expansions block), whose grouping keys are exactly
  * `to_date(ts)` (the ts attribute, or the loader's documented
  * nanos normalization `timestamp_micros(ts div 1000)`) and the
  * `event_type` attribute, and whose aggregates are exactly
  * `count(1)` and `sum(cast(value as decimal(18,2)))` in some order.
  * Anything else falls through untouched — a missed rewrite is just
  * the direct plan; a wrong rewrite would be a wrong answer, so every
  * guard errs toward not firing. Output attributes are re-aliased to
  * the ORIGINAL exprIds/types, so downstream operators keep resolving.
  *
  * The replacement subtree aggregates the store's partials (counts
  * add; decimal totals add exactly — the store's merge algebra), cast
  * back to the original aggregate's result types bit-for-bit. */
object AggStoreRewrite extends Rule[LogicalPlan] {

  val PathKey = "spark.graft.aggstore.path"
  val SourceKey = "spark.graft.aggstore.source"

  /** Multi-view registry: `source1=store1;source2=store2`. The
    * single-pair confs above remain the simple front door; entries
    * from both compose (single pair first). Sources should be
    * distinct — when several registered sources match one scan (e.g.
    * overlapping suffixes), the fewest-partial-rows view wins
    * deterministically. NOTE: multiple registrations matching one
    * source MUST be semantically equivalent views of it (the
    * registration asserts maintenance, and the tie-break only picks
    * the cheapest-serving among equals — a misregistered store that
    * is NOT the same view would silently win and serve wrong rows,
    * exactly like registering a stale MV in any engine). */
  val ViewsKey = "spark.graft.aggstore.views"

  private def registered(): Seq[(String, String)] = {
    val store = SQLConf.get.getConfString(PathKey, "")
    val source = SQLConf.get.getConfString(SourceKey, "")
    val single =
      if (store.nonEmpty && source.nonEmpty) Seq(source -> store)
      else Nil
    val multi = SQLConf.get.getConfString(ViewsKey, "")
      .split(";").toSeq.map(_.trim).filter(_.nonEmpty)
      .flatMap { entry =>
        entry.split("=", 2) match {
          case Array(s, st) if s.trim.nonEmpty && st.trim.nonEmpty =>
            Some(s.trim -> st.trim)
          case _ => throw new IllegalArgumentException(
            s"$ViewsKey entry '$entry' is not source=store")
        }
      }
    (single ++ multi).distinct
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val views = registered()
    if (views.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate =>
        views.flatMap { case (source, store) =>
          matchView(agg, source).map { case (key, conds) =>
            (store, key, conds) } } match {
          case Seq() => agg
          case Seq((store, key, conds)) => rewrite(agg, store, key,
            conds)
          case several =>
            // ambiguous registration (overlapping source suffixes both
            // matching this scan): pick the view with the FEWEST
            // partial rows — bounded store metadata, a deterministic
            // and cheapest-serving choice where first-registered was
            // an accident of conf ordering
            val (store, key, conds) = several.minBy(m =>
              partialRows(m._1))
            rewrite(agg, store, key, conds)
        }
    }
  }

  /** Committed partial-row count of `store`, memoized per immutable
    * version directory (a version never changes once committed, so
    * the count can never go stale under its key; a new commit is a
    * new key). The cache is BOUNDED: keyed by store path, holding
    * only the LATEST version's count — a long-lived session with
    * frequent store commits evicts superseded entries instead of
    * growing without bound. Only consulted when SEVERAL registered
    * views match one scan. Missing/uncommitted stores sort last. */
  private val rowCountCache = new java.util.concurrent
    .ConcurrentHashMap[String, (String, Long)]()

  private def partialRows(store: String): Long = {
    val spark = SparkSession.active
    graft.sources.AggStore.currentVersionDir(spark, store) match {
      case None => Long.MaxValue
      case Some(vd) =>
        rowCountCache.compute(store, (_, prev) =>
          if (prev != null && prev._1 == vd) prev
          else (vd,
            graft.sources.AggStore.readState(spark, store).count()))._2
    }
  }

  /** Project/Filter-only descent to a single parquet scan of
    * `source`: Some(filter conjuncts met on the way, outermost first)
    * when the chain bottoms out at the registered scan, None
    * otherwise. The suffix match is anchored on a path-separator
    * boundary: a sibling dataset whose path merely ENDS with the
    * registered string (e.g. `/archive-sf/events.parquet` vs
    * registered `sf/events.parquet`) must not be silently rewritten
    * to the wrong store — every guard errs toward not firing. */
  private def chainTo(plan: LogicalPlan, source: String)
      : Option[Seq[Expression]] = plan match {
    case Project(_, child) => chainTo(child, source)
    case Filter(cond, child) =>
      chainTo(child, source).map(splitAnd(cond) ++ _)
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation =>
        val anchored = "/" + source.stripPrefix("/").stripSuffix("/")
        val hit = fs.location.rootPaths.exists { p =>
          val s = p.toUri.getPath.stripSuffix("/")
          s == anchored || s.endsWith(anchored)
        }
        if (hit) Some(Nil) else None
      case _ => None
    }
    case _ => None
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  /** Resolve `e` through the Project chain's aliases (Filters pass
    * through — they rename nothing) to the expression it names over
    * the scan output. */
  private def resolveThrough(plan: LogicalPlan, e: Expression)
      : Expression = plan match {
    case Project(projList, child) =>
      val byId = projList.collect {
        case al: Alias => al.exprId -> al.child
      }.toMap
      resolveThrough(child, e.transformUp {
        case a: AttributeReference if byId.contains(a.exprId) =>
          byId(a.exprId)
      })
    case f: Filter => resolveThrough(f.child, e)
    case _ => e
  }

  private def isTsAttr(e: Expression): Boolean = e match {
    case a: AttributeReference => a.name == "ts"
    case _ => false
  }

  /** `ts` as the loader yields it: the raw timestamp attribute, or the
    * documented nanos normalization `timestamp_micros(ts div 1000)`. */
  private def isLoadedTs(e: Expression): Boolean = e match {
    case a if isTsAttr(a) => true
    case MicrosToTimestamp(IntegralDivide(t, Literal(1000L, LongType), _))
        if isTsAttr(t) => true
    case _ => false
  }

  private def isDayKey(e: Expression): Boolean = e match {
    case Cast(inner, DateType, _, _) => isLoadedTs(inner)
    case _ => false
  }

  private def isCountStar(e: Expression): Boolean = e match {
    case AggregateExpression(Count(Seq(Literal(1, _))), _, false, None, _)
      => true
    case _ => false
  }

  private def isSumValueCents(e: Expression): Boolean = e match {
    case AggregateExpression(Sum(Cast(v: AttributeReference, dt, _, _),
        _), _, false, None, _) =>
      v.name == "value" && dt == DecimalType(18, 2)
    case _ => false
  }

  private def stripAlias(e: Expression): Expression = e match {
    case Alias(c, _) => c
    case other => other
  }

  /** The session-zone DATE of a midnight-aligned timestamp literal
    * (micros), or None when the literal has a time-of-day component.
    * Needed because by the time this rule runs (post-hoc batch),
    * Catalyst's cast unwrapping has already rewritten
    * `to_date(ts) >= DATE d` into `ts >= TIMESTAMP 'd 00:00:00'` —
    * the day-key filter reaches us as raw midnight-anchored
    * timestamp bounds. */
  private def midnightDay(micros: Long): Option[Int] = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    val zone = DateTimeUtils.getZoneId(SQLConf.get.sessionLocalTimeZone)
    val days = DateTimeUtils.microsToDays(micros, zone)
    if (DateTimeUtils.daysToMicros(days, zone) == micros) Some(days)
    else None
  }

  /** Translate one scan-level filter conjunct into the store's
    * column space: every day-key occurrence becomes `day`, every
    * `event_type` attribute becomes `event_type`, midnight-aligned
    * `ts` bounds become the equivalent `day` bounds
    * (`ts >= midnight(D)` ⟺ `day >= D`; `ts < midnight(D)` ⟺
    * `day < D` — the two forms cast unwrapping emits; a non-aligned
    * or `>`/`<=` timestamp bound is NOT constant within a day group
    * and must block), and `isnotnull(ts)` becomes `isnotnull(day)`
    * (`to_date` is null-preserving both ways). If ANY scan attribute
    * survives the substitution the predicate depends on a non-key
    * column and the rewrite must not fire. Non-deterministic or
    * subquery-bearing predicates also block (a rand() filter is not
    * constant per group; a subquery's semantics don't transfer onto
    * partials). */
  private def translateCond(agg: Aggregate, c: Expression)
      : Option[Expression] = {
    if (!c.deterministic) return None
    if (c.exists(_.isInstanceOf[PlanExpression[_]])) return None
    val day = UnresolvedAttribute("day")
    def dayLit(days: Int) = Literal(days, DateType)
    val resolved = resolveThrough(agg.child, c)
    val translated = resolved.transformUp {
      case e if isDayKey(e) => day
      case GreaterThanOrEqual(t, Literal(m: Long,
          org.apache.spark.sql.types.TimestampType))
          if isLoadedTs(t) && midnightDay(m).isDefined =>
        GreaterThanOrEqual(day, dayLit(midnightDay(m).get))
      case LessThanOrEqual(Literal(m: Long,
          org.apache.spark.sql.types.TimestampType), t)
          if isLoadedTs(t) && midnightDay(m).isDefined =>
        GreaterThanOrEqual(day, dayLit(midnightDay(m).get))
      case LessThan(t, Literal(m: Long,
          org.apache.spark.sql.types.TimestampType))
          if isLoadedTs(t) && midnightDay(m).isDefined =>
        LessThan(day, dayLit(midnightDay(m).get))
      case GreaterThan(Literal(m: Long,
          org.apache.spark.sql.types.TimestampType), t)
          if isLoadedTs(t) && midnightDay(m).isDefined =>
        LessThan(day, dayLit(midnightDay(m).get))
      case IsNotNull(t) if isLoadedTs(t) => IsNotNull(day)
      case a: AttributeReference if a.name == "event_type" =>
        UnresolvedAttribute("event_type")
    }
    if (translated.exists(_.isInstanceOf[AttributeReference])) None
    else Some(translated)
  }

  /** Translate a GROUPING key into the store's column space: every
    * day-key occurrence becomes the partials' `day` attribute. Sound
    * for ANY deterministic function of the day key — `F(day)` is
    * constant within each day group, so grouping the day-keyed
    * partials by `F(day)` and re-summing the algebraic COUNT/SUM
    * states is exactly the fact-level aggregate (the classic
    * aggregate-on-aggregate MV rollup: weekly/monthly views of the
    * daily store never touch the facts). A surviving scan attribute
    * means the key depends on a non-key column → no rewrite. */
  private def translateKey(e: Expression): Option[Expression] = {
    if (!e.deterministic) return None
    if (e.exists(_.isInstanceOf[PlanExpression[_]])) return None
    val t = e.transformUp {
      case d if isDayKey(d) => UnresolvedAttribute("day")
    }
    if (t.exists(_.isInstanceOf[AttributeReference])) None
    else Some(t)
  }

  /** Some((translated day-derived key, translated filter conjuncts))
    * when `agg` is the registered view — or a coarser day-rollup of
    * it — possibly filtered on its keys, over the registered scan;
    * None otherwise. */
  private def matchView(agg: Aggregate, source: String)
      : Option[(Expression, Seq[Expression])] = {
    val conds = chainTo(agg.child, source) match {
      case Some(cs) => cs
      case None => return None
    }
    val g = agg.groupingExpressions
      .map(e => resolveThrough(agg.child, stripAlias(e)))
    if (g.length != 2) return None
    val typeOk = g(1) match {
      case a: AttributeReference => a.name == "event_type"
      case _ => false
    }
    if (!typeOk) return None
    val key = translateKey(g.head) match {
      case Some(k) => k
      case None => return None
    }
    // output = [day, event_type, count, sum] in exactly this order
    // (df.groupBy(a, b).agg(x, y)'s shape — anything else falls
    // through; order-insensitivity would complicate the re-aliasing
    // for no coverage the suite needs)
    val aggs = agg.aggregateExpressions
      .map(e => resolveThrough(agg.child, stripAlias(e)))
    val shapeOk = aggs.length == 4 &&
      aggs(0).semanticEquals(g.head) && aggs(1).semanticEquals(g(1)) &&
      isCountStar(aggs(2)) && isSumValueCents(aggs(3))
    if (!shapeOk) return None
    val translated = conds.map(translateCond(agg, _))
    if (translated.exists(_.isEmpty)) None
    else Some((key, translated.flatten))
  }

  private def rewrite(agg: Aggregate, store: String, key: Expression,
      conds: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    // the compensated predicate lands on the PARTIALS, before the
    // merge: group-key filters commute with the keyed aggregation,
    // and on the store they prune day-keyed files at the scan
    val partials = conds.foldLeft(
        graft.sources.AggStore.readState(spark, store))(
      (df, c) => df.filter(org.apache.spark.sql.GraftBridge.column(c)))
    // the (possibly coarsened) day key groups the partials; COUNT/SUM
    // states are algebraic, so the re-aggregation is exact
    val replacement = partials
      .groupBy(org.apache.spark.sql.GraftBridge.column(key).as("gday"),
        col("event_type"))
      .agg(sum(col("cnt")).cast("bigint").as("cnt"),
        sum(col("total")).cast("decimal(28,2)").as("total"))
      .queryExecution.analyzed
    // downstream operators reference the ORIGINAL output ids/types —
    // re-alias positionally (types align by construction: date,
    // string, bigint, decimal(28,2))
    val aliased = agg.output.zip(replacement.output).map {
      case (orig, fresh) =>
        Alias(Cast(fresh, orig.dataType), orig.name)(exprId = orig.exprId)
    }
    Project(aliased, replacement)
  }
}
