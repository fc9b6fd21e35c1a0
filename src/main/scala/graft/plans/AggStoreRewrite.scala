package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
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
  *   - `spark.graft.aggstore.source`: the fact location (suffix-matched
  *     against the scan's root path). Registering it asserts the store
  *     at `...path` is MAINTAINED against that source (the ingest
  *     pipeline's job — [[graft.streaming.StreamingSync.aggMaintSink]];
  *     a stale store serves stale rows, exactly like any MV with a
  *     freshness SLA).
  *   - `spark.graft.aggstore.path`: the committed store.
  *
  * SOUNDNESS over coverage: the rule fires only on an Aggregate whose
  * child chain down to the registered scan is Project-only (ANY
  * Filter/Join/expansion blocks the rewrite — a filtered rollup is NOT
  * the maintained view; spec-pinned), whose grouping keys are exactly
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

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val store = SQLConf.get.getConfString(PathKey, "")
    val source = SQLConf.get.getConfString(SourceKey, "")
    if (store.isEmpty || source.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate if matches(agg, source) => rewrite(agg, store)
    }
  }

  /** Project-only descent to a single parquet scan of `source`. The
    * suffix match is anchored on a path-separator boundary: a sibling
    * dataset whose path merely ENDS with the registered string (e.g.
    * `/archive-sf/events.parquet` vs registered `sf/events.parquet`)
    * must not be silently rewritten to the wrong store — every guard
    * errs toward not firing. */
  private def scanOf(plan: LogicalPlan, source: String): Boolean =
    plan match {
      case Project(_, child) => scanOf(child, source)
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation =>
          val anchored = "/" + source.stripPrefix("/").stripSuffix("/")
          fs.location.rootPaths.exists { p =>
            val s = p.toUri.getPath.stripSuffix("/")
            s == anchored || s.endsWith(anchored)
          }
        case _ => false
      }
      case _ => false
    }

  /** Resolve `a` through the Project chain's aliases to the
    * expression it names over the scan output. */
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

  private def matches(agg: Aggregate, source: String): Boolean = {
    if (!scanOf(agg.child, source)) return false
    val g = agg.groupingExpressions
      .map(e => resolveThrough(agg.child, stripAlias(e)))
    if (g.length != 2) return false
    val dayFirst = isDayKey(g.head) && (g(1) match {
      case a: AttributeReference => a.name == "event_type"
      case _ => false
    })
    if (!dayFirst) return false
    // output = [day, event_type, count, sum] in exactly this order
    // (df.groupBy(a, b).agg(x, y)'s shape — anything else falls
    // through; order-insensitivity would complicate the re-aliasing
    // for no coverage the suite needs)
    val aggs = agg.aggregateExpressions
      .map(e => resolveThrough(agg.child, stripAlias(e)))
    aggs.length == 4 &&
      aggs(0).semanticEquals(g.head) && aggs(1).semanticEquals(g(1)) &&
      isCountStar(aggs(2)) && isSumValueCents(aggs(3))
  }

  private def rewrite(agg: Aggregate, store: String): LogicalPlan = {
    val spark = SparkSession.active
    val replacement = graft.sources.AggStore.readState(spark, store)
      .groupBy(col("day"), col("event_type"))
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
