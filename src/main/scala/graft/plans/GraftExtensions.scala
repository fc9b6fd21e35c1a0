package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Catalyst optimizer rule: fuse the higher-order dot-product pattern
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)`
  * into the codegen'd [[ZipDot]] expression.
  *
  * Spark evaluates higher-order lambdas interpreted, one virtual call per
  * element with an intermediate array per row — ~30× slower than a fused
  * primitive loop in a pair-join hot path. The rewrite is
  * semantics-preserving ([[ZipDot]] reproduces the pattern's NULL padding
  * and poisoning exactly), so it is safe to leave always-on: user code
  * written the natural declarative way silently gets the custom-expression
  * plan the library uses internally. */
object VectorFusion extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(
                Multiply(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(zero, DoubleType),
            LambdaFunction(
              Add(m: NamedLambdaVariable, n: NamedLambdaVariable, _),
              Seq(p: NamedLambdaVariable, q: NamedLambdaVariable), _),
            LambdaFunction(f: NamedLambdaVariable,
              Seq(g: NamedLambdaVariable), _))
          if zero == 0.0 &&
            Set(l.exprId, r.exprId) == Set(x.exprId, y.exprId) &&
            Set(m.exprId, n.exprId) == Set(p.exprId, q.exprId) &&
            f.exprId == g.exprId && isDoubleArray(a) && isDoubleArray(b) =>
        ZipDot(a, b)
    }
}

/** Session extensions (`spark.sql.extensions=graft.plans.GraftExtensions`):
  * the [[VectorFusion]] optimizer rule plus SQL-callable functions —
  * `graft_dot(a, b)` (min-length raw dot, [[DotProduct]]),
  * `graft_zip_dot(a, b)` (HOF-equivalent NULL semantics, [[ZipDot]]),
  * `graft_shingles(text, n)` ([[WordShingles]]),
  * `graft_bpe_merge(syms, l, r)` ([[BpeMergePair]]) and
  * `graft_deflate_ratio(text)` ([[DeflateRatio]]) — the text kernels a
  * SQL-only user needs for dedup candidate work and repetition
  * filtering without touching the Scala API.
  *
  * Plus the SQL FRONT DOOR: whole operators as TABLE functions, usable
  * from a bare `spark.sql(...)` with no Scala —
  * {{{
  *   SELECT * FROM graft_funnel('/data/sf', '7 days', 'view', 'click')
  *   SELECT * FROM graft_retention('/data/sf')
  *   SELECT * FROM graft_dedup_apply('/data/sf')
  *   SELECT * FROM graft_neardup_pairs('/data/sf', 0.935, 8, 2, 64)
  *   SELECT * FROM graft_profile('/data/sf', 'orders', 'o_orderkey')
  *   SELECT * FROM graft_hard_negatives('/data/sf', 10, 50, 0.935)
  *   SELECT * FROM graft_stores('edges', '/stores/pairs', ...)
  * }}}
  * Each builder loads its table through [[graft.Tables]] (the same
  * loader the Scala API uses — event-time normalization included) and
  * returns the OPERATOR'S OWN logical plan, so the SQL path and the
  * Scala path are one plan, one optimizer run, bit-identical results
  * (driver-checked: the `x_sql_*` queries share the original queries'
  * oracles verbatim). Arguments must be literals — the plan is built
  * at resolution time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  // wrong arity must raise the same readable IllegalArgumentException the
  // non-literal-n path does, not an IndexOutOfBounds from children(1)
  private def arity(sig: String, n: Int)(
      children: Seq[Expression]): Seq[Expression] = {
    if (children.length != n) throw new IllegalArgumentException(
      s"$sig takes $n argument(s), got ${children.length}")
    children
  }

  private def strLit(sig: String)(e: Expression): String = e match {
    case Literal(v, org.apache.spark.sql.types.StringType) if v != null =>
      v.toString
    case other => throw new IllegalArgumentException(
      s"$sig: expected a string literal, got $other")
  }

  private def numLit(sig: String)(e: Expression): Double = e match {
    case Literal(v: Number, _) => v.doubleValue()
    case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
    case Literal(v: org.apache.spark.sql.types.Decimal, _) =>
      v.toDouble
    case other => throw new IllegalArgumentException(
      s"$sig: expected a numeric literal, got $other")
  }

  /** Register `name` as a SQL table function whose builder returns a
    * DataFrame — the operator's logical plan becomes the FROM clause. */
  private def tableFn(ext: SparkSessionExtensions, name: String)(
      build: (org.apache.spark.sql.SparkSession, Seq[Expression]) =>
        org.apache.spark.sql.DataFrame): Unit =
    ext.injectTableFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      (children: Seq[Expression]) =>
        build(org.apache.spark.sql.SparkSession.active, children)
          .queryExecution.logical))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => VectorFusion)
    ext.injectOptimizerRule(_ => AggStoreRewrite)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        val c = arity("graft_dot(a, b)", 2)(children)
        DotProduct(c.head, c(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_zip_dot"),
      new ExpressionInfo(classOf[ZipDot].getName, "graft_zip_dot"),
      (children: Seq[Expression]) => {
        val c = arity("graft_zip_dot(a, b)", 2)(children)
        ZipDot(c.head, c(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (children: Seq[Expression]) =>
        arity("graft_shingles(text, n)", 2)(children)(1) match {
        case Literal(n: Int, org.apache.spark.sql.types.IntegerType) =>
          WordShingles(children.head, n)
        case other => throw new IllegalArgumentException(
          s"graft_shingles(text, n): n must be an integer literal, got $other")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bpe_merge"),
      new ExpressionInfo(classOf[BpeMergePair].getName, "graft_bpe_merge"),
      (children: Seq[Expression]) => {
        val c = arity("graft_bpe_merge(syms, l, r)", 3)(children)
        BpeMergePair(c.head, c(1), c(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_deflate_ratio"),
      new ExpressionInfo(classOf[DeflateRatio].getName,
        "graft_deflate_ratio"),
      (children: Seq[Expression]) =>
        DeflateRatio(arity("graft_deflate_ratio(text)", 1)(children).head)))

    // ---- table functions: whole operators behind a FROM clause ----
    tableFn(ext, "graft_funnel") { (s, children) =>
      val sig = "graft_funnel(dir, window, step1, step2, ...)"
      if (children.length < 4) throw new IllegalArgumentException(
        s"$sig needs a dir, a window, and >= 2 steps")
      val args = children.map(strLit(sig))
      graft.operators.Temporal.funnel(
        graft.Tables.events(s, args.head), args.drop(2), args(1))
    }
    tableFn(ext, "graft_retention") { (s, children) =>
      val c = arity("graft_retention(dir)", 1)(children)
      graft.operators.Temporal.retentionCohorts(
        graft.Tables.events(s, strLit("graft_retention(dir)")(c.head)))
    }
    tableFn(ext, "graft_dedup_apply") { (s, children) =>
      val c = arity("graft_dedup_apply(dir)", 1)(children)
      graft.operators.Dedup.dedupedCorpus(
          graft.Tables.documents(s,
            strLit("graft_dedup_apply(dir)")(c.head)))
        .select(org.apache.spark.sql.functions.col("doc_id"))
    }
    tableFn(ext, "graft_neardup_pairs") { (s, children) =>
      val sig = "graft_neardup_pairs(dir, threshold, bands, rows, dim)"
      val c = arity(sig, 5)(children)
      graft.operators.Similarity.nearDupPairsLsh(
        graft.Tables.embeddings(s, strLit(sig)(c.head)),
        numLit(sig)(c(1)), bands = numLit(sig)(c(2)).toInt,
        rowsPerBand = numLit(sig)(c(3)).toInt,
        dim = numLit(sig)(c(4)).toInt)
    }
    tableFn(ext, "graft_hard_negatives") { (s, children) =>
      val sig = "graft_hard_negatives(dir, k, queryMod, threshold)"
      val c = arity(sig, 4)(children)
      graft.operators.Similarity.hardNegatives(
        graft.Tables.embeddings(s, strLit(sig)(c.head)),
        numLit(sig)(c(1)).toInt, numLit(sig)(c(2)).toInt,
        numLit(sig)(c(3)))
    }
    tableFn(ext, "graft_profile") { (s, children) =>
      val sig = "graft_profile(dir, table, col1, ...)"
      if (children.length < 3) throw new IllegalArgumentException(
        s"$sig needs a dir, a table name, and >= 1 column")
      val args = children.map(strLit(sig))
      graft.operators.Olap.profile(
        graft.Tables(s, args.head, args(1)), args.drop(2))
    }
    tableFn(ext, "graft_stores") { (s, children) =>
      val sig = "graft_stores(family1, path1, family2, path2, ...)"
      if (children.isEmpty || children.length % 2 != 0)
        throw new IllegalArgumentException(
          s"$sig takes (family, path) pairs, got ${children.length} " +
            "argument(s)")
      val args = children.map(strLit(sig))
      graft.sources.StoreCatalog.describe(s,
        args.grouped(2).map(g => (g.head, g(1))).toSeq)
    }
  }
}
