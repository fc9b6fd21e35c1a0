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
  * filtering without touching the Scala API. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  // wrong arity must raise the same readable IllegalArgumentException the
  // non-literal-n path does, not an IndexOutOfBounds from children(1)
  private def arity(sig: String, n: Int)(
      children: Seq[Expression]): Seq[Expression] = {
    if (children.length != n) throw new IllegalArgumentException(
      s"$sig takes $n argument(s), got ${children.length}")
    children
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => VectorFusion)
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
  }
}
