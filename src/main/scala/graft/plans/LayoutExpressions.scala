package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Storage-layout kernels: Morton (Z-order) bit interleaving.
  *
  * Z-ordering is the multi-column clustering answer when ONE sort key
  * can't serve two filter columns: interleaving the bits of both keys
  * makes rows close in (a, b) space land close in the linear file
  * order, so parquet min/max stats on the Z-value prune files for
  * rectangle predicates on EITHER or BOTH columns — the same layout
  * Delta's OPTIMIZE ZORDER and Iceberg's sort-order z-curves produce.
  */
object LayoutKernels {

  /** Morton-interleave the low `bits` bits of `x` (odd positions) and
    * `y` (even positions). Monotone in each coordinate — increasing
    * x or y alone never decreases the result (coordinate bits occupy
    * disjoint positions in significance order), which is what makes
    * `z(lo corner) <= z(p) <= z(hi corner)` hold for every point of a
    * rectangle and the Z-range prefilter a correct superset. */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i + 1)
      z |= ((y >> i) & 1L) << (2 * i)
      i += 1
    }
    z
  }

  /** Hilbert curve index of `(x, y)` on the `2^bits × 2^bits` grid —
    * the classic iterative xy2d (Hilbert 1891; the loop form of
    * Butz's algorithm): per level, the quadrant digit `(3·rx) xor ry`
    * scales into `d` and the coordinate frame reflects/swaps so the
    * sub-square recursion stays in canonical orientation. Unlike the
    * Z-curve, consecutive indices are ALWAYS grid neighbors (unit
    * Manhattan steps, spec-pinned by full-grid inversion), so a file
    * covering a Hilbert interval covers one connected blob of (x, y)
    * space — strictly better clustering for rectangle scans, at the
    * price that d is NOT monotone per coordinate and a rectangle needs
    * a covering-range DECOMPOSITION instead of one corner-to-corner
    * interval ([[graft.sources.HilbertStore.coveringRanges]]). */
  def hilbertD(x0: Long, y0: Long, bits: Int): Long = {
    val n = 1L << bits
    var x = x0
    var y = y0
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Codegen'd Morton Z-value of two bounded non-negative long columns
  * (callers normalize to the `[0, 2^bits)` grid first). */
case class ZValue(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "z_value"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"z_value expects (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(x: Any, y: Any): Any =
    LayoutKernels.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long],
      bits)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.plans.LayoutKernels.interleave($x, $y, $bits);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ZValue =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd Hilbert index of two bounded non-negative long columns
  * (callers normalize to the `[0, 2^bits)` grid first). */
case class HilbertValue(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_value"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_value expects (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(x: Any, y: Any): Any =
    LayoutKernels.hilbertD(x.asInstanceOf[Long], y.asInstanceOf[Long],
      bits)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.plans.LayoutKernels.hilbertD($x, $y, $bits);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HilbertValue =
    copy(left = newLeft, right = newRight)
}

object LayoutExpressions {
  /** Codegen'd Morton Z-value of two bigint columns. */
  def zValue(x: Column, y: Column, bits: Int): Column =
    GraftBridge.column(ZValue(GraftBridge.expression(x),
      GraftBridge.expression(y), bits))

  /** Codegen'd Hilbert index of two bigint columns. */
  def hilbertValue(x: Column, y: Column, bits: Int): Column =
    GraftBridge.column(HilbertValue(GraftBridge.expression(x),
      GraftBridge.expression(y), bits))
}
