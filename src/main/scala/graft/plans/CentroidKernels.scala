package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-row nearest-centroid kernels for the ANN / clustering family.
  *
  * The column-DSL formulation of a centroid argmax is
  * `crossJoin(broadcast(cents))` + `round(cos, 6)` +
  * `groupBy(id).agg(max_by(cent_id, struct(cdot, -cent_id)))`: it
  * materializes n·C candidate rows, pays a broadcast build plus a
  * hash-aggregate exchange per assignment pass, and under AQE adds two
  * stages of scheduling per pass. At 100 TB the n·C row explosion is
  * the scaling wall (guide §2.3: shuffle fewer bytes — here, none);
  * locally the per-pass fixed costs dominate the tiny inputs. These
  * expressions compute the same argmax per ROW against the centroid
  * matrix riding along as ONE reference object (the
  * [[BandKeys]]/[[MatVec]] mechanism): no candidate rows, no broadcast,
  * no aggregate — a scan-shaped projection.
  *
  * Bit-identity contract (each site's spec pins it, the DuckDB oracle
  * re-proves it end-to-end):
  *   - dots are the [[DotProduct]] loop — ascending index, min-length;
  *   - the score is rounded EXACTLY like Spark's `round(x, 6)` codegen
  *     on doubles: NaN/Infinity pass through, else
  *     `java.math.BigDecimal.valueOf(x).setScale(6, HALF_UP)
  *     .doubleValue()`;
  *   - the argmax replays `max_by(cent_id, struct(cdot, -cent_id))`:
  *     scores compare via `java.lang.Double.compare` (Catalyst's
  *     DoubleType total ordering), ties go to the LOWEST centroid id.
  */
object CentroidKernels {
  /** score = dot(v, c) — both sides already unit-normalized. */
  final val NormNone = 0
  /** score = dot(v, c) / |c| — v unit, centroid possibly not
    * (round-6 Lloyd components). */
  final val NormCent = 1
  /** score = dot(v, c) / (|v| · |c|) — full cosine over raw vectors. */
  final val NormFull = 2

  private[plans] def dotLoop(v: ArrayData, p: Array[Double]): Double = {
    val n = math.min(v.numElements(), p.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += v.getDouble(i) * p(i); i += 1 }
    s
  }

  private[plans] def dotSelf(v: ArrayData): Double = {
    val n = v.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = v.getDouble(i); s += x * x; i += 1 }
    s
  }

  private[plans] def dotSelf(a: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * a(i); i += 1 }
    s
  }

  /** EXACTLY Spark's `Round(double, 6)` codegen semantics. */
  private[plans] def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** struct(cent_id, cos) of the argmax centroid — see [[NearestCentroid]]. */
  def nearestCentroid(v: Column, centIds: Array[Long],
      cents: Array[Array[Double]], norm: Int): Column =
    GraftBridge.column(NearestCentroid(GraftBridge.expression(v),
      centIds, cents, norm))

  /** struct(cent_id, residual vector) — see [[NearestResidual]]. */
  def nearestResidual(v: Column, centIds: Array[Long],
      cents: Array[Array[Double]]): Column =
    GraftBridge.column(NearestResidual(GraftBridge.expression(v),
      centIds, cents))

  /** array of per-subspace struct(j, code, cn2) — see [[PqEncodeCodes]]. */
  def pqEncodeCodes(v: Column, codeIds: Array[Long],
      subcs: Array[Array[Array[Double]]], cn2s: Array[Array[Double]],
      sub: Int): Column =
    GraftBridge.column(PqEncodeCodes(GraftBridge.expression(v),
      codeIds, subcs, cn2s, sub))

  private[plans] def deepEq(a: Array[Array[Double]],
      b: Array[Array[Double]]): Boolean =
    java.util.Arrays.deepEquals(a.asInstanceOf[Array[AnyRef]],
      b.asInstanceOf[Array[AnyRef]])

  private[plans] def deepHash(a: Array[Array[Double]]): Int =
    java.util.Arrays.deepHashCode(a.asInstanceOf[Array[AnyRef]])
}

/** Serializable worker shared by eval and codegen (one virtual call per
  * row; the loops inside are compiled Scala over primitive arrays). The
  * per-centroid norms are precomputed ONCE with the same ascending-index
  * loop the crossJoin form ran per candidate row — identical doubles. */
final class NearestCentroidKernel(ids: Array[Long],
    cents: Array[Array[Double]], norm: Int) extends Serializable {
  import CentroidKernels._
  private val nc: Array[Double] =
    if (norm == NormNone) null
    else cents.map(c => math.sqrt(dotSelf(c)))

  /** (winning cent_id, its rounded score). */
  def bestOf(v: ArrayData): (Long, Double) = {
    val nv = if (norm == NormFull) math.sqrt(dotSelf(v)) else 0.0
    var bestId = 0L
    var best = 0.0
    var j = 0
    while (j < cents.length) {
      val d = dotLoop(v, cents(j))
      val s = round6(norm match {
        case NormNone => d
        case NormCent => d / nc(j)
        case _ => d / (nv * nc(j))
      })
      val take =
        if (j == 0) true
        else {
          val c = java.lang.Double.compare(s, best)
          c > 0 || (c == 0 && ids(j) < bestId)
        }
      if (take) { best = s; bestId = ids(j) }
      j += 1
    }
    (bestId, best)
  }

  def compute(v: ArrayData): InternalRow = {
    val (id, s) = bestOf(v)
    new GenericInternalRow(Array[Any](id, s))
  }

  def centById(id: Long): Array[Double] = {
    var j = 0
    while (j < ids.length) { if (ids(j) == id) return cents(j); j += 1 }
    throw new IllegalStateException(s"centroid $id not in kernel")
  }
}

/** `struct(cent_id: long, cos: double)` of the nearest centroid to the
  * input `array<double>` — the compact replacement for the
  * crossJoin+max_by assignment pass (cos is the round-6 winning score,
  * for the sites that project it). */
case class NearestCentroid(child: Expression, centIds: Array[Long],
    cents: Array[Array[Double]], norm: Int) extends UnaryExpression {
  require(cents.nonEmpty && centIds.length == cents.length,
    s"nearest_centroid: ${centIds.length} ids / ${cents.length} vectors")

  override def dataType: DataType = StructType(Seq(
    StructField("cent_id", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"nearest_centroid expects array<double>, " +
            s"got ${other.simpleString}")
    }

  @transient private lazy val kernel =
    new NearestCentroidKernel(centIds, cents, norm)

  override protected def nullSafeEval(a: Any): Any =
    kernel.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val k = ctx.addReferenceObj("nearestCentroidKernel", kernel,
        classOf[NearestCentroidKernel].getName)
      s"${ev.value} = $k.compute($a);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroid = copy(child = newChild)

  // value-based identity + stable rendering — see [[BandKeys]]
  override def equals(other: Any): Boolean = other match {
    case o: NearestCentroid => norm == o.norm && child == o.child &&
      java.util.Arrays.equals(centIds, o.centIds) &&
      CentroidKernels.deepEq(cents, o.cents)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(getClass, child,
    Integer.valueOf(norm),
    Integer.valueOf(java.util.Arrays.hashCode(centIds)),
    Integer.valueOf(CentroidKernels.deepHash(cents)))
  override protected def stringArgs: Iterator[Any] = Iterator(child,
    f"cents[${cents.length}x${cents.head.length}@${CentroidKernels
      .deepHash(cents)}%08x]", norm)
}

/** `struct(cent_id: long, v: array<double>)` — nearest centroid (plain
  * dot scores; both sides unit) plus the residual `v − c_win`, fused:
  * the assignment argmax and the `zip_with` subtraction in one pass. */
case class NearestResidual(child: Expression, centIds: Array[Long],
    cents: Array[Array[Double]]) extends UnaryExpression {
  require(cents.nonEmpty && centIds.length == cents.length,
    s"nearest_residual: ${centIds.length} ids / ${cents.length} vectors")

  override def dataType: DataType = StructType(Seq(
    StructField("cent_id", LongType, nullable = false),
    StructField("v", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"nearest_residual expects array<double>, " +
            s"got ${other.simpleString}")
    }

  @transient private lazy val kernel =
    new NearestCentroidKernel(centIds, cents, CentroidKernels.NormNone)

  def computeRow(a: ArrayData): InternalRow = {
    val (id, _) = kernel.bestOf(a)
    val c = kernel.centById(id)
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = a.getDouble(i) - (if (i < c.length) c(i) else 0.0)
      i += 1
    }
    new GenericInternalRow(Array[Any](id, new GenericArrayData(out)))
  }

  override protected def nullSafeEval(a: Any): Any =
    computeRow(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val k = ctx.addReferenceObj("nearestResidual", this,
        classOf[NearestResidual].getName)
      s"${ev.value} = $k.computeRow($a);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): NearestResidual = copy(child = newChild)

  override def equals(other: Any): Boolean = other match {
    case o: NearestResidual => child == o.child &&
      java.util.Arrays.equals(centIds, o.centIds) &&
      CentroidKernels.deepEq(cents, o.cents)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(getClass, child,
    Integer.valueOf(java.util.Arrays.hashCode(centIds)),
    Integer.valueOf(CentroidKernels.deepHash(cents)))
  override protected def stringArgs: Iterator[Any] = Iterator(child,
    f"cents[${cents.length}x${cents.head.length}@${CentroidKernels
      .deepHash(cents)}%08x]")
}

/** PQ encoding worker: per subspace `j`, the argmin over the codebook of
  * `round6(dot(subv,subv) − 2·dot(subv,subc) + cn2)` (ties → lowest
  * code id), where `subv = v[j·sub .. j·sub+sub)`. `cn2` values are the
  * STORED codebook norms (collected, never recomputed), so the emitted
  * (code, cn2) pairs are exactly the crossJoin form's. */
final class PqCodebookKernel(codeIds: Array[Long],
    subcs: Array[Array[Array[Double]]], cn2s: Array[Array[Double]],
    sub: Int) extends Serializable {
  import CentroidKernels.round6
  val m: Int = subcs.length

  def compute(v: ArrayData): GenericArrayData = {
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val off = j * sub
      val lim = math.min(v.numElements(), off + sub)
      var d1 = 0.0
      var i = off
      while (i < lim) { val x = v.getDouble(i); d1 += x * x; i += 1 }
      val cb = subcs(j)
      val cn2 = cn2s(j)
      var bestCode = 0L
      var bestCn2 = 0.0
      var best = 0.0
      var k = 0
      while (k < cb.length) {
        val c = cb(k)
        var d2 = 0.0
        val n = math.min(lim - off, c.length)
        var t = 0
        while (t < n) { d2 += v.getDouble(off + t) * c(t); t += 1 }
        val s = round6(d1 - 2.0 * d2 + cn2(k))
        val take =
          if (k == 0) true
          else {
            val cmp = java.lang.Double.compare(s, best)
            cmp < 0 || (cmp == 0 && codeIds(k) < bestCode)
          }
        if (take) { best = s; bestCode = codeIds(k); bestCn2 = cn2(k) }
        k += 1
      }
      out(j) = new GenericInternalRow(Array[Any](j, bestCode, bestCn2))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<struct<j: int, code: long, cn2: double>>` — the vector's PQ
  * codes against a frozen codebook, one struct per subspace. Replaces
  * the n·m explode → codebook join → n·m·C argmin aggregate with a
  * scan-shaped projection (downstream just `explode`s m structs). */
case class PqEncodeCodes(child: Expression, codeIds: Array[Long],
    subcs: Array[Array[Array[Double]]], cn2s: Array[Array[Double]],
    sub: Int) extends UnaryExpression {
  require(subcs.nonEmpty && subcs.length == cn2s.length &&
    subcs.forall(_.length == codeIds.length) &&
    cn2s.forall(_.length == codeIds.length),
    "pq_encode: codebook shape mismatch")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("j", IntegerType, nullable = false),
    StructField("code", LongType, nullable = false),
    StructField("cn2", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"pq_encode expects array<double>, " +
            s"got ${other.simpleString}")
    }

  @transient private lazy val kernel =
    new PqCodebookKernel(codeIds, subcs, cn2s, sub)

  override protected def nullSafeEval(a: Any): Any =
    kernel.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val k = ctx.addReferenceObj("pqCodebookKernel", kernel,
        classOf[PqCodebookKernel].getName)
      s"${ev.value} = $k.compute($a);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): PqEncodeCodes = copy(child = newChild)

  override def equals(other: Any): Boolean = other match {
    case o: PqEncodeCodes => sub == o.sub && child == o.child &&
      java.util.Arrays.equals(codeIds, o.codeIds) &&
      subcs.length == o.subcs.length &&
      subcs.indices.forall(j =>
        CentroidKernels.deepEq(subcs(j), o.subcs(j))) &&
      CentroidKernels.deepEq(cn2s, o.cn2s)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(getClass, child,
    Integer.valueOf(sub),
    Integer.valueOf(java.util.Arrays.hashCode(codeIds)),
    Integer.valueOf(subcs.map(CentroidKernels.deepHash).toSeq.hashCode),
    Integer.valueOf(CentroidKernels.deepHash(cn2s)))
  override protected def stringArgs: Iterator[Any] = Iterator(child,
    f"codebook[${subcs.length}x${codeIds.length}x$sub@${subcs
      .map(CentroidKernels.deepHash).toSeq.hashCode}%08x]")
}
