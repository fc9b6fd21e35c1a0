package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Custom Catalyst expression for the similarity hot loop.
  *
  * The built-in route (`aggregate(zip_with(a, b, _*_), 0, _+_)`) is a
  * higher-order function: Catalyst evaluates the lambda per element with no
  * whole-stage codegen and allocates an intermediate array per row. On an
  * O(n²) pair stage that interpretation cost dominates everything else.
  * This expression generates a primitive `for` loop over the two
  * `ArrayData`s — no allocation, no virtual calls, fused into the
  * surrounding codegen stage. Same arithmetic order as the naive loop, so
  * results are bit-identical to the DuckDB oracle's implementation.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<double> inputs, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(newLeft, newRight)
}

/** Codegen'd dot product with EXACTLY the semantics of the higher-order
  * pattern `aggregate(zip_with(a, b, _*_), 0.0, _+_)`: `zip_with` pads the
  * shorter array with NULL and a NULL element poisons the sum, so unequal
  * lengths or any NULL element yield NULL. This is the sound rewrite
  * target for [[VectorFusion]] — unlike [[DotProduct]] (min-length,
  * null-oblivious), it can replace user-written HOF code without changing
  * results. Still a primitive loop fused into the surrounding stage; the
  * per-element null check is the only cost over [[DotProduct]]. */
case class ZipDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"zip_dot expects array<double> inputs, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ZipDot = copy(newLeft, newRight)
}

/** Banded sign-LSH keys in ONE compact expression node. The column-DSL
  * formulation (`array(bands × (rowsPerBand × when(dot(v, lit(signs)) >
  * 0, 1L<<r)))`) embeds `bands·rowsPerBand·dim` literal doubles in the
  * expression tree — ~12k nodes at the default (32, 6, 64) geometry —
  * and every analyzer/optimizer pass walks all of them: r14 profiling
  * measured ≥ 1.2 s of pure driver planning per admission from these
  * trees. Here the plane matrix rides along as ONE reference object
  * (same codegen mechanism Spark uses for every non-primitive literal)
  * and the tree is a single node; generated code is the same fused
  * primitive loop, same arithmetic order (sequential ascending i, the
  * [[DotProduct]] order), same strict `> 0` sign test and `1L << r`
  * packing — bit-identical keys to the literal form. */
case class BandKeys(child: Expression, planes: Array[Array[Double]],
    rowsPerBand: Int) extends UnaryExpression {
  require(rowsPerBand >= 1 && planes.nonEmpty &&
    planes.length % rowsPerBand == 0,
    s"planes=${planes.length} not a multiple of rowsPerBand=$rowsPerBand")
  private def bands: Int = planes.length / rowsPerBand

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"band_keys expects array<double>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var r = 0
      while (r < rowsPerBand) {
        val p = planes(b * rowsPerBand + r)
        val n = math.min(v.numElements(), p.length)
        var s = 0.0
        var i = 0
        while (i < n) { s += v.getDouble(i) * p(i); i += 1 }
        if (s > 0) key |= 1L << r
        r += 1
      }
      out(b) = key
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pl = ctx.addReferenceObj("planes", planes, "double[][]")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val key = ctx.freshName("key")
      val p = ctx.freshName("p")
      s"""
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $key = 0L;
         |  for (int $r = 0; $r < $rowsPerBand; $r++) {
         |    double[] $p = $pl[$b * $rowsPerBand + $r];
         |    int $n = java.lang.Math.min($a.numElements(), $p.length);
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += $a.getDouble($i) * $p[$i];
         |    }
         |    if ($s > 0) $key |= 1L << $r;
         |  }
         |  $out[$b] = $key;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): BandKeys = copy(child = newChild)

  // Value-based identity + stable rendering (r14 ADVICE): an Array
  // field gives a case class IDENTITY equals/hashCode, so two
  // separately constructed but identical expressions never
  // canonicalize equal — CacheManager sameResult lookups, exchange
  // reuse and CSE all miss, and equivalent cache registrations
  // duplicate entries. Plan text also rendered the matrix as
  // '[[D@3e...' — nondeterministic per JVM run, corrupting committed
  // plan-dump artifacts. Compare, hash, and print the CONTENT.
  override def equals(other: Any): Boolean = other match {
    case o: BandKeys => rowsPerBand == o.rowsPerBand &&
      child == o.child && java.util.Arrays.deepEquals(
        planes.asInstanceOf[Array[AnyRef]],
        o.planes.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(getClass, child,
    Integer.valueOf(rowsPerBand), Integer.valueOf(
      java.util.Arrays.deepHashCode(planes.asInstanceOf[Array[AnyRef]])))
  override protected def stringArgs: Iterator[Any] = Iterator(child,
    f"planes[${planes.length}x${planes.head.length}@${java.util.Arrays
      .deepHashCode(planes.asInstanceOf[Array[AnyRef]])}%08x]",
    rowsPerBand)
}

/** Signed-matrix projection `array<double>` of `rows` components —
  * component j = dot(v, planes(j)), sequential ascending i (the
  * [[DotProduct]] order, bit-identical to the literal-array form). One
  * reference object instead of `rows·dim` literal nodes — the same
  * planning-cost fix as [[BandKeys]], for the JL reduction family. */
case class MatVec(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  require(planes.nonEmpty, "empty projection matrix")

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"mat_vec expects array<double>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val out = new Array[Double](planes.length)
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      val n = math.min(v.numElements(), p.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getDouble(i) * p(i); i += 1 }
      out(j) = s
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pl = ctx.addReferenceObj("planes", planes, "double[][]")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val p = ctx.freshName("p")
      s"""
         |double[] $out = new double[${planes.length}];
         |for (int $j = 0; $j < ${planes.length}; $j++) {
         |  double[] $p = $pl[$j];
         |  int $n = java.lang.Math.min($a.numElements(), $p.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $p[$i];
         |  }
         |  $out[$j] = $s;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): MatVec = copy(child = newChild)

  // value-based identity + stable rendering — see [[BandKeys]]
  override def equals(other: Any): Boolean = other match {
    case o: MatVec => child == o.child && java.util.Arrays.deepEquals(
      planes.asInstanceOf[Array[AnyRef]],
      o.planes.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(getClass, child,
    Integer.valueOf(
      java.util.Arrays.deepHashCode(planes.asInstanceOf[Array[AnyRef]])))
  override protected def stringArgs: Iterator[Any] = Iterator(child,
    f"planes[${planes.length}x${planes.head.length}@${java.util.Arrays
      .deepHashCode(planes.asInstanceOf[Array[AnyRef]])}%08x]")
}

object VectorExpressions {
  /** Codegen'd dot product of two `array<double>` columns. */
  def dotProduct(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Banded sign-LSH keys — see [[BandKeys]]. */
  def bandKeys(v: Column, planes: Array[Array[Double]],
      rowsPerBand: Int): Column =
    GraftBridge.column(BandKeys(GraftBridge.expression(v), planes,
      rowsPerBand))

  /** Signed-matrix projection — see [[MatVec]]. */
  def matVec(v: Column, planes: Array[Array[Double]]): Column =
    GraftBridge.column(MatVec(GraftBridge.expression(v), planes))
}
