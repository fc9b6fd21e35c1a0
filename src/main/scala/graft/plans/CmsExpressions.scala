package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}

/** Count-Min sketch — the POINT-FREQUENCY sketch family beside the
  * suite's HLL (cardinality), GK (quantiles), Misra-Gries (top-k) and
  * Theta (set algebra): a depth×width counter matrix answering "how
  * often did THIS item occur" for EVERY item, not just the heavy ones,
  * plus the classic self-join/join SIZE estimate (the F2 moment) via
  * the row-wise inner product — the quantity a cost-based optimizer
  * wants before picking a join strategy (Cormode & Muthukrishnan, "An
  * improved data stream summary: the count-min sketch and its
  * applications", J. Algorithms 2005).
  *
  * Two properties drive the implementation:
  *
  *  - MERGE IS LOSSLESS. Counters add element-wise, so a tree-merge of
  *    per-partition (or per-stored-batch) sketches equals the
  *    single-pass sketch EXACTLY — unlike Misra-Gries, whose merge
  *    only preserves the error contract. The aggregate plans as one
  *    ObjectHashAggregate whose exchange carries depth·width longs per
  *    partition (24 KB at the suite's 3×1024), never a token-level row.
  *  - THE HASH IS ENGINE-REPRODUCIBLE. Buckets come from the suite's
  *    seeded-md5 construction ([[graft.operators.Dedup.seededHash]]):
  *    15 hex chars of `md5(item + "#" + seed)` per half, two rows per
  *    digest. Any engine with md5 replays the full counter matrix with
  *    a GROUP BY, so — uniquely among the suite's sketches — the
  *    ESTIMATES themselves hash against the DuckDB oracle, not just
  *    bound booleans. The deterministic guarantee est ≥ true count
  *    (counters only ever add) is hashed as a boolean too.
  *
  * Layout (binary buffer): Int depth, Int width, Long n, then
  * depth·width Long counters, big-endian. */
object CmsSketch {

  private val threadMd5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private val HexChars = "0123456789abcdef".toCharArray

  private def md5Hex(s: String): String = {
    val d = threadMd5.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Row-`r` bucket of `item`: 15 hex chars (60 bits, always positive)
    * of `md5(item + "#" + r/2)` at half `r%2`, mod width — the DuckDB
    * replay is `('0x' || substr(md5(item || '#' || r/2), 1 + (r%2)*16,
    * 15))::bigint % width`. */
  def bucket(item: String, r: Int, width: Int): Int = {
    val hex = md5Hex(item + "#" + (r / 2))
    val off = (r % 2) * 16
    val h = java.lang.Long.parseLong(hex.substring(off, off + 15), 16)
    (h % width).toInt
  }
}

/** The mutable sketch state: a depth×width counter matrix plus the
  * ingested-item count. Serializable — rides both the aggregation
  * exchange and (as a reference object) a shipped [[CmsEstimate]]. */
final class CmsBuffer(val depth: Int, val width: Int)
  extends Serializable {

  require(depth > 0 && width > 0, s"bad CMS shape: $depth x $width")

  val counters = new Array[Long](depth * width)
  var n: Long = 0L

  def add(item: String): Unit = {
    var r = 0
    while (r < depth) {
      counters(r * width + CmsSketch.bucket(item, r, width)) += 1L
      r += 1
    }
    n += 1L
  }

  def merge(other: CmsBuffer): CmsBuffer = {
    require(other.depth == depth && other.width == width,
      s"CMS shape mismatch: $depth x $width vs " +
        s"${other.depth} x ${other.width}")
    var i = 0
    while (i < counters.length) {
      counters(i) += other.counters(i)
      i += 1
    }
    n += other.n
    this
  }

  /** Point estimate: min over rows of the item's counter. Never below
    * the true count (each row's counter holds the true count plus
    * non-negative collision mass). */
  def estimate(item: String): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = counters(r * width + CmsSketch.bucket(item, r, width))
      if (c < best) best = c
      r += 1
    }
    best
  }

  /** Join-size (inner-product) estimate: min over rows of the row-wise
    * counter dot product. Never below the true size Σ_k a(k)·b(k) —
    * each row's dot product is the true inner product plus
    * non-negative cross-collision terms. `this` against `this` is the
    * self-join size, the F2 moment. */
  def innerProduct(other: CmsBuffer): Long = {
    require(other.depth == depth && other.width == width,
      s"CMS shape mismatch: $depth x $width vs " +
        s"${other.depth} x ${other.width}")
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      var dot = 0L
      var b = 0
      while (b < width) {
        dot += counters(r * width + b) * other.counters(r * width + b)
        b += 1
      }
      if (dot < best) best = dot
      r += 1
    }
    best
  }

  def serialize(): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(4 + 4 + 8 + 8 * counters.length)
    buf.putInt(depth).putInt(width).putLong(n)
    var i = 0
    while (i < counters.length) { buf.putLong(counters(i)); i += 1 }
    buf.array()
  }
}

object CmsBuffer {
  def deserialize(bytes: Array[Byte]): CmsBuffer = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val out = new CmsBuffer(buf.getInt(), buf.getInt())
    out.n = buf.getLong()
    var i = 0
    while (i < out.counters.length) {
      out.counters(i) = buf.getLong()
      i += 1
    }
    out
  }
}

sealed trait CmsAggBase extends TypedImperativeAggregate[CmsBuffer]
  with UnaryLike[Expression] {

  def depth: Int
  def width: Int

  override def createAggregationBuffer(): CmsBuffer =
    new CmsBuffer(depth, width)

  override def merge(buffer: CmsBuffer, other: CmsBuffer): CmsBuffer =
    buffer.merge(other)

  override def serialize(buffer: CmsBuffer): Array[Byte] =
    buffer.serialize()

  override def deserialize(bytes: Array[Byte]): CmsBuffer =
    CmsBuffer.deserialize(bytes)

  override def eval(buffer: CmsBuffer): Any = buffer.serialize()

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
}

/** String items (one per row — pre-exploded or a key cast to string)
  * → serialized Count-Min sketch (`binary`). Empty strings are skipped
  * to match the `item <> ''` contract of the suite's token oracles. */
case class CmsSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends CmsAggBase {

  override def update(buffer: CmsBuffer, input: InternalRow): CmsBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      if (s.nonEmpty) buffer.add(s)
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression)
      : CmsSketchAgg = copy(child = newChild)

  override def prettyName: String = "graft_cms_sketch"
}

/** String-ARRAY items (the per-document token array — one update loop
  * per row, no `explode`) → serialized Count-Min sketch. */
case class CmsTokensAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends CmsAggBase {

  override def update(buffer: CmsBuffer, input: InternalRow): CmsBuffer = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      val n = a.numElements()
      while (i < n) {
        if (!a.isNullAt(i)) {
          val s = a.getUTF8String(i).toString
          if (s.nonEmpty) buffer.add(s)
        }
        i += 1
      }
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsTokensAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CmsTokensAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression)
      : CmsTokensAgg = copy(child = newChild)

  override def prettyName: String = "graft_cms_tokens"
}

/** Serialized sketches (`binary`) → merged sketch (`binary`). Counter
  * addition is associative and commutative, so stored batch sketches
  * union in any order and in a tree — LOSSLESSLY (the merged matrix
  * equals the single-pass matrix, which the merge audit hashes). */
case class CmsUnionAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends CmsAggBase {

  override def update(buffer: CmsBuffer, input: InternalRow): CmsBuffer = {
    val bytes = child.eval(input)
    if (bytes != null)
      buffer.merge(CmsBuffer.deserialize(bytes.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsUnionAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CmsUnionAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression)
      : CmsUnionAgg = copy(child = newChild)

  override def prettyName: String = "graft_cms_union"
}

/** Scalar point lookup against a DRIVER-HELD sketch: `item` →
  * `sketch.estimate(item)`. The sketch is a reference object baked
  * into the plan (bounded metadata — 24 KB at 3×1024, the Theta
  * pattern), so the lookup runs distributed on the executors with no
  * join and stays inside whole-stage codegen (one static-call line;
  * the md5s per row are the same work the aggregate did per token). */
case class CmsEstimate(child: Expression, sketch: CmsBuffer)
  extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_cms_estimate needs a string item, got ${child.dataType}")

  override protected def nullSafeEval(item: Any): Any =
    sketch.estimate(item.toString)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsSketch", sketch,
      classOf[CmsBuffer].getName)
    defineCodeGen(ctx, ev, item => s"$ref.estimate($item.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : CmsEstimate = copy(child = newChild)

  override def prettyName: String = "graft_cms_estimate"
}

object CmsFunctions {

  /** Aggregate a string item column into a serialized CMS (`binary`). */
  def cmsSketchAgg(item: Column, depth: Int, width: Int): Column =
    GraftBridge.column(
      CmsSketchAgg(GraftBridge.expression(item), depth, width)
        .toAggregateExpression())

  /** Aggregate a string-ARRAY column (per-doc tokens) into a
    * serialized CMS without an explode. */
  def cmsTokensAgg(tokens: Column, depth: Int, width: Int): Column =
    GraftBridge.column(
      CmsTokensAgg(GraftBridge.expression(tokens), depth, width)
        .toAggregateExpression())

  /** Merge serialized CMS sketches into one serialized sketch. */
  def cmsUnionAgg(sketches: Column, depth: Int, width: Int): Column =
    GraftBridge.column(
      CmsUnionAgg(GraftBridge.expression(sketches), depth, width)
        .toAggregateExpression())

  /** Distributed point lookup against a driver-held sketch. */
  def cmsEstimate(item: Column, sketch: CmsBuffer): Column =
    GraftBridge.column(
      CmsEstimate(GraftBridge.expression(item), sketch))
}
