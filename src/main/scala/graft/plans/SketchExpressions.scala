package graft.plans

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy-hitters) aggregate over token arrays — the
  * frequency-sketch sibling of the HLL cardinality and GK quantile
  * sketches already in the profile suite. Wraps the DataSketches
  * Misra-Gries-family `ItemsSketch` (the library Spark itself bundles
  * for its `hll_*` functions) as a Catalyst
  * [[TypedImperativeAggregate]]: each partition folds its rows into one
  * bounded sketch (≤ `maxMapSize` counters), partial merge ships ONLY
  * sketch bytes through the exchange, and the final single row is the
  * candidate list with per-item (estimate, lower, upper) bounds.
  *
  * Scale story — this is "top tokens / top domains over 100 TB"
  * WITHOUT a token-level shuffle: the exact answer `groupBy(token)`
  * shuffles one row per distinct token; this plans as an
  * ObjectHashAggregate whose exchange carries one ≤ ~48 KB sketch per
  * partition. Error contract (published by the sketch, preserved under
  * arbitrary merge order): every item with true count >
  * 3.5·n/maxMapSize is in the candidate list
  * (`ErrorType.NO_FALSE_NEGATIVES`), and every item's true count lies
  * in [lower, upper]. `CorpusStats.heavyHittersValidated` turns both
  * guarantees into oracle-hashable booleans.
  *
  * The input is the per-document token ARRAY (one `update` loop per
  * row, no `explode`): empty strings are skipped so the stream matches
  * the `token <> ''` contract every token oracle in the suite uses.
  */
sealed trait FreqSketchAggBase
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] {

  def maxMapSize: Int

  require(maxMapSize > 0 && (maxMapSize & (maxMapSize - 1)) == 0,
    s"maxMapSize must be a power of 2, got $maxMapSize")

  // not java-serializable; rebuilt per executor after plan shipping
  @transient protected lazy val serDe = new ArrayOfStringsSerDe

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def merge(buffer: ItemsSketch[String],
      other: ItemsSketch[String]): ItemsSketch[String] =
    buffer.merge(other)

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(serDe)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serDe)

  override def nullable: Boolean = false

  protected def candidates(buffer: ItemsSketch[String]): GenericArrayData = {
    val rows = buffer.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
    new GenericArrayData(rows.map { r =>
      InternalRow(UTF8String.fromString(r.getItem), r.getEstimate,
        r.getLowerBound, r.getUpperBound)
    })
  }

  protected def updateFromTokens(buffer: ItemsSketch[String],
      input: InternalRow): ItemsSketch[String] = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      val n = a.numElements()
      while (i < n) {
        if (!a.isNullAt(i)) {
          val s = a.getUTF8String(i).toString
          if (s.nonEmpty) buffer.update(s)
        }
        i += 1
      }
    }
    buffer
  }
}

/** Tokens → candidate list `array<struct<item, est, lb, ub>>`. */
case class FreqItemsAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends FreqSketchAggBase {

  override def update(buffer: ItemsSketch[String], input: InternalRow)
      : ItemsSketch[String] = updateFromTokens(buffer, input)

  override def eval(buffer: ItemsSketch[String]): Any = candidates(buffer)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression)
      : FreqItemsAgg = copy(child = newChild)

  override def dataType: DataType = FreqItemsAgg.resultType

  override def prettyName: String = "graft_freq_items"
}

/** Tokens → SERIALIZED sketch (`binary`) — the persistable state form:
  * one row per ingested batch rides parquet, exactly like the HLL
  * `hll_sketch_agg` state rows, and [[FreqUnionAgg]] folds stored
  * sketches back together at read time without touching the data that
  * built them. */
case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends FreqSketchAggBase {

  override def update(buffer: ItemsSketch[String], input: InternalRow)
      : ItemsSketch[String] = updateFromTokens(buffer, input)

  override def eval(buffer: ItemsSketch[String]): Any = serialize(buffer)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression)
      : FreqSketchAgg = copy(child = newChild)

  override def dataType: DataType = BinaryType

  override def prettyName: String = "graft_freq_sketch"
}

/** Serialized sketches (`binary`) → merged candidate list. Merging is
  * associative and commutative (per-counter sum with purge-offset
  * tracking), so stored batch sketches union in any order and in a
  * tree — and the merged sketch keeps BOTH published contracts: no
  * false negatives above the (combined) error line, true counts inside
  * each candidate's [lb, ub]. */
case class FreqUnionAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends FreqSketchAggBase {

  override def update(buffer: ItemsSketch[String], input: InternalRow)
      : ItemsSketch[String] = {
    val bytes = child.eval(input)
    if (bytes != null) {
      buffer.merge(deserialize(bytes.asInstanceOf[Array[Byte]]))
    }
    buffer
  }

  override def eval(buffer: ItemsSketch[String]): Any = candidates(buffer)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqUnionAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): FreqUnionAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression)
      : FreqUnionAgg = copy(child = newChild)

  override def dataType: DataType = FreqItemsAgg.resultType

  override def prettyName: String = "graft_freq_union"
}

object FreqItemsAgg {
  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false))), containsNull = false)
}

object SketchFunctions {
  /** Aggregate a string-array column into a frequent-items candidate
    * list `array<struct<item, est, lb, ub>>` (see [[FreqItemsAgg]]). */
  def freqItemsAgg(tokens: Column, maxMapSize: Int): Column =
    GraftBridge.column(
      FreqItemsAgg(GraftBridge.expression(tokens), maxMapSize)
        .toAggregateExpression())

  /** Aggregate a string-array column into a serialized frequent-items
    * sketch (`binary`) — the persistable batch-state form. */
  def freqSketchAgg(tokens: Column, maxMapSize: Int): Column =
    GraftBridge.column(
      FreqSketchAgg(GraftBridge.expression(tokens), maxMapSize)
        .toAggregateExpression())

  /** Merge serialized frequent-items sketches into one candidate list. */
  def freqUnionAgg(sketches: Column, maxMapSize: Int): Column =
    GraftBridge.column(
      FreqUnionAgg(GraftBridge.expression(sketches), maxMapSize)
        .toAggregateExpression())
}
