package graft.plans

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch,
  Sketches, Union, UpdateSketch}
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Theta sketch aggregates over key/sketch columns — the SET-ALGEBRA
  * sketch family beside the suite's HLL (cardinality), GK (quantiles)
  * and Misra-Gries (frequencies): a Theta sketch retains the k
  * smallest hash values of the key SET, so two sketches support
  * union, INTERSECTION and difference with published error bounds —
  * the operations HLL cannot do (audience overlap, cross-corpus
  * contamination mass, retained-user counts) without a distinct-pair
  * shuffle.
  *
  * Shape: an ObjectHashAggregate whose exchange carries one ≤ ~8·k
  * byte sketch per partition, never a key-level row. The retained set
  * ("k smallest hashes of the distinct keys") is a pure function of
  * the input SET — independent of row order, partitioning and merge
  * order — so estimates are deterministic across any cluster layout,
  * which is what lets the audit queries hash bound booleans derived
  * from them. Below k distinct keys the sketch is EXACT (θ = 1);
  * above, estimates carry the published ~1/√k relative error.
  *
  * The shared buffer plumbing lives here; [[ThetaSketchAgg]] folds
  * raw long keys, [[ThetaUnionAgg]] folds already-serialized sketches
  * (the persistable-state form: one binary sketch row per ingested
  * batch rides parquet — the HLL `sketchState` / Misra-Gries
  * `freqState` pattern — and stored rows union back at read time
  * without touching the keys that built them; the error CONTRACT
  * survives any merge order, which is what the audit queries hash).
  */
sealed trait ThetaAggBase
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  def nomEntries: Int

  require(nomEntries > 0 && (nomEntries & (nomEntries - 1)) == 0,
    s"nomEntries must be a power of 2, got $nomEntries")

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(nomEntries).buildUnion()

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Sketches.wrapSketch(Memory.wrap(bytes)))
    u
  }

  override def eval(buffer: Union): Any = serialize(buffer)

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
}

/** Long keys → serialized Theta sketch (`binary`). */
case class ThetaSketchAgg(
    child: Expression,
    nomEntries: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ThetaAggBase {

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : ThetaSketchAgg = copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int)
      : ThetaSketchAgg = copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression)
      : ThetaSketchAgg = copy(child = newChild)

  override def prettyName: String = "graft_theta_sketch"
}

/** Serialized sketches (`binary`) → merged sketch (`binary`). */
case class ThetaUnionAgg(
    child: Expression,
    nomEntries: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ThetaAggBase {

  override def update(buffer: Union, input: InternalRow): Union = {
    val bytes = child.eval(input)
    if (bytes != null)
      buffer.union(Sketches.wrapSketch(
        Memory.wrap(bytes.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : ThetaUnionAgg = copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int)
      : ThetaUnionAgg = copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression)
      : ThetaUnionAgg = copy(child = newChild)

  override def prettyName: String = "graft_theta_union"
}

/** Column constructors + driver-side set algebra over serialized
  * sketches (bounded metadata — a compact sketch is ≤ ~8·k bytes, so
  * combining a handful on the driver is index-metadata scale, never a
  * data-row collect). */
object ThetaFunctions {

  /** Aggregate a long key column into a serialized Theta sketch. */
  def thetaSketchAgg(key: Column, nomEntries: Int): Column =
    GraftBridge.column(
      ThetaSketchAgg(GraftBridge.expression(key), nomEntries)
        .toAggregateExpression())

  /** Merge serialized Theta sketches into one serialized sketch. */
  def thetaUnionAgg(sketches: Column, nomEntries: Int): Column =
    GraftBridge.column(
      ThetaUnionAgg(GraftBridge.expression(sketches), nomEntries)
        .toAggregateExpression())

  def wrap(bytes: Array[Byte]): Sketch =
    Sketches.wrapSketch(Memory.wrap(bytes))

  /** The empty sketch (an audience with no members). */
  def empty(nomEntries: Int): CompactSketch =
    UpdateSketch.builder().setNominalEntries(nomEntries).build().compact()

  def union(a: Sketch, b: Sketch, nomEntries: Int): Sketch = {
    val u = SetOperation.builder().setNominalEntries(nomEntries)
      .buildUnion()
    u.union(a); u.union(b)
    u.getResult
  }

  def intersect(a: Sketch, b: Sketch): Sketch = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(a); i.intersect(b)
    i.getResult
  }

  def aNotB(a: Sketch, b: Sketch): Sketch =
    SetOperation.builder().buildANotB().aNotB(a, b)
}
