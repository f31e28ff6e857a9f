package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}
import org.roaringbitmap.RoaringBitmap
import org.roaringbitmap.longlong.Roaring64NavigableMap

/**
 * Roaring-bitmap primitives backing the `rbm32` / `rbm64` aggregation
 * merge-engine functions (Paimon's `fields.<f>.aggregate-function=rbm32`,
 * exposed generically through the reference's table-option plumbing,
 * TrinoTableOptionUtils.java:94). A field holds a SERIALIZED bitmap per
 * version; the fold ORs versions together — the canonical shape for exact
 * distinct-count rollup tables (cardinality is exact, so unlike HLL the
 * whole path is oracle-checkable).
 *
 * Serialization uses the portable interoperable RoaringFormatSpec layout
 * (`RoaringBitmap.serialize` / `Roaring64NavigableMap.serializePortable`),
 * so bytes written here are readable by any roaring implementation.
 * RoaringBitmap ships with Spark itself (shuffle-status tracking), so no
 * dependency is added.
 *
 * The scalar builders/readers use CodegenFallback deliberately: the work
 * is a library call on a byte buffer, not a per-element loop codegen
 * could fuse, and they run on the WRITE side (building version values) or
 * the final projection — never inside the scan-merge hot loop.
 */
object RoaringCodec {
  def serialize32(bm: RoaringBitmap): Array[Byte] = {
    bm.runOptimize()
    val bos = new ByteArrayOutputStream()
    bm.serialize(new DataOutputStream(bos))
    bos.toByteArray
  }
  def deserialize32(bytes: Array[Byte]): RoaringBitmap = {
    val bm = new RoaringBitmap()
    bm.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    bm
  }
  def serialize64(bm: Roaring64NavigableMap): Array[Byte] = {
    bm.runOptimize()
    val bos = new ByteArrayOutputStream()
    bm.serializePortable(new DataOutputStream(bos))
    bos.toByteArray
  }
  def deserialize64(bytes: Array[Byte]): Roaring64NavigableMap = {
    val bm = new Roaring64NavigableMap()
    bm.deserializePortable(new DataInputStream(new ByteArrayInputStream(bytes)))
    bm
  }
}

/** array<bigint> → serialized roaring bitmap (binary). 32-bit mode
  * requires every value in int range — out-of-range input is a loud
  * error, not a silent truncation. */
case class RbmBuild(child: Expression, bits64: Boolean)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = if (bits64) "rbm64_build" else "rbm32_build"
  override protected def withNewChildInternal(newChild: Expression): RbmBuild =
    copy(child = newChild)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (bits64) {
      val bm = new Roaring64NavigableMap()
      var i = 0
      while (i < arr.numElements()) { bm.addLong(arr.getLong(i)); i += 1 }
      RoaringCodec.serialize64(bm)
    } else {
      val bm = new RoaringBitmap()
      var i = 0
      while (i < arr.numElements()) {
        val v = arr.getLong(i)
        require(v >= Int.MinValue && v <= Int.MaxValue,
          s"rbm32 value out of int range: $v (use rbm64)")
        bm.add(v.toInt); i += 1
      }
      RoaringCodec.serialize32(bm)
    }
  }
}

/** serialized roaring bitmap → exact cardinality (bigint). */
case class RbmCardinality(child: Expression, bits64: Boolean)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String =
    if (bits64) "rbm64_cardinality" else "rbm32_cardinality"
  override protected def withNewChildInternal(newChild: Expression): RbmCardinality =
    copy(child = newChild)
  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bits64) RoaringCodec.deserialize64(bytes).getLongCardinality
    else RoaringCodec.deserialize32(bytes).getLongCardinality
  }
}

/** serialized roaring bitmap → array<bigint> in ascending order (32-bit
  * members are sign-extended: rbm32 stores ints). */
case class RbmToArray(child: Expression, bits64: Boolean)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = if (bits64) "rbm64_to_array" else "rbm32_to_array"
  override protected def withNewChildInternal(newChild: Expression): RbmToArray =
    copy(child = newChild)
  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val out: Array[Long] =
      if (bits64) RoaringCodec.deserialize64(bytes).toArray
      else RoaringCodec.deserialize32(bytes).toArray.map(_.toLong)
    new GenericArrayData(out)
  }
}

/** Mutable aggregation buffer: `seen` distinguishes an all-null history
  * (folds to SQL NULL, as every other merge-engine function does) from a
  * genuinely empty bitmap a writer stored on purpose. */
final class RoaringBuffer(var seen: Boolean, var bm32: RoaringBitmap,
    var bm64: Roaring64NavigableMap)

/**
 * OR-fold of serialized roaring bitmaps — the aggregate the `rbm32`/
 * `rbm64` merge engines reduce with. A [[TypedImperativeAggregate]]
 * (Spark's own shape for collect_set/percentile): partial bitmaps OR on
 * the map side, so N versions of a key shuffle as one bitmap per
 * partition — associative and commutative, which is exactly what makes
 * it safe over compacted partials (a compacted run's fold ORs with later
 * deltas to the same result).
 */
case class RoaringOrAgg(child: Expression, bits64: Boolean,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[RoaringBuffer] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = if (bits64) "rbm64_or" else "rbm32_or"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RoaringOrAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): RoaringOrAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RoaringOrAgg =
    copy(inputAggBufferOffset = newOffset)

  override def createAggregationBuffer(): RoaringBuffer =
    new RoaringBuffer(false,
      if (bits64) null else new RoaringBitmap(),
      if (bits64) new Roaring64NavigableMap() else null)

  override def update(buf: RoaringBuffer, input: InternalRow): RoaringBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[Array[Byte]]
      if (bits64) buf.bm64.or(RoaringCodec.deserialize64(bytes))
      else buf.bm32.or(RoaringCodec.deserialize32(bytes))
      buf.seen = true
    }
    buf
  }

  override def merge(buf: RoaringBuffer, other: RoaringBuffer): RoaringBuffer = {
    if (other.seen) {
      if (bits64) buf.bm64.or(other.bm64) else buf.bm32.or(other.bm32)
      buf.seen = true
    }
    buf
  }

  override def eval(buf: RoaringBuffer): Any =
    if (!buf.seen) null
    else if (bits64) RoaringCodec.serialize64(buf.bm64)
    else RoaringCodec.serialize32(buf.bm32)

  // shuffle format for partial buffers: 1 seen byte + portable bitmap
  override def serialize(buf: RoaringBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(buf.seen)
    if (bits64) buf.bm64.serializePortable(out) else buf.bm32.serialize(out)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): RoaringBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val seen = in.readBoolean()
    if (bits64) {
      val bm = new Roaring64NavigableMap()
      bm.deserializePortable(in)
      new RoaringBuffer(seen, null, bm)
    } else {
      val bm = new RoaringBitmap()
      bm.deserialize(in)
      new RoaringBuffer(seen, bm, null)
    }
  }
}
