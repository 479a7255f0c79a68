package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `log2_hist(v)` — a native Catalyst aggregate building the power-of-two
  * histogram sketch (x12's bucketing) in ONE pass: a fixed 64-cell long
  * array buffer, bucket = floor(log2(v)) via `numberOfLeadingZeros` (exact
  * integer bit math — no float log, the same boundary discipline as the
  * relational spelling), merge = elementwise add.
  *
  * This is the third extension tier from SURVEY §7.3 — beyond scalar
  * codegen Expressions (PyRound/VecDot/Shingles) and the typed Aggregator
  * UDAF (MinHashAgg): a [[TypedImperativeAggregate]] that Spark plans as
  * ObjectHashAggregate with a genuine PARTIAL phase, so a 100 TB scan
  * collapses to one 512-byte buffer per (group × partition) before the
  * shuffle — the mergeable-sketch contract (per-shard histograms OR-merge
  * by addition) expressed as engine machinery rather than a groupBy.
  * Values ≤ 0 and NULLs are ignored (the histogram is defined on positive
  * magnitudes, matching the relational twin's positive-cents domain).
  *
  * x14 pins it value-exactly against the relational groupBy histogram via
  * the DuckDB oracle; PlanSpec pins the partial ObjectHashAggregate shape.
  */
case class Log2Hist(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def prettyName: String = "log2_hist"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      if (x > 0L) buf(63 - java.lang.Long.numberOfLeadingZeros(x)) += 1L
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 8)
    var i = 0
    while (i < 64) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](64)
    var i = 0
    while (i < 64) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): Log2Hist =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): Log2Hist =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): Log2Hist =
    copy(child = newChild)
}
