package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Deterministic bounded per-group sample as a native
  * `TypedImperativeAggregate`: the k ids with the smallest values of a
  * fixed bijective hash (`id * 0x9E3779B97F4A7C15`, wrapping 64-bit
  * multiply — an odd multiplier permutes Z/2^64, so distinct ids can
  * never tie), returned hash-ascending as `array<long>`.
  *
  * This is "keep k pseudorandom docs per group" as ONE aggregation
  * pass: partial buffers are k-bounded heaps that merge
  * associatively, so the map side combines before the shuffle and the
  * exchange carries ≤ k longs per (partition, group) — vs the window
  * formulation (`row_number() OVER (ORDER BY hash)` ≤ k), which
  * shuffles EVERY row to sort whole groups. Deterministic for fixed
  * data (no RNG state), re-shard-stable, and exactly replicable in
  * SQL on any engine with 128-bit arithmetic — which is what the
  * DuckDB oracle does.
  *
  * The aggregate-function leg of the extension surface (scalar
  * Expression, optimizer Rule, Strategy + physical operator are
  * demonstrated elsewhere).
  */
case class BottomKSample(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[Long]]
  with UnaryLike[Expression] {

  require(k > 0, "bottomk_sample: k must be positive")

  override def prettyName: String = "bottomk_sample"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  private def hashOf(id: Long): Long = id * 0x9E3779B97F4A7C15L

  /** Max-heap on the hash: head is the current worst of the kept k. */
  private def newHeap(): java.util.PriorityQueue[Long] =
    new java.util.PriorityQueue[Long](k + 1,
      (a: Long, b: Long) => java.lang.Long.compare(hashOf(b), hashOf(a)))

  override def createAggregationBuffer(): java.util.PriorityQueue[Long] =
    newHeap()

  private def offer(buf: java.util.PriorityQueue[Long], id: Long): Unit = {
    if (buf.size < k) buf.offer(id)
    else if (hashOf(id) < hashOf(buf.peek())) { buf.poll(); buf.offer(id) }
  }

  override def update(buf: java.util.PriorityQueue[Long],
      input: InternalRow): java.util.PriorityQueue[Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.PriorityQueue[Long],
      other: java.util.PriorityQueue[Long]): java.util.PriorityQueue[Long] = {
    val it = other.iterator()
    while (it.hasNext) offer(buf, it.next())
    buf
  }

  override def eval(buf: java.util.PriorityQueue[Long]): Any = {
    val ids = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { ids(i) = it.next(); i += 1 }
    // heap iteration order is arbitrary — present hash-ascending
    new GenericArrayData(ids.sortBy(hashOf))
  }

  override def serialize(buf: java.util.PriorityQueue[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 8)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[Long] = {
    val buf = newHeap()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) offer(buf, bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BottomKSample =
    copy(child = newChild)
}
