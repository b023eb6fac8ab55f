package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch over a string column: a bounded
  * set of candidate heavy hitters in `capacity` counters, regardless
  * of input cardinality.
  *
  * The aggregate returns CANDIDATES (array<string>), not counts — MG
  * counters are lower bounds, so callers re-count the candidates
  * exactly ([[graft.operators.Freq.heavyHitters]]). The guarantee that
  * makes the two-phase plan EXACT: after observing N items, every item
  * with true count > N/capacity is still in the sketch (cumulative
  * decrement per item is ≤ N/capacity; mergeable-summaries bound, so
  * it survives partial aggregation and merge too).
  *
  * Implementation is the batched-decrement MG variant (amortized
  * O(log capacity) per update): the counter map may grow to
  * 2·capacity, and on overflow one O(k log k) prune subtracts the
  * (capacity+1)-th largest count from everything and evicts the
  * non-positive — each prune evicts ≥ capacity entries, so the sweep
  * amortizes over the inserts that filled them. The classic
  * decrement-all-by-1-per-overflow formulation is O(k) per non-resident
  * insert, which on a high-cardinality column degenerates to O(N·k).
  */
case class FreqSketch(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketch.Buffer] {

  require(capacity > 0 && capacity <= FreqSketch.MaxCapacity,
    s"freq_sketch: capacity must be in [1, ${FreqSketch.MaxCapacity}], got $capacity")

  override def children: Seq[Expression] = child :: Nil

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("freq_sketch: input must be STRING")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_freq_sketch"

  override def createAggregationBuffer(): FreqSketch.Buffer =
    new FreqSketch.Buffer(capacity)

  override def update(buf: FreqSketch.Buffer, input: InternalRow): FreqSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String], 1L)
    buf
  }

  override def merge(buf: FreqSketch.Buffer, other: FreqSketch.Buffer): FreqSketch.Buffer = {
    other.counts.foreach { case (item, c) => buf.add(item, c) }
    buf
  }

  override def eval(buf: FreqSketch.Buffer): Any =
    new GenericArrayData(buf.items.asInstanceOf[Array[Any]])

  override def serialize(buf: FreqSketch.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (item, c) =>
      val bytes = item.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqSketch.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new FreqSketch.Buffer(capacity)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.add(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): FreqSketch =
    copy(child = cs.head)
}

object FreqSketch {

  /** Upper bound on counters: a frequent-items sketch above 2^24
    * entries has stopped being a sketch, and the bound keeps
    * 2·capacity arithmetic and prune() indices safely inside Int
    * (an unchecked Int.MaxValue capacity would overflow `2*capacity`
    * negative and index prune()'s array below zero). */
  val MaxCapacity: Int = 1 << 24

  final class Buffer(capacity: Int) {
    // UTF8String keys hash/compare by bytes; values stored at insert
    // are CLONED because scan-side UTF8Strings alias reused UnsafeRow
    // buffers
    val counts = new mutable.HashMap[UTF8String, Long]()

    def add(item: UTF8String, weight: Long): Unit = {
      counts.get(item) match {
        case Some(c) => counts.update(item, c + weight)
        case None =>
          counts.put(item.clone(), weight)
          if (counts.size > 2 * capacity) prune()
      }
    }

    /** Subtract the (capacity+1)-th largest count from every counter
      * and evict the non-positive: ≤ capacity entries survive, and the
      * per-item cumulative subtraction stays within the MG N/capacity
      * error bound. */
    private def prune(): Unit = {
      val vals = counts.values.toArray
      java.util.Arrays.sort(vals)
      val m = vals(vals.length - capacity - 1) // (capacity+1)-th largest
      counts.filterInPlace((_, c) => c - m > 0)
      counts.mapValuesInPlace((_, c) => c - m)
    }

    def items: Array[UTF8String] = counts.keysIterator.toArray
  }
}
