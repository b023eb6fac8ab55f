package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded bottom-k aggregate: keeps the k rows with the smallest
  * `keys` (lexicographic, ascending) per group.
  *
  * The point is the SHUFFLE CONTRACT, not the driver math: as a
  * `TypedImperativeAggregate` this participates in partial aggregation
  * (ObjectHashAggregate), so each map task contributes at most k rows
  * per group to the exchange. The window-function formulation of
  * grouped top-n (`row_number() <= k`) shuffles and sorts EVERY input
  * row; at 100 TB with small k that is the difference between moving
  * k·groups·tasks rows and moving the table.
  *
  * `keys` must be DoubleType (callers cast; descending order = negate
  * the key). Include a unique tiebreak key (e.g. an id) for
  * deterministic results. `payload` is the struct of carried columns.
  *
  * Buffer: a worst-first bounded priority queue of
  * (keys, UnsafeRow-copy). Serialization writes the key doubles and
  * raw UnsafeRow bytes — no per-row object graphs.
  */
case class BoundedTopK(
    payload: Expression,
    keys: Seq[Expression],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedTopK.Buffer] {

  require(k > 0, "bounded_topk: k must be positive")

  override def children: Seq[Expression] = payload +: keys

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!payload.dataType.isInstanceOf[StructType])
      TypeCheckResult.TypeCheckFailure("bounded_topk: payload must be a struct")
    else if (keys.exists(_.dataType != DoubleType))
      TypeCheckResult.TypeCheckFailure("bounded_topk: ordering keys must be DOUBLE")
    else TypeCheckResult.TypeCheckSuccess
  }

  private def payloadSchema = payload.dataType.asInstanceOf[StructType]

  override def dataType: DataType = ArrayType(payloadSchema, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bounded_topk"

  @transient private lazy val proj = UnsafeProjection.create(payloadSchema)

  // Reused per-row key scratch: update() is called sequentially within
  // a task, and the array is cloned before ownership passes to the
  // buffer — so one allocation serves the whole scan instead of one
  // per input row.
  @transient private lazy val scratchKeys = new Array[Double](keys.length)

  override def createAggregationBuffer(): BoundedTopK.Buffer =
    new BoundedTopK.Buffer(k)

  override def update(buf: BoundedTopK.Buffer, input: InternalRow): BoundedTopK.Buffer = {
    // Keys first, acceptance check second, and only THEN the payload:
    // once a group's heap is warm, almost every row is rejected, and a
    // rejected row must cost key evaluation only — not the struct
    // construction + unsafe projection + copy of the carried columns.
    val ks = scratchKeys
    var i = 0
    while (i < keys.length) {
      val v = keys(i).eval(input)
      // a null ordering key sorts last IN ITS OWN SLOT (+∞), like
      // asc_nulls_last per sort level — a null tiebreak must not
      // erase a non-null primary key
      ks(i) = if (v == null) Double.PositiveInfinity else v.asInstanceOf[Double]
      i += 1
    }
    if (buf.wouldAccept(ks)) {
      val p = payload.eval(input)
      if (p != null)
        buf.offer(ks.clone(), proj(p.asInstanceOf[InternalRow]).copy())
    }
    buf
  }

  override def merge(buf: BoundedTopK.Buffer, other: BoundedTopK.Buffer): BoundedTopK.Buffer = {
    other.entries.foreach { case (ks, row) => buf.offer(ks, row) }
    buf
  }

  override def eval(buf: BoundedTopK.Buffer): Any =
    new GenericArrayData(buf.sortedRows.asInstanceOf[Array[Any]])

  override def serialize(buf: BoundedTopK.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val es = buf.entries
    out.writeInt(es.length)
    es.foreach { case (ks, row) =>
      out.writeInt(ks.length)
      ks.foreach(out.writeDouble)
      val bytes = row.getBytes
      out.writeInt(row.numFields)
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopK.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new BoundedTopK.Buffer(k)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val m = in.readInt()
      val ks = Array.fill(m)(in.readDouble())
      val numFields = in.readInt()
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(numFields)
      row.pointTo(rowBytes, len)
      buf.offer(ks, row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): BoundedTopK =
    copy(payload = cs.head, keys = cs.tail)
}

object BoundedTopK {

  /** Lexicographic ascending over the key arrays. */
  private val keyOrd: Ordering[Array[Double]] = (a: Array[Double], b: Array[Double]) => {
    var i = 0
    var r = 0
    while (r == 0 && i < a.length && i < b.length) {
      r = java.lang.Double.compare(a(i), b(i))
      i += 1
    }
    if (r != 0) r else a.length - b.length
  }

  /** Bounded min-k bag: worst (largest) entry at the head of the queue
    * so it is the eviction candidate. */
  final class Buffer(k: Int) {
    private val pq = new mutable.PriorityQueue[(Array[Double], UnsafeRow)]()(
      Ordering.by[(Array[Double], UnsafeRow), Array[Double]](_._1)(keyOrd))

    def wouldAccept(ks: Array[Double]): Boolean =
      pq.size < k || keyOrd.compare(ks, pq.head._1) < 0

    def offer(ks: Array[Double], row: UnsafeRow): Unit = {
      if (pq.size < k) pq.enqueue((ks, row))
      else if (keyOrd.compare(ks, pq.head._1) < 0) { pq.dequeue(); pq.enqueue((ks, row)) }
    }

    def entries: Array[(Array[Double], UnsafeRow)] = pq.toArray

    def sortedRows: Array[UnsafeRow] =
      pq.toArray.sortBy(_._1)(keyOrd).map(_._2)
  }
}
