package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass EXACT Gram/moment aggregate over quantized vectors — the
  * distributed XᵀX every covariance/PCA/whitening step needs.
  *
  * Input rows are `array<bigint>` of fixed length `d` (callers
  * quantize floats scan-side: q = ⌊v·scale + 0.5⌋ — integer sums are
  * order-free, so the result is bit-identical at any partitioning,
  * cluster size or engine, and a DuckDB oracle replays it exactly;
  * a float Gram accumulation is none of those). Output:
  * `struct(n BIGINT, moments ARRAY<BIGINT>[d], products
  * ARRAY<BIGINT>[d(d+1)/2])` with products in row-major upper-
  * triangular order (idx = i·d − i(i−1)/2 + (j−i), i ≤ j).
  *
  * The SHUFFLE CONTRACT is the point: as a `TypedImperativeAggregate`
  * it participates in partial aggregation, so each map task
  * contributes ONE fixed-size buffer (d(d+3)/2 + 1 longs ≈ 17 KB at
  * d=64) to the exchange regardless of row count — where the
  * explode-and-self-join formulation shuffles N·d(d+1)/2 product
  * rows. At 10⁹ vectors that is the difference between kilobytes per
  * task and terabytes.
  *
  * Overflow contract (raise-don't-wrap is NOT possible inside a hot
  * loop, so it is a documented precondition): callers must pick
  * `scale` so that N · (scale·maxAbs)² < 2⁶³ — at scale 10⁴ and
  * |v| ≤ 1 that allows ~9·10¹⁰ rows. Null arrays are skipped (like
  * every SQL aggregate); a null ELEMENT or a wrong-length row raises
  * with the row named — silent zeros would corrupt the covariance.
  */
case class GramMatrix(
    vec: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(d >= 1 && d <= 1024, s"graft_gram: d must be in [1, 1024], got $d")

  private val nProducts = d * (d + 1) / 2
  // buffer layout: [0] = n, [1..d] = moments, [d+1 ..] = products
  private val bufLen = 1 + d + nProducts

  override def children: Seq[Expression] = Seq(vec)

  // integral arrays only, REJECTED at analysis for float/double: a
  // silent truncating cast of raw embeddings would corrupt the "exact"
  // statistics with no signal — callers quantize first (Pca.quantize's
  // round-half-up), and the analysis error names that contract
  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(LongType | IntegerType | ShortType | ByteType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_gram: input must be an integral array (array<bigint>/int/" +
        s"smallint/tinyint) — quantize float embeddings first (e.g. " +
        s"q = floor(v*scale + 0.5)); got ${other.simpleString}")
  }

  // hoisted element getter: one dispatch at plan time, not per element
  @transient private lazy val getElem: (ArrayData, Int) => Long =
    vec.dataType.asInstanceOf[ArrayType].elementType match {
      case LongType    => (a, i) => a.getLong(i)
      case IntegerType => (a, i) => a.getInt(i).toLong
      case ShortType   => (a, i) => a.getShort(i).toLong
      case ByteType    => (a, i) => a.getByte(i).toLong
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("moments", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("products", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_gram"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = vec.eval(input)
    if (v == null) return buf // SQL aggregate convention: nulls skip
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != d)
      throw new IllegalArgumentException(
        s"graft_gram: row has ${arr.numElements()} elements, expected $d")
    var i = 0
    while (i < d) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_gram: null element at position $i — quantize nulls out first")
      i += 1
    }
    buf(0) += 1L
    // read each element once through the type-dispatched getter, then
    // run the triangular product loop over the local longs
    val q = new Array[Long](d)
    i = 0
    while (i < d) { q(i) = getElem(arr, i); i += 1 }
    var k = 1 + d
    i = 0
    while (i < d) {
      val qi = q(i)
      buf(1 + i) += qi
      var j = i
      while (j < d) {
        buf(k) += qi * q(j)
        k += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bufLen) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val moments = new Array[Any](d)
    var i = 0
    while (i < d) { moments(i) = buf(1 + i); i += 1 }
    val products = new Array[Any](nProducts)
    i = 0
    while (i < nProducts) { products(i) = buf(1 + d + i); i += 1 }
    InternalRow(buf(0), new GenericArrayData(moments),
      new GenericArrayData(products))
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bufLen * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < bufLen) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](bufLen)
    var i = 0
    while (i < bufLen) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): GramMatrix =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramMatrix =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): GramMatrix =
    copy(vec = cs.head)
}
