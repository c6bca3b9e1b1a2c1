package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Gram-matrix accumulator over integer-quantized vectors — the
  * second-order-statistics kernel behind PCA/whitening fits
  * (MLlib's `RowMatrix.computeGramianMatrix` shape, here as a native
  * aggregate so it composes with groupBy and rides normal partial
  * aggregation). Buffer = the upper triangle of Σ v·vᵀ as d(d+1)/2
  * longs in row-major (i ≤ j) order; update adds one outer product,
  * merge is element-wise add. All arithmetic is exact BIGINT, so the
  * result is bit-identical regardless of row order or partitioning —
  * the property the fixed-point quantization upstream exists to buy.
  *
  * Scale: the alternative declarative form (explode d(d+1)/2 products
  * per row, hash-agg by pair) pushes n·d²/2 rows through the shuffle
  * machinery; this kernel keeps ONE d(d+1)/2-long buffer per
  * partition and ships only those to the final merge — for d=64 that
  * is a 16 KB state per partition instead of 2080 rows per input row.
  * Dimension is inferred from the first vector and enforced: a ragged
  * corpus fails loudly rather than mis-accumulating.
  *
  * Overflow headroom: |q| ≤ 2^s elements give products ≤ 2^2s; with
  * the q200 scale s=16 a single sum may absorb ~2^46 rows before
  * nearing 2^63 — far beyond any single final-merge partition. For
  * larger s, shard the aggregation (groupBy bucket, then re-merge).
  */
case class GramMatrix(
    vec: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def prettyName: String = "graft_gram"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(vec)

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  /** Empty = no rows seen yet; the dimension is fixed by the first row. */
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def dimOf(triLen: Int): Int = {
    // invert d(d+1)/2; exact for any buffer this class produced
    val d = ((math.sqrt(8.0 * triLen + 1) - 1) / 2).round.toInt
    require(d * (d + 1) / 2 == triLen, s"corrupt gram buffer length $triLen")
    d
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = vec.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val acc =
      if (buf.isEmpty) new Array[Long](d * (d + 1) / 2)
      else {
        require(dimOf(buf.length) == d,
          s"$prettyName: vector dimension changed mid-aggregation " +
            s"(${dimOf(buf.length)} then $d) — ragged input")
        buf
      }
    var i = 0
    var idx = 0
    while (i < d) {
      val vi = arr.getLong(i)
      var j = i
      while (j < d) { acc(idx) += vi * arr.getLong(j); idx += 1; j += 1 }
      i += 1
    }
    acc
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    if (other.isEmpty) buf
    else if (buf.isEmpty) other
    else {
      require(buf.length == other.length,
        s"$prettyName: merging gram buffers of different dimension")
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrix =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrix =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramMatrix =
    copy(vec = newChildren(0))
}
