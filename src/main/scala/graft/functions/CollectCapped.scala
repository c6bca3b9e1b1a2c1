package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Bounded bucket membership as a native imperative aggregate: the `cap`
  * SMALLEST elements of the group in ascending order — exactly
  * `slice(sort_array(collect_list(e)), 1, cap)`, but the buffer never
  * holds more than `cap` elements. That composition is the LSH
  * band-bucket truncation in the near-dup family (q41/q44/q45) and the
  * posting-list guard in q43, and it has a scale flaw this fixes: at
  * 100 TB a mega-bucket (boilerplate with varying fill hashing to one
  * band signature, or a stopword shingle's posting list) materializes
  * MILLIONS of members in one aggregation buffer before the slice throws
  * them away — the one place the dedup pipeline's memory was O(bucket)
  * instead of O(cap). Here partial aggregation bounds every buffer at
  * `cap` map-side, so the shuffle carries at most cap elements per
  * (band, signature) and a mega-bucket costs what a full bucket costs.
  *
  * Buffer discipline: plain append while below cap (collect_list's cost
  * shape — buckets under the cap, the overwhelmingly common case, pay
  * nothing extra beyond the one eval-time sort the composition also
  * pays), heapify ONCE on first overflow, then each further row is one
  * comparison against the heap root and — only if kept — one copy and
  * one sift. Rejected rows are never copied, which matters because the
  * dedup sites ride whole shingle/vector payloads through this
  * aggregate.
  *
  * Element type is anything orderable (the dedup sites use structs with
  * the doc id first); ordering is Spark's SQL ordering for the type —
  * the same ordering `sort_array` uses — so results are bit-identical
  * with the composition it replaces. Null elements are skipped, matching
  * `collect_list`.
  */
case class CollectCapped(
    child: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CollectCapped.Buf] {
  import CollectCapped.Buf

  override def prettyName: String = "graft_collect_capped"
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (cap <= 0) TypeCheckResult.TypeCheckFailure(s"$prettyName requires cap > 0")
    else TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): Buf = new Buf

  /** Restore the max-heap property at `i0` (root = LARGEST element, the
    * eviction candidate).
    */
  private def siftDown(a: mutable.ArrayBuffer[Any], i0: Int): Unit = {
    val n = a.length
    var i = i0
    var done = false
    while (!done) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < n && ordering.gt(a(l), a(m))) m = l
      if (r < n && ordering.gt(a(r), a(m))) m = r
      if (m == i) done = true
      else {
        val t = a(i); a(i) = a(m); a(m) = t
        i = m
      }
    }
  }

  private def heapify(b: Buf): Unit = {
    var i = b.items.length / 2 - 1
    while (i >= 0) { siftDown(b.items, i); i -= 1 }
    b.heaped = true
  }

  /** `v` must already be owned by the buffer (copied or deserialized). */
  private def offerOwned(b: Buf, v: Any): Unit =
    if (b.items.length < cap) b.items += v
    else {
      if (!b.heaped) heapify(b)
      if (ordering.lt(v, b.items(0))) { b.items(0) = v; siftDown(b.items, 0) }
    }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      if (buf.items.length < cap) buf.items += InternalRow.copyValue(v)
      else {
        if (!buf.heaped) heapify(buf)
        // compare BEFORE copying: on an overflowing bucket most rows are
        // rejected here, and copying a payload-carrying struct for a row
        // about to be discarded would be the dominant cost. eval's result
        // is backed by the scan's reused row, so copy only what we keep.
        if (ordering.lt(v, buf.items(0))) {
          buf.items(0) = InternalRow.copyValue(v)
          siftDown(buf.items, 0)
        }
      }
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.items.foreach(offerOwned(buf, _))
    buf
  }

  override def eval(buf: Buf): Any =
    new GenericArrayData(buf.items.toArray.sorted(ordering))

  /** Spill format: each element as a single-column UnsafeRow. */
  @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.items.length)
    buf.items.foreach { v =>
      val bytes = proj(InternalRow(v)).getBytes
      out.writeInt(bytes.length); out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Buf
    val row = new UnsafeRow(1)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      row.pointTo(b, len)
      // copy out of the row so the next pointTo can't alias it
      buf.items += InternalRow.copyValue(row.get(0, child.dataType))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CollectCapped =
    copy(child = newChildren(0))
}

object CollectCapped {
  /** Aggregation buffer: flat member store + whether it is currently
    * max-heap ordered. `heaped` can only be true once length == cap
    * (heapify happens on first overflow and length never shrinks), so
    * appends below cap never run on a heaped buffer.
    */
  final class Buf {
    val items: mutable.ArrayBuffer[Any] = mutable.ArrayBuffer.empty
    var heaped: Boolean = false
  }
}
