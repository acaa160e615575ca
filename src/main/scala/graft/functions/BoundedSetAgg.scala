package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Size-bounded distinct-doc set with a min position per doc — the
  * constant-memory aggregation the inverted-index dedup family keys its
  * candidate generation on (substring windows, containment shingles).
  *
  * `collect_set(doc_id)` on a grouping key shared by f documents builds an
  * f-element buffer in ONE aggregation row before any downstream filter
  * can drop it — on real corpora boilerplate (license headers, navbars)
  * makes some windows corpus-hot, so f is unbounded and the buffer is an
  * OOM hazard at exactly the keys a df cap exists to drop. Pre-counting
  * df and joining the raw frame back fixes the buffer but pays two extra
  * exchanges of the operator's LARGEST frame (one row per corpus
  * character for substring windows — measured 1.3-2.5x the family's CPU).
  *
  * This aggregate does both jobs in the single exchange the r10 shape
  * already paid: the buffer is a (doc -> min pos) map capped at `maxDf`
  * entries BY CONSTRUCTION — the (maxDf+1)-st distinct doc flips the
  * state to a tiny overflow sentinel and frees the map, map-side partial
  * aggregation included, so no task ever holds more than maxDf entries
  * per key no matter how hot the key. Overflowed groups evaluate to NULL
  * (the df-cap drop, filtered by the caller); surviving groups evaluate
  * to the (doc_id, p) struct array sorted by doc_id, min position per
  * doc — exactly what the in-row ordered-pair explosion consumes. The
  * min-pos fold also subsumes the former per-(doc, key) pre-aggregation
  * (dedup happens inside the map), removing that exchange entirely.
  *
  * Determinism: set semantics + min fold are order-insensitive, so any
  * partitioning/merge order yields the same state; eval sorts by the
  * distinct doc_id key. Mergeable by construction (union with min, cap
  * re-checked after every merge; overflow is absorbing).
  */
case class BoundedMinPosSet(docId: Expression, pos: Expression, maxDf: Int,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedMinPosSet.Buf]
    with BinaryLike[Expression] {

  require(maxDf > 0, "maxDf must be positive")

  override def left: Expression = docId
  override def right: Expression = pos

  override def checkInputDataTypes(): TypeCheckResult =
    if (docId.dataType == LongType && pos.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bounded_minpos_set expects (long, long), got " +
        s"(${docId.dataType.simpleString}, ${pos.dataType.simpleString})")

  override def createAggregationBuffer(): BoundedMinPosSet.Buf =
    new BoundedMinPosSet.Buf(mutable.HashMap.empty, overflowed = false)

  override def update(buf: BoundedMinPosSet.Buf,
                      input: InternalRow): BoundedMinPosSet.Buf = {
    if (!buf.overflowed) {
      val d = docId.eval(input)
      val p = pos.eval(input)
      if (d != null && p != null) add(buf, d.asInstanceOf[Long], p.asInstanceOf[Long])
    }
    buf
  }

  private def add(buf: BoundedMinPosSet.Buf, d: Long, p: Long): Unit =
    buf.map.get(d) match {
      case Some(old) => if (p < old) buf.map.update(d, p)
      case None =>
        if (buf.map.size >= maxDf) { // (maxDf+1)-st distinct doc: cap hit
          buf.overflowed = true
          buf.map.clear() // free the memory immediately — hot keys stay O(1)
        } else buf.map.update(d, p)
    }

  override def merge(a: BoundedMinPosSet.Buf,
                     b: BoundedMinPosSet.Buf): BoundedMinPosSet.Buf = {
    if (a.overflowed || b.overflowed) {
      a.overflowed = true
      a.map.clear()
    } else b.map.foreach { case (d, p) => if (!a.overflowed) add(a, d, p) }
    a
  }

  override def eval(buf: BoundedMinPosSet.Buf): Any =
    if (buf.overflowed) null
    else {
      val sorted = buf.map.toArray.sortBy(_._1)
      new GenericArrayData(sorted.map { case (d, p) => InternalRow(d, p) })
    }

  override def serialize(buf: BoundedMinPosSet.Buf): Array[Byte] =
    if (buf.overflowed) ByteBuffer.allocate(4).putInt(-1).array()
    else {
      val bb = ByteBuffer.allocate(4 + 16 * buf.map.size)
      bb.putInt(buf.map.size)
      buf.map.foreach { case (d, p) => bb.putLong(d); bb.putLong(p) }
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): BoundedMinPosSet.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    if (n < 0) new BoundedMinPosSet.Buf(mutable.HashMap.empty, overflowed = true)
    else {
      val m = mutable.HashMap.empty[Long, Long]
      (0 until n).foreach(_ => m.update(bb.getLong, bb.getLong))
      new BoundedMinPosSet.Buf(m, overflowed = false)
    }
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("doc_id", LongType, nullable = false),
                   StructField("p", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true // null = overflowed (df-capped)
  override def prettyName: String = "graft_bounded_minpos_set"

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedMinPosSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedMinPosSet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedMinPosSet =
    copy(docId = newLeft, pos = newRight)
}

object BoundedMinPosSet {
  /** Aggregation state: distinct doc -> min pos, or the absorbing
    * overflow sentinel once the (maxDf+1)-st distinct doc arrives. */
  final class Buf(val map: mutable.HashMap[Long, Long], var overflowed: Boolean)
}

object BoundedSetAgg {
  /** Aggregate Column: df-capped distinct-doc set with min position per
    * doc — NULL when the group exceeds `maxDf` distinct docs, else a
    * doc_id-sorted array of (doc_id, p) structs. */
  def minPosSet(docId: Column, pos: Column, maxDf: Int): Column =
    Bridge.column(BoundedMinPosSet(
      Bridge.expression(docId), Bridge.expression(pos.cast("long")), maxDf)
      .toAggregateExpression())
}
