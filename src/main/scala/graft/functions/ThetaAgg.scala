package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** KMV ("k minimum values") theta sketch — the mergeable distinct-count
  * summary behind Druid/Pinot theta sketches (Beyer et al., SIGMOD'07):
  * keep the k SMALLEST 64-bit hashes of the values seen. With u(h) the
  * hash normalized to [0,1) and θ = u(k-th smallest), the distinct count
  * estimates as (k−1)/θ (exact when fewer than k distincts arrived), with
  * relative error ≈ 1/√(k−2).
  *
  * What HLL can't do and this can: the retained hashes are a UNIFORM
  * SAMPLE of the distinct values, so sketches COMPOSE — union = merge the
  * sets and re-trim; intersection = count common hashes below min(θa, θb)
  * and divide by it. "Distinct users in segment A ∩ B" over 100 TB becomes
  * pure arithmetic on two k-long arrays. Merge is associative/commutative
  * and the result is a pure function of the value multiset — partition-
  * invariant, map-side combined, k longs per partition on the wire.
  *
  * `eval` returns the retained hashes sorted ascending; θ and the
  * estimates stay DECLARATIVE (see [[ThetaAgg.estimate]] and friends) so
  * the set algebra is visible in the plan, not buried in the aggregate. */
/** The shared KMV state machine: a TreeSet of the k smallest distinct
  * hashes, O(k) memory per buffer however many values or sketches fold
  * in. [[ThetaSketch]] feeds it raw VALUES (hashed on entry);
  * [[ThetaUnionSketch]] feeds it STORED sketch arrays — the
  * constant-memory union that replaces collect_list-then-flatten
  * merging, whose buffer grew with the number of stored cells. */
private[functions] trait KmvAggregate
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {
  def k: Int

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  protected final def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last) {
      if (buf.add(h)) buf.pollLast()
      ()
    }
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
                     b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr) // ascending — TreeSet iterates sorted
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    (0 until n).foreach(_ => buf.add(bb.getLong))
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
}

case class ThetaSketch(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends KmvAggregate with UnaryLike[Expression] {

  require(k >= 16 && k <= 65536, "k in [16, 65536]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType | _: MapType | _: StructType =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_theta expects an atomic column, got ${child.dataType.simpleString}")
    case _ => TypeCheckResult.TypeCheckSuccess
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, XxHash64Function.hash(v, child.dataType, 42L))
    buf
  }

  override def prettyName: String = "graft_theta"

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketch =
    copy(child = newChild)
}

/** KMV UNION over STORED sketches: folds each element of the input
  * `array<long>` sketch column into the same O(k) state [[ThetaSketch]]
  * builds from raw values — so merging a year of stored daily cells
  * holds k longs per group, where the collect_list-then-flatten
  * formulation it replaces buffered every cell's full sketch (k longs ×
  * #cells — 128 KB × 365 per group at k=2¹⁴) before trimming. Same
  * result by construction: the k smallest distinct hashes of the union
  * are the k smallest of the concatenation. */
case class ThetaUnionSketch(child: Expression, k: Int,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
    extends KmvAggregate with UnaryLike[Expression] {

  require(k >= 16 && k <= 65536, "k in [16, 65536]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_theta_union expects array<bigint> (a stored sketch), got ${other.simpleString}")
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      // skip null elements rather than folding them in as hash 0L: a
      // null-permissive array schema (SQL literal, format round-trip)
      // must not inject a fake hash into the KMV state
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) add(buf, arr.getLong(i))
        i += 1
      }
    }
    buf
  }

  override def prettyName: String = "graft_theta_union"

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionSketch =
    copy(child = newChild)
}

object ThetaAgg {
  import org.apache.spark.sql.functions._

  /** Aggregate Column: the k smallest value hashes, sorted ascending. */
  def sketch(value: Column, k: Int = 256): Column =
    Bridge.column(ThetaSketch(Bridge.expression(value), k)
      .toAggregateExpression())

  /** Aggregate Column: KMV union of STORED sketch arrays — the k
    * smallest distinct hashes across every input sketch, O(k) state. */
  def union(sk: Column, k: Int = 256): Column =
    Bridge.column(ThetaUnionSketch(Bridge.expression(sk), k)
      .toAggregateExpression())

  /** hash → uniform [0,1): shift the signed long range onto the unit
    * interval. Pure arithmetic, codegen'd. */
  private def u(h: Column): Column =
    h.cast("double") / 1.8446744073709552e19 + 0.5

  /** θ of a sketch: u(k-th smallest) when saturated, else 1 (exact). */
  def theta(sk: Column, k: Int = 256): Column =
    when(size(sk) >= k, u(element_at(sk, k))).otherwise(lit(1.0))

  /** Distinct-count estimate of one sketch. */
  def estimate(sk: Column, k: Int = 256): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit(k - 1) / theta(sk, k))

  /** Distinct-count estimate of the UNION: distinct merged hashes below
    * min(θa, θb), scaled by it. */
  def unionEstimate(a: Column, b: Column, k: Int = 256): Column = {
    val tm = least(theta(a, k), theta(b, k))
    size(filter(array_distinct(concat(a, b)), h => u(h) < tm)).cast("double") / tm
  }

  /** Distinct-count estimate of the INTERSECTION: common hashes below
    * min(θa, θb), scaled by it — the composition HLL cannot express. */
  def intersectionEstimate(a: Column, b: Column, k: Int = 256): Column = {
    val tm = least(theta(a, k), theta(b, k))
    size(filter(array_intersect(a, b), h => u(h) < tm)).cast("double") / tm
  }
}
