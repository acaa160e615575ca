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
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan, J.Alg 2005): a d×w counter
  * grid answering point-frequency queries over a stream in O(d·w) memory.
  * `est(x) = min_i grid[i][h_i(x) mod w]` — always ≥ the true count, and
  * ≤ true + (e/w)·N with probability 1 − e^−d. Complements the Misra-Gries
  * summary (which finds WHICH items are hot; CMS answers "how hot is THIS
  * item" for any item, including ones MG evicted).
  *
  * Mergeable: grids add elementwise, so partial aggregation combines
  * map-side and only d·w longs per partition cross the wire — at 100 TB
  * the wire cost is constant while exact per-item counts would shuffle a
  * row per distinct item. The sketch is also a pure function of the
  * multiset (integer adds commute): any partitioning yields the identical
  * grid, bit for bit.
  *
  * Row hashes replicate Spark's own two-argument chain
  * `xxhash64(lit(row), item)` — seed 42 through the Int row index, then
  * the item bytes — so the PROBE side needs no custom expression at all:
  * `least_i(element_at(sketch, i·w + pmod(xxhash64(lit(i), item), w) + 1))`
  * is plain codegen'd `functions._` arithmetic over the returned array.
  */
case class CountMinSketch(child: Expression, depth: Int, width: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, "depth in [1,16]")
  require(width >= 16, "width >= 16")

  // seed_i = xxhash64-chain state after hashing the Int i from seed 42,
  // exactly what Spark's xxhash64(lit(i), item) computes before the item
  private lazy val rowSeeds: Array[Long] =
    Array.tabulate(depth)(i => XxHash64Function.hash(i, IntegerType, 42L))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cms expects a string column, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      var i = 0
      while (i < depth) {
        val h = XxHash64Function.hash(item, StringType, rowSeeds(i))
        val slot = ((h % width) + width) % width
        buf(i * width + slot.toInt) += 1
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms"

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinSketch =
    copy(child = newChild)
}

object CountMinAgg {
  import org.apache.spark.sql.functions._

  /** Aggregate Column: the d×w counter grid as array<long> (row-major). */
  def sketch(item: Column, depth: Int = 4, width: Int = 2048): Column =
    Bridge.column(CountMinSketch(Bridge.expression(item), depth, width)
      .toAggregateExpression())

  /** Point estimate from a sketch column: min over the d rows — pure
    * `functions._` arithmetic (codegen'd), no custom probe expression. */
  def estimate(sketchCol: Column, item: Column,
               depth: Int = 4, width: Int = 2048): Column =
    (0 until depth).map { i =>
      element_at(sketchCol,
        (lit(i * width) + pmod(xxhash64(lit(i), item), lit(width)) + 1).cast("int"))
    }.reduce(least(_, _))
}
