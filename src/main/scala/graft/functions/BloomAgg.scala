package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Shared probe arithmetic for the Bloom pair — the aggregate that SETS bits
  * and the expression that TESTS them must agree bit-for-bit.
  *
  * Kirsch-Mitzenmacher double hashing: position_i = (h1 + i·h2) mod m, with
  * h2 a splitmix64 remix of the input hash — k independent-enough probes
  * from ONE 64-bit input hash, no per-probe rehash of the key. Callers feed
  * `xxhash64(key)` so the filter works for any key type (and composite
  * keys) without the bloom code knowing about Spark types. */
private[graft] object BloomProbe {
  def mix(h: Long): Long = {
    var z = h + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  /** Java source of [[mix]] for codegen, applied to variable `in`, result in
    * fresh variable `out` (both longs, declared by the caller). */
  def mixJava(in: String, out: String): String =
    s"""long $out = $in + 0x9E3779B97F4A7C15L;
        $out = ($out ^ ($out >>> 30)) * 0xBF58476D1CE4E5B9L;
        $out = ($out ^ ($out >>> 27)) * 0x94D049BB133111EBL;
        $out = $out ^ ($out >>> 31);"""
}

/** One-pass distributed Bloom-filter build over a LONG hash column: the
  * buffer is the bit array itself (`numBits` bits in longs), update sets the
  * k probe bits, merge is elementwise OR — commutative/associative, so the
  * build is a map-side-combined aggregate with no driver-side loop over
  * keys; only the finished O(numBits/8)-byte sketch ever reaches the driver
  * (exactly like any broadcast). Emits `array<bigint>` so the filter is a
  * plain column value: broadcastable, persistable, joinable.
  *
  * Sizing: fpp ≈ (1 - e^(-k·n/m))^k; the helper [[BloomAggFunctions.bits]]
  * picks m for a target n/fpp. */
case class BloomFilterBits(child: Expression, numBits: Int, numHashFns: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
  require(numBits >= 64 && Integer.bitCount(numBits) == 1,
    s"graft_bloom: numBits must be a power of two >= 64, got $numBits")
  require(numHashFns >= 1 && numHashFns <= 16,
    s"graft_bloom: numHashFns must be in [1,16], got $numHashFns")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom expects a bigint hash column (xxhash64 the key), got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h1 = v.asInstanceOf[Long]
      val h2 = BloomProbe.mix(h1)
      var i = 0
      while (i < numHashFns) {
        val pos = java.lang.Math.floorMod(h1 + i * h2, numBits.toLong).toInt
        buf(pos >>> 6) |= (1L << (pos & 63))
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numBits / 64)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterBits =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterBits =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomFilterBits =
    copy(child = newChild)
}

/** Membership probe against a [[BloomFilterBits]] bit array: true if every
  * probe bit is set (possible member), false guarantees non-membership.
  * Codegen'd k-probe loop — scan-speed, so the filter belongs on the FACT
  * scan, upstream of the join it protects. */
case class BloomMightContain(left: Expression, right: Expression,
                             numBits: Int, numHashFns: Int)
    extends BinaryExpression {
  require(numBits >= 64 && Integer.bitCount(numBits) == 1,
    s"graft_bloom_contains: numBits must be a power of two >= 64, got $numBits")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<bigint> bits, bigint hash), got ${l.simpleString}, ${r.simpleString}")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def nullSafeEval(bitsAny: Any, hashAny: Any): Any = {
    val bits = bitsAny.asInstanceOf[ArrayData]
    val h1 = hashAny.asInstanceOf[Long]
    val h2 = BloomProbe.mix(h1)
    var i = 0
    while (i < numHashFns) {
      val pos = java.lang.Math.floorMod(h1 + i * h2, numBits.toLong).toInt
      if ((bits.getLong(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bits, h) => {
      val h2 = ctx.freshName("h2"); val i = ctx.freshName("i")
      val pos = ctx.freshName("pos"); val ok = ctx.freshName("ok")
      s"""
        ${BloomProbe.mixJava(h, h2)}
        boolean $ok = true;
        for (int $i = 0; $ok && $i < $numHashFns; $i++) {
          int $pos = (int) java.lang.Math.floorMod($h + $i * $h2, ${numBits}L);
          $ok = ($bits.getLong($pos >>> 6) & (1L << ($pos & 63))) != 0L;
        }
        ${ev.value} = $ok;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomAggFunctions {
  /** Smallest power-of-two bit count giving ~`fpp` at `expectedKeys` with
    * the optimal k; also returns that k. */
  def bits(expectedKeys: Long, fpp: Double = 0.01): (Int, Int) = {
    val m = math.max(64.0,
      -expectedKeys * math.log(fpp) / (math.log(2) * math.log(2)))
    val pow2 = Integer.highestOneBit(math.min(m, (1 << 28).toDouble).toInt)
    val rounded = if (pow2 < m) pow2 << 1 else pow2
    val k = math.max(1, math.round(rounded.toDouble / expectedKeys * math.log(2)).toInt)
    (rounded, math.min(16, k))
  }

  /** Aggregate Column: Bloom bit array over a bigint hash column. */
  def bloomBits(hash: Column, numBits: Int, numHashFns: Int): Column =
    Bridge.column(BloomFilterBits(Bridge.expression(hash), numBits, numHashFns)
      .toAggregateExpression())

  /** Probe Column: membership test of `hash` against `bits`. */
  def mightContain(bits: Column, hash: Column, numBits: Int, numHashFns: Int): Column =
    Bridge.column(BloomMightContain(Bridge.expression(bits),
      Bridge.expression(hash), numBits, numHashFns))
}
