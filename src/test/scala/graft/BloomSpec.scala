package graft

import org.apache.spark.sql.functions._
import graft.functions.BloomAggFunctions
import graft.operators.BloomJoin
import graft.sources.Tables

/** Bloom filter build/probe pair + the join-reduction operator. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val numBits = 1 << 14
  private val k = 5

  test("bloom: zero false negatives, false-positive rate near configured") {
    val members = (0L until 2000L).map(i => i * 7 + 1)
    val bits = members.toDF("key")
      .agg(BloomAggFunctions.bloomBits(xxhash64(col("key")), numBits, k).as("b"))
    // every member must probe true — Bloom soundness
    val misses = members.toDF("key").crossJoin(bits)
      .filter(!BloomAggFunctions.mightContain(col("b"), xxhash64(col("key")), numBits, k))
      .count()
    assert(misses == 0, s"$misses false negatives")
    // non-members: observed fpp should be in the right ballpark of theory
    // (1 - e^(-kn/m))^k ~ 0.022 for n=2000, m=16384, k=5
    val nonMembers = (1L to 20000L).map(i => -i)
    val fp = nonMembers.toDF("key").crossJoin(bits)
      .filter(BloomAggFunctions.mightContain(col("b"), xxhash64(col("key")), numBits, k))
      .count()
    val fpp = fp.toDouble / nonMembers.size
    assert(fpp < 0.08, s"observed fpp $fpp wildly above theory (~0.022)")
  }

  test("bloom build is partition-invariant (merge = OR is order-free)") {
    val keys = (0L until 500L).toDF("key")
    def bitsOf(parts: Int) = keys.repartition(parts)
      .agg(BloomAggFunctions.bloomBits(xxhash64(col("key")), numBits, k).as("b"))
      .head.getSeq[Long](0)
    assert(bitsOf(1) == bitsOf(7))
  }

  test("bloomPrune is a sound superset; semiJoin equals the plain semi join") {
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val dim = Tables.customer(spark, sf).filter(col("c_acctbal") > 5000)
    val exact = orders.join(dim.select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    val pruned = BloomJoin.bloomPrune(orders, col("o_custkey"), dim,
        col("c_custkey"), numBits, k)
      .collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(pruned), "bloom prune lost matching rows")
    val viaBloom = BloomJoin.semiJoin(orders, "o_custkey", dim, "c_custkey",
        numBits, k)
      .collect().map(_.getLong(0)).toSet
    assert(viaBloom == exact, "bloom semi join diverged from exact semi join")
  }

  test("bits sizing helper picks a power of two meeting the fpp target") {
    val (m, kk) = BloomAggFunctions.bits(100000, 0.01)
    assert(Integer.bitCount(m) == 1 && m >= 100000)
    val theory = math.pow(1 - math.exp(-kk.toDouble * 100000 / m), kk)
    assert(theory < 0.03, s"m=$m k=$kk theoretical fpp $theory")
  }
}
