package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.BloomAggFunctions

/** Bloom-filter join reduction — the 100 TB pattern for selective joins:
  * when a fact table joins a dimension subset that matches only a fraction
  * of fact rows, shuffling the whole fact to discover the misses is the
  * dominant cost. Instead: build a Bloom filter over the dim keys (one
  * distributed aggregate whose result is a bounded `array<bigint>` — KBs,
  * not the keys themselves), broadcast it, and drop non-matching fact rows
  * AT THE SCAN, before they ever reach the join's exchange. False positives
  * only cost a little extra shuffle; false negatives cannot happen, so the
  * exact join downstream returns exactly the un-pruned result.
  *
  * Spark's own runtime bloom filters (InjectRuntimeFilter) do this
  * automatically — but only between shuffle-join sides inside one query.
  * The explicit operator covers what that can't: reuse of one filter
  * across many queries, pruning feeding a broadcast join, and sizing under
  * the caller's control. */
object BloomJoin {

  /** Fact rows that MIGHT match a dim key: sound superset (no false
    * negatives), ~fpp extra rows. The bits frame is one row — its
    * "cross join" is a scalar broadcast, not a pair blow-up. */
  def bloomPrune(fact: DataFrame, factKey: Column, dim: DataFrame,
                 dimKey: Column, numBits: Int = 1 << 20,
                 numHashFns: Int = 5): DataFrame = {
    val bits = dim.agg(BloomAggFunctions.bloomBits(
      xxhash64(dimKey), numBits, numHashFns).as("__bloom_bits"))
    fact.crossJoin(broadcast(bits))
      .filter(BloomAggFunctions.mightContain(
        col("__bloom_bits"), xxhash64(factKey), numBits, numHashFns))
      .drop("__bloom_bits")
  }

  /** Exact semi join with the Bloom prefilter on the fact side: equals
    * `fact SEMI JOIN dim` row-for-row (the exact join clears the Bloom's
    * false positives), but the join's fact-side input is already pruned to
    * ~|matches| + fpp·|fact|.
    *
    * Deliberately NOT a `left_semi` join: PushDownLeftSemiAntiJoin rewrites
    * semi-above-prune into semi-FIRST with the bloom probing the join's
    * output — pure overhead (observed in the optimized plan). An inner join
    * against the distinct dim keys has identical semantics (each fact row
    * matches at most one key), sits outside that rule's reach, and keeps
    * the probe on the scan side — PlanSpec pins the shape. */
  def semiJoin(fact: DataFrame, factKey: String, dim: DataFrame,
               dimKey: String, numBits: Int = 1 << 20,
               numHashFns: Int = 5): DataFrame = {
    val pruned = bloomPrune(fact, col(factKey), dim, col(dimKey),
      numBits, numHashFns)
    pruned.join(dim.select(col(dimKey).as("__dim_key")).distinct(),
        col(factKey) === col("__dim_key"), "inner")
      .drop("__dim_key")
  }
}
