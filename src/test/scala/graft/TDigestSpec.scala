package graft

import org.apache.spark.sql.functions._
import graft.functions.{TDigest, TDigestAgg}
import graft.operators.Analytics
import graft.sources.Tables

/** t-digest sketch quantiles verified against exact percentiles, plus the
  * merge/serialize properties the shuffle relies on. */
class TDigestSpec extends SparkSpec {

  test("tdigest quantiles within 2% of exact per group") {
    val orders = Tables.orders(spark, sf)
    val est = Analytics.tdigestQuantiles(orders).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = orders.groupBy("o_orderpriority")
      .agg(percentile(col("o_totalprice"), lit(0.5)).as("p50"),
           percentile(col("o_totalprice"), lit(0.9)).as("p90"),
           percentile(col("o_totalprice"), lit(0.99)).as("p99")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    exact.foreach { case (k, (p50, p90, p99)) =>
      val (e50, e90, e99) = est(k)
      assert(math.abs(e50 - p50) / p50 <= 0.02, s"$k p50: $e50 vs $p50")
      assert(math.abs(e90 - p90) / p90 <= 0.02, s"$k p90: $e90 vs $p90")
      assert(math.abs(e99 - p99) / p99 <= 0.02, s"$k p99: $e99 vs $p99")
    }
  }

  test("merged partial digests agree with a single digest (map-side combine)") {
    val xs = (1 to 10000).map(i => math.pow(i.toDouble, 1.5))
    val whole = new TDigest(100.0)
    xs.foreach(whole.add)
    // split into 8 'partitions', sketch each, merge — the shuffle path
    val merged = new TDigest(100.0)
    xs.grouped(1250).foreach { part =>
      val d = new TDigest(100.0)
      part.foreach(d.add)
      merged.merge(d)
    }
    // t-digest accuracy is a guarantee in RANK space, not value space —
    // compare the rank each estimate lands at against the requested q
    val sorted = xs.sorted
    def rankOf(v: Double): Double =
      sorted.count(_ <= v).toDouble / sorted.length
    Seq(0.01, 0.25, 0.5, 0.9, 0.99).foreach { q =>
      Seq(whole, merged).foreach { d =>
        val r = rankOf(d.quantile(q))
        assert(math.abs(r - q) <= 0.01,
          s"q=$q landed at rank $r (${d.quantile(q)})")
      }
    }
  }

  test("serialize/deserialize roundtrip preserves quantiles exactly") {
    val d = new TDigest(100.0)
    (1 to 5000).foreach(i => d.add(i.toDouble * 3.7))
    val back = TDigest.deserialize(d.serialized)
    Seq(0.0, 0.1, 0.5, 0.95, 1.0).foreach { q =>
      assert(d.quantile(q) == back.quantile(q), s"q=$q drifted in serde")
    }
  }

  test("tdigest handles empty, single-value, and constant groups") {
    val empty = new TDigest(100.0)
    assert(empty.quantile(0.5).isNaN)
    val one = new TDigest(100.0)
    one.add(42.0)
    assert(one.quantile(0.0) == 42.0 && one.quantile(1.0) == 42.0)
    val const = new TDigest(100.0)
    (1 to 1000).foreach(_ => const.add(7.0))
    assert(const.quantile(0.5) == 7.0)
  }

  test("tdigest aggregate plans with partial aggregation") {
    val orders = Tables.orders(spark, sf)
    val plan = orders.groupBy("o_orderpriority")
      .agg(TDigestAgg.tdigestQuantiles(col("o_totalprice"), Seq(0.5)).as("q"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"))
    assert(plan.toLowerCase.contains("partial_graft_tdigest") ||
      plan.contains("partial"), s"no partial agg in:\n$plan")
  }
}
