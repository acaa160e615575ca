package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators._

class OperatorsSpec extends SparkSpec {

  test("every SparkEntry query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("stg_orders preserves row count and renames") {
    val orders = Tables.orders(spark, sf)
    val stg = Relational.stgOrders(orders)
    assert(stg.count() == orders.count())
    assert(stg.columns.toSeq == Seq("order_key", "customer_key", "order_status",
      "total_price", "order_date", "order_priority"))
  }

  test("incremental merge: delta rows win, key set unchanged") {
    val merged = Incremental.mergeLatest(Tables.orders(spark, sf))
    val orders = Tables.orders(spark, sf)
    assert(merged.count() == orders.count())
    val updated = merged.filter(col("o_orderstatus") === "U").count()
    val expected = orders.filter(col("o_orderkey") % 10 === 0).count()
    assert(updated == expected)
  }

  test("snapshot scd2: exactly one current version per key") {
    val snap = Snapshot.scd2(Tables.orders(spark, sf))
    val current = snap.filter(col("is_current")).groupBy("o_custkey").count()
    assert(current.filter(col("count") =!= 1).count() == 0)
    // valid_to of version n == valid_from of version n+1 chain is closed
    assert(snap.filter(col("valid_to").isNull).count() == current.count())
  }

  test("test_suite reports zero violations on clean data") {
    val suite = Checks.testSuite(Tables.orders(spark, sf), Tables.customer(spark, sf))
    assert(suite.agg(sum("violations")).head.getLong(0) == 0)
  }

  test("stratified sample: deterministic with seed, rates within bounds") {
    val docs = Tables.documents(spark, sf)
    val fr = Map("en" -> 0.5, "de" -> 0.5, "es" -> 0.5, "fr" -> 0.5, "zh" -> 0.5)
    val s1 = Curation.stratifiedSample(docs, fr).collect().map(_.toSeq)
    val s2 = Curation.stratifiedSample(docs, fr).collect().map(_.toSeq)
    assert(s1.toSeq == s2.toSeq, "sample not deterministic for fixed seed")
    val rates = Curation.stratifiedSample(docs, fr)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (l, n) =>
      val got = rates.getOrElse(l, 0L).toDouble / n
      assert(got > 0.25 && got < 0.75, s"$l rate $got far from 0.5")
    }
  }

  test("token budget: cumulative selection never exceeds budget per lang") {
    val sel = Curation.tokenBudget(Tables.documents(spark, sf), 2000)
    assert(sel.count() > 0)
    val over = sel.groupBy("lang").agg(max("cum_tokens").as("m"))
      .filter(col("m") > 2000).count()
    assert(over == 0)
  }

  test("sessionize: gaps within sessions never exceed threshold, totals add up") {
    val events = Tables.events(spark, sf)
    val sess = Sessions.sessionize(events, 1800)
    assert(sess.agg(sum("n_events")).head.getLong(0) == events.count())
    // session_end - session_start bounded by n_events * gap
    val bad = sess.filter(col("session_end") - col("session_start") >
      (col("n_events") - 1) * 1800).count()
    assert(bad == 0)
  }
}
