package graft

import org.apache.spark.sql.functions._
import graft.operators.{DbtUtils, Diff}
import graft.sources.Tables

/** dbt_utils staples + the CI diff operators (schema diff, capped data
  * diff) — reference packages.yml:2 (dbt_utils 1.3.0),
  * scripts/pr_schema_diff.sh, macros/compare_dev_prod.sql. */
class DbtUtilsSpec extends SparkSpec {
  import spark.implicits._

  test("surrogate key: null-safe, order-sensitive, stable md5") {
    val df = Seq((Some("a"), Some("b")), (None, Some("a")), (Some("a"), None))
      .toDF("x", "y")
      .select(DbtUtils.surrogateKey(Seq(col("x"), col("y"))).as("k"))
    val keys = df.collect().map(_.getString(0))
    assert(keys.distinct.length == 3, "(NULL,'a') and ('a',NULL) must differ")
    // dbt_utils 1.x semantics: md5 of '-'-joined values with the null sentinel
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(keys(0) == md5("a-b"))
    assert(keys(1) == md5("_dbt_utils_surrogate_key_null_-a"))
  }

  test("date spine: correct length, endpoints, no gaps, distributed Range scan") {
    val spine = DbtUtils.dateSpine(spark, "2024-01-01", "2024-03-01")
    val days = spine.collect().map(_.getDate(0).toLocalDate)
    assert(days.length == 60) // Jan 31 + Feb 29 (2024 is a leap year)
    assert(days.head.toString == "2024-01-01" && days.last.toString == "2024-02-29")
    assert(days.sliding(2).forall(p => p(0).plusDays(1) == p(1)), "gap in spine")
    assert(spine.queryExecution.executedPlan.toString.contains("Range"),
      "spine must come from a distributed Range, not a driver collection")
    intercept[IllegalArgumentException](
      DbtUtils.dateSpine(spark, "2024-01-01", "2024-01-01"))
  }

  test("dbt_utils generic tests report expected violations") {
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
    val got = DbtUtils.utilsTests(orders, customer).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("equal_rowcount_orders_orders") == 0L)
    assert(got("equal_rowcount_orders_customer") ==
      math.abs(orders.count() - customer.count()))
    assert(got("at_least_one_o_totalprice") == 0L)
    assert(got("not_constant_o_totalprice") == 0L)
  }

  test("schema diff reports added/missing/retyped/renullabled columns") {
    // `when` without otherwise makes dev.id nullable; prod's coalesce is not
    val dev = Seq((1L, 1, "x")).toDF("id", "a", "b")
      .select(when(col("id") > 0, col("id")).as("id"),
        col("a").cast("int"), col("b"), lit(1).as("extra"))
    val prod = Seq((1L, 1L, true)).toDF("id", "a", "gone")
      .select(coalesce(col("id"), lit(0L)).as("id"), col("a"), col("gone"))
    val diff = Diff.schemaDiff(dev, prod).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(diff == Set(
      ("added_in_dev", "b"), ("added_in_dev", "extra"),
      ("missing_in_dev", "gone"),
      ("type_changed", "a"),         // int vs bigint
      ("nullability_changed", "id")  // nullable vs not null
    ), s"got $diff")
    // identical schemas diff to empty
    assert(Diff.schemaDiff(dev, dev).count() == 0)
  }

  test("devProdDiff: summary rows carry counts, diff sample capped at limit") {
    val orders = Tables.orders(spark, sf)
    val out = Diff.devProdDiff(orders, limit = 10).collect()
    val summary = out.filter(_.getString(0).startsWith("summary_"))
    assert(summary.map(_.getString(0)).toSet ==
      Set("summary_dev_rows", "summary_prod_rows"))
    summary.foreach(r => assert(r.getLong(1) == orders.count()))
    val diffRows = out.filterNot(_.getString(0).startsWith("summary_"))
    assert(diffRows.length <= 2 * 10 && diffRows.length > 0)
    // capped sample must be the FIRST rows in (diff_type, id) order —
    // deterministic, so the CI diff is stable run-to-run
    val uncapped = Diff.devProdDiff(orders, limit = Int.MaxValue).collect()
      .filterNot(_.getString(0).startsWith("summary_"))
    assert(diffRows.map(_.toSeq).toSeq ==
      uncapped.sortBy(r => (r.getString(0), r.getLong(1))).take(diffRows.length)
        .map(_.toSeq).toSeq)
  }
}
