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

  test("star: excepts case-insensitively, applies prefix/suffix, prunes scan") {
    val orders = Tables.orders(spark, sf)
    val cols = DbtUtils.star(orders,
      except = Seq("O_COMMENT", "o_orderstatus"), prefix = "src_")
    val out = orders.select(cols: _*)
    assert(!out.columns.contains("src_o_orderstatus"))
    assert(out.columns.forall(_.startsWith("src_")))
    assert(!out.queryExecution.sparkPlan.toString.contains("o_orderstatus"),
      "excepted column still read from the scan")
  }

  test("unpivot: melts value columns to typed string rows, ids preserved") {
    val df = Seq((1L, "O", 10.5), (2L, "F", 20.0)).toDF("id", "status", "price")
    val got = DbtUtils.unpivot(df, Seq("id"), Seq("status", "price"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1L, "status", "O"), (1L, "price", "10.5"),
      (2L, "status", "F"), (2L, "price", "20.0")))
  }

  test("union_relations: first-seen column order, null fill, provenance tag") {
    val a = Seq((1L, "x")).toDF("id", "a_only")
    val b = Seq((2L, 5.0)).toDF("id", "b_only")
    val u = DbtUtils.unionRelations(Seq("rel_a" -> a, "rel_b" -> b))
    assert(u.columns.toSeq ==
      Seq("id", "a_only", "b_only", "_dbt_source_relation"))
    val rows = u.collect().map(_.toSeq).toSet
    assert(rows == Set(Seq(1L, "x", null, "rel_a"), Seq(2L, null, 5.0, "rel_b")))
  }

  test("microbatch: delta periods replaced wholesale, others untouched") {
    import graft.operators.Incremental
    val base = Seq((1L, "2024-01-05", 10.0), (2L, "2024-02-10", 20.0),
      (3L, "2024-02-20", 30.0)).toDF("id", "d", "v")
    val delta = Seq((3L, "2024-02-20", 31.0)).toDF("id", "d", "v")
    val got = Incremental.microbatch(base, delta, "d").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSet
    // Feb is replaced: id=2 disappears (delta did not re-emit it), id=3
    // takes the delta value; January is untouched
    assert(got == Set((1L, 10.0), (3L, 31.0)), s"got $got")
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
