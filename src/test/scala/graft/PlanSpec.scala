package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators._

/** Physical-plan assertions: pushdown, pruning, broadcast — the properties
  * that make these plans survive a 100× scale-up. */
class PlanSpec extends SparkSpec {

  private def explained(df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }

  test("q1 scan pushes the shipdate filter and prunes columns") {
    val plan = Analytics.pricingSummary(Tables.lineitem(spark, sf))
      .queryExecution.sparkPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"no pushed filter in:\n$plan")
    // projection should not include unused columns like l_partkey/l_comment
    assert(!plan.contains("l_partkey"), "scan reads unused column l_partkey")
  }

  test("q5 star join broadcasts every dimension") {
    val df = Analytics.revenueByNation(
      Tables.region(spark, sf), Tables.nation(spark, sf), Tables.customer(spark, sf),
      Tables.supplier(spark, sf), Tables.orders(spark, sf), Tables.lineitem(spark, sf))
    val plan = explained(df)
    val broadcasts = "BroadcastHashJoin|BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "unexpected shuffle join in star query")
  }

  test("text analysis plans are shuffle-free (scan-bound)") {
    Seq(
      TextAnalysis.qualityScore(Tables.documents(spark, sf)),
      TextAnalysis.tokenCount(Tables.documents(spark, sf)),
      TextAnalysis.fingerprint(Tables.documents(spark, sf)),
    ).foreach { df =>
      // drop the final presentation sort; the computation itself must not shuffle
      val plan = df.queryExecution.optimizedPlan.toString
      val exchanges = "Exchange|Repartition".r.findAllIn(
        df.drop("doc_id").queryExecution.executedPlan.toString
          .replaceAll("(?s)Sort .*", "")).size
      assert(plan.nonEmpty && exchanges <= 1, s"text op shuffles more than the output sort")
    }
  }

  test("semantic dedup never plans a nested-loop or cartesian join") {
    Seq(
      Similarity.semanticDedup(Tables.embeddings(spark, sf)),
      Similarity.semanticDedupApprox(Tables.embeddings(spark, sf)),
    ).foreach { df =>
      val plan = explained(df)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
             !plan.contains("CartesianProduct"),
        s"O(n²) join shape in:\n$plan")
    }
  }

  test("pricing summary uses partial aggregation (map-side combine)") {
    val plan = explained(Analytics.pricingSummary(Tables.lineitem(spark, sf)))
    assert(plan.contains("partial"), s"no partial aggregate in:\n$plan")
  }
}
