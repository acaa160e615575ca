package graft

import org.apache.spark.sql.functions._
import graft.plans.TopKPerGroup
import graft.sources.Tables
import graft.functions.VectorFunctions.cosine
import graft.util.Det.round4

class TopKPlanSpec extends SparkSpec {

  private def scored = {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id").isin(0L, 1L, 2L))
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))
    emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round4(cosine(col("embedding"), col("q"))).as("cos_sim"))
  }

  test("TopKPerKey matches the window row_number implementation") {
    val viaWindow = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("query_id")
        .orderBy(col("cos_sim").desc, col("vec_id"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
        .drop("rn").collect().map(_.toSeq).toSet
    }
    val viaCustom = TopKPerGroup(scored, Seq("query_id"),
      Seq("cos_sim" -> false, "vec_id" -> true), 10)
      .collect().map(_.toSeq).toSet
    assert(viaCustom == viaWindow)
  }

  test("TopKPerKey plans as the custom exec node with a single exchange") {
    val df = TopKPerGroup(scored, Seq("query_id"),
      Seq("cos_sim" -> false, "vec_id" -> true), 10)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey ["), s"custom node missing in:\n$plan")
  }

  test("TopKPerKey result is invariant to input partitioning") {
    val base = TopKPerGroup(scored, Seq("query_id"),
      Seq("cos_sim" -> false, "vec_id" -> true), 5).collect().map(_.toSeq).toSet
    val repart = TopKPerGroup(scored.repartition(17), Seq("query_id"),
      Seq("cos_sim" -> false, "vec_id" -> true), 5).collect().map(_.toSeq).toSet
    assert(base == repart)
  }
}
