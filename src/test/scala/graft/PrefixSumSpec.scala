package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.PrefixSum

/** The distributed two-phase prefix sum must be BIT-IDENTICAL to the
  * single-window running sum it replaces, for every block size (block
  * size 1 = every row its own block — maximum offset traffic; a huge
  * block = the degenerate single-block case that reduces to the old
  * shape), in both inclusive and exclusive frames, for signed order
  * keys, and under any input partitioning. */
class PrefixSumSpec extends SparkSpec {

  private def docsFrame = {
    val est = graft.util.TextNorm.estTokens(col("text"))
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), est.as("v"))
  }

  private def oracle(inclusive: Boolean) = {
    val hi = if (inclusive) Window.currentRow else -1L
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, hi)
    docsFrame
      .withColumn("cum", coalesce(sum(col("v")).over(w), lit(0L)))
      .orderBy("lang", "doc_id")
  }

  test("blocked cumsum == single-window cumsum for every block size") {
    for (inclusive <- Seq(true, false); bs <- Seq(1L, 2L, 7L, 64L, 1L << 20)) {
      val got = PrefixSum.cumSum(docsFrame, Seq("lang"), "doc_id", "v", "cum",
          inclusive = inclusive, blockSize = bs)
        .orderBy("lang", "doc_id")
      assert(rows(got) == rows(oracle(inclusive)),
        s"mismatch at blockSize=$bs inclusive=$inclusive")
    }
  }

  test("signed order keys: blocks around zero stay order-contiguous") {
    import spark.implicits._
    // doc_id −10..10 with blockSize 4: naive `div` truncation would glue
    // −3..−1 and 0..3 into one block (trunc ≠ floor for negatives); the
    // pmod form floors exactly, so the running sum must still match
    val df = (-10L to 10L).map(i => (i, "x", i * i + 1)).toDF("doc_id", "lang", "v")
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = rows(df.withColumn("cum", sum(col("v")).over(w)).orderBy("doc_id"))
    for (bs <- Seq(1L, 3L, 4L, 7L)) {
      val got = PrefixSum.cumSum(df, Seq("lang"), "doc_id", "v", "cum",
        blockSize = bs).orderBy("doc_id")
      assert(rows(got) == want, s"signed-key mismatch at blockSize=$bs")
    }
  }

  test("sparse order keys: denseOrderKeys=false is bit-identical and " +
       "drops the broadcast hint (AQE sizes the offsets join)") {
    import spark.implicits._
    // snowflake-style ids scattered over the long range: at the default
    // block size ~every row is its own block, so the offsets frame is
    // data-scale — the regime where a forced broadcast OOMs the driver
    // at exactly the scale the helper exists for. The guarded form must
    // stay bit-identical (the join key and arithmetic are unchanged) and
    // must NOT carry the broadcast hint, so AQE picks the strategy from
    // the offsets frame's measured size.
    val df = (0L until 200L)
      .map(i => (i * 2654435761L + 12345L, if (i % 2 == 0) "x" else "y", i % 7 + 1))
      .toDF("doc_id", "lang", "v")
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = rows(df.withColumn("cum", sum(col("v")).over(w))
      .orderBy("lang", "doc_id"))
    def hasBroadcastHint(d: org.apache.spark.sql.DataFrame): Boolean =
      d.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j.hint
      }.exists(h => h.leftHint.exists(_.strategy.nonEmpty) ||
                    h.rightHint.exists(_.strategy.nonEmpty))
    val sparse = PrefixSum.cumSum(df, Seq("lang"), "doc_id", "v", "cum",
      denseOrderKeys = false)
    assert(rows(sparse.orderBy("lang", "doc_id")) == want,
      "sparse-key (shuffle-join) branch diverged from the single-window form")
    assert(!hasBroadcastHint(sparse),
      "denseOrderKeys=false still forces a broadcast of the offsets frame")
    val dense = PrefixSum.cumSum(df, Seq("lang"), "doc_id", "v", "cum")
    assert(hasBroadcastHint(dense),
      "the dense-key default lost its offsets broadcast hint")
  }

  test("result is invariant to the input partitioning") {
    val want = rows(PrefixSum.cumSum(docsFrame, Seq("lang"), "doc_id", "v",
      "cum", blockSize = 16).orderBy("lang", "doc_id"))
    for (n <- Seq(1, 3, 12)) {
      val got = PrefixSum.cumSum(docsFrame.repartition(n), Seq("lang"),
        "doc_id", "v", "cum", blockSize = 16).orderBy("lang", "doc_id")
      assert(rows(got) == want, s"partitioning $n changed the prefix sum")
    }
  }
}
