package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT prefix sum over a total order — the two-phase
  * replacement for `sum(...).over(Window.partitionBy(part).orderBy(o)
  * .rowsBetween(unboundedPreceding, currentRow))`.
  *
  * The single-window form is correct but SERIAL per partition key: at
  * corpus scale a handful of language partitions each become one giant
  * sorted scan in one task — the classic running-sum scaling trap. This
  * helper keeps the semantics bit-identical (the order is total, long
  * addition is associative) while bounding every task's work:
  *
  *  1. rows bucket into order-CONTIGUOUS blocks of the order key
  *     (`floor(orderCol / blockSize)` in exact integer arithmetic — SQL
  *     `div` truncates toward zero, which would glue the two blocks
  *     around 0 together for signed keys, so the floor is written as
  *     `(o - pmod(o, B)) div B`, exact for any long);
  *  2. ONE data-scale exchange on (part, block) — an explicit
  *     repartition BOTH downstream consumers hang off, so Catalyst
  *     plans it once (ReusedExchange) with two reads: (a) the
  *     within-block running sum (a window whose partition is a block,
  *     never a whole language — each sort is ≤ blockSize keys), and
  *     (b) the per-block totals (a hash aggregate, no sort — the
  *     exchange already clusters its grouping keys);
  *  3. block OFFSETS are an exclusive running sum over the per-block
  *     totals — a frame of #blocks rows (data-size / blockSize: 100k
  *     rows per language per 10^11 docs at the default block size), so
  *     the only remaining serial scan is metadata-scale by construction;
  *  4. offsets broadcast-join back on (part, block) and the final value
  *     is offset + within-block sum — per-row arithmetic.
  *
  * The output frame keeps the input columns (original order) plus
  * `cumCol`. `inclusive = false` gives the EXCLUSIVE prefix sum (the
  * sequence-packing frame `rowsBetween(unboundedPreceding, -1)`),
  * computed as inclusive − value so it rides the same single exchange.
  *
  * Requires `valueCol` non-null (sums would silently skip nulls in the
  * window form but poison the offset join here) and a numeric long-safe
  * value; `orderCol` must be integral and unique within `part` for the
  * order to be total — the same contract the single-window form had.
  *
  * ORDER-KEY DENSITY: the "offsets are metadata-scale" claim is a
  * density claim — #blocks = #distinct floor(orderCol/blockSize) values,
  * which is rows/blockSize only when keys are DENSE (every current
  * caller orders by the dense synthetic doc_id). Sparse keys (hashed /
  * snowflake-style ids spread over the full long range) put ~every row
  * in its own block, making the offsets frame data-scale — a broadcast
  * that OOMs the driver at exactly the scale this helper exists for.
  * Guarded, not just documented: `denseOrderKeys = false` drops the
  * broadcast HINT and lets AQE pick the join strategy from the offsets
  * frame's MEASURED runtime size (its aggregate sits above a shuffle
  * stage AQE can weigh) — small offsets still broadcast, data-scale
  * offsets degrade to a shuffle join instead of a driver OOM, bit-exact
  * either way and zero extra passes. Callers with sparse keys should
  * still prefer pre-ranking to a dense order (`row_number` costs the
  * same sort the window form paid) or a coarser `blockSize`. */
object PrefixSum {
  def cumSum(df: DataFrame, partCols: Seq[String], orderCol: String,
             valueCol: String, cumCol: String,
             inclusive: Boolean = true,
             blockSize: Long = 1L << 20,
             denseOrderKeys: Boolean = true): DataFrame = {
    require(blockSize > 0, "blockSize must be positive")
    val part = partCols.map(col) :+ col("__blk")
    // exact signed floor division (see scaladoc): o - pmod(o, B) is an
    // exact multiple of B, and `div` on an exact multiple IS the floor
    val blk = expr(
      s"($orderCol - pmod($orderCol, ${blockSize}L)) div ${blockSize}L")
    val keyed = df.withColumn("__blk", blk).repartition(part: _*)
    val within = Window.partitionBy(part: _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val a = keyed.withColumn("__within", sum(col(valueCol)).over(within))
    // exchange-free: `keyed`'s partitioning already clusters these keys
    val totals = keyed.groupBy(part: _*).agg(sum(col(valueCol)).as("__bsum"))
    val byBlk = Window.partitionBy(partCols.map(col): _*).orderBy(col("__blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__off", coalesce(sum(col("__bsum")).over(byBlk), lit(0L)))
      .select(part :+ col("__off"): _*)
    val cum =
      if (inclusive) col("__off") + col("__within")
      else col("__off") + col("__within") - col(valueCol)
    val offSide = if (denseOrderKeys) broadcast(offsets) else offsets
    a.join(offSide, partCols :+ "__blk")
      .withColumn(cumCol, cum)
      .select(df.columns.map(col) :+ col(cumCol): _*)
  }
}
