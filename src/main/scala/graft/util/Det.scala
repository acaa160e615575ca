package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** Determinism helpers: make float-bearing aggregates bit-identical across
  * engines (Spark partial-agg order vs DuckDB's) by doing all accumulation in
  * integer cents. Source prices are exact 2-decimal values, so
  * `round(x*100)` is an exact integer and long-sums are associative/exact.
  * This also matters at 100 TB: results stop depending on partitioning.
  */
object Det {
  /** Exact sum of a 2-decimal money column, returned as double. */
  def centsSum(c: Column): Column =
    sum(round(c * 100, 0).cast("long")) / 100.0

  /** Exact windowed running money sum. */
  def centsSumOver(c: Column, w: WindowSpec): Column =
    sum(round(c * 100, 0).cast("long")).over(w) / 100.0

  /** Exact average of a 2-decimal money column (exact sum / exact count). */
  def centsAvg(c: Column): Column =
    sum(round(c * 100, 0).cast("long")) / 100.0 / count(lit(1))

  /** Exact sum of an integral-valued double column (e.g. quantities). */
  def intSum(c: Column): Column = sum(c.cast("long"))

  /** Cross-engine-safe per-row rounding. `round(x, d)` for d>0 differs
    * between engines at half-boundaries of the *decimal repr* (Spark) vs the
    * *binary value* (DuckDB's round(x*10^d)/10^d); rounding at integer scale
    * agrees everywhere because a double's shortest repr reads "n.5" only
    * when the value is exactly n.5. */
  def round2(c: Column): Column = round(c * 100, 0) / 100.0
  def round4(c: Column): Column = round(c * 10000, 0) / 10000.0
}
