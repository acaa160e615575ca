package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fused row-level CHECK enforcement: the named SQL predicates are woven
  * into the frame as a FILTER whose predicate raises on a violating row
  * (NULL passes, SQL CHECK semantics) — any row where a predicate is
  * FALSE throws from inside whatever job first computes the frame, naming
  * every violated predicate. This is the Delta `CheckDeltaInvariant`
  * shape: enforcement costs zero extra passes and zero extra shuffles,
  * and when the consumer is a write, a violation aborts before anything
  * becomes visible. Shared by [[graft.sources.TxLogFormat]] table
  * constraints and [[graft.pipeline.Model]] contracts.
  *
  * Why a Filter and not a column rewrite: an earlier version guarded only
  * the frame's first column as a Project alias, and Catalyst COLUMN
  * PRUNING removes unreferenced aliases — a consumer that never read
  * column 0 (a `count(lit(1))` over a contracted view, a select of other
  * columns) silently dropped enforcement. A Filter's predicate is
  * evaluated for every row no matter which columns the consumer reads;
  * the optimizer may push it around, but can never prune it
  * (spec: PipelineSpec "view contract survives a pruning consumer"). */
object RowGuard {

  /** `checks` = (name, SQL predicate); `context` lands in the error text. */
  def apply(df: DataFrame, checks: Seq[(String, String)],
            context: String): DataFrame =
    if (checks.isEmpty) df
    else {
      val violated = concat_ws(", ", checks.map { case (n, e) =>
        when(not(coalesce(expr(e).cast("boolean"), lit(true))), lit(n)) }: _*)
      // when/otherwise guarantees raise_error evaluates ONLY on a
      // violating row; every clean row passes the filter with `true`
      df.filter(
        when(length(violated) > 0,
          raise_error(concat(
            lit("CHECK constraint violated: ["), violated,
            lit(s"] $context"))).cast("boolean"))
          .otherwise(lit(true)))
    }
}
