package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fused row-level CHECK enforcement: the named SQL predicates are woven
  * into the frame as a first-column guard — any row where a predicate is
  * FALSE (NULL passes, SQL CHECK semantics) throws from inside whatever
  * job first computes the frame, naming every violated predicate. This is
  * the Delta `CheckDeltaInvariant` shape: enforcement costs zero extra
  * passes and zero extra shuffles, and when the consumer is a write, a
  * violation aborts before anything becomes visible. Shared by
  * [[graft.sources.TxLogFormat]] table constraints and
  * [[graft.pipeline.Model]] contracts. */
object RowGuard {

  /** `checks` = (name, SQL predicate); `context` lands in the error text. */
  def apply(df: DataFrame, checks: Seq[(String, String)],
            context: String): DataFrame =
    if (checks.isEmpty) df
    else {
      val violated = concat_ws(", ", checks.map { case (n, e) =>
        when(not(coalesce(expr(e).cast("boolean"), lit(true))), lit(n)) }: _*)
      val f0 = df.schema.fields.head
      df.withColumn(f0.name,
        when(length(violated) > 0,
          raise_error(concat(
            lit("CHECK constraint violated: ["), violated,
            lit(s"] $context"))).cast(f0.dataType))
          .otherwise(col(f0.name)))
    }
}
