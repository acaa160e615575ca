package graft.operators

import org.apache.spark.sql.DataFrame

/** Physical materialization — the Spark re-expression of the reference's
  * `partition_by` / `cluster_by` table config (fct_example.sql:2-4) and of
  * dbt materializations.
  *
  * BigQuery `partition_by` → parquet `partitionBy` directory layout (gives
  * partition pruning on the partition column); `cluster_by` →
  * `sortWithinPartitions` (gives min/max row-group pruning + locality).
  * `incremental` append → `mode("append")` on the same layout; full-refresh
  * `table` → `overwrite`; partition-scoped rebuilds use Spark's dynamic
  * partition overwrite so only touched partitions rewrite — the 100 TB-safe
  * version of incremental merge.
  */
object Materialize {

  /** `materialized='table'` with partition/cluster layout. `format` is any
    * Spark-native columnar source — parquet (default) or ORC both give
    * partition pruning on the directory layout plus min/max row-group /
    * stripe pruning from the within-partition sort. */
  def table(df: DataFrame, path: String, partitionCol: String,
            clusterCols: Seq[String] = Nil,
            format: String = "parquet"): Unit = {
    val partitioned = df.repartition(df.col(partitionCol))
    val clustered =
      if (clusterCols.nonEmpty)
        partitioned.sortWithinPartitions(clusterCols.head, clusterCols.tail: _*)
      else partitioned
    clustered.write.mode("overwrite")
      .partitionBy(partitionCol)
      .format(format).save(path)
  }

  /** `materialized='incremental'`: append new rows into the same layout;
    * with `dynamicOverwrite` only the partitions present in `df` rewrite. */
  def incremental(df: DataFrame, path: String, partitionCol: String,
                  dynamicOverwrite: Boolean = false): Unit =
    if (dynamicOverwrite)
      // per-write option — never mutates the session-wide overwrite mode
      df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partitionCol).parquet(path)
    else
      df.write.mode("append").partitionBy(partitionCol).parquet(path)
}
