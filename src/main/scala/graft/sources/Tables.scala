package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed loaders for the driver-generated test tables.
  *
  * Every loader selects through `spark.read.parquet` so Catalyst can prune
  * columns and push filters down to the scan. Operators never read files
  * themselves — they take DataFrames — so at 100 TB the same operators run
  * against bucketed/partitioned production tables unchanged.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.parquet` stores `ts` as INT64 TIMESTAMP(NANOS), which Spark's
    * parquet reader does not map to TimestampType. We read it as a raw long
    * (legacy nanosAsLong) and derive both a microsecond timestamp and an
    * epoch-seconds column with *integer* arithmetic — never double division,
    * which would lose precision above 2^53 (epoch-nanos ≈ 1.7e18).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    val withTs =
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw
          .withColumn("ts_s", expr("ts div 1000000000"))
          .withColumn("ts", timestamp_seconds(expr("ts div 1000000000")))
      else
        raw
          .withColumn("ts", date_trunc("second", col("ts")))
          .withColumn("ts_s", unix_timestamp(col("ts")))
    withTs
  }
}
