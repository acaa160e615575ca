package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Sessions
import graft.streaming.StreamOps

/** Streaming twins must agree with their batch counterparts. */
class StreamingSpec extends SparkSpec {

  test("stream tumbling agg (complete mode, AvailableNow) == batch tumbling") {
    val batch = Sessions.tumbling(Tables.events(spark, sf))
      .collect().map(_.toSeq).toSet
    val stream = StreamOps.runTumbling(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(stream == batch)
  }

  test("stream sessionize emits exactly the closed sessions of the batch result") {
    val batch = Sessions.sessionize(Tables.events(spark, sf))
    // the stream keeps each user's last (open) session in state
    val lastSeq = batch.groupBy("user_id").agg(max("sess_seq").as("last"))
    val closed = batch.join(lastSeq, Seq("user_id"))
      .filter(col("sess_seq") =!= col("last"))
      .drop("last").collect().map(_.toSeq).toSet
    val stream = StreamOps.runSessionize(spark, sf).collect().map(_.toSeq).toSet
    assert(stream == closed)
  }
}
