package graft

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{Materialize, Multimodal, Relational}

class MultimodalSpec extends SparkSpec {

  test("multimodal features: deterministic, schema-typed, byte-accurate") {
    val docs = Tables.documents(spark, sf)
    val feats = Multimodal.extractFeatures(docs)
    assert(feats.columns.toSeq == Seq("doc_id", "modality", "source",
      "byte_len", "header_hex", "width", "height", "feat"))
    val joined = feats.join(docs, "doc_id")
      .select(col("byte_len"), length(col("text")).as("text_len"),
              col("header_hex"), col("text"), col("feat"))
    joined.collect().foreach { r =>
      assert(r.getInt(0) == r.getInt(1), "byte_len != text length (ascii corpus)")
      val expectHeader = r.getString(3).getBytes(StandardCharsets.UTF_8).take(4)
        .map(b => f"${b & 0xff}%02x").mkString
      assert(r.getString(2) == expectHeader)
      val feat = r.getSeq[Float](4)
      assert(feat.length == 8 && math.abs(feat.sum - 1.0f) < 1e-3,
        "feature histogram should be L1-normalized")
    }
    // determinism: two runs produce identical frames
    assert(rows(feats) == rows(Multimodal.extractFeatures(docs)))
  }

  test("materialize: partition_by layout + cluster_by sort + dynamic overwrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mat").toString
    val fct = Relational.fctBucket(Tables.orders(spark, sf), 200000.0)
    Materialize.table(fct, dir, "bucket", Seq("id"))
    val files = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("bucket="))
    assert(files.toSet == Set("bucket=high", "bucket=regular"))
    val back = spark.read.parquet(dir)
    assert(back.count() == fct.count())
    // partition pruning: reading one bucket scans one directory — assert
    // the filter lands in PartitionFilters, not a post-scan Filter
    val pruned = back.filter(col("bucket") === "high")
    assert(pruned.count() == fct.filter(col("bucket") === "high").count())
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(bucket"),
      s"bucket filter not pushed to partition pruning:\n$scan")
    // dynamic partition overwrite rewrites only the touched partition
    val highOnly = fct.filter(col("bucket") === "high")
      .withColumn("value", col("value") * 2)
    Materialize.incremental(highOnly, dir, "bucket", dynamicOverwrite = true)
    val after = spark.read.parquet(dir)
    assert(after.filter(col("bucket") === "regular").count() ==
      fct.filter(col("bucket") === "regular").count(), "untouched partition changed")
    assert(after.filter(col("bucket") === "high").count() == highOnly.count())
  }

  test("compact: many small files fold to the per-partition budget, rows untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cmp").toString
    val fct = Relational.fctBucket(Tables.orders(spark, sf), 200000.0)
    // simulate micro-batch droppings: 8 files per partition
    fct.repartition(8).write.mode("overwrite").partitionBy("bucket").parquet(dir)
    def filesPer(b: String) = new java.io.File(s"$dir/bucket=$b")
      .listFiles().count(f => f.getName.endsWith(".parquet"))
    assert(filesPer("high") > 1 && filesPer("regular") > 1)
    val before = rows(spark.read.parquet(dir)
      .select("id", "value", "bucket").orderBy("id"))
    // huge target → budget 1 file per partition
    val budget = Materialize.compact(spark, dir, "bucket", targetBytes = 1L << 30)
    assert(budget.values.forall(_ == 1), s"budget: $budget")
    assert(filesPer("high") == 1 && filesPer("regular") == 1,
      s"high=${filesPer("high")} regular=${filesPer("regular")}")
    val after = rows(spark.read.parquet(dir)
      .select("id", "value", "bucket").orderBy("id"))
    assert(after == before, "compaction changed row content")
  }

  test("materialize: ORC round-trip preserves rows, partitions, and pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val fct = Relational.fctBucket(Tables.orders(spark, sf), 200000.0)
    Materialize.table(fct, dir, "bucket", Seq("id"), format = "orc")
    val back = spark.read.orc(dir)
    assert(back.count() == fct.count())
    assert(rows(back.select("id", "value", "bucket").orderBy("id")) ==
           rows(fct.select("id", "value", "bucket").orderBy("id")))
    val scan = back.filter(col("bucket") === "high")
      .queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(bucket"),
      s"ORC partition pruning missing:\n$scan")
  }
}
