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

  test("real image decode: actual PNG/BMP pixels yield true dimensions " +
       "and luminance histograms; corrupt bytes fall back to the stub") {
    import spark.implicits._
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def bmp(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", bos)
      bos.toByteArray
    }
    val white = png(40, 30, 0xffffff) // luminance 255 → bin 7
    val black = bmp(17, 23, 0x000000) // luminance 0 → bin 0
    val corrupt = white.take(20) // PNG magic but truncated body
    val media = Seq(
      graft.operators.MediaRow(1L, "image", white, "t"),
      graft.operators.MediaRow(2L, "image", black, "t"),
      graft.operators.MediaRow(3L, "image", corrupt, "t"),
      graft.operators.MediaRow(4L, "audio", Array[Byte](1, 2, 3, 4, 5), "t"))
    val out = Multimodal.extractFeaturesBinary(media.toDF())
      .collect().map(r => r.getLong(0) -> r).toMap
    // real decode: true pixel dimensions, not the stub's byte arithmetic
    assert(out(1L).getInt(5) == 40 && out(1L).getInt(6) == 30, out(1L).toString)
    assert(out(1L).getString(4) == "89504e47") // PNG magic in header_hex
    assert(out(2L).getInt(5) == 17 && out(2L).getInt(6) == 23, out(2L).toString)
    // solid colors land their full mass in one luminance bin
    assert(math.abs(out(1L).getSeq[Float](7)(7) - 1.0f) < 1e-4)
    assert(math.abs(out(2L).getSeq[Float](7)(0) - 1.0f) < 1e-4)
    // corrupt image + non-image modality: deterministic stub, same shape
    Seq(3L, 4L).foreach { id =>
      val feat = out(id).getSeq[Float](7)
      assert(feat.length == 8 && math.abs(feat.sum - 1.0f) < 1e-3)
    }
    assert(out(3L).getInt(5) == 64 + corrupt.length % 512) // stub width
    // adversarial header: a valid BMP patched to DECLARE 60000x60000
    // (3.6 GP) must refuse at the header probe — never allocating the
    // pixels — and fall to the stub instead of OOMing the task
    val bomb = bmp(4, 4, 0xffffff).clone()
    def putLE(off: Int, v: Int): Unit = (0 until 4).foreach(i =>
      bomb(off + i) = ((v >> (8 * i)) & 0xff).toByte)
    putLE(18, 60000); putLE(22, 60000)
    val bombed = Multimodal.extractFeaturesBinary(
      Seq(graft.operators.MediaRow(9L, "image", bomb, "t")).toDF())
      .collect()(0)
    assert(bombed.getInt(5) == 64 + bomb.length % 512, // stub dims, not 60000
      bombed.toString)
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
