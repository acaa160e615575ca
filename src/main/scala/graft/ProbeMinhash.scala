package graft

// Temporary diagnostic for the dedup_minhash cost breakdown (r5 judge item 1d).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.util.TextNorm
import graft.functions.VectorFunctions.jaccard

object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val documents = Tables.documents(spark, sfDir)
    documents.count()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
      r
    }
    val words = TextNorm.distinctWords(col("text"))
    val numHashes = 64; val bands = 8; val r = 8
    val toks = documents.select(col("doc_id"), explode(words).as("t"))
    val sigs = toks.groupBy("doc_id")
      .agg(graft.functions.MinHashAgg.minhash(col("t"), numHashes).as("sig"))
    time("sigs.count")(sigs.count())
    val banded = sigs.select(col("doc_id"),
      posexplode(array((0 until bands).map(bi =>
        xxhash64((bi * r until (bi + 1) * r).map(j => col("sig")(j)): _*)): _*))
        .as(Seq("band_idx", "band_hash")))
    val rawCand = banded.as("x").join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    time("raw band collisions")(rawCand.count())
    val cand = rawCand.dropDuplicates("doc_a", "doc_b")
    time("deduped candidates")(cand.count())
    val docsW = documents.select(col("doc_id"), words.as("w"))
    val verified = cand
      .join(docsW.select(col("doc_id").as("doc_a"), col("w").as("wa")), "doc_a")
      .join(docsW.select(col("doc_id").as("doc_b"), col("w").as("wb")), "doc_b")
      .withColumn("jaccard", jaccard(col("wa"), col("wb")))
      .filter(col("jaccard") >= 0.8)
    println("PROBE parallelismFirst default = " + spark.conf.get("spark.sql.adaptive.coalescePartitions.parallelismFirst"))
    println("PROBE advisory default = " + spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
    time("verified parallelismFirst")(verified.count())
    spark.conf.unset("spark.sql.adaptive.coalescePartitions.parallelismFirst")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
    time("full noop parallelismFirst")(
      graft.operators.Dedup.minhashLsh(documents)
        .write.mode("overwrite").format("noop").save())
    time("full noop pf again")(
      graft.operators.Dedup.minhashLsh(documents)
        .write.mode("overwrite").format("noop").save())
    val avgWords = documents.select(avg(size(words))).head.getDouble(0)
    println(f"PROBE avg distinct words/doc  $avgWords%8.1f")
    spark.stop()
  }
}
