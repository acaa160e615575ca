package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Throwaway probe: dedup_clusters_minhash phases + chain-graph CC timing.
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val meter = new graft.util.BenchHarness.CpuMeter(spark.sparkContext)
    def phase[T](name: String)(f: => T): T = {
      val c0 = meter.snapshot(); val t0 = System.nanoTime()
      val r = f
      println(f"$name: wall ${(System.nanoTime() - t0) / 1e9}%.2f cpu ${(meter.snapshot() - c0) / 1e9}%.2f")
      r
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
    val pairs = graft.operators.Dedup.minhashLsh(docs).localCheckpoint()
    pairs.count()
    for (i <- 1 to 3) {
      val cc = phase(s"cc minhash $i") {
        val c = graft.operators.Dedup.connectedComponents(pairs)
        println("  n_labels=" + c.count()); c
      }
      // correctness spot check: labels equal per-component minimum (from
      // a tiny reference union-find over collected pairs)
      if (i == 1) {
        val got = cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val par = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = { var r = x; while (par.getOrElse(r, r) != r) r = par(r); r }
        pairs.select("doc_a", "doc_b").collect().foreach { r =>
          val (a, b) = (find(r.getLong(0)), find(r.getLong(1)))
          if (a != b) par(math.max(a, b)) = math.min(a, b)
        }
        val nodes = got.keySet
        val want = nodes.map(n => n -> find(n)).toMap
        // component-min labels: find() with min-union IS the min root
        val bad = nodes.count(n => got(n) != want(n))
        println(s"  label mismatches vs union-find: $bad")
      }
    }
    val edges = spark.range(2600000).select(
      (col("id") / 2).cast("long").as("doc_a"),
      ((col("id") / 2) + (col("id") % 2) + 1).cast("long").as("doc_b"))
      .localCheckpoint()
    for (i <- 1 to 2) phase(s"cc chain $i") {
      println("  n=" + graft.operators.Dedup.connectedComponents(edges).count())
    }
    spark.stop()
  }
}
