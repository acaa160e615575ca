package graft
import org.apache.spark.sql.SparkSession
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    val keys = Seq("q1_agg", "q3_topk", "q5_multijoin", "sessionize", "dedup_exact", "ann_cosine")
    keys.foreach { k =>
      println(s"\n=============== $k ===============")
      SparkEntry.queries(k)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
