package graft
import org.apache.spark.sql.SparkSession
object SmokeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (name <- args) {
      val q = SparkEntry.queries(name)(spark, d)
      println(s"=== $name ===")
      q.printSchema()
      q.show(3, 60)
    }
    spark.stop()
  }
}
