package graft

import org.apache.spark.sql.SparkSession

/** Benchmark entrypoint. Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"errors":{...},
  *  "iters":k,"sf":dir}
  *
  * Hardening contract (VERDICT r4 item 1):
  *  - a crashing query is NEVER recorded as a fast success — its error is
  *    captured in the `errors` map and its timing is the failing attempt's;
  *  - every table is warmed before timing so the first query measured does
  *    not absorb parquet footer reads / codegen warm-up;
  *  - each query runs SPARK_GRAFT_ITERS times (default 2) and reports the
  *    MIN, so one GC pause or AQE re-plan does not masquerade as a
  *    regression.
  *
  * Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_ITERS,
  * SPARK_GRAFT_QUERIES (comma-separated subset filter),
  * SPARK_GRAFT_EXPLAIN=1 (dump explain("formatted") per query to stderr),
  * SPARK_GRAFT_BENCH_OUT (file copy of the JSON line).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to every core: the driver contract is local[32] on a 32-cpu
    // box; a fixed "4" silently benched on 1/8th of the machine
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "2").toInt.max(1)
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // events.parquet carries INT64 TIMESTAMP(NANOS); without this the
      // warm-up read of it throws (caught) and the table never warms
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm EVERY table (parquet footers, filesystem cache) + codegen paths,
    // so the first timed query pays only for itself.
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () } // warm-up only; absence is fine
    }
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.forall(_.contains(n))
    }
    val errors = scala.collection.mutable.Map[String, String]()
    val results = selected.map { case (name, fn) =>
      if (explain) {
        try System.err.println(s"=== $name ===\n" +
          fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => System.err.println(s"=== $name === explain failed: $e") }
      }
      val times = (1 to iters).flatMap { _ =>
        val t0 = System.nanoTime()
        // Materialize through the noop sink so map-only queries pay for
        // their full projection — under count() Catalyst prunes the
        // projection and the timing measures little more than the scan.
        try {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("[\"\\\\\n\r\t]", " ").take(300)
            None
        }
      }
      name -> (if (times.nonEmpty) times.min else -1.0)
    }
    def jsonMap(m: Iterable[(String, String)]): String =
      m.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    val errs = jsonMap(errors.toSeq.sortBy(_._1).map { case (k, v) => k -> ("\"" + v + "\"") })
    val total = results.values.filter(_ >= 0).sum
    // The driver parses the JSON line out of the LAST 2000 chars of stdout,
    // and sbt appends a ~80-char "[success] ..." line after us. Full-precision
    // doubles pushed the line to 2185 chars in r4/r5 → the driver recorded
    // parsed:null both rounds. Emit at the coarsest precision that still
    // means something (ms) and degrade further if the query set grows.
    def render(decimals: Int): String = {
      val qs = jsonMap(results.map { case (k, v) =>
        k -> s"%.${decimals}f".formatLocal(java.util.Locale.ROOT, v)
      })
      val tot = s"%.${decimals}f".formatLocal(java.util.Locale.ROOT, total)
      val sfName = java.nio.file.Paths.get(sfDir).getFileName.toString
      s"""{"metric":"total","value":$tot,"unit":"sec","queries":$qs,"errors":$errs,"iters":$iters,"sf":"$sfName"}"""
    }
    val line = (3 to 1 by -1).map(render).find(_.length <= 1850).getOrElse(render(1))
    println(line)
    // Belt-and-braces: also persist the line to a file so a stdout-parsing
    // driver that misses it (log interleaving) still has the numbers.
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
