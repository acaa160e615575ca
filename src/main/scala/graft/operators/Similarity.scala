package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Det.round4

/** Similarity search over an embedding column (Array[Float]).
  *
  * Exact paths use `aggregate`/`zip_with` (codegen'd, left-to-right fold →
  * deterministic sums). Scale path is LSH bucketing: random-hyperplane sign
  * bits shrink the candidate set so the n×n cosine becomes a per-bucket
  * join. Ordering/thresholding always happens on values rounded to 4dp with
  * id tiebreaks, so float dust can't flip results across partitionings.
  */
object Similarity {

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v))

  /** cosine(e, q) for every vector vs one query vector (vec_id = qId),
    * thresholded on the rounded value. The 1-row query side is broadcast —
    * no shuffle at all; the scan streams once. */
  def cosineToQuery(embeddings: DataFrame, qId: Long = 0L,
                    minCos: Double = 0.2): DataFrame = {
    val q = embeddings.filter(col("vec_id") === qId)
      .select(col("embedding").as("q"))
    embeddings
      .join(broadcast(q))
      .filter(col("vec_id") =!= qId)
      .select(col("vec_id"), col("label"),
        round4(dot(col("embedding"), col("q")) /
          (norm(col("embedding")) * norm(col("q")))).as("cos_sim"))
      .filter(col("cos_sim") >= minCos)
      .orderBy("vec_id")
  }

  /** Exact top-K neighbors for a set of query vectors: broadcast the query
    * side, window-rank per query on (rounded cosine desc, vec_id). */
  def topK(embeddings: DataFrame, queryIds: Seq[Long] = Seq(0L, 1L, 2L),
           k: Int = 10): DataFrame = {
    val q = embeddings.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))
    val scored = embeddings.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round4(dot(col("embedding"), col("q")) /
          (norm(col("embedding")) * norm(col("q")))).as("cos_sim"))
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** LSH-bucketed ANN: sign bits against `nPlanes` fixed pseudo-random
    * hyperplanes (deterministic LCG, no data-dependent state) → bucket id;
    * per-bucket exact cosine keeps only same-bucket candidates. Recall vs
    * [[topK]] is spec-tested; at 100 TB buckets are the unit of parallelism
    * and a skewed bucket can be salted. */
  def lshCandidates(embeddings: DataFrame, nPlanes: Int = 12, dim: Int = 64,
                    minCos: Double = 0.7): DataFrame = {
    // Fixed hyperplanes from a seeded LCG — reproducible across runs/engines.
    var state = 42L
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      ((state >>> 11).toDouble / (1L << 53).toDouble) - 0.5
    }
    val planes = Array.fill(nPlanes, dim)(next())
    val planeCols = planes.map(p => array(p.map(lit): _*))
    val bucket = (0 until nPlanes).map { i =>
      when(dot(col("embedding"), planeCols(i)) >= 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    val hashed = embeddings.select(col("vec_id"), col("embedding"), bucket.as("bucket"))
    hashed.as("x").join(hashed.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        round4(dot(col("x.embedding"), col("y.embedding")) /
          (norm(col("x.embedding")) * norm(col("y.embedding")))).as("cos_sim"))
      .filter(col("cos_sim") >= minCos)
      .orderBy("vec_a", "vec_b")
  }
}
