package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is pathological (one
  * customer with 10^9 rows, one hot LSH bucket). AQE's skew-join split
  * handles sort-merge joins; this explicit salt works for any join shape
  * and is partition-count-deterministic: the skewed side's salt is a pure
  * function of its row content, the small side replicates across all
  * salts, so the joined row *set* is identical to the unsalted join.
  */
object Skew {
  /** Inner-join `big` with `small` on `key`, spreading each hot key over
    * `salts` partitions. `bigSaltSource` must be a deterministic column of
    * the big side (defaults to a hash of the key + a secondary column). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, bigSaltSource: Column): DataFrame = {
    val salted = big.withColumn("_salt", pmod(xxhash64(bigSaltSource), lit(salts)))
    val replicated = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
