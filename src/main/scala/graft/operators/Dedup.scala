package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Det.round4

/** Deduplication family for training-data pipelines.
  *
  * Scale design: exact dedup is a hash-partitioned group-by on the digest
  * (no sort, no driver state). Near-dup goes through candidate generation
  * (blocking / LSH bands) so the pair space is O(near-dups), never O(n²);
  * the exact verify runs only on candidates.
  */
object Dedup {

  private val words = array_distinct(split(lower(trim(col("text"))), " "))

  /** Exact dedup: md5 of normalized text → survivor = min(doc_id). */
  def exact(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), md5(lower(trim(col("text")))).as("digest"))
      .groupBy(col("digest"))
      .agg(min(col("doc_id")).as("survivor_id"), count(lit(1)).as("dup_count"))
      .orderBy("digest")

  /** Word-set Jaccard near-dup pairs with (lang, length-band) blocking.
    * Blocking keys are pure equi-join keys — (lang, n_chars div 100) — so
    * candidate generation is a hash join partitioned on the block, never a
    * nested loop; the jaccard is computed inline and the arrays dropped
    * before any further shuffle. [[minhashLsh]] is the scale path that
    * approximates the same pair set without enumerating blocks. */
  def jaccardPairs(documents: DataFrame, threshold: Double = 0.5): DataFrame = {
    val docs = documents.select(
      col("doc_id"), col("lang"),
      floor(col("n_chars") / 100).cast("long").as("band"), words.as("w"))
    val a = docs.select(col("doc_id").as("doc_a"), col("lang"), col("band"),
      col("w").as("wa"))
    val b = docs.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"),
      col("band").as("band_b"), col("w").as("wb"))
    a.join(b, col("lang") === col("lang_b") && col("band") === col("band_b") &&
        col("doc_a") < col("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("wa"), col("wb"))).cast("double") /
          size(array_union(col("wa"), col("wb"))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round4(col("jaccard")).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** MinHash + LSH near-dup: k hash functions over the word set via seeded
    * xxhash64; signatures cut into b bands of r rows; docs sharing a band
    * bucket become candidates; candidates verified with exact Jaccard.
    * Pair space ≈ O(near-dups) — the 100 TB path for [[jaccardPairs]]. */
  def minhashLsh(documents: DataFrame, numHashes: Int = 32, bands: Int = 8,
                 threshold: Double = 0.5): DataFrame = {
    val r = numHashes / bands
    val sig = array((0 until numHashes).map { i =>
      // min over tokens of a seeded 64-bit hash = one minhash coordinate
      array_min(transform(words, t => xxhash64(concat(t, lit(s"#$i")))))
    }: _*)
    // Bands carry ONLY (doc_id, band) — candidate generation shuffles ids,
    // never the token arrays; arrays re-attach after pair dedup.
    val banded = documents.select(col("doc_id"), sig.as("sig"))
      .select(col("doc_id"),
        posexplode(array((0 until bands).map(bi =>
          xxhash64(concat_ws(",", (0 until r).map(j => col("sig")(bi * r + j)): _*))): _*))
          .as(Seq("band_idx", "band_hash")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val docsW = documents.select(col("doc_id"), words.as("w"))
    cand
      .join(docsW.select(col("doc_id").as("doc_a"), col("w").as("wa")), "doc_a")
      .join(docsW.select(col("doc_id").as("doc_b"), col("w").as("wb")), "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("wa"), col("wb"))).cast("double") /
          size(array_union(col("wa"), col("wb"))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round4(col("jaccard")).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash near-dup: 64-bit signature (sign of per-bit vote over token
    * hashes), candidates via 16-bit chunk bands (hamming ≤ 3 ⇒ ≥1 equal
    * chunk by pigeonhole over 4 chunks), verified with bit_count(xor). */
  def simhash(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val tokens = documents.select(col("doc_id"), explode(words).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val bitVotes = (0 until 64).map { b =>
      sum(shiftright(col("h"), b).bitwiseAND(1) * 2 - 1).as(s"b$b")
    }
    val sigs = tokens.groupBy(col("doc_id")).agg(bitVotes.head, bitVotes.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(b => when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
          .reduce(_.bitwiseOR(_)).as("sig"))
    val chunked = sigs.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("sig"), c * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("chunk_idx", "chunk")))
    chunked.as("x").join(chunked.as("y"),
        col("x.chunk_idx") === col("y.chunk_idx") &&
        col("x.chunk") === col("y.chunk") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
              bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }
}
