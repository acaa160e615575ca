package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Det.round4
import graft.util.{PayloadJoin, TextNorm}
import graft.functions.VectorFunctions.jaccard

/** Deduplication family for training-data pipelines.
  *
  * Scale design: exact dedup is a hash-partitioned group-by on the digest
  * (no sort, no driver state). Near-dup goes through candidate generation
  * (blocking / LSH bands) so the pair space is O(near-dups), never O(n²);
  * the exact verify runs only on candidates.
  */
object Dedup {

  private val words = TextNorm.distinctWords(col("text"))

  /** Exact dedup: md5 of normalized text → survivor = min(doc_id). */
  def exact(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), md5(lower(trim(col("text")))).as("digest"))
      .groupBy(col("digest"))
      .agg(min(col("doc_id")).as("survivor_id"), count(lit(1)).as("dup_count"))
      .orderBy("digest")

  /** Blocked pair enumeration + set-jaccard verify, shared by the exact
    * near-dup operators. The block self-join runs on (doc_id, lang, band)
    * rows ONLY — token payloads never ride the pair shuffle; they re-attach
    * per side afterwards under the caller's [[PayloadJoin]] strategy
    * (default: AQE decides broadcast vs shuffle from stats). */
  private def blockedJaccard(documents: DataFrame,
                             payload: org.apache.spark.sql.Column,
                             threshold: Double,
                             payloadJoin: PayloadJoin): DataFrame = {
    val ids = documents.select(col("doc_id"), col("lang"),
      floor(col("n_chars") / 100).cast("long").as("band"))
    val pairs = ids.select(col("doc_id").as("doc_a"), col("lang"), col("band"))
      .join(ids.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"),
        col("band").as("band_b")),
        col("lang") === col("lang_b") && col("band") === col("band_b") &&
          col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    val pay = documents.select(col("doc_id"), payload.as("p"))
    pairs
      .join(payloadJoin.hint(pay.select(col("doc_id").as("doc_a"), col("p").as("pa"))), "doc_a")
      .join(payloadJoin.hint(pay.select(col("doc_id").as("doc_b"), col("p").as("pb"))), "doc_b")
      .withColumn("jaccard", jaccard(col("pa"), col("pb")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round4(col("jaccard")).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Word-set Jaccard near-dup pairs with (lang, length-band) blocking.
    * Blocking keys are pure equi-join keys — (lang, n_chars div 100) — so
    * pair generation is a hash join partitioned on the block, never a
    * nested loop. [[minhashLsh]] is the scale path that approximates the
    * same pair set without enumerating blocks. */
  def jaccardPairs(documents: DataFrame, threshold: Double = 0.5,
                   payloadJoin: PayloadJoin = PayloadJoin.Auto): DataFrame =
    blockedJaccard(documents, words, threshold, payloadJoin)

  /** MinHash + LSH near-dup: k hash functions over the word set via seeded
    * xxhash64; signatures cut into b bands of r rows; docs sharing a band
    * bucket become candidates; candidates verified with exact Jaccard.
    *
    * Defaults target true near-duplicates (J >= 0.8, the usual corpus-dedup
    * setting): 64 hashes in 8 bands of 8 gives the S-curve midpoint at
    * (1/8)^(1/8) ~ 0.77 — recall ~0.77 at J=0.8, ~0.99 at J=0.9, while a
    * background pair at J~0.55 collides in under 1% of bands. That keeps
    * candidates ≈ O(near-dups) — the 100 TB property; r (rows per band) is
    * the knob that holds it on similarity-dense corpora. */
  def minhashLsh(documents: DataFrame, numHashes: Int = 64, bands: Int = 8,
                 threshold: Double = 0.8,
                 payloadJoin: PayloadJoin = PayloadJoin.Auto): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must be divisible by bands ($bands)")
    val r = numHashes / bands
    // Signature via the one-pass native aggregate (explode + single
    // MinHashSignature buffer, map-side partial aggregation; the shuffle
    // key is doc_id and the buffer one Array[Long]).
    val toks = documents.select(col("doc_id"), explode(words).as("t"))
    val sigs = toks.groupBy("doc_id")
      .agg(graft.functions.MinHashAgg.minhash(col("t"), numHashes).as("sig"))
    // Bands carry ONLY (doc_id, band) — candidate generation shuffles ids,
    // never the token arrays; arrays re-attach after pair dedup.
    val banded = sigs.select(col("doc_id"),
      posexplode(array((0 until bands).map(bi =>
        xxhash64((bi * r until (bi + 1) * r).map(j => col("sig")(j)): _*)): _*))
        .as(Seq("band_idx", "band_hash")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    // The docs side is usually tiny next to millions of candidate pairs, but
    // the choice is the caller's PayloadJoin strategy (default: AQE decides),
    // never a hardcoded hint that would OOM at corpus scale.
    val docsW = documents.select(col("doc_id"), words.as("w"))
    cand
      .join(payloadJoin.hint(docsW.select(col("doc_id").as("doc_a"), col("w").as("wa"))), "doc_a")
      .join(payloadJoin.hint(docsW.select(col("doc_id").as("doc_b"), col("w").as("wb"))), "doc_b")
      .withColumn("jaccard", jaccard(col("wa"), col("wb")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round4(col("jaccard")).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Word n-gram (shingle) Jaccard near-dup pairs: contiguous 3-word
    * shingles instead of the word *set*, so word ORDER matters — two docs
    * sharing vocabulary but not phrasing stop matching. Same equi-key
    * blocking and native-jaccard verify as [[jaccardPairs]]. */
  def ngramJaccard(documents: DataFrame, threshold: Double = 0.3,
                   payloadJoin: PayloadJoin = PayloadJoin.Auto): DataFrame = {
    val w = TextNorm.words(col("text"))
    val sh = when(size(w) >= 3,
      array_distinct(transform(sequence(lit(0), size(w) - 3), i =>
        concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3)))))
      .otherwise(array().cast("array<string>"))
    blockedJaccard(documents, sh, threshold, payloadJoin)
  }

  /** SimHash near-dup: 64-bit signature (sign of per-bit vote over token
    * hashes), candidates via 16-bit chunk bands (hamming ≤ 3 ⇒ ≥1 equal
    * chunk by pigeonhole over 4 chunks), verified with bit_count(xor). */
  def simhash(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val tokens = documents.select(col("doc_id"), explode(words).as("t"))
    val sigs = tokens.groupBy(col("doc_id"))
      .agg(graft.functions.MinHashAgg.simhash(col("t")).as("sig"))
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
