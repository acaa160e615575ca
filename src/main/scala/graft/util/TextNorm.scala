package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The single definition of text normalization shared by every operator
  * (dedup, language-ID, quality, token counting, curation): change what a
  * "word" means HERE and the whole engine stays consistent. */
object TextNorm {
  /** Whitespace tokens of the lowercased, trimmed text. */
  def words(text: Column): Column = split(lower(trim(text)), " ")

  /** Distinct word set (order not guaranteed — use for set operations). */
  def distinctWords(text: Column): Column = array_distinct(words(text))

  /** chars/4 heuristic LLM-token estimate. */
  def estTokens(text: Column): Column = ceil(length(text) / 4.0).cast("long")
}
