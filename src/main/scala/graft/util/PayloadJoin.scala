package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Join strategy for re-attaching payload columns (token arrays, embeddings)
  * to id-only candidate pairs after candidate generation.
  *
  * Candidate generation in graft shuffles ids only; the payload re-attach is
  * a separate equi-join on id whose right strategy depends on scale: at bench
  * scale the payload side is tiny next to millions of pairs and a broadcast
  * wins, but at 100 TB a forced broadcast of the full corpus payload is an
  * OOM. The default everywhere is [[PayloadJoin.Auto]] — no hint, AQE picks
  * broadcast vs shuffle from runtime shuffle stats — so library code never
  * hardcodes the unscalable choice.
  */
sealed trait PayloadJoin {
  /** Apply this strategy's hint (if any) to the payload side of the join. */
  def hint(payload: DataFrame): DataFrame
}

object PayloadJoin {
  /** No hint: AQE decides broadcast vs shuffle from observed sizes. */
  case object Auto extends PayloadJoin {
    def hint(payload: DataFrame): DataFrame = payload
  }

  /** Force-broadcast the payload side. Only for payloads known to fit in
    * executor memory (e.g. a filtered slice, a fixed dimension). */
  case object Broadcast extends PayloadJoin {
    def hint(payload: DataFrame): DataFrame = broadcast(payload)
  }

  /** Forbid broadcast: hash-shuffle join keyed on id — the explicit 100 TB
    * path when the optimizer's stats are known to be misleading. */
  case object Shuffle extends PayloadJoin {
    def hint(payload: DataFrame): DataFrame = payload.hint("shuffle_hash")
  }
}
