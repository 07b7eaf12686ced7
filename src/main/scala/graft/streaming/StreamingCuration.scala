package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Curation

/** Streaming curation: the batch [[Curation]] rule stack applied to a
  * document stream, then watermarked exact dedup. The rule filters and
  * the PII scrub are narrow per-row expressions, so they attach to a
  * streaming plan unchanged — the only stateful operator is the
  * fingerprint dedup, whose state the watermark bounds. Near-dedup and
  * decontamination stay batch jobs (both need corpus-wide joins; run
  * them in the periodic compaction pass over the stream's output).
  */
object StreamingCuration {

  /** Filter → scrub → dedup-within-watermark over a streaming corpus.
    * `tsCol` must be an event-time timestamp column.
    *
    * The rule predicate is [[Curation.passesFilters]] itself (including
    * `compressionBand` when set), so batch and stream can never drift.
    * `bowDedup` is rejected: bag-of-words dedup groups over the whole
    * corpus (a batch shuffle) and has no bounded-state streaming twin —
    * run it in the periodic compaction pass. */
  def curateStream(docs: DataFrame, textCol: String, tsCol: String,
      rules: Curation.Rules = Curation.Rules(),
      watermark: String = "10 minutes"): DataFrame = {
    require(!rules.bowDedup,
      "bowDedup is batch-only (corpus-wide groupBy); " +
        "run Curation.curate in the compaction pass instead")
    val t = col(textCol)
    StreamingDedup.dedupStream(
      docs.where(Curation.passesFilters(t, rules))
        .withColumn(textCol, TextFunctions.redactPii(t)),
      textCol, tsCol, watermark)
  }
}
