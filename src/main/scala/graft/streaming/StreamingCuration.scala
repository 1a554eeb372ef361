package graft.streaming

import graft.operators.{Curation, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The curation gate as a STREAMING stage: quality score, language ID,
  * within-doc repetition (one-pass native kernel) and PII redaction
  * applied to a document stream.
  *
  * Every feature here is a STATELESS map-side projection — the same
  * kernel/expression columns the batch operators use — so the stage
  * preserves streaming incrementality with no state store, no
  * watermark, and no shuffle: it composes in front of the stateful
  * stages (StreamingNearDup's banded candidate state, dedupStream's
  * watermarked hash dedup) exactly like the batch train-mix pipeline
  * orders dedup after the cheap per-doc filters.
  */
object StreamingCuration {

  private val normText: Column =
    lower(trim(regexp_replace(col("text"), "\\s+", " ")))

  /** Per-document curation decision columns over a (doc_id, text)
    * stream: quality, lang_pred, dup_bigram_frac, n_pii, and the
    * redacted text. Works identically on batch and streaming frames.
    */
  def annotated(docs: DataFrame): DataFrame =
    docs
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .withColumn("quality", TextAnalysis.qualityColumn)
      .withColumn("lang_pred", TextAnalysis.langPredColumn)
      .withColumn("__r", graft.functions.Shingling.repetitionStats(normText))
      .withColumn(
        "dup_bigram_frac",
        when(
          col("__r.n_bigrams") =!= 0L,
          (col("__r.n_bigrams") - col("__r.n_distinct_bigrams")).cast("double") /
            col("__r.n_bigrams")
        ).otherwise(lit(0.0))
      )
      .drop("__r")

  /** The gate itself: keep documents above the quality floor, in a
    * recognized language, and below the repetition ceiling; emit the
    * PII-redacted text (count rides along for monitoring sinks).
    */
  def curate(
    docs: DataFrame,
    minQuality: Double = 0.3,
    maxDupBigramFrac: Double = 0.8
  ): DataFrame =
    annotated(docs)
      .filter(
        col("quality") >= minQuality &&
          col("lang_pred") =!= "und" &&
          col("dup_bigram_frac") <= maxDupBigramFrac
      )
      .select(
        col("doc_id"),
        Curation.redactedColumn(col("text")).as("text"),
        col("quality"),
        col("lang_pred"),
        col("dup_bigram_frac")
      )
}
