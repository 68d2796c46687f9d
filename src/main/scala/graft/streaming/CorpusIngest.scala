package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Pii

/** Streaming corpus ingestion: the training-data operators composed over an
  * unbounded document stream — the same column expressions the batch
  * pipeline (q46) uses, unchanged, because every one of them is a narrow
  * Catalyst transform that works identically under `readStream`:
  *
  *  1. quality gate — documents below `minTokens` never enter the store;
  *  2. PII scrub — the [[Pii]] rule chain, fused into the same stage;
  *  3. content dedup on ingest — watermark-bounded
  *     `dropDuplicatesWithinWatermark` on the NORMALIZED FINGERPRINT (not
  *     the id): a re-crawl of the same text under a fresh id is still a
  *     duplicate. State is bounded by ingest-rate × watermark; corpus-wide
  *     dedup stays the batch operators' job ([[graft.operators.Dedup]]).
  *
  * The stream side never shuffles except for the dedup state exchange —
  * one hash partition on the fingerprint.
  */
object CorpusIngest {

  def prepare(
      stream: DataFrame,
      textCol: String,
      tsCol: String,
      minTokens: Int,
      watermarkDelay: String = "10 minutes",
      piiRules: Seq[Pii.Rule] = Pii.defaultRules): DataFrame =
    Pii.scrub(
        stream.filter(TextFunctions.tokenCount(col(textCol)) >= minTokens)
          // fingerprint the RAW text, before masking: two distinct docs that
          // differ only inside PII spans must NOT collapse into one after
          // scrubbing ('contact alice@… for offer X' vs 'contact bob@… for
          // offer X' are different documents)
          .withColumn("_fp", TextFunctions.fingerprint(col(textCol))),
        textCol, piiRules)
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("_fp")
      .drop("_fp")
}
