package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Document chunking: split long documents into overlapping token windows.
  *
  * Training and retrieval pipelines cap sequence length, so oversized
  * documents are cut into windows of `maxTokens` with `overlap` tokens of
  * context carried between consecutive windows (stride = maxTokens −
  * overlap). This is the step BEFORE [[Packing]]: packing keeps documents
  * whole, so documents longer than the pack budget must be chunked first.
  *
  * Fully narrow: the window arithmetic happens inside a `transform` +
  * `posexplode` over each row — no shuffle, no state, no driver
  * participation; output order and ids are deterministic, so the operator
  * replays in SQL (`list_slice` windows).
  *
  * Window count per doc is `ceil((n − overlap) / stride)` (one window when
  * `n ≤ maxTokens`): every token is covered, the final window may be
  * shorter, and a window never starts beyond the last `overlap` boundary.
  *
  * Reference scope: bounded work-unit discipline of the reference's queue
  * consumer (control_migration_schema_script.sql:463–492) applied to
  * sequence budgets, per SURVEY §2.
  */
object Chunking {

  /** One row per (doc, window): `(idCol, chunk_id, chunk_text, n_tokens)`
    * with `chunk_id` 0-based in token order. Documents with no tokens are
    * dropped (nothing to chunk). */
  def chunkByTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxTokens: Int,
      overlap: Int = 0): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap (maxTokens=$maxTokens)")
    val stride = maxTokens - overlap
    val toks = TextFunctions.tokens(col(textCol))
    val n = size(toks)
    // ceil((n - overlap) / stride), floored at 1 for any non-empty doc
    val nChunks = greatest(ceil((n - lit(overlap)).cast("double") / stride)
      .cast("int"), lit(1))
    df.filter(n > 0)
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => array_join(slice(toks, i * stride + 1, lit(maxTokens)), " ")))
          .as(Seq("chunk_id", "chunk_text")))
      .withColumn("n_tokens", size(split(col("chunk_text"), " ")))
  }
}
