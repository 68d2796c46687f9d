package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sequence packing for training-data assembly.
  *
  * Training jobs consume documents concatenated into fixed-token-budget
  * sequences ("packs"). Assignment must be (a) deterministic across runs and
  * cluster layouts, (b) computable without ever materializing a global
  * single-partition ordering, and (c) keep every document whole. The
  * classic formulation is a running token total over a canonical document
  * order with bin = runningTotalBefore / budget — documents never split;
  * a pack can overflow the budget by at most one document's tokens (callers
  * chunk oversized documents first if they need a hard cap).
  *
  * The canonical order is `md5(id)` — content-independent, shuffle-stable,
  * and replayable in any SQL engine. The naive `sum() OVER (ORDER BY ord)`
  * is a single-partition window (a non-starter at corpus scale), so the
  * running total is computed as a distributed two-phase prefix sum:
  *
  *  1. documents hash into 256 ordered buckets by their first md5 byte;
  *     an intra-bucket running sum runs in parallel per bucket (one
  *     narrow-row shuffle — only (id, n_tok) move, never text);
  *  2. the 256 per-bucket totals come to the driver (control-plane, ≤256
  *     rows), an exclusive prefix turns them into bucket offsets, and a
  *     broadcast join adds offset + intra = exact global running sum.
  *
  * Reference scope: batching discipline of the reference's queue consumer
  * (control_migration_schema_script.sql:463–492 — bounded work units drained
  * in deterministic order), re-expressed for token budgets per SURVEY §2.
  */
object Packing {

  /** `(idCol, tokenCol, pack_id, pack_pos)` for every input row:
    * `pack_id` is the 0-based pack index, `pack_pos` the 1-based position of
    * the document inside its pack in canonical order. Narrow by design —
    * join back to the full corpus on `idCol` when the text is needed
    * (consumers re-sort by (pack_id, pack_pos) anyway). */
  def assignPacks(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budgetTokens: Long)(implicit caches: CacheScope): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be > 0, got $budgetTokens")
    val spark = df.sparkSession
    val ord = md5(col(idCol).cast("string"))
    // read twice (bucket-totals collect + the final window/join) — pin so
    // the upstream (often a full tokenize of the corpus) runs once
    val narrow = caches.pin(df
      .select(col(idCol), col(tokenCol).cast("long").as(tokenCol))
      .withColumn("_ord", ord)
      .withColumn("_bucket", conv(substring(col("_ord"), 1, 2), 16, 10).cast("int")))

    val intraW = Window.partitionBy(col("_bucket"))
      .orderBy(col("_ord"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intra = narrow.withColumn("_intra", sum(col(tokenCol)).over(intraW))

    // control-plane: ≤256 bucket totals → exclusive prefix offsets
    val totals = narrow.groupBy(col("_bucket"))
      .agg(sum(col(tokenCol)).as("_total"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (b, t) => val o = (b, acc); acc += t; o }.toSeq
    val offsetsDf = spark.createDataFrame(offsets).toDF("_bucket", "_offset")

    val packW = Window.partitionBy(col("pack_id")).orderBy(col("_ord"), col(idCol))
    intra
      .join(broadcast(offsetsDf), Seq("_bucket"))
      .withColumn("_before", col("_offset") + col("_intra") - col(tokenCol))
      .withColumn("pack_id", expr(s"_before div ${budgetTokens}L"))
      .withColumn("pack_pos", row_number().over(packW))
      .select(col(idCol), col(tokenCol), col("pack_id"), col("pack_pos"))
  }

  /** Per-pack roll-up: `(pack_id, n_docs, total_tokens)` — the shape a
    * training-shard manifest wants. */
  def packManifest(assigned: DataFrame, tokenCol: String): DataFrame =
    assigned.groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokenCol)).as("total_tokens"))
}
