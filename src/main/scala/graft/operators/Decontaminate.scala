package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Benchmark decontamination for training corpora.
  *
  * Before training, every document that shares long n-gram shingles with an
  * evaluation benchmark must be found (and usually dropped), or the
  * benchmark is compromised. The shape of the problem is extremely skewed:
  * the corpus is the full 100 TB, the probe (benchmark) set is a few
  * thousand documents. The implementation exploits that asymmetry:
  *
  *  - the PROBE side is shingled, deduplicated and **broadcast** — it never
  *    participates in a shuffle;
  *  - the CORPUS side flows through one narrow pass (tokenize → hash
  *    shingles → explode) into a broadcast semi-join, so only rows that
  *    actually hit a probe shingle survive the stage;
  *  - the per-document aggregation then shuffles ONLY the matching
  *    `(doc_id, n_sh)` rows — in a healthy corpus that is a vanishing
  *    fraction of the input — with map-side partial counts;
  *  - the cleaned corpus is a broadcast anti-join against the (small)
  *    contaminated-id list: the full corpus is scanned exactly twice and
  *    never shuffled.
  *
  * Shingles are 64-bit hashes ([[hashedShingleSet]]): 8-byte set members
  * instead of n-token strings, with a ~2⁻⁶⁴ collision chance that leaves
  * overlap counts identical to string shingles for oracle purposes.
  *
  * Reference scope: the reference engine's dedup-before-merge discipline
  * (control_migration_schema_script.sql:374–398) extended to the
  * LLM-training surface, as SURVEY §2 directs for pipeline operators.
  */
object Decontaminate {

  /** One row per corpus document that shares at least `minSharedShingles`
    * distinct word `n`-gram shingles with ANY probe document:
    * `(id, n_sh, n_hits, contaminated_frac)` where `n_sh` is the document's
    * distinct-shingle count and `contaminated_frac = n_hits / n_sh`. */
  def contaminationReport(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minSharedShingles: Int = 1): DataFrame = {
    require(n >= 1, s"shingle size must be >= 1, got $n")
    require(minSharedShingles >= 1,
      s"minSharedShingles must be >= 1, got $minSharedShingles")
    // The union of all probe shingles, deduplicated probe-side so the
    // broadcast payload is minimal. Benchmarks are small by construction;
    // if one ever is not, the broadcast threshold fails loudly rather than
    // silently planning a shuffle of the corpus.
    val probeShingles = probes
      .select(explode(hashedShingleSet(col(textCol), n)).as("shingle"))
      .distinct()
    val docs = corpus
      .select(col(idCol).as("id"), hashedShingleSet(col(textCol), n).as("sh"))
      .withColumn("n_sh", size(col("sh")))
      .filter(col("n_sh") > 0)
    docs
      .select(col("id"), col("n_sh"), explode(col("sh")).as("shingle"))
      .join(broadcast(probeShingles), Seq("shingle"), "left_semi")
      .groupBy(col("id"), col("n_sh"))
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minSharedShingles)
      .select(col("id"), col("n_sh"), col("n_hits"),
        round(col("n_hits").cast("double") / col("n_sh"), 4)
          .as("contaminated_frac"))
  }

  /** The corpus minus contaminated documents (all original columns kept).
    * The drop list is one id per contaminated document — broadcast
    * anti-join, no corpus shuffle. */
  def decontaminate(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minSharedShingles: Int = 1): DataFrame = {
    val dropIds = contaminationReport(
        corpus, probes, idCol, textCol, n, minSharedShingles)
      .select(col("id"))
    corpus.join(broadcast(dropIds), corpus(idCol) === dropIds("id"), "left_anti")
  }
}
