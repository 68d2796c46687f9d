package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Persisted MinHash signature index — the TEXT-side analogue of
  * [[IvfIndex]] and the incremental form of [[Dedup.dedupAgainst]]: shingle
  * and hash the corpus ONCE, persist the signatures, then screen every
  * arriving batch against stored state without ever re-reading the corpus
  * text. [[Dedup.dedupAgainst]] recomputes the corpus signatures per call —
  * right for one-off jobs; at a daily admission cadence over a 100 TB
  * corpus the text re-scan dominates, and this index removes it (stored
  * signatures are ~numHashes longs per doc — ~1 KB against tens of KB of
  * text — and banding them back into buckets is a narrow projection).
  *
  * Storage (versioned [[TableStore]] tables, atomic swap, CAS-protected):
  *  - `<name>_sigs` — `(id, sig: array<long>)`, the indexed corpus;
  *  - `<name>_params` — one row `(shingle_n, num_hashes, bands)`: screening
  *    MUST hash the batch with the model's own parameters, so they travel
  *    with the index instead of trusting every caller to repeat them.
  *
  * The admission loop a corpus pipeline runs daily:
  * {{{
  * val kept = SignatureIndex.screen(spark, arriving, "id", "text", store, "corpus", 0.8)
  * // ... write `kept` to the corpus table ...
  * SignatureIndex.append(spark, kept, "id", "text", store, "corpus")
  * }}}
  */
object SignatureIndex {

  private def sigsTable(name: String) = s"${name}_sigs"
  private def paramsTable(name: String) = s"${name}_params"

  final case class Params(shingleN: Int, numHashes: Int, bands: Int) {
    require(numHashes % bands == 0, s"numHashes=$numHashes must divide into bands=$bands")
  }

  private def signaturesOf(df: DataFrame, idCol: String, textCol: String, p: Params) =
    df.select(col(idCol).as("id"),
        minhashSignature(col(textCol), p.shingleN, p.numHashes).as("sig"))
      .filter(size(col("sig")) > 0) // docs long enough to shingle

  /** Shingle+hash `df` once and persist signatures + parameters. */
  def build(
      df: DataFrame,
      idCol: String,
      textCol: String,
      p: Params,
      store: TableStore,
      name: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    store.write(signaturesOf(df, idCol, textCol, p), sigsTable(name))
    store.write(Seq((p.shingleN, p.numHashes, p.bands))
      .toDF("shingle_n", "num_hashes", "bands"), paramsTable(name))
  }

  def params(spark: SparkSession, store: TableStore, name: String): Params = {
    val r = store.read(spark, paramsTable(name)).head()
    Params(r.getAs[Int]("shingle_n"), r.getAs[Int]("num_hashes"), r.getAs[Int]("bands"))
  }

  /** The stored `(id, sig)` corpus signatures. */
  def signatures(spark: SparkSession, store: TableStore, name: String): DataFrame =
    store.read(spark, sigsTable(name))

  /** Hash an admitted batch with the STORED parameters and commit
    * corpus ∪ batch signatures as the next version — the model (params)
    * is untouched, mirroring [[IvfIndex.append]]. IDEMPOTENT by id: ids
    * already indexed are skipped, so a replayed micro-batch (the
    * foreachBatch at-least-once contract) never double-inserts. */
  def append(
      spark: SparkSession,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      store: TableStore,
      name: String): Unit = {
    val p = params(spark, store, name)
    // snapshot: the write CASes against the version this union derived from
    val (existing, readVersion) = store.snapshot(spark, sigsTable(name))
    store.write(
      existing.unionByName(
        signaturesOf(batch, idCol, textCol, p)
          .join(existing.select(col("id")), Seq("id"), "left_anti")),
      sigsTable(name), Some(readVersion))
  }

  /** Bound the signature table's file count — the maintenance call a
    * per-micro-batch append cadence needs ([[TableStore.compactPlain]] on
    * the sigs table; the one-row params table never accumulates). The
    * no-op case is a directory listing, so callers run it after every
    * append. Returns the compacted version, if one was committed. */
  def compact(
      spark: SparkSession,
      store: TableStore,
      name: String,
      maxFiles: Int = 64,
      targetFiles: Int = 8): Option[Int] =
    store.compactPlain(spark, sigsTable(name), maxFiles, targetFiles)

  /** Takedown: commit a next version of the signatures table WITHOUT the
    * given ids (params untouched). After removal, a future arrival
    * resembling only the removed docs is admitted again — the screen's
    * memory genuinely forgets. Returns how many signatures were removed. */
  def remove(
      spark: SparkSession,
      ids: DataFrame,
      store: TableStore,
      name: String): Long = {
    val drop = broadcast(ids.select(col(ids.columns.head).as("_rm_id")).distinct())
    val (stored, readVersion) = store.snapshot(spark, sigsTable(name))
    val kept = stored.join(drop, stored("id") === col("_rm_id"), "left_anti")
    val before = stored.count()
    store.write(kept, sigsTable(name), Some(readVersion))
    before - signatures(spark, store, name).count()
  }

  /** Band `(id, sig)` rows into `(id, sig, band, bucket)` — the same
    * bucketing [[Dedup.minhashLshPairs]] applies, derived here from STORED
    * signatures as a narrow projection (no text ever re-read). */
  private def banded(sigs: DataFrame, p: Params): DataFrame = {
    val rows = p.numHashes / p.bands
    sigs.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(p.bands - 1)),
        b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b)))
        .as(Seq("band", "bucket")))
  }

  /** Admission screen: batch rows whose estimated Jaccard against ANY
    * stored doc reaches `threshold` are dropped; survivors pass through
    * with their original columns. Exact duplicates of stored docs carry
    * identical signatures (est = 1.0) and are dropped by the same test;
    * docs too short to shingle match nothing and are kept. Same hot-bucket
    * cap discipline as every LSH join here — a boilerplate bucket bounds
    * candidates at the cost of recall on that bucket, the standard trade.
    *
    * Scale shape: stored side is a narrow banding projection of `(id,
    * sig)`; candidates are a (band, bucket) equi-join; agreement is the
    * codegen'd signature compare; the drop list is ≤ batch ids, broadcast
    * into a left-anti. The corpus text is never touched. */
  def screen(
      spark: SparkSession,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      store: TableStore,
      name: String,
      threshold: Double,
      maxBucketSize: Int = 200)(implicit caches: CacheScope): DataFrame = {
    val p = params(spark, store, name)
    // both banded tables feed the hot-bucket agg plus the join — pin
    val sb = caches.pin(banded(signaturesOf(batch, idCol, textCol, p), p))
    val sc = caches.pin(banded(signatures(spark, store, name), p))
    def hotSide(s: DataFrame) = s.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("c")).filter(col("c") > maxBucketSize)
      .select("band", "bucket")
    val hot = hotSide(sb).union(hotSide(sc)).distinct()
    val coldB = sb.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
    val coldC = sc.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
    val dropIds = coldB.alias("a")
      .join(coldC.alias("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      .filter(col("a.id") =!= col("b.id")) // re-screening admitted docs is a no-op
      .select(col("a.id").as("_drop_id"),
        (org.apache.spark.sql.graft.NativeFunctions
          .long_positions_equal(col("a.sig"), col("b.sig")).cast("double") / p.numHashes)
          .as("_ej"))
      .filter(col("_ej") >= threshold)
      .select(col("_drop_id")).distinct()
    batch.join(broadcast(dropIds), batch(idCol) === col("_drop_id"), "left_anti")
  }
}
