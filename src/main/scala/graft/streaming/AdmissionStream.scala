package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.{CacheScope, Dedup, SignatureIndex, TableStore}

/** Continuous corpus admission with DURABLE cross-batch dedup state — the
  * streaming composition of [[SignatureIndex]]:
  *
  * per micro-batch: within-batch near-dedup (a batch can carry mutual
  * near-dups of itself) → screen against the PERSISTED signature index →
  * append the admitted docs' signatures → hand the admitted rows to the
  * sink callback.
  *
  * This is what [[CorpusIngest.prepare]]'s watermark-bounded
  * `dropDuplicatesWithinWatermark` cannot give: that state dies with the
  * watermark (and the query); the signature index is a versioned table,
  * so a re-crawl arriving DAYS later — or after a restart — is still
  * screened against everything ever admitted. State size is
  * ~numHashes longs per admitted doc, not raw text.
  *
  * Failure semantics: the index append is CAS-protected and idempotent by
  * id, and a replayed micro-batch re-screens to the same decisions (an
  * admitted id re-screens as a no-op — id-inequality guard), so the
  * at-least-once `foreachBatch` contract composes to exactly-once index
  * state. A concurrent writer on the index loses no data: the CAS retry
  * re-reads and re-appends.
  *
  * Small-file accumulation is bounded INSIDE the append path: every tier
  * of the index is hash-bucketed, and [[graft.operators.OverlayLock
  * .appendOrCompactBucketed]] folds a bucket-granular compaction into any
  * drain whose touched buckets have crept past the per-bucket bound — no
  * separate maintenance call in the loop.
  */
object AdmissionStream {

  def start(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      store: TableStore,
      indexName: String,
      threshold: Double,
      checkpointDir: String,
      sink: DataFrame => Unit,
      availableNow: Boolean = true): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // the drain’s jobs are pure batch queries — run them at the drain shuffle width
        // (see DrainConf: fixed small partitions beat per-stage AQE re-plans here)
        graft.operators.DrainConf.withDrainConf(batch.sparkSession) {
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          implicit val scope: CacheScope = new CacheScope
          try {
            val p = SignatureIndex.params(spark, store, indexName)
            // within-batch near-dedup under the INDEX's own parameters:
            // mutual near-dups arriving together collapse to the min id
            // before the index sees either
            val internal = Dedup.nearDedupApprox(batch, idCol, textCol,
              p.shingleN, threshold, p.numHashes, p.bands)
            // admitted rows feed the index append AND the sink — pin once
            val admitted = scope.pin(SignatureIndex.screen(spark, internal,
              idCol, textCol, store, indexName, threshold))
            CdcStream.withConflictRetry(maxAttempts = 3) {
              SignatureIndex.append(spark, admitted, idCol, textCol, store, indexName)
            }
            sink(admitted)
          } finally scope.release()
        }
        }
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** [[SignatureIndex.supersede]] as a live sink — the TEXT keeper loop:
    * per micro-batch, one containment screen-then-supersede fold (the
    * arriving full article retires the stored snippet it subsumes,
    * contained arrivals reject, one CAS commit); admitted rows feed the
    * sink. Same failure semantics as [[start]]: the fold is idempotent
    * by id, so at-least-once redelivery composes to exactly-once stored
    * state. `preDedupBatch` opts into [[SignatureIndex.supersede]]'s
    * within-batch containment screen (default off: in-batch containment
    * between arrivals is not screened, and a snippet+article pair in one
    * drain admits both). */
  def startSupersede(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      store: TableStore,
      indexName: String,
      minContainment: Double,
      checkpointDir: String,
      sink: DataFrame => Unit,
      availableNow: Boolean = true,
      preDedupBatch: Boolean = false): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // pure-batch drain jobs at the drain shuffle width (see DrainConf)
        graft.operators.DrainConf.withDrainConf(batch.sparkSession) {
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          implicit val scope: CacheScope = new CacheScope
          try {
            val admitted = scope.pin(CdcStream.withConflictRetry(maxAttempts = 3) {
              SignatureIndex.supersede(spark, batch, idCol, textCol, store,
                indexName, minContainment, preDedupBatch = preDedupBatch)
            })
            sink(admitted)
          } finally scope.release()
        }
        }
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }
}
