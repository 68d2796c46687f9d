package graft

import graft.operators.{CacheScope, SignatureIndex, TableStore}
import SignatureIndex.Params

/** Persisted MinHash signature index: build/params round-trip, admission
  * screening against stored state, refit-free append — the text-side
  * mirror of IvfIndexSpec. */
class SignatureIndexSpec extends SparkSpec {
  import spark.implicits._

  private val p = Params(shingleN = 2, numHashes = 32, bands = 16)

  private def corpus() = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "pack my box with five dozen liquor jugs for the long trip"),
    (3L, "sphinx of black quartz judge my vow said the old librarian"))
    .toDF("doc_id", "text")

  test("build persists signatures and params; both halves readable") {
    val store = new TableStore(tmpDir("sigidx"))
    SignatureIndex.build(corpus(), "doc_id", "text", p, store, "c")
    assert(SignatureIndex.params(spark, store, "c") === p)
    val sigs = SignatureIndex.signatures(spark, store, "c").collect()
    assert(sigs.length === 3)
    assert(sigs.forall(_.getSeq[Long](1).length === p.numHashes))
  }

  test("screen drops exact and near duplicates of stored docs, keeps novel and short ones") {
    implicit val scope: CacheScope = new CacheScope
    val store = new TableStore(tmpDir("sigidx"))
    SignatureIndex.build(corpus(), "doc_id", "text", p, store, "c")
    val arriving = Seq(
      (101L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup → drop
      (102L, "pack my box with five dozen liquor jugs for the long trek"), // near dup → drop
      (103L, "completely unrelated content about distributed query planning engines"), // novel → keep
      (104L, "tiny")) // too short to shingle → matches nothing → keep
      .toDF("doc_id", "text")
    val kept = SignatureIndex.screen(spark, arriving, "doc_id", "text",
        store, "c", threshold = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(103L, 104L))
    scope.release()
  }

  test("append admits new signatures under stored params; later screens see them") {
    implicit val scope: CacheScope = new CacheScope
    val store = new TableStore(tmpDir("sigidx"))
    SignatureIndex.build(corpus(), "doc_id", "text", p, store, "c")
    val admitted = Seq(
      (201L, "a brand new document that the corpus has never seen before today"))
      .toDF("doc_id", "text")
    SignatureIndex.append(spark, admitted, "doc_id", "text", store, "c")
    assert(SignatureIndex.signatures(spark, store, "c").count() === 4)

    // a near-copy of the doc admitted above is now screened out
    val nextDay = Seq(
      (301L, "a brand new document that the corpus has never seen before tonight"),
      (302L, "other material sharing nothing with anything stored anywhere"))
      .toDF("doc_id", "text")
    val kept = SignatureIndex.screen(spark, nextDay, "doc_id", "text",
        store, "c", threshold = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(302L))
    scope.release()
  }

  test("remove forgets: a near-dup of a removed doc is admitted again") {
    implicit val scope: CacheScope = new CacheScope
    val store = new TableStore(tmpDir("sigidx-rm"))
    SignatureIndex.build(corpus(), "doc_id", "text", p, store, "c")
    val probe = Seq((401L, "pack my box with five dozen liquor jugs for the long trek"))
      .toDF("doc_id", "text") // near-dup of stored doc 2
    assert(SignatureIndex.screen(spark, probe, "doc_id", "text",
      store, "c", threshold = 0.5).count() === 0L) // blocked while 2 is indexed
    assert(SignatureIndex.remove(spark, Seq(2L).toDF("doc_id"), store, "c") === 1L)
    assert(SignatureIndex.signatures(spark, store, "c").count() === 2)
    assert(SignatureIndex.params(spark, store, "c") === p) // params untouched
    assert(SignatureIndex.screen(spark, probe, "doc_id", "text",
      store, "c", threshold = 0.5).count() === 1L) // admitted after takedown
    scope.release()
  }

  test("re-screening an already-indexed id is a no-op (id-inequality guard)") {
    implicit val scope: CacheScope = new CacheScope
    val store = new TableStore(tmpDir("sigidx"))
    SignatureIndex.build(corpus(), "doc_id", "text", p, store, "c")
    // ids 1-3 ARE the index: identical signatures, but same id → kept
    val kept = SignatureIndex.screen(spark, corpus(), "doc_id", "text",
        store, "c", threshold = 0.5)
      .count()
    assert(kept === 3L)
    scope.release()
  }
}
