package graft

import graft.operators.{CacheScope, Dedup, Similarity}

class CacheScopeSpec extends SparkSpec {

  private def docs() = {
    val s = spark; import s.implicits._
    (1L to 20L).map(i => (i, s"document number $i talks about topic ${i % 4} in detail"))
      .toDF("doc_id", "text")
  }

  test("operator pins land in the caller's scope and release() frees the blocks") {
    val sc = spark.sparkContext
    val baseline = sc.getPersistentRDDs.size

    implicit val scope: CacheScope = new CacheScope
    val pairs = Dedup.minhashLshPairs(docs(), "doc_id", "text",
      shingleN = 2, numHashes = 16, bands = 8, threshold = 0.3)
    pairs.count() // consume: materializes the pinned banded-signature table
    assert(scope.pinnedCount === 1)
    assert(sc.getPersistentRDDs.size > baseline, "pin should register a persistent RDD")

    scope.release()
    assert(scope.pinnedCount === 0)
    assert(sc.getPersistentRDDs.size === baseline, "release() should free every pin")
  }

  test("a long session running several corpora bounds cache growth per scope") {
    val sc = spark.sparkContext
    val baseline = sc.getPersistentRDDs.size
    val s = spark; import s.implicits._
    val emb = (1L to 12L).map(i =>
        (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13).toFloat / 13f)))
      .toDF("vec_id", "embedding")

    (1 to 3).foreach { _ =>
      implicit val scope: CacheScope = new CacheScope
      // two pin-carrying operators per "corpus"
      Dedup.jaccardPairs(docs(), "doc_id", "text", n = 2, threshold = 0.2).count()
      Similarity.lshTopK(emb, "vec_id", "embedding", k = 1, bits = 3, tables = 2).count()
      assert(scope.pinnedCount === 2)
      scope.release()
    }
    assert(sc.getPersistentRDDs.size === baseline,
      "per-corpus scopes must not accumulate pinned blocks across runs")
  }

  test("two scopes pinning the same plan refcount it — first release keeps the block") {
    val sc = spark.sparkContext
    val baseline = sc.getPersistentRDDs.size
    val s = spark; import s.implicits._
    val df = (1L to 10L).map(i => (i, s"shared $i")).toDF("id", "t")

    val a = new CacheScope
    val b = new CacheScope
    val pinnedA = a.pin(df)
    pinnedA.count()
    // b pins the IDENTICAL logical plan (fresh DataFrame, same source)
    val pinnedB = b.pin((1L to 10L).map(i => (i, s"shared $i")).toDF("id", "t"))
    assert(a.pinnedCount === 1 && b.pinnedCount === 1)

    a.release() // b still holds a reference — the block must survive
    assert(sc.getPersistentRDDs.size > baseline,
      "first release must not unpersist a plan another scope still references")
    assert(pinnedB.storageLevel.useMemory, "b's pin should still be cached")

    b.release() // last reference gone — now it frees
    assert(sc.getPersistentRDDs.size === baseline)
  }

  test("a plan the caller cached directly is never unpersisted by a scope") {
    val s = spark; import s.implicits._
    val df = (1L to 5L).map(i => (i, i * 2)).toDF("k", "v")
    df.cache(); df.count()
    val scope = new CacheScope
    scope.pin(df) // externally cached: not ours to manage
    assert(scope.pinnedCount === 0)
    scope.release()
    assert(df.storageLevel.useMemory, "caller-owned cache must survive release()")
    df.unpersist()
  }
}
