package graft

import org.apache.spark.sql.functions._

import graft.operators.{CacheScope, Dedup, PerceptualIndex, TableStore}

/** The managed perceptual-signature store (VERDICT r14 #2): build /
  * append / remove / screen under manifest discipline, the exactly-once
  * streamed admission gate, and canonicity — screening from committed
  * state must equal the ad-hoc [[Dedup.hammingBandedPairsAgainst]] over
  * the same signatures with the persisted budget. */
class PerceptualIndexSpec extends SparkSpec {

  /** Deterministic well-separated signatures: distinct high bits per
    * group, low bits for within-group perturbation. */
  private def sig(group: Int, perturb: Int = 0): Long =
    (0x9E3779B97F4A7C15L * (group + 1)) & ~0x3FL | (perturb.toLong & 0x3FL)

  private def sigDf(rows: Seq[(Long, Long)]) = {
    val s = spark; import s.implicits._
    rows.toDF("id", "sig")
  }

  private def stored(n: Int) = sigDf((0 until n).map(g => (g * 10L, sig(g))))

  test("screen from committed state ≡ ad-hoc hammingBandedPairsAgainst with the stored budget") {
    val store = new TableStore(tmpDir("perc-canon"))
    PerceptualIndex.build(stored(30), maxHamming = 6, store, "img")
    assert(PerceptualIndex.maxHamming(store, "img") === 6)
    // batch: near-copies of groups 0..4 (within budget), plus novel groups
    val batch = sigDf((0 until 5).map(g => (g * 10L + 1, sig(g, 3))) ++
      (100 until 105).map(g => (g * 10L, sig(g))))
    implicit val scope: CacheScope = new CacheScope
    try {
      val served = PerceptualIndex.screen(spark, batch, store, "img")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val adhoc = Dedup.hammingBandedPairsAgainst(
          batch, PerceptualIndex.signatures(spark, store, "img"), maxHamming = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(served === adhoc)
      assert(served.map(_._1) === (0 until 5).map(g => g * 10L + 1).toSet,
        "near-copies match, novel groups don't")
    } finally scope.release()
  }

  test("append is insert-only and O(batch)-linked; in-batch duplicate ids fold once") {
    val store = new TableStore(tmpDir("perc-append"))
    PerceptualIndex.build(stored(20), maxHamming = 6, store, "img")
    // batch: one already-stored id (different sig — must NOT replace),
    // one new id arriving TWICE with different sigs (smallest wins)
    PerceptualIndex.append(spark,
      sigDf(Seq((0L, sig(99)), (500L, 7L), (500L, 3L))), store, "img")
    val sigs = PerceptualIndex.signatures(spark, store, "img")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sigs.size === 21)
    assert(sigs(0L) === sig(0), "insert-only: stored id keeps its signature")
    assert(sigs(500L) === 3L, "duplicate in-batch id folds to the smallest sig")
  }

  test("remove forgets: a copy of a removed item is admitted again") {
    val store = new TableStore(tmpDir("perc-remove"))
    PerceptualIndex.build(stored(10), maxHamming = 6, store, "img")
    val copy = sigDf(Seq((900L, sig(2, 1))))
    implicit val scope: CacheScope = new CacheScope
    try {
      assert(PerceptualIndex.screen(spark, copy, store, "img").count() === 1,
        "copy of stored group 2 is caught")
      val s = spark; import s.implicits._
      assert(PerceptualIndex.remove(spark, Seq(20L).toDF("id"), store, "img") === 1L)
      assert(PerceptualIndex.screen(spark, copy, store, "img").count() === 0,
        "after takedown the screen's memory genuinely forgets")
    } finally scope.release()
  }

  /** Fails the NEXT commit of one named table — the crash window between
    * the member commit and the manifest swap. */
  private class CrashStore(root: String) extends TableStore(root) {
    @volatile var failTable: Option[String] = None
    override def appendRows(rows: org.apache.spark.sql.DataFrame,
        name: String, expected: Int): Int = {
      if (failTable.contains(name))
        throw new RuntimeException(s"injected crash on $name commit")
      super.appendRows(rows, name, expected)
    }
  }

  test("admission gate: replay refused; crash mid-fold invisible; redelivery folds once") {
    val store = new CrashStore(tmpDir("perc-adm"))
    PerceptualIndex.build(stored(10), maxHamming = 6, store, "img")
    val b0 = sigDf(Seq((200L, sig(50)), (210L, sig(51))))
    assert(PerceptualIndex.admitBatch(spark, b0, 0L, store, "img"), "first batch folds")
    assert(!PerceptualIndex.admitBatch(spark, b0, 0L, store, "img"), "replay refused")
    assert(PerceptualIndex.signatures(spark, store, "img").count() === 12)
    // crash between the sigs member commit... the member is the only
    // data table, so inject on IT and verify the manifest gate
    val b1 = sigDf(Seq((220L, sig(52))))
    store.failTable = Some("img_sigs")
    intercept[RuntimeException] {
      PerceptualIndex.admitBatch(spark, b1, 1L, store, "img")
    }
    store.failTable = None
    assert(PerceptualIndex.signatures(spark, store, "img").count() === 12,
      "crashed fold is invisible (manifest-pinned read ignores the orphan)")
    assert(PerceptualIndex.admitBatch(spark, b1, 1L, store, "img"),
      "redelivered batch folds exactly once")
    assert(PerceptualIndex.signatures(spark, store, "img").count() === 13)
  }

  test("admitNovelBatch: screen-then-admit with EVOLVING state; replay refused") {
    val store = new TableStore(tmpDir("perc-novel"))
    PerceptualIndex.build(stored(5), maxHamming = 6, store, "img")
    // batch 0: a copy of seed group 2 (rejected) + two novel items
    assert(PerceptualIndex.admitNovelBatch(spark,
      sigDf(Seq((900L, sig(2, 1)), (901L, sig(60)), (902L, sig(61)))),
      0L, store, "img"))
    val ids0 = PerceptualIndex.signatures(spark, store, "img")
      .collect().map(_.getLong(0)).toSet
    assert(ids0 === (0 until 5).map(_ * 10L).toSet ++ Set(901L, 902L),
      "the seed copy is screened out; the novel items admit")
    // batch 1: a copy of 901 — rejected BY BATCH 0's admission, the
    // evolving-state property — plus one more novel
    assert(PerceptualIndex.admitNovelBatch(spark,
      sigDf(Seq((910L, sig(60, 2)), (911L, sig(62)))), 1L, store, "img"))
    val ids1 = PerceptualIndex.signatures(spark, store, "img")
      .collect().map(_.getLong(0)).toSet
    assert(!ids1.contains(910L),
      "a copy of an EARLIER DRAIN's admission is rejected by that admission")
    assert(ids1.contains(911L))
    // replayed batchId: refused without touching state
    assert(!PerceptualIndex.admitNovelBatch(spark,
      sigDf(Seq((990L, sig(90)))), 1L, store, "img"))
    assert(PerceptualIndex.signatures(spark, store, "img")
      .collect().map(_.getLong(0)).toSet === ids1)
    // in-batch near-dups of each other (not of stored): both admit —
    // the documented contract
    assert(PerceptualIndex.admitNovelBatch(spark,
      sigDf(Seq((920L, sig(70)), (921L, sig(70, 1)))), 2L, store, "img"))
    val ids2 = PerceptualIndex.signatures(spark, store, "img")
      .collect().map(_.getLong(0)).toSet
    assert(ids2.contains(920L) && ids2.contains(921L))
  }

  test("racing admitters: exactly one folds, the loser skips under the lock") {
    val store = new TableStore(tmpDir("perc-race"))
    PerceptualIndex.build(stored(10), maxHamming = 6, store, "img")
    val batch = sigDf(Seq((400L, sig(70)), (410L, sig(71))))
    val gate = new java.util.concurrent.CyclicBarrier(2)
    val outcomes = (0 until 2).map { _ =>
      new java.util.concurrent.FutureTask[String](() => {
        gate.await()
        try {
          if (PerceptualIndex.admitBatch(spark, batch, 0L, store, "img")) "folded"
          else "skipped"
        } catch {
          case _: graft.operators.VersionConflictException => "conflict"
          case e: Throwable
              if Option(e.getCause).exists(_.isInstanceOf[
                graft.operators.VersionConflictException]) => "conflict"
        }
      })
    }
    outcomes.foreach(t => new Thread(t).start())
    val results = outcomes.map(_.get()).sorted
    assert(results === Seq("folded", "skipped"),
      s"exactly one admitter folds, the in-process loser skips, got $results")
    assert(PerceptualIndex.signatures(spark, store, "img").count() === 12,
      "the batch folded exactly once")
  }

  test("streamed admission drains to the same committed state as one batch append") {
    val s = spark; import s.implicits._
    val root = tmpDir("perc-stream")
    val store = new TableStore(s"$root/idx")
    PerceptualIndex.build(stored(10), maxHamming = 6, store, "img")
    // stage three single-row parquet files
    val stageDir = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(root, "stage"))
    (0 until 3).foreach { k =>
      val part = s"$root/_p$k"
      sigDf(Seq((300L + k, sig(60 + k)))).coalesce(1)
        .write.mode("overwrite").parquet(part)
      val f = java.nio.file.Files.list(java.nio.file.Paths.get(part))
      try f.iterator().forEachRemaining { p =>
        if (p.getFileName.toString.startsWith("part-"))
          java.nio.file.Files.move(p, stageDir.resolve(s"b$k.parquet"))
      } finally f.close()
    }
    val schema = spark.read.parquet(stageDir.toString).schema
    PerceptualIndex.admitStream(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(stageDir.toString),
      store, "img", s"$root/chk").awaitTermination()
    val got = PerceptualIndex.signatures(spark, store, "img")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val clean = new TableStore(tmpDir("perc-stream-clean"))
    PerceptualIndex.build(stored(10), maxHamming = 6, clean, "img")
    PerceptualIndex.append(spark,
      sigDf((0 until 3).map(k => (300L + k, sig(60 + k)))), clean, "img")
    val want = PerceptualIndex.signatures(spark, clean, "img")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want, "drained state ≡ one clean batch append")
  }
}
