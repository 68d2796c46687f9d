package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusProfile, TableStore}

class CorpusProfileSpec extends SparkSpec {

  private def docs(ids: Range) = {
    val s = spark; import s.implicits._
    ids.map { i =>
      (i.toLong, s"g${i % 3}", s"text-${i % 211}", (i * 13 % 997).toDouble)
    }.toDF("id", "grp", "txt", "num")
  }

  private def servedProfile(store: TableStore) =
    CorpusProfile.profile(spark, store, "p", k = 32, qs = Seq(0.5, 0.9))
      .orderBy(col("group")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2),
        r.getInt(3), r.getInt(4), r.getDouble(5), r.getDouble(6))).toSeq

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_profspec").toString

  test("append equals from-scratch build, bit for bit") {
    val all = docs(1 to 900)
    val fullStore = new TableStore(freshRoot())
    CorpusProfile.build(all, "grp", "txt", "id", "num", 32, 64, fullStore, "p")

    val incStore = new TableStore(freshRoot())
    CorpusProfile.build(all.filter(col("id") % 10 =!= 0),
      "grp", "txt", "id", "num", 32, 64, incStore, "p")
    CorpusProfile.append(spark, all.filter(col("id") % 10 === 0),
      "grp", "txt", "id", "num", 32, 64, incStore, "p")

    assert(servedProfile(incStore) === servedProfile(fullStore),
      "built-then-appended state must serve the full-corpus statistics")
  }

  test("a chain of appends converges to the same state as one build") {
    val all = docs(1 to 1200)
    val fullStore = new TableStore(freshRoot())
    CorpusProfile.build(all, "grp", "txt", "id", "num", 32, 64, fullStore, "p")

    val incStore = new TableStore(freshRoot())
    CorpusProfile.build(all.filter(col("id") <= 300),
      "grp", "txt", "id", "num", 32, 64, incStore, "p")
    for (lo <- Seq(301, 601, 901)) {
      CorpusProfile.append(spark,
        all.filter(col("id") >= lo && col("id") <= lo + 299),
        "grp", "txt", "id", "num", 32, 64, incStore, "p")
    }
    assert(servedProfile(incStore) === servedProfile(fullStore))
  }

  test("append that forces a level escalation still matches from-scratch") {
    // b=16: 400 rows per group force several escalations; the appended
    // batch quadruples the corpus so the stored level must move
    val all = docs(1 to 1600)
    val fullStore = new TableStore(freshRoot())
    CorpusProfile.build(all, "grp", "txt", "id", "num", 32, 16, fullStore, "p")

    val incStore = new TableStore(freshRoot())
    CorpusProfile.build(all.filter(col("id") <= 400),
      "grp", "txt", "id", "num", 32, 16, incStore, "p")
    CorpusProfile.append(spark, all.filter(col("id") > 400),
      "grp", "txt", "id", "num", 32, 16, incStore, "p")
    assert(servedProfile(incStore) === servedProfile(fullStore))
  }

  test("frequency tier: appended cells serve the full-corpus estimates") {
    val s = spark; import s.implicits._
    val vals = (1 to 2000).map(i => (s"g${i % 2}", s"w${i % 61}"))
    val full = vals.toDF("grp", "v")
    val fullStore = new TableStore(freshRoot())
    CorpusProfile.buildFreq(full, "grp", "v", 4, 128, fullStore, "p")

    val incStore = new TableStore(freshRoot())
    val (a, b) = vals.splitAt(1500)
    CorpusProfile.buildFreq(a.toDF("grp", "v"), "grp", "v", 4, 128, incStore, "p")
    CorpusProfile.appendFreq(spark, b.toDF("grp", "v"), "grp", "v", 4, 128, incStore, "p")

    def serve(st: TableStore) =
      CorpusProfile.freq(spark, st, "p", Seq("w1", "w2", "w60"), 4, 128)
        .orderBy(col("group"), col("term")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(serve(incStore) === serve(fullStore),
      "cell-wise-summed state must serve the from-scratch estimates")
  }

  test("frequency takedown: append then remove restores the original cells") {
    val s = spark; import s.implicits._
    val base = (1 to 800).map(i => (s"g${i % 2}", s"w${i % 41}")).toDF("grp", "v")
    val extra = (1 to 200).map(i => (s"g${i % 2}", s"x${i % 17}")).toDF("grp", "v")
    val store = new TableStore(freshRoot())
    CorpusProfile.buildFreq(base, "grp", "v", 4, 128, store, "p")
    val before = CorpusProfile.freq(spark, store, "p", Seq("w1", "w40", "x3"), 4, 128)
      .orderBy(col("group"), col("term")).collect().map(_.toSeq).toSeq
    CorpusProfile.appendFreq(spark, extra, "grp", "v", 4, 128, store, "p")
    CorpusProfile.removeFreq(spark, extra, "grp", "v", 4, 128, store, "p")
    val after = CorpusProfile.freq(spark, store, "p", Seq("w1", "w40", "x3"), 4, 128)
      .orderBy(col("group"), col("term")).collect().map(_.toSeq).toSeq
    assert(after === before, "CMS counts are sums: exact subtraction must round-trip")
  }

  test("admitBatch gate: a redelivered batchId is skipped, state unchanged") {
    val store = new TableStore(freshRoot())
    def admit(ids: Range, bid: Long) =
      CorpusProfile.admitBatch(spark, docs(ids), bid,
        "grp", "txt", "id", "num", 32, 64, store, "p")
    assert(admit(1 to 100, 0L), "first batch builds")
    assert(admit(101 to 200, 1L), "second batch appends")
    val before = servedProfile(store)
    // failure redelivery: same batchId, same (or corrupted) content
    assert(!admit(101 to 200, 1L), "replayed batchId must be refused")
    assert(!admit(201 to 300, 0L), "an older batchId must be refused too")
    assert(servedProfile(store) === before, "refused batches leave state untouched")
    assert(admit(201 to 300, 2L), "the next real batch still lands")
  }

  test("a batch-split admission chain equals one from-scratch build") {
    val all = docs(1 to 900)
    val fullStore = new TableStore(freshRoot())
    CorpusProfile.build(all, "grp", "txt", "id", "num", 32, 64, fullStore, "p")
    val admStore = new TableStore(freshRoot())
    for ((lo, bid) <- Seq(1 -> 0L, 301 -> 1L, 601 -> 2L))
      CorpusProfile.admitBatch(spark, docs(lo to lo + 299), bid,
        "grp", "txt", "id", "num", 32, 64, admStore, "p")
    assert(servedProfile(admStore) === servedProfile(fullStore),
      "set-canonicity: any batch split of the corpus converges to the same state")
  }

  test("append commits new versions of both sketch tables (CAS path)") {
    val store = new TableStore(freshRoot())
    CorpusProfile.build(docs(1 to 100), "grp", "txt", "id", "num", 32, 64, store, "p")
    val (_, kmvV0) = store.snapshot(spark, "p_kmv")
    val (_, lvlV0) = store.snapshot(spark, "p_lvl")
    CorpusProfile.append(spark, docs(101 to 200),
      "grp", "txt", "id", "num", 32, 64, store, "p")
    val (_, kmvV1) = store.snapshot(spark, "p_kmv")
    val (_, lvlV1) = store.snapshot(spark, "p_lvl")
    assert(kmvV1 > kmvV0 && lvlV1 > lvlV0,
      "append must commit successor versions, never overwrite in place")
  }
}
