package graft

import org.apache.spark.sql.functions.{col, concat, lit}

import graft.operators.{PostingsIndex, TableStore}

/** The revision path's READ cost contract (the companion of
  * [[OverlaySpec]]'s committed-bytes contract): a [[PostingsIndex]]
  * upsert's bytes READ must be ∝ the batch's buckets — under the
  * standard clustered-table sizing rule (bucket count grows with the
  * corpus so per-bucket bytes hold a target), a fixed revision batch
  * reads the SAME bytes at 10× the corpus, because
  *
  *  - the exact-df subtraction resolves old term lists from the
  *    doc_id-bucketed docs tier, pruned at the directory level to the
  *    batch's buckets (never the corpus-sized postings tier);
  *  - the insert screen on the append path prunes the same way.
  *
  * Measured from the Hadoop filesystem's global "file"-scheme read
  * counter — local[*] runs every task in this JVM, so the counter sees
  * exactly the parquet bytes the drain's jobs opened. The fixture's
  * vocabulary is bounded (constant in the corpus size), so the
  * vocabulary-sized termstats merge cannot confound the measurement.
  */
class PrunedReadSpec extends SparkSpec {

  private def ddf(ids: Range, suffix: String = "") = {
    val s = spark; import s.implicits._
    ids.map(i => (i.toLong,
      s"alpha${i % 13} common beta${i % 7} shared$suffix")).toDF("doc_id", "text")
  }

  private def fsBytesRead(): Long = {
    val st = org.apache.hadoop.fs.FileSystem.getGlobalStorageStatistics.get("file")
    if (st == null) 0L
    else Option(st.getLong("bytesRead")).map(_.longValue).getOrElse(0L)
  }

  private def measure(body: => Unit): Long = {
    val before = fsBytesRead()
    body
    fsBytesRead() - before
  }

  test("upsert drain reads ∝ batch buckets — flat at 10x corpus under the bucket-sizing rule") {
    val small = new TableStore(tmpDir("pruned-ups-s"))
    val big = new TableStore(tmpDir("pruned-ups-b"))
    // per-bucket size held constant (~100 docs/bucket) as the corpus decades
    PostingsIndex.build(ddf(1 to 400), "doc_id", "text", small, "bm", docBuckets = 4)
    PostingsIndex.build(ddf(1 to 4000), "doc_id", "text", big, "bm", docBuckets = 40)
    val batch = ddf(10 to 14, "x") // 5 docs -> at most 5 touched buckets
    val dSmall = measure(
      PostingsIndex.upsert(spark, batch, "doc_id", "text", small, "bm"))
    val dBig = measure(
      PostingsIndex.upsert(spark, batch, "doc_id", "text", big, "bm"))
    assert(dSmall > 0 && dBig > 0, "the keyed read must actually read")
    assert(dBig < 3L * dSmall,
      s"10x the corpus must not move the upsert's bytes read: $dSmall -> $dBig")
    // the drain must never scan the corpus-sized tiers: its reads stay a
    // sliver of postings + docs even at the bigger corpus
    val (m, _) = PostingsIndex.readManifest(big, "bm").get
    val corpusBytes = big.byteSizeAt("bm_postings", m.postings) +
      big.byteSizeAt("bm_docs", m.docs)
    assert(dBig < corpusBytes / 2,
      s"a revision drain ($dBig B) must not scan the corpus tiers ($corpusBytes B)")
  }

  test("key-local upsert prunes BELOW the bucket level: sorted layout + pushed In set skip row groups") {
    // force many small row groups per bucket file so the sub-bucket
    // pruning is observable at test scale (at 100 TB the default 128 MB
    // groups give the same effect for free)
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = hc.get("parquet.block.size")
    val oldPage = hc.get("parquet.page.size")
    hc.setInt("parquet.block.size", 16 * 1024)
    hc.setInt("parquet.page.size", 8 * 1024)
    try {
      val store = new TableStore(tmpDir("pruned-rg"))
      // wide-ish docs so the tier clearly spans many row groups
      val s = spark; import s.implicits._
      val docs = (1 to 4000).map(i => (i.toLong,
        (0 until 40).map(j => s"w${(i * 31 + j * 17) % 7919}").mkString(" ") +
          s" alpha${i % 13} common")).toDF("doc_id", "text")
      PostingsIndex.build(docs, "doc_id", "text", store, "bm", docBuckets = 4)
      val tierBytes = {
        val (m, _) = PostingsIndex.readManifest(store, "bm").get
        store.byteSizeAt("bm_docs", m.docs)
      }
      // three CONSECUTIVE ids: <= 3 touched buckets, and inside each the
      // In filter lands on ~1 row group of the doc_id-sorted file
      val batch = docs.filter(col("doc_id").between(2000, 2002))
        .select(col("doc_id"), concat(col("text"), lit(" rev")).as("text"))
      val d = measure(
        PostingsIndex.upsert(spark, batch, "doc_id", "text", store, "bm"))
      assert(d > 0)
      assert(d < tierBytes / 4,
        s"a 3-doc key-local revision ($d B read) must prune below the " +
          s"bucket level of the $tierBytes B docs tier (bucket pruning " +
          "alone would read ~3/4 of it)")
    } finally {
      if (oldBlock == null) hc.unset("parquet.block.size") else hc.set("parquet.block.size", oldBlock)
      if (oldPage == null) hc.unset("parquet.page.size") else hc.set("parquet.page.size", oldPage)
    }
  }

  test("append drain's insert screen reads ∝ batch buckets — flat at 10x corpus") {
    val small = new TableStore(tmpDir("pruned-app-s"))
    val big = new TableStore(tmpDir("pruned-app-b"))
    PostingsIndex.build(ddf(1 to 400), "doc_id", "text", small, "bm", docBuckets = 4)
    PostingsIndex.build(ddf(1 to 4000), "doc_id", "text", big, "bm", docBuckets = 40)
    val batch = ddf(5001 to 5005) // brand-new ids, <= 5 touched buckets
    val dSmall = measure(
      PostingsIndex.append(spark, batch, "doc_id", "text", small, "bm"))
    val dBig = measure(
      PostingsIndex.append(spark, batch, "doc_id", "text", big, "bm"))
    assert(dSmall > 0 && dBig > 0)
    assert(dBig < 3L * dSmall,
      s"10x the corpus must not move the append's bytes read: $dSmall -> $dBig")
  }
}
