package graft

import org.apache.spark.sql.graft.GraftFunctions

/** SQL surface of the native expressions. */
class GraftFunctionsSpec extends SparkSpec {

  test("native functions are callable from spark.sql after registration") {
    GraftFunctions.register(spark)
    val dot = spark.sql("SELECT vec_dot(array(1d, 2d, 3d), array(4d, 5d, 6d)) AS d")
      .collect().head.getDouble(0)
    assert(dot === 32.0)

    val sh = spark.sql(
      "SELECT size(shingle_hashes(split('a b c d', ' '), 2)) AS n")
      .collect().head.getInt(0)
    assert(sh === 3)

    val sig = spark.sql(
      "SELECT size(minhash_signature(split('a b c d', ' '), 2, 16)) AS n")
      .collect().head.getInt(0)
    assert(sig === 16)

    val sim = spark.sql(
      """SELECT simhash64(split('x y z', ' ')) = simhash64(split('z y x', ' ')) AS eq""")
      .collect().head.getBoolean(0)
    assert(sim)

    val st = spark.sql("SELECT token_stats(split('ab cde', ' ')).n_chars AS c")
      .collect().head.getLong(0)
    assert(st === 5L)

    val hp = spark.sql(
      "SELECT hyperplane_sig(array(1d, 2d), 5, 'test:0') AS s")
      .collect().head.getLong(0)
    assert(hp >= 0L && hp < 32L) // 5 bits packed

    val agree = spark.sql(
      "SELECT sig_agreement(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS n")
      .collect().head.getInt(0)
    assert(agree === 2)

    // 5 tokens, k=2 -> 4 shingles, w=2 -> 3 windows, minima dedup to <= 3
    val wf = spark.sql(
      "SELECT size(winnowed_fingerprints(split('a b c d e', ' '), 2, 2)) AS n")
      .collect().head.getInt(0)
    assert(wf >= 1 && wf <= 3)
  }

  test("native winnowing fingerprints are value-identical to the declarative formulation") {
    import org.apache.spark.sql.functions._
    assume(java.nio.file.Files.exists(
      java.nio.file.Paths.get("/root/testdata/sf0.001/documents.parquet")),
      "driver fixtures not present")
    // the interpreted chain the native expression replaced — kept here as
    // the equivalence oracle (q53's DuckDB replay is the external pin)
    def hof(text: org.apache.spark.sql.Column, k: Int, w: Int) = {
      val t = split(lower(text), " ")
      val shingles = when(size(t) < k, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(t) - lit(k - 1)),
          i => array_join(slice(t, i, lit(k)), " ")))
      val hs = transform(shingles,
        s => conv(substring(md5(s), 1, 15), 16, 10).cast("long"))
      when(size(hs) < w, array().cast("array<long>"))
        .otherwise(array_distinct(transform(
          sequence(lit(1), size(hs) - lit(w - 1)),
          i => array_min(slice(hs, i, lit(w))))))
    }
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for ((k, w) <- Seq((3, 4), (2, 2), (5, 3))) {
      val both = docs.select(
        graft.functions.TextFunctions.winnowedFingerprints(col("text"), k, w).as("nat"),
        hof(col("text"), k, w).as("old"))
      assert(both.filter(col("nat") =!= col("old")).count() === 0,
        s"native/declarative winnowing diverged at k=$k w=$w")
    }
    // short-doc guards: fewer tokens than k, and fewer shingles than w
    val edge = spark.createDataFrame(Seq((1L, "a b"), (2L, "a"), (3L, "a b c d")))
      .toDF("id", "text")
    val eb = edge.select(
      graft.functions.TextFunctions.winnowedFingerprints(col("text"), 3, 4).as("nat"),
      hof(col("text"), 3, 4).as("old"))
    assert(eb.filter(col("nat") =!= col("old")).count() === 0)
    assert(eb.filter(size(col("nat")) =!= 0).count() === 0)
  }

  test("native hyperplane signature is bit-identical to the higher-order formulation") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val both = emb.select(
      VectorFunctions.hyperplaneSignature(col("embedding"), 12, "lsh:0").as("nat"),
      VectorFunctions.hyperplaneSignatureHof(col("embedding"), 12, "lsh:0").as("hof"))
    assert(both.filter(col("nat") =!= col("hof")).count() === 0)
    // and a second (bits, seed) point to catch packing/seed-chain slips
    val both2 = emb.select(
      VectorFunctions.hyperplaneSignature(col("embedding"), 5, "ndp:3").as("nat"),
      VectorFunctions.hyperplaneSignatureHof(col("embedding"), 5, "ndp:3").as("hof"))
    assert(both2.filter(col("nat") =!= col("hof")).count() === 0)
  }

  test("multiprobe buckets: exact bucket first, one-bit flips at the smallest margins") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val nBits = 7
    val rows = emb.limit(50).select(
        col("embedding"),
        VectorFunctions.hyperplaneSignature(col("embedding"), nBits, "mp:0").as("sig"),
        VectorFunctions.hyperplaneProbes(col("embedding"), nBits, "mp:0", 3).as("ps"))
      .collect()
    // reference weight matrix — the same md5 derivation the oracle uses
    val md = java.security.MessageDigest.getInstance("MD5")
    def weight(j: Int, i: Int): Double = {
      val d = md.digest(s"mp:0:$j:$i".getBytes("UTF-8"))
      val h40 = java.lang.Long.parseLong(d.take(5).map("%02x".format(_)).mkString, 16)
      (h40 % 100000L) / 50000.0 - 1.0
    }
    rows.foreach { r =>
      val v = r.getSeq[Float](0).map(_.toDouble)
      val sig = r.getLong(1)
      val ps = r.getSeq[Long](2)
      assert(ps.length === 4)
      assert(ps.head === sig) // exact bucket first
      val proj = (0 until nBits).map(j =>
        v.indices.map(i => v(i) * weight(j, i)).sum)
      val wantFlips = (0 until nBits).sortBy(j => (math.abs(proj(j)), j)).take(3)
      ps.tail.zip(wantFlips).foreach { case (p, j) =>
        assert(p === (sig ^ (1L << j)), s"flip order mismatch at bit $j")
      }
    }
  }

  test("non-literal shingle size is rejected with a clear error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_hashes(split('a b', ' '), 1 + 1)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("integer literal") ||
      e.getCause != null && e.getCause.getMessage.contains("integer literal"))
  }

  test("nfc_normalize composes decomposed accents; composed text is untouched") {
    GraftFunctions.register(spark)
    val s = spark; import s.implicits._
    val decomposed = "Cafe\u0301" // e + combining acute, 5 codepoints
    val composed = "Caf\u00e9"    // single composed codepoint, 4
    val got = Seq((decomposed, composed)).toDF("d", "c")
      .selectExpr("nfc_normalize(d) AS nd", "nfc_normalize(c) AS nc",
        "length(nfc_normalize(d)) AS ld",
        "nfc_normalize(CAST(NULL AS STRING)) AS nnull")
      .head()
    assert(got.getString(0) === composed)
    assert(got.getString(1) === composed)
    assert(got.getInt(2) === 4)
    assert(got.isNullAt(3))
  }

  test("normalizeText: NFC + controls-to-space + collapse + trim, boundary-safe") {
    val s = spark; import s.implicits._
    val got = Seq(
      ("  Cafe\u0301  du\t\tmonde \n", "Caf\u00e9 du monde"),
      ("a\u0001b", "a b"),   // control IS a boundary, never a join
      ("a \u0001 b", "a b"), // never double-spaced either
      ("already clean", "already clean"))
      .toDF("raw", "want")
      .select(graft.functions.TextFunctions.normalizeText($"raw").as("got"), $"want")
      .collect()
    got.foreach(r => assert(r.getString(0) === r.getString(1)))
  }
}
