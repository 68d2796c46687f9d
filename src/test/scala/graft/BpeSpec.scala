package graft

import graft.operators.{Bpe, TableStore}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BpeTokenCount.{bpe_token_count, bpe_tokens}

/** BPE trainer + native encoder: merge-order determinism, the
  * encode∘decode identity, parity of the native scan with the shared
  * `(a)(b)` string-replace representation the SQL oracle replays, and the
  * TableStore vocabulary round-trip. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (String, Int)*) =
    rows.flatMap { case (w, n) => Seq.fill(n)(w) }.toDF("text")

  test("Sennrich fixture: merges follow pair frequency with deterministic tie-break") {
    // low x5, lower x2, newest x6, widest x3 — classic demo corpus
    val df = corpus(("low", 5), ("lower", 2), ("newest", 6), ("widest", 3))
    val merges = Bpe.train(Bpe.wordFreq(df, "text"), nMerges = 4)
    // pair counts round 1: (e,s) 9, (s,t) 9, (l,o) 7, (o,w) 7, (w,e) 8…
    // tie (e,s)/(s,t) resolves to (e,s) by left-symbol order; then (es,t) 9
    assert(merges.map(m => (m.left, m.right)).take(2) === Seq(("e", "s"), ("es", "t")))
    // training twice is bit-identical (deterministic argmax)
    val again = Bpe.train(Bpe.wordFreq(df, "text"), nMerges = 4)
    assert(merges === again)
  }

  test("encode/decode identity: concatenating a word's tokens restores the word") {
    val docs = Seq("the newest lowest low low widest estates",
      "newer wider lower the the estate", "stationary stations nest west")
      .toDF("text")
    val merges = Bpe.mergePairs(Bpe.train(Bpe.wordFreq(docs, "text"), nMerges = 10))
    val words = docs.select(explode(regexp_extract_all(lower(col("text")),
      lit("[a-z]+"), lit(0))).as("w")).distinct()
    val bad = words
      .select(col("w"), array_join(bpe_tokens(col("w"), merges), "").as("rt"))
      .filter(col("w") =!= col("rt"))
      .count()
    assert(bad === 0, "tokens must concatenate back to the original word")
  }

  test("native scan equals the (a)(b) string-replace chain the oracle replays") {
    val docs = Seq("banana bandana ananas", "aaaa abab ababab",
      "the quick brown fox low lower lowest").toDF("text")
    val merges = Bpe.train(Bpe.wordFreq(docs, "text"), nMerges = 6)
    val pairs = Bpe.mergePairs(merges)
    val words = docs.select(explode(regexp_extract_all(lower(col("text")),
      lit("[a-z]+"), lit(0))).as("w")).distinct()
    // replay: char-delimited repr + one replace per merge in rank order —
    // EXACTLY what the DuckDB oracle computes
    val replayed = pairs.foldLeft(
      regexp_replace(col("w"), "(.)", "($1)")) { case (c, (a, b)) =>
      org.apache.spark.sql.functions.replace(c, lit(s"($a)($b)"), lit(s"(${a + b})"))
    }
    val replayedCount = size(split(expr("substring(replayed, 2, length(replayed) - 2)"), "\\)\\("))
    val diverged = words
      .withColumn("replayed", replayed)
      .withColumn("native_n", bpe_token_count(col("w"), pairs))
      .withColumn("replay_n", replayedCount)
      .withColumn("native_toks", array_join(bpe_tokens(col("w"), pairs), ")("))
      .filter(col("native_n") =!= col("replay_n") ||
        concat(lit("("), col("native_toks"), lit(")")) =!= col("replayed"))
      .count()
    assert(diverged === 0,
      "native greedy scan and the string-replace representation must agree exactly")
  }

  test("vocabulary round-trips through TableStore in rank order") {
    val docs = corpus(("low", 5), ("newest", 6))
    val merges = Bpe.train(Bpe.wordFreq(docs, "text"), nMerges = 5)
    val store = new TableStore(tmpDir("bpe-vocab"))
    Bpe.save(spark, merges, store, "vocab")
    assert(Bpe.load(spark, store, "vocab") === merges)
  }

  test("trainer stops early when no pairs remain (single-char vocabulary)") {
    val docs = corpus(("a", 3), ("b", 2))
    val merges = Bpe.train(Bpe.wordFreq(docs, "text"), nMerges = 5)
    assert(merges.isEmpty)
  }

  test("token counts are bounded by chars and at least words") {
    val docs = Seq("the newest lowest estates in the west").toDF("text")
    val merges = Bpe.mergePairs(Bpe.train(Bpe.wordFreq(docs, "text"), nMerges = 8))
    val row = docs.select(
      bpe_token_count(col("text"), merges).as("n"),
      size(split(trim(col("text")), " ")).as("n_words"),
      length(regexp_replace(col("text"), "[^a-z ]", "")).as("n_az_sp")).head()
    assert(row.getInt(0) >= row.getInt(1), "at most chars merge fully to one token per word")
    assert(row.getInt(0) <= row.getInt(2), "at least one token per character is the ceiling")
  }
}
