package graft

import org.apache.spark.sql.functions._
import graft.operators.Vocab

class VocabSpec extends SparkSpec {

  private def corpus() = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ran"),
      (3L, "a dog sat on the mat"),
      (4L, "one"))
      .toDF("doc_id", "text")
  }

  test("bigram counts include every occurrence, not per-doc distinct") {
    val counts = Vocab.ngramCounts(corpus(), "text", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("the cat") === 2L)  // docs 1 and 2
    assert(counts("on the") === 2L)   // docs 1 and 3
    assert(counts("the mat") === 2L)
    assert(counts("cat sat") === 1L)
    assert(!counts.contains("one"))   // sub-n docs contribute nothing
    // total occurrences = sum over docs of max(tokens - 1, 0)
    assert(counts.values.sum === (5 + 2 + 5 + 0))
  }

  test("topNgrams is count-desc with deterministic lexicographic tie-break") {
    val top = Vocab.topNgrams(corpus(), "text", 2, 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top === Seq(
      ("on the", 2L), ("sat on", 2L), ("the cat", 2L), ("the mat", 2L)))
  }

  test("unigram counts equal token frequencies") {
    val counts = Vocab.ngramCounts(corpus(), "text", 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("the") === 4L)
    assert(counts("one") === 1L)
  }

  test("tf-idf surfaces distinctive terms over ubiquitous ones") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "common common common zebra"),
      (2L, "common words everywhere today"),
      (3L, "common words again here"))
      .toDF("doc_id", "text")
    val top = graft.operators.Vocab.topTfIdfTerms(df, "doc_id", "text", k = 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("term"), r.getAs[Long]("tf"), r.getAs[Int]("rank"))).toMap
    // "common" is in every doc (idf = ln(4/4)+1 = 1); "zebra" df=1 →
    // idf = ln(2)+1 ≈ 1.69 beats tf=3 × 1.0? 3.0 vs 1.69 — tf wins here,
    // so doc 1's top term is "common" (tf=3); doc 2/3 pick their rarer words
    assert(top(1L)._1 === "common" && top(1L)._2 === 3L)
    assert(top(2L)._1 !== "common") // tf all 1 → highest idf (unique) wins
    assert(top(3L)._1 !== "common")
    assert(top.values.forall(_._3 === 1))
  }

  test("unigram surprisal matches the hand-computed add-1 model") {
    implicit val scope: graft.operators.CacheScope = new graft.operators.CacheScope
    val s = spark; import s.implicits._
    // corpus: c(a)=2, c(b)=2, c(c)=1 → T=5, V=3, p = (c+1)/8
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = Vocab.unigramSurprisal(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val pAB = 3.0 / 8.0; val pC = 2.0 / 8.0
    assert(got(1L)._1 === 3L)
    assert(math.abs(got(1L)._2 - -math.log(pAB)) < 1e-12) // all tokens at p=3/8
    assert(got(2L)._1 === 2L)
    assert(math.abs(got(2L)._2 - (-math.log(pAB) - math.log(pC)) / 2.0) < 1e-12)
    scope.release()
  }

  test("bigram surprisal matches the hand-computed add-1-over-history model") {
    implicit val scope: graft.operators.CacheScope = new graft.operators.CacheScope
    val s = spark; import s.implicits._
    // doc1 bigrams: "a b"×2, "b a"×1; doc2: "a c"×1; doc3 has none but
    // its token still counts into the vocabulary.
    // corpus: c(a b)=2, c(b a)=1, c(a c)=1 → c(a·)=3, c(b·)=1;
    // V = {a, b, c, solo} = 4
    // p(b|a) = (2+1)/(3+4) = 3/7;  p(a|b) = (1+1)/(1+4) = 2/5
    // p(c|a) = (1+1)/(3+4) = 2/7
    val df = Seq((1L, "a b a b"), (2L, "a c"), (3L, "solo")).toDF("doc_id", "text")
    val got = Vocab.bigramSurprisal(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L)._1 === 3L)
    val want1 = (2.0 * -math.log(3.0 / 7.0) + -math.log(2.0 / 5.0)) / 3.0
    assert(math.abs(got(1L)._2 - want1) < 1e-12)
    assert(got(2L)._1 === 1L)
    assert(math.abs(got(2L)._2 - -math.log(2.0 / 7.0)) < 1e-12)
    assert(!got.contains(3L)) // one token → no bigram to score
    scope.release()
  }

  test("bigram surprisal sees scrambled order that the unigram model cannot") {
    implicit val scope: graft.operators.CacheScope = new graft.operators.CacheScope
    val s = spark; import s.implicits._
    // identical unigram bags; doc 2 scrambles the dominant word order
    val base = (1 to 20).map(i => (i.toLong, "the quick brown fox jumps"))
    val df = (base :+ (99L, "fox the jumps brown quick")).toDF("doc_id", "text")
    val uni = Vocab.unigramSurprisal(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val bi = Vocab.bigramSurprisal(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(uni(99L) - uni(1L)) < 1e-12) // unigram: indistinguishable
    assert(bi(99L) > bi(1L) + 0.5) // bigram: the scramble stands out
    scope.release()
  }

  test("plan: partial-agg before the shuffle, top-k never sorts globally") {
    val wide = spark.range(10000).select(
      concat(lit("tok"), col("id") % 50, lit(" tok"), col("id") % 7).as("text"))
    val plan = Vocab.topNgrams(wide, "text", 2, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count"),
      s"heavy hitters must combine map-side:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must not global-sort the vocabulary:\n$plan")
  }
}
