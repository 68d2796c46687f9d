package graft

import graft.operators.Repetition

class RepetitionSpec extends SparkSpec {

  private def corpus() = {
    val s = spark; import s.implicits._
    Seq(
      // 4 lines, "menu home" twice → dup_line_frac 0.5
      (1L, "menu home\nabout us page\nmenu home\ncontact form here"),
      // spammy bigram: "buy now" × 4 of 7 bigrams
      (2L, "buy now buy now buy now buy now"),
      // clean prose, one line, all bigrams distinct
      (3L, "the quick brown fox jumps over the lazy dog"),
      // single token: no bigram at all
      (4L, "hello"),
      // paragraph spacing: repeated BLANK lines must not count as dup lines
      (5L, "alpha beta\n\ngamma delta\n\nepsilon zeta"))
      .toDF("doc_id", "text")
  }

  test("duplicate-line fractions count repeated lines and their characters") {
    val m = Repetition.stats(corpus(), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_lines"), r.getAs[Double]("dup_line_frac"),
         r.getAs[Double]("dup_line_char_frac"))).toMap
    assert(m(1L)._1 === 4L)
    assert(m(1L)._2 === 0.5) // 2 of 4 lines are copies of each other
    // 2 × len("menu home") = 18 chars of 51 total
    assert(math.abs(m(1L)._3 - 18.0 / 51) < 1e-6)
    assert(m(3L)._2 === 0.0 && m(3L)._3 === 0.0)
    // doc 5: the two blank separator lines are excluded everywhere — 3
    // non-empty lines, all distinct, no dup fraction from the blanks
    assert(m(5L)._1 === 3L)
    assert(m(5L)._2 === 0.0 && m(5L)._3 === 0.0)
  }

  test("top bigram is the most frequent with deterministic tie-break") {
    val m = Repetition.stats(corpus(), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("top_bigram"), r.getAs[Double]("top_bigram_char_frac"))).toMap
    // "buy now" appears 4× among the 7 bigrams of doc 2
    assert(m(2L)._1 === "buy now")
    assert(math.abs(m(2L)._2 - 4.0 * 7 / 31) < 1e-6) // 4 × len("buy now") / 31 chars
    // doc 3: all bigrams count 1 → lexicographically smallest wins
    assert(m(3L)._1 === "brown fox")
    // doc 4: no bigram
    assert(m(4L)._1 === null && m(4L)._2 === 0.0)
  }

  test("filterRepetitive drops breaching docs and keeps the rest intact") {
    // bigram threshold raised: on toy-length docs even one occurrence of a
    // 9-char bigram exceeds the production default (9/43 ≈ 0.21)
    val kept = Repetition.filterRepetitive(corpus(), "doc_id", "text",
        maxTopBigramCharFrac = 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(3L, 4L)) // 1 breaches line rules, 2 breaches bigram rule
  }

  test("aggregation is partial-combined and keyed by doc (no per-doc hotspot)") {
    val plan = Repetition.stats(corpus(), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("partial_"),
      s"repetition counting must combine map-side:\n$plan")
    assert(!plan.contains("SinglePartition"), s"no single-partition stage:\n$plan")
  }
}
