package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval

class RetrievalSpec extends SparkSpec {

  private def corpus() = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "spark spark spark joins data"),      // tf(spark)=3, short
      (2L, "spark data pipelines at scale with spark executors and shuffle"),
      (3L, "hash joins and sort merge joins"),
      (4L, "nothing relevant here at all"),
      (5L, "spark"),                             // tiny doc, max length boost
      (6L, "common common common common common common common common spark")
    ).toDF("doc_id", "text")
  }

  test("bm25 ranks term-frequency and length-normalized matches, drops non-matches") {
    val out = Retrieval.bm25TopK(corpus(), "doc_id", "text",
      Seq("spark", "hash"), k = 10).collect()
    val ids = out.map(_.getLong(0))
    assert(!ids.contains(4L), "doc without any query term must not appear")
    assert(ids.length === 5)
    // scores strictly ordered as emitted (desc, id asc on ties)
    val scores = out.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // a robust BM25 invariant on this corpus: doc 1 (tf=3 in 5 tokens)
    // outranks doc 2 (tf=2 in 10 tokens) — higher tf AND shorter
    val rank = ids.zipWithIndex.toMap
    assert(rank(1L) < rank(2L))
    // the hash-only doc matches exactly one term
    val row3 = out.find(_.getLong(0) == 3L).get
    assert(row3.getInt(1) === 1)
  }

  test("bm25 idf: a rarer term outweighs a common one at equal tf and dl") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "rare pad1 pad2"), (2L, "commonterm pad1 pad2"),
      (3L, "commonterm pad3 pad4"), (4L, "commonterm pad5 pad6")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("rare", "commonterm"), k = 4).collect()
    assert(out.head.getLong(0) === 1L,
      "df=1 term must outscore df=3 term at identical tf/dl")
  }

  test("bm25 is deterministic under repartitioning and k bounds the output") {
    val a = Retrieval.bm25TopK(corpus(), "doc_id", "text", Seq("spark"), k = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val b = Retrieval.bm25TopK(corpus().repartition(7), "doc_id", "text",
      Seq("spark"), k = 2).collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(a === b)
    assert(a.length === 2)
  }

  test("bm25 plan is narrow: no wide exchange, top-k is TakeOrdered") {
    val plan = Retrieval.bm25TopK(corpus(), "doc_id", "text",
      Seq("spark", "hash"), k = 3).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected a bounded top-k, got:\n$plan")
    assert(!plan.contains("hashpartitioning"),
      s"per-doc scoring must not shuffle the corpus:\n$plan")
  }

  test("bm25TopK accepts terms with column-name-special characters") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "v1.0 release notes"), (2L, "plain text")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("v1.0"), k = 2).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("bm25Against matches per-probe bm25TopK for every probe") {
    val s = spark; import s.implicits._
    val probes = Seq(
      (10L, Seq("spark", "hash")),
      (20L, Seq("spark")),
      (30L, Seq("joins", "common", "data"))
    ).toDF("probe_id", "pterms")
    val batch = Retrieval.bm25Against(corpus(), "doc_id", "text",
      probes, "probe_id", "pterms", k = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .groupBy(_._1)
    for ((pid, terms) <- Seq(10L -> Seq("spark", "hash"),
        20L -> Seq("spark"), 30L -> Seq("joins", "common", "data"))) {
      val single = Retrieval.bm25TopK(corpus(), "doc_id", "text", terms, k = 4)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
      val got = batch(pid).map(t => (t._2, t._3, t._4))
        .sortBy(t => (-t._3, t._1)).toSeq
      assert(got === single, s"probe $pid diverged from bm25TopK")
    }
  }

  test("bm25Against dedups probe terms and ignores unseen/empty terms") {
    val s = spark; import s.implicits._
    val probes = Seq((1L, Seq("spark", "SPARK", "", "neverseen"))).toDF("probe_id", "pterms")
    val batch = Retrieval.bm25Against(corpus(), "doc_id", "text",
      probes, "probe_id", "pterms", k = 10).collect()
    val single = Retrieval.bm25TopK(corpus(), "doc_id", "text",
      Seq("spark"), k = 10).collect()
    assert(batch.length === single.length)
    assert(batch.map(_.getDouble(3)).sorted.toSeq ===
      single.map(_.getDouble(2)).sorted.toSeq)
  }

  test("bm25Against maxDfFrac prunes stopword-dense terms from scoring") {
    val s = spark; import s.implicits._
    // "the" appears in every doc; "rare" in one
    val docs = Seq(
      (1L, "the rare signal"), (2L, "the noise"), (3L, "the other noise")
    ).toDF("doc_id", "text")
    val probes = Seq((1L, Seq("the", "rare"))).toDF("probe_id", "pterms")
    val pruned = Retrieval.bm25Against(docs, "doc_id", "text",
      probes, "probe_id", "pterms", k = 10, maxDfFrac = 0.5).collect()
    // only "rare" survives the df cap → only doc 1 matches
    assert(pruned.map(_.getLong(1)).toSeq === Seq(1L))
    assert(pruned.head.getInt(2) === 1)
  }

  test("bm25Against is deterministic under repartitioning of both sides") {
    val s = spark; import s.implicits._
    val probes = Seq((10L, Seq("spark", "hash")), (20L, Seq("data"))).toDF("probe_id", "pterms")
    def run(d: org.apache.spark.sql.DataFrame, p: org.apache.spark.sql.DataFrame) =
      Retrieval.bm25Against(d, "doc_id", "text", p, "probe_id", "pterms", k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(run(corpus(), probes) === run(corpus().repartition(7), probes.repartition(3)))
  }

  private def leg(s: org.apache.spark.sql.SparkSession,
      rows: Seq[(Long, Long, Int)]) = {
    import s.implicits._
    rows.toDF("probe_id", "doc_id", "rank")
  }

  test("rrfFuse sums 1/(k+rank) per leg, hand-checked, missing legs contribute nothing") {
    val s = spark
    // probe 1: doc 10 ranks 1 in BOTH legs; doc 20 only lexical (rank 2);
    // doc 30 only vector (rank 2)
    val lex = leg(s, Seq((1L, 10L, 1), (1L, 20L, 2)))
    val vec = leg(s, Seq((1L, 10L, 1), (1L, 30L, 2)))
    val out = Retrieval.rrfFuse(Seq(lex, vec), kRrf = 60, k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_legs"), r.getAs[Double]("rrf"), r.getAs[Int]("rrf_rank")))).toMap
    val r1 = 1.0 / 61.0; val r2 = 1.0 / 62.0
    def rd(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(10L) === ((2, rd(r1 + r1), 1)))
    // both single-leg docs score 1/62; doc_id breaks the tie
    assert(out(20L) === ((1, rd(r2), 2)))
    assert(out(30L) === ((1, rd(r2), 3)))
  }

  test("rrfFuse keeps probes independent and k bounds each probe's output") {
    val s = spark
    val lex = leg(s, (1 to 8).map(i => (1L, i.toLong, i)) ++ Seq((2L, 99L, 1)))
    val vec = leg(s, (1 to 8).map(i => (1L, (9 - i).toLong, i)))
    val out = Retrieval.rrfFuse(Seq(lex, vec), kRrf = 60, k = 3).collect()
    val byProbe = out.groupBy(_.getAs[Long]("probe_id"))
    assert(byProbe(1L).length === 3, "k must cap per probe")
    assert(byProbe(2L).map(_.getAs[Long]("doc_id")).toSeq === Seq(99L))
    // probe 1: doc d has lex rank d and vec rank 9-d → fused is maximized
    // at the balanced middle (1/(60+d) + 1/(69-d) is symmetric around
    // d=4.5 and LOWEST there; the extremes d=1, d=8 tie highest, doc_id
    // tie-break puts 1 first, then 8, then the 2/7 tie)
    val p1 = byProbe(1L).sortBy(_.getAs[Int]("rrf_rank")).map(_.getAs[Long]("doc_id")).toSeq
    assert(p1 === Seq(1L, 8L, 2L))
  }

  test("rrfFuse is deterministic under repartitioning and leg order changes nothing") {
    val s = spark
    val lex = leg(s, Seq((1L, 10L, 1), (1L, 20L, 2), (2L, 10L, 1)))
    val vec = leg(s, Seq((1L, 20L, 1), (2L, 30L, 1), (2L, 10L, 2)))
    def run(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      Retrieval.rrfFuse(Seq(a, b), kRrf = 60, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getDouble(3), r.getInt(4))).sortBy(t => (t._1, t._5)).toSeq
    assert(run(lex, vec) === run(lex.repartition(7), vec.repartition(3)))
    // two addends commute bit-exactly, so leg order cannot matter
    assert(run(lex, vec) === run(vec, lex))
  }
  test("rrfFuseWeighted: weight scales each leg's addends; weight 1.0 is bit-identical") {
    val s = spark
    val lex = leg(s, Seq((1L, 10L, 1), (1L, 20L, 2)))
    val vec = leg(s, Seq((1L, 10L, 1), (1L, 30L, 2)))
    def collectMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_legs"), r.getAs[Double]("rrf"), r.getAs[Int]("rrf_rank")))).toMap
    // all-1.0 weights == the unweighted form, down to the last bit
    val unweighted = collectMap(Retrieval.rrfFuse(Seq(lex, vec), kRrf = 60, k = 10))
    val ones = collectMap(Retrieval.rrfFuseWeighted(
      Seq(lex -> 1.0, vec -> 1.0), kRrf = 60, k = 10))
    assert(ones === unweighted)
    // lexical 2x: doc 20 (lex-only, rank 2) now outranks doc 30 (vec-only,
    // rank 2), and doc 10's sum is 2/61 + 1/61
    val weighted = collectMap(Retrieval.rrfFuseWeighted(
      Seq(lex -> 2.0, vec -> 1.0), kRrf = 60, k = 10))
    def rd(x: Double) = math.rint(x * 1e6) / 1e6
    assert(weighted(10L) === ((2, rd(2.0 / 61.0 + 1.0 / 61.0), 1)))
    assert(weighted(20L)._3 === 2 && weighted(30L)._3 === 3)
    assert(weighted(20L)._2 === rd(2.0 / 62.0))
    // zero weight: the leg stops contributing but still counts in n_legs
    val zeroVec = collectMap(Retrieval.rrfFuseWeighted(
      Seq(lex -> 1.0, vec -> 0.0), kRrf = 60, k = 10))
    assert(zeroVec(10L)._1 === 2)               // seen by both legs
    assert(zeroVec(10L)._2 === rd(1.0 / 61.0))  // but only lex scores
    assert(zeroVec(30L)._2 === 0.0)
  }
}
