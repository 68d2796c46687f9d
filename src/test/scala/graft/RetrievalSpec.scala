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
}
