package graft

import org.apache.spark.sql.functions._
import graft.operators.Decontaminate

class DecontaminateSpec extends SparkSpec {

  // A "benchmark" of two questions and a corpus where doc 11 quotes
  // benchmark doc 1 verbatim mid-text, doc 12 paraphrases (shares a run of
  // 5+ tokens), and docs 13/14 are clean.
  private def probes() = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "what is the capital city of the republic of france exactly"),
      (2L, "compute the sum of the first one hundred natural numbers now"))
      .toDF("doc_id", "text")
  }

  private def corpus() = {
    val s = spark; import s.implicits._
    Seq(
      (11L, "quiz answer what is the capital city of the republic of france exactly paris obviously"),
      (12L, "to compute the sum of the first one hundred naturals use gauss"),
      (13L, "spark shuffles partition data across executors during wide transformations"),
      (14L, "entirely unrelated prose about rivers forests and mountain weather patterns"))
      .toDF("doc_id", "text")
  }

  test("contamination report flags verbatim and long-overlap docs, not clean ones") {
    val rep = Decontaminate.contaminationReport(
        corpus(), probes(), "doc_id", "text", n = 5)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Int]("n_sh"), r.getAs[Long]("n_hits"), r.getAs[Double]("contaminated_frac")))
      .toMap
    // doc 11: 15 tokens → 11 distinct 5-shingles; the 10-token quote of
    // probe 1 (11 tokens incl. trailing word) contributes 11-token run →
    // 7 shared 5-shingles
    assert(rep.contains(11L) && rep.contains(12L))
    assert(!rep.contains(13L) && !rep.contains(14L))
    val (nSh11, hits11, frac11) = rep(11L)
    assert(hits11 >= 5 && hits11 <= nSh11)
    assert(math.abs(frac11 - hits11.toDouble / nSh11) < 1e-3)
  }

  test("minSharedShingles raises the bar") {
    val strict = Decontaminate.contaminationReport(
        corpus(), probes(), "doc_id", "text", n = 5, minSharedShingles = 5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(strict.contains(11L)) // verbatim quote survives a strict bar
    val loose = Decontaminate.contaminationReport(
        corpus(), probes(), "doc_id", "text", n = 5, minSharedShingles = 1)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(loose === Set(11L, 12L))
  }

  test("decontaminate = corpus minus report ids, all columns intact") {
    val cleaned = Decontaminate.decontaminate(
      corpus(), probes(), "doc_id", "text", n = 5)
    assert(cleaned.columns.toSeq === Seq("doc_id", "text"))
    assert(cleaned.select("doc_id").collect().map(_.getLong(0)).toSet === Set(13L, 14L))
  }

  test("probe side broadcasts; corpus aggregation sees only hit rows") {
    val plan = Decontaminate.contaminationReport(
        corpus(), probes(), "doc_id", "text", n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"probe join should broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus must not shuffle for the probe join:\n$plan")
  }

  test("empty probe set yields an empty report and an untouched corpus") {
    val emptyProbes = probes().filter(lit(false))
    assert(Decontaminate.contaminationReport(
      corpus(), emptyProbes, "doc_id", "text", n = 5).count() === 0L)
    assert(Decontaminate.decontaminate(
      corpus(), emptyProbes, "doc_id", "text", n = 5).count() === corpus().count())
  }
}
