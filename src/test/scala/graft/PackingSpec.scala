package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Packing

class PackingSpec extends SparkSpec {

  private val budget = 100L

  private def corpus(n: Int = 200) = {
    val s = spark; import s.implicits._
    // token counts 5..54, deterministic
    spark.range(n).select(col("id").as("doc_id"),
      (col("id") * 17 % 50 + 5).as("n_tok"))
  }

  test("assignment equals the single-window global prefix-sum reference") {
    val got = Packing.assignPacks(corpus(), "doc_id", "n_tok", budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    // reference: one global window (fine at test scale)
    val w = Window.orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = corpus()
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("pack_id", expr(s"(cum - n_tok) div ${budget}L"))
      .withColumn("pack_pos", row_number().over(
        Window.partitionBy(col("pack_id"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      .select(col("doc_id"), col("n_tok"), col("pack_id"), col("pack_pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(got === ref)
  }

  test("docs stay whole; packs overflow the budget by at most one document") {
    val manifest = Packing.packManifest(
        Packing.assignPacks(corpus(), "doc_id", "n_tok", budget), "n_tok")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(manifest.map(_._2).sum === 200L) // every doc assigned exactly once
    // each pack, minus its largest possible overflow doc, is under budget:
    // runningTotalBefore < (pack+1)*budget for the last doc means
    // total_tokens - last_doc_tokens < budget; max doc is 54 tokens here
    manifest.foreach { case (_, _, total) =>
      assert(total < budget + 54, s"pack exceeds budget by more than one doc: $total")
    }
    // all packs except the last are at least budget-54 full (no gaps)
    val sorted = manifest.sortBy(_._1)
    sorted.init.foreach { case (_, _, total) =>
      assert(total > budget - 54, s"underfull non-final pack: $total")
    }
    // pack ids are contiguous from 0
    assert(sorted.map(_._1).toSeq === (0L until sorted.length).toSeq)
  }

  test("assignment is layout-independent: repartitioned input gives identical packs") {
    val a = Packing.assignPacks(corpus(), "doc_id", "n_tok", budget)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getInt(3))).toMap
    val b = Packing.assignPacks(corpus().repartition(7), "doc_id", "n_tok", budget)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getInt(3))).toMap
    assert(a === b)
  }

  test("pack_pos numbers each pack 1..n in canonical order") {
    val rows = Packing.assignPacks(corpus(), "doc_id", "n_tok", budget)
      .collect().map(r => (r.getLong(2), r.getInt(3)))
    rows.groupBy(_._1).foreach { case (pack, ps) =>
      assert(ps.map(_._2).sorted.toSeq === (1 to ps.length).toSeq,
        s"pack $pack positions not 1..n")
    }
  }

  test("randomized invariants: whole docs, contiguous packs, window-reference equality") {
    val rnd = new scala.util.Random(42) // deterministic cases
    for (_ <- 1 to 5) {
      val n = 50 + rnd.nextInt(150)
      val budget = 50L + rnd.nextInt(200)
      val maxTok = 5 + rnd.nextInt(40)
      val s = spark; import s.implicits._
      val toks = (0L until n).map(i => (i, 1L + rnd.nextInt(maxTok)))
      val df = toks.toDF("doc_id", "n_tok")
      val got = Packing.assignPacks(df, "doc_id", "n_tok", budget)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      assert(got.length === n && got.map(_._1).distinct.length === n)
      got.groupBy(_._3).foreach { case (_, rs) =>
        assert(rs.map(_._4).sorted.toSeq === (1 to rs.length)) }
      val packIds = got.map(_._3).distinct.sorted
      assert(packIds.toSeq === (0L until packIds.length).toSeq, s"non-contiguous: $packIds")
      // overflow bound: total per pack minus its max doc < budget
      got.groupBy(_._3).foreach { case (p, rs) =>
        val total = rs.map(_._2).sum
        assert(total - rs.map(_._2).max < budget, s"pack $p over budget: $total")
      }
    }
  }

  test("no global single-partition window in the plan") {
    val plan = Packing.assignPacks(corpus(), "doc_id", "n_tok", budget)
      .queryExecution.executedPlan.toString
    // the running sum must hash-partition by _bucket, never SinglePartition
    assert(!plan.contains("SinglePartition"),
      s"prefix sum must not serialize into one partition:\n$plan")
  }
}
