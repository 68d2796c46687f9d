package graft

import graft.operators.Chunking

class ChunkingSpec extends SparkSpec {

  private def doc(n: Int) = {
    val s = spark; import s.implicits._
    Seq((1L, (1 to n).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
  }

  test("short docs yield exactly one chunk equal to the whole text") {
    val rows = Chunking.chunkByTokens(doc(5), "doc_id", "text", maxTokens = 10)
      .collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
    assert(rows.toSeq === Seq((0, "t1 t2 t3 t4 t5", 5)))
  }

  test("overlapping windows cover every token with the agreed stride") {
    // 10 tokens, max 4, overlap 1 → stride 3 → ceil(9/3) = 3 chunks
    val rows = Chunking.chunkByTokens(doc(10), "doc_id", "text",
        maxTokens = 4, overlap = 1)
      .collect().map(r => (r.getInt(1), r.getString(2))).sortBy(_._1)
    assert(rows.toSeq === Seq(
      (0, "t1 t2 t3 t4"), (1, "t4 t5 t6 t7"), (2, "t7 t8 t9 t10")))
    // consecutive chunks share exactly `overlap` tokens
    assert(rows(0)._2.split(" ").last === rows(1)._2.split(" ").head)
  }

  test("the final window may be short but never empty; every token appears") {
    // 11 tokens, max 4, overlap 0 → chunks of 4,4,3
    val rows = Chunking.chunkByTokens(doc(11), "doc_id", "text", maxTokens = 4)
      .collect().map(r => (r.getInt(1), r.getInt(3))).sortBy(_._1)
    assert(rows.map(_._2).toSeq === Seq(4, 4, 3))
  }

  test("chunking is a narrow plan — no exchange") {
    val s = spark
    import org.apache.spark.sql.functions._
    val wide = s.range(100).select(col("id").as("doc_id"),
      concat_ws(" ", (1 to 30).map(i => lit(s"w$i")): _*).as("text"))
    val plan = Chunking.chunkByTokens(wide, "doc_id", "text", 8, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("parameter guards") {
    intercept[IllegalArgumentException] {
      Chunking.chunkByTokens(doc(5), "doc_id", "text", maxTokens = 4, overlap = 4)
    }
    intercept[IllegalArgumentException] {
      Chunking.chunkByTokens(doc(5), "doc_id", "text", maxTokens = 0)
    }
  }
}
