package graft

import org.apache.spark.sql.functions._
import graft.operators.Pii

class PiiSpec extends SparkSpec {

  private def corpus() = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "mail alice@example.org or bob.smith+spam@sub.domain.co today"),
      (2L, "call +1-415-555-0100 and 44-207-555-0199 now"),
      (3L, "server 10.0.0.1 peered with 192.168.100.250"),
      (4L, "ssn 123-45-6789 on file"),
      (5L, "mixed: eve@x.io at +1-650-555-0123 from 172.16.0.9 id 987-65-4321"),
      (6L, "no pii here at all"),
      (7L, "dial 555-123-4567 or (650) 555-0199 or 555.867.5309 ok"))
      .toDF("doc_id", "text")
  }

  test("scrubReport counts each category on the original text") {
    val rep = Pii.scrubReport(corpus(), "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_email"), r.getAs[Int]("n_phone"),
         r.getAs[Int]("n_ipv4"), r.getAs[Int]("n_ssn"))).toMap
    assert(rep(1L) === ((2, 0, 0, 0)))
    assert(rep(2L) === ((0, 2, 0, 0)))
    assert(rep(3L) === ((0, 0, 2, 0)))
    assert(rep(4L) === ((0, 0, 0, 1)))
    assert(rep(5L) === ((1, 1, 1, 1)))
    assert(rep(6L) === ((0, 0, 0, 0)))
    // bare US formats — no country code: dashed, parenthesized, dotted
    assert(rep(7L) === ((0, 3, 0, 0)))
  }

  test("scrub masks sequentially and tokens are never re-matched") {
    val out = Pii.scrub(corpus(), "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(out(1L) === "mail [EMAIL] or [EMAIL] today")
    assert(out(2L) === "call [PHONE] and [PHONE] now")
    assert(out(3L) === "server [IP] peered with [IP]")
    assert(out(4L) === "ssn [SSN] on file")
    assert(out(5L) === "mixed: [EMAIL] at [PHONE] from [IP] id [SSN]")
    assert(out(6L) === "no pii here at all")
    assert(out(7L) === "dial [PHONE] or [PHONE] or [PHONE] ok")
    // a second scrub is a no-op (idempotent on masked text)
    val twice = Pii.scrub(Pii.scrub(corpus(), "text"), "text")
      .collect().map(r => r.getAs[String]("text")).toSet
    assert(twice === out.values.toSet)
  }

  test("phone rule never starts or ends mid-digit-run (boundary anchors)") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "order 1234 567 8901 shipped"), // quad-led run: not a phone
      (2L, "totals 2020 100 2000 plus tax"), // number sequence: not a phone
      (3L, "serial 555-123-45678 suffix"), // 5-digit tail: not a phone
      (4L, "call (555) 123-4567 or +1-415-555-0100 or 555.867.5309"))
      .toDF("doc_id", "text")
    val out = Pii.scrub(df, "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "order 1234 567 8901 shipped")
    assert(out(2L) === "totals 2020 100 2000 plus tax")
    assert(out(3L) === "serial 555-123-45678 suffix")
    assert(out(4L) === "call [PHONE] or [PHONE] or [PHONE]")
  }

  test("custom rules replace the defaults and report under their own names") {
    val rules = Seq(Pii.Rule("hexid", "\\b0x[0-9a-f]{8}\\b", "[HEX]"))
    val s = spark; import s.implicits._
    val df = Seq((1L, "handle 0xdeadbeef and 0xDEADBEEF")).toDF("doc_id", "text")
    val rep = Pii.scrubReport(df, "text", rules).head()
    assert(rep.getAs[Int]("n_hexid") === 1) // case-sensitive by construction
    assert(Pii.scrub(df, "text", rules).head().getAs[String]("text")
      === "handle [HEX] and 0xDEADBEEF")
  }

  test("report + scrub is one narrow codegen stage — no exchange in the plan") {
    // spark.range-backed so Catalyst can't fold the whole frame into a
    // LocalTableScan (which would hide the codegen/exchange structure)
    val wide = spark.range(1000).select(col("id").as("doc_id"),
      concat(lit("mail u"), col("id"), lit("@example.com at 10.0.0."),
        col("id") % 256).as("text"))
    val plan = Pii.scrub(Pii.scrubReport(wide, "text"), "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"PII pass must not shuffle:\n$plan")
    // executedPlan.toString marks whole-stage-codegen'd operators with a
    // "*(stageId)" prefix; the whole rule chain must sit in stage 1
    assert(plan.linesIterator.forall(l => l.trim.isEmpty || l.contains("*(1)")),
      s"rule chain should fuse into one codegen stage:\n$plan")
  }
}
