package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {

  private def one[T](c: org.apache.spark.sql.Column, text: String): T = {
    val s = spark; import s.implicits._
    Seq(text).toDF("text").select(c.as("r")).collect().head.getAs[T]("r")
  }

  test("tokenCount / meanTokenLen / shingles") {
    assert(one[Int](tokenCount(col("text")), "a bb ccc") === 3)
    assert(math.abs(one[Double](meanTokenLen(col("text")), "a bb ccc") - 2.0) < 1e-9)
    val sh = one[scala.collection.Seq[String]](wordShingles(col("text"), 2), "a b c d")
    assert(sh === Seq("a b", "b c", "c d"))
    assert(one[scala.collection.Seq[String]](wordShingles(col("text"), 5), "a b c").isEmpty)
  }

  test("fingerprint normalizes case and whitespace") {
    val a = one[String](fingerprint(col("text")), "Hello   World")
    val b = one[String](fingerprint(col("text")), "  hello world ")
    val c = one[String](fingerprint(col("text")), "hello worlds")
    assert(a === b)
    assert(a !== c)
    assert(a.length === 32)
  }

  test("langId picks the language whose stopwords dominate") {
    assert(one[String](langId(col("text")), "the cat is in the house and it is warm") === "en")
    assert(one[String](langId(col("text")), "der hund ist nicht in der küche und das haus") === "de")
    assert(one[String](langId(col("text")), "le chat est dans la maison et il est un chat") === "fr")
    assert(one[String](langId(col("text")), "el gato es un animal y la casa es grande") === "es")
    assert(one[String](langId(col("text")), "这 是 一个 测试 文档") === "zh")
    assert(one[String](langId(col("text")), "zzz qqq xxx") === "und")
  }

  test("quality score rewards length and penalizes punctuation soup") {
    val good = one[Double](qualityScore(col("text")),
      "a perfectly reasonable sentence with plenty of ordinary words that goes on for a while " * 3)
    val bad = one[Double](qualityScore(col("text")), "!!! ??? ,,, ... ;;; :::")
    assert(good > bad)
    assert(good <= 1.0 && bad >= 0.0)
  }

  test("simhash: identical token sets collide, token order is irrelevant") {
    val a = one[Long](simhash64(col("text")), "alpha beta gamma delta")
    val b = one[Long](simhash64(col("text")), "delta gamma beta alpha")
    assert(a === b)
  }

  test("bpe token estimate is at least the word count for ascii prose") {
    val est = one[Long](bpeTokenEstimate(col("text")), "short words here")
    assert(est >= 3L)
  }

  test("http-date parse (F6) matches the reference's S3 last-modified format") {
    val ts = one[java.sql.Timestamp](
      graft.sources.DmsFileClassifier.httpDate(col("text")),
      "Wed, 12 Aug 2026 06:30:00 GMT")
    assert(ts.toInstant.toString === "2026-08-12T06:30:00Z")
  }
}
