package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Dev profiler for the MinHash-LSH stages (not part of the engine API). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val df = spark.read.parquet(s"$dir/documents.parquet")
    val (shingleN, numHashes, bands) = (3, 64, 16)
    val rows = numHashes / bands
    val shs = df.select(col("doc_id").as("id"), hashedShingleSet(col("text"), shingleN).as("shs"))
      .filter(size(col("shs")) > 0)
    time("shingles only")(shs.count())
    val sigs = df.select(col("doc_id").as("id"),
        minhashSignature(col("text"), shingleN, numHashes).as("sig"))
      .filter(size(col("sig")) > 0)
    time("signatures")(sigs.count())
    val cached = sigs.cache()
    time("signatures cached")(cached.count())
    val allBanded = cached.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b))).as(Seq("band", "bucket")))
    time("banded")(allBanded.count())
    val hot = allBanded.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 200).select("band", "bucket")
    time("hot buckets")(println("hot=" + hot.count()))
    val banded = allBanded.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
    val a = banded.alias("a"); val b = banded.alias("b")
    val cands = a.join(b, col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.sig").as("sa"), col("b.sig").as("sb"))
    time("raw candidate pairs")(println("cands=" + cands.count()))
    val dd = cands.dropDuplicates("a_id", "b_id")
    time("deduped candidates")(println("dd=" + dd.count()))
    val est = dd.withColumn("est_jaccard",
      aggregate(zip_with(col("sa"), col("sb"), (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, x) => acc + x).cast("double") / numHashes)
      .filter(col("est_jaccard") >= 0.5)
    time("estimate+filter")(println("out=" + est.count()))
    spark.stop()
  }
}
