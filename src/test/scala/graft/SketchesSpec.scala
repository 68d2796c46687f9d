package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

class SketchesSpec extends SparkSpec {

  test("kmv is exact below k and close above it") {
    val s = spark; import s.implicits._
    // group "small": 40 distinct (< k=64) → exact; "big": 1000 distinct
    val df = ((1L to 40L).map(i => ("small", i)) ++
      (1L to 1000L).map(i => ("big", i + 100L))).toDF("g", "v")
    val out = Sketches.kmvDistinct(df, Seq("g"), "v", k = 64)
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(out("small") === ((40, 40.0)), "under-k groups count exactly")
    val (nBig, estBig) = out("big")
    assert(nBig === 64)
    assert(estBig > 700 && estBig < 1300,
      s"KMV(64) of 1000 distinct should land within ~30%, got $estBig")
  }

  test("kmv ignores duplicates and input layout") {
    val s = spark; import s.implicits._
    val base = (1L to 500L).map(i => ("g", i)).toDF("g", "v")
    val dup = base.union(base).union(base).repartition(13)
    val a = Sketches.kmvDistinct(base, Seq("g"), "v", 64).collect().head
    val b = Sketches.kmvDistinct(dup, Seq("g"), "v", 64).collect().head
    assert(a.getDouble(2) === b.getDouble(2),
      "the sketch is a set sketch: multiplicity and partitioning are invisible")
  }

  test("kmv sketches merge: k smallest of a union = k smallest of parts' survivors") {
    val s = spark; import s.implicits._
    // the mergeability the partial aggregate relies on, stated as data:
    // sketching the union equals sketching (left's k survivors ∪ right's
    // k survivors) — no information outside the parts' sketches is needed
    val left = (1L to 300L).map(i => ("g", i)).toDF("g", "v")
    val right = (301L to 700L).map(i => ("g", i)).toDF("g", "v")
    val whole = Sketches.kmvDistinct(left.union(right), Seq("g"), "v", 32)
      .collect().head.getDouble(2)
    val hv = conv(substring(md5(concat(lit("kmv:"),
      col("v").cast("string")).cast("binary")), 1, 10), 16, 10).cast("long")
    def survivors(df: org.apache.spark.sql.DataFrame) =
      df.select(hv.as("h")).distinct().orderBy(col("h")).limit(32)
    // merge by hand: k smallest of the concatenated survivor sets, then
    // the same estimator arithmetic the operator applies
    val handMerged = survivors(left).union(survivors(right)).distinct()
      .orderBy(col("h")).limit(32).collect().map(_.getLong(0))
    val kth = handMerged.last
    val est = math.rint(31.0 * 1099511627776.0 / math.max(kth, 1L) * 10000) / 10000
    assert(est === whole, "union sketch must be reconstructible from part sketches")
  }

  test("kmv excludes NULL values, matching count(DISTINCT x)") {
    val s = spark; import s.implicits._
    val df = (Seq(("g", Some(1L)), ("g", Some(2L)), ("g", None), ("g", None)))
      .toDF("g", "v")
    val out = Sketches.kmvDistinct(df, Seq("g"), "v", 16).collect().head
    assert(out.getInt(1) === 2 && out.getDouble(2) === 2.0,
      "NULLs carry no identity and must not count")
  }

  test("kmv plan: ONE aggregate exchange — sub-distinct, no window, no sort") {
    val s = spark; import s.implicits._
    val df = (1L to 100L).map(i => ("g", i)).toDF("g", "v")
    val plan = Sketches.kmvDistinct(df, Seq("g"), "v", 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"sketch must not rank per group:\n$plan")
    assert(plan.split("Exchange").length - 1 === 1,
      s"dedup happens inside the partial top-k buffer — exactly one exchange:\n$plan")
  }

  test("top_k_pairs_distinct buffer skips duplicates at every position") {
    import org.apache.spark.sql.graft.TopKBuffer
    val buf = new TopKBuffer(4, dedup = true)
    // fill, then replay every element (head, middle, tail) — size stable
    Seq((5.0, 1L), (4.0, 2L), (3.0, 3L), (2.0, 4L)).foreach { case (sc, id) => buf.add(sc, id) }
    assert(buf.size === 4)
    Seq((5.0, 1L), (3.0, 3L), (2.0, 4L)).foreach { case (sc, id) => buf.add(sc, id) }
    assert(buf.size === 4)
    assert(buf.ids.toSeq === Seq(1L, 2L, 3L, 4L))
    // a better non-duplicate still displaces the tail
    buf.add(6.0, 9L)
    assert(buf.ids.take(4).toSeq === Seq(9L, 1L, 2L, 3L))
    // same score, different id: NOT a duplicate — id-asc tie order
    buf.add(6.0, 8L)
    assert(buf.ids.take(4).toSeq === Seq(8L, 9L, 1L, 2L))
    // re-adding the current tail's exact pair is still a no-op
    val before = buf.ids.take(4).toSeq
    buf.add(4.0, 2L)
    assert(buf.ids.take(4).toSeq === before)
  }
}
