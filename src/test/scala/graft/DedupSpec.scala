package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions.{col, length}

class DedupSpec extends SparkSpec {

  test("paragraph dedup: repeats survive only at first (doc, position); blanks exempt") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "SHARED HEADER\nunique one\n\nSHARED FOOTER"),
      (2L, "SHARED HEADER\nunique two\n\nSHARED FOOTER"),
      (3L, "SHARED FOOTER\nunique three"),
      (4L, "SHARED HEADER")) // loses its only paragraph
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup.paragraphDedup(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // doc 1 is the first occurrence of both boilerplate lines
    assert(got(1L) === ((4L, "SHARED HEADER\nunique one\n\nSHARED FOOTER")))
    // doc 2 keeps its unique line and the (exempt) blank
    assert(got(2L) === ((2L, "unique two\n")))
    // SHARED FOOTER's first occurrence was doc 1 pos 3 — doc 3 loses it
    assert(got(3L) === ((1L, "unique three")))
    // a doc whose every paragraph was deduped away keeps its row, empty
    assert(got(4L) === ((0L, "")))
  }

  test("paragraph dedup is the identity when nothing repeats") {
    val s = spark; import s.implicits._
    val df = (1L to 25L).map(i => (i, s"alpha $i\nbeta $i\n\ngamma $i"))
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup.paragraphDedup(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    (1L to 25L).foreach { i =>
      assert(got(i) === ((4L, s"alpha $i\nbeta $i\n\ngamma $i")))
    }
  }

  test("paragraph dedup is layout-independent") {
    val s = spark; import s.implicits._
    val df = (1L to 40L).map(i =>
        (i, s"COMMON\nbody $i\nCOMMON TAIL ${i % 4}"))
      .toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Dedup.paragraphDedup(d, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(run(df) === run(df.repartition(7)))
  }

  private def docs() = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bend"), // near-dup of 1
      (3L, "THE QUICK brown fox jumps over the lazy dog near the river bank"), // exact after lowercasing
      (4L, "completely different content about spark query engines and shuffles here"),
      (5L, "yet another unrelated document mentioning neither foxes nor rivers at all"))
      .toDF("doc_id", "text")
  }

  test("exact dedup groups normalize whitespace/case and find the planted duplicate") {
    val groups = Dedup.exactGroups(docs(), "doc_id", "text").collect()
    assert(groups.length === 4) // 1&3 merge
    val dup = groups.find(_.getAs[Long]("n_dups") == 2L).get
    assert(dup.getAs[Long]("keep_id") === 1L)
    val kept = Dedup.exactDedup(docs(), "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 4L, 5L))
  }

  test("exact jaccard pairs finds the near-duplicate with the right similarity") {
    val pairs = Dedup.jaccardPairs(docs(), "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Double]("jaccard")))
    // docs 1,2: 13 tokens → 11 trigrams each, differing only in the last →
    // shared 10, union 12 → jaccard 10/12
    val expected = 10.0 / 12.0
    assert(pairs.exists { case (a, b, j) => a == 1L && b == 2L && math.abs(j - expected) < 1e-9 })
    // 1 & 3 are identical after lowering: jaccard 1.0
    assert(pairs.exists { case (a, b, j) => a == 1L && b == 3L && j == 1.0 })
  }

  test("duplicate clusters: transitive pairs collapse to min-id components") {
    val s = spark; import s.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L)
    // driver union-find fast path
    val viaDriver = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver === expected)
    // distributed label-propagation path (threshold 0 forces it)
    val viaLoop = Dedup.duplicateClusters(pairs, driverUnionFindThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaLoop === expected)
  }

  test("near-dedup keeps one doc per cluster (min id) plus all unpaired docs") {
    // docs 1,2,3 form one near-dup cluster (1~2 at 10/12, 1~3 exact) →
    // keeper is 1; docs 4,5 are unpaired and survive
    val kept = Dedup.nearDedup(docs(), "doc_id", "text", n = 3, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 4L, 5L))
  }

  test("approx near-dedup (minhash pair source) matches the exact keeper set here") {
    // On this corpus the cluster {1,2,3} sits far above the threshold and
    // {4,5} far below, so MinHash at 64 hashes recovers the exact pairs and
    // the keeper sets coincide — the recall property the LSH composition
    // must preserve; larger corpora deviate only by the MinHash error bound.
    val exact = Dedup.nearDedup(docs(), "doc_id", "text", n = 3, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val approx = Dedup.nearDedupApprox(docs(), "doc_id", "text",
        shingleN = 3, threshold = 0.5, numHashes = 64, bands = 16)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(approx === exact)
    assert(approx === Set(1L, 4L, 5L))
  }

  test("any pair source composes through nearDedupFromPairs") {
    val s = spark; import s.implicits._
    // hand-built pair list standing in for simhash/cosine sources
    val pairs = Seq((1L, 3L), (4L, 5L)).toDF("a_id", "b_id")
    val kept = Dedup.nearDedupFromPairs(docs(), "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 4L))
  }

  test("minhash LSH surfaces high-jaccard pairs without all-pairs comparison") {
    val pairs = Dedup.minhashLshPairs(docs(), "doc_id", "text",
      shingleN = 2, numHashes = 32, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)))
    // unrelated docs must not pair at this threshold
    assert(!pairs.exists { case (a, b) => Set(a, b) == Set(4L, 5L) })
  }

  test("simhash pairs: near-identical docs land within the hamming budget") {
    val pairs = Dedup.simhashPairs(docs(), "doc_id", "text", maxHamming = 12)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Int]("hamming")))
    // identical-after-normalize docs have identical token sets → hamming 0
    assert(pairs.exists { case (a, b, h) => a == 1L && b == 3L && h == 0 })
    // unrelated docs differ in far more bits than the budget
    assert(!pairs.exists { case (a, b, _) => Set(a, b) == Set(4L, 5L) })
  }

  test("cross-corpus pairs only ever join batch against corpus") {
    val s = spark; import s.implicits._
    val batch = docs().filter($"doc_id" <= 2)   // 1 and its near-dup 2
    val corpus = docs().filter($"doc_id" > 2)   // includes 3 = exact copy of 1
    val pairs = Dedup.minhashLshPairsAgainst(batch, corpus, "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("corpus_id"))).toSet
    assert(pairs.forall { case (b, c) => b <= 2 && c > 2 })
    assert(pairs.contains((1L, 3L)))  // identical after normalization
    assert(!pairs.exists { case (b, _) => b == 2L && false })
    // the batch-internal near pair (1,2) must NOT appear
    assert(!pairs.contains((1L, 2L)) && !pairs.contains((2L, 1L)))
  }

  test("dedupAgainst drops corpus dups (exact + near) and batch-internal exact copies") {
    val s = spark; import s.implicits._
    val corpus = docs().filter($"doc_id" === 4L || $"doc_id" === 1L)
    val batch = Seq(
      (10L, "THE QUICK brown fox jumps over the lazy dog near the river bank"), // exact vs corpus 1
      (11L, "the quick brown fox jumps over the lazy dog near the river bend"), // near vs corpus 1
      (12L, "a genuinely new document about streaming watermarks and state stores"),
      (13L, "a genuinely new document about streaming watermarks and state stores"), // batch-internal copy
      (14L, "short novel text that resembles nothing else in either input set"))
      .toDF("doc_id", "text")
    val kept = Dedup.dedupAgainst(batch, corpus, "doc_id", "text",
        shingleN = 3, threshold = 0.5, numHashes = 64, bands = 16)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(12L, 14L))
  }

  test("winnowing pairs catch a copied span that Jaccard-level overlap would dilute") {
    val s = spark; import s.implicits._
    val span = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (1L, s"completely unrelated opening about databases and shuffles $span and an unrelated ending about compilers and garbage collection today"),
      (2L, s"a different frame storing rivers mountains and weather where $span appears quoted inside a much longer passage of filler text"),
      (3L, "no shared content here at all just plain text about gardening tools"),
      (4L, "another disjoint document describing sailing boats and harbor winds"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowingPairs(docs, "doc_id", "text",
        k = 3, w = 4, minShared = 1)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    // the 10-token copied span ≥ w + k - 1 = 6 tokens → guaranteed shared
    // fingerprint between docs 1 and 2
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(3L) || Set(a, b).contains(4L) })
  }

  test("winnowing guarantee: any run of w+k-1 tokens yields a fingerprint hit") {
    val s = spark; import s.implicits._
    // shared run of exactly w + k - 1 = 6 tokens, everything else disjoint
    val run = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"one two three $run four five six"),
      (2L, s"seven eight nine $run ten eleven twelve"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowingPairs(docs, "doc_id", "text",
        k = 3, w = 4, minShared = 1)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("randomized winnowing guarantee over planted shared runs") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7) // deterministic cases
    val vocab = ('a' to 'z').map(_.toString)
    def words(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(26)) + rnd.nextInt(1000))
    for (_ <- 1 to 5) {
      val k = 2 + rnd.nextInt(3)            // 2..4
      val w = 2 + rnd.nextInt(4)            // 2..5
      val run = words(w + k - 1 + rnd.nextInt(5)).mkString(" ")
      val docs = Seq(
        (1L, (words(rnd.nextInt(10)) :+ run) ++ words(rnd.nextInt(10))),
        (2L, (words(rnd.nextInt(10)) :+ run) ++ words(rnd.nextInt(10))),
        (3L, words(30))) // disjoint random filler (fresh draws ≈ no overlap)
        .map { case (id, parts) => (id, parts.mkString(" ")) }
        .toDF("doc_id", "text")
      val pairs = Dedup.winnowingPairs(docs, "doc_id", "text",
          k = k, w = w, minShared = 1)
        .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
      assert(pairs.contains((1L, 2L)),
        s"planted run of length >= ${w + k - 1} missed (k=$k, w=$w)")
    }
  }

  test("dedupAgainst vs an empty corpus reduces to within-batch exact dedup") {
    val s = spark; import s.implicits._
    val empty = docs().filter(org.apache.spark.sql.functions.lit(false))
    val kept = Dedup.dedupAgainst(docs(), empty, "doc_id", "text",
        shingleN = 3, threshold = 0.5, numHashes = 64, bands = 16)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 3 is an exact copy of 1 (min id wins); near-dup 2 survives (near
    // checks run only against the corpus)
    assert(kept === Set(1L, 2L, 4L, 5L))
  }

  test("span removal cuts a cross-doc duplicated run from every occurrence") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "a b c d X"),
      (2L, "z a b c d"),
      (3L, "untouched words here")).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(df, "doc_id", "text", spanTokens = 4)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === (("X", 5L, 4L)))
    assert(got(2L) === (("z", 5L, 4L)))
    assert(got(3L) === (("untouched words here", 3L, 0L)))
  }

  test("span removal merges overlapping marks: within-doc repetition erases the doc") {
    val s = spark; import s.implicits._
    // the 4-gram "m1 m2 m3 m4" occurs at p=0 and p=4: spans [0,4) and
    // [4,8) are adjacent → one island covering every token
    val df = Seq(
      (1L, "m1 m2 m3 m4 m1 m2 m3 m4"),
      (2L, "no duplicated runs at all")).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(df, "doc_id", "text", spanTokens = 4)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === (("", 8L, 8L)))
    assert(got(2L) === (("no duplicated runs at all", 5L, 0L)))
  }

  test("span removal: separate islands in one doc each get cut, the gap survives") {
    val s = spark; import s.implicits._
    // doc 1 shares run A with doc 2 and run B with doc 3, separated by a
    // unique middle — two disjoint islands, middle tokens survive
    val df = Seq(
      (1L, "a1 a2 a3 a4 keep me b1 b2 b3 b4"),
      (2L, "x a1 a2 a3 a4"),
      (3L, "b1 b2 b3 b4 y")).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(df, "doc_id", "text", spanTokens = 4)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === (("keep me", 10L, 8L)))
    assert(got(2L) === (("x", 5L, 4L)))
    assert(got(3L) === (("y", 5L, 4L)))
  }
  test("nearDedupKeepBest keeps the highest-score copy per cluster, min id on ties") {
    val s = spark; import s.implicits._
    // cluster {1,2,3}: scores 5, 9, 9 -> keeper 2 (tie broken by min id);
    // cluster {10,11}: keeper 11 (higher score); 20 is a singleton
    val df = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, 1L), (11L, 7L), (20L, 0L))
      .toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val kept = Dedup.nearDedupKeepBest(df, "doc_id", "score", pairs)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(kept === Seq(2L, 11L, 20L))
  }

  test("nearDedupKeepBest with a constant score degrades to nearDedupFromPairs") {
    val s = spark; import s.implicits._
    val df = (1L to 40L).map(i => (i, 1.0)).toDF("doc_id", "score")
    val pairs = Seq((1L, 7L), (7L, 13L), (20L, 21L), (30L, 31L)).toDF("a_id", "b_id")
    val best = Dedup.nearDedupKeepBest(df, "doc_id", "score", pairs)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    val minId = Dedup.nearDedupFromPairs(df, "doc_id", pairs)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(best === minId)
  }

  test("nearDedupKeepBest: NULL/NaN scores lose; an all-NULL cluster keeps its min id") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Some(2.0)), (2L, None), (3L, Some(Double.NaN)),
        (10L, None), (11L, None))
      .toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val kept = Dedup.nearDedupKeepBest(df, "doc_id", "score", pairs)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    // cluster {1,2,3}: only 1 has a usable score; cluster {10,11}: no
    // usable score at all -> min-id fallback keeps 10
    assert(kept === Seq(1L, 10L))
  }

  test("nearDedupKeepBest is deterministic under repartitioning") {
    val s = spark; import s.implicits._
    val df = (1L to 60L).map(i => (i, (i * 37 % 11).toDouble)).toDF("doc_id", "score")
    val pairs = (1L to 20L).map(i => (i, i + 20L)).toDF("a_id", "b_id")
    def run(d: org.apache.spark.sql.DataFrame, p: org.apache.spark.sql.DataFrame) =
      Dedup.nearDedupKeepBest(d, "doc_id", "score", p)
        .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(run(df, pairs) === run(df.repartition(7), pairs.repartition(3)))
  }

  test("containmentPairs: a short doc inside a long one — invisible to Jaccard, containment ≈ 1") {
    val s = spark; import s.implicits._
    implicit val scope: graft.operators.CacheScope = new graft.operators.CacheScope
    val core = "alpha beta gamma delta epsilon zeta eta theta"
    val padding = (1 to 80).map(i => s"filler$i").mkString(" ")
    val df = Seq(
      (1L, core), // the contained stub
      (2L, s"$core $padding"), // the container
      (3L, "utterly different words nothing shared here at all")
    ).toDF("doc_id", "text")
    // Jaccard misses the pair entirely at any useful threshold
    val jac = Dedup.jaccardPairs(df, "doc_id", "text", n = 3, threshold = 0.2)
    assert(jac.count() === 0, "Jaccard must NOT pair the stub with the container")
    val cont = Dedup.containmentPairs(df, "doc_id", "text", n = 3, threshold = 0.9)
      .collect()
    assert(cont.length === 1)
    val r = cont.head
    assert((r.getLong(0), r.getLong(1)) === ((1L, 2L)))
    // the stub's shingles are fully inside the container (modulo the one
    // boundary shingle bridging core→padding which the stub lacks)
    assert(r.getDouble(3) === 1.0, "containment of the stub in the container")
    assert(r.getDouble(4) < 0.2, "the container is NOT contained in the stub")
    // direction is symmetric in the row, asymmetric in the score
    scope.release()
  }

  test("containmentPairs composes into nearDedupKeepBest (drop the contained copy)") {
    val s = spark; import s.implicits._
    implicit val scope: graft.operators.CacheScope = new graft.operators.CacheScope
    val core = "alpha beta gamma delta epsilon zeta eta theta"
    val padding = (1 to 80).map(i => s"filler$i").mkString(" ")
    val df = Seq((1L, core), (2L, s"$core $padding"), (3L, "unrelated island of text"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("double"))
    val pairs = Dedup.containmentPairs(df, "doc_id", "text", n = 3, threshold = 0.9)
      .select("a_id", "b_id")
    val kept = Dedup.nearDedupKeepBest(df, "doc_id", "n_chars", pairs)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept === Set(2L, 3L), "keep the container (longest), drop the stub")
    scope.release()
  }

  /** The family claim, tested not asserted: for ANY pair source feeding
    * the shared tail, keepBest keeps exactly the per-cluster score argmax
    * (ties: min id) over the clusters THAT source induces, plus every
    * unpaired doc. The expectation is recomputed independently from the
    * pair list (driver-side union-find over the collected pairs). */
  private def expectedKeepers(
      pairs: org.apache.spark.sql.DataFrame,
      scores: Map[Long, Double], allIds: Set[Long]): Set[Long] = {
    val edges = pairs.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val clustered = edges.flatMap(e => Seq(e._1, e._2)).toSet
    val byRoot = clustered.groupBy(find)
    val keepers = byRoot.values.map(members =>
      members.minBy(id => (-scores(id), id))).toSet
    keepers ++ (allIds -- clustered)
  }

  test("keepBest over MinHash-LSH pairs keeps the argmax within each approximate cluster") {
    val s = spark; import s.implicits._
    implicit val scope: graft.operators.CacheScope = new graft.operators.CacheScope
    // planted near-dup groups: 12 groups × 3 rewraps of one base phrase
    // (suffix noise so copies are near- not exact-dups), plus loners
    val rows = (0 until 12).flatMap { g =>
      val base = s"group $g shares this long base phrase about topic ${g * 7} " +
        s"with extra words alpha beta gamma delta epsilon"
      (0 until 3).map(v => (g * 10L + v, s"$base variant$v", (g * 10 + v) % 7 * 1.0))
    } ++ (900L to 905L).map(i => (i, s"utterly unrelated loner document $i " +
      s"speaking of ${i * 13} things nobody else mentions", 1.0))
    val df = rows.toDF("doc_id", "text", "score")
    val pairs = Dedup.minhashLshPairs(df, "doc_id", "text",
      shingleN = 3, numHashes = 64, bands = 16, threshold = 0.5)
    assert(pairs.count() > 0, "the planted groups must pair")
    val kept = Dedup.nearDedupKeepBest(df, "doc_id", "score", pairs)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val scores = rows.map(r => r._1 -> r._3).toMap
    assert(kept === expectedKeepers(pairs, scores, rows.map(_._1).toSet))
    scope.release()
  }

  test("keepBest over cosine near-dup pairs keeps the argmax within each semantic cluster") {
    val s = spark; import s.implicits._
    implicit val scope: graft.operators.CacheScope = new graft.operators.CacheScope
    // 8 direction groups × 3 jittered copies: same direction ⇒ cosine ≈ 1
    val rows = (0 until 8).flatMap { g =>
      (0 until 3).map { v =>
        val vec = Array.tabulate(12) { d =>
          (math.sin(g * 31 + d * 7) + (if (d == v) 0.01 else 0.0)).toFloat
        }
        (g * 10L + v, vec, (g * 10 + v) % 5 * 1.0)
      }
    }
    val df = rows.toDF("vec_id", "embedding", "score")
    val pairs = graft.operators.Similarity.cosineNearDupPairs(
      df, "vec_id", "embedding", threshold = 0.98, bits = 6, tables = 8)
    assert(pairs.count() > 0, "the jittered copies must pair")
    val kept = Dedup.nearDedupKeepBest(df, "vec_id", "score", pairs)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val scores = rows.map(r => r._1 -> r._3).toMap
    assert(kept === expectedKeepers(pairs, scores, rows.map(_._1).toSet))
    scope.release()
  }
}
