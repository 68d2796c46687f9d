package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis primitives for the large-scale training-data
  * pipeline operators (dedup, language-ID, quality scoring, fingerprinting).
  *
  * Everything is built from `org.apache.spark.sql.functions._` (codegen'd or
  * higher-order expressions evaluated inside Tungsten) — no Scala UDFs, so
  * the per-row cost is a narrow map that scales linearly to 100 TB with zero
  * shuffle.
  */
object TextFunctions {

  /** Whitespace tokenization, lower-cased. Single-space split keeps parity
    * with external SQL oracles (`string_split(text, ' ')`). */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Canonical ingest cleaning: Unicode NFC composition
    * ([[org.apache.spark.sql.graft.NfcNormalize]] — composed and
    * decomposed accents fingerprint identically afterwards), control
    * characters to spaces, whitespace runs collapsed, ends trimmed.
    * Controls become spaces BEFORE the collapse so `a \x01 b` ends as
    * `a b`, never double-spaced, and `a\x01b` keeps its boundary. Run
    * this ahead of any fingerprint-keyed operator (exact/paragraph/span
    * dedup, decontamination): every step is narrow and the NFC pass is
    * zero-allocation for already-composed text. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(
      org.apache.spark.sql.graft.Normalize.nfc_normalize(text),
      "[\\x00-\\x1F\\x7F]", " "), "\\s+", " "))

  /** Word-level n-gram shingles: contiguous `n` tokens joined by a space.
    * Empty array when the doc has fewer than `n` tokens. */
  def wordShingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(t) - lit(n - 1)),
        i => array_join(slice(t, i, lit(n)), " ")))
  }

  /** Distinct shingle set (the unit of Jaccard similarity). */
  def shingleSet(text: Column, n: Int): Column = array_distinct(wordShingles(text, n))

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003): hash
    * every token `k`-gram (md5-derived 60-bit value — SQL-replayable like
    * every hash family here), then keep the MINIMUM hash of each length-`w`
    * window of consecutive hashes, deduplicated. Guarantee: two documents
    * sharing a copied run of ≥ `w + k - 1` tokens share ≥ 1 fingerprint —
    * the span-level near-dup signal (bag-level Jaccard can miss a short
    * verbatim quote inside otherwise-different docs). Docs with fewer than
    * `w` k-grams yield an empty set. Narrow: O(|doc|·w) per row, no
    * shuffle. Backed by the native
    * [[org.apache.spark.sql.graft.WinnowedFingerprints]] expression (one
    * compiled pass: each shingle md5-hashed once, window minima over a
    * reused buffer) — value-identical to the interpreted
    * `array_distinct(transform(sequence(...), i → array_min(slice(hs, i,
    * w))))` chain it replaced, which paid a lambda dispatch plus an array
    * COPY per window and dominated the winnowing query's cost. */
  def winnowedFingerprints(text: Column, k: Int, w: Int): Column =
    org.apache.spark.sql.graft.HashSketches.winnowed_fingerprints(tokens(text), k, w)

  /** Distinct shingles as 64-bit hashes: a running xxh64 over each n-token
    * window — no per-shingle string building, 8-byte join keys instead of
    * strings. Collision probability across a corpus is ~|shingles|²/2⁶⁴
    * (negligible); counts are otherwise identical to [[shingleSet]].
    * Backed by the native [[org.apache.spark.sql.graft.ShingleHashes]]
    * expression (one compiled pass per row). */
  def hashedShingleSet(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.HashSketches.shingle_hashes(tokens(text), n)

  /** MinHash signature over word `n`-gram shingles: `k` independent
    * min-hashes (`array<long>`). Hash family = md5-derived double hashing
    * (h1 + i·h2 over the shingle string's digest) — deterministic across
    * runs AND replayable in plain SQL by an external oracle, unlike xxh64.
    * O(|shingles|·k) per row, no shuffle — the LSH banding in
    * [[graft.operators.Dedup]] turns signatures into candidate pairs.
    * Backed by the native fused
    * [[org.apache.spark.sql.graft.MinHashSignature]] expression (compiled
    * loop, no shingle strings materialized). Empty array when the doc has
    * fewer than `n` tokens. */
  def minhashSignature(text: Column, n: Int, numHashes: Int): Column =
    org.apache.spark.sql.graft.HashSketches.minhash_signature(tokens(text), n, numHashes)

  /** 64-bit SimHash over the distinct-token set: for each output bit, tokens
    * vote +1/−1 by their md5's bit (SQL-replayable, see
    * [[org.apache.spark.sql.graft.SimHash64]]); the sign of the vote sets
    * the bit. Near-identical docs differ in few bits (small Hamming
    * distance). */
  def simhash64(text: Column): Column =
    org.apache.spark.sql.graft.HashSketches.simhash64(array_distinct(tokens(text)))

  /** Hamming distance between two packed 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Content fingerprint: md5 of whitespace-normalized, lower-cased text.
    * md5 (not xxhash64) so external oracles can reproduce it byte-for-byte. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  // ---------------------------------------------------------------- language ID
  /** Tiny per-language stopword lists for the n-gram/stopword heuristic.
    * Deliberately small and public-knowledge (the most frequent function
    * words of each language). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "de", "pas", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "de", "no", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不", "人", "这"))

  /** Count of tokens that are stopwords of language `lang` (single-set
    * form of the native multi-set pass used by [[langId]]). */
  def stopwordHits(toks: Column, lang: String): Column =
    org.apache.spark.sql.graft.HashSketches
      .set_hits(toks, Seq(stopwords(lang))).getItem(0)

  /** Heuristic language ID: argmax over per-language stopword hit counts,
    * ties broken by fixed language order, "und" (undetermined) when no
    * stopword of any language appears. CJK fallback: any CJK codepoint → zh
    * before the stopword vote (word-salad zh text may lack function words).
    *
    * All five languages' hit counts come from ONE native pass over the
    * tokens ([[org.apache.spark.sql.graft.SetHits]]) — counts identical to
    * the `filter(toks, array_contains(...))` formulation the oracle uses.
    */
  def langId(text: Column): Column = {
    val langs = Seq("en", "de", "fr", "es", "zh")
    // first-listed language wins ties — same priority as the oracle's CASE
    val pick = org.apache.spark.sql.graft.HashSketches
      .argmax_set_hits(tokens(text), langs, langs.map(stopwords), "und")
    when(text.rlike("[\\u4e00-\\u9fff]"), lit("zh")).otherwise(pick)
  }

  // ---------------------------------------------------------------- quality
  /** Token count (whitespace tokenizer). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token estimate: words + punctuation runs counted separately,
    * long words weighted by ⌈len/4⌉ (a public rule-of-thumb for subword
    * tokenizers). */
  def bpeTokenEstimate(text: Column): Column =
    aggregate(
      split(lower(text), "[^\\p{L}\\p{N}]+"),
      lit(0L),
      (acc, w) => acc + when(length(w) === 0, 0L).otherwise(ceil(length(w) / lit(4.0)))) +
      length(regexp_replace(text, "[\\p{L}\\p{N}\\s]+", ""))

  /** Mean token length in characters (one native pass over the tokens;
    * same integer character count as `length()`, so the derived double is
    * bit-identical to the lambda formulation). */
  def meanTokenLen(text: Column): Column = {
    val st = org.apache.spark.sql.graft.HashSketches.token_stats(tokens(text))
    when(st.getField("n_tokens") === 0, lit(0.0))
      .otherwise(st.getField("n_chars").cast("double") / st.getField("n_tokens"))
  }

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]-]", "")).cast("double") / length(text))

  /** English stopword ratio — a standard fluency / quality proxy. */
  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0))
      .otherwise(stopwordHits(t, "en").cast("double") / size(t))
  }

  /** Composite quality score in [0,1]: length sweet-spot, moderate mean word
    * length, low punctuation density. Deterministic arithmetic only. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(200.0), lit(1.0))
    val wordScore = when(meanTokenLen(text).between(2.0, 12.0), lit(1.0)).otherwise(lit(0.5))
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    round((lenScore * 0.4 + wordScore * 0.4 + punctScore * 0.2), 4)
  }
}
