package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and scrubbing for training corpora.
  *
  * Pre-training pipelines must mask personally identifiable information
  * (emails, phone numbers, IP addresses, national-ID-shaped strings) before
  * the text reaches a model. Both operations here are pure per-row maps over
  * codegen'd built-ins (`regexp_count` / `regexp_replace`): no UDF, no
  * shuffle, no driver participation — the 100 TB cost is exactly one narrow
  * pass over the corpus, and Catalyst fuses the whole rule chain into a
  * single WholeStageCodegen stage.
  *
  * Rule regexes are deliberately restricted to the common subset of Java's
  * regex dialect and RE2 (character classes, bounded quantifiers, `\b`,
  * alternation — no lookaround, no backreferences), so the same pattern
  * string runs unchanged in Spark and in SQL engines used as oracles.
  *
  * Masking is SEQUENTIAL in rule order: each rule rewrites the output of the
  * previous one (emails before phones before IPs before IDs), so a
  * replacement token can never be re-matched by a later rule as long as
  * tokens contain no digits or `@`.
  *
  * Reference scope: the reference engine's staging discipline — data is
  * normalized before it is merged (control_migration_schema_script.sql:
  * 307–345) — extended to the LLM-training surface per SURVEY §2.
  */
object Pii {

  /** One scrub rule: `name` becomes the report column `n_<name>`. */
  final case class Rule(name: String, pattern: String, replacement: String)

  /** Default rule set. Order matters (see masking note above): the email
    * pattern must run before the phone pattern so the digits of a phone
    * embedded in a local-part are not half-masked, and the phone pattern
    * before the SSN pattern so `xxx-xx-xxxx` inside a longer number is not
    * claimed twice.
    *
    * The phone rule's country code is OPTIONAL, so the common bare US
    * formats (`555-123-4567`, `(555) 123-4567`, `555.123.4567`) are caught.
    * Every digit-led edge is `\b`-anchored (RE2-compatible — no
    * lookbehind), so the rule can never start mid-digit-run: space-
    * separated number sequences like `1234 567 8901` stay unmasked, and
    * the final 4-digit run must end at a boundary. `+`/`(`-led forms
    * anchor on the symbol itself. An IPv4 string can never satisfy it
    * (the final run must be 4 digits, IPv4 segments are at most 3), and
    * the 3-2-4 SSN shape never matches the 3-3-4 body. */
  val defaultRules: Seq[Rule] = Seq(
    Rule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    Rule("phone",
      "(?:\\+\\d{1,2}[-. ]|\\b\\d{1,2}[-. ])?(?:\\(\\d{3}\\)|\\b\\d{3})[-. ]\\d{3}[-. ]\\d{4}\\b",
      "[PHONE]"),
    Rule("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]"),
    Rule("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "[SSN]"))

  /** Input columns plus one `n_<rule>` LONG count column per rule.
    * Counts are measured on the ORIGINAL text for every rule (not the
    * partially-scrubbed intermediate), so `n_ssn` reports SSN-shaped spans
    * even when the phone rule would consume them first during masking. */
  def scrubReport(
      df: DataFrame,
      textCol: String,
      rules: Seq[Rule] = defaultRules): DataFrame =
    rules.foldLeft(df) { (acc, r) =>
      acc.withColumn(s"n_${r.name}", regexp_count(col(textCol), lit(r.pattern)))
    }

  /** Input columns with `textCol` replaced by its masked form (rules applied
    * sequentially in order). */
  def scrub(
      df: DataFrame,
      textCol: String,
      rules: Seq[Rule] = defaultRules): DataFrame =
    df.withColumn(textCol, maskExpr(col(textCol), rules))

  /** The masking expression alone, for callers composing it into a wider
    * projection. */
  def maskExpr(text: Column, rules: Seq[Rule] = defaultRules): Column =
    rules.foldLeft(text) { (acc, r) =>
      regexp_replace(acc, lit(r.pattern), lit(r.replacement))
    }
}
