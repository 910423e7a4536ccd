package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Text primitives for the LLM-data-pipeline operators (dedup, language ID,
  * quality scoring). All are compositions of codegen'd builtins — no UDFs —
  * and each has an exact DuckDB-SQL mirror used by the oracle (the engine's
  * token/shingle definitions are deliberately regex-simple so both engines
  * agree byte-for-byte).
  */
object TextFunctions {

  /** Whitespace tokenization: `string_split_regex(trim(text), '\s+')`.
    * Evaluated by the byte-scanning [[WhitespaceTokens]] expression —
    * byte-exact with `split(trim(c), "\\s+")` (spec-pinned, including on
    * the fixture corpus) but without the builtin's per-row UTF-16 decode +
    * `Pattern.compile` + re-encode; this is the hottest per-row path of
    * the whole text family (r16, guide §1.2 step 2: per-task work). */
  def tokens(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      WhitespaceTokens(org.apache.spark.sql.graftshim.ColumnBridge.expression(trim(c))))

  /** Distinct 3-gram token shingles via the codegen'd [[Shingles]]
    * expression (the higher-order-function formulation is CodegenFallback
    * and ~20× slower; see ShinglesExpression.scala). */
  def shingles3(t: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      Shingles(org.apache.spark.sql.graftshim.ColumnBridge.expression(t), 3))

  /** Stopword lists for the n-gram language-ID heuristic (SURVEY-extension:
    * a deterministic, oracle-checkable stand-in for fasttext-style lang ID). */
  val StopwordsByLang: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "in", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我"),
  )

  /** Count of tokens found in `words` (the hit score for one language). */
  def stopwordHits(t: Column, words: Seq[String]): Column =
    size(filter(t, x => x.isInCollection(words))).cast("long")

  /** PII patterns, in redaction-application order. Deliberately restricted
    * to the regex subset Java (Spark) and RE2 (DuckDB) interpret
    * identically — no backreferences, no lookaround — so scan counts are
    * oracle-checkable. Matching is on lowercased text. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[a-z0-9._%+-]+@[a-z0-9-]+(\\.[a-z0-9-]+)+",
    "ssn" -> "\\b\\d{3}-\\d{2}-\\d{4}\\b",
    "ipv4" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "phone" -> "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b")

  /** Per-type PII match counts for a text column (shuffle-free projection). */
  def piiCounts(text: Column): Seq[(String, Column)] =
    PiiPatterns.map { case (name, p) =>
      name -> regexp_count(lower(text), lit(p)).cast("long")
    }

  /** Mask every PII match with a typed placeholder (`<EMAIL>`, `<SSN>`, …) —
    * the pre-training redaction pass. Patterns apply in [[PiiPatterns]]
    * order (SSNs before the looser phone shape). */
  def piiRedact(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (name, p)) =>
      regexp_replace(c, p, s"<${name.toUpperCase}>")
    }
}
