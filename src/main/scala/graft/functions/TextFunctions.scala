package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale training-data pipelines.
  * All pure Catalyst built-ins (codegen'd, no UDFs): every function here
  * stays inside whole-stage codegen and is replicable as ANSI SQL for the
  * DuckDB oracle.
  */
object TextFunctions {

  /** Canonical whitespace/case normalization used by fingerprints and
    * shingling: lowercase, trim, collapse runs of whitespace.
    */
  def normalize(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** Jaro-Winkler similarity in [0, 1] — the record-linkage score
    * Spark lacks natively, as a codegen'd native expression
    * ([[graft.expressions.Kernels.jaroWinkler]]; DuckDB-exact
    * semantics including the either-side-empty => 0.0 convention).
    */
  def jaroWinkler(a: Column, b: Column): Column =
    graft.expressions.NativeExpressions.jaroWinkler(a, b)

  /** Document fingerprint: md5 of the normalized text. Identical content
    * modulo case/whitespace maps to one 128-bit key — the exact-dedup key.
    */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Rolling polynomial fingerprint over word tokens (order-sensitive,
    * cheap to maintain incrementally): acc = (acc*31 + crc32(token)) mod
    * 2^31-1. The modulus keeps every intermediate below 2^36, so the
    * arithmetic never overflows under Spark 4's default ANSI mode (plain
    * 64-bit wraparound would throw ARITHMETIC_OVERFLOW).
    */
  def rollingFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(acc * lit(31L) + crc32(t), lit(2147483647L)))

  /** Whitespace tokens of the normalized text; empty text -> empty array. */
  def tokens(text: Column): Column =
    filter(split(normalize(text), " "), t => t =!= "")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: letter runs, digit runs, and single
    * non-letter-digit marks each count as one token — a deterministic
    * stand-in for a real subword tokenizer's token count. For TRUE
    * merge-table BPE counts see [[bpeTokenCount]].
    */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s]"),
      lit(0)))

  /** TRUE byte-pair-encoding segmentation under a caller-supplied
    * ranked merge table (the public BPE apply algorithm — Sennrich et
    * al. ACL'16): whitespace words -> code-point symbols -> repeated
    * leftmost-minimum-rank adjacent merges. A codegen'd native
    * expression ([[graft.expressions.NativeExpressions.BpeSegment]]);
    * the contract (one merge per step, leftmost of the minimal rank)
    * is chosen to be replayable by an external SQL engine as a
    * recursive CTE, which is exactly how the oracle checks it.
    */
  def bpeSegment(text: Column, merges: Seq[(String, String)]): Column =
    graft.expressions.NativeExpressions.bpeSegment(tokens(text), merges)

  /** Tokenizer-true token count: `size(bpeSegment(...))`. */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(bpeSegment(text, merges))

  /** A small deterministic English-bigram merge table for the
    * registered demo queries — callers supply their own learned table
    * in production. Ranks are list positions.
    */
  val demoMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("o", "n"), ("r", "e"), ("e", "n"), ("o", "r"), ("s", "t"),
    ("a", "t"), ("e", "s"), ("o", "u"), ("in", "g"), ("t", "o"),
    ("an", "d"), ("a", "r"), ("l", "l"), ("o", "m"), ("t", "i"))

  /** Stopword sets per language for the n-gram/stopword language-ID
    * heuristic. Function words are the highest-frequency, most
    * language-discriminative tokens; counting them needs no model.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "that", "it",
      "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu",
      "mit", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "que", "pour",
      "dans"),
    "es" -> Seq("el", "los", "las", "y", "es", "un", "una", "que", "por",
      "para")
  )

  /** Count of tokens belonging to `lang`'s stopword set. */
  def stopwordCount(text: Column, lang: String): Column = {
    val set = stopwords(lang).map(lit(_))
    size(filter(tokens(text), t => t.isin(set: _*)))
  }

  /** Language-ID heuristic: argmax of per-language stopword hits with a
    * fixed priority order (en > de > fr > es) on ties; all-zero -> "und"
    * (ISO 639-2 undetermined). Deterministic and SQL-replicable.
    */
  def langId(text: Column): Column = {
    val en = stopwordCount(text, "en")
    val de = stopwordCount(text, "de")
    val fr = stopwordCount(text, "fr")
    val es = stopwordCount(text, "es")
    when(en <= 0 && de <= 0 && fr <= 0 && es <= 0, lit("und"))
      .when(en >= de && en >= fr && en >= es, lit("en"))
      .when(de >= fr && de >= es, lit("de"))
      .when(fr >= es, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Ratio of non-alphanumeric, non-space characters to total characters
    * (0 for empty text). Rounded to 6 places so double arithmetic hashes
    * identically across engines.
    */
  def punctRatio(text: Column): Column =
    round(
      when(length(text) === 0, lit(0.0)).otherwise(
        (length(text) -
          length(regexp_replace(text, "[^\\p{L}\\p{N}\\s]", "")))
          .cast("double") / length(text)),
      6)

  /** Mean token length (0 for empty text), rounded to 6 places. */
  def meanTokenLength(text: Column): Column = {
    val ts = tokens(text)
    round(
      when(size(ts) === 0, lit(0.0)).otherwise(
        aggregate(ts, lit(0L), (acc, t) => acc + length(t))
          .cast("double") / size(ts)),
      6)
  }

  /** Stopword ratio across all supported languages, rounded to 6. */
  def stopwordRatio(text: Column): Column = {
    val all = stopwords.values.flatten.toSeq.distinct.map(lit(_))
    val ts = tokens(text)
    round(
      when(size(ts) === 0, lit(0.0)).otherwise(
        size(filter(ts, t => t.isin(all: _*))).cast("double") / size(ts)),
      6)
  }

  /** Composite quality score in [0,1]: long enough, words of natural
    * length, not punctuation soup. The exact formula is arbitrary by
    * design; what matters is that it is deterministic, cheap, codegen'd
    * and monotone in the signals quality filters actually use.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 50.0, lit(1.0))
    val wordScore = when(
      meanTokenLength(text).between(3.0, 10.0), 1.0).otherwise(0.5)
    val punctScore = lit(1.0) - least(punctRatio(text) * 4.0, lit(1.0))
    round((lenScore * 0.4 + wordScore * 0.3 + punctScore * 0.3), 6)
  }

  /** PII / leakage signal patterns — deliberately dialect-neutral regex
    * (no lookaround, no shorthand classes) so the Java engine and the
    * oracle's RE2 engine count identical non-overlapping matches. These
    * are SIGNALS for routing docs to a redaction/review stage, not a
    * complete PII detector.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^ ]+"
  val LongNumberPattern = "[0-9]{7,}"

  /** Non-overlapping email-shaped match count (codegen'd regexp). */
  def emailCount(text: Column): Column =
    regexp_count(text, lit(EmailPattern)).cast("long")

  /** Non-overlapping URL match count. */
  def urlCount(text: Column): Column =
    regexp_count(text, lit(UrlPattern)).cast("long")

  /** Runs of 7+ digits (phone/account-number shaped). */
  def longNumberCount(text: Column): Column =
    regexp_count(text, lit(LongNumberPattern)).cast("long")

  /** PII redaction — the transform counterpart of the scan counters:
    * each signal hit is replaced by a fixed placeholder token, using
    * the SAME patterns as the counters so scan and redact agree on
    * what a hit is. Replacement order matters and is fixed: emails
    * first (an email contains digit runs and dots a later pattern
    * could half-consume), then URLs (which may embed digit runs), then
    * bare long-number runs. Three chained codegen'd `regexp_replace`
    * projections — per-row, no shuffle, streaming-safe.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailPattern), lit("<EMAIL>")),
        lit(UrlPattern), lit("<URL>")),
      lit(LongNumberPattern), lit("<NUM>"))
}
