package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline
  * (BASELINE.json north star): tokenization, n-gram shingling, quality
  * ratios, language-ID scoring, and deterministic 60-bit string hashing.
  *
  * Everything here is a pure Column expression (whole-stage codegen'd, no
  * UDFs) and is engine-portable: the same formulas are expressible in the
  * DuckDB oracle. Ratios are exact scaled integers (`x * 1e6 // y`) so
  * results hash identically across engines.
  */
object TextFunctions {

  /** Explicit whitespace class used in every tokenizer regex, spelled out
    * because `\s` differs across engines: Java regex includes `\x0B`
    * (vertical tab), RE2 (DuckDB) excludes it. The oracle SQL uses the
    * identical class, so a document containing a vertical tab tokenizes
    * the same in both engines. */
  val WsClass = "[ \\t\\n\\r\\f\\x0B]"

  /** Whitespace tokens of trimmed text (empty string → single empty token,
    * filtered out). */
  def tokens(text: Column): Column =
    filter(split(trim(text), s"$WsClass+"), t => t =!= "")

  /** Word n-gram shingles: join of each n consecutive tokens. Documents
    * with fewer than n tokens yield an EMPTY array — guarded explicitly
    * because Spark's `sequence(1, 0)` is the descending [1, 0] (unlike
    * DuckDB's empty `generate_series(1, 0)`), which would feed `slice` an
    * illegal 0 start. */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Decontamination canonicalization: lowercase, every run of
    * non-alphanumeric/non-whitespace characters collapsed to one space —
    * so case and punctuation edits can't hide a leaked eval document.
    * Oracle-portable: the same class + `'g'` flag in DuckDB
    * `regexp_replace(lower(text), ...)`. */
  def normalizeText(text: Column): Column =
    regexp_replace(lower(text), s"[^a-z0-9 \\t\\n\\r\\f\\x0B]+", " ")

  /** Deterministic 60-bit non-negative hash: first 15 hex digits of md5.
    * Portable: DuckDB `CAST('0x' || substr(md5(s),1,15) AS UBIGINT)`. */
  def hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Deterministic 48-bit hash (12 hex digits) — headroom for bit shifts. */
  def hash48(s: Column): Column =
    conv(substring(md5(s), 1, 12), 16, 10).cast("long")

  /** Count of characters matching a regex character class. */
  def charClassCount(text: Column, charClassRe: String): Column =
    length(text) - length(regexp_replace(text, charClassRe, ""))

  /** Exact integral division (Go/SQL `div` semantics, truncation): used for
    * scaled-integer ratios so results hash identically across engines. */
  def intDiv(num: Column, den: Column): Column =
    call_function("div", num, den)

  /** Bit shifts with a Column shift amount (the `functions._` variants only
    * take Int literals). */
  def shl(e: Column, n: Column): Column = call_function("shiftleft", e, n)
  def shr(e: Column, n: Column): Column = call_function("shiftright", e, n)

  /** Exact ppm ratio (num * 1e6 integral-div den), 0 when den = 0.
    * int64-safe for numerators up to ~9.2e12 — fine for every PER-DOC
    * count; use [[ppmExact]] when the numerator is corpus-scale. */
  def ppm(num: Column, den: Column): Column =
    when(den === 0, 0L).otherwise(intDiv(num * 1000000L, den))

  /** [[ppm]] for corpus-scale numerators: the multiply-divide runs in
    * DECIMAL(38,0) (exact, 38 digits), so a numerator beyond ~9.2e12 —
    * where `num * 1e6` wraps int64 — still yields the exact ratio. A
    * ppm of a fraction <= 1 always fits the long result. Same value as
    * [[ppm]] everywhere the int64 path is safe (spec-pinned). */
  def ppmExact(num: Column, den: Column): Column =
    when(den === 0, 0L).otherwise(
      intDiv(num.cast("decimal(38,0)") * lit(1000000L).cast("decimal(38,0)"),
        den.cast("decimal(38,0)")).cast("long"))

  /** Number of tokens contained in a fixed vocabulary (multiset count). */
  def vocabHits(toks: Column, vocab: Seq[String]): Column =
    size(filter(toks, t => array_contains(lit(vocab.toArray), t)))

  /** Minimal per-language stopword lists for the language-ID heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans"),
    "es" -> Seq("el", "los", "las", "y", "es", "una", "en")
  )

  /** CJK-codepoint presence — the zh branch of language-ID. */
  def hasCjk(text: Column): Column =
    charClassCount(text, "[\\x{4e00}-\\x{9fff}]") > 0

  /** Document fingerprint (winnowing-lite): the minimum md5 over character
    * 8-grams — robust to small edits, portable to the oracle. */
  def fingerprint(text: Column): Column = {
    val grams = transform(
      sequence(lit(1), greatest(length(text) - 7, lit(1))),
      i => text.substr(i, lit(8))
    )
    array_min(transform(grams, g => md5(g)))
  }
}
