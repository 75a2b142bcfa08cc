package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale document pipelines.
  *
  * Everything here is a pure `Column` expression built from Spark's
  * codegen'd built-ins + higher-order functions — no UDFs — so whole-stage
  * codegen stays intact and the functions are usable inside any plan
  * (filter pushdown, partial aggregation, etc.) at 100 TB scale.
  *
  * Tokenization mirrors the reference's split-based multi-value handling
  * (reference: etl_imdb.py:175 `explode(split(genres, ","))`), generalized
  * to whitespace tokens for document text.
  */
object TextFunctions {

  /** Unicode NFC canonicalization — the native codegen'd
    * [[graft.plans.NfcNormalize]] expression (Spark has no built-in
    * normalizer; a UDF would leave whole-stage codegen). Run before any
    * hash-keyed text operator: decomposed "e"+U+0301 vs precomposed é
    * are byte-different and silently split dedup/vocab keys.
    */
  def nfc(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.NfcNormalize(
        org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  /** Whitespace tokens with empties removed (split keeps trailing ""). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= lit(""))

  /** Token count on the whitespace tokenizer. */
  def tokenCount(text: Column): Column =
    size(tokens(text)).cast("long")

  /** BPE-ish sub-token count: letter runs, digit runs, and single
    * punctuation marks each count as one token (a cheap proxy for a real
    * BPE vocab, computable inside codegen).
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))).cast("long")

  /** Word n-gram shingles (n>=2) over the whitespace tokens; empty array
    * when the document has fewer than n tokens. Built as a fold of
    * slice+zip_with (one zip per extra gram) so no explode/shuffle is
    * needed to form shingles; n∈{2,3,5} are the C4/Gopher-style configs
    * real pipelines use, any n>=2 works.
    */
  def shingles(text: Column, n: Int = 2): Column = {
    require(n >= 2, "shingles need n >= 2")
    val ts = tokens(text)
    // short docs: size-(n-1) would be a negative slice length, which
    // Slice rejects at runtime — clamp to 0 (empty shingle set)
    val len = greatest(size(ts) - (n - 1), lit(0))
    (1 until n).foldLeft(slice(ts, lit(1), len)) { (acc, j) =>
      zip_with(acc, slice(ts, lit(j + 1), len), (a, b) => concat(a, lit(" "), b))
    }
  }

  /** Per-language stopword lists for the n-gram language-ID heuristic.
    * Order is the deterministic tie-break priority.
    */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ein", "zu"),
    "es" -> Seq("el", "los", "las", "y", "que", "por"),
    "fr" -> Seq("le", "les", "et", "des", "une", "dans"),
    "zh" -> Seq("de", "shi", "le", "zai", "you"),
  )

  /** Stopword hits for one language list (a long, codegen-friendly). */
  def stopwordHits(text: Column, words: Seq[String]): Column = {
    val arr = array(words.map(lit): _*)
    size(filter(tokens(text), t => array_contains(arr, t))).cast("long")
  }

  /** Heuristic language-ID: argmax of stopword hits with a fixed
    * priority-order tie break (first language wins ties).
    */
  def langId(text: Column): Column = {
    // argmax via ONE array_max over (score, -position) structs — each
    // language's stopword scan runs exactly once, and the lexicographic
    // tie-break keeps the fixed priority order (first language wins)
    val entries = array(langStopwords.zipWithIndex.map { case ((_, ws), i) =>
      struct(stopwordHits(text, ws).as("s"), lit(-i).as("ni"))
    }: _*)
    val best = (-array_max(entries).getField("ni")).cast("int")
    element_at(array(langStopwords.map(p => lit(p._1)): _*), best + 1)
  }

  /** Exact count of characters matching a (Java-dialect) regex class —
    * the length-delta trick; pair with the RE2 spelling of the same
    * class in the DuckDB twin.
    */
  def charClassCount(text: Column, javaClass: String): Column =
    (length(text) - length(regexp_replace(text, javaClass, ""))).cast("long")

  /** Jaro–Winkler similarity through the native codegen'd expression
    * ([[graft.plans.JaroWinkler]]) — DuckDB-variant semantics, see the
    * kernel doc.
    */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.JaroWinkler(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Deterministic syllable proxy: Σ per word max(1, vowel-char count)
    * over the whitespace tokens — the cheap cross-engine heuristic a
    * readability gate needs (real hyphenation dictionaries aren't
    * engine-portable). Pure higher-order-function fold, codegen'd.
    */
  def syllableCount(text: Column): Column =
    aggregate(tokens(text), lit(0L), (a, w) =>
      a + greatest(lit(1L),
        (length(w) - length(regexp_replace(lower(w), "[aeiouy]", "")))
          .cast("long")))

  /** Sentence count: non-overlapping `[.!?]+` runs, floored at 1 so a
    * fragment without terminal punctuation still counts as one sentence.
    */
  def sentenceCount(text: Column): Column =
    greatest(lit(1L), regexp_count(text, lit("[.!?]+")).cast("long"))

  /** Quality score in [0,1]: length saturation + stopword ratio + alpha
    * ratio, the same shape of cheap heuristics used to pre-filter web text
    * for training corpora. Deterministic double arithmetic, rounded to 4dp.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val nChars = length(text).cast("double")
    val lenScore = least(lit(1.0), nChars / lit(400.0))
    val stopRatio = stopwordHits(text, langStopwords.flatMap(_._2).distinct).cast("double") /
      greatest(nTok.cast("double"), lit(1.0))
    val alphaRatio = length(regexp_replace(text, "[^a-z]", "")).cast("double") /
      greatest(nChars, lit(1.0))
    round(lit(0.5) * lenScore + lit(0.3) * stopRatio + lit(0.2) * alphaRatio, 4)
  }

  /** PII scrub: replace email addresses and long digit runs (phone/ID
    * numbers) with typed placeholder tokens — the cheap regex tier of a
    * privacy pipeline, fully codegen'd, no UDF. Returns the scrubbed
    * text; pair with [[piiCount]] to audit redaction volume.
    */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val LongDigitsRe = "[0-9][0-9 ()\\-]{6,}[0-9]"

  def piiScrub(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), LongDigitsRe, "<NUMBER>")

  /** Number of PII matches (emails + digit runs) in the raw text. */
  def piiCount(text: Column): Column =
    (size(regexp_extract_all(text, lit(EmailRe), lit(0))) +
      size(regexp_extract_all(text, lit(LongDigitsRe), lit(0)))).cast("long")

  /** Canonical content fingerprint: md5 of lowercase, whitespace-collapsed,
    * trimmed text. Identical value in any engine with a standard md5.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Rolling polynomial hash over per-token md5-derived values — an
    * order-sensitive fingerprint (detects token reordering that the
    * set-based hashes miss). acc = (acc*31 + v) mod 1e9+7.
    */
  def rollingHash(text: Column): Column = {
    val hexv = (t: Column) =>
      conv(substring(md5(t), 1, 2), 16, 10).cast("long")
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(acc * lit(31L) + hexv(t), lit(1000000007L)))
  }
}
