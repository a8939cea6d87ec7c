package graft.tdp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: language ID, quality scoring, token counting,
  * document fingerprinting. Every operator is a pure Catalyst column
  * expression (whole-stage codegen, no UDFs) with an ANSI-SQL twin for the
  * DuckDB oracle — the hash primitives are md5/sha256 strings so both
  * engines produce identical values.
  *
  * Scale: all ops are narrow (per-row) — no shuffle; at 100 TB they run at
  * scan speed with column pruning (only `text` is read).
  */
object TextAnalysis {

  /** Lowercased whitespace tokens. */
  def words(text: Column): Column = split(lower(text), "\\s+")

  // ------------------------------------------------------------ language ID

  /** Stopword lists per language for the n-gram/stopword language-ID
    * heuristic (tiny closed sets; a real system would ship larger tables —
    * the operator shape is identical).
    */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une"),
    "es" -> Seq("el", "de", "y", "que", "los", "una"))

  private def stopwordCount(ws: Column, lang: String): Column =
    size(filter(ws, w => w.isin(Stopwords(lang).map(lit): _*).cast("boolean")))

  /** Predicted language: CJK-character presence short-circuits to zh; else
    * argmax of per-language stopword counts with a fixed tie-break priority
    * en > de > fr > es (encoded as score*8 + priority so the argmax is one
    * integer `greatest`). Deterministic and SQL-expressible.
    */
  def langId(text: Column): Column = {
    val ws = words(text)
    val zh = length(regexp_replace(text, "[^\\u4e00-\\u9fff]", ""))
    val scored = Seq("en" -> 4, "de" -> 3, "fr" -> 2, "es" -> 1).map {
      case (l, prio) => stopwordCount(ws, l) * 8 + prio
    }
    val best = greatest(scored: _*)
    when(zh > 0, "zh").otherwise(
      when(pmod(best, lit(8)) === 4, "en")
        .when(pmod(best, lit(8)) === 3, "de")
        .when(pmod(best, lit(8)) === 2, "fr")
        .otherwise("es"))
  }

  // --------------------------------------------------------- quality score

  /** Heuristic quality features + a composite score in [0, ~1]:
    * length, word stats, punctuation/digit/uppercase ratios, stopword
    * ratio. Mirrors the usual pretraining-corpus filters (C4/Gopher-style
    * length & symbol-ratio rules).
    */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val n = length(text).cast("double")
    val ws = words(text)
    val nWords = size(ws).cast("double")
    val punct = length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double")
    val digits = length(regexp_replace(text, "[^0-9]", "")).cast("double")
    val upper = length(regexp_replace(text, "[^A-Z]", "")).cast("double")
    val stop = stopwordCount(ws, "en").cast("double")
    Seq(
      "n_chars" -> n,
      "n_words" -> nWords,
      "avg_word_len" -> round((n - nWords + lit(1.0)) / nWords, 4),
      "punct_ratio" -> round(punct / n, 4),
      "digit_ratio" -> round(digits / n, 4),
      "upper_ratio" -> round(upper / n, 4),
      "stopword_ratio" -> round(stop / nWords, 4))
  }

  /** Composite score: reward mid-length docs and stopword presence,
    * penalize symbol/digit noise. Clamped to [0,1], rounded.
    */
  def qualityScore(text: Column): Column = {
    val n = length(text).cast("double")
    val ws = words(text)
    val nWords = size(ws).cast("double")
    val punct = length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double")
    val digits = length(regexp_replace(text, "[^0-9]", "")).cast("double")
    val stop = stopwordCount(ws, "en").cast("double")
    val lenTerm = least(n / lit(200.0), lit(1.0)) * 0.4
    val stopTerm = least(stop / nWords * lit(5.0), lit(1.0)) * 0.3
    val noise = least((punct + digits) / n * lit(5.0), lit(1.0)) * 0.3
    round(greatest(lenTerm + stopTerm - noise, lit(0.0)), 4)
  }

  // --------------------------------------------------------- token counting

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(words(text))

  /** BPE-ish pre-tokenizer count: runs of letters, runs of digits, single
    * other non-space symbols — the GPT-2-style pre-tokenization regex
    * shape, counted. `regexp_extract_all` exists in both engines.
    */
  val BpeIshPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeIshTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeIshPattern), lit(0)))

  /** Crude byte-level token estimate: ceil(bytes / 4) — the usual "~4 bytes
    * per token" sizing heuristic for budget planning.
    */
  def byteTokenEstimate(text: Column): Column =
    ceil(octet_length(text).cast("double") / 4.0).cast("long")

  // ---------------------------------------------------------- fingerprints

  /** Polynomial rolling hash over the character codes, mod 1e9+7 — the
    * Rabin-Karp document fingerprint. Left fold with init 0 gives the same
    * value as DuckDB's `list_reduce` (whose init is the first element),
    * because 0*31 + c0 = c0; every step applies the mod so both engines
    * stay in exact int64 range.
    *
    * Codegen'd streaming kernel ([[TextExprs.rolling_hash]]): one pass,
    * O(1) memory — the declarative form below materialized an O(len)
    * per-char array per row (round-1 verdict: heavy on MB-size docs).
    */
  def rollingHash(text: Column): Column = TextExprs.rolling_hash(text)

  /** The original declarative formulation — kept as the semantic oracle
    * for the kernel (TdpSpec cross-checks them on the corpus).
    */
  def rollingHashDeclarative(text: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(text)), i => ascii(text.substr(i, lit(1))).cast("long")),
      lit(0L),
      (acc, c) => pmod(acc * 31 + c, lit(1000000007L)))

  /** Winnowing-style robust fingerprint: the minimum md5 over all
    * character k-grams — stable under local edits anywhere except the
    * minimizing window (a 1-window winnow; the full winnowing algorithm
    * keeps per-window minima, same primitive).
    *
    * Codegen'd streaming kernel ([[TextExprs.min_kgram_md5]]): reused
    * digest + running minimum over UTF-8 byte windows — no per-window
    * md5-hex-string array (O(len · 32) bytes per row in the declarative
    * form below).
    */
  def minKgramFingerprint(text: Column, k: Int = 16): Column =
    TextExprs.min_kgram_md5(text, lit(k))

  /** Declarative twin of [[minKgramFingerprint]] (spec cross-check). */
  def minKgramFingerprintDeclarative(text: Column, k: Int = 16): Column =
    array_min(transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => md5(text.substr(i, lit(k)))))

  /** FULL winnowing fingerprint set (Schleimer/Wilkerson/Aiken 2003, the
    * MOSS primitive): the sorted distinct minima of every `w`-window over
    * the k-gram md5 sequence. Guarantees of the scheme: any match of
    * length ≥ w+k-1 between two documents shares at least one selected
    * fingerprint, and no match shorter than k is detected. Codegen'd
    * streaming kernel ([[TextExprs.winnow_fingerprints]]): monotonic-deque
    * sliding minimum, O(len) total, no per-window arrays.
    */
  def winnowFingerprints(text: Column, k: Int = 16, w: Int = 8): Column =
    TextExprs.winnow_fingerprints(text, lit(k), lit(w))

  /** Declarative twin of [[winnowFingerprints]] (spec cross-check; the
    * transform(slice(...)) form materializes O(len·w) work per row — the
    * kernel is the scale path).
    */
  def winnowFingerprintsDeclarative(text: Column, k: Int = 16, w: Int = 8): Column = {
    val grams = transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => md5(text.substr(i, lit(k))))
    val mins = transform(
      sequence(lit(1), greatest(size(grams) - (w - 1), lit(1))),
      i => array_min(slice(grams, i, least(lit(w), size(grams)))))
    // null gate: greatest()/array_min skip SQL NULLs, so a null text would
    // otherwise yield [null] instead of NULL (the kernel is null-intolerant)
    when(text.isNotNull, array_sort(array_distinct(mins)))
  }
}
