package graft.tdp

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Corpus-cleaning operators — the standard pretraining text filters
  * (C4 line-level cleaning, Gopher document-rule filtering, PII scrub) as
  * pure Catalyst column expressions. Like the rest of the tdp suite these
  * are narrow per-row ops (no shuffle, scan-speed at 100 TB with only
  * `text` read) and each has an ANSI-SQL twin for the DuckDB oracle.
  *
  * References (public methodology, not code): C4 (Raffel et al. 2020,
  * "Exploring the Limits of Transfer Learning", §2.2 cleaning rules) and
  * Gopher (Rae et al. 2021, "Scaling Language Models", table A1 quality
  * rules). Thresholds are the published ones scaled to this corpus's
  * ~200-char documents where noted.
  */
object Cleaning {

  // ----------------------------------------------------- C4 line filtering

  /** C4-style line-level cleaning: keep only lines that end in terminal
    * punctuation AND have at least `minWords` words; rejoin survivors with
    * newlines (empty string when nothing survives). Declarative
    * filter-over-split — per-row, codegen'd, no explode (an explode would
    * multiply the row count through the shuffle for a per-row transform).
    */
  def c4LineFilter(text: Column, minWords: Int = 3): Column = {
    val lines = split(text, "\n")
    val kept = filter(lines, l =>
      l.rlike("[.!?\"']\\s*$") &&
        size(split(trim(l), "\\s+")) >= minWords && trim(l) =!= "")
    array_join(kept, "\n")
  }

  // ------------------------------------------------------------- PII scrub

  /** PII / secret scrubbing: emails → `[EMAIL]`, URLs → `[URL]`, long hex
    * runs (tokens, digests) → `[HEX]`, 9+-digit runs (ids, phone-ish) →
    * `[NUM]`. Order matters: URLs before hex (a URL can contain hex), and
    * every pattern is anchored on word-ish boundaries so ordinary text
    * survives. The replacement tags keep token positions roughly stable
    * for downstream dedup/fingerprinting.
    */
  def scrubPii(text: Column): Column = {
    val email = regexp_replace(text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]")
    val url = regexp_replace(email, "https?://[^\\s]+", "[URL]")
    val hex = regexp_replace(url, "\\b[0-9a-fA-F]{16,}\\b", "[HEX]")
    regexp_replace(hex, "\\b[0-9]{9,}\\b", "[NUM]")
  }

  // ------------------------------------------------------ Gopher rule flags

  /** Gopher-style document quality rules as independent boolean flags plus
    * the composite `keep` verdict. Published rule set, bounds scaled to
    * this corpus's short documents (the SHAPE of each rule is the point;
    * production swaps thresholds):
    *
    *  - word count within [minWords, maxWords];
    *  - mean word length within [3, 10];
    *  - ≤ 30% of lines start with a bullet; ≤ 30% end with an ellipsis;
    *  - ≥ 60% of words contain at least one alphabetic character;
    *  - symbol-to-word ratio (# and …) ≤ 0.1.
    *
    * Returns (name → flag) pairs; AND of all flags = keep.
    */
  def gopherFlags(text: Column, minWords: Int = 10, maxWords: Int = 100000): Seq[(String, Column)] = {
    val ws = split(trim(text), "\\s+")
    val nWords = size(ws).cast("double")
    val meanLen = (length(regexp_replace(text, "\\s+", "")).cast("double")) / nWords
    val lines = split(text, "\n")
    val nLines = size(lines).cast("double")
    val bulletLines = size(filter(lines, l => trim(l).rlike("^[-*•]"))).cast("double")
    val ellipsisLines = size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast("double")
    val alphaWords = size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("double")
    val symbols = (length(text) - length(regexp_replace(text, "[#…]", ""))).cast("double")
    Seq(
      "word_count_ok" -> (nWords >= minWords && nWords <= maxWords),
      "mean_word_len_ok" -> (meanLen >= 3.0 && meanLen <= 10.0),
      "bullet_ratio_ok" -> (bulletLines / nLines <= 0.3),
      "ellipsis_ratio_ok" -> (ellipsisLines / nLines <= 0.3),
      "alpha_word_ratio_ok" -> (alphaWords / nWords >= 0.6),
      "symbol_ratio_ok" -> (symbols / nWords <= 0.1))
  }

  /** Composite Gopher verdict: AND of every rule flag. */
  def gopherKeep(text: Column, minWords: Int = 10, maxWords: Int = 100000): Column =
    gopherFlags(text, minWords, maxWords).map(_._2).reduce(_ && _)

  // -------------------------------------------------- within-doc repetition

  /** Gopher's repetition rule family: the fraction of duplicate word
    * n-grams within the document (1 − distinct/total over the n-gram
    * list). Boilerplate, chart dumps, and degenerate generations score
    * high; clean prose scores near 0. Per-row and codegen'd (shares
    * [[Dedup.shingles]] with the MinHash path, so the same tokenization
    * feeds dedup and quality).
    */
  def dupNgramFraction(text: Column, n: Int = 3): Column = {
    val grams = Dedup.shingles(text, n)
    round(lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams).cast("double"), 4)
  }

  /** Repetition verdict: duplicate-n-gram fraction at or below `maxFrac`
    * (Gopher uses 0.18 for duplicate 3-grams; scaled here only by the
    * short test corpus).
    */
  def repetitionOk(text: Column, n: Int = 3, maxFrac: Double = 0.18): Column =
    dupNgramFraction(text, n) <= maxFrac
}
