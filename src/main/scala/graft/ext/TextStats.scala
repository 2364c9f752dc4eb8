package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.ScalarFns.strip

/** Text-analysis operators for training-data pipelines (SURVEY.md §2.10):
  * token counting, quality scoring, language-ID, fingerprinting.
  *
  * Everything is a pure Catalyst expression over the `documents` table —
  * codegen'd, embarrassingly parallel, no shuffle — so cost at 100 TB is one
  * pass over the corpus with full column pruning (only `text` + keys read).
  */
object TextStats {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(strip(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-word count: letter runs, single digits, and punctuation
    * each count as one token (a simplified GPT-2-style pre-tokenizer
    * regex). */
  val bpeishPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeishPattern), lit(0)))

  /** Quality-score components: length, mean word length, punctuation /
    * digit / uppercase / whitespace ratios, stopword ratio. All ratios are
    * rounded to 6 dp so results hash-stably across engines. */
  def charCount(text: Column): Column = length(text)

  def meanWordLen(text: Column): Column =
    round(length(regexp_replace(text, "\\s+", ""))
      / tokenCount(text).cast("double"), 6)

  private def ratioOf(text: Column, pattern: String): Column =
    round(size(regexp_extract_all(text, lit(pattern), lit(0)))
      / length(text).cast("double"), 6)

  def punctRatio(text: Column): Column = ratioOf(text, "[^A-Za-z0-9\\s]")
  def digitRatio(text: Column): Column = ratioOf(text, "[0-9]")
  def upperRatio(text: Column): Column = ratioOf(text, "[A-Z]")

  /** Common English function words (public knowledge). */
  val enStopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of",
    "to", "in", "is", "it", "that", "for", "on", "with", "as", "at", "by")

  def stopwordCount(text: Column, words: Seq[String] = enStopwords): Column =
    size(filter(tokens(lower(text)), t => t.isin(words: _*)))

  def stopwordRatio(text: Column): Column =
    round(stopwordCount(text) / tokenCount(text).cast("double"), 6)

  /** Composite quality score in [0,1]: rewards sane length and stopword
    * presence, penalizes punctuation/digit noise. Deterministic, rounded. */
  def qualityScore(text: Column): Column =
    round(
      least(lit(1.0), tokenCount(text) / lit(20.0)) * lit(0.4)
        + least(lit(1.0), stopwordRatio(text) * lit(4.0)) * lit(0.3)
        + greatest(lit(0.0), lit(1.0) - punctRatio(text) * lit(5.0)) * lit(0.2)
        + greatest(lit(0.0), lit(1.0) - digitRatio(text) * lit(5.0)) * lit(0.1),
      6)

  /** n-gram-heuristic language ID: score each candidate language by its
    * function-word hit ratio, pick the argmax (ties → 'und'). Lists are
    * tiny; the whole thing stays one codegen'd projection. */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "por"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "von", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "dans", "que"),
    "zh" -> Seq("de", "shi", "bu", "le", "wo", "you", "zai", "ta"))

  def langScores(text: Column): Seq[(String, Column)] =
    langStopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      lang -> round(
        stopwordCount(text, words) / tokenCount(text).cast("double"), 6)
    }

  def langId(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best <= 0, lit("und"))) { case (acc, (lang, sc)) =>
      acc.when(sc === best, lit(lang))
    }.otherwise(lit("und"))
  }

  /** Document fingerprint: md5 of whitespace-collapsed lowercase text —
    * the exact-dedup key. Same formula is expressible in any engine. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(strip(text)), "\\s+", " "))
}
