package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines: token counting,
  * quality scoring, language ID, canonical fingerprinting.
  *
  * All pure Catalyst expressions (split / higher-order functions /
  * regexp_count / md5) — codegen'd, no UDFs, safe in 100 TB scans.
  * The documents corpus is single-space tokenized, so `split(text, ' ')`
  * is the exact tokenizer; swap the delimiter regex for real corpora.
  */
object TextStats {

  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish regex token count: letter runs, digit runs, or single
    * non-alphanumeric marks.
    */
  def reTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long")

  /** Punctuation character ratio over total characters. */
  def punctRatio(text: Column): Column =
    regexp_count(text, lit("[.,!?;:]")).cast("double") / length(text).cast("double")

  /** Fraction of tokens that are (English) stopwords. */
  def stopwordRatio(text: Column, stops: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(stops))).cast("double") /
      size(tokens(text)).cast("double")

  /** Mean token length. */
  def meanWordLen(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, x) => acc + length(x))
      .cast("double") / size(tokens(text)).cast("double")

  /** Composite document quality score in [0,1] — length saturation,
    * punctuation penalty, stopword naturalness. The exact weights mirror
    * the oracle SQL term-for-term (left-associative sum).
    */
  def qualityScore(text: Column, stops: Seq[String]): Column =
    lit(0.5) * least(lit(1.0), wsTokenCount(text).cast("double") / lit(50.0)) +
      lit(0.3) * (lit(1.0) - punctRatio(text)) +
      lit(0.2) * stopwordRatio(text, stops)

  /** Sentence count by terminal-punctuation RUNS (`[.!?]+` counts "?!"
    * once), floored at 1 so fragments still divide.
    */
  def sentenceCount(text: Column): Column =
    greatest(lit(1L), regexp_count(text, lit("[.!?]+")).cast("long"))

  /** Syllable estimate by vowel-group counting — the standard cheap
    * approximation (each `[aeiouy]+` run ≈ one syllable); floored at 1.
    */
  def syllableCount(text: Column): Column =
    greatest(lit(1L), regexp_count(lower(text), lit("[aeiouy]+")).cast("long"))

  /** Flesch reading ease: `206.835 − 1.015·(W/S) − 84.6·(Syl/W)` —
    * the fast structural readability screen (quality gates route on
    * it: very low scores flag run-on machine text, very high ones
    * flag listy fragments). Pure regexp counts, codegen'd.
    */
  def fleschEase(text: Column): Column = {
    val w = wsTokenCount(text).cast("double")
    val s = sentenceCount(text).cast("double")
    val sy = syllableCount(text).cast("double")
    lit(206.835) - lit(1.015) * (w / s) - lit(84.6) * (sy / w)
  }

  /** Flesch–Kincaid grade level: `0.39·(W/S) + 11.8·(Syl/W) − 15.59`. */
  def fkGrade(text: Column): Column = {
    val w = wsTokenCount(text).cast("double")
    val s = sentenceCount(text).cast("double")
    val sy = syllableCount(text).cast("double")
    lit(0.39) * (w / s) + lit(11.8) * (sy / w) - lit(15.59)
  }

  /** Marker-word language ID: count stopword hits per candidate language,
    * argmax with a fixed preference order (en > es > zh on ties).
    */
  def langIdScores(text: Column): (Column, Column, Column) = {
    def score(markers: Seq[String]): Column =
      size(filter(tokens(text), t => t.isInCollection(markers))).cast("long")
    (score(LangMarkers.en), score(LangMarkers.es), score(LangMarkers.zh))
  }

  def langId(text: Column): Column = {
    val (en, es, zh) = langIdScores(text)
    when(en >= es && en >= zh, lit("en"))
      .when(es >= zh, lit("es"))
      .otherwise(lit("zh"))
  }

  /** Canonical content fingerprint: md5 over the sorted distinct token
    * set. Robust to token order and duplication — exact-dedup key for
    * bag-of-words-identical documents.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(lower(text))))))

  object LangMarkers {
    val en = Seq("the", "a")
    val es = Seq("el", "la", "de", "que")
    val zh = Seq("的", "是", "了")
  }
}
