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
