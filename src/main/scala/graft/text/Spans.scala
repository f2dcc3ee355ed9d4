package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.roundStable

/** Repeated-span detection — the document-INTERNAL half of the dedup
  * ladder (Lee et al. ACL'22, "Deduplicating Training Data Makes
  * Language Models Better"): exact k-token grams that occur more than
  * once ANYWHERE in the corpus (other docs or the same doc — both are
  * memorization fuel) and, per document, the share of its tokens
  * covered by such grams. MinHash/SimHash/winnowing score whole-doc
  * similarity; this finds the boilerplate PASSAGES — license headers,
  * navigation chrome, templated intros — inside otherwise-unique
  * documents, which whole-doc dedup can never remove.
  *
  * Shape (the 100 TB plan): one gram explode (O(total tokens) rows —
  * grams materialize as strings, k· heavier than tokens but still
  * linear), one keyed count on the gram, one keyed join back, then a
  * bounded per-doc window (`max` over k−1 preceding rows) to turn
  * start flags into token coverage — no pair join anywhere, unlike the
  * pairwise dedup family: span detection is a GROUP-BY problem, not a
  * join problem. At real scale swap the gram string for its 128-bit
  * hash (collision-safe, 8-16 B/row instead of ~k words); the string
  * form here is what makes the DuckDB oracle exact.
  */
object Spans {

  /** Per-document repeated-span coverage: `n_tokens`, number of
    * repeated k-gram start positions, tokens covered by at least one
    * repeated gram, and the covered share — the Lee et al. dedup
    * pressure metric. Docs shorter than k tokens emit zero coverage
    * with their token count visible. `minCount` is the repetition
    * threshold (2 = appears anywhere else, incl. the same doc).
    */
  def repeatedSpanCoverage(docs: DataFrame, idCol: String, textCol: String,
                           k: Int, minCount: Int = 2,
                           digits: Int = 6): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    require(minCount >= 2, s"need minCount >= 2, got $minCount")
    val arr = split(col(textCol), " ")
    // gram materialization (k-token concat per position) is the heavy
    // per-row stage — spread an under-parallel scan first (guide §2.2)
    val base = graft.Tables.spread(docs, idCol)
      .select(col(idCol).as("__id"), arr.as("__w"))
      .withColumn("__n", size(col("__w")))
    // 1-based gram start positions, gram = tokens [pos, pos+k-1]
    val grams = base
      .filter(col("__n") >= k)
      .select(col("__id"),
        posexplode(transform(sequence(lit(1), col("__n") - (k - 1)),
          i => concat_ws(" ", slice(col("__w"), i, lit(k))))).as(Seq("__p0", "__g")))
      .select(col("__id"), (col("__p0") + 1).as("__pos"), col("__g"))
    val counts = grams.groupBy(col("__g"))
      .agg(count(lit(1)).as("__c"))
    val starts = grams.join(counts, "__g")
      .filter(col("__c") >= minCount)
      .select(col("__id").as("__sid"), col("__pos"), lit(1).as("__rep"))
    val toks = base.select(col("__id"), col("__n"),
      explode(sequence(lit(1), col("__n"))).as("__t"))
    val wCover = Window.partitionBy(col("__id")).orderBy(col("__t"))
      .rowsBetween(-(k - 1), 0)
    val covered = toks
      .join(starts, col("__id") === col("__sid") && col("__t") === col("__pos"),
        "left_outer")
      .drop("__sid", "__pos")
      .withColumn("__flag", coalesce(col("__rep"), lit(0)))
      .withColumn("__cov", max(col("__flag")).over(wCover))
    covered.groupBy(col("__id"))
      .agg(first(col("__n")).cast("long").as("n_tokens"),
        sum(col("__flag")).cast("long").as("n_repeated_starts"),
        sum(col("__cov")).cast("long").as("covered_tokens"))
      .select(col("__id").as(idCol), col("n_tokens"),
        col("n_repeated_starts"), col("covered_tokens"),
        roundStable(col("covered_tokens").cast("double") /
          col("n_tokens"), digits).as("repeated_share"))
  }

  /** The corpus-level readout over the same gram counts: the top
    * repeated k-grams by occurrence count with how many distinct docs
    * each touches — WHAT the boilerplate is, for allow/deny-listing
    * before a span-level scrub. Ranked (count desc, gram) — rounded
    * nothing, exact integers.
    */
  def topRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                       k: Int, topN: Int = 20): DataFrame = {
    require(k >= 2 && topN >= 1, s"need k >= 2, topN >= 1")
    val arr = split(col(textCol), " ")
    // gram materialization (k-token concat per position) is the heavy
    // per-row stage — spread an under-parallel scan first (guide §2.2)
    val base = graft.Tables.spread(docs, idCol)
      .select(col(idCol).as("__id"), arr.as("__w"))
      .withColumn("__n", size(col("__w")))
    val grams = base.filter(col("__n") >= k)
      .select(col("__id"),
        explode(transform(sequence(lit(1), col("__n") - (k - 1)),
          i => concat_ws(" ", slice(col("__w"), i, lit(k))))).as("__g"))
    grams.groupBy(col("__g"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("__id")).as("n_docs"))
      .filter(col("n_occurrences") >= 2)
      .withColumn("rank", row_number().over(Window.orderBy(
        col("n_occurrences").desc, col("__g").asc)).cast("long"))
      .filter(col("rank") <= topN)
      .select(col("rank"), col("__g").as("gram"), col("n_occurrences"),
        col("n_docs"))
      .orderBy(col("rank"))
  }
}
