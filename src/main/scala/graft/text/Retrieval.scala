package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.roundStable

/** Lexical retrieval over the corpus — BM25 top-k, the workhorse of
  * data-curation lookups (find the training docs that answer an eval
  * question, kNN-LM neighbor mining, targeted decontamination beyond
  * exact n-gram overlap).
  *
  * Robertson/Sparck Jones BM25 with the Lucene idf variant
  * (`ln(1 + (N − df + 0.5)/(df + 0.5))` — always positive, so a term in
  * most documents degrades smoothly instead of flipping negative).
  */
object Retrieval {

  import TextStats.tokens

  /** BM25 score of every (query, document) pair sharing a term, ranked
    * top-`k` per query. Deterministic: scores are rounded before ranking
    * and ties break on `doc_id`, so the output is oracle-stable.
    *
    * Distributed shape: the corpus is scanned ONCE into token rows; the
    * query term set (bounded — queries are short) broadcasts into a
    * semi-join that restricts everything downstream to query terms, so
    * tf/df aggregate over the matched sliver, never the full vocabulary.
    * df counts full-corpus occurrences of those terms (the restriction
    * is by term, not by document). Corpus length stats are one exact
    * integer aggregation; the final cut is a per-query window, keyed by
    * query id — no global sort anywhere.
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame,
               idCol: String, textCol: String,
               qidCol: String, qtextCol: String, k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               scoreDigits: Int = 6): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    // tokenize ONCE per doc and derive both the explode and the length
    // from the same array column — never re-run the regex per projection
    val docToks = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), explode(col("__toks")).as("tok"),
        size(col("__toks")).cast("long").as("dl"))
    // exact integer corpus stats; doubles only appear at the divides, so
    // the oracle's floating-point sequence is identical
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      sum(size(tokens(col(textCol))).cast("long")).as("sum_dl"))
    val qToks = queries.select(col(qidCol).as("qid"),
      explode(array_distinct(tokens(col(qtextCol)))).as("tok"))
    val qTerms = qToks.select("tok").distinct()
    val tf = docToks.join(broadcast(qTerms), Seq("tok"))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf"), min(col("dl")).as("dl"))
    val df_ = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = log(lit(1) + (col("n_docs") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)))
    val termScore = idf * col("tf") * lit(k1 + 1) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * (col("dl") / avgdl)))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("doc_id"))
    tf.join(broadcast(df_), Seq("tok"))
      .join(broadcast(qToks), Seq("tok"))
      .crossJoin(broadcast(stats))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(termScore).as("__raw"))
      .withColumn("score", roundStable(col("__raw"), scoreDigits))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("doc_id"), col("score"), col("rank"))
  }

  /** Coordination-level match ranking: docs ranked per query by how
    * many DISTINCT query terms they contain (tie-break doc_id) — the
    * coverage baseline that complements score-weighted rankers: a doc
    * matching all terms once beats a doc repeating one term. Same
    * broadcast-semi-join shape as [[bm25TopK]]: the corpus meets only
    * the matched sliver.
    */
  def coverageTopK(docs: DataFrame, queries: DataFrame,
                   idCol: String, textCol: String,
                   qidCol: String, qtextCol: String, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val docToks = docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(tokens(col(textCol)))).as("tok"))
    val qToks = queries.select(col(qidCol).as("qid"),
      explode(array_distinct(tokens(col(qtextCol)))).as("tok"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("n_matched").desc, col("doc_id"))
    docToks.join(broadcast(qToks), Seq("tok"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(count(lit(1)).as("n_matched"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("doc_id"), col("n_matched"), col("rank"))
  }

  /** Reciprocal-rank fusion (Cormack & Clarke SIGIR'09) of N ranked
    * lists: `score(q, d) = Σ_lists 1/(kRrf + rank)` — the standard
    * hybrid-retrieval combiner (BM25 × embedding × coverage) because it
    * needs NO score calibration across rankers, only ranks. A doc
    * missing from a list simply contributes nothing (union, not outer
    * join). Each input needs (qidCol, docCol, rankCol).
    *
    * Shape: per-list map-side projection → one union → one (q, d) agg →
    * per-query window over ≤ N·k aggregated rows. The lists are
    * already top-k bounded, so fusion is O(queries·k·N) regardless of
    * corpus size.
    */
  def rrfFuse(lists: Seq[DataFrame], qidCol: String, docCol: String,
              rankCol: String, kRrf: Int = 60, topK: Int = 10,
              scoreDigits: Int = 6): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    val contrib = lists
      .map(_.select(col(qidCol).as("qid"), col(docCol).as("doc_id"),
        (lit(1.0) / (lit(kRrf) + col(rankCol))).as("__c")))
      .reduce(_ unionByName _)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
    contrib.groupBy(col("qid"), col("doc_id"))
      .agg(roundStable(sum(col("__c")), scoreDigits).as("rrf_score"),
        count(lit(1)).as("n_lists"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }

  /** Rank-biased overlap at fixed depth k (Webber, Moffat & Zobel TOIS
    * 2010): how much two rankings of the same queries AGREE, with
    * top-weighted emphasis — `RBO@k = (1−p)·Σ_{d≤k} p^{d−1}·|A_d ∩
    * B_d|/d`. The similarity-of-rankings twin of nDCG's
    * quality-of-ranking: compare an ANN run against the exact run, a
    * normalized scorer against a raw one, yesterday's index against
    * today's — no relevance labels needed.
    *
    * Shape: the prefix-overlap sum regroups PER ITEM — an item first
    * common to both prefixes at depth `m = max(rank_a, rank_b)`
    * contributes `(1−p)·Σ_{d=m..k} p^{d−1}/d`, a bounded `aggregate`
    * HOF over `sequence(m, k)` (codegen'd, no UDF) — so the whole
    * computation is one inner join of two already-top-k lists + one
    * keyed agg: O(queries·k), corpus-size-free. Queries present in
    * only one list score 0 (no agreement), via the left join from the
    * query universe.
    */
  def rbo(listA: DataFrame, listB: DataFrame, qidCol: String,
          docCol: String, rankCol: String, k: Int, p: Double = 0.9,
          decimals: Int = 6): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    require(p > 0 && p < 1, s"need 0 < p < 1, got $p")
    def side(df: DataFrame, r: String) = df
      .filter(col(rankCol) <= k)
      .select(col(qidCol).as("qid"), col(docCol).as("__doc"),
        col(rankCol).as(r))
    val joined = side(listA, "__ra").join(side(listB, "__rb"),
      Seq("qid", "__doc"))
    val m = greatest(col("__ra"), col("__rb"))
    val weight = aggregate(sequence(m.cast("long"), lit(k.toLong)),
      lit(0.0), (acc, d) => acc + pow(lit(p), d - 1) / d)
    // normalized by the depth-k maximum (1 − p^k) so identical
    // rankings score exactly 1 — truncated RBO alone tops out below 1
    // and reads as disagreement that isn't there
    val perQuery = joined
      .withColumn("__w", weight * (1.0 - p))
      .groupBy(col("qid"))
      .agg((sum(col("__w")) / (lit(1.0) - pow(lit(p), lit(k)))).as("__rbo"),
        count(lit(1)).as("n_common"))
    listA.select(col(qidCol).as("qid")).distinct()
      .join(perQuery, Seq("qid"), "left")
      .select(col("qid"),
        roundStable(coalesce(col("__rbo"), lit(0.0)), decimals).as("rbo"),
        coalesce(col("n_common"), lit(0L)).as("n_common"))
  }
}
