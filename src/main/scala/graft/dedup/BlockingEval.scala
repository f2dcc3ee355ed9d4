package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.roundStable

/** Blocking-quality evaluation (the Christen 2012 record-linkage
  * metrics) — the meta-operator that AUDITS a dedup pipeline's
  * candidate-generation stage instead of trusting it: given a cheap
  * blocking key (here: a prefix of the normalized text) and exact
  * near-dup ground truth ([[NGramJaccard.similarPairs]] — itself
  * oracle-gated via q34), report
  *
  *   - reduction ratio  RR = 1 − |candidates| / C(n,2) — how much of
  *     the quadratic pair space the blocking refuses to look at;
  *   - pair completeness PC = |truth ∩ candidates| / |truth| — the
  *     recall the downstream verifier can at best achieve;
  *   - pair quality      PQ = |truth ∩ candidates| / |candidates| —
  *     the verifier's hit rate (its wasted work is 1 − PQ).
  *
  * The whole point of the shape: |candidates| = Σ C(n_b, 2) comes from
  * BLOCK SIZES, and truth∩candidates from joining the (small) truth
  * pair set to the doc→key map — NO candidate pair is ever
  * enumerated, so the audit itself scales to corpora whose candidate
  * set would not (the blocking being audited might be bad — the audit
  * must not inherit its blowup).
  */
object BlockingEval {

  /** B-cubed cluster-quality metrics (Bagga & Baldwin 1998; the
    * Amigó 2009 survey's recommended pair) — score a dedup CLUSTERING
    * against ground-truth classes: per element, precision = the share
    * of its cluster that shares its truth class, recall = the share
    * of its truth class captured by its cluster; averages + F1.
    * B-cubed, unlike pair-F1, does not let one giant cluster dominate
    * the score. The per-element averages collapse to CELL arithmetic:
    * `P = Σ n²_ct/n_c / N`, `R = Σ n²_ct/n_t / N` over the
    * (cluster, truth) contingency cells — one cell aggregation +
    * windows over O(#cells) rows, no per-element join, which is what
    * makes the audit itself 100 TB-safe. F1 from the ROUNDED P and R
    * so both engines fold identically.
    */
  def bcubed(elements: DataFrame, idCol: String, clusterCol: String,
             truthCol: String, digits: Int = 6): DataFrame = {
    val cells = elements
      .groupBy(col(clusterCol).as("__c"), col(truthCol).as("__t"))
      .agg(count(lit(1)).as("__nct"))
    val wc = org.apache.spark.sql.expressions.Window.partitionBy(col("__c"))
    val wt = org.apache.spark.sql.expressions.Window.partitionBy(col("__t"))
    val nct = col("__nct").cast("double")
    val staged = cells
      .withColumn("__nc", sum(col("__nct")).over(wc).cast("double"))
      .withColumn("__nt", sum(col("__nct")).over(wt).cast("double"))
    val bigN = sum(col("__nct")).cast("double")
    val p = sum(nct * nct / col("__nc")) / bigN
    val r = sum(nct * nct / col("__nt")) / bigN
    val agg = staged.agg(
      bigN.cast("long").as("n_elements"),
      countDistinct(col("__c")).as("n_clusters"),
      countDistinct(col("__t")).as("n_truth_classes"),
      roundStable(p, digits).as("bcubed_precision"),
      roundStable(r, digits).as("bcubed_recall"))
    agg.withColumn("f1", roundStable(
      when(col("bcubed_precision") + col("bcubed_recall") > 0,
        lit(2.0) * col("bcubed_precision") * col("bcubed_recall") /
          (col("bcubed_precision") + col("bcubed_recall"))), digits))
  }

  /** One-row report for prefix blocking of length `prefixLen` over the
    * lowercased, non-alphanumeric-stripped text, with word-`n`-gram
    * Jaccard ≥ `minJaccard` as ground truth.
    */
  def prefixBlockingReport(df: DataFrame, idCol: String, textCol: String,
                           prefixLen: Int, n: Int, minJaccard: Double,
                           digits: Int = 6): DataFrame = {
    require(prefixLen >= 1, s"need prefixLen >= 1, got $prefixLen")
    val norm = regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", "")
    val keyed = df.select(col(idCol).as("__id"),
      substring(norm, 1, prefixLen).as("__k"))
    val blocks = keyed.groupBy(col("__k"))
      .agg(count(lit(1)).as("__nb"))
    val nb = col("__nb").cast("double")
    val blockStats = blocks.agg(
      count(lit(1)).as("n_blocks"),
      max(col("__nb")).as("max_block"),
      sum((nb * (nb - lit(1.0)) / lit(2.0)).cast("long")).as("cand_pairs"),
      sum(col("__nb")).as("n_docs"))
    val truth = NGramJaccard
      .similarPairs(df, idCol, textCol, n, minJaccard)
      .select(col("id_a"), col("id_b"))
    val covered = truth
      .join(keyed.select(col("__id").as("id_a"), col("__k").as("__ka")), "id_a")
      .join(keyed.select(col("__id").as("id_b"), col("__k").as("__kb")), "id_b")
      .agg(count(lit(1)).as("true_pairs"),
        sum(when(col("__ka") === col("__kb"), 1L).otherwise(0L))
          .as("covered_pairs"))
    val nD = col("n_docs").cast("double")
    val total = nD * (nD - lit(1.0)) / lit(2.0)
    blockStats.crossJoin(covered)
      .select(
        col("n_docs"), col("n_blocks"), col("max_block"),
        col("cand_pairs"), col("true_pairs"), col("covered_pairs"),
        roundStable(when(total > 0,
          lit(1.0) - col("cand_pairs").cast("double") / total), digits)
          .as("reduction_ratio"),
        roundStable(when(col("true_pairs") > 0,
          col("covered_pairs").cast("double") /
            col("true_pairs").cast("double")), digits)
          .as("pair_completeness"),
        roundStable(when(col("cand_pairs") > 0,
          col("covered_pairs").cast("double") /
            col("cand_pairs").cast("double")), digits)
          .as("pair_quality"))
  }
}
