package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.roundStable

/** Re-identification risk screens (Sweeney 2002 k-anonymity; Machanavajjhala
  * et al. 2007 l-diversity) — the governance gate a dataset passes before
  * it leaves the curation pipeline: how small do the quasi-identifier
  * (QI) equivalence classes get, and how much of the corpus sits in
  * classes small enough to single someone out; then, for classes that ARE
  * large enough, whether the sensitive attribute still leaks by being
  * homogeneous inside a class (the attack k-anonymity alone misses).
  *
  * Both are one QI-keyed aggregation + one fold over O(#classes) rows —
  * group-by problems that scale like any other keyed agg. Reference
  * context: the reference's validation stage (dag:365-407) gates on
  * aggregate stats; these are the privacy-specific members of that
  * family.
  */
object Privacy {

  /** One-row k-anonymity report against a target `k`: class count,
    * smallest class (= the k the dataset actually satisfies), rows in
    * classes below the target and their share. Rows with a NULL in any
    * QI column form their own NULL-keyed classes (groupBy semantics,
    * identical in the oracle) — a NULL zip code is still a zip-code
    * value to a linker.
    */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String],
                       k: Int, digits: Int = 6): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2, s"need QI cols and k >= 2")
    val classes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    kAnonymityFromClasses(classes, k, digits)
  }

  /** The fold half of [[kAnonymityReport]], over a pre-built class table
    * (`__n` rows per QI class) — shared with the streaming gate
    * ([[graft.streaming.PrivacyStream]]), whose merged additive cells
    * reduce to exactly this table, so the live report is the batch
    * report BY CONSTRUCTION (integer sums are associative across
    * micro-batches; split ≡ one-shot).
    */
  private[graft] def kAnonymityFromClasses(classes: DataFrame, k: Int,
                                           digits: Int = 6): DataFrame = {
    classes.agg(
        sum(col("__n")).as("__rows"),
        count(lit(1)).as("n_classes"),
        min(col("__n")).as("k_satisfied"),
        sum(when(col("__n") < k, col("__n")).otherwise(0L)).as("__risk"),
        sum(when(col("__n") < k, 1L).otherwise(0L)).as("n_classes_at_risk"))
      .select(col("__rows").cast("long").as("n_rows"), col("n_classes"),
        col("k_satisfied").cast("long").as("k_satisfied"),
        lit(k).cast("long").as("k_target"),
        col("n_classes_at_risk"),
        col("__risk").cast("long").as("n_rows_at_risk"),
        roundStable(col("__risk").cast("double") / col("__rows"), digits)
          .as("risk_share"))
  }

  /** Per-QI-class distinct-l-diversity screen, reduced to the one-row
    * report: the minimum number of DISTINCT sensitive values any class
    * carries (= the l satisfied), plus rows sitting in classes below
    * the target `l` — homogeneity attacks hit exactly those rows (the
    * class may be 500 people, but if they all share one diagnosis the
    * QI alone discloses it). NULL sensitive values count as a value —
    * "absent" discloses too.
    */
  def lDiversityReport(df: DataFrame, quasiCols: Seq[String],
                       sensitiveCol: Column, l: Int,
                       digits: Int = 6): DataFrame = {
    require(quasiCols.nonEmpty && l >= 2, s"need QI cols and l >= 2")
    val qi = quasiCols.map(col)
    val cells = df
      .groupBy(qi :+ sensitiveCol.as("__s"): _*)
      .agg(count(lit(1)).as("__n"))
    lDiversityFromCells(cells, quasiCols, l, digits)
  }

  /** The fold half of [[lDiversityReport]], over pre-built (QI…,
    * sensitive) cells (`__n` rows per cell) — shared with the streaming
    * gate for the same split ≡ one-shot reason as
    * [[kAnonymityFromClasses]]: distinct-sensitive counts come from
    * cell EXISTENCE, which micro-batch cell sums preserve exactly.
    */
  private[graft] def lDiversityFromCells(cells: DataFrame,
      quasiCols: Seq[String], l: Int, digits: Int = 6): DataFrame = {
    val qi = quasiCols.map(col)
    val classes = cells.groupBy(qi: _*)
      .agg(sum(col("__n")).as("__rows"), count(lit(1)).as("__ldist"))
    classes.agg(
        sum(col("__rows")).as("__tot"),
        count(lit(1)).as("n_classes"),
        min(col("__ldist")).as("l_satisfied"),
        sum(when(col("__ldist") < l, col("__rows")).otherwise(0L))
          .as("__risk"),
        sum(when(col("__ldist") < l, 1L).otherwise(0L))
          .as("n_classes_at_risk"))
      .select(col("__tot").cast("long").as("n_rows"), col("n_classes"),
        col("l_satisfied").cast("long").as("l_satisfied"),
        lit(l).cast("long").as("l_target"),
        col("n_classes_at_risk"),
        col("__risk").cast("long").as("n_rows_at_risk"),
        roundStable(col("__risk").cast("double") / col("__tot"), digits)
          .as("risk_share"))
  }
}
