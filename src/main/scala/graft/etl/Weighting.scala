package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.roundStable

/** Survey-weighting operators: iterative proportional fitting (raking)
  * to known marginals, and the two readouts every weighting scheme
  * must be judged by — Kish's effective sample size / design effect,
  * and the trimming trade-off. Everything runs on the AGGREGATED cell
  * table (the 100 TB unit table reduces to O(rows × cols) cells
  * first); the IPF sweeps are a fixed, documented unroll — plan depth
  * is 2·sweeps windows over cells, never data.
  *
  * Reference anchor: dag:365-407 (the reference's quality gates
  * assume a representative batch; raking is how a skewed one is made
  * representative).
  */
object Weighting {

  /** 2-D iterative proportional fitting / raking (Deming & Stephan
    * 1940): scale the observed (row, col) cell counts so both
    * marginals match the given targets — the survey-adjustment
    * workhorse ("make the panel's age×region mix match the census").
    * A fixed `sweeps` unroll (row-scale then col-scale per sweep —
    * deterministic, engine-identical; IPF converges geometrically, so
    * a handful of sweeps is the standard practice); structural zeros
    * stay zero (an empty cell cannot receive mass), and an all-zero
    * row/col under a positive target keeps its zeros rather than
    * 0-dividing — visible via `row_err`. Emits per cell: n, the raked
    * mass, the unit weight (raked/n), and the cell's row-marginal
    * relative error AFTER the final column sweep — the honest
    * convergence readout (rows are the stale side by construction).
    * Target totals should agree (Σrow = Σcol), else IPF oscillates —
    * the caller's contract, stated.
    */
  def rake(cells: DataFrame, rowCol: String, colCol: String,
           countCol: Column, rowTargets: DataFrame, colTargets: DataFrame,
           sweeps: Int = 3, digits: Int = 6): DataFrame = {
    require(sweeps >= 1, s"need sweeps >= 1, got $sweeps")
    val wRow = Window.partitionBy(col(rowCol))
    val wCol = Window.partitionBy(col(colCol))
    var m = cells
      .select(col(rowCol), col(colCol), countCol.cast("double").as("__n"))
      .join(broadcast(rowTargets.select(col(rowCol),
        col("target").cast("double").as("__rt"))), rowCol)
      .join(broadcast(colTargets.select(col(colCol),
        col("target").cast("double").as("__ct"))), colCol)
      .withColumn("__m", col("__n"))
    for (_ <- 1 to sweeps) {
      m = m.withColumn("__m", when(sum(col("__m")).over(wRow) > 0,
        col("__m") * col("__rt") / sum(col("__m")).over(wRow))
        .otherwise(col("__m")))
      m = m.withColumn("__m", when(sum(col("__m")).over(wCol) > 0,
        col("__m") * col("__ct") / sum(col("__m")).over(wCol))
        .otherwise(col("__m")))
    }
    m.withColumn("__rowsum", sum(col("__m")).over(wRow))
      .select(col(rowCol), col(colCol), col("__n").cast("long").as("n"),
        roundStable(col("__m"), digits).as("raked"),
        roundStable(when(col("__n") > 0, col("__m") / col("__n")),
          digits).as("weight"),
        roundStable(when(col("__rt") > 0,
          abs(col("__rowsum") - col("__rt")) / col("__rt")), digits)
          .as("row_err"))
  }

  /** Kish effective sample size and design effect (Kish 1965) over a
    * weighted table: `ESS = (Σw)²/Σw²`, `deff = n·Σw²/(Σw)²` — what a
    * weighting scheme COSTS in precision (deff 1.5 means the weighted
    * estimate is as noisy as an unweighted sample two-thirds the
    * size). `countCol` carries cell multiplicities so the computation
    * runs on the reduced table (a cell of n units at weight w
    * contributes n·w and n·w² — identical to exploding the units, a
    * 100 TB no-op). Degenerate keys (no weight mass) emit NULL.
    */
  def essDeff(df: DataFrame, keys: Seq[String], weightCol: Column,
              countCol: Column = lit(1L), digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val w = weightCol.cast("double")
    val c = countCol.cast("double")
    val st = df.filter(w.isNotNull && w >= 0)
      .groupBy(keyCols: _*)
      .agg(sum(c).as("__cn"), sum(c * w).as("__sw"),
        sum(c * w * w).as("__sw2"))
    st.select(keyCols ++ Seq(col("__cn").cast("long").as("n"),
      roundStable(when(col("__sw2") > 0,
        col("__sw") * col("__sw") / col("__sw2")), digits).as("ess"),
      roundStable(when(col("__sw") > 0,
        col("__cn") * col("__sw2") / (col("__sw") * col("__sw"))),
        digits).as("deff")): _*)
  }

  /** Weight trimming trade-off: cap weights at their `p`-quantile
    * (exact interpolated quantile over the DISTINCT cell weights —
    * the deterministic convention), rescale so total mass is
    * preserved, and report what the trim bought: ESS before/after
    * plus the mass share that moved. Extreme weights buy bias
    * protection at a variance price — this is the readout that says
    * whether the price is worth paying (Potter 1990's trimming
    * study). Runs on the reduced (weight, count) table like
    * [[essDeff]].
    */
  def trimWeights(df: DataFrame, keys: Seq[String], weightCol: Column,
                  countCol: Column = lit(1L), p: Double = 0.95,
                  digits: Int = 6): DataFrame = {
    require(p > 0 && p < 1, s"need 0 < p < 1, got $p")
    val keyCols = keys.map(col)
    val w = weightCol.cast("double")
    val c = countCol.cast("double")
    val base = df.filter(w.isNotNull && w >= 0)
      .select(keyCols :+ w.as("__w") :+ c.as("__c"): _*)
    val caps = base.groupBy(keyCols: _*)
      .agg(expr(s"percentile(__w, $p)").as("__cap"))
    val trimmed = base.join(broadcast(caps), keys)
      .withColumn("__wt", least(col("__w"), col("__cap")))
    val st = trimmed.groupBy(keyCols: _*)
      .agg(sum(col("__c")).as("__cn"),
        first(col("__cap")).as("__capv"),
        sum(col("__c") * col("__w")).as("__sw"),
        sum(col("__c") * col("__w") * col("__w")).as("__sw2"),
        sum(col("__c") * col("__wt")).as("__swt"),
        sum(col("__c") * col("__wt") * col("__wt")).as("__swt2"),
        sum(col("__c") * (col("__w") - col("__wt"))).as("__moved"))
    // rescale trimmed weights by k = Σw/Σw' to preserve total mass:
    // ESS is scale-invariant, so ess_after needs no explicit rescale
    st.select(keyCols ++ Seq(col("__cn").cast("long").as("n"),
      roundStable(col("__capv"), digits).as("cap"),
      roundStable(when(col("__sw") > 0, col("__moved") / col("__sw")),
        digits).as("mass_trimmed"),
      roundStable(when(col("__sw2") > 0,
        col("__sw") * col("__sw") / col("__sw2")), digits)
        .as("ess_before"),
      roundStable(when(col("__swt2") > 0,
        col("__swt") * col("__swt") / col("__swt2")), digits)
        .as("ess_after")): _*)
  }
}
