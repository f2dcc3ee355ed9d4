package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.roundStable

/** Index-number and inventory-planning operators: the Fisher price
  * index pair, the ABC-XYZ planning matrix, and the within-item
  * (fixed-effects) demand elasticity. All three reduce the line-item
  * fact table to per-item cells first — O(#items) state, one pass
  * over the 100 TB facts.
  *
  * Reference anchor: dashboard_calidad_aire.py:82-93 (the KPI layer;
  * these are the pricing/planning KPIs for a transactional fact
  * table).
  */
object Econ {

  /** Laspeyres / Paasche / Fisher price indices between two periods
    * (Fisher 1922's "ideal" index — the geometric mean that passes
    * the time-reversal test both one-sided baskets fail): over items
    * traded in BOTH periods (the matched basket — entering/exiting
    * items have no price RELATIVE, excluded and counted),
    * `L = Σp₁q₀/Σp₀q₀` (base-period basket: ignores substitution,
    * overstates inflation), `P = Σp₁q₁/Σp₀q₁` (understates), and
    * `F = √(LP)`. Per-period unit prices are quantity-weighted
    * (`Σ spend / Σ qty` — the unit-value convention, stated). One
    * conditional cell agg per item + one global fold.
    */
  def fisherIndex(df: DataFrame, itemCol: Column, isBase: Column,
                  isCurrent: Column, spendCol: Column, qtyCol: Column,
                  digits: Int = 6): DataFrame = {
    val spend = spendCol.cast("double")
    val qty = qtyCol.cast("double")
    val cells = df.filter(isBase || isCurrent)
      .groupBy(itemCol.as("__item"))
      .agg(sum(when(isBase, spend).otherwise(0.0)).as("__s0"),
        sum(when(isBase, qty).otherwise(0.0)).as("__q0"),
        sum(when(isCurrent, spend).otherwise(0.0)).as("__s1"),
        sum(when(isCurrent, qty).otherwise(0.0)).as("__q1"))
    val matched = col("__q0") > 0 && col("__q1") > 0
    val p0 = col("__s0") / col("__q0")
    val p1 = col("__s1") / col("__q1")
    val agg = cells.agg(
      count(lit(1)).as("n_items"),
      sum(when(matched, 1L).otherwise(0L)).as("n_matched"),
      sum(when(matched, p1 * col("__q0")).otherwise(0.0)).as("__l1"),
      sum(when(matched, p0 * col("__q0")).otherwise(0.0)).as("__l0"),
      sum(when(matched, p1 * col("__q1")).otherwise(0.0)).as("__p1"),
      sum(when(matched, p0 * col("__q1")).otherwise(0.0)).as("__p0"))
    val l = when(col("__l0") > 0, col("__l1") / col("__l0"))
    val p = when(col("__p0") > 0, col("__p1") / col("__p0"))
    agg.select(col("n_items"), col("n_matched"),
      roundStable(l, digits).as("laspeyres"),
      roundStable(p, digits).as("paasche"),
      roundStable(sqrt(l * p), digits).as("fisher"))
  }

  /** ABC-XYZ planning matrix (the inventory-management standard —
    * e.g. Silver-Pyke-Peterson): items classed by cumulative revenue
    * share (A ≤ `aTh`, B ≤ `bTh`, C — the Pareto axis q228 reads)
    * CROSSED with demand variability (X: period-demand CV < `xTh`,
    * Y < `yTh`, Z — the predictability axis). AX items are
    * forecastable cash cows, CZ items are the long tail nobody should
    * hold stock for; the MATRIX is the decision table. CV over
    * OCCUPIED periods only (an item absent a period has no demand
    * row — conservative toward Z, documented); single-period items
    * have no CV and class Z. Ranking on rounded revenue with item
    * tiebreak (the q94 discipline). Two item-level aggs + one rank
    * window; output is the ≤ 9-cell matrix with item and revenue
    * shares.
    */
  def abcXyz(df: DataFrame, itemCol: Column, periodCol: Column,
             revenueCol: Column, qtyCol: Column, aTh: Double = 0.8,
             bTh: Double = 0.95, xTh: Double = 0.5, yTh: Double = 1.0,
             digits: Int = 6): DataFrame = {
    require(aTh < bTh && bTh < 1 && xTh < yTh,
      s"need aTh < bTh < 1 and xTh < yTh, got $aTh/$bTh/$xTh/$yTh")
    val rev = revenueCol.cast("double")
    val qty = qtyCol.cast("double")
    val perPeriod = df.groupBy(itemCol.as("__item"), periodCol.as("__p"))
      .agg(sum(rev).as("__r"), sum(qty).as("__q"))
    val perItem = perPeriod.groupBy(col("__item"))
      .agg(roundStable(sum(col("__r")), digits).as("__rev"),
        count(lit(1)).as("__np"),
        avg(col("__q")).as("__mq"), stddev_pop(col("__q")).as("__sq"))
    val wRank = Window.orderBy(col("__rev").desc, col("__item"))
    val wAll = Window.partitionBy(lit(1))
    val classed = perItem
      .withColumn("__cum", sum(col("__rev")).over(
        wRank.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__tot", sum(col("__rev")).over(wAll))
      .withColumn("abc",
        when(col("__cum") <= col("__tot") * aTh, "A")
          .when(col("__cum") <= col("__tot") * bTh, "B").otherwise("C"))
      .withColumn("__cv", when(col("__np") >= 2 && col("__mq") > 0,
        col("__sq") / col("__mq")))
      .withColumn("xyz",
        when(col("__cv") < xTh, "X").when(col("__cv") < yTh, "Y")
          .otherwise("Z"))
    classed.groupBy(col("abc"), col("xyz"))
      .agg(count(lit(1)).as("n_items"),
        roundStable(sum(col("__rev")), digits).as("revenue"))
      .withColumn("revenue_share", roundStable(col("revenue") /
        sum(col("revenue")).over(wAll), digits))
  }

  /** Concentration / dependency-risk profile (Herfindahl-Hirschman —
    * the antitrust and supply-chain standard): per group, the HHI of
    * its members' value shares `Σs²`, the effective member count
    * `1/Σs²` ("3 000 suppliers that behave like 1.8"), the top
    * member's share, and the single-source flag — the procurement
    * risk screen (DOJ reads HHI > 0.25 as highly concentrated; a
    * single-sourced part is the outage waiting to happen). One
    * (group, member) cell agg + one per-group fold over O(#members)
    * cells; q299's Hill D₂ is this same inverse-Simpson read on token
    * distributions — here it lands on the supply graph.
    */
  def concentration(df: DataFrame, groupCol: Column, memberCol: Column,
                    valueCol: Column, digits: Int = 6): DataFrame = {
    val v = valueCol.cast("double")
    val cells = df.filter(v.isNotNull && v > 0)
      .groupBy(groupCol.as("group"), memberCol.as("__m"))
      .agg(sum(v).as("__v"))
    val wG = Window.partitionBy(col("group"))
    val wTop = Window.partitionBy(col("group"))
      .orderBy(col("__v").desc, col("__m"))
    cells
      .withColumn("__tot", sum(col("__v")).over(wG))
      .withColumn("__s", col("__v") / col("__tot"))
      .withColumn("__rk", row_number().over(wTop))
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n_members"),
        roundStable(sum(col("__s") * col("__s")), digits).as("hhi"),
        roundStable(lit(1.0) / sum(col("__s") * col("__s")), digits)
          .as("effective_n"),
        roundStable(max(when(col("__rk") === 1, col("__s"))), digits)
          .as("top_share"),
        (count(lit(1)) === 1).as("single_source"))
  }

  /** Categorical assortativity / homophily coefficient (Newman PRE
    * 2003, eq. 2) over an edge list with endpoint attributes:
    * `r = (Σᵢeᵢᵢ − Σᵢaᵢbᵢ)/(1 − Σᵢaᵢbᵢ)` from the edge mixing matrix
    * (e = edge share in cell, a/b = its margins) — how much more
    * often edges connect LIKE with like than random wiring would
    * (r = 1 perfectly assortative, 0 random, < 0 disassortative);
    * the one-number answer to "do customers buy from their own
    * nation's suppliers". Value-weighted edges supported (an edge
    * counts its weight). One (attr_a, attr_b) cell agg + margin
    * windows over O(#categories²) cells; degenerate graphs
    * (Σab = 1 — a single cell) emit NULL. B-graph ops measure
    * STRUCTURE; this measures MIXING against attributes.
    */
  def homophily(edges: DataFrame, attrA: Column, attrB: Column,
                weightCol: Column = lit(1.0),
                digits: Int = 6): DataFrame = {
    val w = weightCol.cast("double")
    val cells = edges.filter(w.isNotNull && w > 0)
      .groupBy(attrA.cast("string").as("__a"),
        attrB.cast("string").as("__b"))
      .agg(sum(w).as("__w"))
    val wAll = Window.partitionBy(lit(1))
    val wA = Window.partitionBy(col("__a"))
    val wB = Window.partitionBy(col("__b"))
    val e = cells
      .withColumn("__e", col("__w") / sum(col("__w")).over(wAll))
      .withColumn("__ai", sum(col("__w")).over(wA) /
        sum(col("__w")).over(wAll))
      .withColumn("__bi", sum(col("__w")).over(wB) /
        sum(col("__w")).over(wAll))
    val st = e.agg(
      count(lit(1)).as("n_cells"),
      sum(when(col("__a") === col("__b"), col("__e")).otherwise(0.0))
        .as("__diag"),
      // Σaᵢbᵢ needs ONE term per matched category — cells carry their
      // margins, so take each diagonal category's product once and
      // add the a-only / b-only categories' cross terms via the
      // margin tables reduced below
      sum(when(col("__a") === col("__b"), col("__ai") * col("__bi"))
        .otherwise(0.0)).as("__abDiag"))
    val aM = e.groupBy(col("__a")).agg(first(col("__ai")).as("__am"))
    val bM = e.groupBy(col("__b")).agg(first(col("__bi")).as("__bm"))
    val ab = aM.join(bM, col("__a") === col("__b"))
      .agg(coalesce(sum(col("__am") * col("__bm")), lit(0.0)).as("__ab"))
    val r = when(lit(1.0) - col("__ab") > 0,
      (col("__diag") - col("__ab")) / (lit(1.0) - col("__ab")))
    st.crossJoin(ab).select(col("n_cells"),
      roundStable(col("__diag"), digits).as("diag_share"),
      roundStable(col("__ab"), digits).as("expected_share"),
      roundStable(r, digits).as("assortativity"))
  }

  /** Within-item (fixed-effects) demand elasticity — the pooled OLS
    * of log quantity on log price AFTER demeaning both within each
    * item: `β = Σᵢ Σₜ (lp−l̄pᵢ)(lq−l̄qᵢ) / Σᵢ Σₜ (lp−l̄pᵢ)²` — item
    * fixed effects absorb "expensive items sell less BECAUSE they are
    * different items" (the cross-sectional confound that makes naive
    * pooled elasticities nonsense); what remains is how quantity
    * moves when AN item's own price moves. Strictly positive p/q
    * only (logs). One window pass for the within-means + one global
    * moments fold; single-observation items contribute zero to both
    * sums by construction.
    */
  def elasticityFe(df: DataFrame, itemCol: Column, priceCol: Column,
                   qtyCol: Column, digits: Int = 6): DataFrame = {
    val p = priceCol.cast("double")
    val q = qtyCol.cast("double")
    val base = df.filter(p.isNotNull && q.isNotNull && p > 0 && q > 0)
      .select(itemCol.as("__item"), log(p).as("__lp"), log(q).as("__lq"))
    val wItem = Window.partitionBy(col("__item"))
    val dm = base
      .withColumn("__dp", col("__lp") - avg(col("__lp")).over(wItem))
      .withColumn("__dq", col("__lq") - avg(col("__lq")).over(wItem))
    val st = dm.agg(count(lit(1)).as("n"),
      count_distinct(col("__item")).as("n_items"),
      sum(col("__dp") * col("__dq")).as("__sxy"),
      sum(col("__dp") * col("__dp")).as("__sxx"),
      sum(col("__dq") * col("__dq")).as("__syy"))
    val beta = when(col("__sxx") > 0, col("__sxy") / col("__sxx"))
    st.select(col("n"), col("n_items"),
      roundStable(beta, digits).as("elasticity"),
      roundStable(when(col("__sxx") > 0 && col("__syy") > 0,
        col("__sxy") * col("__sxy") / (col("__sxx") * col("__syy"))),
        digits).as("r2_within"))
  }
}
