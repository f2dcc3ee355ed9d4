package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.roundStable

/** Item co-occurrence similarity over baskets — the "customers also
  * bought" primitive (item-item collaborative filtering on implicit
  * co-purchase signal): two items are similar when the baskets that
  * contain one disproportionately contain the other, scored by the
  * cosine of their binary basket-incidence vectors
  * `n_ab / sqrt(n_a · n_b)`.
  *
  * Scale shape: the pair explosion is bounded by BASKET size, not
  * catalog size — a basket of m items yields C(m,2) pair rows, so the
  * shuffle is Σ C(m_i, 2), linear in rows for bounded baskets (retail
  * baskets are; a degenerate mega-basket is the caller's outlier
  * filter). Everything else is keyed aggs; the top-k cut is a per-item
  * window, never a global sort. `minCount` prunes noise pairs BEFORE
  * the frequency joins.
  */
object MarketBasket {

  /** Top-k co-occurrence recommendations per item:
    * (item, rec, n_ab, score, rank). Pairs below `minCount` shared
    * baskets are pruned; rank is (score desc, rec) per item.
    */
  def cooccurTopK(df: DataFrame, basketCol: String, itemCol: String,
                  k: Int, minCount: Long = 2L,
                  digits: Int = 6): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val baskets = df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val pairs = baskets.as("x").join(baskets.as("y"), Seq("__b"))
      .filter(col("x.__i") < col("y.__i"))
      .groupBy(col("x.__i").as("__a"), col("y.__i").as("__c"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    val freq = baskets.groupBy(col("__i")).agg(count(lit(1)).as("__n"))
    // symmetric expansion: each canonical pair recommends both ways
    val sym = pairs.select(col("__a"), col("__c"), col("n_ab"))
      .unionByName(pairs.select(col("__c").as("__a"), col("__a").as("__c"),
        col("n_ab")))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("score").desc, col("rec"))
    sym
      .join(freq.withColumnRenamed("__i", "__a").withColumnRenamed("__n", "__na"), "__a")
      .join(freq.withColumnRenamed("__i", "__c").withColumnRenamed("__n", "__nc"), "__c")
      .select(col("__a").as("item"), col("__c").as("rec"), col("n_ab"),
        roundStable(col("n_ab").cast("double") /
          sqrt(col("__na").cast("double") * col("__nc")), digits).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Pairwise association rules `A ⇒ C` with the full metric triple
    * (Agrawal & Srikant VLDB'94 measures over 2-itemsets): `support` =
    * P(A ∧ C), `confidence` = P(C | A), `lift` = confidence / P(C) —
    * lift > 1 is genuine association, ≈ 1 co-purchase by popularity
    * alone, < 1 substitution; [[cooccurTopK]]'s cosine ranks
    * recommendations, these three are what a RULE needs to be acted on
    * (confidence gates precision, lift kills the popularity confound).
    * Same bounded pair explosion and keyed-agg shape; each unordered
    * co-occurrence emits BOTH directions (confidence is asymmetric).
    */
  def assocRules(df: DataFrame, basketCol: String, itemCol: String,
                 minCount: Long = 2L, minLift: Double = 1.0,
                 digits: Int = 6): DataFrame = {
    val baskets = df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val nB = baskets.agg(countDistinct(col("__b")).as("__nb"))
    val pairs = baskets.as("x").join(baskets.as("y"), Seq("__b"))
      .filter(col("x.__i") < col("y.__i"))
      .groupBy(col("x.__i").as("__a"), col("y.__i").as("__c"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    val freq = baskets.groupBy(col("__i")).agg(count(lit(1)).as("__n"))
    val sym = pairs.unionByName(pairs.select(col("__c").as("__a"),
      col("__a").as("__c"), col("n_ab")))
    val conf = col("n_ab").cast("double") / col("__na")
    val lift = conf / (col("__nc").cast("double") / col("__nb"))
    sym
      .join(freq.withColumnRenamed("__i", "__a").withColumnRenamed("__n", "__na"), "__a")
      .join(freq.withColumnRenamed("__i", "__c").withColumnRenamed("__n", "__nc"), "__c")
      .crossJoin(broadcast(nB))
      .select(col("__a").as("antecedent"), col("__c").as("consequent"),
        col("n_ab"),
        roundStable(col("n_ab").cast("double") / col("__nb"), digits)
          .as("support"),
        roundStable(conf, digits).as("confidence"),
        roundStable(lift, digits).as("lift"))
      .filter(col("lift") >= minLift)
  }
}
