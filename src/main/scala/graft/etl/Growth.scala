package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.roundStable

/** Product-growth accounting over an event stream — the
  * DAU/WAU/MAU, lifecycle-state, and engagement-distribution readouts
  * a growth team lives in. Reference anchor:
  * dashboard_calidad_aire.py:82-93 (KPI tiles — these are the
  * engagement KPIs for an event stream). Everything reduces the raw stream to
  * distinct (user, period) activity FIRST: all downstream joins and
  * windows ride calendar × active-user state, never event volume.
  *
  * Scale note on the rolling distinct counts: exact distinct-over-
  * window cannot ride a plain window frame (COUNT DISTINCT isn't
  * frame-mergeable), so [[dauStickiness]] joins user-days to the
  * observed-day spine — state O(#user-days × window/day). At a scale
  * where that funnels, swap the exact count for the mergeable HLL
  * sketches of q138 (union per window is sketch addition); the spine
  * join is unchanged.
  */
object Growth {

  /** DAU / WAU / MAU per observed day with the DAU/MAU "stickiness"
    * ratio — how much of the monthly audience shows up daily. Windows
    * are trailing CALENDAR ranges over the day spine (a silent day
    * still ages users out), inclusive of the day itself: WAU(d) =
    * distinct users active in [d−6, d], MAU in [d−29, d].
    */
  def dauStickiness(df: DataFrame, userCol: Column, tsCol: Column,
                    digits: Int = 6): DataFrame = {
    val userDays = df.select(userCol.as("__u"), to_date(tsCol).as("__d"))
      .distinct()
      .withColumn("__di", datediff(col("__d"), lit("1970-01-01")))
    val spine = userDays.select(col("__d").as("day"),
      col("__di").as("__si")).distinct()
    val joined = userDays.join(broadcast(spine),
      col("__di") <= col("__si") && col("__di") >= col("__si") - 29)
    joined.groupBy(col("day"))
      .agg(
        count_distinct(when(col("__di") === col("__si"), col("__u")))
          .as("dau"),
        count_distinct(when(col("__di") >= col("__si") - 6, col("__u")))
          .as("wau"),
        count_distinct(col("__u")).as("mau"))
      .withColumn("stickiness", roundStable(
        col("dau").cast("double") / col("mau"), digits))
  }

  /** Weekly growth accounting (the Social Capital "accounting
    * identity" framework): each active (user, week) is NEW (first
    * week ever), RETAINED (also active the immediately preceding
    * week), or RESURRECTED (returning after ≥ 1 silent week);
    * CHURNED(w) counts users active in w−1 and silent in w. The
    * identity `active(w) = retained(w) + new(w) + resurrected(w)`
    * holds by construction, and `quick_ratio = (new + resurrected) /
    * churned` is the one-number "is the bucket filling faster than
    * it leaks" (NULL when nothing churned — a ratio over 0 is hype,
    * not math). Churn lands in the week the user went SILENT (w+7),
    * so it is fully observed for every emitted week; churn falling
    * past the last ACTIVE week is right-censored and not emitted
    * (the output spine is active weeks). First-observed-week users
    * are all "new" by construction — the standard left-edge caveat.
    * One lag + one lead over O(#user-weeks).
    */
  def growthAccounting(df: DataFrame, userCol: Column,
                       tsCol: Column, digits: Int = 6): DataFrame = {
    val uw = df.select(userCol.as("__u"),
        to_date(date_trunc("week", tsCol)).as("__w"))
      .distinct()
    val wOrd = Window.partitionBy(col("__u")).orderBy(col("__w"))
    val marked = uw
      .withColumn("__prev", lag(col("__w"), 1).over(wOrd))
      .withColumn("__next", lead(col("__w"), 1).over(wOrd))
      .withColumn("__state",
        when(col("__prev").isNull, "new")
          .when(datediff(col("__w"), col("__prev")) === 7, "retained")
          .otherwise("resurrected"))
    val active = marked.groupBy(col("__w").as("week"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("__state") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("__state") === "retained", 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("__state") === "resurrected", 1L).otherwise(0L))
          .as("n_resurrected"))
    // a user active in w and silent in w+7 churns IN week w+7
    val churn = marked
      .filter(col("__next").isNull ||
        datediff(col("__next"), col("__w")) > 7)
      .select(date_add(col("__w"), 7).as("week"))
      .groupBy(col("week")).agg(count(lit(1)).as("__churned"))
    active.join(churn, Seq("week"), "left")
      .withColumn("n_churned", coalesce(col("__churned"), lit(0L)))
      .withColumn("quick_ratio", roundStable(when(col("n_churned") > 0,
        (col("n_new") + col("n_resurrected")).cast("double") /
          col("n_churned")), digits))
      .select(col("week"), col("n_active"), col("n_new"),
        col("n_retained"), col("n_resurrected"), col("n_churned"),
        col("quick_ratio"))
  }

  /** Power-user curve (the "L30"-style engagement histogram): how
    * many users were active exactly n days, with each bucket's share
    * of USERS and of total ACTIVITY plus the cumulative shares from
    * the most-engaged side — the one chart that says whether the
    * product has a habit core or a drive-by crowd (a mean DAU hides
    * exactly this). Two aggregations; the cumulative windows ride
    * O(#distinct activity levels) rows.
    */
  def powerUserCurve(df: DataFrame, userCol: Column, tsCol: Column,
                     digits: Int = 6): DataFrame = {
    val perUser = df.select(userCol.as("__u"), to_date(tsCol).as("__d"))
      .distinct()
      .groupBy(col("__u")).agg(count(lit(1)).as("__nd"))
    val hist = perUser.groupBy(col("__nd").as("n_days"))
      .agg(count(lit(1)).as("n_users"))
      .withColumn("__act", col("n_days") * col("n_users"))
    val wAll = Window.partitionBy(lit(1))
    val wCum = Window.partitionBy(lit(1)).orderBy(col("n_days").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("user_share", roundStable(
        col("n_users").cast("double") / sum(col("n_users")).over(wAll),
        digits))
      .withColumn("activity_share", roundStable(
        col("__act").cast("double") / sum(col("__act")).over(wAll),
        digits))
      .withColumn("cum_user_share", roundStable(
        sum(col("n_users")).over(wCum).cast("double") /
          sum(col("n_users")).over(wAll), digits))
      .withColumn("cum_activity_share", roundStable(
        sum(col("__act")).over(wCum).cast("double") /
          sum(col("__act")).over(wAll), digits))
      .select(col("n_days"), col("n_users"), col("user_share"),
        col("activity_share"), col("cum_user_share"),
        col("cum_activity_share"))
  }
}
