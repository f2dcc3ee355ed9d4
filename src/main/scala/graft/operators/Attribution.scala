package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Marketing-style conversion attribution: split each conversion's
  * credit across the touch events that preceded it within a lookback
  * window. [[graft.operators.AsOfJoin]] is last-touch by construction;
  * this is the MULTI-touch family — `linear` (equal credit to every
  * in-window touch) plus first/last flags so position-based schemes
  * (U-shaped, time-decay) derive downstream by reweighting the same
  * pair rows.
  *
  * Shape: a KEYED equi-join (user/account) with the time window as an
  * in-join filter — per-key touch×conversion fan-out is bounded by
  * per-user activity, never corpus-scale (the all-pairs cliff only
  * exists unkeyed); credit normalization is one window count over each
  * conversion's matched touches. Conversions with NO in-window touch
  * are emitted with a NULL touch and full unattributed credit —
  * invisible-by-inner-join is how attribution silently overstates
  * marketing (the as-of staleness lesson, applied to credit).
  */
object Attribution {

  /** One row per (conversion, in-window touch) with `weight = 1/n`,
    * `is_first`/`is_last` position flags, and one NULL-touch row per
    * orphan conversion. Columns: keys, `conv_id`, `conv_ts`,
    * `touch_id`, `touch_ts`, `n_touches`, `weight`, `is_first`,
    * `is_last`.
    */
  def linear(conversions: DataFrame, touches: DataFrame, keys: Seq[String],
             convIdCol: String, convTimeCol: String,
             touchIdCol: String, touchTimeCol: String,
             windowSecs: Long, digits: Int = 6): DataFrame = {
    require(windowSecs > 0, s"need windowSecs > 0, got $windowSecs")
    val keyCols = keys.map(col)
    def us(c: Column) = unix_micros(c.cast("timestamp"))
    val conv = conversions.select(keyCols :+ col(convIdCol).as("conv_id") :+
      col(convTimeCol).as("conv_ts"): _*)
    val touch = touches.select(keyCols :+ col(touchIdCol).as("touch_id") :+
      col(touchTimeCol).as("touch_ts"): _*)
    val inWindow = us(col("touch_ts")) <= us(col("conv_ts")) &&
      us(col("touch_ts")) > us(col("conv_ts")) - windowSecs * 1000000L
    val matched = conv.join(touch, keys).filter(inWindow)
    val wConv = Window.partitionBy(col("conv_id"))
    val wOrd = wConv.orderBy(col("touch_ts"), col("touch_id"))
    val credited = matched
      .withColumn("n_touches", count(lit(1)).over(wConv))
      .withColumn("__rn", row_number().over(wOrd))
      .select(keyCols ++ Seq(col("conv_id"), col("conv_ts"),
        col("touch_id"), col("touch_ts"), col("n_touches"),
        graft.functions.roundStable(
          lit(1.0) / col("n_touches"), digits).as("weight"),
        (col("__rn") === 1).as("is_first"),
        (col("__rn") === col("n_touches")).as("is_last")): _*)
    val orphans = conv
      .join(credited.select(col("conv_id")).distinct(), Seq("conv_id"),
        "left_anti")
      .select(keyCols ++ Seq(col("conv_id"), col("conv_ts"),
        lit(null).cast(credited.schema("touch_id").dataType).as("touch_id"),
        lit(null).cast(credited.schema("touch_ts").dataType).as("touch_ts"),
        lit(0L).as("n_touches"), lit(1.0).as("weight"),
        lit(false).as("is_first"), lit(false).as("is_last")): _*)
    credited.unionByName(orphans)
  }
}
