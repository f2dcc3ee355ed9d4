package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right-side value
  * at or before the left row's time (backward), or the earliest at or
  * after it (forward), per key.
  *
  * Spark has no built-in as-of join. The naive formulation
  * (`l JOIN r ON key AND r.t <= l.t` + argmax) explodes to O(|l|·|r|/key)
  * intermediate rows. This implementation uses the union-then-window
  * pattern instead:
  *
  *   1. tag both sides and union them (no join at all),
  *   2. one shuffle+sort per key ordered by (time, side) with right-side
  *      rows sorting before left rows at equal timestamps (ties mean
  *      "at or before" includes the same instant),
  *   3. `last(value, ignoreNulls)` over the unbounded-preceding frame
  *      carries the latest right value onto each left row,
  *   4. keep only left rows.
  *
  * The forward direction is the same plan traversed in reverse time
  * order. Cost at 100 TB: exactly one shuffle of |l|+|r| rows on the
  * key — the same price as any keyed window — and AQE splits skewed
  * keys. This is the standard log-structured pattern (e.g. Flink
  * temporal joins and kdb-style aj are built the same way).
  */
object AsOfJoin {

  /** @param left      fact side (kept in full — left outer semantics)
    * @param right     side providing the carried value
    * @param leftKey   join key column on `left`
    * @param rightKey  join key column on `right`
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param carryCol  right column whose latest value is attached
    * @param outCol    name of the attached column
    */
  def latestAtOrBefore(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      carryCol: String, outCol: String): DataFrame =
    asOf(left, right, leftKey, rightKey, leftTime, rightTime, carryCol, outCol,
      forward = false)

  /** Forward as-of: the EARLIEST right value at or after each left row's
    * time (e.g. "next maintenance after the alarm"). Ties at equal
    * carried values resolve to the minimum — the forward mirror of the
    * backward direction's maximum.
    */
  def earliestAtOrAfter(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      carryCol: String, outCol: String): DataFrame =
    asOf(left, right, leftKey, rightKey, leftTime, rightTime, carryCol, outCol,
      forward = true)

  private def asOf(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      carryCol: String, outCol: String, forward: Boolean): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    // Catalyst path: a real logical node so the optimizer can push
    // left-side filters below the union-window (plans.ResolveAsOfJoin,
    // injected by GraftExtensions). Falls back to the plain DataFrame
    // formulation when the extension isn't installed in this session.
    val hasRule = org.apache.spark.sql.GraftShims.hasOptimizerRule(
      left.sparkSession, graft.plans.ResolveAsOfJoin)
    if (hasRule) {
      val outAttr = AttributeReference(outCol, right.schema(carryCol).dataType)()
      org.apache.spark.sql.GraftShims.ofRows(left.sparkSession,
        graft.plans.AsOfJoinLogical(
          left.queryExecution.analyzed, right.queryExecution.analyzed,
          leftKey, rightKey, leftTime, rightTime, carryCol, outAttr, forward))
    } else
      asOfDF(left, right, leftKey, rightKey, leftTime, rightTime, carryCol, outCol, forward)
  }

  /** The explicit DataFrame formulation of the same plan — what
    * [[latestAtOrBefore]] expands to, minus the filter-pushdown smarts.
    */
  def latestAtOrBeforeDF(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      carryCol: String, outCol: String): DataFrame =
    asOfDF(left, right, leftKey, rightKey, leftTime, rightTime, carryCol, outCol,
      forward = false)

  /** Backward as-of with a TOLERANCE (pandas `merge_asof(tolerance=…)`,
    * kdb `wj`): the latest right value at or before the left time, but
    * only if it is at most `toleranceSecs` old — a stale quote/reading
    * beyond the horizon attaches NULL instead of silently carrying
    * forward forever (the staleness bug plain as-of invites: a sensor
    * that died in January still "has" a value in June). Same
    * union-then-window plan — one keyed shuffle, no range explosion;
    * the carried value rides a (time, value) struct so the staleness
    * test is one expression on the left row. Ties at equal carried time
    * resolve to the max value (the backward direction's convention).
    */
  def latestAtOrBeforeWithin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      carryCol: String, outCol: String,
      toleranceSecs: Long): DataFrame = {
    require(toleranceSecs >= 0, s"need toleranceSecs >= 0, got $toleranceSecs")
    val l = left
      .withColumn("__t", col(leftTime).cast("timestamp"))
      .withColumn("__k", col(leftKey))
      .withColumn("__cv", lit(null).cast(right.schema(carryCol).dataType))
      .withColumn("__cs",
        lit(null).cast(s"struct<ct:timestamp,cv:${right.schema(carryCol).dataType.sql}>"))
      .withColumn("__isLeft", lit(1))
    val leftCols = left.columns
    val r = right
      .select(
        col(rightTime).cast("timestamp").as("__t"),
        col(rightKey).as("__k"),
        col(carryCol).as("__cv"),
        struct(col(rightTime).cast("timestamp").as("ct"),
          col(carryCol).as("cv")).as("__cs"),
        lit(0).as("__isLeft"))
    val rAligned = leftCols.foldLeft(r) { (acc, c) =>
      acc.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col).toIndexedSeq: _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__isLeft"), col("__cv"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(rAligned)
      .withColumn("__last", last(col("__cs"), ignoreNulls = true).over(w))
      .withColumn(outCol,
        when(unix_micros(col("__t")) - unix_micros(col("__last.ct")) <=
          toleranceSecs * 1000000L, col("__last.cv")))
      .filter(col("__isLeft") === 1)
      .drop("__t", "__k", "__cv", "__cs", "__isLeft", "__last")
  }

  /** NEAREST as-of within a tolerance (pandas `merge_asof(direction=
    * 'nearest', tolerance=…)`): each left row attaches whichever
    * in-horizon right value is CLOSER in time — the latest at-or-before
    * or the earliest at-or-after — and NULL when neither exists within
    * `toleranceSecs`. The shape for aligning two irregular clocks
    * (sensor readings vs maintenance logs) where "before" alone throws
    * away a measurement taken seconds later.
    *
    * Plan: the same union as the directional forms, then TWO window
    * passes over the SAME hash partitioning — forward is the backward
    * traversal in reverse time order, so Catalyst plans one Exchange
    * and two sorts, never a join. Exact-tie distances resolve backward
    * (the pandas convention); equal-time ties within a side resolve to
    * the side's convention (max backward, min forward).
    */
  def nearestWithin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      carryCol: String, outCol: String,
      toleranceSecs: Long): DataFrame = {
    require(toleranceSecs >= 0, s"need toleranceSecs >= 0, got $toleranceSecs")
    val tolUs = toleranceSecs * 1000000L
    val l = left
      .withColumn("__t", col(leftTime).cast("timestamp"))
      .withColumn("__k", col(leftKey))
      .withColumn("__cv", lit(null).cast(right.schema(carryCol).dataType))
      .withColumn("__cs",
        lit(null).cast(s"struct<ct:timestamp,cv:${right.schema(carryCol).dataType.sql}>"))
      .withColumn("__isLeft", lit(1))
    val leftCols = left.columns
    val r = right
      .select(
        col(rightTime).cast("timestamp").as("__t"),
        col(rightKey).as("__k"),
        col(carryCol).as("__cv"),
        struct(col(rightTime).cast("timestamp").as("ct"),
          col(carryCol).as("cv")).as("__cs"),
        lit(0).as("__isLeft"))
    val rAligned = leftCols.foldLeft(r) { (acc, c) =>
      acc.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col).toIndexedSeq: _*)
    val wBack = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__isLeft"), col("__cv"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wFwd = Window.partitionBy(col("__k"))
      .orderBy(col("__t").desc, col("__isLeft"), col("__cv").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val backDiff = unix_micros(col("__t")) - unix_micros(col("__b.ct"))
    val fwdDiff = unix_micros(col("__f.ct")) - unix_micros(col("__t"))
    val backOk = col("__b").isNotNull && backDiff <= tolUs
    val fwdOk = col("__f").isNotNull && fwdDiff <= tolUs
    l.unionByName(rAligned)
      .withColumn("__b", last(col("__cs"), ignoreNulls = true).over(wBack))
      .withColumn("__f", last(col("__cs"), ignoreNulls = true).over(wFwd))
      .withColumn(outCol,
        when(backOk && (!fwdOk || backDiff <= fwdDiff), col("__b.cv"))
          .when(fwdOk, col("__f.cv")))
      .filter(col("__isLeft") === 1)
      .drop("__t", "__k", "__cv", "__cs", "__isLeft", "__b", "__f")
  }

  private def asOfDF(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      carryCol: String, outCol: String, forward: Boolean): DataFrame = {
    val l = left
      .withColumn("__t", col(leftTime).cast("timestamp"))
      .withColumn("__k", col(leftKey))
      .withColumn("__carry", lit(null).cast(right.schema(carryCol).dataType))
      .withColumn("__isLeft", lit(1))
    val leftCols = left.columns
    val r = right
      .select(
        col(rightTime).cast("timestamp").as("__t"),
        col(rightKey).as("__k"),
        col(carryCol).as("__carry"),
        lit(0).as("__isLeft"))
    // Align schemas: right side gets nulls for the left payload columns.
    val rAligned = leftCols.foldLeft(r) { (acc, c) =>
      acc.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((l.columns.map(col)).toIndexedSeq: _*)

    // Right rows sort before left rows at equal t (the boundary is
    // inclusive in both directions); equal-time right rows tie-break on
    // the carried value itself so the survivor is deterministic (max
    // backward, min forward). Forward is the same traversal in reverse
    // time order.
    val order =
      if (forward) Seq(col("__t").desc, col("__isLeft"), col("__carry").desc)
      else Seq(col("__t"), col("__isLeft"), col("__carry"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(rAligned)
      .withColumn(outCol, last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__isLeft") === 1)
      .drop("__t", "__k", "__carry", "__isLeft")
  }
}
