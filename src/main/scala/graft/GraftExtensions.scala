package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{DoubleType, StringType}

import graft.functions.DotProduct

/** Catalyst extension point: registers graft's functions for SQL users,
  * so `spark.sql("SELECT vec_dot(a, b)")` works next to the Column API.
  *
  * Install via `spark.sql.extensions=graft.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[DotProduct].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    // as-of join: left-filter pushdown + expansion (operator-optimization
    // batch, so standard pushdown/pruning compose with it — PlanSpec)
    e.injectOptimizerRule(_ => graft.plans.ResolveAsOfJoin)

    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - double dot product of two numeric arrays"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))

    e.injectFunction((
      FunctionIdentifier("aqi_pm25"),
      info("aqi_pm25", "aqi_pm25(pm25) - piecewise-linear EPA AQI from a PM2.5 reading"),
      (exprs: Seq[Expression]) => aqiPm25Expr(Cast(exprs.head, DoubleType))))

    e.injectFunction((
      FunctionIdentifier("aqi_category"),
      info("aqi_category", "aqi_category(aqi) - EPA category label for an AQI value"),
      (exprs: Seq[Expression]) => aqiCategoryExpr(Cast(exprs.head, DoubleType))))

    e.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b) - intersection size of two sorted distinct long arrays"),
      (exprs: Seq[Expression]) =>
        graft.functions.SortedIntersectCount(exprs(0), exprs(1))))
  }

  // Raw Catalyst trees (the Column API builds unresolved ColumnNodes that
  // cannot be injected through the function registry). Same breakpoint
  // math as etl.Features.aqiPm25 — kept in sync by AqiParitySpec.
  private def seg(pm: Expression, base: Double, slope: Double, knot: Double): Expression =
    Add(Literal(base), Multiply(Literal(slope), Subtract(pm, Literal(knot))))

  private def aqiPm25Expr(pm: Expression): Expression =
    CaseWhen(Seq(
      (IsNull(pm), Literal(null, DoubleType)),
      (LessThanOrEqual(pm, Literal(12.0)), Multiply(Literal(50.0 / 12.0), pm)),
      (LessThanOrEqual(pm, Literal(35.4)), seg(pm, 50.0, (100.0 - 50.0) / (35.4 - 12.1), 12.1)),
      (LessThanOrEqual(pm, Literal(55.4)), seg(pm, 100.0, (150.0 - 100.0) / (55.4 - 35.5), 35.5)),
      (LessThanOrEqual(pm, Literal(150.4)), seg(pm, 150.0, (200.0 - 150.0) / (150.4 - 55.5), 55.5))),
      Some(seg(pm, 200.0, (300.0 - 200.0) / (250.4 - 150.5), 150.5)))

  private def aqiCategoryExpr(aqi: Expression): Expression =
    CaseWhen(Seq(
      (IsNull(aqi), Literal("Unknown")),
      (LessThanOrEqual(aqi, Literal(50.0)), Literal("Good")),
      (LessThanOrEqual(aqi, Literal(100.0)), Literal("Moderate")),
      (LessThanOrEqual(aqi, Literal(150.0)), Literal("Unhealthy for Sensitive")),
      (LessThanOrEqual(aqi, Literal(200.0)), Literal("Unhealthy"))),
      Some(Literal("Very Unhealthy")))
}
