package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.DoubleType

/** The ONE consolidated SQL-function surface ([[graft.GraftExtensions]]
  * calls [[registerAll]]): every custom expression and typed aggregate
  * the Column API exposes is reachable from `spark.sql(...)` under the
  * same name and through the same codegen path — scalar expressions
  * resolve to the identical Catalyst nodes, aggregates to the identical
  * TypedImperativeAggregates (the analyzer wraps a bare
  * `AggregateFunction` in its `AggregateExpression` during resolution).
  *
  * Builders receive RAW Catalyst trees: the Column API's unresolved
  * ColumnNodes cannot be injected through the function registry
  * (the [[org.apache.spark.sql.GraftShims]] lesson). Parity
  * Column-API ≡ SQL is spec'd per function (SqlParitySpec).
  */
object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[DotProduct].getName, null, name, usage, "")

  /** (name, usage, builder) for every registered function — one list so
    * the registration and the parity spec can never drift. */
  private[graft] val scalarFunctions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("vec_dot",
      "vec_dot(a, b) - double dot product of two numeric arrays",
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))),
    ("vec_mat",
      "vec_mat(v, m) - row-vector x matrix product (array<double>, array<array<double>>) -> array<double>",
      (exprs: Seq[Expression]) => VecMat(exprs(0), exprs(1))),
    ("sorted_intersect_count",
      "sorted_intersect_count(a, b) - intersection size of two sorted distinct long arrays",
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs(0), exprs(1))),
    ("round_stable",
      "round_stable(x, d) - cross-engine-stable rounding floor(x*10^d + 0.5)/10^d",
      (exprs: Seq[Expression]) => roundStableExpr(exprs(0), exprs(1))),
    ("aqi_pm25",
      "aqi_pm25(pm25) - piecewise-linear EPA AQI from a PM2.5 reading",
      (exprs: Seq[Expression]) => aqiPm25Expr(Cast(exprs.head, DoubleType))),
    ("aqi_category",
      "aqi_category(aqi) - EPA category label for an AQI value",
      (exprs: Seq[Expression]) => aqiCategoryExpr(Cast(exprs.head, DoubleType))))

  private[graft] val aggregateFunctions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("vec_sum",
      "vec_sum(v) - elementwise sum of array<double> rows (NULL rows skipped)",
      (exprs: Seq[Expression]) => VecSumAgg(exprs.head)),
    ("outer_product_sum",
      "outer_product_sum(x, y) - sum over rows of x (outer) y, flattened row-major",
      (exprs: Seq[Expression]) => OuterProductAgg(exprs(0), exprs(1))),
    ("minhash_sig",
      "minhash_sig(token_hash[, numHashes]) - MinHash signature from one LONG token hash per row, e.g. xxhash64(token) (default 128 hashes)",
      (exprs: Seq[Expression]) => {
        val n =
          if (exprs.length < 2) 128
          else exprs(1) match {
            case Literal(v: Int, _) => v
            case Literal(v: Long, _) => v.toInt
            case other => throw new IllegalArgumentException(
              s"minhash_sig: numHashes must be an integer literal, got $other")
          }
        MinHashSigAgg(exprs.head, n)
      }))

  def registerAll(e: SparkSessionExtensions): Unit =
    for ((name, usage, builder) <- scalarFunctions ++ aggregateFunctions)
      e.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

  /** floor(x·10^d + 0.5) / 10^d as a raw tree — `d` must fold to an
    * integer literal (the SQL mirror of [[graft.functions.roundStable]]).
    */
  private def roundStableExpr(x: Expression, d: Expression): Expression = {
    val pow = Pow(Literal(10.0), Cast(d, DoubleType))
    Divide(Floor(Add(Multiply(Cast(x, DoubleType), pow), Literal(0.5))), pow)
  }

  // Raw Catalyst trees; same breakpoint math as etl.Features.aqiPm25 —
  // kept in sync by AqiParitySpec.
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
