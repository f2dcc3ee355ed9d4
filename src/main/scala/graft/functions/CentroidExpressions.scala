package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Centroid-scan expressions for k-means / PQ assignment.
  *
  * Why not the unrolled form (one [[DotProduct]] + literal per
  * centroid, `array_min` over structs)? Two scale failures:
  *
  *   1. Primitive literals are INLINED into generated Java, so every
  *      Lloyd iteration (new centroid values) emits different source —
  *      a fresh Janino compile per iteration per stage, which dominates
  *      small-data training time (job scheduling + codegen, not
  *      compute).
  *   2. Generated code grows linearly with k; at k≈256 the unrolled
  *      method blows the JVM's 64 KB method-bytecode limit and codegen
  *      falls back to interpreted row-at-a-time execution exactly when
  *      the centroid count makes it matter.
  *
  * Here the centroid matrix arrives as ONE non-primitive literal
  * (`typedLit(Seq[Seq[Double]])`): codegen stores it in `references`
  * and emits a fixed doubly-nested LOOP — the generated source is
  * byte-identical across iterations (Janino cache hit, one compile per
  * stage shape) and constant-size in k.
  *
  * FP semantics match the unrolled form exactly: the dot product and
  * |c|² accumulate left-to-right in double, distance is
  * `−2·v·c + |c|²` (the |v|² term can't change the argmin), and ties
  * resolve to the LOWEST centroid index (strict `<` keeps the earlier
  * candidate), so swapping implementations changes no assignment.
  */
object CentroidExpressions {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  /** Index (0-based) of the centroid minimizing squared distance to
    * `left`; `right` is array<array<double>> — typically a foldable
    * literal, or `element_at` of a 3-d literal for per-row codebook
    * selection (PQ subspaces).
    */
  case class NearestCentroid(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "nearest_centroid"

    override protected def nullSafeEval(v: Any, cs: Any): Any = {
      val vec = v.asInstanceOf[ArrayData]
      val cents = cs.asInstanceOf[ArrayData]
      val fv = isFloatArray(left)
      val m = cents.numElements()
      var best = -1
      var bestd = Double.PositiveInfinity
      var j = 0
      while (j < m) {
        val c = cents.getArray(j)
        val n = math.min(c.numElements(), vec.numElements())
        var dot = 0.0
        var nn = 0.0
        var t = 0
        while (t < n) {
          val cv = c.getDouble(t)
          val vv = if (fv) vec.getFloat(t).toDouble else vec.getDouble(t)
          dot += vv * cv
          nn += cv * cv
          t += 1
        }
        val d = -2.0 * dot + nn
        if (d < bestd) { bestd = d; best = j }
        j += 1
      }
      best
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (v, cs) => {
        val (m, best, bestd, j, c, n, dot, nn, t, cv, d) =
          (ctx.freshName("m"), ctx.freshName("best"), ctx.freshName("bestd"),
            ctx.freshName("j"), ctx.freshName("c"), ctx.freshName("n"),
            ctx.freshName("dot"), ctx.freshName("nn"), ctx.freshName("t"),
            ctx.freshName("cv"), ctx.freshName("d"))
        val vx = if (isFloatArray(left)) s"(double) $v.getFloat($t)" else s"$v.getDouble($t)"
        s"""
           |int $m = $cs.numElements();
           |int $best = -1;
           |double $bestd = Double.POSITIVE_INFINITY;
           |for (int $j = 0; $j < $m; $j++) {
           |  org.apache.spark.sql.catalyst.util.ArrayData $c = $cs.getArray($j);
           |  int $n = java.lang.Math.min($c.numElements(), $v.numElements());
           |  double $dot = 0.0;
           |  double $nn = 0.0;
           |  for (int $t = 0; $t < $n; $t++) {
           |    double $cv = $c.getDouble($t);
           |    $dot += $vx * $cv;
           |    $nn += $cv * $cv;
           |  }
           |  double $d = -2.0 * $dot + $nn;
           |  if ($d < $bestd) { $bestd = $d; $best = $j; }
           |}
           |${ev.value} = $best;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Minimum FULL squared distance (|v|² − 2·v·c + |c|²) from `left` to
    * any centroid in `right` — the farthest-point / k-means|| cost
    * column. Same literal-as-reference + loop design as
    * [[NearestCentroid]], so the k sequential seeding scans share one
    * compiled stage shape instead of recompiling per seed.
    */
  case class MinCentroidDist(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "min_centroid_dist"

    override protected def nullSafeEval(v: Any, cs: Any): Any = {
      val vec = v.asInstanceOf[ArrayData]
      val cents = cs.asInstanceOf[ArrayData]
      val fv = isFloatArray(left)
      val nv = vec.numElements()
      var vv = 0.0
      var t = 0
      while (t < nv) {
        val x = if (fv) vec.getFloat(t).toDouble else vec.getDouble(t)
        vv += x * x
        t += 1
      }
      val m = cents.numElements()
      var bestd = Double.PositiveInfinity
      var j = 0
      while (j < m) {
        val c = cents.getArray(j)
        val n = math.min(c.numElements(), nv)
        var dot = 0.0
        var nn = 0.0
        var i = 0
        while (i < n) {
          val cv = c.getDouble(i)
          val x = if (fv) vec.getFloat(i).toDouble else vec.getDouble(i)
          dot += x * cv
          nn += cv * cv
          i += 1
        }
        val d = vv - 2.0 * dot + nn
        if (d < bestd) bestd = d
        j += 1
      }
      bestd
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (v, cs) => {
        val (nv, vv, t0, x0, m, bestd, j, c, n, dot, nn, t, cv, d) =
          (ctx.freshName("nv"), ctx.freshName("vv"), ctx.freshName("t0"),
            ctx.freshName("x0"), ctx.freshName("m"), ctx.freshName("bestd"),
            ctx.freshName("j"), ctx.freshName("c"), ctx.freshName("n"),
            ctx.freshName("dot"), ctx.freshName("nn"), ctx.freshName("t"),
            ctx.freshName("cv"), ctx.freshName("d"))
        val vx0 = if (isFloatArray(left)) s"(double) $v.getFloat($t0)" else s"$v.getDouble($t0)"
        val vx = if (isFloatArray(left)) s"(double) $v.getFloat($t)" else s"$v.getDouble($t)"
        s"""
           |int $nv = $v.numElements();
           |double $vv = 0.0;
           |for (int $t0 = 0; $t0 < $nv; $t0++) {
           |  double $x0 = $vx0;
           |  $vv += $x0 * $x0;
           |}
           |int $m = $cs.numElements();
           |double $bestd = Double.POSITIVE_INFINITY;
           |for (int $j = 0; $j < $m; $j++) {
           |  org.apache.spark.sql.catalyst.util.ArrayData $c = $cs.getArray($j);
           |  int $n = java.lang.Math.min($c.numElements(), $nv);
           |  double $dot = 0.0;
           |  double $nn = 0.0;
           |  for (int $t = 0; $t < $n; $t++) {
           |    double $cv = $c.getDouble($t);
           |    $dot += $vx * $cv;
           |    $nn += $cv * $cv;
           |  }
           |  double $d = $vv - 2.0 * $dot + $nn;
           |  if ($d < $bestd) { $bestd = $d; }
           |}
           |${ev.value} = $bestd;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Column API: centroid matrix as a Column (use `typedLit`). */
  def nearestCentroid(vec: Column, cents: Column): Column =
    GraftShims.column(NearestCentroid(GraftShims.expression(vec), GraftShims.expression(cents)))

  def minCentroidDist(vec: Column, cents: Column): Column =
    GraftShims.column(MinCentroidDist(GraftShims.expression(vec), GraftShims.expression(cents)))
}
