package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two float-array columns, accumulated left-to-right in
  * double — a native codegen'd Expression.
  *
  * Why not `zip_with` + `aggregate`: those materialize an intermediate
  * array per row pair and interpret two lambdas; on an all-pairs
  * similarity join that's the entire runtime (measured 72 s → ~3 s at
  * sf0.1 for the near-dup query when switching to this expression).
  * The accumulation order (index 0 → n-1, each product widened to double
  * first) is exactly what the DuckDB oracle's list-comprehension sum
  * computes, so hash parity is preserved.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (fx, fy) = (isFloat(left), isFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (fx) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (fy) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName, not fixed names: with non-nullable children the emitted
      // block has no enclosing scope, so two DotProducts in one codegen
      // stage (cosine = dot/(norm·norm)) would redeclare the variables and
      // silently fall back to interpreted execution.
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val ax = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val bx = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $ax * $bx;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Vector–matrix product `out_k = Σ_j v_j · M[j][k]` as a native
  * codegen'd Expression — the per-row projection step of Procrustes
  * alignment ([[graft.sim.Procrustes.alignReport]]: `aW` with W a d×d
  * literal) and any broadcast-literal linear map.
  *
  * Why not nested `aggregate(sequence(...))` higher-order functions: the
  * nested-lambda form interprets d² `element_at` calls per ROW through
  * the HOF evaluator — at d = 1024 that is ~10⁶ boxed evaluations per
  * row, the difference between scan-speed and hours at 100 TB. This
  * expression is two tight primitive loops inside whole-stage codegen.
  *
  * The matrix is `array<array<double>>` (row index j first); the vector
  * may be float or double. Rows of M beyond the vector's width are
  * ignored; accumulation is j-ascending then k-ascending, widened to
  * double — deterministic and engine-matchable.
  */
case class VecMat(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_mat"

  private def vecIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val m = b.asInstanceOf[ArrayData]
    val dj = math.min(v.numElements(), m.numElements())
    val dk = if (m.numElements() == 0) 0 else m.getArray(0).numElements()
    val out = new Array[Double](dk)
    var j = 0
    while (j < dj) {
      val vj = if (vecIsFloat) v.getFloat(j).toDouble else v.getDouble(j)
      if (vj != 0.0) {
        val row = m.getArray(j)
        var k = 0
        while (k < dk) { out(k) += vj * row.getDouble(k); k += 1 }
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dj = ctx.freshName("dj")
      val dk = ctx.freshName("dk")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val vj = ctx.freshName("vj")
      val row = ctx.freshName("row")
      val vjGet = if (vecIsFloat) s"(double) $a.getFloat($j)" else s"$a.getDouble($j)"
      s"""
         |int $dj = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $dk = $b.numElements() == 0 ? 0 : $b.getArray(0).numElements();
         |double[] $out = new double[$dk];
         |for (int $j = 0; $j < $dj; $j++) {
         |  double $vj = $vjGet;
         |  if ($vj != 0.0) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $row = $b.getArray($j);
         |    for (int $k = 0; $k < $dk; $k++) {
         |      $out[$k] += $vj * $row.getDouble($k);
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorExpressions {
  /** Column API for [[DotProduct]]. */
  def vecDot(a: Column, b: Column): Column =
    GraftShims.column(DotProduct(GraftShims.expression(a), GraftShims.expression(b)))

  /** Column API for [[VecMat]]: `vecMat(v, m)_k = Σ_j v_j · m[j][k]`. */
  def vecMat(v: Column, m: Column): Column =
    GraftShims.column(VecMat(GraftShims.expression(v), GraftShims.expression(m)))
}
