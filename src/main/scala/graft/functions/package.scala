package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared scalar helpers used across operators. */
package object functions {

  /** Cross-engine-stable rounding: floor(x·10^d + 0.5)/10^d.
    *
    * Spark's `round` goes through BigDecimal(HALF_UP on the shortest
    * decimal repr) while DuckDB rounds via double multiply — they disagree
    * on ~0.02% of values at the tie boundary. This formula is plain IEEE
    * ops, so an oracle that writes the same `floor(x*1e6 + 0.5)/1e6`
    * produces bit-identical doubles.
    */
  def roundStable(c: Column, digits: Int): Column = {
    val p = math.pow(10.0, digits)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** Expand `roundStable(expr, d)` occurrences in oracle SQL into the
    * floor-based formula above, so the DuckDB side runs bit-identical
    * arithmetic. Paren-matching only; assumes no parens/commas inside
    * string literals within the call (true for all our oracle SQL).
    */
  def expandRoundStable(sql: String): String = {
    val marker = "roundStable("
    var s = sql
    var i = s.indexOf(marker)
    while (i >= 0) {
      var depth = 1
      var j = i + marker.length
      while (depth > 0) {
        s.charAt(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _   =>
        }
        j += 1
      }
      val inner = s.substring(i + marker.length, j - 1)
      var d2  = 0
      var cut = -1
      for (k <- inner.indices) inner.charAt(k) match {
        case '('               => d2 += 1
        case ')'               => d2 -= 1
        case ',' if d2 == 0    => cut = k
        case _                 =>
      }
      val e = inner.substring(0, cut).trim
      val n = inner.substring(cut + 1).trim.toInt
      s = s.substring(0, i) + s"floor(($e) * 1e$n + 0.5) / 1e$n" + s.substring(j)
      i = s.indexOf(marker)
    }
    s
  }
}
