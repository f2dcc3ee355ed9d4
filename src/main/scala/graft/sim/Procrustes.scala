package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.roundStable

/** Orthogonal Procrustes alignment between two embedding SNAPSHOTS of
  * the same ids (Schönemann 1966) — the "did the new embedding model
  * actually change anything, or just rotate the space?" audit: cosine
  * similarity is rotation-invariant WITHIN a space but not ACROSS
  * spaces, so v1-vs-v2 raw cosines read as massive drift even when the
  * new model is the old one in different coordinates. The best
  * orthogonal map `W* = argmin_W ‖AW − B‖_F = UVᵀ` (SVD of C = AᵀB)
  * separates the two cases: per-id cosine AFTER alignment ≈ 1 means
  * pure rotation (re-index, don't panic); still-low after-cosines are
  * the ids whose MEANING moved — the rows a re-embedding pipeline must
  * re-process.
  *
  * Distributed shape: C reduces from the row-matched corpus by one
  * pos×pos pairing agg to d² doubles (bounded model constant — the
  * PC1/k-means collect discipline); the SVD runs driver-side via a
  * cyclic Jacobi eigensolve of CᵀC (deterministic sweep order) and W
  * returns to the plan as a literal matrix; scoring is a map-only
  * per-row projection. Engine-specific numerics (Jacobi) → rows-only
  * by design; the recovery property is spec'd on a planted rotation.
  */
object Procrustes {

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix:
    * (eigenvalues, eigenvectors as columns). Deterministic: fixed
    * (p, q) sweep order, fixed sweep cap, no data-dependent pivoting.
    */
  private[graft] def jacobiEigen(m: Array[Array[Double]],
      sweeps: Int = 30): (Array[Double], Array[Array[Double]]) = {
    val n = m.length
    val a = Array.tabulate(n, n)((i, j) => m(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var s = 0
    var done = false
    while (s < sweeps && !done) {
      var off = 0.0
      var p = 0
      while (p < n) {
        var q = p + 1
        while (q < n) { off += a(p)(q) * a(p)(q); q += 1 }
        p += 1
      }
      if (off < 1e-24) done = true
      else {
        p = 0
        while (p < n) {
          var q = p + 1
          while (q < n) {
            if (math.abs(a(p)(q)) > 1e-18) {
              val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
              val t =
                if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1))
                else 1.0 / (theta - math.sqrt(theta * theta + 1))
              val c = 1.0 / math.sqrt(t * t + 1)
              val sn = t * c
              var k = 0
              while (k < n) {
                val akp = a(k)(p); val akq = a(k)(q)
                a(k)(p) = c * akp - sn * akq
                a(k)(q) = sn * akp + c * akq
                k += 1
              }
              k = 0
              while (k < n) {
                val apk = a(p)(k); val aqk = a(q)(k)
                a(p)(k) = c * apk - sn * aqk
                a(q)(k) = sn * apk + c * aqk
                val vkp = v(k)(p); val vkq = v(k)(q)
                v(k)(p) = c * vkp - sn * vkq
                v(k)(q) = sn * vkp + c * vkq
                k += 1
              }
            }
            q += 1
          }
          p += 1
        }
        s += 1
      }
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** The optimal orthogonal map W (d×d) from snapshot `a`'s space to
    * `b`'s, from the row-matched cross-covariance C = AᵀB: SVD via
    * Jacobi on CᵀC (V, Σ²), U = CVΣ⁻¹, W = UVᵀ. Near-zero singular
    * values (rank-deficient overlap) get their U column REBUILT by a
    * deterministic Gram–Schmidt completion (basis vectors in index
    * order, orthogonalized against the filled columns), so W is fully
    * orthogonal — ‖aW‖ = ‖a‖ holds for every direction, including the
    * null space the data never witnessed.
    *
    * C reduces distributed to ONE d²-double typed buffer
    * ([[graft.functions.OuterProductAgg]] — the former double-posexplode
    * built n·d² intermediate rows, 10⁵–10⁷ per input row at production
    * dims); only d² doubles are collected (the PC1/k-means discipline).
    */
  private[graft] def fitW(a: DataFrame, b: DataFrame, idCol: String,
      vecCol: String): Array[Array[Double]] = {
    val pairs = a.select(col(idCol).as("__id"), col(vecCol).as("__va"))
      .join(b.select(col(idCol).as("__id"), col(vecCol).as("__vb")), "__id")
    val va = transform(col("__va"), x => x.cast("double"))
    val vb = transform(col("__vb"), x => x.cast("double"))
    val row = pairs.agg(count(lit(1)).as("__n"),
      graft.functions.OuterProductAgg.outerProductSum(va, vb).as("__c"),
      max(size(va)).as("__da"), max(size(vb)).as("__db"))
      .head()
    require(row.getLong(0) > 0,
      s"Procrustes.fitW: the two snapshots share no '$idCol' values — " +
        "alignment needs row-matched ids present in both")
    val flat = row.getSeq[Double](1).toArray
    // An orthogonal map only exists between equal-width spaces. Derive d
    // from the MEASURED side widths, never from sqrt(flat.length): a
    // dx≠dy pair whose product is a perfect square (e.g. 4×9) would
    // silently mis-index the flattened row-major buffer.
    val da = row.getInt(2)
    val db = row.getInt(3)
    require(da == db,
      s"Procrustes.fitW: snapshot vector widths differ ($da vs $db) — " +
        "orthogonal alignment needs equal dimensions")
    val d = da
    require(flat.length == d * d,
      s"Procrustes.fitW: scatter buffer length ${flat.length} != $d²")
    val cMat = Array.tabulate(d, d)((i, j) => flat(i * d + j))
    // E = CᵀC
    val e = Array.tabulate(d, d) { (i, j) =>
      var s = 0.0; var k = 0
      while (k < d) { s += cMat(k)(i) * cMat(k)(j); k += 1 }
      s
    }
    val (lam, vMat) = jacobiEigen(e)
    val u = Array.ofDim[Double](d, d)
    val filled = Array.fill(d)(false)
    for (j <- 0 until d) {
      val sig = math.sqrt(math.max(lam(j), 0.0))
      if (sig > 1e-12) {
        for (i <- 0 until d) {
          var s = 0.0; var k = 0
          while (k < d) { s += cMat(i)(k) * vMat(k)(j); k += 1 }
          u(i)(j) = s / sig
        }
        filled(j) = true
      }
    }
    // Orthogonal completion of the rank-deficient columns: try basis
    // vectors e_0, e_1, … in index order (deterministic), Gram–Schmidt
    // against every already-filled column, keep the first candidate with
    // non-negligible residual. Always succeeds: the filled columns span
    // < d dimensions, so some e_m has residual ≥ 1/√d in the null space.
    for (j <- 0 until d if !filled(j)) {
      var m = 0
      var done = false
      while (m < d && !done) {
        val cand = Array.tabulate(d)(i => if (i == m) 1.0 else 0.0)
        for (c <- 0 until d if filled(c)) {
          var dotUc = 0.0
          var i = 0
          while (i < d) { dotUc += cand(i) * u(i)(c); i += 1 }
          var i2 = 0
          while (i2 < d) { cand(i2) -= dotUc * u(i2)(c); i2 += 1 }
        }
        val nrm = math.sqrt(cand.map(x => x * x).sum)
        if (nrm > 1e-6) {
          for (i <- 0 until d) u(i)(j) = cand(i) / nrm
          filled(j) = true
          done = true
        }
        m += 1
      }
    }
    Array.tabulate(d, d) { (i, j) =>
      var s = 0.0; var k = 0
      while (k < d) { s += u(i)(k) * vMat(j)(k); k += 1 }
      s
    }
  }

  /** Per-id alignment report: cosine BEFORE (raw cross-space) and
    * AFTER applying W — the re-embed worklist is the low-after tail.
    * The projection `aW` is one codegen'd vector–matrix Expression per
    * row ([[graft.functions.VecMat]] — the former nested higher-order
    * aggregate interpreted d² element_at calls per row); cos_after is
    * normalized by the ACTUAL ‖aW‖ (with the Gram–Schmidt completion
    * in [[fitW]] it equals ‖a‖, but measuring it means the report can
    * never silently deflate if W were ever non-orthogonal).
    */
  def alignReport(a: DataFrame, b: DataFrame, idCol: String,
      vecCol: String, digits: Int = 6): DataFrame = {
    val w = fitW(a, b, idCol, vecCol)
    val wLit = typedLit(w.map(_.toSeq).toSeq)
    val pairs = a.select(col(idCol).as(idCol), col(vecCol).as("__va"))
      .join(b.select(col(idCol).as(idCol), col(vecCol).as("__vb")), idCol)
    val va = transform(col("__va"), x => x.cast("double"))
    val vb = transform(col("__vb"), x => x.cast("double"))
    import graft.functions.VectorExpressions.{vecDot, vecMat}
    val aw = vecMat(va, wLit)
    val num = vecDot(aw, vb)
    val na = sqrt(vecDot(va, va))
    val naw = sqrt(vecDot(aw, aw))
    val nb = sqrt(vecDot(vb, vb))
    val rawNum = vecDot(va, vb)
    pairs.select(col(idCol),
      roundStable(rawNum / (na * nb), digits).as("cos_before"),
      roundStable(num / (naw * nb), digits).as("cos_after"))
  }
}
