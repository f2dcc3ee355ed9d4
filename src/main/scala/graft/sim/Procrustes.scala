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
    * values (rank-deficient overlap) keep their V column but
    * contribute nothing to U — their directions map by the remaining
    * orthogonal completion, which is the standard pseudo-inverse
    * treatment.
    */
  private[graft] def fitW(a: DataFrame, b: DataFrame, idCol: String,
      vecCol: String): Array[Array[Double]] = {
    val pairs = a.select(col(idCol).as("__id"), col(vecCol).as("__va"))
      .join(b.select(col(idCol).as("__id"), col(vecCol).as("__vb")), "__id")
    val entries = pairs
      .select(posexplode(col("__va")).as(Seq("__i", "__x")), col("__vb"))
      .select(col("__i"), col("__x").cast("double").as("__x"),
        posexplode(col("__vb")).as(Seq("__j", "__y")))
      .groupBy(col("__i"), col("__j"))
      .agg(sum(col("__x") * col("__y").cast("double")).as("__c"))
      .collect()
    val d = entries.iterator.map(_.getInt(0)).max + 1
    val cMat = Array.ofDim[Double](d, d)
    entries.foreach(r => cMat(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    // E = CᵀC
    val e = Array.tabulate(d, d) { (i, j) =>
      var s = 0.0; var k = 0
      while (k < d) { s += cMat(k)(i) * cMat(k)(j); k += 1 }
      s
    }
    val (lam, vMat) = jacobiEigen(e)
    val u = Array.ofDim[Double](d, d)
    for (j <- 0 until d) {
      val sig = math.sqrt(math.max(lam(j), 0.0))
      if (sig > 1e-12) {
        for (i <- 0 until d) {
          var s = 0.0; var k = 0
          while (k < d) { s += cMat(i)(k) * vMat(k)(j); k += 1 }
          u(i)(j) = s / sig
        }
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
    * The numerator is Σ_k (aW)_k·b_k with (aW)_k = Σ_j a_j·W_jk, and
    * ‖aW‖ = ‖a‖ because W is orthogonal — one nested higher-order
    * aggregate per row, map-only (at deployment scale swap for a
    * codegen'd matvec Expression; this is the audit form).
    */
  def alignReport(a: DataFrame, b: DataFrame, idCol: String,
      vecCol: String, digits: Int = 6): DataFrame = {
    val w = fitW(a, b, idCol, vecCol)
    val d = w.length
    val wLit = typedLit(w.map(_.toSeq).toSeq)
    val pairs = a.select(col(idCol).as(idCol), col(vecCol).as("__va"))
      .join(b.select(col(idCol).as(idCol), col(vecCol).as("__vb")), idCol)
    val va = transform(col("__va"), x => x.cast("double"))
    val vb = transform(col("__vb"), x => x.cast("double"))
    // (aW)_k = Σ_j a_j W_jk ; numerator Σ_k (aW)_k b_k
    val num = aggregate(sequence(lit(1), lit(d)), lit(0.0), (acc, k) =>
      acc + aggregate(sequence(lit(1), lit(d)), lit(0.0), (acc2, j) =>
        acc2 + element_at(va, j) * element_at(element_at(wLit, j), k)) *
        element_at(vb, k))
    val na = sqrt(aggregate(va, lit(0.0), (s, x) => s + x * x))
    val nb = sqrt(aggregate(vb, lit(0.0), (s, x) => s + x * x))
    val rawNum = aggregate(zip_with(va, vb, (x, y) => x * y), lit(0.0),
      (s, x) => s + x)
    pairs.select(col(idCol),
      roundStable(rawNum / (na * nb), digits).as("cos_before"),
      roundStable(num / (na * nb), digits).as("cos_after"))
  }
}
