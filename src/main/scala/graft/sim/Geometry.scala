package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.roundStable

/** Geometric diagnostics over an embedding corpus: cluster separation
  * (simplified silhouette), dominant-direction extraction (power
  * iteration on the d×d covariance), and distance-based outliers.
  *
  * Everything reduces the n-row corpus to O(d) / O(d²) state before any
  * driver-side step — the 100 TB path computes moments distributed and
  * only ever collects dimension-sized constants (the k-means-centroid
  * discipline, cf. reference dag:365-407 validation stage).
  */
object Geometry {

  import Similarity.dot

  /** Per-cluster centroid arrays: one row per key with the mean vector
    * as `array<double>` (ordered by dimension) — O(#keys) rows, built
    * from a single keyed aggregation over exploded dims. The struct
    * sort inside `collect_list` is on the leading `pos` field, so
    * reassembly is deterministic regardless of partitioning.
    */
  def centroids(df: DataFrame, keyCol: String, vecCol: String): DataFrame =
    df.select(col(keyCol).as("__k"), posexplode(col(vecCol)).as(Seq("__pos", "__x")))
      .groupBy(col("__k"), col("__pos"))
      .agg(avg(col("__x").cast("double")).as("__c"))
      .groupBy(col("__k"))
      .agg(transform(array_sort(collect_list(struct(col("__pos"), col("__c")))),
        e => e.getField("__c")).as("__cent"))

  /** Simplified silhouette of a labelled embedding corpus — how
    * separated the label's clusters are in embedding space, per label:
    * for each point, `a` = Euclidean distance to its OWN label
    * centroid, `b` = distance to the NEAREST other label centroid,
    * `s = (b − a) / max(a, b)` (Hruschka's centroid variant of
    * Rousseeuw '87 — O(n·k) instead of the O(n²) classic, which is the
    * only version that survives 100 TB). Emits per label: point count,
    * mean silhouette, and the share of points sitting closer to a
    * FOREIGN centroid (`s < 0` — the misfiled mass a labels-based
    * pipeline split would train on).
    *
    * Shape: one keyed agg to k centroids (O(k·d) rows), broadcast
    * cross join of points × centroids (k is label cardinality — tiny),
    * distances via the codegen'd dot identity
    * `‖p−c‖² = p·p − 2 p·c + c·c`, then one keyed agg back. No window
    * over the corpus, no quadratic pair join.
    */
  def silhouette(df: DataFrame, idCol: String, keyCol: String, vecCol: String,
                 digits: Int = 6): DataFrame = {
    val cents = centroids(df, keyCol, vecCol)
      .select(col("__k").as("__ck"), col("__cent"),
        dot(col("__cent"), col("__cent")).as("__cc"))
    val pts = df.select(col(idCol).as("__pid"), col(keyCol).as("__k"),
        col(vecCol).as("__v"))
      .withColumn("__pp", dot(col("__v"), col("__v")))
    val d2 = pts.join(broadcast(cents), lit(true))
      // clamp: fp cancellation can push an exact-zero distance to -1e-16
      .withColumn("__d", sqrt(greatest(lit(0.0),
        col("__pp") - lit(2.0) * dot(col("__v"), col("__cent")) + col("__cc"))))
    val perPoint = d2.groupBy(col("__pid"), col("__k"))
      .agg(
        min(when(col("__ck") === col("__k"), col("__d"))).as("__a"),
        min(when(col("__ck") =!= col("__k"), col("__d"))).as("__b"))
      .withColumn("__s",
        when(greatest(col("__a"), col("__b")) > 0,
          (col("__b") - col("__a")) / greatest(col("__a"), col("__b")))
          .otherwise(lit(0.0)))
    perPoint.groupBy(col("__k").as(keyCol))
      .agg(
        count(lit(1)).as("n_points"),
        roundStable(avg(col("__s")), digits).as("mean_silhouette"),
        roundStable(avg(when(col("__s") < 0, 1.0).otherwise(0.0)), digits)
          .as("misfit_share"))
      .orderBy(col(keyCol))
  }

  /** First principal component of the embedding corpus by power
    * iteration — the anisotropy diagnosis of Ethayarajh '19 / Mu '18
    * ("all-but-the-top"): if PC1 explains a large share of variance,
    * cosine similarity is dominated by one common direction and should
    * be debiased before any ANN index is sized.
    *
    * The n-row corpus reduces DISTRIBUTED to one pass of typed buffers:
    * Σx (d doubles) and the raw scatter Σxxᵀ (d² doubles) via
    * [[graft.functions.OuterProductAgg]] — E[xy] − E[x]E[y], never
    * materializing centered vectors OR exploded rows. Only the
    * d×d matrix is collected (d=64 ⇒ 4096 doubles — a bounded constant,
    * the trainer-seed discipline); `iters` rounds of w ← C·w with L2
    * normalization run driver-side in deterministic index order.
    * Sign is canonicalized (the max-|loading| dim reads positive, ties
    * to the lowest pos) so both engines agree without relying on
    * iteration parity.
    *
    * Output: one row per dimension — `pos`, `pc1_loading`, plus the
    * corpus-constant `pc1_var_share` = λ₁/trace(C) (Rayleigh quotient
    * over total variance) repeated on each row.
    */
  def pc1Power(df: DataFrame, vecCol: String, iters: Int = 10,
               digits: Int = 6): DataFrame = {
    val spark = df.sparkSession
    val (w, share) = pc1Fit(df, vecCol, iters)
    import spark.implicits._
    w.zipWithIndex.map { case (x, i) => (i, x, share) }.toSeq
      .toDF("pos", "__l", "__s")
      .select(col("pos").cast("long").as("pos"),
        roundStable(col("__l"), digits).as("pc1_loading"),
        roundStable(col("__s"), digits).as("pc1_var_share"))
      .orderBy(col("pos"))
  }

  /** One-pass population covariance of the vector column: (row count,
    * d×d matrix). THREE typed buffers — n (long), Σx (d doubles), Σxxᵀ
    * (d² doubles) — C_ij = Σxy/n − (Σx_i/n)(Σx_j/n). The former double-
    * posexplode scatter materialized n·d² rows before partial agg; at
    * production dims (d = 768–4096) that is 10⁵–10⁷ rows PER INPUT ROW.
    * The imperative buffers do the same arithmetic with O(parts·d²)
    * shuffle bytes and zero intermediate rows
    * ([[graft.functions.OuterProductAgg]]). Bounded collect: n + d + d²
    * doubles — a model constant, same class as k-means centroids / PQ
    * codebooks (documented discipline). Shared by [[pc1Fit]] and
    * [[participationRatio]].
    */
  private[graft] def covFit(df: DataFrame, vecCol: String): (Long, Array[Array[Double]]) = {
    val vd = transform(col(vecCol), x => x.cast("double"))
    // n must count exactly the rows the moment aggregates consume:
    // VecSumAgg/OuterProductAgg skip NULL vectors, so count(vd) (non-NULL
    // only), NOT count(*) — an all-rows n would divide null-skipping
    // moment sums by an inflated denominator and silently bias C.
    val row = df.agg(count(vd).as("__n"),
      graft.functions.VecSumAgg.vecSum(vd).as("__sx"),
      graft.functions.OuterProductAgg.outerProductSum(vd, vd).as("__sxy"))
      .head()
    require(row.getLong(0) > 0,
      "covFit: no non-NULL vectors — nothing to fit")
    val nRows = row.getLong(0)
    val n = nRows.toDouble
    val sx = row.getSeq[Double](1).toArray
    val sxy = row.getSeq[Double](2).toArray
    val d = sx.length
    val c = Array.ofDim[Double](d, d)
    var ii = 0
    while (ii < d) {
      var jj = 0
      while (jj < d) {
        c(ii)(jj) = sxy(ii * d + jj) / n - (sx(ii) / n) * (sx(jj) / n)
        jj += 1
      }
      ii += 1
    }
    (nRows, c)
  }

  /** The PC1 power-iteration fit shared by [[pc1Power]] (the diagnosis)
    * and [[removeTopComponent]] (the cure): canonical-signed unit
    * loading vector + λ₁/trace share, from the [[covFit]] covariance.
    */
  private[graft] def pc1Fit(df: DataFrame, vecCol: String,
                            iters: Int): (Array[Double], Double) = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val (_, c) = covFit(df, vecCol)
    val d = c.length
    var w = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var it = 0
    while (it < iters) {
      val nw = Array.tabulate(d) { i =>
        var s = 0.0; var j = 0
        while (j < d) { s += c(i)(j) * w(j); j += 1 }
        s
      }
      val nrm = math.sqrt(nw.map(x => x * x).sum)
      w = if (nrm > 0) nw.map(_ / nrm) else nw
      it += 1
    }
    // canonical sign: the max-|loading| dim (lowest pos on ties) positive
    val argmax = w.indices.maxBy(i => (math.abs(w(i)), -i))
    if (w(argmax) < 0) w = w.map(-_)
    val lambda1 = { // Rayleigh quotient w'Cw (w is unit)
      var s = 0.0
      for (i <- 0 until d; j <- 0 until d) s += w(i) * c(i)(j) * w(j)
      s
    }
    val trace = (0 until d).map(i => c(i)(i)).sum
    val share = if (trace > 0) lambda1 / trace else 0.0
    (w, share)
  }

  /** All-but-the-top debiasing (Mu & Viswanath ICLR'18) — the CURE for
    * the anisotropy [[pc1Power]] diagnoses: subtract the corpus mean
    * and project out the dominant direction,
    * `x̂ = (x − μ) − ⟨x − μ, w⟩·w` — after which cosine similarity
    * stops being dominated by the common component and ANN recall on
    * the same index budget improves (the standard pre-index transform).
    * μ and w are BOUNDED model constants (d and d doubles — collected
    * once, broadcast as literals); the transform itself is a pure
    * per-row projection, map-only at 100 TB. Output is the debiased
    * vector EXPLODED to (id, pos, value) rows — scalar-typed and
    * rounded, so the result is hash-gateable (array columns are not).
    */
  def removeTopComponent(df: DataFrame, idCol: String, vecCol: String,
                         iters: Int = 10, digits: Int = 6): DataFrame = {
    val (w, _) = pc1Fit(df, vecCol, iters)
    val mVd = transform(col(vecCol), x => x.cast("double"))
    // count(mVd): non-NULL vectors only — the rows VecSumAgg consumed
    val mRow = df.agg(count(mVd).as("__n"),
      graft.functions.VecSumAgg.vecSum(mVd).as("__sx")).head()
    val mN = mRow.getLong(0).toDouble
    val mean = mRow.getSeq[Double](1).toArray.map(_ / mN)
    val mLit = array(mean.map(lit).toIndexedSeq: _*)
    val wLit = array(w.map(lit).toIndexedSeq: _*)
    val centered = zip_with(col(vecCol), mLit, (x, m) => x.cast("double") - m)
    val proj = dot(centered, wLit)
    df.select(col(idCol), centered.as("__c"), proj.as("__p"))
      .select(col(idCol), posexplode(col("__c")).as(Seq("__pos", "__x")),
        col("__p"))
      .select(col(idCol), col("__pos").cast("long").as("pos"),
        roundStable(col("__x") -
          col("__p") * element_at(wLit, col("__pos") + 1), digits)
          .as("debiased"))
  }

  /** Rounded-cosine-distance pair stage shared by the kNN diagnostics:
    * (__ida, __idb, __dist) with `__dist = round(1 − cos, digits)`.
    * `candidates = None` is the brute-force broadcast self-join (the
    * audit-scale oracle twin); `Some(pairs)` restricts to a directed
    * candidate list (columns `id_a`, `id_b` — see [[Candidates]]), in
    * which case the vectors attach by two keyed equi-joins on the id
    * (bare id pairs travel through the dedup; vectors shuffle once per
    * unique pair — the [[LshAnn.nearDupPairs]] lesson). Identical
    * arithmetic on both paths, so a recall-1.0 candidate list
    * reproduces brute force bit-for-bit.
    */
  private[graft] def pairDists(df: DataFrame, idCol: String, vecCol: String,
      digits: Int, candidates: Option[DataFrame]): DataFrame =
    candidates match {
      case None =>
        // the broadcast self-join's output parallelism equals the STREAM
        // side's scan partitions — a single-row-group embeddings file
        // would compute all n² dots in ONE task (guide §2.2); spread is
        // a no-op when the scan is already parallel
        val sdf = graft.Tables.spread(df, idCol)
        val a = sdf.select(col(idCol).as("__ida"), col(vecCol).as("__va"))
          .withColumn("__na", Similarity.norm(col("__va")))
        val b = sdf.select(col(idCol).as("__idb"), col(vecCol).as("__vb"))
          .withColumn("__nb", Similarity.norm(col("__vb")))
        a.join(broadcast(b), col("__ida") =!= col("__idb"))
          .select(col("__ida"), col("__idb"),
            roundStable(lit(1.0) - dot(col("__va"), col("__vb")) /
              (col("__na") * col("__nb")), digits).as("__dist"))
      case Some(cand) =>
        val vecs = df.select(col(idCol).as("__vid"), col(vecCol).as("__v"),
          Similarity.norm(col(vecCol)).as("__n"))
        // The dedup exchange carries bare 16-byte id pairs, so AQE's
        // byte-based coalescing squashes its read side to one or two
        // tasks at gate scale — and that read side IS the per-pair dot
        // stage (the vector attach joins broadcast at these sizes). An
        // explicit keyed repartition REPLACES the dedup's own exchange
        // (hashpartitioning on the dedup keys satisfies the aggregate's
        // requirement — same single shuffle) and its REPARTITION_BY_NUM
        // partitioning is pinned against coalescing, so the compute-
        // heavy stage keeps cluster-default parallelism (guide §2.2:
        // partition to the work, not the bytes). Scale-adaptive: the
        // count derives from defaultParallelism, never a constant.
        val para = cand.sparkSession.sparkContext.defaultParallelism
        cand.select(col("id_a").as("__ida"), col("id_b").as("__idb"))
          .filter(col("__ida") =!= col("__idb"))
          .repartition(para, col("__ida"), col("__idb"))
          .dropDuplicates("__ida", "__idb")
          .join(vecs, col("__ida") === col("__vid"))
          .withColumnRenamed("__v", "__va").withColumnRenamed("__n", "__na")
          .drop("__vid")
          .join(vecs, col("__idb") === col("__vid"))
          .withColumnRenamed("__v", "__vb").withColumnRenamed("__n", "__nb")
          .drop("__vid")
          .select(col("__ida"), col("__idb"),
            roundStable(lit(1.0) - dot(col("__va"), col("__vb")) /
              (col("__na") * col("__nb")), digits).as("__dist"))
    }

  /** Top-k rows per `__ida` from the pair stage — `(__ida, __idb,
    * __dist, __rk)` with `__rk` densely 1..k in (dist asc NULLS FIRST,
    * idb asc) order, exactly the
    * `row_number().over(partitionBy(__ida).orderBy(dist, idb)) <= k`
    * window. When the id column is LongType (every production corpus
    * here) it rides [[graft.functions.TopKAgg]]: the map-side partial
    * collapses each point's n−1 candidates to k BEFORE the exchange,
    * so the shuffle carries n·k entries instead of the whole O(n²)
    * pair frame and nothing sorts the full frame (guide §2.3). The
    * window form remains as the non-long-id fallback — same rows
    * either way (TopKAggSpec proves equality on adversarial inputs).
    */
  private def rankedTopK(pairs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.types.LongType
    if (pairs.schema("__idb").dataType == LongType) {
      pairs.groupBy(col("__ida"))
        .agg(graft.functions.TopKAgg.topKMin(
          col("__dist"), col("__idb"), k).as("__tk"))
        .select(col("__ida"), posexplode(col("__tk")).as(Seq("__p", "__e")))
        .select(col("__ida"), col("__e").getField("id").as("__idb"),
          col("__e").getField("score").as("__dist"),
          (col("__p") + 1).as("__rk"))
    } else
      pairs.withColumn("__rk",
        row_number().over(Window.partitionBy(col("__ida"))
          .orderBy(col("__dist").asc, col("__idb").asc)))
        .filter(col("__rk") <= k)
  }

  /** Distance-based outlier score (Ramaswamy '00 kNN-dist variant):
    * each vector's mean cosine DISTANCE (1 − cos) to its k nearest
    * neighbors; the top-N scores are the corpus's geometric outliers —
    * mojibake, wrong-modality rows, or dead-zone padding that survives
    * every text filter because the text LOOKS fine.
    *
    * Brute-force all-pairs by default (the q37 contract: codegen'd
    * dot, one window per query side) — correct at audit scale; pass
    * `candidates` (see [[Candidates.ivfSelfPairs]]) to ride an
    * IVF/LSH candidate list at 100 TB — identical arithmetic, so at
    * recall 1.0 the output is bit-identical and the brute-force run
    * stays the oracle. Pair distances are rounded BEFORE ranking
    * (the [[Similarity.bruteForceTopK]] discipline — rank on rounded
    * score + id tie-break so both engines rank identical doubles);
    * the final ranking is (score desc, id) — fully deterministic.
    */
  def knnOutliers(df: DataFrame, idCol: String, vecCol: String,
                  k: Int = 10, topN: Int = 20, digits: Int = 6,
                  candidates: Option[DataFrame] = None): DataFrame = {
    require(k >= 1 && topN >= 1, s"need k, topN >= 1, got $k, $topN")
    val pairs = pairDists(df, idCol, vecCol, digits, candidates)
    val ranked = rankedTopK(pairs, k)
    ranked.groupBy(col("__ida"))
      .agg(roundStable(avg(col("__dist")), digits).as("knn_dist"))
      .withColumn("rank", row_number().over(Window.orderBy(
        col("knn_dist").desc, col("__ida").asc)))
      .filter(col("rank") <= topN)
      .select(col("rank").cast("long").as("rank"),
        col("__ida").as(idCol), col("knn_dist"))
      .orderBy(col("rank"))
  }

  /** Hubness census (Radovanović JMLR'10) — the high-dimensional
    * pathology every ANN/retrieval stack inherits: the k-occurrence
    * count `N_k(x)` (how many points have x in THEIR k-NN list) grows
    * right-skewed with dimension, so a few hubs answer everyone's
    * queries (q305's one-directional failure mode) while antihubs
    * answer nobody's. Emits the top-`topN` hubs with their counts,
    * plus the population skewness of N_k (the canonical hubness
    * score — ≳ 1 means the space needs hubness reduction before
    * kNN-anything) and the antihub share (N_k = 0), both riding every
    * row. Zero-occurrence points are materialized via the left join —
    * skewness over only-observed counts would understate. Same
    * rounded-distance pair stage as [[knnOutliers]] (id tiebreak,
    * oracle-stable); pass `candidates` to ride the ANN ladder's
    * candidate lists at scale — bit-identical at recall 1.0.
    */
  def hubness(df: DataFrame, idCol: String, vecCol: String, k: Int = 10,
              topN: Int = 20, digits: Int = 6,
              candidates: Option[DataFrame] = None): DataFrame = {
    require(k >= 1 && topN >= 1, s"need k, topN >= 1, got $k, $topN")
    val pairs = pairDists(df, idCol, vecCol, digits, candidates)
    val inLists = rankedTopK(pairs, k)
      .groupBy(col("__idb")).agg(count(lit(1)).as("__c"))
    val occ = df.select(col(idCol).as("__id"))
      .join(inLists.withColumnRenamed("__idb", "__id"), Seq("__id"), "left")
      .withColumn("__occ", coalesce(col("__c"), lit(0L)).cast("double"))
    val mu = avg(col("__occ"))
    val m2r = avg(col("__occ") * col("__occ"))
    val m3r = avg(col("__occ") * col("__occ") * col("__occ"))
    val stats = occ.agg(mu.as("__mu"), m2r.as("__m2r"), m3r.as("__m3r"),
      avg(when(col("__occ") === 0, 1.0).otherwise(0.0)).as("__ah"))
    val m2 = col("__m2r") - col("__mu") * col("__mu")
    val m3 = col("__m3r") - lit(3.0) * col("__mu") * col("__m2r") +
      lit(2.0) * col("__mu") * col("__mu") * col("__mu")
    occ.crossJoin(broadcast(stats))
      .withColumn("rank", row_number().over(Window.orderBy(
        col("__occ").desc, col("__id").asc)).cast("long"))
      .filter(col("rank") <= topN)
      .select(col("rank"), col("__id").as(idCol),
        col("__occ").cast("long").as("k_occurrence"),
        roundStable(when(m2 > 0, m3 / pow(m2, 1.5)), digits)
          .as("skewness"),
        roundStable(col("__ah"), digits).as("antihub_frac"))
  }

  /** Mean local intrinsic dimensionality per label (Levina & Bickel
    * NIPS'04 MLE over k-NN distances): per point,
    * `LID = (k−1) / Σ_{j<k} ln(T_k/T_j)` — how many effective degrees
    * of freedom the space has LOCALLY. The retrieval-difficulty
    * number: LID far above the PCA dimension (q292 reads the GLOBAL
    * axis) means neighborhoods are effectively unstructured and every
    * ANN index will struggle there; per-label means localize WHICH
    * region is hard. Zero distances (exact duplicates) are excluded
    * before ranking — a dup is not a neighbor at radius 0, and ln
    * needs d > 0 (documented); all-equal-distance points yield a 0
    * denominator → NULL, dropped from the label mean by avg.
    * Same rounded-distance pair stage as [[knnOutliers]]; pass
    * `candidates` for the ANN-candidate path at scale.
    */
  def lidMle(df: DataFrame, idCol: String, vecCol: String,
             labelCol: String, k: Int = 10, digits: Int = 6,
             candidates: Option[DataFrame] = None): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    val pairs = pairDists(df, idCol, vecCol, digits, candidates)
      .filter(col("__dist") > 0)
    val ranked = rankedTopK(pairs, k)
    val perPoint = ranked.groupBy(col("__ida"))
      .agg(count(lit(1)).as("__kk"), max(col("__dist")).as("__tk"),
        sum(when(col("__rk") < k, log(col("__dist")))).as("__sl"))
      .filter(col("__kk") === k)
      .withColumn("__den",
        (lit(k - 1)) * log(col("__tk")) - col("__sl"))
      .withColumn("__lid", when(col("__den") > 0, lit((k - 1).toDouble) /
        col("__den")))
    perPoint
      .join(df.select(col(idCol).as("__ida"), col(labelCol).as("label")),
        "__ida")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_points"),
        count(col("__lid")).as("n_fit"),
        roundStable(avg(col("__lid")), digits).as("mean_lid"))
  }

  /** Participation ratio — the moment-based EFFECTIVE DIMENSIONALITY of
    * the embedding covariance, `PR = tr(C)² / tr(C²) = (Σλ)²/Σλ²`
    * (Gao et al. 2017's dimensionality measure; the same spectral-
    * flatness family as RankMe's erank, Garrido et al. ICML'23): d for
    * an isotropic cloud, k when variance lives in k equal directions,
    * →1 under the anisotropy [[pc1Power]] diagnoses. The ANN-budget /
    * embedding-collapse one-number readout: a 768-dim embedding with
    * PR 12 is a 12-dim model wearing a 768-dim coat — Matryoshka/PCA
    * truncation is free, and cosine geometry is dominated by few axes.
    *
    * Unlike erank it needs NO eigendecomposition — both traces read
    * directly off the covariance (tr C² = Σ_ij C_ij², C symmetric), so
    * the WHOLE statistic is exact moment algebra: one
    * [[graft.functions.OuterProductAgg]] pass (the covFit constant
    * collect), zero driver-side iteration, and a DuckDB oracle can
    * replay it cell-for-cell (unlike the Jacobi/power paths, which are
    * rows-only). Degenerate corpus (zero variance) → NULL ratio.
    *
    * Output: one row — dim, n_vectors, trace (total variance), PR, and
    * PR/d (the 0-to-1 "how much of the coat is worn" share).
    */
  /** (trace C, trace C²) from RAW moments (n, Σx, Σxxᵀ row-major) —
    * the shared fold behind [[participationRatio]] /
    * [[participationRatioBy]] / [[graft.streaming.CovStream]]: cells
    * derive as C_ij = Σxy_ij/n − (Σx_i/n)(Σx_j/n), traces accumulate in
    * index order (deterministic cross-path).
    */
  private[graft] def tracesFromMoments(n: Double, sx: Array[Double],
      sxy: Array[Double]): (Double, Double) = {
    val d = sx.length
    var tr = 0.0
    var tr2 = 0.0
    var i = 0
    while (i < d) {
      tr += sxy(i * d + i) / n - (sx(i) / n) * (sx(i) / n)
      var j = 0
      while (j < d) {
        val cij = sxy(i * d + j) / n - (sx(i) / n) * (sx(j) / n)
        tr2 += cij * cij
        j += 1
      }
      i += 1
    }
    (tr, tr2)
  }

  def participationRatio(df: DataFrame, vecCol: String,
                         digits: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (n, c) = covFit(df, vecCol)
    val d = c.length
    var tr = 0.0
    var tr2 = 0.0
    var i = 0
    while (i < d) {
      tr += c(i)(i)
      var j = 0
      while (j < d) { tr2 += c(i)(j) * c(i)(j); j += 1 }
      i += 1
    }
    Seq((d.toLong, n, tr, if (tr2 > 0) Some(tr * tr / tr2) else None))
      .toDF("dim", "n_vectors", "__tr", "__pr")
      .select(col("dim"), col("n_vectors"),
        roundStable(col("__tr"), digits).as("trace_cov"),
        roundStable(col("__pr"), digits).as("participation_ratio"),
        roundStable(col("__pr") / col("dim"), digits).as("pr_share"))
  }

  /** [[participationRatio]] PER KEY — "which ingestion feed is
    * geometrically collapsed": one keyed aggregation carries a d²
    * typed buffer per key (the OuterProductAgg keyed form — map-side
    * partials merge buffers, the shuffle moves O(#keys·d²) doubles,
    * never rows), the driver folds each key's traces (bounded: #keys
    * model constants), and the verdict lands as one row per key. A
    * feed whose PR sits far below its siblings' embeds into a thinner
    * subspace — re-embed or re-weight before mixing (the geometric
    * sibling of the q303 cross-entropy mix audit).
    *
    * Key contract: the key is read as LONG (numeric cohort ids — the
    * embeddings table's `label` convention); for string keys map to a
    * dense id upstream (one distinct + join, the usual dimension trick).
    */
  def participationRatioBy(df: DataFrame, keyCol: String, vecCol: String,
                           digits: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vd = transform(col(vecCol), x => x.cast("double"))
    // count(vd): non-NULL vectors only (the covFit denominator contract)
    val rows = df.groupBy(col(keyCol).cast("long").as("__k"))
      .agg(count(vd).as("__n"),
        graft.functions.VecSumAgg.vecSum(vd).as("__sx"),
        graft.functions.OuterProductAgg.outerProductSum(vd, vd).as("__sxy"))
      .collect() // bounded: #keys × (1 + d + d²) doubles — model constants
      .filter(_.getLong(1) > 0) // all-NULL keys have no moments to fold
    val out = rows.map { r =>
      val sx = r.getSeq[Double](2).toArray
      val sxy = r.getSeq[Double](3).toArray
      val (tr, tr2) = tracesFromMoments(r.getLong(1).toDouble, sx, sxy)
      (r.getLong(0), sx.length.toLong, r.getLong(1), tr,
        if (tr2 > 0) Some(tr * tr / tr2) else None)
    }.toSeq
    out.toDF("key", "dim", "n_vectors", "__tr", "__pr")
      .select(col("key").as(keyCol), col("dim"), col("n_vectors"),
        roundStable(col("__tr"), digits).as("trace_cov"),
        roundStable(col("__pr"), digits).as("participation_ratio"),
        roundStable(col("__pr") / col("dim"), digits).as("pr_share"))
  }
}
