package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over an embedding column — the trainer
  * that makes [[IvfAnn]] self-contained (coarse centroids computed
  * in-engine instead of pre-assigned offline).
  *
  * Distributed-first: the DATA never reaches the driver — only the k×dim
  * centroid matrix does (a few KB), once per iteration. Assignment is a
  * pure codegen'd expression (argmin over [[Similarity.dot]] distances),
  * so scoring 100 TB of vectors is a map-only stage; the update is one
  * keyed aggregation per iteration.
  *
  * Determinism (no RNG anywhere):
  *   - seed 0 = vector with the smallest xxhash64(id);
  *   - seeds 1..k-1 by farthest-point traversal (max distance to chosen
  *     seeds, ties broken by id) — on separated clusters this lands one
  *     seed per cluster, avoiding Lloyd's classic two-seeds-in-one-cluster
  *     local optimum;
  *   - argmin ties broken by cluster index.
  */
object KMeans {

  /** Squared-distance argmin assignment expression for fixed centroids:
    * d_j = −2·v·c_j + |c_j|² (the |v|² term is constant per row and
    * cannot change the argmin); ties resolve to the lowest index.
    *
    * The centroid matrix travels as ONE non-primitive literal into
    * [[graft.functions.CentroidExpressions.NearestCentroid]] — a fixed
    * LOOP in generated code, so (a) every Lloyd iteration reuses the
    * same Janino-compiled stage (per-centroid primitive literals would
    * inline and force a recompile per iteration), and (b) code size is
    * constant in k (the unrolled form blows the 64 KB method limit
    * around k≈256 and silently de-optimizes to interpreted rows).
    */
  def assignExpr(vecCol: Column, centroids: Array[Array[Double]]): Column =
    graft.functions.CentroidExpressions.nearestCentroid(
      vecCol, typedLit(centroids.map(_.toSeq).toSeq))

  private def vecOf(vecCol: String)(r: org.apache.spark.sql.Row): Array[Double] =
    r.getSeq[Float](r.fieldIndex(vecCol)).map(_.toDouble).toArray

  /** Hash-order initial centroids: the k vectors with smallest
    * xxhash64(id) — ONE scan. No spread guarantee, so reserve it for
    * many-small-codebook training (e.g. [[ProductQuantizer]] subspaces)
    * where k·n farthest-point scans would dominate.
    */
  private def initHash(df: DataFrame, idCol: String, vecCol: String, k: Int): Array[Array[Double]] =
    df.select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(k).collect()
      .map(vecOf(vecCol))

  /** Farthest-point initial centroids (k rows collected, one scan per
    * seed). The traversal is O(k·n) on its input — [[fit]] hands it a
    * deterministic hash-sample, not the full corpus, so each of the k
    * scans touches a bounded row count at any corpus size. The distance
    * column is [[graft.functions.CentroidExpressions.MinCentroidDist]]
    * over the seed set as one literal: identical generated source per
    * scan (one codegen compile for all k), constant code size.
    */
  private def init(df: DataFrame, idCol: String, vecCol: String, k: Int): Array[Array[Double]] = {
    def vecOf(r: org.apache.spark.sql.Row): Array[Double] =
      r.getSeq[Float](r.fieldIndex(vecCol)).map(_.toDouble).toArray
    val first = df.select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(1).collect()(0)
    val seeds = scala.collection.mutable.ArrayBuffer(vecOf(first))
    while (seeds.size < k) {
      val minDist = graft.functions.CentroidExpressions.minCentroidDist(
        col(vecCol), typedLit(seeds.toSeq.map(_.toSeq)))
      val far = df.select(col(idCol), col(vecCol), minDist.as("__d"))
        .orderBy(col("__d").desc, col(idCol)).limit(1).collect()(0)
      seeds += vecOf(far)
    }
    seeds.toArray
  }

  /** k-means|| seeding (Bahmani et al., deterministic variant): instead
    * of k sequential farthest-point scans, `rounds` passes each sample
    * an EXPECTED l=2k candidates with probability ∝ their squared
    * distance to the current seed set — selection uses a hashed uniform
    * per point, not an RNG, so the candidate set is reproducible under
    * any partitioning. The ≤ 1+l·rounds candidates are then weighted by
    * how many corpus points they attract and reduced to k centers with
    * driver-side weighted Lloyd's (the candidate set is tiny by
    * construction). O(rounds) scans, independent of k — the seeding to
    * use when k is large.
    */
  private def initParallel(df: DataFrame, idCol: String, vecCol: String, k: Int,
      rounds: Int = 3): Array[Array[Double]] = {
    val l = 2 * k
    var seeds = initHash(df, idCol, vecCol, 1)
    for (round <- 0 until rounds) {
      // one literal seed matrix + loop expression: the cost column's
      // generated source is identical every round regardless of how many
      // candidates accumulated (the per-seed least()-chain it replaces
      // grew with the pool — the measured reason || seeding lost to
      // farthest-point at small k)
      val costExpr = graft.functions.CentroidExpressions.minCentroidDist(
        col(vecCol), typedLit(seeds.toSeq.map(_.toSeq)))
      val costs = df.select(col(idCol), col(vecCol), greatest(costExpr, lit(0.0)).as("__cost"))
      val total = costs.agg(sum(col("__cost"))).first().getDouble(0)
      if (total <= 0) return seeds // all points coincide with seeds
      // deterministic "coin": hashed uniform per (point, round)
      val u = pmod(xxhash64(col(idCol), lit(round)), lit(1000000L)).cast("double") / 1000000.0
      val picked = costs.filter(u < lit(l.toDouble) * col("__cost") / lit(total))
        .orderBy(col(idCol)).collect()
      seeds = seeds ++ picked.map(vecOf(vecCol))
    }
    // thin candidate pool (tiny or degenerate corpus): the weighted
    // reduction below can only return min(|pool|, k) centers, so fall
    // back to the exact farthest-point traversal, which guarantees k
    // centers whenever the corpus has k rows (cheap at this size).
    if (seeds.length < k) return init(df, idCol, vecCol, k)
    // weight candidates by attraction, then reduce driver-side
    val assign = assignExpr(col(vecCol), seeds)
    val weights = df.select(assign.as("__s")).groupBy("__s").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    weightedLloyd(seeds.zipWithIndex.map { case (s, i) =>
      (s, weights.getOrElse(i, 0L).toDouble)
    }, k)
  }

  /** Plain Lloyd's over a (tiny) weighted point set, driver-side. */
  private def weightedLloyd(pts: Array[(Array[Double], Double)], k: Int,
      iters: Int = 10): Array[Array[Double]] = {
    val dim = pts(0)._1.length
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // start from the k heaviest candidates (deterministic)
    var cents = pts.sortBy { case (_, w) => -w }.take(k).map(_._1.clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val ws = new Array[Double](k)
      pts.foreach { case (p, w) =>
        var best = 0; var bd = Double.MaxValue; var j = 0
        while (j < cents.length) {
          val dd = d2(p, cents(j)); if (dd < bd) { bd = dd; best = j }; j += 1
        }
        var t = 0
        while (t < dim) { sums(best)(t) += w * p(t); t += 1 }
        ws(best) += w
      }
      cents = cents.zipWithIndex.map { case (c, j) =>
        if (ws(j) > 0) sums(j).map(_ / ws(j)) else c
      }
    }
    cents
  }

  /** Lloyd's iterations; returns the final centroid matrix. Empty
    * clusters keep their previous centroid. `seeding` is "farthest"
    * (default; one scan per seed over a bounded hash-sample, lands one
    * seed per separated cluster), "parallel" (k-means||: O(rounds)
    * scans independent of k — use for large k), or "hash" (one scan
    * total; for many small codebooks).
    *
    * `seedSampleTarget` bounds what farthest-point seeding scans: a
    * deterministic xxhash64(id) threshold sample of ~that many rows
    * (the full corpus when it's already smaller, so small/spec corpora
    * behave identically). Seeds only need to SPREAD, not to be optimal
    * — Lloyd's iterations over the full data do the refining — and the
    * k sequential scans stop costing O(k·n) at corpus scale.
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int = 5,
      seeding: String = "farthest", seedSampleTarget: Int = 4096): Array[Array[Double]] = {
    // the trainer scans the same (id, vec) projection k times for
    // farthest-point seeding plus once per Lloyd's iteration — persist
    // it instead of re-reading (and re-decoding) parquet every job
    val base = df.select(col(idCol), col(vecCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // limit(k).count() early-stops the scan after k rows — a cheap guard
      // against the confusing downstream failures (out-of-bounds seed
      // indexing, silently-short centroid arrays) a sub-k corpus causes.
      val have = base.limit(k).count()
      require(have >= k,
        s"k-means needs at least k=$k rows; corpus has only $have — lower k")
      fitOn(base, idCol, vecCol, k, iters, seeding, seedSampleTarget)
    } finally base.unpersist()
  }

  /** Deterministic, partition-independent hash-threshold sample of
    * roughly `target` rows for seeding. Falls back to the full input
    * when the input is small or the sample came out thinner than k
    * (skewed id space). Single partition so the k seeding scans become
    * single-task jobs — via repartition(1), NOT coalesce(1): coalesce
    * propagates the 1-partition constraint BELOW the filter, collapsing
    * the full-corpus scan into one task (single-threaded O(n) at the
    * scale this sampling exists for), while repartition keeps the scan
    * parallel and shuffles only the ~4096 surviving rows.
    */
  private def seedSample(base: DataFrame, idCol: String, k: Int, target: Int): DataFrame = {
    val n = base.count()
    if (n <= target) return base
    val num = math.max(1L, math.round(target.toDouble / n * 1000000L))
    val s = base.filter(pmod(xxhash64(col(idCol)), lit(1000000L)) < lit(num))
      .repartition(1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (s.count() >= k) s else { s.unpersist(); base }
  }

  private def fitOn(base: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int,
      seeding: String, seedSampleTarget: Int): Array[Array[Double]] = {
    var centroids = seeding match {
      case "hash"     => initHash(base, idCol, vecCol, k)
      case "parallel" => initParallel(base, idCol, vecCol, k)
      case _ =>
        val sample = seedSample(base, idCol, k, seedSampleTarget)
        try init(sample, idCol, vecCol, k)
        finally if (!(sample eq base)) sample.unpersist()
    }
    val dim = centroids(0).length
    for (_ <- 0 until iters) {
      val means = base
        .select(assignExpr(col(vecCol), centroids).as("__c"), posexplode(col(vecCol)))
        .groupBy(col("__c"), col("pos"))
        .agg(avg(col("col")).as("mu"))
        .collect()
      val next = centroids.map(_.clone())
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      }
      centroids = next
      require(centroids.forall(_.length == dim))
    }
    centroids
  } // fitOn: callers own the persistence lifecycle of `base`

  /** fit + assign: the input with a `cluster` column (int), ready to be
    * the `clusterCol` of [[IvfAnn.topK]].
    */
  def fitAssign(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int = 5,
      seeding: String = "farthest"): DataFrame =
    df.withColumn("cluster", assignExpr(col(vecCol), fit(df, idCol, vecCol, k, iters, seeding)))
}
