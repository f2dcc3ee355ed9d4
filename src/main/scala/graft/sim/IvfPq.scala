package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ: the two approximate halves composed into the actual 100 TB
  * ANN architecture — a coarse k-means quantizer partitions the corpus
  * into cells ([[KMeans]]), PQ codes make each cell scannable from RAM
  * ([[ProductQuantizer]]), and a query touches only its `nprobe`
  * nearest cells:
  *
  *   query → nprobe coarse cells → ADC scan of those cells' codes
  *         → rerankDepth candidates → exact cosine re-rank → top-k
  *
  * The scan term drops from O(n·m) lookups per query (flat PQ) to
  * O(n·m·nprobe/kCoarse), and — deployed with the codes table
  * hive-partitioned by cell — the probe join becomes partition PRUNING:
  * a 1000-executor scan reads nprobe directories, not the corpus. Here
  * the same restriction is expressed as a broadcast equi-join on the
  * cell id placed BELOW the code explosion, so rows outside a query's
  * probed cells never reach the ADC scan. Verified three ways: recall
  * and per-query candidate count in OperatorEdgeSpec, the
  * probe-join-below-explode plan shape in PlanSpec, and the rows-only
  * driver queries q71_ivfpq_topk / q73_ivfrq_topk.
  *
  * `residual = true` is the IVFADC refinement (Jégou, Douze, Schmid,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011,
  * §IV-A): codebooks are trained on RESIDUALS `v − c(v)` (the vector
  * minus its coarse centroid), whose variance is what the coarse
  * quantizer left over — smaller than the raw corpus variance, so the
  * same m×ksub code budget quantizes finer. The score decomposes as
  *
  *   ⟨q, v⟩ = ⟨q, c(v)⟩ + ⟨q, v − c(v)⟩
  *          ≈ ⟨q, c_cell⟩  +  Σ_j ⟨q_j, μ_{j,code_j}⟩
  *
  * so the per-(query, cell) offset ⟨q, c_cell⟩ rides the (tiny) probe
  * set and the residual ADC table stays per-query — the distributed
  * plan is IDENTICAL to the plain path; only the driver-side constants
  * and one projected column differ.
  *
  * Both trainers are the deterministic, partition-independent ones this
  * library already proves: no RNG, bounded driver state (kCoarse×dim
  * centroids, m×ksub×dsub codebooks, the small-by-contract query set).
  */
object IvfPq {

  /** Coarse quantizer + codebooks, trained independently; `Option`-inject
    * a pre-trained model into [[topK]] to amortize training across query
    * batches (the production shape — train offline, probe forever).
    * `residual` records what space the codebooks quantize — encode and
    * search must agree with training, so it travels with the model.
    */
  case class Model(coarse: Array[Array[Double]], pq: ProductQuantizer.Model,
      residual: Boolean = false)

  def fit(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      kCoarse: Int = 16, m: Int = 8, ksub: Int = 16,
      coarseIters: Int = 5, pqIters: Int = 3,
      residual: Boolean = false): Model = {
    val coarse = KMeans.fit(df, idCol, vecCol, kCoarse, coarseIters)
    val pqInput = if (residual) residualize(df, vecCol, coarse) else df
    val pqVec = if (residual) "__res" else vecCol
    Model(coarse, ProductQuantizer.fit(pqInput, idCol, pqVec, dim, m, ksub, pqIters),
      residual)
  }

  /** Attach `__cl` (coarse cell) and `__res` (float residual v − c_cell) —
    * one codegen'd map-only projection, no shuffle. The residual stays
    * `array<float>` so every downstream consumer (PQ training, encode)
    * sees the same element type as a raw vector column.
    */
  private def residualize(df: DataFrame, vecCol: String,
      coarse: Array[Array[Double]]): DataFrame = {
    val tensor = typedLit(coarse.map(_.toSeq).toSeq)
    df.withColumn("__cl", KMeans.assignExpr(col(vecCol), coarse))
      .withColumn("__res", zip_with(
        col(vecCol), element_at(tensor, col("__cl") + 1),
        (x, c) => (x - c).cast("float")))
  }

  /** Squared L2 — the coarse assignment metric, mirrored driver-side so
    * query probes rank cells exactly as [[KMeans.assignExpr]] assigns
    * corpus rows.
    */
  private def d2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Distinct probed cell ids across the whole query set, driver-side —
    * a literal the caller can push into the cells scan as an IN filter
    * (bucket + parquet row-group pruning) BEFORE any join. A broadcast
    * join on `cell` only filters rows after the scan; the literal is
    * what makes "touch only the probed cells' buckets" true in the plan.
    */
  private[graft] def probedCellIds(qRows: Array[(Long, Array[Float])],
      coarse: Array[Array[Double]], nprobe: Int): Seq[Int] =
    qRows.toSeq.flatMap { case (_, qv) =>
      val v = qv.map(_.toDouble)
      coarse.zipWithIndex.map { case (c, i) => (d2(v, c), i) }
        .sorted.take(nprobe).map(_._2)
    }.distinct.sorted

  /** (query_id, __cl, __off) probe set: each query's `nprobe` nearest
    * coarse cells, with the residual-decomposition offset ⟨q, c_cell⟩
    * precomputed per probe (summed into the ADC score on the residual
    * path; a constant 0 on the plain path, where codes live in raw
    * space). Driver-side over the collected query vectors and the
    * kCoarse×dim centroid matrix — both small by contract; ties break
    * on cell id so the probe set is deterministic.
    */
  private[graft] def probeSet(spark: SparkSession,
      qRows: Array[(Long, Array[Float])], coarse: Array[Array[Double]],
      nprobe: Int, withOffset: Boolean = false): DataFrame = {
    import spark.implicits._
    qRows.toSeq.flatMap { case (qid, qv) =>
      val v = qv.map(_.toDouble)
      coarse.zipWithIndex
        .map { case (c, i) => (d2(v, c), i) }
        .sorted.take(nprobe)
        .map { case (_, i) =>
          val off = if (!withOffset) 0.0 else {
            var s = 0.0; var t = 0
            while (t < v.length) { s += v(t) * coarse(i)(t); t += 1 }
            s
          }
          (qid, i, off)
        }
    }.toDF("query_id", "__cl", "__off")
  }

  /** Per-query candidate rows — corpus rows restricted to the query's
    * probed cells, BEFORE any per-code work. Exposed so the spec can
    * count what reaches the ADC scan (must be < corpus per query).
    * Codes are computed in the space the model was trained in.
    */
  private[graft] def candidates(df: DataFrame, idCol: String, vecCol: String,
      mdl: Model, probes: DataFrame): DataFrame = {
    val assigned =
      if (mdl.residual)
        ProductQuantizer.encode(residualize(df, vecCol, mdl.coarse), "__res", mdl.pq)
      else
        ProductQuantizer.encode(df, vecCol, mdl.pq)
          .withColumn("__cl", KMeans.assignExpr(col(vecCol), mdl.coarse))
    assigned.select(col(idCol).as("neighbor_id"), col("__cl"), col("code"))
      .join(broadcast(probes), Seq("__cl"))
      .filter(col("query_id") =!= col("neighbor_id"))
  }

  /** Approximate top-k: probe → ADC scan of the probed cells →
    * `rerankDepth` candidates → exact cosine re-rank. Output matches the
    * other ANN surfaces: (query_id, neighbor_id, cosine, rank).
    */
  def topK(df: DataFrame, idCol: String, vecCol: String, isQuery: Column,
      dim: Int, k: Int, kCoarse: Int = 16, nprobe: Int = 4,
      m: Int = 8, ksub: Int = 16, rerankDepth: Int = 100,
      residual: Boolean = false, model: Option[Model] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val mdl = model.getOrElse(
      fit(df, idCol, vecCol, dim, kCoarse, m, ksub, residual = residual))

    val qRows = df.filter(isQuery).select(col(idCol), col(vecCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val probes = probeSet(spark, qRows, mdl.coarse, nprobe, withOffset = mdl.residual)
    // residual path: the ADC table is the query's RAW subvectors against
    // the residual-space codebooks — ⟨q, r⟩ ≈ Σ_j ⟨q_j, μ_{j,c_j}⟩ needs
    // no query residualization (the cell term is the probe's __off)
    val table = ProductQuantizer.adcTable(qRows, mdl.pq).toDF("query_id", "__j", "__c", "__s")

    // ADC scan of the PROBED cells only: the cell join sits below the
    // code explosion, so the m-way row blowup and the broadcast lookup
    // touch O(n·nprobe/kCoarse) rows per query, not the corpus. __off is
    // constant within a (query, neighbor) group — a neighbor lives in
    // exactly one cell — so max() just carries it through the agg.
    val cand = candidates(df, idCol, vecCol, mdl, probes)
    val approx = cand
      .select(col("query_id"), col("neighbor_id"), col("__off"),
        posexplode(col("code")).as(Seq("__j", "__c")))
      .join(broadcast(table), Seq("query_id", "__j", "__c"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg((sum(col("__s")) + max(col("__off"))).as("__approx"))
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("__approx").desc, col("neighbor_id"))
    val shortlist = approx
      .withColumn("__r", row_number().over(wA)).filter(col("__r") <= rerankDepth)
      .select("query_id", "neighbor_id")

    // exact re-rank of the bounded candidate set — identical tail to
    // [[ProductQuantizer.topK]], so the surfaces rank ties identically
    val q = df.filter(isQuery).select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      Similarity.norm(col(vecCol)).as("__qn"))
    val c = df.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      Similarity.norm(col(vecCol)).as("__cn"))
    val wE = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    shortlist.join(broadcast(q), "query_id").join(c, "neighbor_id")
      .withColumn("cosine", graft.functions.roundStable(
        Similarity.dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 4))
      .withColumn("rank", row_number().over(wE).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }
}
