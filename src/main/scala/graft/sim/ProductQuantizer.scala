package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization: the memory-bounded ANN path.
  *
  * A d-dim float vector (d·4 bytes) is compressed to `m` small ints by
  * running k-means independently in each of `m` subspaces ([[KMeans]] —
  * deterministic, distributed) and storing only the per-subspace centroid
  * index. At d=64, m=8: 256 bytes → 8 codes — a 32× memory reduction,
  * which is what makes a 100 TB corpus scannable from RAM.
  *
  * Search is asymmetric distance computation (ADC): each query
  * precomputes its inner product against every centroid of every
  * subspace (an m×ksub lookup table, tiny, broadcast), so scoring a
  * corpus vector is m table lookups instead of a d-element dot product.
  * The approximate scan keeps `rerankDepth` candidates per query, which
  * are then re-ranked with EXACT cosine on the original vectors — the
  * standard IVF-PQ shape (coarse recall from codes, exact order from a
  * bounded re-rank).
  *
  * Everything is keyed DataFrame ops: the code scan is a broadcast join
  * on (subspace, code) + a keyed sum — no all-pairs, no driver data
  * collection beyond the (small by contract) query set and the centroid
  * matrices.
  */
object ProductQuantizer {

  /** m × ksub × dsub centroid tensor. */
  case class Model(dim: Int, m: Int, centroids: Array[Array[Array[Double]]]) {
    def dsub: Int = dim / m
    def ksub: Int = centroids(0).length
  }

  private def subCol(vecCol: String, j: Int, dsub: Int): Column =
    slice(col(vecCol), j * dsub + 1, dsub)

  /** Train ALL m codebooks jointly with deterministic Lloyd's: the
    * vectors are exploded once to (subspace, subvector) rows, and each
    * iteration is ONE keyed aggregation assigning every row to its
    * subspace's nearest centroid and averaging per (subspace, cluster).
    * Training m codebooks sequentially would be m·(1+iters) jobs whose
    * scheduling overhead dominates; jointly it's 1 + iters jobs total,
    * independent of m. Seeding: the ksub hash-first vectors, sliced per
    * subspace (one scan, no RNG).
    */
  def fit(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int = 8, ksub: Int = 16, iters: Int = 3): Model = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m
    // every Lloyd iteration re-aggregates the same exploded
    // (subspace, subvector) rows — persist them once instead of
    // re-scanning and re-exploding the corpus per iteration
    val subs = df.select(
      explode(array((0 until m).map(j =>
        struct(lit(j).as("j"), subCol(vecCol, j, dsub).as("sub"))): _*)).as("e"))
      .select(col("e.j").as("j"), col("e.sub").as("sub"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val seedRows = df.select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(ksub).collect()
      .map(_.getSeq[Float](1).toArray)
    require(seedRows.length == ksub,
      s"PQ training needs at least ksub=$ksub vectors to seed the codebooks; " +
        s"corpus has only ${seedRows.length} — lower ksub or use brute force at this size")
    var cents: Array[Array[Array[Double]]] = Array.tabulate(m, ksub) { (j, c) =>
      Array.tabulate(dsub)(t => seedRows(c)(j * dsub + t).toDouble)
    }
    for (_ <- 0 until iters) {
      // the whole m×ksub×dsub codebook tensor as ONE literal, indexed by
      // the row's subspace id — no per-subspace when()-chain (whose
      // inlined centroid constants forced a Janino recompile every
      // iteration and grew the generated method with m·ksub)
      val tensor = typedLit(cents.map(_.map(_.toSeq).toSeq).toSeq)
      val assignC = graft.functions.CentroidExpressions.nearestCentroid(
        col("sub"), element_at(tensor, col("j") + 1))
      val means = subs.withColumn("__c", assignC)
        .select(col("j"), col("__c"), posexplode(col("sub")))
        .groupBy(col("j"), col("__c"), col("pos"))
        .agg(avg(col("col")).as("mu"))
        .collect()
      val next = cents.map(_.map(_.clone()))
      means.foreach(r => next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3))
      cents = next
    }
    subs.unpersist()
    Model(dim, m, cents)
  }

  /** Attach the `code` column: array<int> of per-subspace centroid ids —
    * a pure codegen'd argmin projection, map-only over the corpus.
    */
  def encode(df: DataFrame, vecCol: String, model: Model): DataFrame = {
    val codes = (0 until model.m).map { j =>
      KMeans.assignExpr(subCol(vecCol, j, model.dsub), model.centroids(j))
    }
    df.withColumn("code", array(codes: _*))
  }

  /** ADC lookup table rows for the given queries: (query_id, j, c, score)
    * where score is the inner product of the query's j-th subvector with
    * centroid c of subspace j. m·ksub rows per query — broadcastable.
    */
  private[sim] def adcTable(queries: Array[(Long, Array[Float])], model: Model): Seq[(Long, Int, Int, Double)] =
    for {
      (qid, qv) <- queries.toSeq
      j <- 0 until model.m
      (cent, c) <- model.centroids(j).zipWithIndex
    } yield {
      var s = 0.0
      var t = 0
      while (t < model.dsub) { s += qv(j * model.dsub + t).toDouble * cent(t); t += 1 }
      (qid, j, c, s)
    }

  /** Approximate top-k: ADC scan over codes → `rerankDepth` candidates →
    * exact cosine re-rank. Output matches the other ANN surfaces:
    * (query_id, neighbor_id, cosine, rank).
    */
  def topK(df: DataFrame, idCol: String, vecCol: String, isQuery: Column,
      dim: Int, k: Int, m: Int = 8, ksub: Int = 16,
      rerankDepth: Int = 100, model: Option[Model] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val mdl = model.getOrElse(fit(df, idCol, vecCol, dim, m, ksub))

    // query set is small by contract (same as bruteForceTopK) — its
    // vectors drive the driver-built ADC table
    val qRows = df.filter(isQuery).select(col(idCol), col(vecCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val table = adcTable(qRows, mdl).toDF("query_id", "__j", "__c", "__s")

    // ADC scan: explode codes to (neighbor, j, c), broadcast-join the
    // table, sum per (query, neighbor) — keyed shuffles only
    val codes = encode(df, vecCol, mdl)
      .select(col(idCol).as("neighbor_id"), posexplode(col("code")).as(Seq("__j", "__c")))
    val approx = codes.join(broadcast(table), Seq("__j", "__c"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("__s")).as("__approx"))
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("__approx").desc, col("neighbor_id"))
    val cands = approx
      .withColumn("__r", row_number().over(wA)).filter(col("__r") <= rerankDepth)
      .select("query_id", "neighbor_id")

    // exact re-rank of the bounded candidate set
    val q = df.filter(isQuery).select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      Similarity.norm(col(vecCol)).as("__qn"))
    val c = df.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      Similarity.norm(col(vecCol)).as("__cn"))
    val wE = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cands.join(broadcast(q), "query_id").join(c, "neighbor_id")
      .withColumn("cosine", graft.functions.roundStable(
        Similarity.dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 4))
      .withColumn("rank", row_number().over(wE).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }
}
