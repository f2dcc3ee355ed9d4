package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.roundStable

/** The ANN ladder capstone: ONE selection table comparing every index
  * family in the library — LSH, IVF-flat, PQ, IVF-PQ, IVFADC (residual),
  * int8 scalar quant, binary sign quant, Matryoshka prefix — against the
  * brute-force ground truth ON THE SAME QUERY SET, with the two numbers
  * a deployment decision actually needs per rung:
  *
  *   - `recall_at_k` — measured against [[Similarity.bruteForceTopK]];
  *   - the cost decomposition — `scanned_per_query` (how many corpus
  *     rows the approximate stage touches), `scan_bytes_per_vec` (at
  *     what per-row width it touches them), `rescore_per_query` (how
  *     many full-precision dots follow — the configured rerank budget
  *     CAPPED at the measured candidate count, so a small corpus or a
  *     tight probe never bills rescores that can't happen), folded into
  *     `cost_bytes_per_query` ≈ memory traffic per query — the number
  *     that actually scales with corpus size at 100 TB, where every
  *     method here is memory-bandwidth-bound.
  *
  * All entries are DETERMINISTIC (seeded hyperplanes, deterministic
  * k-means seeding, rounded-sim + id tie-breaks), so the table is
  * replay-stable; it is rows-only at the driver because the trained
  * codebooks are engine-specific by design (the q51/q52/q71 contract).
  * Candidate counts are measured by re-running each method's OWN
  * candidate-generation stage (bucket join / cell probe), not estimated.
  *
  * Settings mirror the registered per-method queries (q39/q51/q52/q71/
  * q73/q105/q120-class) so the table reads as their side-by-side.
  */
object AnnLadder {

  private case class Rung(method: String, recall: Double,
      scannedPerQuery: Double, scanBytesPerVec: Double,
      rescorePerQuery: Double)

  /** One row per ladder rung. `dim` is the embedding width; queries are
    * `isQuery` rows of `df` (small by the bruteForceTopK contract).
    */
  /** Optional pre-trained quantizer models (e.g. a deployment's
    * existing q71/q73 codebooks) — the realistic reuse path AND the
    * Bench-cold economy: the ladder evaluates whatever index you
    * already have rather than re-training its own.
    */
  def selectionTable(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, isQuery: Column, k: Int = 5,
      digits: Int = 4,
      ivfpqModel: Option[IvfPq.Model] = None,
      ivfadcModel: Option[IvfPq.Model] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val corpus = df.select(col(idCol), col(vecCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = corpus.count()
    val queries = corpus.filter(isQuery)
    val nQ = queries.count()
    require(nQ >= 1, "isQuery selected no rows")
    val truth = Similarity.bruteForceTopK(corpus, queries, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val truthN = truth.count() // ≤ nQ·k (a sub-k corpus yields fewer)
    def recallOf(res: DataFrame): Double = {
      val hits = res.select(col("query_id"), col("neighbor_id"))
        .join(truth, Seq("query_id", "neighbor_id")).count()
      if (truthN == 0) 0.0 else hits.toDouble / truthN
    }
    val floatBytes = 4.0 * dim

    // --- per-method measured candidate counts -------------------------
    // LSH: the same bucket join topK runs (8 tables × 4 bits, 1-bit
    // multi-probe on the query side), distinct pairs.
    def lshScanned(): Double = {
      val bk = LshAnn.buckets(corpus, idCol, vecCol, dim)
      val qids = queries.select(col(idCol).as("id"))
      val variants = lit(0L) +: (0 until 4).map(b => lit(1L << b))
      val qSide = bk.join(broadcast(qids), "id")
        .withColumn("bucket",
          explode(array(variants.map(col("bucket").bitwiseXOR): _*)))
      qSide.select(col("id").as("qid"), col("table"), col("bucket"))
        .join(bk.select(col("id").as("nid"), col("table"), col("bucket")),
          Seq("table", "bucket"))
        .filter(col("qid") =!= col("nid"))
        .dropDuplicates("qid", "nid").count().toDouble / nQ
    }
    // IVF (flat or PQ): corpus rows landing in the query's probed cells.
    def ivfScanned(cents: Array[Array[Double]], nprobe: Int): Double = {
      val probes = Candidates.probeCells(queries, idCol, vecCol, cents, nprobe)
        .select(col("__id").as("qid"), col("__cell"))
      val assigned = corpus.select(col(idCol).as("nid"),
        KMeans.assignExpr(col(vecCol), cents).as("__cell"))
      probes.join(assigned, Seq("__cell"))
        .filter(col("qid") =!= col("nid")).count().toDouble / nQ
    }

    // --- the rungs ----------------------------------------------------
    val rungs = scala.collection.mutable.ArrayBuffer.empty[Rung]
    rungs += Rung("brute_force", 1.0, (n - 1).toDouble, floatBytes, 0.0)

    val lsh = LshAnn.topK(corpus, idCol, vecCol, isQuery, dim, k)
    rungs += Rung("lsh_8x4_multiprobe", recallOf(lsh), lshScanned(),
      floatBytes, 0.0)

    val ivfCents = KMeans.fit(corpus, idCol, vecCol, k = 10, iters = 3)
    val ivfAssigned = corpus.withColumn("cluster",
      KMeans.assignExpr(col(vecCol), ivfCents))
    val ivfFlat = IvfAnn.topK(ivfAssigned, idCol, vecCol, "cluster", isQuery, k)
    rungs += Rung("ivf_flat_k10_np1", recallOf(ivfFlat),
      ivfScanned(ivfCents, 1), floatBytes, 0.0)

    val pqMdl = ProductQuantizer.fit(corpus, idCol, vecCol, dim, m = 8,
      ksub = 16, iters = 3)
    val pq = ProductQuantizer.topK(corpus, idCol, vecCol, isQuery, dim, k,
      model = Some(pqMdl))
    rungs += Rung("pq_m8", recallOf(pq), (n - 1).toDouble, 8.0,
      math.min(100.0, (n - 1).toDouble))

    val ivfpqMdl = ivfpqModel.getOrElse(IvfPq.fit(corpus, idCol, vecCol,
      dim, kCoarse = 16, coarseIters = 3, pqIters = 3))
    val ivfpq = IvfPq.topK(corpus, idCol, vecCol, isQuery, dim, k,
      nprobe = 8, model = Some(ivfpqMdl))
    val ivfpqScan = ivfScanned(ivfpqMdl.coarse, 8)
    rungs += Rung("ivfpq_c16_np8_m8", recallOf(ivfpq), ivfpqScan, 8.0,
      math.min(100.0, ivfpqScan))

    val adcMdl = ivfadcModel.getOrElse(IvfPq.fit(corpus, idCol, vecCol,
      dim, kCoarse = 16, coarseIters = 3, pqIters = 3, residual = true))
    val adc = IvfPq.topK(corpus, idCol, vecCol, isQuery, dim, k,
      nprobe = 8, model = Some(adcMdl))
    val adcScan = ivfScanned(adcMdl.coarse, 8)
    rungs += Rung("ivfadc_c16_np8_m8", recallOf(adc), adcScan, 8.0,
      math.min(100.0, adcScan))

    val int8 = ScalarQuant.topK(corpus, queries, idCol, vecCol, k)
    rungs += Rung("int8_of4", recallOf(int8), (n - 1).toDouble,
      dim + 8.0, math.min((k * 4).toDouble, (n - 1).toDouble))

    val bin = BinaryQuant.topK(corpus, queries, idCol, vecCol, dim, k)
    rungs += Rung("binary_of4", recallOf(bin), (n - 1).toDouble,
      dim / 8.0, math.min((k * 4).toDouble, (n - 1).toDouble))

    val mat = Matryoshka.topK(corpus, queries, idCol, vecCol,
      dPrefix = dim / 4, k = k)
    rungs += Rung(s"matryoshka_d${dim / 4}_of4", recallOf(mat),
      (n - 1).toDouble, dim.toDouble,
      math.min((k * 4).toDouble, (n - 1).toDouble))

    truth.unpersist(); corpus.unpersist()
    rungs.toSeq.zipWithIndex.map { case (r, i) =>
      val cost = r.scannedPerQuery * r.scanBytesPerVec +
        r.rescorePerQuery * floatBytes
      (i.toLong, r.method, r.recall, r.scannedPerQuery, r.scanBytesPerVec,
        r.rescorePerQuery, cost, n, nQ)
    }.toDF("rung", "method", "__rec", "__scan", "scan_bytes_per_vec",
        "rescore_per_query", "__cost", "corpus_n", "n_queries")
      .select(col("rung"), col("method"),
        roundStable(col("__rec"), digits).as("recall_at_k"),
        roundStable(col("__scan"), 2).as("scanned_per_query"),
        col("scan_bytes_per_vec"), col("rescore_per_query"),
        roundStable(col("__cost") / 1024.0, 2).as("cost_kb_per_query"),
        col("corpus_n"), col("n_queries"))
      .orderBy(col("rung"))
  }

  /** The ORACLE VIEW of the selection table (the q62 verdict discipline
    * for the ladder capstone): trained/hashed rungs' measured scan and
    * recall numbers are engine content, but every rung carries columns
    * a SQL oracle can assert —
    *
    *  - `rung` / `method` / `scan_bytes_per_vec` — configuration
    *    literals;
    *  - `corpus_n` / `n_queries` — exact counts recomputed by value;
    *  - `scanned_per_query` / `rescore_per_query` — EXACT BY
    *    CONSTRUCTION for the full-scan rungs (brute / PQ / int8 /
    *    binary / matryoshka scan n−1 and rescore min(overfetch·k, n−1));
    *    NULL for the probed/bucketed rungs (their scans are the
    *    engine-measured content the informative table reports);
    *  - `recall_ok` — brute force must read EXACTLY 1.0; every other
    *    rung clears a floor set WELL below its spec-measured value
    *    (AnnLadderSpec carries the tight floors);
    *  - `scan_pruned_ok` — full-scan rungs scanned exactly n−1; probed
    *    rungs scanned STRICTLY LESS (the prune actually fired).
    */
  def verdicts(table: DataFrame, k: Int = 5): DataFrame = {
    val full = col("method").isin("brute_force", "pq_m8", "int8_of4",
      "binary_of4") || col("method").startsWith("matryoshka")
    // floors ~half the spec-measured values (AnnLadderSpec holds the
    // tight ones); ivf_flat_k10_np1 has NO floor by design — on a
    // geometry-free corpus a 1-of-10-cell probe legitimately recalls
    // ~1/10, and its verdict weight is the scan prune instead
    val floor = when(col("method") === "lsh_8x4_multiprobe", 0.2)
      .when(col("method") === "pq_m8", 0.7)
      .when(col("method") === "ivfpq_c16_np8_m8", 0.5)
      .when(col("method") === "ivfadc_c16_np8_m8", 0.5)
      .when(col("method") === "int8_of4", 0.8)
      .when(col("method") === "binary_of4", 0.1)
      .when(col("method").startsWith("matryoshka"), 0.05)
      .otherwise(0.0)
    table.select(col("rung"), col("method"), col("scan_bytes_per_vec"),
      col("corpus_n"), col("n_queries"),
      when(full, col("scanned_per_query")).as("scanned_per_query"),
      when(full, col("rescore_per_query").cast("double"))
        .as("rescore_per_query"),
      when(col("method") === "brute_force", col("recall_at_k") === 1.0)
        .otherwise(col("recall_at_k") >= floor).cast("bigint")
        .as("recall_ok"),
      when(full, col("scanned_per_query") === (col("corpus_n") - 1)
        .cast("double"))
        .otherwise(col("scanned_per_query") <
          (col("corpus_n") - 1).cast("double")).cast("bigint")
        .as("scan_pruned_ok"))
  }

}
