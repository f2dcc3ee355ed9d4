package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The choose-your-index selection table: structure, determinism,
  * measured recall floors, and cost sanity on the sf0.001 embeddings.
  */
class AnnLadderSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val table = sim.AnnLadder.selectionTable(
      Tables.embeddings(spark, sfDir), "vec_id", "embedding",
      dim = 64, isQuery = col("vec_id") < 10, k = 5)
    .collect().map(r => r.getString(1) ->
      (r.getDouble(2), r.getDouble(3), r.getDouble(6))).toMap

  test("one row per rung; brute force reads recall 1.0 at full scan cost") {
    assert(table.size == 9, s"rungs: ${table.keys.toSeq.sorted}")
    val (rec, scanned, _) = table("brute_force")
    assert(rec == 1.0)
    val n = Tables.embeddings(spark, sfDir).count()
    assert(scanned == (n - 1).toDouble)
  }

  test("recall floors hold at the registered settings (geometry-free corpus — the hard case)") {
    // floors from the per-method specs: PQ 0.90-0.94 measured (q52),
    // int8 >= 0.9 (q105), IVFPQ nprobe=8/16 >= 0.8 (q71). Binary and
    // matryoshka are the aggressive-compression rungs — the table's
    // JOB is to show where they land, so only sanity floors here.
    val floors = Seq("pq_m8" -> 0.85, "int8_of4" -> 0.9,
      "ivfpq_c16_np8_m8" -> 0.7, "ivfadc_c16_np8_m8" -> 0.7,
      "binary_of4" -> 0.3, "lsh_8x4_multiprobe" -> 0.3)
    for ((m, f) <- floors)
      assert(table(m)._1 >= f, s"$m recall ${table(m)._1} < floor $f")
  }

  test("cost decomposition is sane: probed rungs scan less than brute force; quantized rungs cost less per query") {
    val n1 = table("brute_force")._2
    assert(table("ivfpq_c16_np8_m8")._2 < n1, "8/16 probe must prune")
    assert(table("ivf_flat_k10_np1")._2 < n1 / 2, "1/10 cells must prune hard")
    // memory-traffic proxy: 8-byte PQ codes beat 256-byte floats even
    // after the 100-row exact rescore
    assert(table("pq_m8")._3 < table("brute_force")._3)
    assert(table("binary_of4")._3 < table("int8_of4")._3)
  }

  test("the table is deterministic (seeded trainers, tie-broken ranks)") {
    val again = sim.AnnLadder.selectionTable(
        Tables.embeddings(spark, sfDir), "vec_id", "embedding",
        dim = 64, isQuery = col("vec_id") < 10, k = 5)
      .collect().map(r => r.getString(1) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(6))).toMap
    assert(again == table, "replay must be bit-stable")
  }

  test("verdicts: all-1s on a healthy table; doctored recall/scan/brute rows fail their verdicts (the gate has teeth)") {
    import spark.implicits._
    // a healthy hand table: brute exact, one full-scan rung, one probed
    val healthy = Seq(
      (0L, "brute_force", 1.0, 99.0, 256.0, 0.0, 24.75, 100L, 10L),
      (3L, "pq_m8", 0.9, 99.0, 8.0, 99.0, 25.5, 100L, 10L),
      (4L, "ivfpq_c16_np8_m8", 0.8, 40.0, 8.0, 40.0, 10.3, 100L, 10L))
      .toDF("rung", "method", "recall_at_k", "scanned_per_query",
        "scan_bytes_per_vec", "rescore_per_query", "cost_kb_per_query",
        "corpus_n", "n_queries")
    val v = sim.AnnLadder.verdicts(healthy).collect()
      .map(r => r.getString(1) -> r).toMap
    assert(v.values.forall(r => r.getLong(7) == 1L && r.getLong(8) == 1L),
      s"healthy table reads all-1s: ${v.values.toSeq}")
    // full-scan rungs carry EXACT numbers; probed rungs carry NULLs
    assert(v("pq_m8").getDouble(5) == 99.0 && v("pq_m8").getDouble(6) == 99.0)
    assert(v("ivfpq_c16_np8_m8").isNullAt(5) &&
      v("ivfpq_c16_np8_m8").isNullAt(6))
    // doctored: brute recall 0.99 (not EXACTLY 1) must fail
    val badBrute = sim.AnnLadder.verdicts(healthy
      .withColumn("recall_at_k", when(col("method") === "brute_force", 0.99)
        .otherwise(col("recall_at_k")))).collect()
      .map(r => r.getString(1) -> r).toMap
    assert(badBrute("brute_force").getLong(7) == 0L, "brute != 1.0 fails")
    // doctored: pq recall below its 0.7 floor must fail
    val badPq = sim.AnnLadder.verdicts(healthy
      .withColumn("recall_at_k", when(col("method") === "pq_m8", 0.5)
        .otherwise(col("recall_at_k")))).collect()
      .map(r => r.getString(1) -> r).toMap
    assert(badPq("pq_m8").getLong(7) == 0L, "pq below floor fails")
    // doctored: a probed rung scanning the whole corpus must fail prune
    val badScan = sim.AnnLadder.verdicts(healthy
      .withColumn("scanned_per_query",
        when(col("method") === "ivfpq_c16_np8_m8", 99.0)
          .otherwise(col("scanned_per_query")))).collect()
      .map(r => r.getString(1) -> r).toMap
    assert(badScan("ivfpq_c16_np8_m8").getLong(8) == 0L,
      "unpruned probe fails")
    // doctored: a full-scan rung scanning less than n-1 must fail
    val badFull = sim.AnnLadder.verdicts(healthy
      .withColumn("scanned_per_query",
        when(col("method") === "pq_m8", 50.0)
          .otherwise(col("scanned_per_query")))).collect()
      .map(r => r.getString(1) -> r).toMap
    assert(badFull("pq_m8").getLong(8) == 0L, "short full scan fails")
  }
}
