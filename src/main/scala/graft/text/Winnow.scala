package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
  * SIGMOD 2003 — the MOSS algorithm): from each document's char
  * `k`-gram rolling hashes, select the minimum hash in every window of
  * `w` consecutive positions, ties to the RIGHTMOST position (a pure
  * per-window argmin — deterministic and stateless; the paper's
  * "robust" refinement additionally re-keeps the previous window's
  * pick across ties, trading fewer fingerprints on degenerate runs for
  * sequential state — same detection guarantee either way). The
  * selected set is the fingerprint, with the paper's two guarantees:
  * any shared substring
  * of length ≥ `k + w − 1` contributes at least one COMMON fingerprint
  * (detection), and no substring shorter than `k` does (noise floor) —
  * the principled density/recall dial the flat-shingle dedup family
  * (q33/q34/q90) doesn't have. Expected density ≈ 2/(w+1).
  *
  * Cross-engine hash: the gram hash is the first 10 hex chars of
  * `md5(gram)` read as an integer (40 bits — the q33 convention carried
  * to numeric form), so an oracle replays the SELECTION, not just the
  * counts. The (hash, rightmost-pos) argmin rides ONE packed int64 —
  * `hash · 2²⁰ + (2²⁰ − pos)` — so a plain `min` over the rows frame is
  * the whole selection: one explode (map-side), one keyed window, one
  * distinct. Docs longer than 2²⁰ chars would collide in the position
  * field; such rows are dropped with a documented guard (the packing
  * cap, far beyond the corpus contract).
  */
object Winnow {

  private val PosCap = 1L << 20

  /** The packed (hash, rightmost-tie) selection key for the gram at
    * 1-based `pos` of lowercased `text`.
    */
  private def packed(text: Column, pos: Column, k: Int): Column =
    conv(substring(md5(substring(text, pos, lit(k))), 1, 10), 16, 10)
      .cast("long") * PosCap + (lit(PosCap) - pos)

  /** Per-(doc, fingerprint) selection: `doc`, `fp_hash`, `fp_pos` —
    * one row per SELECTED gram. Join two documents' outputs on
    * `fp_hash` to find shared regions (the MOSS report).
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 8, w: Int = 4): DataFrame = {
    require(k >= 2 && w >= 2, s"need k >= 2 and w >= 2, got k=$k w=$w")
    val t = lower(col(textCol))
    // the per-position md5+conv below is the dominant cost and runs
    // BELOW the window exchange (Catalyst projects the packed hash
    // early) — i.e. in the scan task; spread an under-parallel scan so
    // it uses the cluster (guide §2.2; measured 4.4 s → 0.45 s warm)
    val grams = graft.Tables.spread(docs, idCol)
      .filter(length(t) >= k && length(t) < PosCap)
      .select(col(idCol).as("doc"),
        explode(sequence(lit(1), length(t) - (k - 1))).as("pos"),
        t.as("__t"))
    val wFrame = Window.partitionBy(col("doc")).orderBy(col("pos"))
      .rowsBetween(-(w - 1), Window.currentRow)
    grams
      .withColumn("__sel", min(packed(col("__t"), col("pos"), k)).over(wFrame))
      // full windows only: the first w-1 positions are warm-up
      .filter(col("pos") >= w)
      .select(col("doc"), col("__sel")).distinct()
      // decode with integer ops (shiftright, pmod) — a double division
      // would round above 2^53 and corrupt the hash
      .select(col("doc"),
        shiftright(col("__sel"), 20).as("fp_hash"),
        (lit(PosCap) - pmod(col("__sel"), lit(PosCap))).as("fp_pos"))
  }

  /** The MOSS report: document pairs ranked by how many DISTINCT
    * fingerprints they share — by the selection guarantee, any shared
    * run ≥ k+w−1 chars contributes here, so `n_shared` is a
    * plagiarism/boilerplate-overlap score with a provable floor.
    * Candidate generation is the q135 inverted-index discipline:
    * fingerprints seen in more than `maxDocFreq` docs are dropped
    * BEFORE the pair join (a universal header would otherwise
    * quadratically pair the corpus); the join then rides only the
    * discriminative sliver. Output both-directions-free (`doc_a <
    * doc_b`), filtered to `minShared`.
    */
  def sharedPairs(docs: DataFrame, idCol: String, textCol: String,
                  k: Int = 8, w: Int = 4, maxDocFreq: Long = 1000L,
                  minShared: Long = 2L): DataFrame = {
    val fp = fingerprints(docs, idCol, textCol, k, w)
      .select(col("doc"), col("fp_hash")).distinct()
    val rare = fp.groupBy(col("fp_hash"))
      .agg(countDistinct(col("doc")).as("__df"))
      .filter(col("__df") <= maxDocFreq)
    val indexed = fp.join(rare.select(col("fp_hash")), Seq("fp_hash"))
    indexed.as("x").join(indexed.as("y"), Seq("fp_hash"))
      .filter(col("x.doc") < col("y.doc"))
      .groupBy(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Per-doc fingerprint census: gram count, selected count, density
    * (≈ 2/(w+1) on random text — the paper's expected value; a sharp
    * deviation means degenerate/repetitive content).
    */
  def density(docs: DataFrame, idCol: String, textCol: String,
              k: Int = 8, w: Int = 4, digits: Int = 6): DataFrame = {
    val fp = fingerprints(docs, idCol, textCol, k, w)
      .groupBy(col("doc")).agg(count(lit(1)).as("n_fp"))
    val t = lower(col(textCol))
    docs
      .filter(length(t) >= k && length(t) < PosCap)
      .select(col(idCol).as("doc"),
        (length(t) - (k - 1)).cast("long").as("n_grams"))
      .join(fp, Seq("doc"))
      .select(col("doc"), col("n_grams"), col("n_fp"),
        graft.functions.roundStable(
          col("n_fp").cast("double") / greatest(col("n_grams") - (w - 1),
            lit(1L)), digits).as("fp_density"))
  }
}
