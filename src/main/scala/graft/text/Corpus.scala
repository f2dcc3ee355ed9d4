package graft.text

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.roundStable

/** Corpus-preparation operators for LLM training-data pipelines:
  * repetition statistics (Gopher-style quality signals), temperature-
  * scaled domain mixing, sliding-window context chunking, benchmark
  * decontamination, and greedy sequence packing.
  *
  * Everything except `packGreedy` is pure Catalyst (split / sequence /
  * slice / explode + keyed aggregation) — codegen'd, partition-parallel,
  * no UDFs. `packGreedy` is inherently sequential per group (a fold over
  * an ordered stream), implemented with Spark's secondary-sort idiom:
  * repartition by group, sort within partitions, stream each partition
  * with O(1) state. See each method's scale note.
  *
  * Reference anchor: the reference pipeline cleans and summarizes a
  * sensor corpus (dag:162-253); these are the equivalent preparation
  * stages for a text corpus at 100 TB.
  */
object Corpus {

  import TextStats.tokens

  /** Per-document repetition signals (Gopher / C4 quality filtering):
    * the fraction of tokens covered by the single most-frequent bigram,
    * and the distinct-token ratio. Highly repetitive machine-generated
    * text scores high top-bigram fraction and low distinct ratio.
    *
    * Distributed shape: explode bigrams → count per (doc, bigram) →
    * max per doc. Two keyed shuffles with partial aggregation on both
    * — a 1 GB document costs its own tokens, never a driver trip.
    * Docs with fewer than 2 tokens emit no bigram and drop out
    * (mirrors the oracle's empty unnest).
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // The bigram is constructed AFTER exploding a position index, never
    // as a pre-built string array under the explode: Catalyst's
    // InferFiltersFromGenerate clones the generator child into a pushed
    // Filter, and a transform-of-concats child re-tokenizes the document
    // per lambda element there (no CSE inside higher-order functions) —
    // O(tokens²) splits per row, measured 50× slower on the bench
    // corpus. An int-sequence child keeps the inferred filter cheap.
    val toks = col("__toks")
    val base = docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), toks,
        size(toks).cast("long").as("n_toks"),
        size(array_distinct(toks)).cast("long").as("n_distinct"))
      .select(col(idCol), toks, col("n_toks"), col("n_distinct"),
        // sequence(1, 0) would count DOWN in Spark; guard short docs to
        // an empty array so explode drops them like the oracle's unnest
        explode(when(col("n_toks") >= 2,
          sequence(lit(1), col("n_toks").cast("int") - 1))
          .otherwise(array().cast("array<int>"))).as("__i"))
      .select(col(idCol), col("n_toks"), col("n_distinct"),
        concat_ws(" ", element_at(toks, col("__i")),
          element_at(toks, col("__i") + 1)).as("bg"))
    base
      .groupBy(col(idCol), col("n_toks"), col("n_distinct"), col("bg"))
      .count()
      .groupBy(col(idCol), col("n_toks"), col("n_distinct"))
      .agg(max("count").as("top_bigram_cnt"))
      .select(col(idCol), col("n_toks"),
        col("top_bigram_cnt"),
        roundStable(col("top_bigram_cnt") * lit(2.0) / col("n_toks"), 6)
          .as("top_bigram_frac"),
        roundStable(col("n_distinct").cast("double") / col("n_toks"), 6)
          .as("distinct_ratio"))
  }

  /** Temperature-scaled domain-mixing weights (the LLaMA / Pile recipe):
    * per-domain token share raised to `alpha` < 1 upweights small
    * domains, renormalized to sum to 1.
    *
    * Distributed shape: one keyed aggregation collapses the corpus to
    * #domains rows; the two normalization totals ride tiny broadcast
    * cross-joins over that already-aggregated result (never a window
    * over an unpartitioned corpus — #domains is small by definition,
    * the corpus is not). The aggregate is localCheckpoint'd so the
    * totals derive from the materialized #domains rows — Spark does not
    * reuse common subplans, and without the cut the corpus scan would
    * run once per appearance of `g` in the lineage (4× here).
    */
  def mixWeights(docs: DataFrame, domainCol: String, textCol: String,
                 alpha: Double): DataFrame = {
    val g = docs
      .groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(tokens(col(textCol))).cast("long")).as("n_toks"))
      .localCheckpoint()
    val tot = g.agg(sum("n_toks").as("tot_toks"))
    val shared = g.crossJoin(broadcast(tot))
      .withColumn("share", col("n_toks").cast("double") / col("tot_toks"))
      .withColumn("raw_w", pow(col("share"), lit(alpha)))
    val totW = shared.agg(sum("raw_w").as("tot_w"))
    shared.crossJoin(broadcast(totW))
      .select(col(domainCol), col("n_docs"), col("n_toks"),
        roundStable(col("share"), 6).as("share"),
        roundStable(col("raw_w") / col("tot_w"), 6).as("mix_weight"))
  }

  /** Sliding-window context chunking: split each document's token stream
    * into windows of `window` tokens advancing by `stride` (overlap =
    * window − stride), the standard packing-precursor for fixed-context
    * training. Emits one row per chunk with its token offset, length,
    * and an md5 content hash (the join key for chunk-level dedup).
    *
    * Narrow op — per-row sequence + explode + slice, no shuffle at all;
    * chunking 100 TB is a map-only pass.
    */
  def chunkWindows(docs: DataFrame, idCol: String, textCol: String,
                   window: Int, stride: Int): DataFrame = {
    require(stride > 0 && window >= stride,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = tokens(col(textCol))
    val nChunks = (ceil(greatest(size(toks) - window, lit(0)).cast("double") / stride) + 1)
      .cast("int")
    docs
      .select(col(idCol), toks.as("toks"), size(toks).as("n"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        (col("chunk_idx").cast("long") * stride).as("tok_start"),
        least(lit(window), col("n") - col("chunk_idx") * stride).cast("long")
          .as("n_chunk_toks"),
        md5(concat_ws(" ", slice(col("toks"), col("chunk_idx") * stride + 1, lit(window))))
          .as("chunk_hash"))
  }

  /** Benchmark decontamination: per corpus document, the count and
    * fraction of its distinct word `n`-gram shingles that also occur in
    * any benchmark document — the standard eval-overlap check run before
    * training. Documents shorter than `n` tokens have no shingle and
    * drop out (mirrors the oracle).
    *
    * Distributed shape: benchmark suites are bounded (MBs of distinct
    * shingles even for large eval sets), so the benchmark side is
    * broadcast and the corpus side never shuffles for the probe; the
    * only keyed exchange is the per-document count. A benchmark too big
    * to broadcast degrades gracefully to a shuffled join under AQE —
    * drop the hint at that point.
    */
  // position-explode, shingle built AFTER the Generate — same
  // InferFiltersFromGenerate trap as repetitionStats: a transform-of-
  // slices generator child gets cloned into a pushed Filter that
  // re-tokenizes per lambda element. Emitting raw (possibly duplicate)
  // shingle rows and deduplicating in the aggregation (count DISTINCT)
  // keeps the shuffle count at one and the per-row work linear.
  private def shingleRows(df: DataFrame, textCol: String, n: Int,
      cols: Column*): DataFrame = {
    val toks = col("__toks")
    df.select(cols :+ tokens(col(textCol)).as("__toks"): _*)
      .filter(size(toks) >= n)
      .select(cols :+ toks :+
        explode(sequence(lit(1), size(toks) - (n - 1))).as("__i"): _*)
      .select(cols :+ concat_ws(" ", slice(toks, col("__i"), lit(n))).as("sh"): _*)
  }

  /** Tokenizer fertility census per cohort (lang/source/domain) — the
    * numbers a tokenizer change is judged by before anyone retrains:
    * tokens per doc, chars per token (FERTILITY — how many pieces the
    * tokenizer shreds a character stream into; the cross-lingual
    * equity metric), and the type/token ratio (lexical diversity; a
    * collapsing TTR flags boilerplate/template floods the dedup family
    * then localizes). One explode + one aggregation per cohort —
    * exact distinct for the TTR (swap to HLL at 100 TB cohorts, the
    * B43 trade).
    */
  def fertility(docs: DataFrame, cohortCol: String, textCol: String,
                digits: Int = 6): DataFrame = {
    val toks = docs
      .select(col(cohortCol), explode(split(col(textCol), " ")).as("__tok"))
      .filter(col("__tok") =!= "")
    val perDoc = docs.groupBy(col(cohortCol))
      .agg(count(lit(1)).as("n_docs"))
    toks.groupBy(col(cohortCol))
      .agg(count(lit(1)).as("total_tokens"),
        countDistinct(col("__tok")).as("n_types"),
        sum(length(col("__tok"))).as("__chars"))
      .join(perDoc, Seq(cohortCol))
      .select(col(cohortCol), col("n_docs"), col("total_tokens"),
        col("n_types"),
        roundStable(col("total_tokens").cast("double") / col("n_docs"),
          digits).as("tokens_per_doc"),
        roundStable(col("__chars").cast("double") / col("total_tokens"),
          digits).as("chars_per_token"),
        roundStable(col("n_types").cast("double") / col("total_tokens"),
          digits).as("type_token_ratio"))
  }

  /** Per-token burstiness (Church & Gale 1995, as the population Fano
    * factor `var/mean` of per-document counts with absent-doc ZEROS
    * included): the signal that separates CONTENT words (bursty — a doc
    * either ignores "volcano" or says it five times) from FUNCTION
    * words (spread thin and even), which is the principled version of
    * a stopword list and the feature behind df-vs-cf term weighting.
    * Fano 0 = perfectly even (one occurrence in every doc), larger =
    * burstier; computed algebraically from (df, cf, Σc²) against the
    * cohort's total doc count so the zero rows NEVER materialize —
    * per-token state is three numbers, not N_docs counters.
    *
    * One explode + one (token) agg; `minDf` prunes the hapax tail
    * BEFORE the output (mirrored by the oracle — candidate semantics
    * shared, the q135 lesson). Vocabulary-sized output, key-partitioned
    * all the way.
    */
  def burstiness(docs: DataFrame, idCol: String, textCol: String,
                 minDf: Int = 3, digits: Int = 6): DataFrame = {
    require(minDf >= 1, s"need minDf >= 1, got $minDf")
    val perDoc = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).cast("double").as("__c"))
    val nDocs = docs.agg(count(lit(1)).cast("double").as("__nd"))
    val mean = col("__cf") / col("__nd")
    val fano = (col("__s2") / col("__nd") - mean * mean) / mean
    perDoc
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("df"),
        sum(col("__c")).cast("long").as("cf"),
        sum(col("__c") * col("__c")).as("__s2"))
      .filter(col("df") >= minDf)
      .crossJoin(broadcast(nDocs))
      .withColumn("__cf", col("cf").cast("double"))
      .select(col("tok"), col("df"), col("cf"),
        roundStable(fano, digits).as("fano"))
  }

  /** Heaps'-law vocabulary growth per cohort: checkpoints of
    * (cumulative tokens n, cumulative distinct types V) at every doc
    * boundary in `idCol` order, fit `V ≈ K·n^β` by log-log OLS — the
    * two numbers (β, K) that PREDICT how much new vocabulary the next
    * 10× of corpus will bring (tokenizer sizing, OOV budgeting) and
    * whose collapse (β → 0 early) flags a template-flooded feed the
    * dedup family then localizes. Typical natural text: β ≈ 0.4–0.6.
    *
    * Distributed shape: type-introduction counts come from ONE
    * `min(doc)` aggregation over distinct (cohort, token, doc) rows
    * (the [[novelty]] machinery pointed at the vocabulary axis — no
    * window over the corpus); both cumulative series then ride a
    * single keyed window over per-doc rows (#docs per cohort, already
    * reduced). The closing OLS uses EXPLICIT population moments, not
    * `olsTrend`'s `corr` — Spark's Corr divides by the y standard
    * deviation and THROWS under ANSI on a zero-variance cohort, and a
    * frozen vocabulary (the template flood this operator exists to
    * flag!) is exactly that case (the A44 lesson again): slope 0 with
    * NULL r2 is the correct, visible answer there. Single-checkpoint
    * cohorts (var x = 0) emit NULL slope/k/r2 with the count.
    */
  def heapsLaw(docs: DataFrame, cohortCol: String, idCol: String,
               textCol: String, digits: Int = 6): DataFrame = {
    val tokRows = docs
      .select(col(cohortCol), col(idCol).as("__d"),
        explode(tokens(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
    val perDoc = tokRows.groupBy(col(cohortCol), col("__d"))
      .agg(count(lit(1)).as("__nt"))
    val intro = tokRows
      .groupBy(col(cohortCol), col("tok"))
      .agg(min(col("__d")).as("__first"))
      .groupBy(col(cohortCol), col("__first").as("__d"))
      .agg(count(lit(1)).as("__nv"))
    val wCum = Window.partitionBy(col(cohortCol)).orderBy(col("__d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val checkpoints = perDoc
      .join(intro, Seq(cohortCol, "__d"), "left")
      .withColumn("__n", sum(col("__nt")).over(wCum))
      .withColumn("__v", sum(coalesce(col("__nv"), lit(0L))).over(wCum))
      .filter(col("__n") > 0 && col("__v") > 0)
    val pts = checkpoints
      .withColumn("__x", log(col("__n").cast("double")))
      .withColumn("__y", log(col("__v").cast("double")))
    val cxy = covar_pop(col("__y"), col("__x"))
    val vx = var_pop(col("__x"))
    val vy = var_pop(col("__y"))
    val slope = when(vx > 0, cxy / vx)
    pts.groupBy(col(cohortCol))
      .agg(
        roundStable(slope, digits).as("beta"),
        roundStable(exp(roundStable(
          avg(col("__y")) - slope * avg(col("__x")), digits)), digits)
          .as("k"),
        roundStable(when(vx > 0 && vy > 0, cxy * cxy / (vx * vy)), digits)
          .as("r2"),
        count(lit(1)).as("n_checkpoints"))
  }

  /** Token frequency-of-frequencies spectrum (the Good–Turing table):
    * for each occurrence count r, how many TYPES occur exactly r times
    * and what share of corpus MASS and VOCABULARY they carry — the
    * table smoothing estimators are built from (Good 1953) and the
    * corpus-health profile next to [[zipfSlope]]/[[heapsLaw]]: a
    * hapax share (r = 1) collapsing toward 0 flags template floods,
    * ballooning toward 1 flags OCR noise / tokenizer breakage. Two
    * aggregations (token counts → count-of-counts); the closing
    * windows ride O(#distinct r) rows — nothing corpus-scale after
    * the vocabulary agg.
    */
  def freqSpectrum(docs: DataFrame, textCol: String,
                   digits: Int = 6): DataFrame = {
    val counts = docs
      .select(explode(tokens(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("r"))
    val wAll = Window.partitionBy()
    counts
      .groupBy(col("r"))
      .agg(count(lit(1)).as("n_types"))
      .withColumn("__mass", sum(col("r") * col("n_types")).over(wAll))
      .withColumn("__v", sum(col("n_types")).over(wAll))
      .select(col("r"), col("n_types"),
        roundStable((col("r") * col("n_types")).cast("double") /
          col("__mass"), digits).as("mass_share"),
        roundStable(col("n_types").cast("double") / col("__v"), digits)
          .as("type_share"))
  }

  /** Corpus novelty per document — what fraction of a doc's distinct
    * word `n`-grams appear HERE FIRST (no earlier doc in `idCol` order
    * contains them): the curation signal between exact dedup (whole-doc)
    * and [[contamination]] (vs an external suite) — a feed whose
    * novelty curve collapses is re-crawling what the corpus already
    * holds, and near-boilerplate docs score ≈ 0 without matching any
    * single prior doc. First-occurrence is ONE `min(doc)` aggregation
    * over the corpus's distinct (doc, shingle) rows — no pairwise work,
    * no window over the corpus; the probe join rides the shingle
    * aggregation's own partitioning. Docs shorter than `n` tokens drop
    * (the [[contamination]] convention).
    */
  def novelty(docs: DataFrame, idCol: String, textCol: String,
              n: Int = 3, digits: Int = 6): DataFrame = {
    require(n >= 1, s"need n >= 1, got $n")
    val sh = shingleRows(docs, textCol, n, col(idCol))
      .select(col(idCol), col("sh")).distinct()
    val first = sh.groupBy(col("sh")).agg(min(col(idCol)).as("__first"))
    sh.join(first, Seq("sh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__first") === col(idCol), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col(idCol), col("n_shingles"), col("n_novel"),
        roundStable(col("n_novel").cast("double") / col("n_shingles"),
          digits).as("novelty_rate"))
  }

  def contamination(corpus: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"need n >= 1, got $n")
    val benchSh = shingleRows(bench, textCol, n).distinct()
      .withColumn("hit", lit(1))
    shingleRows(corpus, textCol, n, col(idCol))
      .join(broadcast(benchSh), Seq("sh"), "left")
      .groupBy(col(idCol))
      .agg(countDistinct(col("sh")).as("n_shingles"),
        countDistinct(when(col("hit") === 1, col("sh"))).as("n_hits"))
      .select(col(idCol), col("n_shingles"), col("n_hits"),
        roundStable(col("n_hits").cast("double") / col("n_shingles"), 6)
          .as("contamination"),
        (col("n_hits") > 0).as("contaminated"))
  }

  /** [[contamination]]'s 100 TB form: identical output, bloom-filter
    * scale path. The plain version broadcasts every distinct benchmark
    * shingle AS A STRING — fine for one benchmark slice, but a full
    * decontamination suite (MMLU + GSM8K + HumanEval + held-out dumps)
    * is easily 10⁷-10⁸ distinct shingles, a multi-GB broadcast that
    * kills executors before the corpus scan even starts. Here the bench
    * side compresses to a bloom filter over `xxhash64(shingle)`
    * (~16 bits/item ≈ 0.04% fpp — 20 MB for 10M shingles), the corpus
    * scan keeps only filter-positive shingle rows (map-only, codegen'd,
    * false NEGATIVES impossible so nothing contaminated escapes), and
    * only that sliver joins the real shingle set to kill false
    * positives exactly. Join volume drops from |corpus shingles| to
    * |true hits| + fpp·|corpus shingles|; the per-doc n_shingles count
    * shuffles the same rows either way. Output is bit-identical to
    * [[contamination]] — the filter only ever routes rows, never
    * decides membership.
    */
  def contaminationBloom(corpus: DataFrame, bench: DataFrame, idCol: String,
                         textCol: String, n: Int,
                         bitsPerItem: Int = 16): DataFrame =
    contaminationWith(benchFilter(bench, textCol, n, bitsPerItem),
      corpus, idCol, textCol)

  /** The precomputed benchmark side of [[contaminationBloom]]: the
    * serialized bloom filter plus the exact shingle set it summarizes.
    * Build ONCE and reuse across corpus slices or micro-batches (the
    * bench-side count + filter aggregation are bounded actions over the
    * benchmark, but there is no reason to repeat them per batch — see
    * [[graft.streaming.CleanStream]]). `persist = true` caches the exact
    * shingle set for repeated confirm joins; callers own the release
    * (`filter.release()`).
    */
  final case class BenchFilter private[text] (
      n: Int, nBench: Long, bloom: Array[Byte], shingles: DataFrame) {
    def release(): Unit = { shingles.unpersist(blocking = false); () }
  }

  def benchFilter(bench: DataFrame, textCol: String, n: Int,
                  bitsPerItem: Int = 16,
                  persist: Boolean = false): BenchFilter = {
    require(n >= 1, s"need n >= 1, got $n")
    val raw = shingleRows(bench, textCol, n).distinct()
    val benchSh = if (persist)
      raw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else raw
    // the small side's cardinality sizes the filter — one bounded action
    // over the bench slice, never the corpus
    val nBench = benchSh.count()
    val bf =
      if (nBench == 0) null
      else benchSh.select(graft.functions.Bloom.bloomFilterAgg(
          xxhash64(col("sh")), nBench, math.max(nBench * bitsPerItem, 64L)))
        .head().getAs[Array[Byte]](0)
    BenchFilter(n, nBench, bf, benchSh)
  }

  /** [[contaminationBloom]] with the benchmark side precomputed. */
  def contaminationWith(f: BenchFilter, corpus: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val corpusSh = shingleRows(corpus, textCol, f.n, col(idCol))
    val perDoc = corpusSh.groupBy(col(idCol))
      .agg(countDistinct(col("sh")).as("n_shingles"))
    val hitDoc =
      if (f.nBench == 0) null
      else corpusSh
        .filter(graft.functions.Bloom.mightContain(f.bloom, xxhash64(col("sh"))))
        .join(f.shingles, Seq("sh")) // exact confirm: false positives die here
        .groupBy(col(idCol)).agg(countDistinct(col("sh")).as("n_hits"))
    Option(hitDoc).fold(perDoc.withColumn("n_hits", lit(0L)))(
        perDoc.join(_, Seq(idCol), "left"))
      .select(col(idCol), col("n_shingles"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        roundStable(coalesce(col("n_hits"), lit(0L)).cast("double") /
          col("n_shingles"), 6).as("contamination"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** Deterministic weighted resampling to a target domain mix — the
    * step that APPLIES [[mixWeights]]: domain d's keep probability is
    * `targetFrac · N · w_d / n_d` (capped at 1), so the expected output
    * is `targetFrac · N` documents distributed by the temperature-scaled
    * weights. Selection reuses q82's multiplicative id hash as the
    * uniform variate — RNG-free, reproducible, and pure int64/double
    * arithmetic end to end, so the oracle replays the exact row set
    * (not just the expected proportions).
    *
    * Distributed shape: the #domains-row weight table broadcasts onto a
    * map-only corpus pass — no corpus shuffle at any scale.
    */
  def sampleToMix(docs: DataFrame, domainCol: String, idCol: String,
                  textCol: String, alpha: Double, targetFrac: Double): DataFrame = {
    require(targetFrac > 0 && targetFrac <= 1, s"targetFrac in (0,1], got $targetFrac")
    // mix_weight here is mixWeights' ROUNDED output, deliberately:
    // p_keep then derives from a value both engines agree on bit-for-bit
    // (the raw weight differs in the last ulp across summation orders,
    // which flips presentation rounding at 6-digit tie boundaries)
    val w = mixWeights(docs, domainCol, textCol, alpha)
      .select(col(domainCol), col("n_docs"), col("mix_weight"))
    val total = w.agg(sum("n_docs").as("n_total"))
    val withP = w.crossJoin(broadcast(total))
      .select(col(domainCol),
        least(lit(1.0), lit(targetFrac) * col("n_total") * col("mix_weight")
          / col("n_docs")).as("p_keep"))
    val u = idHash(col(idCol)).cast("double") / lit(2147483648.0)
    docs.join(broadcast(withP), Seq(domainCol))
      .filter(u < col("p_keep"))
      .select(col(idCol), col(domainCol), roundStable(col("p_keep"), 6).as("p_keep"))
  }

  /** Exact top-k most frequent tokens via sketch-then-verify — the
    * 100 TB replacement for `groupBy(token).count().orderBy(...)` when
    * the vocabulary itself is too large to shuffle comfortably:
    *
    *   pass 1: one scan folds every partition into a `capacity`-entry
    *     Misra-Gries summary ([[graft.functions.FreqSketchAgg]]); the
    *     merged candidate set provably contains every token with count
    *     > N/(capacity+1), and is at most `capacity` strings — bounded
    *     driver state by construction;
    *   pass 2: exact counts for ONLY the candidates (the `isin` filter
    *     cuts the aggregate's key space from |vocab| to ≤ capacity),
    *     deterministic total order (count desc, token asc), take k.
    *
    * The result is EXACT whenever the k-th true count exceeds the
    * sketch threshold N/(capacity+1) — size `capacity` accordingly
    * (e.g. 100× k). With a near-flat tail whose counts sit under the
    * threshold the tail of the list may differ from the exact ranking;
    * heavy hitters can never be missed.
    */
  def topKTokens(docs: DataFrame, textCol: String, k: Int, capacity: Int): DataFrame = {
    val toks = docs.select(explode(tokens(col(textCol))).as("tok"))
    val sketch = toks
      .agg(graft.functions.FreqSketchAgg.freqSketch(col("tok"), capacity).as("sk"))
      .select(explode(map_keys(col("sk"))).as("tok"))
      .collect().map(_.getString(0)).toSeq // ≤ capacity rows by contract
    toks.filter(col("tok").isInCollection(sketch))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(k)
  }

  /** PII redaction: mask emails, bare IPv4 addresses, and long digit
    * runs (phone-ish) with typed placeholders, and count the redactions
    * per document — the C4/CCNet-style scrub stage. Pure codegen'd
    * regexp expressions, map-only at any scale; patterns deliberately
    * use the conservative character-class subset that parses identically
    * in Java and RE2-family engines (the oracle runs them in DuckDB).
    */
  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pats = Seq(
      "[a-z0-9.]+@[a-z0-9.]+"                            -> "<email>",
      "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"                -> "<ip>",
      "[0-9][0-9-]{6,}[0-9]"                             -> "<phone>")
    val redacted = pats.foldLeft(col(textCol)) { case (c, (p, r)) =>
      regexp_replace(c, p, r)
    }
    val nRedactions = pats.map { case (p, _) => regexp_count(col(textCol), lit(p)) }
      .reduce(_ + _).cast("long")
    docs.select(col(idCol), redacted.as("clean_text"), nRedactions.as("n_redactions"))
  }

  /** Deterministic train/val/test assignment plus a stable shuffle key,
    * from one multiplicative integer hash of the document id (Knuth's
    * 2654435761 mod 2³¹) — no RNG state, reproducible on any engine,
    * and pure int64 arithmetic so the oracle replays it exactly. The
    * hash IS the shuffle order: a training loader sorts (or range-
    * partitions) by `h` to read its split in pseudo-random order
    * without materializing a permutation — deliberately NOT a
    * `row_number` rank, which would funnel the corpus through one
    * window task per split. Map-only at any scale.
    */
  /** Knuth's multiplicative hash, width-safe: the id is reduced mod 2³¹
    * BEFORE the multiply, so the product stays under 2⁶²·— int64-exact
    * for ANY id (the unreduced form overflows int64 above id ≈ 3.5e9:
    * a runtime ARITHMETIC_OVERFLOW under Spark's ANSI mode, and an
    * error in the oracle's BIGINT too, at exactly the 100 TB id scale).
    * For ids < 2³¹ the reduction is the identity, so values are
    * unchanged. Pure int64 arithmetic → engine-portable.
    */
  private[graft] def idHash(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(pmod(id.cast("long"), lit(2147483648L)) * lit(2654435761L), lit(2147483648L))

  def trainSplit(docs: DataFrame, idCol: String,
                 trainPct: Int = 8, valPct: Int = 1): DataFrame = {
    require(trainPct + valPct < 10, s"train+val must leave room for test")
    val h = idHash(col(idCol))
    docs
      .select(col(idCol), h.as("h"))
      .withColumn("split",
        when(col("h") % 10 < trainPct, "train")
          .when(col("h") % 10 < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** EXACT stratified train/val/test split: within every stratum the
    * train set is exactly `ceil(trainFrac·n)` rows (then val up to
    * `ceil((trainFrac+valFrac)·n)`, remainder test), selected by the
    * width-safe hash order — the per-stratum guarantee [[trainSplit]]
    * only hits in expectation, which matters for SMALL strata (a
    * 30-doc language can easily lose its whole val set to hash
    * variance). Deterministic and engine-replayable; `ceil` on an IEEE
    * double is bit-identical across engines. Cost of exactness: one
    * keyed window shuffle with a per-stratum sort (parallel ACROSS
    * strata; a stratum that dominates the corpus funnels into few
    * tasks — at that scale use [[trainSplit]], whose map-only split is
    * the in-expectation trade).
    */
  def stratifiedSplit(docs: DataFrame, stratumCol: String, idCol: String,
                      trainFrac: Double, valFrac: Double): DataFrame = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac < 1,
      s"need 0 < trainFrac and trainFrac + valFrac < 1, got $trainFrac/$valFrac")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(idHash(col(idCol)), col(idCol))
    val cw = Window.partitionBy(col(stratumCol))
    docs.select(col(idCol), col(stratumCol))
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(cw))
      .withColumn("split",
        when(col("rk") <= ceil(lit(trainFrac) * col("__n")), "train")
          .when(col("rk") <= ceil(lit(trainFrac + valFrac) * col("__n")), "val")
          .otherwise("test"))
      .drop("__n")
  }

  /** Deterministic per-domain quota sampling: keep at most
    * `maxPerDomain` documents of each domain, chosen by the width-safe
    * multiplicative hash order (then id) — a uniform pseudo-random
    * quota, reproducible on any engine, no RNG state. The cap is EXACT
    * per domain (unlike probabilistic `p_keep` sampling — see
    * [[sampleToMix]] — which only hits the target in expectation): the
    * head-of-corpus dedup recipe "no domain contributes more than N
    * docs". One keyed window shuffle; the quota cut is per-domain, so
    * no global sort or driver funnel at any scale.
    */
  def quotaSample(docs: DataFrame, domainCol: String, idCol: String,
                  maxPerDomain: Int): DataFrame = {
    require(maxPerDomain >= 1, s"need maxPerDomain >= 1, got $maxPerDomain")
    val w = Window.partitionBy(col(domainCol))
      .orderBy(idHash(col(idCol)), col(idCol))
    docs.select(col(idCol), col(domainCol))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= maxPerDomain)
  }

  /** Weighted sampling WITHOUT replacement per domain, k exact —
    * Efraimidis & Spirakis (IPL 2006): each row draws a uniform
    * `u ∈ (0,1)` and the k largest `u^(1/w)` are a weighted
    * without-replacement sample. Completes the sampling ladder:
    * [[sampleToMix]] is weighted but in-expectation, [[quotaSample]]
    * exact but unweighted — this one is both (heavier rows more likely,
    * never twice, exactly k per domain).
    *
    * Determinism/engine-portability: `u` derives from [[idHash]]
    * (+0.5 / 2³¹ keeps it strictly inside (0,1) — `ln 0` guarded by
    * construction), and the selection key is the MONOTONE-equivalent
    * log form `ln(u)/w` (no pow: less cross-engine fp wobble), ROUNDED
    * to 6dp before the rank cut with the id as tiebreak — the q94/q144
    * discipline, so the selected SET is engine-identical. One keyed
    * window shuffle; weights must be > 0 (enforced via filter — a
    * zero-weight row can never be sampled, matching the math: u^(1/w)
    * → 0).
    */
  def weightedSample(docs: DataFrame, domainCol: String, idCol: String,
                     weightCol: String, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val u = (idHash(col(idCol)).cast("double") + lit(0.5)) / lit(2147483648.0)
    val key = graft.functions.roundStable(
      log(u) / col(weightCol).cast("double"), 6)
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col("__es").desc, col(idCol))
    docs.filter(col(weightCol) > 0)
      .withColumn("__es", key)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .drop("__es")
  }

  /** Per-doc vocabulary coverage against the corpus's own top-`vocabSize`
    * tokens — the tokenizer-fit screen run BEFORE committing to a vocab:
    * a doc whose tokens mostly fall outside the candidate vocabulary
    * will shatter into bytes/unknowns at training time (OCR garbage,
    * wrong-language slivers, code in a prose corpus all surface here as
    * high OOV rate). Emits per doc: token count, OOV count, OOV rate,
    * distinct OOV types.
    *
    * The vocab is the top `vocabSize` tokens by corpus frequency with a
    * DETERMINISTIC boundary cut (count DESC, token ASC — the q94
    * tie-break discipline). One persisted token scan feeds both the
    * vocab aggregation and the scoring pass (the bigramLogProb recipe);
    * the scoring join BROADCASTS the vocab — unlike the full-vocabulary
    * LM models (never broadcast, they scale with the corpus), a top-K
    * cut is K rows by construction.
    */
  def vocabCoverage(docs: DataFrame, idCol: String, textCol: String,
                    vocabSize: Int, decimals: Int = 6): DataFrame = {
    require(vocabSize >= 1, s"need vocabSize >= 1, got $vocabSize")
    val toks = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("__tok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__tf"))
      .orderBy(col("__tf").desc, col("__tok"))
      .limit(vocabSize)
      .select(col("__tok"), lit(1).as("__in"))
    val out = toks
      .join(broadcast(vocab), Seq("__tok"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"),
        graft.functions.roundStable(
          sum(when(col("__in").isNull, 1.0).otherwise(0.0)) / count(lit(1)),
          decimals).as("oov_rate"),
        countDistinct(when(col("__in").isNull, col("__tok")))
          .as("n_oov_types"))
    out
  }

  /** WITHIN-doc repeated-chunk removal — the C4-style boilerplate strip
    * (nav bars, cookie banners, repeated headers paste the same block
    * many times into ONE page; cross-doc dedup never sees it): the doc
    * is cut into non-overlapping `window`-token chunks (the C29
    * chunking geometry at stride = window), every repeat of an
    * already-seen chunk TEXT is dropped (first occurrence kept, in
    * position order), and the survivors re-assemble in order. Emits
    * `clean_text`, total/dup chunk counts.
    *
    * Two keyed shuffles: first-occurrence detection partitions by
    * (doc, chunk) — within-doc, so a chunk repeated across a billion
    * docs never concentrates on one task (contrast C39, which chases
    * CROSS-doc spans and must key by chunk alone); the rebuild
    * aggregates by doc. Order is pinned by sorting (position, chunk)
    * structs — `collect_list` alone has NO ordering guarantee (the B34
    * lesson). The trailing partial chunk participates like any other.
    */
  def chunkDedup(docs: DataFrame, idCol: String, textCol: String,
                 window: Int): DataFrame = {
    require(window >= 1, s"need window >= 1, got $window")
    val toks = tokens(col(textCol))
    // split("", " ") = [""] — size >= 1 always, so the sequence upper
    // bound never drops below 0 (the descending-sequence trap)
    val nChunks = ceil(size(toks).cast("double") / window).cast("int")
    val chunks = docs
      .select(col(idCol), toks.as("__toks"),
        explode(sequence(lit(0), greatest(nChunks, lit(1)) - 1)).as("__ci"))
      .select(col(idCol), col("__ci"),
        concat_ws(" ",
          slice(col("__toks"), col("__ci") * window + 1, lit(window)))
          .as("__chunk"))
    val w = Window.partitionBy(col(idCol), col("__chunk"))
      .orderBy(col("__ci"))
    chunks.withColumn("__rn", row_number().over(w))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("__rn") > 1, 1L).otherwise(0L)).as("n_dup_chunks"),
        concat_ws(" ", transform(
          array_sort(collect_list(
            when(col("__rn") === 1, struct(col("__ci"), col("__chunk"))))),
          s => s.getField("__chunk"))).as("clean_text"))
  }

  /** Deterministic k-fold assignment — the cross-validation corner of
    * the split family ([[trainSplit]] fixed fractions,
    * [[stratifiedSplit]] exact per-stratum, this: k rotating
    * hold-outs): fold = width-safe multiplicative hash of the id mod
    * k. Map-only, RNG-free, engine-replayable, stable under
    * repartition and across runs — the property sklearn's shuffled
    * KFold does NOT give you on a distributed rerun. Fold sizes are
    * in-expectation n/k (hash variance; use [[stratifiedSplit]]-style
    * exact cuts when a fold must be exact).
    */
  def kFold(docs: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    docs.withColumn("fold", (idHash(col(idCol)) % k).cast("long"))
  }

  /** Deterministic per-epoch corpus reshuffle: each epoch `e` induces a
    * fresh pseudo-random total order and a balanced shard assignment
    * from ONE epoch-salted multiplicative hash — `h` is the order key,
    * `shard = h mod numShards` the placement. No RNG state, no
    * materialized permutation, and deliberately no global `row_number`
    * (that rank would funnel 100 TB through one window task): a loader
    * reads shard `s` sorted by `h` and gets its slice of the epoch-`e`
    * permutation, reproducibly on any engine — the hash is pure int64
    * arithmetic (width-safe like [[idHash]]: the id is reduced mod 2³¹
    * before the multiply, the epoch salt rides inside the final mod),
    * so the oracle replays it exactly. Map-only at any scale; epochs
    * differ (spec-asserted) because the salt shifts every hash by
    * `e·2246822519 mod 2³¹`, which composes with the multiply into a
    * different permutation of the id space, not a rotation of ranks.
    */
  def epochShuffle(docs: DataFrame, idCol: String, epoch: Int,
                   numShards: Int): DataFrame = {
    val h = epochHash(col(idCol), epoch, numShards)
    docs.select(col(idCol), h.as("h"),
        pmod(h, lit(numShards.toLong)).cast("int").as("shard"))
  }

  // reduced id ≤ 2³¹−1, so the product stays < 2⁶²·5 and the epoch
  // term (≤ 2³¹·epoch) cannot overflow int64 for any sane epoch count
  private def epochHash(id: Column, epoch: Int, numShards: Int): Column = {
    require(epoch >= 0, s"need epoch >= 0, got $epoch")
    require(numShards > 0, s"need numShards > 0, got $numShards")
    pmod(
      pmod(id.cast("long"), lit(2147483648L)) * lit(2654435761L)
        + lit(epoch.toLong) * lit(2246822519L),
      lit(2147483648L))
  }

  /** Land one epoch's shuffle as shard-partitioned parquet: every row of
    * `docs` (all columns) goes to `path/shard=<s>/`, each shard written
    * by the task that owns it and internally SORTED by the epoch hash —
    * so a training loader streams `shard=s` file order and reads its
    * slice of the epoch permutation with zero further sorting. One
    * shuffle (repartition on shard) + a per-partition sort; file count
    * is O(numShards), not O(tasks × shards).
    */
  def writeShards(docs: DataFrame, idCol: String, epoch: Int,
                  numShards: Int, path: String): Unit = {
    val h = epochHash(col(idCol), epoch, numShards)
    docs.withColumn("h", h)
      .withColumn("shard", pmod(h, lit(numShards.toLong)).cast("int"))
      .repartition(numShards, col("shard"))
      .sortWithinPartitions("shard", "h", idCol)
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }

  /** Greedy sequence packing: fold documents (ordered by `idCol` within
    * each `partCol` group) into bins of at most `capacity` tokens; a
    * document that would overflow the open bin starts the next one, and
    * an oversized document (> capacity tokens) gets a bin of its own.
    * This is the deterministic streaming half of training-batch packing
    * — bin_fill is the running occupancy, so feeding bins to a writer
    * needs no second pass.
    *
    * A greedy fold is inherently sequential per group — no window frame
    * expresses "running sum that resets on overflow" — so this is the
    * one place in the text stack that leaves pure Catalyst: Spark's
    * secondary-sort idiom (repartition by group, sort within partitions,
    * stream each partition with O(1) state, state resets on group
    * change). Each task streams its groups without materializing them;
    * scale across groups is free, scale WITHIN one group is bounded by
    * single-task throughput, which is what an order-dependent fold means
    * — shard the group key (e.g. (lang, shard)) if one domain dominates.
    */
  /** Cross-document repeated-substring spans — the span-level complement
    * of document near-dup removal (dedup at the granularity "this
    * paragraph is boilerplate shared by many pages", the signal document
    * MinHash misses when the surrounding text differs). A token `k`-gram
    * occurring in at least `minDocs` DISTINCT documents marks its
    * position duplicated; runs of consecutive duplicated positions merge
    * into maximal spans. Output: one row per (document, span) with
    * 0-based token offsets — `span_start`, `span_end` (last shingle
    * start) and `tok_len` = span_end − span_start + k covered tokens.
    *
    * Distributed shape: position-explode (shingle built AFTER the
    * Generate — the InferFiltersFromGenerate trap, see
    * [[repetitionStats]]) → one aggregation keyed by shingle to find
    * duplicated grams → co-partitioned join back (same key, exchange
    * aligned) → per-document island merge (pos − row_number, one keyed
    * window + aggregation). Nothing touches the driver; the heavy
    * shingle exchange carries (key, id, pos) only, never document text.
    *
    * `hashKeys=true` (the scale default) exchanges 8-byte xxhash64 keys
    * instead of k-token strings — at 100 TB the shuffle shrinks ~10×
    * and a 2⁻⁶⁴ collision can only over-mark one position as duplicated,
    * a span off-by-k, not a correctness cliff. Text keys are for
    * engine-portable comparison (the q90 oracle); the spec pins both
    * key modes to identical spans.
    */
  def substringSpans(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 8, minDocs: Int = 2,
                     hashKeys: Boolean = true): DataFrame = {
    require(k >= 1 && minDocs >= 2, s"need k >= 1, minDocs >= 2, got k=$k minDocs=$minDocs")
    val toks = col("__toks")
    // the positioned shingle rows feed BOTH the duplicated-gram
    // aggregation and the join probe — persist once or the corpus is
    // scanned and re-shingled twice (the similarPairs lifecycle: persist
    // the index, checkpoint the small result, release)
    val sh = docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .filter(size(toks) >= k)
      .select(col(idCol), toks,
        explode(sequence(lit(0), size(toks) - k)).as("pos"))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        { val g = concat_ws(" ", slice(toks, col("pos") + 1, lit(k)))
          (if (hashKeys) xxhash64(g) else g).as("sh") })
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = spansPlan(sh, idCol, k, minDocs).localCheckpoint()
    sh.unpersist()
    out
  }

  /** The span pipeline from positioned shingle rows — exposed separately
    * so the plan spec can fingerprint it BEFORE the materializing
    * checkpoint hides it behind a LogicalRDD scan (the [[graft.dedup
    * .MinHashLsh.pairsPlan]] discipline).
    */
  private[graft] def spansPlan(sh: DataFrame, idCol: String, k: Int,
                               minDocs: Int): DataFrame = {
    val dup = sh.groupBy(col("sh"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("sh"))
    val marked = sh.join(dup, Seq("sh"), "left_semi")
    val wDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    marked
      .withColumn("__grp", col("pos") - row_number().over(wDoc))
      .groupBy(col(idCol), col("__grp"))
      .agg(min(col("pos")).as("span_start"), max(col("pos")).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + k).as("tok_len"))
  }

  /** Unigram log-probability quality score (the cheap stand-in for the
    * CCNet/LLaMA LM-perplexity filter, trained on the corpus itself):
    * per-token corpus frequency → per-document mean log p(token).
    * Machine-generated gibberish and OCR noise sit in the far-low tail;
    * boilerplate sits unusually HIGH — both ends are filter targets.
    *
    * Distributed shape: one aggregation builds the unigram table, the
    * corpus tokens join it BY TOKEN (a keyed shuffle — the vocabulary of
    * a 100 TB corpus does not broadcast), then one per-doc aggregation.
    * Smoothing: unseen tokens cannot occur (the model is the corpus), so
    * no backoff is needed; `logprob` is exact, not estimated.
    */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // token rows feed the unigram build AND the scoring join — persist
    // once (similarPairs lifecycle); the corpus total rides the unigram
    // table (sum of term frequencies), never a second corpus scan
    val toks = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tf = toks.groupBy(col("tok"))
      .agg(count(lit(1)).cast("double").as("__tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = tf.agg(sum(col("__tf"))).head().getDouble(0)
    val lm = tf.select(col("tok"), log(col("__tf") / total).as("__lp"))
    val out = toks.join(lm, Seq("tok"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"),
        roundStable(avg(col("__lp")), 6).as("mean_logprob"))
      .localCheckpoint()
    tf.unpersist()
    toks.unpersist()
    out
  }

  /** Lexical-diversity stats per document: token count, type count,
    * type-token ratio, and unigram Shannon entropy (nats) of the doc's
    * own token distribution. Keyword-stuffed spam and template boiler-
    * plate sit low on both TTR and entropy; natural prose sits high —
    * a standard quality-filter axis next to [[unigramLogProb]]'s
    * corpus-level fluency (this one needs no model: each doc is scored
    * against itself, so the pass is fully parallel).
    *
    * Entropy via the log-sum identity `H = ln L − (Σ c·ln c)/L` — one
    * (doc, token) count agg then one per-doc agg, both keyed shuffles;
    * nothing corpus-global anywhere.
    */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).cast("double").as("__c"))
      .groupBy(col(idCol))
      .agg(
        sum(col("__c")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_types"),
        roundStable(count(lit(1)) / sum(col("__c")), 6).as("ttr"),
        roundStable(
          log(sum(col("__c"))) - sum(col("__c") * log(col("__c"))) / sum(col("__c")),
          6).as("entropy"))

  /** Zipf-law fit per corpus slice: OLS slope of ln(freq) on ln(rank)
    * over the slice's token frequency table (natural language sits near
    * −1; machine-generated or template-heavy slices bend away) — a
    * corpus-health check over the same unigram counts the LM passes
    * build. Rank is dense by (count desc, token) so the fit is
    * deterministic under ties.
    *
    * Shape: one (slice, token) count agg — per-slice state is O(vocab) —
    * one keyed window for the rank, then [[graft.etl.Aggregates.olsTrend]]'s
    * single-pass moment aggregation. Nothing corpus-global.
    */
  def zipfSlope(docs: DataFrame, sliceCol: String, textCol: String): DataFrame = {
    val counts = docs
      .select(col(sliceCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(sliceCol), col("tok"))
      .agg(count(lit(1)).cast("double").as("freq"))
    val w = Window.partitionBy(col(sliceCol))
      .orderBy(col("freq").desc, col("tok"))
    val ranked = counts.withColumn("rank", row_number().over(w))
    graft.etl.Aggregates.olsTrend(ranked, Seq(sliceCol),
      xCol = log(col("rank")), yCol = log(col("freq")))
  }

  def packGreedy(docs: DataFrame, partCol: String, idCol: String,
                 textCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, s"need capacity > 0, got $capacity")
    val sized = docs.select(
      col(partCol).cast("string").as("part"),
      col(idCol).cast("long").as("id"),
      size(tokens(col(textCol))).cast("long").as("n_toks"))
    sized
      .repartition(col("part"))
      .sortWithinPartitions("part", "id")
      .as(Encoders.product[(String, Long, Long)])
      .mapPartitions { rows =>
        // deserialization is a narrow map — the within-partition sort
        // survives into this iterator; state resets on group change
        var curPart: String = null
        var bin = 0L
        var fill = 0L
        rows.map { case (part, id, n) =>
          if (part != curPart) { curPart = part; bin = 0L; fill = n }
          else if (fill + n > capacity) { bin += 1L; fill = n }
          else fill += n
          (part, id, n, bin, fill)
        }
      }(Encoders.product[(String, Long, Long, Long, Long)])
      .toDF(partCol, idCol, "n_toks", "bin_id", "bin_fill")
  }

  /** Adjacent-bigram rows (doc, w1, w2) — zero-shuffle: the pair list
    * is built INSIDE the token array (`zip_with` over two slices), so
    * no per-doc window/sort ever runs. Docs with < 2 tokens emit
    * nothing.
    */
  private def bigramRows(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    // n-gram explode + map-side count partials run in the scan task —
    // spread an under-parallel scan first (guide §2.2)
    graft.Tables.spread(docs, idCol)
      .select(col(idCol), tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col(idCol), explode(zip_with(
        slice(col("__t"), lit(1), size(col("__t")) - 1),
        slice(col("__t"), lit(2), size(col("__t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("__bg"))
      .select(col(idCol), col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))

  /** Collocation mining: PMI / NPMI of adjacent token pairs across the
    * corpus — the classic "new york"-detector feeding tokenizer-merge
    * and phrase-vocabulary decisions. p(w) over ALL tokens, p(w1,w2)
    * over adjacent pairs; pairs below `minCount` are noise and dropped
    * AFTER counting (their occurrences still shape the totals).
    *
    * Scale shape: bigrams are built in-array (no window), counts are
    * keyed aggregations with map-side partials, and the unigram model
    * joins back BY TOKEN — two keyed joins, nothing broadcast, no
    * driver state beyond the two scalar totals.
    */
  def collocations(docs: DataFrame, idCol: String, textCol: String,
                   minCount: Long = 5): DataFrame = {
    val toks = docs.select(explode(tokens(col(textCol))).as("tok"))
    val uni = toks.groupBy(col("tok"))
      .agg(count(lit(1)).cast("double").as("__c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = uni.agg(sum(col("__c"))).head().getDouble(0)
    val bg = bigramRows(docs, idCol, textCol)
    val big = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBigrams = big.agg(sum(col("n"))).head().getLong(0).toDouble
    val p12 = col("n") / nBigrams
    val pmi = log(p12 / (col("__c1") / total) / (col("__c2") / total))
    val out = big
      .filter(col("n") >= minCount)
      .join(uni.select(col("tok").as("w1"), col("__c").as("__c1")), Seq("w1"))
      .join(uni.select(col("tok").as("w2"), col("__c").as("__c2")), Seq("w2"))
      .select(col("w1"), col("w2"), col("n"),
        roundStable(pmi, 6).as("pmi"),
        roundStable(pmi / -log(p12), 6).as("npmi"))
      .localCheckpoint()
    big.unpersist(); uni.unpersist()
    out
  }

  /** Add-k smoothed bigram language-model score per document: mean
    * ln p(w2|w1) over the doc's adjacent pairs, the model trained on
    * the corpus itself — one step up from [[unigramLogProb]] toward the
    * CCNet-style perplexity filter. p(w2|w1) = (c(w1,w2)+k) /
    * (c(w1·)+k·V), V = corpus vocabulary size.
    *
    * Same scale contract as [[unigramLogProb]]: the bigram table joins
    * the corpus BY PAIR KEY and the predecessor counts BY TOKEN — a
    * 100 TB corpus's model never broadcasts; only V and nothing else
    * reaches the driver. Docs with < 2 tokens have no bigram and drop
    * out (mirrors the oracle).
    */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String,
                    k: Double = 1.0): DataFrame = {
    val bg = bigramRows(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = docs.select(explode(tokens(col(textCol))).as("tok"))
      .agg(countDistinct(col("tok"))).head().getLong(0).toDouble
    val c12 = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).cast("double").as("__c12"))
    val c1 = bg.groupBy(col("w1"))
      .agg(count(lit(1)).cast("double").as("__c1"))
    val lm = c12.join(c1, Seq("w1"))
      .select(col("w1"), col("w2"),
        log((col("__c12") + k) / (col("__c1") + k * vocab)).as("__lp"))
    val out = bg.join(lm, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        roundStable(avg(col("__lp")), 6).as("mean_logprob"))
      .localCheckpoint()
    bg.unpersist()
    out
  }

  /** Interpolated Kneser–Ney bigram LM score per document (Kneser & Ney
    * 1995; Chen & Goodman 1999's interpolated form with fixed discount
    * D) — the smoothing KenLM uses, i.e. the ACTUAL arithmetic behind
    * CCNet-style perplexity filtering, where [[bigramLogProb]]'s add-k
    * is the classroom stand-in: add-k over-penalizes unseen pairs of
    * frequent words, KN backs off to CONTINUATION probability (how many
    * distinct contexts a word follows — "francisco" is frequent but
    * follows almost nothing, so it backs off near zero; that asymmetry
    * is the whole trick).
    *
    * `p(w|v) = (max(c(vw)−D, 0) + D·N₁₊(v·)·p_cont(w)) / c(v·)`,
    * `p_cont(w) = N₁₊(·w) / |bigram types|`, D = 0.75.
    *
    * Same scale contract as [[bigramLogProb]]: every model table joins
    * by token/pair key (nothing broadcasts); only the scalar bigram-type
    * count reaches the driver. Docs with < 2 tokens drop out.
    */
  def knBigramLogProb(docs: DataFrame, idCol: String, textCol: String,
                      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, s"need 0 < D < 1, got $discount")
    val bg = bigramRows(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c12 = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).cast("double").as("__c12"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // B = distinct bigram types — the one scalar (bounded collect)
    val b = c12.count().toDouble
    // unigram-prefix totals from the distinct-bigram table, not the
    // instance table (same exact values — see knTrigramLogProb)
    val c1 = c12.groupBy(col("w1"))
      .agg(sum(col("__c12")).as("__c1"),
        count(lit(1)).cast("double").as("__n1f"))
    val pc = c12.groupBy(col("w2"))
      .agg(count(lit(1)).cast("double").as("__n1r"))
    val lm = c12.join(c1, Seq("w1")).join(pc, Seq("w2"))
      .select(col("w1"), col("w2"),
        log((greatest(col("__c12") - discount, lit(0.0)) +
          lit(discount) * col("__n1f") * (col("__n1r") / b)) / col("__c1"))
          .as("__lp"))
    val out = bg.join(lm, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        roundStable(avg(col("__lp")), 6).as("mean_kn_logprob"))
      .localCheckpoint()
    c12.unpersist(); bg.unpersist()
    out
  }

  /** Adjacent-trigram rows (doc, w1, w2, w3) — the in-array zip of
    * [[bigramRows]] extended one slot: no per-doc window/sort. Docs with
    * < 3 tokens emit nothing.
    */
  private def trigramRows(docs: DataFrame, idCol: String,
                          textCol: String): DataFrame =
    // see bigramRows: spread an under-parallel scan (guide §2.2)
    graft.Tables.spread(docs, idCol)
      .select(col(idCol), tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= 3)
      .select(col(idCol), explode(zip_with(
        slice(col("__t"), lit(1), size(col("__t")) - 2),
        zip_with(
          slice(col("__t"), lit(2), size(col("__t")) - 2),
          slice(col("__t"), lit(3), size(col("__t")) - 2),
          (b, c) => struct(b.as("w2"), c.as("w3"))),
        (a, bc) => struct(a.as("w1"), bc.getField("w2").as("w2"),
          bc.getField("w3").as("w3")))).as("__tg"))
      .select(col(idCol), col("__tg.w1").as("w1"), col("__tg.w2").as("w2"),
        col("__tg.w3").as("w3"))

  /** The Chen–Goodman discount estimate `D = n₁ / (n₁ + 2 n₂)` from a
    * count-of-counts pair — the per-order discount interpolated KN uses
    * when it stops hardcoding 0.75 (Chen & Goodman 1999 eq. 26, from
    * the leave-one-out bound of Ney, Essen & Kneser 1994).
    *
    * A corpus with NO singletons at this order (every n-gram repeats —
    * small vocabularies, heavily duplicated corpora; the sf0.1
    * synthetic documents hit this at the trigram order) leaves the
    * estimate undefined (0/2n₂) — fall back to the fixed D = 0.75 the
    * bigram rung uses (KenLM refuses such corpora outright; SRILM falls
    * back similarly). Deterministic either way, and the oracle
    * replicates the exact CASE.
    */
  private[graft] def knDiscount(n1: Long, n2: Long,
                                fallback: Double = 0.75): Double =
    if (n1 == 0) fallback
    else n1.toDouble / (n1.toDouble + 2.0 * n2.toDouble)

  /** Interpolated Kneser–Ney TRIGRAM LM score per document with
    * ESTIMATED per-order discounts — the CCNet-class filter proper
    * ([[knBigramLogProb]] is the bigram rung with fixed D = 0.75):
    *
    *  - top order (raw counts):
    *    `p(w₃|w₁w₂) = (max(c(w₁w₂w₃)−D₃,0) + D₃·N₁₊(w₁w₂·)·p(w₃|w₂)) / c(w₁w₂·)`
    *  - middle order (CONTINUATION counts — Kneser-Ney's trick applied
    *    one level down: the bigram model is estimated from how many
    *    distinct contexts each bigram completes, not raw frequency):
    *    `p(w₃|w₂) = (max(N₁₊(·w₂w₃)−D₂,0) + D₂·N₁₊(w₂·)·p_cont(w₃)) / N₁₊(·w₂·)`
    *  - lowest: `p_cont(w₃) = N₁₊(·w₃) / |distinct (w₂,w₃) types|`
    *
    * with `D₃`/`D₂` estimated per order as `n₁/(n₁+2n₂)` over that
    * order's count-of-counts ([[knDiscount]]) — no tuning constants.
    * The estimated discounts ride every output row (corpus constants,
    * rounded) so the oracle recomputes them by value.
    *
    * Scale contract unchanged from [[knBigramLogProb]]: every model
    * table joins by token/prefix key (nothing broadcasts); the driver
    * collects exactly three scalars (D₃, D₂, the type total) — bounded
    * by construction. Docs with < 3 tokens drop out (mirrors the
    * oracle).
    */
  def knTrigramLogProb(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val tri = trigramRows(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c3 = tri.groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).cast("double").as("__c3"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val d3r = c3.agg(
      sum(when(col("__c3") === 1.0, 1L).otherwise(0L)).as("n1"),
      sum(when(col("__c3") === 2.0, 1L).otherwise(0L)).as("n2")).head()
    val d3 = knDiscount(d3r.getLong(0), d3r.getLong(1))
    // prefix totals from the DISTINCT-trigram table, not the instance
    // table: Σ c(w1w2·) = sum of c3 counts and N₁₊(w1w2·) = c3 row count
    // per (w1,w2) — exactly the old count/countDistinct over `tri`, but
    // aggregating |types| rows instead of re-shuffling |tokens| rows
    // (guide §2.3: aggregate before you shuffle; counts are integers in
    // doubles, so the sums are exact)
    val cp = c3.groupBy(col("w1"), col("w2"))
      .agg(sum(col("__c3")).as("__cp"),
        count(lit(1)).cast("double").as("__n1f3"))
    val cont2 = c3.groupBy(col("w2"), col("w3"))
      .agg(count(lit(1)).cast("double").as("__n2c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val d2r = cont2.agg(
      sum(when(col("__n2c") === 1.0, 1L).otherwise(0L)).as("n1"),
      sum(when(col("__n2c") === 2.0, 1L).otherwise(0L)).as("n2")).head()
    val d2 = knDiscount(d2r.getLong(0), d2r.getLong(1))
    val mid = cont2.groupBy(col("w2"))
      .agg(sum(col("__n2c")).as("__den2"),
        count(lit(1)).cast("double").as("__n1f2"))
    val uniCont = cont2.groupBy(col("w3"))
      .agg(count(lit(1)).cast("double").as("__n1r"))
    val btot = cont2.count().toDouble
    val pMid = (greatest(col("__n2c") - d2, lit(0.0)) +
      lit(d2) * col("__n1f2") * (col("__n1r") / btot)) / col("__den2")
    val lm = c3.join(cp, Seq("w1", "w2")).join(cont2, Seq("w2", "w3"))
      .join(mid, Seq("w2")).join(uniCont, Seq("w3"))
      .select(col("w1"), col("w2"), col("w3"),
        log((greatest(col("__c3") - d3, lit(0.0)) +
          lit(d3) * col("__n1f3") * pMid) / col("__cp")).as("__lp"))
    val out = tri.join(lm, Seq("w1", "w2", "w3"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"),
        roundStable(avg(col("__lp")), 6).as("mean_kn_logprob"))
      .withColumn("discount_hi", lit(math.floor(d3 * 1e6 + 0.5) / 1e6))
      .withColumn("discount_mid", lit(math.floor(d2 * 1e6 + 0.5) / 1e6))
      .localCheckpoint()
    cont2.unpersist(); c3.unpersist(); tri.unpersist()
    out
  }

  /** Adjacent-fourgram rows (doc, w1..w4) — [[trigramRows]] extended one
    * slot by the same in-array zip. Docs with < 4 tokens emit nothing.
    */
  private def fourgramRows(docs: DataFrame, idCol: String,
                           textCol: String): DataFrame =
    // see bigramRows: spread an under-parallel scan (guide §2.2)
    graft.Tables.spread(docs, idCol)
      .select(col(idCol), tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= 4)
      .select(col(idCol), explode(zip_with(
        slice(col("__t"), lit(1), size(col("__t")) - 3),
        zip_with(
          slice(col("__t"), lit(2), size(col("__t")) - 3),
          zip_with(
            slice(col("__t"), lit(3), size(col("__t")) - 3),
            slice(col("__t"), lit(4), size(col("__t")) - 3),
            (c, d) => struct(c.as("w3"), d.as("w4"))),
          (b, cd) => struct(b.as("w2"), cd.getField("w3").as("w3"),
            cd.getField("w4").as("w4"))),
        (a, bcd) => struct(a.as("w1"), bcd.getField("w2").as("w2"),
          bcd.getField("w3").as("w3"), bcd.getField("w4").as("w4"))))
        .as("__qg"))
      .select(col(idCol), col("__qg.w1").as("w1"), col("__qg.w2").as("w2"),
        col("__qg.w3").as("w3"), col("__qg.w4").as("w4"))

  /** Interpolated Kneser–Ney FOURGRAM LM score per document — the
    * [[knTrigramLogProb]] cascade extended one order (r15, built
    * MEASURED-FIRST: the feared no-singleton cliff at n=4 does not
    * exist on these corpora — count-of-counts measured n₁=23187/22679/
    * 172136 at sf0.001/0.01/0.1, estimated D₄ ≈ 0.89/0.89/0.72 — so
    * the estimated-discount rung is real, not a fallback shell):
    *
    *  - top order (raw counts):
    *    `p(w₄|w₁w₂w₃) = (max(c(w₁w₂w₃w₄)−D₄,0) + D₄·N₁₊(w₁w₂w₃·)·p(w₄|w₂w₃)) / c(w₁w₂w₃·)`
    *  - third order (continuation counts `N₁₊(·w₂w₃w₄)` from the raw
    *    fourgram type table):
    *    `p(w₄|w₂w₃) = (max(N₁₊(·w₂w₃w₄)−D₃,0) + D₃·N₁₊(w₂w₃·)·p(w₄|w₃)) / N₁₊(·w₂w₃·)`
    *  - second order (continuation-of-continuation — each level's type
    *    table derives from the level above, Chen & Goodman's cascade):
    *    `p(w₄|w₃) = (max(N₁₊(·w₃w₄)−D₂,0) + D₂·N₁₊(w₃·)·p_cont(w₄)) / N₁₊(·w₃·)`
    *  - lowest: `p_cont(w₄) = N₁₊(·w₄) / |distinct (w₃,w₄) types|`
    *
    * `D₄`/`D₃`/`D₂` estimated per order as `n₁/(n₁+2n₂)` over that
    * order's count-of-counts ([[knDiscount]]), riding every row rounded
    * so the oracle recomputes them by value. Scale contract unchanged:
    * all model tables join by prefix/pair/token key, the driver
    * collects exactly four bounded scalars.
    */
  def knFourgramLogProb(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val qg = fourgramRows(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c4 = qg.groupBy(col("w1"), col("w2"), col("w3"), col("w4"))
      .agg(count(lit(1)).cast("double").as("__c4"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val d4r = c4.agg(
      sum(when(col("__c4") === 1.0, 1L).otherwise(0L)).as("n1"),
      sum(when(col("__c4") === 2.0, 1L).otherwise(0L)).as("n2")).head()
    val d4 = knDiscount(d4r.getLong(0), d4r.getLong(1))
    // prefix totals from the distinct-fourgram table (see the trigram
    // twin above): same values, |types|-sized aggregation input
    val cp3 = c4.groupBy(col("w1"), col("w2"), col("w3"))
      .agg(sum(col("__c4")).as("__cp3"),
        count(lit(1)).cast("double").as("__n1f4"))
    val cont3 = c4.groupBy(col("w2"), col("w3"), col("w4"))
      .agg(count(lit(1)).cast("double").as("__n3c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val d3r = cont3.agg(
      sum(when(col("__n3c") === 1.0, 1L).otherwise(0L)).as("n1"),
      sum(when(col("__n3c") === 2.0, 1L).otherwise(0L)).as("n2")).head()
    val d3 = knDiscount(d3r.getLong(0), d3r.getLong(1))
    val mid3 = cont3.groupBy(col("w2"), col("w3"))
      .agg(sum(col("__n3c")).as("__den3"),
        count(lit(1)).cast("double").as("__n1f3c"))
    val cont2 = cont3.groupBy(col("w3"), col("w4"))
      .agg(count(lit(1)).cast("double").as("__n2c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val d2r = cont2.agg(
      sum(when(col("__n2c") === 1.0, 1L).otherwise(0L)).as("n1"),
      sum(when(col("__n2c") === 2.0, 1L).otherwise(0L)).as("n2")).head()
    val d2 = knDiscount(d2r.getLong(0), d2r.getLong(1))
    val mid2 = cont2.groupBy(col("w3"))
      .agg(sum(col("__n2c")).as("__den2"),
        count(lit(1)).cast("double").as("__n1f2"))
    val uniCont = cont2.groupBy(col("w4"))
      .agg(count(lit(1)).cast("double").as("__n1r"))
    val btot = cont2.count().toDouble
    val pMid2 = (greatest(col("__n2c") - d2, lit(0.0)) +
      lit(d2) * col("__n1f2") * (col("__n1r") / btot)) / col("__den2")
    val pMid3 = (greatest(col("__n3c") - d3, lit(0.0)) +
      lit(d3) * col("__n1f3c") * pMid2) / col("__den3")
    val lm = c4.join(cp3, Seq("w1", "w2", "w3"))
      .join(cont3, Seq("w2", "w3", "w4")).join(mid3, Seq("w2", "w3"))
      .join(cont2, Seq("w3", "w4")).join(mid2, Seq("w3"))
      .join(uniCont, Seq("w4"))
      .select(col("w1"), col("w2"), col("w3"), col("w4"),
        log((greatest(col("__c4") - d4, lit(0.0)) +
          lit(d4) * col("__n1f4") * pMid3) / col("__cp3")).as("__lp"))
    val out = qg.join(lm, Seq("w1", "w2", "w3", "w4"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_fourgrams"),
        roundStable(avg(col("__lp")), 6).as("mean_kn_logprob"))
      .withColumn("discount_hi", lit(math.floor(d4 * 1e6 + 0.5) / 1e6))
      .withColumn("discount_mid3", lit(math.floor(d3 * 1e6 + 0.5) / 1e6))
      .withColumn("discount_mid2", lit(math.floor(d2 * 1e6 + 0.5) / 1e6))
      .localCheckpoint()
    cont2.unpersist(); cont3.unpersist(); c4.unpersist(); qg.unpersist()
    out
  }

  /** "Fightin' words" log-odds with an informative Dirichlet prior
    * (Monroe, Colaresi & Quinn 2008) — WHICH words distinguish corpus
    * side A from side B, done right: raw frequency ratios explode on
    * rare words and PMI on common ones; the posterior log-odds-ratio
    * z-score `δ_w / √(1/(y_aw+α_w) + 1/(y_bw+α_w))` with the prior
    * `α_w = α₀·p_w` (overall corpus frequency) shrinks both ends and
    * makes words COMPARABLE across the frequency spectrum — the
    * principled "distinctive vocabulary" readout for corpus-mix and
    * source-attribution audits (the lexical companion of C28's domain
    * mixing). One token explode + one (word) agg with conditional
    * sums; totals ride a window over the O(vocab) word rows. Words
    * under `minCount` total occurrences are dropped (their z is prior
    * noise by construction).
    */
  def logOddsWords(df: DataFrame, isA: Column, textCol: String,
                   alpha0: Double = 500.0, minCount: Long = 20L,
                   digits: Int = 6): DataFrame = {
    val toks = df
      .select(isA.as("__a"), explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
    val counts = toks.groupBy(col("word"))
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("y_a"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("y_b"))
    val wAll = Window.partitionBy(lit(1))
    val na = sum(col("y_a")).over(wAll).cast("double")
    val nb = sum(col("y_b")).over(wAll).cast("double")
    val ya = col("y_a").cast("double")
    val yb = col("y_b").cast("double")
    val aw = lit(alpha0) * (ya + yb) / (col("__na") + col("__nb"))
    val delta = log((ya + col("__aw")) /
        (col("__na") + lit(alpha0) - ya - col("__aw"))) -
      log((yb + col("__aw")) /
        (col("__nb") + lit(alpha0) - yb - col("__aw")))
    val sigma = sqrt(lit(1.0) / (ya + col("__aw")) +
      lit(1.0) / (yb + col("__aw")))
    counts
      .withColumn("__na", na).withColumn("__nb", nb)
      .withColumn("__aw", aw)
      .filter(col("y_a") + col("y_b") >= minCount)
      .select(col("word"), col("y_a"), col("y_b"),
        roundStable(delta, digits).as("log_odds"),
        roundStable(delta / sigma, digits).as("z"))
  }

  /** Per-slice unseen-mass and vocabulary-richness estimates — "how
    * much of this source's vocabulary have we NOT yet crawled": the
    * Good-Turing missing mass `P₀ = n₁/N` (Good 1953 — the probability
    * that the NEXT token drawn from the source is a never-before-seen
    * type; its complement is the sample coverage) and the
    * bias-corrected Chao1 richness floor `V + n₁(n₁−1)/(2(n₂+1))`
    * (Chao 1984; the `+1` correction — Chiu 2014 — keeps the estimate
    * finite when no type occurs exactly twice). [[freqSpectrum]] emits
    * the whole count-of-counts table for one corpus; this is the
    * per-slice ESTIMATOR readout — the crawl-scheduling signal (a
    * source with high P₀ still yields new vocabulary; one near 0 is
    * mined out).
    *
    * Shape: one (slice, token) count aggregation — per-slice state is
    * O(vocab) — then one per-slice fold over those cells. Nothing
    * corpus-global, no joins, no windows over data.
    */
  def richness(docs: DataFrame, sliceCol: String, textCol: String,
               digits: Int = 6): DataFrame = {
    val counts = docs
      .select(col(sliceCol), explode(tokens(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col(sliceCol), col("tok"))
      .agg(count(lit(1)).as("__c"))
    val n1 = col("__n1").cast("double")
    counts.groupBy(col(sliceCol))
      .agg(sum(col("__c")).as("__n"),
        count(lit(1)).as("__v"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).as("__n1"),
        sum(when(col("__c") === 2, 1L).otherwise(0L)).as("__n2"))
      .select(col(sliceCol),
        col("__n").as("n_tokens"), col("__v").as("n_types"),
        col("__n1").as("n_hapax"), col("__n2").as("n_dis"),
        roundStable(n1 / col("__n"), digits).as("p_unseen"),
        roundStable(lit(1.0) - n1 / col("__n"), digits).as("coverage"),
        roundStable(col("__v") + n1 * (n1 - 1) /
          (lit(2.0) * (col("__n2") + 1)), digits).as("chao1"))
  }

  /** Hill diversity numbers per slice (Hill 1973) — the effective
    * vocabulary size at three concentration sensitivities on ONE
    * comparable scale (all in "equally-common types"): `D₀ = V` (raw
    * type count), `D₁ = e^H` (Shannon — types weighted by their
    * share), `D₂ = 1/Σp²` (inverse Simpson — dominated by the head).
    * `D₀ ≫ D₁ ≫ D₂` reads "long tail behind a few dominant tokens";
    * the evenness ratio `D₁/D₀` is the one-number template-flood
    * screen ([[tokenEntropy]] scores each DOC against itself; this
    * profiles each SLICE's aggregate distribution). Entropy via the
    * log-sum identity `H = ln N − Σc·ln c / N`; Σc² in double from
    * the start (a 100 TB head token squares past Long).
    *
    * Same shape as [[richness]]: one (slice, token) count agg, one
    * per-slice fold — per-slice state O(vocab), nothing global.
    */
  /** Cross-source unigram cross-entropy matrix — HOW FAR each source's
    * language is from every other's, in nats per token: for each
    * ordered pair (a, b), `H(a,b) = −Σ_t p_a(t)·ln q_b(t)` where `p_a`
    * is a's empirical unigram distribution and `q_b` is b's add-k
    * smoothed model over the corpus-global vocabulary
    * (`(c_b+k)/(N_b+kV)` — smoothing is what makes a foreign model
    * finite on tokens it never saw). Emits the perplexity `e^H` and the
    * EXCESS over the self-model `H(a,b) − H(a,a)` — the extra nats per
    * token paid for using b's model instead of a's own, the domain-
    * distance number that drives mixing weights (C28 reweights to a
    * target mix; this MEASURES which sources are interchangeable).
    * q97 scores DOCS under one corpus LM; this scores SOURCES under
    * each other's.
    *
    * Shape: one (source, token) cell agg (the 100 TB reduction), the
    * pair grid is cells × S rows (S = #sources — small by assumption;
    * vocab-bounded, never corpus-bounded), V rides a broadcast 1-row
    * aggregate — no driver round-trip, no collect.
    */
  def crossPerplexity(docs: DataFrame, sliceCol: String, textCol: String,
                      k: Double = 0.5, digits: Int = 6): DataFrame = {
    require(k > 0, s"need smoothing k > 0, got $k")
    val cells = docs
      .select(col(sliceCol).cast("string").as("__s"),
        explode(tokens(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("__s"), col("tok"))
      .agg(count(lit(1)).cast("double").as("__c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = cells.groupBy(col("__s")).agg(sum(col("__c")).as("__n"))
    val vdf = cells.agg(
      count_distinct(col("tok")).cast("double").as("__V"))
    val aSide = cells
      .join(totals, "__s")
      .select(col("__s").as("source_a"), col("tok"),
        (col("__c") / col("__n")).as("__pa"), col("__n").as("__na"))
    val bTot = totals.select(col("__s").as("source_b"),
      col("__n").as("__nb"))
    val bCells = cells.select(col("__s").as("source_b"), col("tok"),
      col("__c").as("__cb"))
    val grid = aSide
      .crossJoin(broadcast(bTot))
      .join(bCells, Seq("source_b", "tok"), "left")
      .crossJoin(broadcast(vdf))
    val qb = (coalesce(col("__cb"), lit(0.0)) + lit(k)) /
      (col("__nb") + lit(k) * col("__V"))
    val h = grid.groupBy(col("source_a"), col("source_b"))
      .agg(first(col("__na")).cast("long").as("n_tokens_a"),
        (-sum(col("__pa") * log(qb))).as("__h"))
      .localCheckpoint()
    cells.unpersist()
    val diag = h.filter(col("source_a") === col("source_b"))
      .select(col("source_a"), col("__h").as("__hself"))
    h.join(diag, "source_a")
      .select(col("source_a"), col("source_b"), col("n_tokens_a"),
        roundStable(col("__h"), digits).as("cross_entropy"),
        roundStable(exp(col("__h")), digits).as("ppl"),
        roundStable(col("__h") - col("__hself"), digits).as("excess"))
  }

  /** Burrows' Delta between sources (Burrows 2002; Argamon 2008's
    * interpretation as an L1 distance in z-space) — the classical
    * stylometric distance: over the corpus's top-`topWords` tokens,
    * each source's relative frequency is z-scored ACROSS sources
    * (population σ), and `Δ(a,b) = mean_t |z_a(t) − z_b(t)|`. Where
    * [[crossPerplexity]] measures whole-distribution distance, Delta
    * isolates the STYLE signature carried by the high-frequency
    * function words — the authorship/template-provenance screen
    * (two "different" sources with Δ ≈ 0 are one pipeline wearing two
    * names). Absent (source, word) combos count as f = 0 — the grid
    * is materialized, never silently dropped; zero-variance words
    * yield NULL z for every source and drop out of the mean on both
    * engines identically (`n_words` reports the surviving count).
    *
    * Shape: one cell agg; the vocabulary cut is a deterministic
    * (tf DESC, token) top-`topWords` broadcast; everything after rides
    * the S × topWords grid — hundreds of rows regardless of corpus
    * size. The pair join is S² × topWords.
    */
  def burrowsDelta(docs: DataFrame, sliceCol: String, textCol: String,
                   topWords: Int = 150, digits: Int = 6): DataFrame = {
    require(topWords >= 2, s"need topWords >= 2, got $topWords")
    val cells = docs
      .select(col(sliceCol).cast("string").as("__s"),
        explode(tokens(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("__s"), col("tok"))
      .agg(count(lit(1)).cast("double").as("__c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = cells.groupBy(col("__s")).agg(sum(col("__c")).as("__n"))
    val top = cells.groupBy(col("tok"))
      .agg(sum(col("__c")).as("__tf"))
      .orderBy(col("__tf").desc, col("tok"))
      .limit(topWords)
      .select(col("tok"))
    val grid = totals.crossJoin(broadcast(top))
      .join(cells, Seq("__s", "tok"), "left")
      .withColumn("__f", coalesce(col("__c"), lit(0.0)) / col("__n"))
    val wTok = Window.partitionBy(col("tok"))
    val z = grid
      .withColumn("__mu", avg(col("__f")).over(wTok))
      .withColumn("__sd", stddev_pop(col("__f")).over(wTok))
      .withColumn("__z",
        when(col("__sd") > 0, (col("__f") - col("__mu")) / col("__sd")))
      .select(col("__s"), col("tok"), col("__z"))
      .localCheckpoint()
    cells.unpersist()
    val a = z.select(col("__s").as("source_a"), col("tok"),
      col("__z").as("__za"))
    val b = z.select(col("__s").as("source_b"), col("tok"),
      col("__z").as("__zb"))
    a.join(b, Seq("tok"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(abs(col("__za") - col("__zb"))).as("n_words"),
        roundStable(avg(abs(col("__za") - col("__zb"))), digits)
          .as("delta"))
  }

  /** Exact water-filling token-budget allocation across sources — the
    * mixing PLANNER: given per-source target weight w and available
    * supply s, allocate a budget B as `a_i = min(s_i, λ·w_i)` with the
    * unique fill level λ making Σa = B (sources short of their fair
    * share contribute everything; their unused share spills to the
    * rest — the classic water-filling solution to max-min fair
    * allocation, cf. Bertsekas & Gallager, Data Networks §6.5.2).
    * C28 reweights DOWN to a target mix; this answers the planning
    * question BEFORE sampling: "with an 0.6·total token budget, how
    * many tokens do I take from each source, and which sources are
    * supply-bound?" `asFraction = true` reads `budget` as a fraction
    * of total supply (scale-free). If B ≥ Σs every source is capped
    * and λ is NULL (nothing to ration).
    *
    * The boundary is closed-form, not iterative: sorted by s/w, the
    * first row j with `λ_{j−1} = (B − Σ_{i<j}s_i)/(W − Σ_{i<j}w_i) ≤
    * s_j/w_j` is the waterline (ties yield the identical λ by
    * algebra). One global sort + prefix windows over O(#sources) rows
    * — a planner op on the reduced table, deliberately single-stream;
    * the corpus itself is touched only by whatever built the supply
    * column. Zero/negative-weight rows are excluded (they cannot
    * receive allocation).
    */
  def waterFill(supply: DataFrame, keyCol: String, weightCol: String,
                supplyCol: String, budget: Double,
                asFraction: Boolean = false, digits: Int = 6): DataFrame = {
    require(budget > 0, s"need budget > 0, got $budget")
    require(!asFraction || budget <= 1.0,
      s"fractional budget must be <= 1, got $budget")
    val base = supply
      .select(col(keyCol).as("key"), col(weightCol).cast("double").as("__w"),
        col(supplyCol).cast("double").as("__s"))
      .filter(col("__w") > 0)
      .withColumn("__r", col("__s") / col("__w"))
    val ord = Window.orderBy(col("__r"), col("key"))
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NB: names differing only by case collide (the q231/q281 bit) —
    // totals are __totS/__totW, never __S/__W
    val tot = base.agg(sum(col("__s")).as("__totS"),
      sum(col("__w")).as("__totW"))
    val bCol = if (asFraction) lit(budget) * col("__totS") else lit(budget)
    val marked = base
      .withColumn("__j", row_number().over(ord).cast("long"))
      .withColumn("__cs", sum(col("__s")).over(cum))
      .withColumn("__cw", sum(col("__w")).over(cum))
      .crossJoin(broadcast(tot))
      .withColumn("__lp", (bCol - (col("__cs") - col("__s"))) /
        (col("__totW") - (col("__cw") - col("__w"))))
    val jStar = marked.filter(col("__lp") <= col("__r"))
      .agg(min(col("__j")).as("__jstar"))
    val lam = marked.join(broadcast(jStar), col("__j") === col("__jstar"))
      .select(col("__lp").as("__lam"))
    val alloc = least(col("__s"), col("__lam") * col("__w"))
    marked.join(broadcast(lam), lit(true), "left")
      .select(col("key"), col("__w").as("weight"),
        roundStable(col("__s"), digits).as("supply"),
        roundStable(alloc, digits).as("allocation"),
        (roundStable(alloc, digits) === roundStable(col("__s"), digits))
          .as("capped"),
        roundStable(col("__lam"), digits).as("fill_level"))
  }

  /** Vocabulary coverage curve — token-mass coverage at candidate
    * vocabulary sizes (the tokenizer-budget planning table): rank
    * tokens by corpus frequency (deterministic (tf DESC, token) cut),
    * then for each candidate size k the share of TOKEN MASS the top-k
    * types cover and the OOV rate a k-sized vocab would pay. C16's
    * vocabCoverage scores each DOC against one fixed vocab; this
    * scores the VOCAB SIZES against the corpus — the "is 32k enough
    * or does this corpus need 64k" readout. One freq agg + one rank
    * window over O(vocab) rows; the cut grid is a literal explode.
    */
  def vocabCoverageCurve(docs: DataFrame, textCol: String,
                         cuts: Seq[Int] = Seq(100, 500, 1000, 5000),
                         digits: Int = 6): DataFrame = {
    require(cuts.nonEmpty && cuts.forall(_ >= 1), s"bad cuts: $cuts")
    val freq = docs
      .select(explode(tokens(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok"))
      .agg(count(lit(1)).cast("double").as("__f"))
    val wRank = Window.orderBy(col("__f").desc, col("tok"))
    val wAll = Window.partitionBy(lit(1))
    val ranked = freq
      .withColumn("__rk", row_number().over(wRank).cast("long"))
      .withColumn("__tot", sum(col("__f")).over(wAll))
    ranked
      .select(col("__rk"), col("__f"), col("__tot"),
        explode(array(cuts.map(lit): _*)).as("vocab_size"))
      .filter(col("__rk") <= col("vocab_size"))
      .groupBy(col("vocab_size"))
      .agg(count(lit(1)).as("n_types"),
        roundStable(sum(col("__f")) / first(col("__tot")), digits)
          .as("coverage"),
        roundStable(lit(1.0) - sum(col("__f")) / first(col("__tot")),
          digits).as("oov_rate"))
  }

  /** Duplication-locality profile per source — WHERE the duplication
    * lives: each document is UNIQUE (its exact text appears once in
    * the corpus), an INTRA-source duplicate (copies exist, all inside
    * this source — template reuse, re-uploads), or a CROSS-source
    * duplicate (copies span sources — syndication, mirrors; the kind
    * per-source dedup can never catch). A2/C15 produce the survivors;
    * this is the diagnosis that decides whether dedup must be GLOBAL
    * for a given source. The duplicate KEY is the caller's — raw md5
    * for exact dedup, a prefix fingerprint for crawl near-dups, C4's
    * rolling hash for content dedup — so one diagnosis serves every
    * rung of the dedup ladder. Two cell aggregations + one join back,
    * all over O(#distinct fingerprints) rows.
    */
  def dupProfile(docs: DataFrame, sourceCol: String,
                 fingerprint: Column, digits: Int = 6): DataFrame = {
    val cells = docs
      .select(col(sourceCol).as("__s"), fingerprint.as("__h"))
      .groupBy(col("__s"), col("__h"))
      .agg(count(lit(1)).as("__c"))
    val global = cells.groupBy(col("__h"))
      .agg(sum(col("__c")).as("__tot"),
        count(lit(1)).as("__nsrc"))
    cells.join(global, "__h")
      .groupBy(col("__s").as(sourceCol))
      .agg(sum(col("__c")).as("n_docs"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("__tot") > 1 && col("__nsrc") === 1, col("__c"))
          .otherwise(0L)).as("__intra"),
        sum(when(col("__nsrc") > 1, col("__c")).otherwise(0L))
          .as("__cross"))
      .select(col(sourceCol), col("n_docs"), col("n_distinct"),
        col("__intra").as("n_intra_dup"), col("__cross").as("n_cross_dup"),
        roundStable(col("__intra").cast("double") / col("n_docs"),
          digits).as("intra_rate"),
        roundStable(col("__cross").cast("double") / col("n_docs"),
          digits).as("cross_rate"))
  }

  /** Character-class profile per slice — the OCR-garbage / binary-
    * spill screen that needs no tokenizer: shares of alphabetic,
    * digit, whitespace, and other characters, from exact LENGTH
    * arithmetic (`len − len(strip(class))` — integer-exact on both
    * engines, no sampling). Natural prose sits ~80% alpha / ~18%
    * space; OCR noise and markup dumps bend the "other" share up
    * long before C21's token-level quality score reacts. One
    * aggregation pass.
    */
  def charClassProfile(docs: DataFrame, sliceCol: String,
                       textCol: String, digits: Int = 6): DataFrame = {
    val t = col(textCol)
    val total = sum(length(t)).cast("double")
    def classChars(re: String) =
      sum(length(t) - length(regexp_replace(t, re, "")))
        .cast("double")
    val alpha = classChars("[A-Za-z]")
    val digit = classChars("[0-9]")
    val space = classChars("[ \\t\\n]")
    val ok = total > 0 // an all-empty slice reports NULL shares
    docs.filter(t.isNotNull).groupBy(col(sliceCol))
      .agg(count(lit(1)).as("n_docs"),
        total.cast("long").as("n_chars"),
        roundStable(when(ok, alpha / total), digits).as("alpha_share"),
        roundStable(when(ok, digit / total), digits).as("digit_share"),
        roundStable(when(ok, space / total), digits).as("space_share"),
        roundStable(when(ok, (total - alpha - digit - space) / total),
          digits).as("other_share"))
  }

  def hillNumbers(docs: DataFrame, sliceCol: String, textCol: String,
                  digits: Int = 6): DataFrame = {
    val counts = docs
      .select(col(sliceCol), explode(tokens(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col(sliceCol), col("tok"))
      .agg(count(lit(1)).cast("double").as("__c"))
    val h = log(col("__n")) - col("__clc") / col("__n")
    counts.groupBy(col(sliceCol))
      .agg(sum(col("__c")).as("__n"),
        count(lit(1)).as("__v"),
        sum(col("__c") * log(col("__c"))).as("__clc"),
        sum(col("__c") * col("__c")).as("__c2"))
      .select(col(sliceCol),
        col("__n").cast("long").as("n_tokens"),
        col("__v").as("d0"),
        roundStable(exp(h), digits).as("d1"),
        roundStable(col("__n") * col("__n") / col("__c2"), digits).as("d2"),
        roundStable(exp(h) / col("__v"), digits).as("evenness"))
  }
}
