package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: every registered query at the given SF dir, printed as
  * ONE JSON line. Each query runs twice: `queries` holds the COLD first
  * run (comparable across rounds — includes plan compilation and any
  * in-operator materialization) and `warm` the immediate second run
  * (steady-state: codegen cached, shuffle files reusable). `value` stays
  * the cold total.
  *
  * The artifact is SELF-EXPLAINING on a contended box (the warm>cold
  * inversion class recurred four rounds on the driver machine while the
  * idle box showed zero): every run records /proc/loadavg at start,
  * process-CPU-vs-wall fraction, and GC + JIT-compile time deltas; any
  * query whose warm exceeds its cold, OR whose cold is an outlier
  * (≫ its own warm, or ≫ its previous round's cold read from the
  * committed `bench-latest.json`), is re-measured serially before the
  * artifact is written, and carries a verdict naming the interferer or
  * confirming the number. r11 shipped q190_ppr's cold at 2.5× its r10
  * value with no way to tell "regressed" from "box was busy" — the
  * cold side now has the same re-measure path the warm side got in r10.
  *
  * Hygiene between timed runs is DETERMINISTIC, not best-effort: r12
  * triage measured ~40 broadcast blocks (~130 MB with disk) surviving
  * per PageRank run through unpersist + System.gc() — strongly-held
  * `Broadcast` objects the ContextCleaner can never reclaim, compounding
  * to the r11 artifact's 130 MB residual. [[Blocks.hardReset]] now
  * blocks on RDD removal and drops all broadcast blocks synchronously,
  * so `max_residual_storage_mb` ≈ 0 is a per-run PROOF of isolation.
  *
  * The complete artifact (full per-query timings + telemetry) is also
  * WRITTEN TO `bench-latest.json` in the repo: the driver's stdout
  * capture keeps only a ~2 KB tail, which in r11 truncated the
  * per-query telemetry arrays out of the record.
  */
object Bench {
  /** Executor storage memory in use (MB) — in local mode, the one block
    * manager. Nonzero at query START means a neighbor's blocks survived
    * the between-queries reset and the timing is suspect.
    */
  private def storageUsedMb(spark: SparkSession): Long =
    spark.sparkContext.getExecutorMemoryStatus.values
      .map { case (max, remaining) => max - remaining }.sum / (1024 * 1024)

  /** 1-minute system load average (all processes on the box, not just
    * this JVM) — the direct tell for "someone else was running".
    */
  private def loadAvg(): Double = {
    val v = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage
    if (v < 0) 0.0 else v
  }

  /** Total CPU nanoseconds consumed by THIS process. */
  private def processCpuNs(): Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
      case _ => -1L
    }

  /** Cumulative stop-the-world GC milliseconds across all collectors. */
  private def gcMs(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
  }

  /** Cumulative JIT compilation milliseconds. */
  private def jitMs(): Long = {
    val b = java.lang.management.ManagementFactory.getCompilationMXBean
    if (b != null && b.isCompilationTimeMonitoringSupported)
      b.getTotalCompilationTime
    else 0L
  }

  /** One timed run + its telemetry. cpuFrac is process-CPU / (wall ×
    * ncores): ~0 while descheduled by an external hog; gcSec/jitSec are
    * the in-run deltas (seconds) — large values name the JVM-internal
    * interferer. extLoad is the EXTERNAL share of the start loadavg —
    * see [[ExternalLoad]].
    */
  final case class Run(wallSec: Double, err: Option[String],
      storageAtStartMb: Long, load: Double, extLoad: Double,
      cpuFrac: Double, gcSec: Double, jitSec: Double)

  /** External-load estimator: 1-min loadavg MINUS this process's OWN
    * like-for-like load contribution. Two failed cuts taught the
    * construction (both shipped a self-flagging artifact on an idle
    * box before being caught):
    *
    *  1. raw loadavg — a 30 s query at 32 threads leaves loadavg ~8-10
    *     for the next minute; indistinguishable from a neighbor.
    *  2. loadavg minus own 1-min CPU core-rate — misses own
    *     UNINTERRUPTIBLE (D-state) threads: Linux loadavg counts them,
    *     but shuffle/parquet IO phases burn no CPU, so the bench's own
    *     write-heavy queries (q66-class) still read as "external".
    *
    * The correct subtraction mirrors the kernel: a daemon thread
    * samples this process's RUNNABLE + UNINTERRUPTIBLE task count from
    * /proc/self/task each second and folds it with the same 1-minute
    * exponential decay loadavg uses. `external = max(0, loadavg −
    * ownEMA)` is then a difference of like-for-like averages; an idle
    * box reads ~0 regardless of what the bench itself is doing, and
    * r13's genuine 9-12 neighbor load still flags. Non-Linux fallback:
    * the CPU core-rate window (cut 2 — best available there).
    */
  private final class ExternalLoad {
    @volatile private var ownEma = 0.0
    private val taskDir = new java.io.File("/proc/self/task")
    private val procAvailable = taskDir.isDirectory

    private def ownRunnable(): Int = {
      val kids = taskDir.listFiles()
      if (kids == null) return -1
      var n = 0
      var i = 0
      while (i < kids.length) {
        try {
          val s = new String(java.nio.file.Files.readAllBytes(
            new java.io.File(kids(i), "stat").toPath), "US-ASCII")
          // state is the first char after the comm field's closing ')'
          val st = s.charAt(s.lastIndexOf(')') + 2)
          if (st == 'R' || st == 'D') n += 1
        } catch { case _: Throwable => } // task exited mid-sweep
        i += 1
      }
      // the sampler itself is RUNNABLE while sweeping — don't count it
      math.max(0, n - 1)
    }

    if (procAvailable) {
      val decay = math.exp(-1.0 / 60.0)
      val t = new Thread(() => {
        while (true) {
          val c = ownRunnable()
          if (c >= 0) ownEma = ownEma * decay + c * (1.0 - decay)
          Thread.sleep(1000)
        }
      }, "graft-bench-ownload")
      t.setDaemon(true)
      t.start()
    }

    // non-Linux fallback: own 1-min CPU core-rate window
    private val samples =
      scala.collection.mutable.ArrayDeque.empty[(Long, Long)] // (ns, cpuNs)
    private def cpuWindowRate(): Double = {
      val now = System.nanoTime()
      val cpu = processCpuNs()
      if (cpu >= 0) {
        samples.append((now, cpu))
        while (samples.length > 2 && now - samples(1)._1 > 60e9.toLong)
          samples.removeHead(): Unit
      }
      samples.headOption match {
        case Some((t0, c0)) if cpu >= 0 && now - t0 > 1e9.toLong =>
          (cpu - c0).toDouble / (now - t0)
        case _ => 0.0
      }
    }

    def sample(): Double = {
      val own = if (procAvailable) ownEma else cpuWindowRate()
      math.max(0.0, loadAvg() - own)
    }
  }

  /** Previous round's per-query COLD seconds from the committed
    * `bench-latest.json` (this main writes it; the round driver commits
    * it) — the reference that lets a cold outlier be recognized as a
    * REGRESSION rather than a mystery. Tolerant regex parse of the
    * `"queries":{...}` object this same code emits; absent file or
    * shape drift ⇒ empty map (first round, or format change — the
    * verdict logic then falls back to own-warm comparison only).
    */
  private[graft] def priorColds(path: String): Map[String, Double] = {
    val f = new java.io.File(path)
    if (!f.isFile) return Map.empty
    try {
      val s = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      val qIdx = s.indexOf("\"queries\":{")
      if (qIdx < 0) return Map.empty
      val start = qIdx + "\"queries\":{".length
      val end = s.indexOf("}", start)
      if (end < 0) return Map.empty
      val body = s.substring(start, end)
      val pair = """"([^"]+)":([0-9.Ee+-]+)""".r
      pair.findAllMatchIn(body)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    } catch { case _: Throwable => Map.empty }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ncores = cpus.toDouble
    val spark = Sessions.local(cpus, shufflePartitions = cpus)
    spark.sparkContext.setLogLevel("WARN")
    val prior = priorColds("bench-latest.json")
    val extLoadEst = new ExternalLoad
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Run = {
      val before = Blocks.persistedIds(spark)
      val storageAtStart = storageUsedMb(spark)
      val load0 = loadAvg()
      val ext0 = extLoadEst.sample()
      val cpu0 = processCpuNs()
      val gc0 = gcMs()
      val jit0 = jitMs()
      val t0 = System.nanoTime()
      // A failed query must surface as an ERROR, not a bogus ~50 ms
      // "timing" that deflates the total and masks the breakage.
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(160)}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      val cpu1 = processCpuNs()
      val cpuFrac =
        if (cpu0 < 0 || cpu1 < 0 || dt <= 0) -1.0
        else (cpu1 - cpu0) / 1e9 / (dt * ncores)
      val gcSec = (gcMs() - gc0) / 1e3
      val jitSec = (jitMs() - jit0) / 1e3
      // Deterministic teardown OUTSIDE the timed window: blocking RDD
      // unpersist + synchronous broadcast-block drop (the part no public
      // API reaches and no GC ever frees — see Blocks.hardReset), then a
      // GC so this query's dead weight can't land inside a neighbor's
      // timed run (the r8/r9 warm>cold inversion class).
      Blocks.hardReset(spark, before)
      System.gc()
      Thread.sleep(100) // let the async cleaner act on the cleared refs
      Run(dt, err, storageAtStart, load0, ext0, cpuFrac, gcSec, jitSec)
    }
    final case class Entry(name: String, cold: Run, warm: Run,
        remeasured: Option[(Run, Run)], warmVerdict: Option[String],
        coldVerdict: Option[String]) {
      def err: Option[String] = cold.err.orElse(warm.err)
      // headline substitution policy (asymmetric BY NATURE, conservative):
      // - warm: the re-measured warm is a legitimate steady-state sample,
      //   so when the verdict says the first pass was contaminated
      //   (vanished/external) the headline takes the MIN of the two warms
      //   — a contaminated run only ever overestimates.
      // - cold: NEVER substituted. An in-process "recold" is structurally
      //   NOT a cold — JIT, memoized trainer models (q354-class), OS page
      //   cache, and codegen caches all survive — so min(cold, recold)
      //   would deflate every query with one-time-per-process work (the
      //   first r12 run deflated 12 colds this way). The artifact states
      //   it: cold is always the first-pass number; the re-measure exists
      //   to inform the VERDICT, not the headline.
      private val warmContaminated = Set("vanished_on_remeasure",
        "external_load", "descheduled_external")
      def warmSec: Double = remeasured match {
        case Some((_, w2)) if warmVerdict.exists(warmContaminated) =>
          math.min(warm.wallSec, w2.wallSec)
        case _ => warm.wallSec
      }
      def coldSec: Double = cold.wallSec
    }
    val inverted = (c: Run, w: Run) =>
      w.wallSec > c.wallSec * 1.15 && w.wallSec - c.wallSec > 1.0
    // Cold outlier: the first-pass cold dwarfs the query's own steady
    // state (trainer-class queries legitimately do — the re-measure then
    // confirms them) or its previous round's cold.
    val coldOutlier = (name: String, c: Run, w: Run) =>
      (c.wallSec > w.wallSec * 2.5 && c.wallSec - w.wallSec > 2.0) ||
        prior.get(name).exists(p => c.wallSec > p * 2.5 && c.wallSec - p > 2.0)
    // UNTIMED process warm-up before the timed loop: the first map-order
    // query otherwise carries the JVM/Spark STARTUP JIT (r12: query #1
    // cold 5.26 s vs 0.33 s recold with 6.49 s of in-run JIT — a process
    // cost, not a plan cost). One throwaway generic pipeline — parquet
    // scan, shuffle agg, broadcast join — compiles the Spark
    // infrastructure paths (scan exec, exchange, codegen driver, block
    // manager) WITHOUT running any registered query's plan, so every
    // timed cold still pays its own plan compilation. Policy unchanged:
    // cold remains the first TIMED pass.
    locally {
      extLoadEst.sample() // seed the own-CPU window before the warm-up
      val warm0 = Blocks.persistedIds(spark)
      val t = spark.range(1L << 20)
        .selectExpr("id", "cast(id % 5 as bigint) as k")
      t.groupBy("k").count().count()
      val r = Tables.region(spark, sfDir).selectExpr(
        "cast(r_regionkey as bigint) as k")
      t.join(org.apache.spark.sql.functions.broadcast(r), Seq("k"), "left")
        .count()
      Blocks.hardReset(spark, warm0)
      System.gc()
      Thread.sleep(100)
    }
    val firstPass = SparkEntry.queries.map { case (name, fn) =>
      (name, fn, time(fn), time(fn))
    }.toSeq
    // Serial re-measure of every flagged query BEFORE the artifact is
    // written: on a contended box the first-pass numbers may time a
    // neighbor process, not the query. The re-measure is one more
    // cold+warm pair; the verdicts name the interferer or confirm the
    // number, on BOTH sides.
    val results = firstPass.map { case (name, fn, c, w) =>
      val isInv = c.err.isEmpty && w.err.isEmpty && inverted(c, w)
      val isColdOut = c.err.isEmpty && w.err.isEmpty && coldOutlier(name, c, w)
      if (!isInv && !isColdOut) Entry(name, c, w, None, None, None)
      else {
        val c2 = time(fn)
        val w2 = time(fn)
        val warmVerdict = if (!isInv) None else Some(
          if (!inverted(c2, w2)) "vanished_on_remeasure"
          else if (w2.load > ncores * 0.5 && w2.load > c2.load * 1.5) "external_load"
          else if (w2.cpuFrac >= 0 && w2.cpuFrac < 0.05) "descheduled_external"
          else if (w2.gcSec > w2.wallSec * 0.3) "gc"
          else if (w2.jitSec > w2.wallSec * 0.3) "jit"
          else "true_warm_regression") // real: warm genuinely slower
        // in-process recold is warmer BY CONSTRUCTION (JIT, memoized
        // trainers, page cache), so a small recold cannot distinguish
        // "first cold timed a neighbor" from "cold includes one-time
        // work" — the verdict says so honestly; the PRIOR-round cold
        // (a first-pass cold from a fresh JVM) is the one fair referee.
        val coldVerdict = if (!isColdOut) None else Some(
          prior.get(name) match {
            case Some(p) if c.wallSec <= p * 2.5 + 2 => "matches_prior_round"
            case Some(p) if c2.wallSec > p * 2.5 + 2 &&
              c2.wallSec > c.wallSec * 0.6 => "true_cold_regression"
            case Some(_) => "not_reproducible_in_process" // vs prior it regressed, vs recold it vanished: contention or once-per-process cost
            case None if c2.wallSec < c.wallSec * 0.6 => "once_per_process_or_contention"
            case None => "genuine_cold_cost" // reproduces; no prior to compare
          })
        Entry(name, c, w, Some((c2, w2)), warmVerdict, coldVerdict)
      }
    }
    def js(entries: Seq[(String, Double)]) = entries
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val failed = results.filter(_.err.isDefined)
    failed.foreach { e =>
      System.err.println(s"[bench] ${e.name} FAILED: ${e.err.get}")
    }
    val ok = results.filter(_.err.isEmpty)
    val total = ok.map(_.coldSec).sum
    val totalWarm = ok.map(_.warmSec).sum
    // Residual-interference tell: max storage-memory (MB) found in use at
    // any query's start. ~0 proves every timing started from a clean
    // block manager (hardReset works); large values mean the reset
    // failed and per-query numbers are suspect.
    val maxResidualMb = if (results.isEmpty) 0L
      else results.map(e => math.max(e.cold.storageAtStartMb, e.warm.storageAtStartMb)).max
    val errJs = failed.map(f => "\"" + f.name + "\"").mkString("[", ",", "]")
    def reJs(e: Entry, verdict: String, extra: String): String = {
      val (c2, w2) = e.remeasured.get
      f""""${e.name}":{"cold":${e.cold.wallSec}%.2f,"warm":${e.warm.wallSec}%.2f,"recold":${c2.wallSec}%.2f,"rewarm":${w2.wallSec}%.2f,"verdict":"$verdict"$extra,"load":${w2.load}%.1f,"cpu_frac":${w2.cpuFrac}%.2f,"gc_sec":${w2.gcSec}%.2f,"jit_sec":${w2.jitSec}%.2f}"""
    }
    // Warm-inversion audit — one object per first-pass inversion, with
    // the re-measured pair and the verdict. Empty = clean.
    val invJs = results.filter(e => e.warmVerdict.isDefined).map { e =>
      reJs(e, e.warmVerdict.get, "")
    }.mkString("{", ",", "}")
    // Cold-outlier audit — same shape, plus the prior-round cold when
    // one exists (the number the outlier was judged against).
    val coldJs = results.filter(e => e.coldVerdict.isDefined).map { e =>
      val p = prior.get(e.name).map(v => f""","prior_cold":$v%.2f""").getOrElse("")
      reJs(e, e.coldVerdict.get, p)
    }.mkString("{", ",", "}")
    val unexplained = results.count(_.warmVerdict.contains("true_warm_regression"))
    val coldRegressed = results.count(_.coldVerdict.contains("true_cold_regression"))
    // CONTAMINATION GATE (r13 lesson): the r13 artifact of record was
    // taken at loadavg 9-12 (median of the bench: 3.2) and its graph-
    // family colds read 2-8x their idle-box values — recognizable only
    // by cross-referencing per-query telemetry by hand. The artifact now
    // stamps ITSELF: any query whose EXTERNAL load AT COLD-RUN START
    // (1-min loadavg minus this process's own kernel-mirroring R+D
    // task-count EMA — see ExternalLoad for why the two simpler
    // subtractions self-flagged an idle box) exceeds `loadGate`
    // (default cpus/8; overridable via SPARK_GRAFT_LOAD_GATE)
    // is listed in `contaminated_queries` with both numbers and flips
    // the top-level `"contaminated"` flag, so a loaded box can never
    // again produce a silent-looking final artifact. Gating on the COLD
    // start only: the cold number is the headline and the comparable.
    val loadGate = sys.env.get("SPARK_GRAFT_LOAD_GATE").map(_.toDouble)
      .getOrElse(ncores / 8.0)
    val contaminatedQ = results.filter(e => e.cold.extLoad > loadGate)
    val contamJs = contaminatedQ
      .map(e => f""""${e.name}":{"ext":${e.cold.extLoad}%.1f,"load":${e.cold.load}%.1f}""")
      .mkString("{", ",", "}")
    val head = s""""unit":"sec","sf":"$sfDir","n_queries":${results.size},"n_errors":${failed.size},"errors":$errJs,"max_residual_storage_mb":$maxResidualMb,"inversions":$invJs,"cold_outliers":$coldJs,"n_unexplained_inversions":$unexplained,"n_cold_regressions":$coldRegressed,"load_gate":${f"$loadGate%.1f"},"contaminated":${contaminatedQ.nonEmpty},"contaminated_queries":$contamJs,"total_warm":${f"$totalWarm%.3f"},"value":${f"$total%.3f"}"""
    // Per-query telemetry: [load, ext_load, cpu_frac, gc_sec, jit_sec]
    // for the cold run then the warm run — the reader can attribute ANY
    // suspicious number, not just flagged ones.
    val telemJs = ok.map { e =>
      def t(r: Run) = f"${r.load}%.1f,${r.extLoad}%.1f,${r.cpuFrac}%.2f,${r.gcSec}%.2f,${r.jitSec}%.2f"
      s""""${e.name}":[${t(e.cold)},${t(e.warm)}]"""
    }.mkString("{", ",", "}")
    val fullLine = s"""{"metric":"total_full",$head,"queries":${js(ok.map(e => (e.name, e.coldSec)))},"warm":${js(ok.map(e => (e.name, e.warmSec)))},"telemetry":$telemJs}"""
    // The artifact of record for the FULL detail: the driver's stdout
    // capture keeps only a ~2 KB tail (r11 lost the telemetry arrays to
    // it), so the complete object goes to a committed repo file too.
    java.nio.file.Files.write(java.nio.file.Paths.get("bench-latest.json"),
      (fullLine + "\n").getBytes("UTF-8"))
    println(fullLine)
    // The LAST line is short enough (~1 KB) to always survive the tail
    // capture intact and parse: headline totals + the top-10 cold and warm
    // queries — round-over-round per-query comparability can't be eaten by
    // truncation again.
    val topCold = ok.sortBy(-_.coldSec).take(10).map(e => (e.name, e.coldSec))
    val topWarm = ok.sortBy(-_.warmSec).take(10).map(e => (e.name, e.warmSec))
    println(s"""{"metric":"total",$head,"queries":${js(topCold)},"warm_top":${js(topWarm)}}""")
    spark.stop()
  }
}
