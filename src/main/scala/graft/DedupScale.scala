package graft

import org.apache.spark.sql.functions._

/** Dedup scale smoke: MinHash+LSH near-dup detection over a corpus
  * replicated R× (each replica id-offset and tagged with one extra
  * token, so replicas of a document are ~0.95-Jaccard near-dups of each
  * other). Replication multiplies both the corpus AND the true-pair
  * count (each dup family grows to R members → R(R-1)/2 pairs), so this
  * exercises exactly the regime banding exists for: candidate
  * generation must stay O(n·bands) while the verified output grows
  * quadratically within families only.
  *
  * Usage: runMain graft.DedupScale [sfDir] [replicas...]
  */
object DedupScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 5, 20)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    // per-phase Spark job counter: the CC change-count fold claims two
    // shuffles and ONE action per round — jobs-per-round is the
    // observable for that claim. APPROXIMATE by construction: listener
    // events arrive asynchronously on the bus, so a read right after an
    // action can lag by a job or bleed one into the next phase; good
    // enough for the order-of-magnitude claim it backs (12 vs 24 jobs),
    // not for exact equality assertions.
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    val base = Tables.documents(spark, sfDir).select("doc_id", "text")
    val baseN = base.count()
    for (r <- reps) {
      val docs = spark.range(r).crossJoin(base)
        .select((col("doc_id") * r + col("id")).as("doc_id"),
          concat(col("text"), lit(" replicatag"), col("id")).as("text"))
      val t0 = System.nanoTime()
      val pairs = dedup.MinHashLsh.similarPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.8)
      val nPairs = pairs.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[dedupscale] docs=${baseN * r}%8d (R=$r%3d)  pairs=$nPairs%10d  ${secs}%8.2f s")

      // transitive clustering over the pair graph — each replica family
      // must collapse to ONE cluster whose canonical id is its min member
      val j1 = jobs.get()
      val t1 = System.nanoTime()
      val comps = operators.ConnectedComponents.minLabel(pairs, "id_a", "id_b")
      val nClusters = comps.select("comp").distinct().count()
      val cSecs = (System.nanoTime() - t1) / 1e9
      val cJobs = jobs.get() - j1
      println(f"[ccscale]    docs=${baseN * r}%8d (R=$r%3d)  edges=$nPairs%10d  clusters=$nClusters%8d  jobs=$cJobs%4d  ${cSecs}%8.2f s")

      // same graph through the diameter-independent star transform —
      // same cluster count by construction
      val t2 = System.nanoTime()
      val comps2 = operators.ConnectedComponents.starComponents(pairs, "id_a", "id_b")
      val nClusters2 = comps2.select("comp").distinct().count()
      val sSecs = (System.nanoTime() - t2) / 1e9
      val rounds = operators.ConnectedComponents.lastStarRounds.get()
      println(f"[ccstar]     docs=${baseN * r}%8d (R=$r%3d)  edges=$nPairs%10d  clusters=$nClusters2%8d  rounds=$rounds%2d  ${sSecs}%8.2f s")
      require(nClusters2 == nClusters, s"star=$nClusters2 != minLabel=$nClusters")

      // span-level dedup over the same replicated corpus (replicas share
      // every k-gram except the per-replica tag): hashed shingle keys on
      // the wire, cost tracks the shingle volume — linear in R
      val t3 = System.nanoTime()
      val nSpans = text.Corpus.substringSpans(docs, "doc_id", "text", k = 8, minDocs = 2)
        .count()
      val spSecs = (System.nanoTime() - t3) / 1e9
      println(f"[spanscale]  docs=${baseN * r}%8d (R=$r%3d)  spans=$nSpans%10d  ${spSecs}%8.2f s")
      Blocks.releaseAll(spark)
    }

    // incremental path: index the largest corpus ONCE, then dedup a
    // 1×-base delta (exact-copy twins, fresh ids) against it — the cost
    // that matters is deltaPairs, which must scale with the DELTA, not
    // with the indexed corpus (full recompute at R=max is the
    // [dedupscale] line above)
    {
      val r = reps.max
      val docs = spark.range(r).crossJoin(base)
        .select((col("doc_id") * r + col("id")).as("doc_id"),
          concat(col("text"), lit(" replicatag"), col("id")).as("text"))
      val t0 = System.nanoTime()
      dedup.IncrementalDedup.writeIndex(docs, "doc_id", "text", "dsidx", buckets = 32)
      val tIdx = (System.nanoTime() - t0) / 1e9
      // id spaces must be pairwise disjoint (corpus < delta < delta2):
      // appended delta ids live in the index when delta2 runs, and an id
      // collision would trip the operator's re-ingestion guard instead
      // of pairing (caught: the old `baseN*r` / `baseN*(r+1)` offsets
      // overlap for any r > 1)
      val delta = base.select((col("doc_id") * r + lit(baseN * r * 10L)).as("doc_id"),
        concat(col("text"), lit(" replicatag0")).as("text"))
      val t1 = System.nanoTime()
      val dp1 = dedup.IncrementalDedup.deltaPairs(spark, delta, "doc_id", "text",
        "dsidx", minJaccard = 0.8)
      val nDelta = dp1.count()
      val tDelta = (System.nanoTime() - t1) / 1e9
      println(f"[incdedup]   corpus=${baseN * r}%8d delta=$baseN%8d  pairs=$nDelta%10d  index=${tIdx}%8.2f s  delta=${tDelta}%8.2f s")
      // the full cycle: fold the delta in (append must cost O(delta), not
      // O(index) — the bucketed tables never rewrite), then run a second
      // delta of twins of the FIRST delta; its pairs are index-side hits
      // that only exist if the append really landed
      val t2 = System.nanoTime()
      dedup.IncrementalDedup.appendToIndex(delta, "doc_id", "text", "dsidx")
      val tApp = (System.nanoTime() - t2) / 1e9
      val delta2 = base.select((col("doc_id") * r + lit(baseN * r * 20L)).as("doc_id"),
        concat(col("text"), lit(" replicatag0")).as("text"))
      val t3 = System.nanoTime()
      val dp2 = dedup.IncrementalDedup.deltaPairs(spark, delta2, "doc_id", "text",
        "dsidx", minJaccard = 0.8)
      val nDelta2 = dp2.count()
      val tDelta2 = (System.nanoTime() - t3) / 1e9
      require(nDelta2 > nDelta,
        s"second delta must see first-delta twins as index pairs: $nDelta2 <= $nDelta")
      println(f"[incappend]  corpus=${baseN * (r + 1)}%8d delta=$baseN%8d  pairs=$nDelta2%10d  append=${tApp}%8.2f s  delta=${tDelta2}%8.2f s")

      // incremental clustering over the measured pair stream: labels
      // from the first delta's pairs, the second delta's pairs folded in
      // O(affected) — the merge must not track the label-table size
      val t4 = System.nanoTime()
      operators.IncrementalCC.writeLabels(dp1, "id_a", "id_b", "dscc", buckets = 32)
      val tCcBuild = (System.nanoTime() - t4) / 1e9
      val t5 = System.nanoTime()
      val nChanged = operators.IncrementalCC.mergeEdges(spark, dp2, "id_a", "id_b", "dscc").count()
      val tCcMerge = (System.nanoTime() - t5) / 1e9
      val nComps = operators.IncrementalCC.readLabels(spark, "dscc")
        .select("comp").distinct().count()
      println(f"[inccc]      edges=$nDelta%10d +$nDelta2%8d  affected=$nChanged%8d  comps=$nComps%8d  build=${tCcBuild}%6.2f s  merge=${tCcMerge}%6.2f s")
      Blocks.releaseAll(spark)
    }

    // incremental ANN at the same scales: IVF index over the R× vector
    // corpus (frozen centroids), a 1×-base delta appended in O(delta),
    // then a probe-restricted search over the grown index
    {
      val emb0 = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      val embN0 = emb0.count()
      val r = reps.max
      val vecs = spark.range(r).crossJoin(emb0)
        .select((col("vec_id") * r + col("id")).as("vec_id"), col("embedding"))
      val t0 = System.nanoTime()
      sim.IncrementalAnn.writeIndex(vecs, "vec_id", "embedding", "dsann",
        kCoarse = 32, iters = 3, buckets = 32)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val delta = emb0.select((col("vec_id") + lit(embN0.toDouble * (r + 1)).cast("long"))
        .as("vec_id"), col("embedding"))
      val t1 = System.nanoTime()
      sim.IncrementalAnn.appendVectors(delta, "vec_id", "embedding", "dsann")
      val tApp2 = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val nHits = sim.IncrementalAnn.topK(spark,
        emb0.filter(col("vec_id") < 10), "vec_id", "embedding", "dsann",
        k = 5, nprobe = 8).count()
      val tQ = (System.nanoTime() - t2) / 1e9
      println(f"[incann]     vecs=${embN0 * r}%9d delta=$embN0%8d  hits=$nHits%6d  build=${tBuild}%7.2f s  append=${tApp2}%6.2f s  query=${tQ}%6.2f s")
      Blocks.releaseAll(spark)
    }

    // incremental aggregation at the same scales: build the state over
    // the R× fact table once, then fold in a 1×-base batch — append
    // cost must track the DELTA (partial-agg of the batch + bucketed
    // append), and the folded read the KEY count, never the fact count
    {
      val ev = Tables.events(spark, sfDir).select(col("event_id"),
        col("event_type"), to_date(col("ts")).as("d"), col("value"))
      val evN = ev.count()
      val r = reps.max
      val facts = spark.range(r).crossJoin(ev)
        .select((col("event_id") * r + col("id")).as("event_id"),
          col("event_type"), col("d"), col("value"))
      val keys = Seq("d", "event_type")
      val t0 = System.nanoTime()
      etl.IncrementalAgg.writeState(facts, keys, "value", "dsagg", buckets = 32)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val delta = ev.select((col("event_id") + lit(evN.toDouble * (r + 1)).cast("long"))
        .as("event_id"), col("event_type"), col("d"), col("value"))
      val t1 = System.nanoTime()
      etl.IncrementalAgg.appendDelta(delta, keys, "value", "dsagg", batchId = 0)
      val tApp = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val total = etl.IncrementalAgg.read(spark, "dsagg").agg(sum("cnt")).collect()(0).getLong(0)
      val tRead = (System.nanoTime() - t2) / 1e9
      require(total == evN * (r + 1), s"folded count $total != ${evN * (r + 1)}")
      println(f"[incagg]     facts=${evN * r}%9d delta=$evN%8d  build=${tBuild}%7.2f s  append=${tApp}%6.2f s  read=${tRead}%6.2f s")
      Blocks.releaseAll(spark)
    }

    // ANN path at the same scales: LSH top-k over a replicated embedding
    // corpus (replicas perturbed by index so they are near- but not
    // exact-duplicates in cosine space). Candidate generation must stay
    // O(n·tables) regardless of R.
    // Embedding near-dup via the q38 LSH path: exact replicas are
    // cosine-1.0 near-dups, so expected pairs = n·C(R,2) and recall must
    // be EXACTLY 1 (identical vectors share identical sketches). Bucket
    // bits follow the documented ≈log2(n) rule so buckets stay selective
    // as the corpus grows.
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val embN = emb.count()
    for (r <- reps.filter(_ > 1)) {
      val vecs = spark.range(r).crossJoin(emb)
        .select((col("vec_id") * r + col("id")).as("vec_id"), col("embedding"))
      val bits = math.max(8, (math.log(embN.toDouble * r) / math.log(2)).ceil.toInt)
      val t0 = System.nanoTime()
      val got = sim.LshAnn.nearDupPairs(vecs, "vec_id", "embedding",
        dim = 64, minCosine = 0.9, bitsPerTable = bits).count()
      val secs = (System.nanoTime() - t0) / 1e9
      val want = embN * r * (r - 1) / 2
      val flag = if (got == want) "recall=1.0" else s"MISSING ${want - got}"
      println(f"[neardupscale] vecs=${embN * r}%8d (R=$r%3d, bits=$bits)  pairs=$got%10d/$want%d  $flag  ${secs}%8.2f s")
    }
    for (r <- reps) {
      val vecs = spark.range(r).crossJoin(emb)
        .select((col("vec_id") * r + col("id")).as("vec_id"),
          transform(col("embedding"),
            (x, i) => x + (col("id") % 7).cast("float") * lit(0.001f) * (i % 5).cast("float"))
            .as("embedding"))
      val t0 = System.nanoTime()
      val n = sim.LshAnn.topK(vecs, "vec_id", "embedding",
        isQuery = col("vec_id") < 10, dim = 64, k = 5).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[annscale]   vecs=${embN * r}%8d (R=$r%3d)  rows=$n%10d  ${secs}%8.2f s")
    }

    // Fuzzy linkage at growing string-set sizes: part names tagged with
    // a zero-padded serial (name_00417) — serials differing in one digit
    // are planted lev-1 pairs, so the true pair count grows R·45/2 per
    // name. Length-band cost is Σ|band|²·d·len — the honest quadratic-
    // within-band regime the scaladoc documents (compose a second
    // blocking key when one length dominates).
    val names = Tables.part(spark, sfDir).select(col("p_name")).distinct()
    for (r <- Seq(100, 400)) {
      val tagged = spark.range(r).crossJoin(names)
        .select(concat(col("p_name"), lit("_"), lpad(col("id"), 5, "0")).as("w"))
      val nStrings = tagged.count()
      val t0 = System.nanoTime()
      val nFuzzy = operators.FuzzyJoin.fuzzyPairs(tagged, "w", maxDist = 1).count()
      val fSecs = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val nDel = operators.FuzzyJoin.fuzzyPairsDeletion(tagged, "w", maxDist = 1).count()
      val dSecs = (System.nanoTime() - t1) / 1e9
      val flag = if (nDel == nFuzzy) "equal" else s"MISMATCH $nDel"
      println(f"[fuzzyscale] strings=$nStrings%8d  pairs(d<=1)=$nFuzzy%8d  band=${fSecs}%7.2f s  deletion=${dSecs}%7.2f s  $flag")
    }

    // PageRank on the symmetrized trade graph, replicated into R
    // disjoint copies — per-round cost (one keyed shuffle over edges)
    // must scale linearly in |E|, independent of round count.
    val li = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
    val cs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst")).distinct()
    val e1 = cs.unionByName(cs.select(col("dst").as("src"), col("src").as("dst")))
    for (r <- Seq(1, 4)) {
      val edges = spark.range(r).crossJoin(e1)
        .select(concat(col("id"), lit("_"), col("src")).as("src"),
          concat(col("id"), lit("_"), col("dst")).as("dst"))
      val t0 = System.nanoTime()
      val nodes = operators.PageRank.run(edges, "src", "dst", iters = 10).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[prscale]    edges=${2 * cs.count() * r}%9d nodes=$nodes%8d  iters=10  ${secs}%8.2f s")
    }

    // Triangle census over R disjoint copies of the supplier
    // co-purchase graph: wedge volume (and so runtime) must scale
    // LINEARLY in R — degree orientation bounds each vertex's wedge
    // fan-out, so disjoint replication cannot super-linearize the join.
    val spg = {
      val sp = li.filter(col("l_quantity") > 45)
        .select(col("l_suppkey").as("sk"), col("l_partkey").as("pk")).distinct()
      sp.as("r1").join(sp.as("r2"),
          col("r1.pk") === col("r2.pk") && col("r1.sk") < col("r2.sk"))
        .select(col("r1.sk").as("src"), col("r2.sk").as("dst"))
    }
    for (r <- Seq(1, 4)) {
      val edges = spg.crossJoin(spark.range(r))
        .select((col("src") * r + col("id")).as("src"),
          (col("dst") * r + col("id")).as("dst"))
      val t0 = System.nanoTime()
      val row = operators.Triangles.census(edges, "src", "dst").collect().head
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[triscale]   nodes=${row.getLong(0)}%8d edges=${row.getLong(1)}%9d wedges=${row.getLong(2)}%10d triangles=${row.getLong(3)}%10d  ${secs}%8.2f s")
    }

    // Planted power-law hub (the [triscale] complement: disjoint copies
    // have UNIFORM degree — the orientation bound's whole point is
    // hubs): 200k-node background graph with hash-derived ~6 out-edges
    // per node, plus ONE hub wired to 1% of all nodes (degree 2000 ≈
    // 170× the background mean). Claims measured:
    //   (a) Triangles: the hub adds ~ZERO wedges — orientation points
    //       every hub edge AT the hub (max degree ⇒ never a center), so
    //       wedge volume with the hub ≈ without it;
    //   (b) PageRank/HITS: salted (saltBuckets=8) ≡-shaped runs next to
    //       plain — at local[32] the extra shuffle is visible overhead;
    //       the mechanism exists for 1000-executor partitions where one
    //       hub key exceeds a task, and this stage pins its cost + that
    //       results survive a planted hub;
    //   (c) KCore peels with the hub present.
    {
      val n = 200000L
      val bg = spark.range(n).select(col("id").as("src"),
          explode(array((0 until 6).map(s =>
            pmod(xxhash64(col("id"), lit(s)), lit(n))): _*)).as("dst"))
        .filter(col("src") =!= col("dst"))
      val hub = spark.range(n / 100)
        .select(lit(0L).as("src"), (col("id") * 100 + 1).as("dst"))
        .filter(col("src") =!= col("dst"))
      val withHub = bg.unionByName(hub)
      val t0 = System.nanoTime()
      val noHubRow = operators.Triangles.census(bg, "src", "dst").collect().head
      val t1 = System.nanoTime()
      val hubRow = operators.Triangles.census(withHub, "src", "dst").collect().head
      val t2 = System.nanoTime()
      println(f"[hubscale] tri no-hub: edges=${noHubRow.getLong(1)}%9d wedges=${noHubRow.getLong(2)}%10d  ${(t1 - t0) / 1e9}%7.2f s")
      println(f"[hubscale] tri   hub: edges=${hubRow.getLong(1)}%9d wedges=${hubRow.getLong(2)}%10d  ${(t2 - t1) / 1e9}%7.2f s  (wedge delta=${hubRow.getLong(2) - noHubRow.getLong(2)}%d)")

      val sym = withHub.unionByName(withHub.select(col("dst").as("src"),
        col("src").as("dst")))
      for ((label, buckets) <- Seq(("plain", 1), ("salted8", 8))) {
        val p0 = System.nanoTime()
        operators.PageRank.run(sym, "src", "dst", iters = 5,
          saltBuckets = buckets).count()
        val pr = (System.nanoTime() - p0) / 1e9
        val h0 = System.nanoTime()
        operators.Hits.run(withHub, "src", "dst", iters = 3,
          saltBuckets = buckets).count()
        val hi = (System.nanoTime() - h0) / 1e9
        println(f"[hubscale] $label%-8s pagerank(5 it)=${pr}%7.2f s  hits(3 it)=${hi}%7.2f s")
      }

      val k0 = System.nanoTime()
      val coreN = operators.KCore.core(withHub, "src", "dst", k = 7).count()
      println(f"[hubscale] kcore k=7: core=${coreN}%8d  ${(System.nanoTime() - k0) / 1e9}%7.2f s")

      // LPA rounds shuffle votes BY NEIGHBOR — the hub is the hot key;
      // plain vs salted pins the same trade PageRank's rows measure.
      for ((label, buckets) <- Seq(("plain", 1), ("salted8", 8))) {
        val l0 = System.nanoTime()
        val nLabels = operators.LabelProp.run(sym, "src", "dst",
          rounds = 3, saltBuckets = buckets)
          .select(countDistinct(col("label"))).collect().head.getLong(0)
        println(f"[hubscale] lpa $label%-8s 3 rounds: labels=$nLabels%7d  ${(System.nanoTime() - l0) / 1e9}%7.2f s")
      }
      // BFS from the hub: 2 rounds reach ~everything the hub touches
      // (frontier growth is the cost driver, not total graph size)
      val b0 = System.nanoTime()
      val reached = operators.Bfs.hops(sym, "src", "dst",
        spark.range(1).select(lit(0L).as("node")), "node", rounds = 2).count()
      println(f"[hubscale] bfs 2 rounds from hub: reached=$reached%8d  ${(System.nanoTime() - b0) / 1e9}%7.2f s")
    }

    // BM25 with a 50-query batch over an R×-replicated corpus: the
    // corpus side scans once; query-term restriction keeps the tf/df
    // aggregation on the matched sliver.
    for (r <- Seq(1, 20)) {
      val docs = spark.range(r).crossJoin(base)
        .select((col("doc_id") * r + col("id")).as("doc_id"), col("text"))
      val qs = base.orderBy("doc_id").limit(50)
        .select(col("doc_id").as("qid"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 4)).as("qtext"))
      val t0 = System.nanoTime()
      val n = text.Retrieval.bm25TopK(docs, qs, "doc_id", "text",
        "qid", "qtext", k = 10).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[bm25scale]  docs=${baseN * r}%8d queries=50  rows=$n%6d  ${secs}%8.2f s")
    }

    // Epoch shuffle landing: full-corpus shard write, R×-replicated —
    // one repartition shuffle + per-shard sort; files stay O(shards).
    for (r <- Seq(20)) {
      val docs = spark.range(r).crossJoin(base)
        .select((col("doc_id") * r + col("id")).as("doc_id"), col("text"))
      val out = java.nio.file.Files.createTempDirectory("graft_shardscale").toString
      val t0 = System.nanoTime()
      text.Corpus.writeShards(docs, "doc_id", epoch = 1, numShards = 32, out)
      val secs = (System.nanoTime() - t0) / 1e9
      val nFiles = new java.io.File(out).listFiles().filter(_.isDirectory)
        .map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
      println(f"[shardscale] docs=${baseN * r}%8d shards=32 files=$nFiles%4d  ${secs}%8.2f s")
    }

    // BPE rounds on the aggregated vocabulary: per-round cost is
    // O(|vocab|·len), corpus-size-independent once aggregated.
    val t0b = System.nanoTime()
    val nMerges = text.Bpe.trainMerges(Tables.documents(spark, sfDir), "text",
      numMerges = 5).count()
    val bSecs = (System.nanoTime() - t0b) / 1e9
    println(f"[bpescale]   merges=$nMerges%2d  ${bSecs}%8.2f s (incl. vocab agg)")

    spark.stop()
  }
}
