package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the non-oracle surfaces: sources, synth generator,
  * multimodal plumbing, streaming.
  */
// @Slow: end-to-end pipeline CHAINS (the 3.5 min tier-2 suite) -- the
// quick tier is `testOnly * -- -l org.scalatest.tags.Slow` (README)
@org.scalatest.tags.Slow
class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  test("Io csv/parquet/json/orc roundtrip preserves rows") {
    val df = Tables.nation(spark, sfDir)
    val tmp = Files.createTempDirectory("graft_io").toString
    sources.Io.writeCsv(df, s"$tmp/csv")
    sources.Io.writeParquet(df, s"$tmp/pq", partitionBy = Seq("n_regionkey"))
    sources.Io.writeJsonLines(df, s"$tmp/json")
    sources.Io.writeOrc(df, s"$tmp/orc", partitionBy = Seq("n_regionkey"))
    assert(sources.Io.readCsv(spark, s"$tmp/csv").count() == 25)
    assert(sources.Io.readParquet(spark, s"$tmp/pq").count() == 25)
    assert(sources.Io.readJsonLines(spark, s"$tmp/json").count() == 25)
    val orc = sources.Io.readOrc(spark, s"$tmp/orc")
    assert(orc.count() == 25)
    // ORC scans get the same filter pushdown contract as parquet
    val scan = orc.filter(col("n_nationkey") === 3)
      .queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(n_nationkey), EqualTo(n_nationkey,3)]")
      || scan.contains("n_nationkey"), s"expected pushed filter in ORC scan: $scan")
  }

  test("readBinaryFiles/readText: raw-file ingest feeds the multimodal and corpus pipelines") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_raw").toString
    // a mixed-modality shard dir: two "images", one sidecar the glob
    // must prune without opening
    new java.io.File(s"$tmp/shard=0").mkdirs()
    Files.write(java.nio.file.Paths.get(s"$tmp/shard=0/a.img"),
      Array.tabulate[Byte](64)(i => (i * 7).toByte))
    Files.write(java.nio.file.Paths.get(s"$tmp/shard=0/b.img"),
      Array.tabulate[Byte](32)(i => (255 - i * 3).toByte))
    Files.write(java.nio.file.Paths.get(s"$tmp/shard=0/a.json"),
      "{\"meta\":1}".getBytes)
    val blobs = sources.Io.readBinaryFiles(spark, tmp, glob = Some("*.img"))
    assert(blobs.count() == 2, "glob must prune the sidecar at listing time")
    assert(blobs.schema.fieldNames.toSet ==
      Set("path", "modificationTime", "length", "content"))
    // the binaryFile rows flow straight into the featurize plumbing
    val feats = multimodal.Binary.featurize(
      blobs.select(row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("path")).cast("long").as("id"),
        col("content").as("bytes")).as[multimodal.Binary.Blob])
      .collect().sortBy(_.id)
    assert(feats.map(_.nBytes).toSeq == Seq(64L, 32L))
    assert(feats.forall(_.features.sum > 0.99f), "histogram must normalize")
    // text corpus: line mode and document-per-file mode
    Files.write(java.nio.file.Paths.get(s"$tmp/c1.txt"), "l1\nl2\nl3".getBytes)
    Files.write(java.nio.file.Paths.get(s"$tmp/c2.txt"), "only line".getBytes)
    assert(sources.Io.readText(spark, s"$tmp/*.txt").count() == 4)
    val whole = sources.Io.readText(spark, s"$tmp/*.txt", wholeFile = true)
    assert(whole.count() == 2)
    assert(whole.as[String].collect().sorted.head == "l1\nl2\nl3")
  }

  test("writeJdbc round-trips through an in-process Derby database") {
    // embedded Derby (shipped with Spark for the Hive metastore) stands in
    // for the reference's Postgres: same Spark JDBC writer path end-to-end
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val df = Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_regionkey"), col("n_name"))
    sources.Io.writeJdbc(df, url, "nation_rt", props, numPartitions = 2, batchSize = 10)
    val back = spark.read.jdbc(url, "nation_rt", props)
      .select(col("n_nationkey"), col("n_regionkey"), col("n_name"))
    assert(back.count() == 25)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("stream-stream interval join matches within horizon, drops beyond it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 86400000L
    def ev(id: Long, t: Long, u: Long) =
      streaming.EventStream.Event(id, new java.sql.Timestamp(base + t), u, "x", 1.0)
    val views = MemoryStream[streaming.EventStream.Event]
    val clicks = MemoryStream[streaming.EventStream.Event]
    // user 1: click 10 min after view (in horizon), another 2 h after (out);
    // user 2: click BEFORE the view (never matches)
    views.addData(ev(1, 0, 1), ev(2, 0, 2))
    clicks.addData(ev(101, 600000, 1), ev(102, 7200000, 1), ev(103, -600000, 2))
    val joined = streaming.EventStream.intervalJoin(
      views.toDF(), clicks.toDF(), horizon = "30 minutes")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ij_out").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("ij_out")
      .select("left_id", "right_id", "delay_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set((1L, 101L, 600000L)), s"got $rows")
  }

  test("left-outer interval join emits unmatched events with nulls after the horizon closes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 86400000L
    def ev(id: Long, t: Long, u: Long) =
      streaming.EventStream.Event(id, new java.sql.Timestamp(base + t), u, "x", 1.0)
    val views = MemoryStream[streaming.EventStream.Event]
    val clicks = MemoryStream[streaming.EventStream.Event]
    // user 1 converts in horizon; user 2 never converts — the left-outer
    // join must still emit user 2's view, with null click columns, once
    // the watermark passes its horizon
    views.addData(ev(1, 0, 1), ev(2, 0, 2))
    clicks.addData(ev(101, 600000, 1))
    val joined = streaming.EventStream.intervalJoinLeftOuter(
      views.toDF(), clicks.toDF(), horizon = "30 minutes")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ijlo_out").start()
    q.processAllAvailable()
    // advance both watermarks far past view+horizon so the unmatched row closes
    views.addData(ev(8, 3600L * 3000, 9)); clicks.addData(ev(9, 3600L * 3000, 9))
    q.processAllAvailable()
    views.addData(ev(10, 3600L * 5000, 9)); clicks.addData(ev(11, 3600L * 5000, 9))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("ijlo_out")
      .filter(col("user_id").isin(1L, 2L))
      .select("left_id", "right_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(rows == Set((1L, 101L), (2L, -1L)),
      s"expected the match and a null-emitted unmatched view, got $rows")
  }

  test("Trigger.AvailableNow drains the backlog and terminates (batch-over-stream backfill)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 86400000L
    def ev(id: Long, t: Long) =
      streaming.EventStream.Event(id, new java.sql.Timestamp(base + t), 1L, "click", 1.0)
    val mem = MemoryStream[streaming.EventStream.Event]
    mem.addData((1 to 50).map(i => ev(i.toLong, i * 1000L)): _*)
    val q = streaming.EventStream.windowedAgg(mem.toDF(), windowLen = "10 seconds",
      watermark = "0 seconds")
      .writeStream.outputMode("complete").format("memory").queryName("an_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    // AvailableNow processes everything already in the source, then STOPS
    // on its own — the backfill/catch-up mode; no manual stop needed
    assert(q.awaitTermination(60000), "query must self-terminate")
    assert(spark.table("an_out").agg(sum(col("n"))).first().getLong(0) == 50L)
  }

  test("upsert sink: last write per key wins across and within micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_upsert").toString
    val base = 86400000L
    def ev(id: Long, t: Long, u: Long, v: Double) =
      streaming.EventStream.Event(id, new java.sql.Timestamp(base + t), u, "x", v)
    val mem = MemoryStream[streaming.EventStream.Event]
    // batch 1: user 1 twice (later wins within batch), user 2 once
    mem.addData(ev(1, 1000, 1, 10.0), ev(2, 2000, 1, 11.0), ev(3, 1000, 2, 20.0))
    val q = streaming.EventStream.toUpsertSink(mem.toDF(), s"$tmp/snap", s"$tmp/ck",
      keys = Seq("user_id"), orderCol = "ts").start()
    q.processAllAvailable()
    // batch 2: user 1 updated, user 3 new
    mem.addData(ev(4, 3000, 1, 12.0), ev(5, 1000, 3, 30.0))
    q.processAllAvailable(); q.stop()
    val snap = spark.read.parquet(s"$tmp/snap")
      .select("user_id", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(snap == Map(1L -> 12.0, 2L -> 20.0, 3L -> 30.0), s"got $snap")
  }

  test("upsert batch merge is idempotent — replaying a batch leaves the snapshot unchanged") {
    // foreachBatch is at-least-once: after a crash the same batch can
    // re-run against a snapshot that already merged it
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_upsert_replay").toString
    val snap = s"$tmp/snap"
    val b1 = Seq((1L, 10.0, 1L), (2L, 20.0, 1L)).toDF("k", "v", "seq")
    val b2 = Seq((2L, 25.0, 2L), (3L, 30.0, 2L)).toDF("k", "v", "seq")
    streaming.EventStream.upsertBatch(b1, snap, Seq("k"), "seq")
    streaming.EventStream.upsertBatch(b2, snap, Seq("k"), "seq")
    def read() = spark.read.parquet(snap).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val once = read()
    streaming.EventStream.upsertBatch(b2, snap, Seq("k"), "seq") // replay
    assert(read() == once, "replaying the last batch must be a no-op")
    assert(once == Seq((1L, 10.0, 1L), (2L, 25.0, 2L), (3L, 30.0, 2L)), s"got $once")
  }

  test("streaming dedup sink: each batch pairs against everything seen, folds in; replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_dstream").toString
    val corpus = Tables.documents(spark, sfDir).select("doc_id", "text")
      .filter(col("doc_id") < 60)
    dedup.IncrementalDedup.writeIndex(corpus, "doc_id", "text", "strm", buckets = 2)
    // two micro-batches of twins: batch 1 copies corpus docs, batch 2
    // copies BATCH 1's docs — batch 2's pairs can only be complete if
    // the sink folded batch 1 into the index between them
    val src = corpus.filter(col("doc_id") % 3 === 0).orderBy("doc_id").limit(4)
      .as[(Long, String)].collect().toSeq
    val b1 = src.map { case (id, t) => (id + 1000L, t) }
    val b2 = src.map { case (id, t) => (id + 2000L, t) }
    val mem = MemoryStream[(Long, String)]
    val q = streaming.DedupStream.toDedupSink(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", "strm",
      s"$tmp/pairs", s"$tmp/ck", minJaccard = 0.8).start()
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()

    def pairSet() = spark.read.parquet(s"$tmp/pairs")
      .select(col("batch").cast("long"), col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val once = pairSet()
    val batch2 = once.filter(_._1 == 1L)
    assert(batch2.exists { case (_, a, b) =>
      (a >= 1000L && a < 2000L) || (b >= 1000L && b < 2000L) },
      s"batch 2 must pair against batch-1 docs through the index: $batch2")
    // every batch-2 twin found its corpus original AND its batch-1 twin
    src.foreach { case (id, _) =>
      assert(batch2.contains((1L, id, id + 2000L)), s"missing corpus pair for $id")
      assert(batch2.contains((1L, id + 1000L, id + 2000L)), s"missing cross-batch pair for $id")
    }

    // at-least-once replay of the LAST batch: identical pairs (the
    // partition dir is overwritten with the same rows), zero new index
    // rows (the append's anti-join gate)
    val setsN = spark.table("strm_sets").count()
    val bandsN = spark.table("strm_bands").count()
    streaming.DedupStream.dedupBatch(b2.toDF("doc_id", "text"), 1L,
      "doc_id", "text", "strm", s"$tmp/pairs", minJaccard = 0.8)
    assert(pairSet() == once, "replay must leave the pair output byte-stable")
    assert(spark.table("strm_sets").count() == setsN, "replay duplicated set rows")
    assert(spark.table("strm_bands").count() == bandsN, "replay duplicated band rows")
  }

  test("toDedupSink compactEvery cadence keeps the directory count bounded across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_dcadence").toString
    val corpus = Tables.documents(spark, sfDir).select("doc_id", "text")
      .filter(col("doc_id") < 60)
    dedup.IncrementalDedup.writeIndex(corpus, "doc_id", "text", "cadidx", buckets = 2)
    val src = corpus.filter(col("doc_id") % 3 === 0).orderBy("doc_id").limit(4)
      .as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val q = streaming.DedupStream.toDedupSink(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", "cadidx",
      s"$tmp/pairs", s"$tmp/ck", minJaccard = 0.8, compactEvery = 2).start()
    // four micro-batches of twins at distinct id offsets; the cadence
    // fires after batches 1 and 3, each fold sparing the newest dir
    for (off <- Seq(1000L, 2000L, 3000L, 4000L)) {
      mem.addData(src.map { case (id, t) => (id + off, t) }: _*)
      q.processAllAvailable()
    }
    q.stop()
    val dirs = new java.io.File(s"$tmp/pairs").listFiles
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("batch=")).toSet
    assert(dirs == Set("batch=-1", "batch=3"), s"cadence left $dirs")
    // nothing lost to the folds: every twin still pairs with its corpus
    // original through the consolidated directory
    val pairs = streaming.DedupStream.readPairs(spark, s"$tmp/pairs")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (off <- Seq(1000L, 2000L, 3000L, 4000L); (id, _) <- src)
      assert(pairs.contains((id, id + off)), s"missing corpus pair for $id at +$off")
  }

  test("compactPairs bounds the pair-directory count; pair set and block state unchanged") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_dcompact").toString
    val pairsPath = s"$tmp/pairs"
    val corpus = Tables.documents(spark, sfDir).select("doc_id", "text")
      .filter(col("doc_id") < 60)
    dedup.IncrementalDedup.writeIndex(corpus, "doc_id", "text", "cmpidx", buckets = 2)
    val src = corpus.filter(col("doc_id") % 3 === 0).orderBy("doc_id").limit(6)
      .as[(Long, String)].collect().toSeq
    val blocksBefore = Blocks.persistedIds(spark)
    for ((off, bid) <- Seq(1000L, 2000L, 3000L).zipWithIndex)
      streaming.DedupStream.dedupBatch(
        src.map { case (id, t) => (id + off, t) }.toDF("doc_id", "text"),
        bid.toLong, "doc_id", "text", "cmpidx", pairsPath, minJaccard = 0.8)
    // each batch freed exactly the checkpoint blocks it created — a leak
    // here compounds over thousands of micro-batches (VERDICT r6 item 7)
    assert(Blocks.persistedIds(spark) == blocksBefore,
      "dedupBatch leaked persisted blocks")

    def pairs() = streaming.DedupStream.readPairs(spark, pairsPath)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def dirs() = new java.io.File(pairsPath).listFiles
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("batch=")).toSet
    val full = pairs()
    assert(full.nonEmpty && dirs() == Set("batch=0", "batch=1", "batch=2"))

    // fold everything but the newest (replayable) batch into batch=-1
    assert(streaming.DedupStream.compactPairs(spark, pairsPath, keepLatest = 1) == 2)
    assert(dirs() == Set("batch=-1", "batch=2"), s"got ${dirs()}")
    assert(pairs() == full, "compaction changed the pair set")
    // converged: a second pass finds nothing to fold
    assert(streaming.DedupStream.compactPairs(spark, pairsPath, keepLatest = 1) == 0)

    // a later batch folds into the SAME consolidated dir on the next pass
    streaming.DedupStream.dedupBatch(
      src.map { case (id, t) => (id + 4000L, t) }.toDF("doc_id", "text"),
      3L, "doc_id", "text", "cmpidx", pairsPath, minJaccard = 0.8)
    val full2 = pairs()
    assert(streaming.DedupStream.compactPairs(spark, pairsPath, keepLatest = 1) == 1)
    assert(dirs() == Set("batch=-1", "batch=3"), s"got ${dirs()}")
    assert(pairs() == full2, "second compaction changed the pair set")
  }

  test("IncrementalDedup.compactIndex bounds index files, preserves content, survives both crash windows") {
    import spark.implicits._
    val corpus = Tables.documents(spark, sfDir).select("doc_id", "text")
      .filter(col("doc_id") < 60)
    dedup.IncrementalDedup.writeIndex(corpus, "doc_id", "text", "cixidx",
      buckets = 2)
    for (off <- Seq(1000L, 2000L, 3000L, 4000L))
      dedup.IncrementalDedup.appendToIndex(
        corpus.filter(col("doc_id") % 3 === 0).limit(4)
          .select((col("doc_id") + off).as("doc_id"), col("text")),
        "doc_id", "text", "cixidx")
    def files(t: String) = {
      val loc = new java.io.File(
        org.apache.spark.sql.GraftShims.tableLocation(spark, t))
      loc.listFiles().count(_.getName.endsWith(".parquet"))
    }
    def rows(t: String) = spark.table(t).distinct().collect()
      .map(_.toString).sorted.toSeq
    val setsBefore = rows("cixidx_sets")
    val bandsBefore = rows("cixidx_bands")
    val filesBefore = files("cixidx_sets")
    assert(filesBefore > 2, s"appends should fragment, got $filesBefore")
    dedup.IncrementalDedup.compactIndex(spark, "cixidx")
    assert(files("cixidx_sets") <= 2 && files("cixidx_bands") <= 2,
      "compaction must fold files back to <= buckets")
    assert(rows("cixidx_sets") == setsBefore, "sets content changed")
    assert(rows("cixidx_bands") == bandsBefore, "bands content changed")
    // bucket layout survives: a post-compaction append still works and
    // the delta pair path still sees everything
    dedup.IncrementalDedup.appendToIndex(
      corpus.filter(col("doc_id") % 3 === 0).limit(4)
        .select((col("doc_id") + 5000L).as("doc_id"), col("text")),
      "doc_id", "text", "cixidx")
    assert(spark.table("cixidx_sets").count() == setsBefore.size + 4L)
    // crash window A (before the old table drops): orphan _new discarded
    spark.table("cixidx_sets").limit(1).write
      .saveAsTable("cixidx_sets_new")
    dedup.IncrementalDedup.recover(spark, "cixidx")
    assert(!spark.catalog.tableExists("cixidx_sets_new"))
    assert(spark.table("cixidx_sets").count() == setsBefore.size + 4L)
    // crash window B (after the drop): completed rebuild promoted —
    // the _new table is the real bucketed rebuild, as compactIndex
    // would have written it
    val all = spark.table("cixidx_bands").localCheckpoint()
    dedup.IncrementalDedup.dropForRebuild(spark, "cixidx_bands_new")
    sources.Io.writeBucketed(all, "cixidx_bands_new", "bh", 2)
    dedup.IncrementalDedup.dropForRebuild(spark, "cixidx_bands")
    dedup.IncrementalDedup.recover(spark, "cixidx")
    assert(spark.catalog.tableExists("cixidx_bands") &&
      !spark.catalog.tableExists("cixidx_bands_new"))
    assert(rows("cixidx_bands").size == all.distinct().count().toInt)
  }

  test("partitioned parquet writes are bounded to one file per partition") {
    val tmp = Files.createTempDirectory("graft_fpp").toString
    val ev = Tables.events(spark, sfDir).repartition(8)
      .withColumn("date", to_date(col("ts")))
    sources.Io.writeParquet(ev, s"$tmp/by_date", partitionBy = Seq("date"))
    val counts = new java.io.File(s"$tmp/by_date").listFiles()
      .filter(_.getName.startsWith("date="))
      .map(d => d.listFiles().count(_.getName.endsWith(".parquet")))
    assert(counts.nonEmpty && counts.forall(_ == 1),
      s"expected 1 file per date partition (pre-shuffle on the key), got ${counts.toSeq}")
  }

  test("compact rewrites a fragmented dataset into few files, preserving rows") {
    val tmp = Files.createTempDirectory("graft_compact").toString
    val ev = Tables.events(spark, sfDir)
    ev.repartition(64).write.parquet(s"$tmp/frag") // 64 tiny files
    val before = new java.io.File(s"$tmp/frag").listFiles().count(_.getName.endsWith(".parquet"))
    assert(before >= 32, s"setup should fragment, got $before files")
    sources.Io.compact(spark, s"$tmp/frag", targetBytes = 64L * 1024 * 1024)
    val after = new java.io.File(s"$tmp/frag").listFiles().count(_.getName.endsWith(".parquet"))
    assert(after < before / 8, s"expected compaction, got $after files (was $before)")
    assert(spark.read.parquet(s"$tmp/frag").count() == ev.count())
  }

  test("writeZOrdered clusters box queries into fewer files than a linear sort, rows intact") {
    val tmp = Files.createTempDirectory("graft_zorder").toString
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    sources.Io.writeZOrdered(li, s"$tmp/z", Seq("l_orderkey", "l_partkey"), numFiles = 16)
    li.repartitionByRange(16, col("l_orderkey")).sortWithinPartitions("l_orderkey")
      .write.parquet(s"$tmp/linear")
    // rows survive the layout rewrite byte-for-byte
    val z = spark.read.parquet(s"$tmp/z")
    assert(z.count() == li.count() && z.columns.sorted.sameElements(li.columns.sorted))
    // a filter on the NON-leading dimension: the linear layout scatters
    // l_partkey across every file; the z-layout confines its low range
    // to the files whose interleaved high bits allow it
    val Array(pkLo, pkHi) = li.agg(min("l_partkey"), max("l_partkey"))
      .collect().map(r => Array(r.getLong(0), r.getLong(1))).head
    val box = col("l_partkey") <= pkLo + (pkHi - pkLo) / 8
    def filesTouched(path: String) = spark.read.parquet(path).filter(box)
      .select(input_file_name()).distinct().count()
    val (zf, lf) = (filesTouched(s"$tmp/z"), filesTouched(s"$tmp/linear"))
    assert(lf >= 12, s"linear layout should scatter the partkey range everywhere, got $lf/16")
    assert(zf < lf / 2, s"z-order must confine the box: z=$zf linear=$lf files")
    // and the filtered ROWS are identical — layout never changes results
    assert(z.filter(box).count() == li.filter(box).count())
  }

  test("compact preserves a hive-partitioned layout when given the partition columns") {
    val tmp = Files.createTempDirectory("graft_compact_part").toString
    val ev = Tables.events(spark, sfDir).withColumn("date", to_date(col("ts")))
    // fragment each partition dir: many tasks × partitionBy
    ev.repartition(16).write.partitionBy("date").parquet(s"$tmp/part")
    val dirsBefore = new java.io.File(s"$tmp/part").listFiles()
      .filter(_.getName.startsWith("date=")).map(_.getName).toSet
    sources.Io.compact(spark, s"$tmp/part", partitionCols = Seq("date"))
    val dirsAfter = new java.io.File(s"$tmp/part").listFiles()
      .filter(_.getName.startsWith("date=")).map(_.getName).toSet
    assert(dirsAfter == dirsBefore, "partition directories must survive compaction")
    val files = new java.io.File(s"$tmp/part").listFiles()
      .filter(_.getName.startsWith("date="))
      .map(d => d.listFiles().count(_.getName.endsWith(".parquet")))
    assert(files.forall(_ == 1), s"expected 1 file per partition after compact, got ${files.toSeq}")
    assert(spark.read.parquet(s"$tmp/part").count() == ev.count())
  }

  test("swap recovery heals a crash between the two renames (stranded __old)") {
    import org.apache.hadoop.fs.Path
    val tmp = Files.createTempDirectory("graft_swapfix").toString
    val live = s"$tmp/ds"
    Tables.events(spark, sfDir).limit(100).write.parquet(live)
    val fs = new Path(live).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the crash window: live renamed to __old, new data never moved in
    assert(fs.rename(new Path(live), new Path(live + "__old")))
    assert(!fs.exists(new Path(live)))
    sources.Io.compact(spark, live) // first action recovers, then compacts
    assert(fs.exists(new Path(live)) && !fs.exists(new Path(live + "__old")))
    assert(spark.read.parquet(live).count() == 100)
  }

  test("schema evolution: mergeSchema surfaces new columns as nulls in old files") {
    val tmp = Files.createTempDirectory("graft_evolve").toString
    val v1 = Tables.events(spark, sfDir).limit(50)
      .select(col("event_id"), col("user_id"), col("value"))
    v1.write.parquet(s"$tmp/ds") // schema v1
    val v2 = Tables.events(spark, sfDir).limit(50)
      .select(col("event_id") + 1000000L as "event_id", col("user_id"), col("value"),
        col("event_type").as("channel")) // schema v2 adds a column
    v2.write.mode("append").parquet(s"$tmp/ds")
    val merged = sources.Io.readParquet(spark, s"$tmp/ds", mergeSchema = true)
    assert(merged.columns.contains("channel"), "new column must surface")
    assert(merged.count() == 100)
    // old files: channel is null; new files: populated
    assert(merged.filter(col("event_id") < 1000000L && col("channel").isNull).count() == 50)
    assert(merged.filter(col("event_id") >= 1000000L && col("channel").isNotNull).count() == 50)
  }

  test("registerAll exposes every table to pure SQL, composing with registered functions") {
    Tables.registerAll(spark, sfDir)
    val r = spark.sql(
      """SELECT n_name, count(*) AS n, aqi_category(avg(e.value)) AS cat
        |FROM events e
        |JOIN customer c ON e.user_id = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n_name ORDER BY n DESC LIMIT 3""".stripMargin).collect()
    assert(r.length == 3 && r(0).getLong(1) > 0 && r(0).getString(2).nonEmpty)
  }

  test("SQL sorted_intersect_count is registered and agrees with array_intersect") {
    val r = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 3L, 7L), array(3L, 5L, 7L, 9L)) AS c").first()
    assert(r.getLong(0) == 2L)
  }

  test("corrupt JSON lines are captured, not dropped or fatal") {
    import org.apache.spark.sql.types._
    val tmp = Files.createTempDirectory("graft_corrupt").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$tmp/in.json"),
      """{"id": 1, "v": "ok"}
        |{"id": 2 BROKEN
        |{"id": 3, "v": "fine"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("_corrupt_record", StringType)))
    val df = sources.Io.readJsonLines(spark, s"$tmp/in.json", Some(schema))
    assert(df.count() == 3, "PERMISSIVE mode must keep all lines")
    val corrupt = df.filter(col("_corrupt_record").isNotNull).collect()
    assert(corrupt.length == 1 && corrupt(0).getAs[String]("_corrupt_record").contains("BROKEN"))
    assert(df.filter(col("id").isNotNull).count() == 2)
  }

  test("readParquet mergeSchema reconciles evolved schemas") {
    val tmp = Files.createTempDirectory("graft_ms").toString
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "s").write.parquet(s"$tmp/t/b1")
    Seq((2L, "b", 9.5)).toDF("id", "s", "score").write.parquet(s"$tmp/t/b2")
    val merged = sources.Io.readParquet(spark, s"$tmp/t/*", mergeSchema = true)
    assert(merged.columns.toSet == Set("id", "s", "score"))
    val byId = merged.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(merged.columns.indexOf("score")), "old file gets null for new column")
    assert(byId(2L).getDouble(merged.columns.indexOf("score")) == 9.5)
  }

  test("Synth generator is deterministic and partition-independent") {
    val a = etl.Synth.airQuality(spark, 3, 48).repartition(2)
    val b = etl.Synth.airQuality(spark, 3, 48).repartition(7)
    assert(a.count() == 3 * 48)
    val ha = a.agg(sum(hash(a.columns.map(col): _*))).first().getLong(0)
    val hb = b.agg(sum(hash(b.columns.map(col): _*))).first().getLong(0)
    assert(ha == hb, "generation must not depend on partitioning")
    val missing = a.filter(col("pm25").isNull).count()
    assert(missing > 0 && missing < a.count() / 10, "~2% missing pm25")
  }

  test("Binary.featurize batches deterministically with real schema") {
    import spark.implicits._
    val blobs = Tables.documents(spark, sfDir).limit(100)
      .select(col("doc_id").as("id"), col("text").cast("binary").as("bytes"))
      .as[multimodal.Binary.Blob]
    val feats = multimodal.Binary.featurize(blobs, batchSize = 16).collect()
    assert(feats.length == 100)
    feats.foreach { f =>
      assert(f.nBytes > 0)
      assert(math.abs(f.features.sum - 1.0f) < 1e-3, "histogram normalized")
      assert(f.meanByte > 0 && f.meanByte < 255)
    }
  }

  test("streaming windowedAgg equals the batch twin on the same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[streaming.EventStream.Event]
    val mem = MemoryStream[streaming.EventStream.Event]
    mem.addData(batch.collect().toIndexedSeq)
    val q = streaming.EventStream.windowedAgg(mem.toDF())
      .writeStream.outputMode("complete").format("memory").queryName("win_out").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("win_out")
      .select(col("bucket"), col("event_type"), col("n"), col("sum_value"))
    val expected = streaming.EventStream.windowedAgg(batch.toDF())
    assert(streamed.count() == expected.count())
    assert(streamed.exceptAll(expected).isEmpty && expected.exceptAll(streamed).isEmpty)
  }

  test("AirQualityPipeline runs end-to-end: extract→transform→load→validate") {
    val tmp = Files.createTempDirectory("graft_pipeline").toString
    val report = etl.AirQualityPipeline.run(spark, tmp, stations = 3, hours = 7 * 24).first()
    assert(report.getLong(report.fieldIndex("total_records")) == 3 * 7 * 24)
    assert(report.getLong(report.fieldIndex("unique_stations")) == 3)
    assert(report.getDouble(report.fieldIndex("null_pct")) < 5.0)
    assert(report.getLong(report.fieldIndex("records_good_quality")) > 0)
    // the load phase actually landed files, partitioned by date
    val finalDf = spark.read.parquet(s"$tmp/air_quality_final")
    assert(finalDf.count() == 3 * 7 * 24)
    assert(new java.io.File(s"$tmp/air_quality_final").listFiles()
      .exists(_.getName.startsWith("date=")), "hive-partitioned by date")
    assert(spark.read.option("header", "true").csv(s"$tmp/air_quality_daily_csv").count() == 3 * 7)
  }

  test("transform interpolates ALL numeric columns (pm10 gaps filled, ref dag:161-167)") {
    val raw = etl.Synth.airQuality(spark, 3, 14 * 24)
    val rawNullPm10 = raw.filter(col("pm10").isNull).count()
    assert(rawNullPm10 > 0, "synth must inject pm10 gaps (dag:96-100)")
    val out = etl.AirQualityPipeline.transform(raw)
    // isolated 2% gaps sit well within maxGap=3 of a neighbor; only a
    // leading null per station could survive
    assert(out.filter(col("pm10").isNull).count() <= 3)
    assert(out.filter(col("pm25").isNull).count() <= 3)
  }

  test("validateOrFail: passes on the standard dataset, raises on thin data") {
    val good = etl.AirQualityPipeline.transform(etl.Synth.airQuality(spark, 3, 14 * 24))
    val report = etl.AirQualityPipeline.validateOrFail(good)
    assert(report.getLong(report.fieldIndex("total_records")) == 3 * 14 * 24)
    val thin = etl.AirQualityPipeline.transform(etl.Synth.airQuality(spark, 3, 48))
    val e = intercept[IllegalStateException] {
      etl.AirQualityPipeline.validateOrFail(thin)
    }
    assert(e.getMessage.contains("Datos insuficientes"))
    val fewStations = etl.AirQualityPipeline.transform(etl.Synth.airQuality(spark, 2, 30 * 24))
    val e2 = intercept[IllegalStateException] {
      etl.AirQualityPipeline.validateOrFail(fewStations)
    }
    assert(e2.getMessage.contains("stations"))
  }

  test("GraftExtensions registers SQL functions") {
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, aqi_pm25(10.0) AS aqi, aqi_category(75.0) AS cat")
      .first()
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 50.0 / 12.0 * 10.0) < 1e-12)
    assert(r.getString(2) == "Moderate")
  }

  test("GraftFunctions.registerAll: every Column-API expression/aggregate reaches SQL through the same node (parity per function)") {
    import spark.implicits._
    // scalar: vec_mat and round_stable vs their Column twins
    val vm = spark.sql(
      "SELECT vec_mat(array(1.0D, 2.0D), array(array(1.0D, 0.0D), array(0.0D, 3.0D))) AS m," +
        " round_stable(2.5555555, 3) AS r").first()
    assert(vm.getSeq[Double](0) == Seq(1.0, 6.0), s"$vm")
    assert(vm.getDouble(1) == 2.556, s"$vm")
    val dfv = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(10.0, 20.0)),
      (3L, Seq(100.0, 200.0))).toDF("id", "v")
    dfv.createOrReplaceTempView("vec_parity")
    // aggregates resolve to the same TypedImperativeAggregates
    val viaSql = spark.sql(
      "SELECT vec_sum(v) AS s, outer_product_sum(v, v) AS o FROM vec_parity")
      .first()
    val viaCol = dfv.agg(
      functions.VecSumAgg.vecSum(col("v")).as("s"),
      functions.OuterProductAgg.outerProductSum(col("v"), col("v")).as("o"))
      .first()
    assert(viaSql.getSeq[Double](0) == viaCol.getSeq[Double](0), "vec_sum parity")
    assert(viaSql.getSeq[Double](1) == viaCol.getSeq[Double](1), "outer_product_sum parity")
    assert(viaSql.getSeq[Double](0) == Seq(111.0, 222.0))
    // minhash_sig consumes one LONG token hash per row (the MinHashLsh
    // shape: explode tokens, xxhash64, aggregate per doc)
    val toks = Seq((1L, "a"), (1L, "b"), (2L, "b"), (2L, "c"))
      .toDF("id", "tok").withColumn("h", xxhash64(col("tok")))
    toks.createOrReplaceTempView("tok_parity")
    val sigSql = spark.sql(
      "SELECT id, minhash_sig(h) AS sig FROM tok_parity GROUP BY id ORDER BY id")
      .collect().map(_.getSeq[Long](1))
    val sigCol = toks.groupBy(col("id"))
      .agg(functions.MinHashSigAgg.minhashSig(col("h"), 128).as("sig"))
      .orderBy(col("id"))
      .collect().map(_.getSeq[Long](1))
    assert(sigSql.toSeq == sigCol.toSeq && sigSql.head.length == 128,
      "minhash_sig parity")
    // round_stable SQL ≡ the Column helper on real data
    Tables.events(spark, sfDir).createOrReplaceTempView("ev_rs_parity")
    val rsSql = spark.sql(
      "SELECT event_id, round_stable(value, 4) AS r FROM ev_rs_parity")
    val rsCol = Tables.events(spark, sfDir)
      .select(col("event_id"), functions.roundStable(col("value"), 4).as("r"))
    assert(rsSql.exceptAll(rsCol).isEmpty && rsCol.exceptAll(rsSql).isEmpty,
      "round_stable parity")
  }

  test("SQL aqi_pm25 matches the Column-API implementation row-for-row") {
    Tables.events(spark, sfDir).createOrReplaceTempView("ev_parity")
    val viaSql = spark.sql("SELECT event_id, aqi_pm25(value) AS aqi FROM ev_parity")
    val viaCol = Tables.events(spark, sfDir)
      .select(col("event_id"), etl.Features.aqiPm25(col("value")).as("aqi"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }

  test("streaming dedupWithinWatermark drops duplicate keys") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 86400000L
    def ev(id: Long, t: Long, u: Long) =
      streaming.EventStream.Event(id, new java.sql.Timestamp(base + t), u, "click", 1.0)
    val mem = MemoryStream[streaming.EventStream.Event]
    mem.addData(ev(1, 1000, 7), ev(1, 2000, 7), ev(2, 3000, 7), ev(1, 4000, 7))
    val q = streaming.EventStream.dedupWithinWatermark(mem.toDF(), Seq("event_id"))
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    q.processAllAvailable(); q.stop()
    val ids = spark.table("dedup_out").select("event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L), s"expected deduped ids, got ${ids.toSeq}")
  }

  test("streaming sliding-window agg to parquet sink lands closed windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_sink").toString
    val base = 86400000L
    def ev(id: Long, t: Long) =
      streaming.EventStream.Event(id, new java.sql.Timestamp(base + t), 1L, "click", 2.0)
    val mem = MemoryStream[streaming.EventStream.Event]
    mem.addData(ev(1, 0), ev(2, 60000), ev(3, 7200000))
    val agg = streaming.EventStream.windowedAgg(mem.toDF(),
      windowLen = "10 minutes", watermark = "1 minute", slide = Some("5 minutes"))
    val q = streaming.EventStream.toParquetSink(agg, s"$tmp/out", s"$tmp/ck").start()
    q.processAllAvailable()
    mem.addData(ev(9, 86400000)) // far future: closes earlier windows
    q.processAllAvailable()
    mem.addData(ev(10, 2 * 86400000)) // extra batch so the advanced watermark emits
    q.processAllAvailable(); q.stop()
    val out = spark.read.parquet(s"$tmp/out")
    assert(out.count() >= 2, s"expected closed sliding windows, got ${out.collect().mkString(";")}")
    assert(out.columns.toSet == Set("bucket", "event_type", "n", "sum_value"))
  }

  test("bus-shaped frames (binary key/value) decode and drive the same windowedAgg") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the connector-agnostic contract: any bus source lands
    // (key binary, value binary, timestamp); decodeJson + windowedAgg
    // must behave identically whether the frames come from Kafka or,
    // as here, a MemoryStream producing the same shape
    val batch = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val schema = org.apache.spark.sql.Encoders.product[streaming.EventStream.Event].schema
    val payloads = batch.toJSON.collect()
    val ingest = new java.sql.Timestamp(86400000L)
    val mem = MemoryStream[(Array[Byte], Array[Byte], java.sql.Timestamp)]
    mem.addData(payloads.toIndexedSeq.map(j =>
      (Array[Byte](1), j.getBytes("UTF-8"), ingest)))
    mem.addData(Seq((Array[Byte](1), "not json at all".getBytes("UTF-8"), ingest)))
    val bus = mem.toDF().toDF("key", "value", "timestamp")
    val decoded = sources.Stream.decodeJson(bus, schema)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val q = streaming.EventStream.windowedAgg(decoded)
      .writeStream.outputMode("complete").format("memory").queryName("bus_out").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("bus_out")
      .select(col("bucket"), col("event_type"), col("n"), col("sum_value"))
    val expected = streaming.EventStream.windowedAgg(batch)
    assert(streamed.count() == expected.count())
    assert(streamed.exceptAll(expected).isEmpty && expected.exceptAll(streamed).isEmpty,
      "bus-decoded stream must equal the direct batch twin (corrupt frame dropped)")
  }

  test("readKafka expresses the kafka contract up to source resolution (no connector in env)") {
    // the option/format plumbing executes for real; resolution fails only
    // because the spark-sql-kafka connector jar is not in this
    // environment — at deployment the same call binds to the real source
    val e = intercept[Exception] {
      sources.Stream.readKafka(spark, "broker:9092", "events",
        startingOffsets = "earliest", maxOffsetsPerTrigger = Some(10000L)).schema
    }
    assert(e.getMessage.toLowerCase.contains("kafka"),
      s"expected kafka source-resolution failure, got: ${e.getMessage}")
  }

  test("sessionize maxSessionMs TTL splits a runaway session while events keep arriving") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 86400000L
    def ev(id: Long, t: Long, u: Long) =
      streaming.EventStream.Event(id, new java.sql.Timestamp(base + t), u, "click", 1.0)
    val gap = 60000L   // 1 min
    val ttl = 300000L  // 5 min state TTL
    // one chatty user emitting every 30 s for 20 min — always inside the
    // gap, so WITHOUT the TTL this would be one never-closing session
    val chatty = (0 to 40).map(i => ev(i.toLong, i * 30000L, 1L))
    val mem = MemoryStream[streaming.EventStream.Event]
    mem.addData(chatty)
    val q = streaming.EventStream.sessionize(mem.toDS(), gap, maxSessionMs = ttl)
      .writeStream.outputMode("append").format("memory").queryName("ttl_out").start()
    q.processAllAvailable()
    mem.addData(ev(99, 3600L * 2000, 3)) // advance the watermark
    q.processAllAvailable()
    mem.addData(ev(100, 3600L * 4000, 3)) // let timeouts fire against it
    q.processAllAvailable(); q.stop()
    val sessions = spark.table("ttl_out").as[streaming.EventStream.Session]
      .collect().filter(_.user_id == 1L).sortBy(_.start.getTime)
    assert(sessions.length == 4, s"TTL should split into 4 sessions, got ${sessions.toSeq}")
    assert(sessions.forall(s => s.end.getTime - s.start.getTime <= ttl),
      s"every session must span <= TTL: ${sessions.toSeq}")
    assert(sessions.map(_.n_events).sum == 41, "no event lost at the splits")
  }

  test("sessionize closes sessions on gap and aggregates correctly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // keep event times well above the initial watermark (0): rows at
    // ts <= watermark are dropped by the late-data filter
    val base = 86400000L
    def ev(id: Long, t: Long, u: Long) =
      streaming.EventStream.Event(id, new java.sql.Timestamp(base + t), u, "click", 1.0)
    val gap = 60000L // 1 min
    val mem = MemoryStream[streaming.EventStream.Event]
    // user 1: two bursts 10 min apart; user 2: one burst; then a late
    // watermark-advancing event so timeouts fire.
    mem.addData(ev(1, 0, 1), ev(2, 30000, 1), ev(3, 700000, 1), ev(4, 0, 2))
    val q = streaming.EventStream.sessionize(mem.toDS(), gap)
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    q.processAllAvailable()
    mem.addData(ev(99, 3600L * 2000, 3)) // push watermark far forward
    q.processAllAvailable()
    mem.addData(ev(100, 3600L * 4000, 3)) // extra batch: timeouts fire against the advanced watermark
    q.processAllAvailable(); q.stop()
    val sessions = spark.table("sess_out").as[streaming.EventStream.Session]
      .collect().sortBy(s => (s.user_id, s.start.getTime))
    val u1 = sessions.filter(_.user_id == 1)
    assert(u1.length == 2, s"user 1 should have 2 sessions, got ${sessions.mkString(",")}")
    assert(u1.head.n_events == 2 && u1.last.n_events == 1)
    assert(sessions.count(_.user_id == 2) == 1)
  }

  test("streaming dedup sink with clusterName maintains clusters across batches; replay stable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_dccstream").toString
    val corpus = Tables.documents(spark, sfDir).select("doc_id", "text")
      .filter(col("doc_id") < 60)
    dedup.IncrementalDedup.writeIndex(corpus, "doc_id", "text", "sccidx", buckets = 2)
    // cold-start the label table from an empty edge set
    operators.IncrementalCC.writeLabels(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), "id_a", "id_b", "scc", buckets = 2)
    val src = corpus.filter(col("doc_id") % 3 === 0).orderBy("doc_id").limit(4)
      .as[(Long, String)].collect().toSeq
    val b1 = src.map { case (id, t) => (id + 1000L, t) }
    val b2 = src.map { case (id, t) => (id + 2000L, t) }
    val mem = MemoryStream[(Long, String)]
    val q = streaming.DedupStream.toDedupSink(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", "sccidx",
      s"$tmp/pairs", s"$tmp/ck", minJaccard = 0.8, clusterName = Some("scc")).start()
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    def fold() = operators.IncrementalCC.readLabels(spark, "scc")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val labels = fold()
    // each source doc's three generations (orig, +1000, +2000) must have
    // collapsed to ONE cluster rooted at the original id — batch 2 could
    // only reach the original through the index AND batch 1 through the
    // incrementally merged pair graph
    src.foreach { case (id, _) =>
      assert(labels.get(id).contains(id), s"root $id: ${labels.get(id)}")
      assert(labels.get(id + 1000L).contains(id), s"gen1 of $id: ${labels.get(id + 1000L)}")
      assert(labels.get(id + 2000L).contains(id), s"gen2 of $id: ${labels.get(id + 2000L)}")
    }
    // at-least-once replay of the last batch: pairs byte-stable (proven
    // in the sibling spec) and the label fold unchanged (min-monotone)
    streaming.DedupStream.dedupBatch(b2.toDF("doc_id", "text"), 1L,
      "doc_id", "text", "sccidx", s"$tmp/pairs", minJaccard = 0.8,
      clusterName = Some("scc"))
    assert(fold() == labels, "replayed batch must not change the cluster fold")
  }

  test("streaming agg sink: batches fold into the state table, replay is a no-op, cadence compacts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_astream").toString
    val base = Seq(("a", 1.0), ("b", 10.0)).toDF("k", "v")
    // default batchId: the reserved base id — the stream's own batch 0
    // must NOT be swallowed by the gate
    etl.IncrementalAgg.writeState(base, Seq("k"), "v", "astrm", buckets = 2)
    val mem = MemoryStream[(String, Double)]
    val q = streaming.AggStream.toAggSink(
      mem.toDF().toDF("k", "v"), Seq("k"), "v", "astrm",
      s"$tmp/ck", compactEvery = 2).start()
    mem.addData(("a", 2.0), ("c", 5.0))
    q.processAllAvailable()
    mem.addData(("b", -1.0), ("c", 1.0))
    q.processAllAvailable() // batch 1 → cadence fires: (1+1) % 2 == 0
    q.stop()

    def folded() = etl.IncrementalAgg.read(spark, "astrm")
      .select("k", "cnt", "s").orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val expected = Seq(("a", 2L, 3.0), ("b", 2L, 9.0), ("c", 2L, 6.0))
    assert(folded() == expected, s"stream fold: ${folded()}")
    // the cadence compacted after batch 1: one state row per key, and the
    // marker table carries the folded batch ids
    assert(spark.table("astrm_state").count() == 3, "cadence must have compacted")
    assert(spark.catalog.tableExists("astrm_applied"))

    // at-least-once replay of a POST-compaction batch id: the marker
    // gates it even though its partial rows were folded away
    etl.IncrementalAgg.appendDelta(
      Seq(("b", -1.0), ("c", 1.0)).toDF("k", "v"), Seq("k"), "v", "astrm", batchId = 1)
    assert(spark.table("astrm_state").count() == 3 && folded() == expected,
      "replayed batch must be gated after compaction")
  }

  test("toAnnSink: streamed vectors searchable, cadence compacts, replay appends zero") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_annstrm").toString
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val base = emb.filter(col("vec_id") % 3 === 0)
    sim.IncrementalAnn.writeIndex(base, "vec_id", "embedding", "annstrm",
      kCoarse = 4, iters = 2, buckets = 2)
    val rest = emb.filter(col("vec_id") % 3 =!= 0)
      .as[(Long, Seq[Float])].collect().toSeq
    val (b1, b2) = rest.partition(_._1 % 3 == 1)
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = streaming.AnnStream.toAnnSink(
      mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      "annstrm", s"$tmp/ck", compactEvery = 2,
      driftLog = Some(s"$tmp/drift")).start()
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable() // batch 1 → cadence fires: (1+1) % 2 == 0
    q.stop()

    // every streamed vector searchable: full probe over the folded index
    // must equal brute force over the WHOLE corpus — which can only hold
    // if both batches are in and neither is double-counted
    val queries = emb.filter(col("vec_id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSeq.sorted
    assert(rows(sim.IncrementalAnn.topK(spark, queries, "vec_id", "embedding",
      "annstrm", k = 5, nprobe = 4)) ==
      rows(sim.Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)),
      "streamed index must match brute force over the full corpus")
    // the cadence compacted after batch 1: one file per bucket
    def files(t: String) = new java.io.File(
      org.apache.spark.sql.GraftShims.tableLocation(spark, t))
      .listFiles.count(_.getName.endsWith(".parquet"))
    assert(files("annstrm_cells") <= 2 && files("annstrm_ids") <= 2,
      s"cadence must have compacted: cells=${files("annstrm_cells")} ids=${files("annstrm_ids")}")
    // at-least-once replay of the last batch: the id gate appends zero
    // rows even though compaction rewrote the tables
    val n = spark.table("annstrm_cells").count()
    assert(n == emb.count())
    sim.IncrementalAnn.appendVectors(b2.toDF("vec_id", "embedding"),
      "vec_id", "embedding", "annstrm")
    assert(spark.table("annstrm_cells").count() == n,
      "replayed batch must gate to a no-op")
    // the drift monitor logged one row per batch, and in-distribution
    // batches sit near the build-time baseline (same synthetic
    // distribution as the indexed base — far from the >>1 shift alarm)
    val drift = spark.read.parquet(s"$tmp/drift")
      .select("batch_id", "drift_ratio").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(drift.keySet == Set(0L, 1L), s"drift log batches: ${drift.keySet}")
    assert(drift.values.forall(r => r > 0.2 && r < 5.0),
      s"in-distribution batches must not alarm: $drift")
  }

  test("streaming top-k sink: MG-bounded state keeps the planted heavy hitter within its error") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_tkstream").toString
    etl.IncrementalAgg.writeState(
      spark.emptyDataset[String].toDF("token").withColumn("__one", lit(1.0)),
      Seq("token"), "__one", "tkstrm", buckets = 2)
    val mem = MemoryStream[String]
    val cap = 8
    val q = streaming.TopKStream.toTopKSink(mem.toDF().toDF("token"),
      "token", "tkstrm", s"$tmp/ck", capacity = cap, compactEvery = 1).start()
    // 3 batches: "hot" dominates; a rotating long tail (5 fresh tokens a
    // batch) would grow state unboundedly without eviction
    var total = 0L
    for (b <- 0 until 3) {
      val tail = (0 until 5).flatMap(i => Seq.fill(2)(s"tail_${b}_$i"))
      val hot = Seq.fill(30)("hot")
      mem.addData(hot ++ tail: _*)
      total += hot.size + tail.size
      q.processAllAvailable()
    }
    q.stop()
    assert(spark.table("tkstrm_state").count() <= cap,
      s"MG compaction must bound state to $cap keys")
    val top = streaming.TopKStream.topK(spark, "tkstrm", 1).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top.map(_._1) == Seq("hot"), s"planted heavy hitter must survive eviction: $top")
    // MG error bound: undercount <= N/(capacity+1); true count is 90
    assert(top.head._2 <= 90L && top.head._2 >= 90L - total / (cap + 1),
      s"cnt must be a bounded undercount of 90: $top (N=$total)")
    // at-least-once replay of the last batch id: gated to a no-op even
    // though compaction folded its rows away
    val before = streaming.TopKStream.topK(spark, "tkstrm", cap).collect().toSeq
    etl.IncrementalAgg.appendDelta(
      Seq.fill(30)("hot").toDF("token").withColumn("__one", lit(1.0)),
      Seq("token"), "__one", "tkstrm", batchId = 2)
    assert(streaming.TopKStream.topK(spark, "tkstrm", cap).collect().toSeq == before,
      "replayed batch must gate to a no-op")
  }

  test("streaming SCD2 sink: batches chain versions, instant collisions fold least, replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_dimstream").toString
    val dimPath = s"$tmp/dim"
    val mem = MemoryStream[(Long, String, String)]
    val q = streaming.DimStream.toScd2Sink(
      mem.toDF().toDF("k", "ts", "v").withColumn("ts", to_date(col("ts"))),
      dimPath, Seq("k"), Seq("v"), "ts", s"$tmp/ck").start()
    mem.addData((1L, "2021-01-01", "A"), (2L, "2021-01-05", "X"))
    q.processAllAvailable()
    // batch 1: a new version for k=1, plus a colliding instant that must
    // fold deterministically to the LEAST attribute tuple ("B" < "C")
    mem.addData((1L, "2021-02-01", "C"), (1L, "2021-02-01", "B"))
    q.processAllAvailable()
    q.stop()
    def chains() = spark.read.parquet(dimPath)
      .orderBy("k", "valid_from")
      .select(col("k"), col("v"), col("valid_from").cast("string"),
        col("valid_to").cast("string"), col("is_current"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), r.getBoolean(4))).toSeq
    val expected = Seq(
      (1L, "A", "2021-01-01", Some("2021-02-01"), false),
      (1L, "B", "2021-02-01", None, true),
      (2L, "X", "2021-01-05", None, true))
    assert(chains() == expected, s"got ${chains()}")
    // at-least-once replay: the monotone gate folds the re-delivered
    // batch to zero fresh instants (ts == open valid_from is NOT fresh)
    val replay = Seq((1L, "2021-02-01", "C"), (1L, "2021-02-01", "B"))
      .toDF("k", "ts", "v").withColumn("ts", to_date(col("ts")))
    streaming.DimStream.scd2Batch(replay, dimPath, Seq("k"), Seq("v"), "ts")
    assert(chains() == expected, s"replay changed the dim: ${chains()}")
    // out-of-order updates are rejected by the same gate, not spliced
    val late = Seq((1L, "2021-01-15", "Z")).toDF("k", "ts", "v")
      .withColumn("ts", to_date(col("ts")))
    streaming.DimStream.scd2Batch(late, dimPath, Seq("k"), Seq("v"), "ts")
    assert(chains() == expected, s"late update spliced into history: ${chains()}")
  }

  test("CleanStream: bench hits quarantined with evidence, short/clean docs land, replay byte-stable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_clean").toString
    val gram = "alpha beta gamma delta"
    val bench = Seq((100L, s"prefix $gram suffix tokens here")).toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val q = streaming.CleanStream.toContaminationSink(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", bench, n = 4,
      s"$tmp/clean", s"$tmp/bad", s"$tmp/ck").start()
    mem.addData((1L, "one totally clean document right here"),
      (2L, s"evil doc embedding $gram verbatim"))
    q.processAllAvailable()
    mem.addData((3L, "another clean one flows through"),
      (4L, s"$gram leaked again"), (5L, "too short"))
    q.processAllAvailable(); q.stop()
    def ids(dir: String) = spark.read.parquet(dir).select("doc_id")
      .as[Long].collect().toSet
    assert(ids(s"$tmp/clean") == Set(1L, 3L, 5L),
      "clean + sub-shingle docs must land clean")
    val bad = spark.read.parquet(s"$tmp/bad")
      .select("doc_id", "n_hits").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(bad.keySet == Set(2L, 4L) && bad.values.forall(_ >= 1L),
      s"quarantine must carry hit evidence: $bad")
    // at-least-once replay: re-screening batch 1 overwrites its own
    // directories byte-identically
    val before = (ids(s"$tmp/clean"), ids(s"$tmp/bad"))
    val f = text.Corpus.benchFilter(bench, "text", n = 4)
    streaming.CleanStream.contaminationBatch(f,
      Seq((3L, "another clean one flows through"), (4L, s"$gram leaked again"),
        (5L, "too short")).toDF("doc_id", "text"),
      1L, "doc_id", "text", s"$tmp/clean", s"$tmp/bad")
    assert((ids(s"$tmp/clean"), ids(s"$tmp/bad")) == before,
      "replay must leave both landings unchanged")
  }

  test("QqStream: matching batch zero shift, shifted batch reads +50 at every decile, silent key NULL, replay byte-stable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_qqstream").toString
    // reference: 0..100 on both keys
    val ref = (0 to 100).flatMap(i =>
      Seq(("k", i.toDouble), ("s", i.toDouble))).toDF("k", "v")
    val r = streaming.QqStream.buildReference(ref, Seq("k"), "v")
    val mem = MemoryStream[(String, Double)]
    val q = streaming.QqStream.toQqSink(mem.toDF().toDF("k", "v"),
      "v", r, s"$tmp/mon", s"$tmp/ck").start()
    // batch 0: both keys matching; batch 1: k shifted +50, s SILENT
    mem.addData((0 to 100).flatMap(i =>
      Seq(("k", i.toDouble), ("s", i.toDouble))): _*)
    q.processAllAvailable()
    mem.addData((0 to 100).map(i => ("k", i + 50.0)): _*)
    q.processAllAvailable(); q.stop()
    val mon = spark.read.parquet(s"$tmp/mon")
      .select("batch_id", "k", "decile", "shift").collect()
    val b0 = mon.filter(_.getLong(0) == 0L)
    assert(b0.length == 18 && b0.forall(_.getDouble(3) == 0.0),
      "identical batch: zero shift at all deciles, both keys")
    val b1k = mon.filter(r => r.getLong(0) == 1L && r.getString(1) == "k")
    assert(b1k.length == 9 && b1k.forall(_.getDouble(3) == 50.0),
      s"location shift reads +50 at every decile: ${b1k.toSeq}")
    val b1s = mon.filter(r => r.getLong(0) == 1L && r.getString(1) == "s")
    assert(b1s.length == 9 && b1s.forall(_.isNullAt(3)),
      "silent key: reference deciles emitted with NULL shift")
    // replay overwrites byte-identically
    val before = spark.read.parquet(s"$tmp/mon/batch=1").collect().toSeq
    streaming.QqStream.qqBatch(r,
      (0 to 100).map(i => ("k", i + 50.0)).toDF("k", "v"),
      1L, "v", s"$tmp/mon")
    assert(spark.read.parquet(s"$tmp/mon/batch=1").collect().toSeq == before)
  }

  test("SloStream: split stream equals one batch; burst alerts; replay overwrites state, no double count") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_slostream").toString
    def hour(h: Int, errs: Int) =
      (1 to 10).map(i => ("s", f"2024-01-01 $h%02d:00:00",
        if (i <= errs) "error" else "ok"))
    val calm = hour(0, 1) ++ hour(1, 1)
    val burst = hour(2, 8)
    val mem = MemoryStream[(String, String, String)]
    val in = mem.toDF().toDF("k", "tss", "et")
      .withColumn("ts", to_timestamp(col("tss")))
    val q = streaming.SloStream.toBurnSink(in, Seq("k"), "ts",
      isError = col("et") === "error", budget = 0.1, shortHours = 2,
      longHours = 3, threshold = 2.0, s"$tmp/state", s"$tmp/mon",
      s"$tmp/ck").start()
    mem.addData(calm: _*)
    q.processAllAvailable()
    mem.addData(burst: _*)
    q.processAllAvailable(); q.stop()
    // batch 0: calm burn = 1 everywhere → no alert rows
    assert(spark.read.parquet(s"$tmp/mon/batch=0").count() == 0)
    // batch 1's readout over the MERGED state ≡ the one-batch ETL
    val streamed = spark.read.parquet(s"$tmp/mon/batch=1")
      .drop("batch_id").collect().toSeq
    val oneShot = etl.Slo.burnRate((calm ++ burst)
        .toDF("k", "tss", "et")
        .withColumn("ts", to_timestamp(col("tss"))),
      Seq("k"), col("ts"), col("et") === "error", budget = 0.1,
      shortHours = 2, longHours = 3, threshold = 2.0)
      .filter(col("alert")).collect().toSeq
    assert(streamed.nonEmpty && streamed.toSet == oneShot.toSet,
      s"split ≡ one batch: $streamed vs $oneShot")
    // at-least-once replay: re-running batch 1 overwrites both its
    // state partition and its monitor rows byte-identically
    val stateBefore = spark.read.parquet(s"$tmp/state").collect().toSeq
    val monBefore = spark.read.parquet(s"$tmp/mon/batch=1").collect().toSeq
    streaming.SloStream.burnBatch(
      burst.toDF("k", "tss", "et")
        .withColumn("ts", to_timestamp(col("tss"))),
      1L, Seq("k"), "ts", col("et") === "error", 0.1, 2, 3, 2.0,
      s"$tmp/state", s"$tmp/mon")
    assert(spark.read.parquet(s"$tmp/state").collect().toSeq.sortBy(_.toString)
      == stateBefore.sortBy(_.toString), "replayed state must not double-count")
    assert(spark.read.parquet(s"$tmp/mon/batch=1").collect().toSeq == monBefore)
  }

  test("DriftStream: frozen reference bins score each batch; shifted batch alarms; replay overwrites") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_driftstream").toString
    // reference: uniform 0-9 per key
    val ref = (1 to 200).map(i => ("k", (i % 10).toDouble)).toDF("k", "v")
    val r = streaming.DriftStream.buildReference(ref, Seq("k"), "v", bins = 10)
    val mem = MemoryStream[(String, Double)]
    val q = streaming.DriftStream.toDriftSink(mem.toDF().toDF("k", "v"),
      "v", r, s"$tmp/mon", s"$tmp/ck").start()
    mem.addData((1 to 100).map(i => ("k", (i % 10).toDouble)): _*)
    q.processAllAvailable()
    mem.addData((1 to 100).map(i => ("k", (i % 10) + 50.0)): _*)
    q.processAllAvailable(); q.stop()
    val mon = spark.read.parquet(s"$tmp/mon")
      .select("batch_id", "psi", "n_ref", "n_cur").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(mon.keySet == Set(0L, 1L))
    assert(mon(0L)._1 < 0.05, s"matching batch must score ~0: ${mon(0L)}")
    assert(mon(1L)._1 > 1.0, s"shifted batch must alarm: ${mon(1L)}")
    assert(mon(0L)._2 == 200L && mon(0L)._3 == 100L)
    // at-least-once replay: re-scoring batch 1 overwrites byte-identically
    val bytesBefore = spark.read.parquet(s"$tmp/mon/batch=1").collect().toSeq
    streaming.DriftStream.driftBatch(r,
      (1 to 100).map(i => ("k", (i % 10) + 50.0)).toDF("k", "v"),
      1L, "v", s"$tmp/mon")
    assert(spark.read.parquet(s"$tmp/mon/batch=1").collect().toSeq == bytesBefore)
  }

  test("CusumStream: split stream equals one batch; shift alarms; replay no-ops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_cusumstream").toString
    // reference ±1 around 0 (sd ≈ 1); current: 20 calm points then a
    // +3σ shift — the S series must be IDENTICAL whether the current
    // window arrives as one batch or split mid-calm (the P_end/P_min
    // state carries the fold across the boundary)
    val ref = (1 to 200).map(i => ("k", i.toLong, if (i % 2 == 0) 1.0 else -1.0))
      .toDF("k", "t", "v")
    val mon = streaming.CusumStream.buildReference(ref, Seq("k"), "v")
    val calm = (1 to 20).map(i => ("k", 1000L + i, if (i % 2 == 0) 1.0 else -1.0))
    val shifted = (1 to 30).map(i => ("k", 2000L + i, 3.0))

    val mem = MemoryStream[(String, Long, Double)]
    val q = streaming.CusumStream.toCusumSink(mem.toDF().toDF("k", "t", "v"),
      "v", "t", "t", mon, s"$tmp/state", s"$tmp/mon", s"$tmp/ck").start()
    mem.addData(calm: _*)
    q.processAllAvailable()
    mem.addData(shifted: _*)
    q.processAllAvailable(); q.stop()
    val perBatch = spark.read.parquet(s"$tmp/mon")
      .select("batch_id", "n_alarms", "max_s").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(perBatch(0L)._1 == 0L, s"calm batch alarmed: ${perBatch(0L)}")
    assert(perBatch(1L)._1 > 20L, s"shifted batch must alarm: ${perBatch(1L)}")

    // batch-boundary invariance: one-shot fold over the concatenation
    // reproduces batch 1's peak statistic exactly
    val oneTmp = java.nio.file.Files.createTempDirectory("graft_cusum1").toString
    streaming.CusumStream.cusumBatch(mon, (calm ++ shifted).toDF("k", "t", "v"),
      0L, "v", "t", "t", s"$oneTmp/state", s"$oneTmp/mon")
    val oneShot = spark.read.parquet(s"$oneTmp/mon/batch=0").collect().head
    assert(oneShot.getAs[Double]("max_s") == perBatch(1L)._2,
      s"split ${perBatch(1L)._2} != one-shot ${oneShot.getAs[Double]("max_s")}")

    // replay gate: re-folding batch 1 must not double-apply the state
    val stateBefore = spark.read.parquet(s"$tmp/state").collect().toSeq
    streaming.CusumStream.cusumBatch(mon, shifted.toDF("k", "t", "v"),
      1L, "v", "t", "t", s"$tmp/state", s"$tmp/mon")
    assert(spark.read.parquet(s"$tmp/state").collect().toSeq == stateBefore)
  }

  test("CusumStream: a downward shift alarms the lower side, resumable across batches") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_cusumlo").toString
    val ref = (1 to 200).map(i => ("k", i.toLong, if (i % 2 == 0) 1.0 else -1.0))
      .toDF("k", "t", "v")
    val mon = streaming.CusumStream.buildReference(ref, Seq("k"), "v")
    val calm = (1 to 20).map(i => ("k", 1000L + i, if (i % 2 == 0) 1.0 else -1.0))
    val down = (1 to 30).map(i => ("k", 2000L + i, -3.0))
    // split fold: calm batch, then the degradation batch
    streaming.CusumStream.cusumBatch(mon, calm.toDF("k", "t", "v"),
      0L, "v", "t", "t", s"$tmp/state", s"$tmp/mon")
    streaming.CusumStream.cusumBatch(mon, down.toDF("k", "t", "v"),
      1L, "v", "t", "t", s"$tmp/state", s"$tmp/mon")
    val b1 = spark.read.parquet(s"$tmp/mon/batch=1").collect().head
    assert(b1.getAs[Long]("n_alarms") == 0L, s"upper must stay quiet: $b1")
    assert(b1.getAs[Long]("n_alarms_lo") > 20L, s"lower must alarm: $b1")
    // batch-boundary invariance for the lower side too
    val oneTmp = java.nio.file.Files.createTempDirectory("graft_cusumlo1").toString
    streaming.CusumStream.cusumBatch(mon, (calm ++ down).toDF("k", "t", "v"),
      0L, "v", "t", "t", s"$oneTmp/state", s"$oneTmp/mon")
    val oneShot = spark.read.parquet(s"$oneTmp/mon/batch=0").collect().head
    assert(oneShot.getAs[Double]("max_s_lo") == b1.getAs[Double]("max_s_lo"),
      s"split ${b1.getAs[Double]("max_s_lo")} != one-shot ${oneShot.getAs[Double]("max_s_lo")}")
  }

  test("CusumStream: resumes from a pre-two-sided stateDir (missing __qe/__qm columns)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_cusummig").toString
    val ref = (1 to 200).map(i => ("k", i.toLong, if (i % 2 == 0) 1.0 else -1.0))
      .toDF("k", "t", "v")
    val mon = streaming.CusumStream.buildReference(ref, Seq("k"), "v")
    // fold one calm batch, then strip the lower-side columns to emulate
    // a stateDir written by the old one-sided code
    val calm = (1 to 20).map(i => ("k", 1000L + i, if (i % 2 == 0) 1.0 else -1.0))
    streaming.CusumStream.cusumBatch(mon, calm.toDF("k", "t", "v"),
      0L, "v", "t", "t", s"$tmp/state", s"$tmp/mon")
    val old = spark.read.parquet(s"$tmp/state")
      .drop("__qe", "__qm").collect().toSeq
    val oldDf = spark.createDataFrame(
      spark.sparkContext.parallelize(old, 1),
      spark.read.parquet(s"$tmp/state").drop("__qe", "__qm").schema)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$tmp/state"))
    oldDf.coalesce(1).write.parquet(s"$tmp/state")
    // the upgraded code must fold the next (downward-shift) batch
    // without throwing, with the lower side starting key-never-seen
    val down = (1 to 30).map(i => ("k", 2000L + i, -3.0))
    streaming.CusumStream.cusumBatch(mon, down.toDF("k", "t", "v"),
      1L, "v", "t", "t", s"$tmp/state", s"$tmp/mon")
    val b1 = spark.read.parquet(s"$tmp/mon/batch=1").collect().head
    assert(b1.getAs[Long]("n_alarms_lo") > 20L,
      s"lower side must alarm after migration: $b1")
    val st = spark.read.parquet(s"$tmp/state")
    assert(st.columns.contains("__qe") && st.columns.contains("__qm"),
      "migrated state is written in the new schema")
  }

  test("RateStream: collapse and surge alarm; silent keys emitted; replay byte-stable") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_ratestream").toString
    // reference: keys a,b at 100 events over ~an hour each
    def evs(k: String, base: Long, cnt: Int) =
      (0 until cnt).map(i => (k, base + i.toLong * 3600 / cnt))
    val ref = (evs("a", 0L, 100) ++ evs("b", 0L, 100)).toDF("k", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val mon = streaming.RateStream.buildReference(ref, Seq("k"), "ts")
    // batch: b surges 4×, a is SILENT — but must still appear with a
    // large negative z (reference keys drive the output)
    val batch = evs("b", 10000L, 400).toDF("k", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    streaming.RateStream.rateBatch(mon, batch, 0L, "ts", s"$tmp/mon")
    val out = spark.read.parquet(s"$tmp/mon/batch=0").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.contains("a"), "silent reference key must be emitted")
    assert(out("a").getAs[Long]("n_cur") == 0L)
    assert(out("a").getAs[Double]("poisson_z") < -3,
      s"collapse must alarm: ${out("a")}")
    assert(out("b").getAs[Double]("poisson_z") > 3,
      s"surge must alarm: ${out("b")}")
    // replay: deterministic scoring into the same batch dir → byte-stable
    val before = spark.read.parquet(s"$tmp/mon/batch=0").collect().toSeq
    streaming.RateStream.rateBatch(mon, batch, 0L, "ts", s"$tmp/mon")
    assert(spark.read.parquet(s"$tmp/mon/batch=0").collect().toSeq == before)
    // a key with too little reference history scores NULL, not noise
    val thinRef = (evs("a", 0L, 100) ++ evs("c", 0L, 5)).toDF("k", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val mon2 = streaming.RateStream.buildReference(thinRef, Seq("k"), "ts")
    streaming.RateStream.rateBatch(mon2, batch, 0L, "ts", s"$tmp/mon2")
    val thin = spark.read.parquet(s"$tmp/mon2/batch=0").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(thin("c").isNullAt(thin("c").fieldIndex("poisson_z")),
      s"thin-baseline key must be NULL: ${thin("c")}")
  }

  test("HistStream: split batches merge to the one-shot quantiles; replay byte-stable; clamp") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_histstream").toString
    val all = (1 to 1000).map(i => ("k", i.toDouble)).toDF("k", "v")
    val geom = streaming.HistStream.buildGeometry(all, Seq("k"), "v", bins = 50)
    // two batches vs the whole series in one histSketch call
    streaming.HistStream.histBatch(geom,
      all.filter(col("v") <= 400), 0L, "v", s"$tmp/sk")
    streaming.HistStream.histBatch(geom,
      all.filter(col("v") > 400), 1L, "v", s"$tmp/sk")
    val merged = streaming.HistStream.quantiles(spark, s"$tmp/sk", geom,
      Seq(0.5, 0.9)).collect().head
    val oneShot = etl.Aggregates.histQuantiles(
      etl.Aggregates.histSketch(all.withColumn("__s", lit(0L)), Seq("k"),
        "__s", "v", bins = 50, ranges = Some(geom.ranges)),
      Seq("k"), Seq(0.5, 0.9)).collect().head
    assert(merged.getDouble(1) == oneShot.getDouble(1) &&
      merged.getDouble(2) == oneShot.getDouble(2),
      s"merged $merged != one-shot $oneShot")
    // replay overwrites byte-identically (deterministic batch sketch)
    val before = spark.read.parquet(s"$tmp/sk/batch=1").collect().toSeq
    streaming.HistStream.histBatch(geom,
      all.filter(col("v") > 400), 1L, "v", s"$tmp/sk")
    assert(spark.read.parquet(s"$tmp/sk/batch=1").collect().toSeq == before)
    // values beyond the frozen range clamp into the edge bin — counted,
    // never dropped (the binId contract)
    streaming.HistStream.histBatch(geom,
      Seq(("k", 99999.0)).toDF("k", "v"), 2L, "v", s"$tmp/sk")
    val top = spark.read.parquet(s"$tmp/sk/batch=2").collect()
    assert(top.length == 1 && top.head.getAs[Long]("__bin") == 49L,
      s"out-of-range clamps to the top bin: ${top.toSeq}")
  }

  test("ProfileStream: split batches merge to the one-shot profile; counts exact, HLL exact at small cardinality; replay idempotent") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_profstream").toString
    val all = (1 to 300).map(i =>
      (i.toLong % 40, if (i % 10 == 0) None else Some(s"u${i % 25}")))
      .toDF("uid", "tag")
    streaming.ProfileStream.profileBatch(
      all.filter(col("uid") < 20), 0L, Seq("uid", "tag"), s"$tmp/st")
    streaming.ProfileStream.profileBatch(
      all.filter(col("uid") >= 20), 1L, Seq("uid", "tag"), s"$tmp/st")
    val merged = streaming.ProfileStream.profile(spark, s"$tmp/st")
      .collect().map(r => r.getString(0) -> r).toMap
    // null/row tallies are EXACT under merge
    val nNullTag = all.filter(col("tag").isNull).count()
    assert(merged("tag").getLong(1) == 300L &&
      merged("tag").getLong(2) == nNullTag, s"${merged("tag")}")
    assert(merged("uid").getLong(2) == 0L)
    // HLL is exact at these cardinalities (sparse mode), across the union
    assert(merged("uid").getLong(3) == 40L, s"${merged("uid")}")
    assert(merged("tag").getLong(3) ==
      all.filter(col("tag").isNotNull).select("tag").distinct().count(),
      s"${merged("tag")}")
    // at-least-once replay: the batch dir is wholly re-derived -> the
    // merged readout is unchanged, nothing double-counts
    val before = streaming.ProfileStream.profile(spark, s"$tmp/st")
      .collect().sortBy(_.getString(0)).toSeq
    streaming.ProfileStream.profileBatch(
      all.filter(col("uid") >= 20), 1L, Seq("uid", "tag"), s"$tmp/st")
    val after = streaming.ProfileStream.profile(spark, s"$tmp/st")
      .collect().sortBy(_.getString(0)).toSeq
    assert(after == before, "replayed batch must not change the readout")
  }

  test("NoveltyStream: per-batch novelty vs EARLIER batches only; replay idempotent; state stays deduped") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_novstream").toString
    val (st, rp) = (s"$tmp/state", s"$tmp/report")
    // batch 0: two docs, all trigrams new
    val b0 = Seq("alpha beta gamma delta", "one two three four")
      .toDF("text")
    // batch 1: one doc repeats b0 verbatim, one brand new
    val b1 = Seq("alpha beta gamma delta", "five six seven eight")
      .toDF("text")
    streaming.NoveltyStream.noveltyBatch(b0, 0L, "text", st, rp)
    streaming.NoveltyStream.noveltyBatch(b1, 1L, "text", st, rp)
    val rep = streaming.NoveltyStream.report(spark, rp)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rep(0L).getDouble(4) == 1.0, s"first batch all novel: ${rep(0L)}")
    // b1: 4 distinct trigrams (2+2), 2 seen in b0 -> 0.5
    assert(rep(1L).getLong(2) == 4L && rep(1L).getLong(3) == 2L &&
      rep(1L).getDouble(4) == 0.5, s"${rep(1L)}")
    // replay batch 1: its own stored shingles must NOT lower its score
    streaming.NoveltyStream.noveltyBatch(b1, 1L, "text", st, rp)
    val rep2 = streaming.NoveltyStream.report(spark, rp)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rep2(1L).getDouble(4) == 0.5, "replay is idempotent")
    // state holds each shingle ONCE, owned by its first batch
    val state = spark.read.parquet(st)
    assert(state.count() == state.select("sh").distinct().count(),
      "state must stay deduped across batches")
  }

  test("RulesStream: per-batch gate rows exact; violation introduced by batch 1 localizes there; replay byte-stable") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_rulestream").toString
    val rules = Seq(etl.Rules.NotNull("v"), etl.Rules.InRange("v", 0, 10),
      etl.Rules.Unique(Seq("id")))
    val clean = Seq((1L, Some(5.0)), (2L, Some(7.0))).toDF("id", "v")
    val dirty = Seq((3L, Some(99.0)), (3L, None: Option[Double]))
      .toDF("id", "v")
    streaming.RulesStream.rulesBatch(clean, 0L, rules, s"$tmp/rep")
    streaming.RulesStream.rulesBatch(dirty, 1L, rules, s"$tmp/rep")
    val rep = streaming.RulesStream.report(spark, s"$tmp/rep")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r).toMap
    assert(rep((0L, "not_null")).getBoolean(6) &&
      rep((0L, "in_range")).getBoolean(6) && rep((0L, "unique")).getBoolean(6))
    assert(rep((1L, "not_null")).getLong(3) == 1L &&
      rep((1L, "in_range")).getLong(3) == 1L &&
      rep((1L, "unique")).getLong(3) == 1L, "each failure mode counted once")
    assert(!rep((1L, "in_range")).getBoolean(6))
    // replay overwrites byte-identically (deterministic per-batch report)
    val before = spark.read.parquet(s"$tmp/rep/batch=1").collect().toSeq
    streaming.RulesStream.rulesBatch(dirty, 1L, rules, s"$tmp/rep")
    assert(spark.read.parquet(s"$tmp/rep/batch=1").collect().toSeq == before)
  }

  test("EnrichStream: facts see the version valid at THEIR time; replay stable after dim evolves") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_enrich").toString
    val dimPath = s"$tmp/dim"
    // dimension: k=1 is "A" from Jan 1, "B" from Feb 1
    val d0 = Seq((1L, "2021-01-01", "A")).toDF("k", "ts", "v")
      .withColumn("ts", to_date(col("ts")))
    streaming.DimStream.scd2Batch(d0, dimPath, Seq("k"), Seq("v"), "ts")
    val d1 = Seq((1L, "2021-02-01", "B")).toDF("k", "ts", "v")
      .withColumn("ts", to_date(col("ts")))
    streaming.DimStream.scd2Batch(d1, dimPath, Seq("k"), Seq("v"), "ts")
    // batch 0: one fact in the A era, one on the B boundary (half-open:
    // sees B), one predating everything (null attrs)
    val facts = Seq((10L, 1L, "2021-01-15"), (11L, 1L, "2021-02-01"),
      (12L, 1L, "2020-12-25")).toDF("fid", "k", "ft")
      .withColumn("ft", to_date(col("ft")))
    streaming.EnrichStream.enrichBatch(facts, 0L, Seq("k"), "ft",
      Seq("fid"), dimPath, s"$tmp/out")
    def read0() = spark.read.parquet(s"$tmp/out/batch=0")
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    val got = read0()
    assert(got == Map(10L -> Some("A"), 11L -> Some("B"), 12L -> None),
      s"$got")
    // the dim gains a version ("C" from Mar 1); replaying the OLD batch
    // is byte-identical — the SCD2 invariant (closed versions immutable,
    // new versions strictly later) makes re-enrichment reproducible
    val before = spark.read.parquet(s"$tmp/out/batch=0").collect().toSeq
    val d2 = Seq((1L, "2021-03-01", "C")).toDF("k", "ts", "v")
      .withColumn("ts", to_date(col("ts")))
    streaming.DimStream.scd2Batch(d2, dimPath, Seq("k"), Seq("v"), "ts")
    streaming.EnrichStream.enrichBatch(facts, 0L, Seq("k"), "ft",
      Seq("fid"), dimPath, s"$tmp/out")
    assert(spark.read.parquet(s"$tmp/out/batch=0").collect().toSeq == before,
      "replay after dim evolution must be byte-identical")
    // and a NEW batch in the C era sees C
    val f2 = Seq((20L, 1L, "2021-03-15")).toDF("fid", "k", "ft")
      .withColumn("ft", to_date(col("ft")))
    streaming.EnrichStream.enrichBatch(f2, 1L, Seq("k"), "ft",
      Seq("fid"), dimPath, s"$tmp/out")
    val b1 = spark.read.parquet(s"$tmp/out/batch=1").collect().head
    assert(b1.getString(3) == "C", s"$b1")
  }

  test("CusumStream: an empty first batch cannot wedge the gate") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_cusumempty").toString
    val ref = (1 to 200).map(i => ("k", i.toLong, if (i % 2 == 0) 1.0 else -1.0))
      .toDF("k", "t", "v")
    val mon = streaming.CusumStream.buildReference(ref, Seq("k"), "v")
    // batch 0 is EMPTY (common at stream startup): it writes a zero-row
    // state table; the max(__lb) replay gate must read that as "no batch
    // applied yet" (boxed null → -1), not throw an NPE that permanently
    // wedges every later batch
    streaming.CusumStream.cusumBatch(mon,
      Seq.empty[(String, Long, Double)].toDF("k", "t", "v"),
      0L, "v", "t", "t", s"$tmp/state", s"$tmp/mon")
    assert(spark.read.parquet(s"$tmp/state").count() == 0L)
    val shifted = (1 to 30).map(i => ("k", 2000L + i, 3.0))
    streaming.CusumStream.cusumBatch(mon, shifted.toDF("k", "t", "v"),
      1L, "v", "t", "t", s"$tmp/state", s"$tmp/mon")
    val out = spark.read.parquet(s"$tmp/mon/batch=1").collect().head
    assert(out.getAs[Long]("n_alarms") > 0L, s"shifted batch must alarm: $out")
    val st = spark.read.parquet(s"$tmp/state").collect()
    assert(st.length == 1 && st.head.getAs[Long]("__lb") == 1L, st.mkString(","))
  }

  test("SpcStream: frozen chart, batch-size-adjusted limits, shift alarms, replay overwrites") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_spcstream").toString
    // in-control reference: 20 buckets of {9, 11} → center 10, pooled var 2
    val ref = (0 until 20).flatMap(b => Seq(("k", b.toLong, 9.0), ("k", b.toLong, 11.0)))
      .toDF("k", "b", "v")
    val chart = streaming.SpcStream.buildChart(ref, Seq("k"), col("b"), "v")
    val mem = MemoryStream[(String, Double)]
    val q = streaming.SpcStream.toSpcSink(mem.toDF().toDF("k", "v"), "v",
      chart, s"$tmp/mon", s"$tmp/ck").start()
    mem.addData(("k", 9.0), ("k", 11.0), ("k", 9.0), ("k", 11.0))
    q.processAllAvailable()
    mem.addData(("k", 14.0), ("k", 14.0), ("k", 14.0), ("k", 14.0))
    q.processAllAvailable(); q.stop()
    val mon = spark.read.parquet(s"$tmp/mon")
      .collect().map(r => r.getAs[Long]("batch_id") -> r).toMap
    val b0 = mon(0L)
    assert(b0.getAs[Double]("center") == 10.0 &&
      b0.getAs[Long]("out_of_control") == 0L &&
      b0.getAs[Long]("side") == 0L, s"$b0")
    // n = 4, pooled var 2 → limits 10 ± 3·sqrt(2/4)
    val r6 = (x: Double) => math.floor(x * 1e6 + 0.5) / 1e6
    assert(b0.getAs[Double]("ucl") == r6(10.0 + 3.0 * math.sqrt(0.5)), s"$b0")
    val b1 = mon(1L)
    assert(b1.getAs[Double]("xbar") == 14.0 &&
      b1.getAs[Long]("out_of_control") == 1L &&
      b1.getAs[Long]("side") == 1L, s"shifted batch must alarm: $b1")
    // a THIN batch widens its own limits: n = 1 vs n = 4
    streaming.SpcStream.spcBatch(chart, Seq(("k", 10.5)).toDF("k", "v"),
      2L, "v", s"$tmp/mon")
    val b2 = spark.read.parquet(s"$tmp/mon/batch=2").collect().head
    assert(b2.getAs[Double]("ucl") == r6(10.0 + 3.0 * math.sqrt(2.0)) &&
      b2.getAs[Long]("out_of_control") == 0L, s"$b2")
    // at-least-once replay overwrites byte-identically
    val before = spark.read.parquet(s"$tmp/mon/batch=1").collect().toSeq
    streaming.SpcStream.spcBatch(chart,
      Seq.fill(4)(("k", 14.0)).toDF("k", "v"), 1L, "v", s"$tmp/mon")
    assert(spark.read.parquet(s"$tmp/mon/batch=1").collect().toSeq == before)
  }

  test("ThetaStream: split stream ≡ one-shot overlap at exact-mode cardinality; duplicate-id replay is idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_thetastream").toString
    // batch 0: s1 sees ids 1-3, s2 sees 2-3; batch 1: s2 sees 4, s3
    // sees 9, AND s1 re-sees id 2 (the cross-batch duplicate a counter
    // would double-count; a sketch must not)
    val b0 = Seq(("s1", 1L), ("s1", 2L), ("s1", 3L), ("s2", 2L), ("s2", 3L))
    val b1 = Seq(("s2", 4L), ("s3", 9L), ("s1", 2L))
    val mem = MemoryStream[(String, Long)]
    val q = streaming.ThetaStream.toThetaSink(
      mem.toDF().toDF("seg", "uid"), col("seg"), col("uid"),
      s"$tmp/state", s"$tmp/ck").start()
    mem.addData(b0: _*)
    q.processAllAvailable()
    mem.addData(b1: _*)
    q.processAllAvailable(); q.stop()
    // reach: at this cardinality theta is exact — s1 = 3 (id 2 seen in
    // two batches counts once), s2 = 3, s3 = 1
    val reach = streaming.ThetaStream.reach(spark, s"$tmp/state")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reach == Map("s1" -> 3L, "s2" -> 3L, "s3" -> 1L), s"$reach")
    // overlap over merged state ≡ the one-shot batch computation
    val ov = streaming.ThetaStream.overlap(spark, s"$tmp/state")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(4), r.getLong(5))).toMap
    assert(ov(("s1", "s2")) == ((2L, 4L)), s"inter/union: $ov")
    assert(ov(("s1", "s3")) == ((0L, 4L)))
    // at-least-once replay: re-landing batch 1 overwrites byte-identically
    // (sketch bytes compared by CONTENT hash — Row.toString of a binary
    // column prints the array reference)
    def snap() = spark.read.parquet(s"$tmp/state/batch=1")
      .select(col("segment"), md5(col("sketch")).as("h"))
      .collect().map(_.toString).sorted.toSeq
    val before = snap()
    streaming.ThetaStream.sketchBatch(b1.toDF("seg", "uid"), 1L,
      col("seg"), col("uid"), s"$tmp/state")
    assert(snap() == before, "replayed sketch state must be byte-identical")
  }

  test("CensusStream: split corpus ≡ one-shot vocab curve and dup profile; replay byte-stable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_censusstream").toString
    // "the cat sat" is web-only in batch 0, goes CROSS-source in batch 1
    // — the retroactive reclassification only sum-then-classify gets right
    val part1 = Seq(("web", "the cat sat"), ("web", "the cat sat"),
      ("forum", "dogs run fast and far"))
    val part2 = Seq(("forum", "the cat sat"),
      ("web", "entirely unique snowflake text"))
    val fp = md5(substring(col("text"), 1, 40))
    val mem = MemoryStream[(String, String)]
    val q = streaming.CensusStream.toCensusSink(
      mem.toDF().toDF("source", "text"), "source", "text", fp,
      s"$tmp/state", s"$tmp/ck").start()
    mem.addData(part1: _*)
    q.processAllAvailable()
    mem.addData(part2: _*)
    q.processAllAvailable(); q.stop()
    val all = (part1 ++ part2).toDF("source", "text")
    val cuts = Seq(2, 5, 100)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toString).sorted.toSeq
    assert(rows(streaming.CensusStream.vocabCurve(spark, s"$tmp/state", cuts))
      == rows(text.Corpus.vocabCoverageCurve(all, "text", cuts)),
      "merged vocab curve ≡ one-shot")
    val streamedDup = streaming.CensusStream.dupProfile(spark, s"$tmp/state")
    assert(rows(streamedDup)
      == rows(text.Corpus.dupProfile(all, "source", fp)),
      "merged dup profile ≡ one-shot")
    // the planted cross-source dup is actually classified cross on BOTH
    // sides even though each side saw it in a different batch
    val web = streamedDup.filter(col("source") === "web").collect().head
    assert(web.getLong(web.fieldIndex("n_cross_dup")) == 2L,
      s"web's 2 copies reclassified cross-source: $web")
    // at-least-once replay: re-landing batch 1 overwrites byte-identically
    val tokBefore = spark.read.parquet(s"$tmp/state/tokens/batch=1")
      .collect().map(_.toString).sorted.toSeq
    val cellBefore = spark.read.parquet(s"$tmp/state/cells/batch=1")
      .collect().map(_.toString).sorted.toSeq
    streaming.CensusStream.censusBatch(part2.toDF("source", "text"), 1L,
      "source", "text", fp, s"$tmp/state")
    assert(spark.read.parquet(s"$tmp/state/tokens/batch=1")
      .collect().map(_.toString).sorted.toSeq == tokBefore)
    assert(spark.read.parquet(s"$tmp/state/cells/batch=1")
      .collect().map(_.toString).sorted.toSeq == cellBefore)
  }

  test("PrivacyStream: split ≡ one-shot k-anonymity/l-diversity; a small batch ALARMS the cumulative gate; replay byte-stable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_privacystream").toString
    // batch 0: two QI classes of size 3 each, 2 distinct diagnoses each
    // → k=3, l=2, nothing at risk
    val part1 = Seq(
      ("z1", "f", "flu"), ("z1", "f", "flu"), ("z1", "f", "cold"),
      ("z2", "m", "flu"), ("z2", "m", "cold"), ("z2", "m", "cold"))
    // batch 1: ONE row in a brand-new QI class → creates a k=1 class
    // and an l=1 class; also pads z1 (still safe)
    val part2 = Seq(("z9", "f", "rare"), ("z1", "f", "flu"))
    val qi = Seq("zip", "sex")
    val mem = MemoryStream[(String, String, String)]
    val q = streaming.PrivacyStream.toPrivacySink(
      mem.toDF().toDF("zip", "sex", "diag"), qi, col("diag"),
      s"$tmp/state", s"$tmp/ck").start()
    mem.addData(part1: _*)
    q.processAllAvailable()
    // the clean interim state: gate green after batch 0
    val mid = streaming.PrivacyStream.kAnonymity(spark, s"$tmp/state", qi, 2)
      .collect().head
    assert(mid.getLong(mid.fieldIndex("n_rows_at_risk")) == 0L,
      s"batch-0 corpus is 2-anonymous: $mid")
    mem.addData(part2: _*)
    q.processAllAvailable(); q.stop()
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toString).sorted.toSeq
    val all = (part1 ++ part2).toDF("zip", "sex", "diag")
    // split ≡ one-shot: both reports equal the batch q362/q363 math
    assert(rows(streaming.PrivacyStream.kAnonymity(spark, s"$tmp/state", qi, 2))
      == rows(etl.Privacy.kAnonymityReport(all, qi, 2)),
      "streamed k-anonymity ≡ one-shot")
    assert(rows(streaming.PrivacyStream.lDiversity(spark, s"$tmp/state", qi, 2))
      == rows(etl.Privacy.lDiversityReport(all, qi, col("diag"), 2)),
      "streamed l-diversity ≡ one-shot")
    // the planted below-k class alarms on the batch that created it
    val rep = streaming.PrivacyStream.kAnonymity(spark, s"$tmp/state", qi, 2)
      .collect().head
    assert(rep.getLong(rep.fieldIndex("k_satisfied")) == 1L &&
      rep.getLong(rep.fieldIndex("n_classes_at_risk")) == 1L &&
      rep.getLong(rep.fieldIndex("n_rows_at_risk")) == 1L,
      s"z9 class alarms: $rep")
    val ldiv = streaming.PrivacyStream.lDiversity(spark, s"$tmp/state", qi, 2)
      .collect().head
    assert(ldiv.getLong(ldiv.fieldIndex("l_satisfied")) == 1L,
      s"z9's single diagnosis alarms l-diversity: $ldiv")
    // at-least-once replay: re-landing batch 1 overwrites byte-identically
    val before = spark.read.parquet(s"$tmp/state/cells/batch=1")
      .collect().map(_.toString).sorted.toSeq
    streaming.PrivacyStream.privacyBatch(part2.toDF("zip", "sex", "diag"),
      1L, qi, col("diag"), s"$tmp/state")
    assert(spark.read.parquet(s"$tmp/state/cells/batch=1")
      .collect().map(_.toString).sorted.toSeq == before, "replay idempotent")
  }

  test("CovStream: split corpus ≡ one-shot participation ratio (exact on integer vectors); replay byte-stable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_covstream").toString
    // the exact-PR corpus: the 3-of-6-dims ±1 cube (PR = 3, share 0.5),
    // integer-valued so moment sums are fp-EXACT under any batch split
    val cube = (0 until 8).map { m =>
      (m.toLong, Seq(if ((m & 1) == 0) -1.0 else 1.0,
        if ((m & 2) == 0) -1.0 else 1.0,
        if ((m & 4) == 0) -1.0 else 1.0, 0.0, 0.0, 0.0))
    }
    val (part1, part2) = cube.splitAt(3)
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = streaming.CovStream.toCovSink(
      mem.toDF().toDF("id", "v"), "v", s"$tmp/state", s"$tmp/ck").start()
    mem.addData(part1: _*)
    q.processAllAvailable()
    mem.addData(part2: _*)
    q.processAllAvailable(); q.stop()
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toString).toSeq
    val streamed = streaming.CovStream.participationRatio(spark, s"$tmp/state")
    val oneShot = sim.Geometry.participationRatio(
      cube.map(_._2).toDF("v"), "v")
    assert(rows(streamed) == rows(oneShot),
      s"split ≡ one-shot: ${rows(streamed)} vs ${rows(oneShot)}")
    assert(streamed.collect().head.getDouble(4) == 0.5, "cube PR share")
    // at-least-once replay: re-landing batch 1 overwrites byte-identically
    val before = spark.read.parquet(s"$tmp/state/moments/batch=1")
      .collect().map(_.toString).toSeq
    streaming.CovStream.covBatch(part2.toDF("id", "v"), 1L, "v",
      s"$tmp/state")
    assert(spark.read.parquet(s"$tmp/state/moments/batch=1")
      .collect().map(_.toString).toSeq == before, "replay idempotent")
  }

  test("CovStream keyed: split ≡ one-shot per key; planted per-source collapse alarms on pr_share; replay byte-stable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_covstream_by").toString
    // feed 1 = the healthy ±1 cube (PR = 3 of 6); feed 2 = COLLAPSED —
    // every vector a multiple of e1 (PR = 1): the per-source alarm case
    // a global moment row averages away. Integer-valued ⇒ fp-exact
    // under any split.
    val cube = (0 until 8).map { m =>
      (1L, Seq(if ((m & 1) == 0) -1.0 else 1.0,
        if ((m & 2) == 0) -1.0 else 1.0,
        if ((m & 4) == 0) -1.0 else 1.0, 0.0, 0.0, 0.0))
    }
    val line = Seq(1.0, 2.0, 3.0, 4.0).map(t =>
      (2L, Seq(t, 0.0, 0.0, 0.0, 0.0, 0.0)))
    val all = cube ++ line
    // interleaved split: each batch carries rows of BOTH keys
    val (part1, part2) = (all.zipWithIndex.filter(_._2 % 2 == 0).map(_._1),
      all.zipWithIndex.filter(_._2 % 2 == 1).map(_._1))
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = streaming.CovStream.toCovSinkBy(
      mem.toDF().toDF("k", "v"), "k", "v", s"$tmp/state", s"$tmp/ck").start()
    mem.addData(part1: _*)
    q.processAllAvailable()
    mem.addData(part2: _*)
    q.processAllAvailable(); q.stop()
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("k").collect().map(_.toString).toSeq
    val streamed = streaming.CovStream.participationRatioBy(
      spark, s"$tmp/state", keyCol = "k")
    val oneShot = sim.Geometry.participationRatioBy(
      all.toDF("k", "v"), "k", "v")
    assert(rows(streamed) == rows(oneShot),
      s"split ≡ one-shot per key: ${rows(streamed)} vs ${rows(oneShot)}")
    // the collapse alarm: feed 2's share sits far under feed 1's
    val byKey = streamed.collect().map(r => r.getLong(0) ->
      (r.getDouble(4), r.getDouble(5))).toMap
    assert(byKey(1L)._1 == 3.0 && byKey(2L)._1 == 1.0,
      s"per-key PR: $byKey")
    val alarms = streamed.filter(col("pr_share") < 0.3)
      .select("k").as[Long].collect().toSeq
    assert(alarms == Seq(2L), s"collapsed feed alarms alone: $alarms")
    // at-least-once replay of batch 1: byte-identical overwrite
    val before = spark.read.parquet(s"$tmp/state/moments_by/batch=1")
      .collect().map(_.toString).sorted.toSeq
    streaming.CovStream.covBatchBy(part2.toDF("k", "v"), 1L, "k", "v",
      s"$tmp/state")
    assert(spark.read.parquet(s"$tmp/state/moments_by/batch=1")
      .collect().map(_.toString).sorted.toSeq == before, "replay idempotent")
  }
}
