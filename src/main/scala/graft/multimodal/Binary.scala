package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travels as an opaque `binary` column plus typed metadata; the
  * expensive decode/feature step runs batched per partition so a real
  * implementation can amortize model/codec setup (the standard Spark
  * pattern for inference). The decode itself is STUBBED with a
  * deterministic byte-statistics transform — the image/audio codecs are
  * not available in this environment — but the schema, batching shape,
  * and partitioning are the real production plumbing.
  */
object Binary {

  /** Lightweight per-blob metadata — pure expressions, no decode.
    * `head` decodes the blob to string FIRST and then takes 8 CHARACTERS
    * (not 8 raw bytes): byte-slicing UTF-8 text truncates mid-codepoint on
    * any non-ASCII content, diverging from a character-based oracle.
    */
  def withBlobMeta(df: DataFrame, blobCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(blobCol)).cast("long"))
      .withColumn("content_md5", md5(col(blobCol)))
      .withColumn("head", substring(col(blobCol).cast("string"), 1, 8))

  case class Blob(id: Long, bytes: Array[Byte])
  case class BlobFeatures(id: Long, nBytes: Long, meanByte: Double, features: Array[Float])

  /** Batched "decode + featurize" over binary blobs.
    *
    * STUB: features are a 16-bin byte histogram (deterministic fake
    * standing in for pixel/audio features). Real use: replace
    * `decodeBatch` with the codec + model call; everything else —
    * `mapPartitions`, the batch grouping, the output schema — stays.
    */
  def featurize(blobs: Dataset[Blob], batchSize: Int = 64): Dataset[BlobFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.grouped(batchSize).flatMap(decodeBatch)
    }
  }

  private def decodeBatch(batch: Seq[Blob]): Seq[BlobFeatures] =
    // one "model call" per batch — the amortization point
    batch.map { b =>
      val hist = new Array[Float](16)
      var sum = 0L
      b.bytes.foreach { byte =>
        val u = byte & 0xff
        hist(u / 16) += 1f
        sum += u
      }
      val n = math.max(b.bytes.length, 1)
      BlobFeatures(b.id, b.bytes.length.toLong, sum.toDouble / n,
        hist.map(_ / n))
    }

  // ---- content-defined chunking (blob-level dedup) --------------------

  case class Chunk(id: Long, chunkIdx: Int, offset: Int, length: Int,
                   chunkHash: Long)

  /** Deterministic 256-entry gear table (seeded — reproducible across
    * runs, executors, and releases; a changed table invalidates every
    * stored chunk hash, so it is pinned).
    */
  private val gearTable: Array[Long] = {
    val rnd = new scala.util.Random(0x67454152L) // "gEAR"
    Array.fill(256)(rnd.nextLong())
  }

  /** Content-defined chunking by a gear rolling hash (the Gear/FastCDC
    * family — Xia et al. FAST'16): a chunk boundary lands after byte i
    * when the rolling hash's low `avgBits` bits are zero (expected chunk
    * ≈ 2^avgBits bytes past `minLen`), forced at `maxLen`. Because the
    * 64-bit shift decays a byte's influence after 64 positions, an
    * insertion re-synchronizes boundaries within ~64 bytes — the CDC
    * property that makes chunk-hash dedup survive edits where fixed-size
    * chunking loses every block after the edit (spec'd on a planted
    * insertion). Imperative per-blob loop BY NATURE (each byte's
    * boundary decision depends on the running hash), so it rides the
    * same `mapPartitions`-class path as [[featurize]] — the documented
    * last-resort islands. Chunk identity = FNV-1a 64 over the chunk's
    * bytes.
    */
  def cdcChunks(blobs: Dataset[Blob], avgBits: Int = 6, minLen: Int = 16,
                maxLen: Int = 256): Dataset[Chunk] = {
    require(avgBits >= 1 && avgBits <= 20, s"avgBits out of range: $avgBits")
    require(minLen >= 1 && maxLen > minLen, s"bad minLen/maxLen")
    import blobs.sparkSession.implicits._
    val mask = (1L << avgBits) - 1
    blobs.flatMap { b =>
      val bytes = b.bytes
      val out = scala.collection.mutable.ArrayBuffer.empty[Chunk]
      var start = 0
      var h = 0L
      var i = 0
      var idx = 0
      def close(endExcl: Int): Unit = {
        var fnv = 0xcbf29ce484222325L
        var j = start
        while (j < endExcl) {
          fnv = (fnv ^ (bytes(j) & 0xffL)) * 0x100000001b3L
          j += 1
        }
        out += Chunk(b.id, idx, start, endExcl - start, fnv)
        idx += 1; start = endExcl; h = 0L
      }
      while (i < bytes.length) {
        h = (h << 1) + gearTable(bytes(i) & 0xff)
        val len = i - start + 1
        if ((len >= minLen && (h & mask) == 0L) || len >= maxLen) close(i + 1)
        i += 1
      }
      if (start < bytes.length) close(bytes.length)
      out.toSeq
    }
  }

  /** Per-blob chunk-dedup report over [[cdcChunks]]: how much of each
    * blob's content (chunks and bytes) already exists elsewhere in the
    * corpus under content-defined chunking — the storage/transfer dedup
    * estimate for a binary/media column, robust to insertions in a way
    * byte-offset chunking is not. One chunk explode, one hash-keyed
    * count, one join back, one per-blob fold.
    */
  def cdcDupReport(blobs: Dataset[Blob], avgBits: Int = 6, minLen: Int = 16,
                   maxLen: Int = 256, digits: Int = 6): DataFrame = {
    val chunks = cdcChunks(blobs, avgBits, minLen, maxLen)
    val freq = chunks.groupBy(col("chunkHash"))
      .agg(count(lit(1)).as("__f"))
    chunks.join(freq, "chunkHash")
      .groupBy(col("id"))
      .agg(count(lit(1)).cast("long").as("n_chunks"),
        sum(col("length")).cast("long").as("n_bytes"),
        sum(when(col("__f") > 1, 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(when(col("__f") > 1, col("length")).otherwise(0L))
          .cast("long").as("dup_bytes"))
      .select(col("id"), col("n_chunks"), col("n_bytes"),
        col("n_dup_chunks"), col("dup_bytes"),
        graft.functions.roundStable(col("dup_bytes").cast("double") /
          greatest(col("n_bytes"), lit(1L)), digits).as("dup_byte_share"))
  }
}
