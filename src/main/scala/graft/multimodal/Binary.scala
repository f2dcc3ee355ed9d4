package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travels as an opaque `binary` column plus typed metadata; the
  * expensive decode/feature step runs batched per partition so a real
  * implementation can amortize model/codec setup (the standard Spark
  * pattern for inference). Two tiers (r14): the HEADER stage
  * ([[mediaInfo]] / [[parseMediaHeader]]) is REAL — magic-byte format
  * detection plus PNG-IHDR / JPEG-SOF / GIF-LSD / BMP-DIB dimension
  * parsing from the public byte formats, oracle-gated on synthetic
  * blobs (q385) and spec'd on truncated/corrupt headers. The PIXEL
  * stage is real for the one format that needs no codec library:
  * uncompressed 24-bpp BMP ([[bmpPixelStats]] — BI_RGB rows are plain
  * arithmetic over the public layout, oracle-gated at q389). PNG/JPEG
  * pixel decode (zlib/DCT) stays a deterministic byte-statistics
  * stand-in ([[featurize]]) — actual codecs are not available in this
  * environment — with the schema, batching shape, and partitioning
  * being the real production plumbing.
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

  // ---- real header decode (magic-byte detect + dimensions) ------------

  /** Parsed media header: `format` from magic bytes; dimensions /
    * bit depth from the format's own header layout; `valid` = false when
    * the magic is recognized but the header is truncated or corrupt
    * (dims stay NULL). All pure public byte-format knowledge — PNG
    * (RFC 2083 §3.1/§4.1.1), JPEG/JFIF (ITU T.81 SOF segments), GIF
    * (GIF89a spec, logical screen descriptor), BMP
    * (BITMAPINFOHEADER) — no codec libraries; PIXEL decode (the part
    * that genuinely needs libpng-class codecs absent here) remains out
    * of scope, but the header stage is real and oracle-checkable.
    */
  case class MediaInfo(id: Long, format: String, width: Option[Int],
                       height: Option[Int], bitDepth: Option[Int],
                       nBytes: Long, valid: Boolean)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def le32(b: Array[Byte], i: Int): Int =
    ((b(i + 3) & 0xff) << 24) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)

  private val pngMagic =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** (format, width, height, bitDepth, valid) for one blob. Total: never
    * throws on truncated/corrupt/empty input — that is the point of a
    * header prober running over a 100 TB crawl column.
    */
  def parseMediaHeader(b: Array[Byte]): (String, Option[Int], Option[Int],
      Option[Int], Boolean) = {
    def invalid(fmt: String) = (fmt, None, None, None, false)
    if (b.length >= 8 && b.take(8).sameElements(pngMagic)) {
      // IHDR must be the first chunk: 4-byte length (= 13), "IHDR",
      // then width/height (big-endian u32), bit depth, color type
      if (b.length >= 26 && be32(b, 8) == 13 &&
          b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
        val w = be32(b, 16); val h = be32(b, 20)
        if (w > 0 && h > 0)
          ("png", Some(w), Some(h), Some(b(24) & 0xff), true)
        else invalid("png")
      } else invalid("png")
    } else if (b.length >= 3 && (b(0) & 0xff) == 0xff &&
        (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff) {
      // marker walk to the first SOF0/1/2 frame header: [precision u8,
      // height u16be, width u16be]. Standalone markers (SOI/EOI/RSTn/
      // TEM) carry no length field; every other segment's length
      // includes its own two bytes.
      var i = 2
      var res: (String, Option[Int], Option[Int], Option[Int], Boolean) = null
      while (res == null && i + 1 < b.length) {
        if ((b(i) & 0xff) != 0xff) { res = invalid("jpeg") }
        else {
          // ITU T.81 B.1.1.2: a marker may be preceded by any number of
          // 0xFF FILL bytes — skip them before reading the code, else a
          // padded-but-valid file misparses (0xFF is never a marker
          // code; the r14 walk read it as a length-carrying segment)
          while (i + 2 < b.length && (b(i + 1) & 0xff) == 0xff) i += 1
          val m = b(i + 1) & 0xff
          if (m == 0xff) { res = invalid("jpeg") } // fills ran off the end
          else if (m == 0xc0 || m == 0xc1 || m == 0xc2) {
            if (i + 8 < b.length) {
              val h = be16(b, i + 5); val w = be16(b, i + 7)
              res = if (w > 0 && h > 0)
                ("jpeg", Some(w), Some(h), Some(b(i + 4) & 0xff), true)
              else invalid("jpeg")
            } else res = invalid("jpeg")
          } else if (m == 0xd8 || m == 0xd9 || m == 0x01 ||
              (m >= 0xd0 && m <= 0xd7)) {
            i += 2
          } else if (i + 3 < b.length) {
            val segLen = be16(b, i + 2)
            if (segLen < 2) res = invalid("jpeg") else i += 2 + segLen
          } else res = invalid("jpeg")
        }
      }
      if (res != null) res else invalid("jpeg")
    } else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      // logical screen descriptor: width/height u16 LITTLE-endian at 6/8
      if (b.length >= 10) {
        val w = le16(b, 6); val h = le16(b, 8)
        if (w > 0 && h > 0) ("gif", Some(w), Some(h), None, true)
        else invalid("gif")
      } else invalid("gif")
    } else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') {
      // BITMAPINFOHEADER: i32 width/height (LE) at 18/22, u16 bpp at 28
      if (b.length >= 30 && le32(b, 14) >= 40) {
        val w = le32(b, 18); val h = le32(b, 22)
        if (w > 0 && h != 0) // negative height = top-down rows, legal
          ("bmp", Some(w), Some(math.abs(h)), Some(le16(b, 28)), true)
        else invalid("bmp")
      } else invalid("bmp")
    } else ("unknown", None, None, None, false)
  }

  /** Batched header probe over binary blobs — the REAL replacement for
    * the r13 stub at the q40 surface: same `mapPartitions` + grouped
    * batch shape as [[featurize]] (the amortization point a codec/model
    * needs), emitting magic-detected format + parsed dimensions.
    */
  def mediaInfo(blobs: Dataset[Blob], batchSize: Int = 64): Dataset[MediaInfo] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { b =>
        val (fmt, w, h, d, ok) = parseMediaHeader(b.bytes)
        MediaInfo(b.id, fmt, w, h, d, b.bytes.length.toLong, ok)
      })
    }
  }

  /** Deterministic synthetic media blobs for the oracle gate (the q16
    * plant-in-query discipline): id % 5 cycles PNG / JFIF+SOF0 JPEG /
    * GIF89a / BMP / truncated-magic junk, dimensions derived from the
    * id by fixed arithmetic the oracle repeats in SQL. Headers are
    * REAL bytes per the public specs (the parser gets no hints); pixel
    * payloads are omitted — the header is the unit under test.
    */
  def synthMediaBlob(id: Long): Array[Byte] = {
    val bb = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def u8(v: Int): Unit = bb += (v & 0xff).toByte
    def u16be(v: Int): Unit = { u8(v >>> 8); u8(v) }
    def u32be(v: Int): Unit = { u16be(v >>> 16); u16be(v) }
    def u16le(v: Int): Unit = { u8(v); u8(v >>> 8) }
    def u32le(v: Int): Unit = { u16le(v); u16le(v >>> 16) }
    def ascii(s: String): Unit = s.foreach(c => bb += c.toByte)
    (id % 5) match {
      case 0 =>
        val w = 16 + (id % 256).toInt; val h = 8 + (id % 128).toInt
        bb ++= pngMagic
        u32be(13); ascii("IHDR"); u32be(w); u32be(h)
        u8(8); u8(2); u8(0); u8(0); u8(0) // depth 8, truecolor
        u32be(0) // CRC not validated by the header probe
      case 1 =>
        val w = 32 + (id % 200).toInt; val h = 24 + (id % 100).toInt
        u8(0xff); u8(0xd8) // SOI
        u8(0xff); u8(0xe0); u16be(16); ascii("JFIF"); u8(0) // APP0
        u8(1); u8(1); u8(0); u16be(1); u16be(1); u8(0); u8(0)
        u8(0xff); u8(0xc0); u16be(17) // SOF0: baseline frame header
        u8(8); u16be(h); u16be(w); u8(3)
        for (c <- 1 to 3) { u8(c); u8(0x11); u8(0) }
        u8(0xff); u8(0xd9) // EOI
      case 2 =>
        val w = 1 + (id % 300).toInt; val h = 1 + (id % 150).toInt
        ascii("GIF89a"); u16le(w); u16le(h); u8(0); u8(0); u8(0)
        u8(0x3b) // trailer
      case 3 =>
        val w = 64 + (id % 50).toInt; val h = 48 + (id % 25).toInt
        ascii("BM"); u32le(54); u32le(0); u32le(54) // header + offsets
        u32le(40); u32le(w); u32le(h) // BITMAPINFOHEADER
        u16le(1); u16le(24) // planes, bpp
        u32le(0); u32le(0); u32le(0); u32le(0); u32le(0); u32le(0)
      case _ =>
        bb ++= pngMagic.take(6) // truncated magic: unrecognizable
    }
    bb.toArray
  }

  // ---- real pixel decode: uncompressed BMP ----------------------------

  /** Per-blob pixel statistics from a REAL decode of the uncompressed
    * 24-bpp BMP pixel array (r15 — closes the pixel-stage stand-in for
    * the one format whose pixels are decodable with ZERO codec
    * libraries: BI_RGB is plain arithmetic over the public layout).
    * PNG/JPEG pixels stay declared out of scope (zlib/DCT — codec
    * territory).
    *
    * The stats are chosen to make decode BUGS oracle-visible, not just
    * decode success: channel SUMS alone are invariant to row order, so
    * `yWeightedRSum` (Σ yTopDown·R over the LOGICAL top-down grid)
    * breaks if bottom-up rows are read in file order or the stride
    * padding is miscounted, and `cornerTlB` pins the (0,0) pixel.
    * Invalid cases (non-BMP, compressed, non-24-bpp, truncated pixel
    * array) come back `valid = false` with NULL stats — total, like
    * [[parseMediaHeader]].
    */
  case class BmpPixels(id: Long, width: Option[Int], height: Option[Int],
                       nPx: Option[Long], sumB: Option[Long],
                       sumG: Option[Long], sumR: Option[Long],
                       yWeightedRSum: Option[Long], cornerTlB: Option[Int],
                       valid: Boolean)

  /** Decode one uncompressed 24-bpp BMP's pixel array to
    * (w, h, nPx, sumB, sumG, sumR, yWeightedRSum, cornerTlB).
    * None when the blob is not a BI_RGB 24-bpp BMP with a complete
    * pixel array. Rows are 4-byte aligned (stride = ceil(3w/4)·4);
    * positive height = BOTTOM-UP row order (the default), negative =
    * top-down; either way the stats are over the logical top-down grid.
    */
  def decodeBmpPixels(b: Array[Byte]): Option[(Int, Int, Long, Long, Long,
      Long, Long, Int)] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    if (le32(b, 14) < 40) return None // need BITMAPINFOHEADER+
    val pixelOff = le32(b, 10)
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (w <= 0 || h == 0 || bpp != 24 || compression != 0) return None
    val stride = ((w * 3 + 3) / 4) * 4
    if (pixelOff < 54 || pixelOff.toLong + stride.toLong * h > b.length)
      return None // truncated pixel array
    var sumB = 0L; var sumG = 0L; var sumR = 0L; var ywr = 0L
    var yTop = 0
    while (yTop < h) {
      // file row for this logical (top-down) row
      val fileRow = if (topDown) yTop else h - 1 - yTop
      val rowStart = pixelOff + fileRow * stride
      var x = 0
      while (x < w) {
        val i = rowStart + 3 * x
        sumB += b(i) & 0xff
        sumG += b(i + 1) & 0xff
        val r = b(i + 2) & 0xff
        sumR += r
        ywr += yTop.toLong * r
        x += 1
      }
      yTop += 1
    }
    val corner = b(pixelOff + (if (topDown) 0 else (h - 1) * stride)) & 0xff
    Some((w, h, w.toLong * h, sumB, sumG, sumR, ywr, corner))
  }

  /** Batched BMP pixel-stats probe — same `mapPartitions` + grouped
    * batch shape as [[featurize]]/[[mediaInfo]].
    */
  def bmpPixelStats(blobs: Dataset[Blob], batchSize: Int = 64): Dataset[BmpPixels] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { blob =>
        decodeBmpPixels(blob.bytes) match {
          case Some((w, h, n, sb, sg, sr, ywr, c)) =>
            BmpPixels(blob.id, Some(w), Some(h), Some(n), Some(sb),
              Some(sg), Some(sr), Some(ywr), Some(c), valid = true)
          case None =>
            BmpPixels(blob.id, None, None, None, None, None, None, None,
              None, valid = false)
        }
      })
    }
  }

  /** Deterministic synthetic 24-bpp BMP with a pixel grid derived from
    * the id by fixed LINEAR arithmetic the oracle repeats in SQL
    * (products avoided so DuckDB recomputes channel sums from two
    * generate_series): at logical top-down (x, y),
    * B = (id + 7x + 13y) % 256, G = (3id + 5x + 11y) % 256,
    * R = (2id + x + 17y) % 256. Odd ids are written TOP-DOWN (negative
    * height), even ids BOTTOM-UP — same logical grid either way, so an
    * order-blind decoder fails the yWeightedRSum value. Widths 4-12 at
    * 3 bytes/px exercise every stride-padding remainder (0-3 bytes);
    * id%10==9 truncates the pixel array (the prober must call it
    * invalid, not throw or misread).
    */
  def synthPixelBmp(id: Long): Array[Byte] = {
    val w = (4 + id % 9).toInt
    val h = (3 + id % 7).toInt
    val topDown = id % 2 == 1
    val stride = ((w * 3 + 3) / 4) * 4
    val size = 54 + stride * h
    val out = new Array[Byte](size) // padding bytes stay 0
    var p = 0
    def u8(v: Int): Unit = { out(p) = (v & 0xff).toByte; p += 1 }
    def u16le(v: Int): Unit = { u8(v); u8(v >>> 8) }
    def u32le(v: Int): Unit = { u16le(v); u16le(v >>> 16) }
    u8('B'); u8('M'); u32le(size); u32le(0); u32le(54)
    u32le(40); u32le(w); u32le(if (topDown) -h else h)
    u16le(1); u16le(24); u32le(0); u32le(stride * h)
    u32le(0); u32le(0); u32le(0); u32le(0)
    var fileRow = 0
    while (fileRow < h) {
      val y = if (topDown) fileRow else h - 1 - fileRow // logical row
      var x = 0
      while (x < w) {
        val i = 54 + fileRow * stride + 3 * x
        out(i) = ((id + 7 * x + 13 * y) % 256).toByte
        out(i + 1) = ((3 * id + 5 * x + 11 * y) % 256).toByte
        out(i + 2) = ((2 * id + x + 17 * y) % 256).toByte
        x += 1
      }
      fileRow += 1
    }
    if (id % 10 == 9) out.dropRight(5) else out
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
