package graft

import org.scalatest.funsuite.AnyFunSuite
import multimodal.Binary

/** The real header-decode stage (r14): format magic + dimension layouts
  * round-trip through the synthetic generator, and — the part a crawl
  * column actually exercises — truncated, corrupt, and hostile headers
  * come back `valid = false` with NULL dims instead of throwing.
  */
class MediaHeaderSpec extends AnyFunSuite {
  import TestSpark._

  private def parse(b: Array[Byte]) = Binary.parseMediaHeader(b)

  test("synthMediaBlob round-trips through parseMediaHeader for every format case") {
    for (id <- 0L until 25L) {
      val (fmt, w, h, d, ok) = parse(Binary.synthMediaBlob(id))
      (id % 5) match {
        case 0 =>
          assert(fmt == "png" && ok)
          assert(w.contains(16 + (id % 256).toInt) &&
            h.contains(8 + (id % 128).toInt) && d.contains(8))
        case 1 =>
          assert(fmt == "jpeg" && ok)
          assert(w.contains(32 + (id % 200).toInt) &&
            h.contains(24 + (id % 100).toInt) && d.contains(8))
        case 2 =>
          assert(fmt == "gif" && ok)
          assert(w.contains(1 + (id % 300).toInt) &&
            h.contains(1 + (id % 150).toInt) && d.isEmpty)
        case 3 =>
          assert(fmt == "bmp" && ok)
          assert(w.contains(64 + (id % 50).toInt) &&
            h.contains(48 + (id % 25).toInt) && d.contains(24))
        case _ =>
          assert(fmt == "unknown" && !ok && w.isEmpty && h.isEmpty)
      }
    }
  }

  test("truncated headers: recognized magic, valid=false, NULL dims, no throw") {
    // PNG cut inside IHDR (magic + 12 of the 18 needed header bytes)
    val pngCut = Binary.synthMediaBlob(0L).take(20)
    assert(parse(pngCut) == (("png", None, None, None, false)))
    // JPEG with SOI but the stream ends before any SOF marker
    val jpegCut = Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x10).map(_.toByte)
    assert(parse(jpegCut) == (("jpeg", None, None, None, false)))
    // JPEG whose APP0 length field points past the end of the buffer
    val jpegOverrun = Array(0xff, 0xd8, 0xff, 0xe0, 0x7f, 0xff, 0x00)
      .map(_.toByte)
    assert(parse(jpegOverrun) == (("jpeg", None, None, None, false)))
    // GIF cut inside the logical screen descriptor
    assert(parse("GIF89a".getBytes("ISO-8859-1")) ==
      (("gif", None, None, None, false)))
    // BMP cut inside the DIB header
    assert(parse(Binary.synthMediaBlob(3L).take(20)) ==
      (("bmp", None, None, None, false)))
  }

  test("corrupt headers: mangled chunk type, zero dims, bad segment length") {
    // full-length PNG with the IHDR tag overwritten
    val mangled = Binary.synthMediaBlob(0L).clone()
    mangled(12) = 'X'.toByte
    assert(parse(mangled) == (("png", None, None, None, false)))
    // PNG declaring width 0
    val zeroW = Binary.synthMediaBlob(0L).clone()
    zeroW(16) = 0; zeroW(17) = 0; zeroW(18) = 0; zeroW(19) = 0
    assert(parse(zeroW) == (("png", None, None, None, false)))
    // JPEG segment with an impossible length (< 2 can never include
    // its own length field — a classic parser-loop trap)
    val badLen = Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x01, 0x00, 0x00)
      .map(_.toByte)
    assert(parse(badLen) == (("jpeg", None, None, None, false)))
    // empty + unrecognizable
    assert(parse(Array.empty[Byte]) == (("unknown", None, None, None, false)))
    assert(parse(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10)) ==
      (("unknown", None, None, None, false)))
  }

  test("JPEG marker walk: skips COM/APPn segments, reads progressive SOF2, honors RSTn standalone markers") {
    val bb = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def u8(v: Int): Unit = bb += (v & 0xff).toByte
    def u16(v: Int): Unit = { u8(v >>> 8); u8(v) }
    u8(0xff); u8(0xd8) // SOI
    u8(0xff); u8(0xfe); u16(6); u8('h'); u8('i'); u8('!'); u8('!') // COM
    u8(0xff); u8(0xd0) // RST0: standalone, no length field
    u8(0xff); u8(0xc2); u16(11) // SOF2 (progressive)
    u8(12); u16(600); u16(800); u8(1); u8(1); u8(0x11); u8(0)
    assert(parse(bb.toArray) ==
      (("jpeg", Some(800), Some(600), Some(12), true)))
  }

  test("JPEG marker walk: 0xFF fill bytes before a marker are legal padding (ITU T.81 B.1.1.2), not a marker code") {
    val bb = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def u8(v: Int): Unit = bb += (v & 0xff).toByte
    def u16(v: Int): Unit = { u8(v >>> 8); u8(v) }
    u8(0xff); u8(0xd8) // SOI
    // three fill bytes, then COM — the r14 walk read the first fill as
    // marker code 0xFF with a bogus length and called the file invalid
    u8(0xff); u8(0xff); u8(0xff)
    u8(0xff); u8(0xfe); u16(4); u8('o'); u8('k') // COM
    u8(0xff); u8(0xff) // fills directly before the frame header too
    u8(0xff); u8(0xc0); u16(11) // SOF0
    u8(8); u16(240); u16(320); u8(1); u8(1); u8(0x11); u8(0)
    assert(parse(bb.toArray) ==
      (("jpeg", Some(320), Some(240), Some(8), true)))
    // fills running off the end stay total: invalid, no throw
    val junk = Array(0xff, 0xd8, 0xff, 0xff, 0xff, 0xff).map(_.toByte)
    assert(parse(junk) == (("jpeg", None, None, None, false)))
  }

  test("BMP top-down rows (negative height) parse with |height|") {
    val b = Binary.synthMediaBlob(3L).clone() // id 3 -> w = 64+3 = 67
    // height int32 LE at offset 22 := -48
    val neg = -48
    b(22) = (neg & 0xff).toByte; b(23) = ((neg >> 8) & 0xff).toByte
    b(24) = ((neg >> 16) & 0xff).toByte; b(25) = ((neg >> 24) & 0xff).toByte
    assert(parse(b) == (("bmp", Some(67), Some(48), Some(24), true)))
  }

  test("BMP pixel decode round-trips synthPixelBmp for both row orders; truncated arrays are invalid") {
    for (id <- 0L until 40L) {
      val dec = Binary.decodeBmpPixels(Binary.synthPixelBmp(id))
      if (id % 10 == 9) assert(dec.isEmpty, s"truncated id=$id must be invalid")
      else {
        val w = (4 + id % 9).toInt; val h = (3 + id % 7).toInt
        var sb = 0L; var sg = 0L; var sr = 0L; var ywr = 0L
        for (y <- 0 until h; x <- 0 until w) {
          sb += (id + 7 * x + 13 * y) % 256
          sg += (3 * id + 5 * x + 11 * y) % 256
          val r = (2 * id + x + 17 * y) % 256
          sr += r; ywr += y * r
        }
        assert(dec.contains((w, h, w.toLong * h, sb, sg, sr, ywr,
          (id % 256).toInt)), s"id=$id: $dec")
      }
    }
  }

  test("BMP pixel decode: yWeightedRSum is row-order sensitive (flipping the height sign changes it)") {
    val b = Binary.synthPixelBmp(4L).clone() // even id: bottom-up, h = 7
    val Some((_, h, _, _, _, sr, ywr, _)) = Binary.decodeBmpPixels(b)
    // rewrite height i32 LE at 22 as negative: decoder now reads the
    // SAME file rows top-down — an order-blind decoder would agree
    val neg = -h
    b(22) = (neg & 0xff).toByte; b(23) = ((neg >> 8) & 0xff).toByte
    b(24) = ((neg >> 16) & 0xff).toByte; b(25) = ((neg >> 24) & 0xff).toByte
    val Some((_, _, _, _, _, sr2, ywr2, _)) = Binary.decodeBmpPixels(b)
    assert(sr2 == sr, "channel sums are order-invariant by design")
    assert(ywr2 != ywr, "y-weighted sum must catch a row-order confusion")
  }

  test("BMP pixel decode rejects non-BI_RGB and non-24-bpp blobs, no throw") {
    val base = Binary.synthPixelBmp(2L)
    val bpp8 = base.clone(); bpp8(28) = 8.toByte
    assert(Binary.decodeBmpPixels(bpp8).isEmpty)
    val rle = base.clone(); rle(30) = 1.toByte // BI_RLE8
    assert(Binary.decodeBmpPixels(rle).isEmpty)
    assert(Binary.decodeBmpPixels(Array[Byte]()).isEmpty)
    assert(Binary.decodeBmpPixels(Binary.synthMediaBlob(0L)).isEmpty) // png
  }

  test("mediaInfo: batched Dataset probe emits the real schema over mixed blobs") {
    import spark.implicits._
    val blobs = (0L until 40L)
      .map(id => Binary.Blob(id, Binary.synthMediaBlob(id))).toDS()
    val out = Binary.mediaInfo(blobs, batchSize = 7).collect()
    assert(out.length == 40)
    assert(out.count(_.valid) == 32 && out.count(_.format == "unknown") == 8)
    val png0 = out.find(_.id == 0L).get
    assert(png0.format == "png" && png0.width.contains(16) &&
      png0.nBytes == 33L)
  }
}
