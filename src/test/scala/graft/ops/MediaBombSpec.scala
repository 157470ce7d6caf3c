package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Decompression-bomb guard (round 12): a crawl corpus can carry tiny
  * crafted containers whose headers legally claim enormous rasters (VP8L
  * and VP8 dims are 14-bit → 16383² ≈ 268 Mpx ≈ a 1 GB RGBA allocation
  * from a ~50-byte file; GIF/JPEG dims are 16-bit, PNG/TIFF 32-bit), and
  * the raster allocation happens BEFORE any content parse can fail. Every
  * raster codec must refuse such headers with the typed `unsupported`
  * kind against [[Multimodal.MaxDecodePixels]] — fast, and before any
  * proportional allocation.
  */
class MediaBombSpec extends AnyFunSuite {

  private def kindOf(f: => Any): String =
    Multimodal.errKind(intercept[IllegalArgumentException](f).getMessage)

  private def assertBombRefused(name: String)(f: => Any): Unit = {
    val before = Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
    val t0 = System.nanoTime()
    val e = intercept[IllegalArgumentException](f)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(Multimodal.errKind(e.getMessage) == "unsupported", s"$name: ${e.getMessage}")
    assert(e.getMessage.contains("pixel decode budget"), s"$name: ${e.getMessage}")
    assert(ms < 1000, s"$name took ${ms}ms to refuse")
    val after = Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
    assert(after - before < 64L * 1024 * 1024, s"$name allocated ${(after - before) >> 20}MB")
  }

  test("PNG: 20000x20000 IHDR refuses before allocation") {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    ihdr.write("IHDR".getBytes("US-ASCII"))
    ihdr.write(be32(20000)); ihdr.write(be32(20000))
    ihdr.write(Array[Byte](8, 0, 0, 0, 0)) // depth 8, gray, no interlace
    val body = ihdr.toByteArray
    val crc = new java.util.zip.CRC32(); crc.update(body)
    out.write(be32(body.length - 4)); out.write(body); out.write(be32(crc.getValue.toInt))
    assertBombRefused("PNG")(Png.decode(out.toByteArray))
  }

  test("GIF: 60000x60000 screen descriptor refuses") {
    val b = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](0x60.toByte, 0xea.toByte, 0x60.toByte, 0xea.toByte, 0, 0, 0)
    assertBombRefused("GIF")(Gif.decode(b))
  }

  test("JPEG: 65000x65000 SOF0 refuses") {
    def u16(v: Int) = Array((v >> 8).toByte, v.toByte)
    val b = Array(0xff, 0xd8).map(_.toByte) ++ // SOI
      Array(0xff, 0xc0).map(_.toByte) ++ u16(11) ++ Array[Byte](8) ++ // SOF0, prec 8
      u16(65000) ++ u16(65000) ++ Array[Byte](1, 1, 0x11, 0)
    assertBombRefused("JPEG")(Jpeg.decode(b))
  }

  test("TIFF: 65535x65535 IFD refuses") {
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    out.write("II".getBytes("US-ASCII")); out.write(le16(42)); out.write(le32(8))
    out.write(le16(2)) // 2 IFD entries
    // tag 256 ImageWidth, LONG, count 1, value 65535
    out.write(le16(256)); out.write(le16(4)); out.write(le32(1)); out.write(le32(65535))
    // tag 257 ImageLength, LONG, count 1, value 65535
    out.write(le16(257)); out.write(le16(4)); out.write(le32(1)); out.write(le32(65535))
    out.write(le32(0)) // next IFD
    assertBombRefused("TIFF")(Tiff.decode(out.toByteArray))
  }

  private def riffWebp(tag: String, body: Array[Byte]): Array[Byte] = {
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val chunk = tag.getBytes("US-ASCII") ++ le32(body.length) ++ body ++
      (if (body.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    "RIFF".getBytes("US-ASCII") ++ le32(4 + chunk.length) ++
      "WEBP".getBytes("US-ASCII") ++ chunk
  }

  test("WebP VP8L: 16383x16383 from a ~20-byte file refuses (the 1 GB RGBA claim)") {
    val bits = ((16383 - 1) & 0x3fff) | (((16383 - 1) & 0x3fff) << 14)
    val body = Array[Byte](0x2f) ++ Array(
      (bits & 0xff).toByte, ((bits >> 8) & 0xff).toByte,
      ((bits >> 16) & 0xff).toByte, ((bits >> 24) & 0xff).toByte) ++
      Array[Byte](0, 0, 0, 0)
    assertBombRefused("VP8L")(Webp.decode(riffWebp("VP8L", body)))
  }

  test("WebP lossy VP8: 16383x16383 keyframe header refuses") {
    val body = Array[Byte](
      (4 << 5).toByte, 0, 0, // keyframe, version 0, first partition 4 bytes
      0x9d.toByte, 0x01, 0x2a, // start code
      0xff.toByte, 0x3f, // w = 16383
      0xff.toByte, 0x3f, // h = 16383
      0, 0, 0, 0)
    assertBombRefused("VP8")(Webp.decode(riffWebp("VP8 ", body)))
  }

  test("budget-sized images still decode (the guard is not a blanket size cap)") {
    // 1000x1000 is far under 64M px: a real PNG of that size decodes fine
    val px = Array.fill(1000 * 1000)(77.toByte)
    val (hd, out) = Png.decode(Png.encode(1000, 1000, 0, px))
    assert(hd.w == 1000 && hd.h == 1000 && out.length == px.length)
  }

  // ------------------------------------------------------- inflate bombs --
  // DEFLATE expands up to ~1032:1, so a small compressed payload can demand
  // hundreds of MB before any CRC/trailer check — graft.core.Budget caps the
  // OUTPUT of every inflating reader. The budget is lowered temporarily so
  // the bombs stay kilobytes.

  private def withBudget[T](bytes: Long)(f: => T): T = {
    val old = graft.core.Budget.maxInflatedBytes
    graft.core.Budget.maxInflatedBytes = bytes
    try f finally graft.core.Budget.maxInflatedBytes = old
  }

  private def gzipOf(raw: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(raw); g.close()
    bos.toByteArray
  }

  test("gzip bomb: a WARC member inflating past the budget refuses too_large") {
    val bomb = gzipOf(Array.fill(8 * 1024 * 1024)(0.toByte)) // ~8 KB compressed
    assert(bomb.length < 64 * 1024)
    withBudget(4L * 1024 * 1024) {
      assert(Warc.readSafe(bomb) == Left("too_large"))
    }
    // and the same member under the default budget still inflates fine
    assert(Warc.gunzipMembers(bomb).head.length == 8 * 1024 * 1024)
  }

  test("zip bomb: an entry inflating past the budget refuses too_large") {
    val zip = Zip.write(Seq(Zip.ZipMember("zeros.bin",
      Array.fill(8 * 1024 * 1024)(0.toByte))))
    withBudget(4L * 1024 * 1024) {
      assert(Zip.readSafe(zip) == Left("too_large"))
    }
    assert(Zip.read(zip).head.body.length == 8 * 1024 * 1024)
  }

  test("PDF FlateDecode bomb: an inflating stream refuses typed") {
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(Array.fill(8 * 1024 * 1024)(0.toByte)); d.finish()
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      d.end(); bos.toByteArray
    }
    withBudget(4L * 1024 * 1024) {
      val e = intercept[IllegalArgumentException](graft.etl.PdfText.inflate(deflated))
      assert(e.getMessage.contains("inflates past"))
    }
    assert(graft.etl.PdfText.inflate(deflated).length == 8 * 1024 * 1024)
  }
}
