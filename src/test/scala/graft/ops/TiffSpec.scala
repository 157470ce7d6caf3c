package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** TIFF decode against the INDEPENDENT python writer's fixtures
  * (tools/make_tiff_fixture.py — IFD/strip/PackBits logic written against
  * the public spec, LZW from the fixture-proven PDF encoder), plus
  * Scala-side encode round trips over the full option grid and typed
  * refusals.
  */
class TiffSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    require(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private def grayPx(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h)(i => ((7 * (i % w) + 13 * (i / w)) % 256).toByte)

  private def rgbPx(w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      out(p) = ((7 * x + 13 * y) % 256).toByte
      out(p + 1) = ((3 * x + 5 * y) % 256).toByte
      out(p + 2) = ((11 * x + y) % 256).toByte
    }
    out
  }

  test("uncompressed gray fixture decodes pixel-exact") {
    val (hd, px) = Tiff.decode(fixture("tiff_gray_none.tiff"))
    assert(hd == Tiff.Header(8, 5, 1, 1, bigEndian = false, 1))
    assert(px.toSeq == grayPx(8, 5).toSeq)
  }

  test("multi-strip PackBits RGB fixture decodes pixel-exact") {
    val (hd, px) = Tiff.decode(fixture("tiff_rgb_packbits.tiff"))
    assert(hd.w == 6 && hd.h == 4 && hd.channels == 3 && hd.compression == 32773)
    assert(px.toSeq == rgbPx(6, 4).toSeq)
  }

  test("LZW + horizontal-predictor fixture decodes pixel-exact") {
    val (hd, px) = Tiff.decode(fixture("tiff_gray_lzw_pred.tiff"))
    assert(hd.compression == 5 && hd.predictor == 2)
    assert(px.toSeq == grayPx(9, 7).toSeq)
  }

  test("big-endian (MM) LZW RGB fixture decodes pixel-exact") {
    val (hd, px) = Tiff.decode(fixture("tiff_mm_rgb_lzw.tiff"))
    assert(hd.bigEndian && hd.compression == 5)
    assert(px.toSeq == rgbPx(5, 5).toSeq)
  }

  test("flat-color PackBits fixture exercises long runs") {
    val (hd, px) = Tiff.decode(fixture("tiff_gray_flat_packbits.tiff"))
    assert(hd.w == 200 && hd.h == 3)
    assert(px.forall(_ == 77.toByte))
  }

  test("encode round trips over the full option grid") {
    val px = rgbPx(13, 9)
    val gpx = grayPx(17, 6)
    for {
      comp <- Seq(1, 5, 32773)
      big <- Seq(false, true)
      pred <- Seq(1, 2)
      rps <- Seq(0, 4)
    } {
      val t1 = Tiff.encode(13, 9, 3, px, comp, big, pred, rps)
      val (h1, p1) = Tiff.decode(t1)
      assert(h1.w == 13 && h1.h == 9 && h1.channels == 3, s"$comp/$big/$pred/$rps")
      assert(p1.toSeq == px.toSeq, s"rgb $comp/$big/$pred/$rps")
      val t2 = Tiff.encode(17, 6, 1, gpx, comp, big, pred, rps)
      assert(Tiff.decode(t2)._2.toSeq == gpx.toSeq, s"gray $comp/$big/$pred/$rps")
    }
  }

  test("LZW encode survives table growth past a width bump") {
    // >256 distinct pairs force codes past 511 (the 9→10-bit early bump)
    val data = Array.tabulate(4096)(i => ((i * 37 + (i >> 5)) % 256).toByte)
    assert(graft.etl.PdfText.lzwDecode(Tiff.lzwEncode(data), 1).toSeq == data.toSeq)
  }

  test("LZW encode emits ClearCode at table saturation (TIFF §13), round-trips") {
    // enough novel data to add >3836 dictionary entries: a long
    // non-repeating byte walk saturates the table and must trigger the
    // mid-stream CLEAR that strict third-party decoders expect before
    // overflow (round-12 fix). Verify by (a) exact round trip and (b)
    // replaying the code stream: a 256 after the leading one, with the
    // width reset to 9 bits after it.
    val rnd = new scala.util.Random(7)
    val data = Array.fill(64 * 1024)((rnd.nextInt(251)).toByte)
    val enc = Tiff.lzwEncode(data)
    assert(graft.etl.PdfText.lzwDecode(enc, 1).toSeq == data.toSeq)
    // minimal code-stream replay mirroring the decoder's width schedule
    var bitBuf = 0L; var bitCnt = 0; var i = 0; var width = 9
    var next = 258; var clears = -1 // the leading CLEAR doesn't count
    var sawEod = false; var havePrev = false
    while (!sawEod && (bitCnt >= width || i < enc.length)) {
      while (bitCnt < width && i < enc.length) {
        bitBuf = (bitBuf << 8) | (enc(i) & 0xffL); bitCnt += 8; i += 1
      }
      if (bitCnt < width) sawEod = true
      else {
        val code = ((bitBuf >>> (bitCnt - width)) & ((1 << width) - 1)).toInt
        bitCnt -= width
        if (code == 256) { clears += 1; next = 258; width = 9; havePrev = false }
        else if (code == 257) sawEod = true
        else {
          if (havePrev && next < 4096) next += 1
          if (next + 1 >= (1 << width) && width < 12) width += 1
          havePrev = true
        }
      }
    }
    assert(clears >= 1, "no mid-stream ClearCode before table saturation")
  }

  test("typed refusals: not_media / truncated / unsupported") {
    val nm = intercept[IllegalArgumentException](Tiff.decode("PNGnotatiff!".getBytes))
    assert(Multimodal.errKind(nm.getMessage) == "not_media")
    val full = fixture("tiff_gray_none.tiff")
    val tr = intercept[IllegalArgumentException](
      Tiff.decode(java.util.Arrays.copyOf(full, 20)))
    assert(Multimodal.errKind(tr.getMessage) == "truncated")
    // unsupported compression: walk the (little-endian) IFD of the plain
    // fixture and patch tag 259's inline value to 7 (JPEG-in-TIFF)
    val bad = full.clone()
    def le16(o: Int) = (bad(o) & 0xff) | ((bad(o + 1) & 0xff) << 8)
    val ifd = le16(4) | (le16(6) << 16)
    val entries = le16(ifd)
    val e259 = (0 until entries).map(i => ifd + 2 + 12 * i)
      .find(e => le16(e) == 259).get
    bad(e259 + 8) = 7
    val unsup = intercept[IllegalArgumentException](Tiff.decode(bad))
    assert(Multimodal.errKind(unsup.getMessage) == "unsupported")
  }
}
