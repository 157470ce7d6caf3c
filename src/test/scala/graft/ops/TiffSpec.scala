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
