package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** VP8L decode against the INDEPENDENT Python encoder's fixtures
  * (tools/make_webp_fixture.py — bit conventions re-derived from the
  * public spec, not shared code), plus Scala-side encode round trips,
  * container metadata, and malformed-payload refusals.
  */
class WebpSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    require(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private def rgbaAt(px: Array[Byte], w: Int, x: Int, y: Int): (Int, Int, Int, Int) = {
    val i = (y * w + x) * 4
    (px(i) & 0xff, px(i + 1) & 0xff, px(i + 2) & 0xff, px(i + 3) & 0xff)
  }

  test("literal RGB fixture decodes to the exact formula raster") {
    val (hd, px) = Webp.decode(fixture("webp_rgb.webp"))
    assert(hd.w == 8 && hd.h == 5 && hd.lossless)
    for (y <- 0 until 5; x <- 0 until 8)
      assert(rgbaAt(px, 8, x, y) ==
        (((7 * x + 13 * y) % 256, (3 * x + 5 * y) % 256, (11 * x + y) % 256, 255)),
        s"($x,$y)")
  }

  test("subtract-green fixture inverts to the same raster as the literal one") {
    val (_, a) = Webp.decode(fixture("webp_rgb.webp"))
    val (_, b) = Webp.decode(fixture("webp_sg.webp"))
    assert(a.sameElements(b))
  }

  test("2-symbol SIMPLE codes assign code 0 to the FIRST READ symbol, not the smaller") {
    val (hd, px) = Webp.decode(fixture("webp_simple2.webp"))
    assert(hd.w == 4 && hd.h == 3)
    for (y <- 0 until 3; x <- 0 until 4) {
      val g = if ((x + y) % 2 == 0) 200 else 10
      val r = if (x % 2 == 0) 99 else 1
      assert(rgbaAt(px, 4, x, y) == ((r, g, 7, 255)), s"($x,$y)")
    }
  }

  test("color-cache fixture: cache hits reproduce the 4-color cycle") {
    val (hd, px) = Webp.decode(fixture("webp_cache.webp"))
    assert(hd.w == 8 && hd.h == 6)
    for (y <- 0 until 6; x <- 0 until 8) {
      val i = (x + y) % 4
      assert(rgbaAt(px, 8, x, y) == ((40 * i + 5, 80 * i + 3, 20 * i + 7, 255)), s"($x,$y)")
    }
  }

  test("LZ77 fixture: dist+120 row copy and a plane-code-2 run") {
    val (hd, px) = Webp.decode(fixture("webp_lz77.webp"))
    assert(hd.w == 8 && hd.h == 4)
    def rowFormula(x: Int) = (((7 * x) % 256, (3 * x) % 256, (11 * x) % 256, 255))
    for (y <- 0 until 4; x <- 0 until 8) {
      val pos = y * 8 + x
      val want = if (pos >= 29) rowFormula(4) else rowFormula(x)
      assert(rgbaAt(px, 8, x, y) == want, s"($x,$y)")
    }
  }

  test("palette fixture: color-indexing with 2-bit bundling") {
    val (hd, px) = Webp.decode(fixture("webp_palette.webp"))
    assert(hd.w == 12 && hd.h == 5)
    for (y <- 0 until 5; x <- 0 until 12) {
      val i = (x + 2 * y) % 4
      assert(rgbaAt(px, 12, x, y) == ((60 * i + 9, 50 * i + 2, 30 * i + 4, 255)), s"($x,$y)")
    }
  }

  test("predictor fixture: modes L/T/avg(L,T)/Select across 4x4 blocks") {
    val (hd, px) = Webp.decode(fixture("webp_pred.webp"))
    assert(hd.w == 8 && hd.h == 5)
    for (y <- 0 until 5; x <- 0 until 8)
      assert(rgbaAt(px, 8, x, y) ==
        (((5 * x + y) % 256, (2 * x + 3 * y) % 256, (x + 7 * y) % 256, 255)), s"($x,$y)")
  }

  test("Select predictor returns TOP on a pa==pb tie (libwebp tie-break)") {
    // at (1,1): L=(255,5,5,5), T=(255,15,15,15), TL=(255,10,10,10) ->
    // pa == pb == 15 with L != T; libwebp picks T, so the true pixel is
    // (255,20,20,20). A decoder picking L reconstructs (255,10,10,10).
    val (hd, px) = Webp.decode(fixture("webp_pred_tie.webp"))
    assert(hd.w == 2 && hd.h == 2)
    assert(rgbaAt(px, 2, 0, 0) == ((10, 10, 10, 255)))
    assert(rgbaAt(px, 2, 1, 0) == ((15, 15, 15, 255)))
    assert(rgbaAt(px, 2, 0, 1) == ((5, 5, 5, 255)))
    assert(rgbaAt(px, 2, 1, 1) == ((20, 20, 20, 255)))
  }

  test("lossy VP8 parses exact metadata and decodes (round 11)") {
    val bytes = fixture("webp_lossy.webp")
    val hd = Webp.meta(bytes)
    assert(hd.w == 24 && hd.h == 10 && !hd.lossless)
    // the fixture's zero-length first partition reads as all-zero bits:
    // a legal (if degenerate) keyframe that decodes to the border-predicted
    // image — full pixel decode now succeeds instead of refusing
    val (hd2, px) = Webp.decode(bytes)
    assert(hd2.w == 24 && px.length == 24 * 10 * 4)
    // inter frames are the class that genuinely cannot decode standalone
    val inter = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/test/resources/fixtures/vp8_interframe.webp"))
    val e = intercept[IllegalArgumentException](Webp.decode(inter))
    assert(e.getMessage.contains("unsupported"))
    assert(intercept[IllegalArgumentException](Webp.meta(inter))
      .getMessage.contains("unsupported"))
  }

  test("lossy VP8 fixture decodes through the container path (Vp8Spec twin)") {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/test/resources/fixtures/vp8_bpred.webp"))
    val yuv = Webp.decodeLossyYuv(bytes)
    assert(yuv.width == 48 && yuv.height == 32)
    val (hd, px) = Webp.decode(bytes) // RGBA conversion path
    assert(hd.w == 48 && px.length == 48 * 32 * 4)
  }

  test("encode round trip: literal and subtract-green, with real alpha") {
    val w = 13; val h = 7
    val rgba = new Array[Byte](w * h * 4)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 4
      rgba(i) = ((17 * x + 29 * y + 3) % 256).toByte
      rgba(i + 1) = ((5 * x * x + y) % 256).toByte
      rgba(i + 2) = ((x + 31 * y) % 256).toByte
      rgba(i + 3) = ((200 + 7 * x + y) % 256).toByte
    }
    for (sg <- Seq(false, true)) {
      val bytes = Webp.encodeLossless(w, h, rgba, subtractGreen = sg)
      val (hd, out) = Webp.decode(bytes)
      assert(hd.w == w && hd.h == h && hd.hasAlpha)
      assert(out.sameElements(rgba), s"subtractGreen=$sg")
    }
  }

  test("encode round trip: 1x1 and single-color images (degenerate trees)") {
    val one = Array[Byte](10, 20, 30, -1)
    val (hd1, out1) = Webp.decode(Webp.encodeLossless(1, 1, one))
    assert(hd1.w == 1 && hd1.h == 1 && out1.sameElements(one))
    val flat = Array.fill(6 * 4 * 4)(0.toByte)
    for (i <- flat.indices if i % 4 == 3) flat(i) = -1
    val (hd2, out2) = Webp.decode(Webp.encodeLossless(6, 4, flat))
    assert(hd2.w == 6 && hd2.h == 4 && out2.sameElements(flat))
  }

  test("the generated plane-code table matches the spec's listed prefix") {
    val specPrefix = Seq(
      (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
      (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
      (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0))
    assert(Webp.PlaneCodes.length == 120)
    assert(Webp.PlaneCodes.take(24).toSeq == specPrefix)
  }

  test("malformed payloads refuse with typed messages") {
    val good = fixture("webp_rgb.webp")
    assert(intercept[IllegalArgumentException](
      Webp.decode("not a webp at all".getBytes)).getMessage.contains("signature"))
    assert(intercept[IllegalArgumentException](
      Webp.decode(good.take(20))).getMessage.toLowerCase.contains("trunc"))
    // corrupt the VP8L signature byte
    val bad = good.clone(); bad(20) = 0x00
    intercept[IllegalArgumentException](Webp.decode(bad))
  }

  test("encode round trip: fully-used balanced channel (single-clc-symbol case)") {
    // 16x16 with each red value 0..255 exactly once: the red tree gets a
    // balanced all-length-8 code over the full alphabet, so its
    // code-length code would have ONE active symbol — which a decoder
    // reads as a 0-bit code. The writer must perturb to a complete
    // unbalanced code (review find); the round trip catches the desync.
    val rgba = Array.tabulate(16 * 16 * 4) { i =>
      val px = i / 4
      (i % 4) match {
        case 0 => px.toByte            // red: every value once
        case 1 => ((px * 31) % 251).toByte
        case 2 => ((px * 7) % 253).toByte
        case _ => 0xff.toByte
      }
    }
    val webp = Webp.encodeLossless(16, 16, rgba)
    val (hd, back) = Webp.decode(webp)
    assert(hd.w == 16 && hd.h == 16)
    assert(java.util.Arrays.equals(back, rgba))
  }

  test("encode survives skewed histograms (depth cap falls back to the bounded code)") {
    // doubling frequencies 1,1,2,4,...,2^15 give the optimal tree depth
    // 16 > the 15-bit cap; the writer must degrade to the bounded
    // complete code, not crash (review find)
    val counts = 1 +: (0 to 15).map(1 << _)
    assert(counts.sum == 65536)
    val reds = counts.zipWithIndex.flatMap { case (n, v) => Seq.fill(n)(v) }
    val w = 256
    val h = 256
    val rgba = new Array[Byte](w * h * 4)
    var i = 0
    while (i < w * h) {
      rgba(i * 4) = reds(i).toByte
      rgba(i * 4 + 3) = 0xff.toByte
      i += 1
    }
    val webp = Webp.encodeLossless(w, h, rgba)
    val (_, back) = Webp.decode(webp)
    assert(java.util.Arrays.equals(back, rgba))
  }
}
