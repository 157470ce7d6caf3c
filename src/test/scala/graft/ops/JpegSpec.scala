package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.{JArr, JInt, JObj, JStr, Json}

/** Decode-contract tests for the pure-JVM baseline JPEG codec: fixture
  * streams and expected pixels come from tools/make_jpeg_fixture.py, whose
  * Python mirror implements the SAME deterministic integer contract
  * (shared 14-bit IDCT basis, nearest-neighbor upsample, JFIF fixed-point
  * color) — both sides are pure integer arithmetic, so the assertion is
  * byte-for-byte equality, not a tolerance. The fixtures cover gray,
  * 4:4:4 and 4:2:0 color with distinct Huffman/quant table slots and a
  * 16-bit DQT, restart intervals, non-MCU-aligned dimensions, a flat-DC
  * stream, SOF2 progressive twins (round 9: same coefficients as the
  * baseline fixtures, encoded through the Annex-G scan script — DC
  * successive approximation, banded AC first scans, AC refinement,
  * EOB runs, progressive restarts), plus refusal cases (arithmetic
  * SOF9, truncated entropy data).
  */
class JpegSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    require(in != null, s"missing fixture $name")
    in.readAllBytes()
  }

  private val goldens: Seq[(String, Int, Int, Int, Array[Byte])] = {
    val raw = new String(fixture("jpeg_goldens.json"), "UTF-8")
    Json.parse(raw).asInstanceOf[JArr].items.map { g =>
      val m = g.asInstanceOf[JObj].fields.toMap
      def i(k: String) = m(k).asInstanceOf[JInt].i.toInt
      (m("name").asInstanceOf[JStr].s, i("w"), i("h"), i("channels"),
        java.util.Base64.getDecoder.decode(m("pixels").asInstanceOf[JStr].s))
    }
  }

  test("all fixtures decode byte-for-byte to the mirror-contract goldens") {
    goldens.foreach { case (name, w, h, ch, expected) =>
      val (hd, px) = Jpeg.decode(fixture(name + ".jpg"))
      assert(hd == Jpeg.Header(w, h, ch), s"$name header")
      assert(px.length == expected.length, s"$name length")
      val diffs = px.indices.count(i => px(i) != expected(i))
      assert(diffs == 0, s"$name: $diffs/${px.length} pixel bytes differ")
    }
  }

  test("progressive decode equals the baseline decode of the same coefficients") {
    // the SOF2 twins carry IDENTICAL quantized coefficients, so two
    // completely different bitstream paths (baseline streaming MCUs vs
    // Annex-G multi-scan successive approximation) must agree exactly
    for ((base, prog) <- Seq("jpeg_gray" -> "jpeg_prog_gray",
        "jpeg_rgb444" -> "jpeg_prog_rgb444", "jpeg_odd420" -> "jpeg_prog_odd420")) {
      val (hb, pb) = Jpeg.decode(fixture(base + ".jpg"))
      val (hp, pp) = Jpeg.decode(fixture(prog + ".jpg"))
      assert(hb == hp, s"$base vs $prog header")
      assert(java.util.Arrays.equals(pb, pp), s"$base vs $prog pixels")
    }
  }

  test("arithmetic-coded JPEG is refused with a clear message") {
    val e = intercept[IllegalArgumentException] {
      Jpeg.decode(fixture("jpeg_arith.jpg"))
    }
    assert(e.getMessage.contains("SOF9"))
  }

  test("truncated entropy data throws, never returns garbage") {
    intercept[Exception] { Jpeg.decode(fixture("jpeg_trunc.jpg")) }
  }

  test("non-JPEG payload is refused on the SOI check") {
    val e = intercept[IllegalArgumentException] {
      Jpeg.decode("not a jpeg at all".getBytes)
    }
    assert(e.getMessage.contains("SOI"))
  }

  test("block-constant gray encode decodes EXACTLY (the lossless construction)") {
    // every 8x8 block constant + flat quantizer => DC-only blocks, and the
    // integer IDCT returns the exact constant: full 0..255 coverage via
    // a 128x128 image whose 256 blocks sweep every byte value
    val jpg = Jpeg.encodeGrayBlocks(128, 128, (bx, by) => by * 16 + bx)
    val (hd, px) = Jpeg.decode(jpg)
    assert(hd == Jpeg.Header(128, 128, 1))
    for (by <- 0 until 16; bx <- 0 until 16; y <- 0 until 8; x <- 0 until 8) {
      val v = px((by * 8 + y) * 128 + bx * 8 + x) & 0xff
      assert(v == by * 16 + bx,
        s"block ($bx,$by) pixel ($x,$y): got $v want ${by * 16 + bx}")
    }
  }

  test("progressive block-constant encode decodes EXACTLY, equal to baseline") {
    // the mm10 construction: four-scan SOF2 (DC SA 1→0, AC EOB runs)
    // must reproduce the same lossless DC-only pixels as the baseline
    // encoder — full 0..255 coverage via the 256-block sweep
    val prog = Jpeg.encodeGrayBlocksProgressive(128, 128, (bx, by) => by * 16 + bx)
    val base = Jpeg.encodeGrayBlocks(128, 128, (bx, by) => by * 16 + bx)
    val (hp, pp) = Jpeg.decode(prog)
    val (_, pb) = Jpeg.decode(base)
    assert(hp == Jpeg.Header(128, 128, 1))
    assert(java.util.Arrays.equals(pp, pb))
    // and a non-trivial EOBRUN shape: 2x2 blocks (run of 4 = EOB2+extra)
    val small = Jpeg.encodeGrayBlocksProgressive(16, 16, (bx, by) => 17 + bx * 40 + by * 80)
    val (hs, ps) = Jpeg.decode(small)
    assert(hs == Jpeg.Header(16, 16, 1))
    for (by <- 0 until 2; bx <- 0 until 2; i <- 0 until 4)
      assert((ps((by * 8) * 16 + bx * 8 + i) & 0xff) == 17 + bx * 40 + by * 80)
  }

  test("decode is deterministic (same bytes, same pixels)") {
    val bytes = fixture("jpeg_rgb420.jpg")
    val (_, a) = Jpeg.decode(bytes)
    val (_, b) = Jpeg.decode(bytes)
    assert(java.util.Arrays.equals(a, b))
  }
}
