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
  * stream, plus refusal cases (progressive SOF2, truncated entropy data).
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

  test("progressive JPEG is refused with a clear message") {
    val e = intercept[IllegalArgumentException] {
      Jpeg.decode(fixture("jpeg_progressive.jpg"))
    }
    assert(e.getMessage.contains("SOF2"))
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

  test("decode is deterministic (same bytes, same pixels)") {
    val bytes = fixture("jpeg_rgb420.jpg")
    val (_, a) = Jpeg.decode(bytes)
    val (_, b) = Jpeg.decode(bytes)
    assert(java.util.Arrays.equals(a, b))
  }
}
