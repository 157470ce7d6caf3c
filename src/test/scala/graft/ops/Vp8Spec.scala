package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** VP8 keyframe decode parity: every fixture (tools/make_vp8_fixture.py,
  * encoded by the INDEPENDENT python encoder in tools/vp8_codec.py) must
  * decode to the recorded Y/U/V planes byte-for-byte. The nine lossy
  * constructions cover all 16x16 and chroma intra modes, all ten B_PRED
  * submodes (with the above-right rule), AC coefficients, per-frame
  * coefficient probability updates, segmentation with per-segment
  * quantizers, quantizer deltas + loop-filter deltas, 1 and 4 token
  * partitions, normal AND simple loop filters, and a non-multiple-of-16
  * frame; `dc_lossless` is the exactly-lossless mm13 construction, and an
  * inter-frame stream must refuse with the typed error.
  */
class Vp8Spec extends AnyFunSuite {

  private val dir = "src/test/resources/fixtures"

  private def vp8Payload(webp: Array[Byte]): Array[Byte] = {
    // minimal RIFF walk: find the "VP8 " chunk
    var i = 12
    while (i + 8 <= webp.length) {
      val tag = new String(webp.slice(i, i + 4), "US-ASCII")
      val len = (webp(i + 4) & 0xff) | ((webp(i + 5) & 0xff) << 8) |
        ((webp(i + 6) & 0xff) << 16) | ((webp(i + 7) & 0xff) << 24)
      if (tag == "VP8 ") return webp.slice(i + 8, i + 8 + len)
      i += 8 + len + (len & 1)
    }
    fail("no VP8 chunk")
  }

  private def readPlanes(name: String): (Int, Int, Seq[Int], Seq[Int], Seq[Int]) = {
    val lines = Files.readAllLines(Paths.get(s"$dir/vp8_$name.planes"))
    val Array(w, h) = lines.get(0).split(" ").map(_.toInt)
    val uvW = (w + 1) / 2; val uvH = (h + 1) / 2
    val rows = (1 until lines.size()).map(i => lines.get(i).split(" ").map(_.toInt).toSeq)
    val y = rows.take(h).flatten
    val u = rows.slice(h, h + uvH).flatten
    val v = rows.slice(h + uvH, h + 2 * uvH).flatten
    (w, h, y, u, v)
  }

  private val fixtures = Seq("modes16", "bpred", "lf_normal", "lf_simple",
    "multipart", "segmented", "odd_21x13", "qdeltas", "prob_updates",
    "dc_lossless")

  for (name <- fixtures) test(s"decodes $name to the python-encoder planes exactly") {
    val webp = Files.readAllBytes(Paths.get(s"$dir/vp8_$name.webp"))
    val (w, h, ey, eu, ev) = readPlanes(name)
    val got = Vp8.decodeKeyframe(vp8Payload(webp))
    assert(got.width == w && got.height == h)
    assert(got.y.map(_ & 0xff).toSeq == ey, "Y plane")
    assert(got.u.map(_ & 0xff).toSeq == eu, "U plane")
    assert(got.v.map(_ & 0xff).toSeq == ev, "V plane")
  }

  // THIRD-PARTY parity (round 12): bitstreams encoded by the real libwebp
  // (tools/make_libwebp_fixture.py, ctypes against the system .so), expected
  // planes from libwebp's OWN WebPDecodeYUV. The in-repo python encoder and
  // this decoder share tools/vp8_tables.py, so their round trips cannot
  // detect wrong table values — these streams can: they exercise the full
  // default probability tables (no in-stream updates for most positions),
  // kf_bmode_probs at every context, and libwebp's own mode/filter choices.
  private val libwebpFixtures = Seq("libwebp_grad_q75_32x24",
    "libwebp_check_q50_48x32", "libwebp_tex_q90_21x13",
    "libwebp_noise_q20_64x48", "libwebp_rand_q5_40x28",
    "libwebp_grad_q100_128x96")

  for (name <- libwebpFixtures)
    test(s"decodes the REAL-libwebp stream $name bit-exactly to libwebp's own planes") {
      val webp = Files.readAllBytes(Paths.get(s"$dir/vp8_$name.webp"))
      val (w, h, ey, eu, ev) = readPlanes(name)
      val got = Vp8.decodeKeyframe(vp8Payload(webp))
      assert(got.width == w && got.height == h)
      assert(got.y.map(_ & 0xff).toSeq == ey, "Y plane")
      assert(got.u.map(_ & 0xff).toSeq == eu, "U plane")
      assert(got.v.map(_ & 0xff).toSeq == ev, "V plane")
    }

  test("a REAL-libwebp lossy stream resizes through the lossless container path") {
    // decode VP8 → nearest-neighbor → re-encode VP8L: the thumbnailing
    // shape a corpus pipeline runs; the resized pixels must be exactly
    // the nearest-neighbor picks from the (libwebp-bit-exact) decode
    val webp = Files.readAllBytes(Paths.get(s"$dir/vp8_libwebp_grad_q75_32x24.webp"))
    val blob = Multimodal.Blob(1L, webp, "image/webp", Map.empty)
    val (hd0, px0) = Webp.decode(webp)
    val small = BinaryMediaDecoder.resize(blob, 8, 6)
    val (hd1, px1) = Webp.decode(small)
    assert(hd1.w == 8 && hd1.h == 6 && hd1.lossless)
    for (y <- 0 until 6; x <- 0 until 8; ch <- 0 until 4) {
      val sx = x * hd0.w / 8; val sy = y * hd0.h / 6
      assert(px1((y * 8 + x) * 4 + ch) == px0((sy * hd0.w + sx) * 4 + ch),
        s"($x,$y,$ch)")
    }
  }

  test("an inter (non-key) frame refuses with the typed error") {
    val webp = Files.readAllBytes(Paths.get(s"$dir/vp8_interframe.webp"))
    val e = intercept[IllegalArgumentException](Vp8.decodeKeyframe(vp8Payload(webp)))
    assert(e.getMessage.contains("inter frame"))
  }

  test("the DC-lossless subset encoder round-trips EXACTLY (the mm13 shape)") {
    // flat 4x4 tiles at qindex 0: dc level = 2·residual reconstructs with
    // zero error, so decode(encode(tiles)) returns the tiles verbatim —
    // including negative residuals and the skip path (uniform tiles)
    for (seed <- Seq(1, 77, 200)) {
      val tiles = Array.tabulate(16)(i => (i * 37 + seed) % 256)
      val yuv = Vp8.decodeKeyframe(Vp8.encodeDcLossless16(tiles))
      assert(yuv.width == 16 && yuv.height == 16)
      for (r <- 0 until 16; c <- 0 until 16)
        assert((yuv.y(r * 16 + c) & 0xff) == tiles((r / 4) * 4 + c / 4), s"($r,$c)")
      assert(yuv.u.forall(b => (b & 0xff) == 128))
      assert(yuv.v.forall(b => (b & 0xff) == 128))
    }
    val uniform = Array.fill(16)(128) // residual 0 everywhere → skip MB
    val yuv = Vp8.decodeKeyframe(Vp8.encodeDcLossless16(uniform))
    assert(yuv.y.forall(b => (b & 0xff) == 128))
  }

  test("truncated and garbage payloads fail typed, never decode silently") {
    val webp = Files.readAllBytes(Paths.get(s"$dir/vp8_bpred.webp"))
    val payload = vp8Payload(webp)
    intercept[IllegalArgumentException](Vp8.decodeKeyframe(payload.take(6)))
    val bad = payload.clone(); bad(3) = 0x00 // break the start code
    intercept[IllegalArgumentException](Vp8.decodeKeyframe(bad))
  }
}
