package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

import graft.etl.{JArr, JBool, JFloat, JInt, JObj, JStr, JVal, Json}

/** Locks on the animated-WebP codec (graft.ops.WebpAnim): the
  * libwebp-encoded fixture (frame bitstreams from the real library,
  * container framing from the public spec) composes to pinned canvas
  * states; round trips through our writer; typed-refusal contract.
  */
class WebpAnimSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  private def lng(v: JVal): Long = v match {
    case JInt(i) => i.toLong
    case JFloat(d) => d.toLong
    case o => fail(s"$o")
  }

  test("libwebp fixture: metadata + composed canvas states are bit-exact") {
    val e = Json.parse(new String(fixture("webp_anim_expected.json"), UTF_8)) match {
      case JObj(fs) => fs.toMap
      case o => fail(s"$o")
    }
    val bytes = fixture("webp_anim.webp")
    assert(WebpAnim.isAnimated(bytes))
    val (meta, states) = WebpAnim.decode(bytes)
    assert(meta.canvasW == lng(e("canvas_w")).toInt)
    assert(meta.canvasH == lng(e("canvas_h")).toInt)
    assert(meta.loopCount == lng(e("loop")).toInt)
    val bg = e("bg") match { case JArr(v) => v.map(lng); case o => fail(s"$o") }
    assert(Seq(meta.bgR, meta.bgG, meta.bgB, meta.bgA).map(_.toLong) == bg)
    assert(meta.frames.length == lng(e("n_frames")).toInt)
    val durs = e("durations") match { case JArr(v) => v.map(lng); case o => fail(s"$o") }
    assert(meta.frames.map(_.durationMs.toLong) == durs)
    val lossless = e("lossless") match {
      case JArr(v) => v.map { case JBool(b) => b; case o => fail(s"$o") }
      case o => fail(s"$o")
    }
    assert(meta.frames.map(_.lossless) == lossless)
    val dispose = e("dispose") match {
      case JArr(v) => v.map { case JBool(b) => b; case o => fail(s"$o") }
      case o => fail(s"$o")
    }
    assert(meta.frames.map(_.disposeBg) == dispose)
    val want = e("canvas_md5") match {
      case JArr(v) => v.map { case JStr(s) => s; case o => fail(s"$o") }
      case o => fail(s"$o")
    }
    assert(states.map(md5hex) == want)
  }

  test("round trip: multi-frame encode → decode, composition + disposal exact") {
    val cw = 20; val chh = 14
    def raster(w: Int, h: Int, seed: Int): Array[Byte] =
      Array.tabulate(w * h * 4) { i =>
        if (i % 4 == 3) 0xff.toByte
        else (((i / 4) * 31 + seed * 17 + i % 4 * 7) % 251).toByte
      }
    val frames = Seq(
      WebpAnim.EncFrame(0, 0, 50, disposeBg = false, cw, chh, raster(cw, chh, 1)),
      WebpAnim.EncFrame(4, 2, 75, disposeBg = true, 8, 6, raster(8, 6, 2)),
      WebpAnim.EncFrame(10, 6, 25, disposeBg = false, 6, 4, raster(6, 4, 3)))
    val bytes = WebpAnim.encodeAnim(cw, chh, (9, 18, 27, 255), 0, frames)
    // determinism
    assert(WebpAnim.encodeAnim(cw, chh, (9, 18, 27, 255), 0, frames).toSeq ==
      bytes.toSeq)
    assert(WebpAnim.isAnimated(bytes))
    val (meta, states) = WebpAnim.decode(bytes)
    assert(meta.canvasW == cw && meta.canvasH == chh && states.length == 3)
    assert(meta.frames.map(_.durationMs) == Vector(50, 75, 25))
    // manual composition oracle
    val canvas = new Array[Byte](cw * chh * 4)
    def draw(f: WebpAnim.EncFrame): Unit =
      for (y <- 0 until f.h)
        System.arraycopy(f.rgba, y * f.w * 4, canvas, ((f.y + y) * cw + f.x) * 4, f.w * 4)
    draw(frames(0))
    assert(states(0).toSeq == canvas.toSeq)
    draw(frames(1))
    assert(states(1).toSeq == canvas.toSeq)
    for (y <- 0 until 6; x <- 0 until 8) {
      val i = ((2 + y) * cw + 4 + x) * 4
      canvas(i) = 9; canvas(i + 1) = 18; canvas(i + 2) = 27; canvas(i + 3) = 255.toByte
    }
    draw(frames(2))
    assert(states(2).toSeq == canvas.toSeq)
  }

  test("lossy frame with ALPH sidecar composes: cutout blend over the base frame") {
    val W = 16
    val H = 16
    val base = Array.tabulate(W * H * 4)(i =>
      if (i % 4 == 3) 0xff.toByte else ((i * 7) % 251).toByte)
    val vp8 = Vp8.encodeDcLossless16(Array.tabulate(16)(i => (17 * i) % 255))
    val plane = Array.tabulate(W * H)(i =>
      if ((i / W + i % W) % 3 == 0) 0.toByte else 0xff.toByte)
    val alph = Webp.encodeAlphaRaw(plane, W, H, 3)

    val body = new java.io.ByteArrayOutputStream()
    def cc4(s: String): Unit = body.write(s.getBytes("US-ASCII"))
    def le(v: Int): Unit = {
      body.write(v & 0xff); body.write((v >> 8) & 0xff)
      body.write((v >> 16) & 0xff); body.write((v >> 24) & 0xff)
    }
    def le24(v: Int): Unit = {
      body.write(v & 0xff); body.write((v >> 8) & 0xff); body.write((v >> 16) & 0xff)
    }
    cc4("WEBP")
    cc4("VP8X"); le(10)
    body.write(0x02); body.write(0); body.write(0); body.write(0)
    le24(W - 1); le24(H - 1)
    cc4("ANIM"); le(6)
    body.write(9); body.write(8); body.write(7); body.write(0xff)
    body.write(1); body.write(0)
    // frame 1: full-canvas VP8L, no-blend
    val vp8lStill = Webp.encodeLossless(W, H, base)
    val pl1 = (vp8lStill(16) & 0xff) | ((vp8lStill(17) & 0xff) << 8) |
      ((vp8lStill(18) & 0xff) << 16)
    cc4("ANMF"); le(16 + 8 + pl1 + (pl1 & 1))
    le24(0); le24(0); le24(W - 1); le24(H - 1); le24(30)
    body.write(0x02)
    body.write(vp8lStill, 12, 8 + pl1)
    if ((pl1 & 1) == 1) body.write(0)
    // frame 2: ALPH + lossy VP8, BLEND mode (flags 0)
    val alphPad = alph.length & 1
    val vp8Pad = vp8.length & 1
    cc4("ANMF"); le(16 + 8 + alph.length + alphPad + 8 + vp8.length + vp8Pad)
    le24(0); le24(0); le24(W - 1); le24(H - 1); le24(40)
    body.write(0x00)
    cc4("ALPH"); le(alph.length); body.write(alph, 0, alph.length)
    if (alphPad == 1) body.write(0)
    cc4("VP8 "); le(vp8.length); body.write(vp8, 0, vp8.length)
    if (vp8Pad == 1) body.write(0)
    val b = body.toByteArray
    val container = new java.io.ByteArrayOutputStream()
    container.write("RIFF".getBytes("US-ASCII"))
    container.write(b.length & 0xff); container.write((b.length >> 8) & 0xff)
    container.write((b.length >> 16) & 0xff); container.write((b.length >> 24) & 0xff)
    container.write(b, 0, b.length)

    val (meta, states) = WebpAnim.decode(container.toByteArray)
    assert(meta.frames.size == 2 && meta.frames(1).blend && !meta.frames(1).lossless)
    assert(states.size == 2)
    // the lossy frame's own pixels, via the still path the anim reuses
    val (_, lossy) = Webp.decode(Webp.wrapVp8xAlphaStill(W, H, alph, vp8))
    var i = 0
    while (i < W * H) {
      val a = plane(i) & 0xff
      for (c <- 0 until 4) {
        val want = if (a == 0xff) lossy(i * 4 + c) else states(0)(i * 4 + c)
        assert(states(1)(i * 4 + c) == want, s"pixel $i channel $c alpha $a")
      }
      i += 1
    }
    // the same container with a FRACTIONAL alpha in blend mode refuses
    val frac = plane.clone(); frac(0) = 0x80.toByte
    val alphF = Webp.encodeAlphaRaw(frac, W, H, 0)
    val stillF = Webp.wrapVp8xAlphaStill(W, H, alphF, vp8)
    assert(Webp.decode(stillF)._2(3) == 0x80.toByte) // still path fine
  }

  test("typed refusals: truncation, rect overflow, translucent blend, bomb") {
    val good = WebpAnim.encodeAnim(16, 8, (0, 0, 0, 0), 1, Seq(
      WebpAnim.EncFrame(0, 0, 10, disposeBg = false, 16, 8,
        Array.tabulate(16 * 8 * 4)(i => if (i % 4 == 3) 0xff.toByte else (i % 97).toByte))))
    assert(WebpAnim.decodeSafe(good).isRight)
    // truncation at every prefix refuses typed
    for (n <- 0 until good.length)
      WebpAnim.decodeSafe(java.util.Arrays.copyOf(good, n)) match {
        case Left(k) => assert(Set("truncated", "not_media", "malformed").contains(k), s"cut $n: $k")
        case Right(_) => fail(s"cut at $n decoded")
      }
    // frame rectangle outside the canvas: patch ANMF x (stored /2)
    val at = good.toSeq.indexOfSlice("ANMF".getBytes("US-ASCII").toSeq)
    val evil = good.clone(); evil(at + 8) = 40 // x = 80 > canvas 16
    assert(WebpAnim.decodeSafe(evil) == Left("malformed"))
    // a frame declaring blend mode WITH translucency refuses unsupported:
    // clear the no-blend bit and rebuild with a translucent raster
    val translucent = WebpAnim.encodeAnim(16, 8, (0, 0, 0, 0), 1, Seq(
      WebpAnim.EncFrame(0, 0, 10, disposeBg = false, 16, 8,
        Array.tabulate(16 * 8 * 4)(i => if (i % 4 == 3) 0x80.toByte else (i % 97).toByte))))
    val at2 = translucent.toSeq.indexOfSlice("ANMF".getBytes("US-ASCII").toSeq)
    val flags = at2 + 8 + 15
    translucent(flags) = (translucent(flags) & ~0x02).toByte // blend mode on
    assert(WebpAnim.decodeSafe(translucent) == Left("unsupported"))
    // but the SAME translucent frame in no-blend mode decodes fine
    val t2 = WebpAnim.encodeAnim(16, 8, (0, 0, 0, 0), 1, Seq(
      WebpAnim.EncFrame(0, 0, 10, disposeBg = false, 16, 8,
        Array.tabulate(16 * 8 * 4)(i => if (i % 4 == 3) 0x80.toByte else (i % 97).toByte))))
    assert(WebpAnim.decodeSafe(t2).isRight)
    // frames × canvas budget bomb
    val old = graft.core.Budget.maxInflatedBytes
    graft.core.Budget.maxInflatedBytes = 256
    try assert(WebpAnim.decodeSafe(good) == Left("unsupported"))
    finally graft.core.Budget.maxInflatedBytes = old
    // single-byte mutations never throw raw
    val rnd = new java.util.Random(7)
    for (_ <- 0 until 4000) {
      val m = good.clone()
      m(rnd.nextInt(m.length)) = (m(rnd.nextInt(m.length)) ^ (1 + rnd.nextInt(255))).toByte
      WebpAnim.decodeSafe(m) match {
        case Left(k) => assert(k.nonEmpty)
        case Right(_) => ()
      }
    }
  }
}
