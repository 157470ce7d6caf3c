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
