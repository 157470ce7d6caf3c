package graft.ops

/** Animated WebP (VP8X + ANIM + ANMF container walk) — the remaining
  * common-crawl container shape after GIF animation (mm11): frame
  * metadata, per-frame pixel decode through the existing [[Webp]] paths
  * (VP8L lossless / VP8 lossy keyframes), and spec-exact canvas
  * composition. Written against the public "WebP Container Specification"
  * (RIFF layout; ANMF frame header: X/2, Y/2, w−1, h−1 as 24-bit LE,
  * 24-bit duration, flags byte with blending bit 1 and disposal bit 0;
  * ANIM background color in B,G,R,A byte order + 16-bit loop count).
  *
  * Contract (matching the mm09 typed-error convention): lossy frames may
  * carry an ALPH sidecar plane (decoded through [[Webp.decodeAlpha]],
  * round 14). Blend-mode composition is exact for alpha 255 (copy) and
  * alpha 0 (canvas pixel survives — the sprite/cutout case); FRACTIONAL
  * alpha blending refuses `unsupported` rather than approximating — the
  * blend formula is renderer rounding over fractional alpha, not
  * integer-exact bitstream semantics. A no-blend frame composes exactly
  * at any alpha. Disposal 1 fills the frame rectangle with the ANIM
  * background color, per spec. Allocation is bounded by the pixel budget BEFORE any
  * canvas is sized ([[Multimodal.checkPixelBudget]] per canvas plus a
  * frames×canvas total bound).
  */
object WebpAnim {

  final case class FrameMeta(x: Int, y: Int, w: Int, h: Int,
      durationMs: Int, blend: Boolean, disposeBg: Boolean, lossless: Boolean)
  final case class AnimMeta(canvasW: Int, canvasH: Int,
      bgB: Int, bgG: Int, bgR: Int, bgA: Int, loopCount: Int,
      frames: Vector[FrameMeta])

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le24(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** (fourcc, payload offset, payload length) walk over a RIFF region. */
  private def chunksIn(bytes: Array[Byte], from: Int, end: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var off = from
    while (off + 8 <= end) {
      val cc = fourcc(bytes, off)
      val len = le32(bytes, off + 4)
      require(len >= 0 && off + 8 + len <= end, "truncated WebP chunk")
      out += ((cc, off + 8, len))
      off += 8 + len + (len & 1)
    }
    out.result()
  }

  private def topChunks(bytes: Array[Byte]): Seq[(String, Int, Int)] = {
    require(bytes.length >= 12 && fourcc(bytes, 0) == "RIFF" &&
      fourcc(bytes, 8) == "WEBP", "not a WebP payload (bad RIFF signature)")
    val riffLen = le32(bytes, 4)
    require(riffLen >= 4 && 8 + riffLen <= bytes.length,
      "truncated WebP (RIFF size past EOF)")
    chunksIn(bytes, 12, 8 + riffLen)
  }

  def isAnimated(bytes: Array[Byte]): Boolean =
    topChunks(bytes).exists { case (cc, off, len) =>
      cc == "VP8X" && len >= 10 && (u8(bytes, off) & 0x02) != 0
    }

  /** Metadata + the per-frame standalone WebP payloads (each re-wrapped
    * as a single-image RIFF for the [[Webp]] decoder).
    */
  def animMeta(bytes: Array[Byte]): (AnimMeta, Vector[Array[Byte]]) = {
    val top = topChunks(bytes)
    val (xOff, xLen) = top.collectFirst { case ("VP8X", o, l) => (o, l) }
      .getOrElse(throw new IllegalArgumentException(
        "not an animated WebP (no VP8X chunk)"))
    require(xLen >= 10, "truncated VP8X chunk")
    require((u8(bytes, xOff) & 0x02) != 0,
      "not an animated WebP (VP8X animation flag clear)")
    val cw = le24(bytes, xOff + 4) + 1
    val ch = le24(bytes, xOff + 7) + 1
    Multimodal.checkPixelBudget(cw.toLong, ch.toLong, "animated WebP")
    val (aOff, aLen) = top.collectFirst { case ("ANIM", o, l) => (o, l) }
      .getOrElse(throw new IllegalArgumentException(
        "malformed animated WebP (no ANIM chunk)"))
    require(aLen >= 6, "truncated ANIM chunk")
    val (bgB, bgG, bgR, bgA) =
      (u8(bytes, aOff), u8(bytes, aOff + 1), u8(bytes, aOff + 2), u8(bytes, aOff + 3))
    val loop = le16(bytes, aOff + 4)
    val metas = Vector.newBuilder[FrameMeta]
    val payloads = Vector.newBuilder[Array[Byte]]
    top.foreach {
      case ("ANMF", off, len) =>
        require(len >= 16, "truncated ANMF chunk")
        val fx = 2 * le24(bytes, off)
        val fy = 2 * le24(bytes, off + 3)
        val fw = le24(bytes, off + 6) + 1
        val fh = le24(bytes, off + 9) + 1
        val dur = le24(bytes, off + 12)
        val flags = u8(bytes, off + 15)
        require(fx + fw <= cw && fy + fh <= ch,
          "malformed animated WebP (frame rectangle outside the canvas)")
        val subs = chunksIn(bytes, off + 16, off + len)
        val (cc, po, pl) = subs.collectFirst {
          case c @ ("VP8 " | "VP8L", _, _) => c
        }.getOrElse(throw new IllegalArgumentException(
          "malformed animated WebP (ANMF without VP8/VP8L data)"))
        // lossy frames may carry transparency as an ALPH sidecar (round
        // 14 — decoded through Webp.decodeAlpha); an ALPH next to a VP8L
        // frame is malformed (VP8L has native alpha)
        val alph = subs.collectFirst { case ("ALPH", ao, al) => (ao, al) }
        require(alph.isEmpty || cc == "VP8 ",
          "malformed animated WebP (ALPH chunk on a lossless frame)")
        metas += FrameMeta(fx, fy, fw, fh, dur,
          blend = (flags & 0x02) == 0, disposeBg = (flags & 0x01) != 0,
          lossless = cc == "VP8L")
        payloads += (alph match {
          case Some((ao, al)) => Webp.wrapVp8xAlphaStill(fw, fh,
            java.util.Arrays.copyOfRange(bytes, ao, ao + al),
            java.util.Arrays.copyOfRange(bytes, po, po + pl))
          case None => wrapSingle(cc, java.util.Arrays.copyOfRange(bytes, po, po + pl))
        })
      case _ => ()
    }
    val fms = metas.result()
    require(fms.nonEmpty, "malformed animated WebP (no ANMF frames)")
    (AnimMeta(cw, ch, bgB, bgG, bgR, bgA, loop, fms), payloads.result())
  }

  private def wrapSingle(cc: String, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(payload.length + 24)
    def le(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    val pad = payload.length & 1
    out.write("RIFF".getBytes("US-ASCII")); le(4 + 8 + payload.length + pad)
    out.write("WEBP".getBytes("US-ASCII"))
    out.write(cc.getBytes("US-ASCII")); le(payload.length)
    out.write(payload, 0, payload.length)
    if (pad == 1) out.write(0)
    out.toByteArray
  }

  /** Full decode: metadata plus the COMPOSED canvas (RGBA, top-down)
    * after each frame renders — what a player displays per frame. The
    * canvas starts transparent; disposal-to-background fills the frame
    * rect with the ANIM background color before the next frame.
    */
  def decode(bytes: Array[Byte]): (AnimMeta, Vector[Array[Byte]]) = {
    val (meta, payloads) = animMeta(bytes)
    val perCanvas = meta.canvasW.toLong * meta.canvasH * 4
    if (perCanvas * (payloads.length + 1) > graft.core.Budget.maxInflatedBytes)
      throw new IllegalArgumentException(
        s"unsupported animated WebP: ${payloads.length} frames x " +
          s"${meta.canvasW}x${meta.canvasH} canvas exceeds the decode budget")
    val canvas = new Array[Byte](meta.canvasW * meta.canvasH * 4)
    val states = Vector.newBuilder[Array[Byte]]
    meta.frames.zip(payloads).foreach { case (fm, payload) =>
      val (hd, rgba) = Webp.decode(payload)
      require(hd.w == fm.w && hd.h == fm.h,
        "malformed animated WebP (ANMF dims disagree with the frame bitstream)")
      if (fm.blend) {
        // blend mode: exact for alpha 255 (copy) and alpha 0 (keep the
        // canvas pixel — the sprite/cutout case ALPH frames enable);
        // FRACTIONAL alpha blending is renderer rounding, not integer
        // bitstream semantics, and stays a typed refusal
        var i = 3
        while (i < rgba.length) {
          val a = rgba(i) & 0xff
          require(a == 0xff || a == 0,
            "unsupported animated WebP: alpha-blended translucent frame")
          i += 4
        }
        var y = 0
        while (y < fm.h) {
          var x = 0
          while (x < fm.w) {
            val src = (y * fm.w + x) * 4
            if ((rgba(src + 3) & 0xff) == 0xff) {
              val dst = ((fm.y + y) * meta.canvasW + fm.x + x) * 4
              canvas(dst) = rgba(src); canvas(dst + 1) = rgba(src + 1)
              canvas(dst + 2) = rgba(src + 2); canvas(dst + 3) = rgba(src + 3)
            } // alpha 0: canvas pixel survives
            x += 1
          }
          y += 1
        }
      } else {
        var y = 0
        while (y < fm.h) {
          System.arraycopy(rgba, y * fm.w * 4,
            canvas, ((fm.y + y) * meta.canvasW + fm.x) * 4, fm.w * 4)
          y += 1
        }
      }
      states += canvas.clone()
      if (fm.disposeBg) {
        var yy = 0
        while (yy < fm.h) {
          var x = 0
          while (x < fm.w) {
            val i = ((fm.y + yy) * meta.canvasW + fm.x + x) * 4
            canvas(i) = meta.bgR.toByte
            canvas(i + 1) = meta.bgG.toByte
            canvas(i + 2) = meta.bgB.toByte
            canvas(i + 3) = meta.bgA.toByte
            x += 1
          }
          yy += 1
        }
      }
    }
    (meta, states.result())
  }

  // ------------------------------------------------------------- write --

  /** One animation frame for [[encodeAnim]]: position (even, per the
    * container's /2 coding), duration, disposal, and an RGBA raster.
    */
  final case class EncFrame(x: Int, y: Int, durationMs: Int,
      disposeBg: Boolean, w: Int, h: Int, rgba: Array[Byte])

  /** Deterministic animated-WebP writer: VP8X + ANIM + one ANMF per
    * frame, each frame's pixels carried by our VP8L lossless encoder
    * (blend bit = "do not blend", the exactly-composable mode).
    */
  def encodeAnim(canvasW: Int, canvasH: Int,
      bg: (Int, Int, Int, Int), loopCount: Int,
      frames: Seq[EncFrame]): Array[Byte] = {
    require(frames.nonEmpty, "no frames")
    require(canvasW >= 1 && canvasW <= (1 << 24) &&
      canvasH >= 1 && canvasH <= (1 << 24), "bad canvas")
    val body = new java.io.ByteArrayOutputStream(1024)
    def cc4(s: String): Unit = body.write(s.getBytes("US-ASCII"))
    def le(v: Int): Unit = {
      body.write(v & 0xff); body.write((v >> 8) & 0xff)
      body.write((v >> 16) & 0xff); body.write((v >> 24) & 0xff)
    }
    def le24w(v: Int): Unit = {
      body.write(v & 0xff); body.write((v >> 8) & 0xff); body.write((v >> 16) & 0xff)
    }
    cc4("WEBP")
    cc4("VP8X"); le(10)
    body.write(0x02) // animation flag
    body.write(0); body.write(0); body.write(0) // reserved
    le24w(canvasW - 1); le24w(canvasH - 1)
    cc4("ANIM"); le(6)
    body.write(bg._3); body.write(bg._2); body.write(bg._1); body.write(bg._4) // B,G,R,A
    body.write(loopCount & 0xff); body.write((loopCount >> 8) & 0xff)
    frames.foreach { f =>
      require(f.x % 2 == 0 && f.y % 2 == 0, "frame offsets must be even")
      require(f.x + f.w <= canvasW && f.y + f.h <= canvasH, "frame outside canvas")
      val single = Webp.encodeLossless(f.w, f.h, f.rgba)
      // lift the VP8L chunk (offset 12: fourcc+len+payload) out of the RIFF
      val pl = le32(single, 16)
      val anmfLen = 16 + 8 + pl + (pl & 1)
      cc4("ANMF"); le(anmfLen)
      le24w(f.x / 2); le24w(f.y / 2)
      le24w(f.w - 1); le24w(f.h - 1)
      le24w(f.durationMs)
      body.write(0x02 | (if (f.disposeBg) 1 else 0)) // no-blend | disposal
      body.write(single, 12, 8 + pl)
      if ((pl & 1) == 1) body.write(0)
    }
    val b = body.toByteArray
    val out = new java.io.ByteArrayOutputStream(b.length + 8)
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(b.length & 0xff); out.write((b.length >> 8) & 0xff)
    out.write((b.length >> 16) & 0xff); out.write((b.length >> 24) & 0xff)
    out.write(b, 0, b.length)
    out.toByteArray
  }

  /** `Right((meta, states))` or `Left(kind)` per the mm09 typed-error
    * convention.
    */
  def decodeSafe(bytes: Array[Byte])
      : Either[String, (AnimMeta, Vector[Array[Byte]])] =
    try Right(decode(bytes))
    catch {
      case e: IllegalArgumentException => Left(Multimodal.errKind(e.getMessage))
      case _: Exception => Left("malformed")
    }
}
