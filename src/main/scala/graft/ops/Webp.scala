package graft.ops

/** Pure-JVM WebP codec: FULL VP8L (lossless) decode, written from the
  * public "WebP Lossless Bitstream Specification" and RIFF container
  * docs — the most common web-crawl image shape the engine previously
  * refused (the round-9 verdict's stretch item). Lossy VP8 payloads
  * parse to exact metadata (frame-tag + sync + dimensions per RFC 6386)
  * but refuse pixel decode, the same contract the MP3 walker uses for
  * compressed audio; `decodeSafe` turns that refusal into a typed error
  * row at corpus scale.
  *
  * Decode surface (all of VP8L):
  *  - LSB-first bit reader over the RIFF "VP8L" chunk;
  *  - canonical prefix codes: "simple" 1/2-symbol codes and full
  *    code-length-coded trees (code-length-code order table, repeat /
  *    zero-run opcodes 16/17/18, optional max-symbol cap), decoded
  *    bit-at-a-time in canonical (count/offset) form;
  *  - meta prefix groups (entropy image), 5 trees per group
  *    (green+length+cache, red, blue, alpha, distance);
  *  - LZ77 backward references with the 120-entry 2D plane-code map
  *    (generated, not transcribed: candidates dy 1..7 × dx -7..8 plus
  *    dy 0 × dx 1..8, sorted by squared distance then dy descending
  *    then positive-dx-first — WebpSpec pins the spec's listed prefix),
  *    and the 1 << cache_bits color cache (hash 0x1e35a7bd);
  *  - all four transforms, inverse-applied in reverse signal order:
  *    predictor (14 modes incl. Select and the clamped add/subtract
  *    pair), cross-channel color transform (signed 3.5 fixed-point),
  *    subtract-green, and color indexing with sub-byte bundling for
  *    palettes of 2/4/16 colors.
  *
  * [[encodeLossless]] is the deterministic subset encoder the oracle
  * rows drive (single group, literal pixels, real canonical Huffman
  * trees with the code-length code, optional subtract-green) — enough
  * to round-trip arbitrary RGBA rasters; tools/make_webp_fixture.py is
  * the INDEPENDENT Python mirror that also emits color-cache, LZ77,
  * palette-bundled and predictor streams for WebpSpec.
  */
object Webp {

  final case class Header(w: Int, h: Int, hasAlpha: Boolean, lossless: Boolean)

  // ------------------------------------------------------------ RIFF ----

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le24(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** (fourcc, payloadOffset, payloadLen) of every top-level chunk. */
  private def chunks(bytes: Array[Byte]): Seq[(String, Int, Int)] = {
    require(bytes.length >= 12 && fourcc(bytes, 0) == "RIFF" &&
      fourcc(bytes, 8) == "WEBP", "not a WebP payload (bad RIFF signature)")
    val riffLen = le32(bytes, 4)
    require(riffLen >= 4 && 8 + riffLen <= bytes.length,
      "truncated WebP (RIFF size past EOF)")
    val out = Seq.newBuilder[(String, Int, Int)]
    var off = 12
    val end = 8 + riffLen
    while (off + 8 <= end) {
      val cc = fourcc(bytes, off)
      val len = le32(bytes, off + 4)
      // bounds in Long: a declared len near Int.MaxValue would wrap the
      // Int sum past the guard and walk off the array
      require(len >= 0 && off.toLong + 8 + len <= end, "truncated WebP chunk")
      out += ((cc, off + 8, len))
      off += 8 + len + (len & 1) // chunks pad to even
    }
    out.result()
  }

  /** Header-only parse: VP8L, lossy VP8 (frame tag + sync code), or VP8X
    * canvas. Animated (ANIM) containers report the canvas and refuse
    * pixel decode.
    */
  def meta(bytes: Array[Byte]): Header = {
    val cs = chunks(bytes)
    cs.collectFirst {
      case ("VP8L", off, len) =>
        require(len >= 5 && u8(bytes, off) == 0x2f, "malformed VP8L (bad signature byte)")
        val bits = le32(bytes, off + 1)
        val w = (bits & 0x3fff) + 1
        val h = ((bits >> 14) & 0x3fff) + 1
        val alpha = ((bits >> 28) & 1) == 1
        require(((bits >> 29) & 0x7) == 0, "unsupported VP8L version")
        Header(w, h, alpha, lossless = true)
    }.orElse(cs.collectFirst {
      case ("VP8 ", off, len) =>
        // RFC 6386 uncompressed data chunk: 3-byte frame tag (keyframe
        // bit 0 == 0), 3-byte sync 0x9d 0x01 0x2a, 14-bit w/h (le)
        require(len >= 10, "truncated VP8 frame header")
        // inter frames carry no sync/dims and need reference buffers a
        // single-image decode cannot have — typed as unsupported
        require((u8(bytes, off) & 1) == 0,
          "unsupported WebP: VP8 inter frame (needs reference frames)")
        require(u8(bytes, off + 3) == 0x9d && u8(bytes, off + 4) == 0x01 &&
          u8(bytes, off + 5) == 0x2a, "malformed VP8 (bad sync code)")
        val w = le32(bytes, off + 6) & 0x3fff
        val h = (le32(bytes, off + 6) >> 16) & 0x3fff
        Header(w, h, hasAlpha = cs.exists(_._1 == "ALPH"), lossless = false)
    }).orElse(cs.collectFirst {
      case ("VP8X", off, len) =>
        require(len >= 10, "truncated VP8X chunk")
        val flags = u8(bytes, off)
        Header(le24(bytes, off + 4) + 1, le24(bytes, off + 7) + 1,
          (flags & 0x10) != 0, lossless = false)
    }).getOrElse(throw new IllegalArgumentException(
      "malformed WebP (no VP8/VP8L/VP8X chunk)"))
  }

  // ------------------------------------------------------ bit reader ----

  private final class Br(val bytes: Array[Byte], start: Int, val end: Int) {
    private var pos = start
    private var bitBuf = 0L
    private var bitCnt = 0
    def read(n: Int): Int = {
      while (bitCnt < n) {
        require(pos < end, "truncated VP8L bitstream")
        bitBuf |= (bytes(pos) & 0xffL) << bitCnt
        bitCnt += 8
        pos += 1
      }
      val v = (bitBuf & ((1L << n) - 1)).toInt
      bitBuf >>>= n
      bitCnt -= n
      v
    }
    def readBit(): Int = read(1)
  }

  // -------------------------------------------------- canonical codes ----

  /** Canonical prefix decoder in count/offset form (the puff.c walk):
    * symbols sorted by (length, symbol), codes assigned in increasing
    * order per length, stream bits spell the code MSB-first. A
    * single-symbol code reads ZERO bits. Over- or under-subscribed
    * codes (Kraft sum ≠ 1) are malformed unless single-symbol.
    */
  private class Huff(lengths: Array[Int]) {
    private val MaxLen = 15
    private val count = new Array[Int](MaxLen + 1)
    lengths.foreach { l => require(l >= 0 && l <= MaxLen, "bad code length"); count(l) += 1 }
    private val nSyms = lengths.length - count(0)
    require(nSyms > 0, "malformed VP8L (empty prefix code)")
    val single: Int = if (nSyms == 1) lengths.indexWhere(_ > 0) else -1
    if (single < 0) {
      // completeness check
      var left = 1
      var l = 1
      while (l <= MaxLen) {
        left <<= 1
        left -= count(l)
        require(left >= 0, "malformed VP8L (over-subscribed prefix code)")
        l += 1
      }
      require(left == 0, "malformed VP8L (incomplete prefix code)")
    }
    private val offs: Array[Int] = {
      val a = new Array[Int](MaxLen + 2)
      var l = 1
      while (l <= MaxLen) { a(l + 1) = a(l) + count(l); l += 1 }
      a
    }
    private val syms: Array[Int] = {
      val a = new Array[Int](nSyms max 1)
      val o = offs.clone()
      var s = 0
      while (s < lengths.length) {
        if (lengths(s) > 0) { a(o(lengths(s))) = s; o(lengths(s)) += 1 }
        s += 1
      }
      a
    }
    def next(br: Br): Int = {
      if (single >= 0) return single // 0-bit single-symbol code
      var code = 0; var first = 0; var index = 0; var len = 1
      while (len <= MaxLen) {
        code |= br.readBit()
        val cnt = count(len)
        if (code - first < cnt) return syms(index + (code - first))
        index += cnt
        first = (first + cnt) << 1
        code <<= 1
        len += 1
      }
      throw new IllegalArgumentException("malformed VP8L (ran off prefix code)")
    }
  }

  /** kCodeLengthCodeOrder. */
  private val ClcOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  private def readHuffmanCode(br: Br, alphabetSize: Int): Huff = {
    val lengths = new Array[Int](alphabetSize)
    if (br.readBit() == 1) { // simple code
      val numSymbols = br.readBit() + 1
      val first =
        if (br.readBit() == 1) br.read(8) else br.readBit()
      require(first < alphabetSize, "malformed VP8L (simple-code symbol out of range)")
      if (numSymbols == 1) {
        lengths(first) = 1 // single symbol: 0-bit code (Huff special-case)
        new Huff(lengths)
      } else {
        val second = br.read(8)
        require(second < alphabetSize && second != first,
          "malformed VP8L (simple-code second symbol invalid)")
        // code 0 → symbols[0], code 1 → symbols[1] in READ order — NOT
        // canonical-by-value order (a spec quirk of the simple form)
        new Huff2(first, second, alphabetSize)
      }
    } else {
      val numCodeLengths = 4 + br.read(4)
      val clcLen = new Array[Int](19)
      var i = 0
      while (i < numCodeLengths) { clcLen(ClcOrder(i)) = br.read(3); i += 1 }
      val clc = new Huff(clcLen)
      // symbol lengths, with the optional decoded-symbol budget
      var maxSymbol =
        if (br.readBit() == 1) {
          val lengthNBits = 2 + 2 * br.read(3)
          2 + br.read(lengthNBits)
        } else alphabetSize
      var symbol = 0
      var prevCodeLen = 8
      var break0 = false
      while (symbol < alphabetSize && !break0) {
        if (maxSymbol == 0) break0 = true
        else {
          maxSymbol -= 1
          val codeLen = clc.next(br)
          if (codeLen < 16) {
            lengths(symbol) = codeLen
            symbol += 1
            if (codeLen != 0) prevCodeLen = codeLen
          } else {
            val (repeat, fill) = codeLen match {
              case 16 => (3 + br.read(2), prevCodeLen)
              case 17 => (3 + br.read(3), 0)
              case _ => (11 + br.read(7), 0)
            }
            require(symbol + repeat <= alphabetSize,
              "malformed VP8L (code-length repeat overruns alphabet)")
            var r = 0
            while (r < repeat) { lengths(symbol) = fill; symbol += 1; r += 1 }
          }
        }
      }
      new Huff(lengths)
    }
  }

  /** 1-bit two-symbol simple code, code order = READ order. */
  private final class Huff2(sym0: Int, sym1: Int, alphabetSize: Int)
    extends Huff({ val a = new Array[Int](alphabetSize); a(sym0) = 1; a(sym1) = 1; a }) {
    override def next(br: Br): Int = if (br.readBit() == 0) sym0 else sym1
  }

  // ----------------------------------------------------- plane codes ----

  /** The 120-entry LZ77 plane-code map, GENERATED by the spec's ordering
    * rule (candidates dy 1..7 × dx -7..8 plus dy 0 × dx 1..8; sort by
    * dx²+dy² ascending, then dy DESCENDING, then positive dx before
    * negative) — WebpSpec pins the listed prefix of the spec's table
    * against this generation.
    */
  private[ops] val PlaneCodes: Array[(Int, Int)] = {
    val cand =
      (for (dy <- 1 to 7; dx <- -7 to 8) yield (dx, dy)) ++
        (for (dx <- 1 to 8) yield (dx, 0))
    val sorted = cand.sortBy { case (dx, dy) =>
      (dx * dx + dy * dy, -dy, if (dx > 0) 0 else 1)
    }.toArray
    require(sorted.length == 120)
    sorted
  }

  private def lz77Value(br: Br, code: Int): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + br.read(extra) + 1
    }

  private def planeToDistance(code: Int, xsize: Int): Int =
    if (code > 120) code - 120
    else {
      val (dx, dy) = PlaneCodes(code - 1)
      val d = dy * xsize + dx
      if (d < 1) 1 else d
    }

  // ------------------------------------------------- image stream -------

  /** ARGB pixels as Ints, row-major. Meta prefix groups are signaled
    * only for the level-0 (main ARGB) image — auxiliary images
    * (entropy / predictor / color / palette) carry no meta bit.
    */
  private def decodeImageStream(br: Br, xsize: Int, ysize: Int,
      level0: Boolean = false): Array[Int] = {
    // color cache
    val cacheBits = if (br.readBit() == 1) {
      val cb = br.read(4)
      require(cb >= 1 && cb <= 11, "malformed VP8L (color cache bits out of 1..11)")
      cb
    } else 0
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheBits > 0) new Array[Int](cacheSize) else null

    // meta prefix groups
    var metaBits = 0
    var metaImage: Array[Int] = null
    var numGroups = 1
    if (level0 && br.readBit() == 1) {
      metaBits = br.read(3) + 2
      val mw = divUp(xsize, 1 << metaBits)
      val mh = divUp(ysize, 1 << metaBits)
      metaImage = decodeImageStream(br, mw, mh)
      var mx = 0
      metaImage.foreach { p =>
        // group index is (red << 8) | green = (pixel >> 8) & 0xffff; a wider
        // mask keeps the alpha byte and can inflate numGroups to ~16M
        val idx = (p >> 8) & 0xffff
        if (idx > mx) mx = idx
      }
      numGroups = mx + 1
    }

    val greens = new Array[Huff](numGroups)
    val reds = new Array[Huff](numGroups)
    val blues = new Array[Huff](numGroups)
    val alphas = new Array[Huff](numGroups)
    val dists = new Array[Huff](numGroups)
    var g = 0
    while (g < numGroups) {
      greens(g) = readHuffmanCode(br, 256 + 24 + cacheSize)
      reds(g) = readHuffmanCode(br, 256)
      blues(g) = readHuffmanCode(br, 256)
      alphas(g) = readHuffmanCode(br, 256)
      dists(g) = readHuffmanCode(br, 40)
      g += 1
    }

    val out = new Array[Int](xsize * ysize)
    val mw = if (metaImage != null) divUp(xsize, 1 << metaBits) else 0
    var pos = 0
    val n = out.length
    while (pos < n) {
      // the coordinate math exists only for the meta-group lookup; the
      // common no-meta case must not pay a div+mod per pixel
      val grp =
        if (metaImage == null) 0
        else {
          val x = pos % xsize
          val y = pos / xsize
          (metaImage((y >> metaBits) * mw + (x >> metaBits)) >> 8) & 0xffff
        }
      val s = greens(grp).next(br)
      if (s < 256) {
        val red = reds(grp).next(br)
        val blue = blues(grp).next(br)
        val alpha = alphas(grp).next(br)
        val px = (alpha << 24) | (red << 16) | (s << 8) | blue
        out(pos) = px
        if (cache != null) cache(cacheHash(px, cacheBits)) = px
        pos += 1
      } else if (s < 256 + 24) {
        val length = lz77Value(br, s - 256)
        val distCode = lz77Value(br, dists(grp).next(br))
        val dist = planeToDistance(distCode, xsize)
        require(dist <= pos, "malformed VP8L (backward reference before start)")
        require(pos + length <= n, "malformed VP8L (backward reference past end)")
        var k = 0
        while (k < length) {
          val px = out(pos - dist)
          out(pos) = px
          if (cache != null) cache(cacheHash(px, cacheBits)) = px
          pos += 1
          k += 1
        }
      } else {
        require(cache != null, "malformed VP8L (cache symbol without cache)")
        val px = cache(s - 256 - 24)
        out(pos) = px
        cache(cacheHash(px, cacheBits)) = px
        pos += 1
      }
    }
    out
  }

  private def cacheHash(argb: Int, bits: Int): Int =
    (0x1e35a7bd * argb) >>> (32 - bits)

  private def divUp(a: Int, b: Int): Int = (a + b - 1) / b

  // -------------------------------------------------- transforms --------

  private sealed trait Transform { def xsizeAtApply: Int }
  private final case class Predictor(bits: Int, image: Array[Int], xsizeAtApply: Int)
    extends Transform
  private final case class ColorTx(bits: Int, image: Array[Int], xsizeAtApply: Int)
    extends Transform
  private final case class SubtractGreen(xsizeAtApply: Int) extends Transform
  private final case class Indexing(palette: Array[Int], widthBits: Int, xsizeAtApply: Int)
    extends Transform

  /** Decode a lossy (VP8 keyframe) payload to YUV420 planes — the honest
    * decoder output (no resampling/colorspace choices baked in); see
    * [[Vp8.decodeKeyframe]] for the full keyframe pipeline.
    */
  private def clampByte(v: Int): Byte =
    (if (v < 0) 0 else if (v > 255) 255 else v).toByte

  // ----------------------------------------------------------- ALPH ----

  /** ALPH chunk decode (WebP container spec §"Alpha"): 1-byte header —
    * 2-bit compression method (0 raw, 1 headerless VP8L with alpha in
    * the GREEN channel), 2-bit filtering method (none / horizontal /
    * vertical / gradient, libwebp filters.c semantics: row 0 and column
    * 0 predict from left/above with a 0 seed at the origin), 2-bit
    * pre-processing (an encoder hint — no decoder action) — then the
    * data. Returns the w*h alpha plane after inverse filtering.
    */
  def decodeAlpha(bytes: Array[Byte], off: Int, len: Int, w: Int, h: Int): Array[Byte] = {
    require(len >= 1, "truncated ALPH chunk")
    val hdr = u8(bytes, off)
    require((hdr >> 6) == 0, "malformed ALPH (reserved bits set)")
    val comp = hdr & 3
    val filter = (hdr >> 2) & 3
    require(((hdr >> 4) & 3) <= 1, "malformed ALPH (bad pre-processing)")
    Multimodal.checkPixelBudget(w.toLong, h.toLong, "ALPH plane")
    val plane: Array[Byte] = comp match {
      case 0 =>
        require(len - 1 >= w * h, "truncated ALPH raw data")
        java.util.Arrays.copyOfRange(bytes, off + 1, off + 1 + w * h)
      case 1 =>
        // headerless VP8L image stream with alpha in the GREEN channel —
        // the full level-0 grammar including transforms (libwebp's alpha
        // encoder emits them)
        val br = new Br(bytes, off + 1, off + len)
        val px = decodeVp8lArgb(br, w, h)
        val out = new Array[Byte](w * h)
        var i = 0
        while (i < out.length) { out(i) = ((px(i) >> 8) & 0xff).toByte; i += 1 }
        out
      case _ =>
        throw new IllegalArgumentException("malformed ALPH (bad compression method)")
    }
    unfilterAlpha(plane, w, h, filter)
    plane
  }

  /** In-place inverse of the ALPH filters (container spec; exactly
    * libwebp's HorizontalUnfilter / VerticalUnfilter / GradientUnfilter).
    */
  private def unfilterAlpha(p: Array[Byte], w: Int, h: Int, method: Int): Unit = {
    if (method == 0 || w == 0 || h == 0) return
    var y = 0
    while (y < h) {
      val row = y * w
      method match {
        case 1 => // horizontal: pred = left; x=0 predicts from above
          var pred = if (y == 0) 0 else p(row - w) & 0xff
          var x = 0
          while (x < w) {
            pred = (pred + (p(row + x) & 0xff)) & 0xff
            p(row + x) = pred.toByte
            x += 1
          }
        case 2 => // vertical: pred = above; row 0 falls back to horizontal
          if (y == 0) {
            var pred = 0
            var x = 0
            while (x < w) {
              pred = (pred + (p(x) & 0xff)) & 0xff
              p(x) = pred.toByte
              x += 1
            }
          } else {
            var x = 0
            while (x < w) {
              p(row + x) = (((p(row - w + x) & 0xff) + (p(row + x) & 0xff)) & 0xff).toByte
              x += 1
            }
          }
        case _ => // gradient: clip(left + above - aboveleft); row 0 horizontal
          if (y == 0) {
            var pred = 0
            var x = 0
            while (x < w) {
              pred = (pred + (p(x) & 0xff)) & 0xff
              p(x) = pred.toByte
              x += 1
            }
          } else {
            var left = p(row - w) & 0xff
            var topLeft = left
            var x = 0
            while (x < w) {
              val top = p(row - w + x) & 0xff
              val g = clip255(left + top - topLeft)
              left = ((p(row + x) & 0xff) + g) & 0xff
              p(row + x) = left.toByte
              topLeft = top
              x += 1
            }
          }
      }
      y += 1
    }
  }

  /** ALPH chunk payload writer (raw compression + forward filter) — the
    * synthesis side mm22 and the specs use; the VP8L-compressed form is
    * what libwebp emits and the differential fixtures pin.
    */
  def encodeAlphaRaw(plane: Array[Byte], w: Int, h: Int, method: Int): Array[Byte] = {
    require(plane.length == w * h, "alpha plane size")
    require(method >= 0 && method <= 3, "alpha filter method")
    val out = new Array[Byte](1 + w * h)
    out(0) = (method << 2).toByte // compression 0, no pre-processing
    // forward filter: residual = value - predictor, predictors as above
    var y = 0
    while (y < h) {
      val row = y * w
      var x = 0
      while (x < w) {
        val v = plane(row + x) & 0xff
        val pred = method match {
          case 0 => 0
          case 1 => if (x > 0) plane(row + x - 1) & 0xff
            else if (y > 0) plane(row - w) & 0xff else 0
          case 2 => if (y > 0) plane(row - w + x) & 0xff
            else if (x > 0) plane(x - 1) & 0xff else 0
          case _ =>
            if (y == 0) { if (x > 0) plane(x - 1) & 0xff else 0 }
            else if (x == 0) plane(row - w) & 0xff
            else clip255((plane(row + x - 1) & 0xff) +
              (plane(row - w + x) & 0xff) - (plane(row - w + x - 1) & 0xff))
        }
        out(1 + row + x) = ((v - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** A VP8X still container with an alpha plane: VP8X (alpha flag) +
    * ALPH + VP8 — the lossy-with-transparency layout libwebp writes.
    */
  def wrapVp8xAlphaStill(w: Int, h: Int, alph: Array[Byte],
      vp8: Array[Byte]): Array[Byte] = {
    val vp8x = new Array[Byte](10)
    vp8x(0) = 0x10 // alpha flag
    vp8x(4) = ((w - 1) & 0xff).toByte
    vp8x(5) = (((w - 1) >> 8) & 0xff).toByte
    vp8x(6) = (((w - 1) >> 16) & 0xff).toByte
    vp8x(7) = ((h - 1) & 0xff).toByte
    vp8x(8) = (((h - 1) >> 8) & 0xff).toByte
    vp8x(9) = (((h - 1) >> 16) & 0xff).toByte
    val body = new java.io.ByteArrayOutputStream(alph.length + vp8.length + 48)
    def chunk(cc: String, payload: Array[Byte]): Unit = {
      body.write(cc.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      body.write(payload.length & 0xff); body.write((payload.length >> 8) & 0xff)
      body.write((payload.length >> 16) & 0xff); body.write((payload.length >> 24) & 0xff)
      body.write(payload, 0, payload.length)
      if ((payload.length & 1) == 1) body.write(0)
    }
    chunk("VP8X", vp8x)
    chunk("ALPH", alph)
    chunk("VP8 ", vp8)
    val b = body.toByteArray
    val riff = new java.io.ByteArrayOutputStream(b.length + 12)
    riff.write("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    riff.write((b.length + 4) & 0xff); riff.write(((b.length + 4) >> 8) & 0xff)
    riff.write(((b.length + 4) >> 16) & 0xff); riff.write(((b.length + 4) >> 24) & 0xff)
    riff.write("WEBP".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    riff.write(b, 0, b.length)
    riff.toByteArray
  }

  def decodeLossyYuv(bytes: Array[Byte]): Vp8.Yuv = {
    val (off, len) = chunks(bytes).collectFirst { case ("VP8 ", o, l) => (o, l) }
      .getOrElse(throw new IllegalArgumentException("malformed WebP (no VP8 chunk)"))
    Vp8.decodeKeyframe(java.util.Arrays.copyOfRange(bytes, off, off + len))
  }

  /** Full pixel decode to (header, RGBA raster — 4 bytes/px, top-down):
    * VP8L losslessly; lossy VP8 keyframes through [[Vp8.decodeKeyframe]]
    * with nearest-neighbor chroma upsample and the JFIF fixed-point
    * YCbCr→RGB (libwebp's "fancy" bilinear upsampler is a renderer
    * choice, not bitstream semantics — the YUV planes from
    * [[decodeLossyYuv]] are the spec-exact output and what mm13 audits).
    */
  def decode(bytes: Array[Byte]): (Header, Array[Byte]) = {
    val hd = meta(bytes)
    // decompression-bomb guard BEFORE the w*h*4 raster allocation: VP8L's
    // 14-bit dims let a ~50-byte file legally claim 16383² (a ~1 GB RGBA
    // raster); see Multimodal.MaxDecodePixels
    Multimodal.checkPixelBudget(hd.w.toLong, hd.h.toLong, "WebP")
    if (!hd.lossless) {
      val yuv = decodeLossyYuv(bytes)
      // VP8X stills carry transparency as an ALPH sidecar plane (the
      // lossy-with-alpha layout); absent → fully opaque
      val alpha = chunks(bytes).collectFirst { case ("ALPH", o, l) => (o, l) }
        .map { case (o, l) => decodeAlpha(bytes, o, l, yuv.width, yuv.height) }
      val out = new Array[Byte](yuv.width * yuv.height * 4)
      val uvw = yuv.uvStride
      val alphaPlane = alpha.orNull // hoisted: no per-pixel Option/closure
      var y = 0
      while (y < yuv.height) {
        var x = 0
        while (x < yuv.width) {
          val yy = yuv.y(y * yuv.width + x) & 0xff
          val cb = (yuv.u((y / 2) * uvw + x / 2) & 0xff) - 128
          val cr = (yuv.v((y / 2) * uvw + x / 2) & 0xff) - 128
          val i = (y * yuv.width + x) * 4
          out(i) = clampByte(yy + ((91881 * cr + 32768) >> 16))
          out(i + 1) = clampByte(yy - ((22554 * cb + 46802 * cr + 32768) >> 16))
          out(i + 2) = clampByte(yy + ((116130 * cb + 32768) >> 16))
          out(i + 3) = if (alphaPlane != null) alphaPlane(y * yuv.width + x) else 0xff.toByte
          x += 1
        }
        y += 1
      }
      return (hd, out)
    }
    val (off, len) = chunks(bytes).collectFirst { case ("VP8L", o, l) => (o, l) }.get
    val br = new Br(bytes, off + 1 + 4, off + len) // skip sig byte + header bits
    // re-read nothing: meta() consumed header from fixed LE bytes
    val pixels = decodeVp8lArgb(br, hd.w, hd.h)

    // ARGB ints → RGBA bytes
    val out = new Array[Byte](pixels.length * 4)
    var i = 0
    while (i < pixels.length) {
      val p = pixels(i)
      out(i * 4) = ((p >> 16) & 0xff).toByte
      out(i * 4 + 1) = ((p >> 8) & 0xff).toByte
      out(i * 4 + 2) = (p & 0xff).toByte
      out(i * 4 + 3) = ((p >>> 24) & 0xff).toByte
      i += 1
    }
    (hd, out)
  }

  /** The level-0 VP8L pipeline after the 14-bit header: transform parse,
    * entropy image decode, inverse transforms. Shared by the VP8L still
    * path and the headerless ALPH alpha stream (which uses the identical
    * grammar — libwebp's alpha encoder emits transforms too).
    */
  private def decodeVp8lArgb(br: Br, w0: Int, h: Int): Array[Int] = {
    var w = w0
    val txs = scala.collection.mutable.ArrayBuffer.empty[Transform]
    var seen = Set.empty[Int]
    while (br.readBit() == 1) {
      val ttype = br.read(2)
      require(!seen.contains(ttype), "malformed VP8L (transform repeated)")
      seen += ttype
      ttype match {
        case 0 => // predictor
          val bits = br.read(3) + 2
          val img = decodeImageStream(br, divUp(w, 1 << bits), divUp(h, 1 << bits))
          txs += Predictor(bits, img, w)
        case 1 => // color transform
          val bits = br.read(3) + 2
          val img = decodeImageStream(br, divUp(w, 1 << bits), divUp(h, 1 << bits))
          txs += ColorTx(bits, img, w)
        case 2 => // subtract green
          txs += SubtractGreen(w)
        case 3 => // color indexing
          val paletteSize = br.read(8) + 1
          val raw = decodeImageStream(br, paletteSize, 1)
          // palette entries are component-wise deltas off the previous
          val pal = new Array[Int](paletteSize)
          var prev = 0
          var i = 0
          while (i < paletteSize) {
            val d = raw(i)
            val a = (((prev >>> 24) + (d >>> 24)) & 0xff) << 24
            val r = ((((prev >> 16) & 0xff) + ((d >> 16) & 0xff)) & 0xff) << 16
            val gg = ((((prev >> 8) & 0xff) + ((d >> 8) & 0xff)) & 0xff) << 8
            val b = ((prev & 0xff) + (d & 0xff)) & 0xff
            prev = a | r | gg | b
            pal(i) = prev
            i += 1
          }
          val widthBits =
            if (paletteSize <= 2) 3
            else if (paletteSize <= 4) 2
            else if (paletteSize <= 16) 1
            else 0
          txs += Indexing(pal, widthBits, w)
          if (widthBits > 0) w = divUp(w, 1 << widthBits)
      }
    }

    var pixels = decodeImageStream(br, w, h, level0 = true)
    var curW = w
    // inverse transforms, reverse signal order
    txs.reverseIterator.foreach {
      case Indexing(pal, widthBits, fullW) =>
        pixels = applyIndexingInverse(pixels, curW, h, pal, widthBits, fullW)
        curW = fullW
      case SubtractGreen(_) =>
        var i = 0
        while (i < pixels.length) {
          val p = pixels(i)
          val gch = (p >> 8) & 0xff
          val r = (((p >> 16) & 0xff) + gch) & 0xff
          val b = ((p & 0xff) + gch) & 0xff
          pixels(i) = (p & 0xff00ff00) | (r << 16) | b
          i += 1
        }
      case ColorTx(bits, img, xs) =>
        require(xs == curW, "internal: color transform width mismatch")
        val mw = divUp(xs, 1 << bits)
        var i = 0
        while (i < pixels.length) {
          val x = i % xs
          val y = i / xs
          val tp = img((y >> bits) * mw + (x >> bits))
          val g2r = (tp & 0xff).toByte
          val g2b = ((tp >> 8) & 0xff).toByte
          val r2b = ((tp >> 16) & 0xff).toByte
          val p = pixels(i)
          val gch = ((p >> 8) & 0xff).toByte
          val r = (((p >> 16) & 0xff) + ((g2r * gch) >> 5)) & 0xff
          val b0 = ((p & 0xff) + ((g2b * gch) >> 5)) & 0xff
          val b = (b0 + ((r2b * r.toByte) >> 5)) & 0xff
          pixels(i) = (p & 0xff00ff00) | (r << 16) | b
          i += 1
        }
      case Predictor(bits, img, xs) =>
        require(xs == curW, "internal: predictor width mismatch")
        applyPredictorInverse(pixels, xs, h, bits, img)
    }
    require(curW == w0, "internal: width after transforms != header width")
    pixels
  }

  private def applyIndexingInverse(pixels: Array[Int], packedW: Int, h: Int,
      pal: Array[Int], widthBits: Int, fullW: Int): Array[Int] = {
    if (widthBits == 0) {
      val out = new Array[Int](pixels.length)
      var i = 0
      while (i < pixels.length) {
        val idx = (pixels(i) >> 8) & 0xff
        out(i) = if (idx < pal.length) pal(idx) else 0
        i += 1
      }
      out
    } else {
      val perByte = 1 << widthBits
      val idxBits = 8 >> widthBits
      val mask = (1 << idxBits) - 1
      val out = new Array[Int](fullW * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < fullW) {
          val packed = (pixels(y * packedW + (x >> widthBits)) >> 8) & 0xff
          val sub = x & (perByte - 1)
          val idx = (packed >> (sub * idxBits)) & mask
          out(y * fullW + x) = if (idx < pal.length) pal(idx) else 0
          x += 1
        }
        y += 1
      }
      out
    }
  }

  // predictor helpers, all per-channel on packed ARGB
  private def avg2(a: Int, b: Int): Int = {
    (((((a >>> 24) & 0xff) + ((b >>> 24) & 0xff)) >> 1) << 24) |
      (((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) >> 1) << 16) |
      (((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) >> 1) << 8) |
      (((a & 0xff) + (b & 0xff)) >> 1)
  }
  private def addPixels(a: Int, b: Int): Int = {
    ((((a >>> 24) + (b >>> 24)) & 0xff) << 24) |
      (((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) & 0xff) << 16) |
      (((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) & 0xff) << 8) |
      (((a & 0xff) + (b & 0xff)) & 0xff)
  }
  private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
  private def select(l: Int, t: Int, tl: Int): Int = {
    def ch(p: Int, s: Int) = (p >>> s) & 0xff
    var pa = 0; var pb = 0
    var s = 0
    while (s < 32) {
      val pred = ch(l, s) + ch(t, s) - ch(tl, s)
      pa += math.abs(pred - ch(l, s))
      pb += math.abs(pred - ch(t, s))
      s += 8
    }
    // libwebp (Predictor11: Select(top, left, topleft)) returns TOP on a
    // tie — pa_minus_pb <= 0 picks `a` = T. Strict `<` here, or libwebp-
    // encoded files decode wrong pixels that propagate forward.
    if (pa < pb) l else t
  }
  private def clampAddSubtractFull(l: Int, t: Int, tl: Int): Int = {
    def ch(p: Int, s: Int) = (p >>> s) & 0xff
    var out = 0
    var s = 0
    while (s < 32) {
      out |= clip255(ch(l, s) + ch(t, s) - ch(tl, s)) << s
      s += 8
    }
    out
  }
  private def clampAddSubtractHalf(ave: Int, tl: Int): Int = {
    def ch(p: Int, s: Int) = (p >>> s) & 0xff
    var out = 0
    var s = 0
    while (s < 32) {
      val a = ch(ave, s)
      out |= clip255(a + (a - ch(tl, s)) / 2) << s
      s += 8
    }
    out
  }

  private def applyPredictorInverse(px: Array[Int], w: Int, h: Int,
      bits: Int, img: Array[Int]): Unit = {
    val mw = divUp(w, 1 << bits)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val pred: Int =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) px(i - 1) // mode forced L on row 0
          else if (x == 0) px(i - w) // mode forced T on col 0
          else {
            val mode = (img((y >> bits) * mw + (x >> bits)) >> 8) & 0xf
            val l = px(i - 1)
            val t = px(i - w)
            // TR addressing wraps through row-major memory: for the
            // rightmost column, px(i - w + 1) IS the current row's first
            // (already reconstructed) pixel — the spec's rule
            val tr = px(i - w + 1)
            val tl = px(i - w - 1)
            mode match {
              case 0 => 0xff000000
              case 1 => l
              case 2 => t
              case 3 => tr
              case 4 => tl
              case 5 => avg2(avg2(l, tr), t)
              case 6 => avg2(l, tl)
              case 7 => avg2(l, t)
              case 8 => avg2(tl, t)
              case 9 => avg2(t, tr)
              case 10 => avg2(avg2(l, tl), avg2(t, tr))
              case 11 => select(l, t, tl)
              case 12 => clampAddSubtractFull(l, t, tl)
              case 13 => clampAddSubtractHalf(avg2(l, t), tl)
              case other =>
                throw new IllegalArgumentException(
                  s"malformed VP8L (predictor mode $other)")
            }
          }
        px(i) = addPixels(px(i), pred)
        x += 1
      }
      y += 1
    }
  }

  // ------------------------------------------------------- encoder ------

  private final class Bw {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def write(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= ((v >> i) & 1) << nbits
        nbits += 1
        if (nbits == 8) { buf.write(cur); cur = 0; nbits = 0 }
        i += 1
      }
    }
    def bytes(): Array[Byte] = {
      if (nbits > 0) { buf.write(cur); cur = 0; nbits = 0 }
      buf.toByteArray
    }
  }

  /** Canonical code assignment for known lengths: symbol → (code, len). */
  private def canonicalCodes(lengths: Array[Int]): Array[(Int, Int)] = {
    val maxLen = lengths.max
    val count = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) count(l) += 1)
    val nextCode = new Array[Int](maxLen + 2)
    var code = 0
    var l = 1
    while (l <= maxLen) { code = (code + count(l - 1)) << 1; nextCode(l) = code; l += 1 }
    val out = new Array[(Int, Int)](lengths.length)
    val syms = lengths.indices.filter(lengths(_) > 0).sortBy(s => (lengths(s), s))
    syms.foreach { s =>
      out(s) = (nextCode(lengths(s)), lengths(s))
      nextCode(lengths(s)) += 1
    }
    out
  }

  /** Huffman code lengths from frequencies (package-free two-queue on a
    * sorted heap; lengths naturally ≤ 15 for the ≤ 280-symbol alphabets
    * and small fixture counts used here).
    */
  private def huffmanLengths(freq: Array[Long]): Array[Int] = {
    val active = freq.indices.filter(freq(_) > 0)
    val lengths = new Array[Int](freq.length)
    if (active.isEmpty) return lengths
    if (active.size == 1) { lengths(active.head) = 1; return lengths }
    // simple pairing heap via priority queue of (weight, members)
    val pq = scala.collection.mutable.PriorityQueue.empty[(Long, Int, List[Int])](
      Ordering.by[(Long, Int, List[Int]), (Long, Int)](t => (t._1, t._2)).reverse)
    var tie = 0
    active.foreach { s => pq.enqueue((freq(s), tie, List(s))); tie += 1 }
    while (pq.size > 1) {
      val (w1, _, m1) = pq.dequeue()
      val (w2, _, m2) = pq.dequeue()
      (m1 ++ m2).foreach(s => lengths(s) += 1)
      pq.enqueue((w1 + w2, tie, m1 ++ m2))
      tie += 1
    }
    require(lengths.max <= 15, "fixture huffman exceeded 15 bits")
    lengths
  }

  /** Optimal lengths when they fit the depth cap, the complete bounded
    * code otherwise — skewed histograms (review find: Fibonacci-like
    * frequencies push the two-queue build past 15) must degrade to a
    * legal code, not crash the writer.
    */
  private def lengthsCapped(freq: Array[Long], cap: Int): Array[Int] = {
    val active = freq.count(_ > 0)
    if (active.toLong > (1L << cap)) // cannot fit any complete code
      throw new IllegalArgumentException("alphabet too large for depth cap")
    val h = try huffmanLengths(freq)
    catch { case _: IllegalArgumentException => boundedCompleteLengths(freq, cap) }
    if (h.max <= cap) h else boundedCompleteLengths(freq, cap)
  }

  /** COMPLETE prefix code of depth ≤ maxLen: the 2^L − k shortest slots
    * go to the most frequent symbols (k symbols, L = ⌈log2 k⌉ — Kraft
    * sum exactly 1 by construction).
    */
  private def boundedCompleteLengths(freq: Array[Long], maxLen: Int): Array[Int] = {
    val active = freq.indices.filter(freq(_) > 0).sortBy(s => (-freq(s), s))
    val k = active.size
    val L = (1 to maxLen).find(l => (1 << l) >= k)
      .getOrElse(throw new IllegalArgumentException("alphabet too large for depth cap"))
    val nShort = (1 << L) - k // symbols at length L-1
    val out = new Array[Int](freq.length)
    active.zipWithIndex.foreach { case (s, i) =>
      out(s) = if (i < nShort && L > 1) L - 1 else L
    }
    // nShort at L-1 and k-nShort at L: Kraft = nShort/2^(L-1) + (k-nShort)/2^L
    //                                        = (2*nShort + k - nShort)/2^L = 1
    out
  }

  private def writeHuffmanCode(bw: Bw, lengths: Array[Int]): Array[(Int, Int)] = {
    val used = lengths.indices.filter(lengths(_) > 0)
    if (used.size <= 2 && used.forall(_ < 256)) {
      // simple code
      bw.write(1, 1)
      bw.write(used.size - 1, 1)
      val first = used.head
      if (first >= 2) { bw.write(1, 1); bw.write(first, 8) }
      else { bw.write(0, 1); bw.write(first, 1) }
      if (used.size == 2) bw.write(used(1), 8)
      val codes = new Array[(Int, Int)](lengths.length)
      if (used.size == 1) codes(used.head) = (0, 0)
      else { codes(used.head) = (0, 1); codes(used(1)) = (1, 1) }
      codes
    } else {
      bw.write(0, 1) // full code
      // a fully-used power-of-two alphabet with all-equal lengths would
      // give the code-length code a SINGLE active symbol — which the
      // decoder (and libwebp) reads as a 0-bit code while the writer
      // below emits 1-bit codes (review find). Perturb to the complete
      // unbalanced form (one symbol shorter, two longer): same alphabet,
      // still Kraft-exact, and the clc gains three active symbols.
      val safeLengths =
        if (lengths.forall(_ == lengths(0)) && lengths(0) < 15 && lengths(0) >= 2) {
          val l = lengths.clone()
          l(0) = l(0) - 1
          l(l.length - 1) = l(l.length - 1) + 1
          l(l.length - 2) = l(l.length - 2) + 1
          l
        } else lengths
      // clc over the literal length values (no 16/17/18 run codes except
      // emitting long zero runs with 17/18 would shrink output; literals
      // keep the encoder simple and the stream legal)
      val clcFreq = new Array[Long](19)
      safeLengths.foreach(l => clcFreq(l) += 1)
      val clcLengths = lengthsCapped(clcFreq, 7) // 3-bit fields cap clc at 7
      bw.write(15, 4) // num_code_lengths = 19
      ClcOrder.foreach(sym => bw.write(clcLengths(sym), 3))
      bw.write(0, 1) // no max-symbol cap
      val clcCodes = canonicalCodes(clcLengths)
      safeLengths.foreach { l =>
        val (c, n) = clcCodes(l)
        writeCodeMsbFirst(bw, c, n)
      }
      canonicalCodes(safeLengths)
    }
  }

  /** prefix-code bits are emitted MSB-of-code first. */
  private def writeCodeMsbFirst(bw: Bw, code: Int, len: Int): Unit = {
    var i = len - 1
    while (i >= 0) { bw.write((code >> i) & 1, 1); i -= 1 }
  }

  /** Deterministic subset VP8L encoder: literal pixels, one prefix group,
    * no color cache, optional subtract-green. `rgba` is 4 bytes/px,
    * row-major top-down. Produces a complete RIFF/WEBP file.
    */
  def encodeLossless(w: Int, h: Int, rgba: Array[Byte],
      subtractGreen: Boolean = false): Array[Byte] = {
    require(rgba.length == w * h * 4, "raster size mismatch")
    require(w >= 1 && w <= 16384 && h >= 1 && h <= 16384, "unsupported dimensions")
    val bw = new Bw
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    val hasAlpha = rgba.indices.exists(i => i % 4 == 3 && (rgba(i) & 0xff) != 0xff)
    bw.write(if (hasAlpha) 1 else 0, 1)
    bw.write(0, 3) // version

    val n = w * h
    val gs = new Array[Int](n); val rs = new Array[Int](n)
    val bs = new Array[Int](n); val as = new Array[Int](n)
    var i = 0
    while (i < n) {
      var r = rgba(i * 4) & 0xff
      val g = rgba(i * 4 + 1) & 0xff
      var b = rgba(i * 4 + 2) & 0xff
      val a = rgba(i * 4 + 3) & 0xff
      if (subtractGreen) { r = (r - g) & 0xff; b = (b - g) & 0xff }
      rs(i) = r; gs(i) = g; bs(i) = b; as(i) = a
      i += 1
    }

    if (subtractGreen) { bw.write(1, 1); bw.write(2, 2) } // transform: subtract-green
    bw.write(0, 1) // no more transforms
    bw.write(0, 1) // no color cache
    bw.write(0, 1) // no meta prefix

    def freqOf(vals: Array[Int], size: Int): Array[Long] = {
      val f = new Array[Long](size)
      vals.foreach(v => f(v) += 1)
      f
    }
    val greenCodes = writeHuffmanCode(bw, lengthsCapped(freqOf(gs, 256 + 24), 15))
    val redCodes = writeHuffmanCode(bw, lengthsCapped(freqOf(rs, 256), 15))
    val blueCodes = writeHuffmanCode(bw, lengthsCapped(freqOf(bs, 256), 15))
    val alphaCodes = writeHuffmanCode(bw, lengthsCapped(freqOf(as, 256), 15))
    // distance tree: unused — a legal 1-symbol simple code
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)

    i = 0
    while (i < n) {
      val (gc, gl) = greenCodes(gs(i)); writeCodeMsbFirst(bw, gc, gl)
      val (rc, rl) = redCodes(rs(i)); writeCodeMsbFirst(bw, rc, rl)
      val (bc, bl) = blueCodes(bs(i)); writeCodeMsbFirst(bw, bc, bl)
      val (ac, al) = alphaCodes(as(i)); writeCodeMsbFirst(bw, ac, al)
      i += 1
    }

    // bw's first 4 flushed bytes ARE the 32 header bits (14+14+1+3)
    riff(Array[Byte](0x2f) ++ bw.bytes())
  }

  private def riff(vp8lPayload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val pad = vp8lPayload.length & 1
    val riffSize = 4 + 8 + vp8lPayload.length + pad
    out.write("RIFF".getBytes("US-ASCII")); out.write(le(riffSize))
    out.write("WEBP".getBytes("US-ASCII"))
    out.write("VP8L".getBytes("US-ASCII")); out.write(le(vp8lPayload.length))
    out.write(vp8lPayload)
    if (pad == 1) out.write(0)
    out.toByteArray
  }
}
