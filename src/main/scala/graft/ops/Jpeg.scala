package graft.ops

/** Pure-JVM baseline JPEG codec (ITU-T T.81 sequential DCT, Huffman,
  * 8-bit) — no ImageIO, no native libraries, implemented from the public
  * standard like its siblings [[Png]] / the BMP/PNM/WAV branches of
  * [[BinaryMediaDecoder]].
  *
  * Decoder scope (anything outside it throws, mirroring the reference's
  * unsupported-type guard — `/root/reference/backend/etl_pipeline.py`
  * raises on inputs it has no parser for):
  *
  *  - SOF0 baseline only (SOF2 progressive, arithmetic coding, 12-bit
  *    precision, and lossless modes are refused with a clear message);
  *  - 1 component (grayscale) or 3 components (JFIF YCbCr) with sampling
  *    factors 1 or 2 (covers 4:4:4, 4:2:2, 4:2:0);
  *  - DQT 8- and 16-bit tables, multi-table DHT/DQT segments, DRI restart
  *    intervals, 0xFF00 byte stuffing, APPn/COM skip.
  *
  * DETERMINISM CONTRACT: the inverse DCT is integer fixed-point over the
  * hardcoded 14-bit basis table below (`round(c(u)/2 ·
  * cos((2x+1)uπ/16) · 2^14)`, c(0)=1/√2), two Long passes with a single
  * round-half-up shift at the end; chroma upsampling is nearest-neighbor
  * (`cx = x·cw/w`); YCbCr→RGB is 16-bit fixed-point with the JFIF
  * constants (1.402, 0.344136, 0.714136, 1.772 scaled by 2^16). Every
  * step is integer arithmetic, so decoded pixels are bit-identical across
  * platforms and languages — tools/make_jpeg_fixture.py carries an
  * independently written Python mirror of this contract, and JpegSpec
  * pins fixture decodes byte-for-byte against it. A useful consequence:
  * a DC-only block (all AC zero) with a flat quantizer decodes EXACTLY
  * (the basis row for u=0 is constant 5793 and S00·5793²≫28 rounds to
  * S00/8 for the whole coefficient range), which is what the
  * mm04_jpeg_roundtrip oracle exploits to get a DuckDB-recomputable
  * pixel checksum out of a lossy format.
  *
  * Encoder scope (the oracle-side counterpart, NOT a general encoder):
  * grayscale, flat quantizer (all ones), each 8×8 block CONSTANT — only
  * the DC coefficient survives the forward DCT, so the file is small,
  * legal baseline JPEG, and decodes losslessly through the general
  * decoder path above.
  */
object Jpeg {

  final case class Header(w: Int, h: Int, channels: Int)

  // round(c(u)/2 · cos((2x+1)uπ/16) · 2^14), c(0)=1/√2 — generated once
  // (see tools/make_jpeg_fixture.py, which embeds the same literals)
  private val Basis: Array[Array[Int]] = Array(
    Array(5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793),
    Array(8035, 6811, 4551, 1598, -1598, -4551, -6811, -8035),
    Array(7568, 3135, -3135, -7568, -7568, -3135, 3135, 7568),
    Array(6811, -1598, -8035, -4551, 4551, 8035, 1598, -6811),
    Array(5793, -5793, -5793, 5793, 5793, -5793, -5793, 5793),
    Array(4551, -8035, 1598, 6811, -6811, -1598, 8035, -4551),
    Array(3135, -7568, 7568, -3135, -3135, 7568, -7568, 3135),
    Array(1598, -4551, 6811, -8035, 8035, -6811, 4551, -1598))

  // T.81 Figure A.6 zigzag: Zigzag(i) = raster index of the i-th
  // coefficient in transmission order
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // ------------------------------------------------------------ tables --

  /** Canonical Huffman table: decode by walking code lengths 1..16 with
    * the running first-code-of-length counter (T.81 Annex C).
    */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // minCode(l), maxCode(l) (exclusive), valPtr(l) for length l in 1..16
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxCode(l) = code // first INVALID code of this length
        code <<= 1
        l += 1
      }
      require(k == vals.length, s"DHT: ${vals.length} values for $k codes")
    }
  }

  // ------------------------------------------------------- bit reading --

  /** Entropy-coded-segment bit reader: un-stuffs 0xFF00, stops at any
    * other marker (leaving it for the caller), MSB-first.
    */
  private final class BitReader(buf: Array[Byte], var pos: Int) {
    private var acc = 0 // bit accumulator (left-aligned in low bits)
    private var cnt = 0 // bits available
    var atMarker = false

    private def fill(): Unit = {
      if (atMarker || pos >= buf.length) { atMarker = true; return }
      val b = buf(pos) & 0xff
      if (b == 0xff) {
        if (pos + 1 >= buf.length) { atMarker = true; return }
        val b2 = buf(pos + 1) & 0xff
        if (b2 == 0x00) { pos += 2; acc = (acc << 8) | 0xff; cnt += 8 }
        else { atMarker = true } // real marker: do not consume
      } else { pos += 1; acc = (acc << 8) | b; cnt += 8 }
    }

    def bit(): Int = {
      if (cnt == 0) fill()
      if (cnt == 0) throw new IllegalArgumentException(
        "truncated JPEG entropy data")
      cnt -= 1
      (acc >> cnt) & 1
    }

    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    /** Byte-align and consume an expected RSTn marker. */
    def restart(): Unit = {
      acc = 0; cnt = 0
      require(pos + 1 < buf.length && (buf(pos) & 0xff) == 0xff &&
        ((buf(pos + 1) & 0xff) & 0xf8) == 0xd0,
        s"expected RST marker at $pos")
      pos += 2
      atMarker = false
    }

    def decode(t: HuffTable): Int = {
      var code = bit()
      var l = 1
      while (code >= t.maxCode(l)) {
        require(l < 16, "invalid Huffman code (exceeds 16 bits)")
        code = (code << 1) | bit()
        l += 1
      }
      t.values(t.valPtr(l) + code - t.minCode(l))
    }
  }

  /** T.81 F.2.2.1 EXTEND: n-bit magnitude to signed value. */
  private def extend(v: Int, n: Int): Int =
    if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v

  // ----------------------------------------------------------- decode --

  private final case class Component(
      id: Int, hs: Int, vs: Int, tq: Int, var td: Int = 0, var ta: Int = 0)

  def decode(bytes: Array[Byte]): (Header, Array[Byte]) = {
    require(bytes.length > 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "not a JPEG payload (missing SOI)")
    val quant = new Array[Array[Int]](4)
    val dcTab = new Array[HuffTable](4)
    val acTab = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var w = 0
    var h = 0
    var restartInterval = 0
    var pos = 2

    def u16(i: Int) = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)

    var scanStart = -1
    while (scanStart < 0) {
      require(pos + 3 < bytes.length, "truncated JPEG (no SOS)")
      require((bytes(pos) & 0xff) == 0xff, s"expected marker at $pos")
      val m = bytes(pos + 1) & 0xff
      val len = if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) 0
        else u16(pos + 2)
      m match {
        case 0xc0 => // SOF0 baseline
          require((bytes(pos + 4) & 0xff) == 8,
            s"unsupported JPEG precision ${bytes(pos + 4) & 0xff} (8-bit only)")
          h = u16(pos + 5); w = u16(pos + 7)
          require(w > 0 && h > 0, s"degenerate JPEG dimensions ${w}x$h")
          val nc = bytes(pos + 9) & 0xff
          require(nc == 1 || nc == 3,
            s"unsupported JPEG component count $nc (gray or YCbCr only)")
          comps = Array.tabulate(nc) { i =>
            val o = pos + 10 + 3 * i
            val hv = bytes(o + 1) & 0xff
            val c = Component(bytes(o) & 0xff, hv >> 4, hv & 0xf, bytes(o + 2) & 0xff)
            require(c.hs >= 1 && c.hs <= 2 && c.vs >= 1 && c.vs <= 2,
              s"unsupported sampling ${c.hs}x${c.vs} (1 or 2 only)")
            c
          }
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
            0xcd | 0xce | 0xcf =>
          throw new IllegalArgumentException(
            f"unsupported JPEG mode SOF${m - 0xc0}%d (baseline SOF0 only)")
        case 0xdb => // DQT (possibly several tables)
          var o = pos + 4
          while (o < pos + 2 + len) {
            val pq = (bytes(o) & 0xff) >> 4
            val tq = bytes(o) & 0x0f
            require(pq <= 1, s"bad DQT precision $pq")
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) {
              t(Zigzag(i)) =
                if (pq == 0) bytes(o + 1 + i) & 0xff else u16(o + 1 + 2 * i)
              i += 1
            }
            quant(tq) = t
            o += 1 + (if (pq == 0) 64 else 128)
          }
        case 0xc4 => // DHT (possibly several tables)
          var o = pos + 4
          while (o < pos + 2 + len) {
            val tc = (bytes(o) & 0xff) >> 4
            val th = bytes(o) & 0x0f
            val bits = Array.tabulate(16)(i => bytes(o + 1 + i) & 0xff)
            val n = bits.sum
            val vals = Array.tabulate(n)(i => bytes(o + 17 + i) & 0xff)
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTab(th) = t else acTab(th) = t
            o += 17 + n
          }
        case 0xdd => restartInterval = u16(pos + 4)
        case 0xda => // SOS
          require(comps != null, "SOS before SOF0")
          val ns = bytes(pos + 4) & 0xff
          require(ns == comps.length,
            s"non-interleaved scans unsupported ($ns of ${comps.length} components)")
          var i = 0
          while (i < ns) {
            val cid = bytes(pos + 5 + 2 * i) & 0xff
            val tt = bytes(pos + 6 + 2 * i) & 0xff
            val c = comps.find(_.id == cid).getOrElse(
              throw new IllegalArgumentException(s"SOS references unknown component $cid"))
            c.td = tt >> 4; c.ta = tt & 0xf
            i += 1
          }
          scanStart = pos + 2 + len
        case 0xd9 => throw new IllegalArgumentException("EOI before SOS")
        case _ => // APPn / COM / DNL / anything skippable
      }
      pos += 2 + len
    }

    // MCU geometry
    val hMax = comps.map(_.hs).max
    val vMax = comps.map(_.vs).max
    val mcuW = 8 * hMax
    val mcuH = 8 * vMax
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH

    // per-component plane at its natural resolution (padded to MCU grid)
    val planeW = comps.map(c => mcusX * c.hs * 8)
    val planeH = comps.map(c => mcusY * c.vs * 8)
    val planes = comps.indices.map(i => new Array[Byte](planeW(i) * planeH(i))).toArray

    val br = new BitReader(bytes, scanStart)
    val dcPred = new Array[Int](comps.length)
    val coef = new Array[Int](64)

    var mcu = 0
    val mcuCount = mcusX * mcusY
    while (mcu < mcuCount) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.restart()
        java.util.Arrays.fill(dcPred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = quant(c.tq)
        require(q != null, s"missing DQT table ${c.tq}")
        val dct = dcTab(c.td)
        val act = acTab(c.ta)
        require(dct != null && act != null, "missing DHT table")
        var by = 0
        while (by < c.vs) {
          var bx = 0
          while (bx < c.hs) {
            // ---- entropy-decode one block into natural order ----
            java.util.Arrays.fill(coef, 0)
            val s = br.decode(dct)
            require(s <= 11, s"bad DC category $s")
            dcPred(ci) += extend(br.bits(s), s)
            coef(0) = dcPred(ci) * q(0)
            var k = 1
            while (k < 64) {
              val rs = br.decode(act)
              val r = rs >> 4
              val sz = rs & 0xf
              if (sz == 0) {
                if (r == 15) k += 16 // ZRL
                else k = 64 // EOB
              } else {
                k += r
                require(k < 64, "AC run past block end")
                coef(Zigzag(k)) = extend(br.bits(sz), sz) * q(Zigzag(k))
                k += 1
              }
            }
            // ---- integer IDCT: rows then columns, one final shift ----
            // t(x)(v) = Σ_u coef(u,v)·Basis(u)(x)   (scale 2^14)
            // p(x)(y) = Σ_v t(x)(v)·Basis(v)(y)     (scale 2^28)
            val t = new Array[Long](64)
            var x = 0
            while (x < 8) {
              var v = 0
              while (v < 8) {
                var acc = 0L
                var u = 0
                while (u < 8) { acc += coef(u * 8 + v).toLong * Basis(u)(x); u += 1 }
                t(x * 8 + v) = acc
                v += 1
              }
              x += 1
            }
            val px0 = (mx * c.hs + bx) * 8
            val py0 = (my * c.vs + by) * 8
            val pw = planeW(ci)
            val plane = planes(ci)
            var y = 0
            while (y < 8) {
              var xx = 0
              while (xx < 8) {
                var acc = 0L
                var v = 0
                while (v < 8) { acc += t(xx * 8 + v) * Basis(v)(y); v += 1 }
                val s28 = ((acc + (1L << 27)) >> 28) + 128
                val clamped = if (s28 < 0) 0 else if (s28 > 255) 255 else s28.toInt
                plane((py0 + y) * pw + (px0 + xx)) = clamped.toByte
                xx += 1
              }
              y += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    // ---- color reconstruction at full resolution ----
    if (comps.length == 1) {
      val out = new Array[Byte](w * h)
      val pw = planeW(0)
      var y = 0
      while (y < h) {
        System.arraycopy(planes(0), y * pw, out, y * w, w)
        y += 1
      }
      (Header(w, h, 1), out)
    } else {
      val out = new Array[Byte](w * h * 3)
      val yp = planes(0); val cbp = planes(1); val crp = planes(2)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yy = yp(y * planeW(0) + x) & 0xff
          // nearest-neighbor upsample: source sample index scales by the
          // component's sampling ratio vs the max
          val cbx = x * comps(1).hs / hMax; val cby = y * comps(1).vs / vMax
          val crx = x * comps(2).hs / hMax; val cry = y * comps(2).vs / vMax
          val cb = (cbp(cby * planeW(1) + cbx) & 0xff) - 128
          val cr = (crp(cry * planeW(2) + crx) & 0xff) - 128
          // JFIF fixed-point: 1.402, 0.344136, 0.714136, 1.772 · 2^16
          val r = yy + ((91881 * cr + 32768) >> 16)
          val g = yy - ((22554 * cb + 46802 * cr + 32768) >> 16)
          val b = yy + ((116130 * cb + 32768) >> 16)
          val o = (y * w + x) * 3
          out(o) = (if (r < 0) 0 else if (r > 255) 255 else r).toByte
          out(o + 1) = (if (g < 0) 0 else if (g > 255) 255 else g).toByte
          out(o + 2) = (if (b < 0) 0 else if (b > 255) 255 else b).toByte
          x += 1
        }
        y += 1
      }
      (Header(w, h, 3), out)
    }
  }

  // ----------------------------------------------------------- encode --

  // Annex K.3.1 luminance DC table (categories 0..11)
  private val StdDcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val StdDcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)

  /** Encode a grayscale image whose every 8×8 block is CONSTANT, with a
    * flat (all-ones) quantizer — the DC-only construction that the integer
    * IDCT decodes EXACTLY (see object scaladoc). `w` and `h` must be
    * multiples of 8; `blockVal(bx, by)` supplies each block's pixel value.
    */
  def encodeGrayBlocks(w: Int, h: Int, blockVal: (Int, Int) => Int): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, s"block-constant encoder needs 8-aligned dims, got ${w}x$h")
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { b(v >> 8); b(v) }
    def marker(m: Int): Unit = { b(0xff); b(m) }

    marker(0xd8) // SOI
    marker(0xdb); u16(2 + 1 + 64); b(0x00) // DQT: 8-bit, id 0, flat
    (0 until 64).foreach(_ => b(1))
    marker(0xc0); u16(8 + 3); b(8); u16(h); u16(w); b(1) // SOF0, 1 comp
    b(1); b(0x11); b(0) // id 1, 1x1, quant 0
    // DHT: Annex K DC luma (class 0, id 0) + a minimal AC table whose only
    // code is EOB as the single 1-bit code '0' (class 1, id 0)
    val acBits = Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    marker(0xc4); u16(2 + (1 + 16 + StdDcVals.length) + (1 + 16 + 1))
    b(0x00); StdDcBits.foreach(b); StdDcVals.foreach(b)
    b(0x10); acBits.foreach(b); b(0x00)
    marker(0xda); u16(6 + 2); b(1); b(1); b(0x00); b(0); b(63); b(0) // SOS

    // canonical codes for the DC table
    val dcCode = new Array[(Int, Int)](12) // (code, len) by category
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < StdDcBits(l - 1)) {
          dcCode(StdDcVals(k)) = (code, l)
          code += 1; k += 1; i += 1
        }
        code <<= 1
        l += 1
      }
    }

    var acc = 0
    var cnt = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0; cnt = 0
        }
        i -= 1
      }
    }

    var pred = 0
    var by = 0
    while (by < h / 8) {
      var bx = 0
      while (bx < w / 8) {
        val v = blockVal(bx, by)
        require(v >= 0 && v <= 255, s"block value $v out of byte range")
        val s00 = 8 * (v - 128) // DC of a constant block, flat quantizer
        val diff = s00 - pred
        pred = s00
        // category + magnitude bits (T.81 F.1.2.1.1)
        val cat = 32 - Integer.numberOfLeadingZeros(math.abs(diff))
        val (code, len) = dcCode(cat)
        putBits(code, len)
        if (cat > 0) putBits(if (diff < 0) diff + (1 << cat) - 1 else diff, cat)
        putBits(0, 1) // EOB (the minimal AC table's single 1-bit code)
        bx += 1
      }
      by += 1
    }
    if (cnt > 0) { putBits((1 << (8 - cnt)) - 1, 8 - cnt) } // pad with 1s
    marker(0xd9) // EOI
    out.toByteArray
  }
}
