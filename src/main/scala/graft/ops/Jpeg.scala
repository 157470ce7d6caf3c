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
  *  - SOF0 baseline AND SOF2 progressive (round 9 — full T.81 Annex G:
  *    spectral selection, successive approximation DC/AC first and
  *    refinement scans, EOB runs, interleaved DC / single-component AC
  *    scans, DHT/DQT redefinition between scans, restarts; arithmetic
  *    coding, 12-bit precision, and lossless modes are refused with a
  *    clear message);
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

  private def parseDqt(bytes: Array[Byte], pos: Int, len: Int,
      quant: Array[Array[Int]]): Unit = {
    def u16(i: Int) = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
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
  }

  private def parseDht(bytes: Array[Byte], pos: Int, len: Int,
      dcTab: Array[HuffTable], acTab: Array[HuffTable]): Unit = {
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
  }

  /** Integer IDCT of one block (NATURAL-order dequantized coefficients)
    * into a plane at (px0, py0) — the shared determinism-contract kernel
    * of the baseline and progressive paths (see object scaladoc).
    */
  private def idctToPlane(coef: Array[Int], plane: Array[Byte], pw: Int,
      px0: Int, py0: Int): Unit = {
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
  }

  /** Shared color reconstruction: gray copy or YCbCr→RGB with
    * nearest-neighbor chroma upsample (JFIF fixed-point constants).
    */
  private def reconstruct(w: Int, h: Int, comps: Array[Component],
      planes: Array[Array[Byte]], planeW: IndexedSeq[Int]): (Header, Array[Byte]) = {
    val hMax = comps.map(_.hs).max
    val vMax = comps.map(_.vs).max
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
    var progressive = false
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
        case 0xc0 | 0xc2 => // SOF0 baseline / SOF2 progressive (round 9)
          progressive = m == 0xc2
          require((bytes(pos + 4) & 0xff) == 8,
            s"unsupported JPEG precision ${bytes(pos + 4) & 0xff} (8-bit only)")
          h = u16(pos + 5); w = u16(pos + 7)
          require(w > 0 && h > 0, s"degenerate JPEG dimensions ${w}x$h")
          Multimodal.checkPixelBudget(w.toLong, h.toLong, "JPEG")
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
        case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
            0xcd | 0xce | 0xcf =>
          throw new IllegalArgumentException(
            f"unsupported JPEG mode SOF${m - 0xc0}%d (baseline SOF0 or progressive SOF2 only)")
        case 0xdb => parseDqt(bytes, pos, len, quant)
        case 0xc4 => parseDht(bytes, pos, len, dcTab, acTab)
        case 0xdd => restartInterval = u16(pos + 4)
        case 0xda => // SOS
          require(comps != null, "SOS before SOF")
          if (progressive)
            return decodeProgressive(bytes, pos, w, h, comps,
              quant, dcTab, acTab, restartInterval)
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
            idctToPlane(coef, planes(ci), planeW(ci),
              (mx * c.hs + bx) * 8, (my * c.vs + by) * 8)
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    // ---- color reconstruction at full resolution ----
    reconstruct(w, h, comps, planes, planeW)
  }

  // ------------------------------------------------- progressive decode --

  /** SOF2 progressive decode (round 9 — T.81 Annex G, successive
    * approximation + spectral selection, the libjpeg-default scan script
    * shape): coefficients accumulate across scans in per-component
    * ZIGZAG-order block buffers; DC scans may be interleaved, AC scans
    * are single-component over the component's own block grid; EOB runs,
    * ZRL, AC refinement correction bits, DRI restarts, and DHT/DQT
    * redefinition between scans all per spec. After EOI every block
    * dequantizes and runs the SAME integer IDCT as the baseline path, so
    * a progressive and a baseline encoding of identical quantized
    * coefficients decode to IDENTICAL pixels — the cross-check
    * JpegProgressiveSpec pins.
    */
  private def decodeProgressive(bytes: Array[Byte], sosPos: Int, w: Int,
      h: Int, comps: Array[Component], quant: Array[Array[Int]],
      dcTab: Array[HuffTable], acTab: Array[HuffTable],
      restartInterval0: Int): (Header, Array[Byte]) = {
    def u16(i: Int) = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
    val hMax = comps.map(_.hs).max
    val vMax = comps.map(_.vs).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    // coefficient buffers: MCU-padded grid (interleaved DC scans cover the
    // padding blocks), 64 zigzag-order coefficients per block
    val blocksW = comps.map(c => mcusX * c.hs)
    val blocksH = comps.map(c => mcusY * c.vs)
    // non-interleaved scans cover the component's OWN grid (no padding)
    val niW = comps.map(c => ((w * c.hs + hMax - 1) / hMax + 7) / 8)
    val niH = comps.map(c => ((h * c.vs + vMax - 1) / vMax + 7) / 8)
    val coefs = comps.indices
      .map(i => new Array[Int](blocksW(i) * blocksH(i) * 64)).toArray
    var restartInterval = restartInterval0
    var pos = sosPos
    var sawEoi = false
    while (!sawEoi) {
      require(pos + 1 < bytes.length, "truncated progressive JPEG (no EOI)")
      require((bytes(pos) & 0xff) == 0xff, s"expected marker at $pos")
      val m = bytes(pos + 1) & 0xff
      val len =
        if (m == 0xd9 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) 0
        else {
          require(pos + 3 < bytes.length, "truncated progressive JPEG segment")
          u16(pos + 2)
        }
      m match {
        case 0xda =>
          val ns = bytes(pos + 4) & 0xff
          require(ns >= 1 && ns <= comps.length, s"bad scan component count $ns")
          val scomps = Array.tabulate(ns) { i =>
            val cid = bytes(pos + 5 + 2 * i) & 0xff
            val tt = bytes(pos + 6 + 2 * i) & 0xff
            val ci = comps.indexWhere(_.id == cid)
            require(ci >= 0, s"SOS references unknown component $cid")
            comps(ci).td = tt >> 4; comps(ci).ta = tt & 0xf
            ci
          }
          val o = pos + 5 + 2 * ns
          val ss = bytes(o) & 0xff
          val se = bytes(o + 1) & 0xff
          val ah = (bytes(o + 2) & 0xff) >> 4
          val al = bytes(o + 2) & 0x0f
          pos = decodeProgressiveScan(bytes, pos + 2 + len, scomps, comps,
            coefs, blocksW, niW, niH, mcusX, mcusY, dcTab, acTab,
            ss, se, ah, al, restartInterval)
        case 0xc4 => parseDht(bytes, pos, len, dcTab, acTab); pos += 2 + len
        case 0xdb => parseDqt(bytes, pos, len, quant); pos += 2 + len
        case 0xdd => restartInterval = u16(pos + 4); pos += 2 + len
        case 0xd9 => sawEoi = true
        case 0xc0 | 0xc2 =>
          throw new IllegalArgumentException("second SOF in progressive stream")
        case _ => pos += 2 + len // APPn / COM / DNL
      }
    }
    // dequantize + IDCT every block into the planes, then reconstruct
    val planeW = comps.indices.map(i => blocksW(i) * 8)
    val planes = comps.indices
      .map(i => new Array[Byte](blocksW(i) * 8 * blocksH(i) * 8)).toArray
    val nat = new Array[Int](64)
    var ci = 0
    while (ci < comps.length) {
      val q = quant(comps(ci).tq)
      require(q != null, s"missing DQT table ${comps(ci).tq}")
      val buf = coefs(ci)
      var b = 0
      val nBlocks = blocksW(ci) * blocksH(ci)
      while (b < nBlocks) {
        var k = 0
        while (k < 64) { nat(Zigzag(k)) = buf(b * 64 + k) * q(Zigzag(k)); k += 1 }
        idctToPlane(nat, planes(ci), planeW(ci),
          (b % blocksW(ci)) * 8, (b / blocksW(ci)) * 8)
        b += 1
      }
      ci += 1
    }
    reconstruct(w, h, comps, planes, planeW)
  }

  /** Decode one progressive scan's entropy segment; returns the position
    * of the next marker after it.
    */
  private def decodeProgressiveScan(bytes: Array[Byte], start: Int,
      scomps: Array[Int], comps: Array[Component], coefs: Array[Array[Int]],
      blocksW: Array[Int], niW: Array[Int], niH: Array[Int],
      mcusX: Int, mcusY: Int, dcTab: Array[HuffTable], acTab: Array[HuffTable],
      ss: Int, se: Int, ah: Int, al: Int, restartInterval: Int): Int = {
    require(ss <= 63 && se <= 63 && ss <= se, s"bad spectral band $ss..$se")
    require(al <= 13 && (ah == 0 || ah == al + 1),
      s"bad successive approximation Ah=$ah Al=$al")
    val br = new BitReader(bytes, start)
    val dcPred = new Array[Int](comps.length)
    var eobrun = 0
    var unitsSinceRestart = 0
    def maybeRestart(): Unit = {
      if (restartInterval > 0 && unitsSinceRestart == restartInterval) {
        br.restart()
        java.util.Arrays.fill(dcPred, 0)
        eobrun = 0
        unitsSinceRestart = 0
      }
    }

    def dcOne(ci: Int, b: Int): Unit = {
      val buf = coefs(ci)
      if (ah == 0) {
        val t = dcTab(comps(ci).td)
        require(t != null, "missing DC table")
        val s = br.decode(t)
        require(s <= 11, s"bad DC category $s")
        dcPred(ci) += extend(br.bits(s), s)
        buf(b * 64) = dcPred(ci) << al
      } else if (br.bit() == 1) buf(b * 64) |= 1 << al
    }

    if (ss == 0) {
      require(se == 0, "progressive DC scan must have Se = 0")
      if (scomps.length > 1) {
        // interleaved DC scan: MCU order, hs×vs blocks per component
        var mcu = 0
        val nMcus = mcusX * mcusY
        while (mcu < nMcus) {
          maybeRestart()
          val mx = mcu % mcusX
          val my = mcu / mcusX
          scomps.foreach { ci =>
            val c = comps(ci)
            var by = 0
            while (by < c.vs) {
              var bx = 0
              while (bx < c.hs) {
                dcOne(ci, (my * c.vs + by) * blocksW(ci) + (mx * c.hs + bx))
                bx += 1
              }
              by += 1
            }
          }
          unitsSinceRestart += 1
          mcu += 1
        }
      } else {
        val ci = scomps(0)
        var byy = 0
        while (byy < niH(ci)) {
          var bxx = 0
          while (bxx < niW(ci)) {
            maybeRestart()
            dcOne(ci, byy * blocksW(ci) + bxx)
            unitsSinceRestart += 1
            bxx += 1
          }
          byy += 1
        }
      }
    } else {
      // AC scan: always single-component, over the component's own grid
      require(scomps.length == 1,
        "progressive AC scan must be single-component")
      val ci = scomps(0)
      val act = acTab(comps(ci).ta)
      require(act != null, "missing AC table")
      val buf = coefs(ci)
      val p1 = 1 << al
      val m1 = -1 << al
      var byy = 0
      while (byy < niH(ci)) {
        var bxx = 0
        while (bxx < niW(ci)) {
          maybeRestart()
          val base = (byy * blocksW(ci) + bxx) * 64
          if (ah == 0) {
            // first AC scan of this band (T.81 G.1.2.2)
            if (eobrun > 0) eobrun -= 1
            else {
              var k = ss
              var done = false
              while (!done && k <= se) {
                val rs = br.decode(act)
                val r = rs >> 4
                val sz = rs & 0xf
                if (sz == 0) {
                  if (r < 15) {
                    eobrun = (1 << r) - 1
                    if (r > 0) eobrun += br.bits(r)
                    done = true
                  } else k += 16 // ZRL
                } else {
                  k += r
                  require(k <= se, "AC run past band end")
                  buf(base + k) = extend(br.bits(sz), sz) << al
                  k += 1
                }
              }
            }
          } else {
            // AC refinement scan (T.81 G.1.2.3; the libjpeg
            // decode_mcu_AC_refine control flow, replicated exactly)
            var k = ss
            if (eobrun == 0) {
              var brk = false
              while (!brk && k <= se) {
                val rs = br.decode(act)
                var r = rs >> 4
                val sz = rs & 0xf
                var newval = 0
                if (sz == 0) {
                  if (r < 15) {
                    eobrun = 1 << r
                    if (r > 0) eobrun += br.bits(r)
                    brk = true
                  }
                  // r == 15: ZRL — advance over 16 zero-history coeffs
                } else {
                  require(sz == 1, s"bad AC refinement size $sz")
                  newval = if (br.bit() == 1) p1 else m1
                }
                if (!brk) {
                  var placed = false
                  while (!placed && k <= se) {
                    val c0 = buf(base + k)
                    if (c0 != 0) {
                      if (br.bit() == 1 && (c0 & p1) == 0)
                        buf(base + k) = if (c0 >= 0) c0 + p1 else c0 + m1
                      k += 1
                    } else {
                      r -= 1
                      if (r < 0) placed = true else k += 1
                    }
                  }
                  if (newval != 0) {
                    require(k <= se, "AC refinement places past band end")
                    buf(base + k) = newval
                  }
                  k += 1
                }
              }
            }
            if (eobrun > 0) {
              // correction bits for the remaining nonzero-history coeffs
              while (k <= se) {
                val c0 = buf(base + k)
                if (c0 != 0) {
                  if (br.bit() == 1 && (c0 & p1) == 0)
                    buf(base + k) = if (c0 >= 0) c0 + p1 else c0 + m1
                }
                k += 1
              }
              eobrun -= 1
            }
          }
          unitsSinceRestart += 1
          bxx += 1
        }
        byy += 1
      }
    }
    // the next marker follows the (bit-padded) entropy segment
    var p = br.pos
    while (p + 1 < bytes.length &&
        !((bytes(p) & 0xff) == 0xff && (bytes(p + 1) & 0xff) != 0x00)) p += 1
    require(p + 1 < bytes.length, "progressive scan ran past EOF")
    p
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

  /** PROGRESSIVE twin of [[encodeGrayBlocks]] (round 9): the same
    * DC-only constant-block construction emitted as a genuine SOF2
    * stream with a four-scan Annex-G script — DC first at Al=1, a
    * whole-band AC first scan (pure EOB runs, since every AC is zero),
    * the DC refinement bit, and an AC refinement scan (again EOB runs).
    * Decodes EXACTLY like its baseline twin (DC-only + flat quantizer),
    * which is what lets the mm10 oracle recompute progressive-decoded
    * pixels in DuckDB. Exercises the decoder's successive-approximation
    * DC path and multi-block EOBRUN handling on real corpus data.
    */
  def encodeGrayBlocksProgressive(w: Int, h: Int,
      blockVal: (Int, Int) => Int): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0,
      s"block-constant encoder needs 8-aligned dims, got ${w}x$h")
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { b(v >> 8); b(v) }
    def marker(m: Int): Unit = { b(0xff); b(m) }

    marker(0xd8) // SOI
    marker(0xdb); u16(2 + 1 + 64); b(0x00) // DQT: 8-bit, id 0, flat
    (0 until 64).foreach(_ => b(1))
    marker(0xc2); u16(8 + 3); b(8); u16(h); u16(w); b(1) // SOF2, 1 comp
    b(1); b(0x11); b(0)
    // DHT: Annex K DC luma + an AC table carrying the EOBn symbols the
    // AC scans emit (n = 0..14, all 4-bit codes — 15 codes fit)
    val acBits = Array(0, 0, 0, 15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val acVals = Array.tabulate(15)(n => n << 4)
    marker(0xc4); u16(2 + (1 + 16 + StdDcVals.length) + (1 + 16 + acVals.length))
    b(0x00); StdDcBits.foreach(b); StdDcVals.foreach(b)
    b(0x10); acBits.foreach(b); acVals.foreach(b)

    val dcCode = new Array[(Int, Int)](12)
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
    val acCode = Array.tabulate(15)(n => (n, 4)) // EOBn → 4-bit code n

    var acc = 0
    var cnt = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00)
          acc = 0; cnt = 0
        }
        i -= 1
      }
    }
    def pad(): Unit = if (cnt > 0) putBits((1 << (8 - cnt)) - 1, 8 - cnt)
    def sos(ss: Int, se: Int, ah: Int, al: Int): Unit = {
      marker(0xda); u16(6 + 2); b(1); b(1); b(0x00)
      b(ss); b(se); b((ah << 4) | al)
    }
    val nBlocks = (w / 8) * (h / 8)
    def dcOf(bx: Int, by: Int): Int = {
      val v = blockVal(bx, by)
      require(v >= 0 && v <= 255, s"block value $v out of byte range")
      8 * (v - 128)
    }

    // scan 1: DC first, Al = 1 (diffs in the shifted domain)
    sos(0, 0, 0, 1)
    var pred = 0
    var by = 0
    while (by < h / 8) {
      var bx = 0
      while (bx < w / 8) {
        val v1 = dcOf(bx, by) >> 1
        val diff = v1 - pred
        pred = v1
        val cat = 32 - Integer.numberOfLeadingZeros(math.abs(diff))
        val (code, len) = dcCode(cat)
        putBits(code, len)
        if (cat > 0) putBits(if (diff < 0) diff + (1 << cat) - 1 else diff, cat)
        bx += 1
      }
      by += 1
    }
    pad()

    // scan 2: AC first, band 1..63 — every AC is zero, so the whole scan
    // is EOB runs (maximal EOBn chunks exercise the decoder's run skip);
    // one EOBn covers (1<<n) + extra blocks, extra < 2^n
    sos(1, 63, 0, 1)
    def emitEobRuns(blocks: Int): Unit = {
      var left = blocks
      while (left > 0) {
        var n = 14
        while ((1 << n) > left) n -= 1
        val extra = math.min(left - (1 << n), (1 << n) - 1)
        val (code, len) = acCode(n)
        putBits(code, len)
        if (n > 0) putBits(extra, n)
        left -= (1 << n) + extra
      }
    }
    emitEobRuns(nBlocks)
    pad()

    // scan 3: DC refinement, Ah=1 Al=0 — one bit per block
    sos(0, 0, 1, 0)
    by = 0
    while (by < h / 8) {
      var bx = 0
      while (bx < w / 8) { putBits(dcOf(bx, by) & 1, 1); bx += 1 }
      by += 1
    }
    pad()

    // scan 4: AC refinement, Ah=1 Al=0 — still all zero: pure EOB runs
    // (no correction bits: there is no nonzero AC history)
    sos(1, 63, 1, 0)
    emitEobRuns(nBlocks)
    pad()

    marker(0xd9)
    out.toByteArray
  }
}
