package graft.ops

/** Baseline TIFF 6.0 (public Adobe spec): both byte orders, 8-bit
  * grayscale and RGB, strip organization, Compression 1 (none), 32773
  * (PackBits, §9) and 5 (LZW, §13 — the SAME early-change variable-width
  * code stream as PDF's LZWDecode, ISO 32000-1 §7.4.4, so the decoder is
  * shared with [[graft.etl.PdfText]]), and Predictor 2 (horizontal
  * differencing, §14). The deterministic encoder drives the mm14 oracle
  * round trip; fixtures come from an INDEPENDENT python writer
  * (tools/make_tiff_fixture.py). Unsupported shapes refuse with typed
  * messages on the [[Multimodal.errKind]] vocabulary.
  */
object Tiff {

  final case class Header(w: Int, h: Int, channels: Int, compression: Int,
      bigEndian: Boolean, predictor: Int)

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  // ------------------------------------------------------------------
  // decode
  // ------------------------------------------------------------------

  /** Decode to (header, interleaved 8-bit samples, RGB order, top-down). */
  def decode(b: Array[Byte]): (Header, Array[Byte]) = {
    if (b.length < 8) fail("truncated TIFF: no header")
    val big =
      if (b(0) == 'I' && b(1) == 'I') false
      else if (b(0) == 'M' && b(1) == 'M') true
      else fail("not a TIFF: bad byte-order signature")
    def u16(o: Int): Int = {
      if (o + 2 > b.length) fail("truncated TIFF: u16 overruns file")
      if (big) ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
      else ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
    }
    def u32(o: Int): Long = {
      if (o + 4 > b.length) fail("truncated TIFF: u32 overruns file")
      if (big) ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
      else ((b(o + 3) & 0xffL) << 24) | ((b(o + 2) & 0xffL) << 16) |
        ((b(o + 1) & 0xffL) << 8) | (b(o) & 0xffL)
    }
    if (u16(2) != 42) fail("not a TIFF: magic != 42")
    val ifd = u32(4).toInt
    if (ifd < 8) fail("not a TIFF: IFD offset inside header")
    val n = u16(ifd)
    // tag -> (fieldType, count, offset of the 4-byte value field)
    val entries = (0 until n).map { i =>
      val e = ifd + 2 + 12 * i
      u16(e) -> ((u16(e + 2), u32(e + 4).toInt, e + 8))
    }.toMap
    def values(tag: Int): Option[IndexedSeq[Long]] = entries.get(tag).map {
      case (tpe, count, vf) =>
        val size = tpe match {
          case 1 => 1 // BYTE
          case 3 => 2 // SHORT
          case 4 => 4 // LONG
          case t => fail(s"unsupported TIFF field type $t for tag $tag")
        }
        val base = if (count * size <= 4) vf else u32(vf).toInt
        (0 until count).map { i =>
          size match {
            case 1 => (b(base + i) & 0xff).toLong
            case 2 => u16(base + 2 * i).toLong
            case 4 => u32(base + 4 * i)
          }
        }
    }
    def one(tag: Int): Option[Long] = values(tag).map(_.head)
    val w = one(256).getOrElse(fail("not a TIFF image: no ImageWidth")).toInt
    val h = one(257).getOrElse(fail("not a TIFF image: no ImageLength")).toInt
    if (w <= 0 || h <= 0) fail(s"malformed TIFF dims ${w}x$h")
    Multimodal.checkPixelBudget(w.toLong, h.toLong, "TIFF")
    val spp = one(277).getOrElse(1L).toInt
    if (spp != 1 && spp != 3) fail(s"unsupported TIFF SamplesPerPixel $spp")
    val bits = values(258).getOrElse(IndexedSeq.fill(spp)(1L))
    if (!bits.forall(_ == 8L)) fail(s"unsupported TIFF BitsPerSample ${bits.mkString(",")}")
    val comp = one(259).getOrElse(1L).toInt
    if (comp != 1 && comp != 5 && comp != 32773) fail(s"unsupported TIFF compression $comp")
    val photo = one(262).getOrElse(1L).toInt
    if (photo > 2) fail(s"unsupported TIFF photometric $photo")
    val pred = one(317).getOrElse(1L).toInt
    if (pred != 1 && pred != 2) fail(s"unsupported TIFF predictor $pred")
    val rps = one(278).getOrElse(h.toLong).toInt.min(h)
    val offs = values(273).getOrElse(fail("not a TIFF image: no StripOffsets"))
    val cnts = values(279).getOrElse(fail("truncated TIFF: no StripByteCounts"))
    val strips = (h + rps - 1) / rps
    if (offs.size != strips || cnts.size != strips)
      fail(s"malformed TIFF strip table: $strips strips, ${offs.size}/${cnts.size} entries")
    val out = new Array[Byte](w * h * spp)
    var pos = 0
    var s = 0
    while (s < strips) {
      val off = offs(s).toInt; val cnt = cnts(s).toInt
      if (off < 0 || cnt < 0 || off + cnt > b.length) fail("truncated TIFF strip")
      val raw = java.util.Arrays.copyOfRange(b, off, off + cnt)
      val dec = comp match {
        case 1 => raw
        case 5 => graft.etl.PdfText.lzwDecode(raw, 1)
        case 32773 => packbitsDecode(raw)
      }
      val rows = math.min(rps, h - s * rps)
      val need = rows * w * spp
      if (dec.length < need) fail("truncated TIFF strip data")
      System.arraycopy(dec, 0, out, pos, need)
      pos += need
      s += 1
    }
    if (pred == 2) { // horizontal differencing: per row, per channel
      var y = 0
      while (y < h) {
        val r0 = y * w * spp
        var i = spp
        while (i < w * spp) {
          out(r0 + i) = (out(r0 + i) + out(r0 + i - spp)).toByte
          i += 1
        }
        y += 1
      }
    }
    (Header(w, h, spp, comp, big, pred), out)
  }

  /** decodeSafe contract via [[Multimodal.errKind]]'s message vocabulary. */

  // ------------------------------------------------------------------
  // encode
  // ------------------------------------------------------------------

  /** Deterministic writer: 8-bit gray (channels=1) or RGB (3), chosen
    * compression/byte order/strip height, optional horizontal predictor.
    */
  def encode(w: Int, h: Int, channels: Int, px: Array[Byte], compression: Int = 1,
      bigEndian: Boolean = false, predictor: Int = 1, rowsPerStrip: Int = 0): Array[Byte] = {
    require(channels == 1 || channels == 3, s"channels $channels")
    require(px.length == w * h * channels, "raster size mismatch")
    require(Set(1, 5, 32773).contains(compression), s"compression $compression")
    val rps = if (rowsPerStrip <= 0) h else rowsPerStrip
    val data =
      if (predictor == 2) {
        val d = px.clone()
        var y = 0
        while (y < h) {
          val r0 = y * w * channels
          var i = w * channels - 1
          while (i >= channels) {
            d(r0 + i) = (px(r0 + i) - px(r0 + i - channels)).toByte
            i -= 1
          }
          y += 1
        }
        d
      } else px
    val strips = (h + rps - 1) / rps
    val stripBytes = (0 until strips).map { s =>
      val rows = math.min(rps, h - s * rps)
      val raw = java.util.Arrays.copyOfRange(data, s * rps * w * channels,
        s * rps * w * channels + rows * w * channels)
      compression match {
        case 1 => raw
        case 5 => lzwEncode(raw)
        case 32773 => packbitsEncode(raw)
      }
    }
    val out = new java.io.ByteArrayOutputStream(px.length + 256)
    def w16(v: Int): Unit =
      if (bigEndian) { out.write(v >>> 8); out.write(v & 0xff) }
      else { out.write(v & 0xff); out.write(v >>> 8) }
    def w32(v: Long): Unit =
      if (bigEndian) { out.write((v >>> 24).toInt); out.write((v >>> 16).toInt & 0xff)
        out.write((v >>> 8).toInt & 0xff); out.write(v.toInt & 0xff) }
      else { out.write(v.toInt & 0xff); out.write((v >>> 8).toInt & 0xff)
        out.write((v >>> 16).toInt & 0xff); out.write((v >>> 24).toInt) }
    // layout: header | strip data | [bits array] | [strip tables] | IFD
    out.write(if (bigEndian) 'M' else 'I'); out.write(if (bigEndian) 'M' else 'I')
    w16(42)
    val stripOffs = stripBytes.scanLeft(8L)(_ + _.length)
    val afterData = stripOffs.last
    val bitsArrOff = afterData
    val bitsExtra = if (channels == 3) 6 else 0
    val stripTablesOff = bitsArrOff + bitsExtra
    val tableExtra = if (strips > 1) strips * 8 else 0
    val ifdOff = stripTablesOff + tableExtra
    w32(ifdOff)
    stripBytes.foreach(out.write)
    if (channels == 3) { w16(8); w16(8); w16(8) }
    if (strips > 1) {
      stripOffs.dropRight(1).foreach(w32)
      stripBytes.foreach(sb => w32(sb.length.toLong))
    }
    val nTags = 9 + (if (predictor == 2) 1 else 0)
    w16(nTags)
    def tag(id: Int, tpe: Int, count: Int, inline: Long => Unit): Unit = {
      w16(id); w16(tpe); w32(count.toLong); inline(0L)
    }
    def inl16(v: Int): Long => Unit = _ => { w16(v); w16(0) }
    def inl32(v: Long): Long => Unit = _ => w32(v)
    tag(256, 4, 1, inl32(w.toLong))
    tag(257, 4, 1, inl32(h.toLong))
    if (channels == 3) tag(258, 3, 3, inl32(bitsArrOff)) else tag(258, 3, 1, inl16(8))
    tag(259, 3, 1, inl16(compression))
    tag(262, 3, 1, inl16(if (channels == 3) 2 else 1))
    if (strips > 1) tag(273, 4, strips, inl32(stripTablesOff))
    else tag(273, 4, 1, inl32(8L))
    tag(277, 3, 1, inl16(channels))
    tag(278, 4, 1, inl32(rps.toLong))
    if (strips > 1) tag(279, 4, strips, inl32(stripTablesOff + strips * 4))
    else tag(279, 4, 1, inl32(stripBytes.head.length.toLong))
    if (predictor == 2) tag(317, 3, 1, inl16(2))
    w32(0L) // next IFD
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // PackBits (TIFF §9)
  // ------------------------------------------------------------------

  private[ops] def packbitsDecode(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length * 2)
    var i = 0
    while (i < in.length) {
      val n = in(i); i += 1
      if (n >= 0) {
        if (i + n + 1 > in.length) fail("truncated TIFF PackBits literal")
        out.write(in, i, n + 1); i += n + 1
      } else if (n != -128) {
        if (i >= in.length) fail("truncated TIFF PackBits run")
        var k = 1 - n
        while (k > 0) { out.write(in(i)); k -= 1 }
        i += 1
      }
    }
    out.toByteArray
  }

  private[ops] def packbitsEncode(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length + 16)
    var i = 0
    while (i < in.length) {
      var run = 1
      while (i + run < in.length && in(i + run) == in(i) && run < 128) run += 1
      if (run >= 3) {
        out.write(1 - run); out.write(in(i)); i += run
      } else {
        var lit = i + run // extend literal until a ≥3 run or 128 bytes
        while (lit < in.length && lit - i < 128 &&
          !(lit + 2 < in.length && in(lit) == in(lit + 1) && in(lit) == in(lit + 2))) lit += 1
        val len = math.min(lit - i, 128)
        out.write(len - 1); out.write(in, i, len); i += len
      }
    }
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // LZW encode (TIFF §13 ≡ PDF LZWDecode inverse, EarlyChange=1)
  // ------------------------------------------------------------------

  private[ops] def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 16)
    var bitBuf = 0L; var bitCnt = 0
    var width = 9
    def emit(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code; bitCnt += width
      while (bitCnt >= 8) { out.write(((bitBuf >>> (bitCnt - 8)) & 0xff).toInt); bitCnt -= 8 }
    }
    val dict = new java.util.HashMap[Integer, Integer]()
    var next = 258
    emit(256) // leading CLEAR
    var prev = -1
    var i = 0
    while (i < data.length) {
      val c = data(i) & 0xff
      if (prev < 0) prev = c
      else {
        val key = (prev << 8) | c
        val e = dict.get(key)
        if (e != null) prev = e
        else {
          emit(prev)
          dict.put(key, next); next += 1
          // EarlyChange=1: the decoder's table lags one entry, so the
          // encoder bumps exactly when its next code hits 2^width
          // (the tools/make_pdf_fixture.py convention, fixture-proven)
          if (next >= (1 << width) && width < 12) width += 1
          prev = c
          // TIFF §13: emit ClearCode and reinitialize one entry BEFORE
          // the table saturates (EarlyChange makes code 4095 unusable),
          // so strict third-party decoders that expect a CLEAR before
          // overflow can consume graft-encoded strips (round-12 fix:
          // the encoder previously just stopped adding entries at 4096
          // and never cleared). `prev` is a raw literal here, so it
          // stays valid across the reset.
          if (next >= 4094) {
            emit(256)
            dict.clear(); next = 258; width = 9
          }
        }
      }
      i += 1
    }
    if (prev >= 0) emit(prev)
    emit(257) // EOD
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }
}
