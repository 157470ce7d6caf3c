package graft.ops

import java.util.zip.{CRC32, DataFormatException, Deflater, Inflater}

/** Pure-JDK PNG codec (RFC 2083 / ISO 15948) — no image libraries: chunk
  * walk with CRC32 validation, zlib inflate/deflate via `java.util.zip`
  * (the same Inflater already backing [[graft.etl.PdfText]]'s FlateDecode),
  * and exact per-row filter reconstruction for all five filter types
  * (None / Sub / Up / Average / Paeth).
  *
  * Scope — the still-image subset a training-data pipeline actually feeds:
  * bit depth 8, color types 0 (gray), 2 (RGB), 4 (gray+alpha) and
  * 6 (RGBA), interlace 0. Palette (type 3), 1/2/4/16-bit depths and Adam7
  * rejects with a typed error rather than decoding wrong pixels. The
  * encoder cycles the filter type per row (`row mod 5`), so a single
  * encode→decode round trip exercises every reconstruction branch — the
  * property the codec specs and the mm03 oracle lean on.
  */
object Png {

  val Signature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** IHDR fields of a decodable image plus derived channel count. */
  final case class Header(w: Int, h: Int, bitDepth: Int, colorType: Int) {
    def channels: Int = channelsOf(colorType)
  }

  def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1 // grayscale
    case 2 => 3 // RGB
    case 4 => 2 // gray + alpha
    case 6 => 4 // RGBA
    case other =>
      throw new IllegalArgumentException(
        s"unsupported PNG color type $other (0/2/4/6 only; no palette)")
  }

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def putBe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
    b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
  }

  private def crcOf(typ: Array[Byte], data: Array[Byte], len: Int): Int = {
    val c = new CRC32
    c.update(typ)
    c.update(data, 0, len)
    c.getValue.toInt
  }

  // ------------------------------------------------------------ decode --

  /** Decode to (header, raster): raster is `w*h*channels` bytes, rows
    * top-down, samples in storage order. Throws on malformed signatures,
    * truncated/CRC-corrupt chunks, unsupported shapes, and bad filter ids.
    */
  def decode(bytes: Array[Byte]): (Header, Array[Byte]) = {
    require(bytes.length >= Signature.length + 12 &&
      Signature.indices.forall(i => bytes(i) == Signature(i)),
      "not a PNG payload (bad signature)")
    var off = Signature.length
    var header: Header = null
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd) {
      require(off + 8 <= bytes.length, "truncated PNG (chunk header past EOF)")
      val len = be32(bytes, off)
      require(len >= 0 && off + 12 + len <= bytes.length,
        s"truncated PNG chunk at offset $off (len $len)")
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      val crc = be32(bytes, off + 8 + len)
      val c = new CRC32
      c.update(bytes, off + 4, 4 + len)
      require(c.getValue.toInt == crc, s"PNG chunk $typ CRC mismatch")
      typ match {
        case "IHDR" =>
          require(len == 13, s"bad IHDR length $len")
          val w = be32(bytes, off + 8)
          val h = be32(bytes, off + 12)
          val depth = bytes(off + 16) & 0xff
          val color = bytes(off + 17) & 0xff
          val interlace = bytes(off + 20) & 0xff
          require(w > 0 && h > 0, s"degenerate PNG dimensions ${w}x$h")
          require(depth == 8, s"unsupported PNG bit depth $depth (8 only)")
          require(interlace == 0, "unsupported PNG interlacing (Adam7)")
          header = Header(w, h, depth, color) // channelsOf rejects palette
          header.channels
        case "IDAT" =>
          require(header != null, "PNG IDAT before IHDR")
          idat.write(bytes, off + 8, len)
        case "IEND" => sawEnd = true
        case _ => // ancillary chunks (tEXt, pHYs, ...) skip; CRC checked above
      }
      off += 12 + len
    }
    require(header != null, "PNG missing IHDR")
    val raw = inflate(idat.toByteArray,
      (header.w.toLong * header.channels + 1) * header.h)
    unfilter(header, raw)
  }

  private def inflate(data: Array[Byte], expect: Long): Array[Byte] = {
    require(expect <= Int.MaxValue, "PNG raster too large for a byte array")
    val inf = new Inflater()
    inf.setInput(data)
    val out = new Array[Byte](expect.toInt)
    var n = 0
    try {
      while (n < out.length && !inf.finished()) {
        val k = inf.inflate(out, n, out.length - n)
        if (k == 0 && inf.needsInput())
          throw new IllegalArgumentException("PNG IDAT stream truncated")
        n += k
      }
    } catch {
      case e: DataFormatException =>
        throw new IllegalArgumentException(s"PNG IDAT not valid zlib: ${e.getMessage}")
    } finally inf.end()
    require(n == out.length,
      s"PNG IDAT inflated to $n bytes, expected ${out.length}")
    out
  }

  /** Reverse per-row filtering: scanline i is [filterByte][w*ch bytes]. */
  private def unfilter(hd: Header, raw: Array[Byte]): (Header, Array[Byte]) = {
    val bpp = hd.channels // bit depth 8: one byte per sample
    val stride = hd.w * bpp
    val out = new Array[Byte](stride * hd.h)
    var y = 0
    while (y < hd.h) {
      val rowIn = y * (stride + 1)
      val filter = raw(rowIn) & 0xff
      val o = y * stride
      val po = o - stride // prior row (y > 0)
      var i = 0
      while (i < stride) {
        val x = raw(rowIn + 1 + i) & 0xff
        val left = if (i >= bpp) out(o + i - bpp) & 0xff else 0
        val up = if (y > 0) out(po + i) & 0xff else 0
        val ul = if (y > 0 && i >= bpp) out(po + i - bpp) & 0xff else 0
        val rec = filter match {
          case 0 => x
          case 1 => x + left
          case 2 => x + up
          case 3 => x + ((left + up) >> 1)
          case 4 => x + paeth(left, up, ul)
          case f => throw new IllegalArgumentException(s"bad PNG filter type $f in row $y")
        }
        out(o + i) = rec.toByte
        i += 1
      }
      y += 1
    }
    (hd, out)
  }

  /** Paeth predictor (RFC 2083 §6.6) — exact integer arithmetic. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  // ------------------------------------------------------------ encode --

  /** Encode a top-down raster (`w*h*channelsOf(colorType)` bytes) as a
    * valid PNG. The filter type cycles `row mod 5`, so every decode filter
    * branch is exercised by any image of ≥5 rows; decode(encode(px)) == px
    * exactly.
    */
  def encode(w: Int, h: Int, colorType: Int, pixels: Array[Byte]): Array[Byte] = {
    val ch = channelsOf(colorType)
    require(w > 0 && h > 0, s"degenerate PNG dimensions ${w}x$h")
    require(pixels.length == w * h * ch,
      s"raster size ${pixels.length} != ${w}x${h}x$ch")
    val stride = w * ch
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      val filter = y % 5
      raw(y * (stride + 1)) = filter.toByte
      val o = y * stride
      val po = o - stride
      var i = 0
      while (i < stride) {
        val x = pixels(o + i) & 0xff
        val left = if (i >= ch) pixels(o + i - ch) & 0xff else 0
        val up = if (y > 0) pixels(po + i) & 0xff else 0
        val ul = if (y > 0 && i >= ch) pixels(po + i - ch) & 0xff else 0
        val enc = filter match {
          case 0 => x
          case 1 => x - left
          case 2 => x - up
          case 3 => x - ((left + up) >> 1)
          case 4 => x - paeth(left, up, ul)
        }
        raw(y * (stride + 1) + 1 + i) = enc.toByte
        i += 1
      }
      y += 1
    }
    val def_ = new Deflater(Deflater.DEFAULT_COMPRESSION)
    def_.setInput(raw)
    def_.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!def_.finished()) comp.write(buf, 0, def_.deflate(buf))
    def_.end()
    val idat = comp.toByteArray

    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val hdr = new Array[Byte](4)
      putBe32(hdr, 0, data.length)
      out.write(hdr)
      val t = typ.getBytes("US-ASCII")
      out.write(t)
      out.write(data)
      val c = new Array[Byte](4)
      putBe32(c, 0, crcOf(t, data, data.length))
      out.write(c)
    }
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, w); putBe32(ihdr, 4, h)
    ihdr(8) = 8 // bit depth
    ihdr(9) = colorType.toByte
    // compression 0, filter 0, interlace 0
    chunk("IHDR", ihdr)
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
