package graft.ops

/** REAL pure-JVM codec behind [[MediaDecoder]] for the containers decodable
  * without native libraries:
  *
  *  - `image/png` — full zlib-compressed decode via [[Png]] (JDK
  *    Inflater + the five filter reconstructions, CRC-validated chunks;
  *    bit depth 8, color types 0/2/4/6, no interlace). [[resize]]
  *    re-encodes a valid PNG of the same color type; [[frame]] returns
  *    one reconstructed pixel row in storage sample order.
  *  - `image/jpeg` — baseline sequential-DCT decode via [[Jpeg]] (markers,
  *    multi-slot DQT/DHT, restart intervals, Huffman entropy decode,
  *    deterministic integer IDCT, 4:2:0/4:2:2 nearest upsample, JFIF
  *    fixed-point YCbCr→RGB; progressive/arithmetic/12-bit refused).
  *    DECODE-ONLY: [[frame]] returns a decoded row, [[resize]] throws —
  *    resample post-decode into a lossless container instead.
  *  - `image/bmp` — Windows BITMAPINFOHEADER, 8-bpp palette / 24 / 32
  *    bits per pixel (round 9 widened; alpha dropped, palette resolved
  *    to BGR; resize re-emits 24-bpp), BI_RGB,
  *    BI_RGB (uncompressed): header fields parsed little-endian from the
  *    raw bytes, pixel rows read bottom-up with 4-byte row padding,
  *    [[resize]] is a true nearest-neighbor resample that re-emits a
  *    valid 24-bpp BMP, and [[frame]] returns one pixel row (top-based)
  *    as packed BGR.
  *  - `image/x-portable-pixmap` / `image/x-portable-graymap` — binary
  *    PNM (P6 PPM / P5 PGM, maxval <= 255): ASCII header (with `#`
  *    comments) + raw top-down samples; [[frame]] returns one pixel row
  *    (RGB or gray), [[resize]] re-emits a valid PNM of the same magic.
  *  - `image/gif` — GIF87a/89a via [[Gif]] (variable-width LZW with
  *    dictionary growth and the KwKwK case, global/local color tables,
  *    4-pass interlace, and — round 9 — the full ANIMATION walk:
  *    `n_frames` is the real frame count from an LZW-free metadata scan,
  *    [[frame]] returns the idx-th animation frame's RGB raster so
  *    `Multimodal.sampleFrames` samples evenly across the animation).
  *    Features pool the first frame; [[resize]] is exact in palette
  *    space on the first frame: nearest-neighbor on the INDEX raster
  *    re-encoded against the original color table, so no
  *    re-quantization ever happens.
  *  - `audio/wav` (and `audio/x-wav`) — RIFF/WAVE via [[Wav]] (the one
  *    WAV parser in the repo since round 12): integer PCM at 8/16/24/32
  *    bits AND IEEE float32 (format 3) — round 9 widened the depths the
  *    pro-audio corpus tail carries; [[frame]] returns one sample frame
  *    (all channels at one instant). Full integer sample decode and the
  *    oracle-exact feature math live in [[Wav]] (mm15).
  *  - `audio/mpeg` — MP3 metadata via the [[Mp3]] frame walker (real
  *    sync/bitrate/sample-rate header parse per ISO/IEC 11172-3, ID3v2
  *    skip, ID3v1 trailer, CBR/VBR): exact duration and shape WITHOUT
  *    sample decode, which is how corpus scans handle compressed audio
  *    at scale. [[frame]] returns one coded frame (header + payload);
  *    `features` are coded-byte fingerprints, not PCM (Layer III
  *    synthesis is documented out of scope in [[Mp3]]).
  *
  * Anything else throws, mirroring the reference's unsupported-type guard
  * (`/root/reference/backend/etl_pipeline.py` raises on extensions it has
  * no parser for). [[StubDecoder]] remains the DEFAULT decoder for the
  * oracle-checked mm01/mm02 queries — this class is the proof that the
  * [[MediaDecoder]] plug point carries real codecs end to end with no
  * change to the Spark-side plumbing.
  *
  * `Decoded` mapping for audio: `width` = sample rate (Hz), `height` =
  * channel count, `n_frames` = PCM sample frames — the natural "shape"
  * triple of an audio payload.
  */
object BinaryMediaDecoder extends MediaDecoder {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  // ---------------------------------------------------------------- BMP --
  /** parsed BI_RGB BMP: 8-bpp palette (round 9), 24-bpp, or 32-bpp;
    * `palette` is BGR triples for the 8-bit form, null otherwise.
    */
  private final case class BmpHeader(
      w: Int, h: Int, topDown: Boolean, dataOff: Int, stride: Int,
      bpp: Int, palette: Array[Byte])

  private def parseBmp(bytes: Array[Byte]): BmpHeader = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP payload (missing BM magic)")
    val dataOff = le32(bytes, 10)
    val headerSize = le32(bytes, 14)
    val w = le32(bytes, 18)
    val hRaw = le32(bytes, 22)
    val bpp = le16(bytes, 28)
    val compression = le32(bytes, 30)
    require(bpp == 8 || bpp == 24 || bpp == 32,
      s"unsupported BMP bit depth $bpp (8/24/32-bpp only)")
    require(compression == 0, s"unsupported BMP compression $compression (BI_RGB only)")
    require(w > 0 && hRaw != 0, s"degenerate BMP dimensions ${w}x$hRaw")
    val h = math.abs(hRaw)
    val stride = (w * (bpp / 8) + 3) & ~3 // rows pad to 4-byte boundaries
    require(bytes.length >= dataOff.toLong + stride.toLong * h,
      s"truncated BMP pixel data (${bytes.length} bytes, need ${dataOff + stride * h})")
    val palette =
      if (bpp != 8) null
      else {
        // color table of BGRA quads right after the info header
        require(headerSize >= 40, s"BMP header size $headerSize too small")
        val declared = le32(bytes, 46)
        val n = if (declared == 0) 256 else declared
        require(n > 0 && n <= 256, s"bad BMP color table size $n")
        val tableOff = 14 + headerSize
        require(bytes.length >= tableOff + 4 * n, "truncated BMP color table")
        val p = new Array[Byte](n * 3)
        var i = 0
        while (i < n) {
          p(i * 3) = bytes(tableOff + i * 4) // B
          p(i * 3 + 1) = bytes(tableOff + i * 4 + 1) // G
          p(i * 3 + 2) = bytes(tableOff + i * 4 + 2) // R (alpha dropped)
          i += 1
        }
        p
      }
    BmpHeader(w, h, hRaw < 0, dataOff, stride, bpp, palette)
  }

  /** byte offset of pixel (x, y) with y TOP-based regardless of storage order */
  private def pixelOff(hd: BmpHeader, x: Int, y: Int): Int = {
    val storedRow = if (hd.topDown) y else hd.h - 1 - y
    hd.dataOff + storedRow * hd.stride + x * (hd.bpp / 8)
  }

  /** packed 0xBBGGRR of pixel (x, y): palette lookup for 8-bpp, direct
    * bytes for 24/32-bpp (alpha ignored)
    */
  private def bmpBgr(hd: BmpHeader, bytes: Array[Byte], x: Int, y: Int): Int = {
    val o = pixelOff(hd, x, y)
    if (hd.bpp == 8) {
      val idx = bytes(o) & 0xff
      require(idx * 3 < hd.palette.length,
        s"BMP palette index $idx outside ${hd.palette.length / 3}-color table")
      (hd.palette(idx * 3) & 0xff) | ((hd.palette(idx * 3 + 1) & 0xff) << 8) |
        ((hd.palette(idx * 3 + 2) & 0xff) << 16)
    } else
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) | ((bytes(o + 2) & 0xff) << 16)
  }

  /** re-emit a minimal valid 24-bpp bottom-up BMP from packed top-down BGR rows */
  private def writeBmp(w: Int, h: Int, bgr: Array[Byte]): Array[Byte] = {
    val stride = (w * 3 + 3) & ~3
    val out = new Array[Byte](54 + stride * h)
    def putLe32(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
      out(i + 2) = ((v >> 16) & 0xff).toByte; out(i + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putLe32(2, out.length); putLe32(10, 54)
    putLe32(14, 40) // BITMAPINFOHEADER
    putLe32(18, w); putLe32(22, h)
    out(26) = 1 // planes
    out(28) = 24 // bpp
    putLe32(34, stride * h)
    var y = 0
    while (y < h) {
      System.arraycopy(bgr, y * w * 3, out, 54 + (h - 1 - y) * stride, w * 3)
      y += 1
    }
    out
  }

  // ------------------------------------------------------------- PNM ----
  /** (dataOff, width, height, maxval, channels) for binary P5/P6. */
  private final case class PnmHeader(dataOff: Int, w: Int, h: Int, maxval: Int, ch: Int)

  private def parsePnm(bytes: Array[Byte]): PnmHeader = {
    require(bytes.length >= 2 && bytes(0) == 'P' &&
      (bytes(1) == '5' || bytes(1) == '6'), "not a binary PNM (P5/P6 magic)")
    val ch = if (bytes(1) == '6') 3 else 1
    var i = 2
    def nextInt(): Int = {
      // skip whitespace and '#' comments (to end of line), then read digits
      var seeking = true
      while (seeking && i < bytes.length) {
        val c = (bytes(i) & 0xff).toChar
        if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else if (c.isWhitespace) i += 1
        else seeking = false
      }
      require(i < bytes.length && (bytes(i) & 0xff) >= '0' && (bytes(i) & 0xff) <= '9',
        "malformed PNM header")
      var v = 0
      while (i < bytes.length && (bytes(i) & 0xff) >= '0' && (bytes(i) & 0xff) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val mx = nextInt()
    require(mx > 0 && mx <= 255, s"PNM maxval $mx unsupported (1-byte samples only)")
    i += 1 // exactly ONE whitespace byte separates the header from the raster
    require(bytes.length - i >= w.toLong * h * ch, "PNM raster truncated")
    PnmHeader(i, w, h, mx, ch)
  }

  private def writePnm(magicColor: Boolean, w: Int, h: Int, maxval: Int,
      raster: Array[Byte]): Array[Byte] = {
    val head = s"P${if (magicColor) 6 else 5}\n$w $h\n$maxval\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](head.length + raster.length)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(raster, 0, out, head.length, raster.length)
    out
  }

  // ------------------------------------------------------------- PNG ----
  /** 8-dim feature vector over a decoded PNG raster — same shape and luma
    * convention as the BMP/PNM branches; gray maps to all three channels
    * and alpha (color types 4/6) is ignored for the means, as the
    * reference-side feature extractors convert to RGB before pooling.
    */
  private def pngFeatures(hd: Png.Header, px: Array[Byte]): Array[Float] =
    rasterFeaturesRgb(hd.w, hd.h, hd.channels, px)

  /** Shared 8-dim pooling over an interleaved RGB-ordered raster (gray and
    * gray+alpha map the single gray sample to all three channels) — the
    * same shape and luma convention as the BMP/PNM branches.
    */
  private def rasterFeaturesRgb(w: Int, h: Int, ch: Int, px: Array[Byte]): Array[Float] = {
    var (sb, sg, sr) = (0L, 0L, 0L)
    var minL = 255.0; var maxL = 0.0
    var p = 0
    while (p < px.length) {
      val (rr, gg, bb) = ch match {
        case 1 | 2 => val g = px(p) & 0xff; (g, g, g)
        case _ => (px(p) & 0xff, px(p + 1) & 0xff, px(p + 2) & 0xff)
      }
      sr += rr; sg += gg; sb += bb
      val l = 0.299 * rr + 0.587 * gg + 0.114 * bb
      if (l < minL) minL = l
      if (l > maxL) maxL = l
      p += ch
    }
    val n = w.toLong * h
    Array(
      sb.toDouble / n / 255.0, sg.toDouble / n / 255.0, sr.toDouble / n / 255.0,
      (0.299 * sr + 0.587 * sg + 0.114 * sb) / n / 255.0,
      w.toDouble / (w + h), h.toDouble / (w + h),
      minL / 255.0, maxL / 255.0).map(_.toFloat)
  }

  /** Decoded full raster (top-down, storage sample order) — the one-shot
    * accessor pipeline audits use so a whole-image checksum costs ONE
    * inflate, not one per row via [[frame]].
    */
  def pngRaster(b: Multimodal.Blob): (Png.Header, Array[Byte]) = {
    require(b.mime == "image/png", s"pngRaster on mime ${b.mime}")
    Png.decode(b.content)
  }

  // ------------------------------------------------------- MediaDecoder --
  def decode(b: Multimodal.Blob): Multimodal.Decoded = b.mime match {
    case "image/png" =>
      val (hd, px) = Png.decode(b.content)
      Multimodal.Decoded(b.blob_id, b.mime, hd.w, hd.h, 1, pngFeatures(hd, px))
    case "image/jpeg" =>
      val (hd, px) = Jpeg.decode(b.content)
      Multimodal.Decoded(b.blob_id, b.mime, hd.w, hd.h, 1,
        rasterFeaturesRgb(hd.w, hd.h, hd.channels, px))
    case "image/tiff" =>
      // baseline TIFF (round 11, graft.ops.Tiff): none/PackBits/LZW
      // strips, both byte orders, horizontal predictor
      val (hd, px) = Tiff.decode(b.content)
      Multimodal.Decoded(b.blob_id, b.mime, hd.w, hd.h, 1,
        rasterFeaturesRgb(hd.w, hd.h, hd.channels, px))
    case "image/webp" =>
      // full VP8L lossless decode (RGBA) AND full lossy VP8 keyframe
      // decode (round 11, graft.ops.Vp8); inter-frame VP8 refuses with a
      // typed "unsupported" message → decodeSafe row
      val (hd, px) = Webp.decode(b.content)
      Multimodal.Decoded(b.blob_id, b.mime, hd.w, hd.h, 1,
        rasterFeaturesRgb(hd.w, hd.h, 4, px))
    case "image/gif" =>
      val (hd, px) = Gif.decode(b.content)
      // n_frames is the REAL animation frame count (LZW-free metadata
      // walk); features pool the first frame, the thumbnail convention
      val (nFrames, _) = Gif.frameMeta(b.content)
      Multimodal.Decoded(b.blob_id, b.mime, hd.w, hd.h, nFrames,
        rasterFeaturesRgb(hd.w, hd.h, 3, px))
    case "image/bmp" =>
      val hd = parseBmp(b.content)
      // features from REAL pixels: mean B/G/R, mean luma, the two aspect
      // fractions, min/max luma — all in [0,1]
      var (sb, sg, sr) = (0L, 0L, 0L)
      var minL = 255.0; var maxL = 0.0
      var y = 0
      while (y < hd.h) {
        var x = 0
        while (x < hd.w) {
          val p = bmpBgr(hd, b.content, x, y)
          val bb = p & 0xff; val gg = (p >> 8) & 0xff; val rr = (p >> 16) & 0xff
          sb += bb; sg += gg; sr += rr
          val l = 0.299 * rr + 0.587 * gg + 0.114 * bb
          if (l < minL) minL = l
          if (l > maxL) maxL = l
          x += 1
        }
        y += 1
      }
      val n = hd.w.toLong * hd.h
      val feats = Array(
        sb.toDouble / n / 255.0, sg.toDouble / n / 255.0, sr.toDouble / n / 255.0,
        (0.299 * sr + 0.587 * sg + 0.114 * sb) / n / 255.0,
        hd.w.toDouble / (hd.w + hd.h), hd.h.toDouble / (hd.w + hd.h),
        minL / 255.0, maxL / 255.0).map(_.toFloat)
      Multimodal.Decoded(b.blob_id, b.mime, hd.w, hd.h, 1, feats)
    case "image/x-portable-pixmap" | "image/x-portable-graymap" =>
      val hd = parsePnm(b.content)
      // same 8-dim feature shape as BMP: mean B/G/R (gray maps to all
      // three), mean luma, aspect fractions, min/max luma — all in [0,1],
      // normalized by the header's maxval (PNM samples span 0..maxval,
      // which parsePnm allows anywhere in 1..255 — a full-white pixel must
      // yield luma 1.0 regardless of bit budget)
      val mx = hd.maxval.toDouble
      var (sb, sg, sr) = (0L, 0L, 0L)
      var minL = mx; var maxL = 0.0
      var p = hd.dataOff
      val end = hd.dataOff + hd.w * hd.h * hd.ch
      while (p < end) {
        val (rr, gg, bb) =
          if (hd.ch == 3) (u8(b.content, p), u8(b.content, p + 1), u8(b.content, p + 2))
          else { val g = u8(b.content, p); (g, g, g) }
        sr += rr; sg += gg; sb += bb
        val l = 0.299 * rr + 0.587 * gg + 0.114 * bb
        if (l < minL) minL = l
        if (l > maxL) maxL = l
        p += hd.ch
      }
      val n = hd.w.toLong * hd.h
      val feats = Array(
        sb.toDouble / n / mx, sg.toDouble / n / mx, sr.toDouble / n / mx,
        (0.299 * sr + 0.587 * sg + 0.114 * sb) / n / mx,
        hd.w.toDouble / (hd.w + hd.h), hd.h.toDouble / (hd.w + hd.h),
        minL / mx, maxL / mx).map(_.toFloat)
      Multimodal.Decoded(b.blob_id, b.mime, hd.w, hd.h, 1, feats)
    case "audio/wav" | "audio/x-wav" =>
      // round 12: header walk delegates to the one WAV parser in the repo
      // (graft.ops.Wav); this branch keeps only the normalized 8-point
      // feature sampler (which also reads IEEE-float payloads that
      // Wav.decode's integer-exact API refuses)
      val hd = Wav.parse(b.content)
      val frameBytes = hd.frameBytes
      val nFrames = hd.nSamples
      // features: 8 evenly spaced normalized samples of channel 0
      val feats = Array.tabulate(8) { i =>
        if (nFrames == 0) 0.0f
        else {
          val fr = i.toLong * (nFrames - 1) / math.max(1, 7)
          val o = hd.dataOff + fr.toInt * frameBytes
          if (hd.isFloat)
            java.lang.Float.intBitsToFloat(le32(b.content, o))
          else hd.bitsPerSample match {
            case 16 => (le16(b.content, o).toShort / 32768.0).toFloat
            case 8 => ((u8(b.content, o) - 128) / 128.0).toFloat
            case 24 => // sign-extended little-endian, normalized by 2^23
              val v = (u8(b.content, o) | (u8(b.content, o + 1) << 8) |
                (b.content(o + 2).toInt << 16))
              (v / 8388608.0).toFloat
            case _ => (le32(b.content, o) / 2147483648.0).toFloat
          }
        }
      }
      Multimodal.Decoded(b.blob_id, b.mime, hd.sampleRate, hd.channels, nFrames, feats)
    case "audio/mpeg" =>
      val info = Mp3.parse(b.content)
      // features: 8 evenly spaced coded bytes of the audio region,
      // normalized — a deterministic content fingerprint (the WAV branch
      // samples PCM; MP3 sample decode is out of scope, see [[Mp3]])
      val a0 = info.id3v2Bytes
      val aLen = info.totalFrameBytes.toInt
      val feats = Array.tabulate(8) { i =>
        val o = a0 + (i.toLong * (aLen - 1) / math.max(1, 7)).toInt
        (u8(b.content, o) / 255.0).toFloat
      }
      // the natural shape triple, mirroring WAV: width = sample rate,
      // height = channels, n_frames = PCM samples (exact duration =
      // n_frames / width seconds)
      Multimodal.Decoded(b.blob_id, b.mime, info.sampleRate, info.channels,
        info.totalSamples.toInt, feats)
    case "audio/aac" =>
      // ADTS frame walk (round 17, [[Adts]]): the MP3 contract applied
      // to raw AAC — shape without payload decode. width = sample rate,
      // height = channels, n_frames = AAC samples (1024 per raw block).
      val m = Adts.parse(b.content)
      val feats = Array.tabulate(8) { i =>
        val o = (i.toLong * (b.content.length - 1) / math.max(1, 7)).toInt
        (u8(b.content, o) / 255.0).toFloat
      }
      Multimodal.Decoded(b.blob_id, b.mime, m.sampleRate, m.channels,
        m.nSamples.toInt, feats)
    case "video/mp4" | "video/quicktime" | "image/avif" | "image/heic" |
        "image/heif" =>
      // ISOBMFF box walk (round 15, [[Isobmff]]): shape without sample
      // decode, the MP3 contract applied to video/modern-image containers.
      // width/height = first video track's (or the HEIF item's) dims;
      // n_frames = track count for timed media, 1 for a still.
      val m = Isobmff.parse(b.content)
      val (wd, ht) =
        m.tracks.find(_.handler == "vide").map(t => (t.width, t.height))
          .getOrElse((m.itemWidth, m.itemHeight))
      val nf = if (m.tracks.nonEmpty) m.tracks.length else 1
      // features: brand + per-track codec fingerprint, deterministic
      val names = (m.majorBrand +: m.tracks.map(_.codec)) :+ m.itemCodec
      val feats = Array.tabulate(8) { i =>
        val s = names(i % names.length)
        if (s.isEmpty) 0.0f
        else (s.charAt(i % s.length) / 255.0).toFloat
      }
      Multimodal.Decoded(b.blob_id, b.mime, wd, ht, nf, feats)
    case other =>
      throw new IllegalArgumentException(s"unsupported media type: $other")
  }

  /** Parsed ISOBMFF metadata — the one-shot accessor pipeline audits use,
    * sibling of [[pngRaster]]/[[mp3Info]].
    */
  def isobmffMeta(b: Multimodal.Blob): Isobmff.Meta = {
    require(b.mime.startsWith("video/") || b.mime == "image/avif" ||
      b.mime == "image/heic" || b.mime == "image/heif",
      s"isobmffMeta on mime ${b.mime}")
    Isobmff.parse(b.content)
  }

  /** Parsed Ogg stream metadata (Opus/Vorbis identification headers) —
    * the one-shot accessor pipeline audits use, sibling of
    * [[isobmffMeta]]/[[mp3Info]]; packet/DSP decode is out of contract.
    */
  def oggMeta(b: Multimodal.Blob): Ogg.OggMeta = {
    require(b.mime == "audio/ogg" || b.mime == "application/ogg" ||
      b.mime == "video/ogg", s"oggMeta on mime ${b.mime}")
    Ogg.parse(b.content)
  }

  /** Parsed Matroska/WebM metadata (EBML walk) — the one-shot accessor
    * pipeline audits use, sibling of [[isobmffMeta]]; frame decode is
    * out of contract.
    */
  def mkvMeta(b: Multimodal.Blob): Matroska.Meta = {
    require(b.mime == "video/webm" || b.mime == "audio/webm" ||
      b.mime == "video/x-matroska" || b.mime == "audio/x-matroska",
      s"mkvMeta on mime ${b.mime}")
    Matroska.parse(b.content)
  }

  /** Decoded full RGB raster — the one-shot accessor pipeline audits use,
    * sibling of [[pngRaster]]/[[jpegRaster]].
    */
  def gifRaster(b: Multimodal.Blob): (Gif.Header, Array[Byte]) = {
    require(b.mime == "image/gif", s"gifRaster on mime ${b.mime}")
    Gif.decode(b.content)
  }

  /** Parsed MP3 stream info — the one-shot accessor pipeline audits use,
    * sibling of [[pngRaster]]/[[jpegRaster]].
    */
  def mp3Info(b: Multimodal.Blob): Mp3.Info = {
    require(b.mime == "audio/mpeg", s"mp3Info on mime ${b.mime}")
    Mp3.parse(b.content)
  }

  def frame(b: Multimodal.Blob, idx: Int): Array[Byte] = b.mime match {
    case "image/png" =>
      val (hd, px) = Png.decode(b.content)
      require(idx >= 0 && idx < hd.h, s"row $idx out of range 0..${hd.h - 1}")
      val row = new Array[Byte](hd.w * hd.channels)
      System.arraycopy(px, idx * row.length, row, 0, row.length)
      row
    case "image/jpeg" =>
      val (hd, px) = Jpeg.decode(b.content)
      require(idx >= 0 && idx < hd.h, s"row $idx out of range 0..${hd.h - 1}")
      val row = new Array[Byte](hd.w * hd.channels)
      System.arraycopy(px, idx * row.length, row, 0, row.length)
      row
    case "image/webp" =>
      val (hd, px) = Webp.decode(b.content)
      require(idx >= 0 && idx < hd.h, s"row $idx out of range 0..${hd.h - 1}")
      val row = new Array[Byte](hd.w * 4)
      System.arraycopy(px, idx * row.length, row, 0, row.length)
      row
    case "image/bmp" =>
      val hd = parseBmp(b.content)
      require(idx >= 0 && idx < hd.h, s"row $idx out of range 0..${hd.h - 1}")
      val row = new Array[Byte](hd.w * 3)
      var x = 0
      while (x < hd.w) {
        val p = bmpBgr(hd, b.content, x, idx)
        row(x * 3) = (p & 0xff).toByte
        row(x * 3 + 1) = ((p >> 8) & 0xff).toByte
        row(x * 3 + 2) = ((p >> 16) & 0xff).toByte
        x += 1
      }
      row
    case "image/gif" =>
      // GIF is the ANIMATED format here: frame(idx) returns the idx-th
      // animation frame's RGB raster (its own rect, as transmitted), so
      // Multimodal.sampleFrames samples evenly across the animation —
      // round 9 (still-image formats keep their per-ROW frame contract).
      // Earlier frames skip by sub-block framing, so sampling stays
      // O(blocks) + one LZW decode per sampled frame.
      Gif.decodeFrame(b.content, idx).rgb
    case "image/x-portable-pixmap" | "image/x-portable-graymap" =>
      val hd = parsePnm(b.content)
      require(idx >= 0 && idx < hd.h, s"row $idx out of range 0..${hd.h - 1}")
      val row = new Array[Byte](hd.w * hd.ch)
      System.arraycopy(b.content, hd.dataOff + idx * hd.w * hd.ch, row, 0, row.length)
      row
    case "audio/wav" | "audio/x-wav" =>
      val hd = Wav.parse(b.content)
      val fb = hd.frameBytes
      require(idx >= 0 && (idx + 1) * fb <= hd.dataLen, s"sample frame $idx out of range")
      val out = new Array[Byte](fb)
      System.arraycopy(b.content, hd.dataOff + idx * fb, out, 0, fb)
      out
    case "audio/mpeg" =>
      // decode() reports n_frames in PCM SAMPLES (the duration unit, the
      // WAV convention), so a frame index here is a sample instant; return
      // the CODED frame containing it — what sampleFrames' evenly spaced
      // instants want, since a lone PCM sample has no coded representation
      val info = Mp3.parse(b.content)
      require(idx >= 0 && idx < info.totalSamples,
        s"sample $idx out of range 0..${info.totalSamples - 1}")
      val f = info.frames(idx / info.frames.head.samples)
      val out = new Array[Byte](f.frameBytes)
      System.arraycopy(b.content, f.offset, out, 0, f.frameBytes)
      out
    case other =>
      throw new IllegalArgumentException(s"unsupported media type: $other")
  }

  def resize(b: Multimodal.Blob, w: Int, h: Int): Array[Byte] = b.mime match {
    case "image/png" =>
      require(w > 0 && h > 0, s"degenerate target ${w}x$h")
      val (hd, px) = Png.decode(b.content)
      val ch = hd.channels
      // nearest-neighbor with the same exact integer mapping as BMP/PNM,
      // re-encoded as a valid PNG of the SAME color type
      val out = new Array[Byte](w * h * ch)
      var y = 0
      while (y < h) {
        val sy = (y.toLong * hd.h / h).toInt
        var x = 0
        while (x < w) {
          val so = (sy * hd.w + (x.toLong * hd.w / w).toInt) * ch
          val dO = (y * w + x) * ch
          var c = 0
          while (c < ch) { out(dO + c) = px(so + c); c += 1 }
          x += 1
        }
        y += 1
      }
      Png.encode(w, h, hd.colorType, out)
    case "image/bmp" =>
      require(w > 0 && h > 0, s"degenerate target ${w}x$h")
      val hd = parseBmp(b.content)
      // nearest-neighbor: source index = floor(dst · src / dstSize), the
      // standard integer mapping (exact, no float rounding ambiguity)
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        val sy = (y.toLong * hd.h / h).toInt
        var x = 0
        while (x < w) {
          val sx = (x.toLong * hd.w / w).toInt
          val p = bmpBgr(hd, b.content, sx, sy)
          val dO = (y * w + x) * 3
          out(dO) = (p & 0xff).toByte
          out(dO + 1) = ((p >> 8) & 0xff).toByte
          out(dO + 2) = ((p >> 16) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      writeBmp(w, h, out)
    case "image/x-portable-pixmap" | "image/x-portable-graymap" =>
      require(w > 0 && h > 0, s"degenerate target ${w}x$h")
      val hd = parsePnm(b.content)
      // nearest-neighbor with the same exact integer mapping as BMP
      val out = new Array[Byte](w * h * hd.ch)
      var y = 0
      while (y < h) {
        val sy = (y.toLong * hd.h / h).toInt
        var x = 0
        while (x < w) {
          val sx = (x.toLong * hd.w / w).toInt
          val so = hd.dataOff + (sy * hd.w + sx) * hd.ch
          val dO = (y * w + x) * hd.ch
          var c = 0
          while (c < hd.ch) { out(dO + c) = b.content(so + c); c += 1 }
          x += 1
        }
        y += 1
      }
      writePnm(hd.ch == 3, w, h, hd.maxval, out)
    case "image/gif" =>
      require(w > 0 && h > 0, s"degenerate target ${w}x$h")
      val (hd, palette, idxRaster) = Gif.decodeIndexed(b.content)
      // EXACT resize in palette space: nearest-neighbor over the INDEX
      // raster (same integer mapping as BMP/PNG/PNM), re-encoded against
      // the ORIGINAL color table — no re-quantization, every output color
      // existed in the input. Sub-4-color tables pad with black to the
      // encoder's 4-entry minimum (indices are untouched, so pixels are).
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        val sy = (y.toLong * hd.h / h).toInt
        var x = 0
        while (x < w) {
          out(y * w + x) = idxRaster(sy * hd.w + (x.toLong * hd.w / w).toInt)
          x += 1
        }
        y += 1
      }
      val pal = if (palette.length >= 12) palette else palette.padTo(12, 0.toByte)
      Gif.encode(w, h, pal, out)
    case "image/webp" =>
      // nearest-neighbor resample of the decoded RGBA raster re-encoded
      // through encodeLossless — exact for VP8L input, and for lossy VP8
      // keyframes (decodable since round 11, libwebp-bit-exact since
      // round 12) this is the thumbnail-into-a-lossless-container path
      // the JPEG branch below documents: decode once, never re-lossy
      val (hd, px) = Webp.decode(b.content)
      val out = new Array[Byte](w * h * 4)
      var y = 0
      while (y < h) {
        val sy = y * hd.h / h
        var x = 0
        while (x < w) {
          val sx = x * hd.w / w
          System.arraycopy(px, (sy * hd.w + sx) * 4, out, (y * w + x) * 4, 4)
          x += 1
        }
        y += 1
      }
      Webp.encodeLossless(w, h, out)
    case "image/jpeg" =>
      // JPEG is DECODE-ONLY here: a faithful lossy re-encode needs the
      // forward DCT + rate decisions of a full encoder, and silently
      // re-compressing would degrade pixels a second time. Pipelines
      // resize post-decode into a lossless container (the PNG/BMP/PNM
      // paths above) — same division of labor as production image
      // pipelines (decode once, transform in raw space).
      throw new IllegalArgumentException(
        "resize unsupported for image/jpeg (decode-only codec; resize the decoded raster via a lossless container)")
    case other =>
      // audio has no 2-D resize; unsupported mimes mirror the decode guard
      throw new IllegalArgumentException(s"resize unsupported for media type: $other")
  }

  /** Decoded full raster (interleaved RGB or gray) — the one-shot accessor
    * pipeline audits use, sibling of [[pngRaster]].
    */
  def jpegRaster(b: Multimodal.Blob): (Jpeg.Header, Array[Byte]) = {
    require(b.mime == "image/jpeg", s"jpegRaster on mime ${b.mime}")
    Jpeg.decode(b.content)
  }

  /** Decoded full RGBA raster — sibling of [[pngRaster]]/[[jpegRaster]]. */
  def webpRaster(b: Multimodal.Blob): (Webp.Header, Array[Byte]) = {
    require(b.mime == "image/webp", s"webpRaster on mime ${b.mime}")
    Webp.decode(b.content)
  }
}
