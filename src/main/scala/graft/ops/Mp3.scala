package graft.ops

/** Pure-JVM MPEG audio (MP3) frame walker — the metadata scan a 100 TB
  * audio-curation pipeline actually runs. Production corpus tooling does
  * NOT decode samples to learn duration/bitrate/sample-rate/channel shape;
  * it walks frame headers, which is exact and ~1000× cheaper than a full
  * Layer III synthesis. This object implements that walk from the public
  * ISO/IEC 11172-3 §2.4.1.3 / ISO/IEC 13818-3 header layout (the bitrate
  * and sample-rate index tables below are verbatim from the standard),
  * like its siblings [[Png]] / [[Jpeg]] implement their public formats.
  *
  * Scope:
  *  - PARSE: MPEG-1 / MPEG-2 / MPEG-2.5, Layers I/II/III, CBR and VBR,
  *    optional leading ID3v2 tag (syncsafe size, optional footer) and
  *    trailing 128-byte ID3v1 tag. Frames must be strictly adjacent —
  *    this walker is a validator, not a salvage resync scanner; a byte of
  *    garbage between frames throws, mirroring the reference's
  *    unsupported-type guard (`/root/reference/backend/etl_pipeline.py`
  *    raises on inputs it has no parser for). "Free format" bitrate
  *    (index 0) is refused: its frame length is not derivable from the
  *    header alone.
  *  - AUDIO SAMPLE DECODE: deliberately out of scope (Layer III Huffman +
  *    IMDCT + synthesis filterbank; the metadata walk is the scan
  *    pipelines run at scale). [[BinaryMediaDecoder]] documents this
  *    split; the `features` it emits for `audio/mpeg` are coded-byte
  *    fingerprints, not PCM.
  *  - ENCODE: genuine MPEG-1 Layer III frame sequences (real sync words,
  *    real header fields, deterministic filler for the coded payload) —
  *    the oracle-side counterpart that lets mm05 round-trip the walker
  *    against a DuckDB-recomputable checksum, exactly like
  *    [[Jpeg.encodeGrayBlocks]] does for mm04.
  */
object Mp3 {

  /** One parsed frame header. `samples` is the PCM samples this frame
    * carries (384 / 1152 / 576 per layer+version); `frameBytes` includes
    * the 4 header bytes.
    */
  final case class FrameHeader(
      offset: Int,
      version: Int, // 1, 2, or 25 (MPEG-2.5)
      layer: Int, // 1, 2, 3
      bitrateKbps: Int,
      sampleRate: Int,
      padded: Boolean,
      channels: Int,
      frameBytes: Int,
      samples: Int)

  /** Whole-payload scan result. `totalSamples`/`sampleRate` give exact
    * duration; `vbr` is true when frames disagree on bitrate.
    */
  final case class Info(
      sampleRate: Int,
      channels: Int,
      nFrames: Int,
      totalSamples: Long,
      totalFrameBytes: Long,
      sumBitrateKbps: Long,
      nPadded: Int,
      vbr: Boolean,
      id3v2Bytes: Int,
      id3v1: Boolean,
      frames: Vector[FrameHeader])

  // ISO/IEC 11172-3 Table B.1 / 13818-3: bitrate in kbit/s by
  // (version-group, layer, index 1..14); index 0 = free, 15 = forbidden.
  private val BitrateV1: Array[Array[Int]] = Array(
    Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448), // L I
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384), // L II
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)) // L III
  private val BitrateV2: Array[Array[Int]] = Array(
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256), // L I
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160), // L II
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)) // L III

  // sample-rate table by version: index 0..2 (3 reserved)
  private val RateV1 = Array(44100, 48000, 32000)
  private val RateV2 = Array(22050, 24000, 16000)
  private val RateV25 = Array(11025, 12000, 8000)

  /** MPEG-1 Layer III bitrate table, exposed for the mm05 oracle SQL
    * (the DuckDB side embeds the same 14 literals).
    */
  def v1L3BitrateKbps(index: Int): Int = {
    require(index >= 1 && index <= 14, s"bitrate index $index outside 1..14")
    BitrateV1(2)(index)
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  /** samples per frame by (version, layer) — 11172-3 §2.4.2.1 */
  private def samplesPerFrame(version: Int, layer: Int): Int = layer match {
    case 1 => 384
    case 2 => 1152
    case _ => if (version == 1) 1152 else 576
  }

  /** frame length in bytes including header — the header-walk arithmetic:
    * Layer I: (12·bitrate/rate + pad)·4 (slots are 4 bytes);
    * Layers II/III: spf/8·bitrate/rate + pad (slots are 1 byte).
    * All divisions are integer (truncating), per the standard.
    */
  def frameLength(version: Int, layer: Int, bitrateKbps: Int, sampleRate: Int,
      padded: Boolean): Int = {
    val pad = if (padded) 1 else 0
    if (layer == 1) (12 * bitrateKbps * 1000 / sampleRate + pad) * 4
    else samplesPerFrame(version, layer) / 8 * bitrateKbps * 1000 / sampleRate + pad
  }

  /** Parse the 4 header bytes at `off`; throws on anything reserved. */
  private def parseHeader(b: Array[Byte], off: Int): FrameHeader = {
    require(off + 4 <= b.length, s"truncated frame header at $off")
    require(u8(b, off) == 0xff && (u8(b, off + 1) & 0xe0) == 0xe0,
      s"no frame sync at offset $off")
    val version = (u8(b, off + 1) >> 3) & 3 match {
      case 0 => 25
      case 2 => 2
      case 3 => 1
      case _ => throw new IllegalArgumentException(s"reserved MPEG version id at $off")
    }
    val layer = (u8(b, off + 1) >> 1) & 3 match {
      case 1 => 3
      case 2 => 2
      case 3 => 1
      case _ => throw new IllegalArgumentException(s"reserved layer id at $off")
    }
    val brIdx = (u8(b, off + 2) >> 4) & 0xf
    require(brIdx != 0, s"free-format bitrate at $off (frame length not derivable)")
    require(brIdx != 15, s"forbidden bitrate index at $off")
    val kbps = (if (version == 1) BitrateV1 else BitrateV2)(layer - 1)(brIdx)
    val rateIdx = (u8(b, off + 2) >> 2) & 3
    require(rateIdx != 3, s"reserved sample-rate index at $off")
    val rate = (version match {
      case 1 => RateV1
      case 2 => RateV2
      case _ => RateV25
    })(rateIdx)
    val padded = ((u8(b, off + 2) >> 1) & 1) == 1
    val channels = if ((u8(b, off + 3) >> 6) == 3) 1 else 2 // mode 3 = single
    val len = frameLength(version, layer, kbps, rate, padded)
    require(off + len <= b.length,
      s"frame at $off overruns payload (len $len, have ${b.length - off})")
    FrameHeader(off, version, layer, kbps, rate, padded, channels, len,
      samplesPerFrame(version, layer))
  }

  /** ID3v2 total byte length (header + syncsafe size + optional footer)
    * if the payload starts with one, else 0.
    */
  private def id3v2Length(b: Array[Byte]): Int = {
    if (b.length < 10 || b(0) != 'I' || b(1) != 'D' || b(2) != '3') return 0
    // 4-byte syncsafe size (7 bits per byte), bytes 6..9
    require((u8(b, 6) | u8(b, 7) | u8(b, 8) | u8(b, 9)) < 0x80,
      "malformed ID3v2 syncsafe size")
    val size = (u8(b, 6) << 21) | (u8(b, 7) << 14) | (u8(b, 8) << 7) | u8(b, 9)
    val footer = (u8(b, 5) & 0x10) != 0
    10 + size + (if (footer) 10 else 0)
  }

  /** Walk the whole payload: optional ID3v2 prefix, strictly adjacent
    * frames, optional ID3v1 trailer. Mixed sample rates / channel counts /
    * samples-per-frame (version+layer) across frames are refused (a legal
    * stream keeps them constant).
    */
  def parse(b: Array[Byte]): Info = {
    val id3 = id3v2Length(b)
    require(id3 <= b.length, "ID3v2 tag overruns payload")
    val tagAtTrailer = b.length - id3 >= 128 + 4 &&
      b(b.length - 128) == 'T' && b(b.length - 127) == 'A' && b(b.length - 126) == 'G'
    // 'TAG' at length-128 can be coincidental frame PAYLOAD bytes (audio
    // data is arbitrary), so the sniff is only honored when the frame walk
    // tiles exactly to the 128-byte trailer; otherwise re-walk the full
    // payload as audio. A stream that fails BOTH walks reports the
    // full-payload error (the no-tag reading is the weaker assumption).
    if (tagAtTrailer) {
      try walkFrames(b, id3, b.length - 128, hasId3v1 = true)
      catch {
        case _: IllegalArgumentException =>
          walkFrames(b, id3, b.length, hasId3v1 = false)
      }
    } else walkFrames(b, id3, b.length, hasId3v1 = false)
  }

  private def walkFrames(b: Array[Byte], id3: Int, end: Int,
      hasId3v1: Boolean): Info = {
    var off = id3
    val frames = Vector.newBuilder[FrameHeader]
    var n = 0
    var samples = 0L
    var bytes = 0L
    var kbpsSum = 0L
    var nPad = 0
    var rate = -1
    var ch = -1
    var spf = -1
    var minKbps = Int.MaxValue
    var maxKbps = Int.MinValue
    while (off < end) {
      val f = parseHeader(b, off)
      require(off + f.frameBytes <= end, s"frame at $off overruns audio region")
      if (rate < 0) { rate = f.sampleRate; ch = f.channels; spf = f.samples }
      else {
        require(f.sampleRate == rate, s"sample rate changes mid-stream at $off")
        require(f.channels == ch, s"channel mode changes mid-stream at $off")
        // constant samples-per-frame (i.e. constant version+layer): the
        // frame() indexer maps a sample index to its frame by integer
        // division, which is only sound when every frame carries the same
        // sample count — a mixed Layer I/III stream at one rate would
        // otherwise mis-index (round-8 advisor finding)
        require(f.samples == spf, s"samples-per-frame changes mid-stream at $off")
      }
      frames += f
      n += 1; samples += f.samples; bytes += f.frameBytes
      kbpsSum += f.bitrateKbps; if (f.padded) nPad += 1
      if (f.bitrateKbps < minKbps) minKbps = f.bitrateKbps
      if (f.bitrateKbps > maxKbps) maxKbps = f.bitrateKbps
      off += f.frameBytes
    }
    require(n > 0, "no MPEG audio frames in payload")
    Info(rate, ch, n, samples, bytes, kbpsSum, nPad, minKbps != maxKbps,
      id3, hasId3v1, frames.result())
  }

  /** Emit a genuine MPEG-1 Layer III stream: optional ID3v2 tag of
    * `id3v2Body` content bytes, then one frame per (bitrateIndex 1..14,
    * padded) pair at sample-rate index `rateIdx` (0=44100, 1=48000,
    * 2=32000), stereo. Coded-payload bytes come from `fill(frame, i)` —
    * deterministic filler, since sample decode is out of scope. The
    * emitted bytes parse back exactly through [[parse]].
    */
  def encodeV1L3(rateIdx: Int, frames: Seq[(Int, Boolean)], id3v2Body: Int,
      fill: (Int, Int) => Byte): Array[Byte] = {
    require(rateIdx >= 0 && rateIdx <= 2, s"sample-rate index $rateIdx outside 0..2")
    require(frames.nonEmpty, "at least one frame required")
    require(id3v2Body >= 0 && id3v2Body < (1 << 28), s"ID3v2 body $id3v2Body out of range")
    val rate = RateV1(rateIdx)
    val lens = frames.map { case (brIdx, pad) =>
      frameLength(1, 3, v1L3BitrateKbps(brIdx), rate, pad)
    }
    val id3 = if (id3v2Body > 0) 10 + id3v2Body else 0
    val out = new Array[Byte](id3 + lens.sum)
    if (id3 > 0) {
      out(0) = 'I'; out(1) = 'D'; out(2) = '3'
      out(3) = 4 // v2.4
      // bytes 4 (revision), 5 (flags) stay 0; syncsafe size:
      out(6) = ((id3v2Body >> 21) & 0x7f).toByte
      out(7) = ((id3v2Body >> 14) & 0x7f).toByte
      out(8) = ((id3v2Body >> 7) & 0x7f).toByte
      out(9) = (id3v2Body & 0x7f).toByte
      var i = 0
      while (i < id3v2Body) { out(10 + i) = fill(-1, i); i += 1 }
    }
    var off = id3
    frames.zipWithIndex.foreach { case ((brIdx, pad), fi) =>
      require(brIdx >= 1 && brIdx <= 14, s"bitrate index $brIdx outside 1..14")
      out(off) = 0xff.toByte
      out(off + 1) = 0xfb.toByte // sync + MPEG-1 + Layer III + no CRC
      out(off + 2) = ((brIdx << 4) | (rateIdx << 2) | (if (pad) 2 else 0)).toByte
      out(off + 3) = 0 // stereo, no mode ext, no copyright/original, no emphasis
      val len = lens(fi)
      var i = 4
      while (i < len) { out(off + i) = fill(fi, i); i += 1 }
      off += len
    }
    out
  }
}
