package graft.ops

/** Pure-JVM RIFF/WAVE PCM codec — the one audio container a training-data
  * pipeline can decode to REAL samples without an entropy coder (contrast
  * [[Mp3]], which is deliberately a metadata walker). Implements the
  * public RIFF (Microsoft/IBM WAVE) layout: `RIFF` size `WAVE`, an `fmt `
  * chunk, optional side chunks (skipped with the even-padding rule), and
  * the `data` chunk carrying little-endian samples. This is the ONE WAV
  * parser in the repo — [[BinaryMediaDecoder]]'s `audio/wav` branch
  * delegates here (round 12 consolidated its private header walker).
  *
  * Scope:
  *  - PARSE: integer PCM (format tag 1; 8/16/24/32-bit) and IEEE float32
  *    (format tag 3), any channel count, with structural audits (RIFF
  *    size bound, chunk bounds, block-align consistency, frame-aligned
  *    data length).
  *  - DECODE to samples: integer PCM only — 8-bit maps to sample−128 so
  *    silence is 0 in every width; 24/32-bit are exact in Int. Float
  *    sample decode refuses typed (feature pipelines read floats through
  *    [[BinaryMediaDecoder]]'s normalized sampler instead).
  *  - REFUSE typed (the [[Multimodal.errKind]] vocabulary): other format
  *    tags (ADPCM 2, ALAW 6, MULAW 7, EXTENSIBLE 0xFFFE → "unsupported"),
  *    truncated containers ("truncated"), wrong magic ("not a"),
  *    structurally inconsistent headers ("malformed").
  *  - ENCODE: canonical 44-byte-header integer-PCM writer (the
  *    fixture/oracle counterpart, like [[Png.encode]] for mm03).
  *
  * Scale shape: decode is a per-row map over blob bytes — shuffle-free
  * until whatever the caller aggregates, the [[WarcSource]]/[[Tar]]
  * pattern.
  */
object Wav {

  /** Parsed header + located samples. `bitsPerSample` ∈ {8, 16, 24, 32};
    * `nSamples` is per channel (frame count); `isFloat` marks IEEE
    * float32 (format tag 3) payloads.
    */
  final case class Header(
      sampleRate: Int,
      channels: Int,
      bitsPerSample: Int,
      nSamples: Int,
      dataOff: Int,
      isFloat: Boolean) {
    def frameBytes: Int = channels * (bitsPerSample / 8)
    def dataLen: Int = nSamples * frameBytes
  }

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  private def le32(b: Array[Byte], o: Int): Int = {
    if (o + 4 > b.length) fail("truncated WAV: header field past end")
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 3) & 0xff) << 24)
  }

  private def le16(b: Array[Byte], o: Int): Int = {
    if (o + 2 > b.length) fail("truncated WAV: header field past end")
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  }

  private def tag(b: Array[Byte], o: Int): String = {
    if (o + 4 > b.length) fail("truncated WAV: chunk tag past end")
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** Parse the container: validate RIFF/WAVE + fmt, locate data. */
  def parse(bytes: Array[Byte]): Header = {
    if (bytes.length < 4 || tag(bytes, 0) != "RIFF") fail("not a WAV (RIFF magic)")
    if (bytes.length < 12) fail("truncated WAV: header under 12 bytes")
    if (tag(bytes, 8) != "WAVE") fail("not a WAV (WAVE form type)")
    val riffSize = le32(bytes, 4)
    if (riffSize < 4 || 8L + riffSize > bytes.length)
      fail(s"truncated WAV: RIFF size $riffSize vs ${bytes.length} bytes")
    var off = 12
    var fmt: Option[(Int, Int, Int, Boolean)] = None // (ch, rate, bits, float)
    var data: Option[(Int, Int)] = None // (off, len)
    while (off + 8 <= 8 + riffSize && (fmt.isEmpty || data.isEmpty)) {
      val t = tag(bytes, off)
      val len = le32(bytes, off + 4)
      if (len < 0 || off + 8 + len > bytes.length)
        fail(s"truncated WAV: chunk '$t' of $len bytes past end")
      t match {
        case "fmt " =>
          if (len < 16) fail("malformed WAV: fmt chunk under 16 bytes")
          val format = le16(bytes, off + 8)
          if (format != 1 && format != 3)
            fail(s"unsupported WAV: format tag $format (integer PCM or IEEE float only)")
          val isFloat = format == 3
          val ch = le16(bytes, off + 10)
          val rate = le32(bytes, off + 12)
          val bits = le16(bytes, off + 22)
          if (ch < 1) fail(s"malformed WAV: $ch channels")
          if (isFloat && bits != 32)
            fail(s"unsupported WAV: IEEE-float must be 32-bit, got $bits")
          if (!isFloat && bits != 8 && bits != 16 && bits != 24 && bits != 32)
            fail(s"unsupported WAV: $bits-bit samples (8/16/24/32 only)")
          if (rate <= 0) fail(s"malformed WAV: sample rate $rate")
          // block-align / width consistency (catches header tampering)
          val blockAlign = le16(bytes, off + 20)
          if (blockAlign != ch * (bits / 8))
            fail(s"malformed WAV: block align $blockAlign vs ${ch * (bits / 8)}")
          fmt = Some((ch, rate, bits, isFloat))
        case "data" =>
          data = Some((off + 8, len))
        case _ => // side chunk (LIST, fact, cue ...): skip
      }
      off += 8 + len + (len & 1) // chunks are even-padded
    }
    val (ch, rate, bits, isFloat) = fmt.getOrElse(fail("malformed WAV: no fmt chunk"))
    val (dOff, dLen) = data.getOrElse(fail("malformed WAV: no data chunk"))
    val bytesPerFrame = ch * (bits / 8)
    if (dLen % bytesPerFrame != 0)
      fail(s"malformed WAV: data length $dLen misaligned to frame size $bytesPerFrame")
    Header(rate, ch, bits, dLen / bytesPerFrame, dOff, isFloat)
  }

  /** One raw signed sample, exact in Int — 8-bit unsigned PCM maps to
    * sample−128 so silence is 0 in every width. Float payloads refuse.
    */
  private def sampleAt(bytes: Array[Byte], hd: Header, p: Int): Int =
    hd.bitsPerSample match {
      case 8 => (bytes(p) & 0xff) - 128
      case 16 => { val v = le16(bytes, p); if (v >= 0x8000) v - 0x10000 else v }
      case 24 => (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8) |
        (bytes(p + 2).toInt << 16) // sign-extends via the top byte
      case _ => le32(bytes, p)
    }

  /** Decode to per-channel signed Int samples. Returns
    * (header, samples(channel)(frame)).
    */
  def decode(bytes: Array[Byte]): (Header, Array[Array[Int]]) = {
    val hd = parse(bytes)
    if (hd.isFloat)
      fail("unsupported WAV: IEEE-float sample decode (integer PCM only)")
    val out = Array.ofDim[Int](hd.channels, hd.nSamples)
    val step = hd.bitsPerSample / 8
    var p = hd.dataOff
    var i = 0
    while (i < hd.nSamples) {
      var c = 0
      while (c < hd.channels) {
        out(c)(i) = sampleAt(bytes, hd, p)
        p += step
        c += 1
      }
      i += 1
    }
    (hd, out)
  }

  /** Canonical 44-byte-header integer-PCM writer. `samples(channel)(frame)`,
    * signed values (clamped to the width); 8-bit is written unsigned+128
    * per the format.
    */
  def encode(sampleRate: Int, bitsPerSample: Int,
      samples: Array[Array[Int]]): Array[Byte] = {
    require(Set(8, 16, 24, 32).contains(bitsPerSample), "8/16/24/32-bit only")
    require(samples.nonEmpty && samples.length <= 2, "mono or stereo only")
    val ch = samples.length
    val n = samples(0).length
    require(samples.forall(_.length == n), "channel length mismatch")
    val step = bitsPerSample / 8
    val bpf = ch * step
    val dataLen = n * bpf
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    def w32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("RIFF".getBytes("US-ASCII")); w32(36 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16)
    w16(1); w16(ch); w32(sampleRate); w32(sampleRate * bpf); w16(bpf); w16(bitsPerSample)
    out.write("data".getBytes("US-ASCII")); w32(dataLen)
    val hi: Long = (1L << (bitsPerSample - 1)) - 1
    val lo: Long = -(1L << (bitsPerSample - 1))
    var i = 0
    while (i < n) {
      var c = 0
      while (c < ch) {
        val s = math.max(lo, math.min(hi, samples(c)(i).toLong)).toInt
        bitsPerSample match {
          case 8 => out.write(s + 128)
          case 16 => w16(s & 0xffff)
          case 24 => out.write(s & 0xff); out.write((s >> 8) & 0xff)
            out.write((s >> 16) & 0xff)
          case _ => w32(s)
        }
        c += 1
      }
      i += 1
    }
    out.toByteArray
  }

  /** Integer-exact per-blob audio features over channel 0 (the curation
    * signals a corpus scan keeps): (nSamples, sumAbs, zeroCrossings,
    * peakAbs). Zero crossings count strict sign CHANGES between
    * consecutive nonzero samples (zeros are transparent), which is
    * reproducible in SQL.
    */
  def features(samples: Array[Int]): (Long, Long, Long, Long) = {
    var sumAbs = 0L
    var zc = 0L
    var peak = 0L
    var lastSign = 0
    var i = 0
    while (i < samples.length) {
      val s = samples(i)
      val a = math.abs(s.toLong)
      sumAbs += a
      if (a > peak) peak = a
      val sign = java.lang.Integer.signum(s)
      if (sign != 0) {
        if (lastSign != 0 && sign != lastSign) zc += 1
        lastSign = sign
      }
      i += 1
    }
    (samples.length.toLong, sumAbs, zc, peak)
  }
}
