package graft.ops

/** Pure-JVM RIFF/WAVE PCM codec — the one audio container a training-data
  * pipeline can decode to REAL samples without an entropy coder (contrast
  * [[Mp3]], which is deliberately a metadata walker). Implements the
  * public RIFF (Microsoft/IBM WAVE) layout: `RIFF` size `WAVE`, an `fmt `
  * chunk (PCM format tag 1), optional side chunks (skipped with the
  * even-padding rule), and the `data` chunk carrying little-endian PCM.
  *
  * Scope:
  *  - DECODE: integer PCM — 8-bit unsigned and 16-bit signed, mono or
  *    interleaved stereo, any sample rate. All sample-level features the
  *    queries derive (counts, sum of |s|, zero crossings, peak) are
  *    integer-exact, so a DuckDB oracle can recompute them from the same
  *    synthesis arithmetic.
  *  - REFUSE typed (the [[Multimodal.errKind]] vocabulary): non-PCM
  *    format tags (IEEE float 3, ALAW 6, MULAW 7, ADPCM 2, EXTENSIBLE
  *    0xFFFE → "unsupported"), truncated containers ("truncated"), wrong
  *    magic ("not a"), structurally inconsistent headers ("malformed").
  *  - ENCODE: canonical 44-byte-header PCM writer (the fixture/oracle
  *    counterpart, like [[Png.encode]] for mm03).
  *
  * Scale shape: decode is a per-row map over blob bytes — shuffle-free
  * until whatever the caller aggregates, the [[WarcSource]]/[[Tar]]
  * pattern.
  */
object Wav {

  /** Parsed header + located samples. `bitsPerSample` ∈ {8, 16};
    * `nSamples` is per channel (frame count).
    */
  final case class Header(
      sampleRate: Int,
      channels: Int,
      bitsPerSample: Int,
      nSamples: Int,
      dataOff: Int)

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
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
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
          if (format != 1) fail(s"unsupported WAV: format tag $format (PCM only)")
          val ch = le16(bytes, off + 10)
          val rate = le32(bytes, off + 12)
          val bits = le16(bytes, off + 22)
          if (ch < 1 || ch > 2) fail(s"unsupported WAV: $ch channels")
          if (bits != 8 && bits != 16) fail(s"unsupported WAV: $bits-bit samples")
          if (rate <= 0) fail(s"malformed WAV: sample rate $rate")
          // block-align / byte-rate consistency (catches header tampering)
          val blockAlign = le16(bytes, off + 20)
          if (blockAlign != ch * (bits / 8))
            fail(s"malformed WAV: block align $blockAlign vs ${ch * (bits / 8)}")
          fmt = Some((ch, rate, bits))
        case "data" =>
          data = Some((off + 8, len))
        case _ => // side chunk (LIST, fact, cue ...): skip
      }
      off += 8 + len + (len & 1) // chunks are even-padded
    }
    val (ch, rate, bits) = fmt.getOrElse(fail("malformed WAV: no fmt chunk"))
    val (dOff, dLen) = data.getOrElse(fail("malformed WAV: no data chunk"))
    val bytesPerFrame = ch * (bits / 8)
    if (dLen % bytesPerFrame != 0)
      fail(s"malformed WAV: data length $dLen misaligned to frame size $bytesPerFrame")
    Header(rate, ch, bits, dLen / bytesPerFrame, dOff)
  }

  /** Decode to per-channel samples, normalized to SIGNED ints — 8-bit
    * unsigned PCM maps to sample-128 so silence is 0 in both widths.
    * Returns (header, samples(channel)(frame)).
    */
  def decode(bytes: Array[Byte]): (Header, Array[Array[Int]]) = {
    val hd = parse(bytes)
    val out = Array.ofDim[Int](hd.channels, hd.nSamples)
    var p = hd.dataOff
    var i = 0
    while (i < hd.nSamples) {
      var c = 0
      while (c < hd.channels) {
        out(c)(i) =
          if (hd.bitsPerSample == 8) (bytes(p) & 0xff) - 128
          else { val v = le16(bytes, p); if (v >= 0x8000) v - 0x10000 else v }
        p += hd.bitsPerSample / 8
        c += 1
      }
      i += 1
    }
    (hd, out)
  }

  /** Canonical 44-byte-header PCM writer. `samples(channel)(frame)`,
    * signed values (clamped to the width); 8-bit is written unsigned+128
    * per the format.
    */
  def encode(sampleRate: Int, bitsPerSample: Int,
      samples: Array[Array[Int]]): Array[Byte] = {
    require(bitsPerSample == 8 || bitsPerSample == 16, "8- or 16-bit only")
    require(samples.nonEmpty && samples.length <= 2, "mono or stereo only")
    val ch = samples.length
    val n = samples(0).length
    require(samples.forall(_.length == n), "channel length mismatch")
    val bpf = ch * (bitsPerSample / 8)
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
    val lo = if (bitsPerSample == 8) -128 else -32768
    val hi = if (bitsPerSample == 8) 127 else 32767
    var i = 0
    while (i < n) {
      var c = 0
      while (c < ch) {
        val s = math.max(lo, math.min(hi, samples(c)(i)))
        if (bitsPerSample == 8) out.write(s + 128)
        else w16(s & 0xffff)
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
