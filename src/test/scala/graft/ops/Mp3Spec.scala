package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Frame-walker contract tests for the pure-JVM MP3 metadata scanner:
  * round trips through the genuine-header encoder, hand-built frames for
  * the non-encoded version/layer combinations (the frame-length and
  * samples-per-frame tables are asserted against values computed by hand
  * from ISO/IEC 11172-3 §2.4), ID3v2/ID3v1 skip, VBR detection, and the
  * refusal cases (free bitrate, reserved indices, desync, truncation).
  */
class Mp3Spec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  /** hand-assembled single frame header + zero payload of the exact
    * computed length — independent of the encoder under test
    */
  private def rawFrame(b1: Int, b2: Int, b3: Int, len: Int): Array[Byte] = {
    val out = new Array[Byte](len)
    out(0) = 0xff.toByte; out(1) = b1.toByte; out(2) = b2.toByte; out(3) = b3.toByte
    out
  }

  test("encode/parse round trip: fields, frame count, byte extents") {
    val plan = Seq((5, false), (9, true), (14, false), (1, true))
    val payload = Mp3.encodeV1L3(1, plan, 0, (f, i) => ((f * 7 + i) % 251).toByte)
    val info = Mp3.parse(payload)
    assert(info.sampleRate == 48000)
    assert(info.channels == 2)
    assert(info.nFrames == 4)
    assert(info.totalSamples == 4L * 1152)
    assert(info.vbr)
    assert(info.nPadded == 2)
    assert(info.id3v2Bytes == 0 && !info.id3v1)
    assert(info.sumBitrateKbps == 64 + 128 + 320 + 32)
    // byte extents: the walker's parsed lengths tile the payload exactly
    assert(info.totalFrameBytes == payload.length.toLong)
    assert(info.frames.map(_.frameBytes).sum == payload.length)
    // spot-check the Layer III arithmetic by hand: 144000·64/48000 = 192
    assert(info.frames(0).frameBytes == 192)
    // 144000·128/48000 = 384, +1 padding
    assert(info.frames(1).frameBytes == 385)
  }

  test("CBR stream is not flagged VBR") {
    val payload = Mp3.encodeV1L3(0, Seq.fill(3)((9, false)), 0, (_, _) => 0)
    val info = Mp3.parse(payload)
    assert(!info.vbr)
    // 144000·128/44100 = 417 (truncating)
    assert(info.frames.forall(_.frameBytes == 417))
    assert(info.sampleRate == 44100)
  }

  test("ID3v2 prefix is skipped via its syncsafe size; ID3v1 trailer via TAG") {
    val body = 200 // syncsafe-encodes across two bytes
    val payload = Mp3.encodeV1L3(2, Seq((3, true), (3, true)), body, (_, i) => (i % 97).toByte)
    assert(payload(0) == 'I' && payload(1) == 'D' && payload(2) == '3')
    val withV1 = payload ++ bytes('T', 'A', 'G') ++ new Array[Byte](125)
    val info = Mp3.parse(withV1)
    assert(info.id3v2Bytes == 10 + body)
    assert(info.id3v1)
    assert(info.nFrames == 2)
    assert(info.sampleRate == 32000)
    // 144000·48/32000 = 216, +1 padding
    assert(info.frames.forall(_.frameBytes == 217))
  }

  test("MPEG-2 Layer III: 576 samples per frame, 72-slot arithmetic") {
    // 0xF3 = sync + version 2 (bits 10) + layer III (bits 01) + no CRC;
    // bitrate idx 8 (64 kbps in the V2 table), rate idx 1 (24000), no pad
    val len = 72 * 64 * 1000 / 24000 // (576/8 slots)·64 kbps/24000 Hz = 192
    val f = rawFrame(0xf3, (8 << 4) | (1 << 2), 0, 192)
    val info = Mp3.parse(f)
    assert(info.sampleRate == 24000)
    assert(info.totalSamples == 576)
    assert(info.frames.head.bitrateKbps == 64)
    assert(info.frames.head.frameBytes == 192)
    assert(len == 192) // the hand computation agrees
  }

  test("MPEG-2.5 header parses with the low-rate table") {
    // 0xE3 = sync + version 2.5 (bits 00) + layer III + no CRC; idx 2
    // (16 kbps), rate idx 2 (8000): 72000·16/8000 = 144
    val info = Mp3.parse(rawFrame(0xe3, (2 << 4) | (2 << 2), 0, 144))
    assert(info.sampleRate == 8000)
    assert(info.totalSamples == 576)
    assert(info.frames.head.frameBytes == 144)
  }

  test("Layer I uses 384 samples and 4-byte slots") {
    // 0xFF = sync + MPEG-1 + layer I (bits 11) + no CRC; idx 4
    // (128 kbps), rate idx 0 (44100): (12000·128/44100 + 0)·4 = 136
    val info = Mp3.parse(rawFrame(0xff, (4 << 4) | (0 << 2), 0, 136))
    assert(info.totalSamples == 384)
    assert(info.frames.head.layer == 1)
    assert(info.frames.head.frameBytes == 136)
  }

  test("single-channel mode reported as 1 channel") {
    // mode bits 11 (single channel) in byte 3
    val info = Mp3.parse(rawFrame(0xfb, (9 << 4) | (0 << 2), 0xc0, 417))
    assert(info.channels == 1)
  }

  test("refusals: free bitrate, forbidden bitrate, reserved rate, desync, truncation") {
    // free format (bitrate index 0)
    assertThrows[IllegalArgumentException](Mp3.parse(rawFrame(0xfb, 0 << 4, 0, 192)))
    // forbidden bitrate index 15
    assertThrows[IllegalArgumentException](Mp3.parse(rawFrame(0xfb, 15 << 4, 0, 192)))
    // reserved sample-rate index 3
    assertThrows[IllegalArgumentException](
      Mp3.parse(rawFrame(0xfb, (9 << 4) | (3 << 2), 0, 192)))
    // reserved version id (bits 01)
    assertThrows[IllegalArgumentException](Mp3.parse(rawFrame(0xeb, 9 << 4, 0, 192)))
    // garbage between frames (walker validates strict adjacency)
    val good = Mp3.encodeV1L3(0, Seq((9, false)), 0, (_, _) => 0)
    assertThrows[IllegalArgumentException](Mp3.parse(good ++ bytes(0x00) ++ good))
    // truncated final frame
    assertThrows[IllegalArgumentException](Mp3.parse(good.dropRight(1)))
    // empty audio region
    assertThrows[IllegalArgumentException](Mp3.parse(Array.emptyByteArray))
  }

  test("coincidental 'TAG' bytes inside frame payload are NOT an ID3v1 trailer") {
    // one CBR 44100 Hz frame (417 bytes); plant T/A/G at length-128 —
    // inside the audio payload. No frame length tiles the 128-byte
    // remainder, so honoring the sniff would make the walk throw; the
    // parser must fall back to the full-payload reading (round-8 advisor
    // finding: corpus-text filler made mm05 tasks crash data-dependently)
    val payload = Mp3.encodeV1L3(0, Seq((9, false)), 0, (_, i) => (i % 29).toByte)
    assert(payload.length == 417)
    val off = payload.length - 128
    payload(off) = 'T'; payload(off + 1) = 'A'; payload(off + 2) = 'G'
    val info = Mp3.parse(payload)
    assert(!info.id3v1)
    assert(info.nFrames == 1)
    assert(info.totalFrameBytes == 417L)
    // a REAL trailer (frames tile exactly to length-128) still detects
    val withV1 = Mp3.encodeV1L3(0, Seq((9, false)), 0, (_, _) => 0) ++
      bytes('T', 'A', 'G') ++ new Array[Byte](125)
    assert(Mp3.parse(withV1).id3v1)
  }

  test("mixed samples-per-frame (layer change at one rate) is refused") {
    // V1 L3 @48000 idx9 (384 bytes, 1152 samples) then V1 L1 @48000 idx2
    // (64 kbps -> 16 slots -> 64 bytes, 384 samples): same rate, same
    // stereo mode, different samples-per-frame — frame() integer-division
    // indexing would mis-map, so parse refuses the stream
    val l3 = rawFrame(0xfb, (9 << 4) | (1 << 2), 0, 384)
    val l1 = rawFrame(0xff, (2 << 4) | (1 << 2), 0, 64)
    val e = intercept[IllegalArgumentException](Mp3.parse(l3 ++ l1))
    assert(e.getMessage.contains("samples-per-frame"), e.getMessage)
  }

  test("BinaryMediaDecoder maps audio/mpeg to the WAV-convention shape triple") {
    val payload = Mp3.encodeV1L3(1, Seq((9, false), (9, false)), 30, (_, i) => (i % 13).toByte)
    val blob = Multimodal.Blob(7L, payload, "audio/mpeg", Map.empty)
    val d = BinaryMediaDecoder.decode(blob)
    assert(d.width == 48000) // sample rate
    assert(d.height == 2) // channels
    assert(d.n_frames == 2 * 1152) // PCM samples
    assert(d.features.length == 8)
    assert(d.features.forall(f => f >= 0.0f && f <= 1.0f))
    // frame() takes a PCM-sample instant (decode's n_frames unit) and
    // returns the CODED frame containing it, header included
    val f1 = BinaryMediaDecoder.frame(blob, 1152) // first sample of frame 1
    assert(f1.length == 384) // 144000·128/48000
    assert((f1(0) & 0xff) == 0xff && (f1(1) & 0xe0) == 0xe0)
    assert(BinaryMediaDecoder.frame(blob, 0).length == 384) // frame 0
    assert(BinaryMediaDecoder.frame(blob, 2 * 1152 - 1).length == 384) // last sample
    assertThrows[IllegalArgumentException](BinaryMediaDecoder.frame(blob, 2 * 1152))
  }

}
