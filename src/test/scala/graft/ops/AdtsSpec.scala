package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Locks on the ADTS/AAC frame walker (graft.ops.Adts): header field
  * extraction across both header forms (7-byte CRC-absent, 9-byte CRC),
  * multi-raw-data-block sample accounting, MPEG-2/4 versions, and the
  * typed fail-stop refusals (syncword, layer, reserved rate index,
  * lying frame lengths, truncation, mid-stream parameter changes).
  */
class AdtsSpec extends AnyFunSuite {

  private def gen(fi: Int, i: Int): Byte = ((fi * 31 + i) % 251).toByte

  test("round trip: fields, duration, CRC form, raw-data-block count") {
    val bytes = Adts.write(mpeg4 = true, profile = 1, sfIdx = 3 /*48k*/,
      chanCfg = 2, frames = Seq((100, false, 0), (80, true, 0), (60, false, 1)),
      gen = gen)
    val m = Adts.parse(bytes)
    assert(m.mpegVersion == 4 && m.profile == "LC" &&
      m.sampleRate == 48000 && m.channels == 2)
    assert(m.nFrames == 3 && m.crcFrames == 1)
    assert(m.nSamples == 1024L * (1 + 1 + 2)) // rdb+1 blocks per frame
    assert(m.payloadBytes == 100 + 80 + 60)
    assert(m.durationMs == m.nSamples * 1000 / 48000)
    // MPEG-2 stream, mono, 22.05 kHz Main profile
    val m2 = Adts.parse(Adts.write(mpeg4 = false, profile = 0, sfIdx = 7,
      chanCfg = 1, frames = Seq((40, false, 0)), gen = gen))
    assert(m2.mpegVersion == 2 && m2.profile == "Main" &&
      m2.sampleRate == 22050 && m2.channels == 1)
  }

  test("refusals are typed: sync, layer, reserved index, lengths, cuts") {
    val good = Adts.write(mpeg4 = true, profile = 1, sfIdx = 4, chanCfg = 2,
      frames = Seq((50, false, 0), (50, false, 0)), gen = gen)
    assert(Adts.parseSafe(Array[Byte](1, 2, 3)) == Left("truncated"))
    val noSync = good.clone(); noSync(0) = 0x12
    assert(Adts.parseSafe(noSync) == Left("bad_frame"))
    // layer bits (byte 1 bits 2:1) must be zero
    val layered = good.clone(); layered(1) = (layered(1) | 0x06).toByte
    assert(Adts.parseSafe(layered) == Left("bad_frame"))
    // reserved sampling index 13
    val resIdx = good.clone()
    resIdx(2) = ((resIdx(2) & 0xc3) | (13 << 2)).toByte
    assert(Adts.parseSafe(resIdx) == Left("bad_frame"))
    // frame length lying past the end
    val lie = good.clone(); lie(4) = 0xff.toByte
    assert(Adts.parseSafe(lie) == Left("truncated"))
    // frame length shorter than its own header
    val tiny = good.clone()
    tiny(3) = (tiny(3) & 0xfc).toByte; tiny(4) = 0; tiny(5) = (0x3f | (3 << 5)).toByte
    assert(Adts.parseSafe(tiny) == Left("bad_frame"))
    // hard truncation mid-frame
    assert(Adts.parseSafe(java.util.Arrays.copyOf(good, good.length - 10)) ==
      Left("truncated"))
    // channel_configuration 0 (PCE-configured) refuses as unsupported rot
    val pce = good.clone()
    pce(2) = (pce(2) & 0xfe).toByte; pce(3) = (pce(3) & 0x3f).toByte
    assert(Adts.parseSafe(pce) == Left("bad_frame"))
    // mid-stream parameter change (second frame switches to 44.1 kHz)
    val twoRates = Adts.write(mpeg4 = true, profile = 1, sfIdx = 4,
      chanCfg = 2, frames = Seq((50, false, 0)), gen = gen) ++
      Adts.write(mpeg4 = true, profile = 1, sfIdx = 3,
        chanCfg = 2, frames = Seq((50, false, 0)), gen = gen)
    assert(Adts.parseSafe(twoRates) == Left("bad_frame"))
    assert(Adts.parseSafe(Array.emptyByteArray) == Left("truncated"))
  }

  test("media decoder routes audio/aac as shape-without-decode") {
    val bytes = Adts.write(mpeg4 = true, profile = 1, sfIdx = 6 /*24k*/,
      chanCfg = 2, frames = Seq((64, false, 0), (64, false, 0)), gen = gen)
    val d = BinaryMediaDecoder.decode(
      Multimodal.Blob(7L, bytes, "audio/aac", Map.empty))
    assert(d.width == 24000 && d.height == 2 && d.n_frames == 2048)
    assert(d.features.length == 8)
  }
}
