package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** RIFF/WAVE PCM codec: exact round trips over the width/channel grid,
  * side-chunk skipping with the even-padding rule, integer-exact feature
  * math, and the typed-refusal vocabulary (non-PCM formats, truncation,
  * wrong magic, inconsistent headers).
  */
class WavSpec extends AnyFunSuite {

  private def sine(n: Int, amp: Int, period: Int): Array[Int] =
    Array.tabulate(n)(i => (amp * math.sin(2 * math.Pi * i / period)).toInt)

  test("16-bit mono round trip is sample-exact") {
    val s = sine(480, 12000, 37) // non-divisor period: hits all phases
    val (hd, out) = Wav.decode(Wav.encode(8000, 16, Array(s)))
    assert(hd.sampleRate == 8000 && hd.channels == 1 && hd.bitsPerSample == 16)
    assert(hd.nSamples == 480)
    assert(out(0).toSeq == s.toSeq)
  }

  test("8-bit stereo round trip is sample-exact (unsigned storage, signed api)") {
    val l = sine(200, 100, 23)
    val r = Array.tabulate(200)(i => ((i * 31) % 255) - 127)
    val (hd, out) = Wav.decode(Wav.encode(44100, 8, Array(l, r)))
    assert(hd.channels == 2 && hd.bitsPerSample == 8 && hd.nSamples == 200)
    assert(out(0).toSeq == l.toSeq)
    assert(out(1).toSeq == r.toSeq)
  }

  test("encode clamps out-of-range samples instead of wrapping") {
    val (_, out) = Wav.decode(Wav.encode(8000, 16, Array(Array(40000, -40000, 5))))
    assert(out(0).toSeq == Seq(32767, -32768, 5))
  }

  test("24- and 32-bit PCM round trips are sample-exact at the width extremes") {
    val s24 = Array(-(1 << 23), (1 << 23) - 1, 0, 123456, -654321)
    val (h24, o24) = Wav.decode(Wav.encode(48000, 24, Array(s24)))
    assert(h24.bitsPerSample == 24 && o24(0).toSeq == s24.toSeq)
    val s32 = Array(Int.MinValue, Int.MaxValue, 0, 7)
    val (h32, o32) = Wav.decode(Wav.encode(96000, 32, Array(s32)))
    assert(h32.bitsPerSample == 32 && o32(0).toSeq == s32.toSeq)
  }

  test("side chunks (LIST before data) are skipped with the even-pad rule") {
    val base = Wav.encode(8000, 16, Array(Array(1, -2, 3, -4)))
    // splice an odd-length LIST chunk between fmt and data
    val listBody = "INFOx".getBytes("US-ASCII") // 5 bytes -> 1 pad byte
    val chunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ listBody ++ Array[Byte](0)
    val spliced = base.take(36) ++ chunk ++ base.drop(36)
    // fix the RIFF size
    val newSize = spliced.length - 8
    spliced(4) = (newSize & 0xff).toByte
    spliced(5) = ((newSize >> 8) & 0xff).toByte
    val (hd, out) = Wav.decode(spliced)
    assert(hd.nSamples == 4 && out(0).toSeq == Seq(1, -2, 3, -4))
  }

  test("features: sumAbs, zero crossings (zeros transparent), peak") {
    //                    +   -  0   -   +  + : crossings at (+,-) and (-,+)
    val (n, sumAbs, zc, peak) = Wav.features(Array(5, -3, 0, -2, 7, 1))
    assert(n == 6 && sumAbs == 18 && zc == 2 && peak == 7)
    val (_, _, zcAll, _) = Wav.features(Array(1, -1, 1, -1))
    assert(zcAll == 3)
    assert(Wav.features(Array.empty[Int]) == ((0L, 0L, 0L, 0L)))
  }

  test("typed refusals: unsupported formats, truncation, magic, inconsistency") {
    val good = Wav.encode(8000, 16, Array(sine(32, 9000, 7)))
    def kindOf(b: Array[Byte]): String =
      Multimodal.errKind(intercept[IllegalArgumentException](Wav.decode(b)).getMessage)
    // format tag 3 on a 16-bit file = malformed float width; 6 = ALAW,
    // 0xFFFE = EXTENSIBLE — all typed unsupported
    for (tag <- Seq(3, 6, 0xFE)) {
      val f = good.clone(); f(20) = tag.toByte; f(21) = (if (tag == 0xFE) 0xFF else 0).toByte
      assert(kindOf(f) == "unsupported", s"format tag $tag")
    }
    // a well-formed float32 file PARSES (BinaryMediaDecoder samples it)
    // but integer sample decode refuses typed
    val fl = Wav.encode(8000, 32, Array(Array(1, 2, 3, 4)))
    fl(20) = 3
    assert(Wav.parse(fl).isFloat)
    assert(kindOf(fl) == "unsupported")
    // truncated mid-data and mid-header
    assert(kindOf(java.util.Arrays.copyOf(good, good.length - 7)) == "truncated")
    assert(kindOf(java.util.Arrays.copyOf(good, 10)) == "truncated")
    // wrong magics
    assert(kindOf("RIFXnotawave".getBytes("US-ASCII")) == "not_media")
    val wv = good.clone(); wv(9) = 'O'.toByte
    assert(kindOf(wv) == "not_media")
    // block-align inconsistent with channels*width
    val ba = good.clone(); ba(32) = 7
    assert(kindOf(ba) == "malformed")
    // data length not a frame multiple
    val dl = good.clone()
    val dataLen = (dl(40) & 0xff) | ((dl(41) & 0xff) << 8)
    dl(40) = ((dataLen - 1) & 0xff).toByte
    assert(kindOf(dl) == "malformed")
  }

  test("total on garbage: random bytes refuse typed, never throw raw") {
    val rnd = new scala.util.Random(12)
    var i = 0
    while (i < 300) {
      val b = Array.fill(rnd.nextInt(80))(rnd.nextInt(256).toByte)
      try { Wav.decode(b); () }
      catch { case e: IllegalArgumentException =>
        assert(Set("unsupported", "truncated", "not_media", "malformed")
          .contains(Multimodal.errKind(e.getMessage)))
      }
      i += 1
    }
  }
}
