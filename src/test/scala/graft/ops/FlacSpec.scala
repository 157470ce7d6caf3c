package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

import graft.etl.{JArr, JFloat, JInt, JObj, JStr, JVal, Json}

/** Locks on the FLAC metadata codec (graft.ops.Flac): bit-exact parse of
  * fixtures from the independent python spec transcription
  * (tools/make_flac_fixture.py — STREAMINFO bit packing, the Vorbis
  * block's little-endian island, opaque block types), round trips
  * through our writer, and the typed-refusal contract.
  */
class FlacSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private lazy val expected: Map[String, JVal] =
    Json.parse(new String(fixture("flac_expected.json"), UTF_8)) match {
      case JObj(fs) => fs.toMap
      case other    => fail(s"bad expected json: $other")
    }

  private def obj(name: String): Map[String, JVal] =
    expected(name) match { case JObj(fs) => fs.toMap; case o => fail(s"$o") }

  private def lng(v: JVal): Long = v match {
    case JInt(i)   => i.toLong
    case JFloat(d) => d.toLong
    case o         => fail(s"$o")
  }
  private def str(v: JVal): String = v match { case JStr(s) => s; case o => fail(s"$o") }

  private def checkCore(m: Flac.FlacMeta, e: Map[String, JVal]): Unit = {
    assert(m.sampleRate == lng(e("rate")).toInt)
    assert(m.channels == lng(e("ch")).toInt)
    assert(m.bitsPerSample == lng(e("bps")).toInt)
    assert(m.totalSamples == lng(e("samples")))
    assert(m.md5 == str(e("md5")))
    assert(m.nBlocks == lng(e("blocks")).toInt)
  }

  test("STREAMINFO-only fixture parses bit-exactly") {
    checkCore(Flac.read(fixture("flac_basic.flac")), obj("flac_basic"))
  }

  test("tagged fixture: vorbis comments (LE island, utf8, key folding) + padding") {
    val m = Flac.read(fixture("flac_tagged.flac"))
    val e = obj("flac_tagged")
    checkCore(m, e)
    assert(m.vendor == str(e("vendor")))
    assert(m.paddingBytes == lng(e("padding")))
    val exp = e("comments") match {
      case JArr(items) => items.map { case JArr(kv) => (str(kv(0)), str(kv(1))); case o => fail(s"$o") }
      case o => fail(s"$o")
    }
    assert(m.comments == exp.toVector)
  }

  test("exotic fixture: 20-bit 8ch 96k, 36-bit sample count, opaque seektable") {
    val m = Flac.read(fixture("flac_exotic.flac"))
    checkCore(m, obj("flac_exotic"))
    assert(m.totalSamples == (1L << 36) - 1)
  }

  test("round trip through our writer") {
    val md5 = Array.tabulate[Byte](16)(i => (i * 7).toByte)
    val bytes = Flac.write(48000, 2, 16, 424242L, md5,
      vendor = "graft", comments = Seq("TITLE" -> "t", "LANG" -> "en"),
      paddingBytes = 32)
    val m = Flac.read(bytes)
    assert(m.sampleRate == 48000 && m.channels == 2 && m.bitsPerSample == 16)
    assert(m.totalSamples == 424242L && m.vendor == "graft")
    assert(m.comments == Vector("TITLE" -> "t", "LANG" -> "en"))
    assert(m.paddingBytes == 32L && m.nBlocks == 3)
    assert(m.md5 == md5.map(b => f"${b & 0xff}%02x").mkString)
  }

  test("python audio fixtures decode bit-exactly (LPC, rice2, partitions, escapes, wasted bits, L/S R/S M/S)") {
    // the fixtures deliberately use shapes our encoder never emits — the
    // decoder is pinned against the independent python spec transcription
    for (name <- Seq("flac_audio1", "flac_audio2")) {
      val e = obj(name)
      val (m, pcm) = FlacAudio.decode(fixture(s"$name.flac"))
      checkCore(m, e)
      val want = e("pcm") match {
        case JArr(chs) => chs.map {
          case JArr(vs) => vs.map(lng)
          case o => fail(s"$o")
        }
        case o => fail(s"$o")
      }
      assert(pcm.length == want.length, s"$name channel count")
      for (c <- want.indices)
        assert(pcm(c).toSeq.map(_.toLong) == want(c), s"$name ch $c")
    }
  }

  test("audio round trip: every subframe family, mono+mid/side, multi-frame") {
    val rnd = new java.util.Random(42)
    for (trial <- 0 until 120) {
      val nCh = 1 + (trial % 2)
      val n = 1 + rnd.nextInt(700)
      val bps = Seq(8, 16, 24)(trial % 3)
      val max = (1 << (bps - 1)) - 1
      val shape = trial % 5
      val chans = Array.tabulate(nCh, n) { (c, i) =>
        shape match {
          case 0 => 7 - c // constant per channel
          case 1 => ((i * 37 + c * 11) % 200) - 100 // linear-ish: fixed orders
          case 2 => rnd.nextInt(2 * max + 1) - max // full-range noise: verbatim
          case 3 => (math.sin(i / 5.0) * max * 0.8).toInt // smooth: high orders
          case _ => if (i % 2 == 0) max else -max - 1 // alternating extremes
        }
      }
      val bs = Seq(64, 192, 256, 576)(trial % 4)
      val enc = FlacAudio.encode(8000, bps, chans, blockSize = bs)
      // determinism
      assert(FlacAudio.encode(8000, bps, chans, blockSize = bs).toSeq == enc.toSeq)
      val (meta, pcm) = FlacAudio.decode(enc)
      assert(meta.channels == nCh && meta.totalSamples == n.toLong,
        s"trial $trial meta")
      for (c <- 0 until nCh)
        assert(pcm(c).toSeq == chans(c).toSeq,
          s"trial $trial ch $c shape $shape bps $bps n $n bs $bs")
    }
  }

  test("audio typed refusals: frame corruption never misdecodes") {
    val chans = Array(Array.tabulate(300)(i => ((i * 31) % 251) - 125),
      Array.tabulate(300)(i => ((i * 17) % 193) - 96))
    val good = FlacAudio.encode(16000, 16, chans, blockSize = 64)
    // flip the final CRC-16 byte: deterministic crc_mismatch
    val c = good.clone(); c(c.length - 1) = (c(c.length - 1) ^ 1).toByte
    assert(FlacAudio.decodeSafe(c) == Left("crc_mismatch"))
    // truncate mid-frames
    assert(FlacAudio.decodeSafe(java.util.Arrays.copyOf(good, good.length - 40))
      .isLeft)
    // trailing garbage after the last frame
    assert(FlacAudio.decodeSafe(good ++ Array[Byte](1, 2, 3)) == Left("bad_frame"))
    // metadata-only stream (no frames) with a declared sample count
    val metaOnly = Flac.write(16000, 2, 16, 300L, new Array[Byte](16))
    assert(FlacAudio.decodeSafe(metaOnly).isLeft)
    // unknown total samples refuses (strict-audit subset)
    val unknown = Flac.write(16000, 1, 16, 0L, new Array[Byte](16))
    assert(FlacAudio.decodeSafe(unknown) == Left("bad_streaminfo"))
    // every single-byte mutation refuses typed or decodes the SAME pcm.
    // Frame bytes are covered by CRC-16 (linear: a one-byte xor can never
    // collide) and the PCM by the STREAMINFO MD5; unauthenticated metadata
    // fields (vendor string, min/max frame size — FLAC checksums neither)
    // may flip and still decode, but the samples must be untouched.
    for (pos <- good.indices if pos >= 4) {
      val m = good.clone(); m(pos) = (m(pos) ^ 0x41).toByte
      FlacAudio.decodeSafe(m) match {
        case Right((_, pcm)) =>
          for (ch <- 0 until 2)
            assert(pcm(ch).toSeq == chans(ch).toSeq, s"pos $pos: WRONG PCM decoded ok")
        case Left(kind) =>
          assert(Set("bad_magic", "truncated", "bad_streaminfo", "bad_comment",
            "too_large", "bad_frame", "crc_mismatch", "bad_md5").contains(kind),
            s"pos $pos kind $kind")
      }
    }
  }

  test("typed refusals: magic, truncation, streaminfo, comment, bomb cap") {
    val good = Flac.write(8000, 1, 16, 10L, new Array[Byte](16),
      vendor = "v", comments = Seq("K" -> "v"))
    def mut(i: Int, x: Int): Array[Byte] = {
      val b = good.clone(); b(i) = (b(i) ^ x).toByte; b
    }
    assert(Flac.readSafe(mut(0, 0x5a)) == Left("bad_magic"))
    assert(Flac.readSafe(java.util.Arrays.copyOf(good, good.length - 2)) ==
      Left("truncated"))
    assert(Flac.readSafe(java.util.Arrays.copyOf(good, 20)) == Left("truncated"))
    // first block not STREAMINFO
    assert(Flac.readSafe(mut(4, 0x03)) == Left("bad_streaminfo"))
    // corrupt the comment count (second LE byte → absurd n > block len)
    val b = good.clone()
    b(good.length - 10) = 0x7f // count LE byte 2 → absurd count
    assert(Flac.readSafe(b) == Left("bad_comment"))
    // declared block length past the budget
    val old = graft.core.Budget.maxInflatedBytes
    graft.core.Budget.maxInflatedBytes = 16
    try assert(Flac.readSafe(good) == Left("too_large"))
    finally graft.core.Budget.maxInflatedBytes = old
  }
}
