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
