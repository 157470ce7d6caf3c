package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.US_ASCII

/** Locks on the zstd seekable format (graft.ops.ZstdSeekable): range
  * reads touch only covering frames, the archive stays readable by a
  * plain zstd streaming decoder (skippable frame skipped), per-frame
  * checksums catch rot, and the seek table refuses typed under
  * mutation/truncation.
  */
class ZstdSeekableSpec extends AnyFunSuite {

  private val payload: Array[Byte] =
    (0 until 4000).map(i => f"line $i%05d with some repetitive content to compress")
      .mkString("\n").getBytes(US_ASCII)

  test("round trip: full-range read equals the input; frame count as declared") {
    for (frameSize <- Seq(1000, 65536, payload.length + 10)) {
      val arch = ZstdSeekable.compress(payload, frameSize)
      val table = ZstdSeekable.seekTable(arch)
      val wantFrames = (payload.length - 1) / frameSize + 1
      assert(table.numFrames == wantFrames, s"frameSize $frameSize")
      assert(table.totalDecompressed == payload.length)
      val (all, n) = ZstdSeekable.readRange(arch, table, 0, payload.length)
      assert(java.util.Arrays.equals(all, payload) && n == wantFrames)
    }
    // empty payload: a bare seek table
    val empty = ZstdSeekable.compress(Array.emptyByteArray)
    val t = ZstdSeekable.seekTable(empty)
    assert(t.numFrames == 0 && ZstdSeekable.readRange(empty, t, 0, 0)._1.isEmpty)
  }

  test("a narrow range decompresses ONLY its covering frames") {
    val arch = ZstdSeekable.compress(payload, frameSize = 1000)
    val table = ZstdSeekable.seekTable(arch)
    assert(table.numFrames > 100)
    for (off <- Seq(0L, 999L, 1000L, 50007L, payload.length - 1L)) {
      val len = math.min(50, payload.length - off).toInt
      val (got, frames) = ZstdSeekable.readRange(arch, table, off, len)
      assert(java.util.Arrays.equals(got,
        java.util.Arrays.copyOfRange(payload, off.toInt, off.toInt + len)), s"off $off")
      assert(frames <= 2, s"off $off read $frames frames for a $len-byte range")
    }
    // a frame-straddling range touches exactly the two covering frames
    val (_, n2) = ZstdSeekable.readRange(arch, table, 980, 40)
    assert(n2 == 2)
  }

  test("a plain zstd streaming decoder reads the archive whole (skippable skipped)") {
    val arch = ZstdSeekable.compress(payload, frameSize = 5000)
    val in = new com.github.luben.zstd.ZstdInputStream(
      new java.io.ByteArrayInputStream(arch))
    in.setContinuous(false)
    val back = in.readAllBytes()
    assert(java.util.Arrays.equals(back, payload))
  }

  test("frame rot is caught by the XXH64 checksum, refuses crc_mismatch") {
    val arch = ZstdSeekable.compress(payload, frameSize = 1000)
    val table = ZstdSeekable.seekTable(arch)
    // flip one byte inside the 30th frame's compressed body
    val at = table.cumCompressed(30).toInt + table.compressedSizes(30) / 2
    val m = arch.clone(); m(at) = (m(at) ^ 0x41).toByte
    ZstdSeekable.readRangeSafe(m, ZstdSeekable.seekTable(m), 30000, 100) match {
      case Left(k) => assert(Set("crc_mismatch", "bad_frame").contains(k))
      case Right(_) => fail("rotten frame served bytes")
    }
    // ranges not covering frame 30 still read fine
    assert(ZstdSeekable.readRangeSafe(m, ZstdSeekable.seekTable(m), 0, 100).isRight)
  }

  test("refusals are typed: bad magic, lying table, bomb, out-of-range, mutations") {
    val arch = ZstdSeekable.compress(payload, frameSize = 5000)
    assert(ZstdSeekable.seekTableSafe(payload) == Left("bad_magic"))
    assert(ZstdSeekable.seekTableSafe(Array[Byte](1, 2, 3)) == Left("bad_frame"))
    val table = ZstdSeekable.seekTable(arch)
    assert(ZstdSeekable.readRangeSafe(arch, table, -1, 5) == Left("bad_frame"))
    assert(ZstdSeekable.readRangeSafe(arch, table,
      payload.length.toLong - 1, 2) == Left("bad_frame"))
    val old = graft.core.Budget.maxInflatedBytes
    graft.core.Budget.maxInflatedBytes = 100
    try assert(ZstdSeekable.seekTableSafe(arch) == Left("too_large"))
    finally graft.core.Budget.maxInflatedBytes = old
    val kinds = Set("bad_magic", "bad_frame", "too_large", "crc_mismatch")
    for (pos <- (arch.length - 120) until arch.length; x <- Seq(0x01, 0x80, 0xff)) {
      val m = arch.clone(); m(pos) = (m(pos) ^ x).toByte
      ZstdSeekable.seekTableSafe(m) match {
        case Left(k) => assert(kinds.contains(k), s"pos=$pos x=$x kind=$k")
        case Right(t) =>
          ZstdSeekable.readRangeSafe(m, t, 0, payload.length) match {
            case Left(k) => assert(kinds.contains(k), s"read pos=$pos x=$x kind=$k")
            case Right((b, _)) =>
              assert(java.util.Arrays.equals(b, payload), s"silent divergence at $pos")
          }
      }
    }
    for (n <- 0 until arch.length by 7) {
      assert(ZstdSeekable.seekTableSafe(java.util.Arrays.copyOf(arch, n)).isLeft, s"cut $n")
    }
  }
}
