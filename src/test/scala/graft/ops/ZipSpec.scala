package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Locks on the round-15 zip hardening: the streamed member list must
  * agree with the central directory (the JDK stream treats corrupt local
  * magics as clean EOF, silently truncating), and the zip64 boundary
  * refuses typed rather than mis-counting.
  */
class ZipSpec extends AnyFunSuite {

  private def archive(n: Int): Array[Byte] =
    Zip.write((0 until n).map(i =>
      Zip.ZipMember(s"m$i.txt", s"body $i".getBytes("UTF-8"))))

  test("round trip and central-directory agreement") {
    val a = archive(3)
    assert(Zip.read(a).map(_.name) == Seq("m0.txt", "m1.txt", "m2.txt"))
    // corrupt the SECOND local magic: the JDK stream stops early, the
    // central directory still declares 3 — must refuse, never truncate
    val at = a.indexOfSlice("PK".getBytes("ISO-8859-1"), 4)
    assert(at > 0)
    val cut = a.clone(); cut(at + 3) = 9
    assert(Zip.readSafe(cut) == Left("bad_zip"))
    // corrupt a CENTRAL name: streamed and central lists disagree
    val cat = a.indexOfSlice("PK".getBytes("ISO-8859-1"))
    assert(cat > 0)
    val cname = a.clone(); cname(cat + 46) = 'X'
    assert(Zip.readSafe(cname) == Left("bad_zip"))
  }

  test("zip64 EOCD sentinel refuses typed (entry count 0xFFFF)") {
    val a = archive(2)
    // EOCD total-entries field at eocd+10; the 0xFFFF sentinel means the
    // real count lives in a zip64 record this reader does not walk
    val e = a.lastIndexOfSlice("PK".getBytes("ISO-8859-1"))
    assert(e > 0)
    val z64 = a.clone()
    z64(e + 10) = 0xff.toByte; z64(e + 11) = 0xff.toByte
    assert(Zip.readSafe(z64) == Left("bad_zip"))
  }

  test("missing EOCD refuses typed") {
    val a = archive(1)
    assert(Zip.readSafe(java.util.Arrays.copyOf(a, a.length - 4)).isLeft)
  }
}
