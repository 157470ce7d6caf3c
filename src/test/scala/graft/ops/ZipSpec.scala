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

  test("zip64 sentinel WITHOUT a locator refuses typed (lying EOCD)") {
    val a = archive(2)
    // EOCD total-entries field at eocd+10; the 0xFFFF sentinel promises a
    // zip64 locator immediately before the EOCD — absent here, so refuse
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

  test("zip64 round trip (forced sentinels + locator + 64-bit extras)") {
    val members = (0 until 5).map(i =>
      Zip.ZipMember(s"part$i/data.jsonl",
        ("x" * (100 + 37 * i) + s"#$i").getBytes("UTF-8")))
    val a = Zip.writeZip64(members)
    // the classic EOCD must carry the sentinels (that's what forces the
    // zip64 path) and the archive must round-trip bit-exact
    val e = a.length - 22
    assert((a(e + 10) & 0xff) == 0xff && (a(e + 11) & 0xff) == 0xff)
    val back = Zip.read(a)
    assert(back.map(_.name) == members.map(_.name))
    assert(back.zip(members).forall { case (b, m) =>
      java.util.Arrays.equals(b.body, m.body) })
    // determinism: identical input, identical bytes
    assert(java.util.Arrays.equals(Zip.writeZip64(members), a))
  }

  test("zip64 corrupt locator offset refuses typed") {
    val a = Zip.writeZip64(Seq(Zip.ZipMember("a.txt", "hello".getBytes("UTF-8"))))
    val loc = a.length - 22 - 20
    assert(a(loc) == 'P' && a(loc + 1) == 'K' && a(loc + 2) == 6 && a(loc + 3) == 7)
    val bad = a.clone(); bad(loc + 8) = 0x77.toByte; bad(loc + 12) = 0x7f.toByte
    assert(Zip.readSafe(bad) == Left("bad_zip"))
    // nudging the locator past the real zip64 EOCD also refuses
    val cut = a.clone(); cut(loc + 8) = (a(loc + 8) + 4).toByte
    assert(Zip.readSafe(cut) == Left("bad_zip"))
  }

  test("exactly 65535 entries with a plain EOCD is legal, not a zip64 sentinel") {
    // APPNOTE permits an archive with exactly 0xFFFF entries and no
    // zip64 record (python zipfile accepts it); treating the count
    // unconditionally as a zip64 sentinel was a false typed refusal
    // (round-16 advice). Build the raw layout: stored empty entries.
    val n = 0xffff
    val out = new java.io.ByteArrayOutputStream(n * 90)
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def w32(v: Long): Unit = { w16((v & 0xffff).toInt); w16(((v >>> 16) & 0xffff).toInt) }
    val names = Array.tabulate(n)(i => f"f$i%05d".getBytes("US-ASCII"))
    val localOff = new Array[Long](n)
    var i = 0
    while (i < n) {
      localOff(i) = out.size().toLong
      out.write('P'); out.write('K'); out.write(3); out.write(4)
      w16(20); w16(0); w16(0) // version, flags, method=stored
      w16(0); w16(0x21) // DOS time/date (1980-01-01)
      w32(0); w32(0); w32(0) // crc, csize, usize: empty body
      w16(names(i).length); w16(0)
      out.write(names(i))
      i += 1
    }
    val cdStart = out.size().toLong
    i = 0
    while (i < n) {
      out.write('P'); out.write('K'); out.write(1); out.write(2)
      w16(20); w16(20); w16(0); w16(0)
      w16(0); w16(0x21); w32(0); w32(0); w32(0)
      w16(names(i).length); w16(0); w16(0)
      w16(0); w16(0); w32(0)
      w32(localOff(i))
      out.write(names(i))
      i += 1
    }
    val cdLen = out.size().toLong - cdStart
    out.write('P'); out.write('K'); out.write(5); out.write(6)
    w16(0); w16(0); w16(0xffff); w16(0xffff)
    w32(cdLen); w32(cdStart); w16(0)
    val members = Zip.read(out.toByteArray)
    assert(members.length == n)
    assert(members.head.name == "f00000" && members.last.name == "f65534")
    assert(members.forall(_.body.isEmpty))
  }

  test("central directory ordered differently from local layout is accepted") {
    // APPNOTE does not require central records to mirror local order;
    // membership agreement is the contract (round-16 ADVICE item)
    val a = Zip.writeZip64(Seq(
      Zip.ZipMember("b.txt", "bee".getBytes("UTF-8")),
      Zip.ZipMember("a.txt", "ay".getBytes("UTF-8"))))
    // swap the two central records in place (equal-length names keep all
    // offsets valid; each record carries its own local-header offset)
    def find(n: Int, from: Int): Int = {
      var p = from
      while (!(a(p) == 'P' && a(p + 1) == 'K' && a(p + 2) == 1 && a(p + 3) == 2))
        p += 1
      p
    }
    val c1 = find(1, 0)
    val c2 = find(2, c1 + 4)
    val recLen = c2 - c1
    val swapped = a.clone()
    System.arraycopy(a, c2, swapped, c1, recLen)
    System.arraycopy(a, c1, swapped, c1 + recLen, recLen)
    val back = Zip.read(swapped)
    assert(back.map(_.name) == Seq("b.txt", "a.txt"))
  }
}
