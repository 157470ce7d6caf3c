package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.US_ASCII

/** USTAR layer: header round trip, 512-block padding, checksum audit,
  * octal validation, WebDataset sample grouping, typed refusals.
  */
class TarSpec extends AnyFunSuite {

  private def e(name: String, body: String) =
    Tar.TarEntry(name, body.getBytes(US_ASCII))

  test("round trip preserves names, bodies, order; blocks are 512-aligned") {
    val entries = Seq(e("0.txt", "alpha"), e("0.cls", "en"),
      e("1.txt", "b" * 600), e("1.cls", ""))
    val bytes = Tar.write(entries)
    assert(bytes.length % 512 == 0)
    val back = Tar.read(bytes)
    assert(back.map(_.name) == entries.map(_.name))
    assert(back.map(t => new String(t.body, US_ASCII)) ==
      Seq("alpha", "en", "b" * 600, ""))
  }

  test("WebDataset samples group by stem in first-appearance order") {
    val smp = Tar.samples(Seq(e("7.txt", "t7"), e("7.cls", "en"),
      e("3.txt", "t3"), e("3.cls", "fr"), e("noext", "x")))
    assert(smp.map(_._1) == Seq("7", "3", "noext"))
    assert(new String(smp.head._2("txt"), US_ASCII) == "t7")
    assert(new String(smp.head._2("cls"), US_ASCII) == "en")
    assert(smp(2)._2.keySet == Set(""))
  }

  test("a flipped header byte is a typed bad_checksum refusal") {
    val b = Tar.write(Seq(e("0.txt", "body"))).clone()
    b(3) = (b(3) ^ 0x15).toByte
    assert(Tar.readSafe(b) == Left("bad_checksum"))
  }

  test("tail truncation is a typed truncated refusal") {
    val b = Tar.write(Seq(e("0.txt", "body")))
    assert(Tar.readSafe(java.util.Arrays.copyOf(b, b.length - 700)) ==
      Left("truncated"))
    // cutting into member data is also truncated
    assert(Tar.readSafe(java.util.Arrays.copyOf(b, 600)) == Left("truncated"))
  }

  test("garbage octal in the size field refuses bad_octal") {
    val b = Tar.write(Seq(e("0.txt", "body"))).clone()
    // rewrite size field with a non-octal char and refresh nothing:
    // checksum now mismatches first, so patch checksum bytes to spaces
    // is not possible — instead corrupt the size field AND recompute the
    // stored checksum so the octal path is what trips
    b(124) = '9'
    var sum = 0L
    var i = 0
    while (i < 512) { sum += (if (i >= 148 && i < 156) ' '.toInt else b(i) & 0xff); i += 1 }
    val cs = "%06o".format(sum).getBytes(US_ASCII)
    System.arraycopy(cs, 0, b, 148, 6); b(154) = 0; b(155) = ' '
    assert(Tar.readSafe(b) == Left("bad_octal"))
  }

  test("directories and links are skipped, not refused") {
    val dir = Tar.write(Seq(e("d/", ""))).clone()
    dir(156) = '5' // directory typeflag
    var sum = 0L
    var i = 0
    while (i < 512) { sum += (if (i >= 148 && i < 156) ' '.toInt else dir(i) & 0xff); i += 1 }
    val cs = "%06o".format(sum).getBytes(US_ASCII)
    System.arraycopy(cs, 0, dir, 148, 6); dir(154) = 0; dir(155) = ' '
    assert(Tar.read(dir).isEmpty)
  }

  test("pax long/unicode names round trip through the auto-pax writer") {
    val longName = "deep/" + ("d" * 40 + "/") * 3 + "x" * 60 + ".txt"
    assert(longName.getBytes(US_ASCII).length > 100)
    val uni = "data/ünïcode-名前.txt"
    val entries = Seq(
      Tar.TarEntry("short.txt", "a".getBytes(US_ASCII)),
      Tar.TarEntry(longName, "long body".getBytes(US_ASCII)),
      Tar.TarEntry(uni, "uni body".getBytes(US_ASCII)))
    val back = Tar.read(Tar.write(entries))
    assert(back.map(_.name) == entries.map(_.name))
    assert(back.map(b => new String(b.body, "UTF-8")) ==
      Seq("a", "long body", "uni body"))
  }

  test("GNU 'L' long-name members apply to the next member") {
    // hand-build: an 'L' member whose data is the real name, then the
    // regular member with a truncated header name
    val real = "gnu/" + "n" * 120 + ".bin"
    val nameData = (real + "\u0000").getBytes(US_CHARSET)
    val l = rawHeader("././@LongLink", nameData.length, 'L') ++ nameData ++
      new Array[Byte]((512 - nameData.length % 512) % 512)
    val body = "payload".getBytes(US_ASCII)
    val f = rawHeader("gnu/truncated", body.length, '0') ++ body ++
      new Array[Byte]((512 - body.length % 512) % 512)
    val tar = l ++ f ++ new Array[Byte](1024)
    val back = Tar.read(tar)
    assert(back.map(_.name) == Seq(real))
    assert(new String(back.head.body, "UTF-8") == "payload")
  }

  test("pax global header sets a default later 'x' headers override") {
    val g = paxMember('g', " path=global.name\n")
    val x = paxMember('x', " path=local.name\n")
    val body = "b".getBytes(US_ASCII)
    def file(n: String) = rawHeader(n, body.length, '0') ++ body ++
      new Array[Byte](511)
    val tar = g ++ file("a") ++ x ++ file("b") ++ file("c") ++
      new Array[Byte](1024)
    // member 1: global applies; member 2: local x wins; member 3: global again
    assert(Tar.read(tar).map(_.name) ==
      Seq("global.name", "local.name", "global.name"))
  }

  test("base-256 size field (the >8 GiB encoding) parses on small values") {
    val body = "0123456789".getBytes(US_ASCII)
    val h = rawHeader("b256.bin", 0, '0')
    // overwrite the size field with base-256: high bit + big-endian value
    java.util.Arrays.fill(h, 124, 136, 0.toByte)
    h(124) = 0x80.toByte
    h(135) = body.length.toByte
    reChecksum(h)
    val tar = h ++ body ++ new Array[Byte](512 - body.length) ++
      new Array[Byte](1024)
    val back = Tar.read(tar)
    assert(back.head.name == "b256.bin" &&
      new String(back.head.body, "UTF-8") == "0123456789")
  }

  test("ustar prefix field joins the name on POSIX magic only") {
    val body = "b".getBytes(US_ASCII)
    // POSIX header ("ustar\0" + "00"): prefix at 345 joins with '/'
    val posix = rawHeader("leaf.txt", body.length, '0')
    val pfx = "deep/dir".getBytes(US_ASCII)
    System.arraycopy(pfx, 0, posix, 345, pfx.length)
    reChecksum(posix)
    val tar1 = posix ++ body ++ new Array[Byte](511) ++ new Array[Byte](1024)
    assert(Tar.read(tar1).head.name == "deep/dir/leaf.txt")
    // GNU-format magic ("ustar  \0") stores atime/ctime octal at 345 —
    // the prefix field must NOT be honored there (round-16 advice: the
    // 5-byte "ustar" check matched GNU headers and silently renamed
    // members with their atime)
    val gnu = rawHeader("leaf.txt", body.length, '0')
    val gmagic = "ustar  ".getBytes(US_ASCII) // 'ustar ' magic + ' \0' version
    System.arraycopy(gmagic, 0, gnu, 257, gmagic.length)
    gnu(264) = 0
    val atime = "00000001750 ".getBytes(US_ASCII) // oldgnu atime octal
    System.arraycopy(atime, 0, gnu, 345, atime.length)
    reChecksum(gnu)
    val tar2 = gnu ++ body ++ new Array[Byte](511) ++ new Array[Byte](1024)
    assert(Tar.read(tar2).head.name == "leaf.txt")
  }

  test("malformed pax records refuse typed") {
    val bad = paxMember('x', "path-without-equals\n") // no len prefix either
    assert(Tar.readSafe(bad ++ new Array[Byte](1024)) == Left("bad_header"))
    val lies = paxMember('x', " path=ok\n", lieLen = 99)
    assert(Tar.readSafe(lies ++ new Array[Byte](1024)) == Left("bad_header"))
  }

  // helpers for the hand-built pax/GNU cases
  private val US_CHARSET = java.nio.charset.StandardCharsets.UTF_8

  private def rawHeader(name: String, size: Int, typeflag: Char): Array[Byte] = {
    val h = new Array[Byte](512)
    val nb = name.getBytes(US_ASCII)
    System.arraycopy(nb, 0, h, 0, nb.length)
    def oct(off: Int, width: Int, v: Long): Unit = {
      val b = ("%0" + (width - 1) + "o").format(v).getBytes(US_ASCII)
      System.arraycopy(b, 0, h, off, b.length)
    }
    oct(100, 8, 420); oct(108, 8, 0); oct(116, 8, 0)
    oct(124, 12, size.toLong); oct(136, 12, 0L)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    h(156) = typeflag.toByte
    val u = "ustar".getBytes(US_ASCII)
    System.arraycopy(u, 0, h, 257, u.length)
    h(263) = '0'; h(264) = '0'
    reChecksum(h)
    h
  }

  private def reChecksum(h: Array[Byte]): Unit = {
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L; var i = 0
    while (i < 512) { sum += h(i) & 0xff; i += 1 }
    val cs = "%06o".format(sum).getBytes(US_ASCII)
    System.arraycopy(cs, 0, h, 148, 6); h(154) = 0; h(155) = ' '
  }

  private def paxMember(tf: Char, record: String, lieLen: Int = -1): Array[Byte] = {
    val payload = record.getBytes(US_CHARSET)
    val rec =
      if (record.startsWith(" ")) {
        var len = if (lieLen > 0) lieLen else {
          var l = payload.length + 1
          while (s"$l".length + payload.length != l)
            l = s"$l".length + payload.length
          l
        }
        s"$len".getBytes(US_ASCII) ++ payload
      } else payload
    rawHeader("pax", rec.length, tf) ++ rec ++
      new Array[Byte]((512 - rec.length % 512) % 512)
  }
}
