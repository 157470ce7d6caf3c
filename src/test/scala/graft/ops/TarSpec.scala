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
}
