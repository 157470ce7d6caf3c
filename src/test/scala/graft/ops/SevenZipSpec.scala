package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.US_ASCII

/** Locks on the 7z container (graft.ops.SevenZip).
  *
  * Independence is pinned two ways: fixture archives whose payloads were
  * compressed by CPython's `lzma` (real liblzma raw LZMA1/LZMA2 streams,
  * tools/make_7z_fixture.py — LZMA2 solid, LZMA1 end-marker streams,
  * Copy folders, per-file folders, encoded headers, empty files, unicode
  * names) parse bit-exact against a JSON manifest; and our writer
  * (tukaani LZMA1 encoder + hand-rolled header) round-trips through our
  * hand-rolled reader. Plus the standing container contract: typed
  * fail-stop refusals on every header/CRC lie, budget caps, mutation
  * totality.
  */
class SevenZipSpec extends AnyFunSuite {

  import SevenZip.SzMember

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private def ascii(s: String): Array[Byte] = s.getBytes(US_ASCII)

  private val members = Seq(
    SzMember("docs/0.txt", ascii("the quick brown fox jumps over the lazy dog " * 40)),
    SzMember("docs/1.txt", ascii("""{"id":1,"text":"seven zip spec body"}""")),
    SzMember("docs/empty.txt", Array.emptyByteArray),
    SzMember("läng/ünïcode-名前.txt", ascii("unicode named payload")),
    SzMember("z.bin", Array.tabulate(4096)(i => (i * 31 + 7).toByte)))

  private def withBudget[A](bytes: Long)(f: => A): A = {
    val old = graft.core.Budget.maxInflatedBytes
    graft.core.Budget.maxInflatedBytes = bytes
    try f finally graft.core.Budget.maxInflatedBytes = old
  }

  test("round trip: names, bodies, order, empty files, unicode") {
    val back = SevenZip.read(SevenZip.write(members))
    assert(back.map(_.name) == members.map(_.name))
    back.zip(members).foreach { case (g, w) =>
      assert(java.util.Arrays.equals(g.body, w.body), w.name)
    }
  }

  test("deterministic writer: identical inputs yield identical bytes") {
    assert(java.util.Arrays.equals(SevenZip.write(members), SevenZip.write(members)))
  }

  test("empty archive and all-empty members") {
    assert(SevenZip.read(SevenZip.write(Seq.empty)).isEmpty)
    val empties = Seq(SzMember("a", Array.emptyByteArray), SzMember("b", Array.emptyByteArray))
    val back = SevenZip.read(SevenZip.write(empties))
    assert(back.map(_.name) == Seq("a", "b"))
    assert(back.forall(_.body.isEmpty))
  }

  test("single member and a many-member solid block") {
    val one = Seq(SzMember("only.txt", ascii("solo")))
    assert(SevenZip.read(SevenZip.write(one)).head.name == "only.txt")
    val many = (0 until 300).map(i => SzMember(s"m/$i.txt", ascii(s"body $i " * (i % 9 + 1))))
    val back = SevenZip.read(SevenZip.write(many))
    assert(back.map(_.name) == many.map(_.name))
    back.zip(many).foreach { case (g, w) => assert(java.util.Arrays.equals(g.body, w.body)) }
  }

  test("liblzma fixtures parse to the manifest (lzma2 solid, lzma1 end-marker, copy, per-file folders, encoded header, bcj chain refusal)") {
    val manifest = new String(fixture("7z_manifest.json"),
      java.nio.charset.StandardCharsets.UTF_8)
    // manifest: one line per archive: name TAB refusal("-"=accept) TAB n TAB join(name=md5)
    manifest.split("\n").filter(_.nonEmpty).foreach { line =>
      val parts = line.split("\t")
      val (fname, want) = (parts(0), parts(1))
      val got = SevenZip.readSafe(fixture(fname))
      if (want == "-") {
        val ms = got.fold(k => fail(s"$fname refused: $k"), identity)
        assert(ms.length == parts(2).toInt, s"$fname member count")
        val wantDigests = if (parts.length > 3) parts(3) else ""
        val gotDigests = ms.map { m =>
          val md = java.security.MessageDigest.getInstance("MD5")
          s"${m.name}=${md.digest(m.body).map(b => f"$b%02x").mkString}"
        }.mkString(",")
        assert(gotDigests == wantDigests, s"$fname contents")
      } else assert(got == Left(want), s"$fname refusal")
    }
  }

  test("typed refusals: magic, signature CRC, header CRC, truncation") {
    val good = SevenZip.write(members)
    val notMagic = good.clone(); notMagic(0) = 'Z'
    assert(SevenZip.readSafe(notMagic) == Left("bad_magic"))
    val sigLie = good.clone(); sigLie(12) = (sigLie(12) ^ 1).toByte // next-header offset
    assert(SevenZip.readSafe(sigLie) == Left("bad_crc"))
    val hdrLie = good.clone(); hdrLie(good.length - 1) = (hdrLie(good.length - 1) ^ 1).toByte
    assert(SevenZip.readSafe(hdrLie) == Left("bad_crc"))
    assert(SevenZip.readSafe(java.util.Arrays.copyOf(good, 20)) == Left("truncated"))
    assert(SevenZip.readSafe(java.util.Arrays.copyOf(good, good.length - 3)) == Left("truncated"))
  }

  test("payload corruption is caught by substream CRCs") {
    val good = SevenZip.write(members)
    // pack stream starts at 32; flip a byte deep in the LZMA1 body
    val lie = good.clone(); lie(80) = (lie(80) ^ 0x40).toByte
    val got = SevenZip.readSafe(lie)
    assert(got.isLeft, "corrupt payload must refuse")
    assert(Set("bad_crc", "bad_7z", "bad_frame", "too_large").contains(got.left.toOption.get))
  }

  test("declared-size budget refuses before decode") {
    withBudget(1024) {
      val big = Seq(SzMember("big.txt", ascii("x" * 4096)))
      val bytes = withBudget(1L << 30)(SevenZip.write(big))
      assert(SevenZip.readSafe(bytes) == Left("too_large"))
    }
  }

  test("mutation totality: every single-byte flip refuses typed or parses") {
    val bytes = SevenZip.write(members.take(2))
    val kinds = Set("bad_magic", "bad_7z", "bad_crc", "truncated", "unsupported",
      "encrypted", "too_large", "bad_frame")
    for (i <- bytes.indices; bit <- Seq(0x01, 0x80)) {
      val m = bytes.clone(); m(i) = (m(i) ^ bit).toByte
      SevenZip.readSafe(m) match {
        case Left(k) => assert(kinds.contains(k), s"flip @$i/$bit -> untyped $k")
        case Right(_) => // a flip in slack space that still parses is fine
      }
    }
  }
}
