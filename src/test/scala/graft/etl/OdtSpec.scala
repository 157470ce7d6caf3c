package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8
import graft.etl.{Json, JObj, JStr, JVal}

/** Locks on the ODT extractor (graft.etl.OdtText).
  *
  * Fixtures are spec-correct ODF 1.2 packages built by
  * tools/make_odt_fixture.py (stored-first mimetype, python zipfile
  * deflate — a foreign zip writer), pinned to the linear teletype-walk
  * expectations in odt_expected.json. Plus the family contract: our
  * writer round-trips through our extractor, refusal twins stay typed
  * (foreign mimetype, missing content.xml, malformed XML, DOCTYPE
  * smuggling), and single-byte mutation is total.
  */
class OdtSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private lazy val expected: Map[String, String] =
    Json.parse(new String(fixture("odt_expected.json"), UTF_8)) match {
      case JObj(fs) => fs.collect { case (k, JStr(s)) => k -> s }.toMap
      case other => fail(s"bad expected json: $other")
    }

  test("python-zipfile ODF packages extract to the teletype expectations") {
    for ((name, want) <- expected) {
      val got = OdtText.extract(fixture(s"odt_$name.odt"))
      assert(got == want, s"odt_$name")
    }
  }

  test("refusal twins: foreign mimetype, missing content, bad xml, doctype") {
    assert(OdtText.extractSafe(fixture("odt_foreign_mime.odt")) == Left("bad_odt"))
    assert(OdtText.extractSafe(fixture("odt_no_content.odt")) == Left("bad_odt"))
    assert(OdtText.extractSafe(fixture("odt_bad_xml.odt")) == Left("bad_odt"))
    assert(OdtText.extractSafe(fixture("odt_doctype.odt")) == Left("bad_odt"))
    assert(OdtText.extractSafe("not a zip at all".getBytes(UTF_8)).isLeft)
  }

  test("writer round trip: paragraphs, tabs, newlines, space runs, escapes") {
    val paras = Seq(
      "plain paragraph",
      "tab\there and a\nline break",
      "spaced    out     runs",
      "xml <specials> & \"quotes\"",
      "",
      "ünïcode — € ¥ 中文")
    val got = OdtText.extract(OdtText.write(paras))
    assert(got == paras.mkString("\n"))
  }

  test("budget cap: a text:s bomb refuses typed, never allocates") {
    val bomb = OdtText.write(Seq("x")) // then swap in a hostile content.xml
    val hostile = graft.ops.Zip.write(graft.ops.Zip.read(bomb).map(m =>
      if (m.name == "content.xml")
        m.copy(body = ("""<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">""" +
          """<office:body><office:text><text:p>""" +
          """<text:s text:c="999999999"/>""" * 8 +
          "</text:p></office:text></office:body></office:document-content>")
          .getBytes(UTF_8))
      else m))
    assert(OdtText.extractSafe(hostile) == Left("bad_odt"))
  }

  test("mutation totality: single-byte flips refuse typed or extract") {
    val bytes = OdtText.write(Seq("mutation target paragraph", "second"))
    val kinds = Set("bad_odt", "bad_zip", "truncated", "too_large")
    for (i <- bytes.indices; bit <- Seq(0x01, 0x80)) {
      val m = bytes.clone(); m(i) = (m(i) ^ bit).toByte
      OdtText.extractSafe(m) match {
        case Left(k) => assert(kinds.contains(k), s"flip @$i/$bit -> untyped $k")
        case Right(_) => ()
      }
    }
  }
}
