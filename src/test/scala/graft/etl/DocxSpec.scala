package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** DocxText vs the OOXML fixtures written by the independent python
  * packer (tools/make_docx_fixture.py): python-docx `paragraphs` text
  * semantics — body paragraphs only, tab/br/cr mapping, formatting and
  * foreign namespaces contributing nothing — plus the typed-refusal and
  * XXE-hardening contract, and the writer/extractor round trip.
  */
class DocxSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    require(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private val expected: Map[String, String] = {
    val raw = new String(fixture("docx_expected.json"),
      java.nio.charset.StandardCharsets.UTF_8)
    graft.etl.Json.parse(raw).asInstanceOf[graft.etl.JObj].fields.map {
      case (k, v) => k -> v.asInstanceOf[graft.etl.JStr].s
    }.toMap
  }

  test("fixture battery matches python-docx paragraph-text semantics") {
    assert(expected.size == 6)
    expected.foreach { case (name, want) =>
      assert(DocxText.extract(fixture(name)) == want, s"fixture $name")
    }
  }

  test("refusals are typed: missing part, malformed XML, DOCTYPE (XXE)") {
    assert(DocxText.extractSafe(fixture("docx_no_part.docx")) == Left("bad_docx"))
    assert(DocxText.extractSafe(fixture("docx_malformed.docx")) == Left("bad_docx"))
    // entity-expansion hardening: any DOCTYPE refuses, never expands
    assert(DocxText.extractSafe(fixture("docx_doctype.docx")) == Left("bad_docx"))
    assert(DocxText.extractSafe("not a zip at all".getBytes("UTF-8")) ==
      Left("bad_zip"))
    assert(DocxText.extractSafe(Array.emptyByteArray).isLeft)
  }

  test("write/extract round trip is lossless for tabs and breaks") {
    val paras = Seq("title 42", "plain body text with words",
      "meta\ten\nsecond line", "", "tail ünïcode & <chars>")
    val got = DocxText.extract(DocxText.write(paras))
    assert(got == paras.mkString("\n"))
  }

  test("extractor plug point routes .docx") {
    val bytes = DocxText.write(Seq("via the trait"))
    assert(PlainTextExtractor.extract("report.DOCX", bytes) == "via the trait")
  }
}
