package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** PptxText vs the PresentationML fixtures written by the independent
  * python packer (tools/make_pptx_fixture.py): python-pptx slide-text
  * semantics — sldIdLst + rels order (never filenames), a:t runs,
  * a:br breaks, cached a:fld text, table-cell text bodies — plus the
  * typed-refusal and XXE-hardening contract and the writer/extractor
  * round trip.
  */
class PptxSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    require(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private val expected: Map[String, String] = {
    val raw = new String(fixture("pptx_expected.json"),
      java.nio.charset.StandardCharsets.UTF_8)
    graft.etl.Json.parse(raw).asInstanceOf[graft.etl.JObj].fields.map {
      case (k, v) => k -> v.asInstanceOf[graft.etl.JStr].s
    }.toMap
  }

  test("fixture battery matches python-pptx slide-text semantics") {
    assert(expected.size == 2)
    expected.foreach { case (name, want) =>
      assert(PptxText.extract(fixture(s"$name.pptx")) == want,
        s"fixture $name")
    }
  }

  test("refusals are typed: missing parts, dangling rel, XML, DOCTYPE") {
    assert(PptxText.extractSafe(fixture("pptx_no_part.pptx")) ==
      Left("bad_pptx"))
    assert(PptxText.extractSafe(fixture("pptx_dangling_rel.pptx")) ==
      Left("bad_pptx"))
    assert(PptxText.extractSafe(fixture("pptx_malformed.pptx")) ==
      Left("bad_pptx"))
    assert(PptxText.extractSafe(fixture("pptx_doctype.pptx")) ==
      Left("bad_pptx"))
    assert(PptxText.extractSafe("not a zip at all".getBytes("UTF-8")) ==
      Left("bad_zip"))
    assert(PptxText.extractSafe(Array.emptyByteArray).isLeft)
  }

  test("write/extract round trip covers breaks, order, empty slides") {
    val slides = Seq(
      Seq("Deck 9", "intro\nwith break"),
      Seq.empty[String],
      Seq("final & <slide>"))
    val got = PptxText.extract(PptxText.write(slides))
    assert(got == "Deck 9\nintro\nwith break\n\nfinal & <slide>")
  }

  test("extractor plug point routes .pptx") {
    val bytes = PptxText.write(Seq(Seq("via the trait")))
    assert(PlainTextExtractor.extract("deck.PpTx", bytes) == "via the trait")
  }
}
