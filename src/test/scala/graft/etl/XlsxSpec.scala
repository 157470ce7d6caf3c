package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** XlsxText vs the SpreadsheetML fixtures written by the independent
  * python packer (tools/make_xlsx_fixture.py): openpyxl cell.value
  * semantics — shared/inline/str/e/b/n cell types, rich-text and
  * phonetic shared strings, builtin + custom date number formats, the
  * 1900 phantom-leap-day shift and the 1904 epoch, rels-resolved sheet
  * order — plus the typed-refusal and XXE-hardening contract and the
  * writer/extractor round trip.
  */
class XlsxSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    require(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private val expected: Map[String, String] = {
    val raw = new String(fixture("xlsx_expected.json"),
      java.nio.charset.StandardCharsets.UTF_8)
    graft.etl.Json.parse(raw).asInstanceOf[graft.etl.JObj].fields.map {
      case (k, v) => k -> v.asInstanceOf[graft.etl.JStr].s
    }.toMap
  }

  test("fixture battery matches openpyxl value semantics") {
    assert(expected.size == 6)
    expected.foreach { case (name, want) =>
      assert(XlsxText.extract(fixture(s"$name.xlsx")) == want,
        s"fixture $name")
    }
  }

  test("refusals are typed: missing part, bad shared ref, XML, DOCTYPE") {
    assert(XlsxText.extractSafe(fixture("xlsx_no_workbook.xlsx")) ==
      Left("bad_xlsx"))
    assert(XlsxText.extractSafe(fixture("xlsx_bad_sharedref.xlsx")) ==
      Left("bad_xlsx"))
    assert(XlsxText.extractSafe(fixture("xlsx_malformed.xlsx")) ==
      Left("bad_xlsx"))
    // entity-expansion hardening: any DOCTYPE refuses, never expands
    assert(XlsxText.extractSafe(fixture("xlsx_doctype.xlsx")) ==
      Left("bad_xlsx"))
    assert(XlsxText.extractSafe("not a zip at all".getBytes("UTF-8")) ==
      Left("bad_zip"))
    assert(XlsxText.extractSafe(Array.emptyByteArray).isLeft)
    // a truncated healthy package refuses typed, never half-extracts
    val whole = fixture("xlsx_basic.xlsx")
    val cut = java.util.Arrays.copyOf(whole, whole.length / 2)
    assert(XlsxText.extractSafe(cut).isLeft)
  }

  test("write/extract round trip covers every cell kind") {
    import XlsxText._
    val sheets = Seq(
      "data" -> Seq(
        Seq[Cell](SStr("title 7"), SInline("free\ttext"), SNum(7)),
        Seq[Cell](SNum(2.25), SBool(true), SBool(false), SDate(45123)),
        Seq[Cell](SFormulaStr("cached"), SStr("title 7"))), // dedup'd si
      "méta" -> Seq(Seq[Cell](SStr("en"), SInline("src & co"))))
    val got = extract(write(sheets))
    assert(got ==
      "sheet\tdata\n" +
      "title 7\tfree\ttext\t7\n" +
      "2.25\tTRUE\tFALSE\t2023-07-16\n" +
      "cached\ttitle 7\n" +
      "sheet\tméta\n" +
      "en\tsrc & co")
  }

  test("extractor plug point routes .xlsx") {
    import XlsxText._
    val bytes = write(Seq("s" -> Seq(Seq[Cell](SStr("via the trait")))))
    assert(PlainTextExtractor.extract("report.XLSX", bytes) ==
      "sheet\ts\nvia the trait")
  }
}
