package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** Locks on the ODS extractor (graft.etl.OdsText): writer round trip
  * over typed cells, the ODF repeat/trim semantics (number-columns/
  * rows-repeated expansion, trailing-empty trimming, the giant-repeat
  * bomb refusal), covered-cell merge shadows, and the family contract
  * (typed refusals, mutation totality).
  */
class OdsSpec extends AnyFunSuite {

  import OdsText._

  private def pkg(contentBody: String): Array[Byte] = {
    val content =
      """<?xml version="1.0" encoding="UTF-8"?>""" +
        """<office:document-content""" +
        """ xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"""" +
        """ xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"""" +
        """ xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"""" +
        """ office:version="1.2"><office:body><office:spreadsheet>""" +
        contentBody + """</office:spreadsheet></office:body></office:document-content>"""
    graft.ops.Zip.write(Seq(
      graft.ops.Zip.ZipMember("mimetype",
        "application/vnd.oasis.opendocument.spreadsheet".getBytes(UTF_8)),
      graft.ops.Zip.ZipMember("content.xml", content.getBytes(UTF_8))))
  }

  test("writer round trip: strings, numbers, booleans, dates, two sheets") {
    val ods = write(Seq(
      "data" -> Seq(
        Seq(OStr("title"), OStr("multi\nline"), ONum(42)),
        Seq(ONum(3.5), OBool(true), ODate("2026-08-17"))),
      "meta" -> Seq(Seq(OStr("en"), OBool(false)))))
    val got = extract(ods)
    assert(got ==
      "sheet\tdata\ntitle\tmulti\nline\t42\n3.5\tTRUE\t2026-08-17\n" +
        "sheet\tmeta\nen\tFALSE")
  }

  test("repeat expansion and trailing-empty trimming") {
    val got = extract(pkg(
      """<table:table table:name="s"><table:table-row>""" +
        """<table:table-cell office:value-type="string" table:number-columns-repeated="3"><text:p>x</text:p></table:table-cell>""" +
        """<table:table-cell table:number-columns-repeated="1000"/>""" +
        """</table:table-row>""" +
        """<table:table-row table:number-rows-repeated="2">""" +
        """<table:table-cell office:value-type="float" office:value="7"/>""" +
        """</table:table-row>""" +
        """<table:table-row table:number-rows-repeated="100000"/>""" +
        """</table:table>"""))
    assert(got == "sheet\ts\nx\tx\tx\n7\n7")
  }

  test("covered cells are merge shadows (empty), interior empties kept") {
    val got = extract(pkg(
      """<table:table table:name="m"><table:table-row>""" +
        """<table:table-cell office:value-type="string"><text:p>a</text:p></table:table-cell>""" +
        """<table:covered-table-cell/>""" +
        """<table:table-cell office:value-type="string"><text:p>c</text:p></table:table-cell>""" +
        """</table:table-row></table:table>"""))
    assert(got == "sheet\tm\na\t\tc")
  }

  test("a giant repeat on NON-empty content refuses; on empties it trims") {
    val bomb = pkg(
      """<table:table table:name="b"><table:table-row>""" +
        """<table:table-cell office:value-type="string" table:number-columns-repeated="2000000"><text:p>x</text:p></table:table-cell>""" +
        """</table:table-row></table:table>""")
    assert(extractSafe(bomb) == Left("bad_ods"))
    val pad = pkg(
      """<table:table table:name="p"><table:table-row>""" +
        """<table:table-cell office:value-type="string"><text:p>y</text:p></table:table-cell>""" +
        """<table:table-cell table:number-columns-repeated="16384"/>""" +
        """</table:table-row></table:table>""")
    assert(extract(pad) == "sheet\tp\ny")
  }

  test("typed refusals: mimetype, missing content, bad value-type, bad boolean") {
    val odt = OdtText.write(Seq("prose")) // a TEXT package is still opendocument
    assert(OdsText.extract(odt) == "") // no spreadsheet: empty, not a crash
    assert(extractSafe("junk".getBytes(UTF_8)).isLeft)
    assert(extractSafe(pkg("""<table:table table:name="t"><table:table-row><table:table-cell office:value-type="martian"/></table:table-row></table:table>""")) == Left("bad_ods"))
    assert(extractSafe(pkg("""<table:table table:name="t"><table:table-row><table:table-cell office:value-type="boolean" office:boolean-value="perhaps"/></table:table-row></table:table>""")) == Left("bad_ods"))
    assert(extractSafe(pkg("""<table:table table:name="t"><table:table-row><table:table-cell office:value-type="float" office:value="NaNope"/></table:table-row></table:table>""")) == Left("bad_ods"))
  }

  test("mutation totality: single-byte flips refuse typed or extract") {
    val bytes = write(Seq("mut" -> Seq(Seq(OStr("target"), ONum(1), OBool(true)))))
    val kinds = Set("bad_ods", "bad_zip", "truncated", "too_large")
    for (i <- bytes.indices; bit <- Seq(0x01, 0x80)) {
      val m = bytes.clone(); m(i) = (m(i) ^ bit).toByte
      extractSafe(m) match {
        case Left(k) => assert(kinds.contains(k), s"flip @$i/$bit -> untyped $k")
        case Right(_) => ()
      }
    }
  }
}
