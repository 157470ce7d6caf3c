package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.US_ASCII

/** Locks on the RTF extractor (graft.etl.RtfText): hand-built documents
  * exercising the RTF 1.9.1 grammar features the published spec and
  * the striprtf baseline agree on — control-word parameters and
  * delimiters, `\'hh` cp1252 escapes, `\uN`/`\ucN` unicode with
  * fallback skipping, skipped destinations and starred groups, escaped
  * braces, group-scoped state — plus writer round trip, typed
  * refusals, and mutation totality.
  */
class RtfSpec extends AnyFunSuite {

  private def x(s: String): String =
    RtfText.extract(s.getBytes(US_ASCII))

  test("paragraphs, tabs, and control-word delimiters") {
    assert(x("""{\rtf1\ansi Hello\par World}""") == "Hello\nWorld")
    assert(x("""{\rtf1 a\tab b\line c}""") == "a\tb\nc")
    // the single space after a control word is the delimiter, eaten;
    // further spaces are content
    assert(x("""{\rtf1\ansi  two spaces}""") == " two spaces")
    // a digit parameter ends the word; no space needed
    assert(x("""{\rtf1\fs24 sized}""") == "sized")
  }

  test("cp1252 hex escapes and raw high bytes") {
    assert(x("""{\rtf1 caf\'e9 \'80uro}""") == "café €uro")
    val raw = ("{\\rtf1 na" + '\u00EF' + "ve}")
      .getBytes(java.nio.charset.Charset.forName("windows-1252"))
    assert(RtfText.extract(raw) == "naïve")
  }

  test("unicode \\uN with \\uc fallback skipping") {
    // NOTE: \\u spelled via concatenation \u2014 scalac eats \uXXXX even in
    // triple quotes
    val bu = "\\" + "u"
    assert(x(s"{\\rtf1\\uc1 ${bu}228?gypten}") == "\u00e4gypten")
    assert(x(s"{\\rtf1\\uc2 ${bu}1090??ext}") == "\u0442ext")
    // negative code units wrap (signed 16-bit)
    assert(x(s"{\\rtf1\\uc1 ${bu}-255?}") == "\uff01")
    // uc is group-scoped: the closing brace restores the outer count
    assert(x(s"{\\rtf1\\uc1 {\\uc3 ${bu}65?ab}${bu}66?B}") == "ABB")
  }

  test("skipped destinations and starred groups contribute nothing") {
    assert(x("""{\rtf1{\fonttbl{\f0 Calibri;}}{\colortbl;\red0;}body}""") == "body")
    assert(x("""{\rtf1{\*\generator Riched20;}text}""") == "text")
    assert(x("""{\rtf1{\info{\title secret}}visible}""") == "visible")
    assert(x("""{\rtf1{\pict 0011aabb}after}""") == "after")
  }

  test("escaped specials and symbol words") {
    assert(x("""{\rtf1 \{braces\} and \\slash\~nb}""") == "{braces} and \\slash nb")
    assert(x("""{\rtf1 q\lquote t\rquote\emdash\bullet}""") == "q\u2018t\u2019\u2014\u2022")
  }

  test("writer round trip over hostile text") {
    val bodies = Seq(
      "plain body",
      "tabs\tand\nnewlines",
      "sp\u00e9cial \u00fcnicode \u2014 \u4e2d\u6587 \ud83d\ude00",
      """rtf specials: {\u1234 \par}""",
      "")
    bodies.foreach { b =>
      val got = RtfText.extract(RtfText.write(b))
      assert(got == b, s"round trip: ${b.take(30)}")
    }
  }

  test("typed refusals: opener, balance, escapes, trailing content") {
    def refuses(s: String, kind: String = "bad_rtf") =
      assert(RtfText.extractSafe(s.getBytes(US_ASCII)) == Left(kind), s)
    refuses("not rtf at all")
    refuses("""{\rtf1 unclosed""")
    refuses("""{\rtf1 over}closed}""")
    refuses("""{\rtf1 \'g9 bad hex}""")
    refuses("""{\rtf1 trailing\""")
    refuses("""{\rtf1 ok} extra content""")
  }

  test("mutation totality: single-byte flips refuse typed or extract") {
    val bytes = RtfText.write("mutation target {\\with} specials \u00e9")
    val kinds = Set("bad_rtf", "too_large")
    for (i <- bytes.indices; bit <- Seq(0x01, 0x80)) {
      val m = bytes.clone(); m(i) = (m(i) ^ bit).toByte
      RtfText.extractSafe(m) match {
        case Left(k) => assert(kinds.contains(k), s"flip @$i/$bit -> untyped $k")
        case Right(_) => ()
      }
    }
  }
}
