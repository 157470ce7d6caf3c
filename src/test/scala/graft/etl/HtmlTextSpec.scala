package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** Main-text extraction corners beyond the html01 oracle's happy path:
  * nesting, entities, block boundaries, self-closing tags, boilerplate
  * accounting.
  */
class HtmlTextSpec extends AnyFunSuite {

  test("boilerplate subtrees drop even when nested; bytes are counted") {
    val e = HtmlText.extract(
      "<body><p>keep</p><nav>drop <div>deep <style>p{}</style></div></nav><p>also</p></body>")
    assert(e.body == "keep also")
    assert(e.boilerplateBytes == "drop ".length + "deep ".length + "p{}".length)
  }

  test("block tags separate words; inline tags do not") {
    val e = HtmlText.extract("<body><h1>one</h1><p>two</p>three<br/>four <b>bo</b>ld</body>")
    assert(e.body == "one two three four bold")
  }

  test("entities round-trip through extraction") {
    val e = HtmlText.extract("<p>a &amp; b &lt;tag&gt; &#65;</p>")
    assert(e.body == "a & b <tag> A")
  }

  test("title is separate from body; empty page yields empty strings") {
    val e = HtmlText.extract("<html><head><title> The  Title </title></head><body><p>x</p></body></html>")
    assert(e.title == "The Title")
    assert(e.body == "x")
    assert(HtmlText.extract("") == HtmlText.Extracted("", "", 0L))
  }

  test("escape/extract round-trips raw text containing all three specials") {
    val raw = "5 < 6 && x > y"
    val e = HtmlText.extract(s"<body><p>${HtmlText.escape(raw)}</p></body>")
    assert(e.body == raw)
  }
}
