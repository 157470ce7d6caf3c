package graft.etl

/** Main-text extraction from crawl HTML — the step between a WARC scan
  * and the documents table in a web-scale training pipeline (the
  * trafilatura/jusText role, reduced to its deterministic core): parse
  * with the stdlib-faithful [[HtmlParser]] port, drop boilerplate
  * subtrees (script/style/nav/footer/aside), take the title separately,
  * break text at block-level tags, and whitespace-normalize. Pure
  * per-row string work: shuffle-free at any corpus scale.
  */
object HtmlText {

  /** Subtrees whose text is boilerplate, never content. */
  private val Skip = Set("script", "style", "nav", "footer", "aside")

  /** Block-level boundaries: text on either side never joins into one
    * word (a newline is inserted, then whitespace-normalized to one
    * space) — so extraction is independent of how the tokenizer splits
    * adjacent data events.
    */
  private val Block = Set("p", "h1", "h2", "h3", "h4", "h5", "h6", "div",
    "li", "br", "tr", "td", "title", "main", "body", "article", "section")

  final case class Extracted(title: String, body: String, boilerplateBytes: Long)

  /** HTML-escape the three structural characters (what a page generator
    * does on the way IN; [[HtmlParser]]'s entity conversion undoes it on
    * the way OUT, so extraction round-trips raw text exactly).
    */
  def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  def extract(html: String): Extracted = {
    val title = new StringBuilder
    val body = new StringBuilder
    var skipDepth = 0
    var inTitle = false
    var boiler = 0L
    HtmlParser.parse(html, new HtmlParser.Handler {
      def starttag(name: String, attrs: List[(String, Option[String])]): Unit = {
        if (Skip.contains(name)) skipDepth += 1
        else if (name == "title") { inTitle = true; body.append('\n') }
        else if (Block.contains(name)) body.append('\n')
      }
      def startendtag(name: String, attrs: List[(String, Option[String])]): Unit =
        if (!Skip.contains(name) && Block.contains(name)) body.append('\n')
      def endtag(name: String): Unit = {
        if (Skip.contains(name) && skipDepth > 0) skipDepth -= 1
        else if (name == "title") inTitle = false
        else if (Block.contains(name)) body.append('\n') // closing a block breaks too
      }
      def data(s: String): Unit = {
        if (skipDepth > 0) boiler += s.length
        else if (inTitle) title.append(s)
        else body.append(s)
      }
      def marker(): Unit = ()
    })
    Extracted(norm(title.toString), norm(body.toString), boiler)
  }

  /** collapse runs of whitespace to single spaces, trim. */
  private def norm(s: String): String =
    s.trim.split("\\s+").filter(_.nonEmpty).mkString(" ")
}
