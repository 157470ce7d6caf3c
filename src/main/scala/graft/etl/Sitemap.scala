package graft.etl

/** sitemap.xml parsing (sitemaps.org protocol, the crawl-DISCOVERY input
  * of the frontier: robots.txt points at sitemaps, sitemaps enumerate
  * fetchable URLs with freshness hints). Parsed with the same
  * stdlib-faithful [[HtmlParser]] event tokenizer the HTML path uses —
  * sitemap XML is tag-regular, entity escaping included, so the one
  * tokenizer serves both. Per-file string work: shuffle-free at scale.
  */
object Sitemap {

  /** One `<url>` element: required `<loc>`, optional `<lastmod>`,
    * `<changefreq>`, `<priority>` (absent → "").
    */
  final case class SitemapUrl(loc: String, lastmod: String, changefreq: String,
      priority: String)

  /** Extract every `<url>` element's fields. Entity references in values
    * (e.g. `&amp;` in query strings — the spec REQUIRES escaping) are
    * converted by the tokenizer; unknown elements are ignored; text
    * outside the tracked leaves is discarded.
    */
  def parse(xml: String): Seq[SitemapUrl] = {
    val out = Seq.newBuilder[SitemapUrl]
    var inUrl = false
    var field: String = null
    var loc, lastmod, changefreq, priority = new StringBuilder
    HtmlParser.parse(xml, new HtmlParser.Handler {
      def starttag(name: String, attrs: List[(String, Option[String])]): Unit = name match {
        case "url" =>
          inUrl = true
          loc = new StringBuilder; lastmod = new StringBuilder
          changefreq = new StringBuilder; priority = new StringBuilder
        case "loc" | "lastmod" | "changefreq" | "priority" if inUrl => field = name
        case _ => ()
      }
      def startendtag(name: String, attrs: List[(String, Option[String])]): Unit = ()
      def endtag(name: String): Unit = name match {
        case "url" =>
          if (inUrl) out += SitemapUrl(loc.toString.trim, lastmod.toString.trim,
            changefreq.toString.trim, priority.toString.trim)
          inUrl = false; field = null
        case "loc" | "lastmod" | "changefreq" | "priority" => field = null
        case _ => ()
      }
      def data(s: String): Unit = if (inUrl && field != null) field match {
        case "loc" => loc.append(s)
        case "lastmod" => lastmod.append(s)
        case "changefreq" => changefreq.append(s)
        case "priority" => priority.append(s)
      }
      def marker(): Unit = ()
    })
    out.result()
  }
}
