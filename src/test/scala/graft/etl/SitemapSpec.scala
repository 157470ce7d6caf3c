package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** sitemap.xml grammar corners beyond the url04 oracle. */
class SitemapSpec extends AnyFunSuite {

  test("entities unescape, optional fields default empty, unknown tags ignored") {
    val urls = Sitemap.parse(
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc>https://a/?x=1&amp;y=2</loc><lastmod>2026-01-05</lastmod>
        |<mobile:mobile/><priority>0.8</priority></url>
        |<url><loc> https://b/ </loc></url>
        |</urlset>""".stripMargin)
    assert(urls.size == 2)
    assert(urls.head.loc == "https://a/?x=1&y=2")
    assert(urls.head.lastmod == "2026-01-05")
    assert(urls.head.changefreq == "" && urls.head.priority == "0.8")
    assert(urls(1).loc == "https://b/") // trimmed
    assert(urls(1).lastmod == "" && urls(1).priority == "")
  }

  test("text outside url elements and malformed tails are ignored, not fatal") {
    assert(Sitemap.parse("junk <urlset>noise<url><loc>u</loc></url></urlset> tail")
      .map(_.loc) == Seq("u"))
    assert(Sitemap.parse("").isEmpty)
    assert(Sitemap.parse("<url><loc>unclosed").isEmpty) // no </url> → no emit
  }
}
