package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** RFC 3986 canonicalization, eTLD+1 extraction, and RFC 9309 robots
  * evaluation edge cases (the url01-03 oracles pin the happy paths at
  * corpus scale; this pins the grammar corners).
  */
class UrlSpec extends AnyFunSuite {

  test("canonicalize: case, default port, fragment, empty path") {
    assert(Url.canonicalize("HTTPS://WWW.Example.COM:443/Path#frag") ==
      "https://www.example.com/Path")
    assert(Url.canonicalize("http://a.com:80") == "http://a.com/")
    assert(Url.canonicalize("http://a.com:8080/x") == "http://a.com:8080/x")
    assert(Url.canonicalize("https://a.com") == "https://a.com/")
  }

  test("canonicalize: dot segments and traversal above root") {
    assert(Url.canonicalize("https://a.com/a/./b/../c") == "https://a.com/a/c")
    assert(Url.canonicalize("https://a.com/../../x") == "https://a.com/x")
    assert(Url.canonicalize("https://a.com/a/b/..") == "https://a.com/a/")
    assert(Url.canonicalize("https://a.com/a/.") == "https://a.com/a/")
  }

  test("canonicalize: percent-decoding only touches unreserved chars") {
    assert(Url.canonicalize("https://a.com/%64%6fc") == "https://a.com/doc")
    // %2F is '/', reserved — must stay encoded, hex uppercased
    assert(Url.canonicalize("https://a.com/a%2fb") == "https://a.com/a%2Fb")
    assert(Url.canonicalize("https://a.com/%7Euser") == "https://a.com/~user")
  }

  test("canonicalize: query survives untouched, fragment after query drops") {
    assert(Url.canonicalize("https://a.com/p?q=1&r=%2F#x") ==
      "https://a.com/p?q=1&r=%2F")
  }

  test("host strips ports and lowercases") {
    assert(Url.host("https://A.Example.COM:8443/x?y#z") == "a.example.com")
    assert(Url.host("https://a.com") == "a.com")
  }

  test("registeredDomain: single, multi-label, and unknown suffixes") {
    assert(Url.registeredDomain("a.b.example.com") == "example.com")
    assert(Url.registeredDomain("shop.example.co.uk") == "example.co.uk")
    assert(Url.registeredDomain("x.pages.github.io") == "pages.github.io")
    assert(Url.registeredDomain("node7.internal") == "node7.internal")
    assert(Url.registeredDomain("localhost") == "localhost")
  }

  private val robots = Url.parseRobots(
    """# policy
      |User-agent: badbot
      |Disallow: /
      |
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow: /private/
      |Allow: /private/ok/
      |Crawl-delay: 2
      |
      |User-agent: *
      |Disallow: /doc/
      |""".stripMargin)

  test("robots: named group wins over *, and its rules are exclusive") {
    assert(robots.allowed("graftbot/1.0", "/doc/5")) // * rule must NOT leak
    assert(!robots.allowed("randombot", "/doc/5"))
    assert(robots.allowed("randombot", "/private/x")) // named rule must not leak
  }

  test("robots: longest path match wins, allow beats disallow on ties") {
    assert(!robots.allowed("graftbot", "/private/x"))
    assert(robots.allowed("graftbot", "/private/ok/x"))
    val tie = Url.parseRobots(
      "User-agent: *\nAllow: /p\nDisallow: /p\n")
    assert(tie.allowed("any", "/p/x"))
  }

  test("robots: shared UA run, banned bot, empty disallow, no-match default") {
    assert(!robots.allowed("otherbot", "/private/x")) // second UA of the run
    assert(!robots.allowed("badbot/3.0 (crawler)", "/anything"))
    assert(robots.allowed("graftbot", "/")) // no matching rule → allowed
    val eAllow = Url.parseRobots("User-agent: *\nDisallow:\n")
    assert(eAllow.allowed("any", "/x")) // empty Disallow = allow all
  }

  test("robots: groups match product TOKENS, not substrings of the UA (RFC 9309)") {
    // round-12 fix: `ua.contains(group)` let a group named "bot" capture
    // nearly every crawler and let tokens inside the UA's comment/URL
    // part select groups. Matching is now against the `name` of
    // `name/version` product tokens, case-insensitively.
    val r = Url.parseRobots(
      """User-agent: bot
        |Disallow: /
        |
        |User-agent: badbot
        |Disallow: /
        |
        |User-agent: googlebot
        |Disallow: /nogoogle/
        |""".stripMargin)
    // "bot" is a substring of graftbot but NOT one of its product tokens
    assert(r.allowed("graftbot/1.0", "/x"))
    // hyphenated UA token != "badbot" (exact token match, not containment)
    assert(r.allowed("the-badbot-crawler/2.0", "/x"))
    // a group token appearing only inside the UA's comment URL must not match
    assert(r.allowed("mybot/1.0 (+https://badbot.example/info)", "/x"))
    // the classic browser-style crawler UA still selects its group
    assert(!r.allowed(
      "Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
      "/nogoogle/page"))
    // exact token match is case-insensitive
    assert(!r.allowed("BadBot/9", "/anything"))
  }
}
