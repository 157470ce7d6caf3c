package graft.ops

/** URL canonicalization and robots.txt evaluation — the crawl-frontier
  * operators of a web-scale ingest pipeline (dedup by canonical URL,
  * politeness filtering before fetch, per-site aggregation by registered
  * domain). Written from the public specs: RFC 3986 (URI syntax,
  * §6 normalization: case, percent-encoding, dot segments, default
  * ports), RFC 9309 (Robots Exclusion Protocol: group selection by
  * most-specific user-agent, longest-path-match rule precedence, allow
  * wins ties), and the public-suffix eTLD+1 convention.
  *
  * All pure per-row string work: at 100 TB these run inside whole-row
  * maps/projections with no shuffle, and the registered-domain grouping
  * key is what the frontier shuffles on.
  */
object Url {

  /** RFC 3986 §6.2.2-§6.2.3 syntax-based normalization plus the two
    * universal crawler conventions (drop the fragment; empty path → "/"):
    *  - scheme and host lowercase
    *  - default port stripped (http:80, https:443)
    *  - percent-decode unreserved characters, uppercase surviving escapes
    *  - dot segments resolved ("." dropped, ".." pops)
    */
  def canonicalize(url: String): String = {
    val (scheme, afterScheme) = url.indexOf("://") match {
      case -1 => return url // not an absolute hierarchical URL: pass through
      case i => (url.substring(0, i).toLowerCase(java.util.Locale.ROOT), url.substring(i + 3))
    }
    val fragEnd = afterScheme.indexOf('#') match {
      case -1 => afterScheme.length
      case i => i
    }
    val noFrag = afterScheme.substring(0, fragEnd)
    val queryStart = noFrag.indexOf('?') match {
      case -1 => noFrag.length
      case i => i
    }
    val query = noFrag.substring(queryStart) // includes '?', possibly empty
    val beforeQuery = noFrag.substring(0, queryStart)
    val pathStart = beforeQuery.indexOf('/') match {
      case -1 => beforeQuery.length
      case i => i
    }
    var authority = beforeQuery.substring(0, pathStart).toLowerCase(java.util.Locale.ROOT)
    val defaultPort = scheme match {
      case "http" => ":80"
      case "https" => ":443"
      case _ => null
    }
    if (defaultPort != null && authority.endsWith(defaultPort))
      authority = authority.substring(0, authority.length - defaultPort.length)
    val rawPath = beforeQuery.substring(pathStart)
    val path = if (rawPath.isEmpty) "/" else removeDotSegments(decodeUnreserved(rawPath))
    s"$scheme://$authority$path$query"
  }

  /** percent-decode unreserved chars (ALPHA/DIGIT/-._~), uppercase the
    * hex of escapes that must stay encoded (RFC 3986 §2.3/§6.2.2.1-2).
    */
  private[ops] def decodeUnreserved(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        val v = Integer.parseInt(s.substring(i + 1, i + 3), 16)
        if (isUnreserved(v)) sb.append(v.toChar)
        else sb.append('%').append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def isHex(c: Char) =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  private def isUnreserved(v: Int) = {
    val c = v.toChar
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'
  }

  /** RFC 3986 §5.2.4 remove_dot_segments over an absolute path. */
  private[ops] def removeDotSegments(path: String): String = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    // split keeping empties so trailing '/' survives; leading "" is the root
    val segs = path.split("/", -1)
    var trailingSlash = false
    segs.drop(1).foreach {
      case "." => trailingSlash = true
      case ".." => if (out.nonEmpty) out.remove(out.length - 1); trailingSlash = true
      case "" => trailingSlash = true
      case s => out += s; trailingSlash = false
    }
    "/" + out.mkString("/") + (if (trailingSlash && out.nonEmpty) "/" else "")
  }

  /** host of an absolute URL (no port), lowercased. */
  def host(url: String): String = {
    val i = url.indexOf("://")
    if (i < 0) return ""
    val rest = url.substring(i + 3)
    val end = rest.indexWhere(c => c == '/' || c == '?' || c == '#') match {
      case -1 => rest.length
      case e => e
    }
    val auth = rest.substring(0, end).toLowerCase(java.util.Locale.ROOT)
    auth.lastIndexOf(':') match {
      case -1 => auth
      case p if auth.substring(p + 1).forall(_.isDigit) => auth.substring(0, p)
      case _ => auth
    }
  }

  /** Embedded public-suffix subset (the full PSL is a data file this
    * offline build can't fetch; the ALGORITHM — longest suffix match,
    * eTLD+1 = one label more — is the real operator, and a production
    * deployment swaps in the full list). Multi-label suffixes included so
    * the longest-match path is exercised.
    */
  private[ops] val PublicSuffixes: Set[String] = Set(
    "com", "org", "net", "io", "dev", "edu", "gov",
    "co.uk", "ac.uk", "org.uk", "com.au", "co.jp", "com.br", "github.io")

  /** eTLD+1: the registrable domain of a host, or the host itself if no
    * known suffix matches (the PSL "prevailing rule is *" fallback: last
    * label is the suffix).
    */
  def registeredDomain(hostName: String): String = {
    val labels = hostName.split('.')
    if (labels.length < 2) return hostName
    // longest matching public suffix, by label count
    var best = 1 // default: bare TLD
    var k = 1
    while (k < labels.length) {
      val cand = labels.takeRight(k).mkString(".")
      if (PublicSuffixes.contains(cand)) best = k
      k += 1
    }
    val take = math.min(best + 1, labels.length)
    labels.takeRight(take).mkString(".")
  }

  // ------------------------------------------------------------------
  // robots.txt (RFC 9309)
  // ------------------------------------------------------------------

  /** One parsed rule: `allow=false` for Disallow. Empty-path Disallow
    * means "allow all" per the RFC and is dropped at parse time.
    */
  final case class RobotsRule(allow: Boolean, path: String)

  /** Parsed robots.txt: rule groups keyed by lowercased user-agent
    * product token.
    */
  final case class Robots(groups: Map[String, Seq[RobotsRule]]) {

    /** RFC 9309 §2.2.1: group names match the crawler's product TOKENS
      * case-insensitively — the `name` in `name/version` segments of the
      * UA string, where a token is letters/digits/`-`/`_` — never raw
      * substrings of the whole UA (round-12 fix: `ua.contains(k)` let a
      * group named "bot" capture nearly every crawler, and tokens inside
      * a UA's comment/URL part select groups). Longest matching group
      * name wins; "*" is the fallback.
      */
    def groupFor(userAgent: String): Seq[RobotsRule] = {
      val tokens = Robots.productTokens(userAgent)
      val named = groups.keys.filter(k => k != "*" && tokens.contains(k))
      if (named.nonEmpty) groups(named.maxBy(_.length))
      else groups.getOrElse("*", Seq.empty)
    }

    /** RFC 9309 §2.2.2: most-specific (longest-path) rule wins; a tie
      * between allow and disallow resolves to allow; no match → allowed.
      */
    def allowed(userAgent: String, path: String): Boolean = {
      val matching = groupFor(userAgent).filter(r => path.startsWith(r.path))
      if (matching.isEmpty) true
      else {
        val maxLen = matching.map(_.path.length).max
        matching.filter(_.path.length == maxLen).exists(_.allow)
      }
    }
  }

  object Robots {
    /** Lowercased product tokens of a crawler UA: for each whitespace- or
      * `;`-separated segment, the leading letters/digits/`-`/`_` run before
      * any `/version` — so `"FooBot/2.1 (+https://foo.example)"` yields
      * `foobot` and the URL inside the comment yields nothing usable as a
      * group name collision.
      */
    def productTokens(userAgent: String): Set[String] = {
      userAgent.toLowerCase(java.util.Locale.ROOT)
        .split("[\\s;,()]+")
        .iterator
        .map { seg =>
          val head = seg.takeWhile(ch =>
            ch.isLetterOrDigit || ch == '-' || ch == '_')
          head
        }
        .filter(_.nonEmpty)
        .toSet
    }
  }

  /** Parse a robots.txt body. Consecutive User-agent lines share the
    * following rules (RFC 9309 §2.1); unknown directives and comments are
    * ignored; group keys are lowercased.
    */
  def parseRobots(text: String): Robots = {
    val groups = scala.collection.mutable.LinkedHashMap.empty[String, Vector[RobotsRule]]
    var currentAgents: List[String] = Nil
    var collectingAgents = true
    text.split("\r?\n").foreach { raw =>
      val line = raw.indexOf('#') match {
        case -1 => raw.trim
        case i => raw.substring(0, i).trim
      }
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (collectingAgents) currentAgents ::= value.toLowerCase(java.util.Locale.ROOT)
            else { currentAgents = List(value.toLowerCase(java.util.Locale.ROOT)) }
            collectingAgents = true
            currentAgents.foreach(a => groups.getOrElseUpdate(a, Vector.empty))
          case "allow" | "disallow" =>
            collectingAgents = false
            if (value.nonEmpty && currentAgents.nonEmpty) {
              val rule = RobotsRule(key == "allow", value)
              currentAgents.foreach(a => groups(a) = groups(a) :+ rule)
            }
          case _ => collectingAgents = false // sitemap/crawl-delay/etc end the UA run
        }
      }
    }
    Robots(groups.toMap)
  }
}
