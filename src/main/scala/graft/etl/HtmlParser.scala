package graft.etl

import java.util.regex.{Matcher, Pattern}

/** Faithful port of CPython's `html.parser.HTMLParser` tokenizer in the
  * exact configuration BeautifulSoup's `html.parser` backend runs it —
  * `convert_charrefs=True`, whole document fed then closed — which is the
  * engine behind the reference's HTML row extraction
  * (`/root/reference/backend/etl_pipeline.py:141-148`).
  *
  * Ported line-for-line from `Lib/html/parser.py` + `Lib/_markupbase.py`
  * (public stdlib, the HTML5 tolerant-tokenization states of
  * w3.org/TR/html5/tokenization.html), with the simplifications that are
  * exact for one-shot parsing:
  *  - `feed(s); close()` ≡ one `goahead` pass with `end=True` (the
  *    end=False breaks only defer work to the close() pass over the same
  *    buffer — no output difference when no more data arrives);
  *  - the `&#...;`/`&name;` goahead branches are dead code under
  *    `convert_charrefs=True` (text scanning jumps straight to the next
  *    '<', so `i` never lands on '&' outside CDATA; inside CDATA '&' is
  *    not interesting) and are omitted;
  *  - comments, doctypes, PIs and marked sections are consumed with the
  *    stdlib's exact boundary rules but not reported: bs4 types them
  *    Comment/Doctype/ProcessingInstruction, which `get_text` excludes,
  *    so the tree builder has no use for their content.
  *
  * Deliberately faithful quirks (all battery-pinned): a start tag whose
  * tail is not `>`/`/>` is re-emitted as TEXT without entity conversion;
  * an unclosed comment/declaration emits "<" and re-tokenizes the rest;
  * unclosed `script`/`style` content at EOF is DROPPED; `</tag attr=">">`
  * closes at the first '>'; `<![foo]>` raises (the reference would crash
  * on it too — callers choose the sane-mode recovery).
  */
object HtmlParser {

  /** Mirrors the stdlib AssertionError on malformed marked sections
    * (`<![...]>` with an unknown/absent status keyword) — real
    * bs4/html.parser propagates it out of the constructor.
    */
  final class MarkedSectionError(msg: String) extends RuntimeException(msg)

  trait Handler {
    def starttag(name: String, attrs: List[(String, Option[String])]): Unit
    def startendtag(name: String, attrs: List[(String, Option[String])]): Unit
    def endtag(name: String): Unit
    def data(s: String): Unit

    /** A comment / doctype / PI / marked section was consumed. bs4 turns
      * each into a typed string whose creation FLUSHES the adjacent-text
      * buffer (`endData`) — the content itself is invisible to
      * `get_text`, so only the flush boundary is reported. (`</>` is
      * consumed with no handler call in the stdlib, hence no marker.)
      */
    def marker(): Unit
  }

  // Python `\s` / str.strip() whitespace = the Unicode White_Space set —
  // wider than Java's default ASCII `\s`
  private val W = "\\x09-\\x0D\\x1C-\\x1F \\x85\\xA0\\u1680\\u2000-\\u200A\\u2028\\u2029\\u202F\\u205F\\u3000"

  private val StartTagOpen = Pattern.compile("<[a-zA-Z]")
  private val TagFindTolerant =
    Pattern.compile("([a-zA-Z][^\\t\\n\\r\\f />\\x00]*)(?:[" + W + "]|/(?!>))*")
  private val AttrFindTolerant = Pattern.compile(
    "((?<=['\"" + W + "/])[^" + W + "/>][^" + W + "/=>]*)([" + W + "]*=+[" + W + "]*" +
      "('[^']*'|\"[^\"]*\"|(?!['\"])[^>" + W + "]*))?(?:[" + W + "]|/(?!>))*")
  private val LocateStartTagEndTolerant = Pattern.compile(
    "<[a-zA-Z][^\\t\\n\\r\\f />\\x00]*" + // tag name
      "(?:[" + W + "/]*" + // optional whitespace before attribute name
      "(?:(?<=['\"" + W + "/])[^" + W + "/>][^" + W + "/=>]*" + // attribute name
      "(?:[" + W + "]*=+[" + W + "]*" + // value indicator
      "(?:'[^']*'" + // LITA-enclosed value
      "|\"[^\"]*\"" + // LIT-enclosed value
      "|(?!['\"])[^>" + W + "]*" + // bare value
      ")" +
      "[" + W + "]*" + // possibly followed by a space
      ")?(?:[" + W + "]|/(?!>))*" +
      ")*" +
      ")?" +
      "[" + W + "]*") // trailing whitespace
  private val EndTagFind =
    Pattern.compile("</[" + W + "]*([a-zA-Z][-.a-zA-Z0-9:_]*)[" + W + "]*>")
  private val CommentClose = Pattern.compile("--[" + W + "]*>")
  private val MarkedSectionClose = Pattern.compile("][" + W + "]*][" + W + "]*>")
  private val MsMarkedSectionClose = Pattern.compile("][" + W + "]*>")
  private val DeclNameMatch = Pattern.compile("[a-zA-Z][-_.a-zA-Z0-9]*[" + W + "]*")
  private val Cdata = Map(
    "script" -> Pattern.compile("</[" + W + "]*script[" + W + "]*>", Pattern.CASE_INSENSITIVE),
    "style" -> Pattern.compile("</[" + W + "]*style[" + W + "]*>", Pattern.CASE_INSENSITIVE))

  /** `re.match(pat, s, pos)` — anchored at pos, look-around sees outside. */
  private def matchAt(p: Pattern, s: String, pos: Int): Option[Matcher] = {
    val m = p.matcher(s)
    m.region(pos, s.length)
    m.useTransparentBounds(true)
    m.useAnchoringBounds(false)
    if (m.lookingAt()) Some(m) else None
  }

  /** `pat.search(s, pos)`. */
  private def searchFrom(p: Pattern, s: String, pos: Int): Option[Matcher] = {
    val m = p.matcher(s)
    m.region(pos, s.length)
    m.useTransparentBounds(true)
    m.useAnchoringBounds(false)
    if (m.find()) Some(m) else None
  }

  private def pyStrip(s: String): String = Html.pyStrip(s)

  def parse(rawdata: String, h: Handler): Unit = new Run(rawdata, h).goahead()

  private final class Run(rawdata: String, h: Handler) {
    private val n = rawdata.length
    private var cdataElem: String = null

    // goahead(end=1) — one-shot form
    def goahead(): Unit = {
      var i = 0
      var done = false
      while (i < n && !done) {
        var j = 0
        if (cdataElem == null) {
          j = rawdata.indexOf('<', i)
          if (j < 0) j = n
        } else {
          searchFrom(Cdata(cdataElem), rawdata, i) match {
            case Some(m) => j = m.start()
            case None =>
              // CDATA content with no close tag: dropped at EOF (the
              // stdlib's final-flush skips cdata_elem buffers)
              return
          }
        }
        if (i < j) {
          if (cdataElem == null) h.data(HtmlUnescape.unescape(rawdata.substring(i, j)))
          else h.data(rawdata.substring(i, j))
        }
        i = j
        if (i == n) return
        // rawdata[i] == '<'
        var k =
          if (matchAt(StartTagOpen, rawdata, i).isDefined) parseStarttag(i)
          else if (rawdata.startsWith("</", i)) parseEndtag(i)
          else if (rawdata.startsWith("<!--", i)) parseComment(i)
          else if (rawdata.startsWith("<?", i)) parsePi(i)
          else if (rawdata.startsWith("<!", i)) parseHtmlDeclaration(i)
          else if (i + 1 < n) { h.data("<"); i + 1 }
          else { done = true; i } // lone '<' at EOF → final flush below
        if (!done) {
          if (k < 0) {
            // end=1 recovery: emit up to the next '>' (incl.), else up to
            // the next '<', else one char — as TEXT, entity-converted
            k = rawdata.indexOf('>', i + 1)
            if (k < 0) {
              k = rawdata.indexOf('<', i + 1)
              if (k < 0) k = i + 1
            } else k += 1
            if (cdataElem == null) h.data(HtmlUnescape.unescape(rawdata.substring(i, k)))
            else h.data(rawdata.substring(i, k))
          }
          i = k
        }
      }
      // end-of-loop flush (lone '<' at EOF path)
      if (i < n && cdataElem == null)
        h.data(HtmlUnescape.unescape(rawdata.substring(i, n)))
    }

    // parse_starttag + check_for_whole_start_tag
    private def parseStarttag(i: Int): Int = {
      val endpos = checkForWholeStartTag(i)
      if (endpos < 0) return endpos
      val attrs = List.newBuilder[(String, Option[String])]
      val m = matchAt(TagFindTolerant, rawdata, i + 1)
        .getOrElse(throw new IllegalStateException("unexpected call to parse_starttag()"))
      var k = m.end()
      val tag = m.group(1).toLowerCase(java.util.Locale.ROOT)
      var break0 = false
      while (k < endpos && !break0) {
        matchAt(AttrFindTolerant, rawdata, k) match {
          case None => break0 = true
          case Some(am) =>
            val attrname = am.group(1)
            val rest = am.group(2)
            var attrvalue: String = if (rest == null) null else am.group(3)
            if (attrvalue != null && attrvalue.length >= 1) {
              val f = attrvalue.charAt(0)
              val l = attrvalue.charAt(attrvalue.length - 1)
              if ((f == '\'' && l == '\'') || (f == '"' && l == '"'))
                attrvalue =
                  if (attrvalue.length == 1) ""
                  else attrvalue.substring(1, attrvalue.length - 1)
            }
            if (attrvalue != null && attrvalue.nonEmpty)
              attrvalue = HtmlUnescape.unescape(attrvalue)
            attrs += (attrname.toLowerCase(java.util.Locale.ROOT) -> Option(attrvalue))
            k = am.end()
        }
      }
      val end = pyStrip(rawdata.substring(k, endpos))
      if (end != ">" && end != "/>") {
        // bogus tail: the whole would-be tag is re-emitted as raw text
        h.data(rawdata.substring(i, endpos))
        return endpos
      }
      if (end.endsWith("/>")) h.startendtag(tag, attrs.result())
      else {
        h.starttag(tag, attrs.result())
        if (Cdata.contains(tag)) cdataElem = tag
      }
      endpos
    }

    private def checkForWholeStartTag(i: Int): Int = {
      val m = matchAt(LocateStartTagEndTolerant, rawdata, i)
        .getOrElse(throw new IllegalStateException("we should not get here!"))
      val j = m.end()
      val next = if (j < n) rawdata.charAt(j).toString else ""
      if (next == ">") return j + 1
      if (next == "/") {
        if (rawdata.startsWith("/>", j)) return j + 2
        // "/" then EOF would be a buffer boundary; anything else is bogus
        if (j + 1 >= n) return -1
        return if (j > i) j else i + 1
      }
      if (next == "") return -1
      if (next.length == 1 && (next.charAt(0).isLetter && next.charAt(0) <= 'z' &&
          next.charAt(0) >= 'A' || next == "=" || next == "/")) {
        // end of input in or before attribute value — never closes
        return -1
      }
      if (j > i) j else i + 1
    }

    // parse_endtag
    private def parseEndtag(i: Int): Int = {
      val gt = searchFrom(Pattern.compile(">"), rawdata, i + 1) match {
        case None => return -1
        case Some(m) => m.end()
      }
      matchAt(EndTagFind, rawdata, i) match {
        case None =>
          if (cdataElem != null) { h.data(rawdata.substring(i, gt)); return gt }
          matchAt(TagFindTolerant, rawdata, i + 2) match {
            case None =>
              if (rawdata.startsWith("</>", i)) i + 3
              else parseBogusComment(i)
            case Some(nm) =>
              val tagname = nm.group(1).toLowerCase(java.util.Locale.ROOT)
              // consume and ignore other stuff between the name and the >
              val g2 = rawdata.indexOf('>', nm.end())
              h.endtag(tagname)
              g2 + 1 // find() failure gives gtpos+1 == 0 in the stdlib too
          }
        case Some(m) =>
          val elem = m.group(1).toLowerCase(java.util.Locale.ROOT)
          if (cdataElem != null && elem != cdataElem) {
            h.data(rawdata.substring(i, gt)); return gt
          }
          h.endtag(elem)
          cdataElem = null
          gt
      }
    }

    // parse_comment / parse_pi / declarations — consume with the stdlib's
    // exact boundaries; report only the endData flush (handle_comment /
    // handle_decl / handle_pi / unknown_decl each flush in bs4)
    private def parseComment(i: Int): Int =
      searchFrom(CommentClose, rawdata, i + 4) match {
        case None => -1
        case Some(m) => h.marker(); m.end()
      }

    private def parsePi(i: Int): Int =
      rawdata.indexOf('>', i + 2) match {
        case -1 => -1
        case p => h.marker(); p + 1
      }

    private def parseBogusComment(i: Int): Int =
      rawdata.indexOf('>', i + 2) match {
        case -1 => -1
        case p => h.marker(); p + 1
      }

    private def parseHtmlDeclaration(i: Int): Int = {
      if (rawdata.startsWith("<!--", i)) parseComment(i)
      else if (rawdata.startsWith("<![", i)) parseMarkedSection(i)
      else if (i + 9 <= n &&
          rawdata.substring(i, i + 9).toLowerCase(java.util.Locale.ROOT) == "<!doctype") {
        rawdata.indexOf('>', i + 9) match {
          case -1 => -1
          case p => h.marker(); p + 1 // handle_decl content is invisible
        }
      } else parseBogusComment(i)
    }

    private def parseMarkedSection(i: Int): Int = {
      val (sectName, j) = scanName(i + 3, i)
      if (j < 0) return j
      if (Set("temp", "cdata", "ignore", "include", "rcdata").contains(sectName))
        searchFrom(MarkedSectionClose, rawdata, i + 3) match {
          case None => -1
          case Some(m) => h.marker(); m.end()
        }
      else if (Set("if", "else", "endif").contains(sectName))
        searchFrom(MsMarkedSectionClose, rawdata, i + 3) match {
          case None => -1
          case Some(m) => h.marker(); m.end()
        }
      else
        throw new MarkedSectionError(
          s"unknown status keyword ${rawdata.substring(i + 3, j)} in marked section")
    }

    // _markupbase._scan_name — (name, endpos); (-1) when the name may be
    // cut by the buffer end; AssertionError when no name is present
    private def scanName(i: Int, declstartpos: Int): (String, Int) = {
      if (i == n) return (null, -1)
      matchAt(DeclNameMatch, rawdata, i) match {
        case Some(m) =>
          val s = m.group()
          val name = pyStrip(s).toLowerCase(java.util.Locale.ROOT)
          if (i + s.length == n) (null, -1)
          else (name, m.end())
        case None =>
          throw new MarkedSectionError(
            "expected name token at " +
              rawdata.substring(declstartpos, math.min(declstartpos + 20, n)))
      }
    }
  }
}
