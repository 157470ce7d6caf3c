package graft.etl

import java.util.regex.Pattern

/** Faithful mirror of CPython's `html.unescape` — the character-reference
  * resolution that `html.parser` (and therefore BeautifulSoup over its
  * `html.parser` backend, the engine behind the reference's HTML row
  * extraction, `/root/reference/backend/etl_pipeline.py:141-148`) applies
  * to text runs and attribute values when `convert_charrefs=True`
  * (the default bs4 uses).
  *
  * Semantics ported from `Lib/html/__init__.py` (public stdlib):
  *  - named references resolve against the WHATWG html5 table
  *    (`src/main/resources/graft/html5_entities.tsv`, exported verbatim
  *    from `html.entities.html5`); entries WITHOUT a trailing ';' encode
  *    the spec's legacy no-semicolon names ("&amp" works, "&copy" works,
  *    "&curren" does not need its ';' either — the table decides);
  *  - an unknown name falls back to its LONGEST known prefix of length
  *    ≥ 2, keeping the tail as literal text ("&notit;" → "¬it;");
  *  - numeric references: 0x00 → U+FFFD, 0x0D → CR, 0x80–0x9F remapped
  *    through windows-1252 (the `_invalid_charrefs` table), surrogates
  *    and > 0x10FFFF → U+FFFD, the `_invalid_codepoints` set (C0/C1
  *    controls, noncharacters) → removed entirely.
  */
object HtmlUnescape {

  /** `html.entities.html5` — name (';' included where the spec requires
    * it) → replacement (1–2 code points).
    */
  private lazy val html5: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](4096)
    val in = getClass.getResourceAsStream("/graft/html5_entities.tsv")
    require(in != null, "html5_entities.tsv resource missing")
    val src = scala.io.Source.fromInputStream(in, "ASCII")
    try src.getLines().foreach { line =>
      val tab = line.indexOf('\t')
      if (tab > 0) m.put(line.substring(0, tab), unescapeU(line.substring(tab + 1)))
    } finally src.close()
    m
  }

  /** \\uXXXX unescape for the TSV value field. */
  private def unescapeU(s: String): String = {
    if (!s.contains('\\')) return s
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 5 < s.length && s.charAt(i + 1) == 'u') {
        sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
        i += 6
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** `html._charref` verbatim (Python `\t\n\f <&#;` exclusions). */
  private val CharRef = Pattern.compile(
    "&(#[0-9]+;?|#[xX][0-9a-fA-F]+;?|[^\\t\\n\\f <&#;]{1,32};?)")

  /** `html._invalid_charrefs`: the numeric-reference-end-state remap
    * (NUL, CR, and the windows-1252 C1 block).
    */
  private val InvalidCharrefs: Map[Int, String] = Map(
    0x00 -> "�", 0x0d -> "\r", 0x80 -> "€", 0x81 -> "",
    0x82 -> "‚", 0x83 -> "ƒ", 0x84 -> "„", 0x85 -> "…",
    0x86 -> "†", 0x87 -> "‡", 0x88 -> "ˆ", 0x89 -> "‰",
    0x8a -> "Š", 0x8b -> "‹", 0x8c -> "Œ", 0x8d -> "",
    0x8e -> "Ž", 0x8f -> "", 0x90 -> "", 0x91 -> "‘",
    0x92 -> "’", 0x93 -> "“", 0x94 -> "”", 0x95 -> "•",
    0x96 -> "–", 0x97 -> "—", 0x98 -> "˜", 0x99 -> "™",
    0x9a -> "š", 0x9b -> "›", 0x9c -> "œ", 0x9d -> "",
    0x9e -> "ž", 0x9f -> "Ÿ")

  /** `html._invalid_codepoints`: resolved but then REMOVED ('' result). */
  private val InvalidCodepoints: Set[Int] =
    ((0x01 to 0x08) ++ (0x0e to 0x1f) ++ (0x7f to 0x9f) ++
      (0xfdd0 to 0xfdef) ++ Seq(0x0b, 0xfffe, 0xffff) ++
      (1 to 16).flatMap(p => Seq((p << 16) | 0xfffe, (p << 16) | 0xffff))).toSet

  def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val m = CharRef.matcher(s)
    val sb = new java.lang.StringBuilder(s.length)
    var pos = 0
    while (m.find()) {
      sb.append(s, pos, m.start())
      sb.append(replaceCharref(m.group(1)))
      pos = m.end()
    }
    sb.append(s, pos, s.length)
    sb.toString
  }

  private def replaceCharref(s: String): String = {
    if (s.charAt(0) == '#') {
      val hex = s.length > 1 && (s.charAt(1) == 'x' || s.charAt(1) == 'X')
      val digits0 = (if (hex) s.substring(2) else s.substring(1)).stripSuffix(";")
      val digits = digits0.replaceFirst("^0+(?=.)", "")
      // Python's int() is arbitrary-precision: a reference too long to fit
      // an Int is necessarily > 0x10FFFF → U+FFFD, same as any overflow
      val num =
        if (digits.length > (if (hex) 6 else 7)) 0x110000
        else Integer.parseInt(digits, if (hex) 16 else 10)
      InvalidCharrefs.get(num) match {
        case Some(r) => r
        case None =>
          if ((num >= 0xd800 && num <= 0xdfff) || num > 0x10ffff) "�"
          else if (InvalidCodepoints.contains(num)) ""
          else new String(Character.toChars(num))
      }
    } else {
      val hit = html5.get(s)
      if (hit != null) hit
      else {
        // longest known prefix of length >= 2, tail kept literal
        var x = s.length - 1
        while (x >= 2) {
          val h = html5.get(s.substring(0, x))
          if (h != null) return h + s.substring(x)
          x -= 1
        }
        "&" + s
      }
    }
  }
}
