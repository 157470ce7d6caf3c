package graft.ops

/** UTS #39 confusables skeleton + Unicode NFKC_Casefold — the dedup
  * normalization layer beyond NFC: homoglyph spam (Cyrillic а for Latin a,
  * Greek ο for o, fullwidth/mathematical letter clones) collides to one
  * key only under skeleton(), and NFKC_Casefold folds case, compatibility
  * forms, and default-ignorables first. Reference behavior:
  * AdityaNayak12/ETL-Pipeline-Project-Auraverse has no Unicode layer
  * (etl_pipeline.py normalizes with str.strip/lower only); this is the
  * 100 TB-corpus extension (text20).
  *
  * Tables ride as resources extracted from the system ICU 72.1 / Unicode
  * 15.0 by tools/extract_uts39_tables.py (public UCD data —
  * confusables.txt prototypes and the NFKC_CF derived property; SHA-256
  * asserted below, same provenance pattern as the brotli dictionary).
  * Composition contracts, validated there against direct ICU calls on a
  * 528-string battery and re-pinned by ConfusablesSpec:
  *
  *   nfkcCasefold(X) = NFC( concat mapCF(c) for c in X )
  *   skeleton(X)     = NFD( concat mapSkel(c) for c in NFD(X) )
  *
  * Per-row scalar maps: shuffle-free, codegen-adjacent (deterministic,
  * allocation-light), safe at any corpus scale.
  */
object Confusables {

  private def table(name: String, sha256: String): java.util.HashMap[Integer, String] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    require(in != null, s"missing resource $name")
    val bytes = in.readAllBytes()
    in.close()
    val got = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString
    require(got == sha256, s"$name sha256 $got != $sha256")
    val m = new java.util.HashMap[Integer, String](1 << 16)
    new String(bytes, java.nio.charset.StandardCharsets.US_ASCII)
      .split('\n').filter(_.nonEmpty).foreach { line =>
        val t = line.indexOf('\t')
        val cp = Integer.parseInt(line.substring(0, t), 16)
        val out = line.substring(t + 1)
        val sb = new java.lang.StringBuilder(4)
        if (out.nonEmpty)
          out.split(' ').foreach(h => sb.appendCodePoint(Integer.parseInt(h, 16)))
        m.put(cp, sb.toString)
      }
    m
  }

  private lazy val skelMap = table("uts39_skeleton.tsv",
    "00a0e9a669d282bd774d4dd78437026d4bab68e0b92b6c35c6af36f575992aa8")
  private lazy val cfMap = table("nfkc_casefold.tsv",
    "2890c2a937c1f94605c3cf0f45cd6f823776cc90962408528a2c0b94f6e12574")

  private def mapBy(m: java.util.HashMap[Integer, String], s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + (s.length >> 3))
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val mapped = m.get(cp)
      if (mapped == null) sb.appendCodePoint(cp) else sb.append(mapped)
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** Unicode toNFKC_Casefold: per-cp NFKC_CF map, then NFC. */
  def nfkcCasefold(s: String): String =
    java.text.Normalizer.normalize(
      mapBy(cfMap, s), java.text.Normalizer.Form.NFC)

  /** UTS #39 skeleton: NFD, per-cp confusable prototype map, NFD. */
  def skeleton(s: String): String = {
    val d = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    java.text.Normalizer.normalize(
      mapBy(skelMap, d), java.text.Normalizer.Form.NFD)
  }

  /** The homoglyph-dedup key: fold case/compat first, then skeleton —
    * the order UTS #39 §4 recommends for identifier comparison.
    */
  def dedupKey(s: String): String = skeleton(nfkcCasefold(s))

  // ------------------------------------------------- script mixing (§5.1)

  /** Unicode Script property as sorted ranges, extracted from ICU 72.1 by
    * tools/extract_script_ranges.py (952 runs). Gaps and omitted runs are
    * Zzzz (Unknown).
    */
  private lazy val (scriptStarts, scriptEnds, scriptNames):
      (Array[Int], Array[Int], Array[String]) = {
    val in = getClass.getResourceAsStream("/graft/unicode_scripts.tsv")
    require(in != null, "missing resource unicode_scripts.tsv")
    val bytes = in.readAllBytes()
    in.close()
    val got = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString
    require(got == "6ae05c85f2f0416ec831be6c6caa08a5cf0c9b70d77871909e21987959492f88",
      s"unicode_scripts.tsv sha256 $got")
    val lines = new String(bytes, java.nio.charset.StandardCharsets.US_ASCII)
      .split('\n').filter(_.nonEmpty)
    val starts = new Array[Int](lines.length)
    val ends = new Array[Int](lines.length)
    val names = new Array[String](lines.length)
    var i = 0
    lines.foreach { line =>
      val f = line.split('\t')
      starts(i) = Integer.parseInt(f(0), 16)
      ends(i) = Integer.parseInt(f(1), 16)
      names(i) = f(2).intern()
      i += 1
    }
    (starts, ends, names)
  }

  /** 4-letter script code of a code point (Zyyy = Common, Zinh =
    * Inherited, Zzzz = Unknown).
    */
  def script(cp: Int): String = {
    var lo = 0
    var hi = scriptStarts.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (cp < scriptStarts(mid)) hi = mid - 1
      else if (cp > scriptEnds(mid)) lo = mid + 1
      else return scriptNames(mid)
    }
    "Zzzz"
  }

  /** The distinct real scripts of a string — Common and Inherited code
    * points (digits, punctuation, combining marks) never count, per
    * UTS #39 §5.1's resolution rules.
    */
  def scripts(s: String): Set[String] = {
    val out = scala.collection.mutable.Set[String]()
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val sc = script(cp)
      if (sc != "Zyyy" && sc != "Zinh") out += sc
      i += Character.charCount(cp)
    }
    out.toSet
  }

  /** Single-script per UTS #39 §5.1 (Common/Inherited-only strings are
    * not mixed).
    */
  def isMixedScript(s: String): Boolean = scripts(s).size > 1
}
