package graft.ops

/** Byte-level BPE front end (round 16) — the GPT-2 / tiktoken-style
  * pretokenization production tokenizers actually use, aligning the
  * vocab01/02 word-level trainer with practice:
  *
  *   - the GPT-2 pretokenizer regex (contractions, ` ?letters`,
  *     ` ?digits`, ` ?punct-run`, trailing/inner whitespace — published
  *     in the GPT-2 encoder source and reused by HF/tiktoken),
  *   - the 256-entry byte-to-unicode table (`bytes_to_unicode`):
  *     printable bytes `!`..`~`, `¡`..`¬`, `®`..`ÿ` map to themselves,
  *     every other byte to U+0100+n in ascending byte order — so every
  *     byte string becomes a lossless, space-free unicode string the
  *     merge loop can treat as characters (space → `Ġ`, newline → `Ċ`).
  *
  * Pieces from [[pretokenize]] + [[toByteUnicode]] feed the same greedy
  * merge training as vocab01 (pair counts over piece frequencies — the
  * corpus-scale stage stays ONE aggregate). Fidelity is pinned by
  * ByteBpeSpec against verdicts from the genuine python `regex` engine
  * (tools/make_bytebpe_fixture.py).
  */
object ByteBpe {

  /** GPT-2 `bytes_to_unicode`: index = byte value, value = the mapped
    * character.
    */
  val byteEncoder: Array[Char] = {
    val keep = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var n = 0
    Array.tabulate(256) { b =>
      if (keep(b)) b.toChar
      else { val c = (256 + n).toChar; n += 1; c }
    }
  }

  /** inverse table for decode round trips */
  val byteDecoder: Map[Char, Int] =
    byteEncoder.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** The GPT-2 pretokenizer. Java's `\p{L}`/`\p{N}` are the same Unicode
    * general categories python `regex` uses; UNICODE_CHARACTER_CLASS
    * aligns `\s` with python's unicode whitespace.
    */
  private val Pat = java.util.regex.Pattern.compile(
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  def pretokenize(text: String): Vector[String] = {
    val m = Pat.matcher(text)
    val out = Vector.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** UTF-8 bytes of `piece` through the byte-to-unicode table. */
  def toByteUnicode(piece: String): String = {
    val bytes = piece.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(byteEncoder(bytes(i) & 0xff)); i += 1 }
    sb.toString
  }

  /** byte-unicode string back to the original text (lossless inverse) */
  def fromByteUnicode(s: String): String = {
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      bytes(i) = byteDecoder.getOrElse(s.charAt(i),
        throw new IllegalArgumentException(
          f"char U+${s.charAt(i).toInt}%04X is not in the byte table")).toByte
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** the full front end: text → byte-unicode pieces */
  def pieces(text: String): Vector[String] =
    pretokenize(text).map(toByteUnicode)
}
