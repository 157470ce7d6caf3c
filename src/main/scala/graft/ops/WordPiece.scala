package graft.ops

/** WordPiece tokenizer primitives (Wu et al. 2016; the BERT tokenizer's
  * greedy longest-match-first segmentation with `##` continuation marks).
  * Training here is the frequency-threshold inventory build the public
  * descriptions give: every substring occurrence of every word (length ≤
  * [[MaxPieceLen]], continuation occurrences marked `##`) is weighted by
  * the word's corpus count, and pieces clearing a count threshold form
  * the vocabulary. Encoding is the reference algorithm: at each position
  * take the LONGEST vocabulary piece; if no piece matches, the whole
  * word maps to `[UNK]` (one piece, flagged) — not a partial segmentation.
  *
  * Both halves operate on the DISTINCT-WORD table, never the corpus: the
  * corpus contributes one map-side-combinable word count and one final
  * broadcast join, which is what makes the shape hold at 100 TB.
  */
object WordPiece {

  val MaxPieceLen = 4

  /** All marked substring occurrences of `w`: position 0 pieces verbatim,
    * continuation pieces prefixed `##` (so `aa` word-initial and `aa`
    * mid-word train as distinct inventory entries, as in BERT).
    */
  def substrings(w: String, maxLen: Int = MaxPieceLen): Iterator[String] =
    for {
      i <- (0 until w.length).iterator
      l <- (1 to math.min(maxLen, w.length - i)).iterator
    } yield mark(w.substring(i, i + l), i)

  private def mark(s: String, pos: Int): String = if (pos == 0) s else "##" + s

  /** Greedy longest-match-first encode: `(nPieces, unk)`. `unk` words
    * count as exactly one piece (the `[UNK]` token), per the reference
    * algorithm's whole-word fallback.
    */
  def encode(w: String, inVocab: String => Boolean,
             maxLen: Int = MaxPieceLen): (Int, Int) = {
    var pos = 0
    var np = 0
    while (pos < w.length) {
      var l = math.min(maxLen, w.length - pos)
      var step = 0
      while (l >= 1 && step == 0) {
        if (inVocab(mark(w.substring(pos, pos + l), pos))) step = l
        l -= 1
      }
      if (step == 0) return (1, 1) // no piece fits: whole word -> [UNK]
      np += 1
      pos += step
    }
    (np, 0)
  }
}
