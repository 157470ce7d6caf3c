package graft.ops

/** Unigram-LM (SentencePiece-style) tokenizer primitives — completes the
  * tokenizer trio next to BPE (vocab01) and WordPiece (vocab04). The
  * reference has no tokenizer at all (etl_pipeline.py); this is the
  * 100 TB extension surface (vocab06).
  *
  * Deliberately deterministic re-specification of Kudo 2018 so a DuckDB
  * oracle replays training bit-exactly:
  *   - piece scores are INTEGER log2 costs: cost(p) = bits(total) -
  *     bits(count_p) (bits = position of highest set bit) — no float
  *     log-likelihoods, so no cross-engine libm rounding to disagree on;
  *   - Viterbi inference is the exact minimum over ALL segmentations of
  *     (Σcost, n_pieces, path-string) — the lexicographic path tie-break
  *     makes the chosen segmentation (not just its score) a total order,
  *     which is what lets the hard-EM recount be replayed exactly;
  *   - one hard-EM round: usage(p) = Σ word-count × multiplicity of p in
  *     the chosen path; pieces with zero usage are pruned (the unigram
  *     shrink step) and costs are re-derived from usages.
  *
  * Words are vocabulary-sized (the distinct-token table), never corpus-
  * sized, so all of this is broadcast-scale work — the vocab04 contract.
  */
object UnigramLm {

  /** bit length of x ≥ 1 (= floor(log2 x) + 1), the integer log the cost
    * table is built from; matches DuckDB's length(printf('%b', x)).
    */
  def bits(x: Long): Int = {
    require(x >= 1, s"bits($x)")
    64 - java.lang.Long.numberOfLeadingZeros(x)
  }

  /** all substrings of w with length 1..maxLen (seed candidates; unlike
    * WordPiece there are no `##` continuation marks — unigram pieces are
    * position-free)
    */
  def substrings(w: String, maxLen: Int = 4): Seq[String] =
    for {
      i <- 0 until w.length
      l <- 1 to math.min(maxLen, w.length - i)
    } yield w.substring(i, i + l)

  /** Exact Viterbi: the minimum over all segmentations of w into vocab
    * pieces by (Σcost, pieces, path) — path compared as the space-joined
    * piece string (byte order; corpus is ASCII). Returns
    * (Σcost, n_pieces, path) or None if w cannot be covered.
    * Branch-and-bound enumeration: prefixes already costlier than the
    * best complete path are cut, so sparse vocabularies stay near-linear.
    */
  def segment(w: String, cost: collection.Map[String, Int],
      maxLen: Int = 4): Option[(Long, Int, String)] = {
    var best: (Long, Int, String) = null
    val pieces = new Array[String](w.length) // reused path buffer
    def go(pos: Int, acc: Long, np: Int): Unit = {
      if (pos == w.length) {
        val path = pieces.take(np).mkString(" ")
        if (best == null || acc < best._1 ||
            (acc == best._1 && (np < best._2 ||
              (np == best._2 && path.compareTo(best._3) < 0))))
          best = (acc, np, path)
        return
      }
      if (best != null && acc > best._1) return // bound: costs are >= 0
      var l = math.min(maxLen, w.length - pos)
      while (l >= 1) {
        val p = w.substring(pos, pos + l)
        val c = cost.get(p)
        if (c.isDefined) {
          pieces(np) = p
          go(pos + l, acc + c.get, np + 1)
        }
        l -= 1
      }
    }
    go(0, 0L, 0)
    Option(best)
  }
}
