package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pins the WordPiece reference algorithm's corner cases that the
  * vocab04 oracle cannot isolate: whole-word [UNK] fallback, longest-
  * match preference over more-pieces segmentations, word-initial vs
  * continuation (`##`) vocabulary identity, and substring training
  * enumeration.
  */
class WordPieceSpec extends AnyFunSuite {

  private def vocab(ps: String*): String => Boolean = ps.toSet

  test("greedy takes the longest piece at each position") {
    // "abcd" with {a, ab, abc, ##b, ##c, ##d, ##cd}: greedy takes abc + ##d,
    // not ab + ##cd, not a + ##b + ##cd
    val v = vocab("a", "ab", "abc", "##b", "##c", "##d", "##cd")
    assert(WordPiece.encode("abcd", v) == (2, 0))
  }

  test("greedy is not optimal and that is the contract") {
    // "abcd" with {ab, abc, ##d, ##bcd}: greedy abc+##d = 2 pieces; the
    // alternative a... ab+##... can't even start differently — but with
    // {a, abc, ##bcd}: greedy takes abc, then ##d missing -> UNK, even
    // though a + ##bcd segments fully. Reference WordPiece does exactly
    // this (no backtracking).
    val v = vocab("a", "abc", "##bcd")
    assert(WordPiece.encode("abcd", v) == (1, 1))
  }

  test("word-initial and continuation pieces are distinct identities") {
    // "aa": needs word-initial "a" AND continuation "##a"
    assert(WordPiece.encode("aa", vocab("a", "##a")) == (2, 0))
    assert(WordPiece.encode("aa", vocab("a")) == (1, 1))      // no ##a
    assert(WordPiece.encode("aa", vocab("##a")) == (1, 1))    // no initial a
  }

  test("whole-word UNK on any positional miss, one piece total") {
    val v = vocab("x", "##y")
    assert(WordPiece.encode("xyz", v) == (1, 1)) // x, ##y, then ##z misses
    assert(WordPiece.encode("q", v) == (1, 1))
    assert(WordPiece.encode("xy", v) == (2, 0))
  }

  test("single-piece word and max-length bound") {
    assert(WordPiece.encode("abcd", vocab("abcd")) == (1, 0))
    // maxLen 4: a 5-char word cannot be one piece even if present
    assert(WordPiece.encode("abcde", vocab("abcde")) == (1, 1))
    assert(WordPiece.encode("abcde", vocab("abcd", "##e")) == (2, 0))
  }

  test("substring training enumerates marked occurrences") {
    val subs = WordPiece.substrings("abc").toSeq
    assert(subs == Seq("a", "ab", "abc", "##b", "##bc", "##c"))
    // a repeated interior substring occurs once per position
    assert(WordPiece.substrings("aaa").toSeq ==
      Seq("a", "aa", "aaa", "##a", "##aa", "##a"))
  }

  test("empty word encodes to zero pieces, no UNK") {
    assert(WordPiece.encode("", vocab("a")) == (0, 0))
  }
}
