package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class UnigramLmSpec extends AnyFunSuite {

  test("bits is the integer log2 + 1, matching printf('%b') length") {
    assert(UnigramLm.bits(1) == 1)
    assert(UnigramLm.bits(2) == 2)
    assert(UnigramLm.bits(3) == 2)
    assert(UnigramLm.bits(4) == 3)
    assert(UnigramLm.bits(27165) == 15) // pinned against DuckDB printf('%b')
    assert(UnigramLm.bits(Long.MaxValue) == 63)
    intercept[IllegalArgumentException](UnigramLm.bits(0))
  }

  test("substrings: all 1..4-grams, no position marks") {
    assert(UnigramLm.substrings("ab") == Seq("a", "ab", "b"))
    assert(UnigramLm.substrings("abcde").count(_.length == 4) == 2)
    assert(UnigramLm.substrings("abcde").contains("abcd"))
    assert(!UnigramLm.substrings("abcde").contains("abcde"))
  }

  test("segment: exact min over (cost, pieces, path)") {
    val cost = Map("a" -> 3, "b" -> 3, "ab" -> 2, "ba" -> 2, "aba" -> 9)
    // 'aba': a+ba = 3+2=5 np2, ab+a = 2+3=5 np2 — path tie-break: 'a ba' < 'ab a'
    assert(UnigramLm.segment("aba", cost) == Some((5L, 2, "a ba")))
    // cheaper longer piece wins over char spelling
    assert(UnigramLm.segment("ab", cost) == Some((2L, 1, "ab")))
    // fewer pieces wins a cost tie: make 'abab' via ab+ab (4, 2) vs a+ba+b (8,3)
    assert(UnigramLm.segment("abab", cost) == Some((4L, 2, "ab ab")))
    // uncoverable word
    assert(UnigramLm.segment("abc", cost).isEmpty)
  }

  test("segment agrees with brute-force enumeration on random vocabularies") {
    val rnd = new scala.util.Random(15)
    for (_ <- 1 to 300) {
      val w = (1 to (1 + rnd.nextInt(9))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val vocab = UnigramLm.substrings(w).distinct
        .filter(_ => rnd.nextInt(3) > 0)
        .map(p => p -> rnd.nextInt(6)).toMap ++
        w.map(c => c.toString -> 5).toMap // guarantee coverage
      def brute(pos: Int): Seq[(Long, Int, String)] =
        if (pos == w.length) Seq((0L, 0, ""))
        else (1 to math.min(4, w.length - pos)).flatMap { l =>
          val p = w.substring(pos, pos + l)
          vocab.get(p).toSeq.flatMap { c =>
            brute(pos + l).map { case (cc, np, path) =>
              (cc + c, np + 1, if (path.isEmpty) p else p + " " + path)
            }
          }
        }
      val want = brute(0).minBy(t => (t._1, t._2, t._3))
      assert(UnigramLm.segment(w, vocab) == Some(want), w)
    }
  }
}
