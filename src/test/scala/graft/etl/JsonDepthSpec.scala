package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** Round-15 adversarial-review regression: ~900-deep JSON is legal to
  * Jackson's reader (limit 1000) but the tree conversion burned ~10
  * stack frames per level and died as a StackOverflowError — an Error
  * no `catch Exception` backstop in the scan paths sees. The typed
  * depth bound must refuse instead.
  */
class JsonDepthSpec extends AnyFunSuite {

  test("deep nesting refuses typed instead of StackOverflowError") {
    // past our bound but within Jackson's — the exact shape that overflowed
    val d900 = "[" * 900 + "1" + "]" * 900
    assert(Json.parseOpt(d900).isEmpty)
    val e = intercept[IllegalArgumentException](Json.parse(d900))
    assert(e.getMessage.contains("nesting"))
    // past Jackson's own limit too: still a typed refusal, never an Error
    val d200k = "[" * 200000 + "]" * 200000
    assert(Json.parseOpt(d200k).isEmpty)
    // objects hit the same bound
    val o300 = "{\"k\":" * 300 + "1" + "}" * 300
    assert(Json.parseOpt(o300).isEmpty)
  }

  test("reasonable nesting still parses") {
    val d50 = "[" * 50 + "7" + "]" * 50
    var v = Json.parse(d50)
    var depth = 0
    while (v.isInstanceOf[JArr]) { v = v.asInstanceOf[JArr].items.head; depth += 1 }
    assert(depth == 50 && v == JInt(BigInt(7)))
  }
}
