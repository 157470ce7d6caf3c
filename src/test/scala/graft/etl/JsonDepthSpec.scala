package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** Deep-nesting behavior of the JSON cell codec. Round 15 found the
  * recursive tree conversion dying of StackOverflowError at ~900 levels
  * and guarded it at 200; round 16 made conversion AND rendering run on
  * explicit stacks, so the only bound left is Jackson's own reader
  * limit (1000 nesting, StreamReadConstraints) — the same magnitude
  * where CPython's json.loads dies of RecursionError, closing the
  * 200-990 loads-parity divergence window the round-15 ADVICE flagged.
  */
class JsonDepthSpec extends AnyFunSuite {

  test("900-deep JSON parses AND renders back (python json.loads parity)") {
    val d900 = "[" * 900 + "1" + "]" * 900
    var v = Json.parse(d900)
    var depth = 0
    while (v.isInstanceOf[JArr]) { v = v.asInstanceOf[JArr].items.head; depth += 1 }
    assert(depth == 900 && v == JInt(BigInt(1)))
    assert(Json.render(Json.parse(d900)) == d900)
    // deep objects too
    val o900 = "{\"k\": " * 900 + "1" + "}" * 900
    assert(Json.render(Json.parse(o900)) == o900)
  }

  test("past Jackson's 1000 reader limit refuses typed, never an Error") {
    val d200k = "[" * 200000 + "]" * 200000
    assert(Json.parseOpt(d200k).isEmpty)
    val d1500 = "[" * 1500 + "1" + "]" * 1500
    assert(Json.parseOpt(d1500).isEmpty)
  }

  test("parse-depth values survive the downstream cell walkers too") {
    // the round-16 review found the guard removal re-exposed SOE in the
    // still-recursive consumers; pyStr/pyRepr and deepFlatten now run on
    // explicit stacks — drive 900 deep through each
    val d900 = Json.parse("[" * 900 + "1" + "]" * 900)
    val py = PyRender.pyStr(d900)
    assert(py.startsWith("[[[") && py.endsWith("]]]") && py.contains("1"))
    // deep dict through the extraction flatten (E1's path)
    val o900 = Json.parse("{\"k\": " * 900 + "1" + "}" * 900)
    val flat = Extract.flattenDicts(o900.asInstanceOf[JObj].fields)
    assert(flat.length == 1 && flat.head._2 == JInt(BigInt(1)))
    assert(flat.head._1 == Seq.fill(899)("k").mkString("k.", ".", ""))
    // and the small-value outputs are byte-identical to the recursive form
    val small = Json.parse("""{"a": [1, "x", {"b": null}], "c": 1.5}""")
    assert(PyRender.pyStr(small) == "{'a': [1, 'x', {'b': None}], 'c': 1.5}")
    assert(PyRender.pyRepr(JStr("it's")) == "\"it's\"")
  }

  test("reasonable nesting still parses") {
    val d50 = "[" * 50 + "7" + "]" * 50
    var v = Json.parse(d50)
    var depth = 0
    while (v.isInstanceOf[JArr]) { v = v.asInstanceOf[JArr].items.head; depth += 1 }
    assert(depth == 50 && v == JInt(BigInt(7)))
  }
}
