package graft.etl

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based locks on the pure core (SURVEY.md §5.3). */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  test("percent branch: n% → n/100 for any non-negative decimal") {
    check(Prop.forAll(Gen.chooseNum(0, 999999), Gen.chooseNum(0, 99)) { (a: Int, b: Int) =>
      val s = s"$a.$b%"
      Normalize.normalizeString(s) == JFloat(s"$a.$b".toDouble / 100.0)
    })
  }

  test("bare non-negative integers stay digit strings (phone-branch quirk)") {
    check(Prop.forAll(Gen.chooseNum(2L, Long.MaxValue / 2)) { n =>
      Normalize.normalizeString(n.toString) == JStr(n.toString)
    })
  }

  test("currency values parse to ints through the comma/symbol strip") {
    check(Prop.forAll(Gen.chooseNum(0, 999), Gen.chooseNum(100, 999)) { (th: Int, rest: Int) =>
      Normalize.normalizeString(s"$$$th,$rest") == JInt(BigInt(s"$th$rest"))
    })
  }

  test("normalizeString is total and idempotent-on-render for ASCII input") {
    val ascii = Gen.listOf(Gen.choose(' ', '~')).map(_.mkString)
    check(Prop.forAll(ascii) { s =>
      val out = Normalize.normalizeCell(JStr(s)) // must not throw
      out != null
    })
  }

  test("flattenDicts is lossless for collision-free nested objects") {
    val leafGen: Gen[JVal] = Gen.oneOf(
      Gen.alphaStr.map(JStr(_)), Gen.chooseNum(-1000, 1000).map(n => JInt(BigInt(n))),
      Gen.oneOf(JBool(true), JBool(false), JNull))
    def objGen(depth: Int): Gen[JObj] =
      for {
        n <- Gen.choose(1, 4)
        keys <- Gen.listOfN(n, Gen.identifier.map(_.take(5))).map(_.distinct)
        vals <- Gen.sequence[Vector[JVal], JVal](keys.map(_ =>
          if (depth <= 0) leafGen else Gen.frequency(3 -> leafGen, 1 -> objGen(depth - 1))))
      } yield JObj(keys.toVector.zip(vals))
    check(Prop.forAll(objGen(2)) { o =>
      val flat = Extract.flattenDicts(o.fields)
      def leaves(prefix: String, v: JVal): Vector[(String, JVal)] = v match {
        case JObj(fs) => fs.flatMap { case (k, x) =>
          leaves(if (prefix.isEmpty) k else s"$prefix.$k", x) }
        case other => Vector(prefix -> other)
      }
      // lossless: same leaf set...
      val lossless = flat.toMap == leaves("", o).toMap && flat.size == leaves("", o).size
      // ...and json_normalize order: top-level scalars first (appearance),
      // then each top-level dict's subtree in appearance order
      val scalars = o.fields.collect { case (k, v) if !v.isInstanceOf[JObj] => k -> v }
      val nested = o.fields.collect { case (k, d: JObj) => leaves("", JObj(Vector(k -> d))) }.flatten
      lossless && flat == (scalars ++ nested)
    })
  }

  test("infer_type only emits the six reference tags") {
    val tags = Set("null", "integer", "float", "boolean", "date", "string")
    val anyCell: Gen[JVal] = Gen.oneOf(
      Gen.asciiPrintableStr.map(JStr(_)),
      Gen.chooseNum(-1e6, 1e6).map(JFloat(_)),
      Gen.chooseNum(-1000000, 1000000).map(n => JInt(BigInt(n))),
      Gen.oneOf(JBool(true), JBool(false), JNull))
    check(Prop.forAll(anyCell) { v => tags.contains(Normalize.inferType(v)) })
  }
}
