package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** Replays the multi-comma vote golden (goldens/comma_vote.json — every
  * shape's live-dateutil parse verdict at the generator's run date, ~4.9k
  * all-digit comma chains) through [[Dates.multiCommaVote]] /
  * [[Dates.commaIntDateVote]]. The generator (tools/fuzz_comma.py) exits
  * nonzero if its own python mirror of the model disagrees with dateutil,
  * so a green golden means dateutil ≡ mirror ≡ (this spec) Scala model.
  */
class MultiCommaFuzzSpec extends AnyFunSuite {

  private val golden: (java.time.LocalDate, Vector[(String, Boolean)]) = {
    val in = getClass.getResourceAsStream("/goldens/comma_vote.json")
    val JObj(fields) = Json.parse(new String(in.readAllBytes(), "UTF-8")): @unchecked
    val m = fields.toMap
    val runDate = java.time.LocalDate.parse(m("run_date").asInstanceOf[JStr].s)
    val entries = m("entries").asInstanceOf[JArr].items.map {
      case JArr(Vector(JStr(s), JBool(v))) => (s, v)
      case other => fail(s"bad golden row: $other")
    }
    (runDate, entries)
  }

  test("multi-comma vote matches live dateutil on every fuzzed shape") {
    val (runDate, entries) = golden
    val bad = entries.filter { case (s, expect) =>
      Dates.commaIntDateVote(s, runDate) != expect
    }
    assert(bad.isEmpty,
      s"${bad.size} deviations (of ${entries.size}):\n" +
        bad.take(40).map { case (s, e) => s"  $s expected=$e" }.mkString("\n"))
  }

  test("headline shapes vote as documented") {
    val d = golden._1
    assert(Dates.commaIntDateVote("12,34,56", d)) // merged 12.34 + year 56
    assert(Dates.commaIntDateVote("5,6,2024", d)) // month,day,year
    assert(!Dates.commaIntDateVote("1,000,000", d)) // thousands sep: day 0
    assert(!Dates.commaIntDateVote("13,5,2024", d)) // merged 13.5 → month 13
    assert(!Dates.commaIntDateVote("2,29,2024", d)) // 29,2024 merges: no year
  }
}
