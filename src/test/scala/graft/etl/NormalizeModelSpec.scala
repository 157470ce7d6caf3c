package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** Golden test: Normalize/InferType model vs the reference's actual outputs
  * (captured by tools/ref_golden.py into resources/goldens/). Known
  * deviations are explicit here.
  */
class NormalizeModelSpec extends AnyFunSuite {

  private val golden: JObj = {
    val in = getClass.getResourceAsStream("/goldens/normalize_value.json")
    Json.parse(new String(in.readAllBytes(), "UTF-8")).asInstanceOf[JObj]
  }

  /** Formerly-deviating inputs: the battery now mirrors dateutil's
    * negative-number acceptance (Dates.NegNumDateRe), so the set is empty
    * and every golden infer case must match the reference exactly.
    */
  private val inferDeviation = Set.empty[String]

  test("normalize_value matches the reference on the full battery") {
    val m = golden.fields.toMap
    val cases = m("normalize").asInstanceOf[JObj].fields
    val failures = cases.flatMap { case (input, expected0) =>
      val expected = expected0 match {
        case JObj(Vector(("__nan__", JBool(true)))) => JNull
        case x => x
      }
      val got = Normalize.normalizeString(input)
      if (got != expected) Some(s"input=${PyRender.pyReprStr(input)} expected=${Json.render(expected)} got=${Json.render(got)}")
      else None
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("infer_type matches the reference outside documented deviations") {
    val m = golden.fields.toMap
    val cases = m("infer").asInstanceOf[JObj].fields
    val failures = cases.flatMap {
      case (input, JStr(expected)) if !inferDeviation(input) =>
        val got = Normalize.inferType(JStr(input))
        if (got != expected) Some(s"input=${PyRender.pyReprStr(input)} expected=$expected got=$got") else None
      case _ => None
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("negative numbers follow dateutil's shape table (NegNumDateRe)") {
    // verified value-independent against dateutil: pure ints 1-4 digits
    // parse; decimals fail on the fixed-width token lengths / 5-digit int
    // parts; -0 forms fail
    val dates = Seq("-5", "-12.5", "-9999", "-885.0", "-8464.08",
      "-8310.14866", "-123.148", "-.5", "-32.123456")
    val strings = Seq("-0", "-0.5", "-10000", "-8084.0", "-1234.5",
      "-32.148", "-123.05", "-5.123456", "-99999.0", "-.55555")
    dates.foreach(s => assert(Normalize.inferType(JStr(s)) == "date", s))
    strings.foreach(s => assert(Normalize.inferType(JStr(s)) == "string", s))
  }

  test("6-digit negatives follow dateutil's fixed-width branches") {
    // HHMMSS.f branch: any fraction length, time-of-day validity
    val hhmmss = Seq("-104109.0", "-100000.5", "-000000.5", "-235959.123",
      "-102441.1234567")
    val badTime = Seq("-240000.5", "-235960.5", "-236061.0", "-999999.9")
    // bare triplet branch: three 2-digit fields resolved like ymd
    val triplets = Seq("-102441", "-123060", "-311299", "-290260", "-391231",
      "-022960", "-360229")
    val badTriplets = Seq("-999999", "-236061", "-240000", "-000000",
      "-310499", "-022959", "-350229", "-130060")
    (hhmmss ++ triplets).foreach(s => assert(Normalize.inferType(JStr(s)) == "date", s))
    (badTime ++ badTriplets).foreach(s => assert(Normalize.inferType(JStr(s)) == "string", s))
  }

  test("datetime comma/long seconds-fractions parse like dateutil isoformat") {
    assert(Dates.parseIso("2025-11-11 20:30:00,123") == Some("2025-11-11T20:30:00.123000"))
    assert(Dates.parseIso("2025-11-11 20:30:00.123") == Some("2025-11-11T20:30:00.123000"))
    assert(Dates.parseIso("2025-11-11T20:30:00,1Z") == Some("2025-11-11T20:30:00.100000+00:00"))
    // >6 digits truncate to µs; zero/empty fractions drop (python isoformat)
    assert(Dates.parseIso("2025-11-11 20:30:00,1234567") == Some("2025-11-11T20:30:00.123456"))
    assert(Dates.parseIso("2025-11-11 20:30:00.0") == Some("2025-11-11T20:30:00"))
    assert(Dates.parseIso("2025-11-11 20:30:00,") == Some("2025-11-11T20:30:00"))
    // fraction-of-minute: closed by the round-11 DateChain fallback —
    // second = int(60·frac), no microseconds (dateutil _parse_min_sec)
    assert(Dates.parseIso("2025-11-11 20:30,123") == Some("2025-11-11T20:30:07"))
    assert(Dates.parseIso("2025-11-11 20:30,5") == Some("2025-11-11T20:30:30"))
    assert(Normalize.inferType(JStr("2025-11-11 20:30:00,123")) == "date")
  }

  test("comma-date vote resolves day validity against the run date, like dateutil") {
    import java.time.LocalDate
    val jan31 = LocalDate.of(2026, 1, 31) // 31-day month, non-leap year
    val sep15 = LocalDate.of(2026, 9, 15) // 30-day month
    val febNl = LocalDate.of(2026, 2, 10) // 28-day February
    val febLp = LocalDate.of(2024, 2, 10) // leap-year February
    // merged "A.B": v <= 31 is a day in TODAY's month
    assert(Dates.commaIntDateVote("31,5", jan31))
    assert(!Dates.commaIntDateVote("31,5", sep15)) // Sep has no day 31
    assert(!Dates.commaIntDateVote("30,5", febNl))
    assert(Dates.commaIntDateVote("29,5", febLp)) // Feb 29 iff leap year
    assert(!Dates.commaIntDateVote("29,5", febNl))
    assert(Dates.commaIntDateVote("28,5", febNl)) // <= 28 is always a day
    // v >= 32 is a year: dateutil clamps the default day, never raises
    assert(Dates.commaIntDateVote("58,0", febNl))
    assert(Dates.commaIntDateVote("999,1", sep15)) // year 999 (L==6 would reject "9999,1")
    // month-day branch "m,dd": Feb 29 follows the RUN year's leapness
    assert(Dates.commaIntDateVote("2,29", febLp))
    assert(!Dates.commaIntDateVote("2,29", febNl))
    assert(!Dates.commaIntDateVote("9,31", jan31)) // Sep 31 never exists
    assert(Dates.commaIntDateVote("2,1999", jan31)) // month-year form
    // fixed-width rejections are date-independent
    assert(!Dates.commaIntDateVote("123,45", jan31)) // L == 6
    assert(!Dates.commaIntDateVote("1234,567", jan31)) // L == 8
    assert(Dates.commaIntDateVote("235959,5", jan31)) // HHMMSS.f
    assert(!Dates.commaIntDateVote("245959,5", jan31))
  }

  test("python float repr edge cases") {
    assert(PyRender.floatRepr(0.45) == "0.45")
    assert(PyRender.floatRepr(1234.0) == "1234.0")
    assert(PyRender.floatRepr(0.005) == "0.005")
    assert(PyRender.floatRepr(1e16) == "1e+16")
    assert(PyRender.floatRepr(1e15) == "1000000000000000.0")
    assert(PyRender.floatRepr(1e20) == "1e+20")
    assert(PyRender.floatRepr(1.5e-5) == "1.5e-05")
    assert(PyRender.floatRepr(0.0001) == "0.0001")
    assert(PyRender.floatRepr(0.00001) == "1e-05")
    assert(PyRender.floatRepr(-12.5) == "-12.5")
    assert(PyRender.floatRepr(100000.0) == "100000.0")
    assert(PyRender.floatRepr(3.0) == "3.0")
  }

  test("python str of containers") {
    val v = JArr(Vector(JStr("a"), JInt(1), JBool(true), JNull, JFloat(2.5)))
    assert(PyRender.pyStr(v) == "['a', 1, True, None, 2.5]")
    val o = JObj(Vector("k" -> JStr("v"), "n" -> JInt(3)))
    assert(PyRender.pyStr(o) == "{'k': 'v', 'n': 3}")
    assert(PyRender.pyReprStr("it's") == "\"it's\"")
    assert(PyRender.pyReprStr("a\"b'c") == "'a\"b\\'c'")
  }

  test("convertyear window holds at arbitrary run dates, not just today's") {
    // the golden corpus (DateParitySpec) pins the battery at ITS run date;
    // this pins dateutil's convertyear arithmetic across century windows
    import java.time.LocalDate
    def y(v: Int, runYear: Int): Int =
      Dates.convertYear2(v, LocalDate.of(runYear, 6, 15))
    // 2026 window: 1977..2075 (|year - today| < 50)
    assert(y(24, 2026) == 2024 && y(75, 2026) == 2075)
    assert(y(76, 2026) == 1976 && y(99, 2026) == 1999 && y(0, 2026) == 2000)
    // the window slides: in 2090 the same tokens resolve a century later.
    // The kept range is ASYMMETRIC [run-50, run+50): base == run-50 stays
    // (dateutil adds 100 only on a STRICT undershoot), so '40' in 2090 is
    // 2040, not 2140 — the round-8 advisor finding.
    assert(y(24, 2090) == 2124 && y(76, 2090) == 2076 && y(40, 2090) == 2040)
    assert(y(39, 2090) == 2139) // strictly below run-50 wraps forward
    assert(y(41, 2090) == 2041) // inside the window stays
    // year 2000 exactly: window 1951..2049
    assert(y(50, 2000) == 1950 || y(50, 2000) == 2050) // boundary |diff| = 50
    assert(y(50, 2000) == 1950) // 2050 >= today -> subtract
    assert(y(51, 2000) == 1951 && y(49, 2000) == 2049)
    // a 19xx run date uses the 1900 century base
    assert(y(24, 1999) == 2024 && y(60, 1999) == 1960)
    // the scalar battery threads the injected date end to end
    assert(Dates.parseIso("5/1/24", LocalDate.of(2090, 6, 15))
      .contains("2124-05-01T00:00:00"))
    assert(Dates.parseIso("Jan 5 24", LocalDate.of(2090, 6, 15))
      .contains("2124-01-05T00:00:00"))
    // wide members pin the century regardless of the run date
    assert(Dates.parseIso("05/01/099", LocalDate.of(2090, 6, 15))
      .contains("0099-05-01T00:00:00"))
    // Feb-29 validity follows the RESOLVED year: 2/29/28 is leap in the
    // 2026 window (2028) but the 2090 window maps it to 2128, also leap;
    // 2/29/27 fails in both
    assert(Dates.parses("2/29/28", LocalDate.of(2026, 1, 1)))
    assert(!Dates.parses("2/29/27", LocalDate.of(2026, 1, 1)))
  }
}
