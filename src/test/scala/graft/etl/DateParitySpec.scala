package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** Parity of the [[Dates]] free-form battery against dateutil's actual
  * verdicts, enumerated by tools/date_parity.py into
  * resources/goldens/date_parity.json (4 600+ shapes: numeric triplets in
  * both member orders across '/', '-', '.' separators, month-name forms,
  * time suffixes with meridiem/fraction edges, plus the documented
  * out-of-battery families).
  *
  * Covered families must match EXACTLY (acceptance and rendered isoformat).
  * Out-of-battery families (covered=false: 3-digit years, bare-hour and
  * timezone suffixes, weekday prefixes, punctuation variants, multi-comma
  * digit strings) are measured and bounded, never silently asserted away:
  * the battery must at least never PARSE one of them to a WRONG value — for
  * those, not parsing (deviation logged by the pipeline's vote) is the
  * documented behavior, a wrong parse would be a silent corruption.
  */
class DateParitySpec extends AnyFunSuite {

  /** The generator's run date: dateutil resolved 2-digit years against ITS
    * wall clock, so the battery must replay with the same date (production
    * callers bind the live clock, matching live dateutil).
    */
  private var runDate: java.time.LocalDate = null

  private val golden: (Int, Vector[(String, String, Boolean, Option[String])]) = {
    val in = getClass.getResourceAsStream("/goldens/date_parity.json")
    val JObj(fields) = Json.parse(new String(in.readAllBytes(), "UTF-8")): @unchecked
    val m = fields.toMap
    val skipped = m("skipped_unstable").asInstanceOf[JInt].i.toInt
    runDate = java.time.LocalDate.parse(m("run_date").asInstanceOf[JStr].s)
    val entries = m("entries").asInstanceOf[JArr].items.map {
      case JArr(Vector(JStr(s), JStr(fam), JBool(cov), iso)) =>
        val exp = iso match {
          case JStr(v) => Some(v)
          case _ => None
        }
        (s, fam, cov, exp)
      case other => fail(s"bad golden row: $other")
    }
    (skipped, entries)
  }

  test("covered families match dateutil exactly (acceptance AND isoformat)") {
    val failures = golden._2.filter(_._3).flatMap { case (s, fam, _, exp) =>
      val got = Dates.parseIso(s, runDate)
      if (got != exp) Some(s"[$fam] input=${PyRender.pyReprStr(s)} expected=$exp got=$got")
      else None
    }
    assert(failures.isEmpty,
      s"${failures.size} covered-family deviations:\n" + failures.take(40).mkString("\n"))
  }

  test("battery never mis-parses an out-of-battery shape to a wrong value") {
    // Unparsed uncovered shapes are the documented deviation; a shape we DO
    // parse must agree with dateutil. (A 2-digit-year triplet that we read
    // as something else entirely would corrupt cells, not just votes.)
    val wrong = golden._2.filterNot(_._3).flatMap { case (s, fam, _, exp) =>
      Dates.parseIso(s, runDate) match {
        case Some(got) if !exp.contains(got) =>
          Some(s"[$fam] input=${PyRender.pyReprStr(s)} dateutil=$exp battery=$got")
        case _ => None
      }
    }
    assert(wrong.isEmpty, wrong.mkString("\n"))
  }

  test("out-of-battery shapes have ZERO deviations (round-11 chain closure)") {
    // covered=false now means "decided by the DateChain fallback, not the
    // oracle-shared RE2 grammar" — the VERDICT must still match dateutil
    // exactly on every shape (acceptance AND rendered isoformat)
    val unc = golden._2.filterNot(_._3)
    val devs = unc.filter { case (s, _, _, exp) => Dates.parseIso(s, runDate) != exp }
    info(s"out-of-battery shapes: ${unc.size}, deviating: ${devs.size} " +
      s"(families: ${unc.map(_._2).distinct.mkString(", ")})")
    assert(unc.nonEmpty && devs.isEmpty,
      devs.take(40).map { case (s, fam, _, exp) =>
        s"[$fam] input=${PyRender.pyReprStr(s)} dateutil=$exp " +
          s"battery=${Dates.parseIso(s, runDate)}"
      }.mkString("\n"))
  }

  test("run-date-dependent shapes were excluded at corpus-build time") {
    // the generator's two-default tripwire: if this grows, a family leaked
    // run-date dependence into the corpus and the goldens would be unstable
    assert(golden._1 <= 5, s"unexpectedly many unstable shapes: ${golden._1}")
  }

  test("column-level InferDateRe agrees with the scalar battery on full-date shapes") {
    // the vote regex is plausibility-shaped for the legacy ISO alternative
    // but calendar-exact for the round-8 families; on this corpus the two
    // sides must give the same accept/reject verdict except for documented
    // ISO-plausibility over-acceptance (invalid calendar values inside a
    // syntactically-ISO shape) and NegNumDateRe shapes that are not in this
    // corpus at all.
    val isoLoose = "^\\d{4}-\\d{2}-\\d{2}([T ]\\d{2}:\\d{2}(:\\d{2}([.,]\\d*)?)?(Z|[+-]\\d{2}:?\\d{2})?)?$".r
    val failures = golden._2.filter(_._3).flatMap { case (s, fam, _, _) =>
      val model = Dates.parses(s, runDate)
      val column =
        NormalizeCol.voteNormalize(s).matches(NormalizeCol.InferDateRe)
      if (model != column && isoLoose.findFirstIn(s).isEmpty)
        Some(s"[$fam] input=${PyRender.pyReprStr(s)} model=$model column=$column")
      else None
    }
    assert(failures.isEmpty,
      s"${failures.size} model/column splits:\n" + failures.take(40).mkString("\n"))
  }

  test("prefix-gated split ≡ union battery on every golden shape (covered AND not)") {
    // the round-10 hot path runs InferDateMainRe, then TimeFirstRe only
    // behind TimeFirstGateRe — this replays the ENTIRE golden corpus and
    // demands the split verdict is bit-identical to the union regex the
    // scalar mirrors still use (the gate may never drop a true match)
    val splits = golden._2.flatMap { case (s, fam, _, _) =>
      val n = NormalizeCol.voteNormalize(s)
      val union = n.matches(NormalizeCol.InferDateRe)
      val gated = n.matches(NormalizeCol.InferDateMainRe) ||
        (java.util.regex.Pattern.compile(NormalizeCol.TimeFirstGateRe).matcher(n).find() &&
          n.matches(NormalizeCol.TimeFirstRe))
      if (union != gated)
        Some(s"[$fam] input=${PyRender.pyReprStr(s)} union=$union gated=$gated")
      else None
    }
    assert(splits.isEmpty,
      s"${splits.size} union/gated splits:\n" + splits.take(40).mkString("\n"))
  }
}
