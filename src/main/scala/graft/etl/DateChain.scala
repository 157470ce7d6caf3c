package graft.etl

import java.time.LocalDate
import scala.collection.mutable.ArrayBuffer

/** Token-chain date model — a faithful re-implementation of dateutil's
  * parser pipeline (lexer → per-token dispatch → ymd resolution → tz
  * validation), used as the FALLBACK behind the pinned regex families in
  * [[Dates.parseIso]]. The regex battery owns every covered golden family
  * (bit-identical, oracle-shared shapes); this model closes the chain
  * shapes the one-shot regexes cannot express — double clock times with
  * later-wins overwrite ("10:30 10:40 Jan 5 2024" → 10:40),
  * fraction-of-minute seconds ("3:4.5" → 03:04:30), generic tz NAMES in
  * lead position ("10:30 EST 5 Jan 2024" → naive), numeric-offset
  * overwrite chains ("10:30+05:00 … +3" → +03:00), hms labels
  * ("5h30m"), and multi-comma digit dates ("5,6,2024" → 2024-05-06).
  *
  * Semantics were probed against live dateutil 2.9 (tools/date_parity.py
  * regenerates the golden corpus, DateParitySpec replays it; the chain
  * family is pinned at 0 deviations). Key measured rules:
  *
  *  - LEXER: alpha runs and digit runs are tokens; a '.' merges into a
  *    digit run as a decimal point, a ',' merges only when ≥2 digits
  *    precede it; a merged run with >1 dot, trailing '.'/',', or letters
  *    splits back into alternating value/separator tokens; a comma-merged
  *    run with no '.' rewrites ',' → '.' ("30,5" → "30.5").
  *  - HH:MM sets hour AND (minute, second) where second comes ONLY from a
  *    fraction-of-minute (int(60·frac)) — an un-fractioned later clock
  *    RESETS an earlier seconds value, while microseconds persist
  *    ("10:30:15.5 10:40" → 10:40:00.500000 — probed).
  *  - A meridiem applies IMMEDIATELY to the current hour (hour must be
  *    0..12 for a standalone token; the "12 am" spaced/attached forms skip
  *    that bound — "15 pm" → 15:00, probed) and is lost if a later clock
  *    overwrites the hour ("10:30 PM 10:40" → 10:40).
  *  - A tz NAME is accepted only while hour is set and BOTH tzname and
  *    tzoffset are unset (uppercase ≤5 letters, or the literal UTCZONE
  *    forms); numeric offsets may repeat and the later one wins; validate
  *    resets a nonzero offset when the name is a UTC zone and maps
  *    Z/z-named results to +00:00.
  *  - ymd members carry STRING semantics behind '/'/'-'/'.' separators (a
  *    ≥3-digit member pins the century) and VALUE semantics when
  *    space/jump-joined (Decimal > 100 pins), exactly the split the
  *    regex families encode; resolve follows dateutil's mstridx cases.
  *
  * The model only returns a value when year, month AND day are all
  * determined by the string — dateutil fills missing members from its
  * run-date default, which the battery treats as out of scope (the golden
  * generator's two-default tripwire excludes those shapes as unstable).
  */
private[etl] object DateChain {

  private final class Bail extends RuntimeException(null, null, false, false)
  private def bail(): Nothing = throw new Bail

  // ---- vocabulary (parserinfo defaults, lowercased lookups) ----
  private val Jump = Set(" ", ".", ",", ";", "-", "/", "'",
    "at", "on", "and", "ad", "m", "t", "of", "st", "nd", "rd", "th")
  private val Weekdays = Map(
    "mon" -> 0, "monday" -> 0, "tue" -> 1, "tuesday" -> 1,
    "wed" -> 2, "wednesday" -> 2, "thu" -> 3, "thursday" -> 3,
    "fri" -> 4, "friday" -> 4, "sat" -> 5, "saturday" -> 5,
    "sun" -> 6, "sunday" -> 6)
  private val Months = Map(
    "jan" -> 1, "january" -> 1, "feb" -> 2, "february" -> 2,
    "mar" -> 3, "march" -> 3, "apr" -> 4, "april" -> 4, "may" -> 5,
    "jun" -> 6, "june" -> 6, "jul" -> 7, "july" -> 7,
    "aug" -> 8, "august" -> 8, "sep" -> 9, "sept" -> 9, "september" -> 9,
    "oct" -> 10, "october" -> 10, "nov" -> 11, "november" -> 11,
    "dec" -> 12, "december" -> 12)
  private val Hms = Map(
    "h" -> 0, "hour" -> 0, "hours" -> 0,
    "m" -> 1, "minute" -> 1, "minutes" -> 1,
    "s" -> 2, "second" -> 2, "seconds" -> 2)
  private val Ampm = Map("am" -> 0, "a" -> 0, "pm" -> 1, "p" -> 1)
  private val UtcZoneExact = Set("UTC", "GMT", "Z", "z") // case-sensitive list
  private val UtcZoneLower = Set("utc", "gmt", "z") // lowercased dict keys

  private def jump(t: String) = Jump.contains(t.toLowerCase)
  private def month(t: String) = Months.get(t.toLowerCase)
  private def hms(t: String) = Hms.get(t.toLowerCase)
  private def ampm(t: String) = Ampm.get(t.toLowerCase)
  private def utczone(t: String) = UtcZoneLower.contains(t.toLowerCase)

  // ---- lexer (dateutil _timelex.get_token, ported state machine) ----
  private val SplitSep = "(?<=[.,])|(?=[.,])"

  private[etl] def lex(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    val n = s.length
    while (i < n) {
      val c0 = s.charAt(i)
      if (c0.isWhitespace) { out += " "; i += 1 }
      else if (c0.isLetter || c0.isDigit) {
        val start = i
        var state = if (c0.isLetter) 'a' else '0'
        var seenLetters = c0.isLetter
        i += 1
        var done = false
        while (!done && i < n) {
          val c = s.charAt(i)
          state match {
            case 'a' =>
              if (c.isLetter) i += 1
              else if (c == '.') { i += 1; state = 'A' } // 'a.'
              else done = true
            case '0' =>
              if (c.isDigit) i += 1
              else if (c == '.' || (c == ',' && i - start >= 2)) { i += 1; state = 'B' } // '0.'
              else done = true
            case 'A' =>
              seenLetters = true
              if (c == '.' || c.isLetter) { i += 1; if (c.isLetter) seenLetters = true }
              else if (c.isDigit && s.charAt(i - 1) == '.') { i += 1; state = 'B' }
              else done = true
            case 'B' =>
              if (c == '.' || c.isDigit) i += 1
              else if (c.isLetter && s.charAt(i - 1) == '.') { i += 1; state = 'A' }
              else done = true
          }
          if (state == 'A') seenLetters = true
        }
        var token = s.substring(start, i)
        if ((state == 'A' || state == 'B') &&
            (seenLetters || token.count(_ == '.') > 1 || ".,".contains(token.last))) {
          val parts = token.split(SplitSep)
          token = parts(0)
          out += token
          parts.iterator.drop(1).filter(_.nonEmpty).foreach(out += _)
        } else {
          if (state == 'B' && !token.contains('.')) token = token.replace(',', '.')
          out += token
        }
      } else { out += c0.toString; i += 1 }
    }
    out.result()
  }

  // ---- parse state ----
  private final class St {
    var hour: Option[Int] = None
    var minute: Option[Int] = None
    var second: Option[Int] = None
    var micro: Option[Int] = None
    var ampmSeen: Option[Int] = None
    var tzname: Option[String] = None
    var tzoffset: Option[Int] = None // seconds
    val ymd = ArrayBuffer[Long]()
    var mstridx = -1; var dstridx = -1; var ystridx = -1
    var century = false
  }

  private def isNumeric(t: String): Boolean = {
    // python float(token) acceptance over lexer outputs: digits with at
    // most one '.' (comma-bearing merges stay non-numeric and hard-fail
    // in the vocab dispatch, same as dateutil)
    var dots = 0
    var digits = 0
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c.isDigit) digits += 1
      else if (c == '.') dots += 1
      else return false
      i += 1
    }
    digits > 0 && dots <= 1
  }

  private def pyInt(t: String): Int = {
    if (t.isEmpty || !t.forall(_.isDigit)) bail()
    if (t.length > 9) bail() // would only ever fail datetime bounds
    t.toInt
  }
  private def decOf(t: String): BigDecimal =
    try BigDecimal(t) catch { case _: NumberFormatException => bail() }
  private def decToInt(d: BigDecimal): Int =
    if (d.abs > BigDecimal(1000000000)) bail() else d.toInt
  private def capLong(d: BigDecimal): Long =
    if (d > BigDecimal(1000000000L)) 1000000000L else d.toLong

  /** dateutil `_parsems`: "I[.F]" → (seconds, microseconds). */
  private def parsems(t: String): (Int, Int) = {
    val dot = t.indexOf('.')
    if (dot < 0) (pyInt(t), 0)
    else {
      val f = t.substring(dot + 1)
      if (!f.forall(_.isDigit)) bail()
      (pyInt(t.substring(0, dot)), f.padTo(6, '0').take(6).toInt)
    }
  }

  /** dateutil `_parse_min_sec`: minute plus fraction-of-minute seconds —
    * an un-fractioned value returns second = None (RESETS an earlier
    * seconds field, probed).
    */
  private def parseMinSec(d: BigDecimal): (Int, Option[Int]) = {
    val minute = decToInt(d)
    val rem = d - BigDecimal(minute)
    (minute, if (rem.signum != 0) Some((rem * 60).toInt) else None)
  }

  private def adjustAmpm(hour: Int, ap: Int): Int =
    if (hour < 12 && ap == 1) hour + 12
    else if (hour == 12 && ap == 0) 0
    else hour

  // ---- ymd list (dateutil _ymd.append / could_be_day) ----
  private def appendStr(st: St, t: String, label0: Char): Unit = {
    var label = label0
    if (t.forall(_.isDigit) && t.length > 2) {
      st.century = true
      if (label != ' ' && label != 'Y') bail()
      label = 'Y'
    }
    if (!t.forall(_.isDigit)) bail() // int(str) on the raw member
    pushYmd(st, capLong(BigDecimal(t)), label)
  }

  private def appendVal(st: St, d: BigDecimal, label0: Char): Unit = {
    var label = label0
    if (d > BigDecimal(100)) {
      st.century = true
      if (label != ' ' && label != 'Y') bail()
      label = 'Y'
    }
    pushYmd(st, capLong(d), label)
  }

  private def pushYmd(st: St, v: Long, label: Char): Unit = {
    st.ymd += v
    label match {
      case 'M' => if (st.mstridx >= 0) bail(); st.mstridx = st.ymd.size - 1
      case 'D' => if (st.dstridx >= 0) bail(); st.dstridx = st.ymd.size - 1
      case 'Y' => if (st.ystridx >= 0) bail(); st.ystridx = st.ymd.size - 1
      case _ =>
    }
  }

  private def monthLen(y: Int, m: Int): Int =
    try java.time.YearMonth.of(y, m).lengthOfMonth() catch { case _: Exception => bail() }

  private def couldBeDay(st: St, v: BigDecimal): Boolean = {
    if (st.dstridx >= 0) false
    else if (st.mstridx < 0) v >= 1 && v <= 31
    else {
      val m = st.ymd(st.mstridx).toInt
      if (m < 1 || m > 12) bail()
      val max =
        if (st.ystridx < 0) monthLen(2000, m) // permissive leap year
        else monthLen(st.ymd(st.ystridx).toInt, m)
      v >= 1 && v <= max
    }
  }

  // ---- numeric-token dispatch (dateutil _parse_numeric_token, ported
  // branch for branch; returns the last consumed index) ----
  private def parseNumeric(toks: Array[String], idx0: Int, st: St): Int = {
    var idx = idx0
    val repr = toks(idx)
    val value = decOf(repr)
    val lenLi = repr.length
    val lenL = toks.length

    if (st.ymd.size == 3 && (lenLi == 2 || lenLi == 4) && st.hour.isEmpty &&
        (idx + 1 >= lenL || (toks(idx + 1) != ":" && hms(toks(idx + 1)).isEmpty))) {
      // 19990101T23[59]
      st.hour = Some(pyInt(repr.substring(0, 2)))
      if (lenLi == 4) st.minute = Some(pyInt(repr.substring(2)))
    } else if (lenLi == 6 || (lenLi > 6 && repr.indexOf('.') == 6)) {
      // YYMMDD or HHMMSS[.ss]
      if (st.ymd.isEmpty && !repr.contains('.')) {
        appendStr(st, repr.substring(0, 2), ' ')
        appendStr(st, repr.substring(2, 4), ' ')
        appendStr(st, repr.substring(4), ' ')
      } else {
        st.hour = Some(pyInt(repr.substring(0, 2)))
        st.minute = Some(pyInt(repr.substring(2, 4)))
        val (s, us) = parsems(repr.substring(4))
        st.second = Some(s); st.micro = Some(us)
      }
    } else if (lenLi == 8 || lenLi == 12 || lenLi == 14) {
      // YYYYMMDD[HHMM[SS]]
      appendStr(st, repr.substring(0, 4), 'Y')
      appendStr(st, repr.substring(4, 6), ' ')
      appendStr(st, repr.substring(6, 8), ' ')
      if (lenLi > 8) {
        st.hour = Some(pyInt(repr.substring(8, 10)))
        st.minute = Some(pyInt(repr.substring(10, 12)))
        if (lenLi > 12) st.second = Some(pyInt(repr.substring(12)))
      }
    } else if (findHmsIdx(toks, idx) >= 0) {
      // HH[ ]h / MM[ ]m / SS[.ss][ ]s labels
      val hmsIdx = findHmsIdx(toks, idx)
      val (newIdx, which) =
        if (hmsIdx > idx) (hmsIdx, hms(toks(hmsIdx)).get)
        else (idx, hms(toks(hmsIdx)).get + 1)
      which match {
        case 0 =>
          st.hour = Some(decToInt(value))
          val rem = value - BigDecimal(decToInt(value))
          if (rem.signum != 0) st.minute = Some((rem * 60).toInt)
        case 1 =>
          val (mi, se) = parseMinSec(value)
          st.minute = Some(mi); st.second = se
        case 2 =>
          val (s, us) = parsems(repr)
          st.second = Some(s); st.micro = Some(us)
        case _ => bail()
      }
      idx = newIdx
    } else if (idx + 2 < lenL && toks(idx + 1) == ":") {
      // HH:MM[:SS[.ss]]
      st.hour = Some(decToInt(value))
      if (!isNumeric(toks(idx + 2))) bail()
      val (mi, se) = parseMinSec(decOf(toks(idx + 2)))
      st.minute = Some(mi); st.second = se
      if (idx + 4 < lenL && toks(idx + 3) == ":") {
        val (s, us) = parsems(toks(idx + 4))
        st.second = Some(s); st.micro = Some(us)
        idx += 2
      }
      idx += 2
    } else if (idx + 1 < lenL &&
        (toks(idx + 1) == "-" || toks(idx + 1) == "/" || toks(idx + 1) == ".")) {
      // separator-joined members (STRING semantics)
      val sep = toks(idx + 1)
      appendStr(st, repr, ' ')
      if (idx + 2 < lenL && !jump(toks(idx + 2))) {
        if (toks(idx + 2).forall(_.isDigit) && toks(idx + 2).nonEmpty)
          appendStr(st, toks(idx + 2), ' ')
        else month(toks(idx + 2)) match {
          case Some(m) => appendVal(st, BigDecimal(m), 'M')
          case None => bail()
        }
        if (idx + 3 < lenL && toks(idx + 3) == sep) {
          if (idx + 4 >= lenL) bail()
          month(toks(idx + 4)) match {
            case Some(m) => appendVal(st, BigDecimal(m), 'M')
            case None => appendStr(st, toks(idx + 4), ' ')
          }
          idx += 2
        }
        idx += 1
      }
      idx += 1
    } else if (idx + 1 >= lenL || jump(toks(idx + 1))) {
      if (idx + 2 < lenL && ampm(toks(idx + 2)).isDefined) {
        // "12 am" — no 0..12 bound on this path (probed: "15 pm" → 15:00)
        st.hour = Some(adjustAmpm(decToInt(value), ampm(toks(idx + 2)).get))
        idx += 1
      } else appendVal(st, value, ' ')
      idx += 1
    } else if (ampm(toks(idx + 1)).isDefined && value >= 0 && value < 24) {
      // "12am" attached
      st.hour = Some(adjustAmpm(decToInt(value), ampm(toks(idx + 1)).get))
      idx += 1
    } else if (couldBeDay(st, value)) {
      appendVal(st, value, ' ')
    } else bail()
    idx
  }

  private def findHmsIdx(toks: Array[String], idx: Int): Int = {
    val lenL = toks.length
    if (idx + 1 < lenL && hms(toks(idx + 1)).isDefined) idx + 1
    else if (idx + 2 < lenL && toks(idx + 1) == " " && hms(toks(idx + 2)).isDefined) idx + 2
    else if (idx > 0 && hms(toks(idx - 1)).isDefined) idx - 1
    else if (idx > 1 && idx == lenL - 1 && toks(idx - 1) == " " &&
      hms(toks(idx - 2)).isDefined) idx - 2
    else -1
  }

  // ---- main loop (dateutil _parse, ported) ----
  def parse(s: String, today: LocalDate): Option[String] =
    try parseOrBail(s, today) catch { case _: Bail => None }

  private def parseOrBail(s: String, today: LocalDate): Option[String] = {
    val toks0 = lex(s)
    if (toks0.isEmpty) return None
    val toks = toks0.toArray // posix inversion mutates the sign token
    val st = new St
    val lenL = toks.length
    var i = 0
    while (i < lenL) {
      val t = toks(i)
      if (isNumeric(t)) {
        i = parseNumeric(toks, i, st)
      } else if (Weekdays.contains(t.toLowerCase)) {
        // weekday is a no-op here: the model requires an explicit day, so
        // dateutil's relativedelta shift (day-less inputs) never applies
      } else if (month(t).isDefined) {
        appendVal(st, BigDecimal(month(t).get), 'M')
        if (i + 1 < lenL) {
          if (toks(i + 1) == "-" || toks(i + 1) == "/") {
            val sep = toks(i + 1)
            if (i + 2 >= lenL) bail()
            appendStr(st, toks(i + 2), ' ')
            if (i + 3 < lenL && toks(i + 3) == sep) {
              if (i + 4 >= lenL) bail()
              month(toks(i + 4)) match {
                case Some(m) => appendVal(st, BigDecimal(m), 'M')
                case None => appendStr(st, toks(i + 4), ' ')
              }
              i += 2
            }
            i += 2
          } else if (i + 4 < lenL && toks(i + 1) == " " && toks(i + 3) == " " &&
              toks(i + 2).toLowerCase == "of") {
            // "Jan of 01" — the pertain year converts through the window
            if (toks(i + 4).forall(_.isDigit) && toks(i + 4).nonEmpty) {
              val y = Dates.convertYear2(pyInt(toks(i + 4)), today)
              appendStr(st, y.toString, 'Y')
            }
            i += 4
          }
        }
      } else if (ampm(t).isDefined) {
        // standalone meridiem applies immediately; hour must be 0..12
        st.hour match {
          case Some(h) if h >= 0 && h <= 12 =>
            st.hour = Some(adjustAmpm(h, ampm(t).get))
            st.ampmSeen = Some(ampm(t).get)
          case _ => bail()
        }
      } else if (st.hour.isDefined && st.tzname.isEmpty && st.tzoffset.isEmpty &&
          t.length <= 5 &&
          (t.forall(c => c >= 'A' && c <= 'Z') || UtcZoneExact.contains(t))) {
        st.tzname = Some(t)
        // tzoffset dict lookup is case-sensitive on lowercased keys, so
        // only the literal "z" resolves immediately; the other UTC zones
        // reach offset 0 through validate()
        st.tzoffset = if (t == "z") Some(0) else None
        if (i + 1 < lenL && (toks(i + 1) == "+" || toks(i + 1) == "-")) {
          // POSIX inversion: GMT+3 means 3 hours BEHIND — flip the sign
          toks(i + 1) = if (toks(i + 1) == "+") "-" else "+"
          st.tzoffset = None
          if (utczone(t)) st.tzname = None
        }
      } else if (st.hour.isDefined && (t == "+" || t == "-")) {
        val signal = if (t == "+") 1 else -1
        if (i + 1 >= lenL) bail()
        val d = toks(i + 1)
        val (ho, mo) =
          if (d.length == 4) (pyInt(d.substring(0, 2)), pyInt(d.substring(2)))
          else if (i + 2 < lenL && toks(i + 2) == ":") {
            if (i + 3 >= lenL) bail()
            val r = (pyInt(d), pyInt(toks(i + 3)))
            i += 2
            r
          } else if (d.length <= 2) (pyInt(d), 0)
          else bail()
        st.tzoffset = Some(signal * (ho * 3600 + mo * 60))
        i += 1
      } else if (jump(t)) {
        // skip
      } else bail()
      i += 1
    }

    // ---- resolve_ymd (yearfirst = dayfirst = false) ----
    if (st.ymd.size > 3) bail()
    val (yv, mv, dv) = resolveYmd(st)
    // the battery only VALUES fully-determined dates — missing members
    // come from dateutil's run-date default (tripwire-excluded shapes)
    if (yv < 0 || mv < 0 || dv < 0) return None

    val year0 = if (yv < 100 && !st.century) Dates.convertYear2(yv.toInt, today) else yv
    if (year0 < 1 || year0 > 9999 || mv < 1 || mv > 12) bail()
    if (dv < 1 || dv > monthLen(year0.toInt, mv.toInt)) bail()

    val h = st.hour.getOrElse(0)
    val mi = st.minute.getOrElse(0)
    val se = st.second.getOrElse(0)
    val us = st.micro.getOrElse(0)
    if (h < 0 || h > 23 || mi < 0 || mi > 59 || se < 0 || se > 59 || us > 999999) bail()

    // ---- info.validate tz rules ----
    var tzoffset = st.tzoffset
    val tzname = st.tzname
    if ((tzoffset.contains(0) && tzname.isEmpty) ||
        tzname.contains("Z") || tzname.contains("z")) tzoffset = Some(0)
    else if (!tzoffset.contains(0) && tzname.exists(utczone)) tzoffset = Some(0)
    tzoffset.foreach { off => if (math.abs(off) >= 24 * 3600) bail() }

    val tz = tzoffset.map { off =>
      val sgn = if (off < 0) "-" else "+"
      f"$sgn${math.abs(off) / 3600}%02d:${math.abs(off) % 3600 / 60}%02d"
    }.getOrElse("")
    val frac = if (us != 0) f".$us%06d" else ""
    Some(f"$year0%04d-$mv%02d-$dv%02dT$h%02d:$mi%02d:$se%02d$frac$tz")
  }

  private def resolveYmd(st: St): (Long, Long, Long) = {
    val ymd = st.ymd
    val n = ymd.size
    val strids = Seq('y' -> st.ystridx, 'm' -> st.mstridx, 'd' -> st.dstridx)
      .filter(_._2 >= 0).toMap
    if ((n == strids.size && strids.nonEmpty) || (n == 3 && strids.size == 2)) {
      // back out the one missing identity from the labeled members
      val full =
        if (n == 3 && strids.size == 2) {
          val missingIdx = (0 until 3).filterNot(strids.values.toSet).head
          val missingKey = Seq('y', 'm', 'd').filterNot(strids.keySet).head
          strids + (missingKey -> missingIdx)
        } else strids
      if (full.size != n) bail()
      return (full.get('y').map(ymd(_)).getOrElse(-1L),
        full.get('m').map(ymd(_)).getOrElse(-1L),
        full.get('d').map(ymd(_)).getOrElse(-1L))
    }
    val mstridx = st.mstridx
    n match {
      case 0 => (-1L, -1L, -1L)
      case 1 =>
        if (mstridx >= 0) (-1L, ymd(mstridx), -1L)
        else if (ymd(0) > 31) (ymd(0), -1L, -1L)
        else (-1L, -1L, ymd(0))
      case 2 if mstridx >= 0 =>
        val m = ymd(mstridx)
        val other = if (mstridx == 0) ymd(1) else ymd(0)
        if (other > 31) (other, m, -1L) else (-1L, m, other)
      case 2 =>
        if (ymd(0) > 31) (ymd(0), ymd(1), -1L)
        else if (ymd(1) > 31) (ymd(1), ymd(0), -1L)
        else (-1L, ymd(0), ymd(1))
      case _ =>
        if (mstridx == 0) {
          if (ymd(1) > 31) (ymd(1), ymd(0), ymd(2)) // Apr-2003-25
          else (ymd(2), ymd(0), ymd(1))
        } else if (mstridx == 1) {
          if (ymd(0) > 31) (ymd(0), ymd(1), ymd(2)) // 99-Jan-01
          else (ymd(2), ymd(1), ymd(0))
        } else if (mstridx == 2) {
          if (ymd(1) > 31) (ymd(1), ymd(2), ymd(0)) // 01-99-Jan
          else (ymd(0), ymd(2), ymd(1))
        } else {
          if (ymd(0) > 31 || st.ystridx == 0) (ymd(0), ymd(1), ymd(2))
          else if (ymd(0) > 12) (ymd(2), ymd(1), ymd(0))
          else (ymd(2), ymd(0), ymd(1))
        }
    }
  }
}
