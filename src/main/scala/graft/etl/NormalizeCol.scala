package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level (whole-stage-codegen-friendly) faithful `normalize_value`
  * chain and `infer_type` — the 100 TB-scale surface of the normalizer: pure
  * built-in expressions, no UDF, mirrored 1:1 by ANSI SQL in the DuckDB
  * oracles (see EtlQueries). The UDF model in [[Normalize]] is the
  * byte-faithful reference (it handles python float repr etc.); this chain
  * covers the branch semantics for string inputs.
  *
  * Branch order (reference: backend/etl_pipeline.py:167-207): null-tokens →
  * booleans → percent → email → phone → int → float → iso-datetime →
  * lowercase. Date coverage here is the ISO datetime form only (the only
  * form that survives the phone-regex quirk AND is string-renderable without
  * timezone logic); the full battery lives in [[Dates]].
  */
object NormalizeCol {
  val NullTokens = Seq("na", "n/a", "null", "none", "", "nan")
  val PercentRe = "^(\\d+(\\.\\d+)?)%$"
  val EmailRe = "^[\\w\\.\\+-]+@[\\w\\.-]+\\.[a-zA-Z]{2,}$"
  val PhoneRe = "^\\+?[\\d\\s\\-\\(\\)]+$"
  val IntRe = "^[+-]?\\d+$"
  val FloatRe = "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$"
  val IsoDtRe = "^\\d{4}-\\d{2}-\\d{2}[T ]\\d{2}:\\d{2}:\\d{2}(Z|[+-]\\d{2}:?\\d{2})?$"

  private def sl(c: Column) = lower(trim(c))
  private def stripCur(c: Column) =
    trim(regexp_replace(trim(c), "[,$₹]", ""))

  /** Which branch fires, as a tag column. */
  def branch(c: Column): Column = {
    val t = trim(c); val l = sl(c); val noCur = stripCur(c)
    when(c.isNull, "null")
      .when(l.isin(NullTokens: _*), "null")
      .when(l.isin("true", "yes", "1"), "bool_true")
      .when(l.isin("false", "no", "0"), "bool_false")
      .when(t.rlike(PercentRe), "percent")
      .when(t.rlike(EmailRe), "email")
      .when(t.rlike(PhoneRe), "phone")
      .when(noCur.rlike(IntRe), "int")
      .when(noCur.rlike(FloatRe), "float")
      .when(t.rlike(IsoDtRe), "date")
      .otherwise("str")
  }

  /** String-branch output (null unless branch ∈ {null,email,phone,date,str}). */
  def outStr(c: Column): Column = {
    val t = trim(c)
    val b = branch(c)
    when(b === "email", sl(c))
      .when(b === "phone", regexp_replace(t, "[^\\d]", ""))
      .when(b === "date",
        regexp_replace(regexp_replace(t, " ", "T"), "Z$", "+00:00"))
      .when(b === "str", sl(c))
      .otherwise(lit(null))
  }

  def outBool(c: Column): Column = {
    val b = branch(c)
    when(b === "bool_true", lit(true)).when(b === "bool_false", lit(false))
      .otherwise(lit(null))
  }

  def outInt(c: Column): Column =
    when(branch(c) === "int", stripCur(c).cast("long")).otherwise(lit(null))

  def outFloat(c: Column): Column = {
    val b = branch(c)
    when(b === "percent",
      regexp_extract(trim(c), PercentRe, 1).cast("double") / 100.0)
      .when(b === "float", stripCur(c).cast("double"))
      .otherwise(lit(null))
  }

  /** SQL mirror of the above for the DuckDB oracle — same branch order, same
    * regexes (RE2-compatible).
    */
  object Sql {
    private val nullList = NullTokens.map(t => s"'$t'").mkString(", ")
    def branch(v: String): String =
      s"""CASE
        WHEN $v IS NULL THEN 'null'
        WHEN lower(trim($v)) IN ($nullList) THEN 'null'
        WHEN lower(trim($v)) IN ('true', 'yes', '1') THEN 'bool_true'
        WHEN lower(trim($v)) IN ('false', 'no', '0') THEN 'bool_false'
        WHEN regexp_matches(trim($v), '$PercentRe') THEN 'percent'
        WHEN regexp_matches(trim($v), '$EmailRe') THEN 'email'
        WHEN regexp_matches(trim($v), '$PhoneRe') THEN 'phone'
        WHEN regexp_matches(trim(regexp_replace(trim($v), '[,$$₹]', '', 'g')), '$IntRe') THEN 'int'
        WHEN regexp_matches(trim(regexp_replace(trim($v), '[,$$₹]', '', 'g')), '$FloatRe') THEN 'float'
        WHEN regexp_matches(trim($v), '$IsoDtRe') THEN 'date'
        ELSE 'str' END"""
    def outStr(v: String): String =
      s"""CASE ${branch(v)}
        WHEN 'email' THEN lower(trim($v))
        WHEN 'phone' THEN regexp_replace(trim($v), '[^0-9]', '', 'g')
        WHEN 'date' THEN regexp_replace(regexp_replace(trim($v), ' ', 'T'), 'Z$$', '+00:00')
        WHEN 'str' THEN lower(trim($v))
        ELSE NULL END"""
    def outBool(v: String): String =
      s"""CASE ${branch(v)} WHEN 'bool_true' THEN true WHEN 'bool_false' THEN false ELSE NULL END"""
    def outInt(v: String): String =
      s"""CASE ${branch(v)} WHEN 'int' THEN CAST(trim(regexp_replace(trim($v), '[,$$₹]', '', 'g')) AS BIGINT) ELSE NULL END"""
    def outFloat(v: String): String =
      s"""CASE ${branch(v)}
        WHEN 'percent' THEN CAST(regexp_extract(trim($v), '$PercentRe', 1) AS DOUBLE)/100.0
        WHEN 'float' THEN CAST(trim(regexp_replace(trim($v), '[,$$₹]', '', 'g')) AS DOUBLE)
        ELSE NULL END"""
  }

  // ---- round-8 free-form date-family atoms (RE2-compatible: shared with
  // the DuckDB oracle verbatim, so no lookarounds/backrefs). Calendar
  // validity is encoded in the regex to the same standard as
  // [[Dates.TripletRe]]: month-day coupling plus leap-year Feb 29, here
  // against 4-digit years (a year is leap iff its last two digits are a
  // nonzero multiple of 4, or they are 00 and the first two are).
  // '/' and '-' mix freely; '.' only pairs with '.' (dateutil's lexer merges
  // a lone digit.digit run into a decimal token — see Dates.TripletYmd doc)
  private val M31a = "(0?[13578]|1[02])" // 31-day months, 1-2 digits
  private val M30a = "(0?[469]|11)"
  private val M12a = "(0?[1-9]|1[0-2])"
  private val MNoFebA = "(0?[13-9]|1[0-2])"
  private val D31a = "(0?[1-9]|[12]\\d|3[01])"
  private val D30a = "(0?[1-9]|[12]\\d|30)"
  private val D28a = "(0?[1-9]|1\\d|2[0-8])"
  private val Y4nz = "(000[1-9]|00[1-9]\\d|0[1-9]\\d{2}|[1-9]\\d{3})" // year 0 invalid
  private val Mult4nz = "(0[48]|[2468][048]|[13579][26])"
  private val Leap4 = "(\\d{2}" + Mult4nz + "|" + Mult4nz + "00)"
  /** M-D or D-M triplet with the year LAST: first member is the month
    * unless > 12 (dateutil's US default), Feb 29 only in leap years.
    */
  private def tripletDmy(Sp: String): String =
    "(" + M31a + Sp + D31a + Sp + Y4nz + "|" + M30a + Sp + D30a + Sp + Y4nz +
      "|0?2" + Sp + D28a + Sp + Y4nz + "|0?2" + Sp + "29" + Sp + Leap4 +
      "|(1[3-9]|2[0-8])" + Sp + M12a + Sp + Y4nz +
      "|29" + Sp + "(" + MNoFebA + Sp + Y4nz + "|0?2" + Sp + Leap4 + ")" +
      "|30" + Sp + MNoFebA + Sp + Y4nz + "|31" + Sp + M31a + Sp + Y4nz + ")"
  /** 4-digit year FIRST (Y-M-D). */
  private def tripletYmd(Sp: String): String =
    "(" + Y4nz + Sp + M31a + Sp + D31a + "|" + Y4nz + Sp + M30a + Sp + D30a +
      "|" + Y4nz + Sp + "0?2" + Sp + D28a + "|" + Leap4 + Sp + "0?2" + Sp + "29)"
  // '/' '-' and ' ' mix freely as member separators (space-separated
  // numeric triplets parse with INT member semantics — the accept/reject
  // surface coincides with these calendar atoms, see Dates.TripletAny);
  // '.' still only pairs with '.'
  private val TripletDmyRe =
    "(" + tripletDmy("[/\\- ]") + "|" + tripletDmy("\\.") + ")"
  private val TripletYmdRe =
    "(" + tripletYmd("[/\\- ]") + "|" + tripletYmd("\\.") + ")"
  // ---- all-short triplets (1-2-digit members, round 8): dateutil reads
  // first>31 → Y/M/D, first>12 → D/M/Y, else M/D/Y, with the 2-digit year
  // resolved through convertyear's ±50-year window around the run date
  // (see Dates.TripletShort). Feb-29 coupling uses "yy % 4 == 0", exact
  // under the current window by the same argument [[Dates.TripletRe]]
  // documents for the bare-6-digit family (every mapped year divisible by
  // 4 is a leap year while 00 ↦ 2000).
  private val Y2 = "(\\d{1,2})"
  private val Leap2 = "(0?[048]|[2468][048]|[13579][26])"
  private val Y2first = "(3[2-9]|[4-9]\\d)"
  private val Leap2first = "(3[26]|[468][048]|[579][26])"
  private def tripletShort(Sp: String): String =
    "(" + M31a + Sp + D31a + Sp + Y2 + "|" + M30a + Sp + D30a + Sp + Y2 +
      "|0?2" + Sp + D28a + Sp + Y2 + "|0?2" + Sp + "29" + Sp + Leap2 +
      "|(1[3-9]|2[0-8])" + Sp + M12a + Sp + Y2 +
      "|29" + Sp + "(" + MNoFebA + Sp + Y2 + "|0?2" + Sp + Leap2 + ")" +
      "|30" + Sp + MNoFebA + Sp + Y2 + "|31" + Sp + M31a + Sp + Y2 +
      "|" + Y2first + Sp + "(" + M31a + Sp + D31a + "|" + M30a + Sp + D30a +
      "|0?2" + Sp + D28a + ")|" + Leap2first + Sp + "0?2" + Sp + "29)"
  private val TripletShortRe =
    "(" + tripletShort("[/\\- ]") + "|" + tripletShort("\\.") + ")"
  /** Month-name families ("Jan 5, 2024" / "5 Jan 2024", abbreviated or
    * full, any case), day-validity coupled to the named month.
    */
  // dateutil's month vocabulary is exact: abbreviation, full name, or
  // (September only) "sept" — garbage suffixes like "janx"/"septem" fail
  private val Mon31 =
    "(?i:jan(?:uary)?|mar(?:ch)?|may|jul(?:y)?|aug(?:ust)?|oct(?:ober)?|dec(?:ember)?)"
  private val Mon30 = "(?i:apr(?:il)?|jun(?:e)?|sep(?:t(?:ember)?)?|nov(?:ember)?)"
  private val MonFeb = "(?i:feb(?:ruary)?)"
  private val MonthNameRe =
    "((" + Mon31 + " " + D31a + "|" + Mon30 + " " + D30a + "|" + MonFeb + " " + D28a +
      "),? " + Y4nz + "|" + MonFeb + " 29,? " + Leap4 + ")"
  private val DayMonthNameRe =
    "(" + D31a + " " + Mon31 + " " + Y4nz + "|" + D30a + " " + Mon30 + " " + Y4nz +
      "|" + D28a + " " + MonFeb + " " + Y4nz + "|29 " + MonFeb + " " + Leap4 + ")"
  /** Optional time-of-day suffix (mirrors [[Dates.timeSuffix]]): 24-hour
    * H:MM[:SS[.f]] or 12-hour with an AM/PM token (hour ≤ 12 then); round-8
    * tail adds the spaced-comma jump lead ("2024, 10:30", " ,10:30" — a
    * bare ",10:30" stays out), a BARE exactly-2-digit hour, and a
    * 1-2-digit hour with a meridiem.
    */
  // minute/second atoms are 1-2 digits (round 10, probed: the dateutil
  // lexer reads "3:4" as 03:04 and "3:4:5" as 03:04:05; bounds stay < 60
  // — a 2-digit value starting 6-9 leaves a dangling digit and fails).
  // Fractions attach to SECONDS only; fraction-of-minute ("3:4.5" →
  // 03:04:30) stays out of battery (documented, COVERAGE.md).
  private val T24c = "([01]?\\d|2[0-3]):[0-5]?\\d(:[0-5]?\\d([.,]\\d+)?)?"
  private val T12c = "(0?\\d|1[0-2]):[0-5]?\\d(:[0-5]?\\d([.,]\\d+)?)?"
  private val T12h12 = "(0?)?12:[0-5]?\\d(:[0-5]?\\d([.,]\\d+)?)?"
  private val MerDot = " ?[AaPp]\\.?[Mm]\\.?"
  private val MerTok = " ?[AaPp][Mm]?"
  private val MerAny = " ?[AaPp](\\.?[Mm]\\.?)?"
  /** numeric tz offset bounded under 24 h: ±HHMM with minute carry
    * ("+2299" valid), ±HH:MM, ±H:MM (1-digit hour via dateutil's colon
    * path — always < 24 h even with minute carry), ±H, ±HH — mirror of
    * the scalar tz tail
    */
  private val OffB =
    "[+-]((([01]\\d|2[0-2]):?\\d{2})|23:?[0-5]\\d|\\d:\\d{2}|[01]?\\d|2[0-3])"
  /** ONE tz token after a time: bounded offset, Z/UTC/GMT, or dateutil's
    * could_be_tzname shape (≤5 uppercase letters, naive result). The
    * name class EXCLUDES meridiem-shaped tokens (A/P/AM/PM) — those are
    * sequential meridiem re-applications with their own hour constraint,
    * handled by the extra-meridiem alternatives below (RE2 has no
    * lookahead, so the exclusion is enumerated).
    */
  private val TzName = "([B-OQ-Z]|[AP][A-LN-Z]|[B-OQ-Z][A-Z]|[A-Z]{3,5})"
  /** POSIX-style inversion (round 9): a tz NAME with an ATTACHED signed
    * offset is one token with the sign flipped ("GMT+5" → -05:00,
    * "XYZAB+3" → -03:00). The vote only needs acceptance — the offset
    * grammar and < 24 h bound are OffB, identical either sign; the name
    * class excludes meridiem-shaped A/P/AM/PM (those chain as meridiem +
    * a NORMAL offset and are covered by the plain OffB alternative).
    */
  private val TzPosix = "(Z|z|UTC|GMT|" + TzName + ")" + OffB
  /** SPACED name-then-offset chains (round 9, probed): a KNOWN zone
    * swallows the following offset (dateutil validate() resets it, so
    * only the token SHAPE matters — "GMT +25" accepts, "GMT +123"
    * rejects); an unknown name is naive and the offset applies with the
    * normal OffB bounds ("EST +2" accepts, "EST +25" rejects).
    */
  private val TzChain =
    "((Z|z|UTC|GMT) [+-](\\d{1,2}(:\\d{2})?|\\d{4})|" + TzName + " " + OffB + ")"
  private val TzTok =
    "( ?(" + OffB + "|Z|z|UTC|GMT|" + TzName + "|" + TzPosix + "|" + TzChain + "))?"
  /** Optional time-of-day suffix (mirrors [[Dates.timeSuffix]]): 24-hour
    * H:MM[:SS[.f]] or 12-hour with meridiem forms; round-8 tail adds the
    * spaced-comma jump lead, bare hours, tz tokens, and dateutil's
    * sequential meridiem re-application ("10:30 AM P" parses to 22:30,
    * "10:30 PM A" fails because the hour is 22 when A validates ≤ 12) —
    * chains are valid when the FIRST extra token is a-type or the hour is
    * exactly 12, the two shapes that keep every application ≤ 12.
    */
  private val TimeSfxA =
    "((?:[Tt ]| , | ,|, )(" +
      T24c + "|" + T12c + MerDot + "|" +
      T12c + MerAny + "|" +
      T12c + " ?[Aa][Mm]?" + MerTok + "|" +
      T12h12 + MerTok + MerTok + "|" +
      // meridiem AFTER a spaced name+offset chain (round 9, probed):
      // "10:30 EST +2 PM" — the 12-hour atom bounds the hour the trailing
      // meridiem re-applies to, mirroring the scalar recursion
      T12c + " " + TzChain + MerAny + "|" +
      "[01]\\d|2[0-3]|" +
      "(0?\\d|1[0-2])" + MerAny + ")" + TzTok + ")?"
  // ---- 3-digit-year triplets (separator context: any ≥3-digit member is
  // a PINNED year — value as written, leading zeros kept; "012/01/05" →
  // year 12 which IS mod-4 leap-coupled after the no-conversion pin).
  // First-position years take strict (month, day) order; last-position
  // years resolve day-first like the other year-last families.
  private val Y3nz = "(\\d\\d[1-9]|\\d[1-9]\\d|[1-9]\\d\\d)"
  private val Leap3 = "([0-9](0[48]|[2468][048]|[13579][26])|[48]00)"
  private def tripletY3(Sp: String): String =
    "(" + Y3nz + Sp + M31a + Sp + D31a + "|" + Y3nz + Sp + M30a + Sp + D30a +
      "|" + Y3nz + Sp + "0?2" + Sp + D28a + "|" + Leap3 + Sp + "0?2" + Sp + "29" +
      "|" + M31a + Sp + D31a + Sp + Y3nz + "|" + M30a + Sp + D30a + Sp + Y3nz +
      "|0?2" + Sp + D28a + Sp + Y3nz + "|0?2" + Sp + "29" + Sp + Leap3 +
      "|(1[3-9]|2[0-8])" + Sp + M12a + Sp + Y3nz +
      "|29" + Sp + "(" + MNoFebA + Sp + Y3nz + "|0?2" + Sp + Leap3 + ")" +
      "|30" + Sp + MNoFebA + Sp + Y3nz + "|31" + Sp + M31a + Sp + Y3nz + ")"
  /** 2-digit year-first (>31) with a leading-zero WIDE day member — the
    * mixed-width probe "45-1-012" (year 45, month 1, day 12; the wide
    * member pins century_specified, which the vote need not model).
    */
  private def tripletY2w(Sp: String): String =
    "(" + Y2first + Sp + "(" + M31a + Sp + "0" + D31a + "|" + M30a + Sp +
      "0" + D30a + "|0?2" + Sp + "0" + D28a + ")|" +
      Leap2first + Sp + "0?2" + Sp + "029)"
  private val TripletY3Re =
    "(" + tripletY3("[/\\- ]") + "|" + tripletY3("\\.") + "|" +
      tripletY2w("[/\\- ]") + "|" + tripletY2w("\\.") + ")"
  // ---- month-name permutations (int semantics: tokens are VALUES, so
  // "015" can be day 15 and "0015" year 15). Day/year resolution: month
  // first or middle → (day, year) unless the first number exceeds 31;
  // month last → (year, day) unless the second number exceeds 31. Years
  // are any value (a < 100 converts; conversion preserves mod 4, and the
  // excluded 100..900 non-leap centuries are encoded, so the Feb-29
  // coupling below is calendar-exact under the run-date window).
  private val SepP = "(?: ?[,/\\-]+ ?| )"
  private val SepMp = "(?: ?[,/\\-]+ ?| ?\\. ?| |)"
  private val Yv = "\\d{1,4}"
  private val Ya = "(0{0,2}(3[2-9]|[4-9]\\d)|0?[1-9]\\d{2}|[1-9]\\d{3})"
  private val LeapV = "(0{0,3}[048]|0{0,2}[2468][048]|0{0,2}[13579][26]|" +
    "0?([1-9](0[48]|[2468][048]|[13579][26])|[48]00)|" + "\\d{2}" +
    "(0[48]|[2468][048]|[13579][26])|(0[48]|[2468][048]|[13579][26])00)"
  private def zd(core: String): String = "(0{0,2}(" + core + "))"
  private val Dv31 = zd("0?[1-9]|[12]\\d|3[01]")
  private val Dv30 = zd("0?[1-9]|[12]\\d|30")
  private val Dv28 = zd("0?[1-9]|1\\d|2[0-8]")
  private val Dv29 = zd("29")
  /** one month-class worth of permutations: `mon` is the name alternation,
    * `dv` the coupled day atom (Feb handled by the caller with the leap
    * year slot)
    */
  private def permFor(mon: String, dv0: String, leapOnly: Boolean): String = {
    // number atoms may carry ONE trailing dot before a separator (mirror
    // of the scalar battery's NumG — "Jan 5. 2024", "Jan 5, 2024. 10:30")
    val y = (if (leapOnly) LeapV else Yv) + "\\.?"
    val dv = dv0 + "\\.?"
    val ya = Ya + "\\.?"
    val m = mon + "\\.?"
    // month first: Mon d y | Mon Y>31 d ; month middle: d Mon y | Y>31 Mon d
    // month last: y d Mon | d Y>31 Mon
    val first = m + SepMp + dv + SepP + y + "|" +
      (if (leapOnly) "" else m + SepMp + ya + SepP + dv + "|") +
      m + "\\." + dv0 + "\\." + y // the attached-dot chain "Jan.5.2024"
    val mid = dv + SepMp + m + SepMp + y + "|" +
      (if (leapOnly) "" else ya + SepMp + m + SepMp + dv + "|")
    val last = y + SepP + dv + SepMp + m + "|" +
      (if (leapOnly) "" else dv + SepP + ya + SepMp + m)
    "(" + first + "|" + mid + last + ")"
  }
  private val MonthPermRe = "(" +
    permFor(Mon31, Dv31, leapOnly = false) + "|" +
    permFor(Mon30, Dv30, leapOnly = false) + "|" +
    permFor(MonFeb, Dv28, leapOnly = false) + "|" +
    permFor(MonFeb, Dv29, leapOnly = true) + ")"

  /** Column-level `infer_type` battery. The ISO alternative keeps its
    * original regex-plausibility contract; the round-8 free-form families
    * (numeric triplets incl. 2- and 3-digit years, month-name
    * permutations, time/bare-hour suffixes) are calendar-exact so the
    * column vote agrees with the scalar model ([[Dates.parseIso]]) and
    * the reference on invalid dates like "11/31/2024".
    *
    * The last alternative mirrors the dateutil negative-number quirk —
    * see [[Dates.NegNumDateRe]] for the full shape table.
    */
  // ---- time-BEFORE-date order (round 9): a leading clock time (meridiem
  // optional on the 24-h form, required ≤12-h on the bare-hour form), an
  // optional ','/'.' jump, then any full-date family WITHOUT its own time
  // (dateutil fills time and date fields independently of token order);
  // an optional trailing tz token rides on the date. Mirrors the scalar
  // battery's TimeFirst fallback.
  // round 10: a leading clock may carry its OWN tz — attached (offset,
  // known zone, or POSIX name+offset pair: "10:30+05:00", "10:30Z",
  // "10:30GMT+5") or ONE spaced chunk (" +5", " Z", " GMT+5", " GMT +5"
  // chain) — the same token set the trailing TzTok accepts, shape-checked
  // here and value-validated by the scalar model's shared recursion.
  // Attached-tz-with-meridiem runs through the T12c alternative so the
  // meridiem's ≤ 12 hour rule stays structural ("23:30z PM" rejects).
  // Generic NAME tokens stay out of lead position (month/weekday
  // collision — dateutil checks those vocabularies first).
  private val AttTzA = "(" + OffB + "|(Z|z|UTC|GMT)(" + OffB + ")?)"
  private val LeadTzSp =
    "( (Z|z|UTC|GMT)(" + OffB + ")?( [+-](\\d{1,2}(:\\d{2})?|\\d{4}))?| " + OffB + ")?"
  private val TimePfxA =
    "((" + T24c + AttTzA + "?|" + T12c + AttTzA + "? ?[AaPp]\\.?[Mm]\\.?|" +
      "(0?\\d|1[0-2]) ?[AaPp]\\.?[Mm]\\.?)" + LeadTzSp + ")"
  private def dateOnlyRe: String =
    "(\\d{4}-\\d{2}-\\d{2}|" + TripletDmyRe + "|" + TripletYmdRe + "|" +
      TripletShortRe + "|" + TripletY3Re + "|" + MonthNameRe + "|" +
      DayMonthNameRe + "|" + MonthPermRe + ")"
  private val TimeFirstA = TimePfxA + "[,.]? " + dateOnlyRe + TzTok

  // ---- prefix-gated split of the battery (round 10): TimeFirstA
  // re-enumerates EVERY date family behind a clock prefix, which roughly
  // doubled the per-row match cost of the combined alternation (the
  // round-9 etl02 regression). But a time-first match can only start with
  // a clock ("10:30…") or a bare hour + meridiem ("3 PM…") — a 2-token
  // prefix testable by a tiny regex. The hot vote therefore runs the
  // battery WITHOUT TimeFirstA, and only rows passing the cheap prefix
  // gate also probe the time-first alternative. `InferDateRe` (the union)
  // is unchanged for the parity battery and scalar mirrors:
  //   match(InferDateRe) ⟺ match(InferDateMainRe) ∨ match(TimeFirstRe),
  // and every ^TimeFirstA$ match starts with TimePfxA, which starts with
  // T24c/T12c ("\d{1,2}:") or the bare-hour meridiem ("\d{1,2} ?[AaPp]"),
  // so the gate never drops a true match (asserted battery-wide in
  // DateParitySpec).
  private val MainAlts =
    "\\d{4}-\\d{2}-\\d{2}([Tt ]\\d{2}:\\d{2}(:\\d{2}([.,]\\d*)?)?(Z|z|[+-]\\d{2}:?\\d{2})?)?|" +
      TripletDmyRe + TimeSfxA + "|" + TripletYmdRe + TimeSfxA + "|" +
      TripletShortRe + TimeSfxA + "|" + TripletY3Re + TimeSfxA + "|" +
      MonthNameRe + TimeSfxA + "|" + DayMonthNameRe + TimeSfxA + "|" +
      MonthPermRe + TimeSfxA + "|" + Dates.NegNumDateRe
  /** Rewrite every capturing `(` to `(?:` — none of the battery
    * alternatives uses backreferences or group extraction, but a Java
    * `Matcher` allocates (and zeroes) group arrays sized by the pattern's
    * capture count on EVERY match call: with the battery's hundreds of
    * groups that was ~9 µs/row even on rows the first (ISO) alternative
    * accepts immediately. Non-capturing groups cut the per-row cost an
    * order of magnitude; the accepted language is identical (asserted
    * battery-wide in DateParitySpec), and RE2-style engines (the DuckDB
    * oracle) accept `(?:` unchanged.
    */
  private[graft] def nonCapturing(re: String): String = {
    val sb = new StringBuilder(re.length + 256)
    var i = 0
    var inClass = false
    while (i < re.length) {
      val c = re.charAt(i)
      if (c == '\\' && i + 1 < re.length) { sb.append(c).append(re.charAt(i + 1)); i += 2 }
      else {
        if (inClass) { if (c == ']') inClass = false; sb.append(c) }
        else if (c == '[') { inClass = true; sb.append(c) }
        else if (c == '(' && !(i + 1 < re.length && re.charAt(i + 1) == '?')) sb.append("(?:")
        else sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  private[graft] val InferDateMainRe = nonCapturing("^(" + MainAlts + ")$")
  private[graft] val TimeFirstRe = nonCapturing("^" + TimeFirstA + "$")
  private[graft] val TimeFirstGateRe = "^\\d{1,2}(?: ?[AaPp]|:)"

  val InferDateRe = nonCapturing("^(" + MainAlts + "|" + TimeFirstA + ")$")

  // ---- vote-side mirror of the scalar battery's jump-token
  // preprocessing (Dates.preprocess — each rewrite is a measured dateutil
  // lexer rule): collapse whitespace runs, strip trailing '.'/',' jumps,
  // leading weekday tokens (exact vocabulary), ordinal suffixes on
  // 1-2-digit numbers. Applied symmetrically in the Column expression and
  // the DuckDB SQL, so the two engines vote identically.
  val WeekdayStripRe =
    "^((?i)(mon(day)?|tue(sday)?|wed(nesday)?|thu(rsday)?|fri(day)?|" +
      "sat(urday)?|sun(day)?)\\.?,? ?)+"
  val OrdinalStripRe = "(?i)\\b(\\d{1,2})(st|nd|rd|th)\\b"
  def voteNormalize(s: String): String =
    s.trim.replaceAll("\\s+", " ").replaceAll("( ?[.,])+$", "")
      .replaceFirst(WeekdayStripRe, "")
      .replaceAll(OrdinalStripRe, "$1")
      .replaceAll("(\\d)'+(\\d)", "$1/$2")
      .replaceAll("(^| )'+(\\d)", "$1$2")
      .replaceAll("([A-Za-z])'+(\\d)", "$1 $2")
      .replaceAll("(\\d)'+([A-Za-z])", "$1 $2")
  def voteNormalizeCol(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(trim(c),
        "\\s+", " "), "( ?[.,])+$", ""), WeekdayStripRe, ""),
        OrdinalStripRe, "$1"),
      "(\\d)'+(\\d)", "$1/$2"), "(^| )'+(\\d)", "$1$2"),
      "([A-Za-z])'+(\\d)", "$1 $2"), "(\\d)'+([A-Za-z])", "$1 $2")
  private def sqlVoteNormalize(v: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(trim($v),
      '\\s+', ' ', 'g'), '( ?[.,])+$$', ''), '$WeekdayStripRe', ''),
      '$OrdinalStripRe', '\\1', 'g'),
      '(\\d)''+(\\d)', '\\1/\\2', 'g'), '(^| )''+(\\d)', '\\1\\2', 'g'),
      '([A-Za-z])''+(\\d)', '\\1 \\2', 'g'), '(\\d)''+([A-Za-z])', '\\1 \\2', 'g')"""

  /** Charset pre-gate: every date family carries a digit and uses only
    * [0-9A-Za-z ,/.:'+-] (letters for month/weekday/meridiem names, '+'
    * for ISO offsets) — a linear-scan test that excludes the bulk of
    * alphanumeric non-dates ("Clerk#000000951") before the jump-token
    * normalization + battery regex run.
    */
  private[graft] val CharsetGateRe = "^[0-9A-Za-z ,/.:+'\\-]*\\d[0-9A-Za-z ,/.:+'\\-]*$"

  /** The hot path is the FUSED kernel ([[InferTypeTag]]): one custom
    * codegen Expression running trim → int/float/bool probes → charset
    * gate → jump-token normalization → prefix-gated battery in a single
    * Java pass with precompiled patterns — the 8-step `regexp_replace`
    * Column chain paid an UTF8String↔String round-trip per step per row
    * (~40 µs/row on date-shaped cells, the round-9 etl02 cost).
    * [[inferTypeColumnChain]] keeps the declarative form as the oracle's
    * structural mirror; InferTypeSpec pins kernel ≡ chain cell-for-cell.
    */
  def inferType(c: Column): Column = InferTypeTag(c)

  /** The Column-chain mirror of [[sqlInferType]] (same expression shape
    * the DuckDB oracle runs); semantically identical to [[inferType]].
    */
  def inferTypeColumnChain(c: Column): Column =
    when(c.isNull || trim(c) === "", "null")
      .when(trim(c).rlike("^\\d+$"), "integer")
      .when(trim(c).rlike("^\\d*\\.\\d+$"), "float")
      .when(lower(trim(c)).isin("true", "false"), "boolean")
      .when(trim(c).rlike(CharsetGateRe) &&
        (voteNormalizeCol(c).rlike(InferDateMainRe) ||
          (voteNormalizeCol(c).rlike(TimeFirstGateRe) &&
            voteNormalizeCol(c).rlike(TimeFirstRe))), "date")
      .otherwise("string")

  def sqlInferType(v: String): String =
    s"""CASE
      WHEN $v IS NULL OR trim($v) = '' THEN 'null'
      WHEN regexp_matches(trim($v), '^\\d+$$') THEN 'integer'
      WHEN regexp_matches(trim($v), '^\\d*\\.\\d+$$') THEN 'float'
      WHEN lower(trim($v)) IN ('true', 'false') THEN 'boolean'
      WHEN regexp_matches(trim($v), '^[0-9A-Za-z ,/.:+''\\-]*\\d[0-9A-Za-z ,/.:+''\\-]*$$')
        AND (regexp_matches(${sqlVoteNormalize(v)}, '$InferDateMainRe')
          OR (regexp_matches(${sqlVoteNormalize(v)}, '$TimeFirstGateRe')
            AND regexp_matches(${sqlVoteNormalize(v)}, '$TimeFirstRe'))) THEN 'date'
      ELSE 'string' END"""
}
