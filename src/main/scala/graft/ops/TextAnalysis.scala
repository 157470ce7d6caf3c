package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * stats, quality scoring, language-ID heuristic, document fingerprinting.
  * All pure Column expressions (whole-stage codegen, no UDFs, no shuffles
  * beyond the caller's aggregations) — at 100 TB these run as a single
  * projection over the corpus scan, and every one is mirrored exactly in the
  * DuckDB oracles (see ExtQueries).
  */
object TextAnalysis {

  /** whitespace tokenization (the reference's only tokenizer concept). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count: word-boundary pieces + digit runs + punctuation
    * singles, approximated with a regex token class.
    */
  def regexTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|\\d+|[^A-Za-z\\d\\s]"), lit(0)))

  /** quality features: lengths, punctuation/digit/uppercase ratios,
    * stopword ratio, mean token length. Ratios are int/int divisions in
    * double — engine-exact.
    */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def punctCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[^A-Za-z0-9\\s]"), lit(0)))

  def digitCount(c: Column): Column =
    size(regexp_extract_all(c, lit("\\d"), lit(0)))

  def stopwordCount(c: Column): Column =
    size(filter(tokens(c), t => t.isin(Stopwords: _*)))

  def meanTokenLen(c: Column): Column =
    (length(c) - (tokenCount(c) - 1)).cast("double") / tokenCount(c)

  /** composite quality score in [0,1]: length band + low punct + some
    * stopwords (a typical heuristic pre-filter for web text).
    */
  def qualityScore(c: Column): Column = {
    val n = tokenCount(c)
    val lenOk = when(n.between(5, 5000), 1.0).otherwise(0.0)
    val punctOk = when(punctCount(c) * 10 <= length(c), 1.0).otherwise(0.0)
    val stopOk = when(stopwordCount(c) > 0, 1.0).otherwise(0.0)
    (lenOk + punctOk + stopOk) / 3.0
  }

  /** language-ID heuristic: CJK char presence → zh, else argmax of marker-
    * stopword hits with deterministic tie order en > de > fr > es.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "est", "les"),
    "es" -> Seq("el", "los", "las", "es", "y"))

  def langScore(c: Column, lang: String): Column = {
    val markers = LangMarkers.toMap.apply(lang)
    size(filter(tokens(lower(c)), t => t.isin(markers: _*)))
  }

  def langId(c: Column): Column = {
    val scores = LangMarkers.map { case (l, _) => l -> langScore(c, l) }
    val best = scores.tail.foldLeft(when(lit(true), scores.head._2)) {
      case (acc, (_, s)) => greatest(acc, s)
    }
    val pick = scores.foldRight(lit("unknown")) { case ((l, s), el) =>
      when(s === best && best > 0, lit(l)).otherwise(el)
    }
    // foldRight builds en-first chain: first match wins → tie order en>de>fr>es
    when(c.rlike("[\\x{4e00}-\\x{9fff}]"), "zh").otherwise(pick)
  }

  /** document fingerprint: md5 of whitespace-normalized lowercase text —
    * the exact-dedup key.
    */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(lower(trim(c)), "\\s+", " "))

  /** 60-bit integer content hash (hex-prefix of md5 → BIGINT), the unit for
    * minhash/simhash; identical in DuckDB via ('0x'||substr(md5(x),1,15))::BIGINT.
    * Backed by the codegen'd [[Hash60]] Expression (no hex-string
    * round-trip); [[hash60Composed]] keeps the built-in form for the
    * equality spec.
    */
  def hash60(c: Column): Column = Hash60.apply(c)

  /** the original built-ins-only form (spec reference). */
  def hash60Composed(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** SQL mirrors for the oracles. */
  object Sql {
    def tokens(v: String) = s"regexp_split_to_array(trim($v), '\\s+')"
    def tokenCount(v: String) = s"len(${tokens(v)})"
    def regexTokenCount(v: String) =
      s"len(regexp_extract_all($v, '[A-Za-z]+|\\d+|[^A-Za-z\\d\\s]'))"
    def punctCount(v: String) = s"len(regexp_extract_all($v, '[^A-Za-z0-9\\s]'))"
    def digitCount(v: String) = s"len(regexp_extract_all($v, '\\d'))"
    private def inList(words: Seq[String]) = words.map(w => s"'$w'").mkString(", ")
    def stopwordCount(v: String) =
      s"len(list_filter(${tokens(v)}, t -> t IN (${inList(Stopwords)})))"
    def meanTokenLen(v: String) =
      s"CAST(length($v) - (${tokenCount(v)} - 1) AS DOUBLE) / ${tokenCount(v)}"
    def qualityScore(v: String) =
      s"""((CASE WHEN ${tokenCount(v)} BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.0 END) +
          (CASE WHEN ${punctCount(v)} * 10 <= length($v) THEN 1.0 ELSE 0.0 END) +
          (CASE WHEN ${stopwordCount(v)} > 0 THEN 1.0 ELSE 0.0 END)) / 3.0"""
    def langScore(v: String, lang: String) =
      s"len(list_filter(${tokens(s"lower($v)")}, t -> t IN (${inList(LangMarkers.toMap.apply(lang))})))"
    def langId(v: String): String = {
      val best = LangMarkers.map { case (l, _) => langScore(v, l) }
        .reduce((a, b) => s"greatest($a, $b)")
      val chain = LangMarkers.map { case (l, _) =>
        s"WHEN ${langScore(v, l)} = best AND best > 0 THEN '$l'"
      }.mkString(" ")
      s"""(SELECT CASE WHEN regexp_matches($v, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
           $chain ELSE 'unknown' END FROM (SELECT $best AS best))"""
    }
    def fingerprint(v: String) =
      s"md5(regexp_replace(lower(trim($v)), '\\s+', ' ', 'g'))"
    def hash60(v: String) =
      s"CAST(concat('0x', substring(md5($v), 1, 15)) AS BIGINT)"
  }
}
