package graft.queries

import graft.core.{GraftQuery, Tables}
import graft.ops.{TextAnalysis => TA}
import org.apache.spark.sql.functions._

/** Subtitle/caption operators (round 16 — [[graft.ops.Subtitles]]): the
  * text half of a video-caption training pair (CLIP-style alignment,
  * ASR supervision). Family shape: per-row render+parse map, shuffle-
  * free until the small-keyed rollup, typed fail-stop refusals with a
  * poisoned twin. Every cue timing and text byte rides deterministic
  * doc_id arithmetic so DuckDB recomputes all aggregates.
  */
object CaptionQueries {

  private val M = TarQueries.M

  /** doc text → cues of ≤3 words; cue k spans [k*1800, k*1800 + 1500 +
    * (id%4)*100); every third cue is two-line (its words join with \n).
    */
  private def cuesFor(id: Long, text: String): Vector[graft.ops.Subtitles.Cue] = {
    val words = text.trim.split("\\s+").toVector.filter(_.nonEmpty)
    words.grouped(3).zipWithIndex.map { case (ws, k) =>
      val sep = if (k % 3 == 2) "\n" else " "
      graft.ops.Subtitles.Cue(k * 1800L,
        k * 1800L + 1500L + (id % 4) * 100L, ws.mkString(sep))
    }.toVector
  }

  /** DuckDB mirror of [[cuesFor]]'s per-cue text (1-based cue index j);
    * array_to_string needs a CONSTANT separator, hence the CASE over two
    * constant-separator calls.
    */
  private def sqlCueText = """CASE WHEN (j - 1) % 3 = 2
      THEN array_to_string(a[3 * (j - 1) + 1 : least(3 * j, len(a))], chr(10))
      ELSE array_to_string(a[3 * (j - 1) + 1 : least(3 * j, len(a))], ' ')
      END"""

  private def sqlCuesFrom(textExpr: String) = s"""arrs AS (
        SELECT source, doc_id AS id,
          regexp_split_to_array(trim($textExpr), '\\s+') AS a
        FROM documents),
      cues AS (SELECT source, id, len(a) AS n_words,
          (len(a) + 2) // 3 AS n_cues, j,
          $sqlCueText AS cue_text
        FROM arrs, UNNEST(generate_series(1, (len(a) + 2) // 3)) AS g(j))"""

  private val sqlCues = sqlCuesFrom("text")

  /** ASS has no escape for literal `{`/`}`/`\` in plain cue text (brace
    * content IS the override-tag channel), so sub04 sanitizes them to
    * spaces before cue construction — identically in Scala and the
    * oracle. Identity on the brace-free corpus; total on any corpus
    * (a hostile doc can no longer crash the round-trip require).
    */
  private def assSafe(text: String): String =
    text.replace('{', ' ').replace('}', ' ').replace('\\', ' ')

  private val sqlCuesAss = sqlCuesFrom(
    """replace(replace(replace(text, '{', ' '), '}', ' '), chr(92), ' ')""")

  val all: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // SRT round trip: every doc becomes a SubRip file (index lines,
    // comma-decimal timings, multi-line cues), the parser recovers every
    // cue, and DuckDB recomputes cue counts, coverage ms, text chars and
    // a per-cue text checksum from the doc_id arithmetic — one wrong
    // millisecond field or a dropped cue line breaks a sum. The in-row
    // round-trip require means a parse/render disagreement can never
    // average out.
    GraftQuery(
      "sub01_srt_cues",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"))
          .transform(graft.core.Par.spread)
          .as[(String, Long, String)]
          .flatMap { case (source, id, text) =>
            val cues = cuesFor(id, text)
            val parsed = graft.ops.Subtitles.parseSrt(
              graft.ops.Subtitles.renderSrt(cues))
            require(parsed.cues == cues, s"srt round trip doc $id")
            parsed.cues.map(c =>
              (source, c.endMs - c.startMs, c.text.length.toLong,
                c.text.replace('\n', ' ')))
          }
          .toDF("source", "span_ms", "n_chars", "flat_text")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_cues"),
            sum(col("span_ms")).as("coverage_ms"),
            sum(col("n_chars")).as("char_sum"),
            sum(TA.hash60(col("flat_text")) % M).as("text_check"))
      },
      Some(s"""WITH $sqlCues
        SELECT source, count(*) AS n_cues,
          CAST(sum(1500 + (id % 4) * 100) AS BIGINT) AS coverage_ms,
          CAST(sum(length(cue_text)) AS BIGINT) AS char_sum,
          CAST(sum(${TA.Sql.hash60("replace(cue_text, chr(10), ' ')")} % $M)
            AS BIGINT) AS text_check
        FROM cues GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // WebVTT round trip with ordering audit: same cue arithmetic through
    // the W3C grammar (ids on every second doc, the BOM on every third),
    // and on every fifth doc the first two cues are written SWAPPED —
    // the parser must preserve file order and the disorder audit count
    // them (the signal a caption-alignment pipeline uses to quarantine
    // re-muxed subtitle tracks).
    GraftQuery(
      "sub02_webvtt_cues",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"))
          .transform(graft.core.Par.spread)
          .as[(String, Long, String)]
          .map { case (source, id, text) =>
            val cues = cuesFor(id, text)
            val laid =
              if (id % 5 == 0 && cues.length >= 2)
                cues.updated(0, cues(1)).updated(1, cues(0))
              else cues
            val bom = if (id % 3 == 0) "\uFEFF" else ""
            val vtt = bom + graft.ops.Subtitles.renderVtt(
              laid, withIds = id % 2 == 0)
            val parsed = graft.ops.Subtitles.parseVtt(vtt)
            require(parsed.cues == laid, s"vtt round trip doc $id")
            (source, parsed.cues.length.toLong, parsed.coverageMs,
              parsed.textChars, parsed.nDisordered)
          }
          .toDF("source", "n_cues", "coverage_ms", "n_chars", "n_disordered")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_files"),
            sum(col("n_cues")).as("cue_sum"),
            sum(col("coverage_ms")).as("coverage_sum"),
            sum(col("n_chars")).as("char_sum"),
            sum(col("n_disordered")).as("disorder_sum"))
      },
      Some(s"""WITH $sqlCues,
        perdoc AS (SELECT source, id, n_cues,
            CAST(sum(length(cue_text)) AS BIGINT) AS chars
          FROM cues GROUP BY 1, 2, 3)
        SELECT source, count(*) AS n_files,
          CAST(sum(n_cues) AS BIGINT) AS cue_sum,
          CAST(sum(n_cues * (1500 + (id % 4) * 100)) AS BIGINT) AS coverage_sum,
          CAST(sum(chars) AS BIGINT) AS char_sum,
          CAST(sum(CASE WHEN id % 5 = 0 AND n_cues >= 2 THEN 1 ELSE 0 END)
            AS BIGINT) AS disorder_sum
        FROM perdoc GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Poisoned caption scan (the family's poisoned-twin contract): every
    // eleventh file is rotten — dot decimals in an SRT timing, minutes
    // past 59, a cue ending before it starts, or a VTT missing its
    // header — and the scan yields one TYPED error row per rotten file
    // while every healthy file still parses exactly.
    GraftQuery(
      "sub03_poisoned_subs",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"))
          .transform(graft.core.Par.spread)
          .as[(String, Long, String)]
          .map { case (source, id, text) =>
            val cues = cuesFor(id, text)
            val srt = graft.ops.Subtitles.renderSrt(cues)
            val rot = id % 11 == 3
            val result =
              if (!rot) graft.ops.Subtitles.parseSrtSafe(srt)
              else (id % 4) match {
                case 0 => graft.ops.Subtitles.parseSrtSafe(
                  srt.replaceFirst(",(\\d{3}) -->", ".$1 -->"))
                case 1 => graft.ops.Subtitles.parseSrtSafe(
                  srt.replaceFirst("00:00:", "00:77:"))
                case 2 => graft.ops.Subtitles.parseSrtSafe(
                  "1\n00:00:05,000 --> 00:00:03,000\nbackwards\n")
                case _ => graft.ops.Subtitles.parseVttSafe(srt) // no header
              }
            result match {
              case Right(c) => (source, 1L, 0L, c.coverageMs)
              case Left(kind) =>
                require(kind == "bad_cue", s"unexpected kind $kind")
                (source, 0L, 1L, 0L)
            }
          }
          .toDF("source", "ok", "bad", "coverage_ms")
          .groupBy(col("source"))
          .agg(
            sum(col("ok")).as("n_ok"),
            sum(col("bad")).as("n_bad"),
            sum(col("coverage_ms")).as("coverage_sum"))
      },
      Some("""WITH x AS (SELECT source, doc_id AS id,
            doc_id % 11 = 3 AS rot,
            ((len(regexp_split_to_array(trim(text), '\s+')) + 2) // 3)
              * (1500 + (doc_id % 4) * 100) AS cov
          FROM documents)
        SELECT source,
          CAST(count(CASE WHEN NOT rot THEN 1 END) AS BIGINT) AS n_ok,
          CAST(count(CASE WHEN rot THEN 1 END) AS BIGINT) AS n_bad,
          CAST(sum(CASE WHEN NOT rot THEN cov ELSE 0 END) AS BIGINT)
            AS coverage_sum
        FROM x GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // ASS/SSA round trip (round 17 — the third caption grammar): the
    // same cue arithmetic rendered as SubStation Alpha, with the parts a
    // real fansub file carries — even docs use the ASS v4+ Format (Layer
    // first), odd docs the SSA v4 Format (Marked first) so field mapping
    // provably follows the Format line; every second cue wears {\an8}/
    // {\i1} override tags the text channel must strip exactly; newlines
    // ride \N; a Comment event and a ; line per file must be skipped.
    // DuckDB recomputes cue counts, coverage, chars, and the per-cue
    // text checksum — identical oracle arithmetic to sub01, so the two
    // grammars are pinned to the same semantics. Per-row map, shuffle-
    // free rollup.
    GraftQuery(
      "sub04_ass_cues",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"))
          .transform(graft.core.Par.spread)
          .as[(String, Long, String)]
          .flatMap { case (source, id, text) =>
            val cues = cuesFor(id, assSafe(text))
            def t(v: Long): String =
              f"${v / 3600000}%d:${v / 60000 % 60}%02d:${v / 1000 % 60}%02d.${v % 1000 / 10}%02d"
            val (format, prefix) =
              if (id % 2 == 0)
                ("Format: Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text", "0")
              else
                ("Format: Marked, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text", "Marked=0")
            val events = cues.zipWithIndex.map { case (c, k) =>
              val txt0 = c.text.replace("\n", "\\N")
              val txt = if (k % 2 == 1) s"{\\an8}{\\i1}$txt0{\\i0}" else txt0
              s"Dialogue: $prefix,${t(c.startMs)},${t(c.endMs)},Default,,0,0,0,,$txt"
            }
            val ass = "[Script Info]\nScriptType: v4.00+\n\n[Events]\n" +
              "; generated caption track\n" + format + "\n" +
              events.take(events.length / 2).mkString("\n") + "\n" +
              s"Comment: $prefix,0:00:00.00,0:00:01.00,Default,,0,0,0,,never\n" +
              events.drop(events.length / 2).mkString("\n") + "\n"
            val parsed = graft.ops.Subtitles.parseAss(ass)
            require(parsed.cues == cues, s"ass round trip doc $id")
            parsed.cues.map(c =>
              (source, c.endMs - c.startMs, c.text.length.toLong,
                c.text.replace('\n', ' ')))
          }
          .toDF("source", "span_ms", "n_chars", "flat_text")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_cues"),
            sum(col("span_ms")).as("coverage_ms"),
            sum(col("n_chars")).as("char_sum"),
            sum(TA.hash60(col("flat_text")) % M).as("text_check"))
      },
      Some(s"""WITH $sqlCuesAss
        SELECT source, count(*) AS n_cues,
          CAST(sum(1500 + (id % 4) * 100) AS BIGINT) AS coverage_ms,
          CAST(sum(length(cue_text)) AS BIGINT) AS char_sum,
          CAST(sum(${TA.Sql.hash60("replace(cue_text, chr(10), ' ')")} % $M)
            AS BIGINT) AS text_check
        FROM cues GROUP BY 1"""),
    ),
  )
}
