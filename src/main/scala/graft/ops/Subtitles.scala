package graft.ops

/** Subtitle/caption parsing (round 16): SRT (the de-facto SubRip text
  * format) and WebVTT (the W3C standard HTML5 caption format) — the
  * text half of a video-caption training pair. A crawl-scale caption
  * pipeline reads these to align transcript text with media timestamps
  * (CLIP-style pairs, ASR supervision, dubbing corpora); the operators
  * here recover cues (start/end ms + text), coverage, and ordering.
  *
  * Grammar (public specs: SubRip's conventional format; W3C WebVTT):
  *   SRT   — blank-line-separated blocks: integer index line,
  *           `HH:MM:SS,mmm --> HH:MM:SS,mmm` timing (comma decimal),
  *           ≥1 text lines.
  *   WebVTT — optional BOM, `WEBVTT` header line (optional trailing
  *           text), then blocks: NOTE/STYLE/REGION blocks are skipped,
  *           cues are an OPTIONAL id line (any line without `-->`) +
  *           `[HH:]MM:SS.mmm --> [HH:]MM:SS.mmm` timing (dot decimal,
  *           hours optional, optional cue settings after the end time)
  *           + text lines.
  *
  * Strictness (the family contract): malformed timings, minutes/seconds
  * ≥ 60, end ≤ start, empty cue text, or a non-integer SRT index refuse
  * typed (`bad_cue`) rather than mis-aligning a corpus; CRLF and LF both
  * accepted; trailing blank lines ignored.
  */
object Subtitles {

  import Warc.WarcError

  private def bad(msg: String): Nothing = throw new WarcError("bad_cue", msg)

  final case class Cue(startMs: Long, endMs: Long, text: String)

  final case class Cues(cues: Vector[Cue]) {
    def coverageMs: Long = cues.iterator.map(c => c.endMs - c.startMs).sum
    def textChars: Long = cues.iterator.map(_.text.length.toLong).sum
    /** cues whose start precedes the previous cue's start (disordered) */
    def nDisordered: Long =
      cues.iterator.sliding(2).withPartial(false)
        .count(w => w(1).startMs < w(0).startMs)
  }

  private val SrtTiming =
    """(\d{2,}):(\d{2}):(\d{2}),(\d{3})\s*-->\s*(\d{2,}):(\d{2}):(\d{2}),(\d{3})""".r
  private val VttTiming =
    ("""(?:(\d+):)?(\d{2}):(\d{2})\.(\d{3})\s*-->\s*""" +
      """(?:(\d+):)?(\d{2}):(\d{2})\.(\d{3})(?:[ \t].*)?""").r

  private def ms(h: String, m: String, s: String, f: String): Long = {
    val hh = if (h == null) 0L else h.toLong
    val mm = m.toLong
    val ss = s.toLong
    if (mm >= 60 || ss >= 60) bad(s"timing component out of range: $m:$s")
    hh * 3600000L + mm * 60000L + ss * 1000L + f.toLong
  }

  private def blocks(text: String): Vector[Vector[String]] = {
    val lines = text.split("\r\n|\n|\r", -1).toVector
    val out = Vector.newBuilder[Vector[String]]
    var cur = Vector.newBuilder[String]
    var nonEmpty = false
    lines.foreach { l =>
      if (l.trim.isEmpty) {
        if (nonEmpty) { out += cur.result(); cur = Vector.newBuilder; nonEmpty = false }
      } else { cur += l; nonEmpty = true }
    }
    if (nonEmpty) out += cur.result()
    out.result()
  }

  // --------------------------------------------------------------- srt --

  def parseSrt(text: String): Cues = {
    val cues = blocks(text).map { b =>
      if (b.length < 3) bad(s"srt block of ${b.length} lines")
      if (!b(0).trim.forall(_.isDigit) || b(0).trim.isEmpty)
        bad(s"srt index line '${b(0)}'")
      val (s0, e0) = b(1).trim match {
        case SrtTiming(h1, m1, s1, f1, h2, m2, s2, f2) =>
          (ms(h1, m1, s1, f1), ms(h2, m2, s2, f2))
        case other => bad(s"srt timing line '$other'")
      }
      if (e0 <= s0) bad(s"srt cue ends before it starts: $s0 -> $e0")
      Cue(s0, e0, b.drop(2).mkString("\n"))
    }
    Cues(cues)
  }

  def renderSrt(cues: Seq[Cue]): String = {
    def t(v: Long): String =
      f"${v / 3600000}%02d:${v / 60000 % 60}%02d:${v / 1000 % 60}%02d,${v % 1000}%03d"
    cues.zipWithIndex.map { case (c, i) =>
      s"${i + 1}\n${t(c.startMs)} --> ${t(c.endMs)}\n${c.text}"
    }.mkString("", "\n\n", "\n")
  }

  // ------------------------------------------------------------- webvtt --

  def parseVtt(text: String): Cues = {
    val body = if (text.nonEmpty && text.charAt(0) == '\uFEFF') text.substring(1) else text
    val bs = blocks(body)
    if (bs.isEmpty || !(bs.head.head == "WEBVTT" ||
        bs.head.head.startsWith("WEBVTT ") || bs.head.head.startsWith("WEBVTT\t")))
      bad("missing WEBVTT header")
    // the header block may carry metadata lines; cues start at block 2
    val cues = bs.tail.filterNot { b =>
      // a comment block is NOTE followed by whitespace or end-of-line —
      // a cue ID that merely STARTS with "NOTE" (e.g. "NOTES-ch1") is a
      // cue, not a comment (round-16 review find: silent cue loss)
      b.head == "NOTE" || b.head.startsWith("NOTE ") ||
        b.head.startsWith("NOTE\t") || b.head == "STYLE" || b.head == "REGION"
    }.map { b =>
      // optional cue id: a first line without "-->"
      val (timing, rest) =
        if (b.head.contains("-->")) (b.head, b.tail)
        else {
          if (b.length < 2) bad(s"vtt cue with only an id line")
          (b(1), b.drop(2))
        }
      val (s0, e0) = timing.trim match {
        case VttTiming(h1, m1, s1, f1, h2, m2, s2, f2) =>
          (ms(h1, m1, s1, f1), ms(h2, m2, s2, f2))
        case other => bad(s"vtt timing line '$other'")
      }
      if (e0 <= s0) bad(s"vtt cue ends before it starts: $s0 -> $e0")
      if (rest.isEmpty) bad("vtt cue with no text")
      Cue(s0, e0, rest.mkString("\n"))
    }
    Cues(cues)
  }

  def renderVtt(cues: Seq[Cue], withIds: Boolean = false): String = {
    def t(v: Long): String =
      f"${v / 3600000}%02d:${v / 60000 % 60}%02d:${v / 1000 % 60}%02d.${v % 1000}%03d"
    val body = cues.zipWithIndex.map { case (c, i) =>
      val id = if (withIds) s"cue-${i + 1}\n" else ""
      s"$id${t(c.startMs)} --> ${t(c.endMs)}\n${c.text}"
    }.mkString("\n\n")
    s"WEBVTT\n\n$body\n"
  }

  def parseSrtSafe(text: String): Either[String, Cues] =
    try Right(parseSrt(text))
    catch {
      case e: WarcError => Left(e.kind)
      case _: Exception => Left("bad_cue")
    }

  def parseVttSafe(text: String): Either[String, Cues] =
    try Right(parseVtt(text))
    catch {
      case e: WarcError => Left(e.kind)
      case _: Exception => Left("bad_cue")
    }
}
