package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Locks on the SRT/WebVTT cue parsers (graft.ops.Subtitles): grammar
  * coverage from the public specs (CRLF, BOM, cue ids, cue settings,
  * hour-less VTT timings, NOTE/STYLE/REGION blocks, multi-line text),
  * writer round trips, and the typed-refusal contract.
  */
class SubtitlesSpec extends AnyFunSuite {

  test("srt: blocks, multi-line text, CRLF, big hour field") {
    val srt = "1\r\n00:00:01,500 --> 00:00:03,000\r\nhello world\r\n\r\n" +
      "2\r\n00:01:00,000 --> 00:01:02,250\r\nline one\r\nline two\r\n\r\n" +
      "3\r\n101:00:00,001 --> 101:00:00,500\r\nlong movie\r\n"
    val c = Subtitles.parseSrt(srt)
    assert(c.cues.map(_.startMs) == Vector(1500L, 60000L, 363600000L + 1))
    assert(c.cues(1).text == "line one\nline two")
    assert(c.coverageMs == 1500 + 2250 + 499)
    assert(c.textChars == 11 + 17 + 10)
    assert(c.nDisordered == 0)
  }

  test("srt: writer round trip") {
    val cues = Vector(Subtitles.Cue(0, 900, "a"),
      Subtitles.Cue(900, 4000, "two\nlines"),
      Subtitles.Cue(3600000 + 61001, 3600000 + 62002, "wrap"))
    assert(Subtitles.parseSrt(Subtitles.renderSrt(cues)).cues == cues)
  }

  test("vtt: BOM, header metadata, ids, settings, hour-less, NOTE/STYLE") {
    val vtt = "﻿WEBVTT - with a title\nKind: captions\n\n" +
      "NOTE this comment\nspans lines\n\n" +
      "STYLE\n::cue { color: red }\n\n" +
      "intro-cue\n00:05.000 --> 00:07.500 align:start position:10%\nhi there\n\n" +
      "01:00:00.000 --> 01:00:01.000\nhour mark\n\n" +
      "REGION\nid:r1\n\n" +
      "00:59.000 --> 01:01.000\nout of order\n"
    val c = Subtitles.parseVtt(vtt)
    assert(c.cues.length == 3)
    assert(c.cues(0) == Subtitles.Cue(5000, 7500, "hi there"))
    assert(c.cues(1) == Subtitles.Cue(3600000, 3601000, "hour mark"))
    assert(c.cues(2) == Subtitles.Cue(59000, 61000, "out of order"))
    assert(c.nDisordered == 1)
  }

  test("vtt: writer round trips with and without ids") {
    val cues = Vector(Subtitles.Cue(100, 2000, "first"),
      Subtitles.Cue(1500, 2500, "overlapping\nsecond"))
    assert(Subtitles.parseVtt(Subtitles.renderVtt(cues)).cues == cues)
    assert(Subtitles.parseVtt(Subtitles.renderVtt(cues, withIds = true)).cues == cues)
  }

  test("refusals are typed bad_cue") {
    // srt with dot decimals (vtt timing in an srt file)
    assert(Subtitles.parseSrtSafe(
      "1\n00:00:01.500 --> 00:00:03.000\nx\n") == Left("bad_cue"))
    // minutes out of range
    assert(Subtitles.parseSrtSafe(
      "1\n00:77:01,000 --> 00:78:03,000\nx\n") == Left("bad_cue"))
    // end before start
    assert(Subtitles.parseSrtSafe(
      "1\n00:00:05,000 --> 00:00:03,000\nx\n") == Left("bad_cue"))
    // non-integer index
    assert(Subtitles.parseSrtSafe(
      "one\n00:00:01,000 --> 00:00:03,000\nx\n") == Left("bad_cue"))
    // missing text
    assert(Subtitles.parseSrtSafe(
      "1\n00:00:01,000 --> 00:00:03,000\n") == Left("bad_cue"))
    // vtt without the header
    assert(Subtitles.parseVttSafe(
      "00:05.000 --> 00:07.500\nhi\n") == Left("bad_cue"))
    // vtt comma decimals
    assert(Subtitles.parseVttSafe(
      "WEBVTT\n\n00:05,000 --> 00:07,500\nhi\n") == Left("bad_cue"))
    // vtt cue with no text
    assert(Subtitles.parseVttSafe(
      "WEBVTT\n\nid-only\n00:05.000 --> 00:06.000\n") == Left("bad_cue"))
    // empty input parses to zero cues for srt? No: SRT of zero blocks is
    // fine (an empty caption file), so is a VTT with only its header
    assert(Subtitles.parseSrt("").cues.isEmpty)
    assert(Subtitles.parseVtt("WEBVTT\n").cues.isEmpty)
  }

  test("ass: format-driven fields, override stripping, \\N/\\h, events") {
    val ass =
      """[Script Info]
        |ScriptType: v4.00+
        |
        |[V4+ Styles]
        |Format: Name, Fontname
        |Style: Default,Arial
        |
        |[Events]
        |; a comment line
        |Format: Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text
        |Dialogue: 0,0:00:01.50,0:00:03.00,Default,,0,0,0,,{\an8}Top {\i1}line{\i0} one
        |Comment: 0,0:00:02.00,0:00:04.00,Default,,0,0,0,,never extracted
        |Dialogue: 0,0:00:03.50,0:00:05.25,Default,,0,0,0,,first\Nsecond, with comma
        |Dialogue: 0,1:02:03.04,1:02:04.00,Default,,0,0,0,,hard\hspace
        |""".stripMargin
    val c = Subtitles.parseAss(ass)
    assert(c.cues == Vector(
      Subtitles.Cue(1500, 3000, "Top line one"),
      Subtitles.Cue(3500, 5250, "first\nsecond, with comma"),
      Subtitles.Cue(3723040L, 3724000L, "hard space")))
    // SSA v4 variant: Marked leads, field mapping must follow Format
    val ssa =
      """[Events]
        |Format: Marked, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text
        |Dialogue: Marked=0,0:00:00.10,0:00:01.00,Default,,0,0,0,,ssa cue
        |""".stripMargin
    assert(Subtitles.parseAss(ssa).cues ==
      Vector(Subtitles.Cue(100, 1000, "ssa cue")))
  }

  test("ass: writer round trip and typed refusals") {
    val cues = Vector(Subtitles.Cue(0, 1500, "plain"),
      Subtitles.Cue(1800, 3300, "two\nlines"))
    assert(Subtitles.parseAss(Subtitles.renderAss(cues)).cues == cues)
    // Dialogue before Format
    assert(Subtitles.parseAssSafe(
      "[Events]\nDialogue: 0,0:00:01.00,0:00:02.00,D,,0,0,0,,x\n") ==
      Left("bad_cue"))
    // no [Events] section at all
    assert(Subtitles.parseAssSafe("[Script Info]\nTitle: x\n") ==
      Left("bad_cue"))
    // field-count mismatch (missing margins)
    assert(Subtitles.parseAssSafe(
      "[Events]\nFormat: Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text\n" +
        "Dialogue: 0,0:00:01.00,0:00:02.00,D,x\n") == Left("bad_cue"))
    // Text not last
    assert(Subtitles.parseAssSafe(
      "[Events]\nFormat: Layer, Text, Start, End\nDialogue: 0,x,0:00:01.00,0:00:02.00\n") ==
      Left("bad_cue"))
    // millisecond (3-digit) timestamps are not ASS
    assert(Subtitles.parseAssSafe(
      "[Events]\nFormat: Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text\n" +
        "Dialogue: 0,0:00:01.000 --> 0:00:02.000,a,D,,0,0,0,,x\n") ==
      Left("bad_cue"))
    // out-of-range minutes; end before start
    assert(Subtitles.parseAssSafe(
      "[Events]\nFormat: Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text\n" +
        "Dialogue: 0,0:77:01.00,0:78:02.00,D,,0,0,0,,x\n") == Left("bad_cue"))
    assert(Subtitles.parseAssSafe(
      "[Events]\nFormat: Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text\n" +
        "Dialogue: 0,0:00:05.00,0:00:03.00,D,,0,0,0,,x\n") == Left("bad_cue"))
  }
}
