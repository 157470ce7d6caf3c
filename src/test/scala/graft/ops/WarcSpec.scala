package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.US_ASCII

/** WARC container layer: record grammar round trip, gzip member split with
  * CRC/ISIZE audit, HTTP response framing, typed refusals, and the
  * poisoning contracts warc03 relies on (CRC-byte flip → crc_mismatch,
  * tail truncation → truncated).
  */
class WarcSpec extends AnyFunSuite {

  private def page(id: Long, text: String) =
    (s"https://src/doc/$id", 200,
      Seq("Content-Type" -> "text/plain; charset=utf-8"),
      text.getBytes(US_ASCII))

  test("record round trip preserves fields, order, and body bytes") {
    val body = "hello warc\r\n\r\nwith embedded blank line".getBytes(US_ASCII)
    val rec = Warc.writeRecord(
      Seq("WARC-Type" -> "response", "WARC-Target-URI" -> "https://x/y"), body)
    val parsed = Warc.parseRecords(rec)
    assert(parsed.size == 1)
    assert(parsed.head.warcType == "response")
    assert(parsed.head.targetUri == "https://x/y")
    assert(parsed.head.body.toSeq == body.toSeq)
  }

  test("multi-record plain WARC parses every record in order") {
    val recs = (0 until 5).map(i =>
      Warc.writeRecord(Seq("WARC-Type" -> "response",
        "WARC-Target-URI" -> s"u$i"), s"body-$i".getBytes(US_ASCII)))
    val all = Warc.parseRecords(recs.reduce(_ ++ _))
    assert(all.map(_.targetUri) == (0 until 5).map(i => s"u$i"))
    assert(all.map(r => new String(r.body, US_ASCII)) ==
      (0 until 5).map(i => s"body-$i"))
  }

  test("gzip members: one per record, split + inflate + CRC audit") {
    val raws = Seq("alpha", "beta", "gamma").map(_.getBytes(US_ASCII))
    val gz = raws.map(Warc.gzipMember).reduce(_ ++ _)
    val back = Warc.gunzipMembers(gz)
    assert(back.map(new String(_, US_ASCII)) == Seq("alpha", "beta", "gamma"))
  }

  test("plain (non-gzip) input passes through gunzipMembers whole") {
    val raw = "WARC/1.0\r\n".getBytes(US_ASCII)
    assert(Warc.gunzipMembers(raw).map(_.toSeq) == Seq(raw.toSeq))
  }

  test("buildCrawlFile round trip: warcinfo + responses, HTTP stripped") {
    val f = Warc.buildCrawlFile("f.warc.gz",
      (0L until 4L).map(i => page(i, s"text number $i with length ${i * 7}")))
    val recs = Warc.read(f)
    assert(recs.head.warcType == "warcinfo")
    assert(recs.head.header("WARC-Filename").contains("f.warc.gz"))
    val resp = recs.tail
    assert(resp.size == 4 && resp.forall(_.warcType == "response"))
    val h2 = Warc.parseHttpResponse(resp(2).body)
    assert(h2.status == 200)
    assert(h2.header("Content-Type").contains("text/plain; charset=utf-8"))
    assert(new String(h2.body, US_ASCII) == "text number 2 with length 14")
    assert(resp(2).targetUri == "https://src/doc/2")
  }

  test("redirect + custom header survive the HTTP layer") {
    val http = Warc.writeHttpResponse(301, "Moved Permanently",
      Seq("Location" -> "https://a/b", "X-Crawl-Depth" -> "3"),
      Array.emptyByteArray)
    val h = Warc.parseHttpResponse(http)
    assert(h.status == 301)
    assert(h.header("Location").contains("https://a/b"))
    assert(h.header("x-crawl-depth").contains("3")) // case-insensitive
    assert(h.body.isEmpty)
  }

  test("CRC trailer corruption is a typed crc_mismatch refusal") {
    val f = Warc.buildCrawlFile("f", Seq(page(1, "some body text")))
    val b = f.clone(); b(b.length - 8) = (b(b.length - 8) ^ 0x5a).toByte
    assert(Warc.readSafe(b) == Left("crc_mismatch"))
  }

  test("tail truncation is a typed truncated refusal") {
    val f = Warc.buildCrawlFile("f", Seq(page(1, "some body text")))
    assert(Warc.readSafe(java.util.Arrays.copyOf(f, f.length - 5)) ==
      Left("truncated"))
    // cutting into the deflate data itself is also truncated
    assert(Warc.readSafe(java.util.Arrays.copyOf(f, f.length - 30)) ==
      Left("truncated"))
  }

  test("garbage after a valid member is a typed bad_gzip refusal") {
    val f = Warc.buildCrawlFile("f", Seq(page(1, "x"))) ++
      "not gzip at all".getBytes(US_ASCII)
    assert(Warc.readSafe(f) == Left("bad_gzip"))
  }

  test("malformed records refuse with bad_record") {
    assert(Warc.readSafe("HTTP/1.1 200 OK\r\n\r\n".getBytes(US_ASCII)) ==
      Left("bad_record")) // not a WARC version line
    val noLen = "WARC/1.0\r\nWARC-Type: response\r\n\r\n".getBytes(US_ASCII)
    assert(Warc.readSafe(noLen) == Left("bad_record")) // missing Content-Length
    val overrun = "WARC/1.0\r\nContent-Length: 99\r\n\r\nshort".getBytes(US_ASCII)
    assert(Warc.readSafe(overrun) == Left("bad_record"))
  }

  test("WET round trip: conversion records carry uri + extracted text") {
    val pages = Seq(
      ("https://a/1", "extracted text one".getBytes(US_ASCII)),
      ("https://a/2", "körper zwei".getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    val file = Warc.buildWetFile("x.warc.wet.gz", pages)
    // WARC-framed: the generic reader sees warcinfo + 2 conversions
    val recs = Warc.read(file)
    assert(recs.map(_.warcType) == Seq("warcinfo", "conversion", "conversion"))
    assert(Warc.wetRecords(file) ==
      Seq(("https://a/1", "extracted text one"), ("https://a/2", "körper zwei")))
    // a conversion record without a target URI refuses typed
    val bad = Warc.gzipMember(Warc.writeRecord(
      Seq("WARC-Type" -> "conversion", "Content-Type" -> "text/plain"),
      "orphan".getBytes(US_ASCII)))
    assert(Warc.wetRecordsSafe(bad) == Left("bad_record"))
  }

  test("WAT round trip: metadata records carry uri + envelope JSON") {
    val json = """{"Envelope":{"WARC-Header-Metadata":{}}}"""
    val file = Warc.buildWatFile("x.warc.wat.gz", Seq(("https://a/1", json)))
    assert(Warc.watRecords(file) == Seq(("https://a/1", json)))
    // WET view of a WAT file is empty (type filter), and vice versa
    assert(Warc.wetRecords(file).isEmpty)
    // rotten container refuses typed through the safe twin
    val cut = java.util.Arrays.copyOf(file, file.length - 5)
    assert(Warc.watRecordsSafe(cut).isLeft)
  }
}

/** File-level ingest plumbing on real temp files (the 100 TB shape:
  * binaryFile scan → per-file flatMap, no shuffle).
  */
class WarcSourceSpec extends graft.SparkSpec {

  test("responses() reads a directory of .warc.gz files") {
    val dir = java.nio.file.Files.createTempDirectory("warcsrc")
    try {
      (0 until 3).foreach { f =>
        val pages = (0L until 4L).map { i =>
          (s"https://s$f/doc/$i", 200,
            Seq("Content-Type" -> "text/plain; charset=utf-8"),
            s"file $f page $i".getBytes(US_ASCII))
        }
        java.nio.file.Files.write(dir.resolve(s"part-$f.warc.gz"),
          Warc.buildCrawlFile(s"part-$f.warc.gz", pages))
      }
      val df = WarcSource.responses(spark, dir.toString).cache()
      assert(df.count() == 12)
      assert(df.select("status").distinct().collect().map(_.getInt(0)).toSeq == Seq(200))
      val one = df.filter(org.apache.spark.sql.functions.col("uri") === "https://s1/doc/2")
        .select("payload").collect()
      assert(one.length == 1)
      assert(new String(one.head.getAs[Array[Byte]](0), US_ASCII) == "file 1 page 2")
      df.unpersist()
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }

  test("responsesSafe() types a malformed HTTP payload per RECORD, scan survives") {
    // the round-12 advisor case: the WARC container is structurally VALID
    // (gzip members, CRCs, headers all fine) but one record's HTTP payload
    // is rotten — non-numeric status, then a colon-less header. The safe
    // scan must emit one typed error row per rotten record and keep the
    // good record, never throw.
    val dir = java.nio.file.Files.createTempDirectory("warchttp")
    try {
      val out = new java.io.ByteArrayOutputStream()
      def resp(uri: String, http: Array[Byte]): Array[Byte] = Warc.writeRecord(
        Seq("WARC-Type" -> "response", "WARC-Date" -> "2026-01-01T00:00:00Z",
          "WARC-Record-ID" -> s"<urn:graft:resp:$uri>", "WARC-Target-URI" -> uri,
          "Content-Type" -> "application/http;msgtype=response"), http)
      out.write(Warc.gzipMember(resp("https://h/ok",
        Warc.writeHttpResponse(200, "OK", Seq("Content-Type" -> "text/plain"),
          "fine".getBytes(US_ASCII)))))
      out.write(Warc.gzipMember(resp("https://h/badstatus",
        "HTTP/1.1 ABC NotANumber\r\n\r\n".getBytes(US_ASCII))))
      out.write(Warc.gzipMember(resp("https://h/badheader",
        "HTTP/1.1 200 OK\r\nNoColonHere\r\n\r\nbody".getBytes(US_ASCII))))
      java.nio.file.Files.write(dir.resolve("mixed.warc.gz"), out.toByteArray)
      val rows = WarcSource.responsesSafe(spark, dir.toString)
        .select("ok", "err_kind", "uri").collect()
      assert(rows.length == 3)
      val (okRows, errRows) = rows.partition(_.getBoolean(0))
      assert(okRows.map(_.getString(2)).toSeq == Seq("https://h/ok"))
      assert(errRows.map(_.getString(1)).toSet == Set("bad_record"))
      assert(errRows.map(_.getString(2)).toSet ==
        Set("https://h/badstatus", "https://h/badheader"))
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }

  test("revisit round trip: refers-to, profile, payload digest; malformed refuses") {
    val digest = Warc.payloadDigest("hello".getBytes(US_ASCII))
    // independent pin: python base64.b32encode(hashlib.sha1(b"hello").digest())
    assert(digest == "sha1:VL2MMHO4YXUKFWV63YHTWSBM3GXKSQ2N")
    val file = Warc.buildRevisitFile("rev.warc.gz", Seq(
      ("https://a/redup/1", "<urn:x:orig1>", "https://a/doc/1", digest)))
    val recs = Warc.revisitRecords(file)
    assert(recs == Seq(("https://a/redup/1", "<urn:x:orig1>", "https://a/doc/1", digest)))
    // the revisit record itself is body-less
    val rev = Warc.read(file).find(_.warcType == "revisit").get
    assert(rev.body.isEmpty)
    assert(rev.header("WARC-Profile").exists(_.contains("identical-payload-digest")))
    // a revisit with no WARC-Refers-To is malformed, typed
    val noRef = Warc.writeRecord(Seq(
      "WARC-Type" -> "revisit",
      "WARC-Date" -> "2026-01-02T00:00:00Z",
      "WARC-Record-ID" -> "<urn:x:r>",
      "WARC-Target-URI" -> "https://a/x"), Array.emptyByteArray)
    assert(Warc.revisitRecordsSafe(Warc.gzipMember(noRef)) == Left("bad_record"))
  }

  test("responsesSafe() survives a poisoned file and types the error") {
    val dir = java.nio.file.Files.createTempDirectory("warcsafe")
    try {
      val good = Warc.buildCrawlFile("good", Seq(
        ("https://g/1", 200, Seq("Content-Type" -> "text/plain"), "ok".getBytes(US_ASCII))))
      val bad = good.clone(); bad(bad.length - 8) = (bad(bad.length - 8) ^ 0x11).toByte
      java.nio.file.Files.write(dir.resolve("good.warc.gz"), good)
      java.nio.file.Files.write(dir.resolve("bad.warc.gz"), bad)
      val rows = WarcSource.responsesSafe(spark, dir.toString)
        .select("ok", "err_kind", "uri").collect()
      assert(rows.length == 2)
      val (okRows, errRows) = rows.partition(_.getBoolean(0))
      assert(okRows.map(_.getString(2)).toSeq == Seq("https://g/1"))
      assert(errRows.map(_.getString(1)).toSeq == Seq("crc_mismatch"))
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }

}
