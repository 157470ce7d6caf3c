package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import java.nio.file.{Files, Paths}

/** S2 — PDF text extraction golden parity. The fixture
  * (tools/make_pdf_fixture.py) exercises: uncompressed and FlateDecode
  * content streams, direct and INDIRECT /Length, the page tree (Catalog →
  * Pages → Kids order), Tj / TJ / ' show operators, Td / T* line moves,
  * escaped parens, octal escapes, hex strings, and TJ kern-to-space.
  */
class PdfTextSpec extends SparkSpec {

  private val fixture = "src/test/resources/fixtures/sample.pdf"
  private val expectedFile = "src/test/resources/fixtures/sample_pdf_expected.txt"

  private def pdfBytes = Files.readAllBytes(Paths.get(fixture))
  private def expected = Files.readString(Paths.get(expectedFile)).stripLineEnd

  test("extracts all pages in page-tree order, golden parity") {
    val pages = PdfText.extractPages(pdfBytes)
    assert(pages.length == 4)
    assert(pages.mkString("\n") == expected)
    // page-level goldens: flate page decodes, TJ kern >= 180 becomes a space
    assert(pages(1).startsWith("[2024-01-01 00:00:00] INFO"))
    assert(pages(2) == "kerned wordsjoin")
    // CID/Type0: 2-byte codes through the FlateDecode ToUnicode CMap —
    // bfchar (incl. multi-unit "ID"), bfrange hex-increment ("tuv") and
    // array destinations ("xyz"), via hex AND literal show strings
    assert(pages(3) == "CID tuv\nxyz")
  }

  test("decodes every §7.4 text-stream filter, golden parity (round 11)") {
    // filters.pdf (tools/make_pdf_fixture.py build_filters): one page per
    // decode path — LZWDecode crossing the 9→10-bit EarlyChange boundary,
    // ASCII85Decode, ASCIIHexDecode with whitespace + EOD, RunLengthDecode
    // runs + literals, a chained [/ASCII85Decode /FlateDecode], and
    // FlateDecode under a PNG /Predictor 12 with mixed row tags. The
    // python encoders are written independently from the spec, so an
    // off-by-one on either side garbles the text here.
    val bytes = Files.readAllBytes(Paths.get("src/test/resources/fixtures/filters.pdf"))
    val exp = Files.readString(
      Paths.get("src/test/resources/fixtures/filters_pdf_expected.txt")).stripLineEnd
    val pages = PdfText.extractPages(bytes)
    assert(pages.length == 6)
    assert(pages.mkString("\n") == exp)
  }

  test("an unsupported stream filter is REFUSED, never walked raw") {
    // /DCTDecode content (image codec): pdfplumber decodes images but a
    // text walk over raw DCT bytes would be silent garbage — the S2-style
    // typed refusal is the contract (round-10 verdict item 4)
    val bytes = Files.readAllBytes(
      Paths.get("src/test/resources/fixtures/unsupported_filter.pdf"))
    val e = intercept[IllegalArgumentException](PdfText.extract(bytes))
    assert(e.getMessage.contains("unsupported PDF stream filter /DCTDecode"))
  }

  test("Type0 font without ToUnicode decodes 2-byte codes as identity") {
    // /Identity-H with no CMap: <0041 0042> reads as "AB" (PyPDF2's
    // CMap-less CID reading), not Latin-1 of the raw bytes
    val content = "BT /F1 12 Tf <00410042> Tj ET"
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 " +
      "/Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n" +
      "4 0 obj\n<< /Length " + content.length + " >>\nstream\n" +
      content + "\nendstream\nendobj\n" +
      "5 0 obj\n<< /Type /Font /Subtype /Type0 /Encoding /Identity-H >>\nendobj\n" +
      "%%EOF\n").getBytes
    // /Resources sits on the Pages NODE, exercising /Parent inheritance
    assert(PdfText.extract(pdf) == "AB")
  }

  test("PlainTextExtractor routes .pdf through PdfText (S2 end of stub)") {
    assert(PlainTextExtractor.extract("doc.pdf", pdfBytes) == expected)
  }

  test("textless and malformed PDFs raise, mirroring the reference guard") {
    // structurally valid PDF with no text operators → the reference's
    // "No extractable text found" error (backend/etl_pipeline.py:46-48)
    val empty = ("%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R >>\nendobj\n%%EOF\n").getBytes
    val e1 = intercept[IllegalArgumentException] { PdfText.extract(empty) }
    assert(e1.getMessage.contains("No extractable text"))

    val e2 = intercept[IllegalArgumentException] { PdfText.extract("junk".getBytes) }
    assert(e2.getMessage.contains("PDF"))
  }

  test("encrypted PDFs raise the reference guard instead of extracting ciphertext") {
    // fixture: valid structure, trailer /Encrypt, garbage string/stream
    // bytes (tools/make_pdf_fixture.py build_encrypted). Both reference
    // extractors fail on encrypted input and it raises the empty-text
    // error — a silent garbage extraction here would poison the corpus.
    val enc = Files.readAllBytes(Paths.get("src/test/resources/fixtures/encrypted.pdf"))
    val e = intercept[IllegalArgumentException] { PdfText.extract(enc) }
    assert(e.getMessage.contains("No extractable text"))
    // and the guard keys on the trailer, not the garbage: the clean
    // fixture still extracts
    assert(PdfText.extract(pdfBytes).nonEmpty)
  }

  test("empty-user-password encryption decrypts transparently (RC4-40/128, AESV2, V4-RC4)") {
    // fixtures from tools/make_pdf_encrypted_fixture.py — an independent
    // python transcription of ISO 32000-1 §7.6 (Algorithms 2/3/4/5 +
    // per-object keys). The reference reads these through pdfminer.six's
    // standard handler (backend/etl_pipeline.py:27-35); each variant must
    // extract EXACTLY the unencrypted twin's text.
    def fx(n: String) =
      Files.readAllBytes(Paths.get(s"src/test/resources/fixtures/$n"))
    val plain = PdfText.extract(fx("pdf_enc_plain.pdf"))
    assert(plain.contains("fee schedule") && plain.contains("deflated then ciphered"))
    for (variant <- Seq("pdf_enc_rc4_40.pdf", "pdf_enc_rc4_128.pdf",
        "pdf_enc_aesv2.pdf", "pdf_enc_v4_rc4.pdf"))
      assert(PdfText.extract(fx(variant)) == plain, variant)
    // a REAL user password still refuses — decrypting with the wrong key
    // would extract exactly the silent garbage the guard exists to stop
    val e = intercept[IllegalArgumentException] {
      PdfText.extract(fx("pdf_enc_password.pdf"))
    }
    assert(e.getMessage.contains("No extractable text"))
  }

  test("AES-256 empty-user-password encryption decrypts (R6 Algorithm 2.B, R5)") {
    // ISO 32000-2 §7.6.4.4.10-11 fixtures from the same independent
    // python transcription: R6's iterated SHA-256/384/512 hash with
    // /Perms verification, and the pre-ISO R5 single-SHA-256 form whose
    // dict lists /UE before /U (name-boundary lookup) and omits /Perms
    def fx(n: String) =
      Files.readAllBytes(Paths.get(s"src/test/resources/fixtures/$n"))
    val plain = PdfText.extract(fx("pdf_enc_plain.pdf"))
    for (variant <- Seq("pdf_enc_aes256_r6.pdf", "pdf_enc_aes256_r5.pdf"))
      assert(PdfText.extract(fx(variant)) == plain, variant)
    // R6 with a REAL user password still refuses
    val e = intercept[IllegalArgumentException] {
      PdfText.extract(fx("pdf_enc_aes256_pw.pdf"))
    }
    assert(e.getMessage.contains("No extractable text"))
  }

  test("AES-256 R6 mutations: typed refusal or text, never a raw throw") {
    val enc = Files.readAllBytes(
      Paths.get("src/test/resources/fixtures/pdf_enc_aes256_r6.pdf"))
    for (pos <- enc.indices) {
      val m = enc.clone(); m(pos) = (m(pos) ^ 0x41).toByte
      try { PdfText.extract(m); () }
      catch {
        case _: IllegalArgumentException => () // the typed refusal path
        case e: Throwable => fail(s"pos $pos: ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }

  test("encrypted-PDF mutations: typed refusal or text, never a raw throw") {
    // single-byte corruption anywhere (encrypt dict, O/U hex, AES stream,
    // xref, trailer) must surface as the pipeline's typed
    // IllegalArgumentException path — a NumberFormatException or crypto
    // exception escaping here would kill a corpus scan task
    val enc = Files.readAllBytes(Paths.get("src/test/resources/fixtures/pdf_enc_aesv2.pdf"))
    for (pos <- enc.indices) {
      val m = enc.clone(); m(pos) = (m(pos) ^ 0x41).toByte
      try { PdfText.extract(m); () }
      catch {
        case _: IllegalArgumentException => () // the typed refusal path
        case e: Throwable => fail(s"pos $pos: ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }

  test("a document that merely MENTIONS /Encrypt is not falsely refused") {
    // unencrypted PDF about PDF internals: its content stream and an info
    // string both spell "/Encrypt 5 0 R" — the guard must key on the
    // trailer/XRef dict, not on a full-byte-stream scan
    val content = "BT (trailer /Encrypt 5 0 R or /Encrypt <<...>> syntax) Tj ET"
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n" +
      "4 0 obj\n<< /Subject (uses /Encrypt 9 0 R in examples) /Length " +
      content.length + " >>\nstream\n" + content + "\nendstream\nendobj\n" +
      "trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n").getBytes
    assert(PdfText.extract(pdf) ==
      "trailer /Encrypt 5 0 R or /Encrypt <<...>> syntax")
  }

  test("two-column pages interleave by visual line (pdfplumber-class ordering)") {
    // the stream writes the LEFT column completely, then the RIGHT column —
    // the reference's primary extractor (pdfplumber) merges words with the
    // same y into one visual line; a stream-order walker would emit the
    // columns sequentially
    val content =
      "BT /F1 10 Tf 72 720 Td (left-a) Tj 0 -14 Td (left-b) Tj 0 -14 Td (left-c) Tj ET " +
        "BT /F1 10 Tf 300 720 Td (right-a) Tj 0 -14 Td (right-b) Tj 0 -14 Td (right-c) Tj ET"
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n" +
      "4 0 obj\n<< /Length " + content.length +
      " >>\nstream\n" + content + "\nendstream\nendobj\n" +
      "trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n").getBytes
    assert(PdfText.extract(pdf) ==
      "left-a right-a\nleft-b right-b\nleft-c right-c")

    // near-equal baselines (within pdfplumber's y_tolerance=3) still read
    // as ONE visual line, left to right, regardless of stream order
    val jitter = "BT /F1 10 Tf 300 719 Td (world) Tj ET BT /F1 10 Tf 72 720 Td (hello) Tj ET"
    val pdf2 = ("%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n" +
      "4 0 obj\n<< /Length " + jitter.length +
      " >>\nstream\n" + jitter + "\nendstream\nendobj\n" +
      "trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n").getBytes
    assert(PdfText.extract(pdf2) == "hello world")
  }

  test("review regressions: multi-digit indirect /Length, >> in strings, bad numbers, octal overflow") {
    // object 12 holds the stream length (multi-digit indirect ref: the old
    // lookahead regex backtracked "/Length 12 0 R" into direct length 1);
    // the dict also carries a string containing ">>", which must not
    // terminate dictionary balancing early. The content stream has a
    // malformed lone "-" token (skipped, not fatal) and an overflowing
    // octal escape \407 ≡ 0x07... use \507 -> 'G' (0x147 & 0xff = 0x47).
    val content = "BT (ab) Tj - (c) Tj (\\507) Tj ET"
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n" +
      "4 0 obj\n<< /Producer (sizes >> 10) /Length 12 0 R >>\nstream\n" +
      content + "\nendstream\nendobj\n" +
      "12 0 obj\n" + content.length + "\nendobj\n%%EOF\n").getBytes
    assert(PdfText.extract(pdf) == "abcG")
  }

  test("a .pdf document runs the full pipeline end-to-end") {
    val dir = Files.createTempDirectory("graft-pdf")
    Files.copy(Paths.get(fixture), dir.resolve("sample.pdf"))
    val docs = DocumentEtl.readDocuments(spark, dir.toString)
    assert(docs.collect().map(_.getAs[String]("text")).toSeq == Seq(expected))

    val res = DocumentEtl.run(spark, docs)
    val tags = res.table.select(col("`_source_type`")).collect()
      .map(_.getString(0)).toSet
    // the extracted text carries an embedded JSON object AND log lines —
    // extraction stages E2 + E8 both fire on PDF-sourced text (cells are
    // JSON-encoded, so string values carry their quotes)
    assert(tags.contains("\"json\""))
    assert(tags.contains("\"log\""))
    assert(res.table.count() >= 3)
  }
}
