package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** Focused locks on the encrypt-dict string parser (PdfCrypt) — the
  * review-found EOL semantics of ISO 32000-1 §7.3.4.2: escaped-EOL line
  * continuations in all three forms, raw CR/CRLF reading back as one LF,
  * and the whitespace-tolerant /EncryptMetadata lookup (exercised
  * through key derivation). The end-to-end encrypted-document paths live
  * in PdfTextSpec.
  */
class PdfCryptSpec extends AnyFunSuite {

  private def sv(dict: String): Seq[Int] =
    PdfCrypt.stringValue(dict, "O").get.toSeq.map(_ & 0xff)

  test("escaped EOL is a continuation in LF, CR, and CRLF forms") {
    assert(sv("/O (ab\\\ncd)") == "abcd".getBytes.toSeq.map(_ & 0xff))
    assert(sv("/O (ab\\\rcd)") == "abcd".getBytes.toSeq.map(_ & 0xff))
    assert(sv("/O (ab\\\r\ncd)") == "abcd".getBytes.toSeq.map(_ & 0xff))
  }

  test("raw CR and CRLF inside a literal read back as one LF") {
    assert(sv("/O (ab\rcd)") == Seq('a', 'b', '\n', 'c', 'd'))
    assert(sv("/O (ab\r\ncd)") == Seq('a', 'b', '\n', 'c', 'd'))
    assert(sv("/O (ab\ncd)") == Seq('a', 'b', '\n', 'c', 'd'))
  }

  test("escapes, octal, nesting, and hex strings are unchanged") {
    assert(sv("/O (a\\051b)") == Seq('a', ')', 'b'))
    assert(sv("/O (a(b)c)") == Seq('a', '(', 'b', ')', 'c'))
    assert(sv("/O <41 42>") == Seq(0x41, 0x42))
    // /O never matches /OE when /OE comes first
    assert(sv("/OE (xx) /O (y)") == Seq('y'))
  }

  test("mixed StmF/StrF refuses in both V4 and V5 dictionaries") {
    // one cipher serves both streams and strings, so disagreeing filters
    // must refuse instead of passing one side through undecrypted
    val v5 = "/Filter /Standard /V 5 /R 6 /StmF /Identity /StrF /StdCF " +
      "/CF << /StdCF << /CFM /AESV3 >> >> /O (x) /U (y)"
    val r5 = PdfCrypt.forEmptyUserPassword(v5, Array.emptyByteArray)
    assert(r5.isLeft && r5.left.exists(_.contains("mixed StmF/StrF")))

    val pad32 = "A" * 32
    val v4 = "/Filter /Standard /V 4 /R 4 /Length 128 /StmF /StdCF /StrF /Identity " +
      s"/CF << /StdCF << /CFM /AESV2 >> >> /O ($pad32) /U ($pad32) /P -44"
    val r4 = PdfCrypt.forEmptyUserPassword(v4, Array.emptyByteArray)
    assert(r4.isLeft && r4.left.exists(_.contains("mixed StmF/StrF")))
  }
}
