package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

import graft.etl.{JArr, JBool, JFloat, JInt, JNull, JObj, JStr, JVal, Json}

/** Locks on the CBOR codec (graft.ops.Cbor): bit-exact decode of fixtures
  * from the independent python spec transcription
  * (tools/make_cbor_fixture.py), BYTE-identical re-encode (both sides
  * emit RFC 8949 preferred serialization), round trips across every
  * argument-width boundary, tag transparency, and the typed-refusal
  * contract including mutation totality.
  */
class CborSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private lazy val expected: Map[String, JVal] =
    Json.parse(new String(fixture("cbor_expected.json"), UTF_8)) match {
      case JObj(fs) => fs.toMap
      case other    => fail(s"bad expected json: $other")
    }

  test("python-written record decodes to the exact JSON value model") {
    val got = Cbor.decodeAll(fixture("cbor_basic.cbor"))
    assert(got == Seq(expected("basic")))
  }

  test("our encoder is BYTE-identical to the python transcription") {
    assert(Cbor.encode(expected("basic")).toSeq == fixture("cbor_basic.cbor").toSeq)
    val stream = expected("stream") match { case JArr(items) => items; case o => fail(s"$o") }
    assert(Cbor.encodeAll(stream).toSeq == fixture("cbor_stream.cbor").toSeq)
  }

  test("back-to-back record shard (CBOR sequence) decodes record-wise") {
    val recs = Cbor.decodeAll(fixture("cbor_stream.cbor"))
    val exp = expected("stream") match { case JArr(items) => items.toVector; case o => fail(s"$o") }
    assert(recs == exp)
  }

  test("tags are skipped transparently (self-described CBOR + epoch tag)") {
    val recs = Cbor.decodeAll(fixture("cbor_tagged.cbor"))
    assert(recs == Seq(expected("tagged")))
  }

  test("round trip across every argument-width boundary") {
    val v = JObj(Vector(
      "u" -> JArr(Vector(0L, 23L, 24L, 255L, 256L, 65535L, 65536L,
        4294967295L, 4294967296L, Long.MaxValue).map(x => JInt(BigInt(x)))),
      "n" -> JArr(Vector(-1L, -24L, -25L, -256L, -257L, -65536L, -65537L,
        -4294967296L, -4294967297L, Long.MinValue).map(x => JInt(BigInt(x)))),
      "f" -> JFloat(-2.75),
      "s" -> JStr("x" * 70000),
      "b" -> JArr(Vector(JBool(true), JBool(false), JNull))))
    assert(Cbor.decodeAll(Cbor.encode(v)) == Seq(v))
  }

  test("typed refusals: truncation, unmodeled forms, indefinite lengths, bombs") {
    val clean = Cbor.encode(expected("basic"))
    for (n <- 0 until clean.length) {
      Cbor.decodeAllSafe(java.util.Arrays.copyOf(clean, n)) match {
        case Left(k) => assert(Set("truncated", "bad_type", "too_large").contains(k))
        case Right(_) => () // a cut at a record boundary is a valid sequence
      }
    }
    assert(Cbor.decodeAllSafe(Array(0x40.toByte)) == Left("bad_type")) // bstr
    assert(Cbor.decodeAllSafe(Array(0x5f.toByte)) == Left("bad_type")) // indefinite bstr
    assert(Cbor.decodeAllSafe(Array(0x9f.toByte)) == Left("bad_type")) // indefinite array
    assert(Cbor.decodeAllSafe(Array(0xf9.toByte, 0, 0)) == Left("bad_type")) // half float
    assert(Cbor.decodeAllSafe(Array(0xff.toByte)) == Left("bad_type")) // bare break
    // declared-length bomb: 2 GiB text in 6 bytes
    assert(Cbor.decodeAllSafe(Array(0x7a.toByte, 0x7f.toByte, 0xff.toByte,
      0xff.toByte, 0xff.toByte)) == Left("too_large"))
    // deep nesting
    val deep = Array.fill(100)(0x81.toByte) ++ Array(0x00.toByte)
    assert(Cbor.decodeAllSafe(deep) == Left("bad_type"))
  }

  test("every single-byte mutation of a valid shard is typed, never a throw") {
    val clean = Cbor.encodeAll((0 until 10).map(i => JObj(Vector(
      "id" -> JInt(BigInt(i)), "text" -> JStr(s"doc $i"),
      "xs" -> JArr(Vector(JFloat(1.5), JNull, JBool(i % 2 == 0)))))))
    val kinds = Set("truncated", "bad_type", "too_large")
    for (pos <- clean.indices; x <- 1 until 256) {
      val m = clean.clone(); m(pos) = (m(pos) ^ x).toByte
      Cbor.decodeAllSafe(m) match {
        case Left(k) => assert(kinds.contains(k), s"pos=$pos x=$x kind=$k")
        case Right(_) => ()
      }
    }
  }

  test("malformed UTF-8 in a text string refuses bad_type, never U+FFFD") {
    // major type 3 length 1, byte 0xFF: RFC 8949 well-formedness says
    // this is not a valid item — the strict reader must not silently
    // substitute the replacement character
    assert(Cbor.decodeAllSafe(Array[Byte](0x61, 0xff.toByte)) == Left("bad_type"))
    // truncated 2-byte sequence and a lone continuation byte likewise
    assert(Cbor.decodeAllSafe(Array[Byte](0x62, 0xc3.toByte, 0x28)) == Left("bad_type"))
    assert(Cbor.decodeAllSafe(Array[Byte](0x61, 0x80.toByte)) == Left("bad_type"))
    // well-formed multi-byte text still decodes
    val ok = "Größe".getBytes(UTF_8)
    val head = Array[Byte]((0x60 | ok.length).toByte)
    assert(Cbor.decodeAllSafe(head ++ ok) ==
      Right(Seq(graft.etl.JStr("Größe"))))
  }
}
