package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

import graft.etl.{JArr, JFloat, JInt, JObj, JStr, JVal, Json}
import TfExample._

/** Locks on the tf.Example protobuf codec (graft.ops.TfExample):
  * bit-exact decode of fixtures from the independent python wire-format
  * transcription (packed AND unpacked repeated forms, unknown fields
  * skipped at every nesting level — the protobuf forward-compat
  * contract), BYTE-identical canonical re-encode, round trips across
  * varint boundaries, and the typed-refusal contract.
  */
class TfExampleSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private lazy val expected: Map[String, JVal] =
    Json.parse(new String(fixture("tfexample_expected.json"), UTF_8)) match {
      case JObj(fs) => fs.toMap
      case other    => fail(s"bad expected json: $other")
    }

  private def longs(v: JVal): Vector[Long] = v match {
    case JArr(items) => items.map {
      case JInt(i)   => i.toLong
      case JFloat(d) => d.toLong
      case o         => fail(s"$o")
    }.toVector
    case o => fail(s"$o")
  }

  private def checkExample(ex: Example): Unit = {
    val m = ex.toMap
    val texts = m("text").asInstanceOf[BytesFeature].vs.map(new String(_, UTF_8))
    assert(texts == (expected("text") match {
      case JArr(items) => items.map { case JStr(s) => s; case o => fail(s"$o") }
      case o => fail(s"$o")
    }))
    val scoreBits = m("score").asInstanceOf[FloatFeature].vs
      .map(f => java.lang.Float.floatToIntBits(f) & 0xffffffffL)
    assert(scoreBits == longs(expected("score_bits")))
    assert(m("ids").asInstanceOf[Int64Feature].vs ==
      (expected("ids") match {
        case JArr(items) => items.map { case JInt(i) => i.toLong; case o => fail(s"$o") }
        case o => fail(s"$o")
      }))
    assert(ex.map(_._1) == Vector("text", "score", "ids"))
  }

  test("python-written packed form decodes bit-exactly") {
    checkExample(TfExample.decode(fixture("tfexample_basic.pb")))
  }

  test("unpacked repeated forms + unknown fields at every level decode identically") {
    checkExample(TfExample.decode(fixture("tfexample_unpacked.pb")))
  }

  test("canonical re-encode is BYTE-identical to the python transcription") {
    val hex = expected("basic_hex") match { case JStr(s) => s; case o => fail(s"$o") }
    val ex = TfExample.decode(fixture("tfexample_basic.pb"))
    assert(TfExample.encode(ex).map("%02x".format(_)).mkString == hex)
    // and the unpacked variant canonicalizes to the SAME bytes
    val ex2 = TfExample.decode(fixture("tfexample_unpacked.pb"))
    assert(TfExample.encode(ex2).map("%02x".format(_)).mkString == hex)
  }

  test("round trip across varint boundaries and empty features") {
    val ex: Example = Vector(
      "b" -> BytesFeature(Vector(Array.emptyByteArray, Array[Byte](1, 2, 3))),
      "f" -> FloatFeature(Vector(-0.0f, Float.MinPositiveValue, 65504f)),
      "i" -> Int64Feature(Vector(0L, 127L, 128L, 16383L, 16384L,
        -1L, Long.MaxValue, Long.MinValue)),
      "empty" -> Int64Feature(Vector.empty))
    val back = TfExample.decode(TfExample.encode(ex))
    assert(back.map(_._1) == ex.map(_._1))
    assert(back.toMap.apply("i") == ex.toMap.apply("i"))
    assert(back.toMap.apply("f").asInstanceOf[FloatFeature].vs
      .map(java.lang.Float.floatToIntBits) ==
      ex.toMap.apply("f").asInstanceOf[FloatFeature].vs
        .map(java.lang.Float.floatToIntBits))
    assert(back.toMap.apply("empty") == Int64Feature(Vector.empty))
    assert(back.toMap.apply("b").asInstanceOf[BytesFeature].vs.map(_.toSeq) ==
      ex.toMap.apply("b").asInstanceOf[BytesFeature].vs.map(_.toSeq))
  }

  test("typed refusals: truncation, varint overflow, wire types, bomb cap") {
    val good = TfExample.encode(Vector(
      "t" -> BytesFeature(Vector("payload".getBytes(UTF_8)))))
    assert(TfExample.decodeSafe(java.util.Arrays.copyOf(good, good.length - 3)) ==
      Left("truncated"))
    // 11-byte varint
    assert(TfExample.decodeSafe(Array.fill[Byte](11)(0x80.toByte)) ==
      Left("bad_varint"))
    // wire type 7 at the top level
    assert(TfExample.decodeSafe(Array[Byte](0x0f)) == Left("bad_wire"))
    // declared length past the budget refuses BEFORE allocation
    val old = graft.core.Budget.maxInflatedBytes
    graft.core.Budget.maxInflatedBytes = 4
    try assert(TfExample.decodeSafe(good) == Left("too_large"))
    finally graft.core.Budget.maxInflatedBytes = old
  }
}
