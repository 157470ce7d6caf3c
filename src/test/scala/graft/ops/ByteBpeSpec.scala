package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

import graft.etl.{JArr, JObj, JStr, Json}

/** Locks on the byte-level BPE front end (graft.ops.ByteBpe) against
  * verdicts from the GENUINE python `regex` engine + the published
  * bytes_to_unicode table (tools/make_bytebpe_fixture.py): piece
  * boundaries over contractions/whitespace/digits/punct/unicode/emoji,
  * the full 256-entry table, and the lossless byte-unicode round trip.
  */
class ByteBpeSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private val expected = Json.parse(new String(
    fixture("bytebpe_expected.json"), UTF_8)).asInstanceOf[JObj].fields.toMap

  test("the 256-entry byte-to-unicode table matches bytes_to_unicode exactly") {
    val want = expected("table").asInstanceOf[JArr].items.head
      .asInstanceOf[JStr].s
    assert(ByteBpe.byteEncoder.mkString == want)
    // canonical anchors: space -> Ġ, newline -> Ċ, tab -> ĉ
    assert(ByteBpe.byteEncoder(' '.toInt) == 'Ġ')
    assert(ByteBpe.byteEncoder('\n'.toInt) == 'Ċ')
    assert(ByteBpe.byteEncoder('\t'.toInt) == 'ĉ')
  }

  test("pretokenizer + mapping agree with the python regex engine on the battery") {
    val cases = expected("cases").asInstanceOf[JArr].items.map(
      _.asInstanceOf[JObj].fields.toMap)
    assert(cases.size == 19)
    cases.foreach { c =>
      val text = c("text").asInstanceOf[JStr].s
      val pieces = c("pieces").asInstanceOf[JArr].items.map(
        _.asInstanceOf[JStr].s)
      val mapped = c("mapped").asInstanceOf[JArr].items.map(
        _.asInstanceOf[JStr].s)
      assert(ByteBpe.pretokenize(text) == pieces, s"pieces of '$text'")
      assert(ByteBpe.pieces(text) == mapped, s"mapping of '$text'")
    }
  }

  test("byte-unicode mapping is a lossless inverse on arbitrary bytes") {
    val texts = Seq("hello Ġworld", "tabs\t\nnewlines", "caffé ☕ 漢",
      new String(Array.tabulate[Byte](256)(_.toByte), UTF_8))
    texts.foreach { t =>
      assert(ByteBpe.fromByteUnicode(ByteBpe.toByteUnicode(t)) == t, t)
    }
    // every byte value round-trips through the table
    (0 until 256).foreach { b =>
      assert(ByteBpe.byteDecoder(ByteBpe.byteEncoder(b)) == b)
    }
  }
}
