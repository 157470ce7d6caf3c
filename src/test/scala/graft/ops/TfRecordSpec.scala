package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

import graft.etl.{JArr, JInt, JObj, Json}

/** Locks on the TFRecord shard codec (graft.ops.TfRecord): bit-exact
  * decode of the INDEPENDENT python writer's fixture (its CRC32C is a
  * table-driven software Castagnoli, sharing nothing with the JDK
  * implementation), round trips, both checksum refusals, the length
  * budget, and totality on garbage/mutations/truncations.
  */
class TfRecordSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private def withBudget[A](bytes: Long)(f: => A): A = {
    val old = graft.core.Budget.maxInflatedBytes
    graft.core.Budget.maxInflatedBytes = bytes
    try f finally graft.core.Budget.maxInflatedBytes = old
  }

  test("python-writer fixture decodes exactly (independent CRC32C)") {
    val recs = TfRecord.read(fixture("shard.tfrecord"))
    val exp = Json.parse(new String(fixture("tfrecord_expected.json"), UTF_8))
      .asInstanceOf[JObj].fields.toMap
    val lengths = exp("lengths").asInstanceOf[JArr].items
      .map(_.asInstanceOf[JInt].i.toInt)
    assert(recs.map(_.length) == lengths)
    // spot-check contents: record 2 is the JSON doc, record 3 the byte ramp
    assert(new String(recs(2), UTF_8).contains("\"text\": \"doc body7\""))
    assert(recs(3).take(256).zipWithIndex.forall { case (b, i) => (b & 0xff) == i })
    assert(recs(4).forall(_ == 'x'.toByte))
  }

  test("round trip is exact and deterministic") {
    val recs = (0 until 300).map(i =>
      s"""{"id":$i,"body":"${"y" * (i % 97)}"}""".getBytes(UTF_8))
    val a = TfRecord.write(recs)
    assert(java.util.Arrays.equals(a, TfRecord.write(recs)))
    val back = TfRecord.read(a)
    assert(back.length == recs.length)
    back.zip(recs).foreach { case (x, y) => assert(java.util.Arrays.equals(x, y)) }
  }

  test("typed refusals: length crc, data crc, truncation, budget") {
    val clean = TfRecord.write(Seq.fill(20)("payload-payload".getBytes(UTF_8)))
    val lenCrc = clean.clone(); lenCrc(9) = (lenCrc(9) ^ 0x01).toByte
    assert(TfRecord.readSafe(lenCrc) == Left("bad_length_crc"))
    val dataCrc = clean.clone()
    dataCrc(dataCrc.length - 1) = (dataCrc(dataCrc.length - 1) ^ 0x20).toByte
    assert(TfRecord.readSafe(dataCrc) == Left("bad_data_crc"))
    val body = clean.clone(); body(14) = 'X'.toByte
    assert(TfRecord.readSafe(body) == Left("bad_data_crc"))
    assert(TfRecord.readSafe(java.util.Arrays.copyOf(clean, clean.length - 3))
      == Left("truncated"))
    // a record legally DECLARING a huge length (crc valid) refuses
    // too_large before any allocation
    val bomb = TfRecord.write(Seq(new Array[Byte](64 * 1024)))
    withBudget(1024)(assert(TfRecord.readSafe(bomb) == Left("too_large")))
  }

  test("totality: garbage, mutations, every truncation refuse typed") {
    val clean = TfRecord.write((0 until 15).map(i => s"r$i body".getBytes(UTF_8)))
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val junk = new Array[Byte](rnd.nextInt(200)); rnd.nextBytes(junk)
      TfRecord.readSafe(junk)
    }
    (0 until 500).foreach { _ =>
      val m = clean.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      TfRecord.readSafe(m) match {
        case Right(rs) => assert(rs.length == 15)
        case Left(kind) => assert(Set("bad_length_crc", "bad_data_crc",
          "truncated", "too_large").contains(kind))
      }
    }
    (0 until clean.length).foreach { n =>
      TfRecord.readSafe(java.util.Arrays.copyOf(clean, n))
    }
  }
}
