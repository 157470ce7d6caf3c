package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

import graft.etl.{JArr, JFloat, JInt, JObj, JStr, JVal, Json}

/** Locks on the NumPy container codec (graft.ops.Npy): bit-exact decode
  * of fixtures written by REAL numpy (tools/make_npy_fixture.py uses
  * np.save/np.savez — the format's reference implementation), BYTE
  * equality of our writer against np.save's output, round trips, the
  * typed-refusal contract, and the bomb caps.
  */
class NpySpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private lazy val expected: Map[String, JVal] =
    Json.parse(new String(fixture("npy_expected.json"), UTF_8)) match {
      case JObj(fs) => fs.toMap
      case other    => fail(s"bad expected json: $other")
    }

  private def obj(name: String): Map[String, JVal] =
    expected(name) match { case JObj(fs) => fs.toMap; case o => fail(s"$o") }

  private def num(v: JVal): Double = v match {
    case JInt(i)   => i.toDouble
    case JFloat(d) => d
    case o         => fail(s"not a number: $o")
  }

  private def nums(v: JVal): Vector[Double] = v match {
    case JArr(items) => items.map(num).toVector
    case o           => fail(s"not an array: $o")
  }

  test("np.save float32 2-D decodes bit-exactly") {
    val a = Npy.read(fixture("npy_f4.npy"))
    assert(a.descr == "<f4" && a.shape == Vector(3L, 5L))
    val exp = nums(obj("npy_f4")("values")).map(_.toFloat)
    assert(a.floats.toVector == exp)
  }

  test("np.save float64 1-D decodes bit-exactly (extremes included)") {
    val a = Npy.read(fixture("npy_f8.npy"))
    assert(a.descr == "<f8" && a.shape == Vector(7L))
    assert(a.doubles.toVector == nums(obj("npy_f8")("values")))
  }

  test("np.save int64 and int32 decode bit-exactly") {
    val i8 = Npy.read(fixture("npy_i8.npy"))
    assert(i8.longs.toVector == nums(obj("npy_i8")("values")).map(_.toLong))
    val i4 = Npy.read(fixture("npy_i4.npy"))
    assert(i4.descr == "<i4" && i4.shape == Vector(2L, 3L))
    assert(i4.ints.toVector == nums(obj("npy_i4")("values")).map(_.toInt))
  }

  test("0-d scalar array decodes (shape (), one element)") {
    val a = Npy.read(fixture("npy_scalar.npy"))
    assert(a.shape.isEmpty && a.elems == 1L)
    assert(a.doubles.toVector == Vector(42.125))
  }

  test("1000-element array decodes with exact sum") {
    val a = Npy.read(fixture("npy_big.npy"))
    val exp = obj("npy_big")
    assert(a.longs.take(5).toVector ==
      nums(exp("values_head")).map(_.toLong))
    assert(a.longs.sum == num(exp("sum")).toLong)
  }

  test("fortran_order arrays refuse with a typed kind") {
    assert(Npy.readSafe(fixture("npy_fortran.npy")) == Left("fortran_order"))
  }

  test("writer is BYTE-identical to np.save") {
    def hex(v: JVal): String = v match { case JStr(s) => s; case o => fail(s"$o") }
    val parity = obj("writer_parity")
    val f4 = nums(obj("npy_f4")("values")).map(_.toFloat).toArray
    assert(Npy.writeFloats(Seq(3L, 5L), f4).map("%02x".format(_)).mkString ==
      hex(parity("f4_3x5_hex")))
    val i8 = nums(obj("npy_i8")("values")).map(_.toLong).toArray
    assert(Npy.writeLongs(i8).map("%02x".format(_)).mkString ==
      hex(parity("i8_6_hex")))
  }

  test("np.savez (stored) and np.savez_compressed (deflate) both decode") {
    for (name <- Seq("bundle.npz", "bundle_c.npz")) {
      val arrays = Npy.readNpz(fixture(name)).toMap
      val exp = obj("bundle")
      assert(arrays("ids").longs.toVector == nums(exp("ids")).map(_.toLong))
      val v = arrays("vecs")
      assert(v.shape == Vector(4L, 8L))
      assert(v.floats.toVector == nums(exp("vecs")).map(_.toFloat))
    }
  }

  test("npz round trip through our writer") {
    val ids = Array(1L, 2L, 3L)
    val vecs = Array.tabulate(12)(i => i * 0.5f - 2f)
    val npz = Npy.writeNpz(Seq(
      "ids" -> Npy.writeLongs(ids),
      "vecs" -> Npy.writeFloats(Seq(3L, 4L), vecs)))
    val back = Npy.readNpz(npz).toMap
    assert(back("ids").longs.toVector == ids.toVector)
    assert(back("vecs").floats.toVector == vecs.toVector)
    assert(back("vecs").shape == Vector(3L, 4L))
  }

  test("typed refusals: magic, version, header, dtype, size, truncation") {
    val good = Npy.writeLongs(Array(1L, 2L, 3L))
    def mut(i: Int, x: Int): Array[Byte] = {
      val b = good.clone(); b(i) = (b(i) ^ x).toByte; b
    }
    assert(Npy.readSafe(mut(0, 0x5a)) == Left("bad_magic"))
    assert(Npy.readSafe(mut(6, 0x07)) == Left("bad_version"))
    assert(Npy.readSafe(mut(11, 0x15)) == Left("bad_header")) // breaks "'descr'"
    assert(Npy.readSafe(java.util.Arrays.copyOf(good, good.length - 8)) ==
      Left("size_mismatch"))
    assert(Npy.readSafe(Array[Byte](1, 2, 3)) == Left("bad_magic"))
    // unsupported dtype: patch the descr bytes in place ('<i8' -> '<u8')
    val u = good.clone()
    val at = (0 until u.length - 2).find(i =>
      u(i) == '<' && u(i + 1) == 'i' && u(i + 2) == '8').get
    u(at + 1) = 'u'
    assert(Npy.readSafe(u) == Left("unsupported_dtype"))
  }

  test("declared-shape bomb is refused before allocation") {
    // hand-craft a header declaring 2^40 elements with no data
    val dict = "{'descr': '<f8', 'fortran_order': False, " +
      "'shape': (1099511627776,), }"
    val pad = (64 - (10 + dict.length + 1) % 64) % 64
    val header = dict + (" " * pad) + "\n"
    val b = java.nio.ByteBuffer.allocate(10 + header.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y'))
      .put(1.toByte).put(0.toByte).putShort(header.length.toShort)
      .put(header.getBytes(UTF_8))
    assert(Npy.readSafe(b.array()) == Left("too_large"))
    // and a wraparound product
    val dict2 = "{'descr': '<f8', 'fortran_order': False, " +
      "'shape': (4294967296, 4294967296, 4294967296), }"
    val pad2 = (64 - (10 + dict2.length + 1) % 64) % 64
    val header2 = dict2 + (" " * pad2) + "\n"
    val b2 = java.nio.ByteBuffer.allocate(10 + header2.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b2.put(Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y'))
      .put(1.toByte).put(0.toByte).putShort(header2.length.toShort)
      .put(header2.getBytes(UTF_8))
    assert(Npy.readSafe(b2.array()) == Left("too_large"))
  }
}
