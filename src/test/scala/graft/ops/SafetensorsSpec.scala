package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

import graft.etl.{JArr, JFloat, JInt, JObj, JStr, JVal, Json}

/** Locks on the safetensors codec (graft.ops.Safetensors): bit-exact
  * parse of fixtures from the independent python transcription
  * (tools/make_safetensors_fixture.py — numpy supplies the reference
  * byte layouts), round trips, the exact-coverage offset validation,
  * and the typed-refusal contract.
  */
class SafetensorsSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private lazy val expected: Map[String, JVal] =
    Json.parse(new String(fixture("st_expected.json"), UTF_8)) match {
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
  private def nums(v: JVal): Vector[Double] =
    v match { case JArr(items) => items.map(num).toVector; case o => fail(s"$o") }

  test("python-written F32/I64 shard with metadata parses bit-exactly") {
    val (ts, meta) = Safetensors.read(fixture("st_basic.safetensors"))
    val e = obj("st_basic")
    val emb = ts.toMap.apply("emb")
    val embE = e("emb") match { case JObj(fs) => fs.toMap; case o => fail(s"$o") }
    assert(emb.shape == nums(embE("shape")).map(_.toLong))
    assert(emb.floats.toVector == nums(embE("values")).map(_.toFloat))
    val ids = ts.toMap.apply("ids")
    // 2^62 survives: compare against the exact JInt, not a double cast
    val idsExact = e("ids") match {
      case JArr(items) => items.map { case JInt(i) => i.toLong; case o => fail(s"$o") }
      case o => fail(s"$o")
    }
    assert(ids.longs.toVector == idsExact.toVector)
    val metaE = e("metadata") match {
      case JObj(fs) => fs.toMap.map { case (k, JStr(s)) => k -> s; case (k, o) => fail(s"$o") }
      case o => fail(s"$o")
    }
    assert(meta == metaE)
    // tensor order preserved (canonical ascending offsets)
    assert(ts.map(_._1) == Vector("emb", "ids"))
  }

  test("exotic dtypes: F64 extremes, I32, 0-d scalar, zero-size tensor") {
    val (ts, _) = Safetensors.read(fixture("st_exotic.safetensors"))
    val m = ts.toMap
    val e = obj("st_exotic")
    assert(m("f64").doubles.toVector == nums(e("f64")))
    assert(java.lang.Double.doubleToLongBits(m("f64").doubles(3)) ==
      java.lang.Double.doubleToLongBits(-0.0))
    assert(m("i32").ints.toVector == nums(e("i32")).map(_.toInt))
    assert(m("scalar").shape.isEmpty && m("scalar").floats.toVector == Vector(42.5f))
    assert(m("empty").shape == Vector(0L, 8L) && m("empty").elems == 0L)
  }

  test("round trip through our writer is byte-stable and value-exact") {
    val emb = Safetensors.floatTensor(Seq(3L, 2L),
      Array(1.5f, -2f, 0f, 4.25f, -0.0f, 9f))
    val ids = Safetensors.longTensor(Array(7L, 8L, 9L))
    val bytes = Safetensors.write(Seq("emb" -> emb, "ids" -> ids),
      metadata = Seq("k" -> "v"))
    val (ts, meta) = Safetensors.read(bytes)
    assert(meta == Map("k" -> "v"))
    assert(ts.toMap.apply("emb").floats.toVector == emb.floats.toVector)
    assert(ts.toMap.apply("ids").longs.toVector == Vector(7L, 8L, 9L))
    // canonical: re-writing the parsed form reproduces the bytes
    assert(Safetensors.write(ts.map { case (n, t) => n -> t },
      metadata = Seq("k" -> "v")).toSeq == bytes.toSeq)
  }

  test("f32→f16 conversion is BIT-identical to numpy astype(float16)") {
    val e = obj("f16_conv")
    val f32s = nums(e("f32_bits")).map(x => BigDecimal(x).toLongExact.toInt)
    val f16s = nums(e("f16_bits")).map(x => BigDecimal(x).toLongExact.toInt)
    val backs = nums(e("back_f32_bits")).map(x => BigDecimal(x).toLongExact.toInt)
    f32s.indices.foreach { i =>
      val in = java.lang.Float.intBitsToFloat(f32s(i))
      val got = Safetensors.floatToHalf(in) & 0xffff
      assert(got == f16s(i),
        s"i=$i in=$in: got ${got.toHexString}, numpy ${f16s(i).toHexString}")
      val back = Safetensors.halfToFloat(f16s(i).toShort)
      assert(java.lang.Float.floatToIntBits(back) == backs(i),
        s"i=$i decode: got $back, numpy bits ${backs(i).toHexString}")
    }
  }

  test("F16 fixture decodes bit-exactly; F16/BF16 round-trip through our writer") {
    val (ts, _) = Safetensors.read(fixture("st_half.safetensors"))
    val h = ts.toMap.apply("h")
    assert(h.dtype == "F16")
    val bits = nums(obj("st_half")("h_bits")).map(x => BigDecimal(x).toLongExact.toInt)
    val gotBits = (0 until h.elems.toInt).map(i =>
      (h.data(i * 2) & 0xff) | ((h.data(i * 2 + 1) & 0xff) << 8))
    assert(gotBits == bits)
    // round trip: dequantize, re-encode, bits identical
    val rt = Safetensors.write(Seq("h" ->
      Safetensors.halfTensor(h.shape, h.halfFloats)))
    val back = Safetensors.read(rt)._1.head._2
    assert(back.data.toSeq == h.data.toSeq)
    // bf16: grid values (k/128) survive exactly
    val vs = Array(-0.5f, 0.25f, 1.0f, -0.9921875f, 0f)
    val bt = Safetensors.bf16Tensor(Seq(5L), vs)
    val bb = Safetensors.read(Safetensors.write(Seq("b" -> bt)))._1.head._2
    assert(bb.dtype == "BF16" && bb.bfloats.toVector == vs.toVector)
  }

  test("typed refusals: truncation, header, dtype, offsets, coverage, bomb") {
    val good = Safetensors.write(Seq(
      "t" -> Safetensors.longTensor(Array(1L, 2L, 3L))))
    assert(Safetensors.readSafe(java.util.Arrays.copyOf(good, 4)) ==
      Left("truncated"))
    assert(Safetensors.readSafe(java.util.Arrays.copyOf(good, good.length - 8)) ==
      Left("truncated"))
    // trailing junk → coverage mismatch
    assert(Safetensors.readSafe(good ++ Array[Byte](1, 2, 3, 4)) ==
      Left("bad_offsets"))
    // break the JSON
    val b = good.clone(); b(9) = '!'
    assert(Safetensors.readSafe(b) == Left("bad_header"))
    // unsupported dtype: patch I64 -> U64 in the header bytes
    val u = good.clone()
    val at = (0 until u.length - 2).find(i =>
      u(i) == 'I' && u(i + 1) == '6' && u(i + 2) == '4').get
    u(at) = 'U'
    assert(Safetensors.readSafe(u) == Left("unsupported_dtype"))
    // declared header length bomb
    val bomb = good.clone()
    bomb(6) = 0x7f // header length becomes astronomically large
    assert(Safetensors.readSafe(bomb) == Left("bad_header"))
  }

  test("coverage is an interval tiling: overlap+gap that SUM-cancel refuse") {
    def stFile(headerJson: String, bufLen: Int): Array[Byte] = {
      val h = headerJson.getBytes("UTF-8")
      val bb = java.nio.ByteBuffer.allocate(8 + h.length + bufLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putLong(h.length.toLong); bb.put(h); bb.array()
    }
    // two tensors both at [0,8) with an uncovered [8,16) tail: the lengths
    // sum to bufLen (a pure sum check accepts this) but the layout has an
    // overlap AND a gap — upstream safetensors rejects it
    val cancel = stFile(
      """{"a":{"dtype":"I64","shape":[1],"data_offsets":[0,8]},""" +
        """"b":{"dtype":"I64","shape":[1],"data_offsets":[0,8]}}""", 16)
    assert(Safetensors.readSafe(cancel) == Left("bad_offsets"))
    // gap at the START with the sum still matching via a long tail tensor
    val headGap = stFile(
      """{"a":{"dtype":"I64","shape":[1],"data_offsets":[8,16]},""" +
        """"b":{"dtype":"I64","shape":[1],"data_offsets":[8,16]}}""", 16)
    assert(Safetensors.readSafe(headGap) == Left("bad_offsets"))
    // the equivalent VALID tiling still reads
    val ok = stFile(
      """{"a":{"dtype":"I64","shape":[1],"data_offsets":[0,8]},""" +
        """"b":{"dtype":"I64","shape":[1],"data_offsets":[8,16]}}""", 16)
    assert(Safetensors.readSafe(ok).isRight)
    // out-of-order header entries are fine as long as intervals tile
    val reordered = stFile(
      """{"b":{"dtype":"I64","shape":[1],"data_offsets":[8,16]},""" +
        """"a":{"dtype":"I64","shape":[1],"data_offsets":[0,8]}}""", 16)
    assert(Safetensors.readSafe(reordered).isRight)
  }
}
