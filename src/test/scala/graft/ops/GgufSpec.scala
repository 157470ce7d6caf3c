package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.US_ASCII

import graft.etl.{JArr, JBool, JFloat, JInt, JObj, JStr, Json}

/** Locks on the GGUF v3 reader/writer (graft.ops.Gguf): the independent
  * python transcription's fixture decodes exactly (every metadata value
  * type, F32 bit patterns, F16 dequantization, 64-byte alignment),
  * quantized tensors refuse typed, round trips through our writer, and
  * the mutation/truncation sweep stays typed.
  */
class GgufSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  test("python-transcription fixture decodes exactly (metadata types, F32 bits, F16)") {
    val exp = Json.parse(new String(fixture("gguf_expected.json"), US_ASCII))
      .asInstanceOf[JObj].fields.toMap
    val m = Gguf.read(fixture("gguf_v3_full.gguf"))
    assert(m.alignment == 64)
    val em = exp("meta").asInstanceOf[JObj].fields.toMap
    def mi(k: String): Long = m.meta(k).get.asInstanceOf[Gguf.MInt].v
    assert(m.meta("general.name").contains(Gguf.MString("graft fixture")))
    for (k <- Seq("m.u8", "m.i8", "m.u16", "m.i16", "m.u32", "m.i32",
        "m.u64", "m.i64"))
      assert(mi(k) == em(k).asInstanceOf[JInt].i.toLong, k)
    assert(m.meta("m.f32").get.asInstanceOf[Gguf.MFloat].v == 0.25)
    assert(math.abs(m.meta("m.f64").get.asInstanceOf[Gguf.MFloat].v
      - 2.718281828) < 1e-12)
    assert(m.meta("m.bool").contains(Gguf.MBool(true)))
    assert(m.meta("m.strs").get == Gguf.MArray(Vector(
      Gguf.MString("alpha"), Gguf.MString("beta"))))
    assert(m.meta("m.ints").get == Gguf.MArray(Vector(
      Gguf.MInt(1), Gguf.MInt(-2), Gguf.MInt(3))))
    // F32 bit patterns exactly
    val embBits = exp("emb_bits").asInstanceOf[JArr].items
      .map(_.asInstanceOf[JInt].i.toInt)
    val emb = m.floats("emb.weight")
    assert(m.tensors.find(_.name == "emb.weight").get.dims == Vector(2L, 3L))
    assert(emb.toSeq.map(java.lang.Float.floatToRawIntBits) == embBits)
    // F16 dequantized exactly as python's binary16 unpack
    val halfVals = exp("half_vals").asInstanceOf[JArr].items.map {
      case JFloat(d) => d.toFloat
      case JInt(i) => i.toFloat
      case other => fail(s"$other")
    }
    assert(m.floats("half.bias").toSeq == halfVals)
  }

  test("IQ-quant tensor types refuse unsupported, never a guessed block layout") {
    // IQ2_XXS (type 16) — Q8_0/Q4_0 decode since round 15 and Q4_K/Q6_K
    // since round 16; the IQ family has no layout here, so it refuses
    assert(Gguf.readSafe(fixture("gguf_quantized.gguf")) == Left("unsupported"))
  }

  test("Q4_K python-transcription fixture dequantizes exactly (d*sc*q - dmin*m)") {
    val exp = Json.parse(new String(fixture("gguf_expected.json"), US_ASCII))
      .asInstanceOf[JObj].fields.toMap
    val m = Gguf.read(fixture("gguf_q4k.gguf"))
    val t = m.tensors.find(_.name == "q4k.weight").get
    assert(t.ggmlType == 12 && t.dims == Vector(256L, 2L) && t.byteSize == 288)
    val want = exp("q4k_vals").asInstanceOf[JArr].items.map {
      case JFloat(d) => d.toFloat
      case JInt(i) => i.toFloat
      case other => fail(s"$other")
    }
    assert(m.floats("q4k.weight").toSeq == want)
  }

  test("Q5_K python-transcription fixture dequantizes exactly (d*sc*(q|h<<4) - dmin*m)") {
    val exp = Json.parse(new String(fixture("gguf_expected.json"), US_ASCII))
      .asInstanceOf[JObj].fields.toMap
    val m = Gguf.read(fixture("gguf_q5k.gguf"))
    val t = m.tensors.find(_.name == "q5k.weight").get
    assert(t.ggmlType == 13 && t.dims == Vector(256L, 2L) && t.byteSize == 352)
    val want = exp("q5k_vals").asInstanceOf[JArr].items.map {
      case JFloat(d) => d.toFloat
      case JInt(i) => i.toFloat
      case other => fail(s"$other")
    }
    assert(m.floats("q5k.weight").toSeq == want)
  }

  test("Q5_K writer is byte-identical to the python packing and round trips") {
    val d = Array[Short](0x3400, 0xb000.toShort) // 0.25, -0.125
    val dmin = Array[Short](0x3800, 0x3e00) // 0.5, 1.5
    val sc = Array.tabulate[Byte](16)(j => ((13 * j + 2) % 64).toByte)
    val mn = Array.tabulate[Byte](16)(j => ((9 * j + 1) % 64).toByte)
    val q = Array.tabulate[Byte](512)(i => ((11 * i + 3) % 32).toByte)
    val bytes = Gguf.writeTensors(Nil,
      Seq(("q5k.weight", Vector(256L, 2L), Gguf.Q5K(d, dmin, sc, mn, q))))
    val fix = fixture("gguf_q5k.gguf")
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(bytes, bytes.length - 352, bytes.length),
      java.util.Arrays.copyOfRange(fix, fix.length - 352, fix.length)))
    val vs = Gguf.read(bytes).floats("q5k.weight")
    (0 until 512).foreach { i =>
      val dd = if (i < 256) 0.25f else -0.125f
      val dm = if (i < 256) 0.5f else 1.5f
      assert(vs(i) == dd * sc(i / 32) * q(i) - dm * mn(i / 32), s"element $i")
    }
    intercept[IllegalArgumentException] { // 5-bit range enforced
      Gguf.writeTensors(Nil, Seq(("w", Vector(256L), Gguf.Q5K(
        Array[Short](0x3400), Array[Short](0x3800),
        Array.fill[Byte](8)(1), Array.fill[Byte](8)(0),
        Array.fill[Byte](256)(32)))))
    }
  }

  test("Q6_K python-transcription fixture dequantizes exactly (d*sc*(q-32), ql/qh pack)") {
    val exp = Json.parse(new String(fixture("gguf_expected.json"), US_ASCII))
      .asInstanceOf[JObj].fields.toMap
    val m = Gguf.read(fixture("gguf_q6k.gguf"))
    val t = m.tensors.find(_.name == "q6k.weight").get
    assert(t.ggmlType == 14 && t.dims == Vector(256L, 2L) && t.byteSize == 420)
    val want = exp("q6k_vals").asInstanceOf[JArr].items.map {
      case JFloat(d) => d.toFloat
      case JInt(i) => i.toFloat
      case other => fail(s"$other")
    }
    assert(m.floats("q6k.weight").toSeq == want)
  }

  test("Q4_K writer is byte-identical to the python packing and round trips") {
    val d = Array[Short](0x3400, 0xb000.toShort) // 0.25, -0.125
    val dmin = Array[Short](0x3e00, 0x3800) // 1.5, 0.5
    val sc = Array.tabulate[Byte](16)(j => ((11 * j + 3) % 64).toByte)
    val mn = Array.tabulate[Byte](16)(j => ((7 * j + 5) % 64).toByte)
    val q = Array.tabulate[Byte](512)(i => ((3 * i + 1) % 16).toByte)
    val bytes = Gguf.writeTensors(Nil,
      Seq(("q4k.weight", Vector(256L, 2L), Gguf.Q4K(d, dmin, sc, mn, q))))
    val fix = fixture("gguf_q4k.gguf")
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(bytes, bytes.length - 288, bytes.length),
      java.util.Arrays.copyOfRange(fix, fix.length - 288, fix.length)))
    val vs = Gguf.read(bytes).floats("q4k.weight")
    (0 until 512).foreach { i =>
      val dd = if (i < 256) 0.25f else -0.125f
      val dm = if (i < 256) 1.5f else 0.5f
      assert(vs(i) == dd * sc(i / 32) * q(i) - dm * mn(i / 32), s"element $i")
    }
    intercept[IllegalArgumentException] { // 6-bit range enforced
      Gguf.writeTensors(Nil, Seq(("w", Vector(256L), Gguf.Q4K(
        Array[Short](0x3400), Array[Short](0x3800),
        Array.fill[Byte](8)(64), Array.fill[Byte](8)(0),
        Array.fill[Byte](256)(0)))))
    }
  }

  test("Q6_K writer is byte-identical to the python packing and round trips") {
    val d = Array[Short](0x3400, 0xb800.toShort) // 0.25, -0.5
    val sc = Array.tabulate[Byte](32)(j => (((5 * j + 2) % 256) - 128).toByte)
    val code = Array.tabulate[Byte](512)(i => ((7 * i + 4) % 64).toByte)
    val bytes = Gguf.writeTensors(Nil,
      Seq(("q6k.weight", Vector(256L, 2L), Gguf.Q6K(d, sc, code))))
    val fix = fixture("gguf_q6k.gguf")
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(bytes, bytes.length - 420, bytes.length),
      java.util.Arrays.copyOfRange(fix, fix.length - 420, fix.length)))
    val vs = Gguf.read(bytes).floats("q6k.weight")
    (0 until 512).foreach { i =>
      val dd = if (i < 256) 0.25f else -0.5f
      assert(vs(i) == dd * sc(i / 16) * (code(i) - 32), s"element $i")
    }
    intercept[IllegalArgumentException] { // 6-bit code range enforced
      Gguf.writeTensors(Nil, Seq(("w", Vector(256L), Gguf.Q6K(
        Array[Short](0x3400), Array.fill[Byte](16)(1),
        Array.fill[Byte](256)(64)))))
    }
    intercept[IllegalArgumentException] { // 256-alignment of rows enforced
      Gguf.writeTensors(Nil, Seq(("w", Vector(128L), Gguf.Q6K(
        Array[Short](0x3400), Array.fill[Byte](8)(1),
        Array.fill[Byte](128)(0)))))
    }
  }

  test("Q8_0 python-transcription fixture dequantizes exactly (d*q, f16 scale)") {
    val exp = Json.parse(new String(fixture("gguf_expected.json"), US_ASCII))
      .asInstanceOf[JObj].fields.toMap
    val m = Gguf.read(fixture("gguf_q8.gguf"))
    val t = m.tensors.find(_.name == "q8.weight").get
    assert(t.ggmlType == 8 && t.dims == Vector(32L, 2L) && t.byteSize == 68)
    val want = exp("q8_vals").asInstanceOf[JArr].items.map {
      case JFloat(d) => d.toFloat
      case JInt(i) => i.toFloat
      case other => fail(s"$other")
    }
    assert(m.floats("q8.weight").toSeq == want)
  }

  test("Q4_0 python-transcription fixture dequantizes exactly (d*(q-8), nibble pack)") {
    val exp = Json.parse(new String(fixture("gguf_expected.json"), US_ASCII))
      .asInstanceOf[JObj].fields.toMap
    val m = Gguf.read(fixture("gguf_q4.gguf"))
    val t = m.tensors.find(_.name == "q4.weight").get
    assert(t.ggmlType == 2 && t.dims == Vector(32L, 2L) && t.byteSize == 36)
    val want = exp("q4_vals").asInstanceOf[JArr].items.map {
      case JFloat(d) => d.toFloat
      case JInt(i) => i.toFloat
      case other => fail(s"$other")
    }
    assert(m.floats("q4.weight").toSeq == want)
  }

  test("Q4_0 writer round trip: unpacked quants in, nibble-packed bytes out") {
    val scales = Array[Short](0x3400, 0xb800.toShort) // 0.25, -0.5
    val quants = Array.tabulate[Byte](64)(i => ((5 * i + 2) % 16).toByte)
    val bytes = Gguf.writeTensors(Nil,
      Seq(("w", Vector(32L, 2L), Gguf.Q4(scales, quants))))
    val m = Gguf.read(bytes)
    val vs = m.floats("w")
    (0 until 64).foreach { i =>
      val d = if (i < 32) 0.25f else -0.5f
      assert(vs(i) == d * (quants(i) - 8), s"element $i")
    }
    // byte-identical to the python transcription's payload
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(bytes, bytes.length - 36, bytes.length),
      java.util.Arrays.copyOfRange(fixture("gguf_q4.gguf"),
        fixture("gguf_q4.gguf").length - 36, fixture("gguf_q4.gguf").length)))
    // out-of-range quants refuse in the writer
    intercept[IllegalArgumentException] {
      Gguf.writeTensors(Nil, Seq(("w", Vector(32L, 2L),
        Gguf.Q4(scales, Array.fill[Byte](64)(16)))))
    }
  }

  test("Q8_0 writer round trip with raw f16 scale bits, rows%32 enforced") {
    val scales = Array[Short](0x3800, 0xb400.toShort) // 0.5, -0.25
    val quants = Array.tabulate[Byte](64)(i => (((7 * i + 3) % 255) - 127).toByte)
    val bytes = Gguf.writeTensors(Nil,
      Seq(("w", Vector(32L, 2L), Gguf.Q8(scales, quants))))
    val m = Gguf.read(bytes)
    val vs = m.floats("w")
    (0 until 64).foreach { i =>
      val d = if (i < 32) 0.5f else -0.25f
      assert(vs(i) == d * quants(i), s"element $i")
    }
    // a row length that is not a multiple of 32 refuses in writer and reader
    intercept[IllegalArgumentException] {
      Gguf.writeTensors(Nil, Seq(("w", Vector(16L, 4L), Gguf.Q8(scales, quants))))
    }
    // reader side: flip the declared dims of a valid file to (16, 4)
    val mut = bytes.clone()
    // find the dims in the tensor directory: name "w" then u32 ndims, u64s
    val idx = {
      var i = 1
      var at = -1
      while (i < mut.length - 1 && at < 0) {
        if (mut(i) == 'w'.toByte && mut(i + 1) == 2 && mut(i - 1) == 0) at = i
        i += 1
      }
      at
    }
    assert(idx > 0)
    mut(idx + 5) = 16 // dim0: 32 -> 16
    mut(idx + 13) = 4 // dim1: 2 -> 4
    assert(Gguf.readSafe(mut) == Left("bad_frame"))
  }

  test("round trip through our writer: metadata + F32 + F16 tensors") {
    val f = Array(1.0f, 2.5f, -3.25f, 1e-7f, 0f, 42f)
    val h = Array[Short](0x3c00.toShort, 0xbc00.toShort, 0x4000.toShort, 0)
    val bytes = Gguf.write(
      Seq("general.name" -> Gguf.MString("rt"),
        "ids" -> Gguf.MArray(Vector(Gguf.MInt(7), Gguf.MInt(8)))),
      Seq(("a", Vector(2L, 3L), Left(f)), ("b", Vector(4L), Right(h))))
    assert(java.util.Arrays.equals(bytes, Gguf.write(
      Seq("general.name" -> Gguf.MString("rt"),
        "ids" -> Gguf.MArray(Vector(Gguf.MInt(7), Gguf.MInt(8)))),
      Seq(("a", Vector(2L, 3L), Left(f)), ("b", Vector(4L), Right(h))))))
    val m = Gguf.read(bytes)
    assert(m.meta("general.name").contains(Gguf.MString("rt")))
    assert(m.meta("ids").get == Gguf.MArray(Vector(Gguf.MInt(7), Gguf.MInt(8))))
    assert(m.floats("a").toSeq == f.toSeq)
    assert(m.floats("b").toSeq == h.toSeq.map(Safetensors.halfToFloat))
  }

  test("a caller-supplied general.alignment KV is refused, not duplicated") {
    // the writer owns that key; a second copy would be malformed GGUF
    intercept[IllegalArgumentException] {
      Gguf.write(Seq("general.alignment" -> Gguf.MInt(64)),
        Seq(("t", Vector(2L), Left(Array(1f, 2f)))))
    }
  }

  test("refusals are typed: magic, version, lying offsets, bombs, mutations, cuts") {
    assert(Gguf.readSafe("notgguf".getBytes(US_ASCII)) == Left("bad_magic"))
    val good = Gguf.write(Seq("k" -> Gguf.MString("v")),
      Seq(("t", Vector(8L), Left(Array.fill(8)(1.0f)))))
    // version flip
    val v2 = good.clone(); v2(4) = 2
    assert(Gguf.readSafe(v2) == Left("unsupported"))
    // budget bomb: huge declared dims refuse before allocation
    val old = graft.core.Budget.maxInflatedBytes
    graft.core.Budget.maxInflatedBytes = 16
    try assert(Gguf.readSafe(good) == Left("too_large"))
    finally graft.core.Budget.maxInflatedBytes = old
    val kinds = Set("bad_magic", "bad_frame", "truncated", "too_large", "unsupported")
    for (pos <- good.indices; x <- Seq(0x01, 0x5a, 0x80, 0xff)) {
      val m = good.clone(); m(pos) = (m(pos) ^ x).toByte
      Gguf.readSafe(m) match {
        case Left(k) => assert(kinds.contains(k), s"pos=$pos x=$x kind=$k")
        case Right(_) => ()
      }
    }
    for (n <- 0 until good.length)
      assert(Gguf.readSafe(java.util.Arrays.copyOf(good, n)).isLeft, s"cut $n")
  }
}
