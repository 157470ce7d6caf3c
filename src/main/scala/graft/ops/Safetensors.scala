package graft.ops

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

import graft.etl.{JArr, JInt, JObj, JStr, JVal, Json}

/** safetensors codec — the tensor-shipping container of the modern model
  * ecosystem (weights, embedding dumps, tokenized batches): a u64
  * little-endian header length, a JSON header mapping tensor names to
  * `{dtype, shape, data_offsets}` (offsets into the byte buffer that
  * follows, relative to its start), then the raw little-endian buffer.
  * Written against the PUBLIC format description only; the JSON layer
  * reuses [[graft.etl.Json]], and the writer emits the canonical form
  * (tensors at ascending offsets, metadata first) so round trips are
  * byte-stable. Supported dtypes: F32, F64, I32, I64 (everything else
  * refuses `unsupported_dtype` rather than misreading).
  *
  * Typed refusals: `bad_header` (length prefix past the budget or the
  * file, non-JSON header, malformed entry), `unsupported_dtype`,
  * `bad_offsets` (overlap/gap/misalignment with the declared shape, or
  * offsets past the buffer), `truncated`. Header length and total
  * element counts are capped by [[graft.core.Budget.maxInflatedBytes]]
  * BEFORE any allocation.
  *
  * Scale shape: one shard = one file built/parsed inside a per-group
  * map — the container-family contract.
  */
object Safetensors {

  final case class Tensor(dtype: String, shape: Vector[Long], data: Array[Byte]) {
    def elems: Long = shape.product
    private def le: ByteBuffer = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    def floats: Array[Float] = {
      require(dtype == "F32", s"not F32: $dtype")
      val out = new Array[Float](elems.toInt); le.asFloatBuffer.get(out); out
    }
    def doubles: Array[Double] = {
      require(dtype == "F64", s"not F64: $dtype")
      val out = new Array[Double](elems.toInt); le.asDoubleBuffer.get(out); out
    }
    def longs: Array[Long] = {
      require(dtype == "I64", s"not I64: $dtype")
      val out = new Array[Long](elems.toInt); le.asLongBuffer.get(out); out
    }
    def ints: Array[Int] = {
      require(dtype == "I32", s"not I32: $dtype")
      val out = new Array[Int](elems.toInt); le.asIntBuffer.get(out); out
    }
  }

  private val Widths: Map[String, Int] =
    Map("F32" -> 4, "F64" -> 8, "I32" -> 4, "I64" -> 8)

  final class StError(val kind: String, msg: String)
      extends RuntimeException(s"$kind: $msg")
  private def fail(kind: String, msg: String): Nothing =
    throw new StError(kind, msg)

  // ------------------------------------------------------------- write --

  def floatTensor(shape: Seq[Long], v: Array[Float]): Tensor = {
    val b = ByteBuffer.allocate(v.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    b.asFloatBuffer.put(v); Tensor("F32", shape.toVector, b.array())
  }
  def longTensor(v: Array[Long]): Tensor = {
    val b = ByteBuffer.allocate(v.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    b.asLongBuffer.put(v); Tensor("I64", Vector(v.length.toLong), b.array())
  }

  /** Canonical serialization: tensors laid out in the given order at
    * ascending offsets, `__metadata__` first when present.
    */
  def write(tensors: Seq[(String, Tensor)],
      metadata: Seq[(String, String)] = Nil): Array[Byte] = {
    tensors.foreach { case (n, t) =>
      val w = Widths.getOrElse(t.dtype,
        throw new IllegalArgumentException(s"unwritable dtype ${t.dtype}"))
      require(t.shape.product * w == t.data.length,
        s"$n: shape ${t.shape} x $w != ${t.data.length}")
    }
    val entries = Vector.newBuilder[(String, JVal)]
    if (metadata.nonEmpty)
      entries += (("__metadata__",
        JObj(metadata.toVector.map { case (k, v) => k -> JStr(v) })))
    var off = 0L
    tensors.foreach { case (n, t) =>
      entries += ((n, JObj(Vector(
        "dtype" -> JStr(t.dtype),
        "shape" -> JArr(t.shape.map(x => JInt(BigInt(x))).toVector),
        "data_offsets" -> JArr(Vector(JInt(BigInt(off)),
          JInt(BigInt(off + t.data.length))))))))
      off += t.data.length
    }
    val header = render(JObj(entries.result())).getBytes(UTF_8)
    val out = ByteBuffer.allocate(8 + header.length + off.toInt)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putLong(header.length.toLong)
    out.put(header)
    tensors.foreach { case (_, t) => out.put(t.data) }
    out.array()
  }

  /** minimal JSON rendering (the reused parser's inverse for the subset
    * the header needs: objects, arrays, strings, integers)
    */
  private def render(v: JVal): String = v match {
    case JObj(fields) =>
      fields.map { case (k, x) => s"${graft.etl.Json.quote(k)}:${render(x)}" }
        .mkString("{", ",", "}")
    case JArr(items) => items.map(render).mkString("[", ",", "]")
    case JStr(s)     => graft.etl.Json.quote(s)
    case JInt(i)     => i.toString
    case other       => throw new IllegalArgumentException(s"unrenderable $other")
  }

  // -------------------------------------------------------------- read --

  def read(bytes: Array[Byte]): (Vector[(String, Tensor)], Map[String, String]) = {
    if (bytes.length < 8) fail("truncated", s"${bytes.length} bytes")
    val hlen = ByteBuffer.wrap(bytes, 0, 8).order(ByteOrder.LITTLE_ENDIAN).getLong
    if (hlen < 2 || hlen > graft.core.Budget.maxInflatedBytes)
      fail("bad_header", s"header length $hlen")
    if (8 + hlen > bytes.length) fail("truncated", s"header $hlen past ${bytes.length}")
    val header =
      try Json.parse(new String(bytes, 8, hlen.toInt, UTF_8))
      catch { case _: Exception => fail("bad_header", "unparseable JSON") }
    val fields = header match {
      case JObj(fs) => fs
      case _        => fail("bad_header", "header not an object")
    }
    val bufStart = 8 + hlen.toInt
    val bufLen = bytes.length - bufStart
    var metadata = Map.empty[String, String]
    val tensors = Vector.newBuilder[(String, Tensor)]
    var covered = 0L
    fields.foreach {
      case ("__metadata__", JObj(ms)) =>
        metadata = ms.collect { case (k, JStr(s)) => k -> s }.toMap
      case ("__metadata__", _) => fail("bad_header", "__metadata__ not an object")
      case (name, JObj(entry)) =>
        val m = entry.toMap
        val dtype = m.get("dtype") match {
          case Some(JStr(s)) => s
          case _             => fail("bad_header", s"$name: no dtype")
        }
        val width = Widths.getOrElse(dtype, fail("unsupported_dtype", s"$name: $dtype"))
        val shape = m.get("shape") match {
          case Some(JArr(dims)) => dims.map {
            case JInt(i) if i >= 0 => i.toLong
            case other             => fail("bad_header", s"$name: shape $other")
          }.toVector
          case _ => fail("bad_header", s"$name: no shape")
        }
        val elems =
          try shape.foldLeft(1L)(Math.multiplyExact)
          catch { case _: ArithmeticException => fail("bad_header", s"$name: shape overflow") }
        val need =
          try Math.multiplyExact(elems, width.toLong)
          catch { case _: ArithmeticException => fail("bad_header", s"$name: size overflow") }
        if (need > graft.core.Budget.maxInflatedBytes)
          fail("bad_header", s"$name: $elems elements past budget")
        val (a, b) = m.get("data_offsets") match {
          case Some(JArr(Vector(JInt(x), JInt(y))))
              if x >= 0 && y >= x && x.isValidLong && y.isValidLong =>
            (x.toLong, y.toLong)
          case _ => fail("bad_header", s"$name: bad data_offsets")
        }
        if (b - a != need) fail("bad_offsets", s"$name: ${b - a} != $elems x $width")
        if (b > bufLen) fail("truncated", s"$name: offset $b past buffer $bufLen")
        tensors += ((name,
          Tensor(dtype, shape,
            java.util.Arrays.copyOfRange(bytes, bufStart + a.toInt, bufStart + b.toInt))))
        covered += b - a
      case (name, _) => fail("bad_header", s"$name: entry not an object")
    }
    // the spec requires the buffer exactly covered, no overlaps/gaps
    if (covered != bufLen) fail("bad_offsets", s"buffer $bufLen, covered $covered")
    (tensors.result(), metadata)
  }

  def readSafe(bytes: Array[Byte])
      : Either[String, (Vector[(String, Tensor)], Map[String, String])] =
    try Right(read(bytes))
    catch {
      case e: StError   => Left(e.kind)
      case _: Exception => Left("bad_header")
    }
}
