package graft.ops

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** NumPy `.npy` array container (format spec 1.0 — the layout
  * `numpy.lib.format` documents and `np.save` emits) plus the `.npz`
  * multi-array wrapper (a ZIP of `.npy` members, via [[Zip]]).
  *
  * `.npy`/`.npz` is how embedding dumps, tokenized corpora, and label
  * matrices actually move between a Spark curation job and a training
  * stack, so the engine reads and writes it natively: magic
  * `\x93NUMPY`, version 1.0, a little-endian u16 header length, an
  * ASCII python-dict header (`descr`/`fortran_order`/`shape`) padded
  * with spaces so the data section starts 64-byte aligned, then the raw
  * C-order buffer. The writer reproduces `np.save`'s header formatting
  * BYTE-FOR-BYTE (NpySpec pins our bytes against real `np.save` output
  * and our reader against `np.savez` fixtures, tools/make_npy_fixture.py).
  *
  * Scale shape: one shard = one in-memory byte array built/parsed inside
  * a `flatMap` over shard groups — per-file parallelism, no shuffle, the
  * tar01/avro01 contract. [[readSafe]] refuses rot with typed kinds
  * (`bad_magic`, `bad_version`, `bad_header`, `unsupported_dtype`,
  * `fortran_order`, `size_mismatch`) so one rotten shard is one error
  * row, never a dead scan; element counts are capped by
  * [[graft.core.Budget.maxInflatedBytes]] before any allocation.
  */
object Npy {

  private val Magic: Array[Byte] =
    Array(0x93.toByte, 'N', 'U', 'M', 'P', 'Y')

  /** element width of the supported descrs */
  private val Widths: Map[String, Int] =
    Map("<f4" -> 4, "<f8" -> 8, "<i4" -> 4, "<i8" -> 8)

  /** A parsed array: dtype descr, shape, and the raw C-order buffer
    * (little-endian, `shape.product * width` bytes).
    */
  final case class NpyArray(descr: String, shape: Vector[Long], data: Array[Byte]) {
    def elems: Long = shape.product
    private def le: ByteBuffer = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    def floats: Array[Float] = {
      require(descr == "<f4", s"not <f4: $descr")
      val out = new Array[Float](elems.toInt); le.asFloatBuffer.get(out); out
    }
    def doubles: Array[Double] = {
      require(descr == "<f8", s"not <f8: $descr")
      val out = new Array[Double](elems.toInt); le.asDoubleBuffer.get(out); out
    }
    def longs: Array[Long] = {
      require(descr == "<i8", s"not <i8: $descr")
      val out = new Array[Long](elems.toInt); le.asLongBuffer.get(out); out
    }
    def ints: Array[Int] = {
      require(descr == "<i4", s"not <i4: $descr")
      val out = new Array[Int](elems.toInt); le.asIntBuffer.get(out); out
    }
  }

  /** np.save's tuple repr: `()`, `(5,)`, `(3, 5)`. */
  private def shapeRepr(shape: Seq[Long]): String = shape match {
    case Seq()  => "()"
    case Seq(n) => s"($n,)"
    case many   => many.mkString("(", ", ", ")")
  }

  /** Serialize one array. `data` must be the C-order little-endian
    * buffer of exactly `shape.product * width(descr)` bytes.
    */
  def write(descr: String, shape: Seq[Long], data: Array[Byte]): Array[Byte] = {
    val width = Widths.getOrElse(descr,
      throw new IllegalArgumentException(s"unsupported dtype $descr"))
    require(shape.product * width == data.length,
      s"shape ${shapeRepr(shape)} x $width != ${data.length} bytes")
    // np.save header: dict body + '\n' terminator, space-padded so that
    // (magic 6 + version 2 + hlen 2 + header) % 64 == 0.
    val dict = s"{'descr': '$descr', 'fortran_order': False, " +
      s"'shape': ${shapeRepr(shape)}, }"
    val unpadded = 6 + 2 + 2 + dict.length + 1
    val pad = (64 - unpadded % 64) % 64
    val header = dict + (" " * pad) + "\n"
    val out = ByteBuffer.allocate(10 + header.length + data.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(Magic).put(1.toByte).put(0.toByte)
      .putShort(header.length.toShort)
      .put(header.getBytes(US_ASCII)).put(data)
    out.array()
  }

  def writeFloats(shape: Seq[Long], v: Array[Float]): Array[Byte] = {
    val b = ByteBuffer.allocate(v.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    b.asFloatBuffer.put(v); write("<f4", shape, b.array())
  }

  def writeLongs(v: Array[Long]): Array[Byte] = {
    val b = ByteBuffer.allocate(v.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    b.asLongBuffer.put(v); write("<i8", Seq(v.length.toLong), b.array())
  }

  /** Strict parse — throws on any malformation ([[readSafe]] is the
    * scan-facing twin).
    */
  def read(bytes: Array[Byte]): NpyArray = readSafe(bytes) match {
    case Right(a)   => a
    case Left(kind) => throw new IllegalArgumentException(s"npy: $kind")
  }

  /** `'key': value` extraction from the header dict without a python
    * parser: the three keys np.save writes, in any order.
    */
  private def dictField(dict: String, key: String): Option[String] = {
    val k = s"'$key':"
    val i = dict.indexOf(k)
    if (i < 0) None
    else {
      val rest = dict.substring(i + k.length).dropWhile(_ == ' ')
      // values are either a quoted string, True/False, or a (...) tuple
      if (rest.startsWith("'")) {
        val j = rest.indexOf('\'', 1)
        if (j < 0) None else Some(rest.substring(1, j))
      } else if (rest.startsWith("(")) {
        val j = rest.indexOf(')')
        if (j < 0) None else Some(rest.substring(0, j + 1))
      } else {
        val j = rest.indexWhere(c => c == ',' || c == '}')
        Some(if (j >= 0) rest.substring(0, j).trim else rest.trim)
      }
    }
  }

  def readSafe(bytes: Array[Byte]): Either[String, NpyArray] = {
    if (bytes.length < 10) return Left("bad_magic")
    var i = 0
    while (i < 6) { if (bytes(i) != Magic(i)) return Left("bad_magic"); i += 1 }
    if (bytes(6) != 1 || bytes(7) != 0) return Left("bad_version")
    val hlen = ((bytes(9) & 0xff) << 8) | (bytes(8) & 0xff)
    if (10 + hlen > bytes.length) return Left("bad_header")
    val header = new String(bytes, 10, hlen, US_ASCII)
    if (!header.endsWith("\n") || !header.trim.endsWith("}"))
      return Left("bad_header")
    val descr = dictField(header, "descr").getOrElse(return Left("bad_header"))
    val fortran = dictField(header, "fortran_order").getOrElse(return Left("bad_header"))
    val shapeS = dictField(header, "shape").getOrElse(return Left("bad_header"))
    if (fortran != "False") {
      if (fortran == "True") return Left("fortran_order") else return Left("bad_header")
    }
    val width = Widths.getOrElse(descr, return Left("unsupported_dtype"))
    val dims =
      try {
        val inner = shapeS.stripPrefix("(").stripSuffix(")").trim.stripSuffix(",")
        if (inner.isEmpty) Vector.empty[Long]
        else inner.split(",").map(_.trim.toLong).toVector
      } catch { case _: NumberFormatException => return Left("bad_header") }
    if (dims.exists(_ < 0)) return Left("bad_header")
    // exact product BEFORE any allocation: a hostile header can declare
    // dims whose product wraps Long and sneaks past the byte cap
    val elems =
      try dims.foldLeft(1L)(Math.multiplyExact)
      catch { case _: ArithmeticException => return Left("too_large") }
    val bytesNeeded =
      try Math.multiplyExact(elems, width.toLong)
      catch { case _: ArithmeticException => return Left("too_large") }
    if (bytesNeeded > graft.core.Budget.maxInflatedBytes) return Left("too_large")
    if (bytes.length - 10 - hlen != bytesNeeded) return Left("size_mismatch")
    val data = java.util.Arrays.copyOfRange(bytes, 10 + hlen, bytes.length)
    Right(NpyArray(descr, dims, data))
  }

  // ---- .npz: a ZIP of name.npy members ------------------------------

  /** np.savez layout: each array is a `<name>.npy` member. Our writer
    * reuses [[Zip.write]] (deterministic, stored timestamps).
    */
  def writeNpz(arrays: Seq[(String, Array[Byte])]): Array[Byte] =
    Zip.write(arrays.map { case (n, npy) => Zip.ZipMember(s"$n.npy", npy) })

  def readNpz(bytes: Array[Byte]): Seq[(String, NpyArray)] =
    Zip.read(bytes).map(m => (m.name.stripSuffix(".npy"), read(m.body)))

  /** One typed refusal per rotten container: ZIP-layer kinds pass
    * through; the first bad member poisons the whole shard (the
    * container is one transactional unit, like avro02).
    */
  def readNpzSafe(bytes: Array[Byte]): Either[String, Seq[(String, NpyArray)]] =
    Zip.readSafe(bytes) match {
      case Left(kind) => Left(kind)
      case Right(members) =>
        val out = Vector.newBuilder[(String, NpyArray)]
        members.foreach { m =>
          readSafe(m.body) match {
            case Right(a)   => out += ((m.name.stripSuffix(".npy"), a))
            case Left(kind) => return Left(kind)
          }
        }
        Right(out.result())
    }
}
