package graft.ops

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

/** USTAR tar archives (POSIX.1-1988, public layout) — the container behind
  * WebDataset training shards: members named `{key}.{ext}`, consecutive
  * members sharing a key form one training sample, shards stream
  * sequentially so a 1000-executor job maps shards to partitions and
  * reads each exactly once, in order, with no seeks.
  *
  * Pure JVM writer + strict reader (checksum-verified headers, typed
  * refusals `bad_checksum` / `truncated` / `bad_octal` — the WARC/media
  * fail-stop contract). The reference has no container ingestion; this is
  * north-star extension surface.
  */
object Tar {

  final case class TarEntry(name: String, body: Array[Byte])

  final class TarError(val kind: String, msg: String) extends Exception(msg)
  private def fail(kind: String, msg: String): Nothing = throw new TarError(kind, msg)

  private val BlockSize = 512

  // ------------------------------------------------------------------
  // writer
  // ------------------------------------------------------------------

  /** Serialize entries as a USTAR archive (deterministic: fixed mode/
    * uid/gid/mtime) terminated by two zero blocks.
    */
  def write(entries: Seq[TarEntry]): Array[Byte] = {
    val out = new ByteArrayOutputStream(entries.map(_.body.length + 2 * BlockSize).sum)
    entries.foreach { e =>
      out.write(header(e.name, e.body.length))
      out.write(e.body)
      val pad = (BlockSize - e.body.length % BlockSize) % BlockSize
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](2 * BlockSize))
    out.toByteArray
  }

  private def header(name: String, size: Int): Array[Byte] = {
    require(name.getBytes(US_ASCII).length <= 100, s"name too long: $name")
    val h = new Array[Byte](BlockSize)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes(US_ASCII); System.arraycopy(b, 0, h, off, b.length)
    }
    def putOctal(off: Int, width: Int, v: Long): Unit =
      put(off, ("%0" + (width - 1) + "o").format(v)) // NUL-terminated by the zero fill
    put(0, name)
    putOctal(100, 8, 420 /* 0644 */)
    putOctal(108, 8, 0); putOctal(116, 8, 0)
    putOctal(124, 12, size.toLong)
    putOctal(136, 12, 0L) // fixed mtime: deterministic archives
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum field as spaces
    h(156) = '0' // regular file
    put(257, "ustar"); h(262) = 0; put(263, "00")
    var sum = 0L; var i = 0
    while (i < BlockSize) { sum += h(i) & 0xff; i += 1 }
    put(148, "%06o".format(sum)); h(154) = 0; h(155) = ' '
    h
  }

  // ------------------------------------------------------------------
  // reader
  // ------------------------------------------------------------------

  /** Parse a tar byte string. Strict: header checksums verified, octal
    * fields validated, truncation refused; stops at the first zero block.
    */
  def read(bytes: Array[Byte]): Seq[TarEntry] = {
    val entries = Seq.newBuilder[TarEntry]
    var off = 0
    var done = false
    while (!done) {
      if (off + BlockSize > bytes.length) fail("truncated", s"header block at $off")
      if (isZeroBlock(bytes, off)) done = true
      else {
        var stored = 0L; var computed = 0L
        var i = 0
        while (i < BlockSize) {
          val b = bytes(off + i) & 0xff
          computed += (if (i >= 148 && i < 156) ' '.toInt else b)
          i += 1
        }
        stored = octal(bytes, off + 148, 8)
        if (stored != computed)
          fail("bad_checksum", s"header checksum at $off: stored $stored != $computed")
        val name = cstr(bytes, off, 100)
        val size = octal(bytes, off + 124, 12)
        if (size < 0 || size > Int.MaxValue) fail("bad_octal", s"size $size at $off")
        val dataEnd = off + BlockSize + size.toInt
        if (dataEnd > bytes.length) fail("truncated", s"member '$name' data overruns file")
        val typeflag = bytes(off + 156)
        if (typeflag == '0' || typeflag == 0)
          entries += TarEntry(name,
            java.util.Arrays.copyOfRange(bytes, off + BlockSize, dataEnd))
        // directories/links carry no sample data: skipped, not refused
        val pad = (BlockSize - size.toInt % BlockSize) % BlockSize
        off = dataEnd + pad
      }
    }
    entries.result()
  }

  /** Fail-stop safe read: `Right(entries)` or `Left(errorKind)`. */
  def readSafe(bytes: Array[Byte]): Either[String, Seq[TarEntry]] =
    try Right(read(bytes))
    catch {
      case e: TarError => Left(e.kind)
      case _: Exception => Left("bad_header")
    }

  private def isZeroBlock(b: Array[Byte], off: Int): Boolean = {
    var i = 0
    while (i < BlockSize) { if (b(off + i) != 0) return false; i += 1 }
    true
  }

  private def cstr(b: Array[Byte], off: Int, max: Int): String = {
    var n = 0
    while (n < max && b(off + n) != 0) n += 1
    new String(b, off, n, US_ASCII)
  }

  private def octal(b: Array[Byte], off: Int, width: Int): Long = {
    var v = 0L; var i = 0; var seen = false
    while (i < width) {
      val c = b(off + i)
      if (c >= '0' && c <= '7') { v = v * 8 + (c - '0'); seen = true }
      else if (c == 0 || c == ' '.toByte) { /* terminator/pad */ }
      else fail("bad_octal", s"non-octal byte $c in field at ${off + i}")
      i += 1
    }
    if (!seen) fail("bad_octal", s"empty octal field at $off")
    v
  }

  // ------------------------------------------------------------------
  // WebDataset convention
  // ------------------------------------------------------------------

  /** Group a shard's entries into WebDataset samples: members sharing a
    * basename stem (`name` up to the first '.') form one sample, keyed by
    * stem, as (extension → body). Order inside the shard is preserved in
    * the returned sequence (first appearance of each stem).
    */
  def samples(entries: Seq[TarEntry]): Seq[(String, Map[String, Array[Byte]])] = {
    val order = scala.collection.mutable.LinkedHashMap
      .empty[String, Map[String, Array[Byte]]]
    entries.foreach { e =>
      val dot = e.name.indexOf('.')
      val (stem, ext) =
        if (dot < 0) (e.name, "") else (e.name.substring(0, dot), e.name.substring(dot + 1))
      order.updateWith(stem) {
        case Some(m) => Some(m + (ext -> e.body))
        case None => Some(Map(ext -> e.body))
      }
    }
    order.toSeq
  }
}
