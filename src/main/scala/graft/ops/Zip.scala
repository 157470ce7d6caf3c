package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

/** ZIP shard container (PKWARE APPNOTE / RFC 1951 deflate via the JDK):
  * the third shard format a training pipeline meets (gzip members →
  * WARC, USTAR → WebDataset, ZIP → document dumps / office containers).
  * Deterministic writer (fixed timestamps, stable order) + strict reader
  * with the family's typed fail-stop refusal contract.
  */
object Zip {

  final case class ZipMember(name: String, body: Array[Byte])

  /** Deterministic archive: fixed DOS epoch time so identical inputs
    * yield identical bytes (reproducible shards).
    */
  def write(members: Seq[ZipMember]): Array[Byte] = {
    val out = new ByteArrayOutputStream(members.map(_.body.length + 64).sum)
    val z = new ZipOutputStream(out)
    members.foreach { m =>
      val e = new ZipEntry(m.name)
      e.setTime(315532800000L) // 1980-01-01, the DOS-time floor
      z.putNextEntry(e)
      z.write(m.body)
      z.closeEntry()
    }
    z.close()
    out.toByteArray
  }

  /** Strict sequential read (the streaming shape: central directory is
    * ignored, entries stream in file order like a 100 TB scan would).
    */
  def read(bytes: Array[Byte]): Seq[ZipMember] = {
    val z = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Seq.newBuilder[ZipMember]
    val streamedNames = Seq.newBuilder[String]
    try {
      var e = z.getNextEntry
      while (e != null) {
        streamedNames += e.getName
        if (!e.isDirectory) out += ZipMember(e.getName, readCapped(z, e.getName))
        z.closeEntry()
        e = z.getNextEntry
      }
    } catch {
      case ex: java.util.zip.ZipException =>
        throw new Warc.WarcError("bad_zip", ex.getMessage)
      case _: java.io.EOFException =>
        throw new Warc.WarcError("truncated", "zip stream ends early")
    } finally z.close()
    // ZipInputStream treats a corrupted local-header magic as clean EOF
    // (getNextEntry -> null), silently TRUNCATING the member list, and a
    // streaming walk only ever sees LOCAL names while every central-
    // directory reader (zipfile/numpy) resolves members by CENTRAL names
    // — two readers of one corrupt archive would disagree on the member
    // list (round-15 numpy-parity find). Cross-check both against the
    // central directory before trusting the stream.
    val local = streamedNames.result()
    val central = centralNames(bytes)
    if (local != central)
      throw new Warc.WarcError("bad_zip",
        s"streamed ${local.length} entries ${local.take(4).mkString(",")}… " +
          s"disagree with the central directory's ${central.length}")
    out.result()
  }

  /** entry names from the central directory, in record order; a zip with
    * no (or a lying) EOCD/central layout is malformed
    */
  private def centralNames(bytes: Array[Byte]): Seq[String] = {
    def fail(msg: String): Nothing = throw new Warc.WarcError("bad_zip", msg)
    def u16(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    def u32(p: Int): Long = (u16(p).toLong) | (u16(p + 2).toLong << 16)
    // locate EOCD (PK\05\06) scanning back through the <=64 KiB comment
    val min = math.max(0, bytes.length - 22 - 0xffff)
    var p = bytes.length - 22
    var eocd = -1
    while (p >= min && eocd < 0) {
      if (bytes(p) == 'P' && bytes(p + 1) == 'K' &&
          bytes(p + 2) == 0x05 && bytes(p + 3) == 0x06 &&
          p + 22 + u16(p + 20) == bytes.length) eocd = p
      p -= 1
    }
    if (eocd < 0) fail("no end-of-central-directory record")
    val n = u16(eocd + 10)
    var off = u32(eocd + 16)
    if (off < 0 || off > eocd) fail("central directory offset out of range")
    val names = Seq.newBuilder[String]
    var i = 0
    var q = off.toInt
    while (i < n) {
      if (q + 46 > eocd) fail("central record past EOCD")
      if (!(bytes(q) == 'P' && bytes(q + 1) == 'K' &&
          bytes(q + 2) == 0x01 && bytes(q + 3) == 0x02))
        fail(s"bad central record magic at $q")
      val nameLen = u16(q + 28)
      val extraLen = u16(q + 30)
      val commentLen = u16(q + 32)
      if (q + 46 + nameLen > eocd) fail("central name past EOCD")
      names += new String(bytes, q + 46, nameLen,
        java.nio.charset.StandardCharsets.UTF_8)
      q += 46 + nameLen + extraLen + commentLen
      i += 1
    }
    names.result()
  }

  /** total entry count from the EOCD record (PK\05\06, scanned backwards
    * through the ≤64 KiB comment tail); a zip with no EOCD is malformed
    */
  private def eocdEntries(bytes: Array[Byte]): Int = {
    val min = math.max(0, bytes.length - 22 - 0xffff)
    var p = bytes.length - 22
    while (p >= min) {
      if (bytes(p) == 'P' && bytes(p + 1) == 'K' &&
          bytes(p + 2) == 0x05 && bytes(p + 3) == 0x06) {
        // comment length must agree with the remaining bytes, else this
        // is a PK\05\06 inside data, not the record
        val clen = (bytes(p + 20) & 0xff) | ((bytes(p + 21) & 0xff) << 8)
        if (p + 22 + clen == bytes.length)
          return (bytes(p + 10) & 0xff) | ((bytes(p + 11) & 0xff) << 8)
      }
      p -= 1
    }
    throw new Warc.WarcError("bad_zip", "no end-of-central-directory record")
  }

  /** Entry bytes with the zip-bomb guard: a tiny DEFLATE entry can
    * legally inflate ~1032x, so the read is capped by
    * [[graft.core.Budget.maxInflatedBytes]] (round 12) — the declared
    * uncompressed size in the local header is attacker-controlled and
    * can't be trusted as the bound.
    */
  private def readCapped(z: ZipInputStream, name: String): Array[Byte] = {
    val cap = graft.core.Budget.maxInflatedBytes
    val out = new ByteArrayOutputStream(4096)
    val buf = new Array[Byte](8192)
    var n = z.read(buf)
    while (n > 0) {
      out.write(buf, 0, n)
      if (out.size().toLong > cap)
        throw new Warc.WarcError("too_large",
          s"zip entry '$name' inflates past $cap bytes")
      n = z.read(buf)
    }
    out.toByteArray
  }

  /** Fail-stop safe read: `Right(members)` or `Left(errorKind)`. */
  def readSafe(bytes: Array[Byte]): Either[String, Seq[ZipMember]] =
    try Right(read(bytes))
    catch {
      case e: Warc.WarcError => Left(e.kind)
      case _: Exception => Left("bad_zip")
    }
}
