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
    try {
      var e = z.getNextEntry
      while (e != null) {
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
    out.result()
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
