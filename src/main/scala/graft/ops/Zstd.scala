package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import com.github.luben.zstd.{ZstdInputStream, ZstdOutputStream}
import net.jpountz.lz4.{LZ4FrameInputStream, LZ4FrameOutputStream}

/** Zstandard / LZ4-frame shard compression (RFC 8878 / the LZ4 frame
  * format): the compression layer modern crawl corpora actually ship —
  * public web-text dumps distribute `.jsonl.zst` shards, and LZ4 frames
  * are the low-CPU alternative for hot intermediate shards. Backed by the
  * zstd-jni / lz4-java libraries Spark itself ships for shuffle/parquet
  * compression, so the codecs here are the exact ones a production
  * cluster already trusts.
  *
  * Contract matches [[Zip]]/[[Warc]]/[[Tar]]: deterministic writer
  * (fixed level, no content-size-dependent framing options), strict
  * capped reader (zstd's max ratio is even steeper than DEFLATE's
  * ~1032:1 — a one-byte-per-128KiB-block RLE frame can demand GiBs, so
  * output is bounded by [[graft.core.Budget.maxInflatedBytes]]
  * mid-stream, BEFORE the frame checksum could ever fail), and typed
  * fail-stop refusals (`bad_magic` / `bad_frame` / `too_large`) the safe
  * scans turn into one error row per rotten shard.
  */
object Zstd {

  /** zstd frame magic, little-endian 0xFD2FB528. */
  private val ZstdMagic = Array(0x28, 0xb5, 0x2f, 0xfd).map(_.toByte)
  /** LZ4 frame magic, little-endian 0x184D2204. */
  private val Lz4Magic = Array(0x04, 0x22, 0x4d, 0x18).map(_.toByte)

  def isZstd(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && ZstdMagic.indices.forall(i => bytes(i) == ZstdMagic(i))

  def isLz4(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && Lz4Magic.indices.forall(i => bytes(i) == Lz4Magic(i))

  /** One zstd frame at a fixed level: same input → same bytes (the
    * reproducible-shard requirement tar/zip already pin).
    */
  def compress(bytes: Array[Byte], level: Int = 3): Array[Byte] = {
    val out = new ByteArrayOutputStream(bytes.length / 3 + 64)
    val z = new ZstdOutputStream(out, level)
    z.write(bytes)
    z.close()
    out.toByteArray
  }

  /** One LZ4 frame (default 64 KiB blocks, content checksum on). */
  def compressLz4(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(bytes.length / 2 + 64)
    val z = new LZ4FrameOutputStream(out)
    z.write(bytes)
    z.close()
    out.toByteArray
  }

  /** Strict decompress of a zstd frame with the inflate-bomb cap. */
  def decompress(bytes: Array[Byte]): Array[Byte] = {
    if (!isZstd(bytes))
      throw new Warc.WarcError("bad_magic", "not a zstd frame")
    drainCapped(new ZstdInputStream(new ByteArrayInputStream(bytes)), "zstd")
  }

  /** Strict decompress of an LZ4 frame with the inflate-bomb cap. */
  def decompressLz4(bytes: Array[Byte]): Array[Byte] = {
    if (!isLz4(bytes))
      throw new Warc.WarcError("bad_magic", "not an lz4 frame")
    drainCapped(new LZ4FrameInputStream(new ByteArrayInputStream(bytes)), "lz4")
  }

  /** Codec sniff by magic: the mixed-codec shard directory case. */
  def decompressAny(bytes: Array[Byte]): Array[Byte] =
    if (isZstd(bytes)) decompress(bytes)
    else if (isLz4(bytes)) decompressLz4(bytes)
    else throw new Warc.WarcError("bad_magic", "neither zstd nor lz4")

  /** `Right(bytes)` or `Left(errorKind)` — the one-error-row-per-shard
    * contract for fault-tolerant scans.
    */
  def decompressAnySafe(bytes: Array[Byte]): Either[String, Array[Byte]] =
    try Right(decompressAny(bytes))
    catch {
      case e: Warc.WarcError => Left(e.kind)
      case _: Exception => Left("bad_frame")
    }

  private def drainCapped(in: java.io.InputStream, codec: String): Array[Byte] = {
    val cap = graft.core.Budget.maxInflatedBytes
    val out = new ByteArrayOutputStream(4096)
    val buf = new Array[Byte](8192)
    try {
      var n = in.read(buf)
      while (n > 0) {
        out.write(buf, 0, n)
        if (out.size().toLong > cap)
          throw new Warc.WarcError("too_large",
            s"$codec frame inflates past $cap bytes")
        n = in.read(buf)
      }
    } catch {
      case e: Warc.WarcError => throw e
      case e: java.io.IOException =>
        throw new Warc.WarcError("bad_frame", s"corrupt $codec frame: ${e.getMessage}")
    } finally in.close()
    out.toByteArray
  }
}
