package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column support: media as opaque `binary`
  * cells with typed metadata, plus decode / feature-extract / frame-sample
  * stages as partition-mapped operators.
  *
  * The Spark-side plumbing — schema, batching shape, partition parallelism,
  * determinism — is real and tested. Codecs plug in behind [[MediaDecoder]]:
  * [[StubDecoder]] (the default, a deterministic fake whose metadata is
  * SQL-recomputable, which is what the mm01/mm02 oracles audit) and
  * [[BinaryMediaDecoder]] (real pure-JVM BMP/PNM/PNG/JPEG/GIF/WAV decode
  * plus the MP3 metadata walk — the formats decodable without native
  * libraries, which this container ships none of). A production deployment
  * plugs a JNI/library decoder for the remaining formats (H.264 video,
  * lossy-audio synthesis) into the same trait; nothing else changes. Work
  * is per-row and embarrassingly parallel: no shuffle, scales linearly
  * with corpus size, and binary columns stay columnar (parquet BYTE_ARRAY)
  * end to end.
  */
object Multimodal {

  /** Decompression-bomb guard (round 12): a tiny crafted container can
    * legally claim enormous dimensions (VP8L/VP8 carry 14-bit dims →
    * 16383², a ~1 GB raster from a 50-byte file; GIF/PNG/TIFF dims are
    * 16/32-bit), and the raster allocation happens BEFORE any content
    * parse can fail. One such blob per executor is an OOM-kill on a
    * 100 TB crawl scan, so every raster codec checks its header dims
    * against this budget before allocating and refuses with the typed
    * `unsupported` kind (the PIL `DECOMPRESSION_BOMB` convention).
    * Override with -Dgraft.media.maxDecodePixels=N for trusted corpora.
    */
  val MaxDecodePixels: Long =
    sys.props.get("graft.media.maxDecodePixels").map(_.toLong)
      .getOrElse(64L * 1024 * 1024)

  /** Throws the typed refusal when a claimed raster exceeds the budget. */
  def checkPixelBudget(w: Long, h: Long, codec: String): Unit =
    if (w > 0 && h > 0 && w * h > MaxDecodePixels)
      throw new IllegalArgumentException(
        s"unsupported $codec: ${w}x$h exceeds the $MaxDecodePixels-pixel decode budget")

  final case class Blob(
      blob_id: Long,
      content: Array[Byte],
      mime: String,
      meta: Map[String, String])

  final case class Decoded(
      blob_id: Long,
      mime: String,
      width: Int,
      height: Int,
      n_frames: Int,
      features: Array[Float])

  final case class Frame(blob_id: Long, frame_idx: Int, content: Array[Byte])

  /** One row per blob from [[decodeSafe]]: decoded metadata when `ok`,
    * else a CLASSIFIED error kind (stable vocabulary — `unsupported` /
    * `truncated` / `not_media` / `malformed`) plus the full message for
    * debugging. The kind, not the free-form message, is the aggregation
    * key, so oracles and dashboards stay stable across message rewording.
    */
  final case class DecodeResult(
      blob_id: Long,
      mime: String,
      ok: Boolean,
      err_kind: String,
      err_detail: String,
      width: Int,
      height: Int,
      n_frames: Int,
      features: Array[Float])

  private[graft] def errKind(msg: String): String = {
    val m = if (msg == null) "" else msg.toLowerCase(java.util.Locale.ROOT)
    if (m.contains("unsupported")) "unsupported"
    else if (m.contains("trunc") || m.contains("overrun")) "truncated"
    else if (m.contains("not a") || m.contains("signature") || m.contains("magic")) "not_media"
    else "malformed"
  }

  /** Fault-TOLERANT decode: a refused or corrupt blob becomes a typed
    * error ROW instead of a task failure — the media twin of the text
    * pipeline's error-fallback extractor (E9). At 100 TB a web-crawl
    * corpus always carries progressive JPEGs, truncated downloads, and
    * mislabeled payloads; one bad blob must not kill a 1000-executor
    * scan, and the error counts themselves are curation signal. Per-row,
    * shuffle-free, same partition-mapped shape as [[decode]].
    */
  def decodeSafe(blobs: Dataset[Blob],
      decoder: MediaDecoder = StubDecoder): Dataset[DecodeResult] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      val d = decoder.open()
      it.map { b =>
        try {
          val r = d.decode(b)
          DecodeResult(b.blob_id, b.mime, ok = true, "", "",
            r.width, r.height, r.n_frames, r.features)
        } catch {
          case e: Exception =>
            DecodeResult(b.blob_id, b.mime, ok = false,
              errKind(e.getMessage), String.valueOf(e.getMessage),
              0, 0, 0, Array.empty[Float])
        }
      }
    }
  }

  /** Wrap a (id, payload) DataFrame into the canonical multimodal schema. */
  def attachBlobs(df: DataFrame, idCol: String, payloadCol: String, mime: String): Dataset[Blob] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("blob_id"),
      col(payloadCol).cast("binary").as("content"),
      lit(mime).as("mime"),
      map(lit("bytes"), length(col(payloadCol)).cast("string")).as("meta"))
      .as[Blob]
  }

  /** Decode + feature-extract, one partition at a time (the decoder is
    * instantiated per partition, mirroring the mapInPandas batch shape where
    * the model/codec loads once per batch, not per row).
    */
  def decode(blobs: Dataset[Blob], decoder: MediaDecoder = StubDecoder): Dataset[Decoded] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      val d = decoder.open()
      it.map(b => d.decode(b))
    }
  }

  /** Resize every image/video blob to `w`×`h`: per-partition map through the
    * decoder (codec stubbed), payload replaced, metadata updated — the
    * preprocessing step of an image training pipeline. Shuffle-free.
    */
  def resize(blobs: Dataset[Blob], w: Int, h: Int,
      decoder: MediaDecoder = StubDecoder): Dataset[Blob] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      val d = decoder.open()
      it.map { b =>
        b.copy(
          content = d.resize(b, w, h),
          meta = b.meta ++ Map("width" -> w.toString, "height" -> h.toString))
      }
    }
  }

  /** Sample up to `n` evenly-spaced frames per video blob (flatMap — output
    * cardinality varies per row, still shuffle-free).
    */
  def sampleFrames(blobs: Dataset[Blob], n: Int, decoder: MediaDecoder = StubDecoder): Dataset[Frame] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.flatMap { b =>
      val d = decoder.open()
      val dec = d.decode(b)
      val take = math.min(n, dec.n_frames)
      (0 until take).map { i =>
        val at = if (take <= 1) 0 else i * (dec.n_frames - 1) / (take - 1)
        Frame(b.blob_id, at, d.frame(b, at))
      }
    }
  }
}

/** Plug point for real codecs. `open()` is called once per partition. */
trait MediaDecoder extends Serializable {
  def open(): MediaDecoder = this
  def decode(b: Multimodal.Blob): Multimodal.Decoded
  def frame(b: Multimodal.Blob, idx: Int): Array[Byte]
  def resize(b: Multimodal.Blob, w: Int, h: Int): Array[Byte]
}

/** STUB decoder — deterministic fake derived from content bytes (no media
  * libraries in this environment). Width/height/frames/features are stable
  * functions of the payload so specs can assert exact values; swap for a
  * real decoder in production.
  *
  * The content hash is the engine-portable 60-bit md5 prefix (DuckDB:
  * `CAST('0x'||substring(md5(x),1,15) AS BIGINT)`), so downstream aggregates
  * of the stubbed metadata are SQL-expressible and cross-checkable against
  * an independent engine (mm01's oracle).
  */
object StubDecoder extends MediaDecoder {
  /** Low 60 bits of md5(content), as an unsigned value in a Long. */
  def hash60(bytes: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).take(8).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }
  def decode(b: Multimodal.Blob): Multimodal.Decoded = {
    val h = StubDecoder.hash60(b.content) // >= 0, so % == floorMod
    val w = 16 + (h % 64).toInt
    val ht = 16 + ((h >> 8) % 64).toInt
    val frames = if (b.mime.startsWith("video/")) 1 + ((h >> 16) % 30).toInt else 1
    val feats = Array.tabulate(8) { i =>
      (h % 1000 * (i + 1) % 1000) / 1000.0f
    }
    Multimodal.Decoded(b.blob_id, b.mime, w, ht, frames, feats)
  }
  def frame(b: Multimodal.Blob, idx: Int): Array[Byte] = {
    val n = math.min(b.content.length, 16)
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = (b.content(i) ^ idx).toByte; i += 1 }
    out
  }

  /** deterministic fake resize: output is w*h/64 bytes sampled from the
    * payload (stable function of content + target size).
    *
    * Empty-payload contract: an empty blob resizes to all-zero bytes (the
    * sampling formula `payload[(31·i+w+h) mod len]` has no value at
    * len = 0). SQL oracles recomputing this formula (mm02) must therefore
    * exclude empty payloads symmetrically — their modulus divides by zero
    * where this stub emits zeros.
    */
  def resize(b: Multimodal.Blob, w: Int, h: Int): Array[Byte] = {
    val n = math.max(1, w * h / 64)
    Array.tabulate(n)(i =>
      if (b.content.isEmpty) 0.toByte
      else b.content(math.floorMod(i * 31 + w + h, b.content.length)))
  }
}
