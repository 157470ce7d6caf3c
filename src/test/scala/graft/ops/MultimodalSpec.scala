package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def blobs = {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    Multimodal.attachBlobs(df, "doc_id", "text", "image/png")
  }

  test("attachBlobs produces the canonical multimodal schema") {
    val ds = blobs
    val f = ds.schema.fields.map(x => x.name -> x.dataType.simpleString).toMap
    assert(f("content") == "binary")
    assert(f("mime") == "string")
    assert(f("meta") == "map<string,string>")
    val first = ds.head()
    assert(first.meta("bytes").toInt == first.content.length)
  }

  test("decode is deterministic and partition-parallel") {
    val d1 = Multimodal.decode(blobs).collect().sortBy(_.blob_id)
    val d2 = Multimodal.decode(blobs.repartition(7)).collect().sortBy(_.blob_id)
    assert(d1.length == d2.length && d1.length > 0)
    d1.zip(d2).foreach { case (a, b) =>
      assert(a.blob_id == b.blob_id && a.width == b.width &&
        a.features.toSeq == b.features.toSeq)
    }
    assert(d1.forall(x => x.width >= 16 && x.features.length == 8))
  }

  test("resize replaces payload and updates metadata, deterministically") {
    val r1 = Multimodal.resize(blobs, 32, 16).collect().sortBy(_.blob_id)
    val r2 = Multimodal.resize(blobs.repartition(5), 32, 16).collect().sortBy(_.blob_id)
    assert(r1.length == r2.length && r1.nonEmpty)
    r1.zip(r2).foreach { case (a, b) =>
      assert(a.blob_id == b.blob_id && a.content.toSeq == b.content.toSeq)
    }
    r1.foreach { b =>
      assert(b.content.length == 32 * 16 / 64)
      assert(b.meta("width") == "32" && b.meta("height") == "16")
    }
  }

  test("video frame sampling emits <= n evenly spaced frames") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val vids = Multimodal.attachBlobs(df, "doc_id", "text", "video/mp4")
    val frames = Multimodal.sampleFrames(vids, 4).collect()
    assert(frames.nonEmpty)
    val byBlob = frames.groupBy(_.blob_id)
    assert(byBlob.values.forall(f => f.length <= 4))
    // deterministic frame bytes
    val again = Multimodal.sampleFrames(vids, 4).collect()
    assert(frames.map(f => (f.blob_id, f.frame_idx, f.content.toSeq)).toSet ==
      again.map(f => (f.blob_id, f.frame_idx, f.content.toSeq)).toSet)
  }

  // ---- real codec: BinaryMediaDecoder over genuine BMP/WAV bytes ----

  /** 4×3 24-bpp bottom-up BMP; pixel (x, y top-based) = BGR
    * (10x+y, 20x+y, 40x+y) — distinct everywhere, so geometry mistakes
    * (row order, stride padding) change observed values.
    */
  private def bmpFixture: Array[Byte] = {
    val (w, h) = (4, 3)
    val stride = (w * 3 + 3) & ~3
    val out = new Array[Byte](54 + stride * h)
    def putLe32(i: Int, v: Int): Unit = (0 until 4).foreach(k =>
      out(i + k) = ((v >> (8 * k)) & 0xff).toByte)
    out(0) = 'B'; out(1) = 'M'; putLe32(2, out.length); putLe32(10, 54)
    putLe32(14, 40); putLe32(18, w); putLe32(22, h)
    out(26) = 1; out(28) = 24; putLe32(34, stride * h)
    for (y <- 0 until h; x <- 0 until w) {
      val o = 54 + (h - 1 - y) * stride + x * 3 // bottom-up storage
      out(o) = (10 * x + y).toByte; out(o + 1) = (20 * x + y).toByte
      out(o + 2) = (40 * x + y).toByte
    }
    out
  }

  /** mono 16-bit 8000 Hz PCM WAV with samples 0, 1000, -1000, 32767,
    * -32768, 12345 — canonical 44-byte header + data chunk.
    */
  private def wavFixture: Array[Byte] = {
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 12345)
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def putAscii(i: Int, s: String): Unit = s.zipWithIndex.foreach {
      case (c, k) => out(i + k) = c.toByte }
    def putLe32(i: Int, v: Int): Unit = (0 until 4).foreach(k =>
      out(i + k) = ((v >> (8 * k)) & 0xff).toByte)
    def putLe16(i: Int, v: Int): Unit = { out(i) = (v & 0xff).toByte
      out(i + 1) = ((v >> 8) & 0xff).toByte }
    putAscii(0, "RIFF"); putLe32(4, 36 + dataLen); putAscii(8, "WAVE")
    putAscii(12, "fmt "); putLe32(16, 16); putLe16(20, 1) // PCM
    putLe16(22, 1); putLe32(24, 8000); putLe32(28, 16000)
    putLe16(32, 2); putLe16(34, 16)
    putAscii(36, "data"); putLe32(40, dataLen)
    samples.zipWithIndex.foreach { case (s, i) => putLe16(44 + i * 2, s & 0xffff) }
    out
  }

  private def blobOf(bytes: Array[Byte], mime: String) =
    Multimodal.Blob(1L, bytes, mime, Map.empty)

  test("BinaryMediaDecoder decodes a real BMP: dimensions, luma range, pixel rows") {
    val d = BinaryMediaDecoder.decode(blobOf(bmpFixture, "image/bmp"))
    assert(d.width == 4 && d.height == 3 && d.n_frames == 1)
    assert(d.features.length == 8)
    // darkest pixel is (0,0)=BGR(0,0,0) → min luma 0; brightest is (3,2)
    assert(d.features(6) == 0.0f)
    val maxLuma = (0.299 * 122 + 0.587 * 62 + 0.114 * 32) / 255.0
    assert(math.abs(d.features(7) - maxLuma) < 1e-6)
    // frame = top-based pixel row 1: BGR(10x+1, 20x+1, 40x+1) for x=0..3
    val row = BinaryMediaDecoder.frame(blobOf(bmpFixture, "image/bmp"), 1)
    assert(row.toSeq == Seq[Byte](1, 1, 1, 11, 21, 41, 21, 41, 81, 31, 61, 121))
  }

  test("BinaryMediaDecoder resize is a true nearest-neighbor resample, re-decodable") {
    val resized = BinaryMediaDecoder.resize(blobOf(bmpFixture, "image/bmp"), 2, 2)
    // output is itself a valid BMP the decoder re-parses
    val d = BinaryMediaDecoder.decode(blobOf(resized, "image/bmp"))
    assert(d.width == 2 && d.height == 2)
    // nearest-neighbor source pixels: sx = x·4/2 ∈ {0,2}, sy = y·3/2 ∈ {0,1}
    // → top row (y=0) pulls (0,0),(2,0); bottom row (y=1) pulls (0,1),(2,1)
    val top = BinaryMediaDecoder.frame(blobOf(resized, "image/bmp"), 0)
    val bot = BinaryMediaDecoder.frame(blobOf(resized, "image/bmp"), 1)
    assert(top.toSeq == Seq[Byte](0, 0, 0, 20, 40, 80))
    assert(bot.toSeq == Seq[Byte](1, 1, 1, 21, 41, 81))
  }

  test("BinaryMediaDecoder decodes a real PCM WAV: rate, channels, frames, samples") {
    val b = blobOf(wavFixture, "audio/wav")
    val d = BinaryMediaDecoder.decode(b)
    assert(d.width == 8000 && d.height == 1 && d.n_frames == 6)
    // feature 0 = first sample (0), feature 7 = last sample (12345/32768)
    assert(d.features(0) == 0.0f)
    assert(math.abs(d.features(7) - 12345.0f / 32768.0f) < 1e-6)
    // sample frame 3 = 32767 little-endian
    assert(BinaryMediaDecoder.frame(b, 3).toSeq == Seq[Byte](-1, 127))
    // audio has no 2-D resize
    intercept[IllegalArgumentException](BinaryMediaDecoder.resize(b, 2, 2))
  }

  /** generic WAV builder for the widened depth/format coverage */
  private def wavOf(fmt: Int, bits: Int, frames: Array[Array[Byte]]): Array[Byte] = {
    val frameBytes = frames.headOption.map(_.length).getOrElse(0)
    val dataLen = frames.length * frameBytes
    val out = new Array[Byte](44 + dataLen)
    def putAscii(i: Int, s: String): Unit = s.zipWithIndex.foreach {
      case (c, k) => out(i + k) = c.toByte }
    def putLe32(i: Int, v: Int): Unit = (0 until 4).foreach(k =>
      out(i + k) = ((v >> (8 * k)) & 0xff).toByte)
    def putLe16(i: Int, v: Int): Unit = { out(i) = (v & 0xff).toByte
      out(i + 1) = ((v >> 8) & 0xff).toByte }
    putAscii(0, "RIFF"); putLe32(4, 36 + dataLen); putAscii(8, "WAVE")
    putAscii(12, "fmt "); putLe32(16, 16); putLe16(20, fmt)
    putLe16(22, 1); putLe32(24, 8000); putLe32(28, 8000 * bits / 8)
    putLe16(32, bits / 8); putLe16(34, bits)
    putAscii(36, "data"); putLe32(40, dataLen)
    frames.zipWithIndex.foreach { case (f, i) =>
      System.arraycopy(f, 0, out, 44 + i * frameBytes, frameBytes) }
    out
  }

  test("BMP depth tail (round 9): 8-bpp palette and 32-bpp BI_RGB decode") {
    // 8-bpp: 5x2 top-down, 4-entry palette (black, red BGR, green, white),
    // stride pads 5 -> 8
    val pal8 = {
      val (w, h) = (5, 2)
      val stride = (w + 3) & ~3
      val out = new Array[Byte](54 + 16 + stride * h)
      def putLe32(i: Int, v: Int): Unit = (0 until 4).foreach(k =>
        out(i + k) = ((v >> (8 * k)) & 0xff).toByte)
      out(0) = 'B'; out(1) = 'M'; putLe32(2, out.length); putLe32(10, 54 + 16)
      putLe32(14, 40); putLe32(18, w); putLe32(22, -h) // top-down
      out(26) = 1; out(28) = 8; putLe32(46, 4) // 4 colors
      // BGRA palette entries
      val colors = Seq((0, 0, 0), (0, 0, 255), (0, 255, 0), (255, 255, 255))
      colors.zipWithIndex.foreach { case ((bb, gg, rr), i) =>
        out(54 + i * 4) = bb.toByte; out(54 + i * 4 + 1) = gg.toByte
        out(54 + i * 4 + 2) = rr.toByte
      }
      // row 0: 0 1 2 3 0 ; row 1: 3 3 3 3 3
      val rows = Seq(Seq(0, 1, 2, 3, 0), Seq(3, 3, 3, 3, 3))
      rows.zipWithIndex.foreach { case (r, y) =>
        r.zipWithIndex.foreach { case (v, x) => out(70 + y * stride + x) = v.toByte } }
      out
    }
    val d8 = BinaryMediaDecoder.decode(blobOf(pal8, "image/bmp"))
    assert(d8.width == 5 && d8.height == 2)
    assert(d8.features(6) == 0.0f && d8.features(7) == 1.0f) // black..white luma
    // row 1 is all white after palette resolution
    val row1 = BinaryMediaDecoder.frame(blobOf(pal8, "image/bmp"), 1)
    assert(row1.forall(_ == -1.toByte))
    // resize re-emits 24-bpp: 1x1 keeps pixel (0,0) = black
    val r8 = BinaryMediaDecoder.resize(blobOf(pal8, "image/bmp"), 1, 1)
    assert(BinaryMediaDecoder.frame(blobOf(r8, "image/bmp"), 0).toSeq ==
      Seq[Byte](0, 0, 0))

    // 32-bpp BGRA bottom-up: 2x1, alpha ignored
    val b32 = {
      val out = new Array[Byte](54 + 8)
      def putLe32(i: Int, v: Int): Unit = (0 until 4).foreach(k =>
        out(i + k) = ((v >> (8 * k)) & 0xff).toByte)
      out(0) = 'B'; out(1) = 'M'; putLe32(2, out.length); putLe32(10, 54)
      putLe32(14, 40); putLe32(18, 2); putLe32(22, 1)
      out(26) = 1; out(28) = 32
      // pixel 0: BGR(10,20,30) A=99 ; pixel 1: BGR(200,150,100) A=0
      out(54) = 10; out(55) = 20; out(56) = 30; out(57) = 99
      out(58) = 200.toByte; out(59) = 150.toByte; out(60) = 100.toByte
      out
    }
    val d32 = BinaryMediaDecoder.decode(blobOf(b32, "image/bmp"))
    assert(d32.width == 2 && d32.height == 1)
    val row = BinaryMediaDecoder.frame(blobOf(b32, "image/bmp"), 0)
    assert(row.toSeq == Seq[Byte](10, 20, 30, 200.toByte, 150.toByte, 100.toByte))
    // 16-bpp stays refused
    val b16 = b32.clone(); b16(28) = 16
    intercept[IllegalArgumentException](
      BinaryMediaDecoder.decode(blobOf(b16, "image/bmp")))
  }

  test("WAV depth tail (round 9): 24/32-bit PCM and IEEE float32 decode") {
    // 24-bit: -2^23 (min), 0, 2^23-1 (max) little-endian
    val w24 = wavOf(1, 24, Array(
      Array[Byte](0, 0, -128), Array[Byte](0, 0, 0), Array[Byte](-1, -1, 127)))
    val d24 = BinaryMediaDecoder.decode(blobOf(w24, "audio/wav"))
    assert(d24.n_frames == 3 && d24.width == 8000)
    assert(d24.features(0) == -1.0f)
    assert(math.abs(d24.features(7) - (8388607.0 / 8388608.0)) < 1e-6)
    // 32-bit int PCM: min / max
    def le32b(v: Long) = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val w32 = wavOf(1, 32, Array(le32b(Int.MinValue), le32b(Int.MaxValue)))
    val d32 = BinaryMediaDecoder.decode(blobOf(w32, "audio/wav"))
    assert(d32.features(0) == -1.0f)
    assert(math.abs(d32.features(7) - 1.0f) < 1e-6)
    // IEEE float32 (format 3): raw float bits pass through
    val wf = wavOf(3, 32, Array(
      le32b(java.lang.Float.floatToIntBits(0.25f) & 0xffffffffL),
      le32b(java.lang.Float.floatToIntBits(-0.5f) & 0xffffffffL)))
    val df = BinaryMediaDecoder.decode(blobOf(wf, "audio/wav"))
    assert(df.features(0) == 0.25f && df.features(7) == -0.5f)
    // float WAV must be 32-bit; format 2 (ADPCM) stays refused
    intercept[IllegalArgumentException](
      BinaryMediaDecoder.decode(blobOf(wavOf(3, 16,
        Array(Array[Byte](0, 0))), "audio/wav")))
    intercept[IllegalArgumentException](
      BinaryMediaDecoder.decode(blobOf(wavOf(2, 16,
        Array(Array[Byte](0, 0))), "audio/wav")))
  }

  test("BinaryMediaDecoder decodes binary PNM (P6/P5): header, comments, rows, resize") {
    // P6 2x2 RGB with a header comment: pixels R,G,B,white
    val p6 = "P6\n# test comment\n2 2\n255\n".getBytes("US-ASCII") ++
      Array[Byte](-1, 0, 0, 0, -1, 0, 0, 0, -1, -1, -1, -1)
    val d6 = BinaryMediaDecoder.decode(blobOf(p6, "image/x-portable-pixmap"))
    assert(d6.width == 2 && d6.height == 2 && d6.n_frames == 1)
    // mean of each channel over {255,0,0,255} = 510/4/255 = 0.5
    assert(d6.features.take(3).forall(f => math.abs(f - 0.5f) < 1e-6), d6.features.toSeq)
    assert(d6.features(7) == 1.0f) // white pixel -> max luma 1
    // top row frame = RGB(255,0,0), RGB(0,255,0)
    assert(BinaryMediaDecoder.frame(blobOf(p6, "image/x-portable-pixmap"), 0).toSeq ==
      Seq[Byte](-1, 0, 0, 0, -1, 0))
    // resize 1x1 picks (0,0) and re-emits a decodable P6
    val r = BinaryMediaDecoder.resize(blobOf(p6, "image/x-portable-pixmap"), 1, 1)
    val dr = BinaryMediaDecoder.decode(blobOf(r, "image/x-portable-pixmap"))
    assert(dr.width == 1 && dr.height == 1)
    assert(BinaryMediaDecoder.frame(blobOf(r, "image/x-portable-pixmap"), 0).toSeq ==
      Seq[Byte](-1, 0, 0))

    // P5 3x1 grayscale 0 / 128 / 255
    val p5 = "P5\n3 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](0, -128, -1)
    val d5 = BinaryMediaDecoder.decode(blobOf(p5, "image/x-portable-graymap"))
    assert(d5.width == 3 && d5.height == 1)
    assert(d5.features(6) == 0.0f && d5.features(7) == 1.0f)
    assert(math.abs(d5.features(3) - (0 + 128 + 255) / 3.0 / 255.0) < 1e-6)
    assert(BinaryMediaDecoder.frame(blobOf(p5, "image/x-portable-graymap"), 0).toSeq ==
      Seq[Byte](0, -128, -1))
    // maxval < 255: features normalize by the HEADER maxval, not 255 —
    // full-white (sample == maxval) must still reach luma 1.0, and the
    // mean scales by maxval (P5 2x1 over maxval 15: samples 0, 15)
    val p5lo = "P5\n2 1\n15\n".getBytes("US-ASCII") ++ Array[Byte](0, 15)
    val d5lo = BinaryMediaDecoder.decode(blobOf(p5lo, "image/x-portable-graymap"))
    assert(d5lo.features(6) == 0.0f && d5lo.features(7) == 1.0f, d5lo.features.toSeq)
    assert(math.abs(d5lo.features(3) - 0.5) < 1e-6, d5lo.features.toSeq)
    // a maxval-scaled resize round-trips with the same maxval header
    val rlo = BinaryMediaDecoder.resize(blobOf(p5lo, "image/x-portable-graymap"), 1, 1)
    assert(new String(rlo.take(9), "US-ASCII").contains("15"))

    // truncated raster and bad magic raise
    intercept[IllegalArgumentException](BinaryMediaDecoder.decode(
      blobOf("P5\n3 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](0),
        "image/x-portable-graymap")))
    intercept[IllegalArgumentException](BinaryMediaDecoder.decode(
      blobOf("P4\n1 1\n".getBytes("US-ASCII"), "image/x-portable-pixmap")))
  }

  test("decodeSafe: refusals become typed error rows, not task failures") {
    import spark.implicits._
    val good = Png.encode(2, 2, 0, Array[Byte](1, 2, 3, 4))
    val blobs = spark.createDataset(Seq(
      Multimodal.Blob(1L, good, "image/png", Map.empty),
      Multimodal.Blob(2L, Array(0xff, 0xd8, 0xff, 0xc9, 0, 4, 0, 0).map(_.toByte),
        "image/jpeg", Map.empty), // arithmetic SOF9 -> unsupported
      Multimodal.Blob(3L, good.dropRight(10), "image/png", Map.empty), // truncated
      Multimodal.Blob(4L, "plain text".getBytes, "image/png", Map.empty), // bad magic
      Multimodal.Blob(5L, Array[Byte](1, 2, 3), "model/gltf", Map.empty))) // no branch
    val res = Multimodal.decodeSafe(blobs, BinaryMediaDecoder).collect()
      .map(r => r.blob_id -> r).toMap
    assert(res(1L).ok && res(1L).width == 2 && res(1L).err_kind == "")
    assert(!res(2L).ok && res(2L).err_kind == "unsupported")
    assert(res(2L).err_detail.contains("SOF9"))
    assert(!res(3L).ok && res(3L).err_kind == "truncated")
    assert(!res(4L).ok && res(4L).err_kind == "not_media")
    assert(!res(5L).ok && res(5L).err_kind == "unsupported") // unsupported media type
    assert(res.values.filter(!_.ok).forall(r => r.width == 0 && r.features.isEmpty))
  }

  test("BinaryMediaDecoder rejects unsupported and malformed payloads") {
    intercept[IllegalArgumentException](
      BinaryMediaDecoder.decode(blobOf(bmpFixture, "image/png")))
    intercept[IllegalArgumentException](
      BinaryMediaDecoder.decode(blobOf(Array[Byte](1, 2, 3), "image/bmp")))
    intercept[IllegalArgumentException](
      BinaryMediaDecoder.decode(blobOf(Array[Byte](1, 2, 3), "audio/wav")))
  }

  test("real codec runs end-to-end through the Spark decode/resize plumbing") {
    import spark.implicits._
    // 6 real BMPs with distinct sizes via resize from the fixture
    val blobs = (1 to 6).map { i =>
      Multimodal.Blob(i.toLong,
        BinaryMediaDecoder.resize(blobOf(bmpFixture, "image/bmp"), i + 1, i + 2),
        "image/bmp", Map.empty)
    }
    val ds = spark.createDataset(blobs).repartition(3)
    val dec = Multimodal.decode(ds, BinaryMediaDecoder).collect().sortBy(_.blob_id)
    assert(dec.map(d => (d.width, d.height)).toSeq ==
      (1 to 6).map(i => (i + 1, i + 2)))
    val rs = Multimodal.resize(ds, 8, 8, BinaryMediaDecoder).collect()
    assert(rs.length == 6)
    rs.foreach { b =>
      val d = BinaryMediaDecoder.decode(b.copy(mime = "image/bmp"))
      assert(d.width == 8 && d.height == 8)
      assert(b.meta("width") == "8" && b.meta("height") == "8")
    }
  }

  test("sampleFrames composes with the real codec on MP3 (PCM-instant indexing)") {
    import spark.implicits._
    val mk = (id: Long, n: Int) => Multimodal.Blob(id,
      Mp3.encodeV1L3(0, Seq.fill(n)((9, false)), 0, (f, i) => ((f + i) % 83).toByte),
      "audio/mpeg", Map.empty)
    val blobs = Seq(mk(1L, 5), mk(2L, 2)).toDS()
    val frames = Multimodal.sampleFrames(blobs, 4, BinaryMediaDecoder).collect()
    // 4 evenly spaced PCM instants per blob (decode's n_frames unit);
    // every returned payload is a genuine coded frame (sync word, CBR
    // length 417 = 144000·128/44100)
    assert(frames.length == 8)
    assert(frames.forall(f => f.content.length == 417 &&
      (f.content(0) & 0xff) == 0xff && (f.content(1) & 0xe0) == 0xe0))
    // instants span the stream: first sample through the final one
    val b1 = frames.filter(_.blob_id == 1L).map(_.frame_idx)
    assert(b1.min == 0 && b1.max == 5 * 1152 - 1)
  }
}
