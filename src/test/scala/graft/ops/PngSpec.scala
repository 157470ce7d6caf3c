package graft.ops

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Real PNG decode (pure-JDK [[Png]]): pixel-exact goldens against fixtures
  * built by an INDEPENDENT implementation (python zlib/struct —
  * tools/make_png_fixture.py), filter-complete round trips, CRC/truncation
  * refusal, and the [[BinaryMediaDecoder]] integration surface.
  */
class PngSpec extends SparkSpec {

  private def fixture(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(s"src/test/resources/fixtures/$name"))

  /** the generator's pixel formula: sample(x, y, c) = (31x+17y+11c+7) % 256 */
  private def expectedRaster(w: Int, h: Int, ch: Int): Array[Byte] =
    Array.tabulate(w * h * ch) { i =>
      val c = i % ch; val x = (i / ch) % w; val y = i / (ch * w)
      ((x * 31 + y * 17 + c * 11 + 7) % 256).toByte
    }

  test("decodes python-built fixtures pixel-exactly, all color types and filters") {
    // (file, w, h, colorType): filters cycle differently per fixture, so
    // together these cover None/Sub/Up/Average/Paeth on every color type
    val cases = Seq(
      ("png_rgb.png", 6, 5, 2), ("png_gray.png", 7, 4, 0),
      ("png_rgba.png", 5, 5, 6), ("png_ga.png", 4, 6, 4))
    cases.foreach { case (f, w, h, ct) =>
      val (hd, px) = Png.decode(fixture(f))
      assert(hd.w == w && hd.h == h && hd.colorType == ct, f)
      assert(px.toSeq == expectedRaster(w, h, hd.channels).toSeq, f)
    }
  }

  test("multiple IDAT chunks and ancillary chunks decode identically") {
    val (hd, px) = Png.decode(fixture("png_multi_idat.png"))
    assert(hd.w == 6 && hd.h == 5 && hd.colorType == 2)
    assert(px.toSeq == expectedRaster(6, 5, 3).toSeq)
  }

  test("encode→decode round trip is exact for every color type (filters cycle 0..4)") {
    for (ct <- Seq(0, 2, 4, 6); (w, h) <- Seq((1, 7), (9, 6), (16, 16))) {
      val ch = Png.channelsOf(ct)
      val px = Array.tabulate(w * h * ch)(i => ((i * 131 + 29) % 256).toByte)
      val (hd, back) = Png.decode(Png.encode(w, h, ct, px))
      assert(hd.w == w && hd.h == h && hd.colorType == ct)
      assert(back.toSeq == px.toSeq, s"ct=$ct ${w}x$h")
    }
  }

  test("corrupt and unsupported payloads are refused, not mis-decoded") {
    val crc = intercept[IllegalArgumentException](Png.decode(fixture("png_badcrc.png")))
    assert(crc.getMessage.contains("CRC"))
    val trunc = intercept[IllegalArgumentException](Png.decode(fixture("png_trunc.png")))
    assert(trunc.getMessage.toLowerCase.contains("trunc"))
    val inter = intercept[IllegalArgumentException](Png.decode(fixture("png_interlace.png")))
    assert(inter.getMessage.contains("interlac"))
    val pal = intercept[IllegalArgumentException](Png.decode(fixture("png_pal.png")))
    assert(pal.getMessage.contains("color type"))
    intercept[IllegalArgumentException](Png.decode("not a png at all".getBytes))
    // truncated mid-zlib-stream: valid chunks, garbage deflate data
    val fakeIdat = {
      val ihdr = new Array[Byte](13)
      ihdr(3) = 2; ihdr(7) = 2; ihdr(8) = 8 // 2x2 gray
      chunkify(Seq(("IHDR", ihdr), ("IDAT", Array[Byte](1, 2, 3)), ("IEND", Array.emptyByteArray)))
    }
    intercept[IllegalArgumentException](Png.decode(fakeIdat))
  }

  private def chunkify(chunks: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Png.Signature)
    chunks.foreach { case (typ, data) =>
      val t = typ.getBytes("US-ASCII")
      def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      out.write(be32(data.length)); out.write(t); out.write(data)
      val c = new java.util.zip.CRC32; c.update(t); c.update(data)
      out.write(be32(c.getValue.toInt))
    }
    out.toByteArray
  }

  // ------------------------- BinaryMediaDecoder integration -------------

  private def blobOf(bytes: Array[Byte]) =
    Multimodal.Blob(1L, bytes, "image/png", Map.empty)

  test("BinaryMediaDecoder decodes PNG: metadata, features, frames") {
    val d = BinaryMediaDecoder.decode(blobOf(fixture("png_gray.png")))
    assert(d.width == 7 && d.height == 4 && d.n_frames == 1)
    // gray fixture: mean = mean of (31x+17y+7)%256 over 7x4, all < 256
    val vals = for (y <- 0 until 4; x <- 0 until 7) yield (x * 31 + y * 17 + 7) % 256
    assert(math.abs(d.features(3) - vals.sum.toDouble / vals.length / 255.0) < 1e-6)
    assert(math.abs(d.features(6) - vals.min / 255.0) < 1e-6)
    assert(math.abs(d.features(7) - vals.max / 255.0) < 1e-6)
    // frame 2 is the reconstructed row y=2
    val row = BinaryMediaDecoder.frame(blobOf(fixture("png_gray.png")), 2)
    assert(row.toSeq == (0 until 7).map(x => ((x * 31 + 41) % 256).toByte).toSeq)
    // RGBA: alpha ignored in means — all-opaque vs all-transparent agree
    val px = Array.tabulate(2 * 2 * 4)(i => if (i % 4 == 3) 0.toByte else 100.toByte)
    val opq = px.clone(); opq.indices.filter(_ % 4 == 3).foreach(opq(_) = -1)
    val fa = BinaryMediaDecoder.decode(blobOf(Png.encode(2, 2, 6, px))).features
    val fb = BinaryMediaDecoder.decode(blobOf(Png.encode(2, 2, 6, opq))).features
    assert(fa.toSeq == fb.toSeq)
  }

  test("BinaryMediaDecoder PNG resize: nearest-neighbor exact, re-encoded as valid PNG") {
    val src = fixture("png_rgb.png") // 6x5 RGB
    val out = BinaryMediaDecoder.resize(blobOf(src), 3, 10)
    val (hd, px) = Png.decode(out)
    assert(hd.w == 3 && hd.h == 10 && hd.colorType == 2)
    // same integer mapping as BMP/PNM: sx = x*6/3, sy = y*5/10
    for (y <- 0 until 10; x <- 0 until 3; c <- 0 until 3) {
      val (sx, sy) = (x * 6 / 3, y * 5 / 10)
      assert(px((y * 3 + x) * 3 + c) ==
        ((sx * 31 + sy * 17 + c * 11 + 7) % 256).toByte, s"($x,$y,$c)")
    }
  }

  test("real PNG codec runs end-to-end through the Spark multimodal plumbing") {
    import spark.implicits._
    val blobs = (0 until 8).map { i =>
      val ct = Seq(0, 2, 4, 6)(i % 4)
      val ch = Png.channelsOf(ct)
      val px = Array.tabulate(4 * 6 * ch)(j => ((j * 37 + i * 3) % 256).toByte)
      Multimodal.Blob(i.toLong, Png.encode(4, 6, ct, px), "image/png", Map.empty)
    }
    val ds = spark.createDataset(blobs).repartition(3)
    val dec = Multimodal.decode(ds, BinaryMediaDecoder).collect().sortBy(_.blob_id)
    assert(dec.length == 8 && dec.forall(d => d.width == 4 && d.height == 6))
    val rs = Multimodal.resize(ds, 8, 8, BinaryMediaDecoder).collect()
    assert(rs.length == 8)
    rs.foreach { b =>
      val (hd, _) = Png.decode(b.content)
      assert(hd.w == 8 && hd.h == 8)
    }
  }
}
