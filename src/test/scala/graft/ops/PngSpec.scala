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

  /** palette fixtures: palette[i] = ((7i+3)%256, (13i+5)%256, (29i+11)%256),
    * index(x,y) = (3x+5y) % 16 — mirrors make_png_fixture.py
    */
  private def expectedPaletteRgb(w: Int, h: Int): Seq[Byte] =
    (for (y <- 0 until h; x <- 0 until w) yield {
      val i = (3 * x + 5 * y) % 16
      Seq(((7 * i + 3) % 256).toByte, ((13 * i + 5) % 256).toByte,
        ((29 * i + 11) % 256).toByte)
    }).flatten

  test("palette PNGs (depth 8 and sub-byte depth 4) decode through PLTE to RGB") {
    val (hd8, px8) = Png.decode(fixture("png_pal.png"))
    assert(hd8.w == 6 && hd8.h == 5 && hd8.colorType == 2 && hd8.bitDepth == 8)
    assert(px8.toSeq == expectedPaletteRgb(6, 5))
    val (hd4, px4) = Png.decode(fixture("png_pal4.png")) // odd width: padded bits
    assert(hd4.w == 7 && hd4.h == 5 && hd4.colorType == 2)
    assert(px4.toSeq == expectedPaletteRgb(7, 5))
  }

  test("Adam7 interlaced PNGs deinterlace pixel-exactly (truecolor and palette)") {
    // 9x9 RGB: every one of the 7 passes is non-empty
    val (hd, px) = Png.decode(fixture("png_interlace.png"))
    assert(hd.w == 9 && hd.h == 9 && hd.colorType == 2)
    assert(px.toSeq == expectedRaster(9, 9, 3).toSeq)
    // depth-4 palette + Adam7 — sub-byte packing PER PASS row
    val (hdp, pxp) = Png.decode(fixture("png_pal_interlace.png"))
    assert(hdp.w == 9 && hdp.h == 6 && hdp.colorType == 2)
    assert(pxp.toSeq == expectedPaletteRgb(9, 6))
  }

  test("sub-byte and 16-bit gray/RGB normalize to 8-bit samples") {
    // depth 1: (x+y)%2 scales to 0/255
    val (hd1, px1) = Png.decode(fixture("png_gray1.png"))
    assert(hd1.w == 10 && hd1.h == 3 && hd1.colorType == 0 && hd1.bitDepth == 8)
    assert(px1.toSeq == (for (y <- 0 until 3; x <- 0 until 10)
      yield (if ((x + y) % 2 == 1) -1 else 0).toByte))
    // depth 16 gray: MSB of (9973x + 4369y + 12345) % 65536
    val (hd16, px16) = Png.decode(fixture("png_gray16.png"))
    assert(hd16.w == 4 && hd16.h == 3)
    assert(px16.toSeq == (for (y <- 0 until 3; x <- 0 until 4)
      yield (((x * 9973 + y * 4369 + 12345) % 65536) >> 8).toByte))
    // depth 16 RGB: MSB of (9973x + 4373y + 1571c + 777) % 65536
    val (hdc, pxc) = Png.decode(fixture("png_rgb16.png"))
    assert(hdc.w == 3 && hdc.h == 3 && hdc.colorType == 2)
    assert(pxc.toSeq == (for (y <- 0 until 3; x <- 0 until 3; c <- 0 until 3)
      yield (((x * 9973 + y * 4373 + c * 1571 + 777) % 65536) >> 8).toByte))
  }

  test("encodeIndexed round trip: palette expansion exact at all depths, ±Adam7") {
    val pal = Array.tabulate(16 * 3)(i => ((i * 37 + 11) % 256).toByte)
    for (depth <- Seq(1, 2, 4, 8); interlace <- Seq(false, true);
         (w, h) <- Seq((1, 1), (16, 16), (9, 7))) {
      val n = 1 << math.min(depth, 4) // ≤ 16 entries available
      val idx = Array.tabulate(w * h)(k => ((k * 5 + 1) % n).toByte)
      val png = Png.encodeIndexed(w, h, depth, pal.take(n * 3), idx, interlace)
      val (hd, px) = Png.decode(png)
      assert(hd.w == w && hd.h == h && hd.colorType == 2, s"d=$depth i=$interlace")
      val expect = idx.flatMap { i =>
        Seq(pal((i & 0xff) * 3), pal((i & 0xff) * 3 + 1), pal((i & 0xff) * 3 + 2))
      }
      assert(px.toSeq == expect.toSeq, s"d=$depth i=$interlace ${w}x$h")
    }
    // index out of palette range refused at encode time
    intercept[IllegalArgumentException](
      Png.encodeIndexed(1, 1, 4, pal.take(6), Array[Byte](3)))
  }

  test("corrupt and malformed payloads are refused, not mis-decoded") {
    val crc = intercept[IllegalArgumentException](Png.decode(fixture("png_badcrc.png")))
    assert(crc.getMessage.contains("CRC"))
    val trunc = intercept[IllegalArgumentException](Png.decode(fixture("png_trunc.png")))
    assert(trunc.getMessage.toLowerCase.contains("trunc"))
    // palette image whose PLTE is missing / whose index overruns the palette
    val noPlte = chunkify(Seq(
      ("IHDR", Array[Byte](0, 0, 0, 1, 0, 0, 0, 1, 8, 3, 0, 0, 0)),
      ("IDAT", deflate(Array[Byte](0, 9))), ("IEND", Array.emptyByteArray)))
    val e1 = intercept[IllegalArgumentException](Png.decode(noPlte))
    assert(e1.getMessage.contains("PLTE"))
    val shortPlte = chunkify(Seq(
      ("IHDR", Array[Byte](0, 0, 0, 1, 0, 0, 0, 1, 8, 3, 0, 0, 0)),
      ("PLTE", Array[Byte](1, 2, 3, 4, 5, 6)), // 2 entries
      ("IDAT", deflate(Array[Byte](0, 9))), ("IEND", Array.emptyByteArray)))
    val e2 = intercept[IllegalArgumentException](Png.decode(shortPlte))
    assert(e2.getMessage.contains("out of range"))
    // illegal depth/color combination (depth 16 palette)
    val badCombo = chunkify(Seq(
      ("IHDR", Array[Byte](0, 0, 0, 1, 0, 0, 0, 1, 16, 3, 0, 0, 0)),
      ("IEND", Array.emptyByteArray)))
    val e3 = intercept[IllegalArgumentException](Png.decode(badCombo))
    assert(e3.getMessage.contains("illegal"))
    intercept[IllegalArgumentException](Png.decode("not a png at all".getBytes))
    // truncated mid-zlib-stream: valid chunks, garbage deflate data
    val fakeIdat = {
      val ihdr = new Array[Byte](13)
      ihdr(3) = 2; ihdr(7) = 2; ihdr(8) = 8 // 2x2 gray
      chunkify(Seq(("IHDR", ihdr), ("IDAT", Array[Byte](1, 2, 3)), ("IEND", Array.emptyByteArray)))
    }
    intercept[IllegalArgumentException](Png.decode(fakeIdat))
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](256)
    val out = new java.io.ByteArrayOutputStream()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
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
