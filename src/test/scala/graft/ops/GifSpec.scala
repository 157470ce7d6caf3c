package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the pure-JVM GIF codec. The encoder only emits
  * clear-before-every-literal streams, so the dictionary-growth and KwKwK
  * paths of the decoder are pinned with HAND-PACKED LZW bit streams
  * (assembled bit by bit in the comments below), interlace with a
  * bit-flipped descriptor over pre-permuted rows, and extension skipping
  * with a spliced graphic-control block.
  */
class GifSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // 4-color palette: black, red, green, blue
  private val pal4 = bytes(0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255)

  test("encode/decode round trip: palette applied, header faithful") {
    val w = 7; val h = 5
    val idx = Array.tabulate(w * h)(i => ((i * 3 + 1) % 4).toByte)
    val gif = Gif.encode(w, h, pal4, idx)
    val (hd, rgb) = Gif.decode(gif)
    assert(hd == Gif.Header(w, h, 4, interlaced = false))
    for (i <- 0 until w * h; c <- 0 until 3)
      assert(rgb(i * 3 + c) == pal4((idx(i) & 0xff) * 3 + c), s"pixel $i ch $c")
    val (_, palBack, idxBack) = Gif.decodeIndexed(gif)
    assert(palBack.sameElements(pal4) && idxBack.sameElements(idx))
  }

  test("255-byte sub-block split round-trips on a large frame") {
    val w = 64; val h = 64
    val idx = Array.tabulate(w * h)(i => (i % 4).toByte)
    val (_, _, idxBack) = Gif.decodeIndexed(Gif.encode(w, h, pal4, idx))
    assert(idxBack.sameElements(idx))
  }

  test("hand-packed stream with dictionary growth and the KwKwK case") {
    // min code 2 → clear=4, end=5, width starts at 3. Pixels "aaaa"
    // (all index 0) via: CLEAR, 0, 6 (KwKwK: emits "aa"), 0, END.
    //   after CLEAR: next=6
    //   code 0: emits [0], prev=0
    //   code 6 == next: emits expand(prev)+head = [0,0]; dict[6]=(0,0), next=7
    //   code 0: emits [0]; dict[7]=(6,0), next=8 → width grows to 4
    //   END read at width 4
    // LSB-first packing: 100 000 110 000 0101 →
    //   byte0 = 4 | 0<<3 | (6 & 3)<<6          = 0x84
    //   byte1 = (6>>2) | 0<<1 | 5<<4           = 0x51
    val gif = bytes(
      'G', 'I', 'F', '8', '9', 'a',
      2, 0, 2, 0, // 2×2 screen
      0x81, 0, 0) ++ // GCT present, 4 entries (2^(1+1))
      pal4 ++
      bytes(0x2c, 0, 0, 0, 0, 2, 0, 2, 0, 0, // full-screen descriptor
        2, // LZW min code size
        2, 0x84, 0x51, // one 2-byte data sub-block
        0, 0x3b)
    val (hd, _, idx) = Gif.decodeIndexed(gif)
    assert(hd == Gif.Header(2, 2, 4, interlaced = false))
    assert(idx.sameElements(Array[Byte](0, 0, 0, 0)))
  }

  test("hand-packed compressed stream reusing a dictionary entry") {
    // Pixels "ababab" (3×2 frame): CLEAR, 0, 1, 6, 6, END.
    //   code 0: [a], prev=0
    //   code 1: [b]; dict[6]=(0,b), next=7, prev=1
    //   code 6: [a,b]; dict[7]=(1,a), next=8 → width 4, prev=6
    //   code 6: [a,b]; dict[8]=(6,a), next=9, prev=6
    //   END at width 4
    // LSB-first packing (the first 6 is still width 3; the dictionary
    // reaches 8 entries while processing it, so the SECOND 6 and END read
    // at width 4):
    //   byte0 = 4 | 0<<3 | (1 low 2 bits)<<6   = 0x44
    //   byte1 = (1>>2) | 6<<1 | (6 low 4)<<4   = 0x6c
    //   byte2 = 5                              = 0x05
    val gif = bytes(
      'G', 'I', 'F', '8', '9', 'a',
      3, 0, 2, 0,
      0x81, 0, 0) ++ pal4 ++
      bytes(0x2c, 0, 0, 0, 0, 3, 0, 2, 0, 0,
        2, 3, 0x44, 0x6c, 0x05, 0, 0x3b)
    val (_, _, idx) = Gif.decodeIndexed(gif)
    assert(idx.sameElements(Array[Byte](0, 1, 0, 1, 0, 1)))
  }

  test("4-pass interlace row order is unwound") {
    val w = 3; val h = 5
    // desired image: row y filled with (y % 4); transmitted order for h=5
    // is rows 0, 4, 2, 1, 3
    val want = Array.tabulate(w * h)(i => ((i / w) % 4).toByte)
    val transmitted = Array(0, 4, 2, 1, 3).flatMap(y =>
      Array.fill(w)((y % 4).toByte))
    val flat = Gif.encode(w, h, pal4, transmitted)
    // flip the interlace bit in the image descriptor's packed byte:
    // 13-byte header+LSD, 12-byte GCT, descriptor packed field at +9
    val o = 13 + 12 + 9
    assert(flat(o) == 0)
    flat(o) = 0x40.toByte
    val (hd, _, idx) = Gif.decodeIndexed(flat)
    assert(hd.interlaced)
    assert(idx.sameElements(want))
  }

  test("extension blocks are skipped by their sub-block framing") {
    val idx = Array.tabulate(4)(i => i.toByte)
    val flat = Gif.encode(2, 2, pal4, idx)
    // splice a graphic-control extension between the GCT and the
    // image descriptor (offset 25 = 13 + 12)
    val gce = bytes(0x21, 0xf9, 4, 0, 10, 0, 0, 0)
    val spliced = flat.take(25) ++ gce ++ flat.drop(25)
    val (_, _, idxBack) = Gif.decodeIndexed(spliced)
    assert(idxBack.sameElements(idx))
  }

  test("refusals: signature, truncation, dictionary overrun, short stream") {
    val good = Gif.encode(2, 2, pal4, Array[Byte](0, 1, 2, 3))
    // bad signature
    val badSig = good.clone(); badSig(4) = '7'; badSig(5) = 'x'
    assertThrows[IllegalArgumentException](Gif.decode(badSig))
    // truncated mid color table
    assertThrows[IllegalArgumentException](Gif.decode(good.take(20)))
    // code beyond dictionary: CLEAR then code 7 with next=6
    // packing: 100 111 → byte0 = 4 | 7<<3 = 0x3c
    val overrun = bytes('G', 'I', 'F', '8', '9', 'a', 1, 0, 1, 0, 0x81, 0, 0) ++
      pal4 ++ bytes(0x2c, 0, 0, 0, 0, 1, 0, 1, 0, 0, 2, 1, 0x3c, 0, 0x3b)
    assertThrows[IllegalArgumentException](Gif.decode(overrun))
    // stream ends (END code) before the frame is filled: CLEAR, 0, END
    // packing: 100 000 101 → byte0 = 4 | 0<<3 | (5&3)<<6 = 0x44, byte1 = 5>>2 = 1
    val short = bytes('G', 'I', 'F', '8', '9', 'a', 2, 0, 1, 0, 0x81, 0, 0) ++
      pal4 ++ bytes(0x2c, 0, 0, 0, 0, 2, 0, 1, 0, 0, 2, 2, 0x44, 0x01, 0, 0x3b)
    assertThrows[IllegalArgumentException](Gif.decode(short))
  }

  test("BinaryMediaDecoder: decode features, animation frames, exact palette-space resize") {
    val w = 8; val h = 4
    val idx = Array.tabulate(w * h)(i => ((i / w) % 4).toByte) // row-colored
    val blob = Multimodal.Blob(3L, Gif.encode(w, h, pal4, idx), "image/gif", Map.empty)
    val d = BinaryMediaDecoder.decode(blob)
    assert(d.width == w && d.height == h && d.n_frames == 1)
    assert(d.features.length == 8)
    // frame(0) on a single-frame GIF is the whole decoded RGB raster
    val f0 = BinaryMediaDecoder.frame(blob, 0)
    assert(f0.sameElements(Gif.decode(blob.content)._2))
    intercept[IllegalArgumentException](BinaryMediaDecoder.frame(blob, 1))
    // downsample 2×: nearest-neighbor keeps rows 0 and 2 (black, green)
    val resized = BinaryMediaDecoder.resize(blob, 4, 2)
    val (rh, rpal, ridx) = Gif.decodeIndexed(resized)
    assert(rh == Gif.Header(4, 2, 4, interlaced = false))
    assert(rpal.sameElements(pal4))
    assert(ridx.sameElements(Array[Byte](0, 0, 0, 0, 2, 2, 2, 2)))
  }

  test("animated GIF: frameMeta counts without decode; decodeAnim round-trips frames") {
    val w = 8; val h = 6
    val frames = (0 until 5).map { f =>
      (Array.tabulate(w * h)(i => (((i * 7 + f * 3) % 4)).toByte), 10 + f * 5)
    }
    val gif = Gif.encodeAnim(w, h, pal4, frames)
    val (n, delay) = Gif.frameMeta(gif)
    assert(n == 5 && delay == (10 + 15 + 20 + 25 + 30))
    val anim = Gif.decodeAnim(gif)
    assert(anim.screenW == w && anim.screenH == h && anim.frames.length == 5)
    anim.frames.zipWithIndex.foreach { case (fr, i) =>
      assert(fr.w == w && fr.h == h && fr.x == 0 && fr.y == 0)
      assert(fr.delayCs == frames(i)._2, s"frame $i delay")
      assert(fr.indices.sameElements(frames(i)._1), s"frame $i pixels")
    }
    // decode()/decodeIndexed keep the first-frame contract
    val (hd, px) = Gif.decode(gif)
    assert(hd == Gif.Header(w, h, 4, interlaced = false))
    assert(px.sameElements(anim.frames.head.rgb))
    // decodeFrame skips earlier frames' LZW and agrees with the full walk
    for (i <- 0 until 5) {
      val f = Gif.decodeFrame(gif, i)
      assert(f.indices.sameElements(anim.frames(i).indices), s"frame $i")
      assert(f.delayCs == anim.frames(i).delayCs, s"frame $i delay")
    }
    val e = intercept[IllegalArgumentException](Gif.decodeFrame(gif, 5))
    assert(e.getMessage.contains("out of range"))
  }

  test("long animation: metadata walk and single-frame decode stay cheap") {
    // 500 frames: frameMeta must not LZW-decode (sub-ms per block), and
    // decodeFrame(last) must skip 499 frames' pixel data by framing alone
    val w = 16; val h = 16
    val frames = (0 until 500).map { f =>
      (Array.tabulate(w * h)(i => ((i + f) % 4).toByte), 3)
    }
    val gif = Gif.encodeAnim(w, h, pal4, frames)
    val t0 = System.nanoTime()
    val (n, delay) = Gif.frameMeta(gif)
    val metaMs = (System.nanoTime() - t0) / 1e6
    assert(n == 500 && delay == 1500)
    val last = Gif.decodeFrame(gif, 499)
    assert(last.indices.sameElements(frames(499)._1))
    // generous bound: the walk is O(blocks); a full 500-frame LZW decode
    // would be ~100× slower than a single frame's
    assert(metaMs < 200, s"frameMeta took $metaMs ms")
  }

  test("animated GIF through the Multimodal surface: n_frames and frame sampling") {
    val session = graft.SparkSpec.session
    import session.implicits._
    val w = 8; val h = 8
    val frames = (0 until 7).map { f =>
      (Array.tabulate(w * h)(i => ((i + f) % 4).toByte), 4)
    }
    val blob = Multimodal.Blob(9L, Gif.encodeAnim(w, h, pal4, frames),
      "image/gif", Map.empty)
    val d = BinaryMediaDecoder.decode(blob)
    assert(d.n_frames == 7)
    // frame(3) is the 4th animation frame's RGB, as transmitted
    val f3 = BinaryMediaDecoder.frame(blob, 3)
    val expect = Gif.decodeAnim(blob.content).frames(3).rgb
    assert(f3.sameElements(expect))
    // sampleFrames samples evenly over the ANIMATION (idx 0, 3, 6)
    val ds = session.createDataset(Seq(blob))
    val sampled = Multimodal.sampleFrames(ds, 3, BinaryMediaDecoder)
      .collect().sortBy(_.frame_idx)
    assert(sampled.map(_.frame_idx).toSeq == Seq(0, 3, 6))
    assert(sampled(1).content.sameElements(expect))
  }
}
