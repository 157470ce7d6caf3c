package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.US_ASCII

/** Locks on the xz/LZMA2/LZMA reader (graft.ops.Xz).
  *
  * Independence is pinned two ways: fixtures compressed by CPython's
  * `lzma` (real liblzma, tools/make_xz_fixture.py — every check type,
  * custom lc/lp/pb chains, incompressible and run-heavy payloads,
  * multi-chunk blocks, padded multi-stream files) decode bit-exact, and
  * the tukaani reference encoder on Spark's classpath (which also backs
  * Xz.compress) is round-tripped across presets and forced multi-block
  * layouts. Plus the standing codec contract: typed refusals, the
  * inflate-bomb budget cap, mutation totality.
  */
class XzSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private val payload: Array[Byte] =
    (0 until 500).map(i => s"""{"id":$i,"text":"xz spec body $i rolls on"}""")
      .mkString("\n").getBytes(US_ASCII)

  private def withBudget[A](bytes: Long)(f: => A): A = {
    val old = graft.core.Budget.maxInflatedBytes
    graft.core.Budget.maxInflatedBytes = bytes
    try f finally graft.core.Budget.maxInflatedBytes = old
  }

  test("liblzma fixtures decode bit-exact (checks, lc/lp/pb chains, chunks, runs, rand, multi-stream, tiny, empty)") {
    for (name <- Seq("xz_crc32", "xz_crc64", "xz_sha256", "xz_nocheck",
        "xz_lc0lp2", "xz_lc1lp1pb0", "xz_rand", "xz_runs", "xz_chunks",
        "xz_multi", "xz_empty", "xz_tiny")) {
      val raw = fixture(s"$name.raw")
      val got = Xz.decompress(fixture(s"$name.xz"))
      assert(java.util.Arrays.equals(got, raw), s"$name mismatch")
    }
  }

  test("our round trip (tukaani writer -> hand-rolled reader) across presets and checks") {
    for (preset <- Seq(0, 1, 6, 9); check <- Seq(0, 1, 4, 10)) {
      val frame = Xz.compress(payload, preset, check)
      assert(java.util.Arrays.equals(Xz.decompress(frame), payload),
        s"preset=$preset check=$check")
    }
    // deterministic frames
    assert(java.util.Arrays.equals(Xz.compress(payload), Xz.compress(payload)))
  }

  test("multi-block streams (flush boundaries) decode exactly") {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new org.tukaani.xz.XZOutputStream(bos, new org.tukaani.xz.LZMA2Options(3), 4)
    val third = payload.length / 3
    out.write(payload, 0, third); out.endBlock()
    out.write(payload, third, third); out.endBlock()
    out.write(payload, 2 * third, payload.length - 2 * third)
    out.close()
    assert(java.util.Arrays.equals(Xz.decompress(bos.toByteArray), payload))
  }

  test("tukaani round-trips nothing we refuse: stress payload shapes") {
    for (p <- Seq(Array.emptyByteArray,
        Array.fill(300000)(7.toByte),
        (0 until 260000).map(i => (i * 31 + (i >> 5)).toByte).toArray,
        "ab".* (60000).getBytes(US_ASCII))) {
      assert(java.util.Arrays.equals(Xz.decompress(Xz.compress(p, 1, 1)), p))
    }
  }

  test("concatenated streams with and without stream padding decode as one payload") {
    val a = "first xz stream ".* (200).getBytes(US_ASCII)
    val b = "second xz stream ".* (200).getBytes(US_ASCII)
    val plain = Xz.compress(a, 1, 1) ++ Xz.compress(b, 1, 10)
    assert(java.util.Arrays.equals(Xz.decompress(plain), a ++ b))
    val padded = Xz.compress(a, 1, 4) ++ Array.fill(8)(0.toByte) ++ Xz.compress(b, 1, 1) ++
      Array.fill(4)(0.toByte)
    assert(java.util.Arrays.equals(Xz.decompress(padded), a ++ b))
  }

  test("magic flip refuses bad_magic; truncation / bit rot refuse typed") {
    val clean = Xz.compress(payload, 1, 1)
    val flipped = clean.clone(); flipped(0) = (flipped(0) ^ 0x5a).toByte
    assert(Xz.decompressSafe(flipped) == Left("bad_magic"))
    val cut = java.util.Arrays.copyOf(clean, clean.length - 7)
    assert(Xz.decompressSafe(cut) == Left("bad_frame"))
    val rot = clean.clone(); rot(clean.length / 2) = (rot(clean.length / 2) ^ 0x10).toByte
    assert(Xz.decompressSafe(rot).isLeft)
  }

  test("misaligned stream padding and trailing garbage refuse bad_frame") {
    val s = Xz.compress(payload, 0, 1)
    assert(Xz.decompressSafe(s ++ Array.fill(3)(0.toByte)).isLeft)
    assert(Xz.decompressSafe(s ++ "JUNK".getBytes(US_ASCII)) == Left("bad_frame"))
  }

  test("delta+LZMA2 chains decode exactly (xz --delta layout, tukaani-written)") {
    for (dist <- Seq(1, 4, 16)) {
      val bos = new java.io.ByteArrayOutputStream()
      val chain = Array[org.tukaani.xz.FilterOptions](
        new org.tukaani.xz.DeltaOptions(dist), new org.tukaani.xz.LZMA2Options(1))
      val out = new org.tukaani.xz.XZOutputStream(bos, chain, 1)
      out.write(payload); out.close()
      assert(java.util.Arrays.equals(Xz.decompress(bos.toByteArray), payload),
        s"delta dist=$dist")
    }
  }

  test("liblzma delta fixture decodes bit-exact") {
    val raw = fixture("xz_delta.raw")
    assert(java.util.Arrays.equals(Xz.decompress(fixture("xz_delta.xz")), raw))
  }

  test("legacy .lzma alone fixtures (liblzma, unknown-size + end marker) decode bit-exact") {
    for (name <- Seq("lzma_alone", "lzma_alone_lp2")) {
      val raw = fixture(s"$name.raw")
      assert(java.util.Arrays.equals(Xz.decompressAlone(fixture(s"$name.lzma")), raw),
        s"$name mismatch")
    }
  }

  test("alone round trip (tukaani writer): size-declared and marker-terminated") {
    for (p <- Seq(payload, Array.emptyByteArray, Array.fill(200000)(7.toByte));
        sizeKnown <- Seq(true, false)) {
      val frame = Xz.compressAlone(p, 1, sizeKnown)
      assert(java.util.Arrays.equals(Xz.decompressAlone(frame), p),
        s"len=${p.length} sizeKnown=$sizeKnown")
    }
  }

  test("alone refusals: truncation, trailing garbage, bombs, bad props") {
    val clean = Xz.compressAlone(payload, 1, sizeKnown = false)
    assert(Xz.decompressAloneSafe(java.util.Arrays.copyOf(clean, clean.length - 4))
      .isLeft)
    assert(Xz.decompressAloneSafe(clean ++ Array[Byte](1, 2, 3)) == Left("bad_frame"))
    val badProps = clean.clone(); badProps(0) = 0xe1.toByte // 225
    assert(Xz.decompressAloneSafe(badProps) == Left("bad_frame"))
    // declared-size bomb: 1 TiB in the header, budget refusal before allocation
    val bomb = Xz.compressAlone(payload, 1, sizeKnown = true)
    val lied = bomb.clone()
    for (i <- 5 until 13) lied(i) = (if (i < 10) 0xff else 0x00).toByte
    assert(Xz.decompressAloneSafe(lied) == Left("too_large"))
    // unknown-size RLE bomb under a small budget
    val zeros = Xz.compressAlone(new Array[Byte](8 * 1024 * 1024), 6, sizeKnown = false)
    withBudget(1024 * 1024) {
      assert(Xz.decompressAloneSafe(zeros) == Left("too_large"))
    }
    // mutation totality
    val kinds = Set("bad_magic", "bad_frame", "too_large", "unsupported")
    for (pos <- clean.indices; x <- Seq(0x01, 0x5a, 0xff)) {
      val m = clean.clone(); m(pos) = (m(pos) ^ x).toByte
      Xz.decompressAloneSafe(m) match {
        case Left(k) => assert(kinds.contains(k), s"pos=$pos x=$x kind=$k")
        case Right(_) => ()
      }
    }
  }

  test("BCJ filter chains refuse unsupported (x86 fixture via tukaani)") {
    val bos = new java.io.ByteArrayOutputStream()
    val chain = Array[org.tukaani.xz.FilterOptions](
      new org.tukaani.xz.X86Options(), new org.tukaani.xz.LZMA2Options(1))
    val out = new org.tukaani.xz.XZOutputStream(bos, chain, 1)
    out.write(payload); out.close()
    assert(Xz.decompressSafe(bos.toByteArray) == Left("unsupported"))
  }

  test("an LZMA bomb refuses too_large at the budget, not at OOM") {
    val zeros = new Array[Byte](16 * 1024 * 1024)
    val bomb = Xz.compress(zeros, 6, 1)
    assert(bomb.length < 10000, s"bomb is ${bomb.length}")
    withBudget(1024 * 1024) {
      assert(Xz.decompressSafe(bomb) == Left("too_large"))
    }
    assert(Xz.decompressSafe(bomb).map(_.length) == Right(zeros.length))
  }

  test("every single-byte mutation of a valid frame is typed, never a throw") {
    val clean = Xz.compress(
      (0 until 50).map(i => s"mutation fodder line $i").mkString("\n")
        .getBytes(US_ASCII), 1, 1)
    val kinds = Set("bad_magic", "bad_frame", "too_large", "unsupported")
    for (pos <- clean.indices; x <- Seq(0x01, 0x5a, 0x80, 0xff)) {
      val m = clean.clone(); m(pos) = (m(pos) ^ x).toByte
      Xz.decompressSafe(m) match {
        case Left(k) => assert(kinds.contains(k), s"pos=$pos x=$x kind=$k")
        case Right(_) => ()
      }
    }
  }

  test("empty payload round-trips") {
    assert(Xz.decompress(Xz.compress(Array.emptyByteArray)).isEmpty)
  }

  test("dict-size clamp holds at >= 1 GiB inputs (no Int overflow collapse)") {
    val preset = 8 << 20 // preset-6 default dict, 8 MiB
    // small inputs: clamp to the payload scale, never below the 4 KiB floor
    assert(Xz.clampDictSize(preset, 100) == org.tukaani.xz.LZMA2Options.DICT_SIZE_MIN)
    assert(Xz.clampDictSize(preset, 1 << 20) == 2 << 20)
    // >= 1 GiB: highestOneBit*2 overflows Int — the clamp must keep the
    // full preset dict, not collapse to the 4 KiB minimum
    assert(Xz.clampDictSize(preset, (1 << 30) + 7) == preset)
    assert(Xz.clampDictSize(preset, Int.MaxValue) == preset)
  }
}
