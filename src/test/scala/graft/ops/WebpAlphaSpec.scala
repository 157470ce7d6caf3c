package graft.ops

/** Locks on the ALPH alpha-plane decode (graft.ops.Webp.decodeAlpha) —
  * the lossy-with-transparency WebP layout (VP8X + ALPH + VP8):
  * differential alpha recovery against libwebp-encoded stills (the alpha
  * plane in this layout is LOSSLESS, so byte-exact match is required
  * even though the stream is "lossy"), raw-compression round trips
  * through all four filter methods, container metadata, and typed
  * refusals. Fixtures from tools/make_webp_alpha_fixture.py.
  */
class WebpAlphaSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private def expectedAlpha(name: String): (Int, Int, Array[Byte]) = {
    val b = fixture(name)
    val w = (b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16)
    val h = (b(4) & 0xff) | ((b(5) & 0xff) << 8) | ((b(6) & 0xff) << 16)
    (w, h, java.util.Arrays.copyOfRange(b, 8, b.length))
  }

  test("libwebp lossy-with-alpha stills: alpha plane recovers byte-exact") {
    for (name <- Seq("gradient", "sprite", "noise"); q <- Seq(30, 75, 95)) {
      val webp = fixture(s"webp_alpha_${name}_q$q.webp")
      val (w, h, want) = expectedAlpha(s"webp_alpha_${name}_q$q.alpha")
      val (hd, rgba) = Webp.decode(webp)
      assert(hd.w == w && hd.h == h && hd.hasAlpha, s"$name q$q header")
      val got = Array.tabulate(w * h)(i => rgba(i * 4 + 3))
      assert(java.util.Arrays.equals(got, want), s"$name q$q alpha plane")
    }
  }

  test("fully opaque input drops ALPH and decodes opaque") {
    val webp = fixture("webp_alpha_opaque_q75.webp")
    val (hd, rgba) = Webp.decode(webp)
    assert(!hd.hasAlpha)
    assert((3 until rgba.length by 4).forall(i => (rgba(i) & 0xff) == 0xff))
  }

  test("raw-compression ALPH round-trips through all four filter methods") {
    val w = 19
    val h = 11
    val plane = Array.tabulate(w * h)(i =>
      (((i * 37) % 251) + (if (i % 13 == 0) 0 else 4)).toByte)
    for (method <- 0 to 3) {
      val chunk = Webp.encodeAlphaRaw(plane, w, h, method)
      val back = Webp.decodeAlpha(chunk, 0, chunk.length, w, h)
      assert(java.util.Arrays.equals(back, plane), s"filter $method")
    }
  }

  test("refusals are typed: reserved bits, bad method, truncation, VP8L transform") {
    val plane = Array.fill(12)(7.toByte)
    val ok = Webp.encodeAlphaRaw(plane, 4, 3, 1)
    def expectFail(b: Array[Byte], frag: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        Webp.decodeAlpha(b, 0, b.length, 4, 3)
      }
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    val reserved = ok.clone(); reserved(0) = (reserved(0) | 0x40).toByte
    expectFail(reserved, "reserved")
    val badComp = ok.clone(); badComp(0) = (badComp(0) | 0x02).toByte
    expectFail(badComp, "compression")
    expectFail(java.util.Arrays.copyOf(ok, ok.length - 3), "truncated")
    // compression method 1 with a truncated VP8L body refuses typed
    val tx = Array[Byte](0x01, 0x01)
    intercept[IllegalArgumentException] {
      Webp.decodeAlpha(tx, 0, tx.length, 4, 3)
    }
  }

  test("mutation sweep over a libwebp alpha still: typed or decodes, never a raw throw") {
    val clean = fixture("webp_alpha_sprite_q75.webp")
    for (pos <- clean.indices; x <- Seq(0x01, 0x5a, 0x80)) {
      val m = clean.clone(); m(pos) = (m(pos) ^ x).toByte
      try { Webp.decode(m); () }
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable => fail(s"pos $pos x=$x: ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }
}
