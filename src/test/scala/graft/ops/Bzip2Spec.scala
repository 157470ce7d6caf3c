package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.US_ASCII

/** Locks on the hand-rolled bzip2 codec (graft.ops.Bzip2).
  *
  * Independence is pinned two ways: fixtures compressed by CPython's
  * `bz2` (real libbz2, tools/make_bz2_fixture.py) must decode bit-exact,
  * and commons-compress — the independent Java implementation on Spark's
  * own classpath — must round-trip OUR frames (and we theirs). Plus the
  * standing codec contract: deterministic frames, typed refusals on
  * poisoned input, the inflate-bomb budget cap, mutation totality.
  */
class Bzip2Spec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private val payload: Array[Byte] =
    (0 until 400).map(i => s"""{"id":$i,"text":"doc body $i rolls on"}""")
      .mkString("\n").getBytes(US_ASCII)

  private def withBudget[A](bytes: Long)(f: => A): A = {
    val old = graft.core.Budget.maxInflatedBytes
    graft.core.Budget.maxInflatedBytes = bytes
    try f finally graft.core.Budget.maxInflatedBytes = old
  }

  test("libbz2 fixtures decode bit-exact (single/multi block, multi-stream, runs, random, tiny, empty)") {
    for (name <- Seq("bz2_basic", "bz2_level1", "bz2_multi", "bz2_runs",
        "bz2_rand", "bz2_tiny", "bz2_empty")) {
      val raw = fixture(s"$name.raw")
      val got = Bzip2.decompress(fixture(s"$name.bz2"))
      assert(java.util.Arrays.equals(got, raw), s"$name mismatch")
    }
  }

  test("our round trip is exact and frames are deterministic") {
    for (lvl <- Seq(1, 9)) {
      val a = Bzip2.compress(payload, lvl)
      val b = Bzip2.compress(payload, lvl)
      assert(java.util.Arrays.equals(a, b))
      assert(java.util.Arrays.equals(Bzip2.decompress(a), payload))
    }
    assert(Bzip2.compress(payload).length < payload.length / 2)
  }

  test("commons-compress round-trips OUR frames, and we theirs") {
    import org.apache.commons.compress.compressors.bzip2.{
      BZip2CompressorInputStream, BZip2CompressorOutputStream}
    for (p <- Seq(payload,
        Array.emptyByteArray,
        Array.fill(300000)(7.toByte), // one long run, multi-block at level 1
        (0 until 250000).map(i => (i * 31 + (i >> 3)).toByte).toArray, // incompressible-ish, > 1 block
        "ab".* (50000).getBytes(US_ASCII))) { // period-2 rotations (BWT tie stress)
      // ours -> commons-compress
      val ours = Bzip2.compress(p, 1)
      val cin = new BZip2CompressorInputStream(
        new java.io.ByteArrayInputStream(ours), true)
      val theirs = try cin.readAllBytes() finally cin.close()
      assert(java.util.Arrays.equals(theirs, p), "commons-compress rejects our frame")
      // commons-compress -> ours
      val bos = new java.io.ByteArrayOutputStream()
      val cout = new BZip2CompressorOutputStream(bos, 1)
      cout.write(p); cout.close()
      assert(java.util.Arrays.equals(Bzip2.decompress(bos.toByteArray), p),
        "we reject a commons-compress frame")
    }
  }

  test("concatenated streams (pbzip2 layout) decode as one payload") {
    val a = "first stream body ".* (300).getBytes(US_ASCII)
    val b = "second stream body ".* (300).getBytes(US_ASCII)
    val cat = Bzip2.compress(a, 1) ++ Bzip2.compress(b, 1)
    assert(java.util.Arrays.equals(Bzip2.decompress(cat), a ++ b))
  }

  test("magic flip refuses bad_magic; truncation / bit rot refuse bad_frame") {
    val clean = Bzip2.compress(payload, 1)
    val flipped = clean.clone(); flipped(0) = (flipped(0) ^ 0x5a).toByte
    assert(Bzip2.decompressSafe(flipped) == Left("bad_magic"))
    val cut = java.util.Arrays.copyOf(clean, clean.length - 6)
    assert(Bzip2.decompressSafe(cut) == Left("bad_frame"))
    val rot = clean.clone(); rot(clean.length / 2) = (rot(clean.length / 2) ^ 0x10).toByte
    assert(Bzip2.decompressSafe(rot).isLeft) // CRC or structure, but typed
  }

  test("trailing garbage after the footer refuses bad_frame (python parity)") {
    // python bz2.decompress raises on non-stream trailing bytes
    val withJunk = Bzip2.compress(payload, 1) ++ Array[Byte]('J', 'U', 'N', 'K')
    assert(Bzip2.decompressSafe(withJunk) == Left("bad_frame"))
  }

  test("an RLE1 bomb refuses too_large at the budget, not at OOM") {
    val zeros = new Array[Byte](8 * 1024 * 1024)
    val bomb = Bzip2.compress(zeros, 9)
    assert(bomb.length < 10000, s"bomb is ${bomb.length}")
    withBudget(1024 * 1024) {
      assert(Bzip2.decompressSafe(bomb) == Left("too_large"))
    }
    assert(Bzip2.decompressSafe(bomb).map(_.length) == Right(zeros.length))
  }

  test("every single-byte mutation of a valid frame is typed, never a throw") {
    val clean = Bzip2.compress(
      (0 until 40).map(i => s"line $i of mutation fodder").mkString("\n")
        .getBytes(US_ASCII), 1)
    val kinds = Set("bad_magic", "bad_frame", "too_large", "unsupported")
    var checked = 0
    for (pos <- clean.indices; x <- Seq(0x01, 0x5a, 0x80, 0xff)) {
      val m = clean.clone(); m(pos) = (m(pos) ^ x).toByte
      Bzip2.decompressSafe(m) match {
        case Left(k) => assert(kinds.contains(k), s"pos=$pos x=$x kind=$k")
        case Right(_) => () // a mutation may luck into a valid frame
      }
      checked += 1
    }
    assert(checked > 500)
  }

  test("empty payload round-trips") {
    assert(Bzip2.decompress(Bzip2.compress(Array.emptyByteArray)).isEmpty)
  }

  test("deprecated randomized blocks decode per libbz2 (round-15 parity fix)") {
    // fixture synthesized by tools/make_bz2_randomized_fixture.py and
    // verified to decode CLEANLY through libbz2 itself; expected bytes are
    // libbz2's derandomized output (which DIFFERS from the plain payload,
    // so the BZ2_rNums XOR path is genuinely exercised)
    val exp = new String(fixture("bzip2_randomized_expected.json"),
      java.nio.charset.StandardCharsets.US_ASCII)
    val wantSha = "\"sha256\": \"([0-9a-f]+)\"".r
      .findFirstMatchIn(exp).get.group(1)
    val wantLen = "\"len\": (\\d+)".r.findFirstMatchIn(exp).get.group(1).toInt
    val got = Bzip2.decompress(fixture("bzip2_randomized.bz2"))
    assert(got.length == wantLen)
    val sha = java.security.MessageDigest.getInstance("SHA-256").digest(got)
      .map(b => f"${b & 0xff}%02x").mkString
    assert(sha == wantSha)
  }
}
