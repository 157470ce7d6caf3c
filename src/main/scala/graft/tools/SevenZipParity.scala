package graft.tools

/** Differential mutant-parity check for the 7z container against an
  * independent python reference reader (tools/sevenzip_mutant_parity.py:
  * a from-the-spec header walk whose payload codecs are real liblzma /
  * zlib / bz2 — a different language AND different codec cores). Two
  * modes, the [[ZipParity]] convention:
  *
  *   --dump <dir>: write the graft-written base archives for the python
  *     side to verdict — writer conformance rides on python being able
  *     to open every unmutated base (the python side also builds its own
  *     liblzma-coded bases, which exercise our reader under mutation).
  *   <dir>: replay every single-byte XOR mutant from 7z.tsv through
  *     [[graft.ops.SevenZip.readSafe]] and agree on accept-vs-refuse and
  *     canonical member bytes. One documented policy class:
  *       - policy_codec_slack: a mutant INSIDE a pack-stream region
  *         where the two LZMA cores disagree on accept (range-coder
  *         slack bits / consumption strictness). Only counted when the
  *         accepting side's substream CRCs all verified — never silent
  *         wrong bytes, strictness-only divergence.
  *
  * Exit 1 on any disagreement outside the policy class.
  */
object SevenZipParity {

  import graft.ops.SevenZip
  import SevenZip.SzMember

  private def sha(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)

  /** canonical hash over sorted (name, member-sha) — must mirror
    * tools/sevenzip_mutant_parity.py `canon` exactly
    */
  private def canon(members: Seq[SzMember]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val items = members.map(m => (m.name, sha(m.body)))
      .sortBy { case (n, h) => (n, h.map(x => f"${x & 0xff}%02x").mkString) }
    items.foreach { case (n, h) =>
      md.update(n.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.update('|'.toByte)
      md.update(h)
      md.update('#'.toByte)
    }
    md.digest().map(x => f"${x & 0xff}%02x").mkString
  }

  private def incompressible(n: Int): Array[Byte] = {
    var x = 0x12345678
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      x ^= x << 13; x ^= x >>> 17; x ^= x << 5
      out(i) = x.toByte
      i += 1
    }
    out
  }

  private def bases(): Seq[Array[Byte]] = {
    def a(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    Seq(
      SevenZip.write(Seq(M("mAA.txt", a("hello seven zip world ")),
        M("mBB.txt", a("line\n" * 40)),
        M("mCC.txt", Array.emptyByteArray))),
      SevenZip.write(Seq(M("bin/blob.dat", Array.tabulate(1024)(k => (k % 256).toByte)),
        M("bin/rand.dat", incompressible(512)))),
      SevenZip.write((0 until 8).map(k =>
        M(s"a/b/c${('a' + k).toChar}${('a' + k).toChar}.jsonl",
          a(s"""{"k":$k,"t":"${"x" * (20 + 13 * k)}"}""")))),
      SevenZip.write(Seq(M("héllo/wörld.txt", a("ünïcode päyload")),
        M("plain.txt", a("the quick brown fox. " * 30)))),
      SevenZip.write(Seq(M("solo.bin", incompressible(2048)))),
      SevenZip.write(Seq.empty))
  }

  private def M(n: String, b: Array[Byte]) = SzMember(n, b)

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--dump")) {
      val dir = java.nio.file.Paths.get(args(1))
      java.nio.file.Files.createDirectories(dir)
      bases().zipWithIndex.foreach { case (b, i) =>
        java.nio.file.Files.write(dir.resolve(s"sz_$i.bin"), b)
      }
      println(s"dumped ${bases().length} bases to ${args(1)}")
      return
    }
    val dir = args.headOption.getOrElse("/tmp/sz_parity")
    val graftBases = bases()
    graftBases.zipWithIndex.foreach { case (b, i) =>
      val onDisk = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/sz_$i.bin"))
      require(java.util.Arrays.equals(b, onDisk),
        s"base $i drifted since the dump step — rerun --dump")
    }
    // python-written bases (liblzma LZMA2/LZMA1, copy/deflate/bzip2,
    // encoded headers): read from disk, verdicted by the same tsv
    val allBases = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    allBases ++= graftBases
    var pi = graftBases.length
    while (java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/sz_$pi.bin"))) {
      allBases += java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/sz_$pi.bin"))
      pi += 1
    }

    // pack-stream extent per base for the codec-slack policy: everything
    // between the 32-byte signature header and the next header
    val packRegion: Seq[(Int, Int)] = allBases.toSeq.map { b =>
      def u64(off: Int): Long = {
        var v = 0L; var i = 0
        while (i < 8) { v |= (b(off + i) & 0xffL) << (8 * i); i += 1 }
        v
      }
      if (b.length < 32) (0, 0) else (32, (32 + u64(12)).toInt)
    }

    var total = 0L
    var agreeOk = 0L
    var agreeFail = 0L
    var hashMismatch = 0L
    var policyCodec = 0L
    var disagree = 0L
    val examples = scala.collection.mutable.ArrayBuffer[String]()

    val src = scala.io.Source.fromFile(s"$dir/7z.tsv")
    try {
      for (line <- src.getLines() if line.nonEmpty) {
        val f = line.split('\t')
        val (i, pos, x, v) = (f(0).toInt, f(1).toInt, f(2).toInt, f(3))
        val m = allBases(i).clone()
        if (pos >= 0) m(pos) = (m(pos) ^ x).toByte
        total += 1
        val inPack = pos >= packRegion(i)._1 && pos < packRegion(i)._2
        (SevenZip.readSafe(m), v) match {
          case (Right(ms), "ok") =>
            if (canon(ms) == f(4)) agreeOk += 1
            else {
              hashMismatch += 1
              if (examples.size < 12) examples += s"HASH i=$i pos=$pos x=$x"
            }
          case (Left(_), "fail") => agreeFail += 1
          case (Left(k), "ok") =>
            // we refuse what python accepts: legal only as codec slack
            // inside the pack region (python's CRCs verified on accept)
            if (inPack) policyCodec += 1
            else {
              disagree += 1
              if (examples.size < 12) examples += s"WE_REFUSE($k) i=$i pos=$pos x=$x"
            }
          case (Right(ms), "fail") =>
            // we accept what python refuses: legal only as codec slack
            // AND only because our accept path verified every substream
            // CRC (readSafe enforces them) — never silent wrong bytes
            if (inPack) policyCodec += 1
            else {
              disagree += 1
              if (examples.size < 12) examples += s"WE_ACCEPT i=$i pos=$pos x=$x n=${ms.length}"
            }
        }
      }
    } finally src.close()

    println(s"total=$total agree_ok=$agreeOk agree_fail=$agreeFail " +
      s"policy_codec_slack=$policyCodec hash_mismatch=$hashMismatch disagree=$disagree")
    examples.foreach(e => println(s"  $e"))
    if (hashMismatch > 0 || disagree > 0) {
      println("PARITY FAILURE")
      sys.exit(1)
    }
    println("PARITY OK")
  }
}
