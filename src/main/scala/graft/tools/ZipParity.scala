package graft.tools

/** Differential mutant-parity check for the ZIP reader + writers against
  * python zipfile (tools/zip_mutant_parity.py). Two modes:
  *
  *   --dump <dir>: write the base archives (classic JDK-stream zips AND
  *     forced-zip64 archives from [[graft.ops.Zip.writeZip64]]) for the
  *     python side to verdict — writer conformance rides on python being
  *     able to open every base.
  *   <dir>: replay every single-byte XOR mutant from zip.tsv, agree on
  *     accept-vs-refuse and canonical member bytes. Documented policy
  *     classes (see the python header): policy_central_meta (the two
  *     readers trust different copies of the redundant metadata; only
  *     legal when the mutant sits in the central-directory/tail region)
  *     and policy_stream_strict (JDK local-header strictness python's
  *     central-driven reader never sees). Also walks zip_big.bin — a
  *     genuine python-written >65535-entry zip64-EOCD archive — and
  *     checks the canonical hash.
  *
  * Exit 1 on any disagreement outside the policy classes.
  */
object ZipParity {

  private def sha(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)

  /** canonical hash over sorted (name, member-sha) — must mirror
    * tools/zip_mutant_parity.py `canon` exactly
    */
  private def canon(members: Seq[graft.ops.Zip.ZipMember]): String = {
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
    // deterministic xorshift32, same shape as the codec harness
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
    import graft.ops.Zip.{ZipMember => M, write, writeZip64}
    Seq(
      write(Seq(M("mAA.txt", "hello zip world ".getBytes("UTF-8")),
        M("mBB.txt", ("line\n" * 40).getBytes("UTF-8")),
        M("mCC.txt", Array.emptyByteArray))),
      write(Seq(M("bin/blob.dat", Array.tabulate(1024)(k => (k % 256).toByte)),
        M("bin/rand.dat", incompressible(512)))),
      write((0 until 8).map(k =>
        M(s"a/b/c${('a' + k).toChar}${('a' + k).toChar}.jsonl",
          s"""{"k":$k,"t":"${"x" * (20 + 13 * k)}"}""".getBytes("UTF-8")))),
      writeZip64(Seq(M("mAA.txt", "hello zip64 world ".getBytes("UTF-8")),
        M("mBB.txt", ("line\n" * 40).getBytes("UTF-8")),
        M("mCC.txt", Array.emptyByteArray))),
      writeZip64(Seq(M("big/rand.dat", incompressible(4096)))),
      writeZip64(Seq(M("héllo/wörld.txt", "ünïcode".getBytes("UTF-8")),
        M("plain.txt", ("the quick brown fox. " * 30).getBytes("UTF-8")))))
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--dump")) {
      val dir = java.nio.file.Paths.get(args(1))
      java.nio.file.Files.createDirectories(dir)
      bases().zipWithIndex.foreach { case (b, i) =>
        java.nio.file.Files.write(dir.resolve(s"zip_$i.bin"), b)
      }
      println(s"dumped ${bases().length} bases to ${args(1)}")
      return
    }
    val dir = args.headOption.getOrElse("/tmp/zip_parity")
    val baseBytes = bases()
    // the dump and the check must see identical bases (a drifted writer
    // would silently skew every verdict)
    baseBytes.zipWithIndex.foreach { case (b, i) =>
      val onDisk = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/zip_$i.bin"))
      require(java.util.Arrays.equals(b, onDisk),
        s"base $i drifted since the dump step — rerun --dump")
    }

    // region bounds for the policy classifier: the central directory and
    // everything after it (EOCD / zip64 record / locator)
    val centralStart = baseBytes.map { b =>
      var p = 0
      var at = -1
      while (p + 4 <= b.length && at < 0) {
        if (b(p) == 'P' && b(p + 1) == 'K' && b(p + 2) == 0x01 && b(p + 3) == 0x02)
          at = p
        p += 1
      }
      at
    }

    var total = 0L
    var agreeOk = 0L
    var agreeFail = 0L
    var hashMismatch = 0L
    var policyCentral = 0L
    var policyStream = 0L
    var policyNameEnc = 0L
    var weAccept = 0L
    val examples = scala.collection.mutable.ArrayBuffer[String]()

    // local-header offsets per base, for the name-encoding policy guard
    val localHeaders: Seq[Seq[Int]] = baseBytes.map { b =>
      (0 to b.length - 4).filter(p => b(p) == 'P' && b(p + 1) == 'K' &&
        b(p + 2) == 0x03 && b(p + 3) == 0x04)
    }

    val src = scala.io.Source.fromFile(s"$dir/zip.tsv")
    try {
      for (line <- src.getLines() if line.nonEmpty) {
        val f = line.split('\t')
        val (i, pos, x, v) = (f(0).toInt, f(1).toInt, f(2).toInt, f(3))
        val m = baseBytes(i).clone()
        if (pos >= 0) m(pos) = (m(pos) ^ x).toByte
        total += 1
        (graft.ops.Zip.readSafe(m), v) match {
          case (Right(ms), "ok") =>
            if (canon(ms) == f(4)) agreeOk += 1
            else {
              hashMismatch += 1
              if (examples.size < 12) examples += s"HASH i=$i pos=$pos x=$x"
            }
          case (Left(_), "fail") => agreeFail += 1
          case (Left(_), "ok") =>
            // we refuse, python accepts: legal only as one of the two
            // documented strictness policies
            if (pos >= centralStart(i)) policyCentral += 1
            else policyStream += 1
          case (Right(_), "fail") =>
            // we accept what python refuses — with python reading the
            // central copy and us the local copy, a central-region mutant
            // (e.g. the central CRC python checks and we don't need) can
            // flip python alone; anywhere else it's a real finding
            if (pos >= centralStart(i)) policyCentral += 1
            else if (localHeaders(i).exists(l => pos == l + 7) && (x & 0x08) != 0)
              // the mutant toggles bit 11 (UTF-8 names) in a LOCAL
              // general-purpose flag: python decodes the local name with
              // the local flag (cp437 here) and refuses the central
              // mismatch; the JDK decodes UTF-8 both sides. Payload is
              // CRC-verified either way — encoding policy, not bytes.
              policyNameEnc += 1
            else {
              weAccept += 1
              if (examples.size < 12) examples += s"WE_ACCEPT i=$i pos=$pos x=$x"
            }
        }
      }
    } finally src.close()

    // the genuine zip64-EOCD archive python wrote (65600 entries)
    val bigTsv = scala.io.Source.fromFile(s"$dir/zip_big.tsv")
    val bigHash = try bigTsv.getLines().next().split('\t')(2)
    finally bigTsv.close()
    val big = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/zip_big.bin"))
    val bigMembers = graft.ops.Zip.read(big)
    val bigOk = bigMembers.length == 65600 && canon(bigMembers) == bigHash

    println(s"total=$total agreeOk=$agreeOk agreeFail=$agreeFail " +
      s"policyCentral=$policyCentral policyStream=$policyStream " +
      s"policyNameEnc=$policyNameEnc " +
      s"hashMismatch=$hashMismatch weAccept=$weAccept " +
      s"big(65600, zip64 EOCD)=${if (bigOk) "ok" else "MISMATCH"}")
    examples.foreach(e => println(s"  $e"))
    if (hashMismatch > 0 || weAccept > 0 || !bigOk) sys.exit(1)
  }
}
