package graft.tools

/** Differential mutant-parity check for the ISOBMFF walk against the
  * independent python reader in tools/iso_mutant_parity.py (no
  * third-party mp4 parser exists in this container, so both sides are
  * clean-room transcriptions of ISO 14496-12 — the harness catches
  * asymmetric drift). Two modes, like ZipParity:
  *
  *   --dump <dir>: write the base files (the mm23/25/26 fixture shapes:
  *     a timed two-track MP4, a HEIF still, a sampled MP4 with
  *     stts/stsz tables, and a CMAF fMP4 with both trun arms + trex).
  *   <dir>: replay every mutant from iso.tsv; agree on accept/refuse
  *     and on the canonical metadata hash.
  *
  * Exit 1 on any disagreement.
  */
object IsoParity {

  private def sha(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(x => f"${x & 0xff}%02x").mkString

  private def canon(m: graft.ops.Isobmff.Meta): String = {
    val parts = Seq(m.majorBrand, m.compatibleBrands.mkString(","),
      m.timescale.toString, m.duration.toString, m.itemCodec,
      m.itemWidth.toString, m.itemHeight.toString) ++
      m.tracks.map(t => Seq(t.id, t.handler, t.codec, t.width, t.height,
        t.duration, t.mediaTimescale, t.nSamples, t.sampleBytes,
        t.mediaDuration).mkString("|")) ++
      m.fragments.map(f => Seq(f.seq, f.trackId, f.nSamples, f.sampleBytes,
        f.duration).mkString("|"))
    sha(parts.mkString("#"))
  }

  private def bases(): Seq[Array[Byte]] = {
    import graft.ops.Isobmff
    Seq(
      Isobmff.writeMp4("isom", Seq("isom", "mp41"), 1000L, 60097L,
        Seq((1L, "vide", "hvc1", 640, 360, 60000L),
          (2L, "soun", "mp4a", 0, 0, 59900L))),
      Isobmff.writeHeif("avif", Seq("avif", "mif1"), "av01", 512, 288),
      Isobmff.writeMp4Sampled("isom", Seq("isom", "mp41"), 1000L, 24000L,
        Seq((1L, "vide", "avc1", 640, 360, 24000L, 600L, 100L,
          Seq.tabulate(24)(k => 500L + k * 7)))),
      Isobmff.writeFmp4("cmfc", Seq("iso6", "cmfc"), 24000L,
        1L, "avc1", 1280, 720, 1001L, 4096L, Seq(
          Isobmff.FragSpec(1L, Seq.tabulate(6)(k =>
            (1000L + k % 7, 4000L + 29L * k))),
          Isobmff.FragSpec(2L, Nil, defaultCount = 12))))
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--dump")) {
      val dir = java.nio.file.Paths.get(args(1))
      java.nio.file.Files.createDirectories(dir)
      bases().zipWithIndex.foreach { case (b, i) =>
        java.nio.file.Files.write(dir.resolve(s"iso_$i.bin"), b)
      }
      println(s"dumped ${bases().length} bases to ${args(1)}")
      return
    }
    val dir = args.headOption.getOrElse("/tmp/iso_parity")
    val baseBytes = bases()
    baseBytes.zipWithIndex.foreach { case (b, i) =>
      val onDisk = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/iso_$i.bin"))
      require(java.util.Arrays.equals(b, onDisk),
        s"base $i drifted since the dump step — rerun --dump")
    }
    var total = 0L
    var agreeOk = 0L
    var agreeFail = 0L
    var hashMismatch = 0L
    var weAccept = 0L
    var weRefuse = 0L
    val examples = scala.collection.mutable.ArrayBuffer[String]()
    val src = scala.io.Source.fromFile(s"$dir/iso.tsv")
    try {
      for (line <- src.getLines() if line.nonEmpty) {
        val f = line.split('\t')
        val (i, pos, x, v) = (f(0).toInt, f(1).toInt, f(2).toInt, f(3))
        val m = baseBytes(i).clone()
        if (pos >= 0) m(pos) = (m(pos) ^ x).toByte
        total += 1
        (graft.ops.Isobmff.parseSafe(m), v) match {
          case (Right(meta), "ok") =>
            if (canon(meta) == f(4)) agreeOk += 1
            else {
              hashMismatch += 1
              if (examples.size < 12) examples += s"HASH i=$i pos=$pos x=$x"
            }
          case (Left(_), "fail") => agreeFail += 1
          case (Right(_), "fail") =>
            weAccept += 1
            if (examples.size < 12) examples += s"WE_ACCEPT i=$i pos=$pos x=$x"
          case (Left(k), "ok") =>
            weRefuse += 1
            if (examples.size < 12) examples += s"WE_REFUSE($k) i=$i pos=$pos x=$x"
        }
      }
    } finally src.close()
    println(s"[iso] total=$total agreeOk=$agreeOk agreeFail=$agreeFail " +
      s"hashMismatch=$hashMismatch weAccept=$weAccept weRefuse=$weRefuse")
    examples.foreach(e => println(s"  $e"))
    if (hashMismatch > 0 || weAccept > 0 || weRefuse > 0) sys.exit(1)
  }
}
