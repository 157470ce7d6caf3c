package graft.tools

/** Differential mutant-parity check for the round-16 media containers
  * against the independent python readers in
  * tools/media_mutant_parity.py: for every single-byte XOR mutant of
  * every committed ogg/mkv fixture, agree on accept-vs-refuse and, when
  * both accept, on the canonical metadata hash. Both sides are
  * clean-room transcriptions of the same public specs (RFC 3533/7845/
  * Vorbis I; RFC 8794/Matroska) — disagreement means one transcription
  * drifted, the class of bug no single-sided typed-or-ok sweep can see.
  *
  * Usage: runMain graft.tools.MediaParity /tmp/media_parity
  * Exit 1 on any disagreement.
  */
object MediaParity {

  private def sha(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(x => f"${x & 0xff}%02x").mkString

  private def oggCanon(b: Array[Byte]): Either[String, String] =
    graft.ops.Ogg.parseSafe(b).map { m =>
      val parts = Seq(m.nPages.toString) ++ m.streams.map(s =>
        Seq(s.serial, s.codec, s.channels, s.sampleRate, s.preSkip,
          s.lastGranule, s.nPages, s.nPackets).mkString("|"))
      sha(parts.mkString("#"))
    }

  private def mkvCanon(b: Array[Byte]): Either[String, String] =
    graft.ops.Matroska.parseSafe(b).map { m =>
      val parts = Seq(m.docType, m.docTypeVersion.toString,
        m.timestampScale.toString, m.durationMs.toString,
        m.nClusters.toString, m.firstClusterTs.toString,
        m.lastClusterTs.toString, m.nBlocks.toString,
        m.blockBytes.toString) ++
        m.tracks.map(t => Seq(t.number, t.trackType, t.codecId, t.width,
          t.height, t.sampleRate.toLong, t.channels).mkString("|"))
      sha(parts.mkString("#"))
    }

  private def fixture(name: String): Array[Byte] =
    // tool main (Compile scope): read the committed fixture from the
    // source tree, same bytes the Test classpath serves
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      s"src/test/resources/fixtures/$name"))

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/media_parity")
    var exit = 0
    for ((kind, canon) <- Seq(
        "ogg" -> (oggCanon _), "mkv" -> (mkvCanon _))) {
      val bases = scala.collection.mutable.Map[String, Array[Byte]]()
      var total = 0L
      var agreeOk = 0L
      var agreeFail = 0L
      var hashMismatch = 0L
      var weAccept = 0L
      var weRefuse = 0L
      val examples = scala.collection.mutable.ArrayBuffer[String]()
      val src = scala.io.Source.fromFile(s"$dir/$kind.tsv")
      try {
        for (line <- src.getLines() if line.nonEmpty) {
          val f = line.split('\t')
          val (name, pos, x, v) = (f(0), f(1).toInt, f(2).toInt, f(3))
          val m = bases.getOrElseUpdate(name, fixture(name)).clone()
          if (pos >= 0) m(pos) = (m(pos) ^ x).toByte
          total += 1
          (canon(m), v) match {
            case (Right(h), "ok") =>
              if (h == f(4)) agreeOk += 1
              else {
                hashMismatch += 1
                if (examples.size < 12) examples += s"HASH $name pos=$pos x=$x"
              }
            case (Left(_), "fail") => agreeFail += 1
            case (Right(_), "fail") =>
              weAccept += 1
              if (examples.size < 12) examples += s"WE_ACCEPT $name pos=$pos x=$x"
            case (Left(k), "ok") =>
              weRefuse += 1
              if (examples.size < 12) examples += s"WE_REFUSE($k) $name pos=$pos x=$x"
          }
        }
      } finally src.close()
      println(s"[$kind] total=$total agreeOk=$agreeOk agreeFail=$agreeFail " +
        s"hashMismatch=$hashMismatch weAccept=$weAccept weRefuse=$weRefuse")
      examples.foreach(e => println(s"  $e"))
      if (hashMismatch > 0 || weAccept > 0 || weRefuse > 0) exit = 1
    }
    if (exit != 0) sys.exit(exit)
  }
}
