package graft.tools

/** Differential mutant-parity check for the SRT/WebVTT cue parsers
  * against the independent python readers in
  * tools/subs_mutant_parity.py. Text formats keep most single-byte
  * mutants parseable, so this is primarily a VALUE-agreement harness:
  * thousands of accepted mutants must yield identical (start, end,
  * text) cue lists on both sides — the silent-wrong class a
  * typed-or-ok sweep can't see.
  *
  * Usage: runMain graft.tools.SubsParity /tmp/subs_parity
  * Exit 1 on any disagreement.
  */
object SubsParity {

  private def canon(cues: graft.ops.Subtitles.Cues): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    cues.cues.foreach { c =>
      md.update(s"${c.startMs}|${c.endMs}|"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.update(c.text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.update('#'.toByte)
    }
    md.digest().map(x => f"${x & 0xff}%02x").mkString
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/subs_parity")
    var exit = 0
    for ((kind, parse) <- Seq[(String, String => Either[String, graft.ops.Subtitles.Cues])](
        "srt" -> graft.ops.Subtitles.parseSrtSafe,
        "vtt" -> graft.ops.Subtitles.parseVttSafe)) {
      val bases = scala.collection.mutable.Map[Int, String]()
      def base(i: Int): String = bases.getOrElseUpdate(i,
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$dir/${kind}_$i.txt")),
          java.nio.charset.StandardCharsets.UTF_8))
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
          val (i, pos, o, v) = (f(0).toInt, f(1).toInt, f(2).toInt, f(3))
          val b = base(i)
          val m = if (pos < 0) b
            else b.substring(0, pos) + o.toChar + b.substring(pos + 1)
          total += 1
          (parse(m), v) match {
            case (Right(c), "ok") =>
              if (canon(c) == f(4)) agreeOk += 1
              else {
                hashMismatch += 1
                if (examples.size < 12) examples += s"HASH i=$i pos=$pos o=$o"
              }
            case (Left(_), "fail") => agreeFail += 1
            case (Right(_), "fail") =>
              weAccept += 1
              if (examples.size < 12) examples += s"WE_ACCEPT i=$i pos=$pos o=$o"
            case (Left(k), "ok") =>
              weRefuse += 1
              if (examples.size < 12) examples += s"WE_REFUSE($k) i=$i pos=$pos o=$o"
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
