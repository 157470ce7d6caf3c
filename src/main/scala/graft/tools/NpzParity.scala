package graft.tools

/** Differential mutant-parity check for the .npy/.npz reader against
  * numpy's verdicts (tools/npz_mutant_parity.py): agree on accept-vs-
  * refuse and on name|dtype|shape|bytes per member. numpy's `ok` hash
  * only binds when every member is in our supported set (`ok_unmodeled`
  * otherwise — our typed refusal there is policy agreement).
  *
  * Usage: runMain graft.tools.NpzParity /tmp/npz_parity
  */
object NpzParity {

  private def sha(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  private def canon(entries: Seq[(String, graft.ops.Npy.NpyArray)]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def upd(s: String): Unit =
      md.update(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    entries.foreach { case (name, a) =>
      upd(name); upd("|"); upd(a.descr); upd("|")
      upd(a.shape.mkString(",")); upd("|")
      upd(sha(a.data))
      upd("#")
    }
    md.digest().map(x => f"${x & 0xff}%02x").mkString
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/npz_parity")
    val bases = scala.collection.mutable.Map[Int, Array[Byte]]()
    def base(i: Int): Array[Byte] =
      bases.getOrElseUpdate(i, java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/npz_$i.bin")))

    var total = 0L
    var agreeOk = 0L
    var agreeFail = 0L
    var policyModel = 0L
    var weRefuse = 0L
    var weAccept = 0L
    var weAcceptSlack = 0L
    var hashMismatch = 0L
    val baseCanon = scala.collection.mutable.Map[Int, String]()
    val refuseKinds = scala.collection.mutable.Map[String, Long]()
    val examples = scala.collection.mutable.ArrayBuffer[String]()

    val src = scala.io.Source.fromFile(s"$dir/npz.tsv")
    try {
      for (line <- src.getLines() if line.nonEmpty) {
        val f = line.split('\t')
        val (i, pos, x, verdict) = (f(0).toInt, f(1).toInt, f(2).toInt, f(3))
        val m = base(i).clone()
        m(pos) = (m(pos) ^ x).toByte
        total += 1
        (graft.ops.Npy.readNpzSafe(m), verdict) match {
          case (Right(es), "ok") =>
            if (canon(es) == f(4)) agreeOk += 1
            else {
              hashMismatch += 1
              examples.prepend(s"HASH i=$i pos=$pos x=$x")
            }
          case (Left(_), "fail") => agreeFail += 1
          case (Left(k), "ok_unmodeled")
              if k.startsWith("unsupported") || k == "fortran_order" =>
            policyModel += 1
          case (Right(_), "ok_unmodeled") =>
            weAccept += 1
            if (examples.size < 12) examples += s"ACCEPT-UNMODELED i=$i pos=$pos x=$x"
          case (Left(k), _) =>
            weRefuse += 1
            refuseKinds(k) = refuseKinds.getOrElse(k, 0L) + 1
          case (Right(es), _) =>
            // zipfile cross-validates central fields (CRC/size/attr copies)
            // that a streaming reader never consumes; harmless ONLY if our
            // values are bit-identical to the base archive's
            val bc = baseCanon.getOrElseUpdate(i,
              canon(graft.ops.Npy.readNpz(base(i))))
            if (canon(es) == bc) weAcceptSlack += 1
            else {
              weAccept += 1
              if (examples.size < 12) examples += s"ACCEPT-BAD i=$i pos=$pos x=$x"
            }
        }
      }
    } finally src.close()

    println(s"""{"metric":"npz_mutant_parity","total":$total,""" +
      s""""agree_ok":$agreeOk,"agree_fail":$agreeFail,""" +
      s""""policy_model":$policyModel,""" +
      s""""we_refuse_they_ok":$weRefuse,"we_ok_they_refuse":$weAccept,""" +
      s""""we_accept_slack":$weAcceptSlack,""" +
      s""""hash_mismatch":$hashMismatch}""")
    refuseKinds.toSeq.sortBy(-_._2).foreach { case (k, n) =>
      println(s"  refuse kind: $k x$n")
    }
    examples.foreach(e => println(s"  disagree: $e"))
    if (weAccept + hashMismatch > 0) sys.exit(1)
  }
}
