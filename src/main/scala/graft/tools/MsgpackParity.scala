package graft.tools

/** Differential mutant-parity check for the hand-rolled msgpack decoder
  * against msgpack-python's verdicts (tools/msgpack_mutant_parity.py).
  * Where both models overlap, agree on accept-vs-refuse and on a
  * canonical tree serialization. Our decoder's DELIBERATE model
  * boundaries (bin/ext/float32/uint64>2^63/non-string map keys refuse
  * `bad_type` — the JSON-cell model) are the `policy_model` class; the
  * python side separately marks trees containing unmodeled types.
  *
  * Usage: runMain graft.tools.MsgpackParity /tmp/msgpack_parity
  */
object MsgpackParity {

  import graft.etl.{JArr, JBool, JFloat, JInt, JNull, JObj, JStr, JVal}

  private def canon(v: JVal, md: java.security.MessageDigest): Unit = {
    def upd(s: String): Unit = md.update(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    v match {
      case JNull => upd("n;")
      case JBool(b) => upd(if (b) "1;" else "0;")
      case JInt(i) => upd(s"i$i;")
      case JFloat(d) =>
        if (d.isNaN) upd("dNAN;")
        else {
          val bits = java.lang.Double.doubleToRawLongBits(d)
          val hex = Array.tabulate(8)(k => f"${(bits >> (8 * k)) & 0xff}%02x").mkString
          upd(s"d$hex;")
        }
      case JStr(s) =>
        val hex = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .map(b => f"${b & 0xff}%02x").mkString
        upd(s"s$hex;")
      case JArr(items) =>
        upd("[")
        items.foreach(canon(_, md))
        upd("]")
      case JObj(fields) if fields.isEmpty =>
        upd("[]") // python's pairs-hook renders an empty map as []
      case JObj(fields) =>
        upd("{")
        fields.foreach { case (k, x) => canon(JStr(k), md); canon(x, md) }
        upd("}")
    }
  }

  private def canonAll(vs: Seq[JVal]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    vs.foreach { v => canon(v, md); md.update('#'.toByte) }
    md.digest().map(b => f"${b & 0xff}%02x").mkString
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/msgpack_parity")
    val bases = scala.collection.mutable.Map[Int, Array[Byte]]()
    def base(i: Int): Array[Byte] =
      bases.getOrElseUpdate(i, java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/mp_$i.bin")))

    var total = 0L
    var agreeOk = 0L
    var agreeFail = 0L
    var policyModel = 0L // our typed model-boundary refusals
    var weRefuse = 0L
    var weAccept = 0L
    var hashMismatch = 0L
    val refuseKinds = scala.collection.mutable.Map[String, Long]()
    val examples = scala.collection.mutable.ArrayBuffer[String]()

    val src = scala.io.Source.fromFile(s"$dir/mp.tsv")
    try {
      for (line <- src.getLines() if line.nonEmpty) {
        val f = line.split('\t')
        val (i, pos, x, verdict) = (f(0).toInt, f(1).toInt, f(2).toInt, f(3))
        val m = base(i).clone()
        m(pos) = (m(pos) ^ x).toByte
        total += 1
        (graft.ops.Msgpack.decodeAllSafe(m), verdict) match {
          case (Right(vs), "ok") =>
            if (canonAll(vs) == f(4)) agreeOk += 1
            else {
              hashMismatch += 1
              if (examples.size < 12) examples += s"HASH i=$i pos=$pos x=$x"
            }
          case (Left(_), "fail") => agreeFail += 1
          case (Left("bad_type"), v) if v.startsWith("ok") => policyModel += 1
          case (Left(_), "ok_unmodeled") => policyModel += 1
          case (Right(_), "ok_unmodeled") =>
            // we decoded a tree python says contains unmodeled types —
            // impossible if our refusals are airtight
            weAccept += 1
            if (examples.size < 12) examples += s"ACCEPT-UNMODELED i=$i pos=$pos x=$x"
          case (Left(k), _) =>
            weRefuse += 1
            refuseKinds(k) = refuseKinds.getOrElse(k, 0L) + 1
          case (Right(_), _) =>
            weAccept += 1
            if (examples.size < 12) examples += s"ACCEPT i=$i pos=$pos x=$x"
        }
      }
    } finally src.close()

    println(s"""{"metric":"msgpack_mutant_parity","total":$total,""" +
      s""""agree_ok":$agreeOk,"agree_fail":$agreeFail,""" +
      s""""policy_model":$policyModel,""" +
      s""""we_refuse_they_ok":$weRefuse,"we_ok_they_refuse":$weAccept,""" +
      s""""hash_mismatch":$hashMismatch}""")
    refuseKinds.toSeq.sortBy(-_._2).foreach { case (k, n) =>
      println(s"  refuse kind: $k x$n")
    }
    examples.foreach(e => println(s"  disagree: $e"))
    if (weAccept + hashMismatch > 0) sys.exit(1)
  }
}
