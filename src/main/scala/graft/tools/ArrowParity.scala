package graft.tools

/** Differential mutant-parity check for the hand-rolled Arrow IPC stream
  * reader against pyarrow's verdicts (tools/arrow_mutant_parity.py):
  * agree on accept-vs-refuse AND on a canonical value serialization
  * (floats as raw LE bit patterns). pyarrow verdict classes:
  * `ok`, `ok_othertype` (decoded to a type outside our supported set —
  * our typed `unsupported_*` refusal is policy agreement), `fail`, and
  * `crash` (pyarrow SEGFAULTS on the mutant; our reader must refuse
  * typed, never crash — the JVM reader being total where the C++ one
  * dies is the point of the hand-rolled walk).
  *
  * Usage: runMain graft.tools.ArrowParity /tmp/arrow_parity
  */
object ArrowParity {

  import graft.ops.ArrowIpc

  private def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString

  /** values-only canon (names excluded): separates metadata-level slack
    * (a vtable mutation emptied a field NAME, which pyarrow's verifier
    * refuses) from actual value corruption
    */
  private def canonValues(batches: Vector[ArrowIpc.Batch]): String =
    canon(batches.map(b => ArrowIpc.Batch(b.nRows, b.cols.map {
      case c: ArrowIpc.ALongCol => c.copy(name = "")
      case c: ArrowIpc.AIntCol => c.copy(name = "")
      case c: ArrowIpc.ADoubleCol => c.copy(name = "")
      case c: ArrowIpc.AFloatCol => c.copy(name = "")
      case c: ArrowIpc.ABoolCol => c.copy(name = "")
      case c: ArrowIpc.AStrCol => c.copy(name = "")
      case c: ArrowIpc.AFloatListCol => c.copy(name = "")
      case c: ArrowIpc.ADoubleListCol => c.copy(name = "")
    })))

  /** mirror of the python canon(): same bytes into sha256 */
  private def canon(batches: Vector[ArrowIpc.Batch]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def upd(s: String): Unit = md.update(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def updB(b: Byte): Unit = md.update(b)
    def f32(v: Float): String = {
      val bits = java.lang.Float.floatToRawIntBits(v)
      hex(Array((bits & 0xff).toByte, ((bits >> 8) & 0xff).toByte,
        ((bits >> 16) & 0xff).toByte, ((bits >> 24) & 0xff).toByte))
    }
    def f64(v: Double): String = {
      val bits = java.lang.Double.doubleToRawLongBits(v)
      hex(Array.tabulate(8)(i => ((bits >> (8 * i)) & 0xff).toByte))
    }
    batches.foreach { b =>
      b.cols.foreach { c =>
        val pyType = c match {
          case _: ArrowIpc.ALongCol => "int64"
          case _: ArrowIpc.AIntCol => "int32"
          case _: ArrowIpc.ADoubleCol => "double"
          case _: ArrowIpc.AFloatCol => "float"
          case _: ArrowIpc.ABoolCol => "bool"
          case _: ArrowIpc.AStrCol => "string"
          case _: ArrowIpc.AFloatListCol => "list<item: float>"
          case _: ArrowIpc.ADoubleListCol => "list<item: double>"
        }
        upd(c.name); upd("|"); upd(pyType); upd("|")
        def each(n: Int, valid: Array[Boolean])(f: Int => Unit): Unit = {
          var i = 0
          while (i < n) {
            // valid == null means no null bitmap rode the batch: all set
            if (valid != null && !valid(i)) updB(0xff.toByte) else f(i)
            upd(";")
            i += 1
          }
        }
        c match {
          case col: ArrowIpc.ALongCol =>
            each(col.size, col.valid)(i => upd(col.v(i).toString))
          case col: ArrowIpc.AIntCol =>
            each(col.size, col.valid)(i => upd(col.v(i).toString))
          case col: ArrowIpc.ADoubleCol =>
            each(col.size, col.valid)(i => upd(f64(col.v(i))))
          case col: ArrowIpc.AFloatCol =>
            each(col.size, col.valid)(i => upd(f32(col.v(i))))
          case col: ArrowIpc.ABoolCol =>
            each(col.size, col.valid)(i => upd(if (col.v(i)) "1" else "0"))
          case col: ArrowIpc.AStrCol =>
            each(col.size, col.valid)(i => upd(hex(
              col.v(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))))
          case col: ArrowIpc.AFloatListCol =>
            each(col.size, col.valid) { i =>
              col.v(i).foreach { x => upd(f32(x)); upd(",") }
            }
          case col: ArrowIpc.ADoubleListCol =>
            each(col.size, col.valid) { i =>
              col.v(i).foreach { x => upd(f64(x)); upd(",") }
            }
        }
      }
      upd("#")
    }
    hex(md.digest())
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/arrow_parity")
    val bases = scala.collection.mutable.Map[Int, Array[Byte]]()
    def base(i: Int): Array[Byte] =
      bases.getOrElseUpdate(i, java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/arrow_$i.bin")))

    var total = 0L
    var agreeOk = 0L
    var agreeFail = 0L
    var policyOther = 0L
    var crashWeRefuse = 0L
    var crashWeAccept = 0L
    var weRefuse = 0L
    var weAcceptSlack = 0L // our decode equals the BASE stream's values
    var weAcceptBad = 0L // our decode differs from the base — dangerous
    var hashMismatch = 0L
    var hashPolicyNullCount = 0L // both accept; pyarrow honors lying null_count
    var weAcceptNameSlack = 0L
    val canonValuesBase = scala.collection.mutable.Map[Int, String]()
    val refuseKinds = scala.collection.mutable.Map[String, Long]()
    val examples = scala.collection.mutable.ArrayBuffer[String]()
    val baseCanon = scala.collection.mutable.Map[Int, String]()

    val src = scala.io.Source.fromFile(s"$dir/arrow.tsv")
    try {
      for (line <- src.getLines() if line.nonEmpty) {
        val f = line.split('\t')
        val (i, pos, x, verdict) = (f(0).toInt, f(1).toInt, f(2).toInt, f(3))
        val m = base(i).clone()
        m(pos) = (m(pos) ^ x).toByte
        total += 1
        val ours = ArrowIpc.readSafe(m)
        (ours, verdict) match {
          case (Right(bs), "ok") =>
            val ours = canon(bs)
            if (ours == f(4)) agreeOk += 1
            else {
              val bc = baseCanon.getOrElseUpdate(i,
                canon(ArrowIpc.read(base(i))))
              if (ours == bc)
                // pyarrow trusted the mutated (redundant) null_count over
                // the authoritative validity bitmap and invented nulls;
                // our decode equals the base values — principled side
                hashPolicyNullCount += 1
              else {
                hashMismatch += 1
                examples += s"HASH i=$i pos=$pos x=$x"
              }
            }
          case (Left(_), "fail") => agreeFail += 1
          case (Left(k), "ok_othertype") if k.startsWith("unsupported") =>
            policyOther += 1
          case (Left(_), "crash") => crashWeRefuse += 1
          case (Right(_), "crash") =>
            // no ground truth (pyarrow died); count, don't fail
            crashWeAccept += 1
          case (Left(k), _) =>
            weRefuse += 1
            refuseKinds(k) = refuseKinds.getOrElse(k, 0L) + 1
          case (Right(bs), _) =>
            // pyarrow refused (its flatbuffers verifier rejects slack our
            // walk never reads); dangerous ONLY if our VALUES moved
            val bc = baseCanon.getOrElseUpdate(i,
              canon(ArrowIpc.read(base(i))))
            if (canon(bs) == bc) weAcceptSlack += 1
            else if (canonValues(bs) == canonValuesBase.getOrElseUpdate(i,
                canonValues(ArrowIpc.read(base(i)))))
              weAcceptNameSlack += 1 // values intact; only names moved
            else {
              weAcceptBad += 1
              if (examples.size < 16) examples += s"ACCEPT-BAD i=$i pos=$pos x=$x"
            }
        }
      }
    } finally src.close()

    println(s"""{"metric":"arrow_mutant_parity","total":$total,""" +
      s""""agree_ok":$agreeOk,"agree_fail":$agreeFail,""" +
      s""""policy_othertype":$policyOther,""" +
      s""""pyarrow_crash_we_refuse":$crashWeRefuse,""" +
      s""""pyarrow_crash_we_accept":$crashWeAccept,""" +
      s""""we_refuse_they_ok":$weRefuse,""" +
      s""""we_accept_slack":$weAcceptSlack,""" +
      s""""we_accept_name_slack":$weAcceptNameSlack,""" +
      s""""we_accept_bad":$weAcceptBad,""" +
      s""""hash_policy_nullcount":$hashPolicyNullCount,""" +
      s""""hash_mismatch":$hashMismatch}""")
    refuseKinds.toSeq.sortBy(-_._2).foreach { case (k, n) =>
      println(s"  refuse kind: $k x$n")
    }
    examples.foreach(e => println(s"  disagree: $e"))
    if (weAcceptBad + hashMismatch > 0) sys.exit(1)
  }
}
