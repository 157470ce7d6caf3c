package graft.etl

import java.nio.charset.StandardCharsets.ISO_8859_1

/** PDF standard security handler (ISO 32000-1 §7.6.3) for documents
  * encrypted with an EMPTY user password — the "encrypted but openable by
  * anyone" class that is a meaningful fraction of real-world PDFs. The
  * reference pipeline reads these transparently through pdfplumber →
  * pdfminer.six (reference: backend/etl_pipeline.py:27-35); this is the
  * same capability from the public spec: RC4-40 (R2/V1), RC4-128 (R3/V2),
  * and the V4 crypt-filter forms /V2 (RC4) and /AESV2 (AES-128-CBC).
  *
  * Anything else — a real user password, revision 5/6 (AES-256), a
  * non-Standard filter, a malformed O/U entry — yields `Left(reason)` and
  * the caller keeps its typed refusal: decrypting wrongly would produce
  * exactly the silent garbage the extractor exists to refuse.
  */
object PdfCrypt {

  /** §7.6.3.3 padding string (Algorithm 2 step a). */
  private val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  /** A verified empty-user-password handler: the file key plus the cipher
    * selected by the crypt filter (`"rc4"`, `"aesv2"`, or `"identity"`).
    */
  final case class Handler(key: Array[Byte], streamCipher: String)

  def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0; var y = 0
    i = 0
    while (i < data.length) {
      x = (x + 1) & 0xff
      y = (y + s(x)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(i) = (data(i) ^ s((s(x) + s(y)) & 0xff)).toByte
      i += 1
    }
    out
  }

  // ------------------------------------------------- encrypt-dict parsing

  /** A PDF string value (`(literal)` with escapes or `<hex>`) for `key`
    * in a dictionary source. Operates on the raw ISO-8859-1-faithful dict
    * text so the recovered bytes are exact.
    */
  private def stringValue(dict: String, key: String): Option[Array[Byte]] = {
    val at = ("""/""" + key + """\s*""").r.findFirstMatchIn(dict)
      .map(_.end).getOrElse(return None)
    dict.charAt(at) match {
      case '(' =>
        val out = new java.io.ByteArrayOutputStream(32)
        var i = at + 1
        var depth = 1
        while (i < dict.length && depth > 0) {
          dict.charAt(i) match {
            case '\\' =>
              if (i + 1 < dict.length) {
                dict.charAt(i + 1) match {
                  case 'n' => out.write('\n'); i += 2
                  case 'r' => out.write('\r'); i += 2
                  case 't' => out.write('\t'); i += 2
                  case 'b' => out.write('\b'); i += 2
                  case 'f' => out.write('\f'); i += 2
                  case c if c >= '0' && c <= '7' =>
                    var v = 0; var k = 0; var p = i + 1
                    while (k < 3 && p < dict.length &&
                      dict.charAt(p) >= '0' && dict.charAt(p) <= '7') {
                      v = v * 8 + (dict.charAt(p) - '0'); p += 1; k += 1
                    }
                    out.write(v & 0xff); i = p
                  case '\n' => i += 2 // line continuation
                  case c => out.write(c); i += 2
                }
              } else i += 1
            case '(' => depth += 1; out.write('('); i += 1
            case ')' =>
              depth -= 1
              if (depth > 0) out.write(')')
              i += 1
            case c => out.write(c); i += 1
          }
        }
        Some(out.toByteArray)
      case '<' =>
        val e = dict.indexOf('>', at + 1)
        if (e < 0) None
        else {
          val hx = dict.substring(at + 1, e).filterNot(_.isWhitespace)
          val padded = if (hx.length % 2 == 1) hx + "0" else hx
          Some(padded.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
        }
      case _ => None
    }
  }

  private def intValue(dict: String, key: String): Option[Long] =
    ("""/""" + key + """\s+(-?\d+)""").r.findFirstMatchIn(dict)
      .map(_.group(1).toLong)

  private def nameValue(dict: String, key: String): Option[String] =
    ("""/""" + key + """\s*/(\w+)""").r.findFirstMatchIn(dict).map(_.group(1))

  /** First element of the trailer `/ID [ <…> <…> ]` array. */
  def firstFileId(trailer: String): Array[Byte] =
    """/ID\s*\[\s*<([0-9a-fA-F\s]*)>""".r.findFirstMatchIn(trailer)
      .map { m =>
        val hx = m.group(1).filterNot(_.isWhitespace)
        val p = if (hx.length % 2 == 1) hx + "0" else hx
        p.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      }
      .getOrElse(Array.emptyByteArray)

  // --------------------------------------------------------- key recovery

  /** Derive and VERIFY the file key for the empty user password; Left is
    * the typed reason the document stays refused.
    */
  def forEmptyUserPassword(enc: String, id0: Array[Byte]): Either[String, Handler] =
    // corrupt dicts (non-hex O/U bytes, overflowing integers) must refuse,
    // not escape as NumberFormatException into a 1000-executor scan
    try forEmptyUserPassword0(enc, id0)
    catch { case e: Exception => Left(s"unparseable encrypt dict: ${e.getClass.getSimpleName}") }

  private def forEmptyUserPassword0(enc: String, id0: Array[Byte]): Either[String, Handler] = {
    if (!nameValue(enc, "Filter").contains("Standard"))
      return Left(s"unsupported security filter ${nameValue(enc, "Filter")}")
    val v = intValue(enc, "V").getOrElse(0L).toInt
    val r = intValue(enc, "R").getOrElse(0L).toInt
    if (!(v == 1 && r == 2) && !(v == 2 && (r == 2 || r == 3)) && !(v == 4 && r == 4))
      return Left(s"unsupported standard handler V=$v R=$r")
    val o = stringValue(enc, "O").getOrElse(return Left("missing /O"))
    val u = stringValue(enc, "U").getOrElse(return Left("missing /U"))
    if (o.length < 32 || u.length < 32) return Left("short O/U entry")
    val p = intValue(enc, "P").getOrElse(return Left("missing /P")).toInt
    val nBytes = if (v == 1) 5 else {
      val bits = intValue(enc, "Length").getOrElse(40L).toInt
      if (bits % 8 != 0 || bits < 40 || bits > 128) return Left(s"bad /Length $bits")
      bits / 8
    }
    val encryptMetadata = !enc.contains("/EncryptMetadata false")
    // V4 crypt filters: only the /StdCF-through-StmF/StrF shape, with
    // /V2 (RC4) or /AESV2 — anything fancier stays refused
    val cipher =
      if (v < 4) "rc4"
      else {
        val stmf = nameValue(enc, "StmF").getOrElse("Identity")
        if (stmf == "Identity") "identity"
        else {
          if (stmf != "StdCF") return Left(s"unsupported stream filter $stmf")
          nameValue(enc, "CFM") match {
            case Some("V2") => "rc4"
            case Some("AESV2") => "aesv2"
            case other => return Left(s"unsupported CFM $other")
          }
        }
      }
    // Algorithm 2 with the empty user password (padded password = Pad)
    val pLe = Array[Byte](
      (p & 0xff).toByte, ((p >> 8) & 0xff).toByte,
      ((p >> 16) & 0xff).toByte, ((p >> 24) & 0xff).toByte)
    var h = md5(
      Pad, o.take(32), pLe, id0,
      if (r >= 4 && !encryptMetadata)
        Array[Byte](-1, -1, -1, -1) else Array.emptyByteArray)
    if (r >= 3) {
      var i = 0
      while (i < 50) { h = md5(h.take(nBytes)); i += 1 }
    }
    val key = h.take(nBytes)
    // Algorithm 6: verify /U so a wrong (i.e. non-empty) user password —
    // or a corrupt dict — can never decrypt to plausible-looking noise
    val ok =
      if (r == 2) java.util.Arrays.equals(rc4(key, Pad), u.take(32))
      else {
        var x = rc4(key, md5(Pad, id0))
        var i = 1
        while (i <= 19) {
          x = rc4(key.map(b => (b ^ i).toByte), x)
          i += 1
        }
        java.util.Arrays.equals(x.take(16), u.take(16))
      }
    if (!ok) Left("user password is not empty")
    else Right(Handler(key, cipher))
  }

  // ----------------------------------------------------------- decryption

  /** Algorithm 1: decrypt one string/stream of object (num, gen). */
  def decrypt(h: Handler, num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
    h.streamCipher match {
      case "identity" => data
      case cipher =>
        val salt =
          if (cipher == "aesv2") Array[Byte](0x73, 0x41, 0x6C, 0x54) // "sAlT"
          else Array.emptyByteArray
        val okey = md5(h.key,
          Array[Byte]((num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
            ((num >> 16) & 0xff).toByte,
            (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte),
          salt).take(math.min(h.key.length + 5, 16))
        if (cipher == "rc4") rc4(okey, data)
        else {
          if (data.length < 32 || data.length % 16 != 0)
            throw new IllegalArgumentException(
              "No extractable text found in PDF. Is this a scanned/image PDF or empty? Extraction failed.")
          val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
          c.init(javax.crypto.Cipher.DECRYPT_MODE,
            new javax.crypto.spec.SecretKeySpec(okey, "AES"),
            new javax.crypto.spec.IvParameterSpec(data.take(16)))
          val plain = c.doFinal(data, 16, data.length - 16)
          val padN = plain(plain.length - 1) & 0xff
          if (padN < 1 || padN > 16 || padN > plain.length)
            throw new IllegalArgumentException(
              "No extractable text found in PDF. Is this a scanned/image PDF or empty? Extraction failed.")
          java.util.Arrays.copyOf(plain, plain.length - padN)
        }
    }

  /** Convenience for tests: ISO-8859-1-faithful bytes of a string. */
  def raw(s: String): Array[Byte] = s.getBytes(ISO_8859_1)
}
