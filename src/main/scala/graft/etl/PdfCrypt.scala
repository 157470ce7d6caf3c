package graft.etl

import java.nio.charset.StandardCharsets.ISO_8859_1

/** PDF standard security handler (ISO 32000-1 §7.6.3 + ISO 32000-2
  * §7.6.4) for documents encrypted with an EMPTY user password — the
  * "encrypted but openable by anyone" class that is a meaningful fraction
  * of real-world PDFs. The reference pipeline reads these transparently
  * through pdfplumber → pdfminer.six (reference:
  * backend/etl_pipeline.py:27-35); this is the same capability from the
  * public spec: RC4-40 (R2/V1), RC4-128 (R3/V2), the V4 crypt-filter
  * forms /V2 (RC4) and /AESV2 (AES-128-CBC), and the V5 AES-256 forms —
  * revision 5 (single SHA-256, Adobe's /AESV3 extension) and revision 6
  * (ISO 32000-2 Algorithm 2.B iterated SHA-256/384/512 hash), both with
  * the /U validation-salt check and the /Perms "adb" sanity decrypt.
  *
  * Anything else — a real user password, a non-Standard filter, a
  * malformed O/U entry — yields `Left(reason)` and the caller keeps its
  * typed refusal: decrypting wrongly would produce exactly the silent
  * garbage the extractor exists to refuse.
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
  private[etl] def stringValue(dict: String, key: String): Option[Array[Byte]] = {
    // the (?![A-Za-z0-9]) boundary keeps /U from matching inside /UE and
    // /O inside /OE when the longer name comes first in the dict
    val at = ("""/""" + key + """(?![A-Za-z0-9])\s*""").r.findFirstMatchIn(dict)
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
                  case '\r' => // continuation, CR or CRLF form (§7.3.4.2)
                    i += (if (i + 2 < dict.length && dict.charAt(i + 2) == '\n') 3 else 2)
                  case c => out.write(c); i += 2
                }
              } else i += 1
            case '(' => depth += 1; out.write('('); i += 1
            case ')' =>
              depth -= 1
              if (depth > 0) out.write(')')
              i += 1
            case '\r' =>
              // a raw EOL inside a literal string reads back as ONE LF
              // regardless of its CR / CRLF form (ISO 32000-1 §7.3.4.2)
              out.write('\n')
              i += (if (i + 1 < dict.length && dict.charAt(i + 1) == '\n') 2 else 1)
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
    ("""/""" + key + """(?![A-Za-z0-9])\s+(-?\d+)""").r.findFirstMatchIn(dict)
      .map(_.group(1).toLong)

  private def nameValue(dict: String, key: String): Option[String] =
    ("""/""" + key + """(?![A-Za-z0-9])\s*/(\w+)""").r.findFirstMatchIn(dict)
      .map(_.group(1))

  /** First element of the trailer `/ID [ <…> <…> ]` array. */
  def firstFileId(trailer: String): Array[Byte] =
    """/ID\s*\[\s*<([0-9a-fA-F\s]*)>""".r.findFirstMatchIn(trailer)
      .map { m =>
        val hx = m.group(1).filterNot(_.isWhitespace)
        val p = if (hx.length % 2 == 1) hx + "0" else hx
        p.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      }
      .getOrElse(Array.emptyByteArray)

  // ------------------------------------------------------ AES-256 helpers

  private def digest(alg: String, data: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance(alg).digest(data)

  private def aesCbc(mode: Int, key: Array[Byte], iv: Array[Byte],
      data: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(mode, new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data, off, len)
  }

  /** ISO 32000-2 §7.6.4.3.4 Algorithm 2.B: the revision-6 password hash.
    * Revision 5 (Adobe's pre-ISO /AESV3) is the plain SHA-256 prefix of
    * the same computation. `udata` is the 48-byte /U entry for the
    * owner-password case and empty for the user-password case.
    */
  private[etl] def hash2B(pwd: Array[Byte], salt: Array[Byte],
      udata: Array[Byte], r: Int): Array[Byte] = {
    var k = digest("SHA-256", pwd ++ salt ++ udata)
    if (r == 5) return k
    var count = 0
    var done = false
    while (!done) {
      count += 1
      val part = pwd ++ k ++ udata
      val k1 = new Array[Byte](part.length * 64)
      var i = 0
      while (i < 64) { System.arraycopy(part, 0, k1, i * part.length, part.length); i += 1 }
      val e = aesCbc(javax.crypto.Cipher.ENCRYPT_MODE,
        k.take(16), k.slice(16, 32), k1, 0, k1.length)
      // first 16 bytes of E as a big-endian integer mod 3 == byte-sum
      // mod 3 (256 ≡ 1 mod 3)
      var sum = 0
      i = 0
      while (i < 16) { sum += e(i) & 0xff; i += 1 }
      k = (sum % 3) match {
        case 0 => digest("SHA-256", e)
        case 1 => digest("SHA-384", e)
        case _ => digest("SHA-512", e)
      }
      done = count >= 64 && (e(e.length - 1) & 0xff) <= count - 32
    }
    k.take(32)
  }

  /** §7.6.4.4.10-11: validate the empty user password against /U and
    * unwrap the 256-bit file key from /UE; then (when present) the
    * Algorithm-13 /Perms sanity decrypt — bytes 9..11 must read "adb".
    */
  private def forEmptyUserPasswordV5(enc: String, r: Int): Either[String, Handler] = {
    val u = stringValue(enc, "U").getOrElse(return Left("missing /U"))
    if (u.length < 48) return Left("short /U for R5/R6")
    val empty = Array.emptyByteArray
    val vsalt = u.slice(32, 40)
    val ksalt = u.slice(40, 48)
    if (!java.util.Arrays.equals(hash2B(empty, vsalt, empty, r), u.take(32)))
      return Left("user password is not empty")
    val ue = stringValue(enc, "UE").getOrElse(return Left("missing /UE"))
    if (ue.length < 32) return Left("short /UE")
    val ik = hash2B(empty, ksalt, empty, r)
    val key = aesCbc(javax.crypto.Cipher.DECRYPT_MODE,
      ik, new Array[Byte](16), ue, 0, 32)
    stringValue(enc, "Perms") match {
      case Some(pm) if pm.length >= 16 =>
        val c = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
        c.init(javax.crypto.Cipher.DECRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(key, "AES"))
        val dec = c.doFinal(pm, 0, 16)
        if (dec(9) != 'a' || dec(10) != 'd' || dec(11) != 'b')
          return Left("/Perms check failed")
      case Some(_) => return Left("short /Perms")
      case None => () // absent in some writers; /U already verified the key
    }
    Right(Handler(key, "aesv3"))
  }

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
    if (v == 5 && (r == 5 || r == 6)) {
      val stmf = nameValue(enc, "StmF").getOrElse("Identity")
      // one cipher is derived for both streams and strings, so a dict
      // where the two filters disagree (e.g. StmF=Identity, StrF=StdCF)
      // must refuse rather than pass one side through as silent garbage
      val strf5 = nameValue(enc, "StrF").getOrElse("Identity")
      if (strf5 != stmf) return Left(s"mixed StmF/StrF: $stmf/$strf5")
      if (stmf == "Identity")
        return forEmptyUserPasswordV5(enc, r).map(h => h.copy(streamCipher = "identity"))
      if (stmf != "StdCF") return Left(s"unsupported stream filter $stmf")
      nameValue(enc, "CFM") match {
        case Some("AESV3") => return forEmptyUserPasswordV5(enc, r)
        case other => return Left(s"unsupported CFM $other")
      }
    }
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
    // whitespace-tolerant like the other lookups — `/EncryptMetadata\nfalse`
    // is a legal token stream a substring match would misread as true
    val encryptMetadata =
      !"""/EncryptMetadata(?![A-Za-z0-9])\s*false""".r.findFirstIn(enc).isDefined
    // V4 crypt filters: only the /StdCF-through-StmF/StrF shape, with
    // /V2 (RC4) or /AESV2 — anything fancier stays refused
    val cipher =
      if (v < 4) "rc4"
      else {
        val stmf = nameValue(enc, "StmF").getOrElse("Identity")
        val strf = nameValue(enc, "StrF").getOrElse("Identity")
        if (strf != stmf) return Left(s"mixed StmF/StrF: $stmf/$strf")
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
        // AESV3 uses the 256-bit file key directly (ISO 32000-2
        // §7.6.3.1: no per-object MD5 derivation in V5)
        val okey =
          if (cipher == "aesv3") h.key
          else {
            val salt =
              if (cipher == "aesv2") Array[Byte](0x73, 0x41, 0x6C, 0x54) // "sAlT"
              else Array.emptyByteArray
            md5(h.key,
              Array[Byte]((num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
                ((num >> 16) & 0xff).toByte,
                (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte),
              salt).take(math.min(h.key.length + 5, 16))
          }
        if (cipher == "rc4") rc4(okey, data)
        else {
          if (data.length < 32 || data.length % 16 != 0)
            throw new IllegalArgumentException(
              "No extractable text found in PDF. Is this a scanned/image PDF or empty? Extraction failed.")
          val plain = aesCbc(javax.crypto.Cipher.DECRYPT_MODE,
            okey, data.take(16), data, 16, data.length - 16)
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
