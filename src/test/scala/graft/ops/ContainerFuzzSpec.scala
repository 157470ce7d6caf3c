package graft.ops

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.US_ASCII

/** Total-robustness locks on the container/frontier parsers: a 100 TB
  * crawl scan feeds these ARBITRARY bytes, so the safe readers must
  * refuse with a typed kind — never throw, never loop — on random
  * garbage AND on single-byte mutations of valid files (the harder
  * class: almost-valid input). Url.canonicalize must be total on any
  * string.
  */
class ContainerFuzzSpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val bytesGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 600).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127)))
      .map(_.map(_.toByte).toArray)

  private val validWarc: Array[Byte] = Warc.buildCrawlFile("f.warc.gz",
    (0L until 3L).map(i => (s"https://s/doc/$i", 200,
      Seq("Content-Type" -> "text/plain"), s"body text $i".getBytes(US_ASCII))))

  private val validTar: Array[Byte] = Tar.write(
    (0L until 3L).flatMap(i => Seq(
      Tar.TarEntry(s"$i.txt", s"payload $i".getBytes(US_ASCII)),
      Tar.TarEntry(s"$i.cls", "en".getBytes(US_ASCII)))))

  test("Warc.readSafe is total on random bytes") {
    check(Prop.forAll(bytesGen) { b =>
      Warc.readSafe(b).isLeft || Warc.readSafe(b).isRight // no throw
    })
  }

  test("Warc.readSafe is total under single-byte mutations of a valid file") {
    check(Prop.forAll(
      Gen.chooseNum(0, validWarc.length - 1), Gen.chooseNum(1, 255)) { (pos, x) =>
      val m = validWarc.clone(); m(pos) = (m(pos) ^ x).toByte
      Warc.readSafe(m) match {
        case Left(kind) =>
          Set("bad_gzip", "truncated", "crc_mismatch", "bad_record").contains(kind)
        case Right(_) => true // mutation may hit a byte the grammar ignores
      }
    }, n = 500)
  }

  test("Warc truncation: refuse, or parse a clean record PREFIX (resumability)") {
    // one gzip member per record means a cut at a member boundary IS a
    // valid shorter file — the property a resumable crawl upload relies
    // on. A cut anywhere else must refuse; silent partial records never.
    val full = Warc.read(validWarc).map(r => new String(r.body, US_ASCII))
    check(Prop.forAll(Gen.chooseNum(0, validWarc.length - 1)) { n =>
      Warc.readSafe(java.util.Arrays.copyOf(validWarc, n)) match {
        case Left(_) => true
        case Right(rs) =>
          val got = rs.map(r => new String(r.body, US_ASCII))
          got == full.take(got.size) && got.size < full.size
      }
    })
  }

  test("Tar.readSafe is total on random bytes and mutations") {
    check(Prop.forAll(bytesGen) { b => Tar.readSafe(b); true })
    check(Prop.forAll(
      Gen.chooseNum(0, validTar.length - 1), Gen.chooseNum(1, 255)) { (pos, x) =>
      val m = validTar.clone(); m(pos) = (m(pos) ^ x).toByte
      Tar.readSafe(m) match {
        case Left(kind) =>
          Set("bad_checksum", "truncated", "bad_octal", "bad_header").contains(kind)
        case Right(_) => true
      }
    }, n = 500)
  }

  test("Tar.readSafe refuses truncation at any offset short of the terminator") {
    check(Prop.forAll(Gen.chooseNum(0, validTar.length - 1025)) { n =>
      Tar.readSafe(java.util.Arrays.copyOf(validTar, n)).isLeft
    })
  }

  test("Zip: deterministic bytes, total readSafe under garbage and mutation") {
    val members = (0L until 4L).map(i =>
      Zip.ZipMember(s"$i.txt", s"content $i".getBytes(US_ASCII)))
    val a = Zip.write(members); val b = Zip.write(members)
    assert(a.toSeq == b.toSeq) // reproducible shards
    assert(Zip.read(a).map(m => (m.name, new String(m.body, US_ASCII))) ==
      members.map(m => (m.name, new String(m.body, US_ASCII))))
    check(Prop.forAll(bytesGen) { bs => Zip.readSafe(bs); true })
    check(Prop.forAll(Gen.chooseNum(0, a.length - 1), Gen.chooseNum(1, 255)) {
      (pos, x) =>
        val m = a.clone(); m(pos) = (m(pos) ^ x).toByte
        Zip.readSafe(m) match {
          case Left(kind) => Set("bad_zip", "truncated").contains(kind)
          case Right(_) => true
        }
    }, n = 300)
  }

  test("Url.canonicalize and host are total on arbitrary strings") {
    val weird = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.asciiPrintableStr.map("https://" + _),
      Gen.asciiPrintableStr.map("http://h/" + _),
      Gen.const("https://"), Gen.const("://x"), Gen.const("http://a.com/%"),
      Gen.const("http://a.com/%zz"), Gen.const("http://:80/.."))
    check(Prop.forAll(weird) { s =>
      Url.canonicalize(s); Url.host(s); Url.registeredDomain(s); true
    }, n = 500)
  }

  test("robots parsing is total on arbitrary text") {
    check(Prop.forAll(Gen.asciiStr) { s =>
      val r = Url.parseRobots(s)
      r.allowed("anybot", "/x"); true
    })
  }

  private val validWav: Array[Byte] =
    Wav.encode(8000, 16, Array(Array.tabulate(64)(i => (i * 997 % 4001) - 2000)))

  test("Wav decode refuses typed on random bytes and single-byte mutations") {
    val kinds = Set("unsupported", "truncated", "not_media", "malformed")
    check(Prop.forAll(bytesGen) { b =>
      try { Wav.decode(b); true }
      catch { case e: IllegalArgumentException =>
        kinds.contains(Multimodal.errKind(e.getMessage)) }
    })
    check(Prop.forAll(
      Gen.chooseNum(0, validWav.length - 1), Gen.chooseNum(1, 255)) { (pos, x) =>
      val m = validWav.clone(); m(pos) = (m(pos) ^ x).toByte
      try { Wav.decode(m); true } // data-byte mutations still decode
      catch { case e: IllegalArgumentException =>
        kinds.contains(Multimodal.errKind(e.getMessage)) }
    }, n = 500)
  }

  test("Wav decode refuses typed at every truncation offset") {
    (0 until validWav.length).foreach { n =>
      try { Wav.decode(java.util.Arrays.copyOf(validWav, n)); () }
      catch { case e: IllegalArgumentException =>
        assert(Set("unsupported", "truncated", "not_media", "malformed")
          .contains(Multimodal.errKind(e.getMessage)), s"cut at $n")
      }
    }
  }

  // ---- round-12 session-3 codecs: npy/npz, Arrow IPC, msgpack,
  // safetensors, FLAC — same total-robustness contract ----

  private val validNpz: Array[Byte] = Npy.writeNpz(Seq(
    "ids" -> Npy.writeLongs(Array(1L, 2L, 3L)),
    "vecs" -> Npy.writeFloats(Seq(3L, 2L), Array(1f, 2f, 3f, 4f, 5f, 6f))))

  test("Npy readSafe/readNpzSafe are total on garbage and mutations") {
    check(Prop.forAll(bytesGen) { b =>
      Npy.readSafe(b).isLeft || Npy.readSafe(b).isRight
    })
    check(Prop.forAll(bytesGen) { b =>
      Npy.readNpzSafe(b).isLeft || Npy.readNpzSafe(b).isRight
    })
    val kinds = Set("bad_magic", "bad_version", "bad_header",
      "unsupported_dtype", "fortran_order", "size_mismatch", "too_large",
      "bad_zip", "truncated")
    check(Prop.forAll(
      Gen.chooseNum(0, validNpz.length - 1), Gen.chooseNum(1, 255)) { (pos, x) =>
      val m = validNpz.clone(); m(pos) = (m(pos) ^ x).toByte
      Npy.readNpzSafe(m) match {
        case Left(kind) => kinds.contains(kind)
        case Right(_)   => true
      }
    }, n = 500)
  }

  private val validArrow: Array[Byte] = {
    import ArrowIpc._
    ArrowIpc.write(
      Vector(AField("id", "i64", nullable = false),
        AField("t", "utf8", nullable = true)),
      Seq(Vector[ACol](
        ALongCol("id", null, Array(1L, 2L, 3L)),
        AStrCol("t", Array(true, false, true), Array("a", null, "ccc")))))
  }

  test("ArrowIpc.readSafe is total on garbage, mutations, truncations") {
    check(Prop.forAll(bytesGen) { b =>
      ArrowIpc.readSafe(b).isLeft || ArrowIpc.readSafe(b).isRight
    })
    val kinds = Set("bad_stream", "truncated", "too_large", "bad_schema",
      "unsupported_type", "unsupported_dictionary",
      "unsupported_compression", "unsupported_endianness")
    check(Prop.forAll(
      Gen.chooseNum(0, validArrow.length - 1), Gen.chooseNum(1, 255)) { (pos, x) =>
      val m = validArrow.clone(); m(pos) = (m(pos) ^ x).toByte
      ArrowIpc.readSafe(m) match {
        case Left(kind) => kinds.contains(kind)
        case Right(_)   => true
      }
    }, n = 500)
    (0 until validArrow.length).foreach { n =>
      ArrowIpc.readSafe(java.util.Arrays.copyOf(validArrow, n)) match {
        case Left(kind) => assert(kinds.contains(kind), s"cut at $n: $kind")
        case Right(_)   => fail(s"cut at $n parsed (EOS can't survive a cut)")
      }
    }
  }

  private val validMsgpack: Array[Byte] = Msgpack.encodeAll(Seq(
    graft.etl.JObj(Vector(
      "id" -> graft.etl.JInt(BigInt(7)),
      "t" -> graft.etl.JStr("hello"),
      "xs" -> graft.etl.JArr(Vector(graft.etl.JFloat(1.5), graft.etl.JNull))))))

  test("Msgpack.decodeAllSafe is total on garbage and mutations") {
    check(Prop.forAll(bytesGen) { b =>
      Msgpack.decodeAllSafe(b).isLeft || Msgpack.decodeAllSafe(b).isRight
    })
    val kinds = Set("truncated", "bad_type", "too_large", "trailing_garbage")
    check(Prop.forAll(
      Gen.chooseNum(0, validMsgpack.length - 1), Gen.chooseNum(1, 255)) { (pos, x) =>
      val m = validMsgpack.clone(); m(pos) = (m(pos) ^ x).toByte
      Msgpack.decodeAllSafe(m) match {
        case Left(kind) => kinds.contains(kind)
        case Right(_)   => true
      }
    }, n = 500)
  }

  private val validSt: Array[Byte] = Safetensors.write(Seq(
    "ids" -> Safetensors.longTensor(Array(1L, 2L)),
    "v" -> Safetensors.floatTensor(Seq(2L, 2L), Array(1f, 2f, 3f, 4f))))

  test("Safetensors.readSafe is total on garbage, mutations, truncations") {
    check(Prop.forAll(bytesGen) { b =>
      Safetensors.readSafe(b).isLeft || Safetensors.readSafe(b).isRight
    })
    val kinds = Set("bad_header", "unsupported_dtype", "bad_offsets", "truncated")
    check(Prop.forAll(
      Gen.chooseNum(0, validSt.length - 1), Gen.chooseNum(1, 255)) { (pos, x) =>
      val m = validSt.clone(); m(pos) = (m(pos) ^ x).toByte
      Safetensors.readSafe(m) match {
        case Left(kind) => kinds.contains(kind)
        case Right(_)   => true
      }
    }, n = 500)
    (0 until validSt.length).foreach { n =>
      Safetensors.readSafe(java.util.Arrays.copyOf(validSt, n)) match {
        case Left(kind) => assert(kinds.contains(kind), s"cut at $n: $kind")
        case Right(_)   => fail(s"cut at $n parsed (coverage check can't pass)")
      }
    }
  }

  private val validTfEx: Array[Byte] = TfExample.encode(Vector(
    "id" -> TfExample.Int64Feature(Vector(7L, -1L)),
    "text" -> TfExample.BytesFeature(Vector(
      "hello world".getBytes(java.nio.charset.StandardCharsets.UTF_8))),
    "score" -> TfExample.FloatFeature(Vector(1.5f, -0.25f))))

  test("TfExample.decodeSafe is total on garbage and mutations") {
    check(Prop.forAll(bytesGen) { b =>
      TfExample.decodeSafe(b).isLeft || TfExample.decodeSafe(b).isRight
    })
    val kinds = Set("truncated", "bad_varint", "bad_wire", "too_large")
    check(Prop.forAll(
      Gen.chooseNum(0, validTfEx.length - 1), Gen.chooseNum(1, 255)) { (pos, x) =>
      val m = validTfEx.clone(); m(pos) = (m(pos) ^ x).toByte
      TfExample.decodeSafe(m) match {
        case Left(kind) => kinds.contains(kind)
        case Right(_)   => true
      }
    }, n = 500)
  }

  private val validFlac: Array[Byte] = Flac.write(44100, 2, 16, 1000L,
    new Array[Byte](16), vendor = "v", comments = Seq("TITLE" -> "t"),
    paddingBytes = 8)

  test("Flac.readSafe is total on garbage, mutations, truncations") {
    check(Prop.forAll(bytesGen) { b =>
      Flac.readSafe(b).isLeft || Flac.readSafe(b).isRight
    })
    val kinds = Set("bad_magic", "truncated", "bad_streaminfo",
      "bad_comment", "too_large")
    check(Prop.forAll(
      Gen.chooseNum(0, validFlac.length - 1), Gen.chooseNum(1, 255)) { (pos, x) =>
      val m = validFlac.clone(); m(pos) = (m(pos) ^ x).toByte
      Flac.readSafe(m) match {
        case Left(kind) => kinds.contains(kind)
        case Right(_)   => true
      }
    }, n = 500)
    (0 until validFlac.length).foreach { n =>
      Flac.readSafe(java.util.Arrays.copyOf(validFlac, n)) match {
        case Left(kind) => assert(kinds.contains(kind), s"cut at $n: $kind")
        case Right(_)   => fail(s"cut at $n parsed (last block can't end early)")
      }
    }
  }

  private val validAnim: Array[Byte] = WebpAnim.encodeAnim(12, 8,
    (3, 5, 7, 255), 2, Seq(
      WebpAnim.EncFrame(0, 0, 40, disposeBg = false, 12, 8,
        Array.tabulate(12 * 8 * 4)(i =>
          if (i % 4 == 3) 0xff.toByte else ((i * 13) % 251).toByte))))

  test("WebpAnim.decodeSafe is total on garbage, mutations, truncations") {
    check(Prop.forAll(bytesGen) { b =>
      WebpAnim.decodeSafe(b).isLeft || WebpAnim.decodeSafe(b).isRight
    })
    val kinds = Set("unsupported", "truncated", "not_media", "malformed")
    check(Prop.forAll(
      Gen.chooseNum(0, validAnim.length - 1), Gen.chooseNum(1, 255)) { (pos, x) =>
      val m = validAnim.clone(); m(pos) = (m(pos) ^ x).toByte
      WebpAnim.decodeSafe(m) match {
        case Left(kind) => kinds.contains(kind)
        case Right(_)   => true
      }
    }, n = 500)
    (0 until validAnim.length).foreach { n =>
      WebpAnim.decodeSafe(java.util.Arrays.copyOf(validAnim, n)) match {
        case Left(kind) => assert(kinds.contains(kind), s"cut at $n: $kind")
        case Right(_)   => fail(s"cut at $n decoded")
      }
    }
  }

  private val validFlacAudio: Array[Byte] = FlacAudio.encode(8000, 16,
    Array(Array.tabulate(120)(i => ((i * 31) % 251) - 125)), blockSize = 64)

  test("FlacAudio.decodeSafe is total on garbage, mutations, truncations") {
    check(Prop.forAll(bytesGen) { b =>
      FlacAudio.decodeSafe(b).isLeft || FlacAudio.decodeSafe(b).isRight
    })
    val kinds = Set("bad_magic", "truncated", "bad_streaminfo", "bad_comment",
      "too_large", "bad_frame", "crc_mismatch", "bad_md5")
    check(Prop.forAll(
      Gen.chooseNum(0, validFlacAudio.length - 1), Gen.chooseNum(1, 255)) { (pos, x) =>
      val m = validFlacAudio.clone(); m(pos) = (m(pos) ^ x).toByte
      FlacAudio.decodeSafe(m) match {
        case Left(kind) => kinds.contains(kind)
        case Right(_)   => true
      }
    }, n = 500)
    (0 until validFlacAudio.length).foreach { n =>
      FlacAudio.decodeSafe(java.util.Arrays.copyOf(validFlacAudio, n)) match {
        case Left(kind) => assert(kinds.contains(kind), s"cut at $n: $kind")
        case Right(_)   => fail(s"cut at $n decoded (declared samples missing)")
      }
    }
  }

  private val validBzip2: Array[Byte] =
    Bzip2.compress(("bzip2 fuzz fodder " * 6 + "zzzzzzzzzzzz").getBytes(US_ASCII), 1) ++
      Bzip2.compress("second stream".getBytes(US_ASCII), 9)

  test("Bzip2.decompressSafe is total on garbage, mutations, truncations") {
    check(Prop.forAll(bytesGen) { b =>
      Bzip2.decompressSafe(b).isLeft || Bzip2.decompressSafe(b).isRight
    })
    val kinds = Set("bad_magic", "bad_frame", "too_large", "unsupported")
    check(Prop.forAll(
      Gen.chooseNum(0, validBzip2.length - 1), Gen.chooseNum(1, 255)) { (pos, x) =>
      val m = validBzip2.clone(); m(pos) = (m(pos) ^ x).toByte
      Bzip2.decompressSafe(m) match {
        case Left(kind) => kinds.contains(kind)
        case Right(_)   => true
      }
    }, n = 500)
    // truncation: refuse, or decode a clean stream PREFIX (a cut exactly
    // at a stream boundary IS a valid shorter multi-stream file — the
    // WARC resumability property on the bzip2 layer)
    val full = Bzip2.decompress(validBzip2)
    (0 until validBzip2.length).foreach { n =>
      Bzip2.decompressSafe(java.util.Arrays.copyOf(validBzip2, n)) match {
        case Left(kind) => assert(kinds.contains(kind), s"cut at $n: $kind")
        case Right(d) =>
          assert(d.length < full.length &&
            java.util.Arrays.equals(d, java.util.Arrays.copyOf(full, d.length)),
            s"cut at $n decoded a non-prefix")
      }
    }
  }

  private val validSnappy: Array[Byte] =
    Snappy.compress(("snappy fuzz fodder " * 6 + "zzzzzzzzzzzz").getBytes(US_ASCII)) ++
      Snappy.compress("second stream".getBytes(US_ASCII))

  test("Snappy.decompressSafe is total on garbage, mutations, truncations") {
    check(Prop.forAll(bytesGen) { b =>
      Snappy.decompressSafe(b).isLeft || Snappy.decompressSafe(b).isRight
    })
    val kinds = Set("bad_magic", "bad_frame", "too_large", "unsupported")
    check(Prop.forAll(
      Gen.chooseNum(0, validSnappy.length - 1), Gen.chooseNum(1, 255)) { (pos, x) =>
      val m = validSnappy.clone(); m(pos) = (m(pos) ^ x).toByte
      Snappy.decompressSafe(m) match {
        case Left(kind) => kinds.contains(kind)
        case Right(_)   => true
      }
    }, n = 500)
    val full = Snappy.decompress(validSnappy)
    (0 until validSnappy.length).foreach { n =>
      Snappy.decompressSafe(java.util.Arrays.copyOf(validSnappy, n)) match {
        case Left(kind) => assert(kinds.contains(kind), s"cut at $n: $kind")
        case Right(d) =>
          assert(d.length < full.length &&
            java.util.Arrays.equals(d, java.util.Arrays.copyOf(full, d.length)),
            s"cut at $n decoded a non-prefix")
      }
    }
  }

  private val validCbor: Array[Byte] =
    Cbor.encodeAll((0 until 6).map(i => graft.etl.JObj(Vector(
      "id" -> graft.etl.JInt(BigInt(i)), "t" -> graft.etl.JStr(s"doc $i")))))

  test("Cbor.decodeAllSafe is total on garbage and mutations") {
    check(Prop.forAll(bytesGen) { b =>
      Cbor.decodeAllSafe(b).isLeft || Cbor.decodeAllSafe(b).isRight
    })
    val kinds = Set("truncated", "bad_type", "too_large")
    check(Prop.forAll(
      Gen.chooseNum(0, validCbor.length - 1), Gen.chooseNum(1, 255)) { (pos, x) =>
      val m = validCbor.clone(); m(pos) = (m(pos) ^ x).toByte
      Cbor.decodeAllSafe(m) match {
        case Left(kind) => kinds.contains(kind)
        case Right(_)   => true
      }
    }, n = 500)
  }

  private val validExif: Array[Byte] =
    Exif.buildJpeg(6, "2024:02:29 12:00:00", "maker", Some((45L, 2L)),
      littleEndian = false, comment = "fuzz body")

  test("Exif.parseSafe is total on garbage and mutations") {
    check(Prop.forAll(bytesGen) { b =>
      Exif.parseSafe(b).isLeft || Exif.parseSafe(b).isRight
    })
    val kinds = Set("not_media", "truncated", "malformed")
    check(Prop.forAll(
      Gen.chooseNum(0, validExif.length - 1), Gen.chooseNum(1, 255)) { (pos, x) =>
      val m = validExif.clone(); m(pos) = (m(pos) ^ x).toByte
      Exif.parseSafe(m) match {
        case Left(kind) => kinds.contains(kind)
        case Right(_)   => true
      }
    }, n = 500)
  }

  private val validXz: Array[Byte] =
    Xz.compress(("xz fuzz fodder " * 6 + "zzzzzzzzzzzz").getBytes(US_ASCII), 1, 1) ++
      Xz.compress("second stream".getBytes(US_ASCII), 0, 4)

  test("Xz.decompressSafe is total on garbage, mutations, truncations") {
    check(Prop.forAll(bytesGen) { b =>
      Xz.decompressSafe(b).isLeft || Xz.decompressSafe(b).isRight
    })
    val kinds = Set("bad_magic", "bad_frame", "too_large", "unsupported")
    check(Prop.forAll(
      Gen.chooseNum(0, validXz.length - 1), Gen.chooseNum(1, 255)) { (pos, x) =>
      val m = validXz.clone(); m(pos) = (m(pos) ^ x).toByte
      Xz.decompressSafe(m) match {
        case Left(kind) => kinds.contains(kind)
        case Right(_)   => true
      }
    }, n = 500)
    // truncation: refuse, or decode a clean stream PREFIX (stream boundary)
    val full = Xz.decompress(validXz)
    (0 until validXz.length).foreach { n =>
      Xz.decompressSafe(java.util.Arrays.copyOf(validXz, n)) match {
        case Left(kind) => assert(kinds.contains(kind), s"cut at $n: $kind")
        case Right(d) =>
          assert(d.length < full.length &&
            java.util.Arrays.equals(d, java.util.Arrays.copyOf(full, d.length)),
            s"cut at $n decoded a non-prefix")
      }
    }
  }
}
