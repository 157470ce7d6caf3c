package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

import graft.etl.{JArr, JBool, JFloat, JInt, JObj, JStr, JVal, Json}

/** Locks on the Avro object-container codec (graft.ops.Avro): bit-exact
  * decode of fixtures written by the INDEPENDENT python writer
  * (tools/make_avro_fixture.py — zigzag/varint/UTF-8/LE-double encoding
  * from the public spec, including the negative-count metadata-map
  * variant the Scala writer never emits), deterministic round trips over
  * both codecs, the typed-refusal contract, and the inflate-bomb cap.
  */
class AvroSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private lazy val expected: Map[String, JArr] =
    Json.parse(new String(fixture("avro_expected.json"), UTF_8)) match {
      case JObj(fs) => fs.toMap.collect { case (k, a: JArr) => k -> a }
      case other => fail(s"bad expected json: $other")
    }

  private def withBudget[A](bytes: Long)(f: => A): A = {
    val old = graft.core.Budget.maxInflatedBytes
    graft.core.Budget.maxInflatedBytes = bytes
    try f finally graft.core.Budget.maxInflatedBytes = old
  }

  private def jLong(v: JVal): Long = v match {
    case JInt(i) => i.toLong
    case JFloat(d) => d.toLong
    case other => fail(s"not a number: $other")
  }

  private def jDouble(v: JVal): Double = v match {
    case JInt(i) => i.toDouble
    case JFloat(d) => d
    case other => fail(s"not a number: $other")
  }

  private def assertDocRows(recs: Vector[Avro.Record]): Unit = {
    val exp = expected("rows").items
    assert(recs.length == exp.length)
    recs.zip(exp).foreach {
      case (r, JArr(e)) =>
        assert(r.values(0) == jLong(e(0)))
        assert(r.values(1) == e(1).asInstanceOf[JStr].s)
        assert(r.values(2) == e(2).asInstanceOf[JStr].s)
        assert(r.values(3) == jDouble(e(3)))
        assert(r.values(4) == e(4).asInstanceOf[JBool].b)
        assert(r.values(5).asInstanceOf[Array[Byte]].map("%02x".format(_)).mkString
          == e(5).asInstanceOf[JStr].s)
        assert(r.values(6) == jLong(e(6)).toInt)
      case other => fail(s"bad expected row: $other")
    }
  }

  test("python-writer null-codec fixture decodes exactly") {
    val (schema, recs) = Avro.read(fixture("avro_null.avro"))
    assert(schema.name == "doc")
    assert(schema.fields.map(_._1) ==
      Vector("id", "lang", "text", "score", "keep", "tag", "rank"))
    assertDocRows(recs)
  }

  test("python-writer deflate fixture decodes exactly (raw RFC 1951)") {
    val (_, recs) = Avro.read(fixture("avro_deflate.avro"))
    assertDocRows(recs)
  }

  test("negative-count metadata map variant is honored") {
    val (schema, recs) = Avro.read(fixture("avro_negmeta.avro"))
    assert(schema.name == "doc")
    assertDocRows(recs)
  }

  test("zigzag boundary longs survive the minimal fixture") {
    val (_, recs) = Avro.read(fixture("avro_minimal.avro"))
    val exp = expected("minimal").items.map(jLong)
    assert(recs.map(_.values.head) == exp)
  }

  test("nullable-union fields decode from the python fixture and round-trip") {
    val (schema, recs) = Avro.read(fixture("avro_optional.avro"))
    assert(schema.fields == Vector("id" -> "long", "note" -> "string?",
      "w" -> "double?"))
    val exp = expected("optional").items
    assert(recs.length == exp.length)
    recs.zip(exp).foreach {
      case (r, JArr(e)) =>
        assert(r.values(0) == jLong(e(0)))
        e(1) match {
          case JStr(s) => assert(r.values(1) == s)
          case _ => assert(r.values(1) == null)
        }
        e(2) match {
          case n @ (JInt(_) | JFloat(_)) => assert(r.values(2) == jDouble(n))
          case _ => assert(r.values(2) == null)
        }
      case other => fail(s"bad expected row: $other")
    }
    // round trip through the Scala writer preserves nulls bit-for-bit
    val again = Avro.write(schema, recs, "deflate", blockSize = 4)
    assert(Avro.read(again)._2 == recs)
    // a union branch index other than 0/1 refuses typed: the minimal
    // optional record [index=2] is a bad_record, not a crash
    val one = Avro.write(Avro.Schema("o", Vector("x" -> "long?")),
      Seq(Avro.Record(Vector(5L))), "null")
    // locate the record body: last block is count|size|data|sync; index
    // byte is the first data byte = zigzag(1) = 0x02 -> corrupt to 0x04
    val idx = one.length - 16 - 2 // sync(16) + value(1 byte) + index(1 byte)
    assert((one(idx) & 0xff) == 2)
    val badBranch = one.clone(); badBranch(idx) = 4
    assert(Avro.readSafe(badBranch) == Left("bad_record"))
    // any OTHER union shape in the schema refuses bad_meta
    val aliens = Seq(
      """["string","null"]""", """["null","string","long"]""",
      """["null",{"type":"array","items":"long"}]""")
    for (u <- aliens) {
      val doc = s"""{"type":"record","name":"a","fields":[{"name":"x","type":$u}]}"""
      assert(Avro.readSafe(rawContainer(doc)) == Left("bad_meta"), u)
    }
  }

  test("schema resolution: reorder, defaults, promotions, refusals") {
    val writer = Avro.Schema("d", Vector("id" -> "int", "body" -> "string",
      "w" -> "float", "old" -> "long"))
    val shard = Avro.write(writer, (0 until 6).map(i =>
      Avro.Record(Vector(i, s"text-$i", i / 2f, i.toLong * 100))), "deflate")

    // reader: reordered, promoted (int->long, float->double,
    // string->bytes), drops `old`, adds defaulted `lang` and nullable `tag`
    val reader = Seq(
      Avro.ReaderField("body", "bytes", None),
      Avro.ReaderField("id", "long", None),
      Avro.ReaderField("w", "double", None),
      Avro.ReaderField("lang", "string", Some("en")),
      Avro.ReaderField("tag", "string?", Some(null)))
    val recs = Avro.readResolved(shard, reader)
    assert(recs.length == 6)
    val r3 = recs(3)
    assert(new String(r3.values(0).asInstanceOf[Array[Byte]], UTF_8) == "text-3")
    assert(r3.values(1) == 3L)                  // int -> long
    assert(r3.values(2) == (3 / 2f).toDouble)   // float -> double, exact
    assert(r3.values(3) == "en")                // defaulted
    assert(r3.values(4) == null)                // nullable default

    // required-to-nullable promotion (T -> T?) resolves
    val opt = Avro.readResolved(shard,
      Seq(Avro.ReaderField("body", "string?", None)))
    assert(opt.head.values.head == "text-0")

    // a required reader field the writer lacks refuses bad_schema
    assert(Avro.readResolvedSafe(shard,
      Seq(Avro.ReaderField("missing", "long", None))) == Left("bad_schema"))
    // an illegal promotion (long -> int) refuses bad_schema
    assert(Avro.readResolvedSafe(shard,
      Seq(Avro.ReaderField("old", "int", None))) == Left("bad_schema"))
    // rot still surfaces its own typed kind through the resolved path
    val bad = shard.clone(); bad(0) = 'X'.toByte
    assert(Avro.readResolvedSafe(bad, reader) == Left("bad_magic"))
  }

  /** hand-built empty container around an arbitrary schema string. */
  private def rawContainer(schemaJson: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def varLong(v: Long): Unit = {
      var z = (v << 1) ^ (v >> 63)
      while ((z & ~0x7fL) != 0L) { out.write(((z & 0x7f) | 0x80).toInt); z >>>= 7 }
      out.write(z.toInt)
    }
    def bytes(b: Array[Byte]): Unit = { varLong(b.length.toLong); out.write(b, 0, b.length) }
    out.write(Array[Byte]('O', 'b', 'j', 1), 0, 4)
    varLong(2L)
    bytes("avro.schema".getBytes(UTF_8)); bytes(schemaJson.getBytes(UTF_8))
    bytes("avro.codec".getBytes(UTF_8)); bytes("null".getBytes(UTF_8))
    varLong(0L)
    out.write(new Array[Byte](16), 0, 16)
    out.toByteArray
  }

  test("round trip is exact and shards are deterministic, both codecs") {
    val schema = Avro.Schema("d", Vector("id" -> "long", "body" -> "string",
      "w" -> "double", "f" -> "float", "ok" -> "boolean", "raw" -> "bytes",
      "k" -> "int"))
    val recs = (0 until 257).map { i =>
      Avro.Record(Vector(i.toLong * 31 - 999, s"déjà vu $i" * (i % 5 + 1),
        i * 0.25 - 3.0, i.toFloat / 8f, i % 3 == 0,
        Array[Byte](i.toByte, (i >> 3).toByte), -i))
    }
    for (codec <- Seq("null", "deflate")) {
      val a = Avro.write(schema, recs, codec, blockSize = 100)
      val b = Avro.write(schema, recs, codec, blockSize = 100)
      assert(java.util.Arrays.equals(a, b), s"$codec shard not deterministic")
      val (s2, back) = Avro.read(a)
      assert(s2 == schema)
      assert(back.length == recs.length)
      back.zip(recs).foreach { case (x, y) =>
        x.values.zip(y.values).foreach {
          case (u: Array[Byte], v: Array[Byte]) =>
            assert(java.util.Arrays.equals(u, v))
          case (u, v) => assert(u == v)
        }
      }
    }
  }

  test("typed refusals: magic, sync, codec, record grammar, truncation") {
    val schema = Avro.Schema("d", Vector("id" -> "long", "t" -> "string"))
    val recs = (0 until 50).map(i => Avro.Record(Vector(i.toLong, s"r$i")))
    val clean = Avro.write(schema, recs, "deflate", blockSize = 16)

    val flipped = clean.clone(); flipped(0) = 'X'.toByte
    assert(Avro.readSafe(flipped) == Left("bad_magic"))

    val cut = java.util.Arrays.copyOf(clean, clean.length - 7)
    assert(Avro.readSafe(cut).isLeft) // truncated or bad_record, never a throw

    val syncFlip = clean.clone()
    syncFlip(clean.length - 1) = (syncFlip(clean.length - 1) ^ 0x11).toByte
    assert(Avro.readSafe(syncFlip) == Left("bad_sync"))

    // unsupported codec in metadata must refuse, not guess
    val snappy = Avro.write(schema, recs, "deflate", blockSize = 16)
    val idx = indexOfSlice(snappy, "deflate".getBytes(UTF_8))
    assert(idx > 0)
    System.arraycopy("snappyX".getBytes(UTF_8), 0, snappy, idx, 7)
    assert(Avro.readSafe(snappy) == Left("bad_codec"))

    // a corrupted deflate block is bad_record/truncated, not a crash
    val mid = clean.clone()
    mid(clean.length / 2) = (mid(clean.length / 2) ^ 0x5a).toByte
    assert(Avro.readSafe(mid).isLeft)
  }

  test("inflate bomb refuses too_large at the budget, not at OOM") {
    val schema = Avro.Schema("d", Vector("t" -> "string"))
    val big = Avro.Record(Vector(" " * (8 * 1024 * 1024)))
    val bomb = Avro.write(schema, Seq(big, big), "deflate", blockSize = 2)
    assert(bomb.length < 64 * 1024)
    withBudget(1024 * 1024)(assert(Avro.readSafe(bomb) == Left("too_large")))
    val (_, ok) = Avro.read(bomb)
    assert(ok.head.values.head.asInstanceOf[String].length == 8 * 1024 * 1024)
  }

  test("totality: garbage, mutations, and every truncation refuse typed") {
    val schema = Avro.Schema("d", Vector("id" -> "long", "t" -> "string"))
    val recs = (0 until 20).map(i => Avro.Record(Vector(i.toLong, s"body $i")))
    val clean = Avro.write(schema, recs, "null", blockSize = 7)
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val junk = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(junk)
      Avro.readSafe(junk) // must not throw
    }
    (0 until 500).foreach { _ =>
      val m = clean.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Avro.readSafe(m) match {
        case Right((_, rs)) => assert(rs.length == recs.length) // benign byte
        case Left(kind) => assert(kind.nonEmpty)
      }
    }
    (0 until clean.length).foreach { n =>
      Avro.readSafe(java.util.Arrays.copyOf(clean, n)) // must not throw
    }
  }

  private def indexOfSlice(hay: Array[Byte], needle: Array[Byte]): Int =
    hay.indices.find(i => i + needle.length <= hay.length &&
      needle.indices.forall(j => hay(i + j) == needle(j))).getOrElse(-1)
}
