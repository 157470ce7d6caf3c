package graft.ops

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

/** File-level record-shard ingest on real temp files (binaryFile scan →
  * per-shard decode; poisoned shard → one typed row) for the Avro,
  * TFRecord, and compressed-JSONL front doors.
  */
class ShardSourceSpec extends graft.SparkSpec {

  private val avroSchema = Avro.Schema("doc",
    Vector("id" -> "long", "lang" -> "string", "text" -> "string"))

  private def avroShard(f: Int): Array[Byte] =
    Avro.write(avroSchema, (0 until 4).map(i =>
      Avro.Record(Vector((f * 10 + i).toLong, "en", s"body $f/$i"))),
      if (f % 2 == 0) "deflate" else "null")

  private def withDir[A](prefix: String)(body: java.nio.file.Path => A): A = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    try body(dir)
    finally { dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete() }
  }

  test("avroDocs reads a shard directory; safe twin types rot and alien schemas") {
    withDir("avrosrc") { dir =>
      (0 until 2).foreach(f =>
        java.nio.file.Files.write(dir.resolve(s"s$f.avro"), avroShard(f)))
      val bad = avroShard(2).clone(); bad(0) = 'X'.toByte
      java.nio.file.Files.write(dir.resolve("rot.avro"), bad)
      val alien = Avro.write(Avro.Schema("k", Vector("v" -> "long")),
        Seq(Avro.Record(Vector(1L))), "null")
      java.nio.file.Files.write(dir.resolve("alien.avro"), alien)

      val safe = ShardSource.avroDocsSafe(spark, dir.toString).cache()
      assert(safe.filter(col("ok")).count() == 8)
      assert(safe.filter(!col("ok")).select("err_kind").collect()
        .map(_.getString(0)).sorted.toSeq == Seq("bad_magic", "bad_schema"))
      val one = safe.filter(col("id") === 13L).collect()
      assert(one.length == 1 && one.head.getAs[String]("text") == "body 1/3")
      safe.unpersist()

      // the strict reader over only the healthy files agrees
      val strict = ShardSource.avroDocs(spark, dir.toString + "/s*.avro")
      assert(strict.count() == 8)
    }
  }

  test("tfRecords reads shards with ordinals; safe twin types a CRC flip") {
    withDir("tfrsrc") { dir =>
      val recs = (0 until 5).map(i => s"payload-$i".getBytes(UTF_8))
      java.nio.file.Files.write(dir.resolve("a.tfrecord"), TfRecord.write(recs))
      val bad = TfRecord.write(recs).clone()
      bad(bad.length - 1) = (bad(bad.length - 1) ^ 0x40).toByte
      java.nio.file.Files.write(dir.resolve("b.tfrecord"), bad)

      val safe = ShardSource.tfRecordsSafe(spark, dir.toString).cache()
      assert(safe.filter(col("ok")).count() == 5)
      assert(safe.filter(!col("ok")).select("err_kind").collect()
        .map(_.getString(0)).toSeq == Seq("bad_data_crc"))
      val p3 = safe.filter(col("ok") && col("idx") === 3).collect()
      assert(new String(p3.head.getAs[Array[Byte]]("payload"), UTF_8) == "payload-3")
      safe.unpersist()
      assert(ShardSource.tfRecords(spark, dir.toString + "/a.tfrecord").count() == 5)
    }
  }

  test("jsonlLines sniffs the codec per file; safe twin types a bad frame") {
    withDir("zstsrc") { dir =>
      val lines = (0 until 6).map(i => s"""{"i":$i}""").mkString("\n").getBytes(UTF_8)
      java.nio.file.Files.write(dir.resolve("a.jsonl.zst"), Zstd.compress(lines))
      java.nio.file.Files.write(dir.resolve("b.jsonl.lz4"), Zstd.compressLz4(lines))
      val rot = Zstd.compress(lines).clone(); rot(0) = 0x7f.toByte
      java.nio.file.Files.write(dir.resolve("c.jsonl.zst"), rot)

      val safe = ShardSource.jsonlLinesSafe(spark, dir.toString).cache()
      assert(safe.filter(col("ok")).count() == 12)
      assert(safe.filter(!col("ok")).select("err_kind").collect()
        .map(_.getString(0)).toSeq == Seq("bad_magic"))
      assert(safe.filter(col("ok") && col("idx") === 5)
        .select("line").collect().map(_.getString(0)).toSeq ==
        Seq("""{"i":5}""", """{"i":5}"""))
      safe.unpersist()
    }
  }

  test("jsonlLines sniffs the FULL codec matrix: gzip, bzip2, xz, snappy per file") {
    withDir("allcodecs") { dir =>
      val lines = (0 until 6).map(i => s"""{"i":$i}""").mkString("\n").getBytes(UTF_8)
      java.nio.file.Files.write(dir.resolve("a.jsonl.gz"), Zstd.compressGzip(lines))
      java.nio.file.Files.write(dir.resolve("b.jsonl.bz2"), Bzip2.compress(lines, 1))
      java.nio.file.Files.write(dir.resolve("c.jsonl.xz"), Xz.compress(lines, 1, 1))
      java.nio.file.Files.write(dir.resolve("d.jsonl.sz"), Snappy.compress(lines))
      val strict = ShardSource.jsonlLines(spark, dir.toString)
      assert(strict.count() == 24)
      assert(strict.filter(col("idx") === 3).select("line").collect()
        .map(_.getString(0)).toSeq == Seq.fill(4)("""{"i":3}"""))
      // one rotten bzip2 stream types a bad_frame row, rest unaffected
      val cut = java.util.Arrays.copyOf(Bzip2.compress(lines, 1),
        Bzip2.compress(lines, 1).length - 6)
      java.nio.file.Files.write(dir.resolve("e.jsonl.bz2"), cut)
      val safe = ShardSource.jsonlLinesSafe(spark, dir.toString).cache()
      assert(safe.filter(col("ok")).count() == 24)
      assert(safe.filter(!col("ok")).select("err_kind").collect()
        .map(_.getString(0)).toSeq == Seq("bad_frame"))
      safe.unpersist()
    }
  }
}
