package graft.ops

import java.nio.charset.StandardCharsets.US_ASCII

/** File-level WebDataset ingest on real temp shards (binaryFile scan →
  * per-shard sample grouping; poisoned shard → typed row).
  */
class TarSourceSpec extends graft.SparkSpec {

  private def shard(f: Int): Array[Byte] =
    Tar.write((0 until 3).flatMap(i => Seq(
      Tar.TarEntry(s"s$f-$i.txt", s"text $f/$i".getBytes(US_ASCII)),
      Tar.TarEntry(s"s$f-$i.cls", "en".getBytes(US_ASCII)))))

  test("samples() reads a directory of shards and pairs members by key") {
    val dir = java.nio.file.Files.createTempDirectory("tarsrc")
    try {
      (0 until 2).foreach(f =>
        java.nio.file.Files.write(dir.resolve(s"shard-$f.tar"), shard(f)))
      val df = TarSource.samples(spark, dir.toString).cache()
      assert(df.count() == 6)
      val one = df.filter(org.apache.spark.sql.functions.col("key") === "s1-2").collect()
      assert(one.length == 1)
      val r = one.head
      assert(r.getAs[scala.collection.Seq[String]]("exts").toSeq == Seq("cls", "txt"))
      val payloads = r.getAs[scala.collection.Seq[Array[Byte]]]("payloads")
      assert(new String(payloads(1), US_ASCII) == "text 1/2")
      df.unpersist()
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }

  test("samplesSafe() types a corrupt shard without failing the scan") {
    val dir = java.nio.file.Files.createTempDirectory("tarsafe")
    try {
      val bad = shard(9).clone(); bad(3) = (bad(3) ^ 0x15).toByte
      java.nio.file.Files.write(dir.resolve("good.tar"), shard(0))
      java.nio.file.Files.write(dir.resolve("bad.tar"), bad)
      val rows = TarSource.samplesSafe(spark, dir.toString)
        .select("ok", "err_kind").collect()
      assert(rows.count(_.getBoolean(0)) == 3) // good shard's samples
      assert(rows.filter(!_.getBoolean(0)).map(_.getString(1)).toSeq ==
        Seq("bad_checksum"))
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }
}
