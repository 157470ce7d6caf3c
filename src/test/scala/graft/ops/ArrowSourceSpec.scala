package graft.ops

import org.apache.spark.sql.functions.col

import ArrowIpc.{ACol, AField, ALongCol, AStrCol}

/** File-level Arrow IPC ingest on real temp stream files (binaryFile
  * scan → per-file decode; poisoned or wrong-schema stream → typed row).
  */
class ArrowSourceSpec extends graft.SparkSpec {

  private val fields = Vector(
    AField("id", "i64", nullable = false),
    AField("lang", "utf8", nullable = false),
    AField("text", "utf8", nullable = false))

  private def stream(f: Int): Array[Byte] =
    ArrowIpc.write(fields, Seq(Vector[ACol](
      ALongCol("id", null, Array(f * 10L, f * 10L + 1)),
      AStrCol("lang", null, Array("en", "de")),
      AStrCol("text", null, Array(s"alpha $f", s"beta $f")))))

  test("records() reads a directory of stream shards") {
    val dir = java.nio.file.Files.createTempDirectory("arrowsrc")
    try {
      (0 until 3).foreach(f =>
        java.nio.file.Files.write(dir.resolve(s"part-$f.arrows"), stream(f)))
      val df = ArrowSource.records(spark, dir.toString).cache()
      assert(df.count() == 6)
      val r = df.filter(col("id") === 21L).collect()
      assert(r.length == 1 && r.head.getAs[String]("text") == "beta 2")
      assert(df.filter(col("lang") === "en").count() == 3)
      df.unpersist()
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }

  test("recordsSafe() types rotten and wrong-schema streams without failing") {
    val dir = java.nio.file.Files.createTempDirectory("arrowsafe")
    try {
      java.nio.file.Files.write(dir.resolve("good.arrows"), stream(0))
      val rot = stream(1); rot(0) = (rot(0) ^ 0x5a).toByte
      java.nio.file.Files.write(dir.resolve("rot.arrows"), rot)
      val wrong = ArrowIpc.write(
        Vector(AField("x", "f64", nullable = false)),
        Seq(Vector[ACol](ArrowIpc.ADoubleCol("x", null, Array(1.5)))))
      java.nio.file.Files.write(dir.resolve("wrong.arrows"), wrong)
      val df = ArrowSource.recordsSafe(spark, dir.toString).cache()
      assert(df.filter(col("ok")).count() == 2) // the good stream's records
      val bad = df.filter(!col("ok"))
        .select(col("file"), col("err_kind")).collect()
        .map(r => (r.getString(0).split('/').last, r.getString(1))).toMap
      assert(bad == Map("rot.arrows" -> "bad_stream", "wrong.arrows" -> "bad_schema"))
      df.unpersist()
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }
}
