package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import java.nio.file.Files

/** S1-S7 coverage: document sources (txt/md via binaryFile), unsupported-
  * extension guard, PDF stub, CSV serving sink (+ re-read via the CSV
  * source), parquet sink, schema JSON sink (registry covered in
  * PipelineGoldenSpec).
  */
class SourcesSinksSpec extends SparkSpec {

  private def tempDir = Files.createTempDirectory("graft-docs")

  test("readDocuments reads .txt and .md as UTF-8 text") {
    val dir = tempDir
    Files.writeString(dir.resolve("a.txt"), """{"x": 1}""")
    Files.writeString(dir.resolve("b.md"), "[2024-01-01 00:00:00] log line")
    val docs = DocumentEtl.readDocuments(spark, dir.toString)
    val texts = docs.collect().map(_.getAs[String]("text")).toSet
    assert(texts == Set("""{"x": 1}""", "[2024-01-01 00:00:00] log line"))
    // distinct doc ids
    assert(docs.select("doc_id").distinct().count() == 2)
  }

  test("unsupported extension raises (S3 guard); non-PDF bytes as .pdf raise") {
    val dir = tempDir
    Files.writeString(dir.resolve("bad.xyz"), "data")
    val docs = DocumentEtl.readDocuments(spark, dir.toString)
    val ex = intercept[Exception] { docs.collect() }
    assert(ex.getMessage.contains("Unsupported file type") ||
      Option(ex.getCause).exists(_.getMessage.contains("Unsupported file type")))

    // real PDF extraction is covered by PdfTextSpec; junk bytes still raise
    assert(intercept[Exception] {
      PlainTextExtractor.extract("x.pdf", Array[Byte](1))
    }.getMessage.contains("PDF"))
  }

  test("empty text flows to the E9 error row; binaryFile skips 0-byte files") {
    import spark.implicits._
    // an empty STRING document produces the error fallback row...
    val res = DocumentEtl.run(spark, Seq((0L, "")).toDF("doc_id", "text"))
    assert(res.table.collect().length == 1)
    assert(res.columns == Seq("_error", "_source_type"))

    // ...but Spark's binaryFile source skips zero-LENGTH files entirely
    // (documented source behavior), and the pipeline survives empty input.
    val dir = tempDir
    Files.writeString(dir.resolve("empty.txt"), "")
    val docs = DocumentEtl.readDocuments(spark, dir.toString)
    assert(docs.count() == 0)
    val empty = DocumentEtl.run(spark, docs)
    assert(empty.table.count() == 0 && empty.schema.fields.isEmpty)
  }

  test("CSV serving sink renders pandas-style and re-reads via the CSV source") {
    import spark.implicits._
    val docs = Seq((0L, """[{"id": 1, "name": "Alice", "score": 95}, {"id": 2, "name": "Bob", "score": 88}]"""))
      .toDF("doc_id", "text")
    val res = DocumentEtl.run(spark, docs)
    val out = Files.createTempDirectory("graft-csv").toString + "/out"
    DocumentEtl.writeCsv(res, out)
    val back = spark.read.option("header", "true").csv(out)
    assert(back.columns.toSeq == res.columns)
    val rows = back.collect().map(r => res.columns.map(c => Option(r.getAs[String](c)).getOrElse("")))
    // faithful quirks visible in the serving CSV: id 1 -> "True" (bool
    // branch), score 95 -> digit string via phone branch, names lowercased
    assert(rows.contains(Seq("True", "alice", "95", "")))
    assert(rows.contains(Seq("2", "bob", "88", "json")))
  }

  test("ORC and JSONL sinks/sources round-trip the documents table") {
    val dir = tempDir
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    docs.write.mode("overwrite").orc(s"$dir/orc")
    docs.write.mode("overwrite").json(s"$dir/jsonl")
    val orc = spark.read.orc(s"$dir/orc")
    val jsonl = spark.read.schema(docs.schema).json(s"$dir/jsonl")
    assert(orc.count() == docs.count() && jsonl.count() == docs.count())
    assert(orc.exceptAll(docs).isEmpty && jsonl.exceptAll(docs).isEmpty)
  }

  test("parquet sink round-trips the JSON-cell table") {
    import spark.implicits._
    val docs = Seq((0L, """{"a": 1, "b": "x"}""")).toDF("doc_id", "text")
    val res = DocumentEtl.run(spark, docs)
    val out = Files.createTempDirectory("graft-pq").toString + "/t"
    DocumentEtl.writeParquet(res, out)
    val back = spark.read.parquet(out)
    assert(back.count() == res.table.count())
    assert(res.columns.forall(back.columns.contains))
  }
}
