package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream/batch parity for the mixed-codec compressed-JSONL ingest:
  * shards built from the sf0.001 documents rotating ALL SEVEN codecs
  * (zstd, LZ4, concatenated gzip members, multi-stream bzip2, xz,
  * snappy framed — sniffed by magic — plus brotli `.br` shards routed
  * by extension), a deterministic slice poisoned per codec (magic flip
  * / truncation), fed in micro-batches through
  * [[CorpusStreams.compressedJsonlScan]] — final per-(outcome, lang)
  * totals must equal the batch run and the aggregate state must stay
  * vocabulary-bounded.
  */
class CompressedJsonlStreamSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def shards(): Seq[(String, Array[Byte])] = {
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    docs.grouped(4).zipWithIndex.map { case (grp, gi) =>
      val jsonl = grp.map { case (id, lang, text) =>
        s"""{"id":$id,"lang":${graft.etl.Json.quote(lang)},"text":${graft.etl.Json.quote(text)}}"""
      }.mkString("\n").getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val clean = (gi % 7) match {
        case 0 => graft.ops.Zstd.compress(jsonl)
        case 1 => graft.ops.Zstd.compressLz4(jsonl)
        case 2 =>
          val cut = jsonl.length / 2
          graft.ops.Zstd.compressGzip(java.util.Arrays.copyOf(jsonl, cut)) ++
            graft.ops.Zstd.compressGzip(
              java.util.Arrays.copyOfRange(jsonl, cut, jsonl.length))
        case 3 => graft.ops.Bzip2.compress(jsonl, 1)
        case 4 => graft.ops.Xz.compress(jsonl, 1, if (gi % 2 == 0) 1 else 4)
        case 5 => graft.ops.Snappy.compress(jsonl)
        case _ => graft.ops.Brotli.compress(jsonl)
      }
      val bytes = (gi % 11) match {
        // brotli has no magic to flip: its poison twin is trailing
        // garbage, which the final-byte gate refuses as bad_frame
        case 0 if gi % 7 == 6 => clean :+ 0x41.toByte
        case 0 => val b = clean.clone(); b(0) = (b(0) ^ 0x5a).toByte; b
        case 1 => java.util.Arrays.copyOf(clean, clean.length - 5)
        case _ => clean
      }
      (if (gi % 7 == 6) s"s$gi.jsonl.br" else s"s$gi.comp", bytes)
    }.toSeq
  }

  test("streaming mixed-codec jsonl scan matches batch totals; refusals typed; state bounded") {
    import spark.implicits._
    val files = shards()
    assert(files.size >= 20)

    val in = MemoryStream[(String, Array[Byte])](spark)
    val q = CorpusStreams.compressedJsonlScan(in.toDS().toDF("file", "content"))
      .writeStream.format("memory").queryName("compscan")
      .outputMode("update").start()
    try {
      files.grouped((files.size + 2) / 3).foreach { chunk =>
        in.addData(chunk); q.processAllAvailable()
      }
      def keyed(rows: Array[org.apache.spark.sql.Row]) = rows
        .map(r => ((r.getAs[String]("outcome"), r.getAs[String]("lang")),
          (r.getAs[Long]("n"), r.getAs[Long]("sum_bytes"))))
        .groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).maxBy(_._1) }

      val streamed = keyed(spark.table("compscan").collect())
      val batch = keyed(
        CorpusStreams.compressedJsonlScan(files.toDF("file", "content")).collect())
      assert(streamed == batch, s"streamed $streamed\nbatch $batch")
      // both poison classes fired across the codec rotation
      assert(batch.contains(("bad_magic", "")), s"missing bad_magic in $batch")
      assert(batch.keys.exists(k => k._1 == "bad_frame"), s"missing bad_frame in $batch")
      val okBytes = batch.collect { case (("ok", _), (_, b)) => b }.sum
      assert(okBytes > 0L)
      // bound: refusal kinds (≤4) + ok×languages (≤8 in testdata)
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 4 + 8, s"aggregate state holds $stateRows rows")
    } finally q.stop()
  }
}
