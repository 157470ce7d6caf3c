package graft.streaming

import graft.SparkSpec
import graft.ops.TfRecord
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets.US_ASCII

/** Stream/batch parity for the TFRecord shard ingest: shards built from
  * the sf0.001 documents, a deterministic slice poisoned (length-CRC
  * flip / payload corruption / truncation), fed in micro-batches through
  * [[CorpusStreams.tfRecordScan]] — final per-outcome totals must equal
  * the batch run and the aggregate state must stay vocabulary-bounded.
  */
class TfRecordStreamSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def shards(): Seq[(String, Array[Byte])] = {
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    docs.grouped(4).zipWithIndex.map { case (grp, gi) =>
      val clean = TfRecord.write(grp.toSeq.map(_._2.getBytes(US_ASCII)))
      val bytes = (gi % 7) match {
        case 0 => val b = clean.clone(); b(9) = (b(9) ^ 0x01).toByte; b
        case 1 => val b = clean.clone(); b(14) = (b(14) ^ 0x5a).toByte; b
        case 2 => java.util.Arrays.copyOf(clean, clean.length - 3)
        case _ => clean
      }
      (s"s$gi.tfrecord", bytes)
    }.toSeq
  }

  test("streaming TFRecord scan matches batch totals; refusals typed; state bounded") {
    import spark.implicits._
    val files = shards()
    assert(files.size >= 14)

    val in = MemoryStream[(String, Array[Byte])](spark)
    val q = CorpusStreams.tfRecordScan(in.toDS().toDF("file", "content"))
      .writeStream.format("memory").queryName("tfrecscan")
      .outputMode("update").start()
    try {
      files.grouped((files.size + 2) / 3).foreach { chunk =>
        in.addData(chunk); q.processAllAvailable()
      }
      def keyed(rows: Array[org.apache.spark.sql.Row]) = rows
        .map(r => (r.getAs[String]("outcome"),
          (r.getAs[Long]("n"), r.getAs[Long]("sum_bytes"))))
        .groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).maxBy(_._1) }

      val streamed = keyed(spark.table("tfrecscan").collect())
      val batch = keyed(CorpusStreams.tfRecordScan(files.toDF("file", "content")).collect())
      assert(streamed == batch, s"streamed $streamed\nbatch $batch")
      for (k <- Seq("bad_length_crc", "bad_data_crc", "truncated"))
        assert(batch.contains(k), s"missing refusal $k in $batch")
      assert(batch("ok")._2 > 0L)
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 4, s"aggregate state holds $stateRows rows (want <= 4)")
    } finally q.stop()
  }
}
