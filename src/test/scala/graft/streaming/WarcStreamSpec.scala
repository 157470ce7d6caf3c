package graft.streaming

import graft.SparkSpec
import graft.ops.Warc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets.US_ASCII

/** Stream/batch parity for the WARC ingest scan: crawl files built from
  * the sf0.001 documents (the warc02 status-mix recipe), a slice of them
  * poisoned (CRC flip / truncation), fed in micro-batches through
  * [[CorpusStreams.warcScan]] — final per-(outcome, status) totals must
  * equal the batch run, refusals must be typed rows, and the aggregate
  * state must stay vocabulary-bounded.
  */
class WarcStreamSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def crawlFiles(): Seq[(String, Array[Byte])] = {
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    docs.grouped(4).zipWithIndex.map { case (grp, gi) =>
      val pages = grp.toSeq.map { case (id, source, text) =>
        (id % 7) match {
          case 0 => (s"https://$source/doc/$id", 404,
            Seq("Content-Type" -> "text/html"), "not found".getBytes(US_ASCII))
          case 1 => (s"https://$source/doc/$id", 301,
            Seq("Location" -> s"https://$source/doc/${id + 1}"), Array.emptyByteArray)
          case _ => (s"https://$source/doc/$id", 200,
            Seq("Content-Type" -> "text/plain"), text.getBytes(US_ASCII))
        }
      }
      val clean = Warc.buildCrawlFile(s"f$gi.warc.gz", pages)
      val bytes = (gi % 5) match {
        case 0 => // CRC flip → crc_mismatch
          val b = clean.clone(); b(b.length - 8) = (b(b.length - 8) ^ 0x5a).toByte; b
        case 1 => java.util.Arrays.copyOf(clean, clean.length - 5) // truncated
        case _ => clean
      }
      (s"f$gi.warc.gz", bytes)
    }.toSeq
  }

  test("streaming WARC scan matches batch totals; refusals typed; state bounded") {
    import spark.implicits._
    val files = crawlFiles()
    assert(files.size >= 10, "need enough files to poison a slice")

    val in = MemoryStream[(String, Array[Byte])](spark)
    val q = CorpusStreams.warcScan(in.toDS().toDF("file", "content"))
      .writeStream.format("memory").queryName("warcscan")
      .outputMode("update").start()
    try {
      files.grouped((files.size + 2) / 3).foreach { chunk =>
        in.addData(chunk); q.processAllAvailable()
      }
      def keyed(rows: Array[org.apache.spark.sql.Row]) = rows
        .map(r => ((r.getAs[String]("outcome"), r.getAs[Int]("status")),
          (r.getAs[Long]("n"), r.getAs[Long]("sum_bytes"))))
        .groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).maxBy(_._1) }

      val streamed = keyed(spark.table("warcscan").collect())
      val batch = keyed(CorpusStreams.warcScan(files.toDF("file", "content")).collect())

      assert(streamed == batch, s"streamed $streamed\nbatch $batch")
      // both refusal kinds present as typed keys, all three statuses parsed
      assert(batch.contains(("crc_mismatch", 0)) && batch.contains(("truncated", 0)))
      assert(Seq(200, 301, 404).forall(st => batch.contains(("ok", st))))
      // 301 bodies are empty by construction — the status parse is real
      assert(batch(("ok", 301))._2 == 0L)
      // bounded state: (outcome, status) vocabulary, not per-record
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 5, s"aggregate state holds $stateRows rows (want <= 5)")
    } finally q.stop()
  }

  test("streaming revisit resolution: stream-static join matches the batch (round 15)") {
    import spark.implicits._
    // originals as the STATIC side (rid -> bytes/hash), revisit files as
    // the stream — the shape a continuous archive ingest actually runs
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val originals = docs.toSeq.map { case (id, source, text) =>
      (s"<urn:graft:resp:https://$source/doc/$id>",
        text.length.toLong, Warc.payloadDigest(text.getBytes(US_ASCII)))
    }.toDF("rid", "o_bytes", "o_digest")

    val revFiles = docs.filter(_._1 % 3 == 0).grouped(5).zipWithIndex.map {
      case (grp, gi) =>
        Warc.buildRevisitFile(s"rev$gi.warc.gz", grp.toSeq.map {
          case (id, source, text) =>
            val ref =
              if (id % 17 == 0) s"<urn:graft:missing:$id>"
              else s"<urn:graft:resp:https://$source/doc/$id>"
            (s"https://$source/redup/$id", ref, s"https://$source/doc/$id",
              Warc.payloadDigest(text.getBytes(US_ASCII)))
        })
    }.toSeq

    def resolve(files: org.apache.spark.sql.DataFrame) = files
      .as[Array[Byte]]
      .flatMap(b => Warc.revisitRecords(b).map(r => (r._1, r._2, r._4)))
      .toDF("uri", "ref", "r_digest")
      .join(originals, col("ref") === col("rid"), "left_outer")
      .select(col("uri"),
        col("rid").isNotNull.as("resolved"),
        coalesce(col("o_bytes"), lit(0L)).as("o_bytes"),
        (col("r_digest") === col("o_digest")).as("digest_ok"))

    val in = MemoryStream[Array[Byte]](spark)
    val q = resolve(in.toDF()).writeStream.format("memory")
      .queryName("revstream").outputMode("append").start()
    try {
      revFiles.grouped((revFiles.size + 1) / 2).foreach { chunk =>
        in.addData(chunk); q.processAllAvailable()
      }
      def keyed(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getString(0), r.getBoolean(1), r.getLong(2))).sortBy(_._1).toSeq
      val streamed = keyed(spark.table("revstream").collect())
      val batch = keyed(resolve(revFiles.toDF("value")).collect())
      assert(streamed == batch)
      assert(batch.exists(_._2) && batch.exists(!_._2), "both outcomes present")
      // every resolved row's payload digest re-validates against the original
      val dg = spark.table("revstream")
        .where(col("resolved")).select(col("digest_ok")).collect()
      assert(dg.nonEmpty && dg.forall(_.getBoolean(0)))
    } finally q.stop()
  }
}
