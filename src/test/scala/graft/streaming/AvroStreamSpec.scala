package graft.streaming

import graft.SparkSpec
import graft.ops.Avro
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream/batch parity for the Avro shard ingest: record shards built
  * from the sf0.001 documents, a deterministic slice poisoned (magic
  * flip / truncation / sync corruption / alien schema), fed in
  * micro-batches through [[CorpusStreams.avroScan]] — final
  * per-(outcome, lang) totals must equal the batch run, refusals must
  * be typed rows, and the aggregate state must stay
  * vocabulary-bounded.
  */
class AvroStreamSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private val schema = Avro.Schema("doc",
    Vector("id" -> "long", "lang" -> "string", "text" -> "string"))

  private def shards(): Seq[(String, Array[Byte])] = {
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    docs.grouped(4).zipWithIndex.map { case (grp, gi) =>
      val recs = grp.toSeq.map { case (id, lang, text) =>
        Avro.Record(Vector(id, lang, text))
      }
      val clean = Avro.write(schema, recs,
        if (gi % 2 == 0) "deflate" else "null", blockSize = 2)
      val bytes = (gi % 7) match {
        case 0 => val b = clean.clone(); b(0) = 'X'.toByte; b // bad_magic
        case 1 => java.util.Arrays.copyOf(clean, clean.length - 9) // truncated
        case 2 => // sync corruption
          val b = clean.clone()
          b(b.length - 1) = (b(b.length - 1) ^ 0x11).toByte
          b
        case 3 => // structurally valid shard with an alien schema
          Avro.write(Avro.Schema("k", Vector("v" -> "long")),
            grp.toSeq.map(d => Avro.Record(Vector(d._1))), "null")
        case _ => clean
      }
      (s"s$gi.avro", bytes)
    }.toSeq
  }

  test("streaming Avro scan matches batch totals; refusals typed; state bounded") {
    import spark.implicits._
    val files = shards()
    assert(files.size >= 14, "need enough shards to poison every slice kind")

    val in = MemoryStream[(String, Array[Byte])](spark)
    val q = CorpusStreams.avroScan(in.toDS().toDF("file", "content"))
      .writeStream.format("memory").queryName("avroscan")
      .outputMode("update").start()
    try {
      files.grouped((files.size + 2) / 3).foreach { chunk =>
        in.addData(chunk); q.processAllAvailable()
      }
      def keyed(rows: Array[org.apache.spark.sql.Row]) = rows
        .map(r => ((r.getAs[String]("outcome"), r.getAs[String]("lang")),
          (r.getAs[Long]("n"), r.getAs[Long]("sum_bytes"))))
        .groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).maxBy(_._1) }

      val streamed = keyed(spark.table("avroscan").collect())
      val batch = keyed(CorpusStreams.avroScan(files.toDF("file", "content")).collect())

      assert(streamed == batch, s"streamed $streamed\nbatch $batch")
      // every poison kind surfaces as its typed key
      for (k <- Seq("bad_magic", "truncated", "bad_sync", "bad_schema"))
        assert(batch.contains((k, "")), s"missing refusal $k in $batch")
      // healthy shards decode per-lang with real byte totals
      val okLangs = batch.keys.collect { case ("ok", l) => l }
      assert(okLangs.nonEmpty && okLangs.forall(_.nonEmpty))
      assert(batch.collect { case (("ok", _), (_, b)) => b }.sum > 0L)
      // bounded state: (outcome, lang) vocabulary, not per-record
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 10, s"aggregate state holds $stateRows rows (want <= 10)")
    } finally q.stop()
  }
}
