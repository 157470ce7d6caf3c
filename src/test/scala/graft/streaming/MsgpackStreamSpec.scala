package graft.streaming

import graft.SparkSpec
import graft.etl.{JInt, JObj, JStr}
import graft.ops.Msgpack
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream/batch parity for the MessagePack shard ingest: shards built
  * from the sf0.001 documents, a deterministic slice poisoned (0xc1
  * splice / truncation / wrong record shape), fed in micro-batches
  * through [[CorpusStreams.msgpackScan]] — final per-(outcome, lang)
  * totals must equal the batch run and the aggregate state must stay
  * vocabulary-bounded.
  */
class MsgpackStreamSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def shards(): Seq[(String, Array[Byte])] = {
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    docs.grouped(4).zipWithIndex.map { case (grp, gi) =>
      val clean = Msgpack.encodeAll(grp.toSeq.map { case (id, lang, text) =>
        JObj(Vector("id" -> JInt(BigInt(id)), "lang" -> JStr(lang),
          "text" -> JStr(text)))
      })
      val bytes = (gi % 7) match {
        case 0 => Array(0xc1.toByte) ++ clean
        case 1 => java.util.Arrays.copyOf(clean, clean.length - 3)
        case 2 => // decodes fine but wrong shape → per-record bad_schema
          Msgpack.encodeAll(grp.toSeq.map { case (id, _, _) =>
            JObj(Vector("id" -> JInt(BigInt(id))))
          })
        case _ => clean
      }
      (s"s$gi.msgpack", bytes)
    }.toSeq
  }

  test("streaming msgpack scan matches batch totals; refusals typed; state bounded") {
    import spark.implicits._
    val files = shards()
    assert(files.size >= 14)

    val in = MemoryStream[(String, Array[Byte])](spark)
    val q = CorpusStreams.msgpackScan(in.toDS().toDF("file", "content"))
      .writeStream.format("memory").queryName("mpscan")
      .outputMode("update").start()
    try {
      files.grouped((files.size + 2) / 3).foreach { chunk =>
        in.addData(chunk); q.processAllAvailable()
      }
      def keyed(rows: Array[org.apache.spark.sql.Row]) = rows
        .map(r => ((r.getAs[String]("outcome"), r.getAs[String]("lang")),
          (r.getAs[Long]("n"), r.getAs[Long]("sum_bytes"))))
        .groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).maxBy(_._1) }

      val streamed = keyed(spark.table("mpscan").collect())
      val batch = keyed(CorpusStreams.msgpackScan(files.toDF("file", "content")).collect())
      assert(streamed == batch, s"streamed $streamed\nbatch $batch")
      for (k <- Seq("bad_type", "truncated", "bad_schema"))
        assert(batch.contains((k, "")), s"missing refusal $k in $batch")
      val okBytes = batch.collect { case (("ok", _), (_, b)) => b }.sum
      assert(okBytes > 0L)
      // bound: refusal kinds (3 seen) + ok×languages (≤8 in testdata)
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 3 + 8, s"aggregate state holds $stateRows rows")
    } finally q.stop()
  }
}
