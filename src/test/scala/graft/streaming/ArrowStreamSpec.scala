package graft.streaming

import graft.SparkSpec
import graft.ops.ArrowIpc
import graft.ops.ArrowIpc._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream/batch parity for the Arrow IPC shard ingest: streams built
  * from the sf0.001 documents, a deterministic slice poisoned (leading
  * continuation-marker flip / mid-body truncation / wrong schema), fed
  * in micro-batches through [[CorpusStreams.arrowScan]] — final
  * per-(outcome, lang) totals must equal the batch run and the
  * aggregate state must stay vocabulary-bounded.
  */
class ArrowStreamSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private val fields = Vector(
    AField("id", "i64", nullable = false),
    AField("lang", "utf8", nullable = false),
    AField("text", "utf8", nullable = false))

  private def shards(): Seq[(String, Array[Byte])] = {
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    docs.grouped(4).zipWithIndex.map { case (grp, gi) =>
      val clean = ArrowIpc.write(fields, Seq(Vector[ACol](
        ALongCol("id", null, grp.map(_._1).toArray),
        AStrCol("lang", null, grp.map(_._2).toArray),
        AStrCol("text", null, grp.map(_._3).toArray))))
      val bytes = (gi % 7) match {
        case 0 => val b = clean.clone(); b(0) = (b(0) ^ 0x5a).toByte; b
        case 1 => java.util.Arrays.copyOf(clean, clean.length - 24)
        case 2 => // wrong leading type: utf8 first → bad_schema
          ArrowIpc.write(
            Vector(AField("id", "utf8", nullable = false)),
            Seq(Vector[ACol](AStrCol("id", null, grp.map(_._3).toArray))))
        case _ => clean
      }
      (s"s$gi.arrows", bytes)
    }.toSeq
  }

  test("streaming Arrow scan matches batch totals; refusals typed; state bounded") {
    import spark.implicits._
    val files = shards()
    assert(files.size >= 14)

    val in = MemoryStream[(String, Array[Byte])](spark)
    val q = CorpusStreams.arrowScan(in.toDS().toDF("file", "content"))
      .writeStream.format("memory").queryName("arrowscan")
      .outputMode("update").start()
    try {
      files.grouped((files.size + 2) / 3).foreach { chunk =>
        in.addData(chunk); q.processAllAvailable()
      }
      def keyed(rows: Array[org.apache.spark.sql.Row]) = rows
        .map(r => ((r.getAs[String]("outcome"), r.getAs[String]("lang")),
          (r.getAs[Long]("n"), r.getAs[Long]("sum_bytes"))))
        .groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).maxBy(_._1) }

      val streamed = keyed(spark.table("arrowscan").collect())
      val batch = keyed(CorpusStreams.arrowScan(files.toDF("file", "content")).collect())
      assert(streamed == batch, s"streamed $streamed\nbatch $batch")
      for (k <- Seq("bad_stream", "truncated", "bad_schema"))
        assert(batch.contains((k, "")), s"missing refusal $k in $batch")
      val okBytes = batch.collect { case (("ok", _), (_, b)) => b }.sum
      assert(okBytes > 0L)
      // bound: refusal kinds (3 seen) + ok×languages (≤8 in testdata)
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 3 + 8, s"aggregate state holds $stateRows rows")
    } finally q.stop()
  }
}
