package graft.streaming

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream/batch parity for dedup14's chunk-frequency table: the corpus
  * fed in micro-batches through [[CorpusStreams.chunkFrequency]] must end
  * in exactly the batch `hot` table state (df = countDistinct docs,
  * keeper = min doc_id per chunk) — the production ingest contract for
  * the global boilerplate scrub.
  */
class StreamingBoilerplateSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("streaming chunk frequency converges to the batch hot table") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect().toSeq

    val in = MemoryStream[(Long, String, String)](spark)
    val q = CorpusStreams.chunkFrequency(
        in.toDS().toDF("doc_id", "lang", "text"), w = 8)
      .writeStream.format("memory").queryName("chunkfreq")
      .outputMode("update").start()
    try {
      // three micro-batches: state must merge across them, and the pair
      // dedup must suppress re-sent chunks (batch 2 re-sends batch 1's
      // first 50 docs — at-least-once ingest)
      val chunks3 = docs.grouped((docs.size + 2) / 3).toSeq
      in.addData(chunks3(0)); q.processAllAvailable()
      in.addData(chunks3(1) ++ chunks3(0).take(50)); q.processAllAvailable()
      in.addData(chunks3(2)); q.processAllAvailable()

      // final state per chunk = the emission with the highest df (df only
      // grows; keeper changes only alongside a df increment)
      val streamed = spark.table("chunkfreq").collect()
        .map(r => (r.getAs[Long]("ch"), r.getAs[Long]("df"), r.getAs[Long]("keeper")))
        .groupBy(_._1).map { case (ch, rs) =>
          val m = rs.maxBy(r => (r._2, -r._3)); ch -> ((m._2, m._3))
        }

      val batch = Dedup.boilerplateChunks(
          graft.core.Tables.documents(spark, sf), w = 8)
        .groupBy(col("ch"))
        .agg(countDistinct(col("doc_id")).as("df"), min(col("doc_id")).as("keeper"))
        .collect()
        .map(r => r.getAs[Long]("ch") -> ((r.getAs[Long]("df"), r.getAs[Long]("keeper"))))
        .toMap

      assert(streamed.size == batch.size,
        s"streamed ${streamed.size} chunks, batch ${batch.size}")
      streamed.foreach { case (ch, got) =>
        assert(batch(ch) == got, s"chunk $ch: streamed $got batch ${batch(ch)}")
      }
      // and the table is non-trivial: the corpus DOES contain boilerplate
      assert(batch.values.count(_._1 >= 2) > 0, "no df>=2 chunks at sf0.001")
    } finally q.stop()
  }
}
