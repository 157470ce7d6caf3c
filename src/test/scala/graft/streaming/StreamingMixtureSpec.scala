package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream/batch parity for the live mixture monitor: the corpus fed in
  * micro-batches through [[CorpusStreams.mixtureMass]] must end in
  * exactly the batch mass table mix01 computes — (docs, chars, sm) per
  * (lang, source).
  */
class StreamingMixtureSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("streaming mixture mass converges to the batch mass table") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .as[(Long, String, String, Long)].collect().toSeq

    val in = MemoryStream[(Long, String, String, Long)](spark)
    val q = CorpusStreams.mixtureMass(
        in.toDS().toDF("doc_id", "lang", "source", "n_chars"))
      .writeStream.format("memory").queryName("mixmass")
      .outputMode("update").start()
    try {
      docs.grouped((docs.size + 2) / 3).foreach { chunk =>
        in.addData(chunk); q.processAllAvailable()
      }
      // final emission per group = the one with the highest doc count
      val streamed = spark.table("mixmass").collect()
        .map(r => ((r.getAs[String]("lang"), r.getAs[String]("source")),
          (r.getAs[Long]("docs"), r.getAs[Long]("chars"), r.getAs[Long]("sm"))))
        .groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).maxBy(_._1) }

      val batch = graft.core.Tables.documents(spark, sf)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"))
        .withColumn("sm", round(sqrt(col("chars")) * 1000000.0).cast("long"))
        .collect()
        .map(r => ((r.getAs[String]("lang"), r.getAs[String]("source")),
          (r.getAs[Long]("docs"), r.getAs[Long]("chars"), r.getAs[Long]("sm"))))
        .toMap

      assert(streamed.size == batch.size)
      streamed.foreach { case (k, got) =>
        assert(batch(k) == got, s"group $k: streamed $got batch ${batch(k)}")
      }
    } finally q.stop()
  }
}
