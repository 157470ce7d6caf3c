package graft.streaming

import graft.SparkSpec
import graft.ops.{Gif, Mp3}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream/batch parity for the media-ingest scan: a mixed GIF/MP3/PGM
  * blob corpus (generated from the sf0.001 documents text with the
  * mm05/mm06/mm07 recipes, so the REAL codecs do the decoding) fed in
  * micro-batches through [[CorpusStreams.mediaScan]] must end in exactly
  * the per-mime shape totals the batch groupBy computes. Also asserts the
  * bounded-state contract: the aggregate holds one row per mime, not per
  * blob.
  */
class StreamingMediaSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def blobCorpus(): Seq[(Long, Array[Byte], String)] = {
    import org.apache.spark.sql.functions.col
    val texts = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.nonEmpty)
    texts.map { case (id, text) =>
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val len = bytes.length
      (id % 3) match {
        case 0 => // GIF via the mm06 recipe
          val palette = Array.tabulate(12)(j => bytes((j * 5 + 1) % len))
          val idx = Array.tabulate(16 * 16)(i => ((bytes((i * 3 + 2) % len) & 0xff) % 4).toByte)
          (id, Gif.encode(16, 16, palette, idx), "image/gif")
        case 1 => // MP3 via the mm05 recipe (rate index from id)
          val nf = 2 + (len % 8)
          val plan = (0 until nf).map { i =>
            (1 + (((bytes((i * 11 + 7) % len) & 0xff) + i) % 14),
              ((bytes((i * 5 + 2) % len) & 0xff) % 2) == 1)
          }
          (id, Mp3.encodeV1L3((id % 3).toInt, plan, len % 100,
            (f, i) => bytes(((f + 2) * 31 + i * 7) % len)), "audio/mpeg")
        case _ => // PGM via the mm07 recipe
          val head = "P5\n16 16\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
          val px = Array.tabulate(16 * 16)(i => bytes((i * 7 + 3) % len))
          (id, head ++ px, "image/x-portable-graymap")
      }
    }.toSeq
  }

  test("streaming media scan converges to the batch per-mime totals; state is mime-bounded") {
    import spark.implicits._
    val corpus = blobCorpus()
    assert(corpus.map(_._3).distinct.size == 3, "corpus must mix all three mimes")

    val in = MemoryStream[(Long, Array[Byte], String)](spark)
    val q = CorpusStreams.mediaScan(in.toDS().toDF("blob_id", "content", "mime"))
      .writeStream.format("memory").queryName("mediascan")
      .outputMode("update").start()
    try {
      corpus.grouped((corpus.size + 2) / 3).foreach { chunk =>
        in.addData(chunk); q.processAllAvailable()
      }
      val streamed = spark.table("mediascan").collect()
        .map(r => (r.getAs[String]("mime"),
          (r.getAs[Long]("n_blobs"), r.getAs[Long]("sum_w"), r.getAs[Long]("sum_h"),
            r.getAs[Long]("sum_frames"), r.getAs[Long]("sum_bytes"))))
        .groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).maxBy(_._1) }

      val batch = CorpusStreams.mediaScan(
          corpus.toDF("blob_id", "content", "mime"))
        .collect()
        .map(r => (r.getAs[String]("mime"),
          (r.getAs[Long]("n_blobs"), r.getAs[Long]("sum_w"), r.getAs[Long]("sum_h"),
            r.getAs[Long]("sum_frames"), r.getAs[Long]("sum_bytes"))))
        .toMap

      assert(streamed.size == 3 && batch.size == 3)
      streamed.foreach { case (k, got) =>
        assert(batch(k) == got, s"mime $k: streamed $got batch ${batch(k)}")
      }
      // the decoded numbers are REAL codec output, not payload echoes:
      // PGM blobs are 16×16 → their per-mime sums are exact multiples
      val (pgmN, pgmW, pgmH, _, pgmBytes) = batch("image/x-portable-graymap")
      assert(pgmW == pgmN * 16 && pgmH == pgmN * 16 && pgmBytes == pgmN * (13 + 256))
      // MP3 n_frames are PCM samples: multiples of 1152 per blob
      val (_, _, _, mp3Samples, _) = batch("audio/mpeg")
      assert(mp3Samples % 1152 == 0 && mp3Samples > 0)
      // bounded state: the final progress reports at most 3 aggregate rows
      val lastProgress = q.lastProgress
      val stateRows = lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 3, s"aggregate state holds $stateRows rows (want <= 3)")
    } finally q.stop()
  }

  test("POISONED stream survives: refusals become typed rows, parity with batch") {
    import spark.implicits._
    // the mm09 recipe: ok PNG / arithmetic-JPEG refusal / truncated PNG /
    // text mislabeled as PNG — a quarter of each
    val texts = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.nonEmpty)
    val corpus: Seq[(Long, Array[Byte], String)] = texts.map { case (id, text) =>
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val len = bytes.length
      (id % 4) match {
        case 0 =>
          val px = Array.tabulate(16)(i => bytes((i * 3 + 1) % len))
          (id, graft.ops.Png.encode(4, 4, 0, px), "image/png")
        case 1 =>
          (id, Array(0xff, 0xd8, 0xff, 0xc9, 0, 4, 0, 0).map(_.toByte), "image/jpeg")
        case 2 =>
          val px = Array.tabulate(16)(i => bytes((i * 3 + 1) % len))
          (id, graft.ops.Png.encode(4, 4, 0, px).dropRight(10), "image/png")
        case _ => (id, bytes, "image/png")
      }
    }.toSeq

    val in = MemoryStream[(Long, Array[Byte], String)](spark)
    val q = CorpusStreams.mediaScanSafe(in.toDS().toDF("blob_id", "content", "mime"))
      .writeStream.format("memory").queryName("mediascansafe")
      .outputMode("update").start()
    try {
      corpus.grouped((corpus.size + 2) / 3).foreach { chunk =>
        in.addData(chunk); q.processAllAvailable()
      }
      val streamed = spark.table("mediascansafe").collect()
        .map(r => ((r.getAs[String]("mime"), r.getAs[String]("kind")),
          (r.getAs[Long]("n_blobs"), r.getAs[Long]("sum_w"), r.getAs[Long]("sum_bytes"))))
        .groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).maxBy(_._1) }
      val batch = CorpusStreams.mediaScanSafe(corpus.toDF("blob_id", "content", "mime"))
        .collect()
        .map(r => ((r.getAs[String]("mime"), r.getAs[String]("kind")),
          (r.getAs[Long]("n_blobs"), r.getAs[Long]("sum_w"), r.getAs[Long]("sum_bytes"))))
        .toMap
      assert(streamed.toMap == batch, s"streamed $streamed vs batch $batch")
      // all four kinds present, ok rows carry real decoded widths (4 each)
      val kinds = batch.keySet.map(_._2)
      assert(kinds == Set("ok", "unsupported", "truncated", "not_media"), kinds)
      val (okN, okW, _) = batch(("image/png", "ok"))
      assert(okW == okN * 4)
      // bounded state: (mime, kind) pairs, not blobs
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 4, s"aggregate state holds $stateRows rows (want <= 4)")
    } finally q.stop()
  }
}
