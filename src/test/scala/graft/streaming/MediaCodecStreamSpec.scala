package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream/batch parity for the round-13 media codec twins: FLAC clips
  * ([[CorpusStreams.flacScan]]) and animated WebP
  * ([[CorpusStreams.webpAnimScan]]). Clips/animations built from the
  * sf0.001 documents, a deterministic slice poisoned per the codec's
  * typed-refusal vocabulary, fed in micro-batches — final aggregates
  * must equal the batch run and the state must stay vocabulary-bounded.
  */
class MediaCodecStreamSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def docs(): Array[(Long, String)] =
    graft.core.Tables.documents(spark, sf)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))

  private def keyed(rows: Array[org.apache.spark.sql.Row], k1: String, k2: String) = rows
    .map(r => ((r.getAs[String](k1), r.getAs[Any](k2).toString),
      r.toSeq.drop(2).map(v => String.valueOf(v).toLong)))
    // update mode re-emits a key per micro-batch: the final value is the
    // one with the largest count (monotone aggregates)
    .groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).maxBy(_.head) }

  test("streaming FLAC scan matches batch; refusals typed; state bounded") {
    import spark.implicits._
    val rates = Array(8000, 16000, 44100)
    val files = docs().map { case (id, text) =>
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val n = 80 + (id % 8).toInt * 16
      val pcm = Array.tabulate(n)(i =>
        ((bytes((i * 3 + 1) % bytes.length) & 0xff) * 2 - 219) * 20)
      val clean = graft.ops.FlacAudio.encode(rates((id % 3).toInt), 16,
        Array(pcm), blockSize = 64)
      val b = (id % 9) match {
        case 0 => // flip the trailing CRC-16 byte → crc_mismatch
          val c = clean.clone(); c(c.length - 1) = (c(c.length - 1) ^ 1).toByte; c
        case 1 => java.util.Arrays.copyOf(clean, clean.length - 7) // truncated
        case 2 => // flip an MD5 byte in STREAMINFO → bad_md5
          val c = clean.clone(); c(26) = (c(26) ^ 0x11).toByte; c
        case _ => clean
      }
      (s"c$id.flac", b)
    }.toSeq
    assert(files.size >= 18)

    val in = MemoryStream[(String, Array[Byte])](spark)
    val q = CorpusStreams.flacScan(in.toDS().toDF("file", "content"))
      .writeStream.format("memory").queryName("flacscan")
      .outputMode("update").start()
    try {
      files.grouped((files.size + 2) / 3).foreach { chunk =>
        in.addData(chunk); q.processAllAvailable()
      }
      val streamed = keyed(spark.table("flacscan").collect(), "outcome", "rate")
      val batch = keyed(
        CorpusStreams.flacScan(files.toDF("file", "content")).collect(), "outcome", "rate")
      assert(streamed == batch, s"streamed $streamed\nbatch $batch")
      for (k <- Seq("crc_mismatch", "truncated", "bad_md5"))
        assert(batch.keys.exists(_._1 == k), s"missing refusal $k in ${batch.keys}")
      assert(batch.keys.count(_._1 == "ok") == 3) // one per rate
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 3 + 3, s"aggregate state holds $stateRows rows")
    } finally q.stop()
  }

  test("streaming animated-WebP scan matches batch; refusals typed; state bounded") {
    import spark.implicits._
    val files = docs().map { case (id, text) =>
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      def at(j: Int) = bytes(j % bytes.length) & 0xff
      def raster(n: Int, s: Int) = Array.tabulate(n * n * 4)(i =>
        if (i % 4 == 3) 0xff.toByte else at(i * 7 + s).toByte)
      val clean = graft.ops.WebpAnim.encodeAnim(8, 8, (1, 2, 3, 255),
        (id % 3).toInt, Seq(
          graft.ops.WebpAnim.EncFrame(0, 0, 30, disposeBg = false, 8, 8, raster(8, 1)),
          graft.ops.WebpAnim.EncFrame(2, 2, 40, disposeBg = id % 2 == 0, 4, 4, raster(4, 5))))
      val b = (id % 8) match {
        case 0 => java.util.Arrays.copyOf(clean, clean.length - 3) // truncated
        case 1 => val c = clean.clone(); c(1) = 'X'.toByte; c // not_media
        case _ => clean
      }
      (s"a$id.webp", b)
    }.toSeq

    val in = MemoryStream[(String, Array[Byte])](spark)
    val q = CorpusStreams.webpAnimScan(in.toDS().toDF("file", "content"))
      .writeStream.format("memory").queryName("animscan")
      .outputMode("update").start()
    try {
      files.grouped((files.size + 2) / 3).foreach { chunk =>
        in.addData(chunk); q.processAllAvailable()
      }
      val streamed = keyed(spark.table("animscan").collect(), "outcome", "frames")
      val batch = keyed(
        CorpusStreams.webpAnimScan(files.toDF("file", "content")).collect(), "outcome", "frames")
      assert(streamed == batch, s"streamed $streamed\nbatch $batch")
      for (k <- Seq("truncated", "not_media"))
        assert(batch.keys.exists(_._1 == k), s"missing refusal $k in ${batch.keys}")
      assert(batch.keys.exists(_._1 == "ok"))
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 2 + 2, s"aggregate state holds $stateRows rows")
    } finally q.stop()
  }

  test("streaming ISOBMFF scan matches batch; refusals typed; state bounded (round 15)") {
    import spark.implicits._
    val files = docs().map { case (id, _) =>
      val clean =
        if (id % 2 == 0)
          graft.ops.Isobmff.writeMp4Sampled("isom", Seq("isom"), 1000L,
            (id % 50 + 1) * 400,
            Seq((1L, "vide", "avc1", 320 + (id % 4).toInt * 16, 180,
              (id % 50 + 1) * 400, 12800L, 400L,
              Seq.tabulate((id % 12).toInt + 1)(k => 600L + (id + k) % 37))))
        else graft.ops.Isobmff.writeHeif(
          if (id % 3 == 0) "avif" else "heic", Seq("mif1"),
          if (id % 3 == 0) "av01" else "hvc1",
          64 + (id % 9).toInt * 8, 64 + (id % 7).toInt * 8)
      val b = (id % 10) match {
        case 0 => val c = clean.clone(); c(5) = 'X'.toByte; c // bad_magic
        case 1 => java.util.Arrays.copyOf(clean, clean.length / 3) // truncated
        case 2 => // tkhd/meta version from the future → bad_frame
          val c = clean.clone()
          val at = math.max(c.indexOfSlice("tkhd".getBytes),
            c.indexOfSlice("ispe".getBytes))
          c(at + 4) = 9.toByte; c
        case _ => clean
      }
      (s"m$id.mp4", b)
    }.toSeq

    val in = MemoryStream[(String, Array[Byte])](spark)
    val q = CorpusStreams.isobmffScan(in.toDS().toDF("file", "content"))
      .writeStream.format("memory").queryName("isoscan")
      .outputMode("update").start()
    try {
      files.grouped((files.size + 2) / 3).foreach { chunk =>
        in.addData(chunk); q.processAllAvailable()
      }
      val streamed = keyed(spark.table("isoscan").collect(), "outcome", "brand")
      val batch = keyed(
        CorpusStreams.isobmffScan(files.toDF("file", "content")).collect(),
        "outcome", "brand")
      assert(streamed == batch, s"streamed $streamed\nbatch $batch")
      for (k <- Seq("bad_magic", "truncated", "bad_frame"))
        assert(batch.keys.exists(_._1 == k), s"missing refusal $k in ${batch.keys}")
      for (b <- Seq("isom", "avif", "heic"))
        assert(batch.keys.exists(k => k._1 == "ok" && k._2 == b), s"missing brand $b")
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 8, s"aggregate state holds $stateRows rows")
    } finally q.stop()
  }
}
