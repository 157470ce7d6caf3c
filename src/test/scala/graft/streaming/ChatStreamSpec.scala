package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream/batch parity for the chat-turn validation ingest: the sf0.001
  * documents become turns (the ChatQueries conversation contract: conv =
  * doc_id DIV 4, role by parity, the chat02 planted empty-turn slice),
  * fed out of order across micro-batches through
  * [[ChatStreams.validateStream]] — the LAST emitted verdict per
  * conversation must equal the batch verdict for every conversation, and
  * keyed state must stay bounded at the turn count.
  */
class ChatStreamSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def turns(): Seq[ChatStreams.Turn] = {
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("doc_id"), col("text"))
      .collect()
    rows.map { r =>
      val (src, id, text) = (r.getString(0), r.getLong(1), r.getString(2))
      val planted =
        if (graft.ops.Hash60Kernel.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(s"$src:$id")) % 19 == 0) ""
        else text
      ChatStreams.Turn(src, id / 4, id,
        if (id % 2 == 0) "user" else "assistant", planted)
    }.toSeq
  }

  test("streaming verdicts converge to the batch verdicts; state stays turn-bounded") {
    import spark.implicits._
    val all = turns()
    // deliver out of order: odd doc_ids first, then evens (so alternation
    // and first-turn flags flip as conversations complete)
    val ordered = all.filter(_.docId % 2 == 1) ++ all.filter(_.docId % 2 == 0)

    val in = MemoryStream[ChatStreams.Turn](spark)
    val q = ChatStreams.validateStream(in.toDS())
      .writeStream.format("memory").queryName("chatverdicts")
      .outputMode("update").start()
    try {
      ordered.grouped((ordered.size + 3) / 4).foreach { chunk =>
        in.addData(chunk); q.processAllAvailable()
      }
      // last emission per conversation wins (update mode)
      val streamed = spark.table("chatverdicts")
        .withColumn("seq", monotonically_increasing_id())
        .orderBy(col("seq"))
        .collect()
        .map(r => ((r.getString(0), r.getLong(1)),
          (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6))))
        .toMap // later entries overwrite earlier ones
      val batch = ChatStreams.validateBatch(all.toDS()).collect()
        .map(v => ((v.source, v.conv),
          (v.nTurns, v.badStart, v.badAlt, v.hasEmpty, v.tooShort))).toMap
      assert(streamed.size == batch.size,
        s"${streamed.size} streamed vs ${batch.size} batch conversations")
      val diffs = batch.collect {
        case (k, v) if streamed.get(k) != Some(v) => (k, v, streamed.get(k))
      }
      assert(diffs.isEmpty, s"first diffs: ${diffs.take(3).toList}")
      // the batch side agrees with the chat02 oracle-checked aggregate
      val agg = graft.SparkEntry.queries("chat02_turn_validate")(spark, sf)
        .agg(sum("n_convs"), sum("n_bad_start"), sum("n_bad_alt"),
          sum("n_with_empty"), sum("n_short")).collect().head
      assert(agg.getLong(0) == batch.size.toLong)
      assert(agg.getLong(1) == batch.values.map(_._2.toLong).sum)
      assert(agg.getLong(2) == batch.values.map(_._3.toLong).sum)
      assert(agg.getLong(3) == batch.values.map(_._4.toLong).sum)
      assert(agg.getLong(4) == batch.values.map(_._5.toLong).sum)
      // state: one entry per conversation, each ≤ 4 turns by contract
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == batch.size.toLong, s"state holds $stateRows rows")
    } finally q.stop()
  }
}
