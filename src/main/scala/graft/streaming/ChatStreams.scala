package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the chat/instruction ingest (ChatQueries): turns
  * arrive one event at a time, conversations are assembled as keyed
  * state, and each micro-batch re-emits the conversation's CURRENT
  * structural verdict (first-turn role, alternation, planted empty
  * turns, length floor — the chat02 rules). State per conversation is
  * the turn list, bounded at 4 by the conversation contract (and capped
  * here defensively), so total state is conversations × 4 rows — the
  * shape a 100 TB SFT ingest holds per watermark window.
  */
object ChatStreams {

  case class Turn(source: String, conv: Long, docId: Long, role: String, text: String)
  case class Verdict(source: String, conv: Long, nTurns: Int,
      badStart: Int, badAlt: Int, hasEmpty: Int, tooShort: Int)

  /** pure verdict core, shared by the batch and streaming paths. */
  def verdict(source: String, conv: Long, turns: Seq[Turn]): Verdict = {
    val sorted = turns.sortBy(_.docId)
    val badStart = if (sorted.head.docId % 2 != 0) 1 else 0
    val badAlt = if (sorted.sliding(2).exists {
      case Seq(a, b) => a.role == b.role
      case _         => false
    }) 1 else 0
    val hasEmpty = if (sorted.exists(_.text.isEmpty)) 1 else 0
    val tooShort = if (sorted.size < 2) 1 else 0
    Verdict(source, conv, sorted.size, badStart, badAlt, hasEmpty, tooShort)
  }

  /** batch reference: one verdict per conversation. */
  def validateBatch(turns: Dataset[Turn]): Dataset[Verdict] = {
    import turns.sparkSession.implicits._
    turns.groupByKey(t => (t.source, t.conv))
      .mapGroups((key: (String, Long), ts: Iterator[Turn]) =>
        verdict(key._1, key._2, ts.toSeq))
  }

  /** streaming: accumulate turns as keyed state, re-emit the current
    * verdict every batch (update mode — the last emission per key is the
    * final verdict once the stream drains).
    */
  def validateStream(turns: Dataset[Turn]): Dataset[Verdict] = {
    import turns.sparkSession.implicits._
    turns.groupByKey(t => (t.source, t.conv))
      .flatMapGroupsWithState[List[Turn], Verdict](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case ((src, conv), incoming, state: GroupState[List[Turn]]) =>
          val turnsSoFar = (state.getOption.getOrElse(Nil) ++ incoming)
            .sortBy(_.docId).distinct.take(64) // defensive cap; contract is ≤4
          state.update(turnsSoFar)
          Iterator.single(verdict(src, conv, turnsSoFar))
      }
  }
}
