package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

/** Edge semantics of the as-of join: no-match → null payload, exact-ts
  * match included (<=), latest-wins, key isolation.
  */
class AsofJoinSpec extends SparkSpec {
  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join edges: before-first, exact tie, latest-wins, key isolation") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L), // before any right row → null
      (1L, ts("2024-01-02 00:00:00"), 11L), // exactly at right ts → matches it
      (1L, ts("2024-01-05 00:00:00"), 12L), // after both → latest wins
      (2L, ts("2024-01-04 00:00:00"), 20L)  // other key → isolated
    ).toDF("k", "t", "event")
    val right = Seq(
      (1L, ts("2024-01-02 00:00:00"), "a"),
      (1L, ts("2024-01-03 00:00:00"), "b"),
      (2L, ts("2024-01-01 00:00:00"), "z")
    ).toDF("k", "rt", "payload")

    val out = AsofJoin.asof(left, right, "k", "t", "rt", Seq("payload"))
      .collect().map(r => (r.getAs[Long]("event"), r.getAs[String]("payload"))).toMap
    assert(out == Map(10L -> null, 11L -> "a", 12L -> "b", 20L -> "z"))
  }

  test("forward asof: earliest at-or-after wins, after-last → null") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L), // before both → earliest ("a")
      (1L, ts("2024-01-02 00:00:00"), 11L), // exactly at right ts → matches it
      (1L, ts("2024-01-04 00:00:00"), 12L), // after last right row → null
      (2L, ts("2024-01-01 00:00:00"), 20L)  // other key → isolated
    ).toDF("k", "t", "event")
    val right = Seq(
      (1L, ts("2024-01-02 00:00:00"), "a"),
      (1L, ts("2024-01-03 00:00:00"), "b"),
      (2L, ts("2024-01-02 00:00:00"), "z")
    ).toDF("k", "rt", "payload")

    val out = AsofJoin.asofForward(left, right, "k", "t", "rt", Seq("payload"))
      .collect().map(r => (r.getAs[Long]("event"), r.getAs[String]("payload"))).toMap
    assert(out == Map(10L -> "a", 11L -> "a", 12L -> null, 20L -> "z"))
  }

  test("nearest asof: closest either side, backward wins ties, no-right → null") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L), // before both → forward ("a")
      (1L, ts("2024-01-02 06:00:00"), 11L), // 6h after a, 18h before b → "a"
      (1L, ts("2024-01-02 12:00:00"), 12L), // equidistant a/b → backward "a"
      (1L, ts("2024-01-02 18:00:00"), 13L), // 18h after a, 6h before b → "b"
      (1L, ts("2024-01-09 00:00:00"), 14L), // after both → backward "b"
      (3L, ts("2024-01-01 00:00:00"), 30L)  // key with no right rows → null
    ).toDF("k", "t", "event")
    val right = Seq(
      (1L, ts("2024-01-02 00:00:00"), "a"),
      (1L, ts("2024-01-03 00:00:00"), "b"),
      (2L, ts("2024-01-01 00:00:00"), "z")
    ).toDF("k", "rt", "payload")

    val out = AsofJoin.asofNearest(left, right, "k", "t", "rt", Seq("payload"))
      .collect().map(r => (r.getAs[Long]("event"), r.getAs[String]("payload"))).toMap
    assert(out == Map(10L -> "a", 11L -> "a", 12L -> "a", 13L -> "b",
      14L -> "b", 30L -> null))
  }

  test("nearest asof: a null payload on the nearest row stays null (no row mixing)") {
    import spark.implicits._
    // right row at the matched ts carries a NULL payload; the carry must NOT
    // skip back to the older row's value — ts and payload travel as one row
    val left = Seq((1L, ts("2024-01-02 00:00:00"), 10L)).toDF("k", "t", "event")
    val right = Seq(
      (1L, ts("2024-01-01 00:00:00"), "old"),
      (1L, ts("2024-01-02 00:00:00"), null.asInstanceOf[String])
    ).toDF("k", "rt", "payload")

    val out = AsofJoin.asofNearest(left, right, "k", "t", "rt", Seq("payload"))
      .collect().map(r => (r.getAs[Long]("event"), r.getAs[String]("payload"))).toMap
    assert(out == Map(10L -> null))
  }
}
