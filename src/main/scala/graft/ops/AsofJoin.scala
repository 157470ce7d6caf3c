package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row with
  * `right.ts <= left.ts` within the same key — the canonical time-series
  * enrichment operator (Spark has no built-in; DuckDB's ASOF JOIN is the
  * oracle).
  *
  * Implementation is the UNION + WINDOW formulation, not a range join:
  * tag both sides, union, sort per key by (ts, side) with right-before-left
  * on ties, and carry the last non-null right payload forward
  * (`last_value(ignoreNulls)` over an unbounded-preceding frame). One
  * shuffle on the join key, linear scan per partition — at 100 TB this
  * beats a range-condition join (which Spark would execute as a broadcast
  * nested loop or explode into an inequality join) by orders of magnitude,
  * and skewed keys split fine under AQE.
  *
  * Right keys must be unique per (key, ts) — pre-aggregate the right side
  * if not (ties there would make ANY as-of nondeterministic).
  */
object AsofJoin {

  /** @param left      (key, ts, ...) rows to enrich
    * @param right     (key, ts, payload...) reference rows, unique (key, ts)
    * @param key       join key column name (same on both sides)
    * @param leftTs    left timestamp column
    * @param rightTs   right timestamp column
    * @param payload   right columns to carry (renamed as-is onto left rows)
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame =
    asofImpl(left, right, key, leftTs, rightTs, payload, forward = false)

  /** Forward as-of: earliest right row with `right.ts >= left.ts` per key —
    * next-event attribution. Same union+window single-shuffle shape, scan
    * direction reversed.
    */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame =
    asofImpl(left, right, key, leftTs, rightTs, payload, forward = true)

  /** Nearest as-of (pandas merge_asof direction='nearest'): the right row
    * minimizing |right.ts − left.ts| per key; BACKWARD WINS TIES. Still one
    * shuffle — both direction scans are windows over the same key
    * partitioning (Spark re-sorts within partitions for the second
    * direction, no second exchange).
    */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame = {
    val (unioned, lCols) = unionSides(left, right, key, leftTs, rightTs, payload)
    // BOTH directions ride ONE ascending sort: backward is last-non-null over
    // [unbounded preceding, current], forward is first-non-null over
    // [current, unbounded following] — same partition+order spec, so Spark
    // plans a single Window node and a single partition-local sort. At equal
    // ts the right row sorts before the left row (side asc), so the forward
    // frame misses it — harmless: the backward carry has it at gap 0, and
    // backward wins every tie by definition.
    val base = Window.partitionBy(col(key))
      .orderBy(col("_ts").asc, col("_side").asc)
    val wPast = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFut = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // each direction carries the nearest right row as ONE struct — the
    // carried ts and payload always come from the SAME row (a right row
    // whose payload is null stays null, never borrows an older row's
    // value), and payload width never adds window aggregates. The struct's
    // timestamp slot uses a reserved name so a payload column literally
    // named "ts" cannot create duplicate struct fields and miswire the
    // _b/_f field resolution.
    require(!payload.contains("_carried_ts"),
      "payload column name _carried_ts is reserved by asofNearest")
    val rightRow = when(col("_side") === 0,
      struct(col("_ts").as("_carried_ts") +:
        payload.map(p => col(s"_p_$p").as(p)): _*))
    val carried = unioned.select(col("*"),
      last(rightRow, ignoreNulls = true).over(wPast).as("_b"),
      first(rightRow, ignoreNulls = true).over(wFut).as("_f"))
    val us = (c: Column) => unix_micros(c.cast("timestamp"))
    val useBackward = col("_b").isNotNull && (col("_f").isNull ||
      us(col("_ts")) - us(col("_b._carried_ts")) <=
        us(col("_f._carried_ts")) - us(col("_ts")))
    carried.filter(col("_side") === 1)
      .select((lCols.map(col) ++ payload.map(p =>
        when(useBackward, col(s"_b.$p")).otherwise(col(s"_f.$p")).as(p))): _*)
  }

  private def asofImpl(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      forward: Boolean): DataFrame = {
    val (unioned, lCols) = unionSides(left, right, key, leftTs, rightTs, payload)

    // right rows sort before left rows at equal ts → inclusive semantics;
    // forward mode scans in DESCENDING ts so "last non-null before me" means
    // "earliest right at-or-after me"
    val ord =
      if (forward) Seq(col("_ts").desc, col("_side").asc)
      else Seq(col("_ts").asc, col("_side").asc)
    val w = Window.partitionBy(col(key)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { (d, p) =>
      d.withColumn(s"_c_$p", last(col(s"_p_$p"), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1)
      .select((lCols.map(col) ++ payload.map(p => col(s"_c_$p").as(p))): _*)
  }

  /** Tag-and-union both sides with aligned schemas: left rows get null
    * payload slots, right rows get null left columns. Returns the unioned
    * frame plus the original left column list.
    */
  private def unionSides(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): (DataFrame, Seq[String]) = {

    val lCols = left.columns.toSeq
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
    val r0 = right.select(
      (col(key) +: col(rightTs).as("_ts") +: lit(0).as("_side") +:
        payload.map(p => col(p).as(s"_p_$p"))): _*)
    // align schemas: left gets null payload slots, right gets null left cols
    val rAligned = lCols.filterNot(c => c == key).foldLeft(r0) {
      (d, c) => d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val lAligned = payload.foldLeft(l) {
      (d, p) => d.withColumn(s"_p_$p", lit(null).cast(right.schema(p).dataType))
    }
    val unioned = lAligned.select((col(key) +: col("_ts") +: col("_side") +:
        (lCols.filterNot(_ == key).map(col) ++ payload.map(p => col(s"_p_$p")))): _*)
      .unionByName(rAligned.select((col(key) +: col("_ts") +: col("_side") +:
        (lCols.filterNot(_ == key).map(col) ++ payload.map(p => col(s"_p_$p")))): _*))
    (unioned, lCols)
  }
}
