package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV distinct-count as a first-class AGGREGATE FUNCTION — the typed
  * `Aggregator` form of sketch01's declarative bottom-k plan, usable
  * anywhere an aggregate goes: `df.agg(KmvAggregator.kmvDistinct(col))`,
  * per-group in a `groupBy`, or in SQL after `registerSql` as
  * `kmv_distinct(expr)`.
  *
  * Buffer = (used, slots): a fixed-capacity scratch array mutated in place,
  * compacted (distinct → sort → keep k smallest) only when full, so the
  * per-row path is an O(1) append — no per-row sorting. Merges concat +
  * compact. State is ≤ capacity longs per partition regardless of input
  * cardinality: the mergeable-sketch contract that makes distinct counting
  * an O(k)-memory single pass at 100 TB.
  *
  * Same md5-prefix hash and same estimator as sketch01/streamingDistinct,
  * so all three forms agree exactly (and the DuckDB oracle reproduces the
  * estimate bit-for-bit — see sketch04).
  */
object KmvAggregator {

  final val DefaultK = 256

  /** (#slots in use, slot array). Capacity 8k amortizes compaction. */
  type Buf = (Int, Array[Long])

  class KmvDistinct(k: Int) extends Aggregator[String, Buf, Long] {
    private val capacity = 8 * k

    private def compact(used: Int, slots: Array[Long]): Buf = {
      val kept = java.util.Arrays.stream(slots, 0, used)
        .distinct.sorted.limit(k).toArray
      val fresh = new Array[Long](capacity)
      System.arraycopy(kept, 0, fresh, 0, kept.length)
      (kept.length, fresh)
    }

    override def zero: Buf = (0, new Array[Long](capacity))

    override def reduce(b: Buf, a: String): Buf = {
      val (used, slots) = if (b._1 == capacity) compact(b._1, b._2) else b
      slots(used) = Sketches.hash60jvm(a)
      (used + 1, slots)
    }

    override def merge(b1: Buf, b2: Buf): Buf = {
      val joined = new Array[Long](b1._1 + b2._1)
      System.arraycopy(b1._2, 0, joined, 0, b1._1)
      System.arraycopy(b2._2, 0, joined, b1._1, b2._1)
      compact(joined.length, joined)
    }

    override def finish(b: Buf): Long = {
      val (used, slots) = compact(b._1, b._2)
      if (used < k) used.toLong
      else math.round((k - 1).toDouble * Sketches.HashSpace / slots(used - 1).toDouble)
    }

    override def bufferEncoder: Encoder[Buf] = Encoders.tuple(
      Encoders.scalaInt, ExpressionEncoderHelper.longArray)
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Column form for DataFrame aggregation. */
  def kmvDistinct(c: Column, k: Int = DefaultK): Column =
    udaf(new KmvDistinct(k)).apply(c)

  /** SQL registration: `SELECT kmv_distinct(CAST(x AS STRING)) FROM t`. */
  def registerSql(spark: SparkSession, name: String = "kmv_distinct",
      k: Int = DefaultK): Unit =
    spark.udf.register(name, udaf(new KmvDistinct(k)))
}

private object ExpressionEncoderHelper {
  val longArray: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
