package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The one-pass TypedImperativeAggregate profiler must agree with the
  * long-format profiler on real data, for every profiled column, and
  * profile a wide table in a single aggregation.
  */
class ProfileAggSpec extends SparkSpec {

  test("field_profile agrees with Profile.profileStats on orders columns") {
    val sf = "/root/testdata/sf0.001"
    val cols = Seq("o_orderstatus", "o_orderpriority", "o_orderkey", "o_custkey")
    val o = spark.read.parquet(s"$sf/orders.parquet").select(
      col("o_orderkey").as("row_idx") +:
        cols.map(c => col(c).cast("string").as(c)): _*)

    // ONE aggregation profiles all columns at once
    val aggd = o.agg(
      FieldProfileAgg(col(cols.head), col("row_idx")).as(cols.head),
      cols.tail.map(c => FieldProfileAgg(col(c), col("row_idx")).as(c)): _*)
      .collect().head
    val mine = cols.map { c =>
      val r = aggd.getStruct(cols.indexOf(c))
      (c, r.getString(0), r.getBoolean(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))
    }.toSet

    val ref = Profile.profileStats(o, cols, NormalizeCol.inferType)
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
        r.getLong(3), r.getDouble(4), r.getBoolean(5))).toSet
    assert(mine == ref, s"agg=$mine\nref=$ref")
  }

  test("buffer survives serialization round-trip and merges") {
    val a = new ProfileBuffer
    a.add("x", 5); a.add("x", 3); a.add("y", 9); a.nulls = 2
    val b = ProfileBuffer.decode(a.encode())
    assert(b.values("x") == ((2L, 3L)) && b.values("y") == ((1L, 9L)) && b.nulls == 2)
    val c = new ProfileBuffer
    c.add("x", 1); c.add("z", 4)
    b.mergeWith(c)
    assert(b.values("x") == ((3L, 1L)) && b.values("z") == ((1L, 4L)))
  }

  test("raw-string tagging matches the column battery on JSON-parseable strings") {
    import spark.implicits._
    // '1e5' JSON-parses to a float but is a STRING to the raw battery; '1.50'
    // is a float either way but must vote via the raw text, not a re-rendered
    // '1.5'. Both profilers must agree (ADVICE round 1).
    val df = Seq((1L, "1e5"), (2L, "1.50"), (3L, "1e5"), (4L, "2024-01-05"))
      .toDF("row_idx", "c")
    val mine = df.agg(FieldProfileAgg(col("c"), col("row_idx")))
      .collect().head.getStruct(0)
    val ref = Profile.profileStats(df, Seq("c"), NormalizeCol.inferType)
      .collect().head
    assert(mine.getString(0) == ref.getString(1), s"$mine vs $ref")
    assert(mine.getString(0) == "string") // 2×'1e5' outvotes '1.50'/date
    assert(ProfileBuffer.rawTag("1e5") == "string" &&
      ProfileBuffer.rawTag("1.50") == "float" &&
      ProfileBuffer.rawTag(" true ") == "boolean" &&
      ProfileBuffer.rawTag("11/5/2024") == "date")
  }

  test("nulls and JSON-null cells count as NA; empty column votes string") {
    import spark.implicits._
    val df = Seq((1L, null: String), (2L, "null"), (3L, null: String))
      .toDF("row_idx", "c")
    val r = df.agg(FieldProfileAgg(col("c"), col("row_idx"))).collect().head.getStruct(0)
    assert(r.getString(0) == "string" && r.getBoolean(1) && r.getLong(2) == 0L)
  }
}
