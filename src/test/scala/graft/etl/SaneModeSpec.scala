package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Sane-mode normalization: same capability, no reference quirks. */
class SaneModeSpec extends SparkSpec {

  test("sane scalar chain fixes the documented quirks") {
    import Normalize.{normalizeStringSane => sane}
    assert(sane("1") == JInt(1)) // not boolean True
    assert(sane("123") == JInt(123)) // not a phone digit-string
    assert(sane("-5") == JInt(-5)) // negatives numeric
    assert(sane("-12.5") == JFloat(-12.5))
    assert(sane("2025-11-01") == JStr("2025-11-01T00:00:00")) // date, not "20251101"
    assert(sane("$1,234") == JInt(1234))
    assert(sane("45%") == JFloat(0.45))
    assert(sane("NA") == JNull)
    assert(sane("yes") == JBool(true))
    assert(sane("+1 (555) 123") == JStr("1555123")) // real phone still phone
    assert(sane("A@B.com") == JStr("a@b.com"))
  }

  test("pipeline in sane mode keeps ints typed and nulls null") {
    import spark.implicits._
    val docs = Seq((0L, """[{"id": 1, "name": "Alice", "score": 95}, {"id": 2, "name": "Bob", "score": 88}]"""))
      .toDF("doc_id", "text")
    val res = DocumentEtl.run(spark, docs, mode = DocumentEtl.Sane)
    val first = res.table.orderBy(col("row_idx")).collect().head
    assert(first.getAs[String]("id") == "1") // int cell, not "true"
    assert(first.getAs[String]("score") == "95") // int cell, not digit string
    assert(first.getAs[String]("name") == "\"alice\"")
    // strict-JSON rows lack _source_type → stays null (no fillna'')
    assert(first.getAs[String]("_source_type") == null)
  }
}
