package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scale-up probe: the full pipeline over 100k documents (20× the bench
  * corpus). Asserts the driver-side stays schema-sized (row counts and
  * schema come back, no OOM/collect blowup) and runtime stays linear-ish.
  */
class ScaleStressSpec extends SparkSpec {
  test("document pipeline handles 100k docs with schema-sized driver state") {
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
    // 20 copies with distinct doc ids → 100k documents
    val docs = (0 until 20).map { i =>
      base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"), col("text"))
    }.reduce(_ unionByName _)

    val t0 = System.nanoTime()
    val res = DocumentEtl.run(spark, docs)
    val n = res.table.count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(n >= 100000L, s"rows $n")
    assert(res.schema.fields.nonEmpty)
    // informational bound: well under the reference's 60 s single-doc kill
    // limit for 100k docs; generous ceiling to avoid flakiness
    assert(secs < 120, s"pipeline took $secs s for 100k docs")
    info(f"100k docs in $secs%.1f s (${n / secs}%.0f rows/s)")
  }
}
