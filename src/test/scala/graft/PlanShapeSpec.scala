package graft

import org.apache.spark.sql.functions._

/** Physical-plan gates for the round-13 session-2 queries: the scale
  * claims in COVERAGE.md stated as assertions — q38's LATERAL must
  * decorrelate to a join + partitioned rank (no cartesian product, no
  * correlated re-execution per outer row), and the chat aggregates must
  * keep their shuffle counts at the conversation-key + rollup minimum.
  */
class PlanShapeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def planString(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q38 lateral decorrelates: no cartesian/nested-loop-per-row, a rank window appears") {
    val df = SparkEntry.queries("q38_lateral_topn")(spark, sf)
    val plan = planString(df)
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    // Catalyst rewrites the correlated LIMIT into a partitioned window rank
    assert(plan.contains("Window") || plan.contains("window"),
      s"no window rank in:\n$plan")
  }

  test("chat02 stays at two shuffles (conversation key, then source rollup)") {
    val df = SparkEntry.queries("chat02_turn_validate")(spark, sf)
    df.collect()
    assert(countShuffles(df.queryExecution.executedPlan) <= 2)
  }

  test("chat03 stays at two shuffles (conversation build, then source rollup)") {
    val df = SparkEntry.queries("chat03_sharegpt_parse")(spark, sf)
    df.collect()
    assert(countShuffles(df.queryExecution.executedPlan) <= 2)
  }

  test("codec shard queries keep the one-aggregate shape (shard map, lang rollup)") {
    for (name <- Seq("bz01_bzip2_jsonl", "xz01_xz_jsonl", "sn01_snappy_jsonl",
        "cb01_cbor_shards", "zst03_dict_jsonl")) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      // shard-group shuffle + final aggregate; AQE may fold the pair
      assert(countShuffles(df.queryExecution.executedPlan) <= 2, name)
    }
  }

  test("per-row ops are shuffle-free until their single rollup") {
    for (name <- Seq("text18_nfc_normalize", "text19_luhn_audit",
        "pack07_fim", "mm20_exif_audit")) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      assert(countShuffles(df.queryExecution.executedPlan) <= 1, name)
    }
  }

  // ------------------------------------------------------- round 14 ----

  test("round-14 codec/per-row queries keep the shard-map + rollup shape") {
    for ((name, maxShuffles) <- Seq(
        "br01_brotli_jsonl" -> 2, "br02_poisoned_brotli" -> 2,
        "pack08_span_corruption" -> 1,
        // mm22 carries mm13's deliberate pre-map repartition (spread the
        // per-row codec work) plus its single rollup
        "mm22_lossy_alpha" -> 2)) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      assert(countShuffles(df.queryExecution.executedPlan) <= maxShuffles, name)
    }
  }

  test("warc05 and layout10 stay at two shuffles (key dedup/replay, then rollup)") {
    for (name <- Seq("warc05_cdx_latest", "layout10_commit_log")) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      assert(countShuffles(df.queryExecution.executedPlan) <= 2, name)
    }
  }

  test("warc04's uri join exchange carries no document bodies") {
    val df = SparkEntry.queries("warc04_wet_wat")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the WET side must reduce text to (txt_bytes, txt_check) BEFORE the
    // join: a `text` attribute inside any Exchange output is the
    // 15.7x-ratio regression this gate exists to stop
    val exchanges = plan.split("\n").filter(_.contains("Exchange"))
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.matches(".*\\btext#\\d+.*")),
      s"text column rides a shuffle:\n${exchanges.mkString("\n")}")
  }

  test("warc06's record-id join exchange carries no document bodies") {
    val df = SparkEntry.queries("warc06_revisit_resolve")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // originals reduce each response body to (rid, o_bytes, o_check,
    // o_digest) INSIDE the per-file flatMap; a raw body/text attribute in
    // any Exchange output re-ships the corpus through the revisit join —
    // the same regression class warc04's gate pins
    val exchanges = plan.split("\n").filter(_.contains("Exchange"))
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(e =>
      e.matches(".*\\btext#\\d+.*") || e.matches(".*\\bbody#\\d+.*")),
      s"document bytes ride a shuffle:\n${exchanges.mkString("\n")}")
  }
}
