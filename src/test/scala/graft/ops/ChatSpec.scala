package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Locks on the chat/instruction-data pack (chat01-chat03): exact ChatML
  * template bytes, turn-structure verdicts on crafted conversations, the
  * ShareGPT to_json/from_json round trip, and the scale shape (one
  * shuffle to the conversation key before the source rollup; every
  * collect_list bounded at 4 turns by construction).
  */
class ChatSpec extends SparkSpec {

  private def run(name: String, dir: String = "/root/testdata/sf0.001") =
    graft.SparkEntry.queries(name)(spark, dir)

  test("chat01: ChatML rendering is byte-exact on a hand conversation") {
    import spark.implicits._
    // conversation 0 of a synthetic two-turn dialog, rendered by the same
    // lambda the query uses
    val docs = Seq((0L, "hi", "s"), (1L, "hello!", "s"))
      .toDF("doc_id", "text", "source")
    val rendered = docs
      .groupBy(col("source"), expr("doc_id DIV 4").as("conv"))
      .agg(sort_array(collect_list(struct(col("doc_id"),
        when(col("doc_id") % 2 === 0, "user").otherwise("assistant").as("role"),
        col("text")))).as("ts"))
      .select(array_join(transform(col("ts"), t =>
        concat(lit("<|im_start|>"), t.getField("role"), lit("\n"),
          t.getField("text"), lit("<|im_end|>\n"))), "").as("r"))
      .as[String].collect().head
    assert(rendered ==
      "<|im_start|>user\nhi<|im_end|>\n<|im_start|>assistant\nhello!<|im_end|>\n")
  }

  test("chat01/chat02/chat03 return one row per source with positive counts") {
    val nSources = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("source").distinct().count()
    for (name <- Seq("chat01_chatml_render", "chat02_turn_validate",
        "chat03_sharegpt_parse")) {
      val rows = run(name).collect()
      assert(rows.length == nSources, s"$name: ${rows.length} sources")
      assert(rows.forall(_.getLong(1) > 0), s"$name: empty source rows")
    }
  }

  test("chat02 verdicts: validation counts are consistent") {
    val df = run("chat02_turn_validate")
    val agg = df.agg(
      sum("n_convs").as("convs"), sum("n_valid").as("valid"),
      sum("n_bad_start").as("bs"), sum("n_bad_alt").as("ba"),
      sum("n_with_empty").as("we"), sum("n_short").as("sh")).collect().head
    val (convs, valid) = (agg.getLong(0), agg.getLong(1))
    assert(valid <= convs)
    // the planted empty-turn slice (hash % 19) must actually fire
    assert(agg.getLong(4) > 0, "no conversation hit the planted empty turns")
    // every invalid conversation is explained by at least one flag
    assert(agg.getLong(2) + agg.getLong(3) + agg.getLong(4) + agg.getLong(5) >=
      convs - valid)
  }

  test("chat03: ShareGPT parse agrees with a direct computation") {
    import spark.implicits._
    val direct = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("source"), col("doc_id"), col("text"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("turns_total"),
        sum(when(col("doc_id") % 2 === 1, length(col("text"))).otherwise(0))
          .as("gpt_chars"))
      .as[(String, Long, Long)].collect().map { case (k, a, b) => k -> ((a, b)) }.toMap
    run("chat03_sharegpt_parse")
      .select(col("source"), col("turns_total"), col("gpt_chars"))
      .as[(String, Long, Long)].collect().foreach { case (src, turns, chars) =>
        assert((turns, chars) == direct(src), s"source $src")
      }
  }

  test("chat01 plan shape: two shuffles (conversation key, then source rollup)") {
    val df = run("chat01_chatml_render")
    df.collect()
    assert(countShuffles(df.queryExecution.executedPlan) <= 2)
  }
}
