package graft.queries

import graft.core.{GraftQuery, Tables}
import graft.ops.{TextAnalysis => TA}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Instruction / conversation data operators (chat01-chat03): the shapes
  * an SFT data pipeline runs over multi-turn dialogs. The reference has
  * no chat surface (north-star extension, like the dedup/sim packs);
  * conversations are built deterministically from the documents table —
  * conversation = (source, doc_id DIV 4), turns ordered by doc_id, role
  * alternating user/assistant by doc_id parity — so DuckDB can recompute
  * every aggregate from the raw table while the Spark side exercises the
  * real machinery (ChatML template rendering, ShareGPT JSON round trip
  * through to_json/from_json, window-function structural QC).
  *
  * 100 TB shape notes: conversations are ≤4 turns by construction, so
  * every collect_list is bounded; chat02 is pure window functions over
  * one shuffle by (source, conv); final aggregates are source-keyed
  * (domain-bounded).
  */
object ChatQueries {

  private val M = TarQueries.M

  /** turns with the conversation key and role attached */
  private def turns(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"), col("text"),
        expr("doc_id DIV 4").as("conv"),
        when(col("doc_id") % 2 === 0, "user").otherwise("assistant").as("role"))

  val all: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // ChatML template render: each conversation becomes the exact
    // training-text string (`<|im_start|>role\ntext<|im_end|>\n` per
    // turn, in turn order) — the step that turns a dialog dataset into
    // tokenizer input. Per-source counts, rendered chars, and a rendered
    // checksum pin byte-exact template output against DuckDB rebuilding
    // the same strings with ordered string_agg.
    GraftQuery(
      "chat01_chatml_render",
      (s, d) => {
        val rendered = turns(s, d)
          .groupBy(col("source"), col("conv"))
          .agg(sort_array(collect_list(struct(col("doc_id"), col("role"), col("text"))))
            .as("ts"))
          .select(col("source"),
            array_join(transform(col("ts"), t =>
              concat(lit("<|im_start|>"), t.getField("role"), lit("\n"),
                t.getField("text"), lit("<|im_end|>\n"))), "").as("rendered"))
        rendered
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_convs"),
            sum(length(col("rendered"))).as("render_chars"),
            sum(TA.hash60(col("rendered")) % M).as("render_check"))
      },
      Some(s"""WITH r AS (
          SELECT source,
            string_agg('<|im_start|>' ||
                CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END ||
                chr(10) || text || '<|im_end|>' || chr(10),
              '' ORDER BY doc_id) AS rendered
          FROM documents GROUP BY source, doc_id // 4)
        SELECT source, count(*) AS n_convs,
          CAST(sum(length(rendered)) AS BIGINT) AS render_chars,
          CAST(sum(${TA.Sql.hash60("rendered")} % $M) AS BIGINT) AS render_check
        FROM r GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Turn-structure QC: the validation pass an SFT ingest runs before
    // training — first turn must be the user's, roles must alternate,
    // no empty turns, at least one exchange. Defects occur naturally
    // (conversations whose first doc_id is odd start with the assistant;
    // a missing doc_id creates same-role adjacency) plus a planted
    // empty-turn slice (hash-selected, recomputed identically by the
    // oracle). One window pass, then a source-keyed rollup.
    GraftQuery(
      "chat02_turn_validate",
      (s, d) => {
        val w = Window.partitionBy(col("source"), col("conv")).orderBy(col("doc_id"))
        val t = turns(s, d)
          .withColumn("text2",
            when(TA.hash60(concat(col("source"), lit(":"), col("doc_id"))) % 19 === 0, lit(""))
              .otherwise(col("text")))
          .withColumn("prev_role", lag(col("role"), 1).over(w))
        val convs = t.groupBy(col("source"), col("conv"))
          .agg(
            count(lit(1)).as("n_turns"),
            min(col("doc_id")).as("first_id"),
            max(when(col("prev_role") === col("role"), 1).otherwise(0)).as("bad_alt"),
            max(when(col("text2") === "", 1).otherwise(0)).as("has_empty"))
          .select(col("source"),
            (col("first_id") % 2 =!= 0).cast("int").as("bad_start"),
            col("bad_alt"), col("has_empty"),
            (col("n_turns") < 2).cast("int").as("short"))
        convs.groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_convs"),
            sum(when(col("bad_start") + col("bad_alt") + col("has_empty") + col("short") === 0, 1)
              .otherwise(0)).as("n_valid"),
            sum(col("bad_start")).as("n_bad_start"),
            sum(col("bad_alt")).as("n_bad_alt"),
            sum(col("has_empty")).as("n_with_empty"),
            sum(col("short")).as("n_short"))
      },
      Some(s"""WITH t AS (
          SELECT source, doc_id, doc_id // 4 AS conv,
            CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
            CASE WHEN ${TA.Sql.hash60("source || ':' || CAST(doc_id AS VARCHAR)")} % 19 = 0
              THEN '' ELSE text END AS text2
          FROM documents),
        x AS (
          SELECT *, lag(role) OVER (PARTITION BY source, conv ORDER BY doc_id) AS prev_role
          FROM t),
        c AS (
          SELECT source, conv,
            CASE WHEN min(doc_id) % 2 <> 0 THEN 1 ELSE 0 END AS bad_start,
            max(CASE WHEN prev_role = role THEN 1 ELSE 0 END) AS bad_alt,
            max(CASE WHEN text2 = '' THEN 1 ELSE 0 END) AS has_empty,
            CASE WHEN count(*) < 2 THEN 1 ELSE 0 END AS short
          FROM x GROUP BY 1, 2)
        SELECT source, count(*) AS n_convs,
          CAST(sum(CASE WHEN bad_start + bad_alt + has_empty + short = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
          CAST(sum(bad_start) AS BIGINT) AS n_bad_start,
          CAST(sum(bad_alt) AS BIGINT) AS n_bad_alt,
          CAST(sum(has_empty) AS BIGINT) AS n_with_empty,
          CAST(sum(short) AS BIGINT) AS n_short
        FROM c GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // ShareGPT ingest round trip: conversations are serialized to the
    // ShareGPT JSON layout ({"id":…,"conversations":[{"from":"human"|
    // "gpt","value":…},…]}) with to_json, then re-parsed with from_json
    // through an explicit nested schema — the exact ingest path for the
    // most common public instruction-data format. Per-source turn
    // counts, assistant chars, and a checksum over the human turns pin
    // the round trip against DuckDB recomputing from the raw table.
    GraftQuery(
      "chat03_sharegpt_parse",
      (s, d) => {
        val json = turns(s, d)
          .withColumn("from",
            when(col("role") === "user", "human").otherwise("gpt"))
          .groupBy(col("source"), col("conv"))
          .agg(sort_array(collect_list(struct(col("doc_id"), col("from"), col("text"))))
            .as("ts"))
          .select(col("source"),
            to_json(struct(
              col("conv").as("id"),
              transform(col("ts"), t => struct(
                t.getField("from").as("from"),
                t.getField("text").as("value"))).as("conversations"))).as("payload"))
        val schema = org.apache.spark.sql.types.DataType.fromDDL(
          "STRUCT<id: BIGINT, conversations: ARRAY<STRUCT<from: STRING, value: STRING>>>")
        val parsed = json
          .select(col("source"), from_json(col("payload"), schema).as("c"))
          .select(col("source"),
            size(col("c.conversations")).as("n_turns"),
            aggregate(
              transform(col("c.conversations"), t =>
                when(t.getField("from") === "gpt", length(t.getField("value"))).otherwise(0)),
              lit(0L), (acc, x) => acc + x).as("gpt_chars"),
            array_join(
              transform(
                filter(col("c.conversations"), t => t.getField("from") === "human"),
                t => t.getField("value")), "").as("human_cat"))
        parsed.groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_convs"),
            sum(col("n_turns")).as("turns_total"),
            sum(col("gpt_chars")).as("gpt_chars"),
            sum(TA.hash60(col("human_cat")) % M).as("human_check"))
      },
      Some(s"""WITH c AS (
          SELECT source, doc_id // 4 AS conv, count(*) AS n_turns,
            CAST(sum(CASE WHEN doc_id % 2 = 1 THEN length(text) ELSE 0 END) AS BIGINT) AS gpt_chars,
            coalesce(string_agg(CASE WHEN doc_id % 2 = 0 THEN text END, '' ORDER BY doc_id), '') AS human_cat
          FROM documents GROUP BY 1, 2)
        SELECT source, count(*) AS n_convs,
          CAST(sum(n_turns) AS BIGINT) AS turns_total,
          CAST(sum(gpt_chars) AS BIGINT) AS gpt_chars,
          CAST(sum(${TA.Sql.hash60("human_cat")} % $M) AS BIGINT) AS human_check
        FROM c GROUP BY 1"""),
    ),

  )
}
