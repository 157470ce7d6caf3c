package graft.queries

import graft.core.{GraftQuery, Tables}
import graft.etl.{NormalizeCol, Profile, Transforms}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ETL-operator queries with DuckDB oracles: the normalize/infer/profile/
  * transform surface of SURVEY.md §2.3-2.6 exercised over the driver's
  * parquet tables. Inputs are derived deterministically from table columns
  * with engine-identical expressions, so the oracle checks the OPERATOR
  * (branch chain, vote, counts), not a fixture file.
  */
object EtlQueries {

  /** battery value derived per lineitem row — every normalize branch fires. */
  private def batterySpark(d: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.Column
    val sel = (col("l_orderkey") + col("l_linenumber")) % 12
    def s(c: Column) = c.cast("string")
    d.select(
      col("l_orderkey"), col("l_linenumber"),
      when(sel === 0, lit("NA"))
        .when(sel === 1, concat(s(floor(col("l_quantity")).cast("long")), lit("%")))
        .when(sel === 2, concat(lit("USER"), s(col("l_orderkey")), lit("@Example.COM")))
        .when(sel === 3, concat(lit("+1 ("), s(col("l_suppkey") % 1000), lit(") "), s(col("l_partkey") % 10000)))
        .when(sel === 4, s(col("l_orderkey")))
        .when(sel === 5, concat(lit("$"), s(col("l_partkey")), lit(","), s(col("l_suppkey") % 1000)))
        .when(sel === 6, concat(s(col("l_suppkey")), lit("."), s(col("l_partkey"))))
        .when(sel === 7, when(col("l_orderkey") % 2 === 0, lit("yes")).otherwise(lit("False")))
        .when(sel === 8, col("l_returnflag"))
        .when(sel === 9, concat(lit("2025-11-"), lpad(s(col("l_partkey") % 28 + 1), 2, "0")))
        .when(sel === 10, concat(lit("2025-11-11T20:30:0"), s(col("l_orderkey") % 10), lit("Z")))
        .otherwise(concat(col("l_returnflag"), lit(" Text, Here")))
        .as("val"))
  }

  private val batterySql =
    """SELECT l_orderkey, l_linenumber,
      CASE (l_orderkey + l_linenumber) % 12
        WHEN 0 THEN 'NA'
        WHEN 1 THEN concat(CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR), '%')
        WHEN 2 THEN concat('USER', CAST(l_orderkey AS VARCHAR), '@Example.COM')
        WHEN 3 THEN concat('+1 (', CAST(l_suppkey % 1000 AS VARCHAR), ') ', CAST(l_partkey % 10000 AS VARCHAR))
        WHEN 4 THEN CAST(l_orderkey AS VARCHAR)
        WHEN 5 THEN concat('$', CAST(l_partkey AS VARCHAR), ',', CAST(l_suppkey % 1000 AS VARCHAR))
        WHEN 6 THEN concat(CAST(l_suppkey AS VARCHAR), '.', CAST(l_partkey AS VARCHAR))
        WHEN 7 THEN CASE WHEN l_orderkey % 2 = 0 THEN 'yes' ELSE 'False' END
        WHEN 8 THEN l_returnflag
        WHEN 9 THEN concat('2025-11-', lpad(CAST(l_partkey % 28 + 1 AS VARCHAR), 2, '0'))
        WHEN 10 THEN concat('2025-11-11T20:30:0', CAST(l_orderkey % 10 AS VARCHAR), 'Z')
        ELSE concat(l_returnflag, ' Text, Here')
      END AS val
      FROM lineitem"""

  val profileOrdersOracle: Option[String] = Some(s"""WITH long AS (
          SELECT 'o_orderstatus' AS col_name, o_orderstatus AS cell FROM orders
          UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders
          UNION ALL SELECT 'o_orderkey', CAST(o_orderkey AS VARCHAR) FROM orders
          UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders),
        vals AS (SELECT col_name, cell, count(*) AS cnt FROM long GROUP BY 1, 2),
        votes AS (
          SELECT col_name, arg_min(tag, -tag_cnt) AS voted_type FROM (
            SELECT col_name, tag, sum(cnt) AS tag_cnt FROM (
              SELECT col_name, cnt, ${NormalizeCol.sqlInferType("cell")} AS tag FROM vals)
            WHERE tag <> 'null' GROUP BY 1, 2) GROUP BY col_name),
        stats AS (
          SELECT col_name,
            sum(CASE WHEN cell IS NULL THEN cnt ELSE 0 END) AS n_null,
            sum(CASE WHEN cell IS NULL THEN 0 ELSE cnt END) AS n_nonnull,
            count(CASE WHEN cell IS NULL THEN NULL ELSE 1 END) AS n_distinct,
            max(CASE WHEN cell IS NULL THEN NULL ELSE cnt END) AS max_cnt
          FROM vals GROUP BY col_name)
        SELECT s.col_name, coalesce(v.voted_type, 'string') AS voted_type,
          n_null > 0 AS nullable, n_distinct,
          CAST(coalesce(max_cnt, 1) AS DOUBLE) /
            (CASE WHEN n_nonnull = 0 THEN 1 ELSE n_nonnull END) AS confidence,
          n_null = 0 AND n_distinct = n_nonnull AS is_pk
        FROM stats s LEFT JOIN votes v USING (col_name)""")

  val all: Seq[GraftQuery] = Seq(
    // ------------------------------------------------------------------
    // normalize_value branch chain, full battery, per-row outputs.
    GraftQuery(
      "etl01_normalize_chain",
      (s, d) => {
        val b = batterySpark(Tables.lineitem(s, d))
        b.select(
          col("l_orderkey"), col("l_linenumber"), col("val"),
          NormalizeCol.branch(col("val")).as("branch"),
          NormalizeCol.outStr(col("val")).as("out_s"),
          NormalizeCol.outBool(col("val")).as("out_b"),
          NormalizeCol.outInt(col("val")).as("out_i"),
          NormalizeCol.outFloat(col("val")).as("out_d"))
      },
      Some(s"""SELECT l_orderkey, l_linenumber, val,
        ${NormalizeCol.Sql.branch("val")} AS branch,
        ${NormalizeCol.Sql.outStr("val")} AS out_s,
        ${NormalizeCol.Sql.outBool("val")} AS out_b,
        ${NormalizeCol.Sql.outInt("val")} AS out_i,
        ${NormalizeCol.Sql.outFloat("val")} AS out_d
        FROM ($batterySql)"""),
    ),

    // ------------------------------------------------------------------
    // same chain as a FUSED custom Catalyst expression (one pass per cell,
    // whole-stage codegen) — checked against the identical oracle.
    GraftQuery(
      "etl08_normalize_fused",
      (s, d) => {
        val b = batterySpark(Tables.lineitem(s, d))
        val nv = graft.etl.NormalizeValue(col("val"))
        b.select(
          col("l_orderkey"), col("l_linenumber"), col("val"),
          nv.getField("branch").as("branch"),
          nv.getField("out_s").as("out_s"),
          nv.getField("out_b").as("out_b"),
          nv.getField("out_i").as("out_i"),
          nv.getField("out_d").as("out_d"))
      },
      Some(s"""SELECT l_orderkey, l_linenumber, val,
        ${graft.etl.NormalizeCol.Sql.branch("val")} AS branch,
        ${graft.etl.NormalizeCol.Sql.outStr("val")} AS out_s,
        ${graft.etl.NormalizeCol.Sql.outBool("val")} AS out_b,
        ${graft.etl.NormalizeCol.Sql.outInt("val")} AS out_i,
        ${graft.etl.NormalizeCol.Sql.outFloat("val")} AS out_d
        FROM ($batterySql)"""),
    ),

    // ------------------------------------------------------------------
    // infer_type tag distribution over the same battery.
    GraftQuery(
      "etl02_infer_type",
      (s, d) => {
        val b = batterySpark(Tables.lineitem(s, d))
        b.groupBy(NormalizeCol.inferType(col("val")).as("tag"))
          .agg(count(lit(1)).as("n"))
      },
      Some(s"""SELECT ${NormalizeCol.sqlInferType("val")} AS tag, count(*) AS n
        FROM ($batterySql) GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // generate_schema's aggregate core (vote/nullable/distinct/confidence/
    // pk) over orders columns, via the one-shuffle long-format profiler.
    GraftQuery(
      "etl03_profile_orders",
      (s, d) => {
        val o = Tables.orders(s, d).select(
          col("o_orderkey").as("row_idx"),
          col("o_orderstatus").cast("string").as("o_orderstatus"),
          col("o_orderpriority").cast("string").as("o_orderpriority"),
          col("o_orderkey").cast("string").as("o_orderkey"),
          col("o_custkey").cast("string").as("o_custkey"))
        Profile.profileStats(o,
          Seq("o_orderstatus", "o_orderpriority", "o_orderkey", "o_custkey"),
          NormalizeCol.inferType)
      },
      EtlQueries.profileOrdersOracle,
    ),

    // ------------------------------------------------------------------
    // same profile via the ONE-PASS TypedImperativeAggregate (no unpivot
    // shuffle: every column profiled in a single aggregation over the
    // table) — identical oracle to etl03.
    GraftQuery(
      "etl09_profile_onepass",
      (s, d) => {
        val cols = Seq("o_orderstatus", "o_orderpriority", "o_orderkey", "o_custkey")
        val o = Tables.orders(s, d).select(
          col("o_orderkey").as("row_idx") +:
            cols.map(c => col(c).cast("string").as(c)): _*)
        val aggd = o.agg(
          graft.etl.FieldProfileAgg(col(cols.head), col("row_idx")).as(cols.head),
          cols.tail.map(c => graft.etl.FieldProfileAgg(col(c), col("row_idx")).as(c)): _*)
        // explode the per-column structs into the row-per-column shape
        aggd.select(explode(array(cols.map { c =>
          struct(lit(c).as("col_name"),
            col(s"$c.voted_type").as("voted_type"),
            col(s"$c.nullable").as("nullable"),
            col(s"$c.n_distinct").as("n_distinct"),
            col(s"$c.confidence").as("confidence"),
            col(s"$c.is_pk").as("is_pk"))
        }: _*)).as("p")).select(col("p.*"))
      },
      // same oracle as etl03 — both profilers must produce identical stats
      EtlQueries.profileOrdersOracle,
    ),

    // ------------------------------------------------------------------
    // U1 drop_duplicates (projection distinct).
    GraftQuery(
      "etl04_drop_duplicates",
      (s, d) => Transforms.dropDuplicates(
        Tables.orders(s, d).select(col("o_orderstatus"), col("o_orderpriority"))),
      Some("SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"),
    ),

    // ------------------------------------------------------------------
    // U2 dropna over derived nullable columns.
    GraftQuery(
      "etl05_dropna",
      (s, d) => {
        val o = Tables.orders(s, d).select(
          col("o_orderkey"),
          expr("nullif(o_orderstatus, 'F')").as("status_nn"),
          expr("nullif(o_orderpriority, '1-URGENT')").as("prio_nn"))
        Transforms.dropNa(o)
          .groupBy(col("status_nn"), col("prio_nn"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""SELECT nullif(o_orderstatus, 'F') AS status_nn,
          nullif(o_orderpriority, '1-URGENT') AS prio_nn, count(*) AS n
        FROM orders
        WHERE nullif(o_orderstatus, 'F') IS NOT NULL
          AND nullif(o_orderpriority, '1-URGENT') IS NOT NULL
        GROUP BY 1, 2"""),
    ),

    // ------------------------------------------------------------------
    // U3 enrich rules as SQL expressions (the config.yaml enrich_rules
    // analogues: bucket, length, presence flag, token count).
    GraftQuery(
      "etl06_enrich",
      (s, d) => {
        val p = Tables.part(s, d).select(
          col("p_partkey"), col("p_name"), col("p_type"), col("p_retailprice"))
        Transforms.enrich(p, Seq(
          "name_length" -> "length(p_name)",
          "has_price" -> "CAST(p_retailprice IS NOT NULL AS INT)",
          "type_words" -> "size(split(p_type, ' '))",
          "price_range" ->
            ("CASE WHEN p_retailprice < 925 THEN 'low' " +
             "WHEN p_retailprice < 975 THEN 'mid' ELSE 'high' END")))
          .drop("p_name", "p_type", "p_retailprice")
      },
      Some("""SELECT p_partkey, length(p_name) AS name_length,
          CAST(p_retailprice IS NOT NULL AS INT) AS has_price,
          len(string_split(p_type, ' ')) AS type_words,
          CASE WHEN p_retailprice < 925 THEN 'low'
            WHEN p_retailprice < 975 THEN 'mid' ELSE 'high' END AS price_range
        FROM part"""),
    ),

    // ------------------------------------------------------------------
    // U4 validations: required columns + declared-type conformance.
    GraftQuery(
      "etl07_validate",
      (s, d) => {
        val o = Tables.orders(s, d)
        Transforms.validationReport(o,
          required = Seq("o_orderkey", "o_orderstatus", "o_totalprice"),
          types = Map("o_orderkey" -> "integer", "o_orderstatus" -> "string"))
      },
      Some("""SELECT 'required_columns' AS check_name, true AS passed, CAST(0 AS BIGINT) AS detail
        UNION ALL
        SELECT concat('type:o_orderkey', '=integer'),
          count(CASE WHEN NOT regexp_matches(trim(CAST(o_orderkey AS VARCHAR)), '^\d+$') THEN 1 END) = 0,
          count(CASE WHEN NOT regexp_matches(trim(CAST(o_orderkey AS VARCHAR)), '^\d+$') THEN 1 END)
        FROM orders
        UNION ALL
        SELECT concat('type:o_orderstatus', '=string'),
          count(CASE WHEN o_orderstatus IS NOT NULL AND
            (regexp_matches(trim(o_orderstatus), '^\d+$') OR
             regexp_matches(trim(o_orderstatus), '^\d*\.\d+$') OR
             lower(trim(o_orderstatus)) IN ('true','false')) THEN 1 END) = 0,
          count(CASE WHEN o_orderstatus IS NOT NULL AND
            (regexp_matches(trim(o_orderstatus), '^\d+$') OR
             regexp_matches(trim(o_orderstatus), '^\d*\.\d+$') OR
             lower(trim(o_orderstatus)) IN ('true','false')) THEN 1 END)
        FROM orders"""),
    ),

    // ------------------------------------------------------------------
    // SCD Type-2 history build — the warehouse-ETL change-capture pattern:
    // per customer, keep only the orders where o_orderstatus CHANGED from
    // the previous order (lag), then stamp validity intervals (valid_from =
    // change time, valid_to = next change via lead, NULL = current) and a
    // version number. Two window passes over one shuffle key
    // (o_custkey) — Catalyst reuses the partitioning between them, so the
    // whole history build is ONE shuffle at any scale.
    GraftQuery(
      "etl11_scd2_history",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderstatus"),
            col("o_orderdate"), col("o_orderkey"))
          .withColumn("prev", lag(col("o_orderstatus"), 1).over(w))
          .filter(col("prev").isNull || col("prev") =!= col("o_orderstatus"))
          .select(
            col("o_custkey").as("custkey"),
            col("o_orderstatus").as("status"),
            col("o_orderdate").as("valid_from"),
            lead(col("o_orderdate"), 1).over(w).as("valid_to"),
            row_number().over(w).as("version"))
      },
      Some("""WITH m AS (SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
              lag(o_orderstatus) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS prev
            FROM orders),
          ch AS (SELECT * FROM m WHERE prev IS NULL OR prev <> o_orderstatus)
        SELECT o_custkey AS custkey, o_orderstatus AS status,
          o_orderdate AS valid_from,
          lead(o_orderdate) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey) AS valid_to,
          row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey) AS version
        FROM ch"""),
    ),

    // ------------------------------------------------------------------
    // Batch MERGE / upsert without a table format: base snapshot ∪ updates
    // ∪ inserts, then one row_number window keyed on the business key picks
    // the winner (updates beat base). This is exactly how an incremental
    // load folds into a snapshot on plain parquet — one shuffle on the
    // merge key, no driver-side diffing. Updates bump balances (+$5) for
    // every 7th customer; inserts add brand-new keys.
    GraftQuery(
      "etl12_upsert_merge",
      (s, d) => {
        val cents = round(col("c_acctbal") * 100).cast("long")
        val base = Tables.customer(s, d).select(
          col("c_custkey").as("custkey"), cents.as("bal_cents"),
          lit("base").as("src"), lit(0).as("pri"))
        val updates = Tables.customer(s, d)
          .filter(col("c_custkey") % 7 === 0)
          .select(col("c_custkey").as("custkey"),
            (cents + 500).as("bal_cents"), lit("update").as("src"), lit(1).as("pri"))
        val inserts = Tables.customer(s, d)
          .filter(col("c_custkey") % 101 === 0)
          .select((col("c_custkey") + 1000000).as("custkey"),
            lit(0L).as("bal_cents"), lit("insert").as("src"), lit(1).as("pri"))
        // src is a deterministic tiebreaker: at huge SFs an insert key
        // (custkey+1e6) can collide with a real custkey that also carries a
        // pri=1 update row — without the tiebreak the winner is arbitrary.
        val w = Window.partitionBy(col("custkey")).orderBy(col("pri").desc, col("src"))
        base.unionByName(updates).unionByName(inserts)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("custkey"), col("bal_cents"), col("src"))
      },
      Some("""WITH all_rows AS (
          SELECT c_custkey AS custkey,
            CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents, 'base' AS src, 0 AS pri
          FROM customer
          UNION ALL
          SELECT c_custkey, CAST(round(c_acctbal*100) AS BIGINT) + 500, 'update', 1
          FROM customer WHERE c_custkey % 7 = 0
          UNION ALL
          SELECT c_custkey + 1000000, 0, 'insert', 1
          FROM customer WHERE c_custkey % 101 = 0)
        SELECT custkey, bal_cents, src FROM (
          SELECT custkey, bal_cents, src,
            row_number() OVER (PARTITION BY custkey ORDER BY pri DESC, src) AS rn
          FROM all_rows)
        WHERE rn = 1"""),
    ),

    // ------------------------------------------------------------------
    // SCD2 point-in-time lookup: each lineitem resolves the customer's
    // status AS OF its ship date against the etl11 slowly-changing history
    // (valid_from ≤ ship < valid_to, open-ended last version). The dim
    // attach is an EQUI-join on custkey with the interval as a residual
    // filter — per-key history is a handful of versions at any corpus
    // scale, so the join never degenerates to a range cross product; the
    // fact table flows through one orderkey shuffle (to pick up custkey)
    // and one custkey shuffle. Ships before a customer's first version
    // surface as 'none' — the left-join contract an incremental warehouse
    // needs for late facts.
    GraftQuery(
      "etl16_scd2_lookup",
      (s, d) => {
        val hw = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val hist = Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderstatus"),
            col("o_orderdate"), col("o_orderkey"))
          .withColumn("prev", lag(col("o_orderstatus"), 1).over(hw))
          .filter(col("prev").isNull || col("prev") =!= col("o_orderstatus"))
          .select(col("o_custkey").as("h_custkey"),
            col("o_orderstatus").as("h_status"),
            col("o_orderdate").as("valid_from"),
            lead(col("o_orderdate"), 1).over(hw).as("valid_to"))
        val facts = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_shipdate"), col("l_returnflag"),
            col("l_quantity"))
          .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          // Round 18: pin the range-join's fact exchange at a data-derived
          // width — AQE's byte-proportional coalescer shrank the 2.4 MB
          // custkey exchange to 3 tasks and the per-row version-interval
          // probe (the CPU of this query) ran on 3 of 32 cores
          .transform(graft.core.Par.byKey(_, col("o_custkey")))
        facts.join(hist,
            col("o_custkey") === col("h_custkey") &&
              col("valid_from") <= col("l_shipdate") &&
              (col("valid_to").isNull || col("l_shipdate") < col("valid_to")),
            "left")
          .groupBy(coalesce(col("h_status"), lit("none")).as("status"),
            col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            graft.core.Determinism.intSum(col("l_quantity")).as("qty_sum"))
      },
      Some(s"""WITH m AS (SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
              lag(o_orderstatus) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS prev
            FROM orders),
          hist AS (SELECT o_custkey AS h_custkey, o_orderstatus AS h_status,
              o_orderdate AS valid_from,
              lead(o_orderdate) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS valid_to
            FROM (SELECT * FROM m WHERE prev IS NULL OR prev <> o_orderstatus)),
          facts AS (SELECT l.l_shipdate, l.l_returnflag, l.l_quantity, o.o_custkey
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        SELECT coalesce(h.h_status, 'none') AS status, f.l_returnflag,
          count(*) AS n, ${graft.core.Determinism.sqlIntSum("f.l_quantity")} AS qty_sum
        FROM facts f LEFT JOIN hist h
          ON f.o_custkey = h.h_custkey AND h.valid_from <= f.l_shipdate
          AND (h.valid_to IS NULL OR f.l_shipdate < h.valid_to)
        GROUP BY 1, 2"""),
    ),

    // ------------------------------------------------------------------
    // The FLAGSHIP dataflow with an independent oracle: render the orders
    // table as single-line JSON-array documents, run the full document
    // pipeline (extract → json_normalize pivot → normalize_data → flatten
    // → profile), and emit the per-column profile. Every stage's quirk is
    // load-bearing and the oracle recomputes the outcome from `orders`
    // directly in DuckDB:
    //  - strict JSON (E1) parses each doc; the embedded-object (E2) and
    //    embedded-array (E3) scans ALSO fire on the same text (reference
    //    behavior: all extraction stages run), so every record appears
    //    exactly 3× — once untagged, twice tagged _source_type='json'
    //    (the E1 rows' missing tag fills to '' via branch (c)'s fillna);
    //  - ok is all-numeric → dispatch branch (b) → the faithful chain's
    //    PHONE branch claims the bare digits (the reference's documented
    //    phone-regex quirk) → digit strings, voted integer;
    //  - ck carries nulls → int→float coercion ("456" → "456.0", voted
    //    float, nullable);
    //  - dt renders from the timestamp source as "1995-03-15 00:00:00";
    //    the ':' keeps it OUT of the phone branch, so the dateutil battery
    //    rewrites it to isoformat → voted date;
    //  - st/pri are plain strings → strip/lower → voted string.
    // Single-line rendering keeps the CSV/YAML/log/code scanners out
    // (their regexes need newlines/anchors absent here). Scale: the
    // pipeline is the production path (per-partition extraction UDFs, one
    // unpivot shuffle for the profile); the doc grouping is a plain
    // groupBy. etl10 stays the golden-pinned corpus run; this row gives
    // the same dataflow a DuckDB hash-match. The corpus samples orders
    // 1/8 by key: the row exists to hash-verify the DATAFLOW (every
    // branch/quirk above still fires — ck nulls land on every 56th key),
    // not to re-bench the flagship at full volume; etl10 carries the
    // pipeline's bench weight.
    GraftQuery(
      "etl17_doc_pipeline_profile",
      (s, d) => {
        val rec = format_string(
          """{"ok": %d, "st": "%s", "dt": "%s", "pri": "%s", "ck": %s}""",
          col("o_orderkey"), col("o_orderstatus"),
          col("o_orderdate").cast("string"), col("o_orderpriority"),
          when(col("o_orderkey") % 7 === 0, lit("null"))
            .otherwise(col("o_custkey").cast("string")))
        val docs = Tables.orders(s, d)
          .filter(col("o_orderkey") % 8 === 0)
          .select(pmod(col("o_orderkey"), lit(600)).as("doc_id"), rec.as("rec"))
          .groupBy(col("doc_id"))
          .agg(concat(lit("["), array_join(collect_list(col("rec")), ","), lit("]"))
            .as("text"))
        val res = graft.etl.DocumentEtl.run(s, docs.select(col("doc_id"), col("text")))
        Profile.profileStats(res.table, res.columns,
          c => graft.etl.EtlUdfs.inferTypeCell(c))
      },
      Some("""WITH o AS (SELECT o_orderkey, o_orderstatus, o_orderdate,
            o_orderpriority,
            CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey END AS ck
          FROM orders WHERE o_orderkey % 8 = 0),
        -- the pipeline's post-normalize cell rendering per column (3 copies
        -- of every record: E1 untagged + E2/E3 tagged 'json'):
        --   ok  → phone-quirk digit STRING of the key (branch (b) chain)
        --   st  → strip/lower
        --   dt  → timestamp source renders "YYYY-MM-DD HH:MM:SS", which the
        --         ':' keeps out of the phone branch → dateutil isoformat
        --   pri → strip/lower
        --   ck  → numeric float64 (int→float null coercion), py-repr "N.0"
        --   _source_type → branch (c) fillna('') → E1 rows hold ''
        long AS (
          SELECT 'ok' AS col_name, CAST(o_orderkey AS VARCHAR) AS cell FROM o
          UNION ALL SELECT 'st', lower(o_orderstatus) FROM o
          UNION ALL SELECT 'dt', strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') FROM o
          UNION ALL SELECT 'pri', lower(o_orderpriority) FROM o
          UNION ALL SELECT 'ck', CAST(ck AS VARCHAR) || '.0' FROM o),
        tripled AS (
          SELECT col_name, cell FROM long, (VALUES (1), (2), (3)) c(copy)
          UNION ALL
          SELECT '_source_type', CASE WHEN copy <= 2 THEN 'json' ELSE '' END
          FROM o, (VALUES (1), (2), (3)) c(copy)),
        vals AS (SELECT col_name, cell, count(*) AS cnt FROM tripled GROUP BY 1, 2),
        votes AS (
          SELECT col_name, arg_min(tag, -tag_cnt) AS voted_type FROM (
            SELECT col_name, tag, sum(cnt) AS tag_cnt FROM (
              SELECT col_name, cnt, CASE
                  WHEN cell IS NULL OR cell = '' THEN 'null'
                  WHEN regexp_matches(cell, '^\d+$') THEN 'integer'
                  WHEN regexp_matches(cell, '^\d*\.\d+$') THEN 'float'
                  WHEN regexp_matches(cell, '^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}$') THEN 'date'
                  ELSE 'string' END AS tag
              FROM vals)
            WHERE tag <> 'null' GROUP BY 1, 2) GROUP BY col_name),
        stats AS (
          SELECT col_name,
            sum(CASE WHEN cell IS NULL THEN cnt ELSE 0 END) AS n_null,
            sum(CASE WHEN cell IS NULL THEN 0 ELSE cnt END) AS n_nonnull,
            count(CASE WHEN cell IS NULL THEN NULL ELSE 1 END) AS n_distinct,
            max(CASE WHEN cell IS NULL THEN NULL ELSE cnt END) AS max_cnt
          FROM vals GROUP BY col_name)
        SELECT s.col_name, coalesce(v.voted_type, 'string') AS voted_type,
          n_null > 0 AS nullable, n_distinct,
          CAST(coalesce(max_cnt, 1) AS DOUBLE) /
            (CASE WHEN n_nonnull = 0 THEN 1 ELSE n_nonnull END) AS confidence,
          n_null = 0 AND n_distinct = n_nonnull AS is_pk
        FROM stats s LEFT JOIN votes v USING (col_name)"""),
    ),

  )
}
