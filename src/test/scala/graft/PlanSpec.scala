package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Physical-plan quality gates — the scale properties the 100 TB design
  * depends on must be visible in `explain`, not assumed: filter pushdown
  * into parquet scans, column pruning, broadcast of small dimensions,
  * partial (map-side) aggregation, and no redundant shuffles.
  */
class PlanSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("q01: shipdate filter is pushed into the parquet scan, columns pruned") {
    val p = planOf("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    // pruned read schema: no l_orderkey/l_partkey in the scan
    assert(p.contains("ReadSchema"), p)
    assert(!p.split("ReadSchema")(1).takeWhile(_ != '\n').contains("l_partkey"), p)
  }

  test("q01: aggregation is partial then final (map-side combine)") {
    val p = planOf("q01_pricing_summary")
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_"), p) // partial_sum / partial_count
  }

  test("q02: nation dimension joins via broadcast, no shuffle for it") {
    val p = planOf("q02_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q04: semi join stays a semi join in the physical plan") {
    val p = planOf("q04_orders_with_heavy_lines")
    assert(p.contains("LeftSemi"), p)
  }

  test("q06: single shuffle for the supplier window (sort within partitions)") {
    val df = SparkEntry.queries("q06_running_revenue_per_supplier")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(countShuffles(plan) <= 1, plan.toString)
  }

  test("etl01: battery + normalize chain is one codegen'd projection (no shuffle)") {
    val df = SparkEntry.queries("etl01_normalize_chain")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(p.contains("*("), p) // whole-stage codegen marker
  }

  test("sim03: query side broadcasts (no corpus shuffle for the scan join)") {
    val p = planOf("sim03_int8_quant")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("sim04/sim06: pair-distinct dedups ids only — no vector payload in its exchange") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.types.ArrayType
    for (q <- Seq("sim04_srp_lsh", "sim06_knn_graph")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.sparkPlan
      // the distinct lowers to keys-only HashAggregates; every exchange
      // below one must carry scalar ids/bands only — a 64-dim vector in
      // that schema means candidates are deduped with ~1 KB payload rows
      val distinctAggs = plan.collect {
        case a: BaseAggregateExec if a.aggregateExpressions.isEmpty => a
      }
      assert(distinctAggs.nonEmpty, s"$q: $plan")
      val offending = distinctAggs.flatMap(_.collect {
        case ex: ShuffleExchangeExec if ex.output.exists(_.dataType.isInstanceOf[ArrayType]) => ex
      })
      assert(offending.isEmpty, s"$q:\n" + offending.mkString("\n"))
    }
  }

  test("text07: PII scrub is a pure projection — no shuffle at all") {
    val df = SparkEntry.queries("text07_pii_scrub")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("text08: repetition stats aggregate partially before the shuffle") {
    val p = planOf("text08_repetition")
    assert(p.contains("partial_"), p)
  }

  test("samp01: sampling reads only doc_id and lang (column pruning)") {
    val p = planOf("samp01_hash_sample")
    assert(p.contains("ReadSchema"), p)
    val read = p.split("ReadSchema")(1).takeWhile(_ != '\n')
    assert(!read.contains("text"), p)
  }

  test("sketch01: bottom-k plans as per-partition top-k merge, not a global sort") {
    val p = planOf("sketch01_kmv_distinct")
    assert(p.contains("TakeOrdered"), p)
  }

  test("sketch03: bloom bitmap broadcasts; the fact side never shuffles") {
    val p = planOf("sketch03_bloom_prejoin")
    assert(p.contains("Broadcast"), p)
    // the only exchanges are broadcasts (bloom + dim) — no fact-side
    // hash-partitioning before the filter
    assert(!p.contains("hashpartitioning(l_orderkey"), p)
  }

  test("samp02: stratified sampling reads only doc_id and lang") {
    val p = planOf("samp02_stratified")
    assert(p.contains("ReadSchema"), p)
    val read = p.split("ReadSchema")(1).takeWhile(_ != '\n')
    assert(!read.contains("text"), p)
  }

  private def shuffleCount(name: String): Int = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    countShuffles(df.queryExecution.executedPlan)
  }

  test("etl11: the SCD2 lag/lead/row_number windows share ONE shuffle") {
    assert(shuffleCount("etl11_scd2_history") <= 1)
  }

  test("etl12: the upsert merge is one shuffle, keyed on custkey") {
    val df = SparkEntry.queries("etl12_upsert_merge")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(custkey"), p)
    assert(shuffleCount("etl12_upsert_merge") <= 1)
  }

  test("sketch05: HLL registers max-merge partially before the shuffle") {
    val p = planOf("sketch05_hll")
    assert(p.contains("partial_max"), p)
  }

  test("ev10: interval join filters both event types into the scans") {
    val p = planOf("ev10_interval_join")
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)") ||
      p.contains("EqualTo(event_type,click)"), p)
  }

  test("decon01: eval shingle set broadcasts; the train side probes semi-join") {
    val p = planOf("decon01_eval_overlap")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("LeftSemi"), p)
  }

  test("samp03: weighted bottom-k plans as TakeOrdered, not a global sort") {
    val p = planOf("samp03_weighted")
    assert(p.contains("TakeOrdered"), p)
  }

  test("sketch07: F2 sign sums combine map-side before the single shuffle") {
    val p = planOf("sketch07_ams_f2")
    assert(p.contains("partial_"), p)
  }

  test("pack01: the shard window and the shard rollup share one shuffle") {
    assert(shuffleCount("pack01_seq_packing") <= 1)
  }

  test("ev12: the customer dim broadcasts; the stream side never shuffles pre-agg") {
    val p = planOf("ev12_stream_static")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("qc02: global stats broadcast back; the day frame never sort-merge-joins") {
    val p = planOf("qc02_batch_drift")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("dedup09: pairs are cluster-local equi-joins, never a cartesian product") {
    val p = planOf("dedup09_semdedup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("dedup10: the batch probes the band index by key, never all-pairs") {
    val p = planOf("dedup10_incremental")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("mix01: corpus agg is partial; the grand total is a join-free window sum") {
    val p = planOf("mix01_temperature")
    // round 18 (the mix03 shape): the total is a GLOBAL WINDOW sum over
    // the mixture-sized group table — no second corpus aggregate, no
    // broadcast crossJoin, no joins at all
    assert(p.contains("partial_"), p)
    assert(p.contains("windowspecdefinition"), p)
    assert(!p.contains("Join"), p)
  }

  test("dedup12: candidates come from band equi-joins, never a cartesian product") {
    val p = planOf("dedup12_containment")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("vocab02: the vocabulary joins as a broadcast dimension") {
    val p = planOf("vocab02_bpe_encode")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("text14: readability scoring is a pure codegen projection, no shuffle") {
    val df = SparkEntry.queries("text14_readability")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(p.contains("*("), p)
  }

  test("qc04: the expectation suite aggregates partially before one reduce") {
    val p = planOf("qc04_expectations")
    assert(p.contains("partial_"), p)
  }

  test("clust02: inertia scoring assigns via centroid literals — no join at all") {
    val p = planOf("clust02_inertia")
    assert(!p.contains("Join"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("assoc01: pair generation is basket-keyed; rule metrics join as broadcasts") {
    val p = planOf("assoc01_basket_rules")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("qc05: the k-anonymity rollup aggregates partially before the shuffle") {
    val p = planOf("qc05_kanonymity")
    assert(p.contains("partial_"), p)
  }

  test("ev16: the calendar gap-fill join is (user, day)-keyed, never nested-loop") {
    val p = planOf("ev16_resample")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("pack03: the chunk table is explode + projection — no shuffle at all") {
    val df = SparkEntry.queries("pack03_chunk_table")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("sim05: only the 20-query probe side broadcasts; candidate joins are keyed") {
    val p = planOf("sim05_mmr_rerank")
    // the deliberate nested-loop join is broadcast(q) × corpus — O(N·|q|);
    // it must be the broadcast form, never an unbroadcast cartesian, and
    // the MMR stage joins are all q_id/candidate-keyed hash joins
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("curate01: the Gopher rule battery is one projection + one partial agg") {
    val df = SparkEntry.queries("curate01_gopher_rules")(spark, sf)
    val plan = df.queryExecution.executedPlan
    df.collect()
    assert(countShuffles(plan) <= 1, plan.toString)
    assert(plan.toString.contains("partial_"), plan.toString)
  }

  test("pack04: length bucketing is one partial-agg'd groupBy, no join") {
    val df = SparkEntry.queries("pack04_length_buckets")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_"), p)
  }

  test("sim06: band self-join is equi-keyed and vector re-attach is id-keyed — no nested loop") {
    val p = planOf("sim06_knn_graph")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("etl16: SCD2 lookup joins are all equi-keyed (interval is a residual filter)") {
    val p = planOf("etl16_scd2_lookup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("qc06: PSI totals attach by broadcast; the fact scan never shuffles rows") {
    val p = planOf("qc06_psi_drift")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_"), p)
  }

  test("ev17: nearest as-of adds no shuffle beyond right-side prep + key window") {
    val df = SparkEntry.queries("ev17_asof_nearest")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    // purchases pre-agg (1) + the union's user_id window exchange (1); the
    // second direction rides the same exchange as a partition-local re-sort
    assert(countShuffles(plan) <= 2, plan.toString)
    // both direction carries share one ascending order — Spark still splits
    // the two FRAMES (preceding/following) into two Window nodes, but the
    // sorts are identical and payload width adds nothing: exactly one node
    // (and one partition-local sort) per direction, never one per column
    val sorts = plan.toString.split("\n").count(_.contains(" Sort ["))
    assert(sorts <= 2, plan.toString)
    assert(plan.toString.split("\n").count(_.contains("- Window [")) <= 2,
      plan.toString)
  }

  test("ev18: islands use the date-minus-rownum trick — no self-join, no recursion") {
    val p = planOf("ev18_gap_islands")
    assert(!p.contains("Join"), p)
  }

  test("qc07: accuracy audit joins are band-key/id equi-joins, never nested loop") {
    val p = planOf("qc07_minhash_accuracy")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("decon02: eval shingles and the hit set broadcast; train corpus never shuffles") {
    val p = planOf("decon02_eval_pressure")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("url: frontier ops are pure projections — no join, no window, no sort") {
    Seq("url01_canonicalize", "url02_domain_stats", "url03_robots_eval").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("Join"), s"$q joins: $p")
      assert(!p.contains("Window"), s"$q windows: $p")
    }
  }

  test("warc/tar: container round trips are two shuffles — group build + final agg") {
    Seq("warc01_warc_roundtrip", "tar01_webdataset_roundtrip",
      "tar02_poisoned_shards").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      assert(countShuffles(df.queryExecution.executedPlan) <= 2,
        s"$q: " + df.queryExecution.executedPlan.toString)
    }
  }

  test("q36/q37: mode counts partial-aggregate; the RANGE window is one shuffle") {
    assert(planOf("q36_mode").contains("partial_"), planOf("q36_mode"))
    val df = SparkEntry.queries("q37_trailing_window")(spark, sf)
    df.collect()
    assert(countShuffles(df.queryExecution.executedPlan) <= 1,
      df.queryExecution.executedPlan.toString)
  }

  test("vocab03: coverage ranks via TakeOrdered top-k, never a global rank window") {
    val p = planOf("vocab03_token_coverage")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("text15: entropy counts partial-aggregate; term window is doc-local") {
    val p = planOf("text15_token_entropy")
    assert(p.contains("partial_"), p)
  }

  test("decon03: eval shingles broadcast into the scrub; corpus never sort-merges") {
    val p = planOf("decon03_scrub")
    assert(p.contains("BroadcastHashJoin"), p)
    // the chunk->eval probe must not shuffle the train corpus by hash key;
    // the only SMJ-free exception is the final lang-sized agg join, which
    // AQE may also broadcast — assert no sort-merge anywhere
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Window ["), p)
  }

  test("text16: classifier is scan + two partial aggs — no join, no window") {
    val p = planOf("text16_hashed_classifier")
    assert(p.contains("partial_"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window ["), p)
    assert(shuffleCount("text16_hashed_classifier") <= 3) // repartition + 2 groupBys
  }

  // ---- slow-five scale contracts (BASELINE.md prose, pinned as gates) ----
  // The hot/cold cap decision in every dedup operator is a schema-sized
  // groupBy + driver collect, NEVER count().over(Window) on the corpus —
  // that form shuffles every row by bucket key and piles the hot bucket
  // onto one partition (the round-4 dedup02 regression, 3.9 s → 1.9 s when
  // removed). A reappearance must fail here, not in a bench read.
  private def noCountOverWindow(p: String): Unit =
    assert(!p.contains("count(1) windowspecdefinition"), p)

  test("dedup02: no count-over-window; cold-path plan is the plain windowless self-join") {
    val p = planOf("dedup02_ngram_jaccard")
    noCountOverWindow(p)
    // no block exceeds the cap at this SF → the emitted plan must be
    // EXACTLY the plain blocked all-pairs join: no Window node at all
    assert(!p.contains("Window ["), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dedup03: capped banding stays equi-keyed, no count-over-window, no nested loop") {
    val p = planOf("dedup03_minhash_lsh")
    noCountOverWindow(p)
    assert(!p.contains("Window ["), p) // cold at every test SF
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("dedup07: component edges come equi-keyed, no count-over-window, no nested loop") {
    val p = planOf("dedup07_components")
    noCountOverWindow(p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("dedup09: no count-over-window anywhere in the semdedup plan") {
    noCountOverWindow(planOf("dedup09_semdedup"))
  }

  test("clust01: assignment is a literal projection — no join, partial agg, no window") {
    val p = planOf("clust01_kmeans")
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_"), p)
    noCountOverWindow(p)
  }

  test("sim06: no count-over-window in the kNN-graph build") {
    noCountOverWindow(planOf("sim06_knn_graph"))
  }

  test("dedup14: chunk scrub is equi-keyed on the chunk hash — partial aggs, no window") {
    val p = planOf("dedup14_boilerplate")
    // the hot-chunk table is corpus-derived (|corpus|/2-bounded, NOT
    // broadcastable at 100 TB) — the join back must be an equi-join on the
    // chunk hash, never a nested loop; both groupBys combine map-side
    assert(p.contains("partial_"), p)
    assert(!p.contains("Window ["), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    noCountOverWindow(p)
  }

  test("sim07: PQ encode is an in-row fold; only the ADC probe is the nested-loop scan") {
    val p = planOf("sim07_pq_adc")
    // round 17: the codebook collapses to ONE broadcast sorted-array row
    // and encode+reconstruct is an in-row fold — no codebook join, no
    // rec⋈e re-attach (pqReconstruct is column-preserving). The only join
    // left is the ADC stage: broadcast(20 queries) × corpus, sim01 shape.
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("mix03: corpus agg is partial; the rounds are one join-free window pipeline") {
    val p = planOf("mix03_water_filling")
    // the only corpus-scale stage is the (lang, source) groupBy — map-side
    // combined; since round 17 the 3 water-filling rounds run as GLOBAL
    // WINDOW sums over the mixture-sized table — no joins of any kind
    // (previously: a broadcast-join job per round scalar)
    assert(p.contains("partial_"), p)
    assert(p.contains("windowspecdefinition"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("qc10: per-dim integer sums partial-aggregate; vectors never shuffle whole") {
    val p = planOf("qc10_embedding_drift")
    // the corpus-scale stage is the label×split×dim integer groupBy —
    // map-side combined over exploded scalar ints, not whole vectors
    assert(p.contains("partial_"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("layout08: both layout summaries ride one scan shape — partial aggs, broadcast bounds") {
    val p = planOf("layout08_zonemap_skip")
    assert(p.contains("partial_"), p)
    assert(p.contains("Broadcast"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("sim08: both retrieval legs broadcast the query side; fusion join is keyed") {
    val p = planOf("sim08_rrf_fusion")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("samp06: split assignment is a projection; one partial agg + broadcast total") {
    val p = planOf("samp06_split_assign")
    assert(p.contains("partial_"), p)
    assert(p.contains("Broadcast"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("qc09: freshness global max attaches as a 1-row broadcast") {
    val p = planOf("qc09_freshness")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_"), p)
  }

  test("dedup15: window table equi-joins the hot set; span merge windows by doc only") {
    val p = planOf("dedup15_substring")
    // hot-table build is a map-side-combinable distinct-count agg
    assert(p.contains("partial_"), p)
    // join back on the window hash, never a product
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the gaps-and-islands pass partitions by doc_id, never a global window
    assert(p.contains("windowspecdefinition(doc_id"), p)
  }

  test("samp07: assignment is a literal projection — the weight agg is partial") {
    val p = planOf("samp07_kcenter")
    assert(p.contains("partial_count"), p)
    // the picked-center table is driver-sized and joins the corpus-side
    // counts by broadcast (4 rows)
    assert(p.contains("Broadcast"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("mix04: corpus agg is partial; the phases are one join-free window pipeline") {
    val p = planOf("mix04_anneal")
    assert(p.contains("partial_sum"), p)
    assert(p.contains("windowspecdefinition"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("mm08-mm12: codec scans are per-row maps — partial agg, no join, no window") {
    for (q <- Seq("mm08_palette_adam7", "mm09_mixed_media_errors",
        "mm10_jpeg_progressive", "mm11_gif_anim", "mm12_webp_lossless")) {
      val p = planOf(q)
      assert(p.contains("partial_"), s"$q: $p")
      assert(!p.contains("Join"), s"$q: $p")
      assert(!p.contains("Window ["), s"$q: $p")
    }
  }

  // ---- registry-wide gate: no unpartitioned window over unbounded data ----
  // An unpartitioned WindowExec sorts its ENTIRE input in one task — the
  // one plan shape that cannot survive a 100× scale-up no matter how fast
  // it is at sf0.1 (the round-8 text17/sketch02 finding). The gate walks
  // every registered query's physical plan and demands that each
  // partition-less window is k-BOUNDED: a GlobalLimit / TakeOrdered below
  // it in the same subtree (the vocab03 pattern), or the query appears in
  // the explicit allow-list of frames that are schema-sized by
  // construction (mixture tables ≤97 rows, per-bin histograms, ≤k-row
  // driver-sized pick tables) — never corpus-sized.
  private val smallFrameWindowAllowed: Map[String, String] = Map(
    // (query -> why the unpartitioned frame is bounded by construction;
    // every other query must carry a GlobalLimit/TakeOrdered below the
    // window — do NOT add entries here without a row-count argument)
    "mix01_temperature" -> "frame = lang×source mixture table, ≤97 rows at any corpus size — the round-18 rewrite computes the grand total as a global window sum over it (was agg→broadcast→crossJoin re-running the corpus groupBy)",
    "mix02_epoch_plan" -> "frame = lang×source mixture table, ≤97 rows at any corpus size",
    "qc13_calibration" -> "frame = fixed-width score-bin histogram (n_chars DIV 64) — bounded by the value DOMAIN; the round-18 rewrite reads the corpus base rate off the same histogram as global window sums (was a second aggregate + crossJoin over a persisted scan)",
    "mix03_water_filling" -> "frame = lang×source mixture table (≤97 rows) — the round-17 rewrite computes every round scalar (pool/leftover/residual) as a global window sum over it, replacing a broadcast-join job per scalar",
    "mix04_anneal" -> "frame = lang×source mixture table (≤97 rows) — the largest-remainder rank windows run after the corpus collapsed to one row per (lang, source)",
    "sketch06_hist_quantile" -> "frame = fixed-width price histogram bins — bounded by the value DOMAIN (|price range|/W), not by row count",
    "qc12_auc_audit" -> "frame = integer score histogram (n_chars DIV 16) — bounded by the score DOMAIN, not by row count",
  )

  private def unpartitionedWindows(p: SparkPlan): Seq[SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    def kids(n: SparkPlan): Seq[SparkPlan] = n match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case qs: QueryStageExec => Seq(qs.plan)
      case other => other.children
    }
    def hasBoundBelow(n: SparkPlan): Boolean = {
      val cls = n.getClass.getSimpleName
      cls.contains("Limit") || cls.contains("TakeOrdered") ||
        cls.contains("LocalTableScan") || kids(n).exists(hasBoundBelow)
    }
    def walk(n: SparkPlan): Seq[SparkPlan] = {
      val self = n match {
        case w: WindowExec if w.partitionSpec.isEmpty && !kids(w).exists(hasBoundBelow) => Seq(w)
        case _ => Seq.empty
      }
      self ++ kids(n).flatMap(walk)
    }
    walk(p)
  }

  test("registry: every unpartitioned window is k-bounded or on an allow-listed small frame") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val wins =
        try unpartitionedWindows(fn(spark, sf).queryExecution.sparkPlan)
        catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
      if (wins.nonEmpty && !smallFrameWindowAllowed.contains(name))
        Some(s"$name: ${wins.size} unbounded unpartitioned window(s)")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("curate02: DSIR pass B is join-free with one small-keyed shuffle") {
    // pass A (the 512-bucket weight build) runs eagerly when the query is
    // constructed; the RETURNED plan is pass B — the compiled-weights
    // projection plus the (lang, source) groupBy. At 100 TB that plan
    // must stay scan-shaped: no join of any kind (the weights live in an
    // array literal, not a table) and exactly one exchange, fed by a
    // partial aggregate.
    val p = planOf("curate02_dsir")
    assert(!p.contains("Join"), p)
    assert("Exchange".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_"), p)
  }

  test("decon04: candidate exchanges carry ids only (sim04 rule), eval side broadcasts") {
    val df = SparkEntry.queries("decon04_fuzzy_decontam")(spark, sf)
    val plan = df.queryExecution.sparkPlan
    // every shuffle in the plan must be free of array payloads — the
    // shingle sets and signatures ride only projections and broadcasts
    val offending = plan.collect {
      case ex: ShuffleExchangeExec
          if ex.output.exists(_.dataType.isInstanceOf[
            org.apache.spark.sql.types.ArrayType]) => ex
    }
    assert(offending.isEmpty, offending.mkString("\n"))
    assert(plan.toString.contains("BroadcastHashJoin") ||
      plan.toString.contains("BroadcastNestedLoopJoin"), plan.toString)
  }

  test("pipe03: decontam probes via broadcast semi-join; dedup window is keyed") {
    val p = planOf("pipe03_training_shard_prep")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p) // the contaminated-doc exclusion
    assert(!p.contains("SortMergeJoin"), p) // nothing shuffles corpus-vs-corpus
  }

  test("vocab04: corpus side joins the word segmentation via broadcast") {
    // the seg table is word-sized; the corpus side must never shuffle for
    // the join — broadcast only, then one exchange for the final groupBy.
    val p = planOf("vocab04_wordpiece")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
  }

  test("sim11: probed queries broadcast into a cell equi-join, never a cartesian") {
    // the range search's exact phase must be |admissible cells| work per
    // query: the query×cell probe side broadcasts, candidates arrive by
    // cell_id equi-join, and no plan node is a cross/nested-loop join
    // over the corpus.
    val p = planOf("sim11_range_search")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("pipe05: the served index joins by cell_id; routed queries broadcast") {
    // after the Arrow ship/reload, the serve path must keep sim09's
    // shape: broadcast-routed queries, postings probed by cell equi-join,
    // shortlist re-rank by keyed join — never a corpus cross join.
    val p = planOf("pipe05_index_ship")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the ship grouping must be a DIV shard key, never a fixed modulus:
    // `n_id DIV rowsPerShard` caps every collect_list group at
    // rowsPerShard rows while the group COUNT grows with the corpus, so
    // per-task state is bounded at any scale (a `% k` key packs N/k rows
    // into k fixed buffers — linear per-task state, OOM long before
    // 100 TB). Pin the key shape in the optimized plan.
    assert(p.contains("div"), s"ship group key is not a DIV shard: $p")
    assert(!p.contains("% 4"), s"fixed-modulus ship grouping resurfaced: $p")
  }
}
