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

  test("connected components handles a 1M-edge graph in bounded rounds") {
    import spark.implicits._
    // 100k nodes in 10k rings of 10 (diameter 5) plus random chords —
    // orders of magnitude beyond any LSH candidate set at this SF
    val edges = spark.range(1000000L).select(
      (col("id") % 100000L).as("a"),
      when(col("id") < 100000L, // ring edges: i -> (i+1 within its ring of 10)
        (col("id") - (col("id") % 10L)) + ((col("id") + 1L) % 10L))
        .otherwise(pmod(hash(col("id")).cast("long"), lit(100000L))).as("b"))
      .filter(col("a") =!= col("b"))
    val t0 = System.nanoTime()
    val comps = graft.ops.DedupGraph.connectedComponents(edges.toDF())
    val parts = comps.select(col("component")).distinct().count()
    val nodes = comps.count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(nodes == 100000L, s"nodes $nodes")
    assert(parts >= 1L && parts < 100000L, s"components $parts")
    assert(secs < 120, s"CC took $secs s for 1M edges")
    info(f"1M edges, $nodes nodes → $parts components in $secs%.1f s")
  }

  test("capped Jaccard keeps pair fan-out linear on a hot block") {
    import graft.ops.Dedup
    // one hot (lang, source) block of 400 near-identical docs (all-pairs
    // would be 79,800 candidates) + a small 10-doc block under the cap.
    val hot = spark.range(400L).select(
      col("id").as("doc_id"), lit("en").as("lang"), lit("web").as("source"),
      concat(lit("the same boilerplate text repeated in every document "),
        (col("id") % 3).cast("string")).as("text"))
    val small = spark.range(10L).select(
      (col("id") + 1000L).as("doc_id"), lit("fr").as("lang"), lit("web").as("source"),
      concat(lit("petit bloc distinct document numero "), col("id").cast("string")).as("text"))
    val docs = hot.unionByName(small)
      .select(col("doc_id"), col("lang"), col("source"),
        Dedup.shingleHashes(col("text"), 3).as("sh"))

    // minJac=0 exposes ALL candidate pairs the operator generated.
    val pairs = Dedup.jaccardPairsBlocked(docs, Seq("lang", "source"),
      0.0, 50, 16, 2, 8).collect()
    val hotPairs = pairs.count(p => p.getAs[Long]("doc_a") < 1000L)
    val smallPairs = pairs.count(p => p.getAs[Long]("doc_a") >= 1000L)
    // hot block: star edges per LSH bucket — ≤ bands × n, NOT n²/2
    assert(hotPairs > 0 && hotPairs <= 2 * 400, s"hot-block candidates $hotPairs")
    // under-cap block: exact all-pairs (10 choose 2)
    assert(smallPairs == 45, s"small-block candidates $smallPairs")
    // scores are exact Jaccard on both paths: identical-text pairs hit 1.0
    val exactOnes = pairs.filter(p => p.getAs[Double]("jac") == 1.0)
    assert(exactOnes.nonEmpty)
    info(s"hot block emitted $hotPairs candidates (all-pairs would be 79800)")
  }

  test("capped fuzzy matching keeps pair fan-out bounded on a hot block") {
    import graft.ops.Dedup
    // one hot (lang, source) block of 300 docs drawn from 3 near-identical
    // prefix families (all-pairs would be 44,850 comparisons) + a small
    // 10-doc block under the cap.
    val hot = spark.range(300L).select(
      col("id").as("doc_id"), lit("en").as("lang"), lit("web").as("source"),
      concat(lit("family"), (col("id") % 3).cast("string"),
        lit(" boilerplate header text "), col("id").cast("string")).as("pre"))
    val small = spark.range(10L).select(
      (col("id") + 1000L).as("doc_id"), lit("fr").as("lang"), lit("web").as("source"),
      concat(lit("petit bloc "), col("id").cast("string")).as("pre"))
    val docs = hot.unionByName(small)

    val capped = Dedup.fuzzyPairsBlocked(docs, Seq("lang", "source"), "pre",
      maxDist = 40, threshold = 50, refineLen = 8).collect()
    val hotPairs = capped.count(p => p.getAs[Long]("doc_a") < 1000L)
    val smallPairs = capped.count(p => p.getAs[Long]("doc_a") >= 1000L)
    // hot block: pairs only within same refined-prefix families — 3 groups
    // of 100 → 3 × C(100,2) = 14,850, strictly under the 44,850 all-pairs
    assert(hotPairs == 3 * 100 * 99 / 2, s"hot-block pairs $hotPairs")
    // under-cap block: exact all-pairs (10 choose 2)
    assert(smallPairs == 45, s"small-block pairs $smallPairs")

    // under the cap the operator IS the plain blocked self-join: same rows
    val plain = Dedup.fuzzyPairsBlocked(docs, Seq("lang", "source"), "pre",
      maxDist = 40, threshold = 5000, refineLen = 8).collect()
    assert(plain.length == 44850 + 45, s"uncapped pairs ${plain.length}")
  }

  test("capped semantic dedup keeps pair fan-out linear on a hot cluster") {
    import graft.ops.{Clustering, Similarity}
    val dim = 8
    // hot cluster 0: 500 near-identical vectors (all-pairs would be
    // 124,750) — over the cap, so they route through SRP star edges.
    // identical vectors share every band key, so each band is ONE star
    // around the min id and everyone else is dropped.
    val base = Array(3.0, -1.0, 2.0, 5.0, -2.0, 1.0, 4.0, -3.0)
    val hot = spark.range(500L).select(
      col("id").as("vec_id"), lit(0).as("cid"),
      array(base.zipWithIndex.map { case (x, i) =>
        lit(x) + when(lit(i) === 0, col("id").cast("double") * 1e-9).otherwise(lit(0.0))
      }: _*).as("v"))
    // small cluster 1: one-hot basis vectors (pairwise cos = 0) plus ONE
    // duplicate of the first — under the cap, exact all-pairs, 1 drop.
    val small = spark.range(9L).select(
      (col("id") + 1000L).as("vec_id"), lit(1).as("cid"),
      array((0 until dim).map(i =>
        when(pmod(col("id"), lit(8L)) === i, lit(1.0)).otherwise(lit(0.0))): _*).as("v"))
    val assigned = hot.unionByName(small)
      .withColumn("n", Similarity.norm(col("v")))

    val t0 = System.nanoTime()
    val drops = Clustering.semanticDrops(assigned, dim, 0.35, threshold = 100)
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    val hotDrops = drops.count(_.getAs[Long]("vec_id") < 1000L)
    val smallDrops = drops.count(_.getAs[Long]("vec_id") >= 1000L)
    // hot cluster: every non-hub member of the (single) bucket star drops
    assert(hotDrops == 499, s"hot-cluster drops $hotDrops")
    // small cluster: exact all-pairs finds exactly the duplicated basis
    // vector (id 1008 duplicates id 1000; orthogonal pairs are cos 0)
    assert(smallDrops == 1, s"small-cluster drops $smallDrops")
    assert(secs < 60, s"capped semantic dedup took $secs s")
    info(f"hot cluster dropped $hotDrops via star edges in $secs%.1f s")
  }

  test("KMV sketch estimates 5M-row distinct count in O(k) driver state") {
    // 5M rows, 1M distinct keys: the bottom-k path must stay a per-partition
    // top-k merge (no global sort, no driver blowup) and land within the
    // ~1/sqrt(k) error envelope.
    val k = 1024
    val rows = spark.range(5000000L)
      .select(pmod(hash(col("id")), lit(1000000)).cast("string").as("key"))
    val t0 = System.nanoTime()
    val bottom = rows
      .select(graft.ops.TextAnalysis.hash60(col("key")).as("h"))
      .distinct().orderBy(col("h").asc).limit(k)
    val agg = bottom.agg(count(lit(1)).as("k"), max(col("h")).as("kth")).head()
    val estimate = (k - 1).toDouble * graft.ops.Sketches.HashSpace /
      agg.getAs[Long]("kth").toDouble
    val secs = (System.nanoTime() - t0) / 1e9
    val trueDistinct = 1000000.0 * (1 - math.exp(-5.0)) // coupon-ish: ~993k hit
    assert(math.abs(estimate - trueDistinct) / trueDistinct < 0.15,
      s"est=$estimate true≈$trueDistinct")
    assert(secs < 60, s"KMV took $secs s for 5M rows")
    info(f"5M rows → distinct estimate ${estimate}%.0f in $secs%.1f s")
  }

  test("capped ordered LSH banding keeps pair fan-out linear on a collapsed bucket") {
    import graft.ops.Dedup
    // the dedup03/dedup12 candidate path: 500 identical signatures collapse
    // into ONE bucket per band (boilerplate corpus) — plain banding would
    // emit 500·499/2 = 124 750 ordered pairs; the cap degrades each bucket
    // to star edges around the min-id hub. A second cold bucket of 10 ids
    // must still pair all-vs-all (exact path unchanged under the cap).
    val hotB = spark.range(500L).select(col("id"))
      .crossJoin(spark.range(2L).select(col("id").cast("int").as("band")))
      .withColumn("key", lit("collapsed"))
      .select(col("id").as("doc_id"), col("band"), col("key"))
    val coldB = spark.range(10L).select((col("id") + 10000L).as("doc_id"))
      .crossJoin(spark.range(2L).select(col("id").cast("int").as("band")))
      .withColumn("key", concat(lit("k"), (col("doc_id") % 5).cast("string")))
      .select(col("doc_id"), col("band"), col("key"))
    val banded = hotB.unionByName(coldB)

    val capped = Dedup.bandedPairsCappedOrdered(banded, "doc_id", cap = 100)
      .collect()
    val hotPairs = capped.count(p => p.getAs[Long]("doc_a") < 10000L)
    val coldPairs = capped.count(p => p.getAs[Long]("doc_a") >= 10000L)
    // hot bucket: hub 0 → each of the 499 members (already ordered), NOT n²/2
    assert(hotPairs == 499, s"hot-bucket ordered pairs $hotPairs")
    // cold buckets: 5 keys × C(2,2 members)=1 pair each, distinct over bands
    assert(coldPairs == 5, s"cold-bucket pairs $coldPairs")
    // every emitted pair keeps the doc_a < doc_b contract on both paths
    assert(capped.forall(p => p.getAs[Long]("doc_a") < p.getAs[Long]("doc_b")))

    // under the cap the operator IS the plain ordered band self-join
    val plain = Dedup.bandedPairsCappedOrdered(banded, "doc_id", cap = 1000000)
    assert(plain.count() == 124750L + 5L, s"uncapped ${plain.count()}")
  }

  test("capped kNN-graph banding keeps pair fan-out linear on a collapsed bucket") {
    import org.apache.spark.sql.functions._
    // 500 identical-signature vectors: every id lands in ONE bucket per
    // band (the near-duplicate-embedding corpus). All-pairs would emit
    // 500·499 = 249 500 directed candidates per band; the cap degrades the
    // bucket to symmetric star edges around the hub.
    val banded = spark.range(500L).select(col("id"))
      .crossJoin(spark.range(2L).select(col("id").as("band")))
      .withColumn("key", lit(0))
      .select(col("id"), col("band").cast("int").as("band"), col("key"))
    val capped = graft.ops.Similarity.bandedPairsCapped(banded, cap = 100)
    // hub 0 ↔ each of 499 members, both orientations
    assert(capped.count() == 998L, s"capped pair count ${capped.count()}")
    // sanity: the uncapped path on the same input IS quadratic
    val uncapped = graft.ops.Similarity.bandedPairsCapped(banded, cap = 1000000)
    assert(uncapped.count() == 249500L, s"uncapped ${uncapped.count()}")
  }

  test("substring-dedup hot set stays window-sized on a fully duplicated corpus") {
    import org.apache.spark.sql.functions._
    // 2000 IDENTICAL 64-token docs: every window occurs in every doc, the
    // worst case for overlapping-window dedup (dedup15's stages, inline).
    // The hot table must stay WINDOW-count-sized (57 rows, never
    // docs x windows or pairs), the join back linear, and the per-doc
    // span merge collapses the 57 overlapping hits into ONE island.
    val txt = (0 until 64).map(i => s"tok$i").mkString(" ")
    val docs = spark.range(2000L).select(
      col("id").as("doc_id"), lit("en").as("lang"), lit(txt).as("text"))
    val w = 8
    val toks = graft.ops.TextAnalysis.tokens(col("text"))
    val idx = when(size(toks) >= w, sequence(lit(0), size(toks) - w))
      .otherwise(array().cast("array<int>"))
    val wins = docs.select(col("doc_id"),
      explode(transform(idx, j => struct(j.as("j"),
        graft.ops.TextAnalysis.hash60(
          array_join(slice(toks, j + 1, lit(w)), " ")).as("wh")))).as("x"))
      .select(col("doc_id"), col("x.j").as("j"), col("x.wh").as("wh"))
    // candidate rows linear in docs x windows-per-doc, never pairs
    assert(wins.count() == 2000L * 57)
    val hot = wins.groupBy(col("wh"))
      .agg(countDistinct(col("doc_id")).as("df"), min(col("doc_id")).as("keeper"))
      .filter(col("df") >= 2)
    assert(hot.count() == 57L) // 64 - 8 + 1 distinct windows, doc-count-free
    // span merge: every non-keeper doc collapses to one full-doc island
    val spans = wins.join(hot, Seq("wh")).filter(col("keeper") =!= col("doc_id"))
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(min(col("j")).as("a"), max(col("j") + w - 1).as("b"), count(lit(1)).as("n"))
    assert(perDoc.count() == 1999L)
    assert(perDoc.filter(col("a") === 0 && col("b") === 63 && col("n") === 57).count() == 1999L)
  }

  test("jaccardPairsBlocked refuses content-derived block keys instead of collecting them") {
    import graft.ops.Dedup
    // a content-derived block column (per-doc hash) explodes the block-key
    // cardinality past MaxBlockKeys: the guarded collect must throw the
    // typed contract error, not ship a corpus-sized count table to the
    // driver. Cheap to build: block cardinality == row count > 2^18.
    val docs = spark.range((1L << 18) + 64L).select(
      col("id").as("doc_id"),
      hash(col("id")).cast("string").as("blk"), // content-derived key
      array(col("id")).cast("array<long>").as("sh"))
    val e = intercept[IllegalArgumentException] {
      Dedup.jaccardPairsBlocked(docs, Seq("blk"), 0.5, 50, 16, 2, 8).count()
    }
    assert(e.getMessage.contains("schema-bounded"), e.getMessage)
    // and the healthy shape still runs: a schema-bounded key on the same rows
    val ok = docs.withColumn("blk", (col("doc_id") % 4).cast("string"))
    assert(Dedup.jaccardPairsBlocked(ok.limit(200), Seq("blk"), 0.0, 50, 16, 2, 8)
      .count() >= 0L)
  }
}
