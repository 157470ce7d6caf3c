package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-input hardening for the scale operators: empty inputs must
  * produce empty/identity results, never throw — at 100 TB a filtered
  * partition, an empty dim, or a dry LSH round is routine, not exceptional.
  */
class EmptyInputSpec extends SparkSpec {

  test("connected components of an empty edge list is empty") {
    import spark.implicits._
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(DedupGraph.connectedComponents(edges).count() == 0L)
  }

  test("KMV aggregator over zero rows reports zero distinct") {
    import spark.implicits._
    val est = Seq.empty[String].toDF("k")
      .agg(KmvAggregator.kmvDistinct(col("k")).as("e"))
      .collect().head.getAs[Long]("e")
    assert(est == 0L)
  }

  test("bloom built from an empty dim rejects every probe (no bitmap rows)") {
    import spark.implicits._
    val words = Seq.empty[(Long, Long)].toDF("word", "bits")
    val bloom = words.agg(
      map_from_entries(collect_list(struct(col("word"), col("bits")))).as("bm"))
    val probes = Seq(1L, 2L, 3L).toDF("h")
      .crossJoin(bloom)
      .withColumn("pass",
        (coalesce(element_at(col("bm"), shiftright(col("h"), 5)), lit(0L))
          .bitwiseAND(lit(1L))) =!= lit(0L))
    val rows = probes.collect()
    assert(rows.length == 3 && rows.forall(!_.getAs[Boolean]("pass")))
  }

  test("SRP signature of the zero vector is all ones (>= 0 convention)") {
    import spark.implicits._
    val w = Sketches.srpWeights(4, 4)
    val sig = Seq(Array(0.0, 0.0, 0.0, 0.0)).toDF("v")
      .select(Sketches.srpSignature(col("v"), w).as("s"))
      .collect().head.getInt(0)
    assert(sig == 15) // every dot is exactly 0 → bit set by the >= 0 rule
  }

  test("fuzzy blocked pairs over an empty frame is empty, both cap paths") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "pre")
    assert(Dedup.fuzzyPairsBlocked(empty, Seq("lang"), "pre", 30, 10, 8).count() == 0L)
  }

  test("funnel stages over an empty stream-batch emits nothing") {
    import spark.implicits._
    import graft.streaming.EventStreams
    val empty = Seq.empty[EventStreams.UserEvent].toDS()
    assert(EventStreams.funnelStages(empty).count() == 0L)
  }

  test("passage chunking of short documents yields no passages, no error") {
    import spark.implicits._
    // under 8 tokens: the sequence() guard must produce an empty array, not
    // Spark's descending sequence(0, -1)
    val docs = Seq((1L, "only three words"), (2L, "")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("documents_short")
    val toks = split(trim(col("text")), "\\s+")
    val nChunks = (size(col("toks")) / 8).cast("int")
    val idx = when(nChunks >= 1, sequence(lit(0), nChunks - 1))
      .otherwise(array().cast("array<int>"))
    val out = docs.select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        explode(transform(idx, i => array_join(slice(col("toks"), i * 8 + 1, lit(8)), " "))).as("p"))
    assert(out.count() == 0L)
  }

  test("substring-dedup window generation is empty below the window width") {
    import spark.implicits._
    // docs shorter than w=8 tokens must emit ZERO overlapping windows
    // (Spark's sequence(0, negative) would count DOWN without the guard)
    val docs = Seq((1L, "en", "seven tokens only in this short doc"),
      (2L, "en", ""), (3L, "en", "one")).toDF("doc_id", "lang", "text")
    val toks = TextAnalysis.tokens(col("text"))
    val idx = when(size(toks) >= 8, sequence(lit(0), size(toks) - 8))
      .otherwise(array().cast("array<int>"))
    val wins = docs.select(col("doc_id"),
      explode(transform(idx, j =>
        TextAnalysis.hash60(array_join(slice(toks, j + 1, lit(8)), " ")))).as("wh"))
    assert(wins.count() == 0L)
  }

  test("boilerplate chunking and chunk frequency are empty on an empty corpus") {
    import spark.implicits._
    val docs = Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text")
    assert(Dedup.boilerplateChunks(docs, 8).count() == 0L)
    val freq = docs
      .transform(d => Dedup.boilerplateChunks(d, 8))
      .dropDuplicates("ch", "doc_id")
      .groupBy(col("ch"))
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("keeper"))
    assert(freq.count() == 0L)
  }

  test("label propagation over an empty edge list is empty") {
    import spark.implicits._
    val e = Seq.empty[(Long, Long)].toDF("u", "v")
    val bi = e.select(col("u").as("n"), col("v").as("m"))
      .unionAll(e.select(col("v").as("n"), col("u").as("m")))
    val labels = bi.select(col("n").as("node")).distinct()
      .withColumn("lbl", col("node"))
    assert(labels.count() == 0L)
  }

  test("media decode/resize/scan over an empty blob set yields empty results") {
    import spark.implicits._
    val blobs = spark.createDataset(Seq.empty[Multimodal.Blob])
    assert(Multimodal.decode(blobs, BinaryMediaDecoder).count() == 0L)
    assert(Multimodal.resize(blobs, 8, 8, BinaryMediaDecoder).count() == 0L)
    assert(Multimodal.sampleFrames(blobs, 4, BinaryMediaDecoder).count() == 0L)
    val scan = graft.streaming.CorpusStreams.mediaScan(
      blobs.toDF().select(col("blob_id"), col("content"), col("mime")))
    assert(scan.count() == 0L)
  }
}
