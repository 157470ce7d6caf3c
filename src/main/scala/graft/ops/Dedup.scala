package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (SURVEY.md north-star
  * set): exact, char-n-gram Jaccard, MinHash banding (LSH), SimHash, and
  * embedding-cosine near-dup.
  *
  * Scale design: every pairwise stage is preceded by a BLOCKING key (LSH
  * band, simhash prefix, or an explicit block column) so the cross join is
  * per-bucket, never global — the shuffle partitions by block key and AQE
  * splits skewed buckets. Hashes are arithmetic md5-prefix integers
  * ([[TextAnalysis.hash60]]), deterministic and engine-portable (the DuckDB
  * oracles recompute identical signatures).
  */
object Dedup {
  import TextAnalysis.hash60

  /** exact-dedup stats over a normalized-content fingerprint. */
  def exactStats(df: DataFrame, text: Column): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(text).as("fp"))
      .agg(count(lit(1)).as("copies"), min(col("doc_id")).as("canonical_doc"))
      .agg(
        count(lit(1)).as("n_distinct"),
        sum(col("copies")).as("n_docs"),
        sum(col("copies") - 1).as("n_duplicates"),
        max(col("copies")).as("max_copies"))

  /** keep the lowest-doc_id representative of each exact-content group. */
  def exactDedup(df: DataFrame, text: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(TextAnalysis.fingerprint(text))
      .orderBy(col("doc_id"))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** distinct character k-shingles of a text column (empty array when the
    * text is shorter than k — `sequence(1,0)` would count DOWN in Spark).
    */
  def charShingles(c: Column, k: Int): Column =
    when(length(c) >= k,
      array_distinct(transform(
        sequence(lit(1), length(c) - (k - 1)),
        i => c.substr(i, lit(k)))))
      .otherwise(array().cast("array<string>"))

  /** Jaccard similarity of two shingle-set columns (int/int → double). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** MinHash machinery: ONE md5 per shingle reduced mod p, then k cheap
    * linear permutations h_i(x) = (a_i·x + b_i) mod p (the classic scheme).
    * p = 2^31−1 keeps a_i·x < 2^62 — no 64-bit overflow in either engine
    * (DuckDB BIGINT arithmetic is checked). Constants are fixed literals so
    * the DuckDB oracle regenerates identical signatures.
    */
  val MinhashP: Long = 2147483647L
  def minhashA(i: Int): Long = math.floorMod(2654435761L * (i + 1), MinhashP) | 1L
  def minhashB(i: Int): Long = math.floorMod(40503L * (i + 7) + 997L * i * i, MinhashP)

  /** distinct 31-bit shingle hashes of a text column (shared base for
    * jaccard + minhash — integer set ops are far cheaper than string sets).
    */
  def shingleHashes(c: Column, k: Int): Column =
    when(length(c) >= k,
      array_distinct(transform(
        sequence(lit(1), length(c) - (k - 1)),
        i => hash60(c.substr(i, lit(k))) % MinhashP)))
      .otherwise(array().cast("array<bigint>"))

  /** MinHash signature from a shingle-hash array. */
  def minhash(hashes: Column, seeds: Int): Column =
    array((0 until seeds).map { s =>
      array_min(transform(hashes, x => (lit(minhashA(s)) * x + lit(minhashB(s))) % MinhashP))
    }: _*)

  /** LSH band key: concat of the signature slice for one band. */
  def bandKey(sig: Column, band: Int, rowsPerBand: Int): Column =
    concat_ws(",",
      (0 until rowsPerBand).map(r => element_at(sig, band * rowsPerBand + r + 1)): _*)

  /** SimHash over whitespace tokens: per bit b of the token hash, vote ±1;
    * the sign vector packs into a 60-bit integer. Columns only — the
    * aggregation is one groupBy(doc).
    */
  def simhashBits: Int = 60

  /** per-token hashes (distinct tokens, faithful to common simhash usage). */
  def tokenHashes(c: Column): Column =
    transform(array_distinct(TextAnalysis.tokens(c)), t => hash60(t))

  /** simhash from a token-hash array column: ONE pass over the hashes
    * accumulating a 60-slot vote vector (zip_with against a bit-mask array),
    * then one pack step — instead of 60 separate array traversals.
    */
  def simhash(hashes: Column): Column = {
    val masks = array((0 until simhashBits).map(b => lit(1L << b)): _*)
    val votes = aggregate(
      hashes,
      array_repeat(lit(0), simhashBits),
      (acc, h) => zip_with(acc, masks,
        (a, m) => a + when(h.bitwiseAND(m) =!= 0, 1).otherwise(-1)))
    aggregate(
      zip_with(votes, masks, (v, m) => when(v > 0, m).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
  }

  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
