package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end document ETL pipeline — Spark-first re-expression of the
  * reference's single-node flow (reference: backend/etl_pipeline.py:295-319):
  *
  *   docs(doc_id, text)
  *     → extract (E1-E9 generator UDF + explode; per-doc, no shuffle)
  *     → pivot   (dynamic schema union: one tiny key-collect agg + a
  *                metadata-only wide projection — the json_normalize step)
  *     → normalize (T5 two-pass: one wide aggregate decides each column's
  *                branch; one projection applies it — no per-column jobs)
  *     → profile  (Profile.generateSchema: single long-format shuffle)
  *     → registry diff + save, CSV/parquet sinks
  *
  * The whole thing is lazy DataFrame DAG; only the pivot key-set and the
  * branch decisions hit the driver (both are schema-sized, not data-sized).
  * Unlike the reference, the input may hold MANY documents — they are
  * processed as one logical table, partition-parallel.
  */
object DocumentEtl {
  import EtlUdfs._

  /** Read a directory/file of .txt/.md documents as (doc_id, text) rows —
    * source S1. PDF extraction (S2) is pluggable via [[DocTextExtractor]];
    * unsupported extensions raise (S3).
    */
  def readDocuments(spark: SparkSession, path: String,
      extractor: DocTextExtractor = PlainTextExtractor): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.*").load(path)
      .select(col("path"), col("content"))
    val ex = udf((p: String, c: Array[Byte]) => extractor.extract(p, c))
    bin.select(
      xxhash64(col("path")).as("doc_id"),
      ex(col("path"), col("content")).as("text"))
  }

  /** Pipeline output. `schema` and `diff` are LAZY: without a registry the
    * profiling aggregates behind them only run when a caller reads them, so
    * consumers that re-profile the table themselves (or only need the
    * normalized rows) don't pay a schema pass they discard. With a
    * registry, `run` forces both eagerly (the save is a run side effect).
    */
  final case class Result(
      table: DataFrame, // (row_idx, <output cols as JSON cells>)
      columns: Seq[String],
      private val schemaThunk: () => EngineSchema,
      private val diffThunk: () => Option[JVal]) {
    lazy val schema: EngineSchema = schemaThunk()
    lazy val diff: Option[JVal] = diffThunk()
  }

  /** Normalization mode: Faithful reproduces the reference's branch-order
    * quirks (default, golden/oracle target); Sane applies the cleaned-up
    * chain (numbers before booleans, no phone-branch digit-string quirk,
    * nulls stay null) uniformly to every column — SURVEY.md §2.3.
    */
  sealed trait Mode
  case object Faithful extends Mode
  case object Sane extends Mode

  def run(
      spark: SparkSession,
      docs: DataFrame,
      sourceId: String = "default_source",
      registryDir: Option[String] = None,
      now: Long = System.currentTimeMillis() / 1000,
      mode: Mode = Faithful): Result = {

    // extraction is consumed by several downstream jobs (pivot key scan,
    // branch-decision aggregate, the wide table itself) — persist it, and
    // spread single-file inputs across cores first (CPU-bound UDF).
    val recs = extract(
      docs.transform(graft.core.Par.spread))
      .transform(graft.core.Caches.persistLevel(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val (wide, cols) = pivot(spark, recs)
    val norm0 =
      if (mode == Sane)
        wide.select(col("doc_id") +: col("row_idx") +:
          cols.map(c => normalizeCellSane(col(s"`$c`")).as(c)): _*)
      else normalizeData(spark, wide, cols)
    val normalized = flattenLists(norm0, cols)
      .transform(graft.core.Caches.persistLevel(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    registryDir match {
      case Some(dir) =>
        // registry mode is EAGER: the schema must be generated and saved
        // as a side effect of the run (and the diff reads the OLD entry
        // before the save). generateSchema's aggregates materialize
        // `normalized` fully, so the extraction cache has served its last
        // consumer — free it after.
        val schema = Profile.generateSchema(normalized, cols, now)
        recs.unpersist(blocking = false)
        val reg = new SchemaRegistry(dir)
        val diff = reg.load(sourceId)
          .map(old => SchemaDiff.diff(old.toJson, schema.toJson))
        reg.save(sourceId, schema)
        Result(normalized, cols, () => schema, () => diff)
      case None =>
        // no registry: defer the schema aggregates until a caller actually
        // reads `.schema` — consumers that only need the normalized table
        // (e.g. a downstream profile/stats job) skip a full profiling pass.
        // Round 18: no eager normalized.count() either — the first consumer
        // job materializes the cache, and `recs` stays registered in
        // graft.core.Caches (persistLevel above), so the harness releases
        // it at query end; the count existed only to free recs one job
        // early, a whole extra pass over the cache for a few MB of
        // early-released memory.
        Result(normalized, cols,
          () => Profile.generateSchema(normalized, cols, now), () => None)
    }
  }

  /** extract + explode: one row per extracted record, with a global
    * `row_idx` preserving (document, extraction-sequence) order.
    */
  def extract(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(extractBlocks(col("text"))).as(Seq("_p", "rec")))
      .select(
        col("doc_id"),
        // doc_id may be a full-range hash (readDocuments uses xxhash64) —
        // reduce mod Long.MaxValue/1e6 before packing so the multiply can't
        // overflow; small sequential ids are unaffected (pmod = identity).
        (pmod(col("doc_id"), lit(9223372036854L)) * 1000000L + col("rec.seq")).as("row_idx"),
        col("rec.entries").as("entries"))

  /** E10 — the json_normalize pivot: records of ordered (key, cell) entries
    * → wide table. Key set + first-appearance order come from one small
    * aggregate (a schema-sized collect, same as json_normalize's column
    * discovery); the projection itself is pure metadata.
    *
    * Faithfully emulates pandas' dtype coercion: a column whose non-null
    * values are all numeric becomes float64 when it has any float OR any
    * missing/null slot — i.e. ints like `3` read back as `3.0`
    * (`json_normalize` → int64/float64/object inference). This is observable
    * in the reference output, so it's semantics, not an artifact.
    */
  def pivot(spark: SparkSession, recs: DataFrame): (DataFrame, Seq[String]) = {
    val total = recs.count()
    val v = col("e.v")
    val isNullLike = v === "null"
    val isInt = v.rlike("^-?\\d+$")
    val isFloat = v.rlike("^-?(\\d+\\.\\d*|\\.\\d+|\\d+(\\.\\d*)?[eE][+-]?\\d+)$") ||
      v.isin("NaN", "Infinity", "-Infinity")
    // the key table is schema-sized — sort it on the DRIVER instead of
    // paying a single-partition sort exchange before the collect (round 18)
    val keyStats = recs
      .select(col("row_idx"), posexplode(col("entries")).as(Seq("pos", "e")))
      .groupBy(col("e.k").as("k"))
      .agg(
        min(struct(col("row_idx"), col("pos"))).as("first_seen"),
        count(lit(1)).as("cnt"),
        sum(isNullLike.cast("long")).as("n_null"),
        sum(isInt.cast("long")).as("n_int"),
        sum(isFloat.cast("long")).as("n_float"))
      .collect()
      .sortBy { r =>
        val fs = r.getStruct(r.fieldIndex("first_seen"))
        (fs.getLong(0), fs.getInt(1))
      }

    val keys = keyStats.map(_.getAs[String]("k")).toSeq
    val castFloat = keyStats.filter { r =>
      val cnt = r.getAs[Long]("cnt"); val nNull = r.getAs[Long]("n_null")
      val nInt = r.getAs[Long]("n_int"); val nFloat = r.getAs[Long]("n_float")
      val nonNull = cnt - nNull
      val numericOnly = nonNull > 0 && nInt + nFloat == nonNull
      numericOnly && nInt > 0 && (nFloat > 0 || nNull > 0 || cnt < total)
    }.map(_.getAs[String]("k")).toSet

    val m = map_from_entries(col("entries"))
    val wide = recs.select(
      col("doc_id") +: col("row_idx") +: keys.map { k =>
        val cell = element_at(m, k)
        if (castFloat(k))
          when(cell.rlike("^-?\\d+$"), concat(cell, lit(".0"))).otherwise(cell).as(k)
        else cell.as(k)
      }: _*)
    (wide, keys)
  }

  /** T5 — per-column normalization dispatch (reference:
    * backend/etl_pipeline.py:209-226). Two passes:
    * pass 1: ONE wide aggregate computes, per column, the first non-NA
    *   value (in row order) and whether all non-NA values look numeric;
    * pass 2: ONE projection applies the chosen branch per column:
    *   (a) date-like first value → faithful normalize_value chain,
    *   (b) all-numeric-ish      → faithful normalize_value chain,
    *   (c) otherwise            → fillna('') + strip + lowercase.
    */
  def normalizeData(spark: SparkSession, wide: DataFrame, cols: Seq[String]): DataFrame = {
    if (cols.isEmpty) return wide
    val numRe = "^(\\$|₹)?\\d+(\\.\\d+)?%?$"
    // NOTE on `is_numeric_dtype(x)` in the reference's gate
    // (backend/etl_pipeline.py:218): pandas 2.2's Series.map unboxes numpy
    // scalars to Python natives, and is_numeric_dtype(python int/float/bool)
    // is False — so the disjunct never fires on VALUES (verified against the
    // live reference: an int64 column holding -5 takes branch (c) and emits
    // "-5"). It only fires for STRING cells that happen to name a numpy
    // dtype ("int64", "short", ...) — the NumpyDtypeNames clause below.
    // Negative-number and bool-column behavior is pinned by the fuzz corpus.
    // Round 18 (guide §1.2 step 2 — per-task work): the JSON-parsing UDFs
    // (pyStrCell parses+renders, normOutTag parses+runs the whole normalize
    // chain) are evaluated ONCE per (row, column) in an explicit projection
    // feeding the aggregate — the old aggregate expressions referenced `tag`
    // in five sums and `s` twice, re-running the UDF per reference. Same
    // values, same aggregates.
    val projected0 = wide.select(col("row_idx") +:
      cols.zipWithIndex.flatMap { case (c, i) =>
        val cell = col(s"`$c`")
        Seq(pyStrCell(cell).as(s"ps_$i"), normOutTag(cell).as(s"tag_$i"),
          isNa(cell).as(s"na_$i"), isMultiList(cell).as(s"ml_$i"))
      }: _*)
    val aggExprs = cols.indices.flatMap { i =>
      val s = col(s"ps_$i")
      val tag = col(s"tag_$i")
      val na = col(s"na_$i")
      Seq(
        min(when(na, null).otherwise(struct(col("row_idx").as("r"), s.as("v"))))
          .getField("v").as(s"first_$i"),
        every(when(na, null)
          .otherwise(regexp_replace(s, ",", "").rlike(numRe) ||
            s.isInCollection(Normalize.NumpyDtypeNames))).as(s"allnum_$i"),
        // pandas quirk: `pd.notna(list)` raises for lists of length ≥ 2 →
        // branch (c) throws → the whole column is SKIPPED raw (reference:
        // backend/etl_pipeline.py:222-224). Single-element lists stringify
        // normally; flatten later comma-joins the surviving lists.
        max(col(s"ml_$i").cast("int")).as(s"haslist_$i"),
        // post-normalize pandas dtype inference: the mapped column becomes
        // float64 when all outputs are int/float AND there is any float or
        // any None — ints then read back as floats ("99" → 99.0).
        sum((tag === "i").cast("long")).as(s"n_i_$i"),
        sum((tag === "f").cast("long")).as(s"n_f_$i"),
        sum((tag === "b").cast("long")).as(s"n_b_$i"),
        sum((tag === "s").cast("long")).as(s"n_s_$i"),
        sum((tag === "n").cast("long")).as(s"n_n_$i"))
    }
    val row = projected0.agg(aggExprs.head, aggExprs.tail: _*).collect()(0)

    val projected = cols.zipWithIndex.map { case (c, i) =>
      val cell = col(s"`$c`")
      val first = Option(row.getAs[String](s"first_$i"))
      val allNum = Option(row.getAs[java.lang.Boolean](s"allnum_$i")).exists(_.booleanValue)
      val hasMultiList = Option(row.getAs[java.lang.Integer](s"haslist_$i")).exists(_ > 0)
      def l(name: String) = row.getAs[Long](s"${name}_$i")
      val coerceFloat =
        l("n_b") == 0 && l("n_s") == 0 && l("n_i") > 0 && (l("n_f") > 0 || l("n_n") > 0)
      def withCoerce(normalized: Column): Column =
        if (coerceFloat)
          when(normalized.rlike("^-?\\d+$"), concat(normalized, lit(".0"))).otherwise(normalized)
        else normalized
      first match {
        case None => cell.as(c) // no non-null values → column untouched
        case Some(f) if f.length > 8 && f.matches("^\\d{4}-\\d{2}-\\d{2}.*") =>
          withCoerce(normalizeCell(cell)).as(c)
        case _ if allNum => withCoerce(normalizeCell(cell)).as(c)
        case _ if hasMultiList => cell.as(c) // exception path → column skipped
        case _ => stripLowerCell(cell).as(c)
      }
    }
    wide.select(col("doc_id") +: col("row_idx") +: projected: _*)
  }

  /** T2/T3 — flatten: after normalization the only non-scalar cells left are
    * lists in skipped columns; they comma-join (`",".join(map(str, ...))`,
    * reference: backend/etl_pipeline.py:68-69). Everything else is identity.
    */
  def flattenLists(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(col("doc_id") +: col("row_idx") +:
      cols.map(c => flattenCell(col(s"`$c`")).as(c)): _*)

  /** Serving sink — single-CSV parity shim (reference writes one CSV,
    * backend/etl_pipeline.py:311-316). Cells render pandas-style (None →
    * empty, True/False, python float repr). The scalable sink is
    * [[writeParquet]]; coalesce(1) is only for serving parity.
    */
  def writeCsv(result: Result, outDir: String): Unit = {
    val rendered = result.table
      .orderBy(col("row_idx"))
      .select(result.columns.map(c => renderCell(col(s"`$c`")).as(c)): _*)
    rendered.coalesce(1).write.mode("overwrite")
      .option("header", "true").option("emptyValue", "").option("nullValue", "")
      .csv(outDir)
  }

  /** Scalable sink: multi-part parquet, cells as JSON strings. */
  def writeParquet(result: Result, outDir: String): Unit =
    result.table.write.mode("overwrite").parquet(outDir)
}

/** S2 plug point — PDF/text extraction per (path, bytes). Plain text and
  * markdown read as UTF-8; PDFs extract through [[PdfText]] (a hand-rolled
  * uncompressed/FlateDecode text-operator walker — the PyPDF2-class path the
  * reference falls back to, backend/etl_pipeline.py:38-45); other extensions
  * raise (S3). Swap the trait implementation to plug a full-fidelity PDF
  * library in deployments that have one.
  */
trait DocTextExtractor extends Serializable {
  def extract(path: String, content: Array[Byte]): String
}

object PlainTextExtractor extends DocTextExtractor {
  def extract(path: String, content: Array[Byte]): String = {
    val lower = path.toLowerCase(java.util.Locale.ROOT)
    if (lower.endsWith(".txt") || lower.endsWith(".md"))
      new String(content, java.nio.charset.StandardCharsets.UTF_8)
    else if (lower.endsWith(".pdf"))
      PdfText.extract(content)
    else if (lower.endsWith(".docx"))
      DocxText.extract(content)
    else if (lower.endsWith(".epub"))
      EpubText.extract(content).text
    else if (lower.endsWith(".xlsx"))
      XlsxText.extract(content)
    else if (lower.endsWith(".pptx"))
      PptxText.extract(content)
    else if (lower.endsWith(".odt"))
      OdtText.extract(content)
    else if (lower.endsWith(".rtf"))
      RtfText.extract(content)
    else if (lower.endsWith(".eml"))
      graft.ops.Mail.parse(content).textBody
    else
      throw new IllegalArgumentException(s"Unsupported file type: $path")
  }
}
