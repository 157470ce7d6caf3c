package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming counterparts of the corpus-curation operators — the
  * production ingest shape, where documents arrive continuously and the
  * curation state must stay incremental instead of re-scanning the corpus.
  */
object CorpusStreams {

  /** Incremental chunk-frequency table for dedup14's global boilerplate
    * scrub: as documents stream in, maintain per-chunk
    * `(ch, df, keeper)` where `df` counts DISTINCT documents containing
    * the chunk and `keeper` is the lowest doc_id seen — exactly the batch
    * `hot` table before its `df >= 2` filter, emitted in update mode.
    *
    * Shape: [[Dedup.boilerplateChunks]] (the batch-shared projection) →
    * `dropDuplicates(ch, doc_id)` (streaming distinct state: one record
    * per pair, what makes `count` equal `countDistinct(doc_id)`) →
    * keyed agg of two longs per chunk. At production scale the pair-dedup
    * store takes a watermark + TTL (boilerplate recurs promptly; a chunk
    * unseen for the TTL window re-counts at worst once), and the df>=2
    * emissions feed the scrub join downstream. Here both stay unbounded
    * for exact parity with the batch table ([[graft.streaming
    * .StreamingBoilerplateSpec]] feeds the corpus in micro-batches and
    * compares final state row-for-row).
    */
  def chunkFrequency(docs: DataFrame, w: Int = 8): DataFrame =
    Dedup.boilerplateChunks(docs, w)
      .dropDuplicates("ch", "doc_id")
      .groupBy(col("ch"))
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("keeper"))

  /** Live mixture monitor — the streaming half of mix01's mass table:
    * per-(lang, source) document and character counts with the
    * sqrt-temperature weight, maintained incrementally as documents
    * arrive. A plain keyed streaming aggregate (two longs of state per
    * group, group count is mixture-sized at any corpus scale), emitted
    * in update mode; the mix01-04 planners read the latest emission per
    * group instead of re-scanning the corpus. Exact parity with the
    * batch groupBy is pinned by [[graft.streaming.StreamingMixtureSpec]].
    */
  def mixtureMass(docs: DataFrame): DataFrame =
    docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"))
      .withColumn("sm", round(sqrt(col("chars")) * 1000000.0).cast("long"))

  /** Streaming media-ingest scan — the decode-on-arrival shape of a
    * multimodal corpus feed: every arriving blob runs through the REAL
    * codec ([[graft.ops.BinaryMediaDecoder]], opened once per partition —
    * the same batch-shape contract as [[graft.ops.Multimodal.decode]])
    * and a keyed aggregate maintains per-mime shape totals (blob count,
    * summed width/height/frames, payload bytes). Decode is a stateless
    * per-row map, so the only streaming state is one row of five longs
    * per mime — bounded by the format vocabulary at any corpus scale.
    * Update-mode emissions feed ingest dashboards / admission checks;
    * exact parity with the batch groupBy is pinned by
    * [[graft.streaming.StreamingMediaSpec]].
    *
    * Expects columns (blob_id long, content binary, mime string).
    */
  def mediaScan(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    val decoded = blobs
      .select(col("blob_id").cast("long"), col("content").cast("binary"), col("mime"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        val dec = graft.ops.BinaryMediaDecoder.open()
        it.map { case (id, content, mime) =>
          val d = dec.decode(graft.ops.Multimodal.Blob(id, content, mime, Map.empty))
          (d.mime, d.width.toLong, d.height.toLong, d.n_frames.toLong,
            content.length.toLong)
        }
      }.toDF("mime", "w", "h", "frames", "bytes")
    decoded.groupBy(col("mime"))
      .agg(count(lit(1)).as("n_blobs"), sum(col("w")).as("sum_w"),
        sum(col("h")).as("sum_h"), sum(col("frames")).as("sum_frames"),
        sum(col("bytes")).as("sum_bytes"))
  }

  /** Fault-TOLERANT streaming media scan (round 9) — the
    * [[graft.ops.Multimodal.decodeSafe]] twin of [[mediaScan]]: a
    * refused or corrupt blob becomes a typed error ROW instead of a
    * failed micro-batch (one bad crawl blob must never kill the ingest
    * query — at 100 TB the stream always carries debris), and the keyed
    * aggregate tracks per-(mime, kind) totals with kind ∈ ok /
    * unsupported / truncated / not_media / malformed. State stays
    * bounded by |mime vocabulary| × 5 kinds at any corpus scale, and
    * the error-kind counts are themselves the ingest-health signal an
    * admission dashboard watches. Parity with the batch
    * decodeSafe-groupBy is pinned by [[graft.streaming
    * .StreamingMediaSpec]], including a poisoned corpus.
    */
  def mediaScanSafe(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    val decoded = blobs
      .select(col("blob_id").cast("long"), col("content").cast("binary"), col("mime"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        val dec = graft.ops.BinaryMediaDecoder.open()
        it.map { case (id, content, mime) =>
          try {
            val d = dec.decode(graft.ops.Multimodal.Blob(id, content, mime, Map.empty))
            (d.mime, "ok", d.width.toLong, content.length.toLong)
          } catch {
            case e: Exception =>
              (mime, graft.ops.Multimodal.errKind(e.getMessage), 0L,
                content.length.toLong)
          }
        }
      }.toDF("mime", "kind", "w", "bytes")
    decoded.groupBy(col("mime"), col("kind"))
      .agg(count(lit(1)).as("n_blobs"), sum(col("w")).as("sum_w"),
        sum(col("bytes")).as("sum_bytes"))
  }

  /** Streaming WARC ingest — crawl files land continuously (the file-drop
    * shape of a live fetch fleet) and each is parsed on arrival through
    * the fail-stop [[graft.ops.Warc.readSafe]] reader: healthy files
    * yield one row per HTTP response record, a rotten file yields ONE
    * typed error row (`outcome` = the stable refusal vocabulary) instead
    * of a failed micro-batch. The keyed aggregate tracks per-(outcome,
    * status) record counts and body bytes — state is bounded by the
    * refusal-kind × status-code vocabulary at any corpus scale, and the
    * error-kind counts are the fetch-health signal. Parsing is a
    * stateless per-file flatMap, so the operator inherits mediaScan's
    * scaling story. Batch parity (incl. a poisoned corpus) is pinned by
    * [[graft.streaming.WarcStreamSpec]].
    *
    * Expects columns (file string, content binary).
    */
  def warcScan(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    val recs = files
      .select(col("file"), col("content").cast("binary"))
      .as[(String, Array[Byte])]
      .flatMap { case (_, bytes) =>
        graft.ops.Warc.readSafe(bytes) match {
          case Right(rs) => rs.collect {
            // per-record safe HTTP parse (round-12 fix): a malformed HTTP
            // payload inside a valid WARC yields a typed outcome row for
            // that record instead of failing the micro-batch
            case r if r.warcType == "response" =>
              graft.ops.Warc.parseHttpResponseSafe(r.body) match {
                case Right(h) => ("ok", h.status, h.body.length.toLong)
                case Left(kind) => (kind, 0, 0L)
              }
          }
          case Left(kind) => Seq((kind, 0, 0L))
        }
      }.toDF("outcome", "status", "body_bytes")
    recs.groupBy(col("outcome"), col("status"))
      .agg(count(lit(1)).as("n"), sum(col("body_bytes")).as("sum_bytes"))
  }

  /** Streaming Avro shard ingest — record shards land continuously and
    * each decodes on arrival through the fail-stop
    * [[graft.ops.Avro.readSafe]] reader: healthy shards yield one row per
    * record, a rotten shard yields ONE typed error row (`outcome` = the
    * container family's refusal vocabulary) instead of a failed
    * micro-batch. The keyed aggregate tracks per-(outcome, lang) record
    * counts and text bytes — state bounded by refusal-kinds × languages
    * at any corpus scale. Parsing is a stateless per-file flatMap
    * (warcScan's scaling story on the Avro layer). Expects shards whose
    * schema leads with (id long, lang string, text string); anything
    * else refuses as `bad_schema` — a typed row, not a crash.
    *
    * Expects columns (file string, content binary).
    */
  def avroScan(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    val recs = files
      .select(col("file"), col("content").cast("binary"))
      .as[(String, Array[Byte])]
      .flatMap { case (_, bytes) =>
        graft.ops.Avro.readSafe(bytes) match {
          case Right((schema, rs))
              if schema.fields.take(3).map(_._2) ==
                Vector("long", "string", "string") =>
            rs.map { r =>
              ("ok", r.values(1).asInstanceOf[String],
                r.values(2).asInstanceOf[String].length.toLong)
            }
          case Right(_) => Seq(("bad_schema", "", 0L))
          case Left(kind) => Seq((kind, "", 0L))
        }
      }.toDF("outcome", "lang", "text_bytes")
    recs.groupBy(col("outcome"), col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("text_bytes")).as("sum_bytes"))
  }

  /** Streaming TFRecord shard ingest — the [[avroScan]] contract on the
    * TFRecord layer: healthy shards yield one row per record (ordinal +
    * payload size), a rotten shard yields ONE typed error row from the
    * codec's refusal vocabulary (both CRC kinds, truncation, budget).
    * State is bounded by the refusal vocabulary; parsing is a stateless
    * per-file flatMap. Expects columns (file string, content binary).
    */
  def tfRecordScan(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    val recs = files
      .select(col("file"), col("content").cast("binary"))
      .as[(String, Array[Byte])]
      .flatMap { case (_, bytes) =>
        graft.ops.TfRecord.readSafe(bytes) match {
          case Right(rs) => rs.map(p => ("ok", p.length.toLong))
          case Left(kind) => Seq((kind, 0L))
        }
      }.toDF("outcome", "payload_bytes")
    recs.groupBy(col("outcome"))
      .agg(count(lit(1)).as("n"), sum(col("payload_bytes")).as("sum_bytes"))
  }

  /** Streaming MessagePack shard ingest — the [[avroScan]]/[[arrowScan]]
    * contract on the msgpack layer: healthy shards yield one row per
    * record (expects {lang, text, ...} string fields; anything else is a
    * per-record `bad_schema` row), a rotten shard yields ONE typed error
    * row from the codec's refusal vocabulary. State bounded by
    * refusal-kinds × languages; parsing is a stateless per-file flatMap.
    * Expects columns (file string, content binary).
    */
  def msgpackScan(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    import graft.etl.{JObj, JStr}
    val recs = files
      .select(col("file"), col("content").cast("binary"))
      .as[(String, Array[Byte])]
      .flatMap { case (_, bytes) =>
        graft.ops.Msgpack.decodeAllSafe(bytes) match {
          case Right(vs) => vs.map {
            case JObj(fields) =>
              val m = fields.toMap
              (m.get("lang"), m.get("text")) match {
                case (Some(JStr(l)), Some(JStr(t))) => ("ok", l, t.length.toLong)
                case _                              => ("bad_schema", "", 0L)
              }
            case _ => ("bad_schema", "", 0L)
          }
          case Left(kind) => Seq((kind, "", 0L))
        }
      }.toDF("outcome", "lang", "text_bytes")
    recs.groupBy(col("outcome"), col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("text_bytes")).as("sum_bytes"))
  }

  /** Streaming Arrow IPC shard ingest — the [[avroScan]] contract on the
    * Arrow layer: healthy streams yield one row per record across all
    * record batches, a rotten stream yields ONE typed error row from
    * [[graft.ops.ArrowIpc.readSafe]]'s refusal vocabulary (bad_stream /
    * truncated / too_large / unsupported_*) instead of a failed
    * micro-batch. Expects streams whose schema leads with (id int64,
    * lang utf8, text utf8); anything else refuses as `bad_schema`.
    * State is bounded by refusal-kinds × languages; parsing is a
    * stateless per-file flatMap. Expects columns (file string, content
    * binary).
    */
  def arrowScan(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    import graft.ops.ArrowIpc
    val recs = files
      .select(col("file"), col("content").cast("binary"))
      .as[(String, Array[Byte])]
      .flatMap { case (_, bytes) =>
        ArrowIpc.readSafe(bytes) match {
          case Right(bs) =>
            val shaped = bs.forall { b =>
              b.cols.length >= 3 && b.cols.head.isInstanceOf[ArrowIpc.ALongCol] &&
                b.cols(1).isInstanceOf[ArrowIpc.AStrCol] &&
                b.cols(2).isInstanceOf[ArrowIpc.AStrCol]
            }
            if (!shaped) Seq(("bad_schema", "", 0L))
            else bs.iterator.flatMap { b =>
              val lang = b.cols(1).asInstanceOf[ArrowIpc.AStrCol].v
              val text = b.cols(2).asInstanceOf[ArrowIpc.AStrCol].v
              (0 until b.nRows).iterator.map(i =>
                ("ok", lang(i), text(i).length.toLong))
            }.toSeq
          case Left(kind) => Seq((kind, "", 0L))
        }
      }.toDF("outcome", "lang", "text_bytes")
    recs.groupBy(col("outcome"), col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("text_bytes")).as("sum_bytes"))
  }

  /** Streaming FLAC clip ingest — the codec-twin contract on the audio
    * layer (round 13): healthy clips decode to true PCM through
    * [[graft.ops.FlacAudio.decodeSafe]] (fixed/LPC predictors, Rice
    * residuals, stereo decorrelation, CRC-8/16 + MD5 verified) and yield
    * one feature row; a rotten clip yields ONE typed error row from the
    * refusal vocabulary (bad_frame / crc_mismatch / bad_md5 / truncated /
    * …) instead of a failed micro-batch. State bounded by refusal-kinds ×
    * sample-rates; decode is a stateless per-file map. Expects columns
    * (file string, content binary).
    */
  def flacScan(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    val recs = files
      .select(col("file"), col("content").cast("binary"))
      .as[(String, Array[Byte])]
      .map { case (_, bytes) =>
        graft.ops.FlacAudio.decodeSafe(bytes) match {
          case Right((meta, pcm)) =>
            var ns = 0L; var sumAbs = 0L
            pcm.foreach { ch =>
              val (a, b, _, _) = graft.ops.FlacAudio.features(ch)
              ns += a; sumAbs += b
            }
            ("ok", meta.sampleRate, ns, sumAbs)
          case Left(kind) => (kind, 0, 0L, 0L)
        }
      }.toDF("outcome", "rate", "n_samples", "sum_abs")
    recs.groupBy(col("outcome"), col("rate"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_samples")).as("sum_samples"),
        sum(col("sum_abs")).as("sum_energy"))
  }

  /** Streaming animated-WebP ingest (round 13): healthy animations
    * decode + COMPOSE through [[graft.ops.WebpAnim.decodeSafe]] and yield
    * one row with the composed-canvas checksum; a rotten container yields
    * ONE typed error row (unsupported / truncated / not_media /
    * malformed). State bounded by refusal-kinds × frame-counts; decode
    * is a stateless per-file map. Expects columns (file string, content
    * binary).
    */
  def webpAnimScan(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    val recs = files
      .select(col("file"), col("content").cast("binary"))
      .as[(String, Array[Byte])]
      .map { case (_, bytes) =>
        graft.ops.WebpAnim.decodeSafe(bytes) match {
          case Right((meta, states)) =>
            var sum = 0L
            states.foreach { c =>
              var k = 0
              while (k < c.length) { sum += c(k) & 0xff; k += 1 }
            }
            ("ok", states.length, meta.frames.map(_.durationMs.toLong).sum, sum)
          case Left(kind) => (kind, 0, 0L, 0L)
        }
      }.toDF("outcome", "frames", "dur_ms", "csum")
    recs.groupBy(col("outcome"), col("frames"))
      .agg(count(lit(1)).as("n"),
        sum(col("dur_ms")).as("sum_duration"),
        sum(col("csum")).as("canvas_checksum"))
  }

  /** Streaming ISOBMFF ingest (round 15): healthy MP4/MOV/HEIF containers
    * yield one metadata row through the [[graft.ops.Isobmff]] box walk
    * (brand, track count, video dims, sample totals); a rotten container
    * yields ONE typed error row (bad_magic / truncated / bad_frame /
    * too_large). State bounded by outcome × brand; the walk is a
    * stateless per-file map with zero payload allocation. Expects
    * columns (file string, content binary).
    */
  def isobmffScan(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    val recs = files
      .select(col("file"), col("content").cast("binary"))
      .as[(String, Array[Byte])]
      .map { case (_, bytes) =>
        graft.ops.Isobmff.parseSafe(bytes) match {
          case Right(m) =>
            val v = m.tracks.find(_.handler == "vide")
            ("ok", m.majorBrand, m.tracks.length.toLong,
              v.map(t => t.width.toLong * t.height).getOrElse(
                m.itemWidth.toLong * m.itemHeight),
              m.tracks.map(_.nSamples).sum)
          case Left(kind) => (kind, "", 0L, 0L, 0L)
        }
      }.toDF("outcome", "brand", "n_tracks", "px", "n_samples")
    recs.groupBy(col("outcome"), col("brand"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_tracks")).as("sum_tracks"),
        sum(col("px")).as("sum_px"),
        sum(col("n_samples")).as("sum_samples"))
  }

  /** Streaming ingest of compressed JSONL shards across EVERY codec the
    * corpus layer supports — zstd, LZ4, gzip members, bzip2 streams, xz
    * streams, snappy framed, all sniffed per shard by magic, plus
    * brotli `.br` shards routed by extension (brotli has no magic) —
    * the mixed-codec directory a long-lived corpus accumulates. Healthy
    * shards yield one row per JSONL record; a rotten shard yields ONE
    * typed error row from the codec's refusal vocabulary instead of a
    * failed micro-batch. State bounded by refusal-kinds × languages;
    * decode is a stateless per-file flatMap. Expects columns
    * (file string, content binary).
    */
  def compressedJsonlScan(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    import graft.etl.{JObj, JStr}
    val recs = files
      .select(col("file"), col("content").cast("binary"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        val decoded = graft.ops.Zstd.decompressNamedSafe(file, bytes)
        decoded match {
          case Right(raw) =>
            new String(raw, java.nio.charset.StandardCharsets.US_ASCII)
              .split('\n').toSeq.map { line =>
                graft.etl.Json.parseOpt(line) match {
                  case Some(JObj(fields)) =>
                    val m = fields.toMap
                    (m.get("lang"), m.get("text")) match {
                      case (Some(JStr(l)), Some(JStr(t))) => ("ok", l, t.length.toLong)
                      case _                              => ("bad_schema", "", 0L)
                    }
                  case _ => ("bad_schema", "", 0L)
                }
              }
          case Left(kind) => Seq((kind, "", 0L))
        }
      }.toDF("outcome", "lang", "text_bytes")
    recs.groupBy(col("outcome"), col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("text_bytes")).as("sum_bytes"))
  }
}
