package graft.queries

import graft.core.{GraftQuery, Tables}
import graft.ops.{Hash60Kernel, Tar, TextAnalysis => TA}
import org.apache.spark.sql.functions._
import TarQueries.{M, h60, sqlH60Mod, ascii, shardGroups, buildShard}

/** RECORD-oriented ML shard codecs (Avro, TFRecord + tf.Example,
  * MessagePack), split out of TarQueries in round 13 (registry hygiene;
  * query bodies byte-identical). Shard grouping, checksums, and poisoned
  * twins share TarQueries' container-query conventions.
  */
object RecordShardQueries {

  val all: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // Avro record-shard round trip ([[graft.ops.Avro]], the Avro 1.11
    // object-container format data platforms emit before columnar
    // conversion): each shard group becomes one container of flat records
    // (long id, string lang/text, double score, boolean keep) with the
    // codec alternating deflate/null by group parity (the mixed-codec
    // directory case), then is strictly re-read. The per-lang aggregate
    // pins record completeness, payload bytes, an md5-derived checksum of
    // every text body, and — through the container's little-endian IEEE
    // encoding — an EXACT double sum (scores are multiples of 1/8 far
    // below 2^53, so addition is associative and engine-exact) plus the
    // boolean field's count. Same 100 TB shape as zip01/zst01: schema-
    // bounded build groups, per-shard map, one small-keyed aggregate.
    GraftQuery(
      "avro01_record_shards",
      (s, d) => {
        import s.implicits._
        val schema = graft.ops.Avro.Schema("doc", Vector(
          "id" -> "long", "lang" -> "string", "text" -> "string",
          "score" -> "double", "keep" -> "boolean"))
        shardGroups(s, d).flatMap { case (_, g, recs) =>
            val rows = recs.map { case (id, text, lang) =>
              graft.ops.Avro.Record(Vector(
                id, lang, text, (id % 1000L) * 0.125, id % 3 == 0))
            }
            val codec = if (g % 2 == 0) "deflate" else "null"
            val shard = graft.ops.Avro.write(schema, rows, codec, blockSize = 4)
            val (_, back) = graft.ops.Avro.read(shard)
            back.iterator.map { r =>
              (r.values(1).asInstanceOf[String],
                r.values(2).asInstanceOf[String].length.toLong,
                r.values(2).asInstanceOf[String],
                r.values(3).asInstanceOf[Double],
                r.values(4).asInstanceOf[Boolean])
            }
          }
          .toDF("lang", "txt_len", "txt", "score", "keep")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_samples"),
            sum(col("txt_len")).as("txt_bytes"),
            sum(TA.hash60(col("txt")) % M).as("txt_check"),
            sum(col("score")).as("score_sum"),
            count(when(col("keep"), lit(1))).as("n_keep"))
      },
      Some(s"""SELECT lang, count(*) AS n_samples,
          CAST(sum(length(text)) AS BIGINT) AS txt_bytes,
          CAST(sum(${sqlH60Mod("text")}) AS BIGINT) AS txt_check,
          sum((doc_id % 1000) * CAST(0.125 AS DOUBLE)) AS score_sum,
          count(CASE WHEN doc_id % 3 = 0 THEN 1 END) AS n_keep
        FROM documents GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Fault-tolerant Avro shard scan: a deterministic slice of containers
    // is poisoned — magic flip (bad_magic before any allocation), tail
    // truncation (the final sync marker ends early → truncated), sync-
    // marker corruption (the block-boundary integrity check → bad_sync)
    // — and each rotten container becomes ONE typed error row while
    // healthy shards contribute exact counts and checksums. The
    // tar02/warc03/zst02 contract on the Avro layer.
    GraftQuery(
      "avro02_poisoned_avro",
      (s, d) => {
        import s.implicits._
        val schema = graft.ops.Avro.Schema("doc", Vector(
          "id" -> "long", "text" -> "string"))
        shardGroups(s, d).map { case (source, g, recs) =>
            val rows = recs.map { case (id, text, _) =>
              graft.ops.Avro.Record(Vector(id, text))
            }
            val clean = graft.ops.Avro.write(schema, rows,
              if (g % 2 == 0) "deflate" else "null", blockSize = 4)
            val shard = (h60(s"$source:$g") % 7) match {
              case 0 => val b = clean.clone(); b(0) = (b(0) ^ 0x5a).toByte; b
              case 1 => java.util.Arrays.copyOf(clean, clean.length - 9)
              case 2 =>
                val b = clean.clone()
                b(b.length - 1) = (b(b.length - 1) ^ 0x11).toByte
                b
              case _ => clean
            }
            graft.ops.Avro.readSafe(shard) match {
              case Right((_, back)) =>
                val bc = back.iterator
                  .map(r => h60(r.values(1).asInstanceOf[String]) % M).sum
                (source, "ok", back.length.toLong, bc)
              case Left(kind) => (source, kind, 0L, 0L)
            }
          }
          .toDF("source", "outcome", "n_docs", "bc")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_shards"),
            count(when(col("outcome") === "ok", lit(1))).as("n_ok"),
            count(when(col("outcome") === "bad_magic", lit(1))).as("n_magic"),
            count(when(col("outcome") === "truncated", lit(1))).as("n_trunc"),
            count(when(col("outcome") === "bad_sync", lit(1))).as("n_sync"),
            sum(when(col("outcome") === "ok", col("n_docs")).otherwise(0L))
              .as("docs_ok"),
            sum(when(col("outcome") === "ok", col("bc")).otherwise(0L))
              .as("txt_check"))
      },
      Some(s"""WITH g AS (SELECT source, doc_id // 8 AS g, count(*) AS n,
            CAST(sum(${sqlH60Mod("text")}) AS BIGINT) AS bc
          FROM documents GROUP BY 1, 2),
        c AS (SELECT source, n, bc,
            ${TA.Sql.hash60("source || ':' || CAST(g AS VARCHAR)")} % 7 AS p
          FROM g)
        SELECT source, count(*) AS n_shards,
          count(CASE WHEN p >= 3 THEN 1 END) AS n_ok,
          count(CASE WHEN p = 0 THEN 1 END) AS n_magic,
          count(CASE WHEN p = 1 THEN 1 END) AS n_trunc,
          count(CASE WHEN p = 2 THEN 1 END) AS n_sync,
          CAST(sum(CASE WHEN p >= 3 THEN n ELSE 0 END) AS BIGINT) AS docs_ok,
          CAST(sum(CASE WHEN p >= 3 THEN bc ELSE 0 END) AS BIGINT) AS txt_check
        FROM c GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // TFRecord shard round trip ([[graft.ops.TfRecord]], the TensorFlow
    // training-data container: length-framed records with masked-CRC32C
    // integrity on BOTH the length and the payload): each shard group
    // becomes one shard of JSON-document records, strictly re-read
    // (every checksum verified). One wrong bit anywhere breaks either a
    // CRC or the per-lang text checksums. Completes the training-shard
    // container set (tar/WebDataset, ZIP, Avro, zstd-JSONL, TFRecord)
    // with the family's 100 TB shape: schema-bounded build groups,
    // per-shard map, one small-keyed aggregate.
    GraftQuery(
      "tfr01_tfrecord_shards",
      (s, d) => {
        import s.implicits._
        shardGroups(s, d).flatMap { case (_, _, recs) =>
            val payloads = recs.map { case (id, text, lang) =>
              ascii(s"""{"id":$id,"lang":${graft.etl.Json.quote(lang)},"text":${graft.etl.Json.quote(text)}}""")
            }
            val back = graft.ops.TfRecord.read(graft.ops.TfRecord.write(payloads))
            back.iterator.map { p =>
              val obj = graft.etl.Json.parse(new String(p,
                java.nio.charset.StandardCharsets.US_ASCII))
                .asInstanceOf[graft.etl.JObj].fields.toMap
              val txt = obj("text").asInstanceOf[graft.etl.JStr].s
              (obj("lang").asInstanceOf[graft.etl.JStr].s, txt.length.toLong, txt)
            }
          }
          .toDF("lang", "txt_len", "txt")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_samples"),
            sum(col("txt_len")).as("txt_bytes"),
            sum(TA.hash60(col("txt")) % M).as("txt_check"))
      },
      Some(s"""SELECT lang, count(*) AS n_samples,
          CAST(sum(length(text)) AS BIGINT) AS txt_bytes,
          CAST(sum(${sqlH60Mod("text")}) AS BIGINT) AS txt_check
        FROM documents GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Fault-tolerant TFRecord scan: a deterministic slice of shards is
    // poisoned — length-CRC flip (the header integrity check), payload
    // corruption (the data CRC catches it), tail truncation — and each
    // rotten shard becomes ONE typed error row; healthy shards still
    // contribute exact counts and checksums. The zst02/avro02 contract
    // on the TFRecord layer.
    GraftQuery(
      "tfr02_poisoned_tfrecord",
      (s, d) => {
        import s.implicits._
        shardGroups(s, d).map { case (source, g, recs) =>
            val payloads = recs.map { case (id, text, _) =>
              ascii(s"""{"id":$id,"text":${graft.etl.Json.quote(text)}}""")
            }
            val clean = graft.ops.TfRecord.write(payloads)
            val shard = (h60(s"$source:$g") % 7) match {
              case 0 => val b = clean.clone(); b(9) = (b(9) ^ 0x01).toByte; b
              case 1 => // corrupt a byte INSIDE the first payload (offset
                // 12+2 — always within the >=12-char JSON doc), so the
                // refusal is deterministically the data CRC, never the
                // length header's
                val b = clean.clone(); b(14) = (b(14) ^ 0x5a).toByte; b
              case 2 => java.util.Arrays.copyOf(clean, clean.length - 3)
              case _ => clean
            }
            graft.ops.TfRecord.readSafe(shard) match {
              case Right(back) =>
                val bc = back.iterator.map { p =>
                  val obj = graft.etl.Json.parse(new String(p,
                    java.nio.charset.StandardCharsets.US_ASCII))
                    .asInstanceOf[graft.etl.JObj].fields.toMap
                  h60(obj("text").asInstanceOf[graft.etl.JStr].s) % M
                }.sum
                (source, "ok", back.length.toLong, bc)
              case Left(kind) => (source, kind, 0L, 0L)
            }
          }
          .toDF("source", "outcome", "n_docs", "bc")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_shards"),
            count(when(col("outcome") === "ok", lit(1))).as("n_ok"),
            count(when(col("outcome") === "bad_length_crc", lit(1))).as("n_lencrc"),
            count(when(col("outcome") === "bad_data_crc", lit(1))).as("n_datacrc"),
            count(when(col("outcome") === "truncated", lit(1))).as("n_trunc"),
            sum(when(col("outcome") === "ok", col("n_docs")).otherwise(0L))
              .as("docs_ok"),
            sum(when(col("outcome") === "ok", col("bc")).otherwise(0L))
              .as("txt_check"))
      },
      Some(s"""WITH g AS (SELECT source, doc_id // 8 AS g, count(*) AS n,
            CAST(sum(${sqlH60Mod("text")}) AS BIGINT) AS bc
          FROM documents GROUP BY 1, 2),
        c AS (SELECT source, n, bc,
            ${TA.Sql.hash60("source || ':' || CAST(g AS VARCHAR)")} % 7 AS p
          FROM g)
        SELECT source, count(*) AS n_shards,
          count(CASE WHEN p >= 3 THEN 1 END) AS n_ok,
          count(CASE WHEN p = 0 THEN 1 END) AS n_lencrc,
          count(CASE WHEN p = 1 THEN 1 END) AS n_datacrc,
          count(CASE WHEN p = 2 THEN 1 END) AS n_trunc,
          CAST(sum(CASE WHEN p >= 3 THEN n ELSE 0 END) AS BIGINT) AS docs_ok,
          CAST(sum(CASE WHEN p >= 3 THEN bc ELSE 0 END) AS BIGINT) AS txt_check
        FROM c GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // tf.Example-in-TFRecord round trip ([[graft.ops.TfExample]] inside
    // [[graft.ops.TfRecord]] — the ACTUAL two-layer format TensorFlow
    // training data ships: protobuf Example records under masked-CRC32C
    // framing; tfr01 pinned the frame with JSON payloads, this pins the
    // real payload): each document becomes an Example{id: Int64List,
    // lang/text: BytesList, score: FloatList} (codec pinned against the
    // independent python wire transcription incl. unpacked variants —
    // TfExampleSpec), framed, re-read through BOTH layers. One wrong
    // varint, packed-float byte, or CRC breaks the per-lang checksums.
    GraftQuery(
      "tfr03_tfexample_shards",
      (s, d) => {
        import s.implicits._
        import graft.ops.TfExample._
        shardGroups(s, d).flatMap { case (_, _, recs) =>
            val payloads = recs.map { case (id, text, lang) =>
              graft.ops.TfExample.encode(Vector(
                "id" -> Int64Feature(Vector(id)),
                "lang" -> BytesFeature(Vector(ascii(lang))),
                "text" -> BytesFeature(Vector(ascii(text))),
                "score" -> FloatFeature(Vector(((id % 1000L) * 0.125).toFloat))))
            }
            val back = graft.ops.TfRecord.read(graft.ops.TfRecord.write(payloads))
            back.iterator.map { p =>
              val m = graft.ops.TfExample.decode(p).toMap
              val txt = new String(m("text").asInstanceOf[BytesFeature].vs.head,
                java.nio.charset.StandardCharsets.US_ASCII)
              (new String(m("lang").asInstanceOf[BytesFeature].vs.head,
                java.nio.charset.StandardCharsets.US_ASCII),
                txt.length.toLong, txt,
                m("score").asInstanceOf[FloatFeature].vs.head.toDouble,
                m("id").asInstanceOf[Int64Feature].vs.head)
            }
          }
          .toDF("lang", "txt_len", "txt", "score", "id")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_samples"),
            sum(col("txt_len")).as("txt_bytes"),
            sum(TA.hash60(col("txt")) % M).as("txt_check"),
            sum(col("score")).as("score_sum"),
            sum(col("id") % M).as("id_check"))
      },
      Some(s"""SELECT lang, count(*) AS n_samples,
          CAST(sum(length(text)) AS BIGINT) AS txt_bytes,
          CAST(sum(${sqlH60Mod("text")}) AS BIGINT) AS txt_check,
          sum((doc_id % 1000) * CAST(0.125 AS DOUBLE)) AS score_sum,
          CAST(sum(doc_id % 1000000007) AS BIGINT) AS id_check
        FROM documents GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // MessagePack record-shard round trip ([[graft.ops.Msgpack]] — the
    // compact binary sibling of JSONL that feature stores and
    // training-data shards ship; encoder BYTE-identical to the
    // independent python spec transcription, MsgpackSpec): each shard
    // group becomes back-to-back {id, lang, text, score, keep} records
    // in canonical smallest encodings, strictly re-decoded through the
    // JSON value model. Aggregates mirror avro01/arrow01 exactly. The
    // container-family 100 TB shape.
    GraftQuery(
      "mp01_msgpack_shards",
      (s, d) => {
        import s.implicits._
        import graft.etl.{JBool, JFloat, JInt, JObj, JStr}
        shardGroups(s, d).flatMap { case (_, _, recs) =>
            val shard = graft.ops.Msgpack.encodeAll(recs.map { case (id, text, lang) =>
              JObj(Vector(
                "id" -> JInt(BigInt(id)), "lang" -> JStr(lang),
                "text" -> JStr(text),
                "score" -> JFloat((id % 1000L) * 0.125),
                "keep" -> JBool(id % 3 == 0)))
            })
            graft.ops.Msgpack.decodeAll(shard).iterator.map { v =>
              val f = v.asInstanceOf[JObj].fields.toMap
              val txt = f("text").asInstanceOf[JStr].s
              (f("lang").asInstanceOf[JStr].s, txt.length.toLong, txt,
                f("score").asInstanceOf[JFloat].d,
                f("keep").asInstanceOf[JBool].b)
            }
          }
          .toDF("lang", "txt_len", "txt", "score", "keep")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_samples"),
            sum(col("txt_len")).as("txt_bytes"),
            sum(TA.hash60(col("txt")) % M).as("txt_check"),
            sum(col("score")).as("score_sum"),
            count(when(col("keep"), lit(1))).as("n_keep"))
      },
      Some(s"""SELECT lang, count(*) AS n_samples,
          CAST(sum(length(text)) AS BIGINT) AS txt_bytes,
          CAST(sum(${sqlH60Mod("text")}) AS BIGINT) AS txt_check,
          sum((doc_id % 1000) * CAST(0.125 AS DOUBLE)) AS score_sum,
          count(CASE WHEN doc_id % 3 = 0 THEN 1 END) AS n_keep
        FROM documents GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Fault-tolerant MessagePack scan: a deterministic slice of shards
    // is poisoned — 0xc1 (the spec's never-used byte) spliced at the
    // front (bad_type), tail truncation mid-record (truncated) — and
    // each rotten shard becomes ONE typed error row while healthy
    // shards contribute exact counts and checksums. The container
    // family's contract on the msgpack layer.
    GraftQuery(
      "mp02_poisoned_msgpack",
      (s, d) => {
        import s.implicits._
        import graft.etl.{JInt, JObj, JStr}
        shardGroups(s, d).map { case (source, g, recs) =>
            val clean = graft.ops.Msgpack.encodeAll(recs.map { case (id, text, _) =>
              JObj(Vector("id" -> JInt(BigInt(id)), "text" -> JStr(text)))
            })
            val shard = (h60(s"mp:$source:$g") % 7) match {
              case 0 => Array(0xc1.toByte) ++ clean
              case 1 => java.util.Arrays.copyOf(clean, clean.length - 3)
              case _ => clean
            }
            graft.ops.Msgpack.decodeAllSafe(shard) match {
              case Right(vs) =>
                var bc = 0L
                vs.foreach { v =>
                  val f = v.asInstanceOf[JObj].fields.toMap
                  bc += h60(f("text").asInstanceOf[JStr].s) % M
                }
                (source, "ok", vs.length.toLong, bc)
              case Left(kind) => (source, kind, 0L, 0L)
            }
          }
          .toDF("source", "outcome", "n_docs", "bc")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_shards"),
            count(when(col("outcome") === "ok", lit(1))).as("n_ok"),
            count(when(col("outcome") === "bad_type", lit(1))).as("n_badtype"),
            count(when(col("outcome") === "truncated", lit(1))).as("n_trunc"),
            sum(when(col("outcome") === "ok", col("n_docs")).otherwise(0L))
              .as("docs_ok"),
            sum(when(col("outcome") === "ok", col("bc")).otherwise(0L))
              .as("txt_check"))
      },
      Some(s"""WITH g AS (SELECT source, doc_id // 8 AS g, count(*) AS n,
            CAST(sum(${sqlH60Mod("text")}) AS BIGINT) AS bc
          FROM documents GROUP BY 1, 2),
        c AS (SELECT source, n, bc,
            ${TA.Sql.hash60("'mp:' || source || ':' || CAST(g AS VARCHAR)")} % 7 AS p
          FROM g)
        SELECT source, count(*) AS n_shards,
          count(CASE WHEN p >= 2 THEN 1 END) AS n_ok,
          count(CASE WHEN p = 0 THEN 1 END) AS n_badtype,
          count(CASE WHEN p = 1 THEN 1 END) AS n_trunc,
          CAST(sum(CASE WHEN p >= 2 THEN n ELSE 0 END) AS BIGINT) AS docs_ok,
          CAST(sum(CASE WHEN p >= 2 THEN bc ELSE 0 END) AS BIGINT) AS txt_check
        FROM c GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // CBOR record-shard round trip (RFC 8949 / RFC 8742 sequences — the
    // COSE/WebAuthn-world record format, the remaining sibling of the
    // msgpack layer). Same shard contract as mp01: every modeled form
    // exercised per record, one wrong byte anywhere breaks the
    // per-class checksums.
    GraftQuery(
      "cb01_cbor_shards",
      (s, d) => {
        import s.implicits._
        import graft.etl.{JBool, JFloat, JInt, JObj, JStr}
        shardGroups(s, d).flatMap { case (_, _, recs) =>
            val shard = graft.ops.Cbor.encodeAll(recs.map { case (id, text, lang) =>
              JObj(Vector(
                "id" -> JInt(BigInt(id)), "lang" -> JStr(lang),
                "text" -> JStr(text),
                "score" -> JFloat((id % 1000L) * 0.125),
                "keep" -> JBool(id % 3 == 0)))
            })
            graft.ops.Cbor.decodeAll(shard).iterator.map { v =>
              val f = v.asInstanceOf[JObj].fields.toMap
              val txt = f("text").asInstanceOf[JStr].s
              (f("lang").asInstanceOf[JStr].s, txt.length.toLong, txt,
                f("score").asInstanceOf[JFloat].d,
                f("keep").asInstanceOf[JBool].b)
            }
          }
          .toDF("lang", "txt_len", "txt", "score", "keep")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_samples"),
            sum(col("txt_len")).as("txt_bytes"),
            sum(TA.hash60(col("txt")) % M).as("txt_check"),
            sum(col("score")).as("score_sum"),
            count(when(col("keep"), lit(1))).as("n_keep"))
      },
      Some(s"""SELECT lang, count(*) AS n_samples,
          CAST(sum(length(text)) AS BIGINT) AS txt_bytes,
          CAST(sum(${sqlH60Mod("text")}) AS BIGINT) AS txt_check,
          sum((doc_id % 1000) * CAST(0.125 AS DOUBLE)) AS score_sum,
          count(CASE WHEN doc_id % 3 = 0 THEN 1 END) AS n_keep
        FROM documents GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Fault-tolerant CBOR scan: the mp02 contract on the CBOR layer —
    // an unmodeled byte-string head spliced at the front (bad_type),
    // tail truncation mid-record (truncated); each rotten shard is ONE
    // typed error row, healthy shards contribute exact counts.
    GraftQuery(
      "cb02_poisoned_cbor",
      (s, d) => {
        import s.implicits._
        import graft.etl.{JInt, JObj, JStr}
        shardGroups(s, d).map { case (source, g, recs) =>
            val clean = graft.ops.Cbor.encodeAll(recs.map { case (id, text, _) =>
              JObj(Vector("id" -> JInt(BigInt(id)), "text" -> JStr(text)))
            })
            val shard = (h60(s"cb:$source:$g") % 7) match {
              case 0 => Array(0x40.toByte) ++ clean // bstr head: bad_type
              case 1 => java.util.Arrays.copyOf(clean, clean.length - 3)
              case _ => clean
            }
            graft.ops.Cbor.decodeAllSafe(shard) match {
              case Right(vs) =>
                var bc = 0L
                vs.foreach { v =>
                  val f = v.asInstanceOf[JObj].fields.toMap
                  bc += h60(f("text").asInstanceOf[JStr].s) % M
                }
                (source, "ok", vs.length.toLong, bc)
              case Left(kind) => (source, kind, 0L, 0L)
            }
          }
          .toDF("source", "outcome", "n_docs", "bc")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_shards"),
            count(when(col("outcome") === "ok", lit(1))).as("n_ok"),
            count(when(col("outcome") === "bad_type", lit(1))).as("n_badtype"),
            count(when(col("outcome") === "truncated", lit(1))).as("n_trunc"),
            sum(when(col("outcome") === "ok", col("n_docs")).otherwise(0L))
              .as("docs_ok"),
            sum(when(col("outcome") === "ok", col("bc")).otherwise(0L))
              .as("txt_check"))
      },
      Some(s"""WITH g AS (SELECT source, doc_id // 8 AS g, count(*) AS n,
            CAST(sum(${sqlH60Mod("text")}) AS BIGINT) AS bc
          FROM documents GROUP BY 1, 2),
        c AS (SELECT source, n, bc,
            ${TA.Sql.hash60("'cb:' || source || ':' || CAST(g AS VARCHAR)")} % 7 AS p
          FROM g)
        SELECT source, count(*) AS n_shards,
          count(CASE WHEN p >= 2 THEN 1 END) AS n_ok,
          count(CASE WHEN p = 0 THEN 1 END) AS n_badtype,
          count(CASE WHEN p = 1 THEN 1 END) AS n_trunc,
          CAST(sum(CASE WHEN p >= 2 THEN n ELSE 0 END) AS BIGINT) AS docs_ok,
          CAST(sum(CASE WHEN p >= 2 THEN bc ELSE 0 END) AS BIGINT) AS txt_check
        FROM c GROUP BY 1"""),
    ),
  )
}
