package graft.queries

import graft.core.GraftQuery
import graft.ops.{Mail, TextAnalysis => TA}
import org.apache.spark.sql.functions._
import TarQueries.{M, h60, sqlH60Mod, shardGroups}

/** Email-corpus operators (round 17): mail archives (list dumps,
  * `.mbox` shards) are a standing LLM-pretraining source, ingested the
  * way tar/zip/warc shards are. mail01 pins the full MIME round trip —
  * RFC 5322 headers, RFC 2047 encoded-word subjects, 7bit AND base64
  * transfer codings (forced on a deterministic doc slice so both decode
  * paths face corpus text), mboxrd From-escaping — against DuckDB
  * recomputing every aggregate from the raw documents table; mail02 is
  * the family's fault-tolerant scan (tar02 contract): poisoned shards
  * become typed rows, and a poisoned MESSAGE inside a healthy mailbox
  * loses only itself (per-message blast radius, the property a 100 TB
  * mail scan actually needs). Same scale shape as the container pack:
  * bounded build groups, per-shard map, one small-keyed rollup.
  */
object MailQueries {

  private val Date = "Thu, 01 Jan 2026 00:00:00 +0000"

  val all: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    GraftQuery(
      "mail01_mbox_roundtrip",
      (s, d) => {
        import s.implicits._
        shardGroups(s, d).flatMap { case (_, _, recs) =>
            val emls = recs.map { case (id, text, lang) =>
              Mail.writeEml(s"$lang@example.com", "list@example.com",
                s"doc $id", Date, text, forceB64 = id % 3 == 0)
            }
            val back = Mail.mboxSplit(Mail.writeMbox(emls))
            require(back.length == recs.length, "mbox message count")
            back.map { raw =>
              val m = Mail.parse(raw)
              val lang = m.from.takeWhile(_ != '@')
              val txt = m.textBody.stripSuffix("\n")
              (lang, txt.length.toLong, txt)
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
    // Poison modes (deterministic kinds): p=0 flips the mailbox's first
    // byte — the `From ` opener dies, the whole shard refuses bad_mbox;
    // p=1 corrupts the FIRST message's Subject separator (`:` -> `@`) —
    // that one message refuses bad_mail (header line without a colon)
    // while every other message in the mailbox still parses exactly.
    GraftQuery(
      "mail02_poisoned_mbox",
      (s, d) => {
        import s.implicits._
        shardGroups(s, d).map { case (source, g, recs) =>
            val emls = recs.map { case (id, text, lang) =>
              Mail.writeEml(s"$lang@example.com", "list@example.com",
                s"doc $id", Date, text, forceB64 = id % 3 == 0)
            }
            val clean = Mail.writeMbox(emls)
            val bytes = (h60(s"$source:$g") % 7) match {
              case 0 => val b = clean.clone(); b(0) = (b(0) ^ 0x15).toByte; b
              case 1 =>
                val t = new String(clean,
                  java.nio.charset.StandardCharsets.ISO_8859_1)
                t.replaceFirst("\nSubject:", "\nSubject@")
                  .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
              case _ => clean
            }
            Mail.mboxSplitSafe(bytes) match {
              case Left(kind) => (source, kind, 0L, 0L)
              case Right(msgs) =>
                var nOk = 0L
                var bc = 0L
                msgs.foreach { raw =>
                  Mail.parseSafe(raw).foreach { m =>
                    nOk += 1
                    bc += h60(m.textBody.stripSuffix("\n")) % M
                  }
                }
                val outcome = if (nOk == msgs.length) "ok" else "partial"
                (source, outcome, nOk, bc)
            }
          }
          .toDF("source", "outcome", "n_msgs", "bc")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_shards"),
            count(when(col("outcome") === "ok", lit(1))).as("n_ok"),
            count(when(col("outcome") === "bad_mbox", lit(1))).as("n_mbox"),
            count(when(col("outcome") === "partial", lit(1))).as("n_partial"),
            sum(col("n_msgs")).as("samples_ok"),
            sum(col("bc")).as("txt_check"))
      },
      Some(s"""WITH d AS (SELECT source, doc_id // 8 AS g, doc_id,
            (${sqlH60Mod("text")}) AS h
          FROM documents),
        g AS (SELECT source, g, count(*) AS n, CAST(sum(h) AS BIGINT) AS bc,
            CAST(arg_min(h, doc_id) AS BIGINT) AS h_first
          FROM d GROUP BY 1, 2),
        c AS (SELECT source, n, bc, h_first,
            ${TA.Sql.hash60("source || ':' || CAST(g AS VARCHAR)")} % 7 AS p
          FROM g)
        SELECT source, count(*) AS n_shards,
          count(CASE WHEN p >= 2 THEN 1 END) AS n_ok,
          count(CASE WHEN p = 0 THEN 1 END) AS n_mbox,
          count(CASE WHEN p = 1 THEN 1 END) AS n_partial,
          CAST(sum(CASE WHEN p >= 2 THEN n WHEN p = 1 THEN n - 1
            ELSE 0 END) AS BIGINT) AS samples_ok,
          CAST(sum(CASE WHEN p >= 2 THEN bc WHEN p = 1 THEN bc - h_first
            ELSE 0 END) AS BIGINT) AS txt_check
        FROM c GROUP BY 1"""),
    ),

  )
}
