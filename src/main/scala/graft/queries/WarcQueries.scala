package graft.queries

import graft.core.{GraftQuery, Tables}
import graft.ops.{Hash60Kernel, Warc, TextAnalysis => TA}
import org.apache.spark.sql.functions._

/** WARC crawl-ingestion operators (warc01-warc03): the Common Crawl
  * container front door, exercised end to end — synthesize deterministic
  * `.warc.gz` files from the documents table (one gzip member per record,
  * the standard seekable layout), read them back through the pure-JVM
  * [[graft.ops.Warc]] reader (gzip member split + CRC audit, WARC record
  * grammar, HTTP/1.1 response framing), and aggregate what a crawl-ingest
  * job extracts. The oracle recomputes every aggregate straight from the
  * source text in DuckDB, so one wrong byte anywhere in the
  * build→gzip→split→inflate→record-parse→HTTP-strip path breaks the hash
  * match (the mm03 round-trip contract applied to the container layer).
  *
  * Scale shape: file build groups are schema-bounded (≤8 docs), parsing is
  * a per-file map, and nothing shuffles between the group build and the
  * final per-source aggregate — at 100 TB the same parser runs as a
  * per-file flatMap over a binaryFile scan ([[graft.ops.WarcSource]]),
  * which never shuffles at all.
  */
object WarcQueries {

  /** checksum modulus: keeps Σ(hash60 mod M) inside int64 at any corpus
    * scale (5e6 docs × 1e9 ≈ 5e15 ≪ 2⁶³)
    */
  private val M = 1000000007L

  private def h60(s: String): Long =
    Hash60Kernel.fold(Hash60Kernel.digest().digest(
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)))

  private def sqlH60Mod(v: String) = s"(${TA.Sql.hash60(v)} % $M)"

  /** docs grouped into crawl files of ≤8 pages: (source, g, [(id, text)]),
    * records sorted by doc_id inside the file.
    */
  private def fileGroups(s: org.apache.spark.sql.SparkSession, d: String) = {
    import s.implicits._
    // STILL exactly one full-text shuffle: the explicit keyed repartition
    // replaces the groupBy-planned exchange (the groupBy reuses its hash
    // partitioning, and collect_list partial-aggregates nothing, so nothing
    // is lost map-side) while pinning the post-shuffle stage at cluster
    // parallelism — AQE's byte-proportional coalescer otherwise collapses
    // the small exchange to one task and serializes the gzip/parse work.
    Tables.documents(s, d)
      .withColumn("g", expr("doc_id DIV 8"))
      .transform(graft.core.Par.byKey(_, col("source"), col("g")))
      .groupBy(col("source"), col("g"))
      .agg(sort_array(collect_list(struct(
        col("doc_id").as("_1"), col("text").as("_2")))).as("recs"))
      .as[(String, Long, Seq[(Long, String)])]
  }

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  val all: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // WARC round trip: every doc becomes an HTTP-200 response record in a
    // multi-record .warc.gz (warcinfo + responses, one gzip member each);
    // the reader splits members (CRC32+ISIZE audited), parses the record
    // grammar, strips the HTTP envelope, and the per-source aggregate pins
    // record counts, file counts (via warcinfo), body bytes, and md5-based
    // checksums of both bodies and target URIs against DuckDB recomputing
    // them from the raw table.
    GraftQuery(
      "warc01_warc_roundtrip",
      (s, d) => {
        import s.implicits._
        val parsed = fileGroups(s, d).map { case (source, g, recs) =>
            val pages = recs.map { case (id, text) =>
              (s"https://$source/doc/$id", 200,
                Seq("Content-Type" -> "text/plain; charset=utf-8"), ascii(text))
            }
            (source, Warc.buildCrawlFile(s"$source-$g.warc.gz", pages))
          }
          .flatMap { case (source, bytes) =>
            Warc.read(bytes).map { r =>
              if (r.warcType == "response") {
                val h = Warc.parseHttpResponse(r.body)
                (source, r.warcType, r.targetUri,
                  new String(h.body, java.nio.charset.StandardCharsets.US_ASCII))
              } else (source, r.warcType, "", "")
            }
          }
          .toDF("source", "rec_type", "uri", "body")
        parsed.groupBy(col("source")).agg(
          count(when(col("rec_type") === "response", lit(1))).as("n_records"),
          count(when(col("rec_type") === "warcinfo", lit(1))).as("n_files"),
          sum(when(col("rec_type") === "response", length(col("body")))
            .otherwise(0)).cast("long").as("body_bytes"),
          sum(when(col("rec_type") === "response", TA.hash60(col("body")) % M)
            .otherwise(0L)).as("body_check"),
          sum(when(col("rec_type") === "response", TA.hash60(col("uri")) % M)
            .otherwise(0L)).as("uri_check"))
      },
      Some(s"""SELECT source,
          count(*) AS n_records,
          count(DISTINCT doc_id // 8) AS n_files,
          CAST(sum(length(text)) AS BIGINT) AS body_bytes,
          CAST(sum(${sqlH60Mod("text")}) AS BIGINT) AS body_check,
          CAST(sum(${sqlH60Mod("'https://' || source || '/doc/' || CAST(doc_id AS VARCHAR)")}) AS BIGINT) AS uri_check
        FROM documents GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // HTTP-layer crawl triage: statuses vary per page (doc_id%7 → 404 /
    // 301-with-Location / 200), every response carries a custom header,
    // and the ingest keeps only 200s with a text/* Content-Type — the
    // standard crawl-extraction rule. Pins status-line parsing, arbitrary
    // header extraction (X-Crawl-Depth round-trips an integer,
    // Location round-trips a URI), and the keep rule, per status code.
    GraftQuery(
      "warc02_http_triage",
      (s, d) => {
        import s.implicits._
        val parsed = fileGroups(s, d).map { case (source, g, recs) =>
            val pages = recs.map { case (id, text) =>
              val depth = "X-Crawl-Depth" -> (id % 5).toString
              (id % 7) match {
                case 0 => (s"https://$source/doc/$id", 404,
                  Seq("Content-Type" -> "text/html; charset=utf-8", depth),
                  ascii("not found"))
                case 1 => (s"https://$source/doc/$id", 301,
                  Seq("Location" -> s"https://$source/doc/${id + 1}", depth),
                  Array.emptyByteArray)
                case _ => (s"https://$source/doc/$id", 200,
                  Seq("Content-Type" -> "text/plain; charset=utf-8", depth),
                  ascii(text))
              }
            }
            (source, Warc.buildCrawlFile(s"$source-$g.warc.gz", pages))
          }
          .flatMap { case (_, bytes) =>
            Warc.read(bytes).collect {
              case r if r.warcType == "response" =>
                val h = Warc.parseHttpResponse(r.body)
                val ctype = h.header("Content-Type").getOrElse("")
                val kept = h.status == 200 && ctype.startsWith("text/")
                (h.status,
                  h.header("X-Crawl-Depth").map(_.toLong).getOrElse(-1L),
                  if (kept)
                    new String(h.body, java.nio.charset.StandardCharsets.US_ASCII)
                  else "",
                  h.header("Location").getOrElse(""),
                  kept)
            }
          }
          .toDF("status", "depth", "body", "location", "kept")
        parsed.groupBy(col("status")).agg(
          count(lit(1)).as("n"),
          sum(col("depth")).as("depth_sum"),
          sum(when(col("kept"), TA.hash60(col("body")) % M).otherwise(0L))
            .as("kept_body_check"),
          sum(when(col("status") === 301, TA.hash60(col("location")) % M)
            .otherwise(0L)).as("loc_check"))
      },
      Some(s"""WITH p AS (SELECT doc_id, source, text,
            CASE WHEN doc_id % 7 = 0 THEN 404
                 WHEN doc_id % 7 = 1 THEN 301 ELSE 200 END AS status
          FROM documents)
        SELECT status, count(*) AS n,
          CAST(sum(doc_id % 5) AS BIGINT) AS depth_sum,
          CAST(sum(CASE WHEN status = 200 THEN ${sqlH60Mod("text")} ELSE 0 END)
            AS BIGINT) AS kept_body_check,
          CAST(sum(CASE WHEN status = 301 THEN
            ${sqlH60Mod("'https://' || source || '/doc/' || CAST(doc_id + 1 AS VARCHAR)")}
            ELSE 0 END) AS BIGINT) AS loc_check
        FROM p GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Fault-tolerant WARC scan (mm09's contract at the container layer):
    // a deterministic slice of files is poisoned — CRC trailer corrupted
    // or member truncated — and the safe reader turns each rotten FILE
    // into a typed error row (fail-stop per file) instead of a task
    // failure; healthy files still contribute their exact record counts
    // and body checksums. At 100 TB a crawl bucket ALWAYS carries
    // truncated uploads; the error-kind counts are the curation signal.
    GraftQuery(
      "warc03_poisoned_scan",
      (s, d) => {
        import s.implicits._
        val perFile = fileGroups(s, d).map { case (source, g, recs) =>
          val pages = recs.map { case (id, text) =>
            (s"https://$source/doc/$id", 200,
              Seq("Content-Type" -> "text/plain; charset=utf-8"), ascii(text))
          }
          val clean = Warc.buildCrawlFile(s"$source-$g.warc.gz", pages)
          val bytes = (h60(s"$source:$g") % 5) match {
            case 0 => // corrupt the last member's CRC32 trailer byte
              val b = clean.clone()
              b(b.length - 8) = (b(b.length - 8) ^ 0x5a).toByte
              b
            case 1 => java.util.Arrays.copyOf(clean, clean.length - 5) // truncate
            case _ => clean
          }
          Warc.readSafe(bytes) match {
            case Right(rs) =>
              val resp = rs.filter(_.warcType == "response")
              val bc = resp.map { r =>
                h60(new String(Warc.parseHttpResponse(r.body).body,
                  java.nio.charset.StandardCharsets.US_ASCII)) % M
              }.sum
              (source, "ok", resp.size.toLong, bc)
            case Left(kind) => (source, kind, 0L, 0L)
          }
        }.toDF("source", "outcome", "n_resp", "bc")
        perFile.groupBy(col("source")).agg(
          count(lit(1)).as("n_files"),
          count(when(col("outcome") === "ok", lit(1))).as("n_ok"),
          count(when(col("outcome") === "crc_mismatch", lit(1))).as("n_crc"),
          count(when(col("outcome") === "truncated", lit(1))).as("n_trunc"),
          sum(when(col("outcome") === "ok", col("n_resp")).otherwise(0L)).as("rec_ok"),
          sum(when(col("outcome") === "ok", col("bc")).otherwise(0L)).as("body_check"))
      },
      Some(s"""WITH g AS (SELECT source, doc_id // 8 AS g, count(*) AS n,
            CAST(sum(${sqlH60Mod("text")}) AS BIGINT) AS bc
          FROM documents GROUP BY 1, 2),
        c AS (SELECT source, n, bc,
            ${TA.Sql.hash60("source || ':' || CAST(g AS VARCHAR)")} % 5 AS p
          FROM g)
        SELECT source, count(*) AS n_files,
          count(CASE WHEN p >= 2 THEN 1 END) AS n_ok,
          count(CASE WHEN p = 0 THEN 1 END) AS n_crc,
          count(CASE WHEN p = 1 THEN 1 END) AS n_trunc,
          CAST(sum(CASE WHEN p >= 2 THEN n ELSE 0 END) AS BIGINT) AS rec_ok,
          CAST(sum(CASE WHEN p >= 2 THEN bc ELSE 0 END) AS BIGINT) AS body_check
        FROM c GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Main-text extraction from crawl HTML (the trafilatura/jusText role
    // between a WARC scan and the documents table): each doc's text is
    // embedded — HTML-escaped — in a deterministic page skeleton with
    // title, nav/footer/script/style boilerplate, and block structure;
    // [[graft.etl.HtmlText]] parses it back through the stdlib-faithful
    // HtmlParser port, drops boilerplate subtrees, splits at block tags,
    // and whitespace-normalizes. The oracle rebuilds the expected title/
    // body straight from the raw text (so escape→parse→unescape→extract
    // must round-trip byte-exactly) and prices the skipped boilerplate
    // bytes per row.
    GraftQuery(
      "html01_main_text",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
          .as[(Long, String, String)]
          .map { case (id, source, text) =>
            val page =
              s"""<html><head><title>Doc $id</title><style>p{color:red}</style><script>var x=1;</script></head><body><nav><a href="/">home</a><a href="/about">about</a></nav><main><h1>Doc $id</h1><p>${graft.etl.HtmlText.escape(text)}</p></main><footer>copyright $source</footer></body></html>"""
            val e = graft.etl.HtmlText.extract(page)
            (source, e.title, e.body, e.boilerplateBytes)
          }
          .toDF("source", "title", "body", "boiler")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n"),
            sum(TA.hash60(col("title")) % M).as("title_check"),
            sum(TA.hash60(col("body")) % M).as("body_check"),
            sum(col("boiler")).as("boilerplate_bytes"))
      },
      Some(s"""WITH x AS (SELECT doc_id, source,
            'Doc ' || CAST(doc_id AS VARCHAR) AS title,
            'Doc ' || CAST(doc_id AS VARCHAR) ||
              CASE WHEN trim(regexp_replace(text, '\\s+', ' ', 'g')) = '' THEN ''
                   ELSE ' ' || trim(regexp_replace(text, '\\s+', ' ', 'g')) END AS body
          FROM documents)
        SELECT source, count(*) AS n,
          CAST(sum(${sqlH60Mod("title")}) AS BIGINT) AS title_check,
          CAST(sum(${sqlH60Mod("body")}) AS BIGINT) AS body_check,
          CAST(sum(39 + length(source)) AS BIGINT) AS boilerplate_bytes
        FROM x GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Web-TABLE mining (round 12: the table-QA / structured-extraction
    // corpus op): each doc's text seeds a deterministic page carrying a
    // (2 + doc_id%4)-row x 3-col HTML table among script/nav boilerplate;
    // graft.etl.Extract.Html.tagRows (the stdlib-parser port behind the
    // reference's E6 extractor) parses the page and the query keeps only
    // the <td> cells — integer-valued by construction, so the oracle
    // recomputes every cell from text arithmetic: one wrong tag boundary,
    // text association, or dropped cell breaks the sums. Per-row map,
    // shuffle-free until the per-source aggregate.
    GraftQuery(
      "html02_table_mining",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .filter(length(col("text")) > 0)
          .select(col("doc_id"), col("source"), col("text"))
          .as[(Long, String, String)]
          .map { case (id, source, text) =>
            val bytes = text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
            val rows = 2 + (id % 4).toInt
            val tbl = (0 until rows).map { r =>
              val tds = (0 until 3).map { c =>
                // +10000 keeps every cell 5 digits: the E6 extractor
                // (reference parity) drops tag rows with text length <= 3
                val v = (bytes(((r * 3 + c) * 7) % bytes.length) & 0xff) * (r + 1) + c + 10000
                s"<td>$v</td>"
              }.mkString
              s"<tr>$tds</tr>"
            }.mkString
            val page = s"""<html><body><script>var t=[1,2];</script><nav><a href="/">x</a></nav><table>$tbl</table></body></html>"""
            val cells = graft.etl.Html.tagRows(page)
              .filter(_.name == "td").map(_.text.trim.toLong)
            (source, cells.length.toLong, cells.sum)
          }
          .toDF("source", "n_cells", "cell_sum")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_cells")).as("total_cells"),
            sum(col("cell_sum")).as("value_check"))
      },
      // cell(r,c) = ascii(text[((r*3+c)*7) mod len]) * (r+1) + c over
      // (2 + doc_id%4) rows x 3 cols
      Some("""WITH d AS (SELECT doc_id, source, text, length(text) AS len
            FROM documents WHERE length(text) > 0),
          c AS (SELECT doc_id, source,
              CAST(3 * (2 + doc_id % 4) AS BIGINT) AS n_cells,
              CAST(list_sum(flatten(list_transform(range(0, 2 + doc_id % 4),
                r -> list_transform(range(0, 3), col ->
                  ascii(substring(text, (((r*3 + col) * 7) % len) + 1, 1))
                    * (r + 1) + col + 10000)))) AS BIGINT) AS cell_sum
            FROM d)
        SELECT source, count(*) AS n_docs,
          CAST(sum(n_cells) AS BIGINT) AS total_cells,
          CAST(sum(cell_sum) AS BIGINT) AS value_check
        FROM c GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // The whole crawl-to-corpus path in ONE plan — what this engine is
    // FOR: crawl files (every page fetched twice: origin + a mirror host,
    // the duplication a real crawl always carries) → WARC parse → keep
    // text/200 → HTML main-text extraction → quality gate (≥5 body
    // tokens) → EXACT fingerprint dedup (mirrors collapse) → per-source
    // corpus report. Typed per-file parsing flows into a declarative
    // tail; the only shuffles are the build groupBy, the fingerprint
    // dedup, and the report. The oracle rebuilds every number from the
    // raw table: fetched = 2×docs, kept = 2×quality docs, unique =
    // quality docs (the mirror MUST collapse), body checksum over the
    // surviving text.
    GraftQuery(
      "pipe02_crawl_to_corpus",
      (s, d) => {
        import s.implicits._
        val parsed = fileGroups(s, d).map { case (source, g, recs) =>
            val pages = recs.flatMap { case (id, text) =>
              val page =
                s"""<html><head><title>Doc $id</title></head><body><nav><a href="/">home</a></nav><main><h1>Doc $id</h1><p>${graft.etl.HtmlText.escape(text)}</p></main><footer>(c) $source</footer></body></html>"""
              Seq(s"https://$source.example.com/doc/$id",
                s"https://mirror-$source.example.net/doc/$id").map(uri =>
                (uri, 200, Seq("Content-Type" -> "text/html; charset=utf-8"),
                  ascii(page)))
            }
            (source, Warc.buildCrawlFile(s"$source-$g.warc.gz", pages))
          }
          .flatMap { case (source, bytes) =>
            Warc.read(bytes).collect {
              case r if r.warcType == "response" =>
                val h = Warc.parseHttpResponse(r.body)
                (source, h.status,
                  h.header("Content-Type").getOrElse(""),
                  new String(h.body, java.nio.charset.StandardCharsets.US_ASCII))
            }
          }
          .filter(t => t._2 == 200 && t._3.startsWith("text/"))
          .map { case (source, _, _, html) =>
            (source, graft.etl.HtmlText.extract(html).body)
          }
          .toDF("source", "body")
        parsed
          .withColumn("kept", TA.tokenCount(col("body")) >= 5)
          .groupBy(col("source"), col("kept"), TA.fingerprint(col("body")).as("fp"))
          .agg(count(lit(1)).as("cnt"), min(TA.hash60(col("body")) % M).as("h"))
          .groupBy(col("source"))
          .agg(
            sum(col("cnt")).as("n_fetched"),
            sum(when(col("kept"), col("cnt")).otherwise(0L)).as("n_kept"),
            count(when(col("kept"), lit(1))).as("n_unique"),
            sum(when(col("kept"), col("h")).otherwise(0L)).as("body_check"))
      },
      Some(s"""WITH x AS (SELECT source,
            ${TA.Sql.tokenCount("text")} >= 3 AS kept,
            'Doc ' || CAST(doc_id AS VARCHAR) ||
              CASE WHEN trim(regexp_replace(text, '\\s+', ' ', 'g')) = '' THEN ''
                   ELSE ' ' || trim(regexp_replace(text, '\\s+', ' ', 'g')) END AS body
          FROM documents)
        SELECT source,
          CAST(2 * count(*) AS BIGINT) AS n_fetched,
          CAST(2 * count(CASE WHEN kept THEN 1 END) AS BIGINT) AS n_kept,
          count(CASE WHEN kept THEN 1 END) AS n_unique,
          CAST(sum(CASE WHEN kept THEN ${sqlH60Mod("body")} ELSE 0 END)
            AS BIGINT) AS body_check
        FROM x GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // WET/WAT derivatives (round 14): the two Common Crawl sidecar
    // formats a real crawl-data user touches most after raw WARC — WET
    // carries extracted text as `conversion` records, WAT carries
    // per-page metadata JSON (`metadata` records, envelope layout). Each
    // doc group becomes one WET file and one WAT file (both WARC-framed,
    // one gzip member per record); the reader walks both through the same
    // record grammar, parses the WAT envelope JSON, and JOINS text to
    // metadata by target URI — the canonical "build a corpus from WET,
    // enrich from WAT" ingest. Scale: both sides are per-file flatMaps
    // over what would be a binaryFile scan; the join shuffles on the URI
    // key only (uri, small metadata), never the text side's full bytes
    // twice, and the final aggregate is per-source.
    GraftQuery(
      "warc04_wet_wat",
      (s, d) => {
        import s.implicits._
        val groups = graft.core.Caches.persist(fileGroups(s, d))
        def uri(source: String, id: Long) = s"https://example.org/$source/$id"
        // text reduces to (bytes, hash) IN the per-file map, so the join
        // exchange never carries document bodies — only the uri key and
        // two longs ride the shuffle
        val wet = groups.flatMap { case (source, g, recs) =>
          val file = Warc.buildWetFile(s"$source-$g.warc.wet.gz",
            recs.map { case (id, text) => (uri(source, id), ascii(text)) })
          Warc.wetRecords(file).map { case (u, text) =>
            (source, u, text.length.toLong, h60(text) % M)
          }
        }.toDF("source", "uri", "txt_bytes", "txt_check")
        val wat = groups.flatMap { case (source, g, recs) =>
          val file = Warc.buildWatFile(s"$source-$g.warc.wat.gz",
            recs.map { case (id, text) =>
              val links = (0L until (id % 5)).map(k =>
                s"""{"url":"/doc/$id/link$k"}""").mkString(",")
              (uri(source, id),
                s"""{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":${graft.etl.Json.quote(uri(source, id))}},""" +
                s""""Payload-Metadata":{"HTTP-Response-Metadata":{"HTML-Metadata":{""" +
                s""""Head":{"Title":${graft.etl.Json.quote(s"Doc $id")}},"Links":[$links]}}}}}""")
            })
          Warc.watRecords(file).map { case (u, json) =>
            def obj(v: graft.etl.JVal, k: String): graft.etl.JVal =
              v.asInstanceOf[graft.etl.JObj].fields.toMap.apply(k)
            val env = obj(graft.etl.Json.parse(json), "Envelope")
            val html = obj(obj(obj(env, "Payload-Metadata"),
              "HTTP-Response-Metadata"), "HTML-Metadata")
            val title = obj(obj(html, "Head"), "Title")
              .asInstanceOf[graft.etl.JStr].s
            val nLinks = obj(html, "Links")
              .asInstanceOf[graft.etl.JArr].items.length
            (u, title, nLinks.toLong)
          }
        }.toDF("uri", "title", "n_links")
        wet.join(wat, Seq("uri"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_pages"),
            sum(col("txt_bytes")).as("txt_bytes"),
            sum(col("txt_check")).as("txt_check"),
            sum(col("n_links")).as("links_total"),
            sum(TA.hash60(col("title")) % M).as("title_check"))
      },
      Some(s"""SELECT source, count(*) AS n_pages,
          CAST(sum(length(text)) AS BIGINT) AS txt_bytes,
          CAST(sum(${sqlH60Mod("text")}) AS BIGINT) AS txt_check,
          CAST(sum(doc_id % 5) AS BIGINT) AS links_total,
          CAST(sum(${sqlH60Mod("'Doc ' || CAST(doc_id AS VARCHAR)")})
            AS BIGINT) AS title_check
        FROM documents GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // CDXJ capture index (round 14): the lookup sidecar a web archive is
    // randomly accessed through — one line per capture (SURT key,
    // 14-digit timestamp, JSON metadata). Each doc becomes a
    // deliberately-messy URL (mixed case, www prefix, unsorted query
    // params) captured TWICE; the real SURT canonicalizer + CDXJ
    // writer/parser (graft.ops.Cdx, pinned by CdxSpec) run per row, then
    // the classic index query: latest capture per SURT key (max_by over
    // one key shuffle). The oracle reconstructs the EXPECTED canonical
    // key and latest timestamp straight from (doc_id, source) arithmetic
    // — the UrlQueries contract: the operator must undo exactly the mess
    // it was handed. Scale: per-row map → one keyed dedup shuffle → one
    // small per-source rollup.
    GraftQuery(
      "warc05_cdx_latest",
      (s, d) => {
        import s.implicits._
        val caps = Tables.documents(s, d)
          .select(col("doc_id"), col("source")).as[(Long, String)]
          .flatMap { case (id, src) =>
            val url = s"HTTP://WWW.$src.org/Doc/$id?b=${id % 7}&a=${id % 3}"
            val surt = graft.ops.Cdx.surt(url)
            Seq(0, 1).map { k =>
              val ts = f"2026${if (k == 0) "0101" else "0315"}${id % 24}%02d0000"
              val line = graft.ops.Cdx.writeLine(graft.ops.Cdx.Capture(
                surt, ts, url.toLowerCase, "text/html", 200,
                s"sha1:${id * 2 + k}", 100L + id % 50, id * 7, s"$src.warc.gz"))
              val c = graft.ops.Cdx.parseLine(line)
              (src, c.surt, c.timestamp.toLong, c.digest)
            }
          }
          .toDF("source", "surt", "ts", "digest")
        caps
          .groupBy(col("source"), col("surt"))
          .agg(count(lit(1)).as("n_caps"), max(col("ts")).as("latest_ts"),
            expr("max_by(digest, ts)").as("latest_digest"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_urls"),
            sum(col("n_caps")).as("n_captures"),
            sum(TA.hash60(col("surt")) % M).as("surt_check"),
            sum(col("latest_ts")).as("ts_sum"),
            sum(TA.hash60(col("latest_digest")) % M).as("digest_check"))
      },
      Some(s"""WITH c AS (SELECT source, doc_id,
            'org,' || source || ')/doc/' || CAST(doc_id AS VARCHAR)
              || '?a=' || CAST(doc_id % 3 AS VARCHAR)
              || '&b=' || CAST(doc_id % 7 AS VARCHAR) AS surt,
            20260315000000 + (doc_id % 24) * 10000 AS latest_ts,
            'sha1:' || CAST(doc_id * 2 + 1 AS VARCHAR) AS latest_digest
          FROM documents)
        SELECT source, count(*) AS n_urls,
          CAST(2 * count(*) AS BIGINT) AS n_captures,
          CAST(sum(${sqlH60Mod("surt")}) AS BIGINT) AS surt_check,
          CAST(sum(latest_ts) AS BIGINT) AS ts_sum,
          CAST(sum(${sqlH60Mod("latest_digest")}) AS BIGINT) AS digest_check
        FROM c GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // WARC revisit resolution (round 15): Common Crawl stores a re-fetch
    // whose payload matched an earlier capture as a body-less `revisit`
    // record pointing at the original via WARC-Refers-To — a real archive
    // reader hits these constantly and must resolve them ACROSS files.
    // Originals live in doc_id DIV 8 crawl files; revisits (every third
    // doc, re-fetched under /redup/) are grouped DIV 5 so file membership
    // never lines up and resolution must go through the record-id join.
    // Every seventeenth revisit carries a dangling WARC-Refers-To and is
    // reported, not resolved (typed outcome, never a crash). The resolved
    // rows re-check the revisit's WARC-Payload-Digest against the
    // original payload's sha1 — a digest mismatch is a hard error.
    // Scale: both sides are per-file flatMaps; originals project to
    // (record_id, bytes, hash, digest) INSIDE the map, so the join
    // exchange never carries document bodies (the warc04 contract).
    GraftQuery(
      "warc06_revisit_resolve",
      (s, d) => {
        import s.implicits._
        def origUri(source: String, id: Long) = s"https://$source/doc/$id"
        val originals = fileGroups(s, d).flatMap { case (source, g, recs) =>
          val pages = recs.map { case (id, text) =>
            (origUri(source, id), 200,
              Seq("Content-Type" -> "text/plain; charset=utf-8"), ascii(text))
          }
          val file = Warc.buildCrawlFile(s"$source-$g.warc.gz", pages)
          Warc.read(file).filter(_.warcType == "response").map { r =>
            val body = Warc.parseHttpResponse(r.body).body
            (r.header("WARC-Record-ID").get,
              body.length.toLong,
              h60(new String(body, java.nio.charset.StandardCharsets.US_ASCII)) % M,
              Warc.payloadDigest(body))
          }
        }.toDF("rid", "o_bytes", "o_check", "o_digest")
        val revisits = Tables.documents(s, d)
          .where(expr("doc_id % 3 = 0"))
          .withColumn("g", expr("doc_id DIV 5"))
          .transform(graft.core.Par.byKey(_, col("source"), col("g")))
          .groupBy(col("source"), col("g"))
          .agg(sort_array(collect_list(struct(
            col("doc_id").as("_1"), col("text").as("_2")))).as("recs"))
          .as[(String, Long, Seq[(Long, String)])]
          .flatMap { case (source, g, recs) =>
            val entries = recs.map { case (id, text) =>
              val ref =
                if (id % 17 == 0) s"<urn:graft:missing:$id>"
                else s"<urn:graft:resp:${origUri(source, id)}>"
              (s"https://$source/redup/$id", ref, origUri(source, id),
                Warc.payloadDigest(ascii(text)))
            }
            val file = Warc.buildRevisitFile(s"$source-rev-$g.warc.gz", entries)
            Warc.revisitRecords(file).map { case (uri, ref, _, digest) =>
              (source, uri, ref, digest)
            }
          }.toDF("source", "uri", "ref", "r_digest")
        revisits.join(originals, revisits("ref") === originals("rid"), "left_outer")
          .select(col("source"), col("uri"), col("r_digest"),
            col("rid"), col("o_bytes"), col("o_check"), col("o_digest"))
          .map { r =>
            val resolved = !r.isNullAt(3)
            if (resolved)
              require(r.getString(2) == r.getString(6),
                s"payload digest mismatch at ${r.getString(1)}")
            (r.getString(0), r.getString(1), resolved,
              if (resolved) r.getLong(4) else 0L,
              if (resolved) r.getLong(5) else 0L)
          }
          .toDF("source", "uri", "resolved", "o_bytes", "o_check")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_revisits"),
            count(when(col("resolved"), lit(1))).as("n_resolved"),
            count(when(!col("resolved"), lit(1))).as("n_dangling"),
            sum(col("o_bytes")).as("resolved_bytes"),
            sum(col("o_check")).as("resolved_check"),
            sum(TA.hash60(col("uri")) % M).as("uri_check"))
      },
      Some(s"""WITH r AS (SELECT source, doc_id, text,
            doc_id % 17 != 0 AS resolved,
            'https://' || source || '/redup/' || CAST(doc_id AS VARCHAR) AS uri
          FROM documents WHERE doc_id % 3 = 0)
        SELECT source, count(*) AS n_revisits,
          count(CASE WHEN resolved THEN 1 END) AS n_resolved,
          count(CASE WHEN NOT resolved THEN 1 END) AS n_dangling,
          CAST(sum(CASE WHEN resolved THEN length(text) ELSE 0 END)
            AS BIGINT) AS resolved_bytes,
          CAST(sum(CASE WHEN resolved THEN ${sqlH60Mod("text")} ELSE 0 END)
            AS BIGINT) AS resolved_check,
          CAST(sum(${sqlH60Mod("uri")}) AS BIGINT) AS uri_check
        FROM r GROUP BY 1"""),
    ),
  )
}
