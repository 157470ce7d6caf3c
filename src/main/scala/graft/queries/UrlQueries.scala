package graft.queries

import graft.core.{GraftQuery, Tables}
import graft.ops.{Url, TextAnalysis => TA}
import org.apache.spark.sql.functions._

/** Crawl-frontier URL operators (url01-url03): canonicalization, host /
  * registered-domain extraction, and robots.txt politeness evaluation —
  * the stages between a WARC scan and a fetch queue. Each query
  * synthesizes deterministically-messy inputs from the documents table,
  * runs the REAL parser/normalizer ([[graft.ops.Url]], written from
  * RFC 3986 / RFC 9309), and aggregates md5 checksums of the outputs; the
  * DuckDB oracle reconstructs the EXPECTED clean output directly from the
  * same (doc_id, source) arithmetic — so the operators must undo exactly
  * the mess they were handed, byte for byte.
  *
  * Scale shape: all three are per-row projections (no UDF state, no
  * lookup joins) until the final small-keyed aggregate — the frontier
  * shape that never shuffles the corpus.
  */
object UrlQueries {

  private val M = 1000000007L // Σ(hash60 mod M) stays inside int64 at any SF

  private def sqlH60Mod(v: String) = s"(${TA.Sql.hash60(v)} % $M)"

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id"), col("source")).as[(Long, String)]
  }

  val all: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // RFC 3986 §6 canonicalization: five deterministic mess classes
    // (dot segments, percent-encoded unreserved, default port, case,
    // fragment) each normalize back to one predictable canonical form;
    // the oracle builds that form straight from (source, doc_id), so the
    // checksum only matches if every class is undone exactly.
    GraftQuery(
      "url01_canonicalize",
      (s, d) => {
        // end-to-end codegen: the mess synthesis is a when-chain of
        // concats and the normalizer is the UrlCanonicalize Expression —
        // no typed map, so the whole projection stays in one
        // WholeStageCodegen span (PlanSpec-gated)
        val id = col("doc_id").cast("string")
        val base = concat(lit("https://"), col("source"), lit(".example.com"))
        val m5 = col("doc_id") % 5
        val messy = when(m5 === 0, concat(base, lit("/a/./b/../doc/"), id))
          .when(m5 === 1, concat(base, lit("/%64oc/"), id)) // %64 = 'd'
          .when(m5 === 2, concat(base, lit(":443/doc/"), id))
          .when(m5 === 3, concat(lit("HTTPS://"), col("source"),
            lit(".EXAMPLE.COM/doc/"), id))
          .otherwise(concat(base, lit("/doc/"), id, lit("#sec2")))
        Tables.documents(s, d)
          .select(col("source"), messy.as("messy"))
          .withColumn("canon", graft.ops.UrlCanonicalize(col("messy")))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n"),
            sum(TA.hash60(col("canon")) % M).as("canon_check"),
            count(when(col("canon") =!= col("messy"), lit(1))).as("n_changed"))
      },
      Some(s"""WITH c AS (SELECT source,
            'https://' || source || '.example.com' ||
              CASE WHEN doc_id % 5 = 0 THEN '/a/doc/' ELSE '/doc/' END ||
              CAST(doc_id AS VARCHAR) AS canon
          FROM documents)
        SELECT source, count(*) AS n,
          CAST(sum(${sqlH60Mod("canon")}) AS BIGINT) AS canon_check,
          count(*) AS n_changed
        FROM c GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Host + registered-domain (eTLD+1) extraction: four host shapes —
    // single-label suffix, multi-label suffix (co.uk), two-label
    // wildcard-style suffix (github.io), and an unknown TLD exercising
    // the PSL fallback — grouped by registrable domain, the key a crawl
    // frontier shuffles on. Port stripping rides along (every URL
    // carries :8080).
    GraftQuery(
      "url02_domain_stats",
      (s, d) => {
        import s.implicits._
        docs(s, d).map { case (id, source) =>
            val h = (id % 4) match {
              case 0 => s"$source.example.com"
              case 1 => s"a.$source.shop.co.uk"
              case 2 => s"cdn.$source.pages.github.io"
              case _ => s"$source.internal"
            }
            val hostOut = Url.host(s"https://$h:8080/x/$id")
            (Url.registeredDomain(hostOut), hostOut)
          }
          .toDF("reg_domain", "host")
          .groupBy(col("reg_domain"))
          .agg(
            count(lit(1)).as("n"),
            countDistinct(col("host")).as("n_hosts"),
            sum(TA.hash60(col("host")) % M).as("host_check"))
      },
      Some(s"""WITH h AS (SELECT
            CASE doc_id % 4
              WHEN 0 THEN source || '.example.com'
              WHEN 1 THEN 'a.' || source || '.shop.co.uk'
              WHEN 2 THEN 'cdn.' || source || '.pages.github.io'
              ELSE source || '.internal' END AS host,
            CASE doc_id % 4
              WHEN 0 THEN 'example.com'
              WHEN 1 THEN 'shop.co.uk'
              WHEN 2 THEN 'pages.github.io'
              ELSE source || '.internal' END AS reg_domain
          FROM documents)
        SELECT reg_domain, count(*) AS n,
          count(DISTINCT host) AS n_hosts,
          CAST(sum(${sqlH60Mod("host")}) AS BIGINT) AS host_check
        FROM h GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // robots.txt politeness (RFC 9309): per-source robots with a banned
    // bot, a named group for OUR crawler (longest-UA-match selection),
    // and a '*' fallback whose rules DIFFER — plus longest-path-match
    // precedence with allow-wins-ties inside the named group. The oracle
    // recomputes both verdict columns from doc_id arithmetic: graftbot is
    // blocked under /private/ and /tmp/ but fine on /doc/ (its group has
    // no /doc/ rule — a group-selection bug that leaks '*' rules flips
    // this), while an unnamed bot sees the exact inverse.
    GraftQuery(
      "url03_robots_eval",
      (s, d) => {
        import s.implicits._
        val robotsText =
          """# synthetic politeness policy
            |User-agent: badbot
            |Disallow: /
            |
            |USER-AGENT: graftbot
            |User-agent: otherbot
            |Disallow: /private/
            |Allow: /private/ok/
            |Disallow: /tmp/
            |Crawl-delay: 2
            |
            |User-agent: *
            |Disallow: /doc/
            |""".stripMargin
        docs(s, d).mapPartitions { it =>
            val robots = Url.parseRobots(robotsText) // parse once per partition
            it.map { case (id, source) =>
              val path = (id % 6) match {
                case 0 => s"/private/doc/$id"
                case 1 => s"/private/ok/doc/$id"
                case 2 => s"/tmp/doc/$id"
                case _ => s"/doc/$id"
              }
              val url = s"https://$source.example.com$path"
              (source, url,
                robots.allowed("graftbot/1.0 (+https://example.com)", path),
                robots.allowed("randombot/2.0", path))
            }
          }
          .toDF("source", "url", "graft_ok", "rand_ok")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n"),
            count(when(col("graft_ok"), lit(1))).as("n_graft_ok"),
            count(when(col("rand_ok"), lit(1))).as("n_rand_ok"),
            sum(when(col("graft_ok"), TA.hash60(col("url")) % M).otherwise(0L))
              .as("fetch_check"))
      },
      Some(s"""WITH p AS (SELECT doc_id, source,
            'https://' || source || '.example.com' ||
              CASE doc_id % 6 WHEN 0 THEN '/private/doc/'
                WHEN 1 THEN '/private/ok/doc/' WHEN 2 THEN '/tmp/doc/'
                ELSE '/doc/' END || CAST(doc_id AS VARCHAR) AS url,
            doc_id % 6 = 1 OR doc_id % 6 >= 3 AS graft_ok,
            doc_id % 6 < 3 AS rand_ok
          FROM documents)
        SELECT source, count(*) AS n,
          count(CASE WHEN graft_ok THEN 1 END) AS n_graft_ok,
          count(CASE WHEN rand_ok THEN 1 END) AS n_rand_ok,
          CAST(sum(CASE WHEN graft_ok THEN ${sqlH60Mod("url")} ELSE 0 END)
            AS BIGINT) AS fetch_check
        FROM p GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // sitemap.xml discovery (the frontier's INPUT: robots points at
    // sitemaps, sitemaps enumerate fetchable URLs with freshness hints):
    // multi-url sitemap files are synthesized per (source, doc_id DIV 8)
    // group — loc (a third carry an entity-escaped query string, which
    // the spec REQUIRES), lastmod dates, optional changefreq, priority —
    // and parsed back through [[graft.etl.Sitemap]] (the HtmlParser
    // tokenizer). The per-source aggregate pins every field: the oracle
    // recomputes loc checksums (AFTER unescaping), lastmod day sums,
    // changefreq counts, and priority tenths from doc_id arithmetic.
    GraftQuery(
      "url04_sitemap_discovery",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .withColumn("g", expr("doc_id DIV 8"))
          .transform(graft.core.Par.byKey(_, col("source"), col("g")))
          .groupBy(col("source"), col("g"))
          .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
          .as[(String, Long, Seq[Long])]
          .flatMap { case (source, _, ids) =>
            val entries = ids.map { id =>
              val q = if (id % 3 == 0) s"?a=$id&amp;b=2" else ""
              val cf = if (id % 4 == 0) "<changefreq>daily</changefreq>" else ""
              f"<url><loc>https://$source.example.com/doc/$id$q</loc>" +
                f"<lastmod>2026-01-${1 + id % 28}%02d</lastmod>$cf" +
                f"<priority>0.${id % 10}</priority></url>"
            }
            val xml = "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
              "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
              entries.mkString + "</urlset>"
            graft.etl.Sitemap.parse(xml).map { u =>
              (source, u.loc, u.lastmod.takeRight(2).toLong,
                u.changefreq == "daily", u.priority.stripPrefix("0.").toLong)
            }
          }
          .toDF("source", "loc", "day", "daily", "tenths")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_urls"),
            sum(TA.hash60(col("loc")) % M).as("loc_check"),
            sum(col("day")).as("day_sum"),
            count(when(col("daily"), lit(1))).as("n_daily"),
            sum(col("tenths")).as("prio_tenths"))
      },
      Some(s"""WITH u AS (SELECT source,
            'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR) ||
              CASE WHEN doc_id % 3 = 0
                THEN '?a=' || CAST(doc_id AS VARCHAR) || '&b=2' ELSE '' END AS loc,
            1 + doc_id % 28 AS day, doc_id % 4 = 0 AS daily,
            doc_id % 10 AS tenths
          FROM documents)
        SELECT source, count(*) AS n_urls,
          CAST(sum(${sqlH60Mod("loc")}) AS BIGINT) AS loc_check,
          CAST(sum(day) AS BIGINT) AS day_sum,
          count(CASE WHEN daily THEN 1 END) AS n_daily,
          CAST(sum(tenths) AS BIGINT) AS prio_tenths
        FROM u GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // The composed crawl frontier in ONE declarative plan (the pipe01
    // pattern applied to this family): discovered URLs arrive in two
    // messy spellings per canonical target (default port / dot segments),
    // normalize through the codegen'd UrlCanonicalize Expression, dedup
    // by canonical URL (keeper = min doc_id — the standard first-seen
    // rule), then a robots.txt politeness policy PARSED AT PLAN TIME and
    // compiled into a longest-match-ordered predicate column (how a real
    // fetch job ships a policy to executors: rules are driver-sized, the
    // predicate rides whole-stage codegen; the '*' group disallows
    // everything, so group selection is load-bearing at compile time).
    // Two shuffles end to end: the canonical dedup and the per-source
    // report.
    GraftQuery(
      "url05_frontier_pipeline",
      (s, d) => {
        val k = expr("doc_id DIV 2")
        val path = when(k % 3 === 0,
          concat(lit("/private/doc/"), k.cast("string")))
          .otherwise(concat(lit("/doc/"), k.cast("string")))
        val messy = when(col("doc_id") % 2 === 0,
          concat(lit("https://"), col("source"), lit(".example.com:443"), path))
          .otherwise(
            concat(lit("https://"), col("source"), lit(".example.com/a/.."), path))
        // plan-time policy compile: named group beats the ban-everything '*'
        val robots = Url.parseRobots(
          "User-agent: graftbot\nDisallow: /private/\n\nUser-agent: *\nDisallow: /\n")
        val rules = robots.groupFor("graftbot/1.0")
        def compiledAllow(p: org.apache.spark.sql.Column) =
          rules.sortBy(-_.path.length).foldRight(lit(true): org.apache.spark.sql.Column) {
            (r, acc) => when(p.startsWith(r.path), lit(r.allow)).otherwise(acc)
          }
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), path.as("path"),
            graft.ops.UrlCanonicalize(messy).as("canon"))
          .groupBy(col("source"), col("canon"), col("path"))
          .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("cnt"))
          .withColumn("allowed", compiledAllow(col("path")))
          .groupBy(col("source"))
          .agg(
            sum(col("cnt")).as("n_discovered"),
            count(lit(1)).as("n_unique"),
            count(when(col("allowed"), lit(1))).as("n_allowed"),
            sum(when(col("allowed"), TA.hash60(col("canon")) % M).otherwise(0L))
              .as("fetch_check"),
            sum(when(col("allowed"), col("keeper")).otherwise(0L)).as("keeper_sum"))
      },
      Some(s"""WITH g AS (SELECT source, doc_id // 2 AS k,
            min(doc_id) AS keeper, count(*) AS cnt
          FROM documents GROUP BY 1, 2),
        c AS (SELECT source, keeper, cnt,
            'https://' || source || '.example.com' ||
              CASE WHEN k % 3 = 0 THEN '/private/doc/' ELSE '/doc/' END ||
              CAST(k AS VARCHAR) AS canon,
            k % 3 <> 0 AS allowed
          FROM g)
        SELECT source,
          CAST(sum(cnt) AS BIGINT) AS n_discovered,
          count(*) AS n_unique,
          count(CASE WHEN allowed THEN 1 END) AS n_allowed,
          CAST(sum(CASE WHEN allowed THEN ${sqlH60Mod("canon")} ELSE 0 END)
            AS BIGINT) AS fetch_check,
          CAST(sum(CASE WHEN allowed THEN keeper ELSE 0 END) AS BIGINT)
            AS keeper_sum
        FROM c GROUP BY 1"""),
    ),
  )
}
