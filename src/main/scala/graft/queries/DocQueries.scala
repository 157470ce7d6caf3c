package graft.queries

import graft.core.{GraftQuery, Tables}
import graft.ops.{TextAnalysis => TA}
import org.apache.spark.sql.functions._

/** Office-document extraction operators (round 16): DOCX — the format a
  * real document crawl meets right after PDF/HTML — through
  * [[graft.etl.DocxText]] (Zip reader + hardened SAX WordprocessingML
  * walk). Same family shape as the shard packs: per-row build+extract
  * map, shuffle-free until the small-keyed rollup, typed fail-stop
  * refusals with a poisoned twin.
  */
object DocQueries {

  private val M = TarQueries.M

  val all: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // DOCX text-extraction round trip: every doc becomes a three-
    // paragraph WordprocessingML package (title / body / a tab+break
    // metadata line, exercising <w:t>, <w:tab/>, <w:br/>), the extractor
    // walks it back, and DuckDB recomputes length and checksum over the
    // exact expected text — one wrong byte in the zip deflate path, the
    // XML walk, or the tab/break mapping breaks the hash. The extract is
    // also required to be exact in-row (self-check) so a disagreement
    // can never average out in the aggregate.
    GraftQuery(
      "doc01_docx_extract",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"), col("lang"))
          .transform(graft.core.Par.spread)
          .as[(String, Long, String, String)]
          .map { case (source, id, text, lang) =>
            val paras = Seq(s"title $id", text, s"meta\t$lang\nsrc $source")
            val docx = graft.etl.DocxText.write(paras)
            val got = graft.etl.DocxText.extract(docx)
            require(got == paras.mkString("\n"), s"docx round trip doc $id")
            (source, got.length.toLong, got)
          }
          .toDF("source", "n_chars", "txt")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("char_sum"),
            sum(TA.hash60(col("txt")) % M).as("txt_check"))
      },
      Some(s"""WITH x AS (SELECT source,
            'title ' || CAST(doc_id AS VARCHAR) || chr(10) || text ||
              chr(10) || 'meta' || chr(9) || lang || chr(10) ||
              'src ' || source AS txt
          FROM documents)
        SELECT source, count(*) AS n_docs,
          CAST(sum(length(txt)) AS BIGINT) AS char_sum,
          CAST(sum(${TA.Sql.hash60("txt")} % $M) AS BIGINT) AS txt_check
        FROM x GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Poisoned DOCX scan (the family's poisoned-twin contract): every
    // eleventh file is rotten — the word/document.xml part missing, the
    // archive truncated, the XML malformed, or a DOCTYPE smuggled in
    // (the XXE/billion-laughs probe a crawled .docx can carry) — and the
    // scan yields one TYPED error row per rotten file while every
    // healthy file still extracts exactly.
    GraftQuery(
      "doc02_poisoned_docx",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"))
          .transform(graft.core.Par.spread)
          .as[(String, Long, String)]
          .map { case (source, id, text) =>
            val docx = graft.etl.DocxText.write(Seq(s"doc $id", text))
            val poisoned =
              if (id % 11 != 3) docx
              else (id % 4) match {
                case 0 => // strip the document part: structurally a fine zip
                  graft.ops.Zip.write(graft.ops.Zip.read(docx)
                    .filterNot(_.name == "word/document.xml"))
                case 1 => java.util.Arrays.copyOf(docx, docx.length / 2)
                case 2 => // malformed XML inside a healthy zip
                  graft.ops.Zip.write(graft.ops.Zip.read(docx).map(m =>
                    if (m.name == "word/document.xml")
                      m.copy(body = "<w:document><w:body><w:p><<<".getBytes("UTF-8"))
                    else m))
                case _ => // DOCTYPE: must refuse, never expand
                  graft.ops.Zip.write(graft.ops.Zip.read(docx).map(m =>
                    if (m.name == "word/document.xml")
                      m.copy(body = ("""<!DOCTYPE d [<!ENTITY x "y">]>""" +
                        new String(m.body, "UTF-8")
                          .replaceFirst("""<\?xml[^?]*\?>""", "")).getBytes("UTF-8"))
                    else m))
              }
            graft.etl.DocxText.extractSafe(poisoned) match {
              case Right(t) => (source, 1L, 0L, t.length.toLong, "")
              case Left(kind) => (source, 0L, 1L, 0L, kind)
            }
          }
          .toDF("source", "ok", "bad", "n_chars", "kind")
          .groupBy(col("source"))
          .agg(
            sum(col("ok")).as("n_ok"),
            sum(col("bad")).as("n_bad"),
            sum(col("n_chars")).as("char_sum"),
            sum(when(col("kind") === "bad_docx", 1L).otherwise(0L)).as("n_docx"),
            sum(when(col("kind").isin("bad_zip", "truncated"), 1L)
              .otherwise(0L)).as("n_zip"))
      },
      Some("""WITH x AS (SELECT source, doc_id AS id,
            doc_id % 11 = 3 AS rot, doc_id % 4 AS mode,
            length('doc ' || CAST(doc_id AS VARCHAR) || chr(10) || text) AS n
          FROM documents)
        SELECT source,
          CAST(count(CASE WHEN NOT rot THEN 1 END) AS BIGINT) AS n_ok,
          CAST(count(CASE WHEN rot THEN 1 END) AS BIGINT) AS n_bad,
          CAST(sum(CASE WHEN NOT rot THEN n ELSE 0 END) AS BIGINT) AS char_sum,
          CAST(count(CASE WHEN rot AND mode IN (0, 2, 3) THEN 1 END)
            AS BIGINT) AS n_docx,
          CAST(count(CASE WHEN rot AND mode = 1 THEN 1 END) AS BIGINT) AS n_zip
        FROM x GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // EPUB extraction round trip (round 16 — [[graft.etl.EpubText]], the
    // book-corpus front door): every doc becomes a two-chapter OCF
    // container (mimetype member, container.xml, OPF with dc:title/
    // dc:language, XHTML chapters with DOCTYPEs), the extractor walks
    // container → OPF → spine → body text, and DuckDB recomputes the
    // title/language/chapter checksum from the doc_id arithmetic. The
    // in-row require pins chapter-exactness so a walk defect can never
    // average out. Per-row map, shuffle-free rollup.
    GraftQuery(
      "doc03_epub_extract",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"), col("lang"))
          .transform(graft.core.Par.spread)
          .as[(String, Long, String, String)]
          .map { case (source, id, text, lang) =>
            val words = text.trim.split("\\s+").toVector
            val cut = words.length / 2
            val chapters = Seq(words.take(cut).mkString(" "),
              words.drop(cut).mkString(" "))
            val epub = graft.etl.EpubText.write(s"Doc $id", lang, chapters)
            val e = graft.etl.EpubText.extract(epub)
            require(e.title == s"Doc $id" && e.language == lang &&
              e.chapters == chapters.map(c =>
                if (c.isEmpty) "" else c).toVector,
              s"epub round trip doc $id")
            val ck = s"${e.title}|${e.language}|${e.chapters.mkString("|")}"
            (source, e.text.length.toLong, ck)
          }
          .toDF("source", "n_chars", "ck")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_books"),
            sum(col("n_chars")).as("char_sum"),
            sum(TA.hash60(col("ck")) % M).as("book_check"))
      },
      Some(raw"""WITH x AS (SELECT source, doc_id AS id, lang,
            regexp_split_to_array(trim(text), '\s+') AS a
          FROM documents),
        y AS (SELECT source, id, lang,
            array_to_string(a[1 : len(a) // 2], ' ') AS ch1,
            array_to_string(a[len(a) // 2 + 1 : len(a)], ' ') AS ch2
          FROM x)
        SELECT source, count(*) AS n_books,
          CAST(sum(length(ch1) + length(ch2) + 2) AS BIGINT) AS char_sum,
          CAST(sum(${TA.Sql.hash60(
            "'Doc ' || CAST(id AS VARCHAR) || '|' || lang || '|' || ch1 || '|' || ch2")} % $M)
            AS BIGINT) AS book_check
        FROM y GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Poisoned EPUB scan (the family's poisoned-twin contract): every
    // eleventh container is rotten — wrong mimetype, container.xml
    // stripped, a chapter's XML broken, or a hard truncation — one TYPED
    // error row per rotten file, every healthy book still extracts.
    GraftQuery(
      "doc04_poisoned_epub",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"))
          .transform(graft.core.Par.spread)
          .as[(String, Long, String)]
          .map { case (source, id, text) =>
            val epub = graft.etl.EpubText.write(s"B$id", "en", Seq(text))
            val poisoned =
              if (id % 11 != 3) epub
              else (id % 4) match {
                case 0 => graft.ops.Zip.write(graft.ops.Zip.read(epub).map(m =>
                  if (m.name == "mimetype")
                    m.copy(body = "application/zip".getBytes("US-ASCII"))
                  else m))
                case 1 => graft.ops.Zip.write(graft.ops.Zip.read(epub)
                  .filterNot(_.name == "META-INF/container.xml"))
                case 2 => graft.ops.Zip.write(graft.ops.Zip.read(epub).map(m =>
                  if (m.name.endsWith(".xhtml"))
                    m.copy(body = "<html><body><p>unclosed".getBytes("UTF-8"))
                  else m))
                case _ => java.util.Arrays.copyOf(epub, epub.length / 2)
              }
            graft.etl.EpubText.extractSafe(poisoned) match {
              case Right(e) => (source, 1L, 0L, e.text.length.toLong, "")
              case Left(kind) => (source, 0L, 1L, 0L, kind)
            }
          }
          .toDF("source", "ok", "bad", "n_chars", "kind")
          .groupBy(col("source"))
          .agg(
            sum(col("ok")).as("n_ok"),
            sum(col("bad")).as("n_bad"),
            sum(col("n_chars")).as("char_sum"),
            sum(when(col("kind") === "bad_epub", 1L).otherwise(0L)).as("n_epub"),
            sum(when(col("kind").isin("bad_zip", "truncated"), 1L)
              .otherwise(0L)).as("n_zip"))
      },
      Some("""WITH x AS (SELECT source, doc_id AS id,
            doc_id % 11 = 3 AS rot, doc_id % 4 AS mode,
            length(trim(text)) AS n
          FROM documents)
        SELECT source,
          CAST(count(CASE WHEN NOT rot THEN 1 END) AS BIGINT) AS n_ok,
          CAST(count(CASE WHEN rot THEN 1 END) AS BIGINT) AS n_bad,
          CAST(sum(CASE WHEN NOT rot THEN n ELSE 0 END) AS BIGINT) AS char_sum,
          CAST(count(CASE WHEN rot AND mode IN (0, 1, 2) THEN 1 END)
            AS BIGINT) AS n_epub,
          CAST(count(CASE WHEN rot AND mode = 3 THEN 1 END) AS BIGINT) AS n_zip
        FROM x GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // XLSX extraction round trip (round 17 — [[graft.etl.XlsxText]], the
    // spreadsheet leg of the office trio): every doc becomes a two-sheet
    // SpreadsheetML package exercising shared strings, inline strings,
    // numbers, booleans, and a date-styled serial (builtin numFmt 14,
    // 1900 epoch); the extractor walks workbook → rels → sheets →
    // sharedStrings/styles back to text, and DuckDB recomputes the exact
    // expected layout — including the Excel serial→ISO date conversion —
    // from doc_id arithmetic. The in-row require pins byte-exactness so
    // a walk defect can never average out. Per-row map, shuffle-free
    // rollup: at 100 TB this is one pass, no joins.
    GraftQuery(
      "doc05_xlsx_extract",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"), col("lang"))
          .transform(graft.core.Par.spread)
          .as[(String, Long, String, String)]
          .map { case (source, id, text, lang) =>
            import graft.etl.XlsxText._
            val serial = 45000L + id % 1000
            val xlsx = write(Seq(
              "data" -> Seq(
                Seq[Cell](SStr(s"title $id"), SInline(text)),
                Seq[Cell](SNum(id.toDouble), SBool(id % 2 == 0),
                  SDate(serial))),
              "meta" -> Seq(Seq[Cell](SStr(lang), SStr(source)))))
            val got = extract(xlsx)
            val date = java.time.LocalDate.of(1899, 12, 30)
              .plusDays(serial).toString
            val want = s"sheet\tdata\ntitle $id\t$text\n$id\t" +
              (if (id % 2 == 0) "TRUE" else "FALSE") +
              s"\t$date\nsheet\tmeta\n$lang\t$source"
            require(got == want, s"xlsx round trip doc $id")
            (source, got.length.toLong, got)
          }
          .toDF("source", "n_chars", "txt")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_books"),
            sum(col("n_chars")).as("char_sum"),
            sum(TA.hash60(col("txt")) % M).as("txt_check"))
      },
      Some(s"""WITH x AS (SELECT source,
            'sheet' || chr(9) || 'data' || chr(10) ||
              'title ' || CAST(doc_id AS VARCHAR) || chr(9) || text ||
              chr(10) || CAST(doc_id AS VARCHAR) || chr(9) ||
              CASE WHEN doc_id % 2 = 0 THEN 'TRUE' ELSE 'FALSE' END ||
              chr(9) ||
              CAST(DATE '1899-12-30' +
                CAST(45000 + doc_id % 1000 AS INTEGER) AS VARCHAR) ||
              chr(10) || 'sheet' || chr(9) || 'meta' || chr(10) ||
              lang || chr(9) || source AS txt
          FROM documents)
        SELECT source, count(*) AS n_books,
          CAST(sum(length(txt)) AS BIGINT) AS char_sum,
          CAST(sum(${TA.Sql.hash60("txt")} % $M) AS BIGINT) AS txt_check
        FROM x GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Poisoned XLSX scan: every eleventh package is rotten — workbook
    // part stripped, archive truncated, sheet XML malformed, or an
    // out-of-range shared-string index (the silent-corruption probe: a
    // lying index must refuse, never read another row's text) — one
    // TYPED error row per rotten file, every healthy sheet extracts.
    GraftQuery(
      "doc06_poisoned_xlsx",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"))
          .transform(graft.core.Par.spread)
          .as[(String, Long, String)]
          .map { case (source, id, text) =>
            import graft.etl.XlsxText._
            val xlsx = write(Seq(
              "s" -> Seq(Seq[Cell](SStr(s"doc $id"), SInline(text)))))
            val poisoned =
              if (id % 11 != 3) xlsx
              else (id % 4) match {
                case 0 => graft.ops.Zip.write(graft.ops.Zip.read(xlsx)
                  .filterNot(_.name == "xl/workbook.xml"))
                case 1 => java.util.Arrays.copyOf(xlsx, xlsx.length / 2)
                case 2 => graft.ops.Zip.write(graft.ops.Zip.read(xlsx).map(m =>
                  if (m.name == "xl/worksheets/sheet1.xml")
                    m.copy(body = "<worksheet><sheetData><<<".getBytes("UTF-8"))
                  else m))
                case _ => graft.ops.Zip.write(graft.ops.Zip.read(xlsx).map(m =>
                  if (m.name == "xl/worksheets/sheet1.xml")
                    m.copy(body = ("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
                      """<sheetData><row r="1"><c r="A1" t="s"><v>99</v></c></row>""" +
                      "</sheetData></worksheet>").getBytes("UTF-8"))
                  else m))
              }
            extractSafe(poisoned) match {
              case Right(t) => (source, 1L, 0L, t.length.toLong, "")
              case Left(kind) => (source, 0L, 1L, 0L, kind)
            }
          }
          .toDF("source", "ok", "bad", "n_chars", "kind")
          .groupBy(col("source"))
          .agg(
            sum(col("ok")).as("n_ok"),
            sum(col("bad")).as("n_bad"),
            sum(col("n_chars")).as("char_sum"),
            sum(when(col("kind") === "bad_xlsx", 1L).otherwise(0L)).as("n_xlsx"),
            sum(when(col("kind").isin("bad_zip", "truncated"), 1L)
              .otherwise(0L)).as("n_zip"))
      },
      Some("""WITH x AS (SELECT source, doc_id AS id,
            doc_id % 11 = 3 AS rot, doc_id % 4 AS mode,
            length('sheet' || chr(9) || 's' || chr(10) ||
              'doc ' || CAST(doc_id AS VARCHAR) || chr(9) || text) AS n
          FROM documents)
        SELECT source,
          CAST(count(CASE WHEN NOT rot THEN 1 END) AS BIGINT) AS n_ok,
          CAST(count(CASE WHEN rot THEN 1 END) AS BIGINT) AS n_bad,
          CAST(sum(CASE WHEN NOT rot THEN n ELSE 0 END) AS BIGINT) AS char_sum,
          CAST(count(CASE WHEN rot AND mode IN (0, 2, 3) THEN 1 END)
            AS BIGINT) AS n_xlsx,
          CAST(count(CASE WHEN rot AND mode = 1 THEN 1 END) AS BIGINT) AS n_zip
        FROM x GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // PPTX slide-text round trip (round 17 — [[graft.etl.PptxText]], the
    // third OOXML leg): every doc becomes a two-slide deck whose slide
    // PARTS are numbered in reverse, so a correct extraction must follow
    // sldIdLst + relationship order, never filenames; a:br line breaks
    // round-trip inside paragraphs. DuckDB recomputes the expected text.
    GraftQuery(
      "doc07_pptx_extract",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"), col("lang"))
          .transform(graft.core.Par.spread)
          .as[(String, Long, String, String)]
          .map { case (source, id, text, lang) =>
            val deck = Seq(
              Seq(s"title $id", text),
              Seq(s"lang $lang\nsrc $source"))
            val pptx = graft.etl.PptxText.write(deck)
            val got = graft.etl.PptxText.extract(pptx)
            val want = s"title $id\n$text\nlang $lang\nsrc $source"
            require(got == want, s"pptx round trip doc $id")
            (source, got.length.toLong, got)
          }
          .toDF("source", "n_chars", "txt")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_decks"),
            sum(col("n_chars")).as("char_sum"),
            sum(TA.hash60(col("txt")) % M).as("txt_check"))
      },
      Some(s"""WITH x AS (SELECT source,
            'title ' || CAST(doc_id AS VARCHAR) || chr(10) || text ||
              chr(10) || 'lang ' || lang || chr(10) ||
              'src ' || source AS txt
          FROM documents)
        SELECT source, count(*) AS n_decks,
          CAST(sum(length(txt)) AS BIGINT) AS char_sum,
          CAST(sum(${TA.Sql.hash60("txt")} % $M) AS BIGINT) AS txt_check
        FROM x GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Poisoned PPTX scan: every eleventh deck is rotten — a slide rel
    // pointing at a missing part, a truncation, malformed slide XML, or
    // a DOCTYPE (XXE probe) — one TYPED error row per rotten file.
    GraftQuery(
      "doc08_poisoned_pptx",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"))
          .transform(graft.core.Par.spread)
          .as[(String, Long, String)]
          .map { case (source, id, text) =>
            val pptx = graft.etl.PptxText.write(Seq(Seq(s"doc $id", text)))
            val poisoned =
              if (id % 11 != 3) pptx
              else (id % 4) match {
                case 0 => graft.ops.Zip.write(graft.ops.Zip.read(pptx)
                  .filterNot(_.name.startsWith("ppt/slides/")))
                case 1 => java.util.Arrays.copyOf(pptx, pptx.length / 2)
                case 2 => graft.ops.Zip.write(graft.ops.Zip.read(pptx).map(m =>
                  if (m.name.startsWith("ppt/slides/"))
                    m.copy(body = "<p:sld><p:cSld><<<".getBytes("UTF-8"))
                  else m))
                case _ => graft.ops.Zip.write(graft.ops.Zip.read(pptx).map(m =>
                  if (m.name == "ppt/presentation.xml")
                    m.copy(body = ("""<!DOCTYPE d [<!ENTITY x "y">]>""" +
                      new String(m.body, "UTF-8")
                        .replaceFirst("""<\?xml[^?]*\?>""", "")).getBytes("UTF-8"))
                  else m))
              }
            graft.etl.PptxText.extractSafe(poisoned) match {
              case Right(t) => (source, 1L, 0L, t.length.toLong, "")
              case Left(kind) => (source, 0L, 1L, 0L, kind)
            }
          }
          .toDF("source", "ok", "bad", "n_chars", "kind")
          .groupBy(col("source"))
          .agg(
            sum(col("ok")).as("n_ok"),
            sum(col("bad")).as("n_bad"),
            sum(col("n_chars")).as("char_sum"),
            sum(when(col("kind") === "bad_pptx", 1L).otherwise(0L)).as("n_pptx"),
            sum(when(col("kind").isin("bad_zip", "truncated"), 1L)
              .otherwise(0L)).as("n_zip"))
      },
      Some("""WITH x AS (SELECT source, doc_id AS id,
            doc_id % 11 = 3 AS rot, doc_id % 4 AS mode,
            length('doc ' || CAST(doc_id AS VARCHAR) || chr(10) || text) AS n
          FROM documents)
        SELECT source,
          CAST(count(CASE WHEN NOT rot THEN 1 END) AS BIGINT) AS n_ok,
          CAST(count(CASE WHEN rot THEN 1 END) AS BIGINT) AS n_bad,
          CAST(sum(CASE WHEN NOT rot THEN n ELSE 0 END) AS BIGINT) AS char_sum,
          CAST(count(CASE WHEN rot AND mode IN (0, 2, 3) THEN 1 END)
            AS BIGINT) AS n_pptx,
          CAST(count(CASE WHEN rot AND mode = 1 THEN 1 END) AS BIGINT) AS n_zip
        FROM x GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // ODT extraction round trip (round 17 — [[graft.etl.OdtText]], the
    // OpenDocument leg: LibreOffice corpora ship .odt alongside OOXML):
    // every doc becomes a three-paragraph ODF package (stored mimetype,
    // manifest, content.xml) and the linear teletype walk must recover
    // the exact paragraphs; DuckDB recomputes the expected join. The
    // in-row require pins byte-exactness. Per-row map, shuffle-free
    // rollup — one pass at 100 TB.
    GraftQuery(
      "doc09_odt_extract",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"), col("lang"))
          .transform(graft.core.Par.spread)
          .as[(String, Long, String, String)]
          .map { case (source, id, text, lang) =>
            val odt = graft.etl.OdtText.write(Seq(
              s"title $id", text, s"$lang $source"))
            val got = graft.etl.OdtText.extract(odt)
            val want = s"title $id\n$text\n$lang $source"
            require(got == want, s"odt round trip doc $id")
            (source, got.length.toLong, got)
          }
          .toDF("source", "n_chars", "txt")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("char_sum"),
            sum(TA.hash60(col("txt")) % M).as("txt_check"))
      },
      Some(s"""WITH x AS (SELECT source,
            'title ' || CAST(doc_id AS VARCHAR) || chr(10) || text ||
              chr(10) || lang || ' ' || source AS txt
          FROM documents)
        SELECT source, count(*) AS n_docs,
          CAST(sum(length(txt)) AS BIGINT) AS char_sum,
          CAST(sum(${TA.Sql.hash60("txt")} % $M) AS BIGINT) AS txt_check
        FROM x GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Poisoned ODT scan (the doc06/doc08 contract on the ODF leg):
    // every eleventh package rots — content.xml stripped, archive
    // truncated, XML malformed, or a LYING mimetype (application/zip
    // over real ODF content: the sniffing probe — extracting anyway
    // would treat every mislabeled archive as prose) — one typed error
    // row each, every healthy package extracts exactly.
    GraftQuery(
      "doc10_poisoned_odt",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"))
          .transform(graft.core.Par.spread)
          .as[(String, Long, String)]
          .map { case (source, id, text) =>
            val odt = graft.etl.OdtText.write(Seq(s"doc $id", text))
            val poisoned =
              if (id % 11 != 3) odt
              else (id % 4) match {
                case 0 => graft.ops.Zip.write(graft.ops.Zip.read(odt)
                  .filterNot(_.name == "content.xml"))
                case 1 => java.util.Arrays.copyOf(odt, odt.length / 2)
                case 2 => graft.ops.Zip.write(graft.ops.Zip.read(odt).map(m =>
                  if (m.name == "content.xml")
                    m.copy(body = "<office:document-content><<<".getBytes("UTF-8"))
                  else m))
                case _ => graft.ops.Zip.write(graft.ops.Zip.read(odt).map(m =>
                  if (m.name == "mimetype")
                    m.copy(body = "application/zip".getBytes("UTF-8"))
                  else m))
              }
            graft.etl.OdtText.extractSafe(poisoned) match {
              case Right(t) => (source, 1L, 0L, t.length.toLong, "")
              case Left(kind) => (source, 0L, 1L, 0L, kind)
            }
          }
          .toDF("source", "ok", "bad", "n_chars", "kind")
          .groupBy(col("source"))
          .agg(
            sum(col("ok")).as("n_ok"),
            sum(col("bad")).as("n_bad"),
            sum(col("n_chars")).as("char_sum"),
            sum(when(col("kind") === "bad_odt", 1L).otherwise(0L)).as("n_odt"),
            sum(when(col("kind").isin("bad_zip", "truncated"), 1L)
              .otherwise(0L)).as("n_zip"))
      },
      Some("""WITH x AS (SELECT source, doc_id AS id,
            doc_id % 11 = 3 AS rot, doc_id % 4 AS mode,
            length('doc ' || CAST(doc_id AS VARCHAR) || chr(10) || text) AS n
          FROM documents)
        SELECT source,
          CAST(count(CASE WHEN NOT rot THEN 1 END) AS BIGINT) AS n_ok,
          CAST(count(CASE WHEN rot THEN 1 END) AS BIGINT) AS n_bad,
          CAST(sum(CASE WHEN NOT rot THEN n ELSE 0 END) AS BIGINT) AS char_sum,
          CAST(count(CASE WHEN rot AND mode IN (0, 2, 3) THEN 1 END)
            AS BIGINT) AS n_odt,
          CAST(count(CASE WHEN rot AND mode = 1 THEN 1 END) AS BIGINT) AS n_zip
        FROM x GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // RTF extraction round trip (round 17 — [[graft.etl.RtfText]], the
    // legacy-office leg: old dumps and mail attachments ship .rtf):
    // every doc becomes an RTF document whose body exercises escaped
    // specials and \par framing; the tokenizer must recover the exact
    // text. DuckDB recomputes the expected join. Per-row map,
    // shuffle-free rollup.
    GraftQuery(
      "doc11_rtf_extract",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"), col("lang"))
          .as[(String, Long, String, String)]
          .map { case (source, id, text, lang) =>
            val rtf = graft.etl.RtfText.write(s"title $id\n$text\n$lang {$source}")
            val got = graft.etl.RtfText.extract(rtf)
            val want = s"title $id\n$text\n$lang {$source}"
            require(got == want, s"rtf round trip doc $id")
            (source, got.length.toLong, got)
          }
          .toDF("source", "n_chars", "txt")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("char_sum"),
            sum(TA.hash60(col("txt")) % M).as("txt_check"))
      },
      Some(s"""WITH x AS (SELECT source,
            'title ' || CAST(doc_id AS VARCHAR) || chr(10) || text ||
              chr(10) || lang || ' {' || source || '}' AS txt
          FROM documents)
        SELECT source, count(*) AS n_docs,
          CAST(sum(length(txt)) AS BIGINT) AS char_sum,
          CAST(sum(${TA.Sql.hash60("txt")} % $M) AS BIGINT) AS txt_check
        FROM x GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Poisoned RTF scan: every eleventh document rots four ways — tail
    // truncation (unbalanced root), opener corruption, a stray closing
    // brace after the root group, halving — each a typed bad_rtf row,
    // every healthy document extracts exactly.
    GraftQuery(
      "doc12_poisoned_rtf",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"))
          .as[(String, Long, String)]
          .map { case (source, id, text) =>
            val rtf = graft.etl.RtfText.write(s"doc $id\n$text")
            val poisoned =
              if (id % 11 != 3) rtf
              else (id % 4) match {
                case 0 => java.util.Arrays.copyOf(rtf, rtf.length - 1)
                case 1 => val b = rtf.clone(); b(1) = 'X'.toByte; b
                case 2 => rtf ++ "}".getBytes("UTF-8")
                case _ => java.util.Arrays.copyOf(rtf, math.max(6, rtf.length / 2))
              }
            graft.etl.RtfText.extractSafe(poisoned) match {
              case Right(t) => (source, 1L, 0L, t.length.toLong, "")
              case Left(kind) => (source, 0L, 1L, 0L, kind)
            }
          }
          .toDF("source", "ok", "bad", "n_chars", "kind")
          .groupBy(col("source"))
          .agg(
            sum(col("ok")).as("n_ok"),
            sum(col("bad")).as("n_bad"),
            sum(col("n_chars")).as("char_sum"),
            sum(when(col("kind") === "bad_rtf", 1L).otherwise(0L)).as("n_rtf"))
      },
      Some("""WITH x AS (SELECT source, doc_id % 11 = 3 AS rot,
            length('doc ' || CAST(doc_id AS VARCHAR) || chr(10) || text) AS n
          FROM documents)
        SELECT source,
          CAST(count(CASE WHEN NOT rot THEN 1 END) AS BIGINT) AS n_ok,
          CAST(count(CASE WHEN rot THEN 1 END) AS BIGINT) AS n_bad,
          CAST(sum(CASE WHEN NOT rot THEN n ELSE 0 END) AS BIGINT) AS char_sum,
          CAST(count(CASE WHEN rot THEN 1 END) AS BIGINT) AS n_rtf
        FROM x GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // ODS extraction round trip (round 17 — [[graft.etl.OdsText]], the
    // OpenDocument spreadsheet twin of doc05): every doc becomes a
    // two-sheet ODS exercising string, float, boolean and ISO-date
    // cells plus a padded empty-cell trailer (number-columns-repeated)
    // the trim semantics must drop; the extractor emits the exact
    // XlsxText layout and DuckDB recomputes it from doc_id arithmetic.
    // Per-row map, shuffle-free rollup.
    GraftQuery(
      "doc13_ods_extract",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"), col("lang"))
          .transform(graft.core.Par.spread)
          .as[(String, Long, String, String)]
          .map { case (source, id, text, lang) =>
            import graft.etl.OdsText._
            val iso = java.time.LocalDate.of(2020, 1, 1).plusDays(id % 1000).toString
            val ods = write(Seq(
              "data" -> Seq(
                Seq[Cell](OStr(s"title $id"), OStr(text)),
                Seq[Cell](ONum(id.toDouble), OBool(id % 2 == 0), ODate(iso))),
              "meta" -> Seq(Seq[Cell](OStr(lang), OStr(source)))))
            val got = extract(ods)
            val want = s"sheet\tdata\ntitle $id\t$text\n$id\t" +
              (if (id % 2 == 0) "TRUE" else "FALSE") +
              s"\t$iso\nsheet\tmeta\n$lang\t$source"
            require(got == want, s"ods round trip doc $id")
            (source, got.length.toLong, got)
          }
          .toDF("source", "n_chars", "txt")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_books"),
            sum(col("n_chars")).as("char_sum"),
            sum(TA.hash60(col("txt")) % M).as("txt_check"))
      },
      Some(s"""WITH x AS (SELECT source,
            'sheet' || chr(9) || 'data' || chr(10) ||
              'title ' || CAST(doc_id AS VARCHAR) || chr(9) || text ||
              chr(10) || CAST(doc_id AS VARCHAR) || chr(9) ||
              CASE WHEN doc_id % 2 = 0 THEN 'TRUE' ELSE 'FALSE' END ||
              chr(9) ||
              CAST(DATE '2020-01-01' +
                CAST(doc_id % 1000 AS INTEGER) AS VARCHAR) ||
              chr(10) || 'sheet' || chr(9) || 'meta' || chr(10) ||
              lang || chr(9) || source AS txt
          FROM documents)
        SELECT source, count(*) AS n_books,
          CAST(sum(length(txt)) AS BIGINT) AS char_sum,
          CAST(sum(${TA.Sql.hash60("txt")} % $M) AS BIGINT) AS txt_check
        FROM x GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Poisoned ODS scan: every eleventh package rots — content.xml
    // stripped, archive truncated, a repeat bomb (2M-wide non-empty
    // cell: the materialization attack the trim/cap semantics exist
    // for), or a lying boolean — one typed row each, every healthy
    // sheet extracts exactly.
    GraftQuery(
      "doc14_poisoned_ods",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"))
          .transform(graft.core.Par.spread)
          .as[(String, Long, String)]
          .map { case (source, id, text) =>
            import graft.etl.OdsText._
            val ods = write(Seq(
              "s" -> Seq(Seq[Cell](OStr(s"doc $id"), OStr(text)))))
            val poisoned =
              if (id % 11 != 3) ods
              else (id % 4) match {
                case 0 => graft.ops.Zip.write(graft.ops.Zip.read(ods)
                  .filterNot(_.name == "content.xml"))
                case 1 => java.util.Arrays.copyOf(ods, ods.length / 2)
                case 2 => graft.ops.Zip.write(graft.ops.Zip.read(ods).map(m =>
                  if (m.name == "content.xml")
                    m.copy(body = new String(m.body, "UTF-8").replaceFirst(
                      "<table:table-row>",
                      """<table:table-row><table:table-cell office:value-type="string" table:number-columns-repeated="2000000"><text:p>bomb</text:p></table:table-cell>""")
                      .getBytes("UTF-8"))
                  else m))
                case _ => graft.ops.Zip.write(graft.ops.Zip.read(ods).map(m =>
                  if (m.name == "content.xml")
                    m.copy(body = new String(m.body, "UTF-8").replaceFirst(
                      "office:value-type=\"string\"",
                      "office:value-type=\"boolean\" office:boolean-value=\"perhaps\"")
                      .getBytes("UTF-8"))
                  else m))
              }
            extractSafe(poisoned) match {
              case Right(t) => (source, 1L, 0L, t.length.toLong, "")
              case Left(kind) => (source, 0L, 1L, 0L, kind)
            }
          }
          .toDF("source", "ok", "bad", "n_chars", "kind")
          .groupBy(col("source"))
          .agg(
            sum(col("ok")).as("n_ok"),
            sum(col("bad")).as("n_bad"),
            sum(col("n_chars")).as("char_sum"),
            sum(when(col("kind") === "bad_ods", 1L).otherwise(0L)).as("n_ods"),
            sum(when(col("kind").isin("bad_zip", "truncated"), 1L)
              .otherwise(0L)).as("n_zip"))
      },
      Some("""WITH x AS (SELECT source, doc_id AS id,
            doc_id % 11 = 3 AS rot, doc_id % 4 AS mode,
            length('sheet' || chr(9) || 's' || chr(10) ||
              'doc ' || CAST(doc_id AS VARCHAR) || chr(9) || text) AS n
          FROM documents)
        SELECT source,
          CAST(count(CASE WHEN NOT rot THEN 1 END) AS BIGINT) AS n_ok,
          CAST(count(CASE WHEN rot THEN 1 END) AS BIGINT) AS n_bad,
          CAST(sum(CASE WHEN NOT rot THEN n ELSE 0 END) AS BIGINT) AS char_sum,
          CAST(count(CASE WHEN rot AND mode IN (0, 2, 3) THEN 1 END)
            AS BIGINT) AS n_ods,
          CAST(count(CASE WHEN rot AND mode = 1 THEN 1 END) AS BIGINT) AS n_zip
        FROM x GROUP BY 1"""),
    ),
  )
}
