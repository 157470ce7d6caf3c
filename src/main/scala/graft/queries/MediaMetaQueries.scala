package graft.queries

import graft.core.{GraftQuery, Tables}
import graft.ops.{TextAnalysis => TA}
import org.apache.spark.sql.functions._

/** Media METADATA governance operators (mm20+), split from MediaQueries
  * at the ~1000 LoC pack bound: the EXIF audit + scrub pass a multimodal
  * crawl pipeline runs before training (GPS/device/timestamp PII).
  */
object MediaMetaQueries {

  private val M = TarQueries.M

  val all: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // EXIF audit + scrub: every doc becomes a JPEG whose EXIF block is
    // derived from doc_id (orientation cycles 1..8, a hash-selected
    // fifth carries GPS, byte order alternates II/MM); the reader walks
    // APP1 → TIFF IFDs and reports the fields, the scrubber removes the
    // EXIF segment, and the re-parse of the scrubbed bytes must come
    // back empty with the image (COM) bytes intact. DuckDB recomputes
    // every aggregate from the doc_id arithmetic — one wrong byte in
    // either IFD walk or the scrub breaks the counts or the checksum.
    GraftQuery(
      "mm20_exif_audit",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"))
          .as[(String, Long, String)]
          .map { case (source, id, text) =>
            val orientation = (id % 8 + 1).toInt
            val dateTime = f"2024:01:${id % 28 + 1}%02d 10:00:00"
            val make = s"cam${id % 3}"
            val gps = if (id % 5 == 0) Some((id % 90 + 1, 1L)) else None
            val jpeg = graft.ops.Exif.buildJpeg(orientation, dateTime, make,
              gps, littleEndian = id % 2 == 0, comment = text.take(64))
            val meta = graft.ops.Exif.parse(jpeg)
            val scrubbed = graft.ops.Exif.scrub(jpeg)
            val after = graft.ops.Exif.parse(scrubbed)
            // clean scrub = no metadata survives, the EXIF bytes are gone,
            // and the walk is idempotent (image payload untouched)
            val cleanScrub = after == graft.ops.Exif.Meta(None, None, None, None,
              hasGps = false, hasExifIfd = false) &&
              scrubbed.length < jpeg.length &&
              java.util.Arrays.equals(graft.ops.Exif.scrub(scrubbed), scrubbed)
            (source,
              meta.orientation.getOrElse(0).toLong,
              if (meta.hasGps) 1L else 0L,
              meta.dateTime.getOrElse(""),
              if (cleanScrub) 1L else 0L)
          }
          .toDF("source", "orientation", "has_gps", "dt", "scrub_clean")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_imgs"),
            sum(col("orientation")).as("orientation_sum"),
            sum(col("has_gps")).as("n_gps"),
            sum(TA.hash60(col("dt")) % M).as("dt_check"),
            sum(col("scrub_clean")).as("n_scrub_clean"))
      },
      Some(s"""SELECT source, count(*) AS n_imgs,
          CAST(sum(doc_id % 8 + 1) AS BIGINT) AS orientation_sum,
          CAST(count(CASE WHEN doc_id % 5 = 0 THEN 1 END) AS BIGINT) AS n_gps,
          CAST(sum(${TA.Sql.hash60(
            "'2024:01:' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || ' 10:00:00'")} % $M)
            AS BIGINT) AS dt_check,
          CAST(count(*) AS BIGINT) AS n_scrub_clean
        FROM documents GROUP BY 1"""),
    ),
  )
}
