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

    // ------------------------------------------------------------------
    // ISOBMFF container audit (round 15 — [[graft.ops.Isobmff]], the
    // MP4/MOV + HEIF/AVIF box walk; the video/modern-image leg the
    // multimodal surface lacked): even docs become timed MP4s (mvhd
    // timescale/duration, avc1/hvc1/av01 video track with tkhd+stsd dims,
    // an mp4a audio track on every fourth), odd docs become AVIF/HEIC
    // stills (meta/iinf/infe item type + ispe dims). Files route through
    // BinaryMediaDecoder's mime dispatch, the walk recovers every field,
    // and DuckDB recomputes all aggregates from the doc_id arithmetic —
    // one wrong offset in any box layout breaks a sum. Duration is
    // reported in floor-divided ms so both engines stay integer-exact.
    // Scale: per-row build+parse map, shuffle-free until the rollup;
    // sample decode is out of contract (typed) so no payload ever rides.
    GraftQuery(
      "mm23_isobmff_audit",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"))
          .as[(String, Long)]
          .map { case (source, id) =>
            if (id % 2 == 0) {
              val ts = 1000L + (id % 10) * 100
              val dur = (id % 300 + 1) * 1000 + (id % 7) * 97
              val codec = Seq("avc1", "hvc1", "av01")((id % 3).toInt)
              val vw = 320 + (id % 16).toInt * 40
              val vh = 180 + (id % 16).toInt * 30
              val tracks = Seq((1L, "vide", codec, vw, vh, dur - id % 50)) ++
                (if (id % 4 == 0) Seq((2L, "soun", "mp4a", 0, 0, dur - id % 50))
                 else Nil)
              val bytes = graft.ops.Isobmff.writeMp4(
                "isom", Seq("isom", "mp41"), ts, dur, tracks)
              val m = graft.ops.BinaryMediaDecoder.isobmffMeta(
                graft.ops.Multimodal.Blob(id, bytes, "video/mp4", Map.empty))
              val v = m.tracks.find(_.handler == "vide").get
              require(m.tracks.forall(_.duration == dur - id % 50), "tkhd dur")
              (source, 1L, 0L, v.width.toLong, v.height.toLong,
                m.tracks.length.toLong, m.duration * 1000L / m.timescale,
                s"${m.majorBrand}:${v.codec}")
            } else {
              val (brand, itemType) =
                if (id % 3 == 0) ("avif", "av01") else ("heic", "hvc1")
              val w = 64 + (id % 50).toInt * 8
              val h = 64 + (id % 40).toInt * 6
              val bytes = graft.ops.Isobmff.writeHeif(
                brand, Seq(brand, "mif1"), itemType, w, h)
              val m = graft.ops.BinaryMediaDecoder.isobmffMeta(
                graft.ops.Multimodal.Blob(id, bytes,
                  if (brand == "avif") "image/avif" else "image/heic", Map.empty))
              (source, 0L, 1L, m.itemWidth.toLong, m.itemHeight.toLong,
                0L, 0L, s"${m.majorBrand}:${m.itemCodec}")
            }
          }
          .toDF("source", "is_video", "is_still", "w", "h", "n_tracks",
            "dur_ms", "ck")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_files"),
            sum(col("is_video")).as("n_video"),
            sum(col("is_still")).as("n_still"),
            sum(col("w")).as("w_sum"),
            sum(col("h")).as("h_sum"),
            sum(col("n_tracks")).as("track_sum"),
            sum(col("dur_ms")).as("dur_ms_sum"),
            sum(TA.hash60(col("ck")) % M).as("codec_check"))
      },
      Some(s"""WITH x AS (SELECT source, doc_id AS id,
            doc_id % 2 = 0 AS vid,
            1000 + (doc_id % 10) * 100 AS ts,
            (doc_id % 300 + 1) * 1000 + (doc_id % 7) * 97 AS dur
          FROM documents),
        y AS (SELECT source, vid,
            CASE WHEN vid THEN 320 + (id % 16) * 40
              ELSE 64 + (id % 50) * 8 END AS w,
            CASE WHEN vid THEN 180 + (id % 16) * 30
              ELSE 64 + (id % 40) * 6 END AS h,
            CASE WHEN vid THEN (CASE WHEN id % 4 = 0 THEN 2 ELSE 1 END)
              ELSE 0 END AS n_tracks,
            CASE WHEN vid THEN (dur * 1000) // ts ELSE 0 END AS dur_ms,
            CASE WHEN vid THEN 'isom:' ||
                (CASE id % 3 WHEN 0 THEN 'avc1' WHEN 1 THEN 'hvc1'
                  ELSE 'av01' END)
              WHEN id % 3 = 0 THEN 'avif:av01'
              ELSE 'heic:hvc1' END AS ck
          FROM x)
        SELECT source, count(*) AS n_files,
          CAST(count(CASE WHEN vid THEN 1 END) AS BIGINT) AS n_video,
          CAST(count(CASE WHEN NOT vid THEN 1 END) AS BIGINT) AS n_still,
          CAST(sum(w) AS BIGINT) AS w_sum,
          CAST(sum(h) AS BIGINT) AS h_sum,
          CAST(sum(n_tracks) AS BIGINT) AS track_sum,
          CAST(sum(dur_ms) AS BIGINT) AS dur_ms_sum,
          CAST(sum(${TA.Sql.hash60("ck")} % $M) AS BIGINT) AS codec_check
        FROM y GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Poisoned ISOBMFF scan (the family's poisoned-twin contract): every
    // eleventh file is corrupted after the build — ftyp brand wrecked,
    // a box size lying past the container, a tkhd version byte from the
    // future, or a hard truncation — and the scan must yield one TYPED
    // error row per rotten file while every healthy file still parses.
    // At 100 TB this is the difference between a crawl scan that loses
    // an executor to one bad shard and one that reports it as data.
    GraftQuery(
      "mm24_poisoned_isobmff",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"))
          .as[(String, Long)]
          .map { case (source, id) =>
            val bytes = graft.ops.Isobmff.writeMp4(
              "isom", Seq("isom"), 1000L, (id % 100 + 1) * 1000,
              Seq((1L, "vide", "avc1", 320, 180, (id % 100 + 1) * 1000)))
            val poisoned =
              if (id % 11 != 3) bytes
              else (id % 4) match {
                case 0 => val b = bytes.clone(); b(4) = 'X'.toByte; b // magic
                case 1 => // moov size lies past end of file
                  val b = bytes.clone()
                  val moov = graft.ops.Isobmff.ftyp("isom", Seq("isom")).length
                  b(moov) = 0x7f.toByte; b
                case 2 => // tkhd version from the future
                  val b = bytes.clone()
                  val at = b.indexOfSlice("tkhd".getBytes)
                  b(at + 4) = 9.toByte; b
                case _ => java.util.Arrays.copyOf(bytes, bytes.length / 2)
              }
            graft.ops.Isobmff.parseSafe(poisoned) match {
              case Right(m) => (source, 1L, 0L,
                m.tracks.headOption.map(_.width.toLong).getOrElse(0L), "")
              case Left(kind) => (source, 0L, 1L, 0L, kind)
            }
          }
          .toDF("source", "ok", "bad", "w", "kind")
          .groupBy(col("source"))
          .agg(
            sum(col("ok")).as("n_ok"),
            sum(col("bad")).as("n_bad"),
            sum(col("w")).as("w_sum"),
            sum(when(col("kind") === "bad_magic", 1L).otherwise(0L)).as("n_magic"),
            sum(when(col("kind") === "truncated", 1L).otherwise(0L)).as("n_trunc"),
            sum(when(col("kind") === "bad_frame", 1L).otherwise(0L)).as("n_frame"))
      },
      Some("""WITH x AS (SELECT source, doc_id AS id,
            doc_id % 11 = 3 AS rot, doc_id % 4 AS mode
          FROM documents)
        SELECT source,
          CAST(count(CASE WHEN NOT rot THEN 1 END) AS BIGINT) AS n_ok,
          CAST(count(CASE WHEN rot THEN 1 END) AS BIGINT) AS n_bad,
          CAST(sum(CASE WHEN NOT rot THEN 320 ELSE 0 END) AS BIGINT) AS w_sum,
          CAST(count(CASE WHEN rot AND mode = 0 THEN 1 END) AS BIGINT) AS n_magic,
          CAST(count(CASE WHEN rot AND (mode = 1 OR mode = 3) THEN 1 END)
            AS BIGINT) AS n_trunc,
          CAST(count(CASE WHEN rot AND mode = 2 THEN 1 END) AS BIGINT) AS n_frame
        FROM x GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // ISOBMFF sample-table audit (round 15 follow-on to mm23): the part
    // of an MP4 a video-curation pipeline actually reads to triage —
    // mdhd media timescale, stts decoding-time runs (sample counts AND
    // total media duration), per-sample stsz sizes — turned into the
    // exact duration/bitrate table. Every field rides the deterministic
    // doc_id arithmetic; floor-divided integer ms and kbps keep both
    // engines bit-exact. Per-row build+parse map, shuffle-free rollup;
    // sample PAYLOADS never exist (stsz is declarative), so nothing
    // here scales with media bytes — the tables a 100 TB crawl scan
    // walks are KB-sized per file.
    GraftQuery(
      "mm25_isobmff_samples",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"))
          .as[(String, Long)]
          .map { case (source, id) =>
            val n = (id % 240 + 1).toInt
            val delta = 100 + id % 20
            val ts = 600 * (id % 5 + 1)
            val sizes = Seq.tabulate(n)(k => 500L + (id + k) % 97)
            val bytes = graft.ops.Isobmff.writeMp4Sampled(
              "isom", Seq("isom", "mp41"), 1000L, n * delta,
              Seq((1L, "vide", "avc1", 640, 360, n * delta, ts, delta, sizes)))
            val t = graft.ops.Isobmff.parse(bytes).tracks.head
            require(t.nSamples == n.toLong && t.mediaTimescale == ts &&
              t.mediaDuration == n * delta,
              s"sample walk: ${t.nSamples}/$n @ ${t.mediaTimescale}")
            val durMs = t.mediaDuration * 1000L / t.mediaTimescale
            val kbps = 8L * t.sampleBytes * t.mediaTimescale /
              (t.mediaDuration * 1000L)
            (source, t.nSamples, t.sampleBytes, durMs, kbps)
          }
          .toDF("source", "n_samples", "s_bytes", "dur_ms", "kbps")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_files"),
            sum(col("n_samples")).as("sample_sum"),
            sum(col("s_bytes")).as("byte_sum"),
            sum(col("dur_ms")).as("dur_ms_sum"),
            sum(col("kbps")).as("rate_check"))
      },
      Some("""WITH x AS (SELECT source, doc_id AS id,
            doc_id % 240 + 1 AS n,
            100 + doc_id % 20 AS delta,
            600 * (doc_id % 5 + 1) AS ts
          FROM documents),
        y AS (SELECT source, n,
            CAST(list_sum(list_transform(range(0, n),
              k -> 500 + ((id + k) % 97))) AS BIGINT) AS s_bytes,
            (n * delta * 1000) // ts AS dur_ms,
            n * delta AS mdur, ts
          FROM x)
        SELECT source, count(*) AS n_files,
          CAST(sum(n) AS BIGINT) AS sample_sum,
          CAST(sum(s_bytes) AS BIGINT) AS byte_sum,
          CAST(sum(dur_ms) AS BIGINT) AS dur_ms_sum,
          CAST(sum((8 * s_bytes * ts) // (mdur * 1000)) AS BIGINT) AS rate_check
        FROM y GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Fragmented-MP4 segment audit (round 15 follow-on to mm25 — the
    // CMAF/DASH form streaming video actually ships: sample tables live
    // in moof/tfhd/trun fragments, not moov/stbl). Each doc becomes an
    // fMP4 whose even fragments carry per-sample dur+size truns (flags
    // 0x300) and odd fragments the compact trex-defaults form (flags 0,
    // count only — totals computed arithmetically, never a u32-driven
    // loop); the walk must apply §8.8's default resolution exactly.
    // DuckDB replays every total from the doc_id arithmetic. Per-row
    // build+parse map, shuffle-free rollup.
    GraftQuery(
      "mm26_fmp4_segments",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"))
          .as[(String, Long)]
          .map { case (source, id) =>
            val n = (id % 6 + 1).toInt
            val frags = (0 until n).map { f =>
              if (f % 2 == 0)
                graft.ops.Isobmff.FragSpec(f + 1L, Seq.tabulate(10)(k =>
                  (1000L + (id + f + k) % 7,
                    4000L + (id + 13 * f + 29 * k) % 101)))
              else graft.ops.Isobmff.FragSpec(f + 1L, Nil, defaultCount = 40)
            }
            val bytes = graft.ops.Isobmff.writeFmp4(
              "cmfc", Seq("iso6", "cmfc"), 24000L,
              1L, "avc1", 1280, 720, 1001L, 4096L, frags)
            val m = graft.ops.Isobmff.parse(bytes)
            require(m.fragments.length == n &&
              m.fragments.map(_.seq) == (1L to n).toVector, "fragment walk")
            (source,
              m.fragments.length.toLong,
              m.fragments.map(_.nSamples).sum,
              m.fragments.map(_.sampleBytes).sum,
              m.fragments.map(_.duration).sum)
          }
          .toDF("source", "n_frags", "n_samples", "s_bytes", "dur")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_files"),
            sum(col("n_frags")).as("frag_sum"),
            sum(col("n_samples")).as("sample_sum"),
            sum(col("s_bytes")).as("byte_sum"),
            sum(col("dur")).as("dur_sum"))
      },
      Some("""WITH x AS (SELECT source, doc_id AS id, doc_id % 6 + 1 AS n
          FROM documents),
        y AS (SELECT source, n,
            CAST(list_sum(list_transform(range(0, n), f ->
              CASE WHEN f % 2 = 0 THEN 10 ELSE 40 END)) AS BIGINT) AS n_samples,
            CAST(list_sum(list_transform(range(0, n), f ->
              CASE WHEN f % 2 = 0 THEN
                list_sum(list_transform(range(0, 10), k ->
                  4000 + ((id + 13*f + 29*k) % 101)))
              ELSE 40 * 4096 END)) AS BIGINT) AS s_bytes,
            CAST(list_sum(list_transform(range(0, n), f ->
              CASE WHEN f % 2 = 0 THEN
                list_sum(list_transform(range(0, 10), k ->
                  1000 + ((id + f + k) % 7)))
              ELSE 40 * 1001 END)) AS BIGINT) AS dur
          FROM x)
        SELECT source, count(*) AS n_files,
          CAST(sum(n) AS BIGINT) AS frag_sum,
          CAST(sum(n_samples) AS BIGINT) AS sample_sum,
          CAST(sum(s_bytes) AS BIGINT) AS byte_sum,
          CAST(sum(dur) AS BIGINT) AS dur_sum
        FROM y GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Ogg/Opus/Vorbis container audit (round 16 — [[graft.ops.Ogg]], the
    // speech-dataset front door: the one whole container family the
    // multimodal surface lacked). Even docs become Opus files (OpusHead
    // channels/pre-skip/input-rate, granules at 48 kHz, duration =
    // (last granule − pre-skip)/48k), odd docs Vorbis (ID-header
    // channels/rate, duration = granule/rate), with varied page counts;
    // files route through BinaryMediaDecoder's mime dispatch and DuckDB
    // recomputes every aggregate from the doc_id arithmetic — one wrong
    // byte in the page walk, the lacing, the CRC, or either ID header
    // breaks a sum. Floor-divided ms keeps both engines integer-exact
    // (rates chosen divisible by 25). Per-row build+parse map,
    // shuffle-free rollup; packet payloads never decode (typed, the
    // mm05 precedent), so nothing scales with audio bytes.
    GraftQuery(
      "mm27_ogg_audit",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"))
          .as[(String, Long)]
          .map { case (source, id) =>
            val ch = 1 + ((id / 2) % 2).toInt
            if (id % 2 == 0) {
              val preSkip = 300 + (id % 5).toInt * 12
              val rate = Seq(48000L, 44100L, 16000L, 8000L)(((id / 2) % 4).toInt)
              val nAudio = (id % 6 + 1).toInt
              val pkts = Seq(
                graft.ops.Ogg.OggPacket(graft.ops.Ogg.opusHead(ch, preSkip, rate), 0),
                graft.ops.Ogg.OggPacket(graft.ops.Ogg.opusTags("graft"), 0)) ++
                (1 to nAudio).map(k => graft.ops.Ogg.OggPacket(
                  Array.tabulate[Byte](40 + ((id + k) % 50).toInt)(i =>
                    ((id + k * 31 + i * 7) % 256).toByte),
                  preSkip + 960L * k))
              val bytes = graft.ops.Ogg.write(1000L + id % 97, pkts)
              val m = graft.ops.BinaryMediaDecoder.oggMeta(
                graft.ops.Multimodal.Blob(id, bytes, "audio/ogg", Map.empty))
              val st = m.streams.head
              require(m.streams.length == 1 && st.codec == "opus" &&
                st.nPackets == 2L + nAudio, s"opus walk doc $id")
              (source, 1L, 0L, st.channels.toLong, st.sampleRate,
                st.preSkip.toLong, st.durationMs, m.nPages, st.nPackets,
                s"opus:${st.channels}:${st.sampleRate}")
            } else {
              val rate = Seq(44100L, 22050L, 11025L, 8000L)(((id / 2) % 4).toInt)
              val units = (id % 100 + 1)
              val nAudio = (id % 3 + 1).toInt
              val pkts = Seq(
                graft.ops.Ogg.OggPacket(graft.ops.Ogg.vorbisId(ch, rate), 0),
                graft.ops.Ogg.OggPacket(graft.ops.Ogg.vorbisComment("graft"), 0)) ++
                (1 to nAudio).map(k => graft.ops.Ogg.OggPacket(
                  Array.tabulate[Byte](30 + ((id + k) % 40).toInt)(i =>
                    ((id + k * 17 + i * 11) % 256).toByte),
                  if (k < nAudio) (rate / 25) * k else units * (rate / 25)))
              val bytes = graft.ops.Ogg.write(2000L + id % 89, pkts)
              val m = graft.ops.BinaryMediaDecoder.oggMeta(
                graft.ops.Multimodal.Blob(id, bytes, "audio/ogg", Map.empty))
              val st = m.streams.head
              require(m.streams.length == 1 && st.codec == "vorbis" &&
                st.durationMs == units * 40L, s"vorbis walk doc $id")
              (source, 0L, 1L, st.channels.toLong, st.sampleRate,
                0L, st.durationMs, m.nPages, st.nPackets,
                s"vorbis:${st.channels}:${st.sampleRate}")
            }
          }
          .toDF("source", "is_opus", "is_vorbis", "ch", "rate", "preskip",
            "dur_ms", "n_pages", "n_packets", "ck")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_files"),
            sum(col("is_opus")).as("n_opus"),
            sum(col("is_vorbis")).as("n_vorbis"),
            sum(col("ch")).as("ch_sum"),
            sum(col("rate")).as("rate_sum"),
            sum(col("preskip")).as("preskip_sum"),
            sum(col("dur_ms")).as("dur_ms_sum"),
            sum(col("n_pages")).as("page_sum"),
            sum(col("n_packets")).as("packet_sum"),
            sum(TA.hash60(col("ck")) % M).as("codec_check"))
      },
      Some(s"""WITH x AS (SELECT source, doc_id AS id,
            doc_id % 2 = 0 AS opus,
            1 + (doc_id // 2) % 2 AS ch
          FROM documents),
        y AS (SELECT source, opus, ch,
            CASE WHEN opus THEN
              CASE (id // 2) % 4 WHEN 0 THEN 48000 WHEN 1 THEN 44100
                WHEN 2 THEN 16000 ELSE 8000 END
            ELSE
              CASE (id // 2) % 4 WHEN 0 THEN 44100 WHEN 1 THEN 22050
                WHEN 2 THEN 11025 ELSE 8000 END END AS rate,
            CASE WHEN opus THEN 300 + (id % 5) * 12 ELSE 0 END AS preskip,
            CASE WHEN opus THEN (300 + (id % 5) * 12 + 960 * (id % 6 + 1)
                - (300 + (id % 5) * 12)) * 1000 // 48000
              ELSE (id % 100 + 1) * 40 END AS dur_ms,
            CASE WHEN opus THEN 2 + (id % 6 + 1) ELSE 2 + (id % 3 + 1) END
              AS n_pages
          FROM x)
        SELECT source, count(*) AS n_files,
          CAST(count(CASE WHEN opus THEN 1 END) AS BIGINT) AS n_opus,
          CAST(count(CASE WHEN NOT opus THEN 1 END) AS BIGINT) AS n_vorbis,
          CAST(sum(ch) AS BIGINT) AS ch_sum,
          CAST(sum(rate) AS BIGINT) AS rate_sum,
          CAST(sum(preskip) AS BIGINT) AS preskip_sum,
          CAST(sum(dur_ms) AS BIGINT) AS dur_ms_sum,
          CAST(sum(n_pages) AS BIGINT) AS page_sum,
          CAST(sum(n_pages) AS BIGINT) AS packet_sum,
          CAST(sum(${TA.Sql.hash60(
            "(CASE WHEN opus THEN 'opus:' ELSE 'vorbis:' END) || CAST(ch AS VARCHAR) || ':' || CAST(rate AS VARCHAR)")} % $M)
            AS BIGINT) AS codec_check
        FROM y GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Poisoned Ogg scan (the family's poisoned-twin contract): every
    // eleventh file is rotten — capture pattern wrecked, a granule byte
    // flipped (the page CRC must catch it), a future version on the
    // second page, or a 20-byte truncation — and the scan yields one
    // TYPED error row per rotten file while every healthy file still
    // parses. At 100 TB this is one bad shard reported as data instead
    // of a lost executor.
    GraftQuery(
      "mm29_poisoned_ogg",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"))
          .as[(String, Long)]
          .map { case (source, id) =>
            val nAudio = (id % 5 + 1).toInt
            val preSkip = 312
            val pkts = Seq(
              graft.ops.Ogg.OggPacket(graft.ops.Ogg.opusHead(1, preSkip, 48000L), 0),
              graft.ops.Ogg.OggPacket(graft.ops.Ogg.opusTags("graft"), 0)) ++
              (1 to nAudio).map(k => graft.ops.Ogg.OggPacket(
                Array.tabulate[Byte](50)(i => ((id + k + i) % 256).toByte),
                preSkip + 960L * k))
            val bytes = graft.ops.Ogg.write(77L, pkts)
            val poisoned =
              if (id % 11 != 3) bytes
              else (id % 4) match {
                case 0 => val b = bytes.clone(); b(2) = 'X'.toByte; b
                case 1 => val b = bytes.clone(); b(7) = (b(7) ^ 0x40).toByte; b
                case 2 => // second page starts after the 47-byte BOS page
                  val b = bytes.clone(); b(47 + 4) = 9.toByte; b
                case _ => java.util.Arrays.copyOf(bytes, 20)
              }
            graft.ops.Ogg.parseSafe(poisoned) match {
              case Right(m) => (source, 1L, 0L, m.streams.head.durationMs, "")
              case Left(kind) => (source, 0L, 1L, 0L, kind)
            }
          }
          .toDF("source", "ok", "bad", "dur_ms", "kind")
          .groupBy(col("source"))
          .agg(
            sum(col("ok")).as("n_ok"),
            sum(col("bad")).as("n_bad"),
            sum(col("dur_ms")).as("dur_sum"),
            sum(when(col("kind") === "bad_magic", 1L).otherwise(0L)).as("n_magic"),
            sum(when(col("kind") === "bad_frame", 1L).otherwise(0L)).as("n_frame"),
            sum(when(col("kind") === "truncated", 1L).otherwise(0L)).as("n_trunc"))
      },
      Some("""WITH x AS (SELECT source, doc_id AS id,
            doc_id % 11 = 3 AS rot, doc_id % 4 AS mode,
            (960 * (doc_id % 5 + 1)) * 1000 // 48000 AS dur
          FROM documents)
        SELECT source,
          CAST(count(CASE WHEN NOT rot THEN 1 END) AS BIGINT) AS n_ok,
          CAST(count(CASE WHEN rot THEN 1 END) AS BIGINT) AS n_bad,
          CAST(sum(CASE WHEN NOT rot THEN dur ELSE 0 END) AS BIGINT) AS dur_sum,
          CAST(count(CASE WHEN rot AND mode = 0 THEN 1 END) AS BIGINT) AS n_magic,
          CAST(count(CASE WHEN rot AND mode IN (1, 2) THEN 1 END)
            AS BIGINT) AS n_frame,
          CAST(count(CASE WHEN rot AND mode = 3 THEN 1 END) AS BIGINT) AS n_trunc
        FROM x GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Matroska/WebM container audit (round 16 — [[graft.ops.Matroska]],
    // the EBML half of real-world video crawls next to ISOBMFF): even
    // docs become WebM (V_VP9/VP8/AV1 + A_OPUS on every fourth), odd
    // docs Matroska (V_MPEG4/ISO/AVC + A_AAC), with doc_id-derived dims,
    // float Duration (integer-valued, 8-byte), cluster/SimpleBlock
    // shape. Files route through BinaryMediaDecoder's mime dispatch and
    // DuckDB recomputes every aggregate — one wrong VINT length, a
    // mis-walked unknown-size form, or a dropped block breaks a sum.
    // Per-row build+parse map, shuffle-free rollup; block payloads are
    // declarative filler, never decoded.
    GraftQuery(
      "mm28_matroska_audit",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"))
          .as[(String, Long)]
          .map { case (source, id) =>
            val webm = id % 2 == 0
            val vcodec =
              if (webm) Seq("V_VP9", "V_VP8", "V_AV1")((id % 3).toInt)
              else "V_MPEG4/ISO/AVC"
            val w = 320 + (id % 16).toInt * 40
            val h = 180 + (id % 16).toInt * 30
            val hasAudio = id % 4 == 0
            val tracks = Seq(graft.ops.Matroska.TrackSpec(1, 1, vcodec,
              width = w, height = h)) ++
              (if (hasAudio) Seq(graft.ops.Matroska.TrackSpec(2, 2,
                if (webm) "A_OPUS" else "A_AAC",
                sampleRate = if (webm) 48000.0 else 44100.0,
                channels = 1 + (id % 2).toInt))
               else Nil)
            val nc = (id % 5 + 1).toInt
            val nb = (id % 3 + 1).toInt
            val clusters = (0 until nc).map(k =>
              graft.ops.Matroska.ClusterSpec(k * 500L,
                (0 until nb).map(j => 20 + ((id + k + j) % 30).toInt)))
            val durMs = (id % 300 + 1) * 50
            val bytes = graft.ops.Matroska.write(
              if (webm) "webm" else "matroska", 4, 1000000L,
              durMs.toDouble, tracks, clusters,
              streamingSegment = id % 7 == 0)
            val m = graft.ops.BinaryMediaDecoder.mkvMeta(
              graft.ops.Multimodal.Blob(id, bytes,
                if (webm) "video/webm" else "video/x-matroska", Map.empty))
            require(m.docType == (if (webm) "webm" else "matroska") &&
              m.nClusters == nc && m.nBlocks == nc.toLong * nb,
              s"mkv walk doc $id")
            val v = m.tracks.find(_.trackType == 1).get
            (source, if (webm) 1L else 0L, m.tracks.length.toLong,
              v.width.toLong, v.height.toLong, m.durationMs,
              m.nClusters, m.nBlocks, m.blockBytes, m.lastClusterTs,
              s"${m.docType}:${v.codecId}:${v.width}x${v.height}")
          }
          .toDF("source", "is_webm", "n_tracks", "w", "h", "dur_ms",
            "n_clusters", "n_blocks", "block_bytes", "last_ts", "ck")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_files"),
            sum(col("is_webm")).as("n_webm"),
            sum(col("n_tracks")).as("track_sum"),
            sum(col("w")).as("w_sum"),
            sum(col("h")).as("h_sum"),
            sum(col("dur_ms")).as("dur_ms_sum"),
            sum(col("n_clusters")).as("cluster_sum"),
            sum(col("n_blocks")).as("block_sum"),
            sum(col("block_bytes")).as("block_byte_sum"),
            sum(col("last_ts")).as("ts_check"),
            sum(TA.hash60(col("ck")) % M).as("codec_check"))
      },
      Some(s"""WITH x AS (SELECT source, doc_id AS id,
            doc_id % 2 = 0 AS webm,
            320 + (doc_id % 16) * 40 AS w,
            180 + (doc_id % 16) * 30 AS h,
            doc_id % 5 + 1 AS nc,
            doc_id % 3 + 1 AS nb
          FROM documents),
        y AS (SELECT source, webm, w, h,
            CASE WHEN webm THEN
              CASE id % 3 WHEN 0 THEN 'webm:V_VP9' WHEN 1 THEN 'webm:V_VP8'
                ELSE 'webm:V_AV1' END
            ELSE 'matroska:V_MPEG4/ISO/AVC' END
              || ':' || CAST(w AS VARCHAR) || 'x' || CAST(h AS VARCHAR) AS ck,
            CASE WHEN id % 4 = 0 THEN 2 ELSE 1 END AS n_tracks,
            (id % 300 + 1) * 50 AS dur_ms,
            nc, nc * nb AS n_blocks,
            CAST(list_sum(list_transform(range(0, nc), k ->
              24 * nb + list_sum(list_transform(range(0, nb), j ->
                (id + k + j) % 30)))) AS BIGINT) AS block_bytes,
            (nc - 1) * 500 AS last_ts
          FROM x)
        SELECT source, count(*) AS n_files,
          CAST(count(CASE WHEN webm THEN 1 END) AS BIGINT) AS n_webm,
          CAST(sum(n_tracks) AS BIGINT) AS track_sum,
          CAST(sum(w) AS BIGINT) AS w_sum,
          CAST(sum(h) AS BIGINT) AS h_sum,
          CAST(sum(dur_ms) AS BIGINT) AS dur_ms_sum,
          CAST(sum(nc) AS BIGINT) AS cluster_sum,
          CAST(sum(n_blocks) AS BIGINT) AS block_sum,
          CAST(sum(block_bytes) AS BIGINT) AS block_byte_sum,
          CAST(sum(last_ts) AS BIGINT) AS ts_check,
          CAST(sum(${TA.Sql.hash60("ck")} % $M) AS BIGINT) AS codec_check
        FROM y GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Poisoned Matroska scan (the family's poisoned-twin contract):
    // every eleventh file is rotten — EBML magic wrecked, a foreign
    // DocType, a zeroed VINT lead byte (invalid in EBML), or a 3-byte
    // stub — and the scan yields one TYPED error row per rotten file
    // while every healthy file still parses.
    GraftQuery(
      "mm30_poisoned_mkv",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"))
          .as[(String, Long)]
          .map { case (source, id) =>
            val bytes = graft.ops.Matroska.write("webm", 4, 1000000L,
              ((id % 100) + 1) * 100.0,
              Seq(graft.ops.Matroska.TrackSpec(1, 1, "V_VP9",
                width = 640, height = 360)),
              Seq(graft.ops.Matroska.ClusterSpec(0, Seq(16))))
            val poisoned =
              if (id % 11 != 3) bytes
              else (id % 4) match {
                case 0 => val b = bytes.clone(); b(1) = 'X'.toByte; b
                case 1 =>
                  val b = bytes.clone()
                  val at = b.indexOfSlice("webm".getBytes("US-ASCII"))
                  b(at + 3) = 'b'.toByte; b
                case 2 =>
                  val b = bytes.clone()
                  val at = b.indexOfSlice(
                    Array(0x15.toByte, 0x49.toByte, 0xa9.toByte, 0x66.toByte))
                  b(at) = 0; b
                case _ => java.util.Arrays.copyOf(bytes, 3)
              }
            graft.ops.Matroska.parseSafe(poisoned) match {
              case Right(m) => (source, 1L, 0L, m.durationMs, "")
              case Left(kind) => (source, 0L, 1L, 0L, kind)
            }
          }
          .toDF("source", "ok", "bad", "dur_ms", "kind")
          .groupBy(col("source"))
          .agg(
            sum(col("ok")).as("n_ok"),
            sum(col("bad")).as("n_bad"),
            sum(col("dur_ms")).as("dur_sum"),
            sum(when(col("kind") === "bad_magic", 1L).otherwise(0L)).as("n_magic"),
            sum(when(col("kind") === "unsupported", 1L).otherwise(0L)).as("n_unsup"),
            sum(when(col("kind") === "bad_frame", 1L).otherwise(0L)).as("n_frame"))
      },
      Some("""WITH x AS (SELECT source, doc_id AS id,
            doc_id % 11 = 3 AS rot, doc_id % 4 AS mode,
            ((doc_id % 100) + 1) * 100 AS dur
          FROM documents)
        SELECT source,
          CAST(count(CASE WHEN NOT rot THEN 1 END) AS BIGINT) AS n_ok,
          CAST(count(CASE WHEN rot THEN 1 END) AS BIGINT) AS n_bad,
          CAST(sum(CASE WHEN NOT rot THEN dur ELSE 0 END) AS BIGINT) AS dur_sum,
          CAST(count(CASE WHEN rot AND mode IN (0, 3) THEN 1 END)
            AS BIGINT) AS n_magic,
          CAST(count(CASE WHEN rot AND mode = 1 THEN 1 END) AS BIGINT) AS n_unsup,
          CAST(count(CASE WHEN rot AND mode = 2 THEN 1 END) AS BIGINT) AS n_frame
        FROM x GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Ogg comment-tag audit (round 16 follow-on to mm27 — the Vorbis
    // comment block BOTH OpusTags and the Vorbis header carry is the
    // Ogg world's ID3): every doc's second packet gets TITLE/ARTIST/
    // ALBUM/TRACKNUMBER tags (the audio-corpus metadata a curation
    // pipeline reads), field names round-trip case-insensitively, and
    // DuckDB replays every decoded string from the doc_id arithmetic.
    GraftQuery(
      "mm32_ogg_tags",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("lang"))
          .as[(String, Long, String)]
          .map { case (source, id, lang) =>
            val fields = Seq("title" -> s"Track $id", "ARTIST" -> lang,
              "Album" -> s"Album ${id % 10}",
              "TRACKNUMBER" -> s"${id % 12 + 1}")
            val pkts =
              if (id % 2 == 0) Seq(
                graft.ops.Ogg.OggPacket(graft.ops.Ogg.opusHead(2, 312, 48000L), 0),
                graft.ops.Ogg.OggPacket(
                  graft.ops.Ogg.opusTags(s"libgraft ${id % 3}", fields), 0),
                graft.ops.Ogg.OggPacket(Array[Byte](1, 2, 3), 960L))
              else Seq(
                graft.ops.Ogg.OggPacket(graft.ops.Ogg.vorbisId(2, 44100L), 0),
                graft.ops.Ogg.OggPacket(
                  graft.ops.Ogg.vorbisComment(s"libgraft ${id % 3}", fields), 0),
                graft.ops.Ogg.OggPacket(Array[Byte](1, 2, 3), 1764L))
            val bytes = graft.ops.Ogg.write(500L + id % 71, pkts)
            require(graft.ops.Ogg.parse(bytes).streams.length == 1, s"walk $id")
            val tagPkt = graft.ops.Ogg.pages(bytes)(1).packets.head
            val c = graft.ops.Ogg.parseComments(tagPkt)
            (source, c.fields.length.toLong,
              s"${c.vendor}|${c.first("TITLE").get}|${c.first("artist").get}|" +
                s"${c.first("ALBUM").get}|${c.first("tracknumber").get}")
          }
          .toDF("source", "n_fields", "ck")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_files"),
            sum(col("n_fields")).as("field_sum"),
            sum(TA.hash60(col("ck")) % M).as("tag_check"))
      },
      Some(s"""WITH x AS (SELECT source,
            'libgraft ' || CAST(doc_id % 3 AS VARCHAR) ||
              '|Track ' || CAST(doc_id AS VARCHAR) ||
              '|' || lang ||
              '|Album ' || CAST(doc_id % 10 AS VARCHAR) ||
              '|' || CAST(doc_id % 12 + 1 AS VARCHAR) AS ck
          FROM documents)
        SELECT source, count(*) AS n_files,
          CAST(count(*) * 4 AS BIGINT) AS field_sum,
          CAST(sum(${TA.Sql.hash60("ck")} % $M) AS BIGINT) AS tag_check
        FROM x GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Multistream Opus audit (round 16 follow-on to mm27 — RFC 7845
    // §5.1.1 mapping families 1/255, the surround/discrete form real
    // speech+music corpora carry beyond mono/stereo): channels 3-8,
    // stream/coupled split with ch = streams + coupled, a rotated
    // channel-mapping table (one silent-255 slot on every seventh doc),
    // family 255 on every eleventh. The walk validates the table
    // (indices < streams+coupled or 255) and DuckDB recomputes the
    // weighted mapping checksum — one swapped table byte breaks it.
    GraftQuery(
      "mm33_opus_surround",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"))
          .as[(String, Long)]
          .map { case (source, id) =>
            val ch = 3 + (id % 6).toInt
            val coupled = ch / 3
            val streams = ch - coupled
            val r = (id % ch).toInt
            val mapping = Vector.tabulate(ch) { k =>
              if (k == 0 && id % 7 == 0) 255 else (k + r) % ch
            }
            val family = if (id % 11 == 5) 255 else 1
            val head = graft.ops.Ogg.opusHeadMapped(ch, 300 + (id % 5).toInt,
              48000L, family, streams, coupled, mapping)
            val bytes = graft.ops.Ogg.write(3000L + id % 83, Seq(
              graft.ops.Ogg.OggPacket(head, 0),
              graft.ops.Ogg.OggPacket(graft.ops.Ogg.opusTags("graft"), 0),
              graft.ops.Ogg.OggPacket(Array[Byte](1, 2), 1260L)))
            require(graft.ops.Ogg.parse(bytes).streams.head.codec == "opus",
              s"walk $id")
            val h = graft.ops.Ogg.parseOpusHead(
              graft.ops.Ogg.pages(bytes).head.packets.head)
            var mapsum = 0L
            h.mapping.zipWithIndex.foreach { case (m, k) =>
              mapsum += (k + 1L) * m
            }
            (source, h.channels.toLong, h.streams.toLong, h.coupled.toLong,
              h.mappingFamily.toLong, mapsum)
          }
          .toDF("source", "ch", "streams", "coupled", "family", "mapsum")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_files"),
            sum(col("ch")).as("ch_sum"),
            sum(col("streams")).as("stream_sum"),
            sum(col("coupled")).as("coupled_sum"),
            sum(col("family")).as("family_sum"),
            sum(col("mapsum")).as("map_check"))
      },
      Some("""WITH x AS (SELECT source, doc_id AS id,
            3 + doc_id % 6 AS ch FROM documents),
        y AS (SELECT source, ch,
            ch - (ch // 3) AS streams, ch // 3 AS coupled,
            CASE WHEN id % 11 = 5 THEN 255 ELSE 1 END AS family,
            CAST(list_sum(list_transform(range(0, ch), k ->
              (k + 1) * (CASE WHEN k = 0 AND id % 7 = 0 THEN 255
                ELSE (k + id % ch) % ch END))) AS BIGINT) AS mapsum
          FROM x)
        SELECT source, count(*) AS n_files,
          CAST(sum(ch) AS BIGINT) AS ch_sum,
          CAST(sum(streams) AS BIGINT) AS stream_sum,
          CAST(sum(coupled) AS BIGINT) AS coupled_sum,
          CAST(sum(family) AS BIGINT) AS family_sum,
          CAST(sum(mapsum) AS BIGINT) AS map_check
        FROM y GROUP BY 1"""),
    ),
  )
}
