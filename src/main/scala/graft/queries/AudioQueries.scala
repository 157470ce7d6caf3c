package graft.queries

import graft.core.{GraftQuery, Tables}
import graft.ops.{Hash60Kernel, TextAnalysis => TA}
import org.apache.spark.sql.functions._

/** Audio-container operators, split out of MediaQueries in round 13
  * (registry hygiene — the pack passed 1100 LoC): the MP3 frame walk
  * (mm05), WAV PCM round trip (mm15), FLAC metadata audit (mm17), and
  * FLAC frame decode to true samples (mm18). Moved queries and oracles
  * are byte-identical to their pre-split forms.
  */
object AudioQueries {

  private val M = TarQueries.M

  val all: Seq[GraftQuery] = Seq(
    // ------------------------------------------------------------------
    // REAL compressed-AUDIO metadata scan: each doc's text deterministically
    // picks an MPEG-1 Layer III frame plan (sample rate by doc_id, 2-9
    // frames, per-frame bitrate index + padding bit from text bytes, an
    // ID3v2 tag of len%100 body bytes) which Mp3.encodeV1L3 emits as a
    // GENUINE MP3 byte stream — real sync words, real header fields — and
    // the Mp3 frame walker parses back: ID3v2 syncsafe skip, per-frame
    // bitrate/sample-rate table lookups, the Layer III frame-length
    // arithmetic (144000·kbps/rate + pad, truncating), VBR detection.
    // Every audited number is READ from the parsed headers (a one-byte
    // frame-length error desyncs the walk and breaks the hash), and
    // payload_bytes pits the Scala frame-length arithmetic against an
    // independent DuckDB re-implementation. This is the scan shape audio
    // curation runs at 100 TB: exact duration/bitrate/shape metadata
    // WITHOUT sample decode (Layer III synthesis documented out of scope
    // in ops/Mp3.scala). Scale: per-row map, shuffle-free until the 3-row
    // aggregate; corpus is ASCII (the mm02 convention).
    GraftQuery(
      "mm05_mp3_scan",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
          .transform(graft.core.Par.spread)
          .filter(length(col("text")) > 0)
          .select(col("doc_id"), col("text")).as[(Long, String)]
        val audited = docs.mapPartitions { it =>
          val dec = graft.ops.BinaryMediaDecoder.open()
          it.map { case (id, text) =>
            val bytes = text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
            val len = bytes.length
            val rateIdx = (id % 3).toInt
            val nf = 2 + (len % 8)
            val plan = (0 until nf).map { i =>
              val brIdx = 1 + (((bytes((i * 11 + 7) % len) & 0xff) + i) % 14)
              val pad = ((bytes((i * 5 + 2) % len) & 0xff) % 2) == 1
              (brIdx, pad)
            }
            val payload = graft.ops.Mp3.encodeV1L3(rateIdx, plan, len % 100,
              (f, i) => bytes(((f + 2) * 31 + i * 7) % len))
            val blob = graft.ops.Multimodal.Blob(id, payload, "audio/mpeg", Map.empty)
            val meta = dec.decode(blob) // the MediaDecoder trait path
            val info = graft.ops.BinaryMediaDecoder.mp3Info(blob)
            (meta.width.toLong, info.nFrames.toLong, meta.n_frames.toLong,
              payload.length.toLong, info.sumBitrateKbps, info.nPadded.toLong,
              if (info.vbr) 1L else 0L)
          }
        }.toDF("rate", "frames", "samples", "bytes", "kbps", "padded", "vbr")
        audited.groupBy(col("rate"))
          .agg(count(lit(1)).as("n_blobs"),
            sum(col("frames")).as("sum_frames"),
            sum(col("samples")).as("sum_samples"),
            sum(col("bytes")).as("sum_bytes"),
            sum(col("kbps")).as("kbps_sum"),
            sum(col("padded")).as("n_padded"),
            sum(col("vbr")).as("n_vbr"))
      },
      // mirrors the generation plan + the MPEG-1 Layer III tables: bitrate
      // list literal = indices 1..14 of ISO 11172-3 Table B.1; frame bytes
      // = 144000·kbps//rate + pad; ID3v2 = 10 header + len%100 body bytes
      // (absent when len%100 = 0); 1152 samples per MPEG-1 Layer III frame
      Some("""WITH a AS (SELECT doc_id, text, length(text) AS len
            FROM documents WHERE length(text) > 0),
          f AS (SELECT doc_id, text, len,
              CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END AS rate,
              2 + (len % 8) AS nf,
              CASE WHEN len % 100 > 0 THEN 10 + len % 100 ELSE 0 END AS id3
            FROM a),
          k AS (SELECT doc_id, rate, nf, id3,
              list_transform(range(0, nf), i ->
                ([32,40,48,56,64,80,96,112,128,160,192,224,256,320])[
                  1 + ((ascii(substring(text, ((i*11 + 7) % len) + 1, 1)) + i) % 14)]) AS kbps,
              list_transform(range(0, nf), i ->
                ascii(substring(text, ((i*5 + 2) % len) + 1, 1)) % 2) AS pad
            FROM f),
          s AS (SELECT doc_id, rate, nf,
              CAST(list_sum(kbps) AS BIGINT) AS kbps_sum,
              CAST(list_sum(pad) AS BIGINT) AS n_padded,
              CAST(id3 + list_sum(list_transform(range(0, nf), i ->
                (144000 * kbps[i + 1]) // rate + pad[i + 1])) AS BIGINT) AS payload_bytes,
              CASE WHEN len(list_distinct(kbps)) > 1 THEN 1 ELSE 0 END AS vbr
            FROM k)
        SELECT CAST(rate AS BIGINT) AS rate, count(*) AS n_blobs,
          CAST(sum(nf) AS BIGINT) AS sum_frames,
          CAST(sum(nf) * 1152 AS BIGINT) AS sum_samples,
          CAST(sum(payload_bytes) AS BIGINT) AS sum_bytes,
          CAST(sum(kbps_sum) AS BIGINT) AS kbps_sum,
          CAST(sum(n_padded) AS BIGINT) AS n_padded,
          CAST(sum(vbr) AS BIGINT) AS n_vbr
        FROM s GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // REAL audio decode (round 12): RIFF/WAVE PCM is the one audio
    // container decodable to true samples without an entropy coder, and
    // sample-level curation signals (energy, zero-crossing rate, peak)
    // are what an audio pipeline keeps per clip. Each doc's text
    // synthesizes 16-bit mono PCM (sample i = (ascii·2−219)·100 — odd
    // factor, so samples are never zero and the crossing count is a pure
    // adjacent-sign-change count), ENCODED as a genuine 44-byte-header
    // WAV and DECODED back through graft.ops.Wav; every seventh doc's
    // header is then patched to IEEE-float (format tag 3), which must
    // surface as a typed `unsupported` row, not a task failure. The
    // oracle recomputes every feature from the same text arithmetic in
    // DuckDB — one wrong byte in the header math, the sample codec, or
    // the feature scan breaks the hash. Scale: per-row map, shuffle-free
    // until the 2-row aggregate.
    GraftQuery(
      "mm15_wav_audio",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
          .transform(graft.core.Par.spread)
          .filter(length(col("text")) > 0)
          .select(col("doc_id"), col("text")).as[(Long, String)]
        val audited = docs.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
          val n = 48 + (id % 16).toInt * 4
          val samples = Array.tabulate(n)(i =>
            ((bytes((i * 5 + 1) % bytes.length) & 0xff) * 2 - 219) * 100)
          val wav = graft.ops.Wav.encode(8000, 16, Array(samples))
          if (id % 7 == 0) wav(20) = 3 // IEEE float: typed refusal class
          try {
            val (hd, chans) = graft.ops.Wav.decode(wav)
            val (ns, sumAbs, zc, peak) = graft.ops.Wav.features(chans(0))
            ("ok", 1L, ns, sumAbs, zc, peak)
          } catch {
            case e: IllegalArgumentException =>
              (graft.ops.Multimodal.errKind(e.getMessage), 1L, 0L, 0L, 0L, 0L)
          }
        }.toDF("outcome", "one", "n_samples", "sum_abs", "zc", "peak")
        audited.groupBy(col("outcome"))
          .agg(sum(col("one")).as("n_blobs"),
            sum(col("n_samples")).as("sum_samples"),
            sum(col("sum_abs")).as("sum_energy"),
            sum(col("zc")).as("sum_crossings"),
            max(col("peak")).as("max_peak"))
      },
      // sample i = (ascii(text[(5i+1) mod len])·2 − 219)·100, n = 48 + 4·(id%16);
      // zero crossings = adjacent sign changes (samples are never zero)
      Some("""WITH img AS (SELECT doc_id, text, length(text) AS len
            FROM documents WHERE length(text) > 0),
          smp AS (SELECT doc_id,
              CASE WHEN doc_id % 7 = 0 THEN 'unsupported' ELSE 'ok' END AS outcome,
              CASE WHEN doc_id % 7 = 0 THEN NULL ELSE
                list_transform(range(0, 48 + (doc_id % 16) * 4),
                  i -> (ascii(substring(text, ((i*5 + 1) % len) + 1, 1)) * 2 - 219) * 100)
              END AS s
            FROM img),
          f AS (SELECT outcome,
              COALESCE(CAST(length(s) AS BIGINT), 0) AS ns,
              COALESCE(CAST(list_sum(list_transform(s, x -> abs(x))) AS BIGINT), 0) AS sum_abs,
              COALESCE(CAST(length(list_filter(range(1, length(s)),
                i -> (s[i] > 0) <> (s[i+1] > 0))) AS BIGINT), 0) AS zc,
              COALESCE(CAST(list_max(list_transform(s, x -> abs(x))) AS BIGINT), 0) AS peak
            FROM smp)
        SELECT outcome, count(*) AS n_blobs,
          CAST(sum(ns) AS BIGINT) AS sum_samples,
          CAST(sum(sum_abs) AS BIGINT) AS sum_energy,
          CAST(sum(zc) AS BIGINT) AS sum_crossings,
          CAST(max(peak) AS BIGINT) AS max_peak
        FROM f GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // FLAC metadata audit ([[graft.ops.Flac]], round 12 — completing the
    // audio trio: MP3 frame walk mm05, WAV PCM mm15, FLAC here): each
    // document becomes one FLAC whose STREAMINFO and Vorbis TITLE tag
    // are deterministic formulas over (doc_id, text), written by our
    // encoder and strictly re-parsed (FlacSpec separately pins the
    // parser against the independent python fixture writer). Per-rate
    // aggregates pin the bit-packed STREAMINFO fields (20-bit rate,
    // 3-bit channels, 5-bit depth, 36-bit sample count), duration
    // seconds, and a TITLE checksum — one wrong bit through the packing
    // or the comment block's little-endian island breaks a sum. A
    // corpus-audit scan shape: per-row encode+parse, one tiny aggregate.
    GraftQuery(
      "mm17_flac_meta",
      (s, d) => {
        import s.implicits._
        val M = 1000000007L
        val rates = Array(8000, 16000, 22050, 44100, 48000)
        Tables.documents(s, d)
          .select(col("doc_id"), col("text"), col("n_chars"))
          .as[(Long, String, Long)]
          .map { case (id, text, nChars) =>
            val rate = rates((id % 5).toInt)
            val ch = 1 + (id % 2).toInt
            val bps = if (id % 3 == 0) 24 else 16
            val samples = nChars * 100L + (id % 97L)
            val md5 = Hash60Kernel.digest().digest(
              text.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
            val title = text.take(64)
            val bytes = graft.ops.Flac.write(rate, ch, bps, samples, md5,
              vendor = "graft", comments = Seq("TITLE" -> title),
              paddingBytes = 16)
            val m = graft.ops.Flac.read(bytes)
            (m.sampleRate, m.channels.toLong, m.bitsPerSample.toLong,
              m.totalSamples,
              m.totalSamples / m.sampleRate,
              Hash60Kernel.fold(Hash60Kernel.digest().digest(
                m.comments.head._2.getBytes(
                  java.nio.charset.StandardCharsets.US_ASCII))) % M,
              m.nBlocks.toLong)
          }
          .toDF("rate", "ch", "bps", "samples", "dur_s", "tc", "blocks")
          .groupBy(col("rate"))
          .agg(
            count(lit(1)).as("n_files"),
            sum(col("ch")).as("ch_sum"),
            count(when(col("bps") === 24, lit(1))).as("n_hidepth"),
            sum(col("samples")).as("sample_sum"),
            sum(col("dur_s")).as("dur_sum"),
            sum(col("tc")).as("title_check"),
            sum(col("blocks")).as("block_sum"))
      },
      Some(s"""WITH f AS (SELECT doc_id,
            CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
              WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END AS rate,
            1 + doc_id % 2 AS ch,
            CASE WHEN doc_id % 3 = 0 THEN 24 ELSE 16 END AS bps,
            n_chars * 100 + doc_id % 97 AS samples,
            ${TA.Sql.hash60("substring(text, 1, 64)")} % 1000000007 AS tc
          FROM documents)
        SELECT rate, count(*) AS n_files,
          CAST(sum(ch) AS BIGINT) AS ch_sum,
          count(CASE WHEN bps = 24 THEN 1 END) AS n_hidepth,
          CAST(sum(samples) AS BIGINT) AS sample_sum,
          CAST(sum(samples // rate) AS BIGINT) AS dur_sum,
          CAST(sum(tc) AS BIGINT) AS title_check,
          CAST(count(*) * 3 AS BIGINT) AS block_sum
        FROM f GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // FLAC frame decode to TRUE samples ([[graft.ops.FlacAudio]], round
    // 13 — the second full audio round trip after WAV mm15, now through
    // an entropy coder): each doc's text synthesizes 16-bit PCM — mono or
    // stereo by doc_id, L[i] = (ascii·2−219)·40 (odd×40: never zero),
    // R[i] = L[i] − (2·(ascii%50)−49) (odd side: R never zero, and the
    // small side keeps mid/side Rice codes honest) — ENCODES it as a real
    // FLAC stream (fixed predictors, Rice residuals, mid/side for stereo,
    // CRC-8/16, STREAMINFO MD5) and DECODES it back; every seventh doc's
    // final CRC-16 byte is flipped, which must surface as a typed
    // `crc_mismatch` row, never a task failure or silent garbage. The
    // oracle recomputes every feature from the same text arithmetic in
    // DuckDB — one wrong bit through prediction, Rice coding, stereo
    // decorrelation, or the CRC/MD5 checks breaks the hash. Scale:
    // per-row map, shuffle-free until the 2-row aggregate.
    GraftQuery(
      "mm18_flac_audio",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
          .transform(graft.core.Par.spread)
          .filter(length(col("text")) > 0)
          .select(col("doc_id"), col("text")).as[(Long, String)]
        val audited = docs.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
          val len = bytes.length
          val n = 150 + (id % 16).toInt * 16
          val nCh = 1 + (id % 2).toInt
          val left = Array.tabulate(n)(i =>
            ((bytes((i * 3 + 1) % len) & 0xff) * 2 - 219) * 40)
          val chans =
            if (nCh == 1) Array(left)
            else Array(left, Array.tabulate(n)(i =>
              left(i) - (2 * ((bytes((i * 5 + 2) % len) & 0xff) % 50) - 49)))
          val flac = graft.ops.FlacAudio.encode(16000, 16, chans, blockSize = 64)
          if (id % 7 == 0) flac(flac.length - 1) = (flac(flac.length - 1) ^ 1).toByte
          graft.ops.FlacAudio.decodeSafe(flac) match {
            case Right((_, pcm)) =>
              var ns = 0L; var sumAbs = 0L; var zc = 0L; var peak = 0L
              pcm.foreach { ch =>
                val (a, b, c, p) = graft.ops.FlacAudio.features(ch)
                ns += a; sumAbs += b; zc += c; peak = math.max(peak, p)
              }
              ("ok", 1L, ns, sumAbs, zc, peak)
            case Left(kind) => (kind, 1L, 0L, 0L, 0L, 0L)
          }
        }.toDF("outcome", "one", "n_samples", "sum_abs", "zc", "peak")
        audited.groupBy(col("outcome"))
          .agg(sum(col("one")).as("n_blobs"),
            sum(col("n_samples")).as("sum_samples"),
            sum(col("sum_abs")).as("sum_energy"),
            sum(col("zc")).as("sum_crossings"),
            max(col("peak")).as("max_peak"))
      },
      // L[i] = (ascii(text[(3i+1) mod len])·2 − 219)·40, n = 150 + 16·(id%16);
      // stereo (odd ids) adds R[i] = L[i] − (2·(ascii(text[(5i+2) mod len])%50) − 49);
      // samples are never zero, so crossings = adjacent sign changes per channel
      Some("""WITH a AS (SELECT doc_id, text, length(text) AS len
            FROM documents WHERE length(text) > 0),
          smp AS (SELECT doc_id,
              CASE WHEN doc_id % 7 = 0 THEN 'crc_mismatch' ELSE 'ok' END AS outcome,
              CASE WHEN doc_id % 7 = 0 THEN NULL ELSE
                list_transform(range(0, 150 + (doc_id % 16) * 16),
                  i -> (ascii(substring(text, ((i*3 + 1) % len) + 1, 1)) * 2 - 219) * 40)
              END AS l,
              CASE WHEN doc_id % 7 = 0 OR doc_id % 2 = 0 THEN NULL ELSE
                list_transform(range(0, 150 + (doc_id % 16) * 16),
                  i -> (ascii(substring(text, ((i*3 + 1) % len) + 1, 1)) * 2 - 219) * 40
                    - (2 * (ascii(substring(text, ((i*5 + 2) % len) + 1, 1)) % 50) - 49))
              END AS r
            FROM a),
          f AS (SELECT outcome,
              COALESCE(CAST(length(l) AS BIGINT), 0)
                + COALESCE(CAST(length(r) AS BIGINT), 0) AS ns,
              COALESCE(CAST(list_sum(list_transform(l, x -> abs(x))) AS BIGINT), 0)
                + COALESCE(CAST(list_sum(list_transform(r, x -> abs(x))) AS BIGINT), 0) AS sum_abs,
              COALESCE(CAST(length(list_filter(range(1, length(l)),
                i -> (l[i] > 0) <> (l[i+1] > 0))) AS BIGINT), 0)
                + COALESCE(CAST(length(list_filter(range(1, length(r)),
                  i -> (r[i] > 0) <> (r[i+1] > 0))) AS BIGINT), 0) AS zc,
              GREATEST(
                COALESCE(CAST(list_max(list_transform(l, x -> abs(x))) AS BIGINT), 0),
                COALESCE(CAST(list_max(list_transform(r, x -> abs(x))) AS BIGINT), 0)) AS peak
            FROM smp)
        SELECT outcome, count(*) AS n_blobs,
          CAST(sum(ns) AS BIGINT) AS sum_samples,
          CAST(sum(sum_abs) AS BIGINT) AS sum_energy,
          CAST(sum(zc) AS BIGINT) AS sum_crossings,
          CAST(max(peak) AS BIGINT) AS max_peak
        FROM f GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // ID3v2 tag audit (round 16 — [[graft.ops.Id3]]; the metadata block
    // crawled MP3s actually carry, complementing mm05's frame walk which
    // skips the tag as opaque bytes): even docs get v2.4 tags (syncsafe
    // frame sizes, all four text encodings rotating), odd docs v2.3
    // (plain u32 sizes, latin-1/UTF-16), five frames each (TIT2/TPE1/
    // TALB/TRCK/COMM with the language+description framing); the tag is
    // spliced into a real MP3 and both walks must agree on the tag
    // boundary. DuckDB replays every decoded STRING from the doc_id
    // arithmetic — the four encodings must all decode back to the same
    // text, so one wrong code-unit order or BOM slip breaks the hash.
    GraftQuery(
      "mm31_id3_audit",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"), col("lang"))
          .as[(String, Long, String, String)]
          .map { case (source, id, text, lang) =>
            val ver = if (id % 2 == 0) 4 else 3
            val enc = if (ver == 4) ((id / 2) % 4).toInt else ((id / 2) % 2).toInt
            val title = s"Track $id"
            val album = s"Album ${id % 10}"
            val track = s"${id % 12 + 1}/12"
            val comment = text.take(24)
            val tag = graft.ops.Id3.write(ver, Seq(
              ("TIT2", title, enc), ("TPE1", lang, 0), ("TALB", album, enc),
              ("TRCK", track, 0), ("COMM", comment, enc)))
            val mp3 = graft.ops.Mp3.encodeV1L3((id % 3).toInt,
              Seq((1 + (id % 14).toInt, false)), tag.length - 10,
              (fi, i) => if (fi < 0) tag(10 + i) else ((id + i) % 64).toByte)
            System.arraycopy(tag, 0, mp3, 0, tag.length)
            val t = graft.ops.Id3.parse(mp3)
            require(graft.ops.Mp3.parse(mp3).id3v2Bytes == tag.length,
              s"tag boundary doc $id")
            (source, t.version.toLong, t.frames.length.toLong,
              s"${t.title.get}|${t.artist.get}|${t.album.get}|" +
                s"${t.track.get}|${t.comment.get}")
          }
          .toDF("source", "ver", "n_frames", "ck")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_files"),
            sum(col("ver")).as("ver_sum"),
            sum(col("n_frames")).as("frame_sum"),
            sum(TA.hash60(col("ck")) % M).as("tag_check"))
      },
      Some(s"""WITH x AS (SELECT source,
            CASE WHEN doc_id % 2 = 0 THEN 4 ELSE 3 END AS ver,
            'Track ' || CAST(doc_id AS VARCHAR) || '|' || lang ||
              '|Album ' || CAST(doc_id % 10 AS VARCHAR) || '|' ||
              CAST(doc_id % 12 + 1 AS VARCHAR) || '/12|' ||
              substr(text, 1, 24) AS ck
          FROM documents)
        SELECT source, count(*) AS n_files,
          CAST(sum(ver) AS BIGINT) AS ver_sum,
          CAST(count(*) * 5 AS BIGINT) AS frame_sum,
          CAST(sum(${TA.Sql.hash60("ck")} % $M) AS BIGINT) AS tag_check
        FROM x GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // ADTS/AAC frame-stream audit (round 17 — [[graft.ops.Adts]]; the
    // missing mainstream audio framing next to mm05's MP3 walk): each doc
    // deterministically picks an AAC stream plan (MPEG-2/4 by parity,
    // profile/rate/channels from doc_id, 3-7 frames with varying
    // raw-data-block counts, CRC header form on every third doc) which
    // Adts.write emits as a genuine ADTS byte stream and the walker
    // parses back: syncword scan, 13-bit frame lengths, per-block 1024-
    // sample accounting, 7/9-byte header forms. Every audited number is
    // READ from the parsed headers; DuckDB replays the whole checksum —
    // including the sample-rate table and the integer-division duration —
    // from doc_id arithmetic. Per-row map, shuffle-free rollup.
    GraftQuery(
      "mm34_adts_audit",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"))
          .as[(String, Long)]
          .map { case (source, id) =>
            val nFrames = 3 + (id % 5).toInt
            val payloadLen = 20 + (id % 40).toInt
            val withCrc = id % 3 == 0
            val frames = (0 until nFrames).map(fi =>
              (payloadLen, withCrc && fi == 0, fi % 3))
            val bytes = graft.ops.Adts.write(
              mpeg4 = id % 2 == 0,
              profile = (id % 4).toInt,
              sfIdx = (id % 13).toInt,
              chanCfg = (id % 7).toInt + 1,
              frames = frames,
              gen = (fi, i) => ((id + fi * 31 + i) % 251).toByte)
            val m = graft.ops.Adts.parse(bytes)
            require(m.nFrames == nFrames && m.payloadBytes ==
              nFrames.toLong * payloadLen, s"adts round trip doc $id")
            (source, m.nSamples, m.durationMs,
              s"${m.mpegVersion}|${m.profile}|${m.sampleRate}|" +
                s"${m.channels}|${m.nFrames}|${m.nSamples}|" +
                s"${m.payloadBytes}|${m.durationMs}|${m.crcFrames}")
          }
          .toDF("source", "n_samples", "dur_ms", "ck")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_files"),
            sum(col("n_samples")).as("sample_sum"),
            sum(col("dur_ms")).as("dur_sum"),
            sum(TA.hash60(col("ck")) % M).as("aac_check"))
      },
      Some(s"""WITH x AS (SELECT source, doc_id AS id,
            3 + doc_id % 5 AS nf,
            20 + doc_id % 40 AS plen,
            -- blocks per frame cycle 1,2,3: cumulative over nf frames
            1024 * (CASE doc_id % 5 WHEN 0 THEN 6 WHEN 1 THEN 7
              WHEN 2 THEN 9 WHEN 3 THEN 12 ELSE 13 END) AS samples,
            CASE doc_id % 13 WHEN 0 THEN 96000 WHEN 1 THEN 88200
              WHEN 2 THEN 64000 WHEN 3 THEN 48000 WHEN 4 THEN 44100
              WHEN 5 THEN 32000 WHEN 6 THEN 24000 WHEN 7 THEN 22050
              WHEN 8 THEN 16000 WHEN 9 THEN 12000 WHEN 10 THEN 11025
              WHEN 11 THEN 8000 ELSE 7350 END AS rate,
            CASE WHEN doc_id % 2 = 0 THEN 4 ELSE 2 END AS ver,
            CASE doc_id % 4 WHEN 0 THEN 'Main' WHEN 1 THEN 'LC'
              WHEN 2 THEN 'SSR' ELSE 'LTP' END AS prof,
            doc_id % 7 + 1 AS ch,
            CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS crc
          FROM documents),
        y AS (SELECT source, samples, samples * 1000 // rate AS dur,
            CAST(ver AS VARCHAR) || '|' || prof || '|' ||
              CAST(rate AS VARCHAR) || '|' || CAST(ch AS VARCHAR) || '|' ||
              CAST(nf AS VARCHAR) || '|' || CAST(samples AS VARCHAR) ||
              '|' || CAST(nf * plen AS VARCHAR) || '|' ||
              CAST(samples * 1000 // rate AS VARCHAR) || '|' ||
              CAST(crc AS VARCHAR) AS ck
          FROM x)
        SELECT source, count(*) AS n_files,
          CAST(sum(samples) AS BIGINT) AS sample_sum,
          CAST(sum(dur) AS BIGINT) AS dur_sum,
          CAST(sum(${TA.Sql.hash60("ck")} % $M) AS BIGINT) AS aac_check
        FROM y GROUP BY 1"""),
    ),
  )
}
