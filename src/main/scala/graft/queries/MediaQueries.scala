package graft.queries

import graft.core.{GraftQuery, Tables}
import graft.ops.{Hash60Kernel, TextAnalysis => TA}
import org.apache.spark.sql.functions._

/** Multimodal media operators: binary blob plumbing with the
  * deterministic stub codec (mm01/mm02) and the REAL pure-JVM codecs —
  * PNG/JPEG/GIF/TIFF raster round trips, palette/Adam7 decode, the
  * fault-tolerant mixed-corpus scan, and pHash dedup. Split out of
  * ExtQueries in round 9 (registry hygiene); the WebP family moved to
  * [[WebpQueries]] in round 14. Queries and oracles are byte-identical
  * to their pre-split forms.
  */
object MediaQueries {

  val all: Seq[GraftQuery] = Seq(
    // ------------------------------------------------------------------
    // multimodal pipeline plumbing (the codec is a deterministic stub —
    // this container ships no media libraries): wrap text bytes as binary
    // blobs with mime metadata, decode/feature-extract per partition,
    // sample frames, aggregate per mime type. The stub derives all metadata
    // from the portable 60-bit md5 hash of the payload, so the expected
    // aggregates ARE SQL-expressible — the oracle recomputes them in DuckDB.
    GraftQuery(
      "mm01_media_pipeline",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .transform(graft.core.Par.spread)
          .select(col("doc_id"),
            col("text").cast("binary").as("payload"),
            when(col("doc_id") % 2 === 0, "image/png").otherwise("video/mp4").as("mime"))
        val blobs = graft.ops.Multimodal.attachBlobs(
            docs.filter(col("mime") === "image/png"), "doc_id", "payload", "image/png")
          .union(graft.ops.Multimodal.attachBlobs(
            docs.filter(col("mime") === "video/mp4"), "doc_id", "payload", "video/mp4"))
        val dec = graft.ops.Multimodal.decode(blobs)
        // frame sampling is a per-VIDEO stage; join back on blob_id for the
        // mime rather than re-deriving the assignment rule above.
        val videoBlobs = blobs.filter(col("mime") === "video/mp4")
        val frameCounts = graft.ops.Multimodal.sampleFrames(videoBlobs, 4)
          .join(blobs.select(col("blob_id"), col("mime")), Seq("blob_id"))
          .groupBy(col("mime")).agg(count(lit(1)).as("n_frames_sampled"))
        dec.groupBy(col("mime"))
          .agg(
            count(lit(1)).as("n_blobs"),
            sum(col("width").cast("long")).as("sum_w"),
            sum(col("n_frames").cast("long")).as("sum_frames"),
            sum(round(element_at(col("features"), 1) * 1000).cast("long")).as("f0_millis"))
          .join(frameCounts, Seq("mime"), "left")
      },
      // Mirrors the stub decoder exactly: h = low-60-bit md5 of the UTF-8
      // payload; width = 16 + h%64; frames = 1 + (h>>16)%30 for video else 1;
      // feature[0] = (h%1000)/1000 (float32 — round(f*1000) recovers h%1000);
      // frame sampling takes min(4, frames) frames per video blob.
      Some("""WITH b AS (
          SELECT doc_id,
            CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'video/mp4' END AS mime,
            CAST('0x' || substring(md5(text), 1, 15) AS BIGINT) AS h
          FROM documents),
        d AS (
          SELECT mime, 16 + h % 64 AS w,
            CASE WHEN mime = 'video/mp4' THEN 1 + ((h >> 16) % 30) ELSE 1 END AS frames,
            h % 1000 AS f0
          FROM b)
        SELECT mime, count(*) AS n_blobs,
          CAST(sum(w) AS BIGINT) AS sum_w,
          CAST(sum(frames) AS BIGINT) AS sum_frames,
          CAST(sum(f0) AS BIGINT) AS f0_millis,
          CASE WHEN mime = 'video/mp4' THEN CAST(sum(least(4, frames)) AS BIGINT) END AS n_frames_sampled
        FROM d GROUP BY mime"""),
    ),

    // ------------------------------------------------------------------
    // Multimodal resize stage, output-parity audited: every image blob runs
    // through the per-partition resize operator (stub codec, REAL byte
    // plumbing — binary in, binary out, shuffle-free) and the audit sums the
    // actual output bytes. The oracle recomputes the stub's sampling formula
    // from the source text in DuckDB, so a single byte out of place in the
    // Spark-side Dataset[Blob] path fails the hash compare. Corpus is
    // ASCII, so char positions = byte positions in both engines.
    GraftQuery(
      "mm02_resize_audit",
      (s, d) => {
        val imgs = Tables.documents(s, d)
          .transform(graft.core.Par.spread)
          // empty payloads are excluded SYMMETRICALLY with the oracle: the
          // stub resize defines out[i] = payload[(31·i+w+h) mod len], which
          // has no value at len = 0 (the oracle's modulus would divide by
          // zero) — the audit's parity must be structural, not dependent on
          // the corpus happening to lack empty even-doc_id texts
          .filter(col("doc_id") % 2 === 0 && length(col("text")) > 0)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
        val resized = graft.ops.Multimodal.resize(
          graft.ops.Multimodal.attachBlobs(imgs, "doc_id", "payload", "image/png"),
          64, 64)
        resized.toDF()
          .select(
            length(col("content")).cast("long").as("out_len"),
            expr("""aggregate(transform(sequence(1, 64),
              i -> ascii(cast(substr(content, i, 1) as string))),
              0L, (a, x) -> a + cast(x as bigint))""").as("bsum"))
          .agg(count(lit(1)).as("n_blobs"),
            sum(col("out_len")).as("total_out_bytes"),
            sum(col("bsum")).as("byte_checksum"))
      },
      // stub resize: 64·64/64 = 64 output bytes, out[i] = payload[(31·i +
      // w + h) mod len] (0-based) — recomputed from text below (1-based
      // substring, +1 shift)
      Some("""WITH img AS (SELECT doc_id, text, length(text) AS len
            FROM documents WHERE doc_id % 2 = 0 AND length(text) > 0),
          s AS (SELECT doc_id,
              CAST(list_sum(list_transform(range(0, 64),
                i -> ascii(substring(text, ((i*31 + 128) % len) + 1, 1))))
                AS BIGINT) AS bsum
            FROM img)
        SELECT count(*) AS n_blobs,
          CAST(count(*) * 64 AS BIGINT) AS total_out_bytes,
          CAST(sum(bsum) AS BIGINT) AS byte_checksum
        FROM s"""),
    ),

    // ------------------------------------------------------------------
    // REAL compressed-media decode, oracle-audited end to end: each doc's
    // text bytes become a deterministic 16×16 raster (gray for even
    // doc_ids, RGB for odd), ENCODED as a genuine zlib-deflate PNG (filter
    // types cycling 0..4 per row) and DECODED back through the
    // BinaryMediaDecoder plug point — JDK Inflater + the five PNG filter
    // reconstructions, CRC-checked chunks. The audit sums the decoded
    // pixel bytes; the oracle recomputes that sum straight from the text
    // in DuckDB, so ONE wrong byte anywhere in the encode→deflate→
    // inflate→unfilter path breaks the hash match. Scale: per-row map,
    // shuffle-free until the 2-row aggregate; the raster checksum costs a
    // single inflate per blob (pngRaster), not one per pixel row. Corpus
    // is ASCII (the mm02 convention), so char positions = byte positions
    // in both engines.
    GraftQuery(
      "mm03_png_roundtrip",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
          .transform(graft.core.Par.spread)
          // empty payloads excluded symmetrically with the oracle, as in
          // mm02: the pixel formula indexes text mod len
          .filter(length(col("text")) > 0)
          .select(col("doc_id"), col("text")).as[(Long, String)]
        val blobs = docs.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
          val ct = if (id % 2 == 0) 0 else 2 // gray : RGB
          val n = 16 * 16 * graft.ops.Png.channelsOf(ct)
          val px = Array.tabulate(n)(i => bytes((i * 7 + 3) % bytes.length))
          graft.ops.Multimodal.Blob(
            id, graft.ops.Png.encode(16, 16, ct, px), "image/png", Map.empty)
        }
        val audited = blobs.mapPartitions { it =>
          val dec = graft.ops.BinaryMediaDecoder.open()
          it.map { b =>
            val meta = dec.decode(b) // the MediaDecoder trait path (IHDR)
            val (_, px) = graft.ops.BinaryMediaDecoder.pngRaster(b)
            var sum = 0L; var i = 0
            while (i < px.length) { sum += px(i) & 0xff; i += 1 }
            (if (px.length == 256) "gray" else "rgb",
              meta.width.toLong, meta.height.toLong, sum)
          }
        }.toDF("color", "w", "h", "psum")
        audited.groupBy(col("color"))
          .agg(count(lit(1)).as("n_blobs"),
            sum(col("w")).as("sum_w"), sum(col("h")).as("sum_h"),
            sum(col("psum")).as("pixel_checksum"))
      },
      Some("""WITH img AS (SELECT doc_id, text, length(text) AS len
            FROM documents WHERE length(text) > 0),
          px AS (SELECT doc_id,
              CASE WHEN doc_id % 2 = 0 THEN 256 ELSE 768 END AS n, len, text
            FROM img),
          s AS (SELECT doc_id, n,
              CAST(list_sum(list_transform(range(0, n),
                i -> ascii(substring(text, ((i*7 + 3) % len) + 1, 1))))
                AS BIGINT) AS psum
            FROM px)
        SELECT CASE WHEN n = 256 THEN 'gray' ELSE 'rgb' END AS color,
          count(*) AS n_blobs,
          CAST(count(*) * 16 AS BIGINT) AS sum_w,
          CAST(count(*) * 16 AS BIGINT) AS sum_h,
          CAST(sum(psum) AS BIGINT) AS pixel_checksum
        FROM s GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // REAL lossy-format decode with an EXACT oracle: JPEG is DCT-lossy in
    // general, but a grayscale image whose every 8×8 block is CONSTANT,
    // quantized with a flat (all-ones) table, survives the round trip
    // bit-exactly — only the DC coefficient is nonzero and the integer
    // IDCT returns the block constant for the full 0..255 range (see
    // ops/Jpeg.scala). Each doc's text bytes pick the four block values of
    // a 16×16 gray raster; the blob is a GENUINE baseline JPEG (SOI/DQT/
    // SOF0/DHT/SOS markers, Annex-K DC Huffman coding, byte stuffing)
    // decoded back through the full general decoder — marker walk, Huffman
    // entropy decode, dequantize, integer IDCT. The audit sums decoded
    // pixels; the oracle recomputes 64·Σ block values straight from the
    // text in DuckDB, so ONE wrong bit anywhere in the encode→entropy→
    // IDCT path breaks the hash match. Scale: per-row map, shuffle-free
    // until the 1-row aggregate; corpus is ASCII (the mm02 convention).
    GraftQuery(
      "mm04_jpeg_roundtrip",
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
            val jpg = graft.ops.Jpeg.encodeGrayBlocks(16, 16,
              (bx, by) => bytes(((by * 2 + bx) * 13 + 5) % bytes.length) & 0xff)
            val blob = graft.ops.Multimodal.Blob(id, jpg, "image/jpeg", Map.empty)
            val meta = dec.decode(blob) // the MediaDecoder trait path
            val (_, px) = graft.ops.BinaryMediaDecoder.jpegRaster(blob)
            var sum = 0L; var i = 0
            while (i < px.length) { sum += px(i) & 0xff; i += 1 }
            (meta.width.toLong, meta.height.toLong, sum)
          }
        }.toDF("w", "h", "psum")
        audited.agg(count(lit(1)).as("n_blobs"),
          sum(col("w")).as("sum_w"), sum(col("h")).as("sum_h"),
          sum(col("psum")).as("pixel_checksum"))
      },
      Some("""WITH img AS (SELECT doc_id, text, length(text) AS len
            FROM documents WHERE length(text) > 0),
          s AS (SELECT doc_id,
              CAST(list_sum(list_transform(range(0, 4),
                b -> 64 * ascii(substring(text, ((b*13 + 5) % len) + 1, 1))))
                AS BIGINT) AS psum
            FROM img)
        SELECT count(*) AS n_blobs,
          CAST(count(*) * 16 AS BIGINT) AS sum_w,
          CAST(count(*) * 16 AS BIGINT) AS sum_h,
          CAST(sum(psum) AS BIGINT) AS pixel_checksum
        FROM s"""),
    ),


    // ------------------------------------------------------------------
    // REAL LZW decode, oracle-audited end to end: each doc's text bytes
    // pick a 4-color palette AND a 16×16 index raster; Gif.encode emits a
    // genuine GIF89a (real LZW bit packing, clear codes, sub-block
    // framing) and the general Gif decoder walks it back — variable-width
    // code reads, dictionary bookkeeping, palette application. The audit
    // sums the decoded RGB bytes; the oracle recomputes palette[idx]
    // straight from the text in DuckDB, so one wrong bit anywhere in the
    // pack→LZW→palette path breaks the hash. Scale: per-row map,
    // shuffle-free until the 1-row aggregate; corpus is ASCII (the mm02
    // convention).
    GraftQuery(
      "mm06_gif_roundtrip",
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
            val palette = Array.tabulate(12)(j => bytes((j * 5 + 1) % len))
            val idx = Array.tabulate(16 * 16)(i => ((bytes((i * 3 + 2) % len) & 0xff) % 4).toByte)
            val blob = graft.ops.Multimodal.Blob(
              id, graft.ops.Gif.encode(16, 16, palette, idx), "image/gif", Map.empty)
            val meta = dec.decode(blob) // the MediaDecoder trait path
            val (_, px) = graft.ops.BinaryMediaDecoder.gifRaster(blob)
            var sum = 0L; var i = 0
            while (i < px.length) { sum += px(i) & 0xff; i += 1 }
            (meta.width.toLong, meta.height.toLong, sum)
          }
        }.toDF("w", "h", "psum")
        audited.agg(count(lit(1)).as("n_blobs"),
          sum(col("w")).as("sum_w"), sum(col("h")).as("sum_h"),
          sum(col("psum")).as("pixel_checksum"))
      },
      // palette channel (entry j, channel c) = text[(3j+c)·5+1 mod len];
      // pixel i's index = text[3i+2 mod len] mod 4; checksum = Σ_i Σ_c
      // palette[idx_i·3+c]
      Some("""WITH img AS (SELECT doc_id, text, length(text) AS len
            FROM documents WHERE length(text) > 0),
          s AS (SELECT doc_id,
              CAST(list_sum(list_transform(range(0, 256), i ->
                list_sum(list_transform(range(0, 3), c ->
                  ascii(substring(text,
                    ((((ascii(substring(text, ((i*3 + 2) % len) + 1, 1)) % 4)
                       * 3 + c) * 5 + 1) % len) + 1, 1)))))) AS BIGINT) AS psum
            FROM img)
        SELECT count(*) AS n_blobs,
          CAST(count(*) * 16 AS BIGINT) AS sum_w,
          CAST(count(*) * 16 AS BIGINT) AS sum_h,
          CAST(sum(psum) AS BIGINT) AS pixel_checksum
        FROM s"""),
    ),

    // ------------------------------------------------------------------
    // REAL codec through the REAL Spark operator: mm02 audits the
    // Dataset[Blob] resize plumbing with the stub codec; this is the same
    // output-parity audit with BinaryMediaDecoder plugged in — each doc's
    // text becomes a genuine 16×16 P5 PGM, Multimodal.resize (the
    // per-partition operator a training pipeline runs, not a direct
    // function call) downsamples it 2× through the real PNM parse +
    // nearest-neighbor + re-emit, and the audit checksums the actual
    // output bytes. The oracle recomputes the NN mapping (out[y,x] =
    // in[2y,2x]) straight from the text, and total_out_bytes pins the
    // writer's exact header+raster length. Scale: two chained per-row
    // maps, shuffle-free until the 1-row aggregate; corpus is ASCII.
    GraftQuery(
      "mm07_resize_real_codec",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
          .transform(graft.core.Par.spread)
          .filter(length(col("text")) > 0)
          .select(col("doc_id"), col("text")).as[(Long, String)]
        val blobs = docs.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
          val head = "P5\n16 16\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
          val px = Array.tabulate(16 * 16)(i => bytes((i * 7 + 3) % bytes.length))
          graft.ops.Multimodal.Blob(id, head ++ px, "image/x-portable-graymap", Map.empty)
        }
        val resized = graft.ops.Multimodal.resize(
          blobs, 8, 8, graft.ops.BinaryMediaDecoder)
        resized.map { b =>
          var sum = 0L
          var i = b.content.length - 64 // "P5\n8 8\n255\n" header + 64 samples
          while (i < b.content.length) { sum += b.content(i) & 0xff; i += 1 }
          (b.content.length.toLong, sum)
        }.toDF("out_len", "psum")
          .agg(count(lit(1)).as("n_blobs"),
            sum(col("out_len")).as("total_out_bytes"),
            sum(col("psum")).as("pixel_checksum"))
      },
      // NN 2× downsample: out pixel i (row i//8, col i%8) = source sample
      // (32·(i//8) + 2·(i%8)), source sample j = text[7j+3 mod len];
      // output file = 11 header bytes ("P5\n8 8\n255\n") + 64 samples
      Some("""WITH img AS (SELECT doc_id, text, length(text) AS len
            FROM documents WHERE length(text) > 0),
          s AS (SELECT doc_id,
              CAST(list_sum(list_transform(range(0, 64), i ->
                ascii(substring(text,
                  ((((i // 8) * 32 + (i % 8) * 2) * 7 + 3) % len) + 1, 1))))
                AS BIGINT) AS psum
            FROM img)
        SELECT count(*) AS n_blobs,
          CAST(count(*) * 75 AS BIGINT) AS total_out_bytes,
          CAST(sum(psum) AS BIGINT) AS pixel_checksum
        FROM s"""),
    ),

    // ------------------------------------------------------------------
    // PALETTE + Adam7 round trip, oracle-audited end to end (round 9):
    // each doc's text bytes pick a 16-entry RGB palette AND a 16×16
    // depth-4 index raster; Png.encodeIndexed emits a genuine palette PNG
    // (sub-byte bit packing, PLTE chunk, Adam7 interlace for even
    // doc_ids) and the general Png decoder walks it back — per-pass
    // unfiltering, 4-bit unpacking, deinterleave, PLTE resolution to RGB.
    // The audit sums the decoded RGB bytes; the oracle recomputes
    // palette[index] straight from the text in DuckDB, so one wrong bit
    // anywhere in the pack→filter→deflate→inflate→deinterleave→PLTE path
    // breaks the hash. Scale: per-row map, shuffle-free until the 2-row
    // aggregate; corpus is ASCII (the mm02 convention).
    GraftQuery(
      "mm08_palette_adam7",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
          .transform(graft.core.Par.spread)
          .filter(length(col("text")) > 0)
          .select(col("doc_id"), col("text")).as[(Long, String)]
        val audited = docs.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
          val len = bytes.length
          val pal = Array.tabulate(16 * 3)(i => bytes(i % len))
          val idx = Array.tabulate(16 * 16)(k => ((bytes((k * 5 + 1) % len) & 0xff) % 16).toByte)
          val interlaced = id % 2 == 0
          val png = graft.ops.Png.encodeIndexed(16, 16, 4, pal, idx, interlaced)
          val (hd, px) = graft.ops.Png.decode(png)
          require(hd.w == 16 && hd.h == 16 && hd.colorType == 2)
          var sum = 0L; var i = 0
          while (i < px.length) { sum += px(i) & 0xff; i += 1 }
          (if (interlaced) "adam7" else "linear", sum)
        }.toDF("layout", "psum")
        audited.groupBy(col("layout"))
          .agg(count(lit(1)).as("n_blobs"),
            sum(col("psum")).as("pixel_checksum"))
      },
      // palette[i][c] = text[(3i+c) mod len]; index(k) = text[(5k+1) mod
      // len] mod 16; pixel sum = Σ_k Σ_c palette[index(k)][c]
      Some("""WITH img AS (SELECT doc_id, text, length(text) AS len
            FROM documents WHERE length(text) > 0),
          s AS (SELECT doc_id,
              CASE WHEN doc_id % 2 = 0 THEN 'adam7' ELSE 'linear' END AS layout,
              CAST(list_sum(list_transform(range(0, 256), k ->
                ascii(substring(text, (((ascii(substring(text, ((k*5 + 1) % len) + 1, 1)) % 16)*3 + 0) % len) + 1, 1)) +
                ascii(substring(text, (((ascii(substring(text, ((k*5 + 1) % len) + 1, 1)) % 16)*3 + 1) % len) + 1, 1)) +
                ascii(substring(text, (((ascii(substring(text, ((k*5 + 1) % len) + 1, 1)) % 16)*3 + 2) % len) + 1, 1))))
                AS BIGINT) AS psum
            FROM img)
        SELECT layout, count(*) AS n_blobs,
          CAST(sum(psum) AS BIGINT) AS pixel_checksum
        FROM s GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // PROGRESSIVE JPEG (SOF2) round trip, oracle-audited end to end
    // (round 9): the mm04 construction — each doc's text picks a 16×16
    // grid of constant 8×8 blocks, flat quantizer, DC-only — emitted as a
    // genuine four-scan Annex-G progressive stream (DC successive
    // approximation Al=1→0, whole-band AC scans as EOB runs) and decoded
    // through the general progressive path: coefficient accumulation
    // across scans, EOBRUN skips, the DC refinement bit. DC-only + flat
    // quantizer decodes EXACTLY (the mm04 lossless construction), so the
    // oracle recomputes the decoded pixel sum straight from the text in
    // DuckDB — one wrong bit in any scan breaks the hash. Scale: per-row
    // map, shuffle-free until the 1-row aggregate.
    GraftQuery(
      "mm10_jpeg_progressive",
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
            val jpg = graft.ops.Jpeg.encodeGrayBlocksProgressive(16, 16,
              (bx, by) => bytes(((by * 2 + bx) * 13 + 5) % bytes.length) & 0xff)
            val blob = graft.ops.Multimodal.Blob(id, jpg, "image/jpeg", Map.empty)
            val meta = dec.decode(blob) // the MediaDecoder trait path
            val (_, px) = graft.ops.BinaryMediaDecoder.jpegRaster(blob)
            var sum = 0L; var i = 0
            while (i < px.length) { sum += px(i) & 0xff; i += 1 }
            (meta.width.toLong, meta.height.toLong, sum)
          }
        }.toDF("w", "h", "psum")
        audited.agg(count(lit(1)).as("n_blobs"),
          sum(col("w")).as("sum_w"), sum(col("h")).as("sum_h"),
          sum(col("psum")).as("pixel_checksum"))
      },
      // identical formula to mm04 — the progressive bitstream must decode
      // to the same DC-only pixels the baseline twin carries
      Some("""WITH img AS (SELECT doc_id, text, length(text) AS len
            FROM documents WHERE length(text) > 0),
          s AS (SELECT doc_id,
              CAST(list_sum(list_transform(range(0, 4),
                b -> 64 * ascii(substring(text, ((b*13 + 5) % len) + 1, 1))))
                AS BIGINT) AS psum
            FROM img)
        SELECT count(*) AS n_blobs,
          CAST(count(*) * 16 AS BIGINT) AS sum_w,
          CAST(count(*) * 16 AS BIGINT) AS sum_h,
          CAST(sum(psum) AS BIGINT) AS pixel_checksum
        FROM s"""),
    ),

    // ------------------------------------------------------------------
    // ANIMATED GIF round trip, oracle-audited end to end (round 9): each
    // doc's text picks a 4-color palette, 2-5 frames of 16×16 index
    // rasters, and per-frame delays; Gif.encodeAnim emits a genuine
    // multi-frame GIF89a (graphic-control extensions, per-frame LZW) and
    // the animation walker decodes it back — frameMeta counts frames and
    // delays WITHOUT LZW decode (the curation metadata scan), decodeAnim
    // recovers every frame's pixels. The audit sums decoded RGB bytes
    // across ALL frames plus the delay total; the oracle recomputes both
    // straight from the text in DuckDB. Scale: per-row map, shuffle-free
    // until the 1-row aggregate; corpus is ASCII (the mm02 convention).
    GraftQuery(
      "mm11_gif_anim",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
          .transform(graft.core.Par.spread)
          .filter(length(col("text")) > 0)
          .select(col("doc_id"), col("text")).as[(Long, String)]
        val audited = docs.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
          val len = bytes.length
          val k = 2 + (len % 4)
          val pal = Array.tabulate(12)(j => bytes((j * 5 + 1) % len))
          val frames = (0 until k).map { f =>
            (Array.tabulate(16 * 16)(i =>
              ((bytes((i * 3 + f * 7 + 2) % len) & 0xff) % 4).toByte),
              1 + (bytes((f * 13 + 3) % len) & 0xff) % 100)
          }
          val gif = graft.ops.Gif.encodeAnim(16, 16, pal, frames)
          val (nFrames, totalDelay) = graft.ops.Gif.frameMeta(gif)
          val anim = graft.ops.Gif.decodeAnim(gif)
          require(anim.frames.length == nFrames)
          var sum = 0L
          anim.frames.foreach { fr =>
            val rgb = fr.rgb
            var i = 0
            while (i < rgb.length) { sum += rgb(i) & 0xff; i += 1 }
          }
          (nFrames.toLong, totalDelay.toLong, sum)
        }.toDF("frames", "delay_cs", "psum")
        audited.agg(count(lit(1)).as("n_blobs"),
          sum(col("frames")).as("sum_frames"),
          sum(col("delay_cs")).as("sum_delay_cs"),
          sum(col("psum")).as("pixel_checksum"))
      },
      // k = 2 + len%4 frames; palette[j] = text[(5j+1) mod len];
      // index(f, i) = text[(3i + 7f + 2) mod len] mod 4;
      // delay(f) = 1 + text[(13f + 3) mod len] mod 100
      Some("""WITH img AS (SELECT doc_id, text, length(text) AS len,
              2 + length(text) % 4 AS k
            FROM documents WHERE length(text) > 0),
          s AS (SELECT doc_id, k,
              CAST(list_sum(list_transform(range(0, k), f ->
                1 + ascii(substring(text, ((f*13 + 3) % len) + 1, 1)) % 100))
                AS BIGINT) AS delay_cs,
              CAST(list_sum(list_transform(range(0, k), f ->
                list_sum(list_transform(range(0, 256), i ->
                  ascii(substring(text, (((ascii(substring(text, ((i*3 + f*7 + 2) % len) + 1, 1)) % 4)*3 + 0)*5 + 1) % len + 1, 1)) +
                  ascii(substring(text, (((ascii(substring(text, ((i*3 + f*7 + 2) % len) + 1, 1)) % 4)*3 + 1)*5 + 1) % len + 1, 1)) +
                  ascii(substring(text, (((ascii(substring(text, ((i*3 + f*7 + 2) % len) + 1, 1)) % 4)*3 + 2)*5 + 1) % len + 1, 1))))))
                AS BIGINT) AS psum
            FROM img)
        SELECT count(*) AS n_blobs,
          CAST(sum(k) AS BIGINT) AS sum_frames,
          CAST(sum(delay_cs) AS BIGINT) AS sum_delay_cs,
          CAST(sum(psum) AS BIGINT) AS pixel_checksum
        FROM s"""),
    ),



    // ------------------------------------------------------------------
    // Fault-TOLERANT mixed-corpus media scan (round 9): a quarter of the
    // corpus decodes cleanly (4×4 gray PNG from text bytes), the rest is
    // the realistic crawl debris — arithmetic-coded JPEG (SOF9, a format
    // the codec REFUSES by contract), truncated PNG downloads, and
    // text-mislabeled-as-image. decodeSafe routes every refusal to a
    // typed error ROW (the E9 error-fallback pattern) instead of failing
    // the task, and the per-kind counts — themselves curation signal —
    // are the audited output. One wrong classification or a task-killing
    // throw anywhere breaks the row/hash match. Scale: per-row map,
    // shuffle-free until the 4-row aggregate.
    GraftQuery(
      "mm09_mixed_media_errors",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
          .transform(graft.core.Par.spread)
          .filter(length(col("text")) > 0)
          .select(col("doc_id"), col("text")).as[(Long, String)]
        val blobs = docs.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
          val len = bytes.length
          (id % 5) match {
            case 0 => // valid: 4x4 gray PNG
              val px = Array.tabulate(16)(i => bytes((i * 3 + 1) % len))
              graft.ops.Multimodal.Blob(id,
                graft.ops.Png.encode(4, 4, 0, px), "image/png", Map.empty)
            case 1 => // arithmetic-coded JPEG: SOI + SOF9 — typed refusal
              // (progressive SOF2 DECODES since round 9, so the refused
              // exemplar moved to the arithmetic mode the codec documents
              // as out of scope)
              graft.ops.Multimodal.Blob(id,
                Array(0xff, 0xd8, 0xff, 0xc9, 0x00, 0x04, 0x00, 0x00).map(_.toByte),
                "image/jpeg", Map.empty)
            case 2 => // truncated download: valid PNG cut mid-IEND
              val px = Array.tabulate(16)(i => bytes((i * 3 + 1) % len))
              graft.ops.Multimodal.Blob(id,
                graft.ops.Png.encode(4, 4, 0, px).dropRight(10), "image/png", Map.empty)
            case 3 => // text bytes mislabeled as an image
              graft.ops.Multimodal.Blob(id, bytes, "image/png", Map.empty)
            case _ => // VP8 INTER frame (round 11: keyframes now decode, so
              // the honestly-unsupported class is a frame that needs
              // reference buffers — typed "unsupported" refusal)
              val body = Array[Byte](1, 0, 0, 0x9d.toByte, 0x01, 0x2a,
                24, 0, 10, 0, 0, 0, 0, 0, 0, 0, 0, 0)
              val riff = "RIFF".getBytes("US-ASCII") ++
                Array[Byte]((4 + 8 + body.length).toByte, 0, 0, 0) ++
                "WEBP".getBytes("US-ASCII") ++
                "VP8 ".getBytes("US-ASCII") ++
                Array[Byte](body.length.toByte, 0, 0, 0) ++ body
              graft.ops.Multimodal.Blob(id, riff, "image/webp", Map.empty)
          }
        }
        val res = graft.ops.Multimodal.decodeSafe(blobs, graft.ops.BinaryMediaDecoder)
        res.toDF()
          .withColumn("kind", when(col("ok"), "ok").otherwise(col("err_kind")))
          .groupBy(col("kind"))
          .agg(count(lit(1)).as("n_blobs"),
            sum(col("width").cast("long")).as("sum_w"),
            sum(col("height").cast("long")).as("sum_h"))
      },
      // kinds are a pure function of doc_id mod 5: ok (decoded 4×4),
      // unsupported (SOF9 arithmetic JPEG and inter-frame VP8 WebP merge
      // into one kind row), truncated (cut chunk), not_media (bad
      // signature); error rows carry width = height = 0
      Some("""WITH img AS (SELECT doc_id FROM documents WHERE length(text) > 0),
          c AS (SELECT CASE doc_id % 5 WHEN 0 THEN 'ok' WHEN 1 THEN 'unsupported'
              WHEN 2 THEN 'truncated' WHEN 3 THEN 'not_media'
              ELSE 'unsupported' END AS kind,
              CASE WHEN doc_id % 5 = 0 THEN 4 ELSE 0 END AS w
            FROM img)
        SELECT kind, count(*) AS n_blobs,
          CAST(sum(w) AS BIGINT) AS sum_w, CAST(sum(w) AS BIGINT) AS sum_h
        FROM c GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // TIFF round trip over the full option grid (the scan/scientific
    // raster format a crawl corpus still carries): each doc's text bytes
    // become the mm03 formula raster (gray for even doc_ids, RGB for
    // odd), ENCODED as a genuine multi-strip TIFF whose compression
    // (none / PackBits / LZW+predictor, by doc_id%3) and byte order
    // (MM for doc_id%5=0) vary per blob, and DECODED back through
    // graft.ops.Tiff (strip reassembly, PackBits, the shared PDF/TIFF
    // early-change LZW, horizontal-predictor reconstruction). The audit
    // sums decoded pixel bytes per (color, compression); the oracle
    // recomputes that sum straight from the text — one wrong byte in any
    // encode→compress→decompress→unpredict path breaks the hash match.
    GraftQuery(
      "mm14_tiff_roundtrip",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
          .transform(graft.core.Par.spread)
          .filter(length(col("text")) > 0)
          .select(col("doc_id"), col("text")).as[(Long, String)]
        val audited = docs.mapPartitions { it =>
          it.map { case (id, text) =>
            val bytes = text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
            val ch = if (id % 2 == 0) 1 else 3
            val px = Array.tabulate(16 * 16 * ch)(i => bytes((i * 7 + 3) % bytes.length))
            val comp = (id % 3) match { case 0 => 1; case 1 => 32773; case _ => 5 }
            val t = graft.ops.Tiff.encode(16, 16, ch, px, comp,
              bigEndian = id % 5 == 0, predictor = if (comp == 5) 2 else 1,
              rowsPerStrip = 4)
            val (hd, out) = graft.ops.Tiff.decode(t)
            var sum = 0L; var i2 = 0
            while (i2 < out.length) { sum += out(i2) & 0xff; i2 += 1 }
            (if (ch == 1) "gray" else "rgb",
              comp match { case 1 => "none"; case 32773 => "packbits"; case _ => "lzw" },
              hd.w.toLong, sum)
          }
        }.toDF("color", "comp", "w", "psum")
        audited.groupBy(col("color"), col("comp"))
          .agg(count(lit(1)).as("n_blobs"), sum(col("w")).as("sum_w"),
            sum(col("psum")).as("pixel_checksum"))
      },
      Some("""WITH img AS (SELECT doc_id, text, length(text) AS len
            FROM documents WHERE length(text) > 0),
          px AS (SELECT doc_id,
              CASE WHEN doc_id % 2 = 0 THEN 256 ELSE 768 END AS n, len, text,
              CASE WHEN doc_id % 2 = 0 THEN 'gray' ELSE 'rgb' END AS color,
              CASE doc_id % 3 WHEN 0 THEN 'none' WHEN 1 THEN 'packbits'
                ELSE 'lzw' END AS comp
            FROM img),
          s AS (SELECT color, comp,
              CAST(list_sum(list_transform(range(0, n),
                i -> ascii(substring(text, ((i*7 + 3) % len) + 1, 1))))
                AS BIGINT) AS psum
            FROM px)
        SELECT color, comp, count(*) AS n_blobs,
          CAST(count(*) * 16 AS BIGINT) AS sum_w,
          CAST(sum(psum) AS BIGINT) AS pixel_checksum
        FROM s GROUP BY 1, 2"""),
    ),



    // ------------------------------------------------------------------
    // Perceptual-hash image dedup (round 12): the image-modality twin of
    // dedup04's simhash — a 63-bit pHash per image, exact-duplicate
    // buckets, pair counts. The classic pHash thresholds low-frequency
    // DCT coefficients against their median; this one uses the
    // Walsh-Hadamard transform instead (the same spectral-signature
    // idea, but EXACT in 64-bit integers: ±1 basis, no cosines), so the
    // oracle recomputes every hash bit-for-bit in SQL. DC is excluded,
    // which makes the hash invariant to global brightness shifts BY
    // LINEARITY — each group's four variants (pixel = LCG(group, i) +
    // doc_id%4) land in one bucket through the REAL PNG encode→deflate→
    // decode→unfilter path, so one wrong pixel byte anywhere breaks
    // both the hash checksum and the bucket structure. Banded hamming
    // search over these hashes is dedup04's machinery (12×5-bit bands);
    // this query pins the pixel→hash contract. Scale: per-row map, one
    // map-side-combinable groupBy on the 8-byte hash — the exchange
    // carries (hash, count), never pixels.
    GraftQuery(
      "mm16_phash_dedup",
      (s, d) => {
        import s.implicits._
        val M = 1000000007L
        val ids = Tables.documents(s, d)
          .transform(graft.core.Par.spread)
          .select(col("doc_id")).as[Long]
        val hashes = ids.mapPartitions { it =>
          val md = graft.ops.Hash60Kernel.digest()
          it.map { id =>
            val gk = id / 4
            val px = Array.tabulate(64) { i =>
              md.reset()
              val h = graft.ops.Hash60Kernel.fold(md.digest(
                s"px:$gk:$i".getBytes(java.nio.charset.StandardCharsets.US_ASCII)))
              (h % 200 + id % 4).toByte
            }
            val blob = graft.ops.Multimodal.Blob(
              id, graft.ops.Png.encode(8, 8, 0, px), "image/png", Map.empty)
            val (_, back) = graft.ops.BinaryMediaDecoder.pngRaster(blob)
            // 2D natural-order WHT over the DECODED raster, AC only
            val coeffs = Array.tabulate(63) { k =>
              val c = k + 1; val u = c / 8; val v = c % 8
              var sum = 0L; var i = 0
              while (i < 64) {
                val sign = 1 - 2 * ((Integer.bitCount(u & (i / 8)) +
                  Integer.bitCount(v & (i % 8))) & 1)
                sum += sign * (back(i) & 0xff).toLong
                i += 1
              }
              sum
            }
            val med = coeffs.sorted.apply(31)
            var hash = 0L; var k = 0
            while (k < 63) {
              if (coeffs(k) > med) hash |= 1L << k
              k += 1
            }
            hash
          }
        }.toDF("hash")
        val buckets = hashes.groupBy(col("hash")).agg(count(lit(1)).as("n"))
        buckets.agg(
          sum(col("n")).as("n_images"),
          count(lit(1)).as("n_hashes"),
          sum(expr("n * (n - 1) DIV 2")).as("dup_pairs"),
          sum((col("hash") % M) * col("n")).as("hash_check"))
      },
      Some(s"""WITH px AS (SELECT doc_id,
            list_transform(range(0, 64), i ->
              ${TA.Sql.hash60("concat('px:', CAST(doc_id // 4 AS VARCHAR), ':', CAST(i AS VARCHAR))")}
                % 200 + doc_id % 4) AS p
          FROM documents),
          h AS (SELECT
            list_transform(range(1, 64), c -> CAST(list_sum(list_transform(range(0, 64),
              i -> p[i + 1]
                * (1 - 2 * ((bit_count((c // 8) & (i // 8))
                  + bit_count((c % 8) & (i % 8))) % 2)))) AS BIGINT)) AS coeffs
          FROM px),
          m AS (SELECT coeffs, list_sort(coeffs)[32] AS med FROM h),
          hh AS (SELECT CAST(list_sum(list_transform(range(1, 64),
              c -> CASE WHEN coeffs[c] > med
                THEN (CAST(1 AS BIGINT) << (c - 1)) ELSE 0 END)) AS BIGINT) AS hash
            FROM m),
          b AS (SELECT hash, count(*) AS n FROM hh GROUP BY 1)
        SELECT CAST(sum(n) AS BIGINT) AS n_images,
          count(*) AS n_hashes,
          CAST(sum(n * (n - 1) // 2) AS BIGINT) AS dup_pairs,
          CAST(sum((hash % 1000000007) * n) AS BIGINT) AS hash_check
        FROM b"""),
    ),

  )
}
