package graft.queries

import graft.core.{GraftQuery, Tables}
import org.apache.spark.sql.functions._

/** WebP-family raster operators, split out of MediaQueries in round 14
  * (pack-size hygiene; queries and oracles byte-identical to their
  * pre-split forms): VP8L lossless round trip (mm12), VP8 lossy
  * keyframe decode (mm13), and animated VP8X/ANIM composition (mm19).
  */
object WebpQueries {

  val all: Seq[GraftQuery] = Seq(
    // ------------------------------------------------------------------
    // WebP VP8L round trip, oracle-audited end to end (round 10): each
    // doc's text fills an 8×8 RGBA raster, Webp.encodeLossless emits a
    // genuine RIFF/VP8L stream (canonical Huffman trees via the
    // code-length code; even doc_ids route through the subtract-green
    // transform) and the FULL spec decoder recovers it through the
    // MediaDecoder plug point. The audit sums every decoded RGBA byte;
    // the oracle recomputes the sum straight from the text in DuckDB —
    // a transform/tree/bit-order error anywhere breaks the hash. Scale:
    // per-row map, shuffle-free until the 1-row aggregate.
    GraftQuery(
      "mm12_webp_lossless",
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
            def at(j: Int) = bytes(j % bytes.length) & 0xff
            val rgba = new Array[Byte](8 * 8 * 4)
            var i = 0
            while (i < 64) {
              rgba(i * 4) = at(7 * i + 1).toByte
              rgba(i * 4 + 1) = at(5 * i + 2).toByte
              rgba(i * 4 + 2) = at(3 * i + 4).toByte
              rgba(i * 4 + 3) = 0xff.toByte
              i += 1
            }
            val webp = graft.ops.Webp.encodeLossless(8, 8, rgba,
              subtractGreen = id % 2 == 0)
            val blob = graft.ops.Multimodal.Blob(id, webp, "image/webp", Map.empty)
            val meta = dec.decode(blob) // the MediaDecoder trait path
            val (_, px) = graft.ops.BinaryMediaDecoder.webpRaster(blob)
            var sum = 0L
            var k = 0
            while (k < px.length) { sum += px(k) & 0xff; k += 1 }
            (meta.width.toLong, meta.height.toLong, sum)
          }
        }.toDF("w", "h", "psum")
        audited.agg(count(lit(1)).as("n_blobs"),
          sum(col("w")).as("sum_w"), sum(col("h")).as("sum_h"),
          sum(col("psum")).as("pixel_checksum"))
      },
      // pixel i: R=text[(7i+1)%len], G=text[(5i+2)%len], B=text[(3i+4)%len],
      // A=255 — decoded sum = Σ(R+G+B) + 64·255 per doc
      Some("""WITH img AS (SELECT doc_id, text, length(text) AS len
            FROM documents WHERE length(text) > 0),
          s AS (SELECT doc_id,
              CAST(list_sum(list_transform(range(0, 64), i ->
                ascii(substring(text, ((i*7 + 1) % len) + 1, 1)) +
                ascii(substring(text, ((i*5 + 2) % len) + 1, 1)) +
                ascii(substring(text, ((i*3 + 4) % len) + 1, 1)))) + 64*255
                AS BIGINT) AS psum
            FROM img)
        SELECT count(*) AS n_blobs,
          CAST(count(*) * 8 AS BIGINT) AS sum_w,
          CAST(count(*) * 8 AS BIGINT) AS sum_h,
          CAST(sum(psum) AS BIGINT) AS pixel_checksum
        FROM s"""),
    ),

    // ------------------------------------------------------------------
    // LOSSY WebP (VP8 keyframe) round trip, oracle-audited end to end
    // (round 11): each doc's text picks 16 flat 4x4 Y tiles; the subset
    // encoder emits a genuine VP8 keyframe (B_PRED/B_DC modes, qindex 0,
    // bool-coded headers + coefficient tokens against the shared default
    // tables) and the FULL keyframe decoder — bool decoder, mode trees,
    // token contexts, dequant, inverse DCT, intra prediction — recovers
    // the pixels. At qindex 0 the flat-tile construction is EXACTLY
    // lossless (dc level = 2·residual, the mm04/mm10 pattern), so the
    // oracle recomputes the decoded Y-plane sum straight from the text in
    // DuckDB — one wrong bit anywhere in the coder chain breaks the hash.
    // Scale: per-row map, shuffle-free until the 1-row aggregate.
    GraftQuery(
      "mm13_vp8_lossy",
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
            val tiles = Array.tabulate(16)(i =>
              bytes((i * 11 + 3) % bytes.length) & 0xff)
            val payload = graft.ops.Vp8.encodeDcLossless16(tiles)
            val chunk = "VP8 ".getBytes("US-ASCII") ++
              Array[Byte]((payload.length & 0xff).toByte,
                ((payload.length >> 8) & 0xff).toByte,
                ((payload.length >> 16) & 0xff).toByte, 0) ++
              payload ++
              (if (payload.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
            val webp = "RIFF".getBytes("US-ASCII") ++
              Array[Byte](((4 + chunk.length) & 0xff).toByte,
                (((4 + chunk.length) >> 8) & 0xff).toByte,
                (((4 + chunk.length) >> 16) & 0xff).toByte, 0) ++
              "WEBP".getBytes("US-ASCII") ++ chunk
            val blob = graft.ops.Multimodal.Blob(id, webp, "image/webp", Map.empty)
            val meta = dec.decode(blob) // the MediaDecoder trait path (RGBA)
            val yuv = graft.ops.Webp.decodeLossyYuv(webp)
            var sum = 0L
            var k = 0
            while (k < yuv.y.length) { sum += yuv.y(k) & 0xff; k += 1 }
            (meta.width.toLong, meta.height.toLong, sum)
          }
        }.toDF("w", "h", "psum")
        audited.agg(count(lit(1)).as("n_blobs"),
          sum(col("w")).as("sum_w"), sum(col("h")).as("sum_h"),
          sum(col("psum")).as("pixel_checksum"))
      },
      // tile i = text[(11i + 3) % len]; the decoded 16×16 Y plane holds
      // each tile 16 times — lossless by construction at qindex 0
      Some("""WITH img AS (SELECT doc_id, text, length(text) AS len
            FROM documents WHERE length(text) > 0),
          s AS (SELECT doc_id,
              CAST(list_sum(list_transform(range(0, 16), i ->
                16 * ascii(substring(text, ((i*11 + 3) % len) + 1, 1))))
                AS BIGINT) AS psum
            FROM img)
        SELECT count(*) AS n_blobs,
          CAST(count(*) * 16 AS BIGINT) AS sum_w,
          CAST(count(*) * 16 AS BIGINT) AS sum_h,
          CAST(sum(psum) AS BIGINT) AS pixel_checksum
        FROM s"""),
    ),

    // ------------------------------------------------------------------
    // ANIMATED WebP (round 13 — the GIF-animation twin mm11 at the other
    // end of the container aisle): each doc builds a genuine VP8X/ANIM/
    // ANMF stream — an 8×8 base frame plus two 4×4 patches, all carried
    // by real VP8L bitstreams from our encoder, odd docs disposing the
    // first patch to the ANIM background color — and WebpAnim walks it
    // back: container framing, frame metadata, per-frame VP8L decode,
    // and spec-exact canvas COMPOSITION (draw → snapshot → dispose).
    // Every seventh doc's container is truncated mid-frame, which must
    // surface as a typed `truncated` row. The checksum sums every RGBA
    // byte of every composed canvas STATE, and the oracle recomputes the
    // composition per pixel in DuckDB (rectangle membership, disposal,
    // overlap of the two patches) — one wrong pixel anywhere in framing,
    // VP8L, or composition breaks the hash. WebpAnimSpec separately pins
    // the decoder against a libwebp-encoded fixture. Scale: per-row map,
    // shuffle-free until the 2-row aggregate.
    GraftQuery(
      "mm19_webp_anim",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
          .transform(graft.core.Par.spread)
          .filter(length(col("text")) > 0)
          .select(col("doc_id"), col("text")).as[(Long, String)]
        val audited = docs.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
          def at(j: Int) = bytes(j % bytes.length) & 0xff
          def raster(n: Int, r: Int => Int, g: Int => Int, b: Int => Int) =
            Array.tabulate(n * n * 4) { i =>
              val q = i / 4
              (i % 4 match {
                case 0 => r(q); case 1 => g(q); case 2 => b(q); case _ => 0xff
              }).toByte
            }
          val base = raster(8, q => at(11 * q + 3), q => at(7 * q + 5), q => at(5 * q + 1))
          val f1 = raster(4, q => at(13 * q + 2), q => at(9 * q + 4), q => at(3 * q + 7))
          val f2 = raster(4, q => at(17 * q + 1), q => at(11 * q + 6), q => at(7 * q + 2))
          val anim = graft.ops.WebpAnim.encodeAnim(8, 8, (11, 22, 33, 255),
            (id % 4).toInt, Seq(
              graft.ops.WebpAnim.EncFrame(0, 0, 40, disposeBg = false, 8, 8, base),
              graft.ops.WebpAnim.EncFrame(2, 2, 50, disposeBg = id % 2 == 1, 4, 4, f1),
              graft.ops.WebpAnim.EncFrame(4, 4, 60, disposeBg = false, 4, 4, f2)))
          val blob = if (id % 7 == 0) java.util.Arrays.copyOf(anim, anim.length - 5) else anim
          graft.ops.WebpAnim.decodeSafe(blob) match {
            case Right((meta, states)) =>
              var sum = 0L
              states.foreach { c =>
                var k = 0
                while (k < c.length) { sum += c(k) & 0xff; k += 1 }
              }
              ("ok", 1L, meta.frames.length.toLong,
                meta.frames.map(_.durationMs.toLong).sum, meta.loopCount.toLong, sum)
            case Left(kind) => (kind, 1L, 0L, 0L, 0L, 0L)
          }
        }.toDF("outcome", "one", "frames", "dur", "loop", "csum")
        audited.groupBy(col("outcome"))
          .agg(sum(col("one")).as("n_blobs"),
            sum(col("frames")).as("sum_frames"),
            sum(col("dur")).as("sum_duration"),
            sum(col("loop")).as("loop_sum"),
            sum(col("csum")).as("canvas_checksum"))
      },
      // composition arithmetic per canvas state (px p: x=p%8, y=p//8):
      //   state0 = base everywhere
      //   state1 = f1 inside [2..5]², else base
      //   state2 = f2 inside [4..7]², else bg(321/px when odd-id disposal)
      //            inside [2..5]², else base
      Some("""WITH a AS (SELECT doc_id, text, length(text) AS len
            FROM documents WHERE length(text) > 0),
          px AS (SELECT doc_id, len, text,
              CASE WHEN doc_id % 7 = 0 THEN 'truncated' ELSE 'ok' END AS outcome,
              doc_id % 2 = 1 AS disp FROM a),
          s AS (SELECT doc_id, outcome,
              CASE WHEN outcome = 'ok' THEN
                list_sum(list_transform(range(0, 64), p ->
                  ascii(substring(text, ((11*p + 3) % len) + 1, 1)) +
                  ascii(substring(text, ((7*p + 5) % len) + 1, 1)) +
                  ascii(substring(text, ((5*p + 1) % len) + 1, 1)) + 255))
                +
                list_sum(list_transform(range(0, 64), p ->
                  CASE WHEN (p % 8) BETWEEN 2 AND 5 AND (p // 8) BETWEEN 2 AND 5 THEN
                    ascii(substring(text, ((13*(((p // 8) - 2) * 4 + (p % 8) - 2) + 2) % len) + 1, 1)) +
                    ascii(substring(text, ((9*(((p // 8) - 2) * 4 + (p % 8) - 2) + 4) % len) + 1, 1)) +
                    ascii(substring(text, ((3*(((p // 8) - 2) * 4 + (p % 8) - 2) + 7) % len) + 1, 1)) + 255
                  ELSE
                    ascii(substring(text, ((11*p + 3) % len) + 1, 1)) +
                    ascii(substring(text, ((7*p + 5) % len) + 1, 1)) +
                    ascii(substring(text, ((5*p + 1) % len) + 1, 1)) + 255
                  END))
                +
                list_sum(list_transform(range(0, 64), p ->
                  CASE WHEN (p % 8) BETWEEN 4 AND 7 AND (p // 8) BETWEEN 4 AND 7 THEN
                    ascii(substring(text, ((17*(((p // 8) - 4) * 4 + (p % 8) - 4) + 1) % len) + 1, 1)) +
                    ascii(substring(text, ((11*(((p // 8) - 4) * 4 + (p % 8) - 4) + 6) % len) + 1, 1)) +
                    ascii(substring(text, ((7*(((p // 8) - 4) * 4 + (p % 8) - 4) + 2) % len) + 1, 1)) + 255
                  WHEN (p % 8) BETWEEN 2 AND 5 AND (p // 8) BETWEEN 2 AND 5 THEN
                    CASE WHEN disp THEN 321 ELSE
                      ascii(substring(text, ((13*(((p // 8) - 2) * 4 + (p % 8) - 2) + 2) % len) + 1, 1)) +
                      ascii(substring(text, ((9*(((p // 8) - 2) * 4 + (p % 8) - 2) + 4) % len) + 1, 1)) +
                      ascii(substring(text, ((3*(((p // 8) - 2) * 4 + (p % 8) - 2) + 7) % len) + 1, 1)) + 255
                    END
                  ELSE
                    ascii(substring(text, ((11*p + 3) % len) + 1, 1)) +
                    ascii(substring(text, ((7*p + 5) % len) + 1, 1)) +
                    ascii(substring(text, ((5*p + 1) % len) + 1, 1)) + 255
                  END))
              ELSE 0 END AS csum
            FROM px)
        SELECT outcome, count(*) AS n_blobs,
          CAST(sum(CASE WHEN outcome = 'ok' THEN 3 ELSE 0 END) AS BIGINT) AS sum_frames,
          CAST(sum(CASE WHEN outcome = 'ok' THEN 150 ELSE 0 END) AS BIGINT) AS sum_duration,
          CAST(sum(CASE WHEN outcome = 'ok' THEN doc_id % 4 ELSE 0 END) AS BIGINT) AS loop_sum,
          CAST(sum(csum) AS BIGINT) AS canvas_checksum
        FROM s GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // LOSSY WebP WITH TRANSPARENCY (round 14): the VP8X + ALPH + VP8
    // layout libwebp writes for lossy-with-alpha images — mm13's
    // exactly-lossless VP8 construction plus an ALPH sidecar plane built
    // from the text (raw compression, filter method rotating per doc
    // through none/horizontal/vertical/gradient; the filters are
    // lossless, so the plane round-trips byte-exact). The audit decodes
    // the full container (alpha plane recovered through Webp.decodeAlpha,
    // pinned against libwebp by WebpAlphaSpec) and checksums Y plane +
    // alpha plane; the oracle recomputes both straight from the text in
    // DuckDB. Scale: per-row map, shuffle-free until the 1-row aggregate.
    GraftQuery(
      "mm22_lossy_alpha",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
          .transform(graft.core.Par.spread)
          .filter(length(col("text")) > 0)
          .select(col("doc_id"), col("text")).as[(Long, String)]
        val audited = docs.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
          val tiles = Array.tabulate(16)(i =>
            bytes((i * 11 + 3) % bytes.length) & 0xff)
          val payload = graft.ops.Vp8.encodeDcLossless16(tiles)
          val plane = Array.tabulate(256)(i =>
            bytes((i * 13 + 5) % bytes.length))
          val alph = graft.ops.Webp.encodeAlphaRaw(plane, 16, 16, (id % 4).toInt)
          val webp = graft.ops.Webp.wrapVp8xAlphaStill(16, 16, alph, payload)
          val (hd, rgba) = graft.ops.Webp.decode(webp)
          require(hd.hasAlpha && hd.w == 16 && hd.h == 16, "alpha still header")
          val yuv = graft.ops.Webp.decodeLossyYuv(webp)
          var sum = 0L
          var k = 0
          while (k < yuv.y.length) { sum += yuv.y(k) & 0xff; k += 1 }
          k = 3
          while (k < rgba.length) { sum += rgba(k) & 0xff; k += 4 }
          (hd.w.toLong, hd.h.toLong, sum)
        }.toDF("w", "h", "psum")
        audited.agg(count(lit(1)).as("n_blobs"),
          sum(col("w")).as("sum_w"), sum(col("h")).as("sum_h"),
          sum(col("psum")).as("pixel_checksum"))
      },
      // Y: 16 flat 4x4 tiles (16 px each) from text[(11i+3)%len];
      // alpha: 256 bytes from text[(13i+5)%len] — checksum = 16·Σtiles + Σalpha
      Some("""WITH img AS (SELECT doc_id, text, length(text) AS len
            FROM documents WHERE length(text) > 0),
          s AS (SELECT doc_id,
              CAST(16 * list_sum(list_transform(range(0, 16), i ->
                  ascii(substring(text, ((i*11 + 3) % len) + 1, 1))))
                + list_sum(list_transform(range(0, 256), i ->
                  ascii(substring(text, ((i*13 + 5) % len) + 1, 1)))) AS BIGINT) AS csum
            FROM img)
        SELECT count(*) AS n_blobs,
          CAST(16 * count(*) AS BIGINT) AS sum_w,
          CAST(16 * count(*) AS BIGINT) AS sum_h,
          CAST(sum(csum) AS BIGINT) AS pixel_checksum
        FROM s"""),
    ),

  )
}
