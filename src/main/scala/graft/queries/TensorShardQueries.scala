package graft.queries

import graft.core.{GraftQuery, Tables}
import graft.ops.{Hash60Kernel, Tar, TextAnalysis => TA}
import org.apache.spark.sql.functions._
import TarQueries.{M, h60, sqlH60Mod, ascii, shardGroups, buildShard}

/** TENSOR-oriented ML shard codecs (NumPy npz, safetensors incl. F16,
  * Arrow IPC) plus the multimodal shard pipeline (pipe04), split out of
  * TarQueries in round 13 (registry hygiene; query bodies byte-identical).
  */
object TensorShardQueries {

  val all: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // NumPy .npz embedding-shard round trip ([[graft.ops.Npy]] — the
    // np.save/np.savez container an embedding dump or tokenized corpus
    // actually ships to a training stack): each shard group of the
    // embeddings table becomes one .npz of `ids` (int64 [n]) + `vecs`
    // (float32 [n, 64] C-order), strictly re-read; per-bucket aggregates
    // pin the ids, dimensions, and a fixed-point checksum of every
    // float32 element (f32→f64 is exact, ×1024 is an exponent shift,
    // HALF_UP-away-from-zero matches DuckDB's round — the Determinism
    // .intSum contract). NpySpec separately pins the writer BYTE-equal
    // to real np.save output. Same 100 TB shape as the container family:
    // schema-bounded build groups, per-shard map, one small aggregate.
    GraftQuery(
      "npy01_npz_shards",
      (s, d) => {
        import s.implicits._
        Tables.embeddings(s, d)
          .withColumn("g", expr("vec_id DIV 32"))
          .transform(graft.core.Par.byKey(_, col("g")))
          .groupBy(col("g"))
          .agg(sort_array(collect_list(struct(
            col("vec_id").as("_1"), col("embedding").as("_2")))).as("recs"))
          .as[(Long, Seq[(Long, Seq[Float])])]
          .flatMap { case (g, recs) =>
            val n = recs.length
            val dim = recs.head._2.length
            val ids = recs.map(_._1).toArray
            val flat = new Array[Float](n * dim)
            var i = 0
            recs.foreach { case (_, v) =>
              v.foreach { x => flat(i) = x; i += 1 }
            }
            val npz = graft.ops.Npy.writeNpz(Seq(
              "ids" -> graft.ops.Npy.writeLongs(ids),
              "vecs" -> graft.ops.Npy.writeFloats(Seq(n.toLong, dim.toLong), flat)))
            val back = graft.ops.Npy.readNpz(npz).toMap
            val bids = back("ids").longs
            val va = back("vecs")
            val bdim = va.shape(1).toInt
            val vs = va.floats
            bids.iterator.zipWithIndex.map { case (id, r) =>
              var vc = 0L
              var j = r * bdim
              val end = j + bdim
              while (j < end) {
                // exact binary expansion (never valueOf: the shortest
                // decimal repr can cross a .5 boundary the true value
                // doesn't) + HALF_UP = away-from-zero = DuckDB round
                vc += new java.math.BigDecimal(vs(j).toDouble * 1024.0)
                  .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
                j += 1
              }
              (g % 8, id, bdim.toLong, vc)
            }
          }
          .toDF("bucket", "id", "dim", "vc")
          .groupBy(col("bucket"))
          .agg(
            count(lit(1)).as("n_vecs"),
            sum(col("id")).as("id_sum"),
            sum(col("dim")).as("dim_sum"),
            sum(col("vc")).as("val_check"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          x AS (SELECT (vec_id // 32) % 8 AS bucket, vec_id, len(v) AS dim,
              CAST(list_sum(list_transform(v,
                y -> CAST(round(y * 1024) AS BIGINT))) AS BIGINT) AS vc
            FROM e)
        SELECT bucket, count(*) AS n_vecs,
          CAST(sum(vec_id) AS BIGINT) AS id_sum,
          CAST(sum(dim) AS BIGINT) AS dim_sum,
          CAST(sum(vc) AS BIGINT) AS val_check
        FROM x GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Fault-tolerant .npz scan: a deterministic slice of shards is
    // poisoned INSIDE the container — npy magic flip (bad_magic), descr
    // patched to an unsupported dtype (unsupported_dtype), data tail
    // dropped so the buffer no longer matches the declared shape
    // (size_mismatch) — and each rotten shard becomes ONE typed error
    // row while healthy shards contribute exact counts and checksums.
    // The tar02/zst02/avro02/tfr02 contract on the NumPy layer (the
    // poisons live at the npy level: ZIP-layer rot kinds are pinned by
    // ZstdSpec/NpySpec instead, where JDK-version-stable).
    GraftQuery(
      "npy02_poisoned_npz",
      (s, d) => {
        import s.implicits._
        Tables.embeddings(s, d)
          .withColumn("g", expr("vec_id DIV 32"))
          .transform(graft.core.Par.byKey(_, col("g")))
          .groupBy(col("g"))
          .agg(sort_array(collect_list(struct(
            col("vec_id").as("_1"), col("embedding").as("_2")))).as("recs"))
          .as[(Long, Seq[(Long, Seq[Float])])]
          .map { case (g, recs) =>
            val n = recs.length
            val dim = recs.head._2.length
            val ids = recs.map(_._1).toArray
            val flat = new Array[Float](n * dim)
            var i = 0
            recs.foreach { case (_, v) => v.foreach { x => flat(i) = x; i += 1 } }
            val idsNpy = graft.ops.Npy.writeLongs(ids)
            val vecsNpy = graft.ops.Npy.writeFloats(Seq(n.toLong, dim.toLong), flat)
            val (a, b) = (h60(s"npz:$g") % 7) match {
              case 0 =>
                val m = idsNpy.clone(); m(0) = (m(0) ^ 0x5a).toByte; (m, vecsNpy)
              case 1 =>
                val m = vecsNpy.clone()
                val at = (0 until m.length - 2).indexWhere(k =>
                  m(k) == '<' && m(k + 1) == 'f' && m(k + 2) == '4')
                m(at + 1) = 'u'; (idsNpy, m)
              case 2 => (idsNpy, java.util.Arrays.copyOf(vecsNpy, vecsNpy.length - 8))
              case _ => (idsNpy, vecsNpy)
            }
            val npz = graft.ops.Npy.writeNpz(Seq("ids" -> a, "vecs" -> b))
            graft.ops.Npy.readNpzSafe(npz) match {
              case Right(arrays) =>
                val m = arrays.toMap
                val bids = m("ids").longs
                ("ok", 1L, bids.length.toLong, bids.sum)
              case Left(kind) => (kind, 1L, 0L, 0L)
            }
          }
          .toDF("outcome", "one", "n_vecs", "id_sum")
          .groupBy()
          .agg(
            sum(col("one")).as("n_shards"),
            sum(when(col("outcome") === "ok", 1L).otherwise(0L)).as("n_ok"),
            sum(when(col("outcome") === "bad_magic", 1L).otherwise(0L)).as("n_magic"),
            sum(when(col("outcome") === "unsupported_dtype", 1L).otherwise(0L)).as("n_dtype"),
            sum(when(col("outcome") === "size_mismatch", 1L).otherwise(0L)).as("n_size"),
            sum(when(col("outcome") === "ok", col("n_vecs")).otherwise(0L)).as("vecs_ok"),
            sum(when(col("outcome") === "ok", col("id_sum")).otherwise(0L)).as("ids_ok"))
      },
      Some(s"""WITH g AS (SELECT vec_id // 32 AS g, count(*) AS n,
            CAST(sum(vec_id) AS BIGINT) AS ids
          FROM embeddings GROUP BY 1),
        c AS (SELECT g, n, ids,
            ${TA.Sql.hash60("'npz:' || CAST(g AS VARCHAR)")} % 7 AS p
          FROM g)
        SELECT count(*) AS n_shards,
          count(CASE WHEN p >= 3 THEN 1 END) AS n_ok,
          count(CASE WHEN p = 0 THEN 1 END) AS n_magic,
          count(CASE WHEN p = 1 THEN 1 END) AS n_dtype,
          count(CASE WHEN p = 2 THEN 1 END) AS n_size,
          CAST(sum(CASE WHEN p >= 3 THEN n ELSE 0 END) AS BIGINT) AS vecs_ok,
          CAST(sum(CASE WHEN p >= 3 THEN ids ELSE 0 END) AS BIGINT) AS ids_ok
        FROM c"""),
    ),

    // ------------------------------------------------------------------
    // safetensors embedding-shard round trip ([[graft.ops.Safetensors]]
    // — the tensor container the model ecosystem ships; u64-LE header
    // length + JSON header + raw LE buffer): each shard group of the
    // embeddings table becomes one file of `vecs` (F32 [n, 64]) + `ids`
    // (I64 [n]) with provenance __metadata__, strictly re-read (exact
    // offset-coverage validation). Aggregates mirror npy01's fixed-point
    // element checksum. The container-family 100 TB shape.
    GraftQuery(
      "st01_safetensors_shards",
      (s, d) => {
        import s.implicits._
        Tables.embeddings(s, d)
          .withColumn("g", expr("vec_id DIV 32"))
          .transform(graft.core.Par.byKey(_, col("g")))
          .groupBy(col("g"))
          .agg(sort_array(collect_list(struct(
            col("vec_id").as("_1"), col("embedding").as("_2")))).as("recs"))
          .as[(Long, Seq[(Long, Seq[Float])])]
          .flatMap { case (g, recs) =>
            val n = recs.length
            val dim = recs.head._2.length
            val flat = new Array[Float](n * dim)
            var i = 0
            recs.foreach { case (_, v) => v.foreach { x => flat(i) = x; i += 1 } }
            val shard = graft.ops.Safetensors.write(
              Seq(
                "vecs" -> graft.ops.Safetensors.floatTensor(
                  Seq(n.toLong, dim.toLong), flat),
                "ids" -> graft.ops.Safetensors.longTensor(recs.map(_._1).toArray)),
              metadata = Seq("shard" -> g.toString, "source" -> "graft"))
            val (ts, meta) = graft.ops.Safetensors.read(shard)
            require(meta("shard") == g.toString)
            val m = ts.toMap
            val ids = m("ids").longs
            val vs = m("vecs").floats
            val bdim = m("vecs").shape(1).toInt
            ids.iterator.zipWithIndex.map { case (id, r) =>
              var vc = 0L
              var j = r * bdim
              val end = j + bdim
              while (j < end) {
                vc += new java.math.BigDecimal(vs(j).toDouble * 1024.0)
                  .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
                j += 1
              }
              (g % 8, id, bdim.toLong, vc)
            }
          }
          .toDF("bucket", "id", "dim", "vc")
          .groupBy(col("bucket"))
          .agg(
            count(lit(1)).as("n_vecs"),
            sum(col("id")).as("id_sum"),
            sum(col("dim")).as("dim_sum"),
            sum(col("vc")).as("val_check"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          x AS (SELECT (vec_id // 32) % 8 AS bucket, vec_id, len(v) AS dim,
              CAST(list_sum(list_transform(v,
                y -> CAST(round(y * 1024) AS BIGINT))) AS BIGINT) AS vc
            FROM e)
        SELECT bucket, count(*) AS n_vecs,
          CAST(sum(vec_id) AS BIGINT) AS id_sum,
          CAST(sum(dim) AS BIGINT) AS dim_sum,
          CAST(sum(vc) AS BIGINT) AS val_check
        FROM x GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Half-precision safetensors shards ([[graft.ops.Safetensors]] F16,
    // round 12): the format real embedding dumps actually use. Vectors
    // quantize to the k/256 grid (exactly representable in binary16 for
    // |x| < 8, so the f32→f16→f32 trip is LOSSLESS by construction and
    // the oracle needs no half-float math: round(y·256)·4 IS the
    // dequantized checksum), ship as F16 tensors — the conversion
    // pinned BIT-identical to numpy astype(float16) by SafetensorsSpec
    // — and re-read through the dequantizing accessor. One wrong bit in
    // the RN-even conversion or the 2-byte layout breaks val_check.
    GraftQuery(
      "st03_half_precision",
      (s, d) => {
        import s.implicits._
        Tables.embeddings(s, d)
          .withColumn("g", expr("vec_id DIV 32"))
          .transform(graft.core.Par.byKey(_, col("g")))
          .groupBy(col("g"))
          .agg(sort_array(collect_list(struct(
            col("vec_id").as("_1"), col("embedding").as("_2")))).as("recs"))
          .as[(Long, Seq[(Long, Seq[Float])])]
          .flatMap { case (g, recs) =>
            val n = recs.length
            val dim = recs.head._2.length
            val grid = new Array[Float](n * dim)
            var i = 0
            recs.foreach { case (_, v) =>
              v.foreach { x =>
                // k/256 grid, HALF_UP away-from-zero = DuckDB round
                val k = new java.math.BigDecimal(x.toDouble * 256.0)
                  .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
                grid(i) = (k / 256.0).toFloat // exact: |k| < 2048
                i += 1
              }
            }
            val shard = graft.ops.Safetensors.write(Seq(
              "half" -> graft.ops.Safetensors.halfTensor(
                Seq(n.toLong, dim.toLong), grid),
              "ids" -> graft.ops.Safetensors.longTensor(recs.map(_._1).toArray)))
            val (ts, _) = graft.ops.Safetensors.read(shard)
            val m = ts.toMap
            val ids = m("ids").longs
            val hs = m("half").halfFloats
            ids.iterator.zipWithIndex.map { case (id, r) =>
              var vc = 0L
              var j = r * dim
              val end = j + dim
              while (j < end) {
                vc += new java.math.BigDecimal(hs(j).toDouble * 1024.0)
                  .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
                j += 1
              }
              (g % 8, id, vc)
            }
          }
          .toDF("bucket", "id", "vc")
          .groupBy(col("bucket"))
          .agg(
            count(lit(1)).as("n_vecs"),
            sum(col("id")).as("id_sum"),
            sum(col("vc")).as("val_check"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          x AS (SELECT (vec_id // 32) % 8 AS bucket, vec_id,
              CAST(list_sum(list_transform(v,
                y -> CAST(round(y * 256) AS BIGINT) * 4)) AS BIGINT) AS vc
            FROM e)
        SELECT bucket, count(*) AS n_vecs,
          CAST(sum(vec_id) AS BIGINT) AS id_sum,
          CAST(sum(vc) AS BIGINT) AS val_check
        FROM x GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Fault-tolerant safetensors scan: a deterministic slice of shards
    // is poisoned — header-JSON byte flip (bad_header), dtype patched to
    // an unmodeled one (unsupported_dtype), buffer tail dropped
    // (truncated: the last tensor's declared extent runs past the
    // buffer) — and each rotten shard becomes ONE typed error row while
    // healthy shards contribute exact counts. The container family's
    // contract on the safetensors layer.
    GraftQuery(
      "st02_poisoned_safetensors",
      (s, d) => {
        import s.implicits._
        Tables.embeddings(s, d)
          .withColumn("g", expr("vec_id DIV 32"))
          .transform(graft.core.Par.byKey(_, col("g")))
          .groupBy(col("g"))
          .agg(sort_array(collect_list(struct(
            col("vec_id").as("_1"), col("embedding").as("_2")))).as("recs"))
          .as[(Long, Seq[(Long, Seq[Float])])]
          .map { case (g, recs) =>
            val clean = graft.ops.Safetensors.write(Seq(
              "ids" -> graft.ops.Safetensors.longTensor(recs.map(_._1).toArray)))
            val shard = (h60(s"st:$g") % 7) match {
              case 0 => val b = clean.clone(); b(9) = (b(9) ^ 0x15).toByte; b
              case 1 =>
                val b = clean.clone()
                val at = (0 until b.length - 2).indexWhere(k =>
                  b(k) == 'I' && b(k + 1) == '6' && b(k + 2) == '4')
                b(at) = 'U'; b
              case 2 => java.util.Arrays.copyOf(clean, clean.length - 8)
              case _ => clean
            }
            graft.ops.Safetensors.readSafe(shard) match {
              case Right((ts, _)) =>
                val ids = ts.toMap.apply("ids").longs
                ("ok", 1L, ids.length.toLong, ids.sum)
              case Left(kind) => (kind, 1L, 0L, 0L)
            }
          }
          .toDF("outcome", "one", "n_vecs", "id_sum")
          .groupBy()
          .agg(
            sum(col("one")).as("n_shards"),
            sum(when(col("outcome") === "ok", 1L).otherwise(0L)).as("n_ok"),
            sum(when(col("outcome") === "bad_header", 1L).otherwise(0L)).as("n_header"),
            sum(when(col("outcome") === "unsupported_dtype", 1L).otherwise(0L)).as("n_dtype"),
            sum(when(col("outcome") === "truncated", 1L).otherwise(0L)).as("n_trunc"),
            sum(when(col("outcome") === "ok", col("n_vecs")).otherwise(0L)).as("vecs_ok"),
            sum(when(col("outcome") === "ok", col("id_sum")).otherwise(0L)).as("ids_ok"))
      },
      Some(s"""WITH g AS (SELECT vec_id // 32 AS g, count(*) AS n,
            CAST(sum(vec_id) AS BIGINT) AS ids
          FROM embeddings GROUP BY 1),
        c AS (SELECT g, n, ids,
            ${TA.Sql.hash60("'st:' || CAST(g AS VARCHAR)")} % 7 AS p
          FROM g)
        SELECT count(*) AS n_shards,
          count(CASE WHEN p >= 3 THEN 1 END) AS n_ok,
          count(CASE WHEN p = 0 THEN 1 END) AS n_header,
          count(CASE WHEN p = 1 THEN 1 END) AS n_dtype,
          count(CASE WHEN p = 2 THEN 1 END) AS n_trunc,
          CAST(sum(CASE WHEN p >= 3 THEN n ELSE 0 END) AS BIGINT) AS vecs_ok,
          CAST(sum(CASE WHEN p >= 3 THEN ids ELSE 0 END) AS BIGINT) AS ids_ok
        FROM c"""),
    ),

    // ------------------------------------------------------------------
    // Arrow IPC stream-shard round trip ([[graft.ops.ArrowIpc]] — the
    // zero-copy interchange container training stacks, DuckDB and
    // dataloaders consume natively; reader pinned bit-exact against
    // real pyarrow fixtures, writer read back by pyarrow 16 in the
    // round-12 differential): each shard group of documents becomes one
    // stream of (id int64, lang utf8, text utf8, score float64, keep
    // bool) split into two record batches (multi-batch framing on every
    // shard), strictly re-read. Aggregates mirror avro01's exactly —
    // one wrong byte through flatbuffer metadata, validity bitmaps, or
    // offset buffers breaks a checksum. The container-family 100 TB
    // shape: schema-bounded build groups, per-shard map, one small
    // aggregate.
    GraftQuery(
      "arrow01_ipc_shards",
      (s, d) => {
        import s.implicits._
        val fields = Vector(
          graft.ops.ArrowIpc.AField("id", "i64", nullable = false),
          graft.ops.ArrowIpc.AField("lang", "utf8", nullable = false),
          graft.ops.ArrowIpc.AField("text", "utf8", nullable = false),
          graft.ops.ArrowIpc.AField("score", "f64", nullable = false),
          graft.ops.ArrowIpc.AField("keep", "bool", nullable = false))
        shardGroups(s, d).flatMap { case (_, _, recs) =>
            import graft.ops.ArrowIpc._
            def cols(rs: Seq[(Long, String, String)]): Vector[ACol] = Vector(
              ALongCol("id", null, rs.map(_._1).toArray),
              AStrCol("lang", null, rs.map(_._3).toArray),
              AStrCol("text", null, rs.map(_._2).toArray),
              ADoubleCol("score", null,
                rs.map(r => (r._1 % 1000L) * 0.125).toArray),
              ABoolCol("keep", null, rs.map(_._1 % 3 == 0).toArray))
            val (front, rest) = recs.splitAt(recs.length / 2)
            val bytes = graft.ops.ArrowIpc.write(fields,
              Seq(cols(front), cols(rest)).filter(_.head.size > 0))
            graft.ops.ArrowIpc.read(bytes).iterator.flatMap { b =>
              val lang = b.cols(1).asInstanceOf[AStrCol].v
              val text = b.cols(2).asInstanceOf[AStrCol].v
              val score = b.cols(3).asInstanceOf[ADoubleCol].v
              val keep = b.cols(4).asInstanceOf[ABoolCol].v
              (0 until b.nRows).iterator.map { i =>
                (lang(i), text(i).length.toLong, text(i), score(i), keep(i))
              }
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
    // Arrow IPC embedding interchange: the embeddings table as
    // (id int64, vec list<float32>) streams — the EXACT shape a vector
    // index or retrieval trainer ingests — round-tripped per shard with
    // npy01's fixed-point element checksum (f32→f64 exact, ×1024
    // exponent shift, away-from-zero round = DuckDB's). Pins the list
    // offsets + child-data path at corpus scale.
    GraftQuery(
      "arrow02_embedding_ipc",
      (s, d) => {
        import s.implicits._
        val fields = Vector(
          graft.ops.ArrowIpc.AField("id", "i64", nullable = false),
          graft.ops.ArrowIpc.AField("vec", "list<f32>", nullable = false))
        Tables.embeddings(s, d)
          .withColumn("g", expr("vec_id DIV 32"))
          .transform(graft.core.Par.byKey(_, col("g")))
          .groupBy(col("g"))
          .agg(sort_array(collect_list(struct(
            col("vec_id").as("_1"), col("embedding").as("_2")))).as("recs"))
          .as[(Long, Seq[(Long, Seq[Float])])]
          .flatMap { case (g, recs) =>
            import graft.ops.ArrowIpc._
            val bytes = graft.ops.ArrowIpc.write(fields, Seq(Vector[ACol](
              ALongCol("id", null, recs.map(_._1).toArray),
              AFloatListCol("vec", null,
                recs.map(_._2.toArray).toArray, null))))
            graft.ops.ArrowIpc.read(bytes).iterator.flatMap { b =>
              val ids = b.cols(0).asInstanceOf[ALongCol].v
              val vecs = b.cols(1).asInstanceOf[AFloatListCol].v
              (0 until b.nRows).iterator.map { i =>
                var vc = 0L
                vecs(i).foreach { x =>
                  vc += new java.math.BigDecimal(x.toDouble * 1024.0)
                    .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
                }
                (g % 8, ids(i), vecs(i).length.toLong, vc)
              }
            }
          }
          .toDF("bucket", "id", "dim", "vc")
          .groupBy(col("bucket"))
          .agg(
            count(lit(1)).as("n_vecs"),
            sum(col("id")).as("id_sum"),
            sum(col("dim")).as("dim_sum"),
            sum(col("vc")).as("val_check"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          x AS (SELECT (vec_id // 32) % 8 AS bucket, vec_id, len(v) AS dim,
              CAST(list_sum(list_transform(v,
                y -> CAST(round(y * 1024) AS BIGINT))) AS BIGINT) AS vc
            FROM e)
        SELECT bucket, count(*) AS n_vecs,
          CAST(sum(vec_id) AS BIGINT) AS id_sum,
          CAST(sum(dim) AS BIGINT) AS dim_sum,
          CAST(sum(vc) AS BIGINT) AS val_check
        FROM x GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Fault-tolerant Arrow stream scan: a deterministic slice of shards
    // is poisoned — leading continuation-marker flip (bad_stream before
    // any parse), tail truncation mid-body (every declared buffer is
    // bounds-checked against the body → truncated) — and each rotten
    // stream becomes ONE typed error row; healthy shards contribute
    // exact counts and checksums. The tar02/zst02/avro02/tfr02/npy02
    // contract on the Arrow layer.
    GraftQuery(
      "arrow03_poisoned_ipc",
      (s, d) => {
        import s.implicits._
        val fields = Vector(
          graft.ops.ArrowIpc.AField("id", "i64", nullable = false),
          graft.ops.ArrowIpc.AField("text", "utf8", nullable = false))
        shardGroups(s, d).map { case (source, g, recs) =>
            import graft.ops.ArrowIpc._
            val clean = graft.ops.ArrowIpc.write(fields, Seq(Vector[ACol](
              ALongCol("id", null, recs.map(_._1).toArray),
              AStrCol("text", null, recs.map(_._2).toArray))))
            val shard = (h60(s"arrow:$source:$g") % 7) match {
              case 0 => val b = clean.clone(); b(0) = (b(0) ^ 0x5a).toByte; b
              case 1 => java.util.Arrays.copyOf(clean, clean.length - 24)
              case _ => clean
            }
            graft.ops.ArrowIpc.readSafe(shard) match {
              case Right(bs) =>
                var n = 0L
                var bc = 0L
                bs.foreach { b =>
                  val text = b.cols(1).asInstanceOf[AStrCol].v
                  n += b.nRows
                  text.foreach(t => bc += h60(t) % M)
                }
                (source, "ok", n, bc)
              case Left(kind) => (source, kind, 0L, 0L)
            }
          }
          .toDF("source", "outcome", "n_docs", "bc")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_shards"),
            count(when(col("outcome") === "ok", lit(1))).as("n_ok"),
            count(when(col("outcome") === "bad_stream", lit(1))).as("n_stream"),
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
            ${TA.Sql.hash60("'arrow:' || source || ':' || CAST(g AS VARCHAR)")} % 7 AS p
          FROM g)
        SELECT source, count(*) AS n_shards,
          count(CASE WHEN p >= 2 THEN 1 END) AS n_ok,
          count(CASE WHEN p = 0 THEN 1 END) AS n_stream,
          count(CASE WHEN p = 1 THEN 1 END) AS n_trunc,
          CAST(sum(CASE WHEN p >= 2 THEN n ELSE 0 END) AS BIGINT) AS docs_ok,
          CAST(sum(CASE WHEN p >= 2 THEN bc ELSE 0 END) AS BIGINT) AS txt_check
        FROM c GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Multimodal WebDataset shards end to end: each document becomes a
    // THREE-member training sample — {id}.png (a REAL PNG, encoded by the
    // fixture-proven codec from a raster the text determines), {id}.txt
    // (the caption), {id}.cls (the class) — packed into USTAR shards,
    // re-read through the WebDataset sample grouping, the image DECODED
    // back through the real PNG path, and audited per class: decoded
    // dimensions, a pixel checksum, and caption checksums. The oracle
    // recomputes the pixel sums from the TEXT (the mm03 construction:
    // pixels are a formula over the caption bytes, so DuckDB never needs
    // a PNG decoder) — one wrong byte through encode → tar → untar →
    // decode breaks a checksum. This is the multimodal training-shard
    // path (image+caption WebDataset) a vision-language corpus ships.
    GraftQuery(
      "pipe04_multimodal_shards",
      (s, d) => {
        import s.implicits._
        shardGroups(s, d).flatMap { case (_, _, recs) =>
            val entries = recs.filter(_._2.nonEmpty).flatMap { case (id, text, lang) =>
              val bytes = ascii(text)
              val ct = if (id % 2 == 0) 0 else 2 // gray : RGB
              val n = 16 * 16 * graft.ops.Png.channelsOf(ct)
              val px = Array.tabulate(n)(i => bytes((i * 7 + 3) % bytes.length))
              Seq(
                Tar.TarEntry(s"$id.png", graft.ops.Png.encode(16, 16, ct, px)),
                Tar.TarEntry(s"$id.txt", bytes),
                Tar.TarEntry(s"$id.cls", ascii(lang)))
            }
            val back = Tar.samples(Tar.read(Tar.write(entries)))
            back.iterator.map { case (_, parts) =>
              val (hdr, px) = graft.ops.Png.decode(parts("png"))
              var sum = 0L
              var i = 0
              while (i < px.length) { sum += px(i) & 0xff; i += 1 }
              val caption = new String(parts("txt"),
                java.nio.charset.StandardCharsets.US_ASCII)
              (new String(parts("cls"), java.nio.charset.StandardCharsets.US_ASCII),
                hdr.w.toLong, hdr.h.toLong, sum, h60(caption) % M,
                caption.length.toLong)
            }
          }
          .toDF("lang", "w", "h", "psum", "cap_check", "cap_len")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_samples"),
            sum(col("w")).as("sum_w"),
            sum(col("h")).as("sum_h"),
            sum(col("psum")).as("pixel_checksum"),
            sum(col("cap_check")).as("caption_check"),
            sum(col("cap_len")).as("caption_bytes"))
      },
      Some(s"""WITH img AS (SELECT doc_id, lang, text, length(text) AS len
            FROM documents WHERE length(text) > 0),
          px AS (SELECT doc_id, lang, text, len,
              CASE WHEN doc_id % 2 = 0 THEN 256 ELSE 768 END AS n
            FROM img),
          s AS (SELECT doc_id, lang, text,
              CAST(list_sum(list_transform(range(0, n),
                i -> ascii(substring(text, ((i*7 + 3) % len) + 1, 1))))
                AS BIGINT) AS psum
            FROM px)
        SELECT lang, count(*) AS n_samples,
          CAST(count(*) * 16 AS BIGINT) AS sum_w,
          CAST(count(*) * 16 AS BIGINT) AS sum_h,
          CAST(sum(psum) AS BIGINT) AS pixel_checksum,
          CAST(sum(${sqlH60Mod("text")}) AS BIGINT) AS caption_check,
          CAST(sum(length(text)) AS BIGINT) AS caption_bytes
        FROM s GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // GGUF embedding-shard round trip (round 14 — [[graft.ops.Gguf]], the
    // llama.cpp container local-inference dumps ship; completes the
    // tensor matrix after npz/safetensors/Arrow): each shard group
    // becomes one GGUF v3 file with an F32 `vecs` tensor and the ids as
    // an INT64 metadata array, strictly re-read (alignment, monotone
    // regions, typed refusals — GgufSpec pins the layout against an
    // independent python transcription). Same fixed-point checksum
    // contract as st01. Scale: per-shard map, one small-keyed aggregate.
    GraftQuery(
      "gg01_gguf_shards",
      (s, d) => {
        import s.implicits._
        Tables.embeddings(s, d)
          .withColumn("g", expr("vec_id DIV 32"))
          .transform(graft.core.Par.byKey(_, col("g")))
          .groupBy(col("g"))
          .agg(sort_array(collect_list(struct(
            col("vec_id").as("_1"), col("embedding").as("_2")))).as("recs"))
          .as[(Long, Seq[(Long, Seq[Float])])]
          .flatMap { case (g, recs) =>
            val n = recs.length
            val dim = recs.head._2.length
            val flat = new Array[Float](n * dim)
            var i = 0
            recs.foreach { case (_, v) => v.foreach { x => flat(i) = x; i += 1 } }
            val shard = graft.ops.Gguf.write(
              Seq(
                "general.name" -> graft.ops.Gguf.MString(s"shard-$g"),
                "graft.ids" -> graft.ops.Gguf.MArray(
                  recs.map(r => graft.ops.Gguf.MInt(r._1)).toVector)),
              Seq(("vecs", Vector(n.toLong, dim.toLong), Left(flat))))
            val m = graft.ops.Gguf.read(shard)
            require(m.meta("general.name").contains(graft.ops.Gguf.MString(s"shard-$g")))
            val ids = m.meta("graft.ids").get.asInstanceOf[graft.ops.Gguf.MArray]
              .items.map(_.asInstanceOf[graft.ops.Gguf.MInt].v)
            val vs = m.floats("vecs")
            val bdim = m.tensors.find(_.name == "vecs").get.dims(1).toInt
            ids.iterator.zipWithIndex.map { case (id, r) =>
              var vc = 0L
              var j = r * bdim
              val end = j + bdim
              while (j < end) {
                vc += new java.math.BigDecimal(vs(j).toDouble * 1024.0)
                  .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
                j += 1
              }
              (g % 8, id, bdim.toLong, vc)
            }
          }
          .toDF("bucket", "id", "dim", "vc")
          .groupBy(col("bucket"))
          .agg(
            count(lit(1)).as("n_vecs"),
            sum(col("id")).as("id_sum"),
            sum(col("dim")).as("dim_sum"),
            sum(col("vc")).as("val_check"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          x AS (SELECT (vec_id // 32) % 8 AS bucket, vec_id, len(v) AS dim,
              CAST(list_sum(list_transform(v,
                y -> CAST(round(y * 1024) AS BIGINT))) AS BIGINT) AS vc
            FROM e)
        SELECT bucket, count(*) AS n_vecs,
          CAST(sum(vec_id) AS BIGINT) AS id_sum,
          CAST(sum(dim) AS BIGINT) AS dim_sum,
          CAST(sum(vc) AS BIGINT) AS val_check
        FROM x GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // GGUF Q8_0 quantized-tensor round trip (round 15 — the form real
    // llama.cpp dumps actually ship; Gguf.scala previously refused all
    // quant types). Each shard group quantizes its vectors to Q8_0 with
    // a DETERMINISTIC dyadic contract so the oracle replays bit-exactly:
    // quants q_i = ((round(x_i*1000) % 113) + 113) % 113 - 56 (int8-safe),
    // per-row-block f16 scales d = (1 + (vec_id + blk) % 7) / 4 — both
    // exactly representable in f16/f32, so dequant*4 = q * d4 is an exact
    // integer with zero float ambiguity. The shard is written with raw
    // f16 scale bits (Gguf.Q8), strictly re-read through the bounded
    // reader (type-8 byteSize = elements/32*34, row%32 enforced), and
    // checksummed per id. k-quants beyond Q8_0 still refuse typed.
    // Scale: per-shard map, one small-keyed aggregate — as gg01.
    GraftQuery(
      "gg02_gguf_q8",
      (s, d) => {
        import s.implicits._
        Tables.embeddings(s, d)
          .withColumn("g", expr("vec_id DIV 32"))
          .transform(graft.core.Par.byKey(_, col("g")))
          .groupBy(col("g"))
          .agg(sort_array(collect_list(struct(
            col("vec_id").as("_1"), col("embedding").as("_2")))).as("recs"))
          .as[(Long, Seq[(Long, Seq[Float])])]
          .flatMap { case (g, recs) =>
            val n = recs.length
            val dim = recs.head._2.length
            require(dim % 32 == 0, s"dim $dim")
            val blocksPerRow = dim / 32
            val quants = new Array[Byte](n * dim)
            val scales = new Array[Short](n * blocksPerRow)
            recs.zipWithIndex.foreach { case ((id, v), r) =>
              var b = 0
              while (b < blocksPerRow) {
                scales(r * blocksPerRow + b) = graft.ops.Safetensors.floatToHalf(
                  (1 + ((id + b) % 7)) * 0.25f)
                b += 1
              }
              var i = 0
              while (i < dim) {
                val rounded = new java.math.BigDecimal(v(i).toDouble * 1000.0)
                  .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
                quants(r * dim + i) = ((((rounded % 113) + 113) % 113) - 56).toByte
                i += 1
              }
            }
            val shard = graft.ops.Gguf.writeTensors(
              Seq("graft.ids" -> graft.ops.Gguf.MArray(
                recs.map(r => graft.ops.Gguf.MInt(r._1)).toVector)),
              Seq(("q", Vector(dim.toLong, n.toLong),
                graft.ops.Gguf.Q8(scales, quants))))
            val m = graft.ops.Gguf.read(shard)
            val t = m.tensors.find(_.name == "q").get
            require(t.ggmlType == 8 && t.byteSize == n.toLong * blocksPerRow * 34,
              s"q8 layout: type ${t.ggmlType}, ${t.byteSize} bytes")
            val ids = m.meta("graft.ids").get.asInstanceOf[graft.ops.Gguf.MArray]
              .items.map(_.asInstanceOf[graft.ops.Gguf.MInt].v)
            val vs = m.floats("q")
            ids.iterator.zipWithIndex.map { case (id, r) =>
              var vc = 0L
              var i = 0
              while (i < dim) {
                // dequant*4 = q * d4 — exact by construction
                vc += new java.math.BigDecimal(vs(r * dim + i).toDouble * 4.0)
                  .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
                i += 1
              }
              (id % 8, id, dim.toLong, vc)
            }
          }
          .toDF("bucket", "id", "dim", "vc")
          .groupBy(col("bucket"))
          .agg(
            count(lit(1)).as("n_vecs"),
            sum(col("id")).as("id_sum"),
            sum(col("dim")).as("dim_sum"),
            sum(col("vc")).as("val_check"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          x AS (SELECT vec_id % 8 AS bucket, vec_id, len(v) AS dim,
              CAST(list_sum(list_transform(range(0, len(v)), i ->
                ((((CAST(round(v[i + 1] * 1000) AS BIGINT) % 113) + 113) % 113) - 56)
                  * (1 + ((vec_id + i // 32) % 7)))) AS BIGINT) AS vc
            FROM e)
        SELECT bucket, count(*) AS n_vecs,
          CAST(sum(vec_id) AS BIGINT) AS id_sum,
          CAST(sum(dim) AS BIGINT) AS dim_sum,
          CAST(sum(vc) AS BIGINT) AS val_check
        FROM x GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // GGUF Q4_0 round trip (round 15 — the OTHER quantization llama.cpp
    // dumps ship in volume; completes the quant pair next to gg02's
    // Q8_0): same dyadic determinism contract, but the quants are 4-bit
    // values in [0,15] nibble-packed by the writer (element j low, j+16
    // high) and dequantized x = d*(q-8). q_i = ((round(x_i*1000) % 16)
    // + 16) % 16; per-row-block scales d = (1 + (vec_id + blk) % 7)/4,
    // so dequant*4 = (q-8)*d4 is an exact integer. One wrong nibble in
    // the pack/unpack breaks the checksum. Scale: as gg01/gg02.
    GraftQuery(
      "gg03_gguf_q4",
      (s, d) => {
        import s.implicits._
        Tables.embeddings(s, d)
          .withColumn("g", expr("vec_id DIV 32"))
          .transform(graft.core.Par.byKey(_, col("g")))
          .groupBy(col("g"))
          .agg(sort_array(collect_list(struct(
            col("vec_id").as("_1"), col("embedding").as("_2")))).as("recs"))
          .as[(Long, Seq[(Long, Seq[Float])])]
          .flatMap { case (g, recs) =>
            val n = recs.length
            val dim = recs.head._2.length
            val blocksPerRow = dim / 32
            val quants = new Array[Byte](n * dim)
            val scales = new Array[Short](n * blocksPerRow)
            recs.zipWithIndex.foreach { case ((id, v), r) =>
              var b = 0
              while (b < blocksPerRow) {
                scales(r * blocksPerRow + b) = graft.ops.Safetensors.floatToHalf(
                  (1 + ((id + b) % 7)) * 0.25f)
                b += 1
              }
              var i = 0
              while (i < dim) {
                val rounded = new java.math.BigDecimal(v(i).toDouble * 1000.0)
                  .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
                quants(r * dim + i) = (((rounded % 16) + 16) % 16).toByte
                i += 1
              }
            }
            val shard = graft.ops.Gguf.writeTensors(
              Seq("graft.ids" -> graft.ops.Gguf.MArray(
                recs.map(r => graft.ops.Gguf.MInt(r._1)).toVector)),
              Seq(("q", Vector(dim.toLong, n.toLong),
                graft.ops.Gguf.Q4(scales, quants))))
            val m = graft.ops.Gguf.read(shard)
            val t = m.tensors.find(_.name == "q").get
            require(t.ggmlType == 2 && t.byteSize == n.toLong * blocksPerRow * 18,
              s"q4 layout: type ${t.ggmlType}, ${t.byteSize} bytes")
            val ids = m.meta("graft.ids").get.asInstanceOf[graft.ops.Gguf.MArray]
              .items.map(_.asInstanceOf[graft.ops.Gguf.MInt].v)
            val vs = m.floats("q")
            ids.iterator.zipWithIndex.map { case (id, r) =>
              var vc = 0L
              var i = 0
              while (i < dim) {
                vc += new java.math.BigDecimal(vs(r * dim + i).toDouble * 4.0)
                  .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
                i += 1
              }
              (id % 8, id, dim.toLong, vc)
            }
          }
          .toDF("bucket", "id", "dim", "vc")
          .groupBy(col("bucket"))
          .agg(
            count(lit(1)).as("n_vecs"),
            sum(col("id")).as("id_sum"),
            sum(col("dim")).as("dim_sum"),
            sum(col("vc")).as("val_check"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          x AS (SELECT vec_id % 8 AS bucket, vec_id, len(v) AS dim,
              CAST(list_sum(list_transform(range(0, len(v)), i ->
                ((((CAST(round(v[i + 1] * 1000) AS BIGINT) % 16) + 16) % 16) - 8)
                  * (1 + ((vec_id + i // 32) % 7)))) AS BIGINT) AS vc
            FROM e)
        SELECT bucket, count(*) AS n_vecs,
          CAST(sum(vec_id) AS BIGINT) AS id_sum,
          CAST(sum(dim) AS BIGINT) AS dim_sum,
          CAST(sum(vc) AS BIGINT) AS val_check
        FROM x GROUP BY 1"""),
    ),
  )
}
