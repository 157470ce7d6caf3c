package graft.queries

import graft.core.{GraftQuery, Tables}
import org.apache.spark.sql.functions._

/** GGUF k-quant operators (round 16, split from [[TensorShardQueries]]
  * at the ~1000-LoC pack bound): Q4_K, Q5_K and Q6_K — the 256-element
  * super-block quantizations llama.cpp artifacts overwhelmingly ship
  * (gg02/gg03 cover the legacy Q8_0/Q4_0 32-element forms). Same dyadic
  * determinism contract as gg02: every scale/min is an exactly-
  * representable small dyadic, every quant an integer arithmetic of the
  * embedding values, so dequant×4 is an exact integer both engines
  * replay. Scale: per-shard-group map, one small-keyed aggregate; block
  * tables are KB-sized per shard, nothing corpus-sized materializes.
  */
object QuantShardQueries {

  /** embeddings grouped into shard groups of ≤32 vectors, sorted by id. */
  private def vecGroups(s: org.apache.spark.sql.SparkSession, d: String) = {
    import s.implicits._
    Tables.embeddings(s, d)
      .withColumn("g", expr("vec_id DIV 32"))
      .transform(graft.core.Par.byKey(_, col("g")))
      .groupBy(col("g"))
      .agg(sort_array(collect_list(struct(
        col("vec_id").as("_1"), col("embedding").as("_2")))).as("recs"))
      .as[(Long, Seq[(Long, Seq[Float])])]
  }

  private def q1000(x: Float, m: Int): Int = {
    val rounded = new java.math.BigDecimal(x.toDouble * 1000.0)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    ((((rounded % m) + m) % m)).toInt
  }

  private def exactInt(x: Double): Long =
    new java.math.BigDecimal(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  val all: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // GGUF Q4_K round trip: each ≤32-vector group flattens to one
    // (256, blocks) tensor (dim 64 → a super-block spans 4 vectors; the
    // tail group pads with e%16 codes that no checksum reads). Quants
    // q_e = ((round(x*1000) % 16)+16)%16; per-32-element sub-block
    // scales sc_s = 1+(s%5), mins m_s = s%3 with s = (vec_id%32)*2+i/32;
    // super-block d = 0.25, dmin = 0.5 — so dequant×4 = q*sc - 2*m is an
    // exact integer. The writer packs the 12-byte get_scale_min_k4 field
    // and the 64-chunk nibble layout; the bounded reader re-derives
    // every value. One wrong bit in either 6-bit scale half or any
    // nibble breaks the checksum. k-quant conformance is additionally
    // pinned byte-identical vs the independent python packing (GgufSpec).
    GraftQuery(
      "gg04_gguf_q4k",
      (s, d) => {
        import s.implicits._
        vecGroups(s, d).flatMap { case (_, recs) =>
            val n = recs.length
            val dim = recs.head._2.length
            recs.zipWithIndex.foreach { case ((id, _), r) =>
              require(id % 32 == r, s"non-contiguous vec_id $id at $r")
            }
            val blocks = (n * dim + 255) / 256
            val codes = new Array[Byte](blocks * 256)
            var e = n * dim
            while (e < codes.length) { codes(e) = (e % 16).toByte; e += 1 }
            recs.zipWithIndex.foreach { case ((_, v), r) =>
              var i = 0
              while (i < dim) {
                codes(r * dim + i) = q1000(v(i), 16).toByte
                i += 1
              }
            }
            val sc = Array.tabulate[Byte](blocks * 8)(s0 => (1 + s0 % 5).toByte)
            val mn = Array.tabulate[Byte](blocks * 8)(s0 => (s0 % 3).toByte)
            val shard = graft.ops.Gguf.writeTensors(
              Seq("graft.ids" -> graft.ops.Gguf.MArray(
                recs.map(r => graft.ops.Gguf.MInt(r._1)).toVector)),
              Seq(("q", Vector(256L, blocks.toLong), graft.ops.Gguf.Q4K(
                Array.fill[Short](blocks)(0x3400), // d = 0.25
                Array.fill[Short](blocks)(0x3800), // dmin = 0.5
                sc, mn, codes))))
            val m = graft.ops.Gguf.read(shard)
            val t = m.tensors.find(_.name == "q").get
            require(t.ggmlType == 12 && t.byteSize == blocks.toLong * 144,
              s"q4k layout: type ${t.ggmlType}, ${t.byteSize} bytes")
            val ids = m.meta("graft.ids").get.asInstanceOf[graft.ops.Gguf.MArray]
              .items.map(_.asInstanceOf[graft.ops.Gguf.MInt].v)
            val vs = m.floats("q")
            ids.iterator.zipWithIndex.map { case (id, r) =>
              var vc = 0L
              var i = 0
              while (i < dim) {
                vc += exactInt(vs(r * dim + i).toDouble * 4.0)
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
                ((((CAST(round(v[i + 1] * 1000) AS BIGINT) % 16) + 16) % 16)
                    * (1 + ((vec_id % 32) * 2 + i // 32) % 5)
                  - 2 * (((vec_id % 32) * 2 + i // 32) % 3)))) AS BIGINT) AS vc
            FROM e)
        SELECT bucket, count(*) AS n_vecs,
          CAST(sum(vec_id) AS BIGINT) AS id_sum,
          CAST(sum(dim) AS BIGINT) AS dim_sum,
          CAST(sum(vc) AS BIGINT) AS val_check
        FROM x GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // GGUF Q5_K round trip (the third shipping k-quant: Q4_K's layout
    // plus the 32-byte qh fifth-bit table — llama.cpp's Q5_K_M default):
    // 5-bit codes q_e = ((round(x*1000) % 32)+32)%32, the same sub-block
    // scale/min contract as gg04 (sc = 1+(s%5), m = s%3, d = 0.25,
    // dmin = 0.5), so dequant×4 = q*sc - 2*m stays integer-exact. One
    // wrong fifth bit in the qh pack lands a ±16 error in exactly one
    // element — the checksum catches it.
    GraftQuery(
      "gg06_gguf_q5k",
      (s, d) => {
        import s.implicits._
        vecGroups(s, d).flatMap { case (_, recs) =>
            val n = recs.length
            val dim = recs.head._2.length
            recs.zipWithIndex.foreach { case ((id, _), r) =>
              require(id % 32 == r, s"non-contiguous vec_id $id at $r")
            }
            val blocks = (n * dim + 255) / 256
            val codes = new Array[Byte](blocks * 256)
            var e = n * dim
            while (e < codes.length) { codes(e) = (e % 32).toByte; e += 1 }
            recs.zipWithIndex.foreach { case ((_, v), r) =>
              var i = 0
              while (i < dim) {
                codes(r * dim + i) = q1000(v(i), 32).toByte
                i += 1
              }
            }
            val sc = Array.tabulate[Byte](blocks * 8)(s0 => (1 + s0 % 5).toByte)
            val mn = Array.tabulate[Byte](blocks * 8)(s0 => (s0 % 3).toByte)
            val shard = graft.ops.Gguf.writeTensors(
              Seq("graft.ids" -> graft.ops.Gguf.MArray(
                recs.map(r => graft.ops.Gguf.MInt(r._1)).toVector)),
              Seq(("q", Vector(256L, blocks.toLong), graft.ops.Gguf.Q5K(
                Array.fill[Short](blocks)(0x3400), // d = 0.25
                Array.fill[Short](blocks)(0x3800), // dmin = 0.5
                sc, mn, codes))))
            val m = graft.ops.Gguf.read(shard)
            val t = m.tensors.find(_.name == "q").get
            require(t.ggmlType == 13 && t.byteSize == blocks.toLong * 176,
              s"q5k layout: type ${t.ggmlType}, ${t.byteSize} bytes")
            val ids = m.meta("graft.ids").get.asInstanceOf[graft.ops.Gguf.MArray]
              .items.map(_.asInstanceOf[graft.ops.Gguf.MInt].v)
            val vs = m.floats("q")
            ids.iterator.zipWithIndex.map { case (id, r) =>
              var vc = 0L
              var i = 0
              while (i < dim) {
                vc += exactInt(vs(r * dim + i).toDouble * 4.0)
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
                ((((CAST(round(v[i + 1] * 1000) AS BIGINT) % 32) + 32) % 32)
                    * (1 + ((vec_id % 32) * 2 + i // 32) % 5)
                  - 2 * (((vec_id % 32) * 2 + i // 32) % 3)))) AS BIGINT) AS vc
            FROM e)
        SELECT bucket, count(*) AS n_vecs,
          CAST(sum(vec_id) AS BIGINT) AS id_sum,
          CAST(sum(dim) AS BIGINT) AS dim_sum,
          CAST(sum(vc) AS BIGINT) AS val_check
        FROM x GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // GGUF Q6_K round trip: same shard layout, 6-bit codes
    // c_e = ((round(x*1000) % 63)+63)%63, signed per-16-element
    // sub-block scales sc_s = (s%5)-2 (negatives exercised) with
    // s = (vec_id%32)*4 + i/16, d = 0.25 — dequant×4 = sc*(c-32) exact.
    // The writer packs ql/qh (two high bits at bit pairs 0/2/4/6 of
    // qh[l]); one swapped bit pair breaks the checksum. Tail groups pad
    // with e%64 codes no checksum reads.
    GraftQuery(
      "gg05_gguf_q6k",
      (s, d) => {
        import s.implicits._
        vecGroups(s, d).flatMap { case (_, recs) =>
            val n = recs.length
            val dim = recs.head._2.length
            recs.zipWithIndex.foreach { case ((id, _), r) =>
              require(id % 32 == r, s"non-contiguous vec_id $id at $r")
            }
            val blocks = (n * dim + 255) / 256
            val codes = new Array[Byte](blocks * 256)
            var e = n * dim
            while (e < codes.length) { codes(e) = (e % 64).toByte; e += 1 }
            recs.zipWithIndex.foreach { case ((_, v), r) =>
              var i = 0
              while (i < dim) {
                codes(r * dim + i) = q1000(v(i), 63).toByte
                i += 1
              }
            }
            val sc = Array.tabulate[Byte](blocks * 16)(s0 => (s0 % 5 - 2).toByte)
            val shard = graft.ops.Gguf.writeTensors(
              Seq("graft.ids" -> graft.ops.Gguf.MArray(
                recs.map(r => graft.ops.Gguf.MInt(r._1)).toVector)),
              Seq(("q", Vector(256L, blocks.toLong), graft.ops.Gguf.Q6K(
                Array.fill[Short](blocks)(0x3400), sc, codes))))
            val m = graft.ops.Gguf.read(shard)
            val t = m.tensors.find(_.name == "q").get
            require(t.ggmlType == 14 && t.byteSize == blocks.toLong * 210,
              s"q6k layout: type ${t.ggmlType}, ${t.byteSize} bytes")
            val ids = m.meta("graft.ids").get.asInstanceOf[graft.ops.Gguf.MArray]
              .items.map(_.asInstanceOf[graft.ops.Gguf.MInt].v)
            val vs = m.floats("q")
            ids.iterator.zipWithIndex.map { case (id, r) =>
              var vc = 0L
              var i = 0
              while (i < dim) {
                vc += exactInt(vs(r * dim + i).toDouble * 4.0)
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
                (((((vec_id % 32) * 4 + i // 16) % 5) - 2)
                  * (((CAST(round(v[i + 1] * 1000) AS BIGINT) % 63) + 63) % 63
                    - 32)))) AS BIGINT) AS vc
            FROM e)
        SELECT bucket, count(*) AS n_vecs,
          CAST(sum(vec_id) AS BIGINT) AS id_sum,
          CAST(sum(dim) AS BIGINT) AS dim_sum,
          CAST(sum(vc) AS BIGINT) AS val_check
        FROM x GROUP BY 1"""),
    ),
  )
}
