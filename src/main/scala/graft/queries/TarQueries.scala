package graft.queries

import graft.core.{GraftQuery, Tables}
import graft.ops.{Hash60Kernel, Tar, TextAnalysis => TA}
import org.apache.spark.sql.functions._

/** WebDataset shard operators (tar01-tar02) plus the zip/zstd/lz4/gzip
  * compressed-shard family: USTAR training-shard round trip and the
  * fault-tolerant shard scan. WebDataset (tar shards, `{key}.{ext}`
  * members, consecutive same-key members = one sample) is the de-facto
  * container for multimodal training data; these pin the pure-JVM
  * [[graft.ops.Tar]] writer/reader and the sample-grouping convention
  * against DuckDB recomputing every aggregate from the raw documents
  * table. Same shapes as the warc pack: schema-bounded build groups,
  * per-shard map, one small-keyed aggregate. The round-12 ML-container
  * codec queries split out in round 13 (bodies byte-identical):
  * record-oriented in [[RecordShardQueries]], tensor-oriented in
  * [[TensorShardQueries]]; the shard-group helpers below stay here as the
  * shared convention ([[shardGroups]]' `doc_id DIV 8` bounded groups).
  */
object TarQueries {

  private[queries] val M = 1000000007L

  private[queries] def h60(s: String): Long =
    Hash60Kernel.fold(Hash60Kernel.digest().digest(
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)))

  private[queries] def sqlH60Mod(v: String) = s"(${TA.Sql.hash60(v)} % $M)"

  private[queries] def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** docs grouped into shards of ≤8 samples: (source, g, [(id, text, lang)]). */
  private[queries] def shardGroups(s: org.apache.spark.sql.SparkSession, d: String) = {
    import s.implicits._
    // keyed repartition INSTEAD of the groupBy-planned exchange (round 17):
    // same single shuffle (the groupBy reuses the hash partitioning, and
    // collect_list partial-aggregates nothing, so nothing is lost map-side),
    // but the explicit partition count pins the post-shuffle stage at
    // cluster parallelism — AQE's byte-proportional coalescer otherwise
    // collapses the ~1 MiB exchange to ONE task, serializing the
    // seconds-of-CPU codec work that follows (xz01: 1.5 s on one core).
    Tables.documents(s, d)
      .withColumn("g", expr("doc_id DIV 8"))
      .transform(graft.core.Par.byKey(_, col("source"), col("g")))
      .groupBy(col("source"), col("g"))
      .agg(sort_array(collect_list(struct(
        col("doc_id").as("_1"), col("text").as("_2"), col("lang").as("_3")))).as("recs"))
      .as[(String, Long, Seq[(Long, String, String)])]
  }

  private[queries] def buildShard(recs: Seq[(Long, String, String)]): Array[Byte] =
    Tar.write(recs.flatMap { case (id, text, lang) =>
      Seq(Tar.TarEntry(s"$id.txt", ascii(text)), Tar.TarEntry(s"$id.cls", ascii(lang)))
    })

  val all: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // WebDataset round trip: each doc becomes a {id}.txt + {id}.cls
    // member pair inside a USTAR shard; the reader re-parses headers
    // (checksum-verified), re-groups members into samples by stem, and
    // the per-class aggregate pins sample completeness, payload bytes,
    // and an md5 checksum of every text body against DuckDB.
    GraftQuery(
      "tar01_webdataset_roundtrip",
      (s, d) => {
        import s.implicits._
        shardGroups(s, d).flatMap { case (_, _, recs) =>
            Tar.samples(Tar.read(buildShard(recs))).map { case (_, parts) =>
              val complete = parts.keySet == Set("txt", "cls")
              val txt = new String(parts.getOrElse("txt", Array.emptyByteArray),
                java.nio.charset.StandardCharsets.US_ASCII)
              val cls = new String(parts.getOrElse("cls", Array.emptyByteArray),
                java.nio.charset.StandardCharsets.US_ASCII)
              (cls, complete, txt.length.toLong, txt)
            }
          }
          .toDF("lang", "complete", "txt_len", "txt")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_samples"),
            count(when(col("complete"), lit(1))).as("n_complete"),
            sum(col("txt_len")).as("txt_bytes"),
            sum(TA.hash60(col("txt")) % M).as("txt_check"))
      },
      Some(s"""SELECT lang, count(*) AS n_samples, count(*) AS n_complete,
          CAST(sum(length(text)) AS BIGINT) AS txt_bytes,
          CAST(sum(${sqlH60Mod("text")}) AS BIGINT) AS txt_check
        FROM documents GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Fault-tolerant shard scan: a deterministic slice of shards is
    // poisoned (header byte flip → checksum refusal; tail truncation →
    // truncated refusal) and each rotten SHARD becomes one typed error
    // row; healthy shards still contribute exact sample counts and
    // checksums. The warc03/mm09 contract on the shard container.
    GraftQuery(
      "tar02_poisoned_shards",
      (s, d) => {
        import s.implicits._
        shardGroups(s, d).map { case (source, g, recs) =>
            val clean = buildShard(recs)
            val bytes = (h60(s"$source:$g") % 7) match {
              case 0 => // flip a name byte: the stored header checksum no longer matches
                val b = clean.clone(); b(3) = (b(3) ^ 0x15).toByte; b
              case 1 => java.util.Arrays.copyOf(clean, clean.length - 700)
              case _ => clean
            }
            Tar.readSafe(bytes) match {
              case Right(entries) =>
                val smp = Tar.samples(entries)
                val bc = smp.map { case (_, parts) =>
                  h60(new String(parts("txt"),
                    java.nio.charset.StandardCharsets.US_ASCII)) % M
                }.sum
                (source, "ok", smp.size.toLong, bc)
              case Left(kind) => (source, kind, 0L, 0L)
            }
          }
          .toDF("source", "outcome", "n_samples", "bc")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_shards"),
            count(when(col("outcome") === "ok", lit(1))).as("n_ok"),
            count(when(col("outcome") === "bad_checksum", lit(1))).as("n_cksum"),
            count(when(col("outcome") === "truncated", lit(1))).as("n_trunc"),
            sum(when(col("outcome") === "ok", col("n_samples")).otherwise(0L))
              .as("samples_ok"),
            sum(when(col("outcome") === "ok", col("bc")).otherwise(0L))
              .as("txt_check"))
      },
      Some(s"""WITH g AS (SELECT source, doc_id // 8 AS g, count(*) AS n,
            CAST(sum(${sqlH60Mod("text")}) AS BIGINT) AS bc
          FROM documents GROUP BY 1, 2),
        c AS (SELECT source, n, bc,
            ${TA.Sql.hash60("source || ':' || CAST(g AS VARCHAR)")} % 7 AS p
          FROM g)
        SELECT source, count(*) AS n_shards,
          count(CASE WHEN p >= 2 THEN 1 END) AS n_ok,
          count(CASE WHEN p = 0 THEN 1 END) AS n_cksum,
          count(CASE WHEN p = 1 THEN 1 END) AS n_trunc,
          CAST(sum(CASE WHEN p >= 2 THEN n ELSE 0 END) AS BIGINT) AS samples_ok,
          CAST(sum(CASE WHEN p >= 2 THEN bc ELSE 0 END) AS BIGINT) AS txt_check
        FROM c GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // PAX long-name round trip (round 16 — the POSIX.1-2001 'x' form
    // modern tars emit for >100-byte member names, which plain USTAR
    // would silently truncate): every member name carries a 96-char
    // directory prefix, the writer must auto-emit pax `path=` records,
    // and the reader must recover the FULL names — a reader that falls
    // back to the ustar header field mis-names every sample in the
    // shard. Conformance additionally pinned against python tarfile's
    // PAX_FORMAT/GNU_FORMAT output (tools/tarwav_mutant_parity.py).
    GraftQuery(
      "tar04_pax_longnames",
      (s, d) => {
        import s.implicits._
        val prefix = "p" * 96
        shardGroups(s, d).flatMap { case (_, _, recs) =>
            val entries = recs.map { case (id, text, _) =>
              Tar.TarEntry(s"$prefix/$id.txt", ascii(text))
            }
            val back = Tar.read(Tar.write(entries))
            require(back.map(_.name) == entries.map(_.name),
              "pax name round trip")
            back.map(e => (e.name,
              new String(e.body, java.nio.charset.StandardCharsets.US_ASCII)))
          }
          .toDF("name", "txt")
          .select(expr("CAST(substring(name, 98, length(name) - 101) AS BIGINT)")
            .as("id"), col("name"), col("txt"))
          .groupBy(expr("id % 7").as("bucket"))
          .agg(
            count(lit(1)).as("n_members"),
            sum(length(col("name"))).as("name_len_sum"),
            sum(TA.hash60(col("txt")) % M).as("txt_check"))
      },
      Some(s"""SELECT doc_id % 7 AS bucket, count(*) AS n_members,
          CAST(sum(101 + length(CAST(doc_id AS VARCHAR))) AS BIGINT)
            AS name_len_sum,
          CAST(sum(${sqlH60Mod("text")}) AS BIGINT) AS txt_check
        FROM documents GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // ZIP shard round trip (the third container: document dumps / office
    // archives): same sample layout as tar01 but through the JDK deflate
    // path ([[graft.ops.Zip]] — deterministic timestamps, streamed
    // sequential read, no central-directory seek, the shape a 100 TB
    // scan wants). One wrong byte through deflate/inflate or a dropped
    // member breaks the per-class checksums.
    GraftQuery(
      "zip01_zip_shards",
      (s, d) => {
        import s.implicits._
        shardGroups(s, d).flatMap { case (_, _, recs) =>
            val members = recs.flatMap { case (id, text, lang) =>
              Seq(graft.ops.Zip.ZipMember(s"$id.txt", ascii(text)),
                graft.ops.Zip.ZipMember(s"$id.cls", ascii(lang)))
            }
            val back = graft.ops.Zip.read(graft.ops.Zip.write(members))
            back.grouped(2).map { pair =>
              val txt = pair.find(_.name.endsWith(".txt")).get
              val cls = pair.find(_.name.endsWith(".cls")).get
              (new String(cls.body, java.nio.charset.StandardCharsets.US_ASCII),
                txt.body.length.toLong,
                new String(txt.body, java.nio.charset.StandardCharsets.US_ASCII))
            }
          }
          .toDF("lang", "txt_len", "txt")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_samples"),
            sum(col("txt_len")).as("txt_bytes"),
            sum(TA.hash60(col("txt")) % M).as("txt_check"))
      },
      Some(s"""SELECT lang, count(*) AS n_samples,
          CAST(sum(length(text)) AS BIGINT) AS txt_bytes,
          CAST(sum(${sqlH60Mod("text")}) AS BIGINT) AS txt_check
        FROM documents GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // ZIP64 shard round trip (round 16 — [[graft.ops.Zip.writeZip64]]):
    // the same sample layout as zip01 but through the forced-zip64
    // writer (0xFFFF/0xFFFFFFFF EOCD sentinels, 0x0001 extended-info
    // extras, zip64 EOCD record + locator), the structures every >4 GiB
    // document dump ships. The reader must walk the zip64 EOCD chain —
    // the classic fields are sentinels, so a reader that ignores the
    // locator sees a lying entry count. Per-shard map, no shuffle until
    // the small-keyed rollup; writer/reader conformance is additionally
    // pinned against python zipfile by tools/zip_mutant_parity.py.
    GraftQuery(
      "zip02_zip64_shards",
      (s, d) => {
        import s.implicits._
        shardGroups(s, d).flatMap { case (_, _, recs) =>
            val members = recs.flatMap { case (id, text, lang) =>
              Seq(graft.ops.Zip.ZipMember(s"$id.txt", ascii(text)),
                graft.ops.Zip.ZipMember(s"$id.cls", ascii(lang)))
            }
            val bytes = graft.ops.Zip.writeZip64(members)
            // format invariant: the classic EOCD must carry the zip64
            // sentinels (a writer that silently fell back to classic
            // fields would never exercise the 64-bit path)
            val e = bytes.length - 22
            require((bytes(e + 10) & 0xff) == 0xff &&
              (bytes(e + 11) & 0xff) == 0xff, "zip64 EOCD sentinel missing")
            val back = graft.ops.Zip.read(bytes)
            back.grouped(2).map { pair =>
              val txt = pair.find(_.name.endsWith(".txt")).get
              val cls = pair.find(_.name.endsWith(".cls")).get
              (new String(cls.body, java.nio.charset.StandardCharsets.US_ASCII),
                txt.body.length.toLong,
                new String(txt.body, java.nio.charset.StandardCharsets.US_ASCII))
            }
          }
          .toDF("lang", "txt_len", "txt")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_samples"),
            sum(col("txt_len")).as("txt_bytes"),
            sum(TA.hash60(col("txt")) % M).as("txt_check"))
      },
      Some(s"""SELECT lang, count(*) AS n_samples,
          CAST(sum(length(text)) AS BIGINT) AS txt_bytes,
          CAST(sum(${sqlH60Mod("text")}) AS BIGINT) AS txt_check
        FROM documents GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Compressed tar shards (round 13): `.tar.gz` / `.tar.bz2` / `.tar.xz`
    // — the layout most public dataset dumps actually ship — composed
    // from the codec matrix ([[graft.ops.Zstd.decompressSniff]]) over the
    // USTAR reader. Rotating the outer codec per shard exercises every
    // decode path under the tar member grammar; one wrong byte at either
    // layer breaks the per-class checksums.
    GraftQuery(
      "tar03_targz_roundtrip",
      (s, d) => {
        import s.implicits._
        shardGroups(s, d).flatMap { case (_, g, recs) =>
            val tarBytes = buildShard(recs)
            val frame = (g % 3) match {
              case 0 => graft.ops.Zstd.compressGzip(tarBytes)
              case 1 => graft.ops.Bzip2.compress(tarBytes, 1)
              case _ => graft.ops.Xz.compress(tarBytes, 1, 1)
            }
            val back = graft.ops.Tar.read(graft.ops.Zstd.decompressSniff(frame))
            back.grouped(2).map { pair =>
              val txt = pair.find(_.name.endsWith(".txt")).get
              val cls = pair.find(_.name.endsWith(".cls")).get
              (new String(cls.body, java.nio.charset.StandardCharsets.US_ASCII),
                txt.body.length.toLong,
                new String(txt.body, java.nio.charset.StandardCharsets.US_ASCII))
            }
          }
          .toDF("lang", "txt_len", "txt")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_samples"),
            sum(col("txt_len")).as("txt_bytes"),
            sum(TA.hash60(col("txt")) % M).as("txt_check"))
      },
      Some(s"""SELECT lang, count(*) AS n_samples,
          CAST(sum(length(text)) AS BIGINT) AS txt_bytes,
          CAST(sum(${sqlH60Mod("text")}) AS BIGINT) AS txt_check
        FROM documents GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // 7z shard round trip (round 17 — the fourth container: software
    // dumps and archive mirrors ship `.7z` heavily): same sample layout
    // as zip01 but through the from-scratch [[graft.ops.SevenZip]]
    // writer/reader — a solid LZMA1 folder (every member shares one
    // dictionary, the layout `7z a -m0=lzma` emits), UTF-16LE names,
    // per-member CRCs in SubStreamsInfo, kEmptyStream/kEmptyFile bits
    // for the zero-byte bodies the corpus contains. Per-shard map, no
    // shuffle until the small-keyed rollup; reader conformance is
    // additionally pinned against liblzma-built fixtures
    // (tools/make_7z_fixture.py) in SevenZipSpec. One wrong byte
    // through the LZMA core or a mis-split substream breaks the
    // per-class checksums.
    GraftQuery(
      "sz01_7z_shards",
      (s, d) => {
        import s.implicits._
        shardGroups(s, d).flatMap { case (_, _, recs) =>
            val members = recs.flatMap { case (id, text, lang) =>
              Seq(graft.ops.SevenZip.SzMember(s"$id.txt", ascii(text)),
                graft.ops.SevenZip.SzMember(s"$id.cls", ascii(lang)))
            }
            val back = graft.ops.SevenZip.read(graft.ops.SevenZip.write(members))
            require(back.map(_.name) == members.map(_.name), "7z name round trip")
            back.grouped(2).map { pair =>
              val txt = pair.find(_.name.endsWith(".txt")).get
              val cls = pair.find(_.name.endsWith(".cls")).get
              (new String(cls.body, java.nio.charset.StandardCharsets.US_ASCII),
                txt.body.length.toLong,
                new String(txt.body, java.nio.charset.StandardCharsets.US_ASCII))
            }
          }
          .toDF("lang", "txt_len", "txt")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_samples"),
            sum(col("txt_len")).as("txt_bytes"),
            sum(TA.hash60(col("txt")) % M).as("txt_check"))
      },
      Some(s"""SELECT lang, count(*) AS n_samples,
          CAST(sum(length(text)) AS BIGINT) AS txt_bytes,
          CAST(sum(${sqlH60Mod("text")}) AS BIGINT) AS txt_check
        FROM documents GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Fault-tolerant 7z scan (the tar02/zst02 contract on the 7z
    // container): a deterministic slice of shards is poisoned — header
    // byte flip → the next-header CRC refuses; tail truncation → the
    // signature header's declared extent refuses — and each rotten
    // SHARD becomes one typed error row; healthy shards still
    // contribute exact sample counts and checksums. Both poison kinds
    // are deterministic (the flip lands in the header, never the LZMA
    // body, so the refusal kind can be pinned by the oracle).
    GraftQuery(
      "sz02_poisoned_7z",
      (s, d) => {
        import s.implicits._
        shardGroups(s, d).map { case (source, g, recs) =>
            val members = recs.flatMap { case (id, text, lang) =>
              Seq(graft.ops.SevenZip.SzMember(s"$id.txt", ascii(text)),
                graft.ops.SevenZip.SzMember(s"$id.cls", ascii(lang)))
            }
            val clean = graft.ops.SevenZip.write(members)
            val bytes = (h60(s"$source:$g") % 7) match {
              case 0 => // flip the header's last byte: next-header CRC lies
                val b = clean.clone()
                b(b.length - 1) = (b(b.length - 1) ^ 0x15).toByte; b
              case 1 => java.util.Arrays.copyOf(clean, clean.length - 30)
              case _ => clean
            }
            graft.ops.SevenZip.readSafe(bytes) match {
              case Right(ms) =>
                val bc = ms.filter(_.name.endsWith(".txt")).map { m =>
                  h60(new String(m.body,
                    java.nio.charset.StandardCharsets.US_ASCII)) % M
                }.sum
                (source, "ok", ms.size.toLong / 2, bc)
              case Left(kind) => (source, kind, 0L, 0L)
            }
          }
          .toDF("source", "outcome", "n_samples", "bc")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_shards"),
            count(when(col("outcome") === "ok", lit(1))).as("n_ok"),
            count(when(col("outcome") === "bad_crc", lit(1))).as("n_crc"),
            count(when(col("outcome") === "truncated", lit(1))).as("n_trunc"),
            sum(when(col("outcome") === "ok", col("n_samples")).otherwise(0L))
              .as("samples_ok"),
            sum(when(col("outcome") === "ok", col("bc")).otherwise(0L))
              .as("txt_check"))
      },
      Some(s"""WITH g AS (SELECT source, doc_id // 8 AS g, count(*) AS n,
            CAST(sum(${sqlH60Mod("text")}) AS BIGINT) AS bc
          FROM documents GROUP BY 1, 2),
        c AS (SELECT source, n, bc,
            ${TA.Sql.hash60("source || ':' || CAST(g AS VARCHAR)")} % 7 AS p
          FROM g)
        SELECT source, count(*) AS n_shards,
          count(CASE WHEN p >= 2 THEN 1 END) AS n_ok,
          count(CASE WHEN p = 0 THEN 1 END) AS n_crc,
          count(CASE WHEN p = 1 THEN 1 END) AS n_trunc,
          CAST(sum(CASE WHEN p >= 2 THEN n ELSE 0 END) AS BIGINT) AS samples_ok,
          CAST(sum(CASE WHEN p >= 2 THEN bc ELSE 0 END) AS BIGINT) AS txt_check
        FROM c GROUP BY 1"""),
    ),

  )
}
