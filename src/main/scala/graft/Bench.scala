package graft

import org.apache.spark.sql.SparkSession

/** Bench main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Each query runs twice and
  * reports the faster run (BASELINE.md protocol: warm timings — the first
  * iteration pays JIT/codegen warm-up that a long-lived cluster never sees);
  * `value` is the sum of per-query warm times.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // headline set only: queries flagged bench=false are layout BUILDS
    // (partitioned/bucketed table writes) — verified for correctness by the
    // driver gate, excluded from the steady-state query benchmark
    // dev-only iteration filter (comma-separated name prefixes); the
    // driver sets no filter, so the recorded bench is always the full set
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSeq)
    val results = graft.queries.Registry.all.filter(_.bench)
      .filter(q => only.forall(_.exists(q.name.startsWith)))
      .map(q => q.name -> q.run).sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => return -1.0 }
        (System.nanoTime() - t0) / 1e9
      }
      val r1 = once()
      val r2 = if (r1 < 0) r1 else once()
      val b = if (r1 < 0) r1 else math.min(r1, r2)
      // builders register persisted intermediates in Caches; release them
      // after each query so cached blocks don't accumulate across the suite
      // and GC-degrade later queries (round-2 text08: 9.4 s polluted vs 1.05 s)
      graft.core.Caches.release()
      (name, b, Seq(r1, r2))
    }
    // 3-decimal per-query values keep the line short, and the headline keys
    // (metric/value/failed/sf) go LAST: harnesses that keep only the tail of
    // the process output still see the totals even if the head of this line
    // is cut off. JSON object key order is insignificant, so parsers are
    // unaffected.
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    // both raw runs per query, so a host-noise outlier is self-identifying
    // in the record: a genuine regression is slow in BOTH runs, a noise
    // window shows one slow + one in-band run (BASELINE.md protocol)
    val runsJson = results.map { case (k, _, rs) =>
      "\"" + k + "\":[" + rs.map(r3).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    val total = r3(results.map(_._2).filter(_ >= 0).sum)
    // "failed" makes crashes explicit: a query that starts erroring must not
    // read as a faster run (its -1 is excluded from the total).
    val line = s"""{"unit":"sec","queries":$qs,"runs":$runsJson,"sf":"$sfDir","metric":"total","failed":$failed,"value":$total}"""
    println(line)
    // durable copy: the stdout capture truncated BENCH_r08.json's single
    // line to an unparseable tail, so the same JSON also lands in a file
    // (argv override, else target/bench.json) — BASELINE.md protocol
    val outPath = args.headOption.getOrElse("target/bench.json")
    try {
      val p = java.nio.file.Paths.get(outPath)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(p,
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
