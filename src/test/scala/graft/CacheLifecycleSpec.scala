package graft

/** The cache-lifecycle contract (VERDICT r6 item 5): builders register
  * every persisted intermediate in [[graft.core.Caches]]; the consumer
  * releases after the terminal action. This spec proves the end state the
  * contract promises — ZERO lingering cached blocks after a Verify-style
  * sweep — over the most persist-heavy composed queries.
  */
class CacheLifecycleSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("Caches.release drops every builder persist; cacheManager ends empty") {
    // clean slate: other suites in the shared session may have left caches
    graft.core.Caches.release()
    spark.catalog.clearCache()
    assert(spark.sharedState.cacheManager.isEmpty)

    // persist-heavy composed builders: nested-round mixture state (mix03),
    // kmeans input + assignment (dedup09), dual KMV sketches (sketch08),
    // basket pairs (assoc01), shingle reuse (dedup03)
    val names = Seq("mix03_water_filling", "dedup09_semdedup",
      "sketch08_kmv_setops", "assoc01_basket_rules", "dedup03_minhash_lsh")
    names.foreach { n =>
      assert(SparkEntry.queries(n)(spark, sf).count() > 0, n) // terminal action
    }
    assert(!spark.sharedState.cacheManager.isEmpty,
      "expected builder persists to be registered during the sweep")

    graft.core.Caches.release()
    assert(spark.sharedState.cacheManager.isEmpty,
      "lingering cached blocks after release — an untracked persist() crept in")
  }
}
