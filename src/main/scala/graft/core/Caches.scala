package graft.core

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Library-wide registry of persisted intermediates.
  *
  * Query builders persist intermediates that the returned (lazy) plan
  * references more than once — those blocks can only be released AFTER the
  * caller's terminal action, which the builder never sees. A global
  * `spark.catalog.clearCache()` works inside our own mains but would also
  * clobber caller-owned caches in library use, so builders register every
  * persist here and the consumer releases exactly those once the query has
  * been acted on (Verify and Bench call [[release]] per query). Same
  * contract at 100 TB: release after each pipeline stage's terminal write,
  * or executors accumulate dead blocks across stages and late stages pay
  * the eviction/GC tax (the round-2 text08 incident: 9.4 s polluted vs
  * 1.05 s clean).
  */
object Caches {
  private val reg = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist (Spark SQL default level) and register for scoped release.
    * Chain as `.transform(Caches.persist)` where `.persist()` was.
    */
  def persist[T](ds: Dataset[T]): Dataset[T] = { ds.persist(); reg.add(ds); ds }

  /** Persist at an explicit storage level and register. */
  def persistLevel[T](level: StorageLevel)(ds: Dataset[T]): Dataset[T] = {
    ds.persist(level); reg.add(ds); ds
  }

  /** Unpersist (non-blocking) every registered intermediate. Call after the
    * terminal action on a query's result; idempotent and cheap when empty.
    */
  def release(): Unit = {
    var d = reg.poll()
    while (d != null) { d.unpersist(blocking = false); d = reg.poll() }
  }
}
