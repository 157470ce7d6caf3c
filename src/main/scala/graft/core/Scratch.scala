package graft.core

/** Shuffle/spill scratch location (round 17).
  *
  * Local-mode shuffle writes one data+index file pair per map task; on
  * this sandbox's virtio disk that per-file latency dominates small
  * exchanges (micro-bench: a 7k-row 32-partition exchange runs ~650 ms
  * with spark.local.dir on ext4 vs ~350 ms on tmpfs — the same floor
  * every one of the suite's exchanges pays). A production cluster
  * provisions fast NVMe scratch for exactly this purpose; the RAM-backed
  * tmpfs is the local-mode equivalent, and sf0.1 shuffle volumes (tens of
  * MB) are far below the sandbox's 126 GiB /dev/shm.
  *
  * Override with SPARK_GRAFT_LOCAL_DIR; falls back to the JVM tmpdir when
  * no tmpfs is present so the setting is inert elsewhere.
  */
object Scratch {
  /** tmpfs is only chosen when it has generous headroom (ADVICE r17):
    * shuffle/spill landing in RAM under memory pressure fails with ENOSPC
    * exactly when spill-to-disk matters, so require 16 GiB usable — far
    * above any test-SF shuffle volume, and an order of magnitude below the
    * sandbox's 126 GiB /dev/shm, so the bench behavior is unchanged there.
    */
  def localDir: String =
    sys.env.get("SPARK_GRAFT_LOCAL_DIR").getOrElse {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite &&
        shm.getUsableSpace > (16L << 30)) "/dev/shm/graft-spark-local"
      else System.getProperty("java.io.tmpdir")
    }
}
