package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Per-process memo for expensive shared intermediates (signature tables,
  * prefix indexes, the partitioned sink): operators that feed both sides of
  * a self-join persist the subtree once per scale dir instead of letting
  * the physical plan duplicate it, and sinks shared by several query keys
  * are written once. Keys embed the sfDir so scales never collide.
  */
object OpCache {
  private val frames = scala.collection.mutable.Map.empty[String, DataFrame]
  private val actions = scala.collection.mutable.Map.empty[String, String]

  /** Collision-free filesystem key for a data dir: the readable sanitized
    * form alone is lossy (all non-alphanumerics collapse to '_', so
    * distinct dirs could collide), so append a hash of the raw string; the
    * JVM pid isolates concurrent processes sharing the same tmpdir from
    * racing each other's mode("overwrite") writes.
    */
  def pathKey(dir: String): String = {
    val h = Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(dir))
    s"${dir.replaceAll("[^A-Za-z0-9.]", "_")}_${h}_p${ProcessHandle.current().pid()}"
  }

  /** Persist `df` (memory+disk, spillable) the first time `key` is seen.
    * Synchronized, not a lock-free map: `getOrElseUpdate` on a concurrent
    * map may evaluate the thunk twice under a first-access race, which here
    * would double-persist (an unreachable cache entry `clear()` could never
    * unpersist). A hit bound to a stopped SparkSession is evicted and
    * recomputed, so a session restart in the same JVM never serves plans of
    * a dead context.
    */
  def cached(key: String, df: => DataFrame): DataFrame = synchronized {
    frames.get(key).filter(!_.sparkSession.sparkContext.isStopped)
      .getOrElse {
        val fresh = df.persist(StorageLevel.MEMORY_AND_DISK)
        frames.put(key, fresh)
        fresh
      }
  }

  /** Run `make` (e.g. a sink write returning its path) exactly once per
    * `key` — synchronized for the same reason: two first-access threads
    * racing the same sink write would commit into one directory.
    */
  def once(key: String)(make: => String): String = synchronized {
    actions.getOrElseUpdate(key, make)
  }

  /** Drop every memo and unpersist the cached frames (library hygiene for
    * long-lived sessions; the driver's mains exit per run).
    */
  def clear(): Unit = synchronized {
    frames.values.foreach { df =>
      if (!df.sparkSession.sparkContext.isStopped) df.unpersist(blocking = false)
    }
    frames.clear()
    actions.clear()
  }
}
