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
  private val frames = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private val actions = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Persist `df` (memory+disk, spillable) the first time `key` is seen. */
  def cached(key: String, df: => DataFrame): DataFrame =
    frames.getOrElseUpdate(key, df.persist(StorageLevel.MEMORY_AND_DISK))

  /** Run `make` (e.g. a sink write returning its path) once per `key`. */
  def once(key: String)(make: => String): String =
    actions.getOrElseUpdate(key, make)

  /** Drop every memo and unpersist the cached frames (library hygiene for
    * long-lived sessions; the driver's mains exit per run).
    */
  def clear(): Unit = {
    frames.values.foreach(_.unpersist(blocking = false))
    frames.clear()
    actions.clear()
  }
}
