package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** C9 progress metering, made explicit (ref: the reference logs rows/s and
  * bytes/s on a 3 s ticker and exports OTel counters —
  * cmd/gh-load/main.go:270-300, cmd/gh-archived/main.go:218-267). The Spark
  * analog is a `QueryExecutionListener`: per finished action it records the
  * tag, wall duration, scanned rows (sum of every leaf scan's numOutputRows
  * metric — the rows/s numerator) and result rows. Registration is
  * per-session and the sink is a bounded in-memory ring: at scale this is
  * exactly where an OTel/StatsD exporter would hang, with zero cost on the
  * query path (the listener bus is async and off the execution hot path).
  */
object QueryMetrics {

  final case class Entry(tag: String, durationNs: Long,
                         scannedRows: Long, outputRows: Long, failed: Boolean)

  private val maxEntries = 1024 // bounded: a long-lived session must not leak
  private val log = new java.util.concurrent.ConcurrentLinkedDeque[Entry]
  // ConcurrentLinkedDeque.size() is an O(n) traversal — keep the bound's
  // counter separately so every record() stays O(1)
  private val logSize = new java.util.concurrent.atomic.AtomicInteger(0)

  def entries: Seq[Entry] = {
    val it = log.iterator()
    val buf = Seq.newBuilder[Entry]
    while (it.hasNext) buf += it.next()
    buf.result()
  }

  def clear(): Unit = { log.clear(); logSize.set(0) }

  private def record(e: Entry): Unit = {
    log.addLast(e)
    if (logSize.incrementAndGet() > maxEntries && log.pollFirst() != null)
      logSize.decrementAndGet()
  }

  /** The session-scoped label for subsequent actions — session conf, which
    * the listener reads back on delivery. The listener bus is ASYNC: a
    * re-tag racing an in-flight delivery would mislabel the earlier query,
    * so sequential drivers should prefer [[timed]], which closes the race
    * by waiting for the tagged entry before returning.
    */
  def tag(spark: SparkSession, name: String): Unit =
    if (name == null) spark.conf.unset("graft.query")
    else spark.conf.set("graft.query", name)

  /** Run `action` under `name` and wait (bounded) until its entry lands, so
    * back-to-back timed() calls can never mislabel each other despite the
    * async listener bus. Returns the action's result.
    *
    * Assumes a single-threaded driver per SparkSession: the tag lives in
    * session conf, so a query launched CONCURRENTLY on the same session
    * from another thread during a timed block would be labeled `name` and
    * its arrival would satisfy the wait below while the real action's
    * entry is still in flight. timed() calls themselves are serialized by
    * the `synchronized`; interleaving untimed concurrent queries is the
    * caller's responsibility (use a separate `SparkSession.newSession()`
    * per thread — conf is per-session — if that's needed).
    */
  def timed[T](spark: SparkSession, name: String, waitMs: Long = 10000)
              (action: => T): T = synchronized {
    tag(spark, name)
    val before = entries.count(_.tag == name)
    try {
      val out = action
      val end = System.currentTimeMillis() + waitMs
      while (entries.count(_.tag == name) == before &&
             System.currentTimeMillis() < end) Thread.sleep(10)
      out
    } finally tag(spark, null)
  }

  final class Listener extends QueryExecutionListener {
    private def tagOf(qe: QueryExecution, fallback: String): String =
      qe.sparkSession.conf.getOption("graft.query").getOrElse(fallback)

    // AQE nests the real operators inside wrapper "leaves": the whole query
    // sits in AdaptiveSparkPlanExec and each materialized stage appears as
    // a QueryStageExec leaf — recurse through both to reach the scans
    private def leaves(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        leaves(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        leaves(q.plan)
      case l if l.children.isEmpty => Seq(l)
      case n => n.children.flatMap(leaves)
    }

    private def scanned(qe: QueryExecution): Long =
      leaves(qe.executedPlan)
        .flatMap(_.metrics.get("numOutputRows").map(_.value)).sum

    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit =
      record(Entry(tagOf(qe, funcName), durationNs, scanned(qe),
        qe.executedPlan.metrics.get("numOutputRows")
          .map(_.value).getOrElse(-1L),
        failed = false))

    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit =
      record(Entry(tagOf(qe, funcName), -1L, 0L, 0L, failed = true))
  }

  /** Idempotent per session instance: registering twice would double-count. */
  private val registered =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean])

  def register(spark: SparkSession): Unit = synchronized {
    if (registered.add(spark)) spark.listenerManager.register(new Listener)
  }
}
