package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, GreaterThanOrEqual, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Storage-level TTL as an optimizer rule (SURVEY.md §2 D3).
  *
  * The reference delegates retention to ClickHouse's table TTL
  * (ref: README.md:17 `TTL ts + INTERVAL 3 DAY`): expired rows vanish from
  * EVERY query transparently — no query author ever writes the retention
  * predicate. The Spark-native analog is this `Rule[LogicalPlan]`: paths
  * registered in [[TtlPolicy]] get a `ts >= cutoff` filter injected over
  * their scans during optimization. Because the rule runs inside the
  * operator-optimization batch, the injected predicate participates in
  * normal pushdown — it reaches the parquet scan as a data filter
  * (row-group stats skipping) and, on a date-partitioned archive, as a
  * partition filter (whole expired days are pruned at planning time, the
  * exact analog of ClickHouse dropping expired parts).
  *
  * The cutoff is a fixed instant per policy (`asOf - days`), not `now()`:
  * deterministic plans, reproducible tests; a production deployment would
  * refresh the policy's `asOf` per batch/trigger.
  */
object TtlPolicy {
  final case class Policy(column: String, days: Int, asOf: java.sql.Timestamp) {
    def cutoffMicros: Long = (asOf.getTime - days.toLong * 86400000L) * 1000L
  }

  private val policies = scala.collection.concurrent.TrieMap.empty[String, Policy]

  /** Register a TTL over every scan of `path` (the directory given to
    * spark.read / write). Column must be a TimestampType column of the data.
    */
  def register(path: String, column: String, days: Int,
               asOf: java.sql.Timestamp): Unit =
    policies.put(normalize(path), Policy(column, days, asOf))

  def unregister(path: String): Unit = policies.remove(normalize(path))
  def clear(): Unit = policies.clear()

  /** Scheme-insensitive path normalization: `file:///x`, `file:/x` and `/x`
    * all normalize to `/x`; URIs with an authority (hdfs://nn:8020/p) keep
    * it, so register with the same authority form the session resolves.
    *
    * Both the registered string and the scan's `rootPath.toString` go
    * through `org.apache.hadoop.fs.Path` (the type the scan's paths
    * actually are): Hadoop Path round-trips special characters (a space
    * stays a space on both sides), where raw `java.net.URI` parsing threw
    * on one side and %-decoded on the other — a policy registered on a
    * path with a space would have silently never matched any scan,
    * returning expired rows against the rule's fail-loudly contract.
    */
  private def normalize(p: String): String = {
    val noSlash = if (p.length > 1) p.stripSuffix("/") else p
    try {
      val u = new org.apache.hadoop.fs.Path(noSlash).toUri
      Option(u.getAuthority).filter(_.nonEmpty).getOrElse("") +
        Option(u.getPath).filter(_.nonEmpty).getOrElse(noSlash)
    } catch { case _: IllegalArgumentException => noSlash }
  }

  /** Policy matching any of the relation's root paths. */
  def forPaths(paths: Seq[String]): Option[Policy] =
    paths.flatMap(p => policies.get(normalize(p))).headOption
}

case class TtlEnforcement(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  private def rootPaths(rel: HadoopFsRelation): Seq[String] =
    rel.location.rootPaths.map(_.toString)

  /** Is `cond` (or any conjunct of it) the TTL guard for `policy`? */
  private def guards(cond: Expression, policy: TtlPolicy.Policy): Boolean =
    splitConjunctivePredicates(cond).exists {
      case GreaterThanOrEqual(a: AttributeReference,
          Literal(v, TimestampType | TimestampNTZType)) =>
        a.name.equalsIgnoreCase(policy.column) && v == policy.cutoffMicros
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // paths whose scan already sits under its TTL guard (the guard may have
    // been merged into a larger conjunction by PushDownPredicates, and the
    // relation node may have been copied by column pruning — so track by
    // path, not by node identity)
    val alreadyGuarded: Set[String] = plan.collect {
      case Filter(cond, lr: LogicalRelation) =>
        lr.relation match {
          case fs: HadoopFsRelation =>
            TtlPolicy.forPaths(rootPaths(fs)) match {
              case Some(p) if guards(cond, p) => rootPaths(fs)
              case _ => Seq.empty[String]
            }
          case _ => Seq.empty[String]
        }
    }.flatten.toSet

    plan.transformUp {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation if !rootPaths(fs).exists(alreadyGuarded) =>
            TtlPolicy.forPaths(rootPaths(fs)) match {
              case Some(policy) =>
                // a retention mechanism must fail loudly, never silently
                // skip: a registered policy whose column is absent or
                // non-timestamp is a broken registration, and returning
                // expired rows would violate the rule's whole contract
                val attr = lr.output
                  .find(_.name.equalsIgnoreCase(policy.column))
                  .getOrElse(throw new IllegalStateException(
                    s"TTL policy on ${rootPaths(fs).mkString(",")}: column " +
                      s"'${policy.column}' not found in ${lr.output.map(_.name)}"))
                attr.dataType match {
                  case TimestampType | TimestampNTZType =>
                    Filter(GreaterThanOrEqual(attr,
                      Literal(policy.cutoffMicros, attr.dataType)), lr)
                  case other => throw new IllegalStateException(
                    s"TTL policy on ${rootPaths(fs).mkString(",")}: column " +
                      s"'${policy.column}' has type ${other.simpleString}, " +
                      "expected a timestamp")
                }
              case None => lr
            }
          case _ => lr
        }
    }
  }
}
