package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Statistical aggregate surface — the ClickHouse analytics aggregates the
  * reference's users reach for once events are archived (`entropy`,
  * `simpleLinearRegression`, covariance/product folds; ref: README.md:4-17
  * positions the archive as the substrate for exactly this kind of
  * distribution analysis).
  *
  * Scale notes (100 TB discipline):
  *  - every key is a plain hash aggregate: map-side partials collapse each
  *    partition's contribution before the single keyed exchange;
  *  - entropy is computed from mergeable sums only (`Σn`, `Σ n·log2 n` →
  *    `H = log2 T − S/T`), never from a per-group probability vector — the
  *    DuckDB twin uses the built-in `entropy()` so the algebraic
  *    reformulation is cross-checked against an independent implementation;
  *  - the product aggregate is phrased as `exp(Σ ln x)` — the sum has
  *    commutative, mergeable partials, while a literal multiplicative fold
  *    has no map-side combine in Spark;
  *  - cross-engine float ulps are absorbed by `round(6)` on every moment
  *    (same discipline as `agg_stats`, SURVEY §7.4).
  */
object StatsOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Shannon entropy (bits) of the daily event-type mix — the classic
    // "did the traffic composition shift?" monitor. H = log2(T) - Σn·log2(n)/T
    // needs only two mergeable sums per day.
    "agg_entropy" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .groupBy("day")
        .agg(
          sum("n").as("n_events"),
          sum(col("n").cast(DoubleType) * log2(col("n"))).as("s"))
        .select(col("day"), col("n_events"),
          round(log2(col("n_events")) - col("s") / col("n_events"), 6)
            .as("entropy_bits"))
        .orderBy("day")
    }),

    // Ordinary-least-squares family per group (ClickHouse
    // `simpleLinearRegression` analog): slope/intercept/R² of extendedprice
    // on quantity, plus both covariance flavors. One aggregate exchange.
    "agg_regression" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          regr_count(col("l_extendedprice"), col("l_quantity"))
            .cast(LongType).as("n_pairs"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 6)
            .as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 6)
            .as("intercept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6)
            .as("r2"),
          round(covar_samp(col("l_extendedprice"), col("l_quantity")), 6)
            .as("covar_s"),
          round(covar_pop(col("l_extendedprice"), col("l_quantity")), 6)
            .as("covar_p"))
        .orderBy("l_returnflag")
    }),

    // Stratified deterministic downsampling with inverse-propensity
    // weights — the class-rebalancing step of an event training pipeline:
    // rare classes kept whole, dominant classes thinned, each surviving row
    // carrying the weight that makes weighted aggregates unbiased.
    // Membership is a pure multiplicative hash of event_id (same discipline
    // as split_holdout: never rand(), stable across runs/cluster sizes/row
    // order) so the sample is reproducible and map-only — no shuffle.
    "sample_stratified" -> ((s, dir) => {
      val rate = when(col("event_type").isin("purchase", "signup"), 100L)
        .when(col("event_type") === "error", 50L)
        .when(col("event_type") === "click", 25L)
        .otherwise(10L)
      Tables.events(s, dir)
        .withColumn("rate", rate)
        .filter(pmod(col("event_id") * 2654435761L, lit(100L)) < col("rate"))
        .select(col("event_id"), col("event_type"),
          round(lit(100.0) / col("rate"), 6).as("weight"))
        .orderBy("event_id")
    }),

    // Per-order compounded discount factor — a product aggregate. Spark has
    // no product(); `exp(sum(ln))` is the mergeable formulation (DuckDB's
    // native product() is the oracle twin). Safe here: 1 + discount > 0.
    "agg_product" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(
          count(lit(1)).as("n_items"),
          round(exp(sum(log(lit(1.0) + col("l_discount")))), 6)
            .as("disc_factor"))
        .orderBy("l_orderkey")
    }))

  def oracle: Map[String, String] = Map(
    "agg_entropy" ->
      """SELECT CAST(ts AS DATE) AS day, count(*) AS n_events,
        |       round(entropy(event_type), 6) AS entropy_bits
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "agg_regression" ->
      """SELECT l_returnflag,
        |       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs,
        |       round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
        |       round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
        |       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |       round(covar_samp(l_extendedprice, l_quantity), 6) AS covar_s,
        |       round(covar_pop(l_extendedprice, l_quantity), 6) AS covar_p
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "sample_stratified" ->
      """WITH r AS (
        |  SELECT event_id, event_type,
        |         CASE WHEN event_type IN ('purchase', 'signup') THEN 100
        |              WHEN event_type = 'error' THEN 50
        |              WHEN event_type = 'click' THEN 25
        |              ELSE 10 END AS rate
        |  FROM events)
        |SELECT event_id, event_type,
        |       round(CAST(100 AS DOUBLE) / rate, 6) AS weight
        |FROM r WHERE (event_id * 2654435761) % 100 < rate
        |ORDER BY event_id""".stripMargin,
    "agg_product" ->
      """SELECT l_orderkey, count(*) AS n_items,
        |       round(product(1 + l_discount), 6) AS disc_factor
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)
}
