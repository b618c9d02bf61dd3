package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

    // Higher moments (ClickHouse `skewPop`/`kurtPop` analogs) from raw
    // power sums. Built-in skewness()/kurtosis() differ between engines
    // (population vs bias-corrected sample), so both sides compute the
    // SAME algebra from Σx..Σx⁴ — and because l_quantity is integer-valued
    // ≤ 50, every power sum stays below 2^53 and is EXACT in doubles,
    // order-independent, mergeable map-side. The only inexact steps are
    // the final divisions, identical IEEE ops on identical inputs.
    "agg_moments" -> ((s, dir) => {
      val x = col("l_quantity")
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum(x).as("s1"), sum(x * x).as("s2"),
          sum(x * x * x).as("s3"), sum(x * x * x * x).as("s4"))
        .withColumn("mean", col("s1") / col("n"))
        .withColumn("m2",
          col("s2") / col("n") - col("mean") * col("mean"))
        .withColumn("m3",
          col("s3") / col("n") - lit(3.0) * col("mean") * (col("s2") / col("n"))
            + lit(2.0) * col("mean") * col("mean") * col("mean"))
        .withColumn("m4",
          col("s4") / col("n") - lit(4.0) * col("mean") * (col("s3") / col("n"))
            + lit(6.0) * col("mean") * col("mean") * (col("s2") / col("n"))
            - lit(3.0) * col("mean") * col("mean") * col("mean") * col("mean"))
        .select(col("l_returnflag"), col("n"),
          round(col("mean"), 6).as("mean"),
          round(col("m2"), 6).as("var_pop"),
          round(col("m3") / (col("m2") * sqrt(col("m2"))), 6).as("skew_pop"),
          round(col("m4") / (col("m2") * col("m2")) - lit(3.0), 6)
            .as("kurt_excess"))
        .orderBy("l_returnflag")
    }),

    // Weighted median (ClickHouse `quantileExactWeighted` analog) — the
    // quantile a weighted sample needs (e.g. the inverse-propensity
    // weights `sample_stratified` emits). Entirely INTEGER arithmetic:
    // quantities cast to long, the crossing test is `2·cum ≥ tot` (no
    // 0.5·total float), so the result is bit-exact on any engine. Ties in
    // the order-by value cannot flip the answer: the crossing always lands
    // inside the tied block, whose value is the output either way. One
    // window exchange on the group key, then a tiny min-per-group.
    "agg_weighted_median" -> ((s, dir) => {
      val cum = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val part = Window.partitionBy("l_returnflag")
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_extendedprice"),
          // explicit floor: a bare double→long cast truncates in Spark but
          // ROUNDS in DuckDB — floor() pins one semantics on both engines
          // (no-op here: the fixture quantities are integer-valued)
          floor(col("l_quantity")).as("w"))
        .withColumn("cum", sum("w").over(cum))
        .withColumn("tot", sum("w").over(part))
        .filter(lit(2L) * col("cum") >= col("tot"))
        .groupBy("l_returnflag")
        .agg(max("tot").as("total_w"),
          min("l_extendedprice").as("wmedian"))
        .orderBy("l_returnflag")
    }),

    // One-pass table profiler — the first query anyone runs on an unknown
    // 100 TB archive: per-column row/non-null/distinct counts and min/max.
    // ONE scan: all 17 aggregates run in a single groupBy-less aggregate
    // (the multi-distinct planning uses one Expand — rows × #distinct-cols
    // before the partial aggregate collapses them map-side), then the
    // 1-row × 17-col result is unpivoted driver-free with stack(). At
    // scale the exact distincts swap for approx_count_distinct (the
    // `agg_approx_distinct` key demonstrates that path).
    "profile_columns" -> ((s, dir) => {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val aggs = cols.flatMap(c => Seq(
        count(col(c)).as(s"n_$c"),
        countDistinct(col(c)).as(s"d_$c"),
        min(col(c)).as(s"min_$c"),
        max(col(c)).as(s"max_$c")))
      Tables.lineitem(s, dir)
        .agg(count(lit(1)).as("n_rows"), aggs: _*)
        .select(expr(
          "stack(" + cols.size + ", " +
            cols.map(c => s"'$c', n_rows, n_$c, d_$c, min_$c, max_$c")
              .mkString(", ") +
            ") as (column_name, n_rows, n_nonnull, n_distinct, min_value, max_value)"))
        .orderBy("column_name")
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
    "agg_moments" ->
      """WITH s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |         sum(l_quantity) AS s1,
        |         sum(l_quantity * l_quantity) AS s2,
        |         sum(l_quantity * l_quantity * l_quantity) AS s3,
        |         sum(l_quantity * l_quantity * l_quantity * l_quantity) AS s4
        |  FROM lineitem GROUP BY l_returnflag),
        |m AS (
        |  SELECT l_returnflag, n, s1 / n AS mean,
        |         s2 / n - (s1 / n) * (s1 / n) AS m2,
        |         s3 / n - 3.0 * (s1 / n) * (s2 / n)
        |           + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
        |         s4 / n - 4.0 * (s1 / n) * (s3 / n)
        |           + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
        |           - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
        |  FROM s)
        |SELECT l_returnflag, n, round(mean, 6) AS mean,
        |       round(m2, 6) AS var_pop,
        |       round(m3 / (m2 * sqrt(m2)), 6) AS skew_pop,
        |       round(m4 / (m2 * m2) - 3.0, 6) AS kurt_excess
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "agg_weighted_median" ->
      """WITH x AS (
        |  SELECT l_returnflag, l_extendedprice,
        |         CAST(floor(l_quantity) AS BIGINT) AS w
        |  FROM lineitem),
        |c AS (
        |  SELECT l_returnflag, l_extendedprice,
        |         sum(w) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
        |                      ROWS UNBOUNDED PRECEDING) AS cum,
        |         sum(w) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM x)
        |SELECT l_returnflag, CAST(max(tot) AS BIGINT) AS total_w,
        |       min(l_extendedprice) AS wmedian
        |FROM c WHERE 2 * cum >= tot
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "profile_columns" ->
      """SELECT * FROM (
        |  SELECT 'l_quantity' AS column_name, count(*) AS n_rows,
        |         count(l_quantity) AS n_nonnull,
        |         count(DISTINCT l_quantity) AS n_distinct,
        |         min(l_quantity) AS min_value, max(l_quantity) AS max_value
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', count(*), count(l_extendedprice),
        |         count(DISTINCT l_extendedprice),
        |         min(l_extendedprice), max(l_extendedprice) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', count(*), count(l_discount),
        |         count(DISTINCT l_discount),
        |         min(l_discount), max(l_discount) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_tax', count(*), count(l_tax),
        |         count(DISTINCT l_tax), min(l_tax), max(l_tax) FROM lineitem
        |) ORDER BY column_name""".stripMargin,
    "agg_product" ->
      """SELECT l_orderkey, count(*) AS n_items,
        |       round(product(1 + l_discount), 6) AS disc_factor
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)
}
