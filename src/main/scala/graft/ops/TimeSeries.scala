package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series shaping over the events table: dense-grid gap filling and
  * trailing-window rate anomaly detection — the two passes behind every
  * "is this metric behaving?" monitor. The reference's hourly MERGE
  * aggregate (order_processing_incremental.py:182-204) leaves silent
  * holes for hours with no traffic; these operators make the holes
  * explicit and score them.
  */
object TimeSeries {

  /** Dense hourly count grid with zero-filled gaps: one row per
    * (event_type, hour) for EVERY hour in the table's global
    * [min(ts), max(ts)] span, so downstream trailing windows and
    * dashboards see an unbroken series instead of skipping empty hours.
    *
    * Shape: one map-side-combinable count aggregate (the only
    * corpus-sized shuffle), a 1-row global bounds aggregate, and a
    * distinct-types aggregate; the grid is types × 1-row bounds
    * (constant-size cross join, the skewAudit pattern) exploded to
    * types × hours rows. The final left join broadcasts the hourly
    * aggregate — post-aggregate it is at most grid-sized (years of
    * hours × type cardinality ≈ 10⁶ rows), never corpus-sized.
    */
  def gapFill(events: DataFrame): DataFrame =
    gapFillCounts(hourlyCounts(events))

  /** Hourly counts per type — the one corpus-sized, map-side-combinable
    * aggregate of the family (also maintained incrementally by the
    * streaming twin, streaming/IncrementalStream.runHourlyCountsStream).
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("metric_hour"))
      .agg(count(lit(1)).as("n_events"))

  /** Dense grid over an ALREADY-AGGREGATED (event_type, metric_hour,
    * n_events) table: bounds and the type set come from the counts
    * themselves, so batch gapFill(events) and the streaming-maintained
    * counts table fill identically.
    */
  def gapFillCounts(counts: DataFrame): DataFrame = {
    val bounds = counts.agg(
      min(col("metric_hour")).as("lo"), max(col("metric_hour")).as("hi"))
    val grid = counts.select("event_type").distinct()
      .crossJoin(broadcast(bounds)) // k-type × 1-row: constant-size
      .select(col("event_type"),
        explode(expr("sequence(lo, hi, interval 1 hour)")).as("metric_hour"))
    grid.join(broadcast(counts), Seq("event_type", "metric_hour"), "left")
      .select(col("event_type"), col("metric_hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  /** Trailing-window z-score anomaly detection over the gap-filled hourly
    * series: each hour's count is scored against the mean/stddev of the
    * previous `window` hours (current hour EXCLUDED — the baseline must
    * not contain the point under test). Hours whose trailing window is
    * incomplete (series head) get a NULL score; a zero-variance baseline
    * (flat series) also yields NULL rather than ±∞.
    *
    * Numeric policy: the window aggregates are integer sums (n, Σx, Σx²
    * — exact in int64), and mean/variance are derived from them with one
    * fixed double expression tree. Every double step (multiply, divide,
    * sqrt) is IEEE correctly-rounded — NOT transcendental — so the scores
    * are bit-identical cross-engine when the oracle mirrors the same
    * tree. This is what lets the oracle hash-compare a stddev-based
    * statistic that `stddev_samp` itself (an order-dependent streaming
    * moment) could never guarantee; no `round()` is applied (the
    * recorded parity rule: rounding half-boundaries diverge).
    *
    * Shape: gapFill's aggregates plus ONE window shuffle keyed on
    * event_type — the series per type is years-of-hours long at most, so
    * a per-type partition always fits an executor; no global window.
    */
  def rateAnomaly(events: DataFrame, window: Int = 24,
                  threshold: Double = 3.0): DataFrame =
    scoreSeries(gapFill(events), window, threshold)

  /** The scoring half, over any dense (event_type, metric_hour, n_events)
    * series — batch rateAnomaly and the streaming-maintained counts table
    * share this verbatim, so their scores are identical by construction.
    */
  def scoreSeries(filled: DataFrame, window: Int = 24,
                  threshold: Double = 3.0): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val w = Window.partitionBy("event_type").orderBy("metric_hour")
      .rowsBetween(-window, -1)
    val nd = count(col("n_events")).over(w).cast("double")
    val s1 = sum(col("n_events")).over(w).cast("double")
    val s2 = sum(col("n_events") * col("n_events")).over(w).cast("double")
    val mean = s1 / nd
    // sample variance from exact sums; greatest() guards the tiny
    // negative cancellation residue a flat huge-count series could leave
    val variance = greatest((s2 - s1 * s1 / nd) / (nd - 1d), lit(0d))
    val sd = sqrt(variance)
    val z = when(nd === window.toDouble && sd > 0d,
      (col("n_events").cast("double") - mean) / sd)
    filled
      .withColumn("mean_trailing", when(nd === window.toDouble, mean))
      .withColumn("z_score", z)
      .select(col("event_type"), col("metric_hour"), col("n_events"),
        col("mean_trailing"), col("z_score"),
        coalesce(abs(col("z_score")) > threshold, lit(false)).as("is_anomaly"))
  }

  /** Seasonal-naive forecast backtest — the capacity-planning baseline
    * every volume forecast gets judged against: predict each hour's count
    * with the count one season earlier (same hour yesterday for
    * `seasonHours` = 24), then score the prediction per type over the
    * evaluated span. A model that can't beat this has no signal.
    *
    * Error metrics stay in EXACT integer arithmetic (counts, absolute
    * diffs, signed sums — no per-row double accumulation whose order
    * could drift cross-engine); MAE/bias emerge from one int-sum / count
    * division each, the established parity pattern. Hours with no
    * seasonal predecessor (the first season of the span) are excluded
    * from scoring, not zero-filled — a missing baseline is not a zero
    * forecast.
    *
    * Shape: dense grid (gapFill) → one per-type lag window (same single
    * shuffle as [[scoreSeries]]) → one map-side-combinable aggregate to
    * |types| rows.
    */
  def seasonalNaiveBacktest(events: DataFrame,
                            seasonHours: Int = 24): DataFrame = {
    require(seasonHours >= 1, s"seasonHours must be >= 1, got $seasonHours")
    val w = Window.partitionBy("event_type").orderBy("metric_hour")
    val err = col("n_events") - col("forecast")
    gapFill(events)
      .withColumn("forecast", lag(col("n_events"), seasonHours).over(w))
      .filter(col("forecast").isNotNull)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_hours"),
        sum(abs(err)).as("sum_abs_err"),
        sum(err).as("sum_err"))
      .select(col("event_type"), col("n_hours"),
        (col("sum_abs_err").cast("double") / col("n_hours")).as("mae"),
        (col("sum_err").cast("double") / col("n_hours")).as("bias"))
  }
}
