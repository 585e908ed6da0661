package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-analytics operators over the events stream table: ordered-step
  * funnels and cohort retention — the two aggregate shapes behind every
  * product-analytics dashboard, built shuffle-minimally.
  */
object Events {

  /** Ordered funnel, EARLIEST-PER-TYPE semantics: a user counts for step
    * k iff the user's globally earliest event of each step type occurs
    * in strictly increasing time order, t(s₁) < t(s₂) < ... < t(s_k)
    * (simultaneous events do not advance; this is the "first touch"
    * funnel many analytics products default to). NOTE this is stricter
    * than the any-chain funnel (∃ e₁ < ... < e_k of the right types): a
    * user who clicks, then views, then clicks again completes
    * view→click under any-chain but NOT here — their earliest click
    * precedes their earliest view. The any-chain form needs a per-user
    * ordered scan (sessionize-style window pass, one extra sort); this
    * form needs only conditional MINs.
    *
    * Shape: ONE shuffle (groupBy user) aggregating the earliest ts per
    * (user, step type) as k conditional-min columns — map-side
    * combinable, hot users cost one row — then one global conditional
    * count over the k-column per-user row.
    *
    * Output: (step, step_name, n_users), step 1-based, monotonically
    * non-increasing user counts.
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // per (user, step-type) earliest occurrence — one shuffle on user_id
    // with map-side combine; the per-user row is k columns wide
    val minCols = steps.zipWithIndex.map { case (s, i) =>
      min(when(col("event_type") === s, col("ts"))).as(s"t$i")
    }
    val mins = events
      .filter(col("event_type").isin(steps: _*))
      .groupBy("user_id")
      .agg(minCols.head, minCols.tail: _*)
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
    val countCols = reached.zipWithIndex.map { case (r, i) =>
      count(when(r, lit(1))).as(s"n$i")
    }
    val counts = mins.agg(countCols.head, countCols.tail: _*)
    unpivotCounts(counts, steps)
  }

  /** Shared funnel tail: turn the single (n0..n_{k-1}) counts row into the
    * (step, step_name, n_users) output. The crossJoin is 1-row × k-row —
    * constant-size (allow-listed in PlanGuardSpec).
    */
  private def unpivotCounts(counts: DataFrame, steps: Seq[String]): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val stepsDf = steps.zipWithIndex
      .map { case (s, i) => (i + 1, s) }.toDF("step", "step_name")
    counts.crossJoin(stepsDf)
      .select(col("step"), col("step_name"),
        graft.pickByIndex(col("step") - 1, steps.indices.map(i => col(s"n$i")))
          .as("n_users"))
  }

  /** Ordered funnel, ANY-CHAIN semantics (the classic strict funnel): a
    * user counts for step k iff SOME events e₁ < e₂ < ... < e_k of the
    * required types exist in strictly increasing time order. Computed by
    * the greedy earliest-after fold — t₁ = min ts of type s₁,
    * t_k = min ts of type s_k with ts > t_{k-1} — which is exact here
    * (if any chain exists, replacing each element with the earliest
    * qualifying one stays a valid chain; the exchange argument that does
    * NOT hold for [[funnel]]'s global per-type minima).
    *
    * Shape: t_k depends on t_{k-1}, so each step is one conditional-min
    * re-aggregation of the events against the per-user accumulator —
    * k shuffles total (steps are few; each is map-side combinable).
    * Use [[funnel]] when first-touch semantics suffice — it is one
    * shuffle regardless of k.
    */
  def funnelAnyChain(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val filtered = events.filter(col("event_type").isin(steps: _*))
      .select("user_id", "event_type", "ts")
    val t0 = filtered.groupBy("user_id")
      .agg(min(when(col("event_type") === steps.head, col("ts"))).as("t0"))
    val acc = steps.zipWithIndex.tail.foldLeft(t0) { case (prev, (s, i)) =>
      val aggCols = (0 until i).map(j => first(col(s"t$j")).as(s"t$j")) :+
        min(when(col("event_type") === s && col("ts") > col(s"t${i - 1}"),
          col("ts"))).as(s"t$i")
      filtered.join(prev, Seq("user_id"))
        .groupBy("user_id")
        .agg(aggCols.head, aggCols.tail: _*)
    }
    val countCols = steps.indices.map(i => count(col(s"t$i")).as(s"n$i"))
    val counts = acc.agg(countCols.head, countCols.tail: _*)
    unpivotCounts(counts, steps)
  }

  /** Cohort retention: users are cohorted by the week of their FIRST
    * event; retention(cohort, w) = how many of that cohort have any
    * event in week w after their first. The per-user first-event table
    * joins back on user_id WITHOUT a broadcast hint: it has one row per
    * distinct user — bounded by user count, not time — so at corpus
    * scale it can be larger than any broadcast budget; both sides
    * shuffle on user_id (or AQE broadcasts when it genuinely fits).
    */
  def retention(events: DataFrame, maxWeeks: Int = 8): DataFrame = {
    val firsts = events.groupBy("user_id")
      .agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"),
        date_trunc("week", col("first_ts")).as("cohort_week"),
        col("first_ts"))
    events
      .join(firsts, Seq("user_id"))
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

  /** First-order Markov transition matrix over per-user event journeys:
    * for every consecutive (event, next event) pair within a user's
    * time-ordered stream, the transition count and the conditional
    * probability P(to | from). The standard "where do users go next"
    * journey summary, and the input to Markov-chain attribution models.
    *
    * Tie-break: simultaneous events order by event_id, so the journey —
    * and therefore the matrix — is fully deterministic and
    * engine-portable. Each user's last event has no successor and emits
    * nothing.
    *
    * Shape: ONE corpus-sized shuffle (the lead() window on user_id —
    * per-user streams are session-sized, never skew-prone the way a
    * groupBy on a hot content key is), then a map-side-combinable count
    * aggregate to |types|² rows at most, and a final window over that
    * constant-size matrix for the row-normalizing totals. P(to|from) is
    * one int/int double division — exact parity cross-engine.
    */
  def transitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val matrix = events
      .select(col("user_id"), col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n_transitions"))
    val wFrom = Window.partitionBy("from_type")
    matrix.select(col("from_type"), col("to_type"), col("n_transitions"),
      (col("n_transitions").cast("double") /
        sum(col("n_transitions")).over(wFrom)).as("p_transition"))
  }

  /** Relational CEP — count ordered pattern OCCURRENCES per user: tuples
    * of k events matching `steps` in order, strictly increasing in time,
    * each step within `withinMs` of its predecessor. Complements the
    * funnels (which count USERS reaching each step) with the
    * instance-count form behind "how many view→click→purchase journeys
    * completed inside 2 h" — MATCH_RECOGNIZE's all-matches mode for a
    * fixed sequence pattern, as k−1 banded self-joins.
    *
    * Shape: every join is user-keyed (the time band is a post-join
    * filter on an equi-join, never a nested loop); each step's relation
    * is pre-filtered to its own type, so join inputs are type-sliced,
    * not the whole log. Occurrence counting is combinatorial BY
    * SEMANTICS (m matching tuples per user cost m rows before the
    * count): the time band is what bounds it — per user, candidates per
    * step are the events inside one `withinMs` window. A hot user with
    * dense repeats inside the band is the skew case; the lever is
    * tightening `withinMs` or capping per-(user, step) events upstream,
    * both visible in the audit this query feeds.
    */
  def sequenceMatches(events: DataFrame, steps: Seq[String],
                      withinMs: Long): DataFrame = {
    require(steps.size >= 2, s"need at least 2 steps, got ${steps.size}")
    require(withinMs > 0, s"withinMs must be positive, got $withinMs")
    val stepDfs = steps.zipWithIndex.map { case (tp, i) =>
      events.filter(col("event_type") === tp)
        .select(col("user_id"), unix_millis(col("ts")).as(s"_t$i"))
    }
    val chained = stepDfs.zipWithIndex.tail.foldLeft(stepDfs.head) {
      case (acc, (step, i)) =>
        acc.join(step, Seq("user_id"))
          .filter(col(s"_t$i") > col(s"_t${i - 1}") &&
            col(s"_t$i") - col(s"_t${i - 1}") <= withinMs)
    }
    chained.groupBy("user_id").agg(count(lit(1)).as("n_matches"))
  }
}
