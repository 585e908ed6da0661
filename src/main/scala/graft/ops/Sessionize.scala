package graft.ops

import graft._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over the events stream (the beyond-reference
  * operator from SURVEY.md §7.4; the reference's own notion of time
  * bucketing stops at TIMESTAMP_TRUNC — order_processing_incremental.py:185).
  *
  * Batch realization: one shuffle on user_id, then two window passes (lag +
  * running sum) in the same partitioning — Catalyst plans a single Exchange.
  * Millisecond epochs (not raw timestamps) are used for ordering and gap
  * arithmetic so the semantics are identical across engines regardless of
  * sub-microsecond timestamp precision. The streaming twin is
  * `graft.streaming.Sessions` (session_window / flatMapGroupsWithState).
  */
object Sessionize {

  /** Assign session sequence numbers per user: a new session starts when the
    * gap to the previous event exceeds `gapMinutes`.
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    val gapMs = gapMinutes * 60000L
    events
      .withColumn("ts_ms", unix_millis(col("ts")))
      .withColumn("prev_ms", lag("ts_ms", 1).over(w))
      .withColumn("is_new",
        when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > gapMs, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session aggregates: event count, start, duration, total value. */
  def sessionStats(events: DataFrame, gapMinutes: Int): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy("user_id", "session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        min("ts_ms").as("session_start_ms"),
        (max("ts_ms") - min("ts_ms")).as("duration_ms"),
        sumMeasure(col("value")).as("total_value"))
}
