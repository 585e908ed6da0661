package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators beyond the reference's equi-join surface: the as-of
  * join every feature/training pipeline eventually needs (enrich each
  * event with the most recent state at or before its timestamp —
  * point-in-time-correct features, no leakage from the future).
  */
object Temporal {

  /** Left as-of join: each left row gains the payload of the LATEST right
    * row with the same `key` and `right.ts <= left.ts` (NULLs when no such
    * row). Matches DuckDB/kdb ASOF LEFT JOIN semantics, which is exactly
    * what the oracle runs.
    *
    * Scale shape — this is the part that matters at 100 TB: the naive
    * formulations are a range join (`l JOIN r ON key AND r.ts <= l.ts`
    * then max-per-left — quadratic blowup per hot key) or a per-key
    * collect. This implementation instead UNIONs the two sides and fills
    * the payload with `last(_, ignoreNulls)` over a
    * (partitionBy key, orderBy ts, rows unbounded-preceding..current)
    * window: ONE hash shuffle of left+right on the key, one sort within
    * partitions, zero row multiplication — the same plan Spark gives any
    * windowed aggregate, at any key cardinality. Right rows sort before
    * left rows on timestamp ties (`_side` 0 < 1), so a right row AT the
    * left timestamp is visible to it, per as-of convention. Known skew
    * lever: a single pathological key serializes into one task's sort —
    * the standard remedy is range-bucketing ts within the hot key and
    * carrying bucket-boundary state forward, not salting (order matters).
    *
    * Ties WITHIN the right side at the same (key, ts) are the caller's
    * contract to resolve (pre-dedup to one row per (key, ts)) — `last()`
    * over an ambiguous sort is nondeterministic, same as any ASOF engine.
    *
    * @param rightPayload right columns to carry (prefixed `asof_` in the
    *                     output, alongside `asof_<ts>` = the matched ts)
    * @param direction    "backward" (default): latest right row with
    *                     `right.ts <= left.ts` — the point-in-time-correct
    *                     feature lookup; "forward": EARLIEST right row with
    *                     `right.ts >= left.ts` — next-event attribution
    *                     (time-to-response, next price tick). Same plan
    *                     either way: only the traversal order flips.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightPayload: Seq[String], prefix: String = "asof_",
               direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got '$direction'")
    val extraL = left.columns.filterNot(c => c == key || c == ts).toSeq
    val pay = rightPayload :+ ts
    require(!rightPayload.contains(ts), s"payload already includes '$ts'")
    val collisions = extraL.toSet.intersect(pay.map(prefix + _).toSet)
    require(collisions.isEmpty, s"output name collision: $collisions")

    // The payload travels as ONE struct so every output column comes from
    // the SAME matched right row — per-column ignoreNulls fills would mix
    // rows whenever a right payload column is legitimately NULL.
    val payStruct = org.apache.spark.sql.types.StructType(pay.map(c =>
      org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    val l = left.select(
      col(key) +: col(ts) +: lit(1).as("_side") +:
        (extraL.map(col) :+ lit(null).cast(payStruct).as("_asof")): _*)
    val r = right.select(
      col(key) +: col(ts) +: lit(0).as("_side") +:
        (extraL.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          struct(pay.map(col): _*).as("_asof")): _*)

    // backward walks time ascending (latest right at-or-before each left
    // row); forward walks it descending (earliest right at-or-after) —
    // right rows sort before left rows on timestamp ties in both, so an
    // equal-ts right row is visible to the left row per as-of convention
    val tsOrder = if (direction == "backward") col(ts).asc else col(ts).desc
    val w = Window.partitionBy(key)
      .orderBy(tsOrder, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_asof", last(col("_asof"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select((key +: ts +: extraL).map(col) ++
        pay.map(c => col(s"_asof.`$c`").as(prefix + c)): _*)
  }

  /** Slowly-changing-dimension Type-2 history builder: collapse a stream
    * of per-key observations (snapshots, change events — anything with a
    * key, a timestamp, and tracked attributes) into validity intervals.
    * Consecutive observations with identical attribute values merge into
    * one version; any change (including a return to an earlier value)
    * opens a new version. Output: one row per version with
    * `effective_from` (first observation at these values),
    * `effective_to` (next version's start, NULL while current — the
    * half-open [from, to) convention), `is_current`, and a 1-based
    * `version` per key. This is the standard dimension-history op the
    * reference's daily dim reloads silently lack (they overwrite in
    * place, losing history — reference load_dim_tables.py's
    * WRITE_TRUNCATE).
    *
    * Scale shape: ONE hash shuffle of the observation stream on `key`,
    * one sort within partitions — the change-marking lag, the version
    * row_number, and the closing lead all share the same
    * (partitionBy key, orderBy ts+tieBreak) window spec, and the filter
    * between them preserves ordering, so Catalyst plans a single
    * Exchange+Sort for the whole thing (TemporalSpec asserts it). No row
    * multiplication, no driver state; per-key history length bounds the
    * task memory, the same contract as any windowed op.
    *
    * Null-safe change detection (`<=>`): NULL → value and value → NULL
    * are version changes, NULL → NULL is not. Ties within (key, ts,
    * tieBreak) are the caller's contract to resolve, same as [[asOfJoin]].
    *
    * @param tieBreak extra ordering columns making the per-key order
    *                 total (e.g. a source sequence number) — required for
    *                 determinism whenever `ts` alone can tie.
    */
  def scd2(observations: DataFrame, key: String, ts: String,
           attrs: Seq[String], tieBreak: Seq[String] = Nil): DataFrame = {
    require(attrs.nonEmpty, "scd2 needs at least one tracked attribute")
    val order = (col(ts) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(key).orderBy(order: _*)
    // first row per key: lag of a constant marker is NULL exactly there —
    // cheaper than a row_number comparison and shares the same window
    val firstRow = lag(lit(1), 1).over(w).isNull
    val changed = attrs
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    observations
      .select((key +: ts +: attrs) .map(col) ++ tieBreak.map(col): _*)
      .withColumn("_new_version", firstRow || changed)
      .filter(col("_new_version"))
      .withColumn("effective_from", col(ts))
      .withColumn("effective_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
      .withColumn("version", row_number().over(w).cast("long"))
      .select((key +: attrs).map(col) ++
        Seq(col("effective_from"), col("effective_to"),
          col("is_current"), col("version")): _*)
  }

  /** Incremental [[scd2]] maintenance — apply a batch of NEW observations
    * to an existing SCD2 history without recomputing untouched keys: the
    * MERGE form a 15-minute incremental pipeline actually runs. Keys
    * absent from the batch pass through UNTOUCHED (no window, no sort);
    * keys present have their history replayed as observations (one row
    * per version at `effective_from`) union'd with the batch and re-run
    * through [[scd2]] — collapsing is idempotent, so replaying collapsed
    * versions is exact.
    *
    * Contract (the append-only arrival order every SCD2 merge assumes):
    * a batch observation must not predate its key's latest
    * `effective_from`. A late-arriving observation older than that can
    * split the wrong interval — because versions BETWEEN the original
    * observations were collapsed away, the replay cannot know a value
    * recurred after the late row's position (classic SCD2 limitation;
    * full recompute from raw observations is the repair path).
    * Replay ordering is made TOTAL by carrying each replayed version's
    * original `version` as a synthetic leading tie-break (`_replay_ord`);
    * batch rows get Long.MaxValue there, so at an equal timestamp every
    * replayed version keeps its original relative order (even when two
    * versions share an effective_from because their source observations
    * tied on ts and were separated only by tie-break columns the replay
    * no longer carries) and a batch observation counts as the later
    * arrival. Without it the replay's (ts, tieBreak=NULL) order is not
    * total and the incremental merge could diverge from the full
    * recompute on such ties.
    *
    * Scale shape: `touched` is batch-key-sized → broadcast semi/anti
    * joins against the history, so the full history is never shuffled;
    * the scd2 recompute windows only over touched keys' (short)
    * histories plus the batch. The streaming twin
    * (IncrementalStream.runScd2Stream) adds the physical half: history
    * bucketed by key hash, dynamic partition overwrite of touched
    * buckets only.
    */
  def scd2Apply(history: DataFrame, newObs: DataFrame, key: String,
                ts: String, attrs: Seq[String],
                tieBreak: Seq[String] = Nil): DataFrame = {
    require(!(newObs.columns ++ history.columns).contains("_replay_ord"),
      "input already has a _replay_ord column")
    val touched = newObs.select(col(key)).distinct()
    val replay = history.join(broadcast(touched), Seq(key), "left_semi")
      .select(col(key) +: col("effective_from").as(ts) +:
        col("version").as("_replay_ord") +: (attrs.map(col) ++
        tieBreak.map(c => lit(null).cast(newObs.schema(c).dataType).as(c))): _*)
    val obs = newObs.select(
      col(key) +: col(ts) +: lit(Long.MaxValue).as("_replay_ord") +:
        (attrs.map(col) ++ tieBreak.map(col)): _*)
    val untouched = history.join(broadcast(touched), Seq(key), "left_anti")
    untouched.unionByName(
      scd2(replay.unionByName(obs), key, ts, attrs, "_replay_ord" +: tieBreak))
  }

  /** Interval (range) join: pair every point row with every interval row
    * whose `[start, end)` contains the point's timestamp — the shape
    * behind incident attribution, campaign windows, outage overlap.
    *
    * Scale shape: the naive formulation (`p JOIN i ON p.ts >= i.start AND
    * p.ts < i.end`) has no equi-key, so Spark plans a broadcast
    * NESTED-LOOP join — O(|points| × |intervals|) compares, unusable once
    * intervals outgrow a broadcast. This implementation manufactures the
    * equi-key: time is diced into fixed `bucketMs` buckets, each interval
    * is exploded to one row per bucket it overlaps, each point maps to
    * exactly ONE bucket, and the join becomes a plain hash equi-join on
    * bucket id with the exact predicate re-applied post-join. Each
    * (point, interval) pair can meet in at most one bucket (the point's),
    * so no dedup is needed. Cost: interval replication ×
    * ceil(len/bucketMs + 1) — pick bucketMs near the typical interval
    * length so the expansion stays O(1) per interval while each point's
    * bucket holds few candidate intervals. This is the standard
    * bin-the-range trick (Databricks' range-join hint does the same
    * under the hood).
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame, tsCol: String,
                   startCol: String, endCol: String, bucketMs: Long): DataFrame = {
    require(bucketMs > 0, s"bucketMs must be positive, got $bucketMs")
    val taken = points.columns.toSet ++ intervals.columns.toSet
    require(!taken.contains("_bucket"), "input already has a _bucket column")
    require(points.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "point/interval column names must be disjoint")
    val p = points.withColumn("_bucket",
      floor(unix_millis(col(tsCol)) / bucketMs))
    // Empty/inverted intervals ([start, end) with end <= start) match
    // nothing — drop them BEFORE the explode: Spark's sequence() steps -1
    // when start > stop, so a single dirty row (e.g. an epoch-zero end
    // sentinel) would otherwise explode into millions of bucket rows that
    // the exact predicate then discards.
    val i = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("_bucket",
        explode(sequence(floor(unix_millis(col(startCol)) / bucketMs),
          floor((unix_millis(col(endCol)) - 1) / bucketMs))))
    p.join(i, Seq("_bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("_bucket")
  }
}
