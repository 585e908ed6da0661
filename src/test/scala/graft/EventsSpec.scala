package graft

import java.sql.Timestamp

import graft.ops.Events

/** Funnel and cohort-retention semantics on hand-built event streams. */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("funnel: strict ordering on earliest-per-type chains") {
    val events = Seq(
      // u1 completes all three in order
      (1L, ts(0), "view"), (1L, ts(5), "click"), (1L, ts(10), "purchase"),
      // u2 clicks BEFORE viewing -> stops at step 1
      (2L, ts(5), "click"), (2L, ts(10), "view"),
      // u3 views only
      (3L, ts(0), "view"),
      // u4 purchase first, then view+click in order -> reaches step 2
      (4L, ts(0), "purchase"), (4L, ts(1), "view"), (4L, ts(2), "click"),
      // u5 never views -> counts nowhere
      (5L, ts(0), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val out = Events.funnel(events, Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1, "view", 4L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("funnel: simultaneous events do not advance (strict <)") {
    val events = Seq((1L, ts(0), "view"), (1L, ts(0), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = Events.funnel(events, Seq("view", "click"))
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1, "view", 1L), (2, "click", 0L)))
  }

  test("funnelAnyChain: re-engaging users advance where first-touch does not") {
    val events = Seq(
      // click, THEN view, THEN click again: any-chain completes view→click
      // via the SECOND click; first-touch stops at view (earliest click
      // precedes earliest view)
      (1L, ts(0), "click"), (1L, ts(5), "view"), (1L, ts(10), "click"),
      // in-order user: both semantics agree
      (2L, ts(0), "view"), (2L, ts(5), "click"))
      .toDF("user_id", "ts", "event_type")
    val anyChain = Events.funnelAnyChain(events, Seq("view", "click"))
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(anyChain == Seq((1, "view", 2L), (2, "click", 2L)))
    val firstTouch = Events.funnel(events, Seq("view", "click"))
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(firstTouch == Seq((1, "view", 2L), (2, "click", 1L)))
  }

  test("retention: cohorts by first-event week, offsets count distinct users") {
    def wts(week: Int, min: Int) =
      new Timestamp(1700000000000L + week * 7L * 24 * 3600 * 1000 + min * 60000L)
    val events = Seq(
      (1L, wts(0, 0)), (1L, wts(1, 0)), (1L, wts(3, 0)), // active w0, w1, w3
      (2L, wts(0, 30)), (2L, wts(0, 40)),                // only w0
      (3L, wts(1, 0)), (3L, wts(2, 0)))                  // later cohort
      .toDF("user_id", "ts")
    val out = Events.retention(events)
      .select("cohort_week", "week_offset", "n_active")
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getInt(1), r.getLong(2)))
      .toSet
    // cohort A = week of u1/u2's first events; cohort B = u3's
    val byCohort = out.groupBy(_._1)
    assert(byCohort.size == 2)
    val Seq(a, b) = byCohort.keys.toSeq.sorted
    val aMatrix = out.filter(_._1 == a).map(t => t._2 -> t._3).toMap
    assert(aMatrix == Map(0 -> 2L, 1 -> 1L, 3 -> 1L))
    val bMatrix = out.filter(_._1 == b).map(t => t._2 -> t._3).toMap
    assert(bMatrix == Map(0 -> 1L, 1 -> 1L))
  }

  test("transitions: per-user consecutive pairs, row-normalized probabilities") {
    val events = Seq(
      // u1: view -> click -> purchase; u2: view -> view; u3: click only
      (10L, 1L, ts(0), "view"), (11L, 1L, ts(5), "click"), (12L, 1L, ts(9), "purchase"),
      (20L, 2L, ts(0), "view"), (21L, 2L, ts(3), "view"),
      (30L, 3L, ts(0), "click"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = Events.transitions(events)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out == Map(
      ("view", "click") -> ((1L, 0.5)),
      ("view", "view") -> ((1L, 0.5)),
      ("click", "purchase") -> ((1L, 1.0))))
    // u3's single event and each user's last event emit nothing
    assert(!out.keySet.exists(_._1 == "purchase"))
  }

  test("sequenceMatches: occurrence counts, band bounds, strict order, user isolation") {
    val events = Seq(
      // u1: one full a->b->c inside the band
      (1L, ts(0), "a"), (1L, ts(5), "b"), (1L, ts(9), "c"),
      // u2: two b's inside the band -> TWO occurrences through the same a,c
      (2L, ts(0), "a"), (2L, ts(3), "b"), (2L, ts(5), "b"), (2L, ts(9), "c"),
      // u3: c arrives outside the 10-minute band from b
      (3L, ts(0), "a"), (3L, ts(5), "b"), (3L, ts(20), "c"),
      // u4: b simultaneous with a -> strict > excludes it
      (4L, ts(0), "a"), (4L, ts(0), "b"), (4L, ts(5), "c"),
      // u5: right types, wrong order
      (5L, ts(0), "c"), (5L, ts(1), "b"), (5L, ts(2), "a"))
      .zipWithIndex.map { case ((u, t, tp), i) => (i.toLong, u, t, tp) }
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = Events.sequenceMatches(events, Seq("a", "b", "c"),
      withinMs = 10 * 60000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L),
      s"expected u1=1, u2=2 and nobody else, got $out")
  }

  test("sequenceMatches plans user-keyed equi-joins, no nested loop") {
    val events = Seq((1L, 1L, ts(0), "a"), (2L, 1L, ts(1), "b"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val plan = Events.sequenceMatches(events, Seq("a", "b"), 60000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"must stay equi-keyed:\n$plan")
  }

  test("transitions: simultaneous events order by event_id; probs sum to 1") {
    val events = Seq(
      // same ts: journey is a(id 1) -> b(id 2) -> c(id 3), not any other order
      (1L, 7L, ts(0), "a"), (2L, 7L, ts(0), "b"), (3L, 7L, ts(0), "c"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = Events.transitions(events)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("a", "b"), ("b", "c")))
    // row-normalization: per from_type the probabilities sum to exactly 1
    val sums = Events.transitions(graft.io.Sources.table(spark, "/root/testdata/sf0.001", "events"))
      .groupBy("from_type").sum("p_transition")
      .collect().map(_.getDouble(1))
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-12))
  }
}
