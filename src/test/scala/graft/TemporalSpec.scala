package graft

import java.sql.Timestamp

import graft.ops.Temporal
import org.apache.spark.sql.functions._

/** As-of join: point-in-time correctness, tie handling, null payloads,
  * and equivalence with the naive range-join formulation.
  */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("asOfJoin picks the latest right row at or before each left ts") {
    val left = Seq((1L, ts(0), "l0"), (1L, ts(1), "l1"), (1L, ts(6), "l6"),
      (1L, ts(12), "l12"), (2L, ts(5), "other-user"))
      .toDF("user_id", "ts", "tag")
    val right = Seq((1L, ts(1), 10.0), (1L, ts(5), 50.0), (1L, ts(10), 100.0),
      (2L, ts(9), 9.0))
      .toDF("user_id", "ts", "value")
    val out = Temporal.asOfJoin(left, right, "user_id", "ts", Seq("value"))
      .select("tag", "asof_value")
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("l0").isEmpty, "no right row at or before l0")
    assert(out("l1").contains(10.0), "right row AT the left ts must match")
    assert(out("l6").contains(50.0))
    assert(out("l12").contains(100.0))
    assert(out("other-user").isEmpty, "keys must not leak across users")
  }

  test("asOfJoin payload columns all come from the same matched row") {
    // the ts(5) right row carries a NULL value: a per-column fill would
    // take value from ts(1) but asof_ts from ts(5) — the struct fill must
    // keep them together
    val left = Seq((1L, ts(6))).toDF("user_id", "ts")
    val right = Seq((1L, ts(1), Some(10.0)), (1L, ts(5), None))
      .toDF("user_id", "ts", "value")
    val row = Temporal.asOfJoin(left, right, "user_id", "ts", Seq("value"))
      .select("asof_value", "asof_ts").collect().head
    assert(row.isNullAt(0), "matched row's value IS null")
    assert(row.getTimestamp(1) == ts(5), "matched ts is the latest <= left ts")
  }

  test("asOfJoin equals the naive range-join formulation on random data") {
    val rng = new scala.util.Random(404)
    val left = Seq.fill(300)((rng.nextInt(8).toLong, ts(rng.nextInt(100)), rng.nextInt(1000)))
      .toDF("user_id", "ts", "pay")
    // unique (user, ts) on the right, as the operator contract requires
    val right = Seq.fill(300)((rng.nextInt(8).toLong, ts(rng.nextInt(100)), rng.nextDouble()))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      .toDF("user_id", "ts", "value")
    val fast = Temporal.asOfJoin(left, right, "user_id", "ts", Seq("value"))
      .select("user_id", "ts", "pay", "asof_value", "asof_ts")
      .collect().map(_.toSeq).toSeq
    // naive: range join then keep the max right ts per left row
    val naive = {
      val l = left.withColumn("_lid", monotonically_increasing_id())
      val j = l.join(right.withColumnRenamed("ts", "rts").withColumnRenamed("user_id", "ruid"),
        col("user_id") === col("ruid") && col("rts") <= col("ts"), "left")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("_lid").orderBy(col("rts").desc_nulls_last)
      j.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
        .select(col("user_id"), col("ts"), col("pay"),
          col("value").as("asof_value"), col("rts").as("asof_ts"))
        .collect().map(_.toSeq).toSeq
    }
    def sortKey(s: Seq[Any]) = s.map(String.valueOf).mkString("|")
    assert(fast.sortBy(sortKey) == naive.sortBy(sortKey))
  }

  test("intervalJoin: boundary semantics [start, end) and bucket-straddling intervals") {
    val points = Seq((1L, ts(0)), (2L, ts(5)), (3L, ts(10)), (4L, ts(15)))
      .toDF("pid", "pts")
    val ivals = Seq((10L, ts(0), ts(10)), (20L, ts(5), ts(16)), (30L, ts(11), ts(12)))
      .toDF("wid", "w_start", "w_end")
    // bucket = 3 min: intervals straddle several buckets
    val out = Temporal.intervalJoin(points, ivals, "pts", "w_start", "w_end",
      bucketMs = 3 * 60000L)
      .select("pid", "wid").as[(Long, Long)].collect().toSet
    // [start, end): ts(0) in 10 (not its end), ts(10) NOT in 10; ts(15) in 20
    assert(out == Set((1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L), (4L, 20L)))
  }

  test("intervalJoin drops inverted intervals instead of exploding them") {
    val points = Seq((1L, ts(5))).toDF("pid", "pts")
    // inverted (end before start by ~11 years of buckets) and empty
    val ivals = Seq((1L, ts(0), new Timestamp(0L)), (2L, ts(5), ts(5)))
      .toDF("wid", "w_start", "w_end")
    val out = Temporal.intervalJoin(points, ivals, "pts", "w_start", "w_end",
      bucketMs = 60000L)
    assert(out.count() == 0)
  }

  test("intervalJoin equals the naive inequality join on random data, no nested loop") {
    val rng = new scala.util.Random(404)
    val points = (1L to 300L).map(i => (i, ts(rng.nextInt(500)))).toDF("pid", "pts")
    val ivals = (1L to 40L).map { i =>
      val s = rng.nextInt(480); (i, ts(s), ts(s + 1 + rng.nextInt(40)))
    }.toDF("wid", "w_start", "w_end")
    val fast = Temporal.intervalJoin(points, ivals, "pts", "w_start", "w_end",
      bucketMs = 10 * 60000L)
    val naive = points.join(ivals,
        col("pts") >= col("w_start") && col("pts") < col("w_end"))
      .select("pid", "wid").as[(Long, Long)].collect().toSet
    assert(fast.select("pid", "wid").as[(Long, Long)].collect().toSet == naive)
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"range join not bucketed:\n$plan")
  }

  test("asOfJoin plans one shuffle and no join operator") {
    val left = Seq((1L, ts(0), "x")).toDF("user_id", "ts", "tag")
    val right = Seq((1L, ts(1), 1.0)).toDF("user_id", "ts", "value")
    val plan = Temporal.asOfJoin(left, right, "user_id", "ts", Seq("value"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected exactly one Exchange, got $exchanges:\n$plan")
  }

  test("asOfJoin forward picks the earliest right row at or after each left ts") {
    val left = Seq((1L, ts(0), "l0"), (1L, ts(5), "l5"), (1L, ts(11), "l11"))
      .toDF("user_id", "ts", "tag")
    val right = Seq((1L, ts(1), 10.0), (1L, ts(5), 50.0), (1L, ts(10), 100.0))
      .toDF("user_id", "ts", "value")
    val out = Temporal.asOfJoin(left, right, "user_id", "ts", Seq("value"),
      direction = "forward")
      .select("tag", "asof_value")
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("l0").contains(10.0), "earliest right after l0 is ts(1)")
    assert(out("l5").contains(50.0), "right row AT the left ts must match")
    assert(out("l11").isEmpty, "no right row at or after l11")
    // random equivalence vs the naive forward formulation
    val rng = new scala.util.Random(99)
    val rl = Seq.fill(200)((rng.nextInt(6).toLong, ts(rng.nextInt(80)), rng.nextInt(999)))
      .toDF("user_id", "ts", "pay")
    val rr = Seq.fill(200)((rng.nextInt(6).toLong, ts(rng.nextInt(80)), rng.nextDouble()))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      .toDF("user_id", "ts", "value")
    val fast = Temporal.asOfJoin(rl, rr, "user_id", "ts", Seq("value"),
      direction = "forward")
      .select("user_id", "ts", "pay", "asof_value", "asof_ts")
      .collect().map(_.toSeq).toSet
    val naive = {
      val j = rl.join(rr.withColumnRenamed("ts", "rts").withColumnRenamed("user_id", "ruid"),
        col("user_id") === col("ruid") && col("rts") >= col("ts"), "left")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "ts", "pay").orderBy(col("rts").asc)
      j.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
        .select(col("user_id"), col("ts"), col("pay"),
          col("value").as("asof_value"), col("rts").as("asof_ts"))
        .collect().map(_.toSeq).toSet
    }
    assert(fast == naive)
  }

  test("scd2 collapses runs, reopens on return, closes intervals half-open") {
    // key 1 observes A A B A: runs collapse, the return to A is a NEW
    // version (type-2), each effective_to is the next version's start
    val obs = Seq(
      (1L, ts(0), "A", 10L), (1L, ts(1), "A", 11L), (1L, ts(2), "B", 12L),
      (1L, ts(3), "A", 13L),
      (2L, ts(5), "X", 20L))
      .toDF("k", "ts", "status", "seq")
    val out = Temporal.scd2(obs, "k", "ts", Seq("status"), Seq("seq"))
      .orderBy("k", "version")
      .select("k", "status", "effective_from", "effective_to", "is_current", "version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, "A", ts(0), Some(ts(2)), false, 1L),
      (1L, "B", ts(2), Some(ts(3)), false, 2L),
      (1L, "A", ts(3), None, true, 3L),
      (2L, "X", ts(5), None, true, 1L)))
  }

  test("scd2 change detection is null-safe across every tracked attribute") {
    // null→null is NOT a change; null→value and value→null are; a change
    // in EITHER attribute opens a version
    val obs = Seq(
      (1L, ts(0), None, "p1"), (1L, ts(1), None, "p1"),       // no change
      (1L, ts(2), Some("A"), "p1"),                            // null→A
      (1L, ts(3), Some("A"), "p2"),                            // second attr
      (1L, ts(4), None, "p2"))                                 // A→null
      .toDF("k", "ts", "status", "prio")
    val out = Temporal.scd2(obs, "k", "ts", Seq("status", "prio"))
      .orderBy("version")
      .collect().map(r => (Option(r.getString(1)), r.getString(2), r.getLong(6)))
    assert(out.toSeq == Seq(
      (None, "p1", 1L), (Some("A"), "p1", 2L), (Some("A"), "p2", 3L),
      (None, "p2", 4L)))
  }

  test("scd2Apply: incremental merge equals full recompute on in-order batches") {
    val rng = new scala.util.Random(77)
    // 20 keys × ~25 obs over ts 0..99, unique global seq as tie-break
    val obs = (0 until 500).map { i =>
      (rng.nextInt(20).toLong, ts(rng.nextInt(100)),
        s"v${rng.nextInt(3)}", i.toLong)
    }
    val (first, rest) = obs.partition(_._2.getTime < ts(50).getTime)
    val cols = Seq("k", "ts", "status", "seq")
    val history = Temporal.scd2(first.toDF(cols: _*), "k", "ts",
      Seq("status"), Seq("seq"))
    val applied = Temporal.scd2Apply(history, rest.toDF(cols: _*), "k", "ts",
      Seq("status"), Seq("seq"))
    val full = Temporal.scd2(obs.toDF(cols: _*), "k", "ts",
      Seq("status"), Seq("seq"))
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "status", "effective_from", "effective_to", "is_current", "version")
        .collect().map(_.toSeq).toSet
    assert(snap(applied) == snap(full),
      "incremental apply must equal the full recompute")
  }

  test("scd2Apply leaves untouched keys' history rows byte-identical") {
    val history = Temporal.scd2(
      Seq((1L, ts(0), "A"), (1L, ts(1), "B"), (2L, ts(0), "X"))
        .toDF("k", "ts", "status"),
      "k", "ts", Seq("status"))
    val applied = Temporal.scd2Apply(history,
      Seq((1L, ts(5), "C")).toDF("k", "ts", "status"), "k", "ts", Seq("status"))
    // key 2 was not in the batch: its row must pass through unchanged
    val k2 = applied.filter($"k" === 2L).collect().map(_.toSeq).toSet
    val orig = history.filter($"k" === 2L).collect().map(_.toSeq).toSet
    assert(k2 == orig)
    // key 1 gained version 3 and its old current row closed
    val k1 = applied.filter($"k" === 1L).orderBy("version")
      .select("status", "is_current").as[(String, Boolean)].collect().toSeq
    assert(k1 == Seq(("A", false), ("B", false), ("C", true)))
  }

  test("scd2Apply replay keeps original version order on tied effective_from") {
    // Two history versions SHARE effective_from (source observations tied
    // on ts, separated only by the seq tie-break, which the replay no
    // longer carries). The replay must keep their original order via
    // _replay_ord — without it the (ts, NULL-seq) order is not total and
    // the merge could emit B,A instead of A,B (wrong version chain).
    val cols = Seq("k", "ts", "status", "seq")
    val history = Temporal.scd2(
      Seq((1L, ts(0), "A", 1L), (1L, ts(0), "B", 2L)).toDF(cols: _*),
      "k", "ts", Seq("status"), Seq("seq"))
    assert(history.count() == 2, "fixture needs two versions tied on effective_from")
    val applied = Temporal.scd2Apply(history,
      Seq((1L, ts(1), "C", 3L)).toDF(cols: _*), "k", "ts", Seq("status"), Seq("seq"))
    val got = applied.orderBy("version")
      .select("status", "version", "is_current")
      .as[(String, Long, Boolean)].collect().toSeq
    assert(got == Seq(("A", 1L, false), ("B", 2L, false), ("C", 3L, true)))
    // equal-ts batch row counts as the LATER arrival: re-observing the
    // current value at its own effective_from must not open a version
    val reobserved = Temporal.scd2Apply(history,
      Seq((1L, ts(0), "B", 3L)).toDF(cols: _*), "k", "ts", Seq("status"), Seq("seq"))
    assert(reobserved.count() == 2, "re-observation of current value is a no-op")
  }

  test("scd2 plans exactly one shuffle for mark + filter + close + version") {
    val obs = Seq((1L, ts(0), "A", 1L)).toDF("k", "ts", "status", "seq")
    val plan = Temporal.scd2(obs, "k", "ts", Seq("status"), Seq("seq"))
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected exactly one Exchange, got $exchanges:\n$plan")
  }
}
