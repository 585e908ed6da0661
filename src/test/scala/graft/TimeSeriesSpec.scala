package graft

import java.sql.Timestamp

import graft.ops.TimeSeries

/** Gap-fill and trailing-z-score semantics on hand-built hourly streams. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def hts(hour: Int, min: Int = 0) =
    new Timestamp(1700000000000L / 3600000L * 3600000L // align to an hour
      + hour * 3600000L + min * 60000L)

  test("gapFill: every hour of the global span present, gaps are exact zeros") {
    val events = Seq(
      (1L, hts(0), "a"), (2L, hts(0, 30), "a"), // a: 2 events h0
      (3L, hts(3), "a"),                        // a: gap h1-h2, 1 event h3
      (4L, hts(1), "b"))                        // b: only h1 — grid still spans h0..h3
      .toDF("event_id", "ts", "event_type")
    val out = TimeSeries.gapFill(events)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
    assert(out.length == 8, "2 types x 4 hours")
    val byKey = out.map(t => (t._1, t._2) -> t._3).toMap
    assert(byKey(("a", hts(0))) == 2L && byKey(("a", hts(3))) == 1L)
    assert(byKey(("a", hts(1))) == 0L && byKey(("a", hts(2))) == 0L)
    assert(byKey(("b", hts(1))) == 1L)
    assert(byKey(("b", hts(0))) == 0L && byKey(("b", hts(2))) == 0L
      && byKey(("b", hts(3))) == 0L, "b is zero-filled across the GLOBAL span")
  }

  test("rateAnomaly: incomplete trailing window yields null score, spike flags") {
    // 30 flat hours at 5 events/hour, then one 50-event spike at hour 30
    val flat = (0 until 30).flatMap(h =>
      (0 until 5).map(i => (h * 10L + i, hts(h, i), "a")))
    val spike = (0 until 50).map(i => (9000L + i, hts(30, i % 60), "a"))
    val events = (flat ++ spike).toDF("event_id", "ts", "event_type")
    val out = TimeSeries.rateAnomaly(events, window = 24)
      .collect()
      .map(r => r.getTimestamp(1) -> ((Option(r.get(3)), Option(r.get(4)), r.getBoolean(5))))
      .toMap
    // head of the series: trailing window incomplete -> null mean/z, not flagged
    (0 until 24).foreach { h =>
      val (m, z, fl) = out(hts(h))
      assert(m.isEmpty && z.isEmpty && !fl, s"hour $h must be unscored")
    }
    // flat region with full window: variance 0 -> null z (never ±Inf/NaN)
    (24 until 30).foreach { h =>
      val (m, z, fl) = out(hts(h))
      assert(m.contains(5.0) && z.isEmpty && !fl, s"flat hour $h")
    }
    // the spike hour: 24 flat predecessors, z undefined by sd=0? No —
    // its trailing window is the flat region (sd 0) so z is null; the
    // DETECTABLE anomaly needs baseline variance: see next test
    val (_, zSpike, flSpike) = out(hts(30))
    assert(zSpike.isEmpty && !flSpike, "zero-variance baseline never flags")
  }

  test("rateAnomaly: spike over a noisy baseline crosses the threshold") {
    // alternating 4/6 events per hour (sd ~1), then a 40-event hour
    val base = (0 until 30).flatMap { h =>
      val n = if (h % 2 == 0) 4 else 6
      (0 until n).map(i => (h * 10L + i, hts(h, i), "a"))
    }
    val spike = (0 until 40).map(i => (9000L + i, hts(30, i % 60), "a"))
    val events = (base ++ spike).toDF("event_id", "ts", "event_type")
    val out = TimeSeries.rateAnomaly(events, window = 24)
      .collect()
      .map(r => r.getTimestamp(1) -> ((Option(r.get(4)), r.getBoolean(5))))
      .toMap
    val (zSpike, flagged) = out(hts(30))
    assert(flagged && zSpike.exists(_.asInstanceOf[Double] > 3.0),
      s"spike hour must flag, got $zSpike")
    // steady alternation never flags
    (24 until 30).foreach(h => assert(!out(hts(h))._2, s"hour $h"))
  }

  test("seasonalNaiveBacktest: perfectly seasonal series scores zero, shifts score exactly") {
    // type a: perfect 24h seasonality (h%24 events per hour) over 3 days
    //   -> every forecast exact, mae = 0, bias = 0
    // type b: day 1 constant 2/hour, days 2-3 constant 5/hour -> the 24
    //   day-2 forecasts err by +3, day-3 forecasts are exact:
    //   mae = 3*24/48 = 1.5, bias = +1.5
    val a = (0 until 72).flatMap(h =>
      (0 until (h % 24) + 1).map(i => (h * 100L + i, hts(h, i), "a")))
    val b = (0 until 72).flatMap { h =>
      val n = if (h < 24) 2 else 5
      (0 until n).map(i => (10000L + h * 100L + i, hts(h, i), "b"))
    }
    val out = TimeSeries.seasonalNaiveBacktest((a ++ b).toDF("event_id", "ts", "event_type"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out("a") == ((48L, 0.0, 0.0)), s"got ${out("a")}")
    assert(out("b") == ((48L, 1.5, 1.5)), s"got ${out("b")}")
  }
}
