package graft

import graft.ops.{Quality, Relational, Sessionize}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Core relational + quality + sessionization semantics on hand-built
  * frames, plus ScalaCheck properties (SURVEY.md §5.3 — generators sampled
  * directly; the scalatest-scalacheck bridge isn't in the offline cache).
  */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("duplicates: HAVING >1 semantics") {
    val df = Seq("a", "b", "b", "c", "c", "c").toDF("k")
    val d = Relational.duplicates(df, Seq("k")).as[(String, Long)].collect().toMap
    assert(d == Map("b" -> 2L, "c" -> 3L))
  }

  test("antiJoin: left rows without a right match") {
    val l = Seq((1, "x"), (2, "y"), (3, "z")).toDF("id", "v")
    val r = Seq(2).toDF("rid")
    val out = Relational.antiJoin(l, r, "id", "rid").select("id").as[Int].collect().toSet
    assert(out == Set(1, 3))
  }

  test("mergeHourly: matched adds, unmatched inserts (J5 MERGE semantics)") {
    val t = Seq(("2026-01-01 10:00:00", 5L, BigDecimal("10.500000")),
      ("2026-01-01 11:00:00", 2L, BigDecimal("1.000000")))
      .toDF("metric_hour", "total_events", "total_value")
    val s = Seq(("2026-01-01 11:00:00", 3L, BigDecimal("2.500000")),
      ("2026-01-01 12:00:00", 7L, BigDecimal("7.000000")))
      .toDF("metric_hour", "total_events", "total_value")
    val m = Relational.mergeHourly(t, s)
      .select($"metric_hour".cast("string"), $"total_events")
      .as[(String, Long)].collect().toMap
    assert(m == Map("2026-01-01 10:00:00" -> 5L,
      "2026-01-01 11:00:00" -> 5L, "2026-01-01 12:00:00" -> 7L))
  }

  test("quality gate: passes on empty violations, fails otherwise") {
    assert(Quality.gate("t", spark.emptyDataFrame).passed)
    assert(!Quality.gate("t", Seq(1).toDF("x")).passed)
    intercept[IllegalArgumentException] {
      Quality.requireEmpty("t", Seq(1).toDF("x"))
    }
  }

  test("qualityChecks: injected violations land with the right type/severity") {
    val orders = Seq((1L, 10L, 100.0), (2L, 99L, 50.0)).toDF("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Seq((1L, 1L, 100.0, 5L), (2L, 1L, 999.0, 5L), (2L, 1L, 1.0, 88L))
      .toDF("l_orderkey", "l_linenumber", "l_extendedprice", "l_partkey")
    val customer = Seq(10L).toDF("c_custkey")
    val part = Seq(5L).toDF("p_partkey")
    val audit = Quality.qualityChecks(orders, lineitem, customer, part)
    val byType = Quality.qualitySummary(audit)
      .select("check_type", "n_violations").as[(String, Long)].collect().toMap
    assert(byType("duplicate_line_item") == 1L) // order 2 has two line 1s
    assert(byType("amount_mismatch") == 1L)     // order 2: 1000.00 != 50.00
    assert(byType("missing_customer") == 1L)    // order 2 → cust 99
    assert(byType("missing_product") == 1L)     // part 88
  }

  test("sessionize: events split at the gap, stats aggregate per session") {
    def ev(id: Long, user: Long, minute: Int) =
      (id, user, new java.sql.Timestamp(1767225600000L + minute * 60000L), 1.0)
    val events = Seq(ev(1, 1, 0), ev(2, 1, 10), ev(3, 1, 60), ev(4, 2, 0))
      .toDF("event_id", "user_id", "ts", "value")
    val stats = Sessionize.sessionStats(events, gapMinutes = 30)
      .select("user_id", "session_seq", "n_events").as[(Long, Long, Long)].collect().toSet
    assert(stats == Set((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("topKPerGroup: correct leaderboards and WindowGroupLimit pushdown") {
    val rng = new scala.util.Random(17)
    val df = Seq.tabulate(500)(i => (s"g${i % 7}", i.toLong, rng.nextInt(100)))
      .toDF("grp", "id", "score")
    val out = graft.ops.Relational.topKPerGroup(
      df, Seq("grp"), Seq($"score".desc, $"id".asc), 3)
    val got = out.select("grp", "id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = df.as[(String, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(
        _.sortBy(r => (-r._3, r._2)).take(3).map(_._2).toSet).toMap
    assert(got == expected)
    // rank<=k over row_number must plan the pre-shuffle group-limit
    assert(out.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "expected WindowGroupLimit in the physical plan")
  }

  test("shippingPriority: top-10 plans as TakeOrderedAndProject, filters push to scans") {
    val d = "/root/testdata/sf0.001"
    val out = graft.ops.Relational.shippingPriority(
      spark.read.parquet(s"$d/customer.parquet"),
      spark.read.parquet(s"$d/orders.parquet"),
      spark.read.parquet(s"$d/lineitem.parquet"),
      "BUILDING", "1998-06-01")
      .orderBy(desc("revenue"), asc("order_date"), asc("order_id")).limit(10)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k operator:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)"),
      s"segment filter not pushed:\n$plan")
    assert(out.count() <= 10)
  }

  test("smallQtyRevenue: threshold semantics on a hand fixture") {
    import org.apache.spark.sql.functions.lit
    val li = Seq(
      // part 1: quantities 1,10,10 -> avg 7, threshold 1.4 -> only qty 1
      (1L, 1.0, 70.0), (1L, 10.0, 10.0), (1L, 10.0, 20.0),
      // part 2: quantities 5,5 -> threshold 1.0 -> none kept
      (2L, 5.0, 99.0), (2L, 5.0, 99.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    val part = Seq((1L, "BrandA"), (2L, "BrandB")).toDF("p_partkey", "p_brand")
    val out = graft.ops.Relational.smallQtyRevenue(li, part)
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("BrandA", 1L, 70.0 / 7.0)))
  }

  test("smallQtyRevenue equals Catalyst's own decorrelation of the subquery form") {
    val d = "/root/testdata/sf0.001"
    def t(n: String) = spark.read.parquet(s"$d/$n.parquet")
    val out = graft.ops.Relational.smallQtyRevenue(t("lineitem"), t("part"))
    Seq("lineitem", "part").foreach(n => t(n).createOrReplaceTempView(s"v_$n"))
    // the operator is the hand-decorrelated form; Spark SQL plans the
    // CORRELATED original through its own decorrelation rules — equal
    // results pin the rewrite as semantics-preserving
    val expected = spark.sql(
      """SELECT p_brand AS brand, count(*) AS n_small_lines,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
        |   AS avg_yearly
        |FROM v_lineitem JOIN v_part ON l_partkey = p_partkey
        |WHERE l_quantity < 0.2 * (
        |  SELECT sum(l2.l_quantity) / count(*) FROM v_lineitem l2
        |  WHERE l2.l_partkey = v_lineitem.l_partkey)
        |GROUP BY 1""".stripMargin)
      .as[(String, Long, Double)].collect()
      .map { case (b, n, a) => b -> ((n, a)) }.toMap
    val got = out.as[(String, Long, Double)].collect()
      .map { case (b, n, a) => b -> ((n, a)) }.toMap
    assert(got == expected)
    // the part-average side must never broadcast (fact-keyed at scale)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), s"no shuffle_hash join:\n$plan")
  }

  test("localSupplierVolume: same-nation condition enforced, dims broadcast") {
    val d = "/root/testdata/sf0.001"
    def t(n: String) = spark.read.parquet(s"$d/$n.parquet")
    val out = graft.ops.Relational.localSupplierVolume(
      t("customer"), t("orders"), t("lineitem"), t("supplier"),
      t("nation"), t("region"), "ASIA", "1997-01-01", "1998-01-01")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast joins:\n$plan")
    // cross-check against an unhinted SQL equivalent on the same session
    Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
      .foreach(n => t(n).createOrReplaceTempView(s"v_$n"))
    val expected = spark.sql(
      """SELECT n_name AS nation,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS revenue
        |FROM v_customer, v_orders, v_lineitem, v_supplier, v_nation, v_region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA' AND o_orderdate >= '1997-01-01'
        |  AND o_orderdate < '1998-01-01'
        |GROUP BY 1""".stripMargin)
      .as[(String, BigDecimal)].collect().toMap
    val got = out.as[(String, BigDecimal)].collect().toMap
    assert(got == expected)
  }

  test("hourlyMetricsApprox: HLL counts within 5% of exact on the fixture") {
    val events = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "events")
    val exact = graft.ops.Relational.hourlyMetrics(events)
      .select("metric_hour", "unique_users")
      .as[(java.sql.Timestamp, Long)].collect().toMap
    val approx = graft.ops.Relational.hourlyMetricsApprox(events)
      .select("metric_hour", "unique_users")
      .as[(java.sql.Timestamp, Long)].collect().toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (h, n) =>
      assert(math.abs(approx(h) - n) <= math.max(0.05 * n, 3.0),
        s"$h: approx ${approx(h)} vs exact $n")
    }
  }

  test("property: line-total sum per order == order-level recompute (decimal policy)") {
    val itemsGen = Gen.nonEmptyListOf(Gen.chooseNum(1, 999999).map(_ / 100.0))
    val ordersGen = Gen.nonEmptyListOf(itemsGen)
    (0 until 20).foreach { i =>
      val orders = ordersGen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val rows = orders.zipWithIndex.flatMap { case (items, oid) =>
        items.zipWithIndex.map { case (p, idx) => (oid.toLong, idx.toLong, p) }
      }
      val df = rows.toDF("l_orderkey", "l_linenumber", "l_extendedprice")
      val perLine = df.groupBy("l_orderkey")
        .agg(sumMoney($"l_extendedprice").as("s"))
        .as[(Long, BigDecimal)].collect().toMap
      val expected = orders.zipWithIndex.map { case (items, oid) =>
        oid.toLong -> items.map(v => BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      }.toMap
      assert(perLine.view.mapValues(_.setScale(2)).toMap ==
        expected.view.mapValues(_.setScale(2)).toMap, s"seed $i")
    }
  }

  test("snapshotDiff: added/removed/changed/unchanged, null-safe comparison") {
    val old = Seq(
      (1L, Some(10.0), "A"), // unchanged
      (2L, Some(20.0), "A"), // price changes
      (3L, None, "A"),       // NULL -> value = changed (null-safe)
      (4L, Some(40.0), "A")) // removed
      .toDF("k", "price", "status")
    val nw = Seq(
      (1L, Some(10.0), "A"),
      (2L, Some(25.0), "A"),
      (3L, Some(30.0), "A"),
      (5L, Some(50.0), "B")) // added
      .toDF("k", "price", "status")
    val out = Relational.snapshotDiff(old, nw, Seq("k"), Seq("price", "status"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(5))
      .toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
    // NULL == NULL must be unchanged, not changed (null-safe <=>)
    val o2 = Seq((9L, Option.empty[Double], "X")).toDF("k", "price", "status")
    val d2 = Relational.snapshotDiff(o2, o2, Seq("k"), Seq("price", "status"))
      .collect()
    assert(d2.length == 1 && d2(0).getString(5) == "unchanged")
  }

  test("expectations: every rule kind counts its violations, nulls routed correctly") {
    val df = Seq(
      (Some(1L), Some(10.0), Some("A"), Some("ok-1")),
      (Some(1L), Some(-5.0), Some("B"), Some("ok-2")),   // range + set violations
      (None, Some(200.0), Some("A"), None),              // null key + range violation
      (Some(3L), None, Some("Z"), Some("bad value")))    // set + regex violations
      .toDF("k", "price", "status", "tag")
    val out = Quality.expectations(df, Seq(
      Quality.NotNull("k"),
      Quality.InRange("price", 0, 100),
      Quality.InSet("status", Seq("A", "B")),
      Quality.MatchesRe("tag", "^ok-[0-9]$"),
      Quality.Unique("k")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out("not_null(k)") == ((4L, 1L, false)))
    // -5 and 200 out of [0,100]; NULL price skipped (NotNull's job)
    assert(out("in_range(price,0.0,100.0)") == ((4L, 2L, false)))
    assert(out("in_set(status,A|B)") == ((4L, 1L, false)))
    // "bad value" fails the pattern; NULL tag skipped
    assert(out("matches(tag,^ok-[0-9]$)") == ((4L, 1L, false)))
    // k=1 appears twice -> one duplicate beyond the first; null k ignored
    assert(out("unique(k)") == ((4L, 1L, false)))
    // all-clean table: every rule passes
    val clean = Quality.expectations(
      Seq((1L, 5.0)).toDF("k", "price"),
      Seq(Quality.NotNull("k"), Quality.InRange("price", 0, 10)))
      .collect().map(_.getBoolean(4))
    assert(clean.forall(identity))
    // two same-kind rules on one column (warn band + hard band) are a
    // legitimate suite — parameterized ids keep them distinct
    val bands = Quality.expectations(
      Seq((1L, 150.0), (2L, 1500.0)).toDF("k", "price"),
      Seq(Quality.InRange("price", 0, 100), Quality.InRange("price", 0, 1000)))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(bands == Map("in_range(price,0.0,100.0)" -> 2L,
      "in_range(price,0.0,1000.0)" -> 1L))
  }

  test("allocateProRata: exact sums, ±1 of proportional share, remainder placement") {
    // crafted: amount 10 over equal weights (1,1,1) -> bases 3+3+3, one
    // leftover cent to the lowest tie-break (all remainders equal)
    val eq = Seq((1L, 1, 1L, 10L), (1L, 2, 1L, 10L), (1L, 3, 1L, 10L))
      .toDF("g", "row_id", "w", "amt")
    val got = Relational.allocateProRata(eq, "g", "w", "amt", Seq("row_id"))
      .select("row_id", "alloc")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(1 -> 4L, 2 -> 3L, 3 -> 3L))
    // random groups: invariants hold everywhere
    val rng = new scala.util.Random(2024)
    val rows = (1 to 400).map { i =>
      (i % 17L, i, rng.nextInt(1000).toLong, 0L)
    }
    val amounts = rows.groupBy(_._1).map { case (g, rs) =>
      g -> (rs.map(_._3).sum / 7 + 1)
    }
    val df = rows.map { case (g, id, w, _) => (g, id, w, amounts(g)) }
      .toDF("g", "row_id", "w", "amt")
    val out = Relational.allocateProRata(df, "g", "w", "amt", Seq("row_id"))
      .select("g", "row_id", "w", "amt", "alloc")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    out.groupBy(_._1).foreach { case (g, rs) =>
      assert(rs.map(_._5).sum == amounts(g), s"group $g must sum exactly")
      val wTot = rs.map(_._3).sum.toDouble
      rs.foreach { case (_, id, w, amt, alloc) =>
        val exact = amt * w / wTot
        assert(math.abs(alloc - exact) <= 1.0 + 1e-9,
          s"group $g row $id: $alloc vs exact $exact")
      }
    }
  }
}
