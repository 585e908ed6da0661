package graft.ops

import graft._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operators (SURVEY.md §2.2-§2.7) realized over the
  * driver testdata star schema (FIXTURES.md §B maps each reference concept
  * onto these tables). All functions are pure DataFrame → DataFrame so unit
  * tests can feed in-memory frames.
  *
  * Scale posture: dimension sides (`nation`, `region`) are explicitly
  * broadcast; `customer`/`part` are left to AQE (auto-broadcast under the
  * threshold at test scale, shuffled-hash/sort-merge beyond). Fact-fact
  * joins key on the natural join column so Catalyst can reuse one shuffle
  * across stages. Production operators are sort-free — the driver-oracle's
  * deterministic ORDER BY lives in the SparkEntry wrappers only, so these
  * plans carry no global sort when used as pipeline stages (a full sort of
  * the fact table would be the scale bottleneck at 100 TB). The one
  * exception is `topProducts`, whose sort-limit IS the operator (it compiles
  * to TakeOrderedAndProject, not a full sort).
  */
object Relational {

  /** Pricing summary — the reference's multi-aggregate shape (A4 family:
    * reference order_processing_incremental.py:184-192) over lineitem:
    * grouped sums/averages/counts. TPC-H Q1 silhouette.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"), // integral doubles: exact
        sumMoney(col("l_extendedprice")).as("sum_base_price"),
        dec4(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))).as("sum_disc_price"),
        avg("l_quantity").as("avg_qty"),
        avgMoney(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))

  /** The flagship fact transform (reference:
    * order_processing_incremental.py:131-169): per-line-item grain (J1 —
    * lineitem IS the exploded items array, FIXTURES.md §B), left-join dim
    * enrichment with COALESCE defaults (J2/J3 + §2.7), date/hour derivation,
    * CASE region bucketing with membership predicates (P4), line totals.
    */
  def factEnrich(orders: DataFrame, lineitem: DataFrame, customer: DataFrame,
                 nation: DataFrame, region: DataFrame): DataFrame = {
    val tradeZone =
      when(col("r_name").isin("AMERICA", "EUROPE"), "WEST")
        .when(col("r_name").isin("ASIA", "MIDDLE EAST"), "EAST")
        .otherwise("OTHER")
    orders
      .join(lineitem, orders("o_orderkey") === lineitem("l_orderkey"))
      .join(customer, orders("o_custkey") === customer("c_custkey"), "left")
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"), "left")
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"), "left")
      .select(
        col("o_orderkey").as("order_id"),
        col("l_linenumber").as("line_no"),
        col("o_custkey").as("customer_id"),
        coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("customer_tier"),
        to_date(col("o_orderdate")).as("order_date"),
        month(col("o_orderdate")).as("order_month"),
        col("l_partkey").as("product_id"),
        col("l_quantity").as("quantity"),
        dec2(col("l_extendedprice")).as("line_total"),
        dec2(col("o_totalprice")).as("total_amount"),
        col("o_orderstatus").as("payment_status"),
        coalesce(col("n_name"), lit("NO NATION")).as("nation"),
        coalesce(col("r_name"), lit("NO REGION")).as("region"),
        tradeZone.as("trade_zone"))
  }

  /** Duplicate detection (A1/A2 — reference:
    * order_processing_incremental.py:84-88): GROUP BY key HAVING count>1.
    */
  def duplicates(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)

  /** Amount-mismatch check (A3/P3 — reference:
    * order_processing_incremental.py:96-124): recompute each order's total
    * from its line items and flag |calc - total| > 0.01. Line-item recompute
    * is a map-side-combinable partial aggregate keyed on the join key, so
    * the shuffle for the agg is reused by the join.
    */
  def amountMismatch(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val calc = lineitem.groupBy("l_orderkey")
      .agg(sumMoney(col("l_extendedprice")).as("calculated_total"))
    orders
      .join(calc, orders("o_orderkey") === calc("l_orderkey"))
      .filter(abs(col("calculated_total") - dec2(col("o_totalprice"))) > 0.01)
      .select(
        col("o_orderkey").as("order_id"),
        col("calculated_total"),
        dec2(col("o_totalprice")).as("total_amount"),
        dec2(abs(col("calculated_total") - dec2(col("o_totalprice")))).as("diff"))
  }

  /** Anti-join (J4 idempotency guard / J6 missing-reference shape —
    * reference: order_processing_incremental.py:165-168; README.md:127):
    * rows of `left` with no match in `right`.
    */
  def antiJoin(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String): DataFrame =
    left.join(right, left(leftKey) === right(rightKey), "left_anti")

  /** Inactive customers (J7 — reference README.md:112,141): customers whose
    * latest order predates the cutoff, or who never ordered. One shuffle
    * (group on o_custkey), then a broadcast-eligible join back to customer.
    */
  def inactiveCustomers(customer: DataFrame, orders: DataFrame, cutoffDate: String): DataFrame = {
    val lastOrder = orders.groupBy("o_custkey")
      .agg(max(to_date(col("o_orderdate"))).as("last_order_date"))
    customer
      .join(lastOrder, customer("c_custkey") === lastOrder("o_custkey"), "left")
      .filter(col("last_order_date").isNull || col("last_order_date") < to_date(lit(cutoffDate)))
      .select(col("c_custkey").as("customer_id"), col("c_name").as("name"),
        col("last_order_date"))
  }

  /** Hourly multi-aggregate (A4 — reference:
    * order_processing_incremental.py:184-192): TIMESTAMP_TRUNC(hour) bucket,
    * COUNT DISTINCT ids, SUM/AVG of the measure. Exact COUNT(DISTINCT) for
    * oracle parity; `hourlyMetricsApprox` is the 100 TB-scale variant.
    */
  def hourlyMetrics(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("metric_hour"))
      .agg(
        countDistinct(col("event_id")).as("total_events"),
        countDistinct(col("user_id")).as("unique_users"),
        sumMeasure(col("value")).as("total_value"),
        (sum(dec6(col("value"))).cast("double") / count(lit(1))).as("avg_value"))

  /** Scale variant of A4: HLL sketches instead of exact distincts — one
    * pass, no per-key distinct expansion; the drop-in choice at 100 TB.
    */
  def hourlyMetricsApprox(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("metric_hour"))
      .agg(
        approx_count_distinct(col("event_id")).as("total_events"),
        approx_count_distinct(col("user_id")).as("unique_users"),
        sumMeasure(col("value")).as("total_value"))

  /** Category revenue (A6 — reference README.md:135, agg_category_revenue
    * README.md:81): revenue per product category.
    */
  def categoryRevenue(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(part, lineitem("l_partkey") === part("p_partkey"))
      .groupBy(col("p_type").as("category"))
      .agg(sumMoney(col("l_extendedprice")).as("revenue"),
        sum("l_quantity").as("units_sold"))

  /** Average order value by customer tier (A7 — reference README.md:137). */
  def tierAov(orders: DataFrame, customer: DataFrame): DataFrame =
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"), "left")
      .groupBy(coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("customer_tier"))
      .agg(avgMoney(col("o_totalprice")).as("avg_order_value"),
        count(lit(1)).as("n_orders"))

  /** Geographic distribution (A8 — reference README.md:138): order count and
    * revenue by region with the CASE trade-zone bucketing (P4).
    */
  def geoDistribution(orders: DataFrame, customer: DataFrame,
                      nation: DataFrame, region: DataFrame): DataFrame =
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("r_name").as("region"))
      .agg(count(lit(1)).as("total_orders"),
        sumMoney(col("o_totalprice")).as("total_revenue"),
        countDistinct(col("o_custkey")).as("unique_customers"))

  /** Top-K selling products (W1 — reference README.md:136). Deterministic
    * tie-break on product_id. At scale the grouped aggregate is tiny
    * relative to the fact, so the global sort-limit is a TakeOrderedAndProject
    * (per-partition top-K + driver merge), not a full sort.
    */
  def topProducts(lineitem: DataFrame, part: DataFrame, k: Int = 10): DataFrame =
    lineitem
      .join(part, lineitem("l_partkey") === part("p_partkey"))
      .groupBy(col("p_partkey").as("product_id"), col("p_name").as("product_name"))
      .agg(sum("l_quantity").as("units_sold"),
        sumMoney(col("l_extendedprice")).as("revenue"))
      .orderBy(col("units_sold").desc, col("product_id"))
      .limit(k)

  /** Top-K rows per group (the W1 top-k generalized to per-partition
    * leaderboards — top docs per language, top products per category...).
    * Ranked with `row_number`, so `orderCols` should end in a unique
    * tie-break column for deterministic output.
    *
    * Scale shape: Spark ≥3.5 plans the rank-filter pattern as
    * WindowGroupLimit — each map task keeps only k rows per group BEFORE
    * the shuffle (asserted in RelationalSpec), so the exchange carries
    * O(groups · k), not the corpus.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   orderCols: Seq[Column], k: Int): DataFrame = {
    require(!df.columns.contains("rank"),
      "topKPerGroup emits a 'rank' column; input already has one — rename it first")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Pivoted event counts: one row per user-id bucket, one column per
    * event type. The explicit value list matters at scale: without it
    * Spark runs an extra distinct-collect job over the corpus just to
    * discover the columns.
    */
  def eventPivot(events: DataFrame, types: Seq[String],
                 buckets: Int = 10): DataFrame =
    events
      .withColumn("user_bucket", pmod(col("user_id"), lit(buckets)).cast("int"))
      .groupBy("user_bucket")
      .pivot("event_type", types)
      .agg(count(lit(1)))
      // a (bucket, type) combination with no rows pivots to NULL, but the
      // conditional-aggregation semantics (and the oracle) count it as 0
      .na.fill(0L, types)

  /** Region × category revenue with ROLLUP subtotals and a grouping id —
    * the grouping-sets family the reference lacks. One Expand + one
    * aggregate; subtotal rows shuffle with the same keys (NULL-padded),
    * so it stays a single exchange.
    */
  def revenueRollup(lineitem: DataFrame, part: DataFrame,
                    supplier: DataFrame, nation: DataFrame): DataFrame =
    groupedRevenue(lineitem, part, supplier, nation, _.rollup(_, _))

  /** Shared join chain + agg for the grouping-sets family; `group` picks
    * rollup vs cube so the two queries can never silently diverge.
    */
  private def groupedRevenue(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame, nation: DataFrame,
      group: (DataFrame, Column, Column) =>
        org.apache.spark.sql.RelationalGroupedDataset): DataFrame = {
    val joined = lineitem
      .join(broadcast(part), lineitem("l_partkey") === part("p_partkey"))
      .join(broadcast(supplier), lineitem("l_suppkey") === supplier("s_suppkey"))
      .join(broadcast(nation), supplier("s_nationkey") === nation("n_nationkey"))
    group(joined, col("n_name").as("nation"), col("p_type").as("category"))
      .agg(sumMoney(col("l_extendedprice")).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"),
        grouping_id().cast("int").as("grp"))
  }

  /** CUBE twin of [[revenueRollup]]: all four grouping sets — (nation,
    * category), (nation), (category), () — in one pass. Spark plans
    * grouping sets as a single Expand (one input scan multiplied per
    * set) + one aggregate; at scale prefer CUBE over unioning four
    * aggregations only when all marginals are actually consumed — Expand
    * multiplies shuffle volume by the set count.
    */
  def revenueCube(lineitem: DataFrame, part: DataFrame,
                  supplier: DataFrame, nation: DataFrame): DataFrame =
    groupedRevenue(lineitem, part, supplier, nation, _.cube(_, _))

  /** Mean and sample standard deviation from EXPLICIT exact sums —
    * sqrt((Σx² − (Σx)²/n) / (n−1)) evaluated as one double formula over
    * EXACT INTEGER sums of cent-scaled values, so both engines produce
    * bit-identical doubles. Two reasons for integers over decimals:
    * built-in stddev implementations differ in merge order across
    * engines, and wide-decimal → double conversion itself rounds
    * differently (Java correctly-rounded vs int128/scale two-step) —
    * measured a 1-ulp divergence on Σx². The 2-dp measure column scales
    * to int64 exactly; sums are map-side combinable, one shuffle.
    *
    * Domain contract: Σ(cents²) must fit int64 — |value| ≤ ~$3·10⁵ per
    * row at 10⁹ rows (Σ ≈ 9·10²⁰ would wrap silently in non-ANSI mode);
    * corpora of larger measures should pre-scale or run ANSI. Groups
    * with n = 1 report NULL stddev (the stddev_samp convention), not a
    * 0/0 NaN.
    */
  def valueStats(events: DataFrame): DataFrame = {
    val cents = round(col("value") * 100).cast("long")
    events
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(cents).as("sx"),
        sum(cents * cents).as("sxx"))
      .select(col("event_type"), col("n"),
        (col("sx").cast("double") / 100.0 / col("n")).as("mean"),
        when(col("n") > 1,
          sqrt((col("sxx").cast("double") / 10000.0 -
            (col("sx").cast("double") / 100.0) * (col("sx").cast("double") / 100.0)
              / col("n")) / (col("n") - lit(1)))).as("stddev"))
  }

  /** Trailing-7-DAY range-frame moving average — unlike the W2 row frame,
    * a RANGE frame spans calendar days even when some days have no rows
    * (a rows(-6,0) frame would silently widen its time span across
    * gaps). Ordering is days-since-epoch so the frame bound is numeric;
    * the average divides an exact decimal window sum by the window row
    * count (same policy as revenueTrend).
    */
  def rangeMovingAvg(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val daily = lineitem
      .join(broadcast(part), lineitem("l_partkey") === part("p_partkey"))
      .groupBy(col("p_type").as("category"), col("l_shipdate").as("ship_date"))
      .agg(sumMoney(col("l_extendedprice")).as("revenue"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("category")
      .orderBy(datediff(col("ship_date"), lit("1970-01-01").cast("date")))
      .rangeBetween(-6, 0)
    daily.select(col("category"), col("ship_date"),
      col("revenue").cast("double").as("revenue"),
      // cast the exact window sum to double BEFORE the division — the
      // oracle divides doubles, and decimal-division-then-cast rounds
      // differently (same policy as revenueTrend)
      (sum(col("revenue")).over(w).cast("double") / count(lit(1)).over(w))
        .as("revenue_ma7d"))
  }

  /** Shipping-priority report (TPC-H Q3 shape): unshipped revenue of a
    * market segment's orders as of a cutoff — a segment-filtered
    * customer⋈orders⋈lineitem three-way join, grouped per order, top-10
    * by revenue. Revenue is the discounted price summed through exact
    * decimals (engine-portable, order-independent).
    *
    * Scale: the segment filter prunes customer BEFORE the join (pushed to
    * the scan), the date filters prune both fact scans; customer⋈orders
    * hashes on custkey, the result ⋈lineitem on orderkey; the top-10
    * compiles to TakeOrderedAndProject — per-partition heaps, never a
    * global sort of the grouped result.
    */
  def shippingPriority(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, segment: String, cutoff: String): DataFrame =
    customer.filter(col("c_mktsegment") === segment)
      .join(orders.filter(col("o_orderdate") < lit(cutoff)),
        col("c_custkey") === col("o_custkey"))
      .join(lineitem.filter(col("l_shipdate") > lit(cutoff)),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dec4(sum(dec2(col("l_extendedprice")) *
        (lit(1) - dec2(col("l_discount"))))).as("revenue"))
      .select(col("l_orderkey").as("order_id"),
        col("revenue"),
        col("o_orderdate").cast("date").as("order_date"),
        col("o_orderpriority").as("priority"))

  /** Local-supplier volume (TPC-H Q5 shape): per-nation revenue where the
    * ordering customer and the line's supplier sit in the SAME nation of
    * one region, over one order-year. Exercises the six-way
    * dim-broadcast join chain plus a non-key equi-condition
    * (c_nationkey = s_nationkey) enforced inside the supplier join.
    *
    * Scale: region/nation/supplier are bounded dims → broadcast to the
    * fact chain; customer is fact-proportional and left to AQE
    * (auto-broadcast under the threshold, shuffled beyond — module
    * policy); the year filter prunes the orders scan at the source.
    */
  def localSupplierVolume(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, supplier: DataFrame, nation: DataFrame,
      region: DataFrame, regionName: String, yearStart: String,
      yearEnd: String): DataFrame =
    orders
      .filter(col("o_orderdate") >= lit(yearStart) &&
        col("o_orderdate") < lit(yearEnd))
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      // customer is fact-proportional in TPC-H — left to AQE (module
      // policy), unlike the bounded supplier/nation/region dims below
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(dec4(sum(dec2(col("l_extendedprice")) *
        (lit(1) - dec2(col("l_discount"))))).as("revenue"))

  /** Small-quantity order revenue (TPC-H Q17 shape): revenue from order
    * lines whose quantity sits below 0.2× their part's average quantity,
    * reported per brand as the classic avg-yearly figure (Σ price / 7).
    * This is the scalar CORRELATED-subquery pattern — `l_quantity <
    * 0.2 * (SELECT avg(l_quantity) ... WHERE l_partkey = p_partkey)` —
    * expressed the way decorrelation rewrites it: one per-part aggregate
    * joined back to the fact on the part key, never a per-row subquery
    * execution.
    *
    * Scale: the per-part average table is fact-keyed (millions of parts
    * at 100 TB) → shuffle_hash, never broadcast; both join sides arrive
    * partitioned on l_partkey (the aggregate's own shuffle), so AQE can
    * reuse the exchange. `part` is a bounded dim → broadcast for the
    * brand attach; the final group is brand-cardinality (25).
    *
    * Parity: fixture quantities are integral doubles — their sums are
    * exact in any order, so avg (one shared division) and the 0.2×
    * threshold (one shared multiply) are bit-identical cross-engine;
    * revenue routes through the exact-decimal money policy.
    */
  def smallQtyRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val avgQ = lineitem
      .groupBy(col("l_partkey").as("aq_partkey"))
      .agg((sum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
    lineitem
      .join(avgQ.hint("shuffle_hash"), col("l_partkey") === col("aq_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(
        count(lit(1)).as("n_small_lines"),
        (sumMoney(col("l_extendedprice")).cast("double") / lit(7.0))
          .as("avg_yearly"))
  }

  /** Ranking-function family over product revenue: dense_rank,
    * percent_rank ((rank−1)/(n−1), exact double), and revenue quartiles
    * via ntile(4). Total order (revenue desc, product_id) keeps every
    * rank deterministic and engine-portable.
    */
  def productRanks(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val revenue = lineitem
      .join(broadcast(part), lineitem("l_partkey") === part("p_partkey"))
      .groupBy(col("p_partkey").as("product_id"))
      .agg(sumMoney(col("l_extendedprice")).as("revenue"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("revenue").desc, col("product_id"))
    revenue.select(col("product_id"), col("revenue").cast("double").as("revenue"),
      dense_rank().over(w).as("drank"),
      percent_rank().over(w).as("prank"),
      ntile(4).over(w).as("quartile"))
  }

  /** Revenue trend with smoothing (W2 — reference README.md:114,143): daily
    * revenue per category over a trailing window, plus a 7-day moving
    * average. The moving average divides an exact decimal window sum by the
    * window row count — deterministic across engines.
    */
  def revenueTrend(lineitem: DataFrame, part: DataFrame, fromDate: String): DataFrame = {
    // broadcast(part) EXPLICIT (r18): this was the one part-dim join in
    // the family left to the planner's size estimate — every sibling
    // (productRanks, smallQtyRevenue, topProducts) pins it. The r17
    // driver box ran this query at ~2.95 s vs 0.21 s settled with no
    // code diff anywhere near it; an estimate-driven broadcast-miss
    // (SortMergeJoin flip shuffling lineitem) is the one plan-level
    // mechanism that reproduces that signature, and the hint removes
    // the estimate from the decision on every box.
    val daily = lineitem
      .filter(col("l_shipdate") >= to_date(lit(fromDate)))
      .join(broadcast(part), lineitem("l_partkey") === part("p_partkey"))
      .groupBy(col("p_type").as("category"), to_date(col("l_shipdate")).as("ship_date"))
      .agg(sumMoney(col("l_extendedprice")).as("revenue"))
    val w = Window.partitionBy("category").orderBy("ship_date").rowsBetween(-6, 0)
    daily
      .withColumn("revenue_ma7",
        sum(col("revenue")).over(w).cast("double") / count(lit(1)).over(w))
  }

  /** MERGE semantics (J5/S5 — reference:
    * order_processing_incremental.py:182-204): combine a target aggregate
    * with a source delta keyed on metric_hour; MATCHED → additive update,
    * NOT MATCHED → insert. Realized as a full-outer join + per-column
    * coalesce — the pure-Spark upsert. (The pipeline's physical sink uses
    * dynamic partition overwrite instead; see pipeline.Incremental.)
    */
  def mergeHourly(target: DataFrame, source: DataFrame): DataFrame = {
    val t = target.select(col("metric_hour").as("t_hour"),
      col("total_events").as("t_events"), col("total_value").as("t_value"))
    val s = source.select(col("metric_hour").as("s_hour"),
      col("total_events").as("s_events"), col("total_value").as("s_value"))
    t.join(s, t("t_hour") === s("s_hour"), "full_outer")
      .select(
        coalesce(col("t_hour"), col("s_hour")).as("metric_hour"),
        (coalesce(col("t_events"), lit(0L)) + coalesce(col("s_events"), lit(0L))).as("total_events"),
        dec6(coalesce(col("t_value"), lit(0)) + coalesce(col("s_value"), lit(0))).as("total_value"))
  }

  /** Largest-remainder pro-rata allocation — split a per-group integer
    * amount across the group's rows proportionally to a weight, such that
    * the parts SUM EXACTLY to the amount (the invariant naive
    * `round(amount·w/W)` violates): rebate across line items, cost across
    * cost centers, budget across partitions. Each row gets
    * `floor(amount·w_i / W)`; the leftover cents (always < group size) go
    * one each to the rows with the largest integer remainders
    * `(amount·w_i) mod W`, tie-broken by `tieBreak` — Hamilton's method,
    * entirely in integer arithmetic, so the result is deterministic and
    * bit-identical cross-engine by construction (no floating point
    * anywhere). Every part is within 1 unit of its exact proportional
    * share.
    *
    * Inputs: `weightCol`/`amountCol` are integer columns (amounts in
    * cents per the money policy), `amountCol` constant within each group,
    * weights ≥ 0 with a positive group sum. Caller keeps
    * `amount · max(W)` inside Long (at cents scale that allows
    * trillion-dollar groups).
    *
    * Shape: ONE group shuffle — the group-sum windows and the remainder
    * rank share the same partitioning, so Catalyst plans a single
    * Exchange (+ one sort for the rank).
    */
  def allocateProRata(df: DataFrame, groupCol: String, weightCol: String,
                      amountCol: String, tieBreak: Seq[String]): DataFrame = {
    require(tieBreak.nonEmpty, "allocateProRata needs tie-break columns")
    val wg = Window.partitionBy(groupCol)
    val rk = Window.partitionBy(groupCol)
      .orderBy(col("_rem").desc +: tieBreak.map(col(_).asc): _*)
    df.withColumn("_W", sum(col(weightCol)).over(wg))
      .withColumn("_base", expr(s"($amountCol * $weightCol) div _W"))
      .withColumn("_rem", expr(s"($amountCol * $weightCol) % _W"))
      .withColumn("_used", sum(col("_base")).over(wg))
      .withColumn("_rank", row_number().over(rk))
      .withColumn("alloc",
        col("_base") + when(col("_rank") <= col(amountCol) - col("_used"), 1L)
          .otherwise(0L))
      .drop("_W", "_base", "_rem", "_used", "_rank")
  }

  /** Keyed snapshot diff — the CDC primitive behind "what changed between
    * yesterday's landed table and today's?": every key classified as
    * added (new only), removed (old only), changed (present in both with
    * some compared column differing), or unchanged. Comparison is
    * null-safe per column (NULL → NULL is unchanged, NULL → value is a
    * change), so schema-nullable columns diff correctly.
    *
    * Shape: ONE key-partitioned shuffle (the full-outer sort-merge join —
    * at 100 TB the two snapshots of the same table co-locate for free
    * when written bucketed by the key, planning zero Exchange; see
    * Distribution.writeBucketed). Presence flags are literals attached
    * before the join, never an `isNull` probe on data columns — a
    * legitimately-NULL row can't masquerade as absent.
    *
    * Output: key columns, change_type, and each compared column as an
    * (old_`c`, new_`c`) pair.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && compareCols.nonEmpty,
      "snapshotDiff needs key and compare columns")
    val o = oldDf.select((keys.map(col) ++
      compareCols.map(c => col(c).as(s"old_$c")) :+
      lit(true).as("__in_old")): _*)
    val n = newDf.select((keys.map(col) ++
      compareCols.map(c => col(c).as(s"new_$c")) :+
      lit(true).as("__in_new")): _*)
    val differs = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(differs, lit("changed"))
          .otherwise(lit("unchanged")))
      .drop("__in_old", "__in_new")
  }
}
