package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Dataset profiling — the "what is in this table?" pass a pipeline runs
  * before trusting a new source: per-column null/distinct/range stats,
  * value histograms, and robust (median/MAD) outlier scoring. The
  * reference's quality framework stops at row-level checks
  * (order_processing_incremental.py:79-124); these are the table-level
  * companions, built as single aggregates so profiling 100 TB costs a
  * scan, not a job per column.
  */
object Profile {

  /** One-pass per-column profile: row count, null count, exact distinct
    * count, and numeric min/max (NULL for non-numeric columns). All
    * columns are profiled in ONE aggregate — the multi-countDistinct
    * plans a single Expand (rows × profiled columns) and one shuffle,
    * not a job per column. At 100 TB swap exact distincts for
    * `approx_count_distinct` (HLL, engine-specific estimates — the
    * hourly-approx trade) if the Expand multiplication bites; nulls and
    * min/max stay exact either way.
    *
    * Output: (col_name, n_rows, n_nulls, n_distinct, min_num, max_num),
    * one row per profiled column (`col_name`, not `column` — COLUMN is a
    * reserved word in ANSI engines the oracle runs on).
    */
  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val cs = if (cols.nonEmpty) cols else df.columns.toSeq
    def numeric(c: String): Boolean =
      df.schema(c).dataType.isInstanceOf[NumericType]
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cs.flatMap { c =>
      val v = col(c)
      val (mn, mx) =
        if (numeric(c)) (min(v).cast("double"), max(v).cast("double"))
        else (lit(null).cast("double"), lit(null).cast("double"))
      Seq(
        sum(when(v.isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        countDistinct(v).as(s"__distinct_$c"),
        mn.as(s"__min_$c"), mx.as(s"__max_$c"))
    }
    val packed = cs.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__distinct_$c").as("n_distinct"),
        col(s"__min_$c").as("min_num"), col(s"__max_$c").as("max_num"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(packed: _*)).as("p"))
      .select(col("p.*"))
  }

  /** Equi-width histogram with zero-filled bins: `nBins` buckets over the
    * exact [min, max] of `valueCol`, every bin present even when empty
    * (the gapFill property — downstream charting and drift comparison
    * need aligned, dense bins). The max value lands in the LAST bin
    * (right edge inclusive there, half-open elsewhere).
    *
    * Bin assignment is one shared IEEE double tree (subtract, divide,
    * floor — all correctly rounded), so bucket membership is
    * bit-identical cross-engine. A constant column (min = max) puts
    * every row in bin 0.
    *
    * Shape: one 1-row bounds aggregate broadcast over the scan (the
    * corpus-side cross join has a single-row build — the
    * q_distinct_terms pattern), one map-side-combinable bin count, and a
    * constant-size bin grid left join to restore empty bins.
    */
  def histogram(df: DataFrame, valueCol: String, nBins: Int = 10): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    val v = col(valueCol).cast("double")
    val bounds = df.filter(v.isNotNull)
      .agg(min(v).as("lo"), max(v).as("hi"))
    val counts = binCounts(df, valueCol, nBins, bounds)
    binGrid(bounds, nBins).join(counts, Seq("bin"), "left")
      .select(col("bin"), col("bin_lo"), col("bin_hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Shared bin assignment: one corpus×1-row bounds broadcast, one
    * map-side-combinable count keyed on the bin id.
    */
  private def binCounts(df: DataFrame, valueCol: String, nBins: Int,
                        bounds: DataFrame): DataFrame = {
    val v = col(valueCol).cast("double")
    val width = (col("hi") - col("lo")) / lit(nBins.toDouble)
    val bin = when(col("hi") === col("lo"), lit(0))
      .otherwise(least(floor((v - col("lo")) / width), lit(nBins - 1.0)))
      .cast("int")
    df.filter(v.isNotNull)
      .crossJoin(broadcast(bounds)) // corpus x 1-row build: constant-size
      .select(bin.as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
  }

  /** Dense bin grid with edges; the max value's bin closes at `hi`. */
  private def binGrid(bounds: DataFrame, nBins: Int): DataFrame = {
    val width = (col("hi") - col("lo")) / lit(nBins.toDouble)
    bounds
      .select(explode(sequence(lit(0), lit(nBins - 1))).as("bin"),
        col("lo"), col("hi"))
      .select(col("bin"),
        (col("lo") + col("bin").cast("double") * width).as("bin_lo"),
        when(col("bin") === nBins - 1, col("hi"))
          .otherwise(col("lo") + (col("bin") + 1).cast("double") * width)
          .as("bin_hi"))
  }

  /** Equi-DEPTH histogram — quantile binning, the partner of the
    * equi-width [[histogram]]: `nBins` buckets each holding ~1/nBins of
    * the rows, the form monotone-feature binning and heavy-tailed metric
    * dashboards want (one whale stretches an equi-width grid into
    * nothing-bins; equi-depth absorbs it). Boundaries are DISCRETE
    * quantiles — actual column elements at rank ⌈p·n⌉, the
    * quantileGate / madOutliers convention, verified rank-identical to
    * the oracle engine's quantile_disc across n and p — so bucket edges
    * are bit-portable, and past `accuracy` the same expression degrades
    * into the mergeable sketch instead of buffering the column.
    *
    * Bin membership: row v lands in bin = #{thresholds t < v} — ties sit
    * in the LOWER bin, so duplicate-heavy columns may leave later bins
    * empty (they still appear, zero-filled: the dense-grid property).
    * bin_lo/bin_hi are the enclosing thresholds, NULL at the open ends.
    *
    * Shape: one quantile aggregate (mergeable sketch at scale), the
    * 1-row threshold array broadcast over the scan, one
    * map-side-combinable bin count, and a constant-size grid join — the
    * equi-width histogram's plan with the bounds row swapped for a
    * threshold array.
    */
  def histogramEquiDepth(df: DataFrame, valueCol: String, nBins: Int = 10,
                         accuracy: Int = 10000): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val v = col(valueCol).cast("double")
    val qs = (1 until nBins).map(i => i.toDouble / nBins)
    val th = df.filter(v.isNotNull)
      .agg(expr(s"approx_percentile(CAST($valueCol AS DOUBLE), " +
        s"array(${qs.mkString(", ")}), $accuracy)").as("th"))
    val counts = df.filter(v.isNotNull)
      .crossJoin(broadcast(th)) // corpus x 1-row thresholds: constant-size
      .select(size(filter(col("th"), e => v > e)).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
    th.select(explode(sequence(lit(0), lit(nBins - 1))).as("bin"), col("th"))
      .join(counts, Seq("bin"), "left")
      .select(col("bin"),
        when(col("bin") >= 1, element_at(col("th"), col("bin"))).as("bin_lo"),
        when(col("bin") < nBins - 1, element_at(col("th"), col("bin") + 1))
          .as("bin_hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Distribution drift between two snapshots of the same metric — the
    * "did yesterday's corpus look like today's?" check a curation
    * pipeline runs before trusting a refreshed source. Both snapshots
    * are binned on ONE shared grid (bounds from their union, so the
    * comparison is aligned by construction), then each bin reports both
    * counts, both shares, the share drift |p_new − p_old| (sum/2 =
    * total variation distance), and the χ² term (p_new − p_old)²/p_old
    * (NULL where the old side is empty — no Laplace smoothing baked in).
    * Everything after the integer counts is division/multiplication on
    * one shared tree — bit-portable; deliberately NOT PSI, whose ln()
    * is a transcendental (the recorded parity rule).
    *
    * Shape: one union-wide bounds aggregate and two map-side-combinable
    * bin counts over the scans; the grid join and 1-row totals
    * broadcast are constant-size.
    */
  def histogramDrift(oldDf: DataFrame, newDf: DataFrame, valueCol: String,
                     nBins: Int = 10): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    val v = col(valueCol).cast("double")
    val bounds = oldDf.select(v.as("x"))
      .unionByName(newDf.select(v.as("x")))
      .filter(col("x").isNotNull)
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    val o = binCounts(oldDf, valueCol, nBins, bounds)
      .withColumnRenamed("n", "n_old")
    val n = binCounts(newDf, valueCol, nBins, bounds)
      .withColumnRenamed("n", "n_new")
    val joined = binGrid(bounds, nBins)
      .join(o, Seq("bin"), "left").join(n, Seq("bin"), "left")
      .select(col("bin"), col("bin_lo"), col("bin_hi"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    val totals = joined.agg(sum(col("n_old")).as("tot_old"),
      sum(col("n_new")).as("tot_new"))
    val pOld = col("n_old").cast("double") / col("tot_old").cast("double")
    val pNew = col("n_new").cast("double") / col("tot_new").cast("double")
    joined.crossJoin(broadcast(totals)) // nBins x 1-row: constant-size
      .select(col("bin"), col("bin_lo"), col("bin_hi"),
        col("n_old"), col("n_new"),
        pOld.as("p_old"), pNew.as("p_new"),
        abs(pNew - pOld).as("share_drift"),
        when(pOld > 0d, (pNew - pOld) * (pNew - pOld) / pOld).as("chi2_term"))
  }

  /** Robust per-group outlier scoring via median/MAD — the
    * distribution-free alternative to z-scores when the metric has heavy
    * tails (one whale order would inflate a mean/stddev gate into
    * uselessness; the median and MAD barely move). Flags rows whose
    * |value − median| exceeds `k` × MAD of their group.
    *
    * Both medians are DISCRETE quantiles (actual group elements, rank
    * ⌈n/2⌉ — the quantileGate convention): element identity makes the
    * scores bit-portable cross-engine where interpolated midpoints of
    * arbitrary doubles could diverge in the last ulp, and past
    * `accuracy` the same expression degrades into the mergeable t-digest
    * sketch instead of buffering the group. A zero-MAD group (over half
    * the group at the median) yields NULL scores, never ±∞.
    *
    * Shape: two aggregate passes (median of values, then median of
    * absolute deviations), each a map-side-combinable sketch at scale;
    * per-group results broadcast back over the scan. No per-group
    * window over the corpus.
    */
  def madOutliers(df: DataFrame, valueCol: String, byCol: String,
                  k: Double = 3.5, accuracy: Int = 10000): DataFrame = {
    val v = col(valueCol).cast("double")
    val med = df.groupBy(col(byCol))
      .agg(expr(s"approx_percentile(CAST($valueCol AS DOUBLE), 0.5, $accuracy)")
        .as("med"))
    val withMed = df.join(broadcast(med), Seq(byCol))
      .withColumn("abs_dev", abs(v - col("med")))
    val mad = withMed.groupBy(col(byCol))
      .agg(expr(s"approx_percentile(abs_dev, 0.5, $accuracy)").as("mad"))
    withMed.join(broadcast(mad), Seq(byCol))
      .withColumn("robust_z",
        when(col("mad") > 0d, col("abs_dev") / col("mad")))
      .withColumn("is_outlier",
        coalesce(col("robust_z") > k, lit(false)))
      .drop("abs_dev")
  }
}
