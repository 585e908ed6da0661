package graft

import graft.ops.Profile

/** Profiler semantics: null/distinct accounting, histogram bin edges and
  * completeness, and median/MAD robustness on hand-built tables.
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: nulls, exact distincts, numeric-only min/max, one row per column") {
    val df = Seq(
      (1L, Some(2.0), Some("a")),
      (2L, Some(2.0), None),
      (3L, None, Some("b")),
      (4L, Some(8.0), Some("a")))
      .toDF("id", "v", "s")
    val out = Profile.profile(df)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)), Option(r.get(5)))))
      .toMap
    assert(out.keySet == Set("id", "v", "s"))
    assert(out("id") == ((4L, 0L, 4L, Some(1.0), Some(4.0))))
    // countDistinct skips nulls (2.0, 8.0); min/max skip the null too
    assert(out("v") == ((4L, 1L, 2L, Some(2.0), Some(8.0))))
    // string column: no numeric range
    assert(out("s") == ((4L, 1L, 2L, None, None)))
  }

  test("histogram: dense bins, max lands in the last bin, half-open edges") {
    // values 0..10 over 5 bins of width 2: bin 0 gets {0,1}, ..., bin 4
    // gets {8,9,10} (right edge inclusive only at the top)
    val df = (0 to 10).map(_.toDouble).toDF("x")
    val out = Profile.histogram(df, "x", nBins = 5)
      .collect()
      .map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(out.keySet == Set(0, 1, 2, 3, 4), "every bin present")
    assert(out(0) == ((0.0, 2.0, 2L)) && out(1) == ((2.0, 4.0, 2L)))
    assert(out(4) == ((8.0, 10.0, 3L)), "max value joins the last bin")
  }

  test("histogram: empty bins zero-filled; constant column collapses to bin 0") {
    val gappy = Seq(0.0, 0.1, 9.9, 10.0).toDF("x")
    val out = Profile.histogram(gappy, "x", nBins = 10)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(out(0) == 2L && out(9) == 2L)
    assert((1 to 8).forall(out(_) == 0L), "middle bins present as zeros")
    val const = Seq(5.0, 5.0, 5.0).toDF("x")
    val c = Profile.histogram(const, "x", nBins = 4)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(c == Map(0 -> 3L, 1 -> 0L, 2 -> 0L, 3 -> 0L))
  }

  test("histogramEquiDepth: uniform column splits into equal-count bins") {
    val df = (1 to 10).map(_.toDouble).toDF("x")
    val out = Profile.histogramEquiDepth(df, "x", nBins = 5)
      .orderBy("bin")
      .collect()
      .map(r => (r.getInt(0), Option(r.get(1)), Option(r.get(2)), r.getLong(3)))
      .toSeq
    // thresholds at rank ceil(p*10): 2, 4, 6, 8; ties to the lower bin
    assert(out == Seq(
      (0, None, Some(2.0), 2L),
      (1, Some(2.0), Some(4.0), 2L),
      (2, Some(4.0), Some(6.0), 2L),
      (3, Some(6.0), Some(8.0), 2L),
      (4, Some(8.0), None, 2L)))
  }

  test("histogramEquiDepth: heavy ties collapse into lower bins, grid stays dense") {
    // 7 of 9 values equal: every threshold is 5.0, so nothing exceeds a
    // LOWER threshold subset distinctly — ties all land in bin 0, the
    // two larger values in the last bin (all 3 thresholds < them).
    val df = Seq(5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 7.0, 9.0).toDF("x")
    val out = Profile.histogramEquiDepth(df, "x", nBins = 4)
      .orderBy("bin")
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(out == Map(0 -> 7L, 1 -> 0L, 2 -> 0L, 3 -> 2L))
    // nulls excluded from both thresholds and counts
    val withNulls = Seq(Some(1.0), None, Some(2.0), Some(3.0), Some(4.0))
      .toDF("x")
    val n = Profile.histogramEquiDepth(withNulls, "x", nBins = 2)
      .agg(org.apache.spark.sql.functions.sum("n")).as[Long].head()
    assert(n == 4L)
  }

  test("property: equi-depth counts conserve rows, edges are column elements") {
    val rng = new scala.util.Random(31)
    (0 until 5).foreach { i =>
      val n = 5 + rng.nextInt(200)
      val vals = Seq.fill(n)(math.floor(rng.nextDouble() * 50) / 2.0)
      val bins = 2 + rng.nextInt(6)
      val out = Profile.histogramEquiDepth(vals.toDF("x"), "x", nBins = bins)
        .collect()
        .map(r => (r.getInt(0), Option(r.get(1)), Option(r.get(2)), r.getLong(3)))
      assert(out.length == bins, s"grid not dense: $out")
      assert(out.map(_._4).sum == n, s"counts don't conserve rows (seed $i)")
      val elems = vals.toSet
      out.flatMap(r => r._2.toSeq ++ r._3.toSeq).foreach(e =>
        assert(elems.contains(e.asInstanceOf[Double]),
          s"edge $e is not a column element (seed $i)"))
    }
  }

  test("histogramDrift: aligned bins, shares, TV and chi2 terms; empty-old bin is null chi2") {
    // old: uniform over [0,10); new: mass shifted into the top bin plus
    // a value beyond old's range (bounds come from the UNION)
    val oldDf = (0 until 10).map(_.toDouble).toDF("x")
    val newDf = (Seq.fill(8)(19.0) ++ Seq(1.0, 3.0)).toDF("x")
    val out = Profile.histogramDrift(oldDf, newDf, "x", nBins = 2)
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(3), r.getLong(4), r.getDouble(5),
        r.getDouble(6), r.getDouble(7), Option(r.get(8)))))
      .toMap
    // union bounds [0, 19], 2 bins of width 9.5: old all in bin 0
    val (nOld0, nNew0, pOld0, pNew0, tv0, chi0) = out(0)
    assert(nOld0 == 10L && nNew0 == 2L)
    assert(pOld0 == 1.0 && pNew0 == 0.2 && tv0 == 0.8)
    assert(chi0.contains(0.8 * 0.8 / 1.0))
    val (nOld1, nNew1, pOld1, pNew1, tv1, chi1) = out(1)
    assert(nOld1 == 0L && nNew1 == 8L && pOld1 == 0.0 && pNew1 == 0.8)
    assert(tv1 == 0.8 && chi1.isEmpty, "empty old bin: chi2 undefined, not Inf")
  }

  test("madOutliers: whale value flags, median/MAD unmoved by the outlier") {
    // group a: 9 values around 10 (MAD 1), one whale at 1000
    val a = Seq(8.0, 9.0, 9.0, 10.0, 10.0, 10.0, 11.0, 11.0, 12.0, 1000.0)
      .zipWithIndex.map { case (v, i) => (i.toLong, "a", v) }
    // group b: all identical -> MAD 0 -> null scores, nothing flags
    val b = (20 to 23).map(i => (i.toLong, "b", 7.0))
    val df = (a ++ b).toDF("id", "grp", "v")
    val out = Profile.madOutliers(df, "v", "grp", k = 3.5)
      .collect()
      .map(r => r.getLong(1) -> ((r.getDouble(3), r.getDouble(4),
        Option(r.get(5)), r.getBoolean(6))))
      .toMap
    // discrete median of 10 values = 5th smallest = 10; MAD = 1
    val (med, mad, zWhale, flagged) = out(9L)
    assert(med == 10.0 && mad == 1.0)
    assert(zWhale.contains(990.0) && flagged, "whale must flag")
    assert(!out(0L)._4 && !out(3L)._4, "inliers must not flag")
    // zero-MAD group: null scores, never flagged, never ±Inf
    val (medB, madB, zB, flaggedB) = out(20L)
    assert(medB == 7.0 && madB == 0.0 && zB.isEmpty && !flaggedB)
  }
}
