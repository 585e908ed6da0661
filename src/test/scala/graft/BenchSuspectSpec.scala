package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's derived taint flags (r16): pure-function checks
  * of Bench.suspectsOf — the post-hoc detector for same-query
  * co-inflation that min-of-reps and the probe ladder both miss.
  */
class BenchSuspectSpec extends AnyFunSuite {

  private def q(name: String, reps: Double*)
      : (String, Double, Option[String], Seq[Double]) =
    (name, reps.min, None, reps.toSeq)

  // clean endpoint probes around a 4-query run
  private def cleanProbes(n: Int) = Seq((0, 0.2), (n, 0.22))

  test("a clean run flags nothing") {
    val rs = Seq(q("a", 1.0, 1.1), q("b", 0.5, 0.52), q("c", 2.0, 2.3))
    assert(Bench.suspectsOf(rs, cleanProbes(3)).isEmpty)
  }

  test("rep-spread: best two reps outside the settle band flag the " +
    "query even when every probe is clean") {
    // 4 reps, best two 1.0 vs 1.6 > 1.0*1.4+0.05 — never settled
    val rs = Seq(q("a", 1.0, 1.1), q("bad", 2.1, 1.6, 1.9, 1.0))
    val got = Bench.suspectsOf(rs, cleanProbes(2)).toMap
    assert(got == Map("bad" -> "rep-spread"))
  }

  test("hot-window: an elevated probe indicts every query in the " +
    "windows it bounds; queries between two clean probes are acquitted") {
    // probes at 0 (clean), 2 (clean), 4 (HOT): queries 0-1 sit between
    // two clean probes — acquitted; queries 2-3's window is closed by
    // the hot probe — contention may have started anywhere inside it
    val rs = Seq(q("q0", 1.0, 1.0), q("q1", 1.0, 1.0),
      q("q2", 1.0, 1.0), q("q3", 1.0, 1.0))
    val probes = Seq((0, 0.2), (2, 0.21), (4, 1.5))
    val got = Bench.suspectsOf(rs, probes).toMap
    assert(got == Map("q2" -> "hot-window", "q3" -> "hot-window"),
      s"got $got")
  }

  test("rep-spread outranks hot-window; errored queries are never flagged") {
    val rs = Seq(
      ("err", -1.0, Some("boom"), Seq(9.0, 1.0)),
      q("spread", 1.0, 2.0))
    val probes = Seq((0, 5.0), (2, 5.1)) // everything is a hot window
    val got = Bench.suspectsOf(rs, probes).toMap
    assert(got == Map("spread" -> "rep-spread"), s"got $got")
  }

  test("the absolute floor keeps sub-50ms probe jitter from flagging " +
    "a fast box") {
    // median 0.01, worst probe 0.05: 0.05 <= 2*0.01 + 0.05 — not hot
    val rs = Seq(q("a", 1.0, 1.0))
    assert(Bench.suspectsOf(rs, Seq((0, 0.01), (1, 0.05))).isEmpty)
  }

  test("level-shift: co-inflated reps that fooled rep-spread and a " +
    "clean probe window still flag against the committed reference") {
    // the r16 q_dup_spans shape VERBATIM: official reps 4.68/6.28
    // (inside the 1.4x settle band: 6.28 <= 4.68*1.4+0.05 = 6.602),
    // clean probes — the r16 artifact shipped this row unflagged
    val blind = Seq(q("q_dup_spans", 4.68, 6.28), q("q_ok", 1.5, 1.55))
    assert(Bench.suspectsOf(blind, cleanProbes(2)).isEmpty,
      "the window heuristics must be blind to this shape")
    val ref = Map("q_dup_spans" -> 1.46, "q_ok" -> 1.5)
    val got = Bench.levelShiftsOf(blind, ref).toMap
    assert(got == Map("q_dup_spans" -> "level-shift(ref=1.46s)"),
      s"got $got")
    // the defaults must catch ALL FOUR adjudicated r16 taint rows
    val r16 = Seq(q("q_dup_spans", 4.68, 6.28), q("q_edit_incr", 4.76, 4.9),
      q("q_kmeans_sweep", 2.73, 2.8), q("q_contain_recall", 2.70, 2.75))
    val r16ref = Map("q_dup_spans" -> 1.46, "q_edit_incr" -> 1.50,
      "q_kmeans_sweep" -> 1.45, "q_contain_recall" -> 1.36)
    assert(Bench.levelShiftsOf(r16, r16ref).size == 4,
      "every adjudicated r16 taint row must flag at the defaults")
  }

  test("level-shift: new queries (absent from the reference), errored " +
    "queries, and sub-floor drifts are never flagged") {
    val rs = Seq(
      q("q_new", 9.0, 9.1), // not in ref
      ("q_err", -1.0, Some("boom"), Seq(9.0, 9.0)),
      q("q_small", 0.45, 0.46), // 0.45 <= 0.2*1.5+0.2 — floor guards it
      q("q_fine", 1.95, 2.0)) // 1.95 <= 1.2*1.5+0.2
    val ref = Map("q_err" -> 0.5, "q_small" -> 0.2, "q_fine" -> 1.2)
    assert(Bench.levelShiftsOf(rs, ref).isEmpty)
  }

  test("referenceMins: parses this repo's committed artifact shape, " +
    "rejects a different sf or cpus config, and survives a missing file") {
    val dir = java.nio.file.Files.createTempDirectory("benchref")
    val p = dir.resolve("ref.json")
    java.nio.file.Files.writeString(p,
      """{"total_sec":174.273,"sf":"sf0.1","cpus":32,"failures":0,""" +
        """"cal_ladder_before_query":{"q_x":0.279},""" +
        """"queries_ms_precision":{"q_a":0.354,"q_b":2.77},""" +
        """"queries_reps":{"q_a":[0.354,0.41]},"suspect":{}}""")
    assert(Bench.referenceMins(p.toString, "sf0.1", "32") ==
      Map("q_a" -> 0.354, "q_b" -> 2.77))
    assert(Bench.referenceMins(p.toString, "sf0.01", "32").isEmpty,
      "a reference at another scale is not a level control")
    assert(Bench.referenceMins(p.toString, "sf0.1", "8").isEmpty,
      "a reference from another cpu config is not a level control")
    assert(Bench.referenceMins(dir.resolve("nope.json").toString,
      "sf0.1", "32").isEmpty)
  }
}
