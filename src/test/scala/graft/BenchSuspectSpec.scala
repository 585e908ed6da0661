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
}
