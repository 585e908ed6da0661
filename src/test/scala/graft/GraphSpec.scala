package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

/** Link-graph authority: the integer-mass rounds must match a scalar
  * in-memory replay EXACTLY (that is the whole design claim — integer
  * sums are order-independent, so any partitioning reproduces the same
  * masses), dangling mass must redistribute, and the audit must census
  * the graph the rounds will see.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Scalar reference replay of Graph.linkRank's documented arithmetic
    * (Long floor division throughout, non-negative operands).
    */
  private def naiveRank(nodes: Seq[Long], edges: Seq[(Long, Long, Long)],
                        iters: Int, base: Long, dampNum: Long,
                        dampDen: Long): Map[Long, Long] = {
    val outW = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val teleport = (dampDen - dampNum) * base / dampDen
    var mass = nodes.map(_ -> base).toMap
    for (_ <- 1 to iters) {
      val in = scala.collection.mutable.Map.empty[Long, Long]
      for ((s, d, w) <- edges)
        in(d) = in.getOrElse(d, 0L) + mass(s) * w / outW(s)
      val dang = nodes.filter(n => !outW.contains(n)).map(mass).sum
      val share = dang / nodes.size
      mass = nodes.map { n =>
        n -> (teleport + dampNum * (in.getOrElse(n, 0L) + share) / dampDen)
      }.toMap
    }
    mass
  }

  private val nodes = (1L to 7L).toSeq
  // 7 is dangling (no out-edges); 6 is isolated (no edges at all);
  // 3 is the hub everyone cites.
  private val edges = Seq(
    (1L, 3L, 2L), (2L, 3L, 1L), (4L, 3L, 1L), (5L, 3L, 3L),
    (1L, 2L, 1L), (3L, 1L, 1L), (3L, 4L, 1L), (5L, 7L, 1L))

  private def run(iters: Int): Map[Long, Long] =
    Graph.linkRank(
      nodes.toDF("node"),
      edges.toDF("src", "dst", "weight"),
      iters = iters, base = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("linkRank equals the scalar integer replay exactly, per round count") {
    for (iters <- Seq(1, 3, 5)) {
      val got = run(iters)
      val want = naiveRank(nodes, edges, iters, 1000000L, 85L, 100L)
      assert(got == want, s"iters=$iters")
    }
    CacheScope.release(spark)
  }

  test("linkRank is partitioning-invariant (integer sums commute)") {
    val skewed = Graph.linkRank(
      nodes.toDF("node").repartition(7),
      edges.toDF("src", "dst", "weight").repartition(1),
      iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(skewed == naiveRank(nodes, edges, 3, 1000000L, 85L, 100L))
    CacheScope.release(spark)
  }

  test("dangling and isolated nodes keep teleport-floor mass; hub ranks first") {
    val m = run(4)
    CacheScope.release(spark)
    // teleport grant is the floor of every node's mass
    val teleport = (100L - 85L) * 1000000L / 100L
    assert(m.values.forall(_ >= teleport))
    // the isolated node receives only teleport + its dangling share
    assert(m(6L) < m(3L))
    // the cited hub carries the most mass
    assert(m.maxBy(_._2)._1 == 3L)
    // floor rounding only leaks mass: conserved total never exceeds n·base
    assert(m.values.sum <= nodes.size * 1000000L)
  }

  test("degreeAudit censuses nodes, edges, dangling, and hub share") {
    val row = Graph.degreeAudit(
      nodes.toDF("node"), edges.toDF("src", "dst", "weight"))
      .collect().head
    assert(row.getLong(row.fieldIndex("n_nodes")) == 7L)
    assert(row.getLong(row.fieldIndex("n_edges")) == 8L)
    assert(row.getLong(row.fieldIndex("total_weight")) == 11L)
    // 6 and 7 have no out-edges
    assert(row.getLong(row.fieldIndex("n_dangling")) == 2L)
    // node 5 ships weight 4 (3 to the hub, 1 to the dangler)
    assert(row.getLong(row.fieldIndex("max_out_weight")) == 4L)
    assert(row.getDouble(row.fieldIndex("top_hub_share")) == 4.0 / 11.0)
  }

  test("degreeAudit on an edgeless graph reports zero weight, null share") {
    val row = Graph.degreeAudit(
      nodes.toDF("node"),
      Seq.empty[(Long, Long, Long)].toDF("src", "dst", "weight"))
      .collect().head
    assert(row.getLong(row.fieldIndex("n_edges")) == 0L)
    assert(row.getLong(row.fieldIndex("n_dangling")) == 7L)
    assert(row.isNullAt(row.fieldIndex("top_hub_share")))
  }
}
