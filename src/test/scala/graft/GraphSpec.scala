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

  /** Scalar replay of the SEEDED variant: teleport and dangling pool
    * flow only to seeds; non-seeds start at zero.
    */
  private def naiveSeeded(nodes: Seq[Long], edges: Seq[(Long, Long, Long)],
                          seeds: Set[Long], iters: Int, base: Long,
                          dampNum: Long, dampDen: Long): Map[Long, Long] = {
    val outW = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val teleport = (dampDen - dampNum) * base / dampDen
    var mass = nodes.map(n => n -> (if (seeds(n)) base else 0L)).toMap
    for (_ <- 1 to iters) {
      val in = scala.collection.mutable.Map.empty[Long, Long]
      for ((s, d, w) <- edges)
        in(d) = in.getOrElse(d, 0L) + mass(s) * w / outW(s)
      val dang = nodes.filter(n => !outW.contains(n)).map(mass).sum
      val share = dang / seeds.size
      mass = nodes.map { n =>
        n -> ((if (seeds(n)) teleport else 0L) +
          dampNum * (in.getOrElse(n, 0L) + (if (seeds(n)) share else 0L)) /
            dampDen)
      }.toMap
    }
    mass
  }

  test("linkRankSeeded equals its scalar replay; non-seeds earn mass " +
    "only through in-edges") {
    val seeds = Set(1L, 5L)
    val got = Graph.linkRankSeeded(
      nodes.toDF("node"), edges.toDF("src", "dst", "weight"),
      seeds.toSeq.toDF("node"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    CacheScope.release(spark)
    assert(got == naiveSeeded(nodes, edges, seeds, 3, 1000000L, 85L, 100L))
    // 6 is isolated and unseeded: no teleport, no in-edges → exactly zero
    assert(got(6L) == 0L)
    // the hub is reachable from seed 1 and seed 5 → positive mass
    assert(got(3L) > 0L)
  }

  test("warm-start continues the exact trajectory: from(cold(k1), k2) " +
    "== cold(k1+k2)") {
    val nodesDf = nodes.toDF("node")
    val edgesDf = edges.toDF("src", "dst", "weight")
    val cold2 = Graph.linkRank(nodesDf, edgesDf, iters = 2)
    val warm = Graph.linkRankFrom(cold2, nodesDf, edgesDf, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cold5 = Graph.linkRank(nodesDf, edgesDf, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    CacheScope.release(spark)
    assert(warm == cold5)
  }

  test("linkRankTrajectory consumers equal the live operators " +
    "bit-for-bit: depth taps, residual ladder, convergence gate") {
    val nodesDf = nodes.toDF("node")
    val edgesDf = edges.toDF("src", "dst", "weight")
    val maxI = 5
    val traj = Graph.linkRankTrajectory(nodesDf, edgesDf, maxI)
      .localCheckpoint(true)
    CacheScope.release(spark)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] = {
      val r = df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
      CacheScope.release(spark)
      r
    }
    (1 to 3).foreach { d =>
      assert(rows(traj.filter(col("round") === d).select("node", "mass")) ==
        rows(Graph.linkRank(nodesDf, edgesDf, iters = d)),
        s"trajectory tap at depth $d must equal linkRank($d)")
    }
    assert(rows(Graph.linkRankResidualFromTrajectory(traj, maxI)) ==
      rows(Graph.linkRankResidual(nodesDf, edgesDf, iters = maxI)),
      "residual consumer must equal the live instrument")
    // exercise both stop regimes: a tol the ladder crosses mid-budget
    // and a tol it never crosses (budget exhaustion)
    val lad = Graph.linkRankResidualFromTrajectory(traj, maxI)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    CacheScope.release(spark)
    for (tol <- Seq(lad(2), 0L)) {
      assert(rows(Graph.linkRankConvergedFromTrajectory(traj, tol, maxI)) ==
        rows(Graph.linkRankConverged(nodesDf, edgesDf, tol, maxI)),
        s"convergence consumer must equal the live gate at tol=$tol")
    }
  }

  test("authority registry: refresh commits v1, update warm-continues " +
    "to v2 == the longer cold run") {
    val dir = java.nio.file.Files.createTempDirectory("authreg").toString
    val table = s"$dir/authority"
    val nodesDf = nodes.toDF("node")
    val edgesDf = edges.toDF("src", "dst", "weight")
    assert(Graph.authorityRefresh(nodesDf, edgesDf, table, iters = 2) == 1)
    assert(Graph.authorityUpdate(nodesDf, edgesDf, table, iters = 2) == 2)
    val served = graft.io.Manifest.read(spark, table)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    CacheScope.release(spark)
    assert(served == naiveRank(nodes, edges, 4, 1000000L, 85L, 100L))
    // time travel: v1 still reads as the 2-round state
    val v1 = graft.io.Manifest.readVersion(spark, table, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(v1 == naiveRank(nodes, edges, 2, 1000000L, 85L, 100L))
  }

  test("triangles: exact counts, degrees, and coefficients on the fixture") {
    val out = Graph.triangles(
      nodes.toDF("node"), edges.toDF("src", "dst", "weight"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    CacheScope.release(spark)
    // undirected simple graph: {1,2},{1,3},{2,3},{3,4},{3,5},{5,7} —
    // exactly one triangle {1,2,3}
    assert(out(1L) == ((2L, 1L, Some(1.0))))
    assert(out(2L) == ((2L, 1L, Some(1.0))))
    assert(out(3L) == ((4L, 1L, Some(2.0 * 1.0 / (4.0 * 3.0)))))
    assert(out(4L) == ((1L, 0L, None)))
    assert(out(5L) == ((2L, 0L, Some(0.0))))
    assert(out(6L) == ((0L, 0L, None)))
    assert(out(7L) == ((1L, 0L, None)))
  }

  test("triangles matches brute-force enumeration on a seeded random graph") {
    val rnd = new scala.util.Random(7)
    val n = 40L
    val rawEdges = Seq.fill(300)((rnd.nextLong(n), rnd.nextLong(n), 1L))
      .filter { case (a, b, _) => a != b }
    val und = rawEdges.map { case (a, b, _) => (a min b, a max b) }.distinct
    val undSet = und.toSet
    val expectTri = (0L until n).map { x =>
      val nbrs = und.collect {
        case (a, b) if a == x => b
        case (a, b) if b == x => a
      }
      var c = 0L
      for (i <- nbrs.indices; j <- i + 1 until nbrs.size)
        if (undSet(((nbrs(i) min nbrs(j)), (nbrs(i) max nbrs(j))))) c += 1
      x -> c
    }.toMap
    val got = Graph.triangles(
      (0L until n).toDF("node"), rawEdges.toDF("src", "dst", "weight"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    CacheScope.release(spark)
    assert(got == expectTri)
  }

  test("textRank == linkRank replay over the operator's own " +
    "co-occurrence graph (composition equality)") {
    val docs = Seq(
      (1L, "spark shuffles data across spark executors"),
      (2L, "spark executors cache data partitions"),
      (3L, "data partitions spill when executors thrash"),
      (4L, "a lonely sentence about nothing relevant"),
      (5L, "spark executors cache data partitions")
    ).toDF("doc_id", "text")
    val pc = graft.ops.text.Corpus.cooccurrence(docs, window = 3,
      minPairCount = 2)
      .select("w1", "w2", "pair_cnt")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(pc.nonEmpty, "fixture must produce qualifying pairs")
    val edges = pc.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val vocab = docs.select(explode(split(col("text"), " ")).as("w"))
      .distinct().as[String].collect().toSeq
    // scalar replay at string-node grain (naiveRank's arithmetic)
    val outW = edges.groupBy(_._1).map { case (s, es) =>
      s -> es.map(_._3).sum }
    val teleport = (100L - 85L) * 1000000L / 100L
    var mass = vocab.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val in = scala.collection.mutable.Map.empty[String, Long]
      for ((s, d, w) <- edges)
        in(d) = in.getOrElse(d, 0L) + mass(s) * w / outW(s)
      val dang = vocab.filter(n => !outW.contains(n)).map(mass).sum
      val share = dang / vocab.size
      mass = vocab.map { n =>
        n -> (teleport + 85L * (in.getOrElse(n, 0L) + share) / 100L)
      }.toMap
    }
    val want = mass.toSeq.sortBy { case (t, m) => (-m, t) }.take(5)
    val got = graft.ops.text.Corpus.textRank(docs, window = 3,
      minPairCount = 2, topK = 5, iters = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    CacheScope.release(spark)
    assert(got.map(_._1).toSeq == (1 to 5))
    assert(got.map(x => (x._2, x._3)).toSeq == want)
    // the isolated sentence's terms are dangling: teleport-floor mass,
    // strictly below every connected term in `want`
    assert(!want.exists(_._1 == "lonely"))
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

  test("linkRankResidual equals the scalar replay's per-round diffs and " +
    "decays monotonically on the fixture") {
    val iters = 4
    val got = Graph.linkRankResidual(
      nodes.toDF("node"), edges.toDF("src", "dst", "weight"), iters = iters)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(_._1)
    CacheScope.release(spark)
    // scalar replay: per-round masses from scratch, diff consecutive
    val states = (0 to iters).map {
      case 0 => nodes.map(_ -> 1000000L).toMap
      case k => naiveRank(nodes, edges, k, 1000000L, 85L, 100L)
    }
    val want = (1 to iters).map { k =>
      val (prev, cur) = (states(k - 1), states(k))
      (k, nodes.map(n => math.abs(cur(n) - prev(n))).max,
        nodes.count(n => cur(n) != prev(n)).toLong)
    }
    assert(got == want)
    // the whole point of the post-flight: residual shrinks round over
    // round on a damped graph (monotone on this fixture)
    val ds = got.map(_._2)
    assert(ds.zip(ds.tail).forall { case (a, b) => b <= a },
      s"residuals must decay: $ds")
  }

  test("linkRankConverged stops at the first round whose residual " +
    "clears the tolerance, and lands on exactly that round's masses") {
    // scalar residuals on the fixture decide the expected stop round
    val states = (0 to 6).map {
      case 0 => nodes.map(_ -> 1000000L).toMap
      case k => naiveRank(nodes, edges, k, 1000000L, 85L, 100L)
    }
    val resid = (1 to 6).map { k =>
      nodes.map(n => math.abs(states(k)(n) - states(k - 1)(n))).max
    }
    // pick a tol that stops strictly inside (1, 6) so the gate is live
    val stopAt = 3
    val tol = resid(stopAt - 1) // residual of round `stopAt` clears it...
    assert(resid(stopAt - 2) > tol, "fixture must not stop a round early")
    val out = Graph.linkRankConverged(
      nodes.toDF("node"), edges.toDF("src", "dst", "weight"),
      tol = tol, maxIters = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    CacheScope.release(spark)
    assert(out.forall(_._3 == stopAt), s"rounds must be $stopAt")
    assert(out.map(t => t._1 -> t._2).toMap == states(stopAt),
      "masses must be exactly the stop round's state")
    // an unreachable tolerance runs to maxIters
    val full = Graph.linkRankConverged(
      nodes.toDF("node"), edges.toDF("src", "dst", "weight"),
      tol = 0L, maxIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    CacheScope.release(spark)
    assert(full.forall(_._3 == 2) &&
      full.map(t => t._1 -> t._2).toMap == states(2))
  }

  test("co-purchase whale-order cap: an over-cap order contributes no " +
    "edges, and the cap audit prices exactly what it dropped") {
    val dir = java.nio.file.Files.createTempDirectory("graft_whale").toString
    // order 1: a 70-item whale (over the 64-item cap -> 70*69 directed
    // pairs saved); order 2: 3 qualifying items; order 3: items below the
    // quantity floor (never qualify)
    val whale = (1 to 70).map(i => (1L, 1000L + i, 50))
    val small = Seq((2L, 1L, 50), (2L, 2L, 50), (2L, 3L, 50))
    val lowQty = Seq((3L, 1L, 5), (3L, 2L, 5))
    (whale ++ small ++ lowQty)
      .toDF("l_orderkey", "l_partkey", "l_quantity")
      .write.parquet(s"$dir/lineitem.parquet")
    (1L to 3L).toDF("p_partkey").write.parquet(s"$dir/part.parquet")
    val audit = SparkEntry.queries("q_graph_audit")(spark, dir)
      .collect().head
    assert(audit.getLong(audit.fieldIndex("n_edges")) == 6L,
      "only the 3-item order's 3*2 directed edges survive the cap")
    val cap = SparkEntry.queries("q_copurchase_cap")(spark, dir)
      .collect().head
    assert(cap.getLong(cap.fieldIndex("n_orders")) == 2L)
    assert(cap.getLong(cap.fieldIndex("n_capped")) == 1L)
    assert(cap.getLong(cap.fieldIndex("pairs_dropped")) == 70L * 69L)
    assert(cap.getLong(cap.fieldIndex("max_items")) == 70L)
  }

  test("hopDistance: BFS levels on a directed path, unreachable stays " +
    "NULL, and early stop equals a longer maxHops") {
    // 1→2→3→4 plus back-edge 4→1; 9 is isolated; 8→1 points AT the seed
    // (so 8 is unreachable — direction matters)
    val ns = Seq(1L, 2L, 3L, 4L, 8L, 9L).toDF("node")
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (8L, 1L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    def hops(maxHops: Int): Map[Long, Option[Long]] =
      Graph.hopDistance(ns, es, seeds, maxHops)
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val got = hops(6)
    CacheScope.release(spark)
    assert(got == Map(1L -> Some(0L), 2L -> Some(1L), 3L -> Some(2L),
      4L -> Some(3L), 8L -> None, 9L -> None))
    // eccentricity is 3, so maxHops 3 and 6 agree (extra rounds no-op)
    val tight = hops(3)
    CacheScope.release(spark)
    assert(tight == got)
    // a capped horizon truncates to NULL beyond it
    val capped = hops(2)
    CacheScope.release(spark)
    assert(capped(4L).isEmpty && capped(3L).contains(2L))
  }

  test("hopDistance: an edge endpoint absent from the node table neither " +
    "settles nor propagates (phantom-vertex regression, r14)") {
    // 1 -> 2 -> 3 with vertex 2 NOT in nodes: 3 must stay unreachable —
    // the delta loop must restrict its frontier to the node table (the
    // oracle's rounds join the node-built state, so a phantom relay
    // would diverge engine from oracle on malformed edge data)
    val ns = Seq(1L, 3L).toDF("node")
    val es = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = Graph.hopDistance(ns, es, Seq(1L).toDF("node"), maxHops = 4)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    CacheScope.release(spark)
    assert(got == Map(1L -> Some(0L), 3L -> None),
      s"vertex 2 is not in the graph and must not relay: got $got")
  }

  test("hopDistance: a deep crawl past the fold window keeps exact " +
    "levels (delta-fold compaction, r15)") {
    // a 14-node directed path forces 13 rounds > the 8-frame fold
    // window; every level must still come out exact
    val n = 14
    val ns = (1 to n).map(_.toLong).toDF("node")
    val es = (1 until n).map(i => (i.toLong, i + 1L)).toDF("src", "dst")
    val got = Graph.hopDistance(ns, es, Seq(1L).toDF("node"),
      maxHops = n).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    CacheScope.release(spark)
    assert(got == (1 to n).map(i => i.toLong -> (i - 1).toLong).toMap,
      s"got $got")
  }

  test("hopDistanceWeighted: a two-hop light path beats the one-hop " +
    "heavy edge unit BFS would pick; later rounds re-improve") {
    val ns = Seq(1L, 2L, 3L, 4L, 5L).toDF("node")
    val es = Seq(
      (1L, 2L, 10L), (2L, 3L, 10L), // the light two-hop route to 3
      (1L, 3L, 100L),               // the heavy direct edge
      (1L, 4L, 1L)).toDF("src", "dst", "weight")
    def asMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val got = asMap(Graph.hopDistanceWeighted(ns, es,
      Seq(1L).toDF("node"), maxRounds = 4).collect())
    CacheScope.release(spark)
    // unit BFS says hops(3) = 1 (the direct edge); min-plus says 20 —
    // node 3's state improves in round 2 AFTER being reached in round 1,
    // the re-improvement unit-BFS first-touch-is-final cannot express
    assert(got == Map(1L -> Some(0L), 2L -> Some(10L), 3L -> Some(20L),
      4L -> Some(1L), 5L -> None), s"got $got")
    val bfs = asMap(Graph.hopDistance(ns,
      es.select($"src", $"dst"), Seq(1L).toDF("node"), maxHops = 4)
      .collect())
    CacheScope.release(spark)
    assert(bfs(3L) == Some(1L),
      "fixture sanity: unit BFS must reach 3 in one hop")
    // a round budget that cuts the light path mid-way keeps the best
    // distance KNOWN at that budget (the heavy direct edge)
    val trunc = asMap(Graph.hopDistanceWeighted(ns, es,
      Seq(1L).toDF("node"), maxRounds = 1).collect())
    CacheScope.release(spark)
    assert(trunc(3L) == Some(100L),
      s"1-edge budget must keep the direct edge, got ${trunc(3L)}")
    // parallel directed edges merge by MIN weight
    val par = asMap(Graph.hopDistanceWeighted(
      Seq(1L, 2L).toDF("node"),
      Seq((1L, 2L, 7L), (1L, 2L, 3L)).toDF("src", "dst", "weight"),
      Seq(1L).toDF("node"), maxRounds = 2).collect())
    CacheScope.release(spark)
    assert(par(2L) == Some(3L))
    // a negative weight fails loud (in-expression guard, not a comment)
    val err = intercept[Exception] {
      Graph.hopDistanceWeighted(
        Seq(1L, 2L).toDF("node"),
        Seq((1L, 2L, -5L)).toDF("src", "dst", "weight"),
        Seq(1L).toDF("node"), maxRounds = 2).collect()
    }
    CacheScope.release(spark)
    assert(err.getMessage != null)
  }

  test("hopDistanceWeighted: delta checkpoints persist only the " +
    "improvements, never the full reached relation") {
    val ns = Seq(1L, 2L, 3L, 4L, 5L).toDF("node")
    val es = Seq(
      (1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 100L), (1L, 4L, 1L))
      .toDF("src", "dst", "weight")
    val rows = scala.collection.mutable.Buffer.empty[Long]
    Graph.hopDistanceWeighted(ns, es, Seq(1L).toDF("node"),
      maxRounds = 4, checkpointRows = Some(rows)).collect()
    CacheScope.release(spark)
    // init: the 1 seed; round 1 improves {2,3,4}; round 2 re-improves
    // {3} (20 < 100); round 3 improves nothing and stops. Total persisted
    // rows 1+3+1+0 = 5 — the r15 full-state design re-checkpointed the
    // whole reached relation each round (1+4+5+5 = 15 on this fixture).
    assert(rows.toSeq == Seq(1L, 3L, 1L, 0L), s"got $rows")
  }

  test("hopDistanceWeightedFrom: warm-start converges to cold under " +
    "edge ADDITIONS (new edges + cheaper parallel alternatives); " +
    "converged state passes through unchanged") {
    val ns = Seq(1L, 2L, 3L, 4L, 5L).toDF("node")
    // k1: 1→2 (10), 2→3 (10), 1→3 direct (100) — weighted dist(3) = 20
    val k1 = Seq((1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 100L))
      .toDF("src", "dst", "weight")
    // k2 adds a cheaper parallel 1→3 (5) and extends reach 3→4 (1):
    // dist(3) must RE-IMPROVE 20→5, dist(4) fills 6, 5 stays null
    val k12 = k1.unionByName(
      Seq((1L, 3L, 5L), (3L, 4L, 1L)).toDF("src", "dst", "weight"))
    val seeds = Seq(1L).toDF("node")
    def asMap(df: org.apache.spark.sql.DataFrame) = {
      val m = df.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      CacheScope.release(spark)
      m
    }
    val cold12 = asMap(Graph.hopDistanceWeighted(ns, k12, seeds,
      maxRounds = 6))
    assert(cold12 == Map(1L -> Some(0L), 2L -> Some(10L), 3L -> Some(5L),
      4L -> Some(6L), 5L -> None), s"fixture: $cold12")
    val warm = asMap(Graph.hopDistanceWeightedFrom(
      Graph.hopDistanceWeighted(ns, k1, seeds, maxRounds = 6),
      ns, k12, seeds, rounds = 4))
    assert(warm == cold12, s"warm must converge to cold: $warm")
    // min-plus idempotence: another warm pass on unchanged edges is a
    // bit-for-bit pass-through
    val again = asMap(Graph.hopDistanceWeightedFrom(
      Graph.hopDistanceWeighted(ns, k12, seeds, maxRounds = 6),
      ns, k12, seeds, rounds = 2))
    assert(again == cold12)
  }

  test("distance registry: warm-start converges to cold " +
    "(from(cold(k1), k1+k2) == cold(k1+k2)); converged state passes " +
    "through unchanged; refresh/update commit versions") {
    val ns = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("node")
    // k1: the path 1→2→3→4; k2 opens a SHORTCUT to 4 (via 5) and
    // extends the reach to 6 — so warm continuation must both
    // RE-IMPROVE a committed distance (4: 3→2) and fill new nulls
    val k1 = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val k12 = k1.unionByName(
      Seq((1L, 5L), (5L, 4L), (4L, 6L)).toDF("src", "dst"))
    val seeds = Seq(1L).toDF("node")
    def asMap(df: org.apache.spark.sql.DataFrame) = {
      val m = df.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      CacheScope.release(spark)
      m
    }
    val cold1 = asMap(Graph.hopDistance(ns, k1, seeds, maxHops = 6))
    assert(cold1 == Map(1L -> Some(0L), 2L -> Some(1L), 3L -> Some(2L),
      4L -> Some(3L), 5L -> None, 6L -> None), s"fixture: $cold1")
    val cold12 = asMap(Graph.hopDistance(ns, k12, seeds, maxHops = 6))
    assert(cold12 == Map(1L -> Some(0L), 2L -> Some(1L), 3L -> Some(2L),
      4L -> Some(2L), 5L -> Some(1L), 6L -> Some(3L)), s"fixture: $cold12")
    // warm composition: cold(k1) then enough warm rounds over k1+k2
    // equals cold(k1+k2) — including the re-improved node 4
    val warm = asMap(Graph.hopDistanceFrom(
      Graph.hopDistance(ns, k1, seeds, maxHops = 6), ns, k12, seeds,
      rounds = 4))
    assert(warm == cold12, s"warm must converge to cold: $warm")
    // registry: refresh commits v1 (cold k1), update warm-continues to
    // v2 == cold(k1+k2); a further update on UNCHANGED edges is the
    // min-plus fixpoint passing through bit-for-bit (v3 == v2)
    val dir = java.nio.file.Files.createTempDirectory("distreg").toString
    val table = s"$dir/distances"
    assert(Graph.distanceRefresh(ns, k1, seeds, table, maxHops = 6) == 1)
    assert(Graph.distanceUpdate(ns, k12, seeds, table, rounds = 4) == 2)
    assert(asMap(graft.io.Manifest.read(spark, table)) == cold12)
    assert(Graph.distanceUpdate(ns, k12, seeds, table, rounds = 2) == 3)
    assert(asMap(graft.io.Manifest.read(spark, table)) == cold12,
      "a converged state must pass through warm rounds unchanged")
    assert(asMap(graft.io.Manifest.readVersion(spark, table, 1)) == cold1,
      "v1 still time-travels to the cold k1 relation")
  }

  test("labelPropagate: two weight-10 triangles over a weight-1 bridge " +
    "converge to per-triangle min labels; isolated keeps its own") {
    val ns = Seq(1L, 2L, 3L, 4L, 5L, 6L, 9L).toDF("node")
    // undirected intent: pass each edge once, operator symmetrizes
    val es = Seq(
      (1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 10L),
      (4L, 5L, 10L), (5L, 6L, 10L), (4L, 6L, 10L),
      (3L, 4L, 1L)).toDF("src", "dst", "weight")
    val got = Graph.labelPropagate(ns, es, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    CacheScope.release(spark)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L, 9L -> 9L))
  }

  test("labelPropagate matches the hand round: sync update with " +
    "(max weight, min label) tie-break after ONE round") {
    val ns = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("node")
    val es = Seq(
      (1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 10L),
      (4L, 5L, 10L), (5L, 6L, 10L), (4L, 6L, 10L),
      (3L, 4L, 1L)).toDF("src", "dst", "weight")
    val got = Graph.labelPropagate(ns, es, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    CacheScope.release(spark)
    // each node sees two w=10 neighbors with distinct self-labels →
    // tie → min neighbor label (node 3 also sees 4 at w=1, dominated;
    // node 4 likewise sees 3 at w=1)
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 1L,
      4L -> 5L, 5L -> 4L, 6L -> 4L))
  }

  test("labelPropResidual: per-round changed counts match the unrolled " +
    "rounds; the first zero names the convergence round") {
    val ns = Seq(1L, 2L, 3L, 4L, 5L, 6L, 9L).toDF("node")
    val es = Seq(
      (1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 10L),
      (4L, 5L, 10L), (5L, 6L, 10L), (4L, 6L, 10L),
      (3L, 4L, 1L)).toDF("src", "dst", "weight")
    // hand-unroll: round 1 rotates every triangle label (6 changed),
    // round 2 settles both triangles to min labels (4 changed: 1->1 via
    // 2, etc.), round 3+ change nothing
    def labelsAt(r: Int): Map[Long, Long] = {
      val m = Graph.labelPropagate(ns, es, rounds = r)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      CacheScope.release(spark)
      m
    }
    val l1 = labelsAt(1); val l2 = labelsAt(2); val l3 = labelsAt(3)
    val init = Seq(1L, 2L, 3L, 4L, 5L, 6L, 9L).map(n => n -> n).toMap
    def diff(a: Map[Long, Long], b: Map[Long, Long]): Long =
      a.count { case (k, v) => b(k) != v }.toLong
    val res = Graph.labelPropResidual(ns, es, rounds = 4)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    CacheScope.release(spark)
    assert(res == Map(1 -> diff(l1, init), 2 -> diff(l2, l1),
      3 -> diff(l3, l2), 4 -> 0L), s"got $res")
    assert(res(3) == 0L, "fixture converges at round 2; round 3 changes nothing")
  }

  test("labelPropConverged: stops at the first zero-change round, equals " +
    "the fixed unroll, and reports the round count") {
    val ns = Seq(1L, 2L, 3L, 4L, 5L, 6L, 9L).toDF("node")
    val es = Seq(
      (1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 10L),
      (4L, 5L, 10L), (5L, 6L, 10L), (4L, 6L, 10L),
      (3L, 4L, 1L)).toDF("src", "dst", "weight")
    val conv = Graph.labelPropConverged(ns, es, maxRounds = 8).collect()
    CacheScope.release(spark)
    val rounds = conv.map(_.getInt(2)).distinct
    assert(rounds.toSeq == Seq(3), s"fixture stops at round 3 (first zero), got ${rounds.toSeq}")
    val labels = conv.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fixed = Graph.labelPropagate(ns, es, rounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    CacheScope.release(spark)
    assert(labels == fixed, "early stop must equal the fixed unroll")
    // a budget too small to converge reports maxRounds and still equals
    // the same-depth fixed run
    val trunc = Graph.labelPropConverged(ns, es, maxRounds = 1).collect()
    CacheScope.release(spark)
    assert(trunc.map(_.getInt(2)).distinct.toSeq == Seq(1))
    assert(trunc.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Graph.labelPropagate(ns, es, rounds = 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    CacheScope.release(spark)
  }

  test("labelPropSemiSync: converges where sync LPA oscillates forever " +
    "(bipartite 4-cycle)") {
    // the canonical sync-LPA failure: a 4-cycle with equal weights is
    // bipartite, so simultaneous updates trade labels between the two
    // sides every round, period 2, forever
    val ns = Seq(10L, 11L, 12L, 13L).toDF("node")
    val es = Seq((10L, 11L, 1L), (11L, 12L, 1L), (12L, 13L, 1L),
      (13L, 10L, 1L)).toDF("src", "dst", "weight")
    val sync = Graph.labelPropResidual(ns, es, rounds = 6)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    CacheScope.release(spark)
    assert((1 to 6).forall(sync(_) > 0L),
      s"sync LPA must never settle on the bipartite cycle, got $sync")
    val semi = Graph.labelPropSemiSyncResidual(ns, es, rounds = 6)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    CacheScope.release(spark)
    assert(semi.exists(_._2 == 0L),
      s"semi-sync must reach a zero-change round, got $semi")
    val conv = Graph.labelPropSemiSync(ns, es, maxRounds = 8).collect()
    CacheScope.release(spark)
    // hand-run (colors by node % 2, sub-step order 0 then 1): sub-step 0
    // relabels 10 and 12 from {11, 13}'s self-labels -> both 11; sub-step
    // 1 then sees unanimous 11 -> 11 and 13 adopt it; round 2 changes
    // nothing, so the stop is at round 2 with every node labeled 11
    assert(conv.map(_.getInt(2)).distinct.toSeq == Seq(2))
    assert(conv.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(10L -> 11L, 11L -> 11L, 12L -> 11L, 13L -> 11L))
  }

  test("labelPropSemiSync: a same-color edge defeats parity (C=2 " +
    "plateaus forever) and C=4 settles it — the color count is an " +
    "instrument-read choice, not a guarantee") {
    // one edge between two EVEN nodes: under parity both endpoints sit
    // in sub-step 0 and update simultaneously from each other -> they
    // swap labels every round exactly like sync LPA; under C=4 they land
    // in different sub-steps (2 % 4 = 2, 4 % 4 = 0) and settle at once.
    // This is the 2-node version of the sf0.01 co-purchase plateau (the
    // parity ladder sticks at 3 changed labels; node%4 reaches zero).
    val ns = Seq(2L, 4L).toDF("node")
    val es = Seq((2L, 4L, 1L)).toDF("src", "dst", "weight")
    val parity = Graph.labelPropSemiSyncResidual(ns, es, rounds = 5,
      numColors = 2)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    CacheScope.release(spark)
    assert((1 to 5).forall(parity(_) == 2L),
      s"parity must swap the even pair forever, got $parity")
    val c4 = Graph.labelPropSemiSync(ns, es, maxRounds = 5, numColors = 4)
      .collect()
    CacheScope.release(spark)
    assert(c4.map(_.getInt(2)).distinct.toSeq == Seq(2),
      "C=4 sequentializes the pair: settled entering round 2")
    assert(c4.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(2L -> 2L, 4L -> 2L))
  }

  test("labelPropTrajectory consumers equal the live operators " +
    "bit-for-bit: residual ladder, convergence gate, quality ladder, " +
    "quality-plateau gate") {
    // the two-triangle-plus-bridge fixture: converges at round 2 on
    // sync LPA, so the gate/convergence branches all exercise
    val ns = Seq(1L, 2L, 3L, 4L, 5L, 6L, 9L).toDF("node")
    val es = Seq(
      (1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 10L),
      (4L, 5L, 10L), (5L, 6L, 10L), (4L, 6L, 10L),
      (3L, 4L, 1L)).toDF("src", "dst", "weight")
    val maxR = 5
    val traj = Graph.labelPropTrajectory(ns, es, maxR)
      .localCheckpoint(true)
    CacheScope.release(spark)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] = {
      val r = df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
      CacheScope.release(spark)
      r
    }
    // depth taps ARE labelPropagate at that depth
    (1 to 3).foreach { d =>
      assert(rows(traj.filter(col("round") === d).select("node", "label")) ==
        rows(Graph.labelPropagate(ns, es, rounds = d)),
        s"trajectory tap at depth $d must equal labelPropagate($d)")
    }
    assert(rows(Graph.residualFromTrajectory(traj, maxR)) ==
      rows(Graph.labelPropResidual(ns, es, rounds = maxR)),
      "residual consumer must equal the live instrument")
    assert(rows(Graph.convergedFromTrajectory(traj, maxR)) ==
      rows(Graph.labelPropConverged(ns, es, maxRounds = maxR)),
      "convergence consumer must equal the live gate (incl. the rounds col)")
    assert(rows(Graph.qualityLadderFromTrajectory(traj, es, Seq(1, 3))) ==
      rows(Graph.labelPropQualityLadder(ns, es, Seq(1, 3))),
      "quality-ladder consumer must equal the live ladder")
    for (pat <- Seq(0, 2)) {
      assert(rows(Graph.qualityGatedFromTrajectory(traj, es, maxR, pat)) ==
        rows(Graph.labelPropQualityGated(ns, es, maxR, pat)),
        s"quality-gated consumer must equal the live gate at patience $pat")
    }
  }

  test("releaseCheckpoints frees every localCheckpoint frame a " +
    "trajectory view pins, and a released operator re-run still " +
    "answers (the library-caller lifecycle hook)") {
    val ns = Seq(1L, 2L, 3L, 4L, 5L, 6L, 9L).toDF("node")
    val es = Seq(
      (1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 10L),
      (4L, 5L, 10L), (5L, 6L, 10L), (4L, 6L, 10L),
      (3L, 4L, 1L)).toDF("src", "dst", "weight")
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val traj = Graph.labelPropTrajectory(ns, es, 3)
    val n = traj.count()
    CacheScope.release(spark)
    val pinned = sc.getPersistentRDDs.keySet -- before
    assert(pinned.nonEmpty,
      "the trajectory view must be backed by checkpoint frames")
    graft.releaseCheckpoints(traj)
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"every frame must be released, still pinned: $leaked")
    // the operators are pure: a fresh call after release rebuilds
    val again = Graph.labelPropTrajectory(ns, es, 3)
    assert(again.count() == n)
    graft.releaseCheckpoints(again)
    CacheScope.release(spark)
  }

  test("community registry: warm-start composes exactly (from(cold(k1), " +
    "k2) == cold(k1+k2)); refresh/update commit versions; new nodes " +
    "start at their own id") {
    val ns = Seq(1L, 2L, 3L, 4L, 5L, 6L, 9L).toDF("node")
    val es = Seq(
      (1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 10L),
      (4L, 5L, 10L), (5L, 6L, 10L), (4L, 6L, 10L),
      (3L, 4L, 1L)).toDF("src", "dst", "weight")
    def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val m = df.select("node", "label").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      CacheScope.release(spark)
      m
    }
    // composition: 1 cold round then 2 warm == 3 cold
    val cold1 = Graph.labelPropagate(ns, es, rounds = 1)
    val warm = labelsOf(Graph.labelPropFrom(cold1, ns, es, rounds = 2))
    assert(warm == labelsOf(Graph.labelPropagate(ns, es, rounds = 3)),
      "warm continuation must advance the exact cold trajectory")
    // registry: refresh commits v1 (2 rounds), update warm-continues to
    // v2 == the 3-round cold run; v1 still time-travels
    val dir = java.nio.file.Files.createTempDirectory("commreg").toString
    val table = s"$dir/communities"
    assert(Graph.communityRefresh(ns, es, table, rounds = 2) == 1)
    assert(Graph.communityUpdate(ns, es, table, rounds = 1) == 2)
    assert(labelsOf(graft.io.Manifest.read(spark, table)) ==
      labelsOf(Graph.labelPropagate(ns, es, rounds = 3)))
    assert(labelsOf(graft.io.Manifest.readVersion(spark, table, 1)) ==
      labelsOf(Graph.labelPropagate(ns, es, rounds = 2)))
    // a node unseen by the committed state starts at its own id: with no
    // incident edges it keeps it through any number of warm rounds
    val ns2 = ns.unionByName(Seq(99L).toDF("node"))
    val cont = labelsOf(Graph.labelPropFrom(
      graft.io.Manifest.read(spark, table), ns2, es, rounds = 1))
    assert(cont(99L) == 99L, "a new isolated node labels itself")
  }

  test("modularity: hand-computed on the two-triangle fixture; isolated " +
    "node is its own zero-contribution community") {
    val ns = Seq(1L, 2L, 3L, 4L, 5L, 6L, 9L).toDF("node")
    val es = Seq(
      (1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 10L),
      (4L, 5L, 10L), (5L, 6L, 10L), (4L, 6L, 10L),
      (3L, 4L, 1L)).toDF("src", "dst", "weight")
    val labels = Graph.labelPropagate(ns, es, rounds = 3)
    val row = Graph.modularity(labels, es).collect().head
    CacheScope.release(spark)
    // 2m = 2*(6*10 + 1) = 122; per triangle in_c = 60, tot_c = 61;
    // bridge edge crosses; isolated 9: in = tot = 0, still a community.
    // Q = (120*122 - 2*61^2) / 122^2 = 7198/14884
    assert(row.getLong(0) == 122L)
    assert(row.getLong(1) == 3L)
    assert(row.getDouble(2) == 7198.0 / 14884.0, s"got ${row.getDouble(2)}")
  }

  test("modularity: the oscillating sync labeling scores NEGATIVE where " +
    "semi-sync's converged one scores zero — the instrument behind the " +
    "residual plateau warning") {
    val ns = Seq(10L, 11L, 12L, 13L).toDF("node")
    val es = Seq((10L, 11L, 1L), (11L, 12L, 1L), (12L, 13L, 1L),
      (13L, 10L, 1L)).toDF("src", "dst", "weight")
    // sync after any odd/even round count: alternating labels, every
    // edge crosses -> Q = (0 - 2*4^2)/8^2 = -0.5 (worse than one blob)
    val qSync = Graph.modularity(
      Graph.labelPropagate(ns, es, rounds = 3), es).collect().head
    CacheScope.release(spark)
    assert(qSync.getDouble(2) == -0.5, s"got ${qSync.getDouble(2)}")
    // semi-sync converges to one community: in_all = 2m -> Q = 0
    val qSemi = Graph.modularity(
      Graph.labelPropSemiSync(ns, es, maxRounds = 8)
        .select($"node", $"label"), es).collect().head
    CacheScope.release(spark)
    assert(qSemi.getDouble(2) == 0.0, s"got ${qSemi.getDouble(2)}")
  }

  test("labelPropQualityGated: ships the argmax-modularity round's " +
    "labeling, earliest on exact ties") {
    val ns = Seq(1L, 2L, 3L, 4L, 5L, 6L, 9L).toDF("node")
    val es = Seq(
      (1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 10L),
      (4L, 5L, 10L), (5L, 6L, 10L), (4L, 6L, 10L),
      (3L, 4L, 1L)).toDF("src", "dst", "weight")
    // hand numerators: round 1 (rotating triangle labels) num = 677,
    // round 2 settles both triangles at num = 7198, rounds 3-4 repeat
    // it exactly -> argmax is round 2, earliest tie
    val gated = Graph.labelPropQualityGated(ns, es, maxRounds = 4)
      .collect()
    CacheScope.release(spark)
    assert(gated.map(_.getInt(2)).distinct.toSeq == Seq(2),
      s"best round must be 2, got ${gated.map(_.getInt(2)).distinct.toSeq}")
    val want = Graph.labelPropagate(ns, es, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    CacheScope.release(spark)
    assert(gated.map(r => r.getLong(0) -> r.getLong(1)).toMap == want)
    // the oscillating 4-cycle: every round scores the same negative Q
    // (alternating labels, all edges cross) -> earliest round wins
    val ns2 = Seq(10L, 11L, 12L, 13L).toDF("node")
    val es2 = Seq((10L, 11L, 1L), (11L, 12L, 1L), (12L, 13L, 1L),
      (13L, 10L, 1L)).toDF("src", "dst", "weight")
    val osc = Graph.labelPropQualityGated(ns2, es2, maxRounds = 4)
      .collect()
    CacheScope.release(spark)
    assert(osc.map(_.getInt(2)).distinct.toSeq == Seq(1),
      "all rounds tie exactly: the earliest must be shipped")
    // edgeless: every numerator is exactly 0 -> round 1, identity labels
    val lone = Graph.labelPropQualityGated(
      Seq(7L, 8L).toDF("node"),
      Seq.empty[(Long, Long, Long)].toDF("src", "dst", "weight"),
      maxRounds = 3).collect()
    CacheScope.release(spark)
    assert(lone.map(_.getInt(2)).distinct.toSeq == Seq(1))
    assert(lone.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(7L -> 7L, 8L -> 8L))
  }

  test("labelPropQualityGated patience: the plateau stop ships the same " +
    "labeling a full-budget argmax would, from fewer live rounds") {
    val ns = Seq(1L, 2L, 3L, 4L, 5L, 6L, 9L).toDF("node")
    val es = Seq(
      (1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 10L),
      (4L, 5L, 10L), (5L, 6L, 10L), (4L, 6L, 10L),
      (3L, 4L, 1L)).toDF("src", "dst", "weight")
    // numerators: round 1 = 677, round 2 = 7198, rounds 3+ repeat 7198
    // exactly (fixpoint) -> best is round 2; with patience = 2 the live
    // loop stops after round 4 (4 - 2 >= 2) instead of paying a 10-round
    // budget, and ships the identical round-2 labeling + rounds column.
    val patient = Graph.labelPropQualityGated(ns, es,
      maxRounds = 10, patience = 2).collect()
    CacheScope.release(spark)
    val budget = Graph.labelPropQualityGated(ns, es, maxRounds = 4)
      .collect()
    CacheScope.release(spark)
    assert(patient.map(_.getInt(2)).distinct.toSeq == Seq(2))
    assert(patient.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      budget.map(r => r.getLong(0) -> r.getLong(1)).toMap)
    // oscillating 4-cycle: numerators alternate between two equal-Q
    // states -> best stays at round 1 and patience = 2 stops at round 3
    val ns2 = Seq(10L, 11L, 12L, 13L).toDF("node")
    val es2 = Seq((10L, 11L, 1L), (11L, 12L, 1L), (12L, 13L, 1L),
      (13L, 10L, 1L)).toDF("src", "dst", "weight")
    val osc = Graph.labelPropQualityGated(ns2, es2,
      maxRounds = 10, patience = 2).collect()
    CacheScope.release(spark)
    assert(osc.map(_.getInt(2)).distinct.toSeq == Seq(1),
      "plateaued oscillator must ship the earliest best round")
    // patience larger than the remaining budget degenerates to the
    // plain budgeted argmax
    val wide = Graph.labelPropQualityGated(ns, es,
      maxRounds = 3, patience = 5).collect()
    CacheScope.release(spark)
    assert(wide.map(_.getInt(2)).distinct.toSeq == Seq(2))
  }

  test("labelPropQualityLadder: one trajectory, per-depth Q equal to " +
    "independently re-run modularity(labelPropagate(k))") {
    val ns = Seq(1L, 2L, 3L, 4L, 5L, 6L, 9L).toDF("node")
    val es = Seq(
      (1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 10L),
      (4L, 5L, 10L), (5L, 6L, 10L), (4L, 6L, 10L),
      (3L, 4L, 1L)).toDF("src", "dst", "weight")
    val ladder = Graph.labelPropQualityLadder(ns, es, depths = Seq(1, 2, 4))
      .collect()
    CacheScope.release(spark)
    assert(ladder.map(_.getInt(0)).toSeq == Seq(1, 2, 4))
    ladder.foreach { row =>
      val k = row.getInt(0)
      val want = Graph.modularity(
        Graph.labelPropagate(ns, es, rounds = k), es).collect().head
      CacheScope.release(spark)
      assert(row.getLong(1) == want.getLong(0), s"two_m at depth $k")
      assert(row.getLong(2) == want.getLong(1), s"n_communities at depth $k")
      assert(row.getDouble(3) == want.getDouble(2), s"Q at depth $k")
    }
    intercept[IllegalArgumentException] {
      Graph.labelPropQualityLadder(ns, es, depths = Seq(3, 1))
    }
    intercept[IllegalArgumentException] {
      Graph.labelPropQualityLadder(ns, es, depths = Seq.empty)
    }
  }

  test("modularity: a PARTIAL labeling fails loudly instead of silently " +
    "scoring the induced subgraph (full-labeling guard, r15)") {
    val es = Seq((1L, 2L, 1L), (2L, 3L, 1L)).toDF("src", "dst", "weight")
    // node 3 unlabeled: the inner-join shape would quietly shrink 2m
    val partial = Seq((1L, 1L), (2L, 1L)).toDF("node", "label")
    val e = intercept[Exception] {
      Graph.modularity(partial, es).collect()
    }
    CacheScope.release(spark)
    assert(e.getMessage != null)
    // the full labeling still scores; an isolated EXTRA node is fine
    // (no edge reads its label)
    val full = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L))
      .toDF("node", "label")
    val row = Graph.modularity(full, es).collect().head
    CacheScope.release(spark)
    assert(row.getLong(0) == 4L && row.getLong(1) == 2L)
  }

  test("modularity: edgeless graph reports two_m = 0 and NULL modularity") {
    val ns = Seq(1L, 2L).toDF("node")
    val es = Seq.empty[(Long, Long, Long)].toDF("src", "dst", "weight")
    val row = Graph.modularity(
      ns.select($"node", $"node".as("label")), es).collect().head
    CacheScope.release(spark)
    assert(row.getLong(0) == 0L && row.getLong(1) == 2L && row.isNullAt(2))
  }

  test("labelPropSemiSync: early stop equals the fixed unroll, and a " +
    "too-small budget reports maxRounds") {
    val ns = Seq(1L, 2L, 3L, 4L, 5L, 6L, 9L).toDF("node")
    val es = Seq(
      (1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 10L),
      (4L, 5L, 10L), (5L, 6L, 10L), (4L, 6L, 10L),
      (3L, 4L, 1L)).toDF("src", "dst", "weight")
    val conv = Graph.labelPropSemiSync(ns, es, maxRounds = 8).collect()
    CacheScope.release(spark)
    val k = conv.map(_.getInt(2)).distinct
    assert(k.length == 1 && k.head < 8, s"fixture must stop live, got ${k.toSeq}")
    // truncated run: labels equal the same-depth budget-capped run
    val trunc = Graph.labelPropSemiSync(ns, es, maxRounds = 1).collect()
    CacheScope.release(spark)
    assert(trunc.map(_.getInt(2)).distinct.toSeq == Seq(1))
  }

  test("kcore: the K4 survives k=3 while the tail peels; cascade needs " +
    "multiple rounds; over-k empties; fixed peels match the truncated run") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val tail = Seq((4L, 5L), (5L, 6L), (6L, 7L))
    val ns = (1L to 7L).toDF("node")
    val es = (k4 ++ tail).map { case (u, v) => (u, v, 1L) }
      .toDF("src", "dst", "weight")
    val core3 = Graph.kcore(ns, es, k = 3, maxRounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    CacheScope.release(spark)
    assert(core3 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(Graph.kcore(ns, es, k = 5, maxRounds = 8).count() == 0L)
    CacheScope.release(spark)
    // pure path at k=2 peels one level per round: 3 rounds to empty,
    // and a 1-round truncation leaves exactly the one >=2-degree node
    val pn = (1L to 5L).toDF("node")
    val pe = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .map { case (u, v) => (u, v, 1L) }.toDF("src", "dst", "weight")
    assert(Graph.kcore(pn, pe, k = 2, maxRounds = 8).count() == 0L)
    CacheScope.release(spark)
    val oneRound = Graph.kcore(pn, pe, k = 2, maxRounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    CacheScope.release(spark)
    assert(oneRound == Map(3L -> 2L))
  }
}
