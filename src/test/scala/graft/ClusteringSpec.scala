package graft

import graft.ops.Clustering

/** k-means family: exact-integer centroid assignment and the Lloyd's
  * invariants on well-separated synthetic clusters.
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  // three tight, well-separated 4-d clusters around distinct corners
  private def points = {
    val r = new scala.util.Random(7)
    val bases: Seq[Seq[Float]] = Seq(
      Seq(10f, 0f, 0f, 0f), Seq(0f, 10f, 0f, 0f), Seq(0f, 0f, 10f, 0f))
    val rows: Seq[(Long, Seq[Float])] = (0 until 30).map { i =>
      (i.toLong, bases(i % 3).map(_ + r.nextFloat() * 0.5f))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("assignCentroids: exact integer distances, argmin with cid tie-break") {
    val a = Clustering.assignCentroids(points, k = 3)
      .as[(Long, Long, Long)].collect()
    assert(a.length == 30)
    // seeds are vec_id 0,1,2 — one per cluster, so assignment must
    // recover cluster membership exactly: vec i -> centroid i%3
    a.foreach { case (vid, cid, dist) =>
      assert(cid == vid % 3, s"vec $vid assigned $cid")
      assert(dist >= 0)
      if (vid == cid) assert(dist == 0) // a seed is distance 0 to itself
    }
  }

  test("assignCentroids ties break to the smaller cid") {
    val d = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(-1f, 0f)),
      (3L, Seq(0f, 5f)) // equidistant from both seeds in quantized space
    ).toDF("vec_id", "embedding")
    val got = Clustering.assignCentroids(d, k = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(got(3L) == 1L)
  }

  test("kmeansFit: inertia is monotonically non-increasing (Lloyd's invariant)") {
    val (assigned, inertia) = Clustering.kmeansFit(points, k = 3, iters = 4)
    assert(inertia.size == 4)
    inertia.sliding(2).foreach { case Seq(a, b) => assert(b <= a + 1e-9) }
    // converged assignment still recovers the three planted clusters
    val m = assigned.select("vec_id", "cid").as[(Long, Long)].collect()
    val groups = m.groupBy(_._2).values.map(_.map(_._1 % 3).toSet)
    assert(groups.size == 3 && groups.forall(_.size == 1))
  }

  test("kmeansCellsExact: bit-deterministic trained cells that recover " +
    "cluster structure; empty input yields no cells") {
    val cells = Clustering.kmeansCellsExact(points, k = 3, iters = 3)
    assert(cells.columns.toSeq == Seq("cell", "c_emb"))
    val got = cells.orderBy("cell").as[(Long, Seq[Double])].collect()
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L), "cells keep seed ids")
    // seeds 0/1/2 are one per corner cluster, so each trained centroid's
    // dominant dimension is its cluster's corner axis
    got.foreach { case (cell, c) =>
      assert(c.indexOf(c.max) == cell.toInt,
        s"cell $cell centroid $c should peak on axis $cell")
    }
    // the oracle-parity property: re-training is bit-identical (exact
    // integer sums — no partition-order dependence to drift on)
    val again = Clustering.kmeansCellsExact(points, k = 3, iters = 3)
      .orderBy("cell").as[(Long, Seq[Double])].collect()
    assert(got.toSeq == again.toSeq, "retrain must be bit-identical")
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Clustering.kmeansCellsExact(empty, k = 3).isEmpty)
  }

  test("embeddingDrift: a cluster-concentrated batch shows the planted " +
    "shift; self-drift is zero; an empty side NULL-guards") {
    val cells = Clustering.kmeansCellsExact(points, k = 3, iters = 3)
    val batch = points.filter($"vec_id" % 3 === 0) // cluster 0 only
    val got = Clustering.embeddingDrift(points, batch, cells)
      .orderBy("cell").collect()
    assert(got.length == 3)
    val byCell = got.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5)))).toMap
    assert(byCell(0L) == ((10L, 10L, 10.0 / 30, 1.0, 1.0 - 10.0 / 30)))
    assert(byCell(1L) == ((10L, 0L, 10.0 / 30, 0.0, 0.0 - 10.0 / 30)))
    assert(byCell(2L) == ((10L, 0L, 10.0 / 30, 0.0, 0.0 - 10.0 / 30)))
    // TV distance = half the absolute shift mass
    val tv = got.map(r => math.abs(r.getDouble(5))).sum / 2
    assert(math.abs(tv - 2.0 / 3) < 1e-12)
    // self-drift: identical sides shift nowhere
    assert(Clustering.embeddingDrift(points, points, cells)
      .collect().forall(_.getDouble(5) == 0.0))
    // empty incoming: counts 0, shares/shift NULL (no distribution)
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val e = Clustering.embeddingDrift(points, empty, cells).collect()
    assert(e.forall(r => r.getLong(2) == 0L && r.isNullAt(4) && r.isNullAt(5)))
  }

  test("kmeansSweep: elbow table invariants on the separated clusters") {
    val out = Clustering.kmeansSweep(points, ks = Seq(2, 3, 30), iters = 2)
      .collect().map(r => r.getInt(0) ->
        ((r.getDouble(1), r.getInt(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out.keySet == Set(2, 3, 30))
    out.foreach { case (k, (inertia, used, mx, mn)) =>
      assert(inertia >= 0 && used <= k && mn >= 1 && mx >= mn, s"k=$k")
    }
    // 3 well-separated clusters: k=3 recovers them (10 members each)
    // and is a sharp elbow vs k=2
    assert(out(3)._2 == 3 && out(3)._3 == 10L && out(3)._4 == 10L)
    assert(out(2)._1 > out(3)._1 * 2,
      s"k=2 inertia ${out(2)._1} should dwarf k=3's ${out(3)._1}")
    // k = n: every distinct vector is its own converged cell
    assert(out(30)._1 == 0.0 && out(30)._2 == 30)
  }

  test("semanticDedup: drops higher-id near-duplicates within a cluster only") {
    // ids 0,1 seed two clusters at 90°; 2 duplicates 0's direction
    // (cos=1), 3 duplicates 1's; 4 is a cluster-0 mate below threshold;
    // 5 and 6 straddle the 45° boundary (cos(5,6)≈0.99997 — but
    // assignment puts 5 in cluster 0 and 6 in cluster 1, so the pair is
    // never compared and both survive).
    val d = Seq(
      (0L, Seq(10f, 0f)), (1L, Seq(0f, 10f)),
      (2L, Seq(9.5f, 0f)), (3L, Seq(0f, 9.5f)),
      (4L, Seq(8f, 3f)), (5L, Seq(7f, 6.95f)), (6L, Seq(6.95f, 7f))
    ).toDF("vec_id", "embedding")
    val got = Clustering.semanticDedup(d, k = 2, threshold = 0.99)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r._3).toMap
    assert(got.size == 7, "every input vector appears in the output")
    assert(got(0L) && got(1L), "lowest ids always kept")
    assert(!got(2L) && !got(3L), "exact-direction duplicates dropped")
    assert(got(4L), "below-threshold cluster-mate kept")
    assert(got(5L) && got(6L),
      "high-cos pair split across clusters is not compared")
  }

  test("semanticDedup LSH escape hatch: drops contained in exact drops, " +
    "same-direction duplicates always caught") {
    val d = Seq(
      (0L, Seq(10f, 0f)), (1L, Seq(0f, 10f)),
      (2L, Seq(9.5f, 0f)), (3L, Seq(0f, 9.5f)),
      (4L, Seq(8f, 3f)), (5L, Seq(7f, 6.95f)), (6L, Seq(6.95f, 7f))
    ).toDF("vec_id", "embedding")
    val exact = Clustering.semanticDedup(d, k = 2, threshold = 0.99)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r._3).toMap
    // lshMinClusterSize = 1: every cluster takes the banded path
    val lsh = Clustering.semanticDedup(d, k = 2, threshold = 0.99,
        lshMinClusterSize = 1, nPlanes = 16, bands = 4, dim = 2)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r._3).toMap
    assert(lsh.size == 7, "every input vector appears in the output")
    // candidates are exact-verified, so LSH can only MISS drops, never
    // add them: kept_exact ⊆ kept_lsh
    exact.foreach { case (vid, kept) =>
      if (kept) assert(lsh(vid), s"vec $vid kept by exact but dropped by LSH")
    }
    // a cos=1 pair shares the sign of every hyperplane dot → collides in
    // every band → always a candidate → always dropped
    assert(!lsh(2L) && !lsh(3L), "same-direction duplicates dropped")
    // on this fixture the banded path loses nothing: identical verdicts
    assert(lsh == exact)
  }

  test("semanticDedup: mixed cluster sizes route small exact, big banded") {
    // cluster of seed 0: 12 members (big); cluster of seed 1: 3 (small).
    // planted duplicate in each cluster must drop on its respective path.
    val r = new scala.util.Random(11)
    val bigSide = (0 until 12).map { i =>
      (if (i == 0) 0L else i + 1L,
        Seq(10f + r.nextFloat() * 0.01f, r.nextFloat() * 0.01f))
    }
    val smallSide = Seq(
      (1L, Seq(0f, 10f)), (20L, Seq(0f, 9.7f)), (21L, Seq(3f, 8f)))
    val d = (bigSide ++ smallSide).toDF("vec_id", "embedding")
    val got = Clustering.semanticDedup(d, k = 2, threshold = 0.999,
        lshMinClusterSize = 10, nPlanes = 16, bands = 8, dim = 2)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r._3).toMap
    assert(got.size == 15)
    assert(got(0L) && got(1L), "seeds kept")
    // the big cluster's near-identical members collide (tiny angular
    // spread) and drop; the small cluster's 20 drops via the exact path
    assert(!got(20L), "small-cluster duplicate dropped on exact path")
    assert(bigSide.map(_._1).count(id => !got(id)) >= 10,
      "big-cluster near-identical members dropped on banded path")
    assert(got(21L), "below-threshold small-cluster mate kept")
  }

  test("semanticDedupAgainst: corpus mates drop incoming, no self-pairing") {
    // corpus: 0 and 1 seed two clusters at 90°, 2 a cluster-0 mate at
    // ~20.6°. τ=0.99 ⇒ drop radius ≈ 8.1°. incoming: 10 duplicates
    // corpus 0's direction (dropped); 11 is cluster-1 but dissimilar
    // (kept); 12 and 13 are IDENTICAL to each other at ~10.3° — beyond
    // 8.1° of both corpus directions (0° and 20.6°), so neither has a
    // corpus mate, and both are kept (no incoming self-pairing).
    val corpus = Seq(
      (0L, Seq(10f, 0f)), (1L, Seq(0f, 10f)), (2L, Seq(8f, 3f))
    ).toDF("vec_id", "embedding")
    val incoming = Seq(
      (10L, Seq(9.5f, 0f)), (11L, Seq(3f, 8f)),
      (12L, Seq(9.84f, 1.79f)), (13L, Seq(9.84f, 1.79f))
    ).toDF("vec_id", "embedding")
    val got = Clustering.semanticDedupAgainst(corpus, incoming,
        k = 2, threshold = 0.99)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r._3).toMap
    assert(got.size == 4, "output covers exactly the incoming batch")
    assert(!got(10L), "incoming duplicate of a corpus vector dropped")
    assert(got(11L), "dissimilar incoming kept")
    assert(got(12L) && got(13L),
      "incoming-only near-pair both kept (no incoming self-pairing)")
  }

  test("empty inputs: assignment family short-circuits instead of " +
    "failing analysis") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    // with zero seed centroids the argmin literal fold is unbuildable
    // (array_min over an empty array) — these must return empty/trivial
    // results, not throw AnalysisException
    val a = Clustering.assignCentroids(empty, k = 3)
    assert(a.columns.toSeq == Seq("vec_id", "cid", "dist") && a.count() == 0)
    val sd = Clustering.semanticDedup(empty, k = 3)
    assert(sd.columns.toSeq == Seq("vec_id", "cid", "kept") && sd.count() == 0)
    val (fit, inertia) = Clustering.kmeansFit(empty, k = 3, iters = 2)
    assert(fit.columns.toSeq == Seq("vec_id", "cid", "dist") && fit.count() == 0)
    assert(inertia == Seq(0.0, 0.0))
  }

  test("semanticDedupAgainst: empty corpus (bootstrap) keeps every " +
    "incoming vector") {
    val corpus = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val incoming = Seq(
      (10L, Seq(9.5f, 0f)), (11L, Seq(9.5f, 0f))
    ).toDF("vec_id", "embedding")
    val got = Clustering.semanticDedupAgainst(corpus, incoming, k = 2)
      .as[(Long, Option[Long], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.size == 2)
    // nothing landed ⇒ nothing to duplicate: both kept (even though they
    // duplicate EACH OTHER — no incoming self-pairing, as in the
    // non-bootstrap contract), with no cluster geometry yet (null cid)
    assert(got(10L) == ((None, true)) && got(11L) == ((None, true)))
  }

  test("persisted centroid model: geometry is stable across runs even " +
    "when corpus churn would change the seeds") {
    val dir = java.nio.file.Files.createTempDirectory("centmodel").toString
    val model = s"$dir/centroids"
    val corpus1 = Seq(
      (10L, Seq(10f, 0f)), (11L, Seq(0f, 10f)), (12L, Seq(8f, 3f))
    ).toDF("vec_id", "embedding")
    val incoming = Seq(
      (100L, Seq(9.5f, 0f)), (101L, Seq(3f, 8f))
    ).toDF("vec_id", "embedding")
    // run 1: no committed model — fits from corpus1 and commits v1
    val run1 = Clustering.semanticDedupAgainst(corpus1, incoming,
        k = 2, threshold = 0.99, modelTable = Some(model))
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(graft.io.Manifest.currentVersion(spark, model).contains(1))
    // run 2: corpus gains LOWER vec_ids — a re-derive would pick
    // different seeds (0,1 instead of 10,11) and flip the geometry; the
    // persisted model must hold it bit-identical, without a new commit
    val corpus2 = Seq(
      (0L, Seq(7f, 7f)), (1L, Seq(-10f, 0f)),
      (10L, Seq(10f, 0f)), (11L, Seq(0f, 10f)), (12L, Seq(8f, 3f))
    ).toDF("vec_id", "embedding")
    val run2 = Clustering.semanticDedupAgainst(corpus2, incoming,
        k = 2, threshold = 0.99, modelTable = Some(model))
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(run2.map(r => r._1 -> r._2) == run1.map(r => r._1 -> r._2),
      "cid assignment must be identical across runs under the same model")
    assert(graft.io.Manifest.currentVersion(spark, model).contains(1),
      "second run reads the model, never re-commits")
    // sanity: without the model, run 2's re-derived seeds DO differ
    // (vec 100 lands in a different cluster) — the instability the
    // persisted model exists to prevent
    val fresh = Clustering.semanticDedupAgainst(corpus2, incoming,
        k = 2, threshold = 0.99)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(fresh.map(r => r._1 -> r._2) != run1.map(r => r._1 -> r._2))
    // deliberate refresh: commits v2 from the current corpus
    assert(Clustering.centroidModelRefresh(corpus2, model, k = 2) == 2)
    assert(graft.io.Manifest.currentVersion(spark, model).contains(2))
  }

  test("kmeansParallelInit: deterministic, spreads seeds where id-seeding " +
    "collapses, and fitParallel beats id-seeded inertia there") {
    // pathological for id seeding: the three lowest ids all sit in
    // cluster A near the origin, and B/C both lie FAR in +x with a small
    // ±y split — every stacked seed sees B and C through its x
    // coordinate, so ONE seed captures B∪C and Lloyd's can never split
    // them (a stable local optimum); d²-biased oversampling must instead
    // place seeds in both
    val r = new scala.util.Random(5)
    def around(cx: Float, cy: Float, i: Long) =
      (i, Seq(cx + r.nextFloat() * 0.2f, cy + r.nextFloat() * 0.2f))
    val rows =
      (0L to 9L).map(around(0f, 0f, _)) ++
      (10L to 19L).map(around(100f, 3f, _)) ++
      (20L to 29L).map(around(100f, -3f, _))
    val d = rows.toDF("vec_id", "embedding")

    val init1 = Clustering.kmeansParallelInit(d, k = 3)
    val init2 = Clustering.kmeansParallelInit(d, k = 3)
    assert(init1 == init2, "seeded-hash init must be bit-reproducible")
    assert(init1.size == 3 && init1.map(_._1) == Seq(0L, 1L, 2L),
      "cids are 0..k-1 in selection order")
    // each planted cluster contributes exactly one seed
    def clusterOf(v: Seq[Double]): Int =
      if (v.head < 50) 0 else if (v(1) > 0) 1 else 2
    assert(init1.map(p => clusterOf(p._2)).distinct.size == 3,
      s"seeds must spread across the planted clusters: ${init1.map(_._2)}")

    val (_, seededInertia) = Clustering.kmeansFit(d, k = 3, iters = 6)
    val (assigned, parInertia) =
      Clustering.kmeansFitParallel(d, k = 3, iters = 6)
    assert(parInertia.last < seededInertia.last / 10,
      s"parallel init must beat stacked id seeds decisively: " +
        s"par=${parInertia.last} id=${seededInertia.last}")
    // with one seed per planted cluster, the fit recovers the planting
    val m = assigned.select("vec_id", "cid").as[(Long, Long)].collect()
    val groups = m.groupBy(_._2).values.map(_.map(_._1 / 10).toSet).toSeq
    assert(groups.size == 3 && groups.forall(_.size == 1))
  }

  test("kmeansParallelInit: picks are independent of input partitioning " +
    "(the property the exact-decimal cost sum exists for)") {
    val r = new scala.util.Random(5)
    val rows = (0L until 60L).map(i =>
      (i, Seq(r.nextFloat() * 20f, r.nextFloat() * 20f)))
    val d = rows.toDF("vec_id", "embedding")
    // different partition counts → different double-sum accumulation
    // orders; φ (and therefore every Bernoulli pick) must not move
    val byPart = Seq(1, 3, 13).map { n =>
      Clustering.kmeansParallelInit(d.repartition(n), k = 4)
    }
    assert(byPart.distinct.size == 1,
      "init must be identical under any partitioning")
  }

  test("kmeansParallelInit: magnitude-free — tiny-scale embeddings still " +
    "yield k spread seeds (normalized exact-decimal cost)") {
    // coordinates ~1e-6 ⇒ d² ~1e-12: a fixed-scale decimal cost sum
    // would truncate every distance to zero and collapse the init to a
    // single center; the max-normalized cost must keep the sampling
    // scale-free (identical picks to the unit-scale corpus)
    val r = new scala.util.Random(5)
    def around(cx: Float, cy: Float, i: Long, s: Float) =
      (i, Seq((cx + r.nextFloat() * 0.2f) * s, (cy + r.nextFloat() * 0.2f) * s))
    def corpus(s: Float) = {
      r.setSeed(5)
      ((0L to 9L).map(around(0f, 0f, _, s)) ++
        (10L to 19L).map(around(100f, 3f, _, s)) ++
        (20L to 29L).map(around(100f, -3f, _, s))).toDF("vec_id", "embedding")
    }
    val tiny = Clustering.kmeansParallelInit(corpus(1e-6f), k = 3)
    assert(tiny.size == 3, s"tiny-scale init collapsed: ${tiny.size} centers")
    val unit = Clustering.kmeansParallelInit(corpus(1f), k = 3)
    // scale-free sampling: the same vec_ids are chosen at both scales
    // (quantization of the stored embedding differs only by the scale)
    assert(tiny.map(_._2.map(_ * 1e6).map(math.round)) ==
      unit.map(_._2.map(math.round(_))),
      "normalized cost must make the picks scale-invariant")
  }

  test("kmeansFit: an emptied cluster keeps its previous centroid") {
    // k=3 over two real clusters: seeds 0,1 are both in cluster A
    // (ids 0,1 mod nothing — craft directly)
    val d = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(0.1f, 0f)), (2L, Seq(0.2f, 0f)),
      (3L, Seq(10f, 10f)), (4L, Seq(10.1f, 10f))
    ).toDF("vec_id", "embedding")
    val (assigned, inertia) = Clustering.kmeansFit(d, k = 3, iters = 3)
    assert(inertia.size == 3)
    // no crash, all points assigned, inertia finite
    assert(assigned.count() == 5 && inertia.forall(_.isFinite))
  }
}
