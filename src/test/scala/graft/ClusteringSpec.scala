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
