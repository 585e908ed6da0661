package graft

import graft.ops.text.Fuzzy
import org.apache.spark.sql.functions._

/** Edit-distance self-join: losslessness of the Ed-Join prefix filter
  * against the naive all-pairs scan, short-string handling, and plan shape
  * (equi-joins only — no nested loop anywhere).
  */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  /** The one reference Levenshtein DP every naive helper shares. */
  private def lev(a: String, b: String): Int = {
    val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
        m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    m(a.length)(b.length)
  }

  private def naive(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib
      dist = lev(sa, sb)
      if dist <= d
    } yield (ia, ib, dist)).toSet

  /** Shared even-corpus / odd-incoming mutated fixture for the
    * asymmetric tests: 30 seed words, incoming = ≤3-edit mutations,
    * plus shorts planted on BOTH sides so every candidate path fires.
    */
  private def mutatedSplitFixture(seed: Int)
      : (Seq[(Long, String)], Seq[(Long, String)]) = {
    val rng = new scala.util.Random(seed)
    val alpha = "abcdefgh"
    def word() = Seq.fill(6 + rng.nextInt(9))(alpha(rng.nextInt(alpha.length))).mkString
    def mutate(s: String, k: Int): String = (1 to k).foldLeft(s) { (t, _) =>
      val i = rng.nextInt(t.length)
      rng.nextInt(3) match {
        case 0 => t.updated(i, alpha(rng.nextInt(alpha.length)))
        case 1 => t.take(i) + t.drop(i + 1)
        case _ => t.take(i) + alpha(rng.nextInt(alpha.length)) + t.drop(i)
      }
    }
    val seeds = Seq.fill(30)(word())
    val corp = seeds.zipWithIndex.map { case (s, i) => (2L * i, s) } ++
      Seq((200L, "ab"), (202L, "xy"))
    val inc = seeds.zipWithIndex.map { case (s, i) =>
      (2L * i + 1, mutate(s, rng.nextInt(4))) } ++
      Seq((201L, "ab"), (203L, "q"))
    (corp, inc)
  }

  private def run(rows: Seq[(Long, String)], d: Int, q: Int = 2) =
    Fuzzy.editDistanceJoin(rows.toDF("id", "s"), "id", "s", maxDist = d, q = q)
      .as[(Long, Long, Int)].collect().toSet

  private def runSeg(rows: Seq[(Long, String)], d: Int) =
    Fuzzy.editDistanceJoinPartitioned(rows.toDF("id", "s"), "id", "s", maxDist = d)
      .as[(Long, Long, Int)].collect().toSet

  test("known pairs: exact dups, single edits, and misses") {
    val rows = Seq(1L -> "spark engine", 2L -> "spark engine",
      3L -> "spark enginX", 4L -> "spork enginX", 5L -> "completely different")
    val got = run(rows, d = 1)
    assert(got.contains((1L, 2L, 0)), "exact duplicate at distance 0")
    assert(got.contains((1L, 3L, 1)) && got.contains((2L, 3L, 1)))
    assert(got.contains((3L, 4L, 1)))
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L))
    assert(got == naive(rows, 1))
  }

  test("prefix filter is lossless vs naive all-pairs on mutated random strings") {
    val rng = new scala.util.Random(1234)
    val alpha = "abcdefg"
    def word() = Seq.fill(6 + rng.nextInt(9))(alpha(rng.nextInt(alpha.length))).mkString
    // seed strings plus mutated near-copies (insert/delete/substitute), so
    // the truth set is rich at every distance 0..3
    val seeds = Seq.fill(40)(word())
    def mutate(s: String, k: Int): String = (1 to k).foldLeft(s) { (t, _) =>
      val i = rng.nextInt(t.length)
      rng.nextInt(3) match {
        case 0 => t.updated(i, alpha(rng.nextInt(alpha.length)))
        case 1 if t.length > 2 => t.take(i) + t.drop(i + 1)
        case _ => t.take(i) + alpha(rng.nextInt(alpha.length)) + t.drop(i)
      }
    }
    val rows = (seeds ++ seeds.map(mutate(_, 1)) ++ seeds.map(mutate(_, 2)) ++
      seeds.map(mutate(_, 3))).zipWithIndex.map { case (s, i) => (i.toLong, s) }
    for (d <- Seq(1, 2)) {
      assert(run(rows, d) == naive(rows, d), s"divergence at maxDist=$d")
    }
    // q=3 must agree too (prefix length scales with q)
    assert(run(rows, 2, q = 3) == naive(rows, 2))
  }

  test("short strings pair through the length buckets, never lost") {
    // with q=2, d=2 the gram-count bound is defeated below 6 chars:
    // "ab" vs "cd" share no grams yet sit at distance 2
    val rows = Seq(1L -> "ab", 2L -> "cd", 3L -> "abxyz", 4L -> "cdxyz",
      5L -> "a very much longer string")
    val got = run(rows, d = 2)
    assert(got == naive(rows, 2))
    assert(got.contains((1L, 2L, 2)), "gram-free short pair must survive")
  }

  test("plans equi-joins only: no nested loop or cartesian product") {
    val rows = Seq(1L -> "ab", 2L -> "abcdefghij")
    for (df <- Seq(
      Fuzzy.editDistanceJoin(rows.toDF("id", "s"), "id", "s", 2),
      Fuzzy.editDistanceJoinPartitioned(rows.toDF("id", "s"), "id", "s", 2))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"fuzzy join must stay equi-keyed:\n$plan")
    }
  }

  test("partitioned variant: segment pigeonhole is lossless vs naive all-pairs") {
    val rng = new scala.util.Random(4321)
    val alpha = "abcdefg"
    def word() = Seq.fill(6 + rng.nextInt(9))(alpha(rng.nextInt(alpha.length))).mkString
    def mutate(s: String, k: Int): String = (1 to k).foldLeft(s) { (t, _) =>
      val i = rng.nextInt(t.length)
      rng.nextInt(3) match {
        case 0 => t.updated(i, alpha(rng.nextInt(alpha.length)))
        case 1 if t.length > 2 => t.take(i) + t.drop(i + 1)
        case _ => t.take(i) + alpha(rng.nextInt(alpha.length)) + t.drop(i)
      }
    }
    val seeds = Seq.fill(40)(word())
    val rows = (seeds ++ seeds.map(mutate(_, 1)) ++ seeds.map(mutate(_, 2)) ++
      seeds.map(mutate(_, 3))).zipWithIndex.map { case (s, i) => (i.toLong, s) }
    for (d <- Seq(0, 1, 2))
      assert(runSeg(rows, d) == naive(rows, d), s"divergence at maxDist=$d")
    // strings below maxDist+1 chars (no nonempty segmentation) go through
    // the length buckets — including the empty string
    val shorts = Seq(1L -> "", 2L -> "a", 3L -> "ab", 4L -> "cd",
      5L -> "abxyz", 6L -> "a very much longer string")
    for (d <- Seq(0, 1, 2))
      assert(runSeg(shorts, d) == naive(shorts, d), s"short divergence at maxDist=$d")
  }

  test("edJoinAudit: exact bucket-pair census on a known corpus") {
    // three identical 6-char strings, q=2, d=1 → prefixLen 3; every
    // prefix bucket holds all three strings → 3 buckets × C(3,2)=3
    val rows = Seq(1L -> "abcdef", 2L -> "abcdef", 3L -> "abcdef")
    val a = Fuzzy.edJoinAudit(rows.toDF("id", "s"), "id", "s", maxDist = 1)
    assert(a.nStrings == 3 && a.candidatePairs == 9)
    assert(a.candidatesPerString == 3.0)
    // empty input: zero everything, no divide-by-zero
    val e = Fuzzy.edJoinAudit(Seq.empty[(Long, String)].toDF("id", "s"),
      "id", "s", maxDist = 1)
    assert(e.nStrings == 0 && e.candidatePairs == 0 &&
      e.candidatesPerString == 0.0)
  }

  test("autoRegime: partition on a gram-poor vocabulary corpus, prefix " +
    "on high-entropy strings") {
    val rng = new scala.util.Random(99)
    // gram-poor: every string is 3 words from a 4-word vocabulary — all
    // trigrams are corpus-common, prefix buckets grow with n (the sf1
    // sweep's regime, miniaturized)
    val vocab = Seq("alpha", "beta", "gamma", "delta")
    val poor = (0 until 300).map(i =>
      (i.toLong, Seq.fill(3)(vocab(rng.nextInt(4))).mkString(" ")))
    assert(Fuzzy.autoRegime(poor.toDF("id", "s"), "id", "s",
      maxDist = 2, q = 3) == "partition")
    // high-entropy: uniform 36-char alphanumerics — nearly every trigram
    // is unique to its string, buckets stay singleton
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    val rich = (0 until 300).map(i =>
      (i.toLong, Seq.fill(20)(alpha(rng.nextInt(36))).mkString))
    assert(Fuzzy.autoRegime(rich.toDF("id", "s"), "id", "s",
      maxDist = 2, q = 3) == "prefix")
  }

  test("autoRegime: a short-dominated corpus (quadratic length-bucket " +
    "path) dispatches to partition, not prefix") {
    // len-4 SKU-like codes: with q=3, d=2 every string is SHORT (len <=
    // 8), the prefix census is empty, and Ed-Join would pair them all
    // through the +/-2 length buckets — ~n^2 candidates. The audit's
    // short-path estimate must catch this and pick the segment regime
    // (which handles len >= 3 with selective segment keys).
    val rng = new scala.util.Random(17)
    val alpha = "abcdefghij"
    val shorts = (0 until 300).map(i =>
      (i.toLong, Seq.fill(4)(alpha(rng.nextInt(10))).mkString))
    val a = Fuzzy.edJoinAudit(shorts.toDF("id", "s"), "id", "s",
      maxDist = 2, q = 3)
    assert(a.nStrings == 300, "short strings must count toward the census")
    assert(a.candidatesPerString > 64,
      s"length-bucket explosion must be visible: ${a.candidatesPerString}")
    assert(Fuzzy.autoRegime(shorts.toDF("id", "s"), "id", "s",
      maxDist = 2, q = 3) == "partition")
    // and the dispatched join is still exact — AND the abandoned prefix
    // table's CacheScope entry goes with its blocks (unpin, not bare
    // unpersist: a long-lived session hitting this branch repeatedly
    // must not accumulate dead registry references)
    val before = graft.CacheScope.pinnedCount(spark)
    val auto = Fuzzy.editDistanceJoinAuto(shorts.toDF("id", "s"), "id", "s",
      maxDist = 2, q = 3).as[(Long, Long, Int)].collect().toSet
    assert(auto == naive(shorts, 2))
    assert(graft.CacheScope.pinnedCount(spark) == before,
      "segment dispatch must unpin the abandoned prefix table")
  }

  test("editDistanceJoinAuto: identical pairs to both fixed regimes " +
    "whichever way it dispatches") {
    val rng = new scala.util.Random(7)
    val vocab = Seq("alpha", "beta", "gamma", "delta")
    val poor = (0 until 60).map(i =>
      (i.toLong, Seq.fill(3)(vocab(rng.nextInt(4))).mkString(" ")))
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    val rich = (0 until 60).map(i =>
      (i.toLong, Seq.fill(12)(alpha(rng.nextInt(36))).mkString))
    for (rows <- Seq(poor, rich)) {
      val auto = Fuzzy.editDistanceJoinAuto(rows.toDF("id", "s"), "id", "s",
        maxDist = 2, q = 3).as[(Long, Long, Int)].collect().toSet
      assert(auto == naive(rows, 2))
      assert(auto == runSeg(rows, 2) && auto == run(rows, 2, q = 3))
    }
    // maxDist = 0 degenerates to exact-duplicate pairing (prefixLen 1,
    // single whole-string segment) — must still be exact through the
    // dispatcher, including its duplicate pairs
    val dups = poor.take(20) ++ poor.take(20).map { case (i, s) => (i + 100, s) }
    val auto0 = Fuzzy.editDistanceJoinAuto(dups.toDF("id", "s"), "id", "s",
      maxDist = 0, q = 3).as[(Long, Long, Int)].collect().toSet
    assert(auto0 == naive(dups, 0) && auto0.nonEmpty)
  }

  test("auto prefix path reuses the censused prefix table (cached, not " +
    "recomputed)") {
    val rng = new scala.util.Random(23)
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    val rich = (0 until 100).map(i =>
      (i.toLong, Seq.fill(15)(alpha(rng.nextInt(36))).mkString))
    val df = Fuzzy.editDistanceJoinAuto(rich.toDF("id", "s"), "id", "s",
      maxDist = 2, q = 3)
    // the census materialized the prefix into the cache; the join plan
    // must read it from memory instead of re-running explode/freq/top-k
    assert(df.queryExecution.executedPlan.toString
      .contains("InMemoryTableScan"),
      "prefix-path auto join must reuse the cached prefix table")
    spark.catalog.clearCache()
  }

  test("both variants return identical pairs on the documents fixture") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"), substring(col("text"), 1, 20).as("s"))
    val prefix = Fuzzy.editDistanceJoin(docs, "id", "s", maxDist = 2, q = 3)
      .as[(Long, Long, Int)].collect().toSet
    val seg = Fuzzy.editDistanceJoinPartitioned(docs, "id", "s", maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(prefix.nonEmpty && prefix == seg)
  }

  /** Naive CROSS truth for the asymmetric family: every (inc, corp)
    * pair within d, both directions of shortness exercised by callers.
    */
  private def naiveCross(inc: Seq[(Long, String)], corp: Seq[(Long, String)],
                         d: Int): Set[(Long, Long, Int)] = {
    (for { (ii, si) <- inc; (ic, sc) <- corp; dd = lev(si, sc); if dd <= d }
      yield (ii, ic, dd)).toSet
  }

  test("editDistanceAgainst: lossless vs naive cross on mutated strings, " +
    "shorts in BOTH sides, no corpus self-pairing") {
    val (corp, inc) = mutatedSplitFixture(77)
    val got = Fuzzy.editDistanceAgainst(
      corp.toDF("id", "s"), inc.toDF("id", "s"), "id", "s",
      maxDist = 2, q = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == naiveCross(inc, corp, 2), s"got ${got.size} pairs")
    assert(got.exists(_._3 == 0), "exact re-ingest must surface as dist 0")
  }

  test("editDistanceAgainstPartitioned: segment pigeonhole lossless vs " +
    "naive cross, shorts in BOTH sides; auto dispatches and matches both") {
    val (corp, inc) = mutatedSplitFixture(99)
    val want = naiveCross(inc, corp, 2)
    val seg = Fuzzy.editDistanceAgainstPartitioned(
      corp.toDF("id", "s"), inc.toDF("id", "s"), "id", "s", maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(seg == want, s"seg ${seg.size} vs naive ${want.size}")
    val auto = Fuzzy.editDistanceAgainstAuto(
      corp.toDF("id", "s"), inc.toDF("id", "s"), "id", "s", maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    graft.CacheScope.release(spark)
    assert(auto == want)
  }

  test("editDistanceAgainstSegIndex: persisted segment registry serve " +
    "equals inline; update is append==rebuild; retract restores exactly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"), substring(col("text"), 1, 20).as("s"))
    val corpus = docs.filter($"id" % 2 === 0)
    val incoming = docs.filter($"id" % 2 === 1)
    val table = java.nio.file.Files
      .createTempDirectory("graft_segidx").toString + "/segidx"
    assert(Fuzzy.segIndexRefresh(corpus, table, "id", "s", maxDist = 2) == 1)
    val registry = graft.io.Manifest.read(spark, table)
    val served = Fuzzy.editDistanceAgainstSegIndex(registry, corpus, incoming,
      "id", "s", maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    val inline = Fuzzy.editDistanceAgainstPartitioned(corpus, incoming,
      "id", "s", maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(served == inline && served.nonEmpty,
      s"served=${served.size} inline=${inline.size}")
    // ... and both equal the gram-prefix asym (cross-regime equality)
    val gram = Fuzzy.editDistanceAgainst(corpus, incoming, "id", "s",
      maxDist = 2, q = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(served == gram)

    val batch = incoming.filter($"id" < 40)
    assert(Fuzzy.segIndexUpdate(table, batch, "id", "s", maxDist = 2) == 2)
    val afterUpdate = graft.io.Manifest.read(spark, table)
      .as[(Long, Long, Option[Int], Option[String], Int)].collect().toSet
    val rebuilt = Fuzzy.segIndex(corpus.unionByName(batch), "id", "s",
      maxDist = 2)
      .as[(Long, Long, Option[Int], Option[String], Int)].collect().toSet
    assert(afterUpdate == rebuilt, "append must equal rebuild")
    assert(Fuzzy.segIndexRetract(table, batch.select($"id"), "id") == 3)
    assert(graft.io.Manifest.read(spark, table)
      .as[(Long, Long, Option[Int], Option[String], Int)].collect().toSet ==
      Fuzzy.segIndex(corpus, "id", "s", maxDist = 2)
        .as[(Long, Long, Option[Int], Option[String], Int)].collect().toSet)
  }

  /** Brute-force SNM replay: global (key, id) positions per pass, pairs
    * within w in EITHER order, exact-distance verify. */
  private def naiveSnm(rows: Seq[(Long, String)], w: Int,
                       d: Int): Set[(Long, Long, Int)] = {
    def passPairs(key: ((Long, String)) => String): Set[(Long, Long)] = {
      val order = rows.sortBy(r => (key(r), r._1)).map(_._1).toArray
      (for {
        i <- order.indices; j <- (i + 1) to math.min(i + w, order.length - 1)
      } yield (math.min(order(i), order(j)), math.max(order(i), order(j)))).toSet
    }
    val cand = passPairs(_._2) ++ passPairs(r => r._2.reverse)
    val byId = rows.toMap
    cand.map { case (a, b) => (a, b, lev(byId(a), byId(b))) }
      .filter(_._3 <= d)
  }

  test("sortedNeighborhoodPairs: blocked-rank positions replay the global " +
    "sorted order exactly (both passes), windows union, verify is exact") {
    val rng = new scala.util.Random(4242)
    val alpha = "abcdef"
    def word() = Seq.fill(5 + rng.nextInt(10))(alpha(rng.nextInt(alpha.length))).mkString
    val rows = (0 until 120).map(i => (i.toLong, word())) ++
      // planted near-dups: head-corrupted (reversed pass catches) and
      // tail-corrupted (forward pass catches)
      Seq((200L, "zzhello world tail"), (201L, "axhello world tail"),
          (202L, "prefix same headzz"), (203L, "prefix same headax"))
    val w = 8
    val got = Fuzzy.sortedNeighborhoodPairs(
      rows.toDF("id", "s"), "id", "s", window = w, maxDist = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == naiveSnm(rows, w, 3), s"got ${got.size} pairs")
    // a wider window can only add pairs
    val wider = Fuzzy.sortedNeighborhoodPairs(
      rows.toDF("id", "s"), "id", "s", window = 2 * w, maxDist = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(got.subsetOf(wider))
  }

  test("editDistanceJoinTiered: a both-regimes-flooded corpus routes to " +
    "SNM only under allowLossy, with the mandatory fresh certificate") {
    val rng = new scala.util.Random(99)
    // every string is 3 words from a 4-word vocabulary: all grams are
    // corpus-common (prefix buckets grow with n) AND segment values
    // collide (<= 64 distinct strings) — the boilerplate signature where
    // BOTH lossless regimes flood
    val vocab = Seq("alpha", "beta", "gamma", "delta")
    val poor = (0 until 300).map(i =>
      (i.toLong, Seq.fill(3)(vocab(rng.nextInt(4))).mkString(" ")))
    val df = poor.toDF("id", "s")
    assert(Fuzzy.edJoinAudit(df, "id", "s", maxDist = 2, q = 3)
      .candidatesPerString > 64, "prefix census must flood here")
    assert(Fuzzy.segJoinAudit(df, "id", "s", maxDist = 2)
      .candidatesPerString > 64, "segment census must flood here")
    // default: LOSSLESS — the less-bad segment regime, exact output, no
    // certificate, whatever the segment census says
    val lossless = Fuzzy.editDistanceJoinTiered(df, "id", "s",
      maxDist = 2, q = 3)
    assert(lossless.regime == "partition" && lossless.certificate.isEmpty)
    assert(lossless.pairs.as[(Long, Long, Int)].collect().toSet ==
      naive(poor, 2))
    // an uncertified lossy run is refused outright
    intercept[IllegalArgumentException] {
      Fuzzy.editDistanceJoinTiered(df, "id", "s", maxDist = 2, q = 3,
        allowLossy = true)
    }
    // opt-in: SNM pairs + the freshly-computed certificate in ONE run
    val slice = df.filter($"id" < 60)
    val snm = Fuzzy.editDistanceJoinTiered(df, "id", "s", maxDist = 2,
      q = 3, allowLossy = true, snmWindow = 10, certSlice = Some(slice))
    assert(snm.regime == "snm" && snm.certificate.isDefined)
    assert(snm.pairs.as[(Long, Long, Int)].collect().toSet ==
      Fuzzy.sortedNeighborhoodPairs(df, "id", "s", window = 10, maxDist = 2)
        .as[(Long, Long, Int)].collect().toSet)
    val cert = snm.certificate.get.collect().head
    val expect = Fuzzy.snmRecallEval(slice, "id", "s", window = 10,
      maxDist = 2).collect().head
    assert(cert.toSeq == expect.toSeq,
      "the certificate must BE snmRecallEval's row over the slice")
    graft.CacheScope.release(spark)
    // a high-entropy corpus stays on tier 1 even with allowLossy on
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    val rich = (0 until 100).map(i =>
      (i.toLong, Seq.fill(15)(alpha(rng.nextInt(36))).mkString))
    val r = Fuzzy.editDistanceJoinTiered(rich.toDF("id", "s"), "id", "s",
      maxDist = 2, q = 3, allowLossy = true,
      certSlice = Some(rich.toDF("id", "s")))
    assert(r.regime == "prefix" && r.certificate.isEmpty)
    graft.CacheScope.release(spark)
  }

  test("segJoinAudit: key-census product matches the segment join's own " +
    "candidate volume direction on known corpora") {
    // identical strings: every segment key collides — the census must
    // predict a flood (n=40 copies -> ~n^2/2 pairs per... actually all
    // three keys shared by all 40)
    val dup = (0 until 40).map(i => (i.toLong, "alpha beta gamma"))
    val aDup = Fuzzy.segJoinAudit(dup.toDF("id", "s"), "id", "s", maxDist = 2)
    assert(aDup.nStrings == 40)
    assert(aDup.candidatesPerString > 20,
      s"all-identical corpus must flood: ${aDup.candidatesPerString}")
    // high-entropy strings: segment values are unique, census near zero
    val rng = new scala.util.Random(5)
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    val rich = (0 until 100).map(i =>
      (i.toLong, Seq.fill(15)(alpha(rng.nextInt(36))).mkString))
    val aRich = Fuzzy.segJoinAudit(rich.toDF("id", "s"), "id", "s", maxDist = 2)
    assert(aRich.candidatesPerString < 8,
      s"high-entropy corpus must not flood: ${aRich.candidatesPerString}")
  }

  test("a registry committed BEFORE parameter stamping fails serve/update/" +
    "retract with the rebuild remedy, never an unresolved column") {
    val corpus = (0 until 20)
      .map(i => (i.toLong, s"corpus string number $i")).toSeq
      .toDF("id", "s")
    val dir = java.nio.file.Files.createTempDirectory("legacyreg").toString
    val table = s"$dir/segs"
    // the pre-r14 registry shape: stamp columns absent
    graft.io.Manifest.write(
      Fuzzy.segIndex(corpus, "id", "s", maxDist = 2).drop("max_dist"), table)
    val probe = corpus.filter($"id" < 3)
    val eServe = intercept[IllegalArgumentException] {
      Fuzzy.editDistanceAgainstSegIndex(
        graft.io.Manifest.read(spark, table), corpus, probe,
        "id", "s", maxDist = 2)
    }
    assert(eServe.getMessage.contains("rebuild") &&
      eServe.getMessage.contains("max_dist"), eServe.getMessage)
    intercept[IllegalArgumentException] {
      Fuzzy.segIndexUpdate(table, probe, "id", "s", maxDist = 2)
    }
    intercept[IllegalArgumentException] {
      Fuzzy.segIndexRetract(table, probe.select($"id"), "id")
    }
    // same contract at the gram family
    val table2 = s"$dir/grams"
    graft.io.Manifest.write(
      Fuzzy.edIndex(corpus, "id", "s", maxDist = 2, q = 3)
        .drop("max_dist", "gram_q"), table2)
    val eGram = intercept[IllegalArgumentException] {
      Fuzzy.editDistanceAgainstIndex(
        graft.io.Manifest.read(spark, table2), corpus, probe,
        "id", "s", maxDist = 2, q = 3)
    }
    assert(eGram.getMessage.contains("rebuild"), eGram.getMessage)
    intercept[IllegalArgumentException] {
      Fuzzy.edIndexUpdate(table2, probe, "id", "s", maxDist = 2, q = 3)
    }
    intercept[IllegalArgumentException] {
      Fuzzy.edIndexRetract(table2, probe.select($"id"), "id")
    }
    // VALUE mismatch (columns present, parameters different): an update
    // at maxDist=3 on a maxDist=2 registry must fail at the update, not
    // commit a mixed-stamp version that bricks every later serve
    val table3 = s"$dir/segs_v"
    assert(Fuzzy.segIndexRefresh(corpus, table3, "id", "s", maxDist = 2) == 1)
    val eVal = intercept[Exception] {
      Fuzzy.segIndexUpdate(table3, probe, "id", "s", maxDist = 3)
    }
    assert(eVal.getMessage.contains("different parameters"),
      s"got: ${eVal.getMessage}")
    assert(graft.io.Manifest.currentVersion(spark, table3).contains(1),
      "the mismatched update must not commit a new version")
    val table4 = s"$dir/grams_v"
    assert(Fuzzy.edIndexRefresh(corpus, table4, "id", "s",
      maxDist = 2, q = 3) == 1)
    val eVal2 = intercept[Exception] {
      Fuzzy.edIndexUpdate(table4, probe, "id", "s", maxDist = 2, q = 2)
    }
    assert(eVal2.getMessage.contains("different parameters"),
      s"got: ${eVal2.getMessage}")
    assert(graft.io.Manifest.currentVersion(spark, table4).contains(1))
  }

  test("snmRecallEval: counts match brute force; SNM is NOT lossless and " +
    "the certificate says so") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"), substring(col("text"), 1, 20).as("s"))
    val rows = docs.as[(Long, String)].collect().toSeq
    val w = 10
    val truth = naive(rows, 2)
    val candAll = naiveSnm(rows, w, 2)
    val one = Fuzzy.snmRecallEval(docs, "id", "s", window = w, maxDist = 2)
      .select("n_docs", "n_truth", "n_hit")
      .as[(Long, Long, Long)].collect().head
    graft.CacheScope.release(spark)
    assert(one._1 == rows.size.toLong)
    assert(one._2 == truth.size.toLong)
    // hits = truth pairs the two-pass window surfaced = verified SNM pairs
    assert(one._3 == candAll.size.toLong,
      s"n_hit ${one._3} != verified SNM pairs ${candAll.size}")
    assert(one._3 <= one._2)
  }

  test("snmWindowSweep: per-window rows equal the single-window " +
    "certificate; truth shared; candidates monotone in window") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"), substring(col("text"), 1, 20).as("s"))
    val windows = Seq(4, 10, 25)
    val sweep = Fuzzy.snmWindowSweep(docs, "id", "s", windows, maxDist = 2)
      .select("window", "n_truth", "n_cand", "n_hit")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    graft.CacheScope.release(spark)
    assert(sweep.map(_._1).toSeq == windows)
    assert(sweep.map(_._2).distinct.length == 1, "one shared truth")
    windows.zip(sweep).foreach { case (w, row) =>
      val single = Fuzzy.snmRecallEval(docs, "id", "s", window = w, maxDist = 2)
        .select("n_truth", "n_cand", "n_hit")
        .as[(Long, Long, Long)].collect().head
      graft.CacheScope.release(spark)
      assert((row._2, row._3, row._4) == single,
        s"window $w: sweep $row vs single $single")
    }
    val cands = sweep.map(_._3)
    assert(cands.zip(cands.tail).forall { case (a, b) => a <= b })
  }

  test("editDistanceAgainstIndex: persisted-registry serve equals inline; " +
    "edIndexUpdate is append==rebuild; retract restores exactly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"), substring(col("text"), 1, 20).as("s"))
    val corpus = docs.filter($"id" % 2 === 0)
    val incoming = docs.filter($"id" % 2 === 1)
    val table = java.nio.file.Files
      .createTempDirectory("graft_edidx").toString + "/edidx"
    assert(Fuzzy.edIndexRefresh(corpus, table, "id", "s", maxDist = 2, q = 3) == 1)
    val registry = graft.io.Manifest.read(spark, table)
    val served = Fuzzy.editDistanceAgainstIndex(registry, corpus, incoming,
      "id", "s", maxDist = 2, q = 3)
      .as[(Long, Long, Int)].collect().toSet
    val inline = Fuzzy.editDistanceAgainst(corpus, incoming, "id", "s",
      maxDist = 2, q = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(served == inline, s"served=${served.size} inline=${inline.size}")
    assert(served.nonEmpty)

    // hash order is corpus-independent: update's append reads
    // bit-identical to a rebuild over corpus ∪ batch
    val batch = incoming.filter($"id" < 40)
    assert(Fuzzy.edIndexUpdate(table, batch, "id", "s", maxDist = 2, q = 3) == 2)
    val afterUpdate = graft.io.Manifest.read(spark, table)
      .as[(Long, Long, Option[String], Option[Int], Int, Int)].collect().toSet
    val rebuilt = Fuzzy.edIndex(corpus.unionByName(batch), "id", "s",
      maxDist = 2, q = 3)
      .as[(Long, Long, Option[String], Option[Int], Int, Int)].collect().toSet
    assert(afterUpdate == rebuilt, "append must equal rebuild")
    assert(Fuzzy.edIndexRetract(table, batch.select($"id"), "id") == 3)
    val afterRetract = graft.io.Manifest.read(spark, table)
      .as[(Long, Long, Option[String], Option[Int], Int, Int)].collect().toSet
    assert(afterRetract == Fuzzy.edIndex(corpus, "id", "s", maxDist = 2, q = 3)
      .as[(Long, Long, Option[String], Option[Int], Int, Int)].collect().toSet,
      "retract must restore exactly the corpus-only index")
  }
}
