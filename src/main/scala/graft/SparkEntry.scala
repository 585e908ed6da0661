package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Sources
import graft.ops.{Relational, Sessionize, Similarity}
import graft.ops.text.{Bpe, Corpus, Dedup, Domains, TextStats}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed here as a named
  * query over the driver testdata star schema, with a DuckDB-equivalent
  * oracle in `oracleSql` (same aliases, same deterministic ORDER BY; money
  * aggregates via exact DECIMAL casts so hashes match across engines).
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Sources.table(spark, dir, name)

  /** Deterministic URL per document for the domain family (r17) — the
    * fixture carries no URL column, so the query and its oracle derive
    * one from existing columns with the SAME CASE expression (the
    * events-as-graph-edges convention). Five classes by doc_id % 5:
    * subdomained mixed-case .com, ported co.uk under a cdn label,
    * userinfo'd .org with a fragment, an IPv4 literal, and a dotless
    * bare host — one per edge the extractor must handle.
    */
  private def withUrl(d: DataFrame): DataFrame =
    d.withColumn("url",
      when(col("doc_id") % 5 === 0,
        concat(lit("https://www."), col("source"),
          lit("-Example.COM/a/"), col("doc_id").cast("string")))
        .when(col("doc_id") % 5 === 1,
          concat(lit("http://cdn."), col("source"),
            lit("-mirror.co.uk:8080/x?y=1")))
        .when(col("doc_id") % 5 === 2,
          concat(lit("https://user@"), col("source"),
            lit(".org/path#frag")))
        .when(col("doc_id") % 5 === 3,
          concat(lit("http://192.168."),
            (col("doc_id") % 200).cast("string"), lit(".7/raw")))
        .otherwise(concat(lit("intranet-"), col("source"))))

  /** q_domain_psl's deterministic URL derivation — eight classes by
    * doc_id % 8, one per PSL rule kind/depth the FULL algorithm must
    * handle beyond the literal subset: a cased co.uk subdomain (normal
    * 2-label rule), a `*.ck` wildcard host, the `!www.ck` exception
    * (behind userinfo+port), a deep `*.kawasaki.jp` wildcard, the
    * `!city.kawasaki.jp` exception, a three-label `k12.ma.us` suffix,
    * an unknown TLD (the prevailing-`*` default), and an IPv4 literal.
    */
  private def withPslUrl(d: DataFrame): DataFrame =
    d.withColumn("url",
      when(col("doc_id") % 8 === 0,
        concat(lit("https://A.B."), col("source"), lit("-web.CO.UK/x/"),
          col("doc_id").cast("string")))
        .when(col("doc_id") % 8 === 1,
          concat(lit("http://"), col("source"), lit(".acme.ck/p")))
        .when(col("doc_id") % 8 === 2, lit("https://user@www.ck:8443/q#f"))
        .when(col("doc_id") % 8 === 3,
          concat(lit("http://x."), col("source"), lit(".kawasaki.jp/")))
        .when(col("doc_id") % 8 === 4, lit("https://sub.city.kawasaki.jp/r?a=1"))
        .when(col("doc_id") % 8 === 5,
          concat(lit("http://school."), col("source"), lit(".K12.MA.US/z")))
        .when(col("doc_id") % 8 === 6,
          concat(lit("https://deep."), col("source"), lit(".example.zz/")))
        .otherwise(concat(lit("http://10.1."),
          (col("doc_id") % 200).cast("string"), lit(".5/raw"))))

  /** q_curation_domains' URL derivation — mirrors CurUrlCase: domains
    * span the even/odd corpus-batch split, with fresh-1/-3 odd-only
    * (the unknown-domain-kept branch).
    */
  private def withCurUrl(d: DataFrame): DataFrame =
    d.withColumn("url",
      when(col("doc_id") % 3 === 0,
        concat(lit("https://cdn.mirror"), (col("doc_id") % 5).cast("string"),
          lit(".com/a/"), col("doc_id").cast("string")))
        .when(col("doc_id") % 3 === 1,
          concat(lit("http://farm"), (col("doc_id") % 7).cast("string"),
            lit(".net/b")))
        .otherwise(
          concat(lit("https://fresh"), (col("doc_id") % 4).cast("string"),
            lit(".org/c"))))

  /** Session-scoped materialized intermediates: the dedup family's pair
    * tables are the classic shared stage of a real pipeline — a 100 TB
    * deployment materializes the MinHash/PPJoin pair table ONCE and every
    * downstream consumer (clustering, survivorship, leakage-safe splits)
    * reads it, rather than re-running shingle→sign→band per consumer.
    * This helper is that intermediate table in miniature: first touch per
    * (application, sf-dir, name) builds and writes parquet under a
    * process-temp dir; later touches read the parquet. Results are
    * byte-identical to inlining the build (exact parquet round-trip of
    * longs/doubles), so oracle checks are unaffected. Only CONSUMER
    * queries read the memo — the producer queries (q_dedup_minhash,
    * q_jaccard_ngram) keep computing their pipelines directly, so the
    * bench still measures pair production end-to-end once per pipeline
    * while consumers measure their own cost, the way the production
    * pipeline would pay it (r8 verdict item #4).
    */
  private lazy val intermediateRoot: java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_intermediates")
  private val intermediateBuilt =
    scala.collection.concurrent.TrieMap.empty[String, Unit]
  private def materialized(s: SparkSession, dir: String, name: String)
                          (build: => DataFrame): DataFrame = {
    // key must be INJECTIVE in dir (a 32-bit hashCode — or lossy
    // sanitization alone — could collide two sf dirs within one
    // application and silently serve the wrong corpus's pairs) and
    // bounded in length (a deep dir path as a filename component would
    // hit ENAMETOOLONG): readable truncated prefix + full SHA-256
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val key = s"${s.sparkContext.applicationId}_" +
      s"${dir.replaceAll("[^A-Za-z0-9._-]", "_").takeRight(40)}_${digest}_$name"
    val path = intermediateRoot.resolve(key).toString
    intermediateBuilt.getOrElseUpdate(key, {
      val df = build
      df.write.mode("overwrite").parquet(path)
      // the parquet copy IS the durable artifact now — free any
      // localCheckpoint frames the build's view still pins (the
      // trajectory/loop operators; graft.releaseCheckpoints scaladoc)
      graft.releaseCheckpoints(df)
    })
    memoAccessed.set(true)
    s.read.parquet(path)
  }

  /** True when a query's plan reads a warmup-materialized intermediate
    * (a served registry, shared pair table, or iterative trajectory) —
    * the MEASUREMENT-SEMANTICS flag (r17 ADVICE): such a query's bench
    * time prices the READ, not the build the warmup amortized, so its
    * cross-round history is not like-for-like with rounds where the
    * query paid the rounds inline. Bench stamps the detected names into
    * BENCH_DETAIL.json's "served" list; derived from the actual plan
    * (file scans under the memo root), so it cannot drift from the
    * wiring the way a hand-curated list would.
    */
  def readsWarmedArtifact(df: DataFrame): Boolean = {
    val root = intermediateRoot.toString
    df.queryExecution.analyzed.exists {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.exists(_.toString.contains(root))
          case _ => false
        }
      case _ => false
    }
  }

  /** The plan scan alone under-detects: operators that eagerly
    * checkpoint their input (canonical resolution, clustering) hide
    * the memo's parquet scan behind a LogicalRDD in the final plan.
    * Bench therefore ALSO tracks whether `materialized` was accessed
    * while constructing the query — reset before each construction,
    * read after.
    */
  private val memoAccessed =
    new java.util.concurrent.atomic.AtomicBoolean(false)
  def resetMemoAccess(): Unit = memoAccessed.set(false)
  def memoAccessedSinceReset: Boolean = memoAccessed.get

  /** Pre-build the shared pair intermediates for `dir` (Bench calls this
    * from its warmup so the one-time build never lands inside any
    * consumer query's measured reps).
    */
  def warmIntermediates(s: SparkSession, dir: String): Unit = {
    minhashPairs(s, dir).count()
    jaccardPairs(s, dir).count()
    bpeMerges(s, dir).count()
    qualityModel(s, dir).count()
    curationCanon(s, dir).count()
    // serve-path registries (r14): committed here so every q_*_served
    // rep measures the probe, not the registry build — the builds are
    // the parquet writes inside materialized, triggered by first access
    minhashSigReg(s, dir)
    simhashReg(s, dir)
    containReg(s, dir)
    containDfReg(s, dir)
    embedSigReg(s, dir)
    edSegReg(s, dir)
    edGramReg(s, dir)
    searchIndexReg(s, dir)
    // the shared sync-LPA and authority trajectories (r16): built once
    // here so the community and linkRank instruments measure their
    // reads, not the shared rounds
    communityTrajectory(s, dir).count()
    authorityTrajectory(s, dir).count()
    // the curation domain-decision table (r17): the gated funnel reads
    // the committed artifact, never pays the stats rollup
    curDomainDec(s, dir)
  }

  /** The even-corpus domain decision table q_curation_domains gates
    * through — materialized because production SERVES it (Manifest /
    * parquet), and because inlining its stats subtree under every
    * funnel leg makes Catalyst planning itself the dominant query cost
    * (614 → 206 exchanges, ~18 s → ~5 s at sf0.01, measured r17).
    */
  private def curDomainDec(s: SparkSession, dir: String): DataFrame =
    materialized(s, dir, "cur_domain_decisions") {
      Domains.domainDecisions(
        Domains.domainStats(withCurUrl(
          t(s, dir, "documents").filter(col("doc_id") % 2 === 0))),
        maxDupRatio = 0.5, minAvgQuality = 0.35,
        blocklist = Seq("mirror1.com"),
        allowlist = Seq("farm2.net"))
    }

  /** Training hyperparameters — the SINGLE source of truth shared by the
    * Scala call sites and the recursive-CTE oracle replays below
    * (BpeTrainCtes / QualityModelCtes interpolate these, the
    * minhashPairCtes convention): a drift on either side would
    * otherwise break parity silently until oracle-check time.
    */
  private val BpeNumMerges = 8
  private val QmThresholds: Seq[Double] = (1 to 9).map(_ / 10.0)
  private val QmDim = 16
  private val QmIters = 10
  private val QmLr = 0.5
  // the calibration model's hashing width: 'dup' (the fixture's one
  // rare, label-defining token) sits alone in its bucket at 32
  private val CalDim = 32

  /** The trained BPE table over `documents` — shared by q_bpe_train,
    * q_bpe_segment, and q_bpe_encode, so training's iterative collect
    * loop runs once per session per corpus (the jaccardPairs sharing
    * pattern).
    */
  private def bpeMerges(s: SparkSession, dir: String): DataFrame =
    materialized(s, dir, "bpe_merges")(
      graft.ops.text.Bpe.bpeTrain(t(s, dir, "documents"),
        numMerges = BpeNumMerges))

  /** The trained is-English quality model — shared by q_quality_model
    * and q_quality_predict.
    */
  private def qualityModel(s: SparkSession, dir: String): DataFrame =
    materialized(s, dir, "quality_model")(
      ops.Classifier.fit(t(s, dir, "documents"),
        org.apache.spark.sql.functions.col("lang") === "en",
        dim = QmDim, iters = QmIters, lr = QmLr))

  /** The contains-'dup' calibration model (see [[CalModelCtes]]). */
  private def calModel(s: SparkSession, dir: String): DataFrame =
    materialized(s, dir, "cal_model")(
      ops.Classifier.fit(t(s, dir, "documents"),
        array_contains(split(org.apache.spark.sql.functions.col("text"), " "),
          "dup"),
        dim = CalDim, iters = QmIters, lr = QmLr))

  /** The MinHash-LSH pair table over `documents` (k=32, bands=8, τ=0.5) —
    * shared by q_dedup_minhash, q_group_split, and q_dedup_resolve.
    */
  private def minhashPairs(s: SparkSession, dir: String): DataFrame =
    materialized(s, dir, "minhash_pairs")(
      Dedup.nearDupPairs(t(s, dir, "documents"), k = 32, bands = 8,
        threshold = 0.5))

  /** r14: the served-path REGISTRIES as pre-committed artifacts. In
    * production each `_served` probe reads a registry an ingest loop
    * maintains incrementally — the registry build is a one-time (or
    * amortized) cost, never part of a probe. Building it inline inside
    * the `q_*_served` queries made every bench rep pay the build (r13:
    * q_contain_served spent 9.1 s of its 9.1 s on the inline
    * `containmentIndex` window/df pass), so the measured number priced
    * the wrong thing. Each registry below is committed once per
    * (session, sf-dir) via [[materialized]] and the serve queries read
    * the committed relation; Bench's warmup pre-builds them so measured
    * reps carry probe cost only. Outputs are unchanged (losslessness is
    * artifact-source-free), so every oracle string stays verbatim.
    */
  private def minhashSigReg(s: SparkSession, dir: String): DataFrame =
    materialized(s, dir, "reg_minhash_sigs")(
      Dedup.signatureTable(
        t(s, dir, "documents").filter(col("doc_id") % 2 === 0),
        k = 32, bands = 8))

  private def simhashReg(s: SparkSession, dir: String): DataFrame =
    materialized(s, dir, "reg_simhash_fps")(
      Dedup.simhashIndex(
        t(s, dir, "documents").filter(col("doc_id") % 2 === 0)))

  private def containReg(s: SparkSession, dir: String): DataFrame =
    materialized(s, dir, "reg_contain_index")(
      Dedup.containmentIndex(
        t(s, dir, "documents").filter(col("doc_id") % 2 === 0)))

  /** The per-shingle df SIDECAR of [[containReg]] (r18 — the r17
    * VERDICT's top-next): posting-list lengths committed beside the
    * registry, maintained in production by the dfTable legs of
    * containmentIndexUpdate/Retract, so the jaccard serve probe ranks
    * its prefixes from index METADATA instead of re-aggregating the
    * corpus-scale registry on every probe. Values are exactly
    * registryDf(containReg) — the probe's output is unchanged.
    */
  private def containDfReg(s: SparkSession, dir: String): DataFrame =
    materialized(s, dir, "reg_contain_df")(
      Dedup.registryDf(containReg(s, dir)))

  private def embedSigReg(s: SparkSession, dir: String): DataFrame =
    materialized(s, dir, "reg_embed_sigs")(
      Similarity.embedSignatures(
        t(s, dir, "embeddings").filter(col("vec_id") % 2 === 0)))

  /** The 20-char-prefix corpus both edit-distance registries serve. */
  private def editCorpus(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), substring(col("text"), 1, 20).as("s"))
      .filter(col("doc_id") % 2 === 0)

  private def edSegReg(s: SparkSession, dir: String): DataFrame =
    materialized(s, dir, "reg_ed_seg")(
      ops.text.Fuzzy.segIndex(editCorpus(s, dir), "doc_id", "s",
        maxDist = 2))

  private def edGramReg(s: SparkSession, dir: String): DataFrame =
    materialized(s, dir, "reg_ed_gram")(
      ops.text.Fuzzy.edIndex(editCorpus(s, dir), "doc_id", "s",
        maxDist = 2, q = 3))

  private def searchIndexReg(s: SparkSession, dir: String): DataFrame =
    materialized(s, dir, "reg_search_index")(
      ops.text.Retrieval.searchIndex(t(s, dir, "documents")))

  /** The trained weight vector as the serving array — the (j, weight)
    * rows of [[qualityModel]] loaded by index. One bounded collect;
    * every scoring call site shares this loader so the model schema has
    * a single consumer.
    */
  private def qmWeights(s: SparkSession, dir: String): Array[Double] =
    weightsOf(qualityModel(s, dir))

  private def calWeights(s: SparkSession, dir: String): Array[Double] =
    weightsOf(calModel(s, dir))

  private def weightsOf(model: DataFrame): Array[Double] = {
    val rows = model.collect()
    val w = new Array[Double](rows.length) // dim+1 rows by construction
    rows.foreach(r => w(r.getInt(0)) = r.getDouble(1))
    w
  }

  /** The dedup resolution over the curation corpus (the non-benchmark
    * doc_id % 97 != 0 subset, oracle banding k=32/bands=8/τ=0.5) — the
    * persisted resolution table a real deployment materializes once.
    * q_curation_report still measures the DAG end-to-end (the producer);
    * q_curation_classified reads this intermediate (the consumer), the
    * r8 producer/consumer bench convention.
    */
  private def curationCanon(s: SparkSession, dir: String): DataFrame =
    materialized(s, dir, "curation_canon") {
      val csrc = t(s, dir, "documents").filter(col("doc_id") % 97 =!= 0)
      Dedup.resolveCanonical(csrc,
        Dedup.nearDupPairs(csrc, k = 32, bands = 8, threshold = 0.5))
    }

  /** The PPJoin exact-Jaccard pair table over `documents` (defaults:
    * n=3, τ=0.6) — shared by q_jaccard_ngram and q_dedup_clusters.
    */
  private def jaccardPairs(s: SparkSession, dir: String): DataFrame =
    materialized(s, dir, "jaccard_pairs")(
      Dedup.jaccardNearDup(t(s, dir, "documents")))

  /** ONE sync-LPA trajectory over the co-purchase graph, tapped every
    * round 0..LpGateMaxRounds (r16): the five sync community
    * instruments (q_communities, _residual, _conv, q_modularity,
    * _gated) each used to unroll their own trajectory of the SAME
    * graph — identical relabel rounds run five times per bench pass.
    * They are now consumers of this shared materialization (the
    * registry pre-commit convention: the build runs once in Bench
    * warmup / first touch, every instrument measures its own read),
    * bit-exact by GraphSpec's operator-vs-consumer equalities.
    * q_communities_semisync keeps its own loop — a different kernel.
    */
  private def communityTrajectory(s: SparkSession, dir: String): DataFrame =
    materialized(s, dir, "community_trajectory")(
      ops.Graph.labelPropTrajectory(
        t(s, dir, "part").select(col("p_partkey").as("node")),
        coPurchaseEdges(t(s, dir, "lineitem")),
        maxRounds = LpGateMaxRounds))

  /** ONE authority trajectory over the co-purchase graph (r16, the
    * community convention at the linkRank family): q_linkrank, the
    * residual ladder, and the convergence gate consume this shared
    * materialization instead of each re-running the rounds.
    * q_linkrank_seeded keeps its own loop (a different init), and
    * q_textrank ranks a different (term) graph.
    */
  private def authorityTrajectory(s: SparkSession, dir: String): DataFrame =
    materialized(s, dir, "linkrank_trajectory")(
      ops.Graph.linkRankTrajectory(
        t(s, dir, "part").select(col("p_partkey").as("node")),
        coPurchaseEdges(t(s, dir, "lineitem")),
        maxIters = LrConvMaxIters, base = LrBase,
        dampNum = LrDampNum, dampDen = LrDampDen))

  /** DuckDB ordered-fold dot product over two list columns — the exact IEEE
    * operation sequence of the Spark `aggregate()` HOF (Similarity's numeric
    * policy), so derived cosines are bit-identical across engines.
    */
  private def duckDot(a: String, b: String): String =
    s"list_reduce([CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) " +
      s"for i in generate_series(1, len($a))], (x, y) -> x + y)"

  /** One unrolled Lloyd iteration replaying `Clustering.kmeansCellsExact`
    * over the quantized `qn` relation (vec_id, embedding DOUBLE[], n2):
    * asg_i = clamped-L2 argmin vs cent_{i-1} (ties to the smaller cell),
    * upd_i = per-(cell, dim) means whose sums are of INTEGER-VALUED
    * doubles — exact and order-independent, the property that makes the
    * loop replayable at all — and cent_i keeps empty cells' previous
    * centroids (the Spark loop's contract). cn2 is the same
    * fold-of-squares both engines run.
    */
  private def lloydIterCtes(i: Int, sfx: String = ""): String = {
    val prev = s"cent${i - 1}$sfx"
    s"""asg$i$sfx AS (
  SELECT vec_id, cell FROM (
    SELECT v.vec_id, c.cell,
      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        greatest(CAST(0.0 AS DOUBLE),
          v.n2 + c.cn2 - CAST(2.0 AS DOUBLE) * ${duckDot("v.embedding", "c.c")}) ASC,
        c.cell ASC) AS rn
    FROM qn v, $prev c) WHERE rn = 1),
upd$i$sfx AS (
  SELECT a.cell, u.i AS pos, sum(v.embedding[u.i]) / count(*) AS m
  FROM asg$i$sfx a JOIN qn v USING (vec_id),
       LATERAL (SELECT unnest(generate_series(1, len(v.embedding))) AS i) u
  GROUP BY 1, 2),
cm$i$sfx AS (
  SELECT c0.cell, coalesce(uc.c, c0.c) AS c
  FROM $prev c0 LEFT JOIN
    (SELECT cell, list(m ORDER BY pos) AS c FROM upd$i$sfx GROUP BY cell) uc
    USING (cell)),
cent$i$sfx AS (SELECT cell, c, ${duckDot("c", "c")} AS cn2 FROM cm$i$sfx)"""
  }

  /** The q_kmeans_sweep oracle: the shared quantize chain (qs/qe/qn —
    * q_ann_ivf_trained's prefix), then PER CANDIDATE k a suffixed
    * exact-Lloyd chain ([[lloydIterCtes]] with sfx=k$k), a final
    * clamped-argmin assignment against its trained centroids (ties to
    * the smaller cell — the Spark array_min struct order), per-cell
    * rollups, and one row per k UNION ALL'd. Inertia replays the
    * variance identity Σ‖x‖² − ‖Σx‖²/n per cell — every cross-row sum
    * is of integer-valued doubles (order-independent), the division is
    * one IEEE op per cell, and the k-row total folds in cell order
    * (list_reduce over list(ci ORDER BY cell) ≡ Spark's driver-side
    * foldLeft; ci is never −0.0, so first-element vs 0.0 seeding
    * agree). A dec6 per-row-distance sum was tried and diverges at 1e6
    * magnitudes (see kmeansSweep's scaladoc).
    */
  private def kmeansSweepOracleSql(ks: Seq[Int], iters: Int): String = {
    val chains = ks.map { k =>
      val sfx = s"k$k"
      val iterCtes = (1 to iters).map(i => lloydIterCtes(i, sfx))
        .mkString(",\n")
      s"""cent0$sfx AS (
  SELECT vec_id AS cell, embedding AS c, n2 AS cn2 FROM qn ORDER BY vec_id LIMIT $k),
$iterCtes,
asgf$sfx AS (
  SELECT vec_id, cell FROM (
    SELECT v.vec_id, c.cell,
      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        greatest(CAST(0.0 AS DOUBLE),
          v.n2 + c.cn2 - CAST(2.0 AS DOUBLE) * ${duckDot("v.embedding", "c.c")}) ASC,
        c.cell ASC) AS rn
    FROM qn v, cent$iters$sfx c) WHERE rn = 1),
sv$sfx AS (
  SELECT a.cell, u.i AS pos, sum(v.embedding[u.i]) AS s
  FROM asgf$sfx a JOIN qn v USING (vec_id),
       LATERAL (SELECT unnest(generate_series(1, len(v.embedding))) AS i) u
  GROUP BY 1, 2),
cs$sfx AS (SELECT cell, sum(s * s) AS ss FROM sv$sfx GROUP BY cell),
cg$sfx AS (
  SELECT a.cell, count(*) AS n, sum(v.n2) AS s2
  FROM asgf$sfx a JOIN qn v USING (vec_id) GROUP BY 1),
cell$sfx AS (
  SELECT cg.cell, cg.n, cg.s2 - cs.ss / cg.n AS ci
  FROM cg$sfx cg JOIN cs$sfx cs USING (cell))"""
    }.mkString(",\n")
    val rows = ks.map { k =>
      s"""SELECT $k AS k,
  list_reduce(list(ci ORDER BY cell), (x, y) -> x + y) AS inertia,
  CAST(count(*) AS INT) AS n_cells_used,
  max(n) AS max_cell_n, min(n) AS min_cell_n FROM cellk$k"""
    }.mkString("\nUNION ALL\n")
    s"""WITH qs AS (
  SELECT vec_id, embedding,
    CASE WHEN list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) > 0
         THEN 127.0 / list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
         ELSE 0.0 END AS q_scale
  FROM embeddings),
qe AS (
  SELECT vec_id,
    list_transform(embedding,
      x -> floor(CAST(x AS DOUBLE) * q_scale + 0.5)) AS embedding
  FROM qs),
qn AS (SELECT vec_id, embedding, ${duckDot("embedding", "embedding")} AS n2 FROM qe),
$chains
$rows
ORDER BY k"""
  }

  /** CTE chain hashing `embeddings` with the Similarity module's seed-7
    * hyperplanes: plane literals → ordered-fold dots → sign-bit bucket →
    * banded (vec_id, band_idx, band_val) rows. Every CTE name carries
    * `sfx` so two banding configurations can coexist in one statement
    * (q_embed_auto replays the default AND the escalated chain). Plane
    * constants embed as literals — Double.toString round-trips exactly,
    * and the sign test's ordered fold is bit-identical, so bucket bits
    * (and therefore candidate sets) match the Spark side exactly.
    */
  private def embedBandCtes(sfx: String, nPlanes: Int, bands: Int): String = {
    val r = nPlanes / bands
    val planes = ops.Similarity.hyperplanes(nPlanes, 64, 7L)
    val vals = planes.zipWithIndex.map { case (p, j) =>
      s"($j, CAST([${p.mkString(", ")}] AS DOUBLE[]))"
    }.mkString(",\n ")
    val bandSelects = (0 until bands)
      .map(j => s"SELECT vec_id, $j AS band_idx, " +
        s"(bucket >> ${j * r}) & ${(1L << r) - 1} AS band_val FROM buck$sfx")
      .mkString("\n  UNION ALL ")
    s"""planes$sfx(j, p) AS (VALUES
 $vals),
dots$sfx AS (
  SELECT vec_id, j,
    list_reduce([CAST(embedding[i] AS DOUBLE) * p[i]
                 for i in generate_series(1, len(embedding))], (x, y) -> x + y) AS d
  FROM embeddings, planes$sfx),
buck$sfx AS (
  SELECT vec_id, CAST(sum(CASE WHEN d > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT) AS bucket
  FROM dots$sfx GROUP BY vec_id),
bands$sfx AS (
  $bandSelects)"""
  }

  /** Candidate-pair + exact-cosine verify CTEs over [[embedBandCtes]]'s
    * `bands\$sfx` relation (the q_embed_neardup chain, suffixed).
    */
  private def embedPairCtes(sfx: String): String =
    s"""cand$sfx AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bands$sfx a JOIN bands$sfx b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.vec_id < b.vec_id),
s$sfx AS (
  SELECT vec_a, vec_b,
    ${duckDot("x.embedding", "y.embedding")} /
      (sqrt(${duckDot("x.embedding", "x.embedding")}) * sqrt(${duckDot("y.embedding", "y.embedding")})) AS sim
  FROM cand$sfx JOIN embeddings x ON vec_a = x.vec_id
            JOIN embeddings y ON vec_b = y.vec_id)"""

  /** Shared oracle CTE chain replaying `Bpe.bpeTrain(numMerges = 8)` as
    * a recursive CTE: each word's symbol state rides as a DOUBLE-space-
    * joined string (each replace() consumes one boundary space per side,
    * so adjacent matches still fire — [a,b,a,b] merges to [ab,ab],
    * Sennrich's greedy left-to-right semantics, identical to the Spark
    * fold); the per-iteration argmax is a scalar subquery over the
    * recursive reference with the same (count DESC, lhs, rhs) total
    * order. Used by q_bpe_train (the merge list) and q_bpe_segment (the
    * final word states ARE the segmentation).
    */
  private lazy val BpeTrainCtes: String =
    s"""WITH RECURSIVE
      |wc AS (SELECT word, count(*) AS cnt
      |       FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |       WHERE word <> ''
      |       GROUP BY 1),
      |rec(it, word, cnt, syms, ml, mr, mc) AS (
      |  SELECT 0, word, cnt,
      |         ' ' || array_to_string(regexp_extract_all(word, '(?s).'), '  ') || ' ',
      |         CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)
      |  FROM wc
      |  UNION ALL
      |  SELECT it + 1, word, cnt,
      |         replace(syms, ' ' || best.a || '  ' || best.b || ' ',
      |                       ' ' || best.a || best.b || ' '),
      |         best.a, best.b, best.c
      |  FROM rec,
      |   (SELECT a, b, c FROM (
      |      SELECT p.pair[1] AS a, p.pair[2] AS b, sum(p.cnt) AS c
      |      FROM (
      |        SELECT r2.cnt, [sy[i], sy[i + 1]] AS pair
      |        FROM (SELECT cnt, string_split(trim(syms), '  ') AS sy FROM rec) r2,
      |             LATERAL (SELECT unnest(generate_series(1, len(r2.sy) - 1)) AS i)
      |      ) p
      |      GROUP BY 1, 2)
      |    WHERE c >= 2 ORDER BY c DESC, a, b LIMIT 1) best
      |  WHERE it < $BpeNumMerges
      |)""".stripMargin

  /** Shared oracle CTE chain replaying `Classifier.fit(lang = 'en',
    * dim = 16, iters = 10, lr = 0.5)` as a recursive CTE: `feat` buckets
    * tokens with the same 16-bit md5 fold, `packed` collapses the corpus
    * to one list row, and `rec` carries the weight vector through ten GD
    * steps — z as the identical ordered fold, residuals dec6-quantized
    * before the exact decimal gradient sum, the update the same
    * w − lr·CAST(g AS DOUBLE) arithmetic. Used by q_quality_model and
    * q_quality_predict.
    */
  private def qualityModelCtes(labelSql: String, dim: Int): String =
    s"""WITH RECURSIVE
      |feat AS (
      |  SELECT doc_id, y, list_prepend(0, list(DISTINCT b ORDER BY b)) AS fs
      |  FROM (
      |    SELECT doc_id, $labelSql AS y,
      |           CAST(('0x' || substring(md5(tok), 1, 4)) AS INT) % $dim + 1 AS b
      |    FROM (SELECT doc_id, lang, text, unnest(string_split(text, ' ')) AS tok
      |          FROM documents)
      |  ) GROUP BY doc_id, y),
      |packed AS (SELECT list({'y': y, 'fs': fs} ORDER BY doc_id) AS ds FROM feat),
      |rec(it, w) AS (
      |  SELECT 0, [CAST(0 AS DOUBLE) FOR _ IN generate_series(0, $dim)]
      |  UNION ALL
      |  SELECT it + 1,
      |    [ list_extract(rec.w, j + 1) - $QmLr * CAST(coalesce(list_sum(
      |        [CAST((0.5 + 0.5 *
      |             list_reduce([list_extract(rec.w, ff + 1) FOR ff IN d.fs],
      |                         (a, b) -> a + b)
      |           / (1 + abs(
      |             list_reduce([list_extract(rec.w, ff + 1) FOR ff IN d.fs],
      |                         (a, b) -> a + b)))
      |           - d.y) AS DECIMAL(18,6))
      |         FOR d IN packed.ds IF list_contains(d.fs, j)]), 0) AS DOUBLE)
      |      FOR j IN generate_series(0, $dim) ]
      |  FROM rec, packed WHERE it < $QmIters
      |)""".stripMargin

  private lazy val QualityModelCtes: String =
    qualityModelCtes("CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END", QmDim)

  /** The calibration query's model head: label = "contains the rare
    * token 'dup'" at dim = [[CalDim]] — the one fixture label a hashed
    * bag-of-tokens model can actually LEARN ('dup' occupies its own
    * bucket at 32; lang is content-independent, so the shared
    * is-English model collapses every score to ~0.001 and the
    * reliability table would be a single bin).
    */
  private lazy val CalModelCtes: String = qualityModelCtes(
    "CASE WHEN list_contains(string_split(text, ' '), 'dup') " +
      "THEN 1.0 ELSE 0.0 END", CalDim)

  /** Shared oracle CTE chain reproducing `Dedup.nearDupPairs(k = 32,
    * bands = 8, threshold = 0.5)` over `documents` as a `mpairs` relation
    * (doc_a < doc_b, exact verified jaccard ≥ 0.5) — same md5-derived
    * shingle hashes, integer permutations, and band keys as the Spark
    * operator, so candidate sets agree exactly. Used by `q_dedup_minhash`
    * and spliced into `q_group_split`'s reachability oracle.
    */
  private lazy val MinhashPairCtes: String = minhashPairCtes("documents")

  /** Curation-DAG head CTEs shared by the two whole-DAG oracles
    * (q_curation_report / q_curation_classified): recursive reachability
    * over the minhash pairs -> canonical survivors (kept1) -> the
    * quality-gate chain (kept2). Expects `csrc` + the minhashPairCtes
    * relations upstream.
    */
  private lazy val CurationHeadCtes: String = """
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM mpairs
  UNION ALL SELECT doc_b, doc_a FROM mpairs),
reach AS (
  SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u),
comp AS (SELECT u AS doc_id, min(v) AS component FROM reach GROUP BY u),
canon AS (
  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS canonical_id
  FROM csrc d LEFT JOIN comp c ON d.doc_id = c.doc_id),
kept1 AS (
  SELECT d.doc_id, d.text, d.lang, cn.canonical_id
  FROM csrc d JOIN canon cn ON d.doc_id = cn.doc_id
  WHERE d.doc_id = cn.canonical_id),
qb AS (
  SELECT doc_id, lang, canonical_id,
   CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
   CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
   CAST(len(regexp_extract_all(text, '\b(the|and|of|is|in|to|a)\b')) AS INT) AS stopword_cnt
  FROM kept1),
q AS (
  SELECT doc_id, lang, canonical_id,
   least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
     + CAST(stopword_cnt AS DOUBLE) / n_tokens * 0.3
     + CAST(n_distinct AS DOUBLE) / n_tokens * 0.2 AS quality_score
  FROM qb),
th AS (SELECT lang, quantile_disc(quality_score, 0.5) AS t FROM q GROUP BY lang),
kept2 AS (
  SELECT q.doc_id, q.canonical_id FROM q JOIN th USING (lang)
  WHERE q.quality_score >= th.t)"""

  /** Curation-DAG tail CTEs (decontamination over `survivors`, then the
    * split buckets) — parameterized on the surviving relation so the
    * classified oracle reads kept2c where the base oracle reads kept2,
    * and on the split source so the budget oracle splits kept4.
    */
  private def curationTailCtes(survivors: String,
                               splitFrom: String = "kept3"): String =
    curationDeconCtes(survivors) + ",\n" + curationSpCte(splitFrom)

  /** Decontamination stage CTEs over `survivors` → kept3. */
  private def curationDeconCtes(survivors: String): String = s"""
shd AS (
  SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
          for i in generate_series(1, len(toks) - 2)]) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
bench AS (SELECT DISTINCT unnest(sh) AS s2 FROM shd WHERE doc_id % 97 = 0),
ov AS (
  SELECT t2.doc_id, count(*) AS n_overlap
  FROM (SELECT k2.doc_id, unnest(shd.sh) AS s2
        FROM $survivors k2 JOIN shd ON k2.doc_id = shd.doc_id) t2
  JOIN bench USING (s2) GROUP BY 1),
kept3 AS (
  SELECT k.doc_id, k.canonical_id FROM $survivors k LEFT JOIN ov USING (doc_id)
  WHERE coalesce(ov.n_overlap, 0) < 2)"""

  /** Split-bucket CTE over an arbitrary (doc_id, canonical_id) source. */
  private def curationSpCte(from: String): String = s"""
sp AS (
  SELECT doc_id,
   CASE WHEN substring(md5(CAST(canonical_id AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
        WHEN substring(md5(CAST(canonical_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
        ELSE 'test' END AS split
  FROM $from)"""

  /** Token-budget stage CTEs: kept3 rejoined to its quality facts, the
    * score-CLASS cumulative window, and the per-language cutoff — the
    * q_token_budget machinery inside the composed DAG (budget literal
    * mirrored from the Spark call).
    */
  private def curationBudgetCtes(budget: Long): String = s"""
k3q AS (
  SELECT k.doc_id, k.canonical_id, q.lang, q.quality_score, qb.n_tokens
  FROM kept3 k JOIN q ON k.doc_id = q.doc_id JOIN qb ON k.doc_id = qb.doc_id),
bcls AS (
  SELECT lang, quality_score, sum(n_tokens) AS tok
  FROM k3q GROUP BY lang, quality_score),
bcum AS (
  SELECT lang, quality_score,
   sum(tok) OVER (PARTITION BY lang ORDER BY quality_score DESC) AS cum
  FROM bcls),
bth AS (
  SELECT lang, min(quality_score) AS t
  FROM bcum WHERE cum <= $budget GROUP BY lang),
kept4 AS (
  SELECT k.doc_id, k.canonical_id
  FROM k3q k JOIN bth USING (lang) WHERE k.quality_score >= bth.t)"""

  /** [[MinhashPairCtes]] over an arbitrary source relation (`src` must
    * expose doc_id + text) — q_curation_report runs the pair pipeline
    * over the non-benchmark subset.
    */
  private def minhashPairCtes(src: String): String = {
    val p = Dedup.MinhashP
    val sigExprs = (0 until 32)
      .map(i => s"min((${Dedup.permA(i)}*h + ${Dedup.permB(i)}) % $p) AS sig_$i")
      .mkString(",\n   ")
    val bandSelects = (0 until 8).map { j =>
      val key = (4 * j until 4 * j + 4)
        .map(i => s"CAST(sig_$i AS VARCHAR)").mkString(" || '|' || ")
      s"SELECT doc_id, $j AS band_idx, md5($key) AS band_key FROM sigs"
    }.mkString("\n  UNION ALL ")
    s"""base AS (
  SELECT doc_id,
   list_distinct([array_to_string(toks[i:i+1], ' ')
                  for i in generate_series(1, len(toks) - 1)]) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM $src)),
hashes AS (
  SELECT doc_id,
   CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % $p AS h
  FROM (SELECT doc_id, unnest(sh) AS s FROM base)),
sigs AS (
  SELECT doc_id,
   $sigExprs
  FROM hashes GROUP BY doc_id),
bands AS (
  $bandSelects),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id),
mpairs AS (
  SELECT doc_a, doc_b,
   CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
     / len(list_distinct(list_concat(x.sh, y.sh))) AS jaccard
  FROM cand JOIN base x ON doc_a = x.doc_id JOIN base y ON doc_b = y.doc_id
  WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
     / len(list_distinct(list_concat(x.sh, y.sh))) >= 0.5)"""
  }

  /** The shared shingle/hash head of every MinHash oracle chain over
    * `src` — (doc_id, sh) 2-gram shingle sets and the 60-bit folded
    * md5 hashes `minhashTierCtes` signs. The same SQL text lives inside
    * [[minhashPairCtes]]; q_minhash_auto needs it ONCE under several
    * k-parameterized chains.
    */
  private def minhashBaseCtes(src: String): String = {
    val p = Dedup.MinhashP
    s"""base AS (
  SELECT doc_id,
   list_distinct([array_to_string(toks[i:i+1], ' ')
                  for i in generate_series(1, len(toks) - 1)]) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM $src)),
hashes AS (
  SELECT doc_id,
   CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % $p AS h
  FROM (SELECT doc_id, unnest(sh) AS s FROM base))"""
  }

  /** One k-parameterized signature/band/census chain for the
    * q_minhash_auto oracle (CTE names suffixed with k): the SAME
    * permutation constants as the Spark operator, bucket counts, and
    * the census `cpd` — exact candidate pairs per signed document,
    * the identical one-IEEE-division scalar Dedup.minhashCensusCollapsed
    * collects. Expects the [[minhashBaseCtes]] relations upstream.
    */
  private def minhashTierCtes(k: Int, bands: Int): String = {
    val p = Dedup.MinhashP
    val r = k / bands
    val sigExprs = (0 until k)
      .map(i => s"min((${Dedup.permA(i)}*h + ${Dedup.permB(i)}) % $p) AS sig_$i")
      .mkString(",\n   ")
    val bandSelects = (0 until bands).map { j =>
      val key = (r * j until r * j + r)
        .map(i => s"CAST(sig_$i AS VARCHAR)").mkString(" || '|' || ")
      s"SELECT doc_id, $j AS band_idx, md5($key) AS band_key FROM sigs$k"
    }.mkString("\n  UNION ALL ")
    s"""sigs$k AS (
  SELECT doc_id,
   $sigExprs
  FROM hashes GROUP BY doc_id),
bands$k AS (
  $bandSelects),
bkt$k AS (
  SELECT band_idx, band_key, count(*) AS c
  FROM bands$k GROUP BY band_idx, band_key),
cen$k AS (
  SELECT CAST(CAST(sum(c * (c - 1) / 2) AS BIGINT) AS DOUBLE) /
         (SELECT count(*) FROM sigs$k) AS cpd
  FROM bkt$k)"""
  }

  /** One candidate+verify chain for the q_minhash_auto oracle, reading
    * band rows from `bandsRel` (a bandsK relation, optionally
    * bucket-capped): distinct a<b bucket pairs, exact-Jaccard verify at
    * 0.5 against the shared `base` shingle sets.
    */
  private def minhashVerifyCtes(sfx: String, bandsRel: String): String =
    s"""cand$sfx AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM $bandsRel a JOIN $bandsRel b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id),
p$sfx AS (
  SELECT doc_a, doc_b,
   CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
     / len(list_distinct(list_concat(x.sh, y.sh))) AS jaccard
  FROM cand$sfx JOIN base x ON doc_a = x.doc_id JOIN base y ON doc_b = y.doc_id
  WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
     / len(list_distinct(list_concat(x.sh, y.sh))) >= 0.5)"""

  /** One config row of the q_minhash_sweep oracle: the bands$k
    * cohabitation candidates, truth-hit counts against the shared `tr`
    * exact-truth CTE, and the final (k, bands, counts, ratios) SELECT.
    * Expects minhashBaseCtes + minhashTierCtes(k, bands) + `tr`
    * upstream.
    */
  private def minhashSweepChain(k: Int, bands: Int): (String, String) = {
    val ctes = s"""cd$k AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands$k a JOIN bands$k b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id),
th$k AS (SELECT count(*) AS n_truth, count(c.doc_a) AS n_hit
  FROM tr LEFT JOIN cd$k c
    ON tr.doc_a = c.doc_a AND tr.doc_b = c.doc_b),
nc$k AS (SELECT count(*) AS n_cand FROM cd$k)"""
    val row = s"""SELECT $k AS k, $bands AS bands,
  (SELECT count(*) FROM base) AS n_docs, n_truth, n_cand, n_hit,
  CASE WHEN n_truth > 0 THEN CAST(n_hit AS DOUBLE) / n_truth END AS recall,
  CASE WHEN n_cand > 0 THEN CAST(n_hit AS DOUBLE) / n_cand END AS "precision"
FROM th$k, nc$k"""
    (ctes, row)
  }

  /** LPA oracle prolog: whale-capped lineitems → co-purchase edges →
    * symmetrized weights → part nodes → identity labeling l0. Shared by
    * the three community oracles so the graph replay cannot drift. */
  private def lpaPrologCtes(): String =
    s"""$LrLiCte,
e AS (SELECT a.l_partkey AS src, b.l_partkey AS dst,
        count(*) AS weight
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2),
sym AS (SELECT src, dst, CAST(sum(weight) AS BIGINT) AS weight
        FROM (SELECT src, dst, weight FROM e
              UNION ALL SELECT dst, src, weight FROM e)
        GROUP BY 1, 2),
nodes AS (SELECT p_partkey AS node FROM part),
l0 AS (SELECT node, node AS label FROM nodes)"""

  /** One synchronous LPA round per i (1..n): neighbor label weights,
    * node-partitioned argmax by (w DESC, label ASC), carry-forward. */
  private def lpaRoundCtes(n: Int): String =
    (1 to n).map { i =>
      val prev = s"l${i - 1}"
      s"""nb$i AS (SELECT s.dst AS node, l.label,
        |    CAST(sum(s.weight) AS BIGINT) AS w
        |  FROM sym s JOIN $prev l ON s.src = l.node GROUP BY 1, 2),
        |b$i AS (SELECT node, label FROM (
        |    SELECT node, label, row_number() OVER (
        |      PARTITION BY node ORDER BY w DESC, label ASC) AS rn
        |    FROM nb$i) WHERE rn = 1),
        |l$i AS (SELECT p.node, coalesce(b.label, p.label) AS label
        |  FROM $prev p LEFT JOIN b$i b ON p.node = b.node)""".stripMargin
    }.mkString(",\n")

  /** One SEMI-synchronous LPA round per i (1..n): `colors` sequential
    * sub-steps, sub-step c re-labeling only `node % colors = c` from
    * the partially-updated labeling the previous sub-steps left
    * (s{i}_0 .. s{i}_{c-2}, the last aliased l{i}) — the SQL twin of
    * [[graft.ops.Graph.labelPropSemiSync]]'s loop, same integer argmax
    * tie-break as [[lpaRoundCtes]].
    */
  private def semiSyncRoundCtes(n: Int, colors: Int): String =
    (1 to n).flatMap { i =>
      (0 until colors).map { c =>
        val in = if (c == 0) s"l${i - 1}" else s"s${i}_${c - 1}"
        val out = if (c == colors - 1) s"l$i" else s"s${i}_$c"
        s"""nb${i}_$c AS (SELECT s.dst AS node, l.label,
          |    CAST(sum(s.weight) AS BIGINT) AS w
          |  FROM sym s JOIN $in l ON s.src = l.node
          |  WHERE s.dst % $colors = $c GROUP BY 1, 2),
          |b${i}_$c AS (SELECT node, label FROM (
          |    SELECT node, label, row_number() OVER (
          |      PARTITION BY node ORDER BY w DESC, label ASC) AS rn
          |    FROM nb${i}_$c) WHERE rn = 1),
          |$out AS (SELECT p.node, coalesce(b.label, p.label) AS label
          |  FROM $in p LEFT JOIN b${i}_$c b ON p.node = b.node)""".stripMargin
      }
    }.mkString(",\n")

  /** Per-depth modularity ingredient CTEs: one pass over labeled
    * symmetrized edges per depth k yielding mc$k(label, in_c, tot_c) —
    * shared by q_modularity and q_communities_gated so the quality
    * replay cannot drift between the instrument and the actor.
    */
  private def modularityMcCtes(depths: Seq[Int]): String = depths.map { k =>
    s"""mc$k AS (SELECT a.label AS label,
      |    CAST(sum(CASE WHEN a.label = b.label THEN s.weight
      |             ELSE 0 END) AS BIGINT) AS in_c,
      |    CAST(sum(s.weight) AS BIGINT) AS tot_c
      |  FROM sym s JOIN l$k a ON s.src = a.node
      |  JOIN l$k b ON s.dst = b.node
      |  GROUP BY 1)""".stripMargin
  }.mkString(",\n")

  /** The SimHash fingerprint CTE chain over a source relation — the
    * q_dedup_simhash replay (60-bit md5-prefix feature hash, ±1 bit
    * votes), generated from [[Dedup.SimhashBits]] so the sides cannot
    * drift. Yields relations `sh`, `h`, `votes`, `fps(doc_id, fp)`.
    */
  private def simhashFpCtes(src: String): String = {
    val bits = Dedup.SimhashBits
    val votes = (0 until bits)
      .map(i => s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS v_$i")
      .mkString(",\n   ")
    val fp = (0 until bits)
      .map(i => s"(CASE WHEN v_$i > 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")
    s"""sh AS (
  SELECT doc_id, [array_to_string(toks[i:i+1], ' ')
                  for i in generate_series(1, len(toks) - 1)] AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM $src)),
h AS (
  SELECT doc_id, CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) AS h
  FROM (SELECT doc_id, unnest(sh) AS s FROM sh)),
votes AS (
  SELECT doc_id,
   $votes
  FROM h GROUP BY doc_id),
fps AS (
  SELECT doc_id, CAST($fp AS BIGINT) AS fp FROM votes)"""
  }

  /** The banded view of a fingerprint relation, generated from
    * [[Dedup.SimhashBits]] — shared by every SimHash oracle (the
    * symmetric join, the certificates, and the asymmetric pair) so the
    * band arithmetic cannot drift between them. Emits (doc_id, fp,
    * band_idx, band_val) rows.
    */
  private def simhashBandSel(src: String, bands: Int): String = {
    val width = Dedup.SimhashBits / bands
    val mask = (1L << width) - 1
    (0 until bands)
      .map(j => s"SELECT doc_id, fp, $j AS band_idx, " +
        s"(fp >> ${j * width}) & $mask AS band_val FROM $src")
      .mkString("\n  UNION ALL ")
  }

  /** One band-config chain + final row of the SimHash recall oracle:
    * band cohabitation candidates at `b` bands, truth-hit counts against
    * the shared `tr` Hamming-truth CTE, the one-row certificate SELECT.
    */
  private def simhashRecallChain(b: Int, maxH: Int): (String, String) = {
    val ctes = s"""bd$b AS (
  ${simhashBandSel("fps", b)}),
cd$b AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bd$b a JOIN bd$b b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id),
th$b AS (SELECT count(*) AS n_truth, count(c.doc_a) AS n_hit
  FROM tr LEFT JOIN cd$b c
    ON tr.doc_a = c.doc_a AND tr.doc_b = c.doc_b),
nc$b AS (SELECT count(*) AS n_cand FROM cd$b)"""
    val row = s"""SELECT CAST($b AS INT) AS bands, CAST($maxH AS INT) AS max_hamming,
  (SELECT count(*) FROM fps) AS n_docs, n_truth, n_cand, n_hit,
  CASE WHEN n_truth > 0 THEN CAST(n_hit AS DOUBLE) / n_truth END AS recall,
  CASE WHEN n_cand > 0 THEN CAST(n_hit AS DOUBLE) / n_cand END AS "precision"
FROM th$b, nc$b"""
    (ctes, row)
  }

  /** The exact all-pairs Hamming truth CTE shared by both SimHash
    * certificate oracles. */
  private def simhashTruthCte(maxH: Int): String =
    s"""tr AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM fps x JOIN fps y ON x.doc_id < y.doc_id
  WHERE bit_count(xor(x.fp, y.fp)) <= $maxH)"""

  /** The asymmetric-SimHash oracle — shared verbatim by q_simhash_incr
    * (inline) and q_simhash_served (the persisted fingerprint registry):
    * fingerprint math is side-independent, so one fp chain over all docs
    * with the sides split by id parity only at candidate generation
    * equals the operators' split-first shape exactly, and serving from
    * the committed registry must change NOTHING.
    */
  private lazy val SimhashIncrOracleSql: String =
    s"""WITH ${simhashFpCtes("documents")},
fi AS (SELECT * FROM fps WHERE doc_id % 2 = 1),
fc AS (SELECT * FROM fps WHERE doc_id % 2 = 0),
bi AS (
  ${simhashBandSel("fi", 4)}),
bc AS (
  ${simhashBandSel("fc", 4)}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_inc, b.doc_id AS doc_corp
  FROM bi a JOIN bc b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val)
SELECT doc_inc, doc_corp, CAST(bit_count(xor(x.fp, y.fp)) AS INT) AS hamming
FROM cand JOIN fps x ON doc_inc = x.doc_id JOIN fps y ON doc_corp = y.doc_id
WHERE bit_count(xor(x.fp, y.fp)) <= 6
ORDER BY doc_inc, doc_corp"""

  /** The asymmetric-minhash oracle — shared verbatim by
    * q_dedup_incremental (inline [[graft.ops.text.Dedup.nearDupAgainst]])
    * and q_minhash_served (the same probe through the persisted
    * signature registry): serving from the artifact must change NOTHING,
    * so the oracle string is literally identical. One signature pipeline
    * over all docs, sides split by id parity only at candidate
    * generation — per-doc signature math is side-independent, so this
    * equals the Spark operators' split-first shape exactly.
    */
  private lazy val DedupIncrOracleSql: String = {
    val p = Dedup.MinhashP
    val sigExprs = (0 until 32)
      .map(i => s"min((${Dedup.permA(i)}*h + ${Dedup.permB(i)}) % $p) AS sig_$i")
      .mkString(",\n   ")
    val bandSelects = (0 until 8).map { j =>
      val key = (4 * j until 4 * j + 4)
        .map(i => s"CAST(sig_$i AS VARCHAR)").mkString(" || '|' || ")
      s"SELECT doc_id, $j AS band_idx, md5($key) AS band_key FROM sigs"
    }.mkString("\n  UNION ALL ")
    s"""WITH base AS (
  SELECT doc_id,
   list_distinct([array_to_string(toks[i:i+1], ' ')
                  for i in generate_series(1, len(toks) - 1)]) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
hashes AS (
  SELECT doc_id,
   CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % $p AS h
  FROM (SELECT doc_id, unnest(sh) AS s FROM base)),
sigs AS (
  SELECT doc_id,
   $sigExprs
  FROM hashes GROUP BY doc_id),
bands AS (
  $bandSelects),
cand AS (
  SELECT DISTINCT i.doc_id AS doc_inc, c.doc_id AS doc_corp
  FROM bands i JOIN bands c
    ON i.band_idx = c.band_idx AND i.band_key = c.band_key
   AND i.doc_id % 2 = 1 AND c.doc_id % 2 = 0)
SELECT doc_inc, doc_corp,
 CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
   / len(list_distinct(list_concat(x.sh, y.sh))) AS jaccard
FROM cand JOIN base x ON doc_inc = x.doc_id JOIN base y ON doc_corp = y.doc_id
WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
   / len(list_distinct(list_concat(x.sh, y.sh))) >= 0.5
ORDER BY doc_inc, doc_corp"""
  }

  /** The ingest-funnel oracle (q_curation_batch): the DedupIncrOracleSql
    * signature chain with the incoming side restricted to the batch's
    * exact-dedup winners, the corpus-fit quantile gate (thresholds from
    * the EVEN side only — the served-artifact semantics), and the
    * q_decontaminate overlap scan, rolled into one 5-row funnel.
    */
  private lazy val CurationBatchOracleSql: String =
    curationBatchOracleSql(domainGated = false)

  /** The same funnel with the r17 DOMAIN GATE as stage 0: decisions
    * folded from EVEN-corpus domain stats (the served-artifact
    * semantics, like the quality thresholds), the batch gated
    * allowed-or-unknown BEFORE the signature chain, and a
    * `domain_kept` funnel row after `input`.
    */
  private def curationBatchOracleSql(domainGated: Boolean): String = {
    val gateCtes =
      if (!domainGated) ""
      else domainStatsCtes("g", "TRUE", "doc_id % 2 = 0", CurUrlCase) + ",\n" +
        curDomainDecisionCte("g") + ",\n" +
        """x0 AS (
  SELECT d0.doc_id FROM
    (SELECT doc_id, domain FROM domg WHERE doc_id % 2 = 1 AND doc_id % 97 <> 0) d0
  LEFT JOIN dcg ON d0.domain = dcg.domain
  WHERE dcg.allowed IS NULL OR dcg.allowed),
"""
    val batchPred =
      if (domainGated) "doc_id IN (SELECT doc_id FROM x0)"
      else "doc_id % 2 = 1 AND doc_id % 97 <> 0"
    val funnel = (Seq(
      "input" ->
        "(SELECT count(*) FROM documents WHERE doc_id % 2 = 1 AND doc_id % 97 <> 0)") ++
      (if (domainGated) Seq("domain_kept" -> "(SELECT count(*) FROM x0)")
       else Nil) ++
      Seq("exact_kept" -> "(SELECT count(*) FROM x1)",
        "near_dup_kept" -> "(SELECT count(*) FROM x2)",
        "quality_kept" -> "(SELECT count(*) FROM x3)",
        "accepted" -> "(SELECT count(*) FROM x4)"))
      .zipWithIndex.map { case ((n, c), i) =>
        s"SELECT $i AS stage_idx, '$n' AS stage, $c AS n_docs"
      }.mkString("\n  UNION ALL ")
    val p = Dedup.MinhashP
    val sigExprs = (0 until 32)
      .map(i => s"min((${Dedup.permA(i)}*h + ${Dedup.permB(i)}) % $p) AS sig_$i")
      .mkString(",\n   ")
    val bandSelects = (0 until 8).map { j =>
      val key = (4 * j until 4 * j + 4)
        .map(i => s"CAST(sig_$i AS VARCHAR)").mkString(" || '|' || ")
      s"SELECT doc_id, $j AS band_idx, md5($key) AS band_key FROM sigs"
    }.mkString("\n  UNION ALL ")
    s"""WITH base AS (
  SELECT doc_id,
   list_distinct([array_to_string(toks[i:i+1], ' ')
                  for i in generate_series(1, len(toks) - 1)]) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
hashes AS (
  SELECT doc_id,
   CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % $p AS h
  FROM (SELECT doc_id, unnest(sh) AS s FROM base)),
sigs AS (
  SELECT doc_id,
   $sigExprs
  FROM hashes GROUP BY doc_id),
bands AS (
  $bandSelects),
${gateCtes}x1 AS (
  SELECT min(doc_id) AS doc_id FROM documents
  WHERE $batchPred
  GROUP BY md5(lower(text))),
cand AS (
  SELECT DISTINCT i.doc_id AS doc_inc, c.doc_id AS doc_corp
  FROM bands i JOIN bands c
    ON i.band_idx = c.band_idx AND i.band_key = c.band_key
   AND c.doc_id % 2 = 0
  WHERE i.doc_id IN (SELECT doc_id FROM x1)),
dup AS (
  SELECT DISTINCT doc_inc AS doc_id
  FROM cand JOIN base x ON doc_inc = x.doc_id
            JOIN base y ON doc_corp = y.doc_id
  WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
     / len(list_distinct(list_concat(x.sh, y.sh))) >= 0.5),
x2 AS (SELECT doc_id FROM x1 WHERE doc_id NOT IN (SELECT doc_id FROM dup)),
b AS (
  SELECT doc_id, lang,
   CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
   CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
   CAST(len(regexp_extract_all(text, '\\b(the|and|of|is|in|to|a)\\b')) AS INT) AS stopword_cnt
  FROM documents),
q AS (
  SELECT doc_id, lang,
   least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
     + CAST(stopword_cnt AS DOUBLE) / n_tokens * 0.3
     + CAST(n_distinct AS DOUBLE) / n_tokens * 0.2 AS quality_score
  FROM b),
th AS (
  SELECT lang, quantile_disc(quality_score, 0.5) AS threshold
  FROM q WHERE doc_id % 2 = 0 GROUP BY lang),
x3 AS (
  SELECT q.doc_id FROM q JOIN x2 USING (doc_id) JOIN th ON q.lang = th.lang
  WHERE q.quality_score >= th.threshold),
sh3 AS (
  SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
          for i in generate_series(1, len(toks) - 2)]) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
bench AS (SELECT DISTINCT unnest(sh) AS s FROM sh3 WHERE doc_id % 97 = 0),
ov AS (
  SELECT t.doc_id, count(*) AS n_overlap
  FROM (SELECT doc_id, unnest(sh) AS s FROM sh3
        WHERE doc_id IN (SELECT doc_id FROM x3)) t
  JOIN bench USING (s) GROUP BY 1),
x4 AS (
  SELECT x3.doc_id FROM x3 LEFT JOIN ov ON x3.doc_id = ov.doc_id
  WHERE coalesce(ov.n_overlap, 0) < 2)
SELECT * FROM (
  $funnel)
ORDER BY stage_idx"""
  }

  /** The asymmetric embedding near-dup oracle — shared verbatim by
    * q_embed_incr (inline) and q_embed_served (probed through the
    * persisted band registry): one banding chain over all vectors
    * (per-row hashing is side-independent), sides split by id parity
    * only at candidate generation, exact ordered-fold cosine verify.
    */
  private lazy val EmbedIncrOracleSql: String =
    s"""WITH ${embedBandCtes("", 16, 4)},
candi AS (
  SELECT DISTINCT i.vec_id AS vec_inc, c.vec_id AS vec_corp
  FROM bands i JOIN bands c
    ON i.band_idx = c.band_idx AND i.band_val = c.band_val
   AND i.vec_id % 2 = 1 AND c.vec_id % 2 = 0)
SELECT vec_inc, vec_corp, sim FROM (
  SELECT vec_inc, vec_corp,
    ${duckDot("x.embedding", "y.embedding")} /
      (sqrt(${duckDot("x.embedding", "x.embedding")}) * sqrt(${duckDot("y.embedding", "y.embedding")})) AS sim
  FROM candi JOIN embeddings x ON vec_inc = x.vec_id
             JOIN embeddings y ON vec_corp = y.vec_id)
WHERE sim >= 0.35
ORDER BY vec_inc, vec_corp"""

  /** The rational-idf BM25 oracle — shared verbatim by q_bm25 (inline)
    * and q_bm25_served (scored from the persisted search index): the
    * artifact round-trip must change nothing.
    */
  private val Bm25OracleSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |dl AS (SELECT doc_id, len(toks) AS dl FROM toks),
      |c AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM
      |        (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      |       WHERE term IN ('merge', 'sort', 'window', 'hash')
      |       GROUP BY doc_id, term),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |s AS (SELECT tf.doc_id, tf.term,
      |        ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
      |        ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
      |         (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) /
      |            (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))) AS sc
      |      FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN c),
      |agg AS (SELECT doc_id,
      |         coalesce(max(CASE WHEN term = 'merge' THEN sc END), 0.0)
      |         + coalesce(max(CASE WHEN term = 'sort' THEN sc END), 0.0)
      |         + coalesce(max(CASE WHEN term = 'window' THEN sc END), 0.0)
      |         + coalesce(max(CASE WHEN term = 'hash' THEN sc END), 0.0) AS score
      |        FROM s GROUP BY doc_id)
      |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank,
      | doc_id, score
      |FROM agg ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  /** The bigram-LM scoring oracle — shared verbatim by q_lm_score
    * (self-trained) and q_lm_serve (fit + serve of the same model: every
    * join hits on the training corpus, so the outputs are identical).
    */
  private val LmScoreOracleSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |pos AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks),
      |grams AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS bg, t[i] AS w1 FROM pos),
      |uni AS (SELECT w, count(*) AS c1 FROM
      |          (SELECT unnest(t) AS w FROM toks) GROUP BY w),
      |bi AS (SELECT bg, count(*) AS c2 FROM grams GROUP BY bg),
      |voc AS (SELECT count(*) AS v FROM uni),
      |scored AS (
      |  SELECT g.doc_id, CAST(count(*) AS INT) AS n_bigrams,
      |    avg(ln((c2 + 0.4) / (c1 + 0.4 * voc.v))) AS avg_logp
      |  FROM grams g JOIN bi USING (bg) JOIN uni ON g.w1 = uni.w CROSS JOIN voc
      |  GROUP BY g.doc_id)
      |SELECT d.doc_id, s.n_bigrams, round(s.avg_logp, 6) AS avg_logp
      |FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** The domain family's shared oracle CTEs (r17): the withUrl CASE
    * verbatim (u), host normalization (h), label split (d), and the
    * registrable-domain CASE over the SAME suffix literal list the
    * Spark expression compiles in (dom) — interpolated from
    * Domains.DefaultTwoLabelSuffixes so the two sides cannot drift.
    */
  /** The withUrl derivation as its oracle CASE (shared by every
    * domain-family CTE builder so the two sides cannot drift).
    */
  private val WithUrlCase: String =
    """CASE
      |  WHEN doc_id % 5 = 0 THEN 'https://www.' || source || '-Example.COM/a/' || doc_id
      |  WHEN doc_id % 5 = 1 THEN 'http://cdn.' || source || '-mirror.co.uk:8080/x?y=1'
      |  WHEN doc_id % 5 = 2 THEN 'https://user@' || source || '.org/path#frag'
      |  WHEN doc_id % 5 = 3 THEN 'http://192.168.' || (doc_id % 200) || '.7/raw'
      |  ELSE 'intranet-' || source END""".stripMargin

  /** q_curation_domains' URL derivation (withCurUrl): REGISTRABLE
    * domains must span the even/odd corpus-batch split (source =
    * src{doc_id % 20} makes every withUrl domain parity-pure, so a
    * gate over that derivation could never drop a batch row — and the
    * variation must sit in the eTLD+1 label itself, not a subdomain,
    * or everything folds to one registrable domain). mirror{0..4}.com
    * / farm{0..6}.net appear on both sides of the split;
    * fresh1/fresh3.org (doc_id % 4 odd) exist ONLY in the odd batch
    * and exercise the unknown-domain-kept branch.
    */
  private val CurUrlCase: String =
    """CASE
      |  WHEN doc_id % 3 = 0 THEN 'https://cdn.mirror' || (doc_id % 5) || '.com/a/' || doc_id
      |  WHEN doc_id % 3 = 1 THEN 'http://farm' || (doc_id % 7) || '.net/b'
      |  ELSE 'https://fresh' || (doc_id % 4) || '.org/c' END""".stripMargin

  private def domainCtes(sfx: String = "", pred: String = "TRUE",
                         urlCase: String = WithUrlCase): String = {
    val suffixes = Domains.DefaultTwoLabelSuffixes
      .map(s => s"'$s'").mkString(", ")
    s"""u$sfx AS (SELECT doc_id, text, source, $urlCase AS url FROM documents WHERE $pred),
      |h$sfx AS (SELECT doc_id, url,
      |  lower(regexp_replace(regexp_replace(regexp_extract(regexp_replace(url, '^[a-z][a-zA-Z0-9+.-]*://', ''), '^([^/?#]*)', 1), '^.*@', ''), ':\\d+$$', '')) AS host FROM u$sfx),
      |d$sfx AS (SELECT doc_id, url, host, string_split(host, '.') AS ls FROM h$sfx),
      |dom$sfx AS (SELECT doc_id, url, host,
      |  CASE WHEN regexp_matches(host, '^\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}$$') OR len(ls) <= 1 THEN host
      |       WHEN (ls[-2] || '.' || ls[-1]) IN ($suffixes) THEN
      |         CASE WHEN len(ls) >= 3 THEN ls[-3] || '.' || ls[-2] || '.' || ls[-1] ELSE host END
      |       ELSE ls[-2] || '.' || ls[-1] END AS domain FROM d$sfx)""".stripMargin
  }

  private val DomainCtes: String = domainCtes()

  /** [[DomainCtes]] + the q_source_stats rollup re-keyed by domain —
    * shared by q_domain_stats / q_domain_decisions / q_domain_gate.
    */
  private def domainStatsCtes(sfx: String = "", pred: String = "TRUE",
                              statsPred: String = "TRUE",
                              urlCase: String = WithUrlCase): String =
    domainCtes(sfx, pred, urlCase) + ",\n" +
      s"""q$sfx AS (SELECT doc_id,
        |   least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) * 0.5
        |     + CAST(len(regexp_extract_all(text, '\\b(the|and|of|is|in|to|a)\\b')) AS DOUBLE)
        |       / len(string_split(text, ' ')) * 0.3
        |     + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |       / len(string_split(text, ' ')) * 0.2 AS quality_score
        |  FROM documents WHERE $statsPred),
        |f$sfx AS (SELECT doc_id, domain,
        |   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |   count(*) OVER (PARTITION BY md5(lower(text))) > 1
        |     AND doc_id <> min(doc_id) OVER (PARTITION BY md5(lower(text))) AS is_drop
        |  FROM documents JOIN dom$sfx USING (doc_id) WHERE $statsPred),
        |st$sfx AS (SELECT domain,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        | CAST(sum(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_quality,
        | CAST(sum(CASE WHEN is_drop THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
        | CAST(sum(CASE WHEN is_drop THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_ratio
        |FROM f$sfx JOIN q$sfx USING (doc_id) GROUP BY domain)""".stripMargin

  private val DomainStatsCtes: String = domainStatsCtes()

  /** The decision fold over `st` — reason precedence verbatim from
    * Domains.domainDecisions at the q_domain_* thresholds.
    */
  private def domainDecisionCte(sfx: String = "",
      blocklist: Seq[String] = Seq("src16-mirror.co.uk"),
      allowlist: Seq[String] = Seq("192.168.38.7")): String = {
    val bl = blocklist.map(s => s"'$s'").mkString(", ")
    val al = allowlist.map(s => s"'$s'").mkString(", ")
    // list entries ABSENT from the stats still get their row (the
    // never-crawled-blocklist contract, Domains.domainDecisions r17)
    val unseen = (blocklist.map(s => (s, "false", "blocklist")) ++
      allowlist.map(s => (s, "true", "allowlist")))
      .map { case (d, keep, reason) =>
        s"  UNION ALL SELECT '$d', $keep, '$reason' " +
          s"WHERE '$d' NOT IN (SELECT domain FROM st$sfx)"
      }.mkString("\n")
    s"""dc$sfx AS (SELECT domain, (reason IN ('allowlist', 'ok')) AS allowed, reason FROM (
      |  SELECT domain, CASE WHEN domain IN ($bl) THEN 'blocklist'
      |    WHEN domain IN ($al) THEN 'allowlist'
      |    WHEN dup_ratio > 0.5 THEN 'dup_ratio'
      |    WHEN avg_quality < 0.35 THEN 'quality'
      |    ELSE 'ok' END AS reason FROM st$sfx)
      |$unseen)""".stripMargin
  }

  private val DomainDecisionCte: String = domainDecisionCte()

  /** q_curation_domains' decision fold: blocklist the cross-parity
    * mirror domain, allowlist one farm domain (both branches live in
    * the gated batch).
    */
  private def curDomainDecisionCte(sfx: String): String =
    domainDecisionCte(sfx, Seq("mirror1.com"), Seq("farm2.net"))

  /** q_domain_psl's oracle CTEs (r17): the withPslUrl CASE verbatim,
    * the host normalization, the candidate-key UNION over suffix
    * lengths 2..max rule depth, the rule dim as VALUES rows generated
    * from the SAME [[Domains.parsedPslRules]] the Spark join
    * broadcasts, the struct-max prevailing fold (exception beats all,
    * then most labels — identical lexicographic struct compare in both
    * engines), and the final registrable CASE.
    */
  private val DomainPslCtes: String = {
    val parsed = Domains.parsedPslRules(Domains.DefaultPslRules)
    val maxL = parsed.map(_._3).max
    val ruleRows = parsed
      .map { case (k, e, m, p) => s"('$k', $e, $m, $p)" }
      .mkString(",\n  ")
    val candLegs = (2 to maxL).flatMap { i =>
      Seq(
        s"SELECT doc_id, 's:' || array_to_string(ls[n-${i - 1}:n], '.') AS key" +
          s" FROM dpl WHERE NOT is_ip AND n >= $i",
        s"SELECT doc_id, 'w:' || array_to_string(ls[n-${i - 2}:n], '.') AS key" +
          s" FROM dpl WHERE NOT is_ip AND n >= $i")
    }.mkString("\n  UNION ALL ")
    s"""upl AS (SELECT doc_id, source, CASE
      |  WHEN doc_id % 8 = 0 THEN 'https://A.B.' || source || '-web.CO.UK/x/' || doc_id
      |  WHEN doc_id % 8 = 1 THEN 'http://' || source || '.acme.ck/p'
      |  WHEN doc_id % 8 = 2 THEN 'https://user@www.ck:8443/q#f'
      |  WHEN doc_id % 8 = 3 THEN 'http://x.' || source || '.kawasaki.jp/'
      |  WHEN doc_id % 8 = 4 THEN 'https://sub.city.kawasaki.jp/r?a=1'
      |  WHEN doc_id % 8 = 5 THEN 'http://school.' || source || '.K12.MA.US/z'
      |  WHEN doc_id % 8 = 6 THEN 'https://deep.' || source || '.example.zz/'
      |  ELSE 'http://10.1.' || (doc_id % 200) || '.5/raw' END AS url FROM documents),
      |hpl AS (SELECT doc_id, url,
      |  lower(regexp_replace(regexp_replace(regexp_extract(regexp_replace(url, '^[a-z][a-zA-Z0-9+.-]*://', ''), '^([^/?#]*)', 1), '^.*@', ''), ':\\d+$$', '')) AS host FROM upl),
      |dpl AS (SELECT doc_id, url, host, string_split(host, '.') AS ls,
      |  len(string_split(host, '.')) AS n,
      |  regexp_matches(host, '^\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}$$') AS is_ip FROM hpl),
      |rpl(r_key, r_exc, r_ml, r_psl) AS (VALUES
      |  $ruleRows),
      |kpl AS (
      |  $candLegs),
      |mpl AS (SELECT doc_id,
      |  max(struct_pack(e := r_exc, m := r_ml, p := r_psl)) AS pv
      |  FROM kpl JOIN rpl ON key = r_key GROUP BY doc_id),
      |dompl AS (SELECT d.doc_id, d.url,
      |  CASE WHEN d.is_ip OR d.n <= 1 THEN d.host
      |       WHEN d.n > coalesce(struct_extract(pv, 'p'), 1)
      |         THEN array_to_string(d.ls[d.n - coalesce(struct_extract(pv, 'p'), 1):d.n], '.')
      |       ELSE d.host END AS domain
      |  FROM dpl d LEFT JOIN mpl ON d.doc_id = mpl.doc_id)""".stripMargin
  }

  /** The shared 5-gram-KN model CTE block (bigram → 5-gram count tiers,
    * trained on the FULL documents) — composed into q_kn5_score and
    * q_kn5_lines so the two oracles' model arithmetic cannot drift,
    * mirroring the shared kn5Scored tail on the Spark side. Each ctxN
    * count is the (N+1)-gram-position count, the discounting identity
    * kn5Model's scaladoc documents.
    */
  private val Kn5ModelCtes: String =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |posn AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks),
      |grams AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS bg,
      |           t[i] AS w1, t[i + 1] AS w2 FROM posn),
      |bi AS (SELECT bg, count(*) AS c2 FROM grams GROUP BY bg),
      |ctx AS (SELECT w1, count(*) AS cv, count(DISTINCT w2) AS nf
      |        FROM grams GROUP BY w1),
      |pc AS (SELECT w2, count(DISTINCT w1) AS npc FROM grams GROUP BY w2),
      |tys AS (SELECT count(DISTINCT bg) AS types FROM grams),
      |voc AS (SELECT count(DISTINCT w) AS v FROM
      |         (SELECT unnest(t) AS w FROM toks)),
      |pos3 AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM toks),
      |g3 AS (SELECT doc_id,
      |        t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS tg,
      |        t[i] || ' ' || t[i + 1] AS c2k,
      |        t[i + 2] AS w3 FROM pos3),
      |tri AS (SELECT tg, count(*) AS c3 FROM g3 GROUP BY tg),
      |ctx2 AS (SELECT c2k, count(*) AS cuv, count(DISTINCT w3) AS nf2
      |         FROM g3 GROUP BY c2k),
      |pos4 AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 3)) AS i FROM toks),
      |g4d AS (SELECT doc_id,
      |         t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] AS g4,
      |         t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS c3k,
      |         t[i + 3] AS w4 FROM pos4),
      |q4 AS (SELECT g4, count(*) AS c4 FROM g4d GROUP BY g4),
      |ctx3 AS (SELECT c3k, count(*) AS cuvw, count(DISTINCT w4) AS nf3
      |         FROM g4d GROUP BY c3k),
      |pos5 AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i FROM toks),
      |g5d AS (SELECT doc_id,
      |         t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] || ' ' || t[i + 4] AS fg,
      |         t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] AS c4k,
      |         t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] || ' ' || t[i + 4] AS g4,
      |         t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] AS c3k,
      |         t[i + 2] || ' ' || t[i + 3] || ' ' || t[i + 4] AS tg,
      |         t[i + 2] || ' ' || t[i + 3] AS c2k,
      |         t[i + 3] || ' ' || t[i + 4] AS bg,
      |         t[i + 3] AS w1, t[i + 4] AS w2 FROM pos5),
      |q5 AS (SELECT fg, count(*) AS c5 FROM g5d GROUP BY fg),
      |ctx4 AS (SELECT c4k, count(*) AS cuvwx, count(DISTINCT w2) AS nf4
      |         FROM g5d GROUP BY c4k)""".stripMargin

  /** The four-tier 5-gram-KN probability tree, parenthesized exactly as
    * the Spark expression in TextStats.kn5Scored — (greatest/cuvwx) +
    * ((d·nf4)/cuvwx)·(the verbatim 4-gram tier, and so on down to the
    * αc-floored continuation unigram) — so everything before ln is
    * bit-identical cross-engine. Shared by both kn5 oracles.
    */
  private val Kn5ProbTree: String =
    """greatest(c5 - 0.75, 0.0) / cuvwx +
      |      0.75 * nf4 / cuvwx * (
      |        greatest(c4 - 0.75, 0.0) / cuvw +
      |        0.75 * nf3 / cuvw * (
      |          greatest(c3 - 0.75, 0.0) / cuv +
      |          0.75 * nf2 / cuv * (
      |            greatest(c2 - 0.75, 0.0) / cv +
      |            0.75 * nf / cv * ((npc + 0.4) / (types + 0.4 * v)))))""".stripMargin

  /** Thresholded twins of the order-≥3 count CTEs — TextStats.knPrune
    * as SQL (a pure WHERE per tier; the bigram tier is never pruned,
    * the chain must bottom out on a positive floor). Thresholds match
    * kn5ModelPruned's production default (singletons dropped).
    */
  private val Kn5PrunedCtes: String =
    """trip AS (SELECT * FROM tri WHERE c3 >= 2),
      |ctx2p AS (SELECT * FROM ctx2 WHERE cuv >= 2),
      |q4p AS (SELECT * FROM q4 WHERE c4 >= 2),
      |ctx3p AS (SELECT * FROM ctx3 WHERE cuvw >= 2),
      |q5p AS (SELECT * FROM q5 WHERE c5 >= 2),
      |ctx4p AS (SELECT * FROM ctx4 WHERE cuvwx >= 2)""".stripMargin

  /** The four-tier tree with LIVE backoff branches — kn5Scored's
    * when/otherwise chain verbatim (null context ⇒ the lower tier's
    * whole expression; surviving context + missed gram ⇒
    * greatest(coalesce(c,0)−d, 0) zeroes the direct-mass term).
    * Tiers ≤ 2 keep Kn5ProbTree's seen form: the bigram relations are
    * never pruned and the corpus is self-scored, so those joins
    * always hit — same arithmetic, same parenthesization.
    */
  private val Kn5BackoffTree: String = {
    val p2 = "greatest(c2 - 0.75, 0.0) / cv + " +
      "0.75 * nf / cv * ((npc + 0.4) / (types + 0.4 * v))"
    def tier(c: String, ctx: String, nf: String, lower: String): String =
      s"CASE WHEN $ctx IS NULL THEN ($lower) ELSE " +
        s"greatest(coalesce($c, 0) - 0.75, 0.0) / $ctx + " +
        s"0.75 * $nf / $ctx * ($lower) END"
    tier("c5", "cuvwx", "nf4",
      tier("c4", "cuvw", "nf3",
        tier("c3", "cuv", "nf2", p2)))
  }

  /** The RM3 oracle — shared verbatim by q_bm25_rm3 (inline) and
    * q_rm3_served (postings-only: fit + serve of the same index must
    * change nothing).
    */
  private val Rm3OracleSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |dl AS (SELECT doc_id, len(toks) AS dl FROM toks),
        |c AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
        |u AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf1 AS (SELECT doc_id, term, count(*) AS tf FROM u
        |        WHERE term IN ('merge', 'sort', 'window', 'hash')
        |        GROUP BY doc_id, term),
        |df1 AS (SELECT term, count(*) AS df FROM tf1 GROUP BY term),
        |s1 AS (SELECT tf1.doc_id, tf1.term,
        |        ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
        |        ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
        |         (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) /
        |            (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))) AS sc
        |       FROM tf1 JOIN df1 USING (term) JOIN dl USING (doc_id) CROSS JOIN c),
        |agg1 AS (SELECT doc_id,
        |         coalesce(max(CASE WHEN term = 'merge' THEN sc END), 0.0)
        |         + coalesce(max(CASE WHEN term = 'sort' THEN sc END), 0.0)
        |         + coalesce(max(CASE WHEN term = 'window' THEN sc END), 0.0)
        |         + coalesce(max(CASE WHEN term = 'hash' THEN sc END), 0.0) AS score
        |        FROM s1 GROUP BY doc_id),
        |fb AS (SELECT doc_id FROM agg1 ORDER BY score DESC, doc_id LIMIT 5),
        |cand AS (SELECT term, count(*) AS tf_fb FROM u
        |         WHERE doc_id IN (SELECT doc_id FROM fb)
        |           AND term NOT IN ('merge', 'sort', 'window', 'hash')
        |         GROUP BY term),
        |dfc AS (SELECT u.term, count(DISTINCT u.doc_id) AS df FROM u
        |        JOIN (SELECT term FROM cand) ct ON u.term = ct.term
        |        GROUP BY u.term),
        |exp AS (
        |  SELECT term, CAST(row_number() OVER (ORDER BY
        |      CAST(tf_fb AS DOUBLE) *
        |        ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
        |         (CAST(df AS DOUBLE) + 0.5)) DESC,
        |      term) AS INT) AS rnk
        |  FROM cand JOIN dfc USING (term) CROSS JOIN c
        |  QUALIFY rnk <= 3),
        |allt AS (
        |  SELECT * FROM (VALUES ('merge', 1, CAST(1.0 AS DOUBLE)),
        |                        ('sort', 2, CAST(1.0 AS DOUBLE)),
        |                        ('window', 3, CAST(1.0 AS DOUBLE)),
        |                        ('hash', 4, CAST(1.0 AS DOUBLE))) t(term, pos, w)
        |  UNION ALL SELECT term, 4 + rnk, CAST(0.5 AS DOUBLE) FROM exp),
        |tf2 AS (SELECT u.doc_id, u.term, count(*) AS tf FROM u
        |        JOIN (SELECT term FROM allt) a ON u.term = a.term
        |        GROUP BY u.doc_id, u.term),
        |df2 AS (SELECT term, count(*) AS df FROM tf2 GROUP BY term),
        |s2 AS (SELECT tf2.doc_id, tf2.term,
        |        ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
        |        ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
        |         (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) /
        |            (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))) AS sc
        |       FROM tf2 JOIN df2 USING (term) JOIN dl USING (doc_id) CROSS JOIN c),
        |wagg AS (
        |  SELECT s2.doc_id,
        |    list_reduce(
        |      list(CASE WHEN a.w = 1.0 THEN s2.sc ELSE s2.sc * a.w END
        |           ORDER BY a.pos),
        |      (x, y) -> x + y) AS score
        |  FROM s2 JOIN allt a USING (term) GROUP BY s2.doc_id)
        |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank,
        | doc_id, score
        |FROM wagg ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  /** Full SCD2 rebuild over orders — shared by `q_scd2` and (because the
    * incremental merge equals the full recompute under in-order arrival)
    * `q_scd2_apply`.
    */
  private val Scd2OracleSql: String =
    """WITH marked AS (
      |  SELECT o_custkey, o_orderstatus, o_orderpriority, o_orderdate, o_orderkey,
      |    (row_number() OVER w = 1
      |     OR o_orderstatus IS DISTINCT FROM lag(o_orderstatus) OVER w
      |     OR o_orderpriority IS DISTINCT FROM lag(o_orderpriority) OVER w) AS chg
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
      |SELECT o_custkey, o_orderstatus, o_orderpriority,
      |  o_orderdate AS effective_from,
      |  lead(o_orderdate) OVER w2 AS effective_to,
      |  lead(o_orderdate) OVER w2 IS NULL AS is_current,
      |  row_number() OVER w2 AS version
      |FROM marked WHERE chg
      |WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, version""".stripMargin

  /** Mixture-resampling target weights for `q_mixture`, shared by the Spark
    * operator and the generated oracle VALUES so the per-language bases and
    * hash thresholds stay in lockstep. en downsamples (it dominates the
    * fixture), de is an exact integer epoch, es/fr fractionally upsample,
    * and zh is unlisted → dropped.
    */
  val MixWeights: Seq[(String, Double)] =
    Seq("en" -> 0.5, "de" -> 2.0, "es" -> 1.25, "fr" -> 3.5)

  /** Query sets for q_retrieval_eval — shared between the Spark wrapper
    * and the generated oracle chains so term lists (and their fixed fold
    * order inside the BM25 score) cannot drift.
    */
  val RetrievalEvalQueries: Seq[(String, Seq[String])] = Seq(
    ("q1_merge_sort", Seq("merge", "sort")),
    ("q2_window_hash", Seq("window", "hash")),
    ("q3_scan_filter", Seq("scan", "filter")))

  /** One q_retrieval_eval oracle chain (CTE names suffixed `sfx`): the
    * q_bm25 rational-score SQL parameterized on the term set as the
    * graded truth (tru: query_id, tru_rank, doc_id, gain), plus the raw
    * tf top-k candidate ranking (res: query_id, res_rank, doc_id).
    * Expects the shared toks/dl/c corpus-stat CTEs upstream.
    */
  private def retrievalEvalChain(sfx: String, qid: String,
                                 terms: Seq[String], topK: Int): String = {
    val inList = terms.map(tm => s"'$tm'").mkString(", ")
    val fold = terms.map(tm =>
      s"coalesce(max(CASE WHEN term = '$tm' THEN sc END), 0.0)")
      .mkString("\n           + ")
    s"""tf$sfx AS (SELECT doc_id, term, count(*) AS tf FROM
        (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
       WHERE term IN ($inList)
       GROUP BY doc_id, term),
df$sfx AS (SELECT term, count(*) AS df FROM tf$sfx GROUP BY term),
s$sfx AS (SELECT tf$sfx.doc_id, tf$sfx.term,
        ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
        ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
         (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) /
            (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))) AS sc
      FROM tf$sfx JOIN df$sfx USING (term) JOIN dl USING (doc_id) CROSS JOIN c),
tru$sfx AS (SELECT '$qid' AS query_id,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS tru_rank,
         doc_id, score AS gain
        FROM (SELECT doc_id,
           $fold AS score
          FROM s$sfx GROUP BY doc_id)
        ORDER BY score DESC, doc_id LIMIT $topK),
res$sfx AS (SELECT '$qid' AS query_id,
         CAST(row_number() OVER (ORDER BY tf_total DESC, doc_id) AS INT) AS res_rank,
         doc_id
        FROM (SELECT doc_id, count(*) AS tf_total FROM
               (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
              WHERE term IN ($inList) GROUP BY doc_id)
        ORDER BY tf_total DESC, doc_id LIMIT $topK)"""
  }

  /** Deterministic 8-token newline-ification of the (space-separated)
    * fixture docs — the line-structure synthesizer shared by the
    * line-level queries (q_clean_lines, q_dedup_lines) and replayed
    * verbatim by their oracles' `nl` CTE.
    */
  private def newlineified(d: DataFrame): DataFrame = d
    .select(col("doc_id"), split(col("text"), " ").as("t"))
    .select(col("doc_id"),
      array_join(
        transform(
          sequence(lit(0L),
            floor((size(col("t")) - lit(1)) / lit(8)).cast("long")),
          i => array_join(
            slice(col("t"), (i * lit(8) + lit(1)).cast("int"), lit(8)), " ")),
        "\n").as("text"))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    Relational.factEnrich(t(spark, d, "orders"), t(spark, d, "lineitem"),
      t(spark, d, "customer"), t(spark, d, "nation"), t(spark, d, "region"))
  }

  /** q_linkrank / q_graph_audit shared parameters — interpolated into
    * BOTH the Spark calls and the oracle CTE chains (the house rule for
    * hyperparameters: one Scala val, two readers). The edge table is the
    * co-purchase graph over high-quantity lineitems (`l_quantity >=
    * LrMinQty` keeps ~2% of parts edge-less, so the dangling
    * redistribution path is live in the real data, not just in specs).
    */
  private val LrIters = 3
  private val LrBase = 1000000L
  private val LrDampNum = 85L
  private val LrDampDen = 100L
  private val LrMinQty = 40
  private val LrMaxItemsPerOrder = 64L
  // q_linkrank_conv's gate: stop when max |Δmass| <= tol (0.3·base —
  // rank order at the top is stable well before the exact fixpoint; the
  // sf0.01 residual ladder crosses it at round 5 of 6, so the fixture
  // exercises a LIVE stop, not the maxIters fallback). Both interpolated
  // into the Spark call AND the oracle's round-selection CTEs.
  private val LrConvTol = 300000L
  private val LrConvMaxIters = 6
  // q_hops / q_communities / q_kcore (r13): the BFS horizon, the LPA
  // round count, and the peeling threshold/budget — all interpolated
  // into both engines like the Lr* family. KcoreMaxRounds = 6 clears
  // the sf0.01 fixpoint (peeling stabilizes at round 5 there; extra
  // peels are no-ops, so an unconverged bigger SF still matches the
  // oracle's fixed unroll bit-for-bit). HopSeedMod reuses
  // q_linkrank_seeded's deterministic seed predicate (node % 20 = 0).
  private val HopMaxHops = 4
  private val HopSeedMod = 20L
  // r15: the weighted min-plus budget. Early stop is fixpoint-idempotent
  // (a no-improvement round reproduces itself), so the oracle's fixed
  // 6-round unroll matches whether or not sf0.01 converges inside it.
  private val WHopMaxRounds = 6
  private val LpRounds = 3
  // r13 s3: the LPA residual ladder depth and the convergence budget.
  // The sf0.01 co-purchase labeling does NOT settle inside it (the
  // residual ladder measures 1956→1066 changes over rounds 1-6 —
  // synchronous LPA on a dense graph keeps trading labels), so the
  // fixture exercises the maxRounds FALLBACK; GraphSpec's triangle
  // fixture pins the live zero-change stop. Both replay from the same
  // consecutive-round diffs.
  private val LpConvMaxRounds = 6
  // r15: the quality-plateau gate (r14 verdict's top item). The sf0.01
  // co-purchase modularity ladder is UNIMODAL — Q climbs 0.065 → 0.319
  // over rounds 1-10, then the monster-community sweep takes over and
  // it falls monotonically to 0.063 by round 16 — so the old budget-6
  // argmax truncated the peak mid-climb (shipped Q = 0.297). Budget 16
  // with patience 2 stops LIVE at round 12 on sf0.01 (rounds 11-12 both
  // score below round 10's numerator) and ships the round-10 labeling,
  // Q = 0.3192; the oracle unrolls the full 16-round budget and replays
  // the identical integer stop + argmax from the exact numerators.
  private val LpGateMaxRounds = 16
  private val LpGatePatience = 2
  // r14 (retuned r15): the semi-synchronous LPA family (the fix for the
  // measured sync-LPA non-convergence above). SemiColors and
  // SemiMaxRounds are certified by the residual ladder, not chosen by
  // faith: node%2 (parity) leaves enough same-color edges to sustain a
  // 3-node limit cycle (plateaus at exactly 3 changed labels, measured
  // to round 36 on sf0.01), node%5 reaches zero only at round 20,
  // node%3 AND node%4 both reach a zero-change round at round 16 — so
  // C=3 (25% fewer sequential sub-steps per round than r14's C=4, same
  // certified stop round) with a 17-round budget, which keeps the
  // sf0.01 stop LIVE (taken=16 < 17) and lets the oracle certify it:
  // its replayed diff ladder must find d=0 at the same round for the
  // `rounds` column to hash-match.
  private val SemiColors = 3
  private val SemiMaxRounds = 17
  private val KcoreK = 3
  private val KcoreMaxRounds = 6

  /** Qualifying lineitems with the WHALE-ORDER guard: the per-order
    * self-join below emits |items|² pairs per order, so one 10⁴-item
    * B2B cart would be a 10⁸-row hot key — orders with more than
    * [[LrMaxItemsPerOrder]] qualifying items are dropped wholesale
    * (TPC-H orders carry ≤ 7 lineitems, so the fixture loses nothing;
    * `q_copurchase_cap` is the one-row audit of what the cap would
    * drop). One `ok`-keyed count window; the pair join reuses the same
    * exchange.
    */
  private def coPurchaseItems(lineitem: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("ok")
    lineitem.filter(col("l_quantity") >= LrMinQty)
      .select(col("l_orderkey").as("ok"), col("l_partkey"))
      .withColumn("n_items", count(lit(1)).over(w))
      .filter(col("n_items") <= LrMaxItemsPerOrder)
      .drop("n_items")
  }

  /** Directed weighted co-purchase edges: (src, dst, weight) for parts
    * sharing an order among lineitems at or above `LrMinQty` quantity.
    * Order-keyed self equi-join — fan-out bounded by order size (capped
    * at [[LrMaxItemsPerOrder]], see [[coPurchaseItems]]), linear in
    * lineitems at any scale.
    */
  private[graft] def coPurchaseEdges(lineitem: DataFrame): DataFrame = {
    val li = coPurchaseItems(lineitem)
    li.select(col("ok"), col("l_partkey").as("src"))
      .join(li.select(col("ok"), col("l_partkey").as("dst")), "ok")
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("weight"))
  }

  /** [[coPurchaseItems]]'s cap, as oracle CTE text — interpolated into
    * every co-purchase oracle chain so both engines build the identical
    * bounded graph.
    */
  private lazy val LrLiCte: String =
    s"""li AS (SELECT l_orderkey, l_partkey FROM (
       |    SELECT l_orderkey, l_partkey,
       |      count(*) OVER (PARTITION BY l_orderkey) AS n_items
       |    FROM lineitem WHERE l_quantity >= $LrMinQty)
       |  WHERE n_items <= $LrMaxItemsPerOrder)""".stripMargin

  /** The full uniform-linkRank oracle chain (capped co-purchase edges,
    * out-weights, node set, and `iters` unrolled integer-mass rounds
    * m0..m`iters`) — shared by q_linkrank (final masses),
    * q_linkrank_residual (consecutive-round diffs), and q_linkrank_conv
    * (residual-gated round selection over a longer unroll).
    */
  private lazy val LrChainCtes: String = lrChainCtes(LrIters)

  private def lrChainCtes(iters: Int): String = {
    val teleport = (LrDampDen - LrDampNum) * LrBase / LrDampDen
    val rounds = (1 to iters).map { i =>
      val prev = s"m${i - 1}"
      s"""i$i AS (SELECT e.dst AS node,
        |    CAST(sum((m.mass * e.weight) // o.w_out) AS BIGINT) AS in_mass
        |  FROM e JOIN $prev m ON e.src = m.node JOIN o ON e.src = o.src
        |  GROUP BY 1),
        |d$i AS (SELECT CAST(coalesce(sum(m.mass), 0) AS BIGINT) AS dang
        |  FROM $prev m LEFT JOIN o ON m.node = o.src
        |  WHERE o.src IS NULL),
        |m$i AS (SELECT n.node,
        |    CAST($teleport + ($LrDampNum * (coalesce(s.in_mass, 0)
        |      + (SELECT dang FROM d$i) // (SELECT n FROM nn)))
        |      // $LrDampDen AS BIGINT) AS mass
        |  FROM nodes n LEFT JOIN i$i s ON n.node = s.node)""".stripMargin
    }.mkString(",\n")
    s"""$LrLiCte,
      |e AS (SELECT a.l_partkey AS src, b.l_partkey AS dst,
      |        count(*) AS weight
      |      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
      |        AND a.l_partkey <> b.l_partkey
      |      GROUP BY 1, 2),
      |o AS (SELECT src, CAST(sum(weight) AS BIGINT) AS w_out
      |      FROM e GROUP BY 1),
      |nodes AS (SELECT p_partkey AS node FROM part),
      |nn AS (SELECT count(*) AS n FROM nodes),
      |m0 AS (SELECT node, CAST($LrBase AS BIGINT) AS mass FROM nodes),
      |$rounds""".stripMargin
  }

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Each wrapper appends the oracle-compare's deterministic ORDER BY here —
    * NOT inside the production operator — so pipeline use of the same
    * functions is sort-free (VERDICT r1 item 9).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A4-family multi-aggregate (sums/avgs/counts) over the fact table.
    "q1_pricing_summary" -> ((s, dir) =>
      Relational.pricingSummary(t(s, dir, "lineitem"))
        .orderBy("l_returnflag", "l_linestatus")),

    // Flagship fact transform: J1 grain + J2/J3 left-join enrich + COALESCE
    // + CASE bucketing + date derivations (§2.2, §2.3, §2.7).
    "q_fact_enrich" -> ((s, dir) =>
      Relational.factEnrich(t(s, dir, "orders"), t(s, dir, "lineitem"),
        t(s, dir, "customer"), t(s, dir, "nation"), t(s, dir, "region"))
        // (order_id, line_no) is NOT unique in the synthetic lineitem —
        // extend the sort key until it is total, or the compare flakes.
        .orderBy("order_id", "line_no", "product_id", "quantity", "line_total")),

    // A1/A2 duplicate detection: GROUP BY key HAVING count>1.
    "q_dup_check" -> ((s, dir) =>
      Relational.duplicates(t(s, dir, "lineitem"), Seq("l_orderkey"))
        .orderBy("l_orderkey")),

    // A3/P3 amount-mismatch quality check with float tolerance.
    "q_amount_mismatch" -> ((s, dir) =>
      Relational.amountMismatch(t(s, dir, "orders"), t(s, dir, "lineitem"))
        .orderBy("order_id")),

    // J4/J6 anti-join: orders with no line items.
    "q_orders_no_lineitem" -> ((s, dir) =>
      Relational.antiJoin(t(s, dir, "orders"), t(s, dir, "lineitem"),
          "o_orderkey", "l_orderkey")
        .select(col("o_orderkey").as("order_id"),
          dec2(col("o_totalprice")).as("total_amount"),
          col("o_orderstatus").as("payment_status"))
        .orderBy("order_id")),

    // J4 via the bloom-prefiltered route: identical result to the plain
    // anti-join (the bloom only routes rows), same oracle shape as
    // q_orders_no_lineitem — proving the runtime-filter path is exact.
    "q_bloom_anti" -> ((s, dir) =>
      ops.Distribution.bloomAntiJoin(
        t(s, dir, "orders"), t(s, dir, "lineitem"), "o_orderkey", "l_orderkey")
        .select(col("o_orderkey").as("order_id"),
          dec2(col("o_totalprice")).as("total_amount"),
          col("o_orderstatus").as("payment_status"))
        .orderBy("order_id")),

    // Set operations (§2.6 — absent from the reference, part of the
    // complete relational surface): customers ordering in BOTH halves of
    // the key space (INTERSECT → plans as semi join) and high-value
    // customers who never failed an order (EXCEPT → anti join).
    "q_set_ops" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val both = o.filter(col("o_orderkey") % 2 === 0).select("o_custkey")
        .intersect(o.filter(col("o_orderkey") % 2 === 1).select("o_custkey"))
      val neverF = o.filter(col("o_totalprice") > 200000).select("o_custkey")
        .except(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
      both.withColumn("set_kind", lit("both_halves"))
        .unionByName(neverF.withColumn("set_kind", lit("high_value_never_f")))
        .select(col("set_kind"), col("o_custkey").as("customer_id"))
        .orderBy("set_kind", "customer_id")
    }),

    // RANGE-frame trailing 7-day moving average (calendar span, not rows).
    "q_range_ma" -> ((s, dir) =>
      Relational.rangeMovingAvg(t(s, dir, "lineitem"), t(s, dir, "part"))
        .orderBy("category", "ship_date")),

    // Ranking family: dense_rank / percent_rank / ntile quartiles.
    "q_product_ranks" -> ((s, dir) =>
      Relational.productRanks(t(s, dir, "lineitem"), t(s, dir, "part"))
        .orderBy("product_id")),

    // Pivoted counts (explicit value list — no discovery pass).
    "q_pivot" -> ((s, dir) =>
      Relational.eventPivot(t(s, dir, "events"),
        Seq("view", "click", "purchase", "signup", "error"))
        .orderBy("user_bucket")),

    // ROLLUP subtotals + grouping id over nation × category revenue.
    "q_rollup" -> ((s, dir) =>
      Relational.revenueRollup(t(s, dir, "lineitem"), t(s, dir, "part"),
        t(s, dir, "supplier"), t(s, dir, "nation"))
        .orderBy(col("grp"), col("nation").asc_nulls_first,
          col("category").asc_nulls_first)),

    // CUBE: all four grouping sets of nation × category in one Expand.
    "q_cube" -> ((s, dir) =>
      Relational.revenueCube(t(s, dir, "lineitem"), t(s, dir, "part"),
        t(s, dir, "supplier"), t(s, dir, "nation"))
        .orderBy(col("grp"), col("nation").asc_nulls_first,
          col("category").asc_nulls_first)),

    // Mean/stddev from explicit exact sums (bit-identical formula).
    "q_value_stats" -> ((s, dir) =>
      Relational.valueStats(t(s, dir, "events")).orderBy("event_type")),

    // Ordered funnel over events (earliest-per-type chain semantics).
    "q_funnel" -> ((s, dir) =>
      ops.Events.funnel(t(s, dir, "events"), Seq("view", "click", "purchase"))
        .orderBy("step")),

    // Classic any-chain strict funnel (greedy earliest-after fold).
    "q_funnel_chain" -> ((s, dir) =>
      ops.Events.funnelAnyChain(t(s, dir, "events"),
        Seq("view", "click", "purchase")).orderBy("step")),

    // Weekly cohort retention matrix (first-event cohorts).
    "q_retention" -> ((s, dir) =>
      ops.Events.retention(t(s, dir, "events"))
        .orderBy("cohort_week", "week_offset")),

    // First-order Markov transition matrix over per-user journeys
    // (lead() on the user stream; P(to|from) = one exact int/int division).
    "q_transitions" -> ((s, dir) =>
      ops.Events.transitions(t(s, dir, "events"))
        .orderBy("from_type", "to_type")),

    // Dense hourly grid with zero-filled gaps (sequence-explode over the
    // global span × event types; no hour silently missing).
    "q_gapfill" -> ((s, dir) =>
      ops.TimeSeries.gapFill(t(s, dir, "events"))
        .orderBy("event_type", "metric_hour")),

    // Trailing-24h z-score anomaly detection from exact integer moments
    // (n, Σx, Σx² over the frame; one IEEE double tree both engines share).
    "q_rate_anomaly" -> ((s, dir) =>
      ops.TimeSeries.rateAnomaly(t(s, dir, "events"))
        .orderBy("event_type", "metric_hour")),

    // Seasonal-naive (t−24h) forecast backtest: MAE/bias per type from
    // exact integer error sums — the capacity-planning baseline.
    "q_forecast_backtest" -> ((s, dir) =>
      ops.TimeSeries.seasonalNaiveBacktest(t(s, dir, "events"))
        .orderBy("event_type")),

    // One-pass per-column table profile (single aggregate: one Expand +
    // one shuffle for all six columns' null/distinct/range stats).
    "q_profile" -> ((s, dir) =>
      ops.Profile.profile(t(s, dir, "events"))
        .orderBy("col_name")),

    // Equi-width 12-bin histogram of event values, empty bins zero-filled
    // (bin edges and membership from one shared IEEE double tree).
    "q_histogram" -> ((s, dir) =>
      ops.Profile.histogram(t(s, dir, "events"), "value", nBins = 12)
        .orderBy("bin")),

    // Equi-DEPTH 5-bin histogram of document lengths: discrete-quantile
    // boundaries (rank ⌈p·n⌉ — verified identical to quantile_disc),
    // ties to the lower bin, empty bins zero-filled.
    "q_hist_equidepth" -> ((s, dir) =>
      ops.Profile.histogramEquiDepth(t(s, dir, "documents"), "n_chars",
        nBins = 5)
        .orderBy("bin")),

    // Distribution drift between the first and second half-month of
    // event values: shared bins, both shares, TV/χ² terms (log-free).
    "q_hist_drift" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val cut = lit("2024-01-16").cast("timestamp")
      ops.Profile.histogramDrift(
        ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut),
        "value", nBins = 10).orderBy("bin")
    }),

    // Quality-weighted deterministic sampling: each doc keeps with
    // probability = its quality score (stable md5 draw, zero shuffle).
    "q_weighted_sample" -> ((s, dir) =>
      Corpus.weightedSample(
        TextStats.qualityScore(t(s, dir, "documents"), Seq("lang"))
          .select(col("doc_id"), col("lang"), col("quality_score")),
        "quality_score").orderBy("doc_id")),

    // Robust median/MAD outlier scoring per event type (discrete
    // quantiles — actual group elements, bit-portable; t-digest past
    // the accuracy cap at scale).
    // accuracy 100k: the GK sketch is exact (≡ DuckDB quantile_disc) only
    // while group size ≤ accuracy — sf0.1's ~20k-row event-type groups
    // cross the default 10k knob and a borderline row flips (caught by
    // the sf0.1 self-check sweep). The operator default stays 10k as the
    // documented scale trade; the ORACLE-COMPARED query pins the exact
    // regime through every fixture scale.
    "q_mad_outliers" -> ((s, dir) =>
      ops.Profile.madOutliers(t(s, dir, "events"), "value", "event_type",
        accuracy = 100000)
        .orderBy("event_id")),

    // Keyed snapshot diff (CDC classification) between two derived order
    // snapshots: dropped keys, new keys, and price-bumped rows.
    "q_snapshot_diff" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val old = ord.filter(col("o_orderkey") % 5 =!= 0)
      val nw = ord.filter(col("o_orderkey") % 3 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 2 === 0, col("o_totalprice") * 1.1)
            .otherwise(col("o_totalprice")))
      Relational.snapshotDiff(old, nw, Seq("o_orderkey"),
        Seq("o_totalprice", "o_orderstatus"))
        .orderBy("o_orderkey")
    }),

    // JSON property extraction from the events props column (the S2
    // family's in-row JSON path: get_json_object + cast + aggregate).
    "q_event_props" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(col("k")).as("sum_k"),
          (sum(col("k")).cast("double") / count(col("k"))).as("avg_k"))
        .orderBy("event_type")),

    // Supplier geography rollup (completes fixture-table coverage):
    // broadcast dim chain supplier→nation→region, money-exact balances.
    "q_supplier_geo" -> ((s, dir) =>
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"))
        .agg(count(lit(1)).as("n_suppliers"),
          sumMoney(col("s_acctbal")).cast("double").as("total_acctbal"))
        .orderBy("region")),

    // J7 inactive-customer detection (cutoff fixed for determinism).
    "q_inactive_customers" -> ((s, dir) =>
      Relational.inactiveCustomers(t(s, dir, "customer"), t(s, dir, "orders"),
        "2000-01-01").orderBy("customer_id")),

    // A4 hourly multi-aggregate with exact COUNT(DISTINCT).
    "q_hourly_metrics" -> ((s, dir) =>
      Relational.hourlyMetrics(t(s, dir, "events")).orderBy("metric_hour")),

    // A6 revenue by category.
    "q_category_revenue" -> ((s, dir) =>
      Relational.categoryRevenue(t(s, dir, "lineitem"), t(s, dir, "part"))
        .orderBy("category")),

    // A7 average order value by tier (COALESCE default tier).
    "q_tier_aov" -> ((s, dir) =>
      Relational.tierAov(t(s, dir, "orders"), t(s, dir, "customer"))
        .orderBy("customer_tier")),

    // A8 geographic distribution.
    "q_geo_distribution" -> ((s, dir) =>
      Relational.geoDistribution(t(s, dir, "orders"), t(s, dir, "customer"),
        t(s, dir, "nation"), t(s, dir, "region")).orderBy("region")),

    // W1 top-10 products (deterministic tie-break).
    "q_top_products" -> ((s, dir) =>
      Relational.topProducts(t(s, dir, "lineitem"), t(s, dir, "part"), 10)),

    // W2 revenue trend + 7-day moving average window.
    "q_revenue_trend" -> ((s, dir) =>
      Relational.revenueTrend(t(s, dir, "lineitem"), t(s, dir, "part"),
        "2001-01-01").orderBy("category", "ship_date")),

    // J5/S5 MERGE semantics: full-outer + coalesce upsert of two hourly
    // aggregates (even/odd event_id halves → MATCHED and NOT MATCHED rows).
    "q_merge_hourly" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      def agg(df: DataFrame): DataFrame = df
        .groupBy(date_trunc("hour", col("ts")).as("metric_hour"))
        .agg(count(lit(1)).as("total_events"),
          sumMeasure(col("value")).as("total_value"))
      Relational.mergeHourly(
        agg(ev.filter(col("event_id") % 2 === 0)),
        agg(ev.filter(col("event_id") % 2 === 1)))
        .orderBy("metric_hour")
    }),

    // Text analysis: token counting (whitespace + BPE-ish regex split).
    "q_token_stats" -> ((s, dir) =>
      TextStats.tokenStats(t(s, dir, "documents")).orderBy("doc_id")),

    // Text analysis: quality scoring (length/stopword/punct/TTR blend).
    "q_quality_score" -> ((s, dir) =>
      TextStats.qualityScore(t(s, dir, "documents")).orderBy("doc_id")),

    // Per-language median quality gate: keep the top half of each
    // language by blended quality score (discrete quantile threshold —
    // an actual group element, broadcast back over the scan).
    "q_quality_gate" -> ((s, dir) =>
      Corpus.quantileGate(
        TextStats.qualityScore(t(s, dir, "documents"), Seq("lang")),
        "quality_score", "lang", p = 0.5)
        .orderBy("doc_id")),

    // Data-constrained selection: per language, keep the best whole
    // score-classes until a 2000-token budget fills — threshold is an
    // actual data value (quantile-gate convention); strata whose top
    // class overflows serve as all-false.
    "q_token_budget" -> ((s, dir) =>
      Corpus.tokenBudgetSelect(
        TextStats.qualityScore(t(s, dir, "documents"), Seq("lang")),
        "quality_score", "n_tokens", "lang", budget = 2000L)
        .orderBy("doc_id")),

    // Rank-based score fusion input: per-language percentile rank of
    // the blended quality score — RANK semantics (ties share their
    // class's first row), exact long/long division; computed over the
    // score-CLASS relation, never a document-grain window.
    "q_score_rank" -> ((s, dir) =>
      Corpus.scoreRank(
        TextStats.qualityScore(t(s, dir, "documents"), Seq("lang")),
        "quality_score", "lang")
        .orderBy("doc_id")),

    // Rank fusion of two incomparable signals (char count, token count)
    // into one per-language fused score — all signals share ONE
    // class-grain ranking chain; the blend is a literal fold, so fusion
    // compares exactly (no rounding).
    "q_score_fuse" -> ((s, dir) =>
      Corpus.scoreFuse(
        t(s, dir, "documents")
          .withColumn("n_tokens", size(split(col("text"), " ")).cast("long")),
        Seq("n_chars" -> 2.0, "n_tokens" -> 1.0), "lang")
        .select(col("doc_id"), col("lang"), col("rank_n_chars"),
          col("rank_n_tokens"), col("fused_score"))
        .orderBy("doc_id")),

    // CCNet's head/middle/tail move generalized: per-language QUARTILE
    // buckets of the blended quality score (bucket = # thresholds
    // strictly below — ties join the lower bucket on both engines; the
    // exact-rational score keeps the boundary compares bit-portable).
    "q_score_buckets" -> ((s, dir) =>
      Corpus.scoreBuckets(
        TextStats.qualityScore(t(s, dir, "documents"), Seq("lang")),
        "quality_score", "lang", pcts = Seq(0.25, 0.5, 0.75))
        .orderBy("doc_id")),

    // Supervised quality-classifier training (the GPT-3/LLaMA-style
    // model-based filter): rational-sigmoid logistic GD over hashed
    // presence features, labels = is-English. Deterministic: dec6
    // gradient quantization + exact decimal sums make every iteration
    // partition-order independent; the oracle replays the whole loop as
    // a recursive CTE over a packed corpus list.
    "q_quality_model" -> ((s, dir) =>
      qualityModel(s, dir).orderBy("j")),

    // Serving path: score every document under the trained weights (one
    // map pass; z is the same ordered fold the trainer used).
    "q_quality_predict" -> ((s, dir) => {
      val w = qmWeights(s, dir)
      ops.Classifier.score(t(s, dir, "documents"), col("lang") === "en",
        w, dim = w.length - 1).orderBy("doc_id")
    }),

    // Operating-point table for the trained filter: exact confusion
    // counts + precision/recall per candidate threshold — the curation
    // team's cutoff-selection dashboard. One scoring pass, one
    // combinable aggregate.
    // Reliability table: score-decile bins, mean predicted score vs
    // empirical positive rate, gap per bin — the calibration read
    // before treating filter scores as probabilities. dec6 score sums,
    // exact 0/1 label sums, single-division ratios.
    "q_calibration" -> ((s, dir) => {
      val w = calWeights(s, dir)
      ops.Classifier.calibrationCurve(t(s, dir, "documents"),
        array_contains(split(col("text"), " "), "dup"), w,
        dim = w.length - 1).orderBy("bin")
    }),

    "q_quality_sweep" -> ((s, dir) => {
      val w = qmWeights(s, dir)
      ops.Classifier.thresholdSweep(t(s, dir, "documents"),
        col("lang") === "en", w, dim = w.length - 1,
        thresholds = QmThresholds).orderBy("threshold")
    }),

    // Text analysis: n-gram-heuristic language ID.
    "q_lang_id" -> ((s, dir) =>
      TextStats.langId(t(s, dir, "documents")).orderBy("doc_id")),

    // Per-source curation dashboard: volume, mean quality, exact-dup rate.
    "q_source_stats" -> ((s, dir) =>
      TextStats.sourceStats(t(s, dir, "documents")).orderBy("source")),

    // Domain-grain curation (r17): registrable-domain extraction over
    // the deterministic URL derivation (withUrl — the fixture carries
    // no URL column; the oracle replays the same CASE verbatim).
    // Exercises scheme/userinfo/port/path stripping, case folding, a
    // two-label public suffix, an IPv4 literal, and a dotless host.
    "q_domain_extract" -> ((s, dir) =>
      withUrl(t(s, dir, "documents"))
        .select(col("doc_id"), col("url"),
          Domains.registrableDomain(col("url")).as("domain"))
        .orderBy("doc_id")),

    // Per-domain corpus health: sourceStats re-keyed to the
    // registrable domain (volume, exact-decimal mean quality,
    // corpus-wide exact-dup rate).
    "q_domain_stats" -> ((s, dir) =>
      Domains.domainStats(withUrl(t(s, dir, "documents")))
        .orderBy("domain")),

    // The per-domain keep/drop fold with its audit trail — every
    // reason branch live on the fixture: one blocklisted domain, one
    // allowlisted sub-threshold IP, the quality threshold catching the
    // low-quality IP slices, 'ok' for the rest.
    "q_domain_decisions" -> ((s, dir) =>
      Domains.domainDecisions(
        Domains.domainStats(withUrl(t(s, dir, "documents"))),
        maxDupRatio = 0.5, minAvgQuality = 0.35,
        blocklist = Seq("src16-mirror.co.uk"),
        allowlist = Seq("192.168.38.7")).orderBy("domain")),

    // The ingest gate itself: documents surviving the domain decision
    // table (broadcast dim join — no shuffle added to ingest).
    "q_domain_gate" -> ((s, dir) => {
      val d = withUrl(t(s, dir, "documents"))
      val dec = Domains.domainDecisions(Domains.domainStats(d),
        maxDupRatio = 0.5, minAvgQuality = 0.35,
        blocklist = Seq("src16-mirror.co.uk"),
        allowlist = Seq("192.168.38.7"))
      Domains.domainGateWith(d, dec)
        .select(col("doc_id"), col("domain")).orderBy("doc_id")
    }),

    // Full-PSL registrable-domain extraction (r17): the suffix-DIM
    // scale path of q_domain_extract, with the rule kinds the literal
    // subset declares out of scope live on the fixture — wildcard
    // (*.ck, *.kawasaki.jp), exception (!www.ck, !city.kawasaki.jp),
    // and a three-label suffix (k12.ma.us).
    "q_domain_psl" -> ((s, dir) =>
      Domains.withRegistrableDomainPsl(withPslUrl(t(s, dir, "documents")))
        .select(col("doc_id"), col("url"), col("domain"))
        .orderBy("doc_id")),

    // Per-domain share cap (RefinedWeb's anti-monoculture resample):
    // keep-rate min(1, cap/n_domain_docs) decided by the stable md5
    // draw — big source-keyed domains cap, the long tail keeps whole.
    "q_domain_cap" -> ((s, dir) =>
      Domains.domainCapResample(withUrl(t(s, dir, "documents")), cap = 10)
        .select(col("doc_id"), col("domain"), col("n_domain_docs"),
          col("keep_rate"), col("sample_u"), col("is_sampled"))
        .orderBy("doc_id")),

    // Verify-threshold calibration for the embedding ingest loop: the
    // random-cosine noise floor from md5-picked probe × sample slices
    // (the embed_ingest_sweep's measured lesson as an operator).
    "q_embed_noise" -> ((s, dir) =>
      Similarity.embedNoiseFloor(t(s, dir, "embeddings"),
        nProbes = 32, nSamples = 256)),

    // Embedding-table health: the validation pass before ANN indexing.
    "q_embedding_stats" -> ((s, dir) =>
      Similarity.embeddingStats(t(s, dir, "embeddings")).orderBy("label")),

    // Text analysis: content fingerprints (exact/normalized/prefix/min-shingle).
    "q_fingerprints" -> ((s, dir) =>
      TextStats.fingerprints(t(s, dir, "documents")).orderBy("doc_id")),

    // Gap-based sessionization over the events stream (30-min gap).
    "q_session_stats" -> ((s, dir) =>
      Sessionize.sessionStats(t(s, dir, "events"), 30)
        .orderBy("user_id", "session_seq")),

    // Exact dedup: normalized-content hash groups with representative + count.
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exactDedup(t(s, dir, "documents")).orderBy("keep_doc_id")),

    // MinHash-LSH near-dup pairs: banded bucket join + exact-Jaccard
    // verify. 4-row bands: the synthetic corpus has a ~30-word vocabulary,
    // so 2-row bands collide on background pairs (j≈0.05) constantly —
    // 142k candidates at sf0.1; r=4 keeps ~full recall on real near-dups
    // (all planted pairs have j≥0.9 → per-pair miss ≈ 9e-5) with ~100×
    // fewer false candidates (0.05^4 per band).
    "q_dedup_minhash" -> ((s, dir) =>
      Dedup.nearDupPairs(t(s, dir, "documents"), k = 32, bands = 8,
        threshold = 0.5).orderBy("doc_a", "doc_b")),

    // Blocking-quality audit for the MinHash banding (embedNearDupAudit's
    // shape on the text side): per-band bucket census + exact candidate
    // volume — the pre-flight a 100× run reads before the verify join,
    // and the measurement that sizes maxBucketSize above the organic
    // bucket population. Oracle reuses q_dedup_minhash's signature/band
    // CTEs with a count census on top.
    "q_minhash_audit" -> ((s, dir) =>
      Dedup.minhashBandAudit(t(s, dir, "documents"), k = 32, bands = 8)
        .orderBy("band_idx")),

    // Auto-escalating MinHash near-dup (embeddingNearDupAuto's dispatch
    // for the text family): the band-audit census runs FIRST; a collapsed
    // configured banding doubles k (2-row bands → 4-row), and when the
    // RE-audit at 2k still floods — the boilerplate-crowd regime — the
    // doubled banding runs under the production bucket cap. At the
    // census cap of 8 probes/doc the decision flips exactly at the
    // driver's own scale boundary: sf0.01 measures cpd16 ≈ 2.1 → banded
    // as configured; sf0.1 measures cpd16 ≈ 18 → escalate, cpd32 ≈ 0.4
    // → banded2x. The oracle replays both censuses and all three
    // candidate chains, gated on the same scalar compares.
    "q_minhash_auto" -> ((s, dir) =>
      Dedup.nearDupAuto(t(s, dir, "documents"), k = 16, bands = 8,
        threshold = 0.5, maxCandidatesPerDoc = 8.0, capSize = 64L)
        .orderBy("doc_a", "doc_b")),

    // LSH recall/precision audit on a FIXED eval slice (doc_id < 400 —
    // constant-size across scale factors, so the all-pairs truth stays
    // eval-sized while the corpus grows): exact 2-shingle Jaccard truth
    // vs the (16, 8) band table's bucket cohabitations. The quality twin
    // of q_minhash_audit's cost census.
    "q_minhash_recall" -> ((s, dir) =>
      Dedup.minhashRecallEval(
        t(s, dir, "documents").filter(col("doc_id") < 400),
        k = 16, bands = 8, threshold = 0.5)),

    // The recall audit over a (k, bands) config grid, one quadratic
    // truth pass shared across configs: the measurement that PICKS the
    // corpus-wide banding (cheapest n_cand above a recall floor).
    "q_minhash_sweep" -> ((s, dir) =>
      Dedup.minhashConfigSweep(
        t(s, dir, "documents").filter(col("doc_id") < 400),
        Seq((8, 4), (16, 8), (32, 8)), threshold = 0.5)
        .orderBy("k", "bands")),

    // Ingest SimHash check: odd-id incoming docs within Hamming 6 of an
    // even-id corpus fingerprint (no corpus self-pairing). Fingerprints
    // are per-doc functions, so the oracle runs one fp chain over all
    // docs and splits sides only at candidate generation.
    "q_simhash_incr" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.simhashAgainst(
        d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1))
        .orderBy("doc_inc", "doc_corp")
    }),

    // Serve-path twin through the persisted (doc_id, fp) registry — the
    // smallest registry of the asymmetric families, and the only one
    // whose serve path reads ZERO corpus text (Hamming verifies on the
    // fingerprint itself). Output identical — oracle verbatim.
    "q_simhash_served" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.simhashAgainstIndex(
        simhashReg(s, dir),
        d.filter(col("doc_id") % 2 === 1))
        .orderBy("doc_inc", "doc_corp")
    }),

    // SimHash recall certificate on the same fixed eval slice: exact
    // all-pairs Hamming truth vs the 4-band cohabitation candidates.
    // Pigeonhole is exact only for d < bands, so at (4 bands, d <= 6)
    // recall < 1 is possible — this is the instrument that prices it.
    "q_simhash_recall" -> ((s, dir) =>
      Dedup.simhashRecallEval(
        t(s, dir, "documents").filter(col("doc_id") < 400),
        bands = 4, maxHamming = 6)),

    // The Hamming-family band sweep: one fingerprint + truth pass
    // shared across the grid (truth is bands-independent).
    "q_simhash_sweep" -> ((s, dir) =>
      Dedup.simhashBandSweep(
        t(s, dir, "documents").filter(col("doc_id") < 400),
        Seq(2, 4, 6), maxHamming = 6)
        .orderBy("bands")),

    // Per-source content novelty: the share of each source's distinct
    // bigram shingles that exist in NO other source — the mixture-design
    // signal sourceStats' dup-rate misses (a mirror shows ~zero novelty
    // at a low exact-dup rate).
    "q_source_novelty" -> ((s, dir) =>
      Corpus.sourceNovelty(t(s, dir, "documents")).orderBy("source")),

    // Incremental ingestion dedup: the odd-id half arrives as a batch and
    // is flagged against the even-id corpus (asymmetric LSH, no
    // corpus-self pairing).
    "q_dedup_incremental" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.nearDupAgainst(
        d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1),
        k = 32, bands = 8, threshold = 0.5).orderBy("doc_inc", "doc_corp")
    }),

    // The SAME probe served from the persisted corpus signature table
    // (the artifact nearDupAgainst's scaladoc promises a deployment
    // maintains): only the incoming half is tokenized/signed; corpus
    // text is touched for candidate ids only. Output must equal
    // q_dedup_incremental row-for-row — the oracle string is shared.
    "q_minhash_served" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val corpus = d.filter(col("doc_id") % 2 === 0)
      Dedup.nearDupAgainstSigs(
        minhashSigReg(s, dir), corpus,
        d.filter(col("doc_id") % 2 === 1), k = 32, bands = 8,
        threshold = 0.5).orderBy("doc_inc", "doc_corp")
    }),

    // J1/P5/A3 nested-data path: nest lineitem into items arrays, LEFT-join
    // onto orders, per-row HOF array-aggregate total, explode_outer back to
    // line grain with struct-field projections. Itemless orders keep one
    // row with NULL line fields (the LEFT JOIN UNNEST semantics).
    "q_nested_roundtrip" -> ((s, dir) =>
      ops.Nested.nestedRoundtrip(t(s, dir, "orders"), t(s, dir, "lineitem"))
        .orderBy(col("order_id"), col("line_no").asc_nulls_first,
          col("product_id"), col("quantity"), col("unit_price"))),

    // A2/A9 quality framework: audit table from four checks, summarized
    // by (check_type, severity) — deterministic columns only (uuid and
    // timestamp stay out of the compare).
    "q_quality_summary" -> ((s, dir) =>
      ops.Quality.qualitySummary(ops.Quality.qualityChecks(
        t(s, dir, "orders"), t(s, dir, "lineitem"),
        t(s, dir, "customer"), t(s, dir, "part")))
        .orderBy("check_type", "severity")),

    // A10 low-stock alert: high demand + low inventory (p_size proxies
    // stock in the testdata schema).
    "q_low_stock" -> ((s, dir) =>
      ops.Quality.lowStock(t(s, dir, "lineitem"), t(s, dir, "part"), 800.0, 10)
        .orderBy("product_id")),

    // Brute-force cosine top-5 for 10 query vectors over the embedding
    // corpus: broadcast linear scan + map-side partial TopK Aggregator.
    "q_similarity_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      ops.Similarity.bruteForceTopK(emb, q, 5).orderBy("q_id", "rank")
    }),

    // Contrastive triplet mining: positives from a brute self-search
    // (the documented eval baseline — an ANN table drops in at scale),
    // verified pseudo-random negatives from bucket representatives.
    "q_contrastive" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val self = emb.select(col("vec_id").as("q_id"),
        col("embedding").as("q_emb"))
      ops.Similarity.contrastivePairs(
          ops.Similarity.bruteForceTopK(emb, self, 2), emb,
          nNeg = 3, simFloor = 0.5, simCeil = 0.3)
        .orderBy("vec_id", "pair_type", "partner_id")
    }),

    // The same miner over the LSH bucket search instead of the brute
    // baseline — the corpus-scale drop-in (sf1 sweep: the brute
    // positives cost 62.7 s at 20k vectors; the bucket search prunes
    // the candidate set ~bucket-count-fold). Positives inherit ANN
    // recall semantics: a strong pair in different buckets is missed,
    // and the oracle replays the identical bucket search.
    "q_contrastive_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val self = emb.select(col("vec_id").as("q_id"),
        col("embedding").as("q_emb"))
      ops.Similarity.contrastivePairs(
          ops.Similarity.annTopK(emb, self, 2), emb,
          nNeg = 3, simFloor = 0.5, simCeil = 0.3)
        .orderBy("vec_id", "pair_type", "partner_id")
    }),

    // SimHash near-dup: banded 60-bit shingle fingerprints, Hamming verify.
    "q_dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(t(s, dir, "documents")).orderBy("doc_a", "doc_b")),

    // Exact 3-gram Jaccard near-dup via lossless prefix filtering — the
    // oracle computes naive all-pairs; results must be identical.
    "q_jaccard_ngram" -> ((s, dir) =>
      Dedup.jaccardNearDup(t(s, dir, "documents")).orderBy("doc_a", "doc_b")),

    // Ingest exact-Jaccard check: odd-id incoming docs with n-gram
    // Jaccard >= 0.6 against an even-id corpus doc (no corpus
    // self-pairing) — PPJoin prefixes on both sides under the shared
    // union-df order, exact verify. Oracle is the naive cross scan.
    "q_jaccard_incr" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.jaccardAgainst(
        d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1))
        .orderBy("doc_inc", "doc_corp")
    }),

    // Serve-path twin of q_jaccard_incr (r15): the corpus side probed
    // THROUGH the same committed (s, doc_id, sz) shingle index the
    // containment family serves from — posting rows are family-agnostic,
    // so one registry backs both probes. Single-side hash-order prefix
    // (lossless against full corpus postings), bidirectional length
    // filter, exact verify — output identical to the inline form, so the
    // oracle is the inline statement verbatim.
    "q_jaccard_served" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val corpus = d.filter(col("doc_id") % 2 === 0)
      Dedup.jaccardAgainstIndex(
        containReg(s, dir), corpus,
        d.filter(col("doc_id") % 2 === 1),
        // prefix ranks from the committed df sidecar (r18): identical
        // values to the inline aggregate by maintenance contract, so
        // the output — and the verbatim-inline oracle — are unchanged
        registryDfStats = Some(containDfReg(s, dir)))
        .orderBy("doc_inc", "doc_corp")
    }),

    // Asymmetric excerpt detection: directional shingle containment
    // |A∩B|/|A| >= 0.8 (oracle = naive all-ordered-pairs on the same
    // string shingles; the prefix filter is lossless).
    "q_containment" -> ((s, dir) =>
      Dedup.containmentPairs(t(s, dir, "documents"))
        .orderBy("doc_a", "doc_b")),

    // Ingest excerpt check: odd-id incoming docs whose shingles are
    // >= 0.8 covered by an even-id corpus doc (no corpus self-pairing).
    "q_contain_incr" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.containmentAgainst(
        d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1))
        .orderBy("doc_inc", "doc_corp")
    }),

    // Serve-path twin of q_contain_incr: the corpus side probed THROUGH
    // the (s, doc_id, sz) containment index relation, incoming prefix in
    // hash order — output identical to the inline form (losslessness is
    // order-free), so the oracle is the inline statement verbatim.
    "q_contain_served" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val corpus = d.filter(col("doc_id") % 2 === 0)
      Dedup.containmentAgainstIndex(
        containReg(s, dir), corpus,
        d.filter(col("doc_id") % 2 === 1))
        .orderBy("doc_inc", "doc_corp")
    }),

    // Recall certificate for the containment maxDf lever on the fixed
    // eval slice (doc_id < 400): exact all-ordered-pairs truth vs the
    // df<=3-pruned prefix index's candidates — the priced recall trade
    // the corpus-wide run would commit to.
    "q_contain_recall" -> ((s, dir) =>
      Dedup.containmentRecallEval(
        t(s, dir, "documents").filter(col("doc_id") < 400),
        n = 3, threshold = 0.8, maxDf = 3L)),

    // The maxDf grid: shingles, exact truth, and the df annotation built
    // once; per config only the prefix re-rank + count chain re-run.
    // df=400 = uncapped on the 400-doc slice — the recall-1.0 anchor.
    "q_contain_sweep" -> ((s, dir) =>
      Dedup.containmentDfSweep(
        t(s, dir, "documents").filter(col("doc_id") < 400),
        maxDfs = Seq(2L, 3L, 400L), n = 3, threshold = 0.8)
        .orderBy("max_df")),

    // Convergence-GATED authority: rounds run until max |Δmass| <=
    // LrConvTol or LrConvMaxIters — the residual post-flight as the
    // stopping rule. The stop round is a deterministic integer function
    // of the graph, so the oracle unrolls all rounds, recomputes the
    // residuals, and gates its final SELECT on the same decision (the
    // census-dispatch idiom at the iteration dimension).
    "q_linkrank_conv" -> ((s, dir) =>
      ops.Graph.linkRankConvergedFromTrajectory(
        authorityTrajectory(s, dir),
        tol = LrConvTol, maxIters = LrConvMaxIters)
        .orderBy("node")),

    // Containment survivorship: strict excerpts drop, mutual containment
    // keeps the smallest id, chains resolve greedily.
    "q_contain_resolve" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.resolveContained(d, Dedup.containmentPairs(d))
        .orderBy("doc_id")
    }),

    // Embedding-cosine near-dup: hyperplane-LSH banded candidates + exact
    // cosine verify (the oracle replicates the same plane constants).
    "q_embed_neardup" -> ((s, dir) =>
      ops.Similarity.embeddingNearDup(t(s, dir, "embeddings"))
        .orderBy("vec_a", "vec_b")),

    // Asymmetric embedding near-dup: the odd-id half arrives as a batch
    // against the even-id corpus — nearDupAgainst's embedding twin, no
    // corpus×corpus candidates.
    "q_embed_incr" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      ops.Similarity.embeddingNearDupAgainst(
        e.filter(col("vec_id") % 2 === 0), e.filter(col("vec_id") % 2 === 1))
        .orderBy("vec_inc", "vec_corp")
    }),

    // The SAME probe served from the persisted band-signature registry:
    // only the incoming half pays the hyperplane hashing, corpus
    // embeddings are read for candidate ids alone. Must equal
    // q_embed_incr row-for-row — the oracle string is shared.
    "q_embed_served" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val corpus = e.filter(col("vec_id") % 2 === 0)
      ops.Similarity.embeddingNearDupAgainstSigs(
        embedSigReg(s, dir), corpus,
        e.filter(col("vec_id") % 2 === 1))
        .orderBy("vec_inc", "vec_corp")
    }),

    // Blocking-quality audit for the banded embedding near-dup: per-band
    // bucket census + exact candidate-pair count — the pre-flight a 100×
    // run uses to detect banding collapse BEFORE paying for the verify.
    "q_embed_audit" -> ((s, dir) =>
      ops.Similarity.embedNearDupAudit(t(s, dir, "embeddings"))
        .orderBy("band_idx")),

    // Auto-escalating embedding near-dup, now TWO tiers: the audit
    // census runs FIRST; a collapsed default banding doubles to 32
    // planes (r 4 → 8), and when the RE-audit at 32 planes still
    // floods, the dispatcher falls through to within-cluster banding
    // (SemDeDup's cluster-first regime, exact-integer cluster ids) —
    // the editDistanceJoinAuto audit→dispatch pattern in LSH space.
    // The oracle replays BOTH censuses, both threshold compares, and
    // all three candidate chains, gated on the same decisions.
    "q_embed_auto" -> ((s, dir) =>
      ops.Similarity.embeddingNearDupAuto(t(s, dir, "embeddings"))
        .orderBy("vec_a", "vec_b")),

    // IVF ANN top-5: deterministic cells (first 16 vectors), 4-probe search.
    "q_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      ops.Similarity.ivfTopK(emb, q, 5).orderBy("q_id", "rank")
    }),

    // Quantization wired into the ANN path: the SAME IVF pipeline over
    // int8-quantized vectors (cast back to float — values are small
    // exact ints, and per-vector scales cancel inside cosine), proving
    // the 4x-compressed serving path end-to-end at exact cross-engine
    // parity — int dots are exact in double, so even the sims hash-match.
    "q_ann_quantized" -> ((s, dir) => {
      val qz = Similarity.quantizeEmbeddings(t(s, dir, "embeddings"))
        .select(col("vec_id"), col("q_vec").cast("array<float>").as("embedding"))
      val q = qz.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      ops.Similarity.ivfTopK(qz, q, 5).orderBy("q_id", "rank")
    }),

    // The PRODUCTION IVF shape with oracle evidence: routing cells are a
    // TRAINED artifact — kmeansCellsExact's quantized-space Lloyd loop,
    // whose integer-exact sums make every centroid bit-reproducible
    // cross-engine — handed to ivfTopKWith; serving runs over the same
    // quantized table (q_ann_quantized's 4×-compressed path). The oracle
    // replays the whole train→serve chain: quantize → 3 unrolled Lloyd
    // iterations → cosine-argmax cell assignment → 3-probe search →
    // top-5. (The float-space kmeansCells twin stays spec-verified: its
    // centroid means are order-dependent double sums no other engine
    // can reproduce bit-for-bit — the documented reason this exact twin
    // exists.)
    "q_ann_ivf_trained" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cells = ops.Clustering.kmeansCellsExact(emb, k = 8, iters = 3)
      val qz = Similarity.quantizeEmbeddings(emb)
        .select(col("vec_id"), col("q_vec").cast("array<float>").as("embedding"))
      val q = qz.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      ops.Similarity.ivfTopKWith(qz, q, 5, cells, nProbe = 3)
        .orderBy("q_id", "rank")
    }),

    // Exact self-kNN majority-label audit (k=5, self excluded): the
    // embedding-space label-noise detector. Brute-force baseline form;
    // the same vote composes over ANN neighbors at corpus scale.
    "q_knn_label" -> ((s, dir) =>
      ops.Similarity.knnLabelAudit(t(s, dir, "embeddings"), k = 5)
        .orderBy("vec_id")),

    // LSH-bucketed ANN top-5: exact-bucket candidates (8 sign bits),
    // exact cosine + TopK within the bucket (the oracle shares the plane
    // constants, so the candidate sets match exactly).
    "q_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      ops.Similarity.annTopK(emb, q, 5).orderBy("q_id", "rank")
    }),

    // ANN evaluation closed-loop: recall@5 of the single-probe LSH
    // search against the exact brute-force neighbors on the same query
    // slice — the gate an index rollout reads. Set-overlap only, so the
    // measure is tie-order insensitive.
    "q_ann_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      ops.Similarity.recallAtK(
        ops.Similarity.annTopK(emb, q, 5),
        ops.Similarity.bruteForceTopK(emb, q, 5)).orderBy("q_id")
    }),

    // Recall-gated serving-config sweep: probe budgets {1, 2, 4} at the
    // 8-plane index, one row each with candidate volume (the cost axis)
    // and aggregate recall@5 vs the brute baseline (the quality axis) —
    // the thresholdSweep pattern applied to ANN serving; a rollout picks
    // the cheapest probe budget above its recall floor. The oracle
    // replays the shared bucket/flip machinery once and every config's
    // chain, counting the identical candidate rows.
    "q_ann_sweep" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      ops.Similarity.annProbeSweep(emb, q, 5).orderBy("probes")
    }),

    // The IVF twin of the probe-budget sweep: nProbe {1, 2, 4} over the
    // id-seeded 16-cell index, built ONCE for the whole grid (the sweep
    // prices probe budgets, not index construction); n_candidates is
    // the exact sum of probed cell sizes — IVF's scan-pruning cost
    // axis. The oracle shares q_ann_ivf's assignment chain and replays
    // each config's serve plus the counted probe join.
    "q_ivf_sweep" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val cells = emb.orderBy("vec_id").limit(16)
        .select(col("vec_id").as("cell"), col("embedding").as("c_emb"))
      ops.Similarity.ivfProbeSweep(emb, q, 5, cells).orderBy("n_probe")
    }),

    // Multi-probe ANN top-5: each query searches its own bucket plus the
    // 3 single-bit flips with the smallest hyperplane margin (Lv et al.
    // multi-probe LSH) — recall recovered without growing the index side.
    // The oracle re-derives the same margin-ranked flips from the shared
    // plane constants, so candidate sets match exactly.
    "q_ann_multiprobe" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      ops.Similarity.annTopK(emb, q, 5, probes = 4).orderBy("q_id", "rank")
    }),

    // Multimodal metadata pass: typed binary columns, no decode — the
    // decode stage itself is deliberately non-oracle (stubbed codec),
    // covered by StreamingSpec instead.
    "q_media_stats" -> ((s, dir) =>
      ops.Multimodal.payloadStats(
        ops.Multimodal.mediaFromDocuments(s, t(s, dir, "documents")).toDF())
        .orderBy("media_id")),

    // Rabin-Karp rolling-hash fingerprint (codegen'd O(n) expression):
    // min over 8-token sliding windows of the polynomial token-hash.
    "q_rolling_fp" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), graft.ops.text.TextFns.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          transform(col("toks"),
            tk => conv(substring(md5(tk), 1, 15), 16, 10).cast("long")
              % functions.RollingMinHash.M).as("lh"))
        .select(col("doc_id"),
          functions.RollingMinHash(col("lh"), 8).as("fp_rolling"))
        .orderBy("doc_id")),

    // Gopher-style repetition rule: duplicate word-2-gram ratio per doc.
    "q_repetition" -> ((s, dir) =>
      Corpus.repetitionStats(t(s, dir, "documents")).orderBy("doc_id")),

    // Gopher's other repetition rule: the most frequent bigram and the
    // token-character share its occurrences cover (capped at 1.0).
    "q_ngram_top" -> ((s, dir) =>
      Corpus.topNgramStats(t(s, dir, "documents")).orderBy("doc_id")),

    // Corpus vocabulary: term/document frequency, top-100 by tf.
    "q_vocab" -> ((s, dir) => Corpus.vocab(t(s, dir, "documents"))),

    // Vocabulary coverage curve: share of token occurrences covered by
    // a top-V type vocabulary, per candidate size — the OOV/budget
    // signal read before sizing a tokenizer. Exact integer counts, one
    // long/long division per row.
    "q_vocab_coverage" -> ((s, dir) =>
      ops.text.TextStats.vocabCoverage(t(s, dir, "documents"),
        sizes = Seq(8, 16, 32)).orderBy("vocab_size")),

    // BPE tokenizer training: 8 merges learned from the corpus's
    // distinct-word table (deterministic count-then-lexicographic
    // argmax). Like q_dedup_clusters, the iterations execute eagerly at
    // plan-build time; the oracle replays the SAME loop as a recursive
    // CTE.
    "q_bpe_train" -> ((s, dir) =>
      bpeMerges(s, dir).orderBy("merge_rank")),

    // Merge-replay segmentation under the 8 learned merges: per-doc
    // subword counts and an md5 of the full segmentation. The oracle
    // reuses the training recursion's FINAL word states — the trained
    // state IS the segmentation of every corpus word.
    "q_bpe_segment" -> ((s, dir) => {
      val merges = bpeMerges(s, dir).orderBy("merge_rank")
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      Bpe.segment(t(s, dir, "documents"), merges).orderBy("doc_id")
    }),

    // The SERVING encoder under the same 8 learned merges: broadcast
    // Aho-Corasick automaton + per-partition word memo, per-word cost
    // flat in merge count. Bit-identical output contract to
    // q_bpe_segment — the training-CTE oracle verifies the compiled
    // path exactly as it verifies the fold replay.
    "q_bpe_encode" -> ((s, dir) => {
      val merges = bpeMerges(s, dir).orderBy("merge_rank")
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      Bpe.encode(t(s, dir, "documents"), merges).orderBy("doc_id")
    }),

    // The induced serving vocabulary: base characters (sorted) then
    // merged tokens in rank order, duplicate-producing merges skipped —
    // the id table the model pipeline consumes.
    "q_bpe_vocab" -> ((s, dir) => {
      val merges = bpeMerges(s, dir).orderBy("merge_rank")
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      Bpe.vocab(t(s, dir, "documents"), merges).orderBy("token_id")
    }),

    // Model input end-to-end: encode to ids under the vocabulary; per
    // doc the subword count + an md5 of the exact id sequence.
    "q_bpe_ids" -> ((s, dir) => {
      val merges = bpeMerges(s, dir).orderBy("merge_rank")
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      val v = Bpe.vocab(t(s, dir, "documents"), merges)
      Bpe.encodeIds(t(s, dir, "documents"), merges, v).orderBy("doc_id")
    }),

    // Tokenizer-eval: per-language fertility (subwords per word) under
    // the learned merges — the multilingual vocab-sizing dashboard.
    "q_bpe_fertility" -> ((s, dir) => {
      val merges = bpeMerges(s, dir).orderBy("merge_rank")
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      Bpe.fertility(t(s, dir, "documents"), merges).orderBy("lang")
    }),

    // Context-window chunking: 32-token windows, stride 24 (8-token overlap).
    "q_chunks" -> ((s, dir) =>
      Corpus.chunkDocs(t(s, dir, "documents")).orderBy("doc_id", "chunk_idx")),

    // Deterministic hash split (80/10/10 by md5-prefix bucket).
    "q_hash_split" -> ((s, dir) =>
      Corpus.hashSplit(t(s, dir, "documents"))
        .select("doc_id", "bucket", "split").orderBy("doc_id")),

    // Leakage-safe split: hashSplit keyed by the near-dup cluster
    // canonical, so near-duplicate docs never straddle train/val/test.
    // Pairs come from MinHash-LSH — the scalable pair source a 100 TB
    // split would actually use (and the bench then measures the split's
    // own cost, not a second copy of the PPJoin pipeline that
    // q_dedup_clusters already measures).
    "q_group_split" -> ((s, dir) =>
      Corpus.groupSafeSplit(t(s, dir, "documents"), minhashPairs(s, dir))
        .select("doc_id", "canonical_id", "split").orderBy("doc_id")),

    // Cross-split leakage audit of the NAIVE hash split against the
    // shared MinHash pair table: is_leak rows are near-twins straddling
    // a split boundary — the contamination groupSafeSplit exists to
    // drive to zero (CorpusSpec pins that contrast; this query pins the
    // counting itself).
    "q_split_audit" -> ((s, dir) =>
      Corpus.splitAudit(Corpus.hashSplit(t(s, dir, "documents")),
        minhashPairs(s, dir))
        .orderBy("split_a", "split_b")),

    // Cross-source overlap matrix over the same shared pair table:
    // which sources duplicate which, normalized by possible-pair volume
    // (the mixture-design read naming WHERE a mirror's content lives).
    "q_source_overlap" -> ((s, dir) =>
      Corpus.sourceOverlap(t(s, dir, "documents"), minhashPairs(s, dir))
        .orderBy("source_a", "source_b")),

    // Exact stratified sample: exactly 20 docs per language in stable
    // md5(salt:id) order (rank compiles to WindowGroupLimit).
    "q_stratified" -> ((s, dir) =>
      Corpus.stratifiedSample(t(s, dir, "documents"), "lang", n = 20)
        .select("lang", "sample_rank", "doc_id").orderBy("lang", "sample_rank")),

    // Deterministic per-epoch training order (md5(epoch:doc_id) total
    // order; the scale materialization is the range-partitioned writer).
    "q_epoch_shuffle" -> ((s, dir) =>
      Corpus.epochShuffle(t(s, dir, "documents"), epoch = 3)
        .select("doc_id", "shuffle_key").orderBy("shuffle_key", "doc_id")),

    // Concat-and-split sequence packing: fixed-length pretraining
    // sequences with boundary-straddling docs, bucketed for parallelism.
    "q_pack" -> ((s, dir) =>
      Corpus.packTokens(t(s, dir, "documents"), seqLen = 128, bucketChars = 1)
        .orderBy("bucket", "seq_id", "doc_id")),

    // Rule-based corpus filter with auditable per-doc fired-rule list.
    "q_corpus_filter" -> ((s, dir) =>
      Corpus.filterCorpus(t(s, dir, "documents")).orderBy("doc_id")),

    // Near-dup clustering: connected components (min-label propagation)
    // over the exact-Jaccard pair list; oracle = recursive-CTE reachability.
    "q_dedup_clusters" -> ((s, dir) =>
      Dedup.clusterComponents(jaccardPairs(s, dir))
        .orderBy("doc_id")),

    // Per-doc top-3 distinctive terms (tf·N/df score; log-free so the
    // doubles are bit-identical cross-engine).
    "q_distinct_terms" -> ((s, dir) =>
      Corpus.distinctiveTerms(t(s, dir, "documents"), k = 3)
        .orderBy("doc_id", "term_rank")),

    // Windowed token co-occurrence with log-free lift (the PMI argument):
    // map-side HOF pair generation — the oracle's positional self-join is
    // the naive plan this operator avoids. All-integer counts, one shared
    // IEEE division tree for lift.
    "q_cooccur" -> ((s, dir) =>
      Corpus.cooccurrence(t(s, dir, "documents"), window = 3,
        minPairCount = 2)
        .orderBy("w1", "w2")),

    // Mixture resampling: deterministic per-language replication to the
    // MixWeights target distribution (zh unlisted → dropped).
    "q_mixture" -> ((s, dir) =>
      Corpus.mixtureResample(t(s, dir, "documents"), MixWeights.toMap)
        .orderBy("doc_id", "copy_idx")),

    // Skew audit: top-20 heaviest user_ids with row share — the
    // measurement behind the salt/AQE decision.
    "q_skew_audit" -> ((s, dir) =>
      ops.Distribution.skewAudit(t(s, dir, "events"), "user_id", k = 20)
        .orderBy("hot_rank")),

    // Unkeyed interval join via bucket expansion (the bin-the-range
    // strategy): every 50th event opens a 10-minute window; count events
    // per window. Naive form would plan nested-loop.
    "q_interval_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val windows = ev.filter(col("event_id") % 50 === 0)
        .select(col("event_id").as("window_id"), col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("w_end"))
      ops.Temporal.intervalJoin(
        ev.select("event_id", "ts"), windows,
        "ts", "w_start", "w_end", bucketMs = 600000L)
        .groupBy("window_id").agg(count(lit(1)).as("n_events"))
        .orderBy("window_id")
    }),

    // TPC-H Q3 shape: segment-filtered 3-way join, per-order revenue,
    // top-10 (TakeOrderedAndProject).
    "q_ship_priority" -> ((s, dir) =>
      Relational.shippingPriority(t(s, dir, "customer"), t(s, dir, "orders"),
        t(s, dir, "lineitem"), "BUILDING", "1998-06-01")
        .orderBy(desc("revenue"), asc("order_date"), asc("order_id"))
        .limit(10)),

    // TPC-H Q5 shape: six-way broadcast-dim chain with the same-nation
    // customer/supplier condition.
    "q_local_volume" -> ((s, dir) =>
      Relational.localSupplierVolume(t(s, dir, "customer"), t(s, dir, "orders"),
        t(s, dir, "lineitem"), t(s, dir, "supplier"), t(s, dir, "nation"),
        t(s, dir, "region"), "ASIA", "1997-01-01", "1998-01-01")
        .orderBy(desc("revenue"), asc("nation"))),

    // TPC-H Q17 shape: scalar correlated subquery, decorrelated into a
    // per-part aggregate rejoined on the part key.
    "q_small_qty" -> ((s, dir) =>
      Relational.smallQtyRevenue(t(s, dir, "lineitem"), t(s, dir, "part"))
        .orderBy("brand")),

    // Morton curve value for the part table's two independent filter
    // dims — the clustering key writeZOrdered sorts by.
    "q_zorder" -> ((s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"), col("p_size"),
          ops.Distribution.zValue(col("p_partkey"), col("p_size")).as("z"))
        .orderBy("z", "p_partkey")),

    // 3-D Morton value (partkey × size × whole-dollar price) — the
    // multi-dimensional clustering key of zValueN.
    "q_zorder3" -> ((s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"), col("p_size"),
          floor(col("p_retailprice")).as("price_usd"),
          ops.Distribution.zValueN(Seq(col("p_partkey"), col("p_size"),
            floor(col("p_retailprice")))).as("z"))
        .orderBy("z", "p_partkey")),

    // Benchmark decontamination: distinct-3-gram overlap of each train
    // doc against the held-out benchmark slice (doc_id % 97 == 0).
    "q_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Corpus.decontaminate(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        n = 3, minOverlap = 2)
        .orderBy("doc_id")
    }),

    // Span-level decontamination: redact (not drop) every maximal train
    // span whose 4-token windows occur verbatim in the benchmark slice —
    // the surgical alternative to q_decontaminate's doc gate. Same
    // benchmark split, despan's islands + indexed-HOF rebuild.
    "q_decontaminate_spans" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      ops.text.Spans.decontaminateSpans(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        l = 4)
        .orderBy("doc_id")
    }),

    // The COMPOSED curation pipeline end-to-end: near-dup resolve →
    // per-language quality gate → benchmark decontamination →
    // leakage-safe split, verified as one funnel report. The oracle
    // replays the ENTIRE DAG in SQL (minhash pairs + recursive
    // reachability + quantile gate + overlap scan + split buckets).
    "q_curation_report" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val (_, report) = pipeline.Curation.curate(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0))
      report.orderBy("stage_idx")
    }),

    // The INGEST-time DAG: odd-id batch (less the benchmark slice)
    // against the even-id corpus's PERSISTED artifacts — signature
    // registry (32/8) and reference quality thresholds (p=0.5) — then
    // decontamination against the %97 benchmark. The oracle replays the
    // signature chain, the exact-dedup fingerprints, the corpus-fit
    // gate, and the overlap scan into one funnel statement.
    "q_curation_batch" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val corpus = d.filter(col("doc_id") % 2 === 0)
      val batch = d.filter(col("doc_id") % 2 === 1 &&
        col("doc_id") % 97 =!= 0)
      val benchmark = d.filter(col("doc_id") % 97 === 0)
      // the same (even-corpus, 32/8) signature registry q_minhash_served
      // probes — read from its committed artifact (r14)
      val registry = minhashSigReg(s, dir)
      // spread the corpus for the reference-bar regex pass (r18): the
      // quality scan otherwise fuses into the one-file corpus scan and
      // runs serially (the Curation.curate few-fat-files rationale)
      val thresholds = Corpus.quantileThresholds(
        TextStats.qualityScore(corpus.repartition(
          s.sparkContext.defaultParallelism, col("doc_id")), Seq("lang")),
        "quality_score", "lang", p = 0.5)
      val (_, report) = pipeline.Curation.curateBatch(
        batch, corpus, registry, thresholds, benchmark)
      report.orderBy("stage_idx")
    }),

    // The ingest DAG with the r17 DOMAIN GATE as stage 0: decisions
    // folded from the EVEN corpus's domain stats (served-artifact
    // semantics, exactly like the quality thresholds), the odd-id
    // batch gated allowed-or-unknown BEFORE any per-document work.
    // Uses the withCurUrl derivation (registrable domains span the
    // parity split); the blocklisted mirror1.com drops its batch docs,
    // fresh1/fresh3.org never occur in the even corpus and pass as
    // unknown.
    "q_curation_domains" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val corpus = d.filter(col("doc_id") % 2 === 0)
      val batch = withCurUrl(d).filter(col("doc_id") % 2 === 1 &&
        col("doc_id") % 97 =!= 0)
      val benchmark = d.filter(col("doc_id") % 97 === 0)
      val registry = minhashSigReg(s, dir)
      // corpus spread for the reference-bar regex pass — see
      // q_curation_batch
      val thresholds = Corpus.quantileThresholds(
        TextStats.qualityScore(corpus.repartition(
          s.sparkContext.defaultParallelism, col("doc_id")), Seq("lang")),
        "quality_score", "lang", p = 0.5)
      // the decision table is read from its materialized artifact —
      // the SERVED posture (runCurationIngest reads Manifest the same
      // way); see curDomainDec for the measured planning-cost rationale
      val (_, report) = pipeline.Curation.curateBatch(
        batch, corpus, registry, thresholds, benchmark,
        domainDecisions = Some(curDomainDec(s, dir)))
      report.orderBy("stage_idx")
    }),

    // The same composed DAG with the OPTIONAL model-based filter wired
    // between the quality gate and decontamination: the memoized
    // is-English classifier scores the gate survivors (pure map), docs
    // under p=0.5 drop, and the funnel gains a classifier_kept row. The
    // oracle splices the GD-replay CTEs into the whole-DAG statement
    // and gates on the identical rational-sigmoid compare.
    "q_curation_classified" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val w = qmWeights(s, dir)
      val (_, report) = pipeline.Curation.curate(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        classifierWeights = Some(w),
        resolvedCanon = Some(curationCanon(s, dir)))
      report.orderBy("stage_idx")
    }),

    // The budget variant: the SAME DAG with the token-budget stage
    // between decontamination and the split — per language the best
    // whole score-classes of the decontaminated survivors fill an
    // 800-token budget (literal mirrored in curationBudgetCtes). Reads
    // the persisted resolution (consumer shape).
    "q_curation_budget" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val (_, report) = pipeline.Curation.curate(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        resolvedCanon = Some(curationCanon(s, dir)),
        tokenBudget = Some(800L))
      report.orderBy("stage_idx")
    }),

    // Survivorship: canonical representative + keep/drop flag for EVERY
    // doc (clustered docs resolve to their component minimum; singletons
    // keep themselves). Completes the dedup pipeline end-to-end.
    // Pairs from MinHash-LSH (the 100 TB pair source), like q_group_split;
    // the PPJoin pipeline keeps its own dedicated query (q_dedup_clusters).
    "q_dedup_resolve" -> ((s, dir) =>
      Dedup.resolveCanonical(t(s, dir, "documents"), minhashPairs(s, dir))
        .orderBy("doc_id")),

    // Quality-aware survivorship over the same components: each cluster
    // keeps its highest-quality member (exact-arithmetic score, ties to
    // the smaller doc_id) — the curation policy, vs q_dedup_resolve's
    // min-id baseline. One combinable (score, -id) argmax per component.
    "q_dedup_best" -> ((s, dir) => {
      val scored = ops.text.TextStats.qualityScore(t(s, dir, "documents"))
        .select(col("doc_id"), col("quality_score"))
      Dedup.resolveBest(scored, minhashPairs(s, dir)).orderBy("doc_id")
    }),

    // Corpus shape stats: exact interpolated percentiles per language
    // (bit-parity with DuckDB quantile_cont).
    "q_corpus_stats" -> ((s, dir) =>
      Corpus.corpusStats(t(s, dir, "documents")).orderBy("lang")),

    // 100 TB escape hatches, run as first-class queries.
    // q_corpus_stats_approx IS oracled: with accuracy (10000) >= the
    // group size, the Greenwald-Khanna sketch is exact and Spark's rank
    // convention (ceil(p*n), min 1) equals DuckDB quantile_disc —
    // verified cell-for-cell and at every small-n edge case.
    "q_corpus_stats_approx" -> ((s, dir) =>
      Corpus.corpusStatsApprox(t(s, dir, "documents")).orderBy("lang")),
    // The HLL twin's raw sketch estimates are engine-specific by
    // construction, so the oracled form emits the deterministic column
    // plus in-plan accuracy GATES: booleans asserting each approx count
    // sits within max(15%, 5) of the exact twin. The gates reference the
    // HLL aggregates, so Catalyst cannot prune them — the sketch path is
    // exercised and its accuracy contract hash-checked (DuckDB side is
    // literal TRUE; a Spark HLL regression flips a cell and fails the
    // compare). Bound chosen from the measured fixture envelope: worst
    // abs error 15 @ n≈150 at sf0.1 (default rsd 0.05 is a std error,
    // not a bound); raw estimates stay spec-bounded in RelationalSpec.
    "q_hourly_approx" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val ex = Relational.hourlyMetrics(ev)
        .select(col("metric_hour"), col("total_events").as("_xe"),
          col("unique_users").as("_xu"))
      Relational.hourlyMetricsApprox(ev)
        .join(ex, Seq("metric_hour"))
        .select(col("metric_hour"), col("total_value"),
          (abs(col("total_events") - col("_xe")) <=
            greatest(col("_xe") * 0.15, lit(5.0))).as("events_within_bound"),
          (abs(col("unique_users") - col("_xu")) <=
            greatest(col("_xu") * 0.15, lit(5.0))).as("users_within_bound"))
        .orderBy("metric_hour")
    }),

    // Character-entropy gibberish detector. log2 is transcendental →
    // last-ulp libm divergence cross-engine, so the ORACLED form rounds
    // to 6 dp in both engines (stable parity — a last-ulp delta moves
    // the 6th decimal only when the true value sits within ~1e-15 of a
    // rounding boundary, which the fixture set does not); full-precision
    // values pinned in TextOpsSpec.
    "q_char_entropy" -> ((s, dir) =>
      TextStats.charEntropy(t(s, dir, "documents"))
        .select(col("doc_id"), col("n_distinct_chars"),
          round(col("char_entropy_bits"), 6).as("char_entropy_bits"))
        .orderBy("doc_id")),

    // Corpus-trained bigram LM scoring (CCNet perplexity-filter shape):
    // avg token log-prob under the corpus's own add-0.4-smoothed bigram
    // model. ln compares at the stable 6-decimal rounding (charEntropy's
    // precedent); counts/V/smoothing are exact-integer-derived doubles.
    // The round() exception to the parity rules is deliberate and the
    // LOWEST-flake option available (r8 advice, assessed): the compared
    // value is transcendental, so some tolerance is unavoidable. Flake
    // window here = summation-order noise (~n·ulp ≈ 1e-13) against a
    // 0.5e-6 rounding boundary ⇒ ~1e-7 per doc. The alternative —
    // rounding each logp to fixed decimals pre-sum for an exact DECIMAL
    // average — puts each element's ~1-ulp libm divergence against its
    // own boundary (~1e-4 per ELEMENT at 12 decimals): thousands of
    // times flakier. Exact-rational scoring without ln is the log-free
    // escape if this ever flakes in practice.
    "q_lm_score" -> ((s, dir) =>
      TextStats.lmScore(t(s, dir, "documents"))
        .select(col("doc_id"), col("n_bigrams"),
          round(col("avg_logp"), 6).as("avg_logp"))
        .orderBy("doc_id")),

    // Kneser–Ney twin of q_lm_score: absolute discounting + smoothed
    // continuation unigram — KenLM's smoothing family (knScore is
    // fit ∘ serve of the knModel artifact, so this pins the serve
    // joins too); probabilities are division/multiplication over exact
    // counts, compared at the same 6-dp ln rounding.
    "q_kn_score" -> ((s, dir) =>
      TextStats.knScore(t(s, dir, "documents"))
        .select(col("doc_id"), col("n_bigrams"),
          round(col("avg_logp"), 6).as("avg_logp"))
        .orderBy("doc_id")),

    // TRIGRAM Kneser–Ney (r15): one order up from q_kn_score, backing
    // off through the identical bigram tier (the committed knModel
    // rows are reused verbatim inside kn3Model, so the two orders
    // cannot drift). Self-trained — every trigram/context join hits, so
    // the oracle carries the full two-tier probability tree with inner
    // joins, identically parenthesized; ln compares at 6 dp.
    "q_kn3_score" -> ((s, dir) =>
      TextStats.kn3Score(t(s, dir, "documents"))
        .select(col("doc_id"), col("n_trigrams"),
          round(col("avg_logp"), 6).as("avg_logp"))
        .orderBy("doc_id")),

    // The KN line twin of q_lm_lines: the doc-trained KN model scores
    // each 8-token line (every within-line bigram hits the doc-trained
    // joins — lines are contiguous token runs).
    "q_kn_lines" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      TextStats.knScoreLines(newlineified(d), TextStats.knModel(d))
        .select(col("doc_id"), col("pos"), col("line"), col("n_bigrams"),
          round(col("avg_logp"), 6).as("avg_logp"))
        .orderBy("doc_id", "pos")
    }),

    // The trigram line twin (r15): q_kn_lines one order up — the
    // doc-trained kn3 model scores each 8-token line's trigrams
    // (contiguous runs, so every within-line trigram join hits and the
    // oracle carries the seen two-tier tree with inner joins).
    "q_kn3_lines" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      TextStats.kn3ScoreLines(newlineified(d), TextStats.kn3Model(d))
        .select(col("doc_id"), col("pos"), col("line"), col("n_trigrams"),
          round(col("avg_logp"), 6).as("avg_logp"))
        .orderBy("doc_id", "pos")
    }),

    // 5-GRAM Kneser–Ney (r16): the production CCNet filter order —
    // backing off through the committed trigram AND bigram tiers (the
    // kn3Model/knModel rows ride inside kn5Model verbatim, so all
    // three served orders share one chain). Self-trained, so every
    // count join hits and the oracle carries the full four-tier
    // probability tree with inner joins, identically parenthesized;
    // ln compares at 6 dp.
    "q_kn5_score" -> ((s, dir) =>
      TextStats.kn5Score(t(s, dir, "documents"))
        .select(col("doc_id"), col("n_5grams"),
          round(col("avg_logp"), 6).as("avg_logp"))
        .orderBy("doc_id")),

    // The 5-gram line twin (r16): q_kn3_lines two orders up — the
    // doc-trained kn5 model scores each 8-token line's four 5-grams
    // (contiguous runs, so every within-line join hits and the oracle
    // carries the seen four-tier tree with inner joins).
    "q_kn5_lines" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      TextStats.kn5ScoreLines(newlineified(d), TextStats.kn5Model(d))
        .select(col("doc_id"), col("pos"), col("line"), col("n_5grams"),
          round(col("avg_logp"), 6).as("avg_logp"))
        .orderBy("doc_id", "pos")
    }),

    // Count-pruned 5-gram KN (r17) — the production KenLM size lever:
    // singletons dropped at every order ≥ 3 (kn5ModelPruned). The
    // scoring tree is UNCHANGED — a pruned count row misses its left
    // join exactly like an unseen n-gram and degrades through the
    // committed lower tiers, so the oracle is the same four-tier tree
    // with null-guarded CASE branches over thresholded count CTEs.
    "q_kn5_pruned" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      TextStats.kn5ScoreWith(d, TextStats.kn5ModelPruned(d))
        .select(col("doc_id"), col("n_5grams"),
          round(col("avg_logp"), 6).as("avg_logp"))
        .orderBy("doc_id")
    }),

    // The lever's price tag (r17): one row of model-size benefit
    // (rows before/after pruning) against score-drift cost (exact-
    // decimal |Δ| totals over the self-scored corpus) — so the
    // pruning default is measured, not guessed.
    "q_kn5_drift" -> ((s, dir) =>
      TextStats.kn5PruneDrift(t(s, dir, "documents"))),

    // The LM as a served artifact: fit the model table, score through
    // the serve joins — on the training corpus this must EQUAL
    // q_lm_score bit-for-bit (same oracle string).
    "q_lm_serve" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      TextStats.lmScoreWith(d, TextStats.lmModel(d))
        .select(col("doc_id"), col("n_bigrams"),
          round(col("avg_logp"), 6).as("avg_logp"))
        .orderBy("doc_id")
    }),

    // CCNet's filtering unit: the doc-trained LM scores each 8-token
    // LINE of the newline-ified corpus; the worst lines are what a
    // quantile gate would drop. Lines under 2 tokens carry NULL.
    "q_lm_lines" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      TextStats.lmScoreLines(newlineified(d), TextStats.lmModel(d))
        .select(col("doc_id"), col("pos"), col("line"), col("n_bigrams"),
          round(col("avg_logp"), 6).as("avg_logp"))
        .orderBy("doc_id", "pos")
    }),

    // DSIR importance scoring: rank the whole corpus by target-likeness
    // with the English slice as the target domain — hashed-bigram
    // add-α log-likelihood ratio, mean per doc. Histograms are dim=64
    // rows (broadcast); ln compares at the lmScore 6-dp precedent.
    "q_dsir_score" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Corpus.dsirScore(docs, docs.filter(col("lang") === "en"))
        .select(col("doc_id"), col("n_features"),
          round(col("dsir_score"), 6).as("dsir_score"))
        .orderBy("doc_id")
    }),

    // Per-group top-k leaderboard (WindowGroupLimit pushdown): the 5
    // longest documents per language, ranked by token count.
    "q_topk_per_lang" -> ((s, dir) =>
      Relational.topKPerGroup(
        TextStats.tokenStats(t(s, dir, "documents"))
          .select("lang", "doc_id", "n_tokens"),
        Seq("lang"), Seq(col("n_tokens").desc, col("doc_id").asc), 5)
        .orderBy("lang", "rank")),

    // As-of join (point-in-time feature enrich): odd events pick up the
    // latest preceding even event's value per user. Right side pre-deduped
    // to one row per (user, ts) — the operator's tie contract. Oracle is
    // DuckDB's native ASOF LEFT JOIN.
    "q_asof" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "ts").orderBy(col("event_id").desc)
      val right = ev.filter(col("event_id") % 2 === 0)
        .select("user_id", "ts", "event_id", "value")
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn", "event_id")
      val left = ev.filter(col("event_id") % 2 === 1)
        .select("user_id", "ts", "event_id")
      ops.Temporal.asOfJoin(left, right, "user_id", "ts", Seq("value"))
        .select(col("event_id"), col("user_id"), col("asof_value"),
          unix_millis(col("asof_ts")).as("asof_ts_ms"))
        .orderBy("event_id")
    }),

    // Declarative expectation suite over orders: five rule kinds in one
    // aggregate pass; thresholds chosen so some fire and some pass.
    "q_expectations" -> ((s, dir) =>
      ops.Quality.expectations(t(s, dir, "orders"), Seq(
        ops.Quality.NotNull("o_custkey"),
        ops.Quality.InRange("o_totalprice", 0, 100000),
        ops.Quality.InSet("o_orderstatus", Seq("F", "O")),
        ops.Quality.MatchesRe("o_orderpriority", "^[1-3]-[A-Z]+$"),
        ops.Quality.Unique("o_orderkey")))
        .orderBy("rule")),

    // Largest-remainder pro-rata allocation: a 1%-of-order rebate (cents)
    // split across line items by price, parts summing exactly per order —
    // pure integer arithmetic, bit-identical cross-engine. The fixture's
    // (orderkey, linenumber) is NOT unique; (… partkey, suppkey) is, and
    // both the tie-break and the output order need the full unique key.
    "q_allocate" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey").as("order_id"), col("l_linenumber").as("line_no"),
        col("l_partkey").as("part_id"), col("l_suppkey").as("supp_id"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("w_c"))
      val amounts = li.groupBy("order_id")
        .agg(expr("sum(w_c) div 100").as("amount_c"))
      Relational.allocateProRata(li.join(amounts, Seq("order_id")),
        "order_id", "w_c", "amount_c", Seq("line_no", "part_id", "supp_id"))
        .select("order_id", "line_no", "part_id", "supp_id", "w_c", "amount_c", "alloc")
        .orderBy("order_id", "line_no", "part_id", "supp_id")
    }),

    // Relational CEP: count view→click→purchase pattern OCCURRENCES per
    // user (each step within 12h of the previous) — instance counts, vs
    // the funnels' user counts.
    "q_seq_match" -> ((s, dir) =>
      ops.Events.sequenceMatches(t(s, dir, "events"),
        Seq("view", "click", "purchase"), withinMs = 12L * 3600000)
        .orderBy("user_id")),

    // Symmetric int8 embedding quantization (the 4x ANN memory lever);
    // q_vec rendered as a comma string so the compare is list-layout-free.
    "q_quantize" -> ((s, dir) =>
      Similarity.quantizeEmbeddings(t(s, dir, "embeddings"))
        .select(col("vec_id"), col("q_scale"),
          concat_ws(",", transform(col("q_vec"), x => x.cast("string")))
            .as("q_str"))
        .orderBy("vec_id")),

    // Deterministic JL random projection (64 -> 8 dims), emitted as
    // per-coordinate rows (layout-free compare, exact doubles): every
    // coordinate is an ordered-fold dot against the seed-11 Gaussian
    // rows the oracle embeds as literals.
    "q_rand_project" -> ((s, dir) =>
      Similarity.randomProject(t(s, dir, "embeddings"), outDim = 8)
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("j", "y")))
        .orderBy("vec_id", "j")),

    // Edit-distance self-join (entity resolution): all document-prefix
    // pairs within Levenshtein distance 2, via Ed-Join prefix filtering +
    // exact verify. Oracle is the naive all-pairs scan.
    // q=3: the fixture vocabulary is ~30 words, so 2-grams are all common
    // (113 distinct, median df 631 at sf0.1) and prefix buckets blow up;
    // trigrams are 375/76 — the "raise q on low-diversity corpora" lever
    // the operator documents.
    "q_edit_pairs" -> ((s, dir) =>
      ops.text.Fuzzy.editDistanceJoin(
        t(s, dir, "documents")
          .select(col("doc_id"), substring(col("text"), 1, 20).as("s")),
        "doc_id", "s", maxDist = 2, q = 3)
        .orderBy("id_a", "id_b")),

    // Same contract via PASS-JOIN segment pigeonhole — the low-entropy-
    // corpus regime (sf1 sweep: 41M candidates vs the prefix filter's
    // 476M on 50k fixture-vocab strings). Identical output, same oracle.
    "q_edit_seg" -> ((s, dir) =>
      ops.text.Fuzzy.editDistanceJoinPartitioned(
        t(s, dir, "documents")
          .select(col("doc_id"), substring(col("text"), 1, 20).as("s")),
        "doc_id", "s", maxDist = 2)
        .orderBy("id_a", "id_b")),

    // Automatic regime selection (r8 verdict item #1): measures the
    // prefix filter's candidate volume and dispatches to whichever of
    // the two regimes above wins on THIS corpus. Both are lossless, so
    // the output — and the oracle — is identical either way.
    "q_edit_auto" -> ((s, dir) =>
      ops.text.Fuzzy.editDistanceJoinAuto(
        t(s, dir, "documents")
          .select(col("doc_id"), substring(col("text"), 1, 20).as("s")),
        "doc_id", "s", maxDist = 2, q = 3)
        .orderBy("id_a", "id_b")),

    // Ingest entity-resolution check: odd-id incoming prefixes within
    // Levenshtein 2 of an even-id corpus prefix — the asymmetric Ed-Join
    // (no corpus self-pairing; batch prefix ordered by the CORPUS gram
    // frequencies). Oracle is the naive cross scan.
    "q_edit_incr" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), substring(col("text"), 1, 20).as("s"))
      ops.text.Fuzzy.editDistanceAgainst(
        d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1),
        "doc_id", "s", maxDist = 2, q = 3)
        .orderBy("id_inc", "id_corp")
    }),

    // The segment-regime ingest twin: corpus own-scheme segments indexed,
    // batch probes partner schemes — one direction of the pigeonhole
    // suffices cross-side. Same contract, same cross oracle.
    "q_edit_incr_seg" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), substring(col("text"), 1, 20).as("s"))
      ops.text.Fuzzy.editDistanceAgainstPartitioned(
        d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1),
        "doc_id", "s", maxDist = 2)
        .orderBy("id_inc", "id_corp")
    }),

    // Serve-path twin through the persisted SEGMENT registry — rows are
    // per-string functions (no frequency order at all), so the committed
    // relation keeps full segment-key selectivity AND append-stability.
    "q_edit_served_seg" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), substring(col("text"), 1, 20).as("s"))
      ops.text.Fuzzy.editDistanceAgainstSegIndex(
        edSegReg(s, dir),
        editCorpus(s, dir), d.filter(col("doc_id") % 2 === 1),
        "doc_id", "s", maxDist = 2)
        .orderBy("id_inc", "id_corp")
    }),

    // Automatic regime selection at the ingest form: corpus prefix
    // census → gram-prefix or segment asym. Both lossless — same oracle.
    "q_edit_incr_auto" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), substring(col("text"), 1, 20).as("s"))
      ops.text.Fuzzy.editDistanceAgainstAuto(
        d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1),
        "doc_id", "s", maxDist = 2, q = 3)
        .orderBy("id_inc", "id_corp")
    }),

    // Multi-pass sorted-neighborhood blocking (the third edit-distance
    // candidate regime — O(n·w) by construction, gram-skew-immune, NOT
    // lossless): pairs within 10 positions in the (s, id) or
    // (reverse(s), id) order, exact-verified at distance 2.
    "q_snm_pairs" -> ((s, dir) =>
      ops.text.Fuzzy.sortedNeighborhoodPairs(
        t(s, dir, "documents")
          .select(col("doc_id"), substring(col("text"), 1, 20).as("s")),
        "doc_id", "s", window = 10, maxDist = 2)
        .orderBy("id_a", "id_b")),

    // The SNM recall certificate on the fixed eval slice: exact all-pairs
    // truth vs the two-pass window candidates — SNM has no losslessness
    // theorem, so this instrument is the ONLY recall evidence.
    "q_snm_recall" -> ((s, dir) =>
      ops.text.Fuzzy.snmRecallEval(
        t(s, dir, "documents").filter(col("doc_id") < 400)
          .select(col("doc_id"), substring(col("text"), 1, 20).as("s")),
        "doc_id", "s", window = 10, maxDist = 2)),

    // The window grid: one position build + one truth pass shared
    // across all windows (positions are window-independent).
    "q_snm_sweep" -> ((s, dir) =>
      ops.text.Fuzzy.snmWindowSweep(
        t(s, dir, "documents").filter(col("doc_id") < 400)
          .select(col("doc_id"), substring(col("text"), 1, 20).as("s")),
        "doc_id", "s", windows = Seq(4, 10, 25), maxDist = 2)
        .orderBy("window")),

    // Serve-path twin of q_edit_incr: the corpus side probed THROUGH the
    // persisted hash-ordered (doc_id, len, g, occ) ed-index relation —
    // candidate generation is lossless under ANY shared total order and
    // the verify is exact, so output equals the inline form and the
    // oracle is the cross statement verbatim.
    "q_edit_served" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), substring(col("text"), 1, 20).as("s"))
      ops.text.Fuzzy.editDistanceAgainstIndex(
        edGramReg(s, dir),
        editCorpus(s, dir), d.filter(col("doc_id") % 2 === 1),
        "doc_id", "s", maxDist = 2, q = 3)
        .orderBy("id_inc", "id_corp")
    }),

    // SCD Type-2 dimension history: per-customer status/priority version
    // intervals rebuilt from the order stream (one window shuffle).
    "q_scd2" -> ((s, dir) =>
      ops.Temporal.scd2(t(s, dir, "orders"), key = "o_custkey",
        ts = "o_orderdate", attrs = Seq("o_orderstatus", "o_orderpriority"),
        tieBreak = Seq("o_orderkey"))
        .orderBy("o_custkey", "version")),

    // The INCREMENTAL path under the driver oracle: history built from
    // pre-1998 orders, the rest applied as a batch — under in-order
    // arrival the merge is exactly the full recompute, so the oracle is
    // q_scd2's SQL verbatim.
    "q_scd2_apply" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val attrs = Seq("o_orderstatus", "o_orderpriority")
      val history = ops.Temporal.scd2(
        o.filter(col("o_orderdate") < "1998-01-01"),
        "o_custkey", "o_orderdate", attrs, Seq("o_orderkey"))
      ops.Temporal.scd2Apply(history,
        o.filter(col("o_orderdate") >= "1998-01-01"),
        "o_custkey", "o_orderdate", attrs, Seq("o_orderkey"))
        .orderBy("o_custkey", "version")
    }),

    // PII scrub over text with planted (deterministically derived) PII:
    // the synthetic corpus carries no emails/IPs/phones, so the query
    // derives one of each from doc_id/n_chars before scrubbing — both
    // engines derive, count, and redact identically (RE2-safe patterns).
    "q_pii_scrub" -> ((s, dir) => {
      val derived = t(s, dir, "documents").select(
        col("doc_id"),
        concat(
          lit("u"), col("doc_id").cast("string"), lit("@ex-mail.org ip 10.0."),
          (col("n_chars") % 200).cast("string"), lit(".7 tel 416-555-"),
          lpad((col("n_chars") % 10000).cast("string"), 4, "0"),
          lit(" "), col("text")).as("text"))
      Corpus.piiScrub(derived)
        .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
          md5(col("text")).as("scrub_md5"))
        .orderBy("doc_id")
    }),

    // Substring-level dedup: maximal token spans (≥ 8 tokens) repeated
    // across ≥ 2 docs — sliding-window gram hash + per-doc island merge
    // (the Spark-shaped form of suffix-array ExactSubstr). Integer-only
    // output, bit-exact cross-engine.
    "q_dup_spans" -> ((s, dir) =>
      ops.text.Spans.dupSpans(t(s, dir, "documents"), l = 8, minDocs = 2)
        .orderBy("doc_id", "span_start")),

    // Apply side: remove every duplicated span except its first
    // occurrence (min doc_id, start per span content) and rebuild the
    // cleaned text per doc with an indexed HOF filter — no token explode.
    "q_despan" -> ((s, dir) =>
      ops.text.Spans.despan(t(s, dir, "documents"), l = 8, minDocs = 2)
        .orderBy("doc_id")),

    // Inverted index: term -> (df, cf, postings fingerprint in doc order).
    "q_inverted" -> ((s, dir) =>
      ops.text.Retrieval.invertedIndex(t(s, dir, "documents"))
        .orderBy("term")),

    // BM25 top-20 with rational idf — all score arithmetic is +,-,×,÷
    // over exact integer counts, folded in fixed term order, so the
    // doubles are bit-identical cross-engine (no log, no unordered SUM).
    "q_bm25" -> ((s, dir) =>
      ops.text.Retrieval.bm25Rational(t(s, dir, "documents"),
        Seq("merge", "sort", "window", "hash"), k1 = 1.2, b = 0.75,
        topK = 20)
        .orderBy("rank")),

    // BM25 from the PERSISTED search index (zero tokenization at query
    // time); scoring tail is bm25Rational's shared core, so this must
    // equal q_bm25 row-for-row — the oracle string is shared.
    "q_bm25_served" -> ((s, dir) =>
      ops.text.Retrieval.bm25With(
        searchIndexReg(s, dir),
        Seq("merge", "sort", "window", "hash"), k1 = 1.2, b = 0.75,
        topK = 20)
        .orderBy("rank")),

    // Pseudo-relevance-feedback expansion (the RM3 move, deterministic
    // form): top-5 feedback docs -> 3 expansion terms by tf_fb·idf_r ->
    // one weighted re-scoring pass (originals 1.0, expansion 0.5). The
    // oracle replays the first pass, the selection, and the weighted
    // fold (list_reduce in position order).
    "q_bm25_rm3" -> ((s, dir) =>
      ops.text.Retrieval.bm25Expanded(t(s, dir, "documents"),
        Seq("merge", "sort", "window", "hash"), fbDocs = 5, fbTerms = 3,
        expWeight = 0.5, k1 = 1.2, b = 0.75, topK = 20)
        .orderBy("rank")),

    // Reciprocal-rank fusion of the BM25 and raw-tf rankers over the
    // same terms — the hybrid-retrieval merge, rank-only arithmetic
    // (one IEEE division per list, fold in list order: compares exact).
    "q_rrf" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val ts = Seq("merge", "sort", "window", "hash")
      ops.text.Retrieval.rrfFuse(Seq(
        ops.text.Retrieval.bm25Rational(d, ts, topK = 20),
        ops.text.Retrieval.tfTopK(d, ts, topK = 20)))
        .orderBy("rank")
    }),

    // RM3 served from the persisted index: both retrieval passes and
    // the expansion selection read postings only — must equal inline
    // (same oracle string).
    "q_rm3_served" -> ((s, dir) =>
      ops.text.Retrieval.bm25ExpandedWith(
        searchIndexReg(s, dir),
        Seq("merge", "sort", "window", "hash"), fbDocs = 5, fbTerms = 3,
        expWeight = 0.5, k1 = 1.2, b = 0.75, topK = 20)
        .orderBy("rank")),

    // Graded retrieval eval: the cheap first-stage ranker (raw tf
    // top-10) scored per query against exact rational-BM25 truth —
    // recall@10, MRR, and nDCG@10 with the truth's own scores as
    // graded gains. The retrieval twin of q_ann_recall, adding rank
    // discounting. recall/mrr are single exact-integer divisions and
    // compare raw; dcg/ndcg carry log2 → the 6-dp transcendental
    // precedent (q_char_entropy).
    "q_retrieval_eval" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val truth = RetrievalEvalQueries.map { case (qid, ts) =>
        ops.text.Retrieval.bm25Rational(d, ts, topK = 10)
          .select(lit(qid).as("query_id"), col("rank"), col("doc_id"),
            col("score").as("gain"))
      }.reduce(_ unionByName _)
      val res = RetrievalEvalQueries.map { case (qid, ts) =>
        ops.text.Retrieval.tfTopK(d, ts, topK = 10)
          .select(lit(qid).as("query_id"), col("rank"), col("doc_id"))
      }.reduce(_ unionByName _)
      ops.text.Retrieval.rankingEval(res, truth, k = 10)
        .select(col("query_id"), col("n_truth"), col("n_hit"),
          col("recall"), col("mrr"),
          round(col("dcg"), 6).as("dcg"),
          round(col("ndcg"), 6).as("ndcg"))
        .orderBy("query_id")
    }),

    // Hard-negative mining over the same query set: BM25 top-10 per
    // query anti-joined against a relevance set INDEPENDENT of the
    // lexical score — the cross-lingual shape (relevant = right-language
    // docs; an all-lexical proxy would correlate with BM25 and leave the
    // top-10 all-relevant). The mined rows are the highest-scoring
    // wrong-language candidates — exactly what a reranker trains
    // against. Scores are the rational-BM25 doubles (compare raw).
    "q_hard_negatives" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val ranked = RetrievalEvalQueries.map { case (qid, ts) =>
        ops.text.Retrieval.bm25Rational(d, ts, topK = 10)
          .select(lit(qid).as("query_id"), col("rank"), col("doc_id"),
            col("score"))
      }.reduce(_ unionByName _)
      val positives = RetrievalEvalQueries.map { case (qid, _) =>
        d.filter(col("lang") === "en")
          .select(lit(qid).as("query_id"), col("doc_id"))
      }.reduce(_ unionByName _)
      ops.text.Retrieval.hardNegatives(ranked, positives, k = 5)
        .orderBy("query_id", "neg_rank")
    }),

    // C4-style line cleaning over deterministically newline-ified docs
    // (every 8 tokens become a line): lines under 3 tokens or containing
    // a blacklist term ('the'/'a' — the fixture's stopword stand-ins)
    // are dropped, the rest re-joined in order.
    "q_clean_lines" -> ((s, dir) =>
      ops.text.Corpus.cleanLines(newlineified(t(s, dir, "documents")),
          minTokens = 3, banned = Seq("the", "a"))
        .select(col("doc_id"), col("n_lines"), col("n_kept"),
          col("text_clean"))
        .orderBy("doc_id")),

    // Corpus-wide keep-first line dedup over the same newline-ified
    // docs: later occurrences of a repeated 8-token line drop, firsts
    // survive in place (~175 duplicate line occurrences in the sf0.01
    // fixture, concentrated in the planted near-dup pairs).
    "q_dedup_lines" -> ((s, dir) =>
      ops.text.Corpus.dedupLines(newlineified(t(s, dir, "documents")))
        .orderBy("doc_id")),

    // The boilerplate detector: top-20 most-repeated 8-token lines with
    // occurrence/document counts — the measurement a cleanLines
    // blacklist is sized from.
    "q_line_stats" -> ((s, dir) =>
      ops.text.Corpus.lineStats(newlineified(t(s, dir, "documents")), k = 20)),

    // Gopher's within-document repetition rules at line grain: per doc,
    // the duplicate-line fraction and character-weighted duplicate
    // fraction — the per-document signal (dedupLines/lineStats are the
    // corpus-wide passes).
    "q_line_repetition" -> ((s, dir) =>
      ops.text.Corpus.lineRepetition(newlineified(t(s, dir, "documents")))
        .orderBy("doc_id")),

    // Incremental line dedup: the odd-id half arrives as a batch and its
    // lines are flagged against the even-id corpus's first-seen line
    // registry (the nearDupAgainst shape at line grain; stateless, so
    // the same call runs stream-static — StreamingSpec pins it).
    "q_dedup_lines_incr" -> ((s, dir) => {
      val nl = newlineified(t(s, dir, "documents"))
      ops.text.Corpus.dedupLinesAgainst(
          nl.filter(col("doc_id") % 2 === 1),
          ops.text.Corpus.lineRegistry(nl.filter(col("doc_id") % 2 === 0)))
        .orderBy("doc_id", "pos")
    }),

    // Nearest-centroid assignment over int8-quantized embeddings (k=8
    // id-seeded centroids): exact integer distances, bit-reproducible —
    // the oracle-checkable step of the k-means family (full Lloyd's
    // iteration is spec-verified in ClusteringSpec).
    "q_kmeans_assign" -> ((s, dir) =>
      ops.Clustering.assignCentroids(t(s, dir, "embeddings"), k = 8)
        .orderBy("vec_id")),

    // Elbow table: per candidate k, the fully-trained exact-Lloyd
    // model's final inertia + cell-balance facts — the cluster-count
    // selection gate (ks/iters mirrored in the oracle's suffixed CTE
    // chains — change together).
    "q_kmeans_sweep" -> ((s, dir) =>
      ops.Clustering.kmeansSweep(t(s, dir, "embeddings"),
        ks = Seq(2, 4, 8), iters = 2).orderBy("k")),

    // Embedding-space drift: occupancy of the full corpus vs the odd-id
    // batch under the SAME trained cell geometry (k = 8, 3 exact-Lloyd
    // iterations — the q_ann_ivf_trained training constants; the oracle
    // replays the loop and the clamped-L2 assignment).
    "q_embed_drift" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      ops.Clustering.embeddingDrift(emb,
        emb.filter(col("vec_id") % 2 === 1),
        ops.Clustering.kmeansCellsExact(emb, k = 8, iters = 3))
        .orderBy("cell")
    }),

    // SemDeDup: k-means partition (exact-integer assignment) + within-
    // cluster exact-cosine drop of higher-id near-duplicates.
    // k = 8 / threshold = 0.35 are mirrored as LIMIT 8 / >= 0.35
    // literals in the oracle SQL — change both together.
    "q_semantic_dedup" -> ((s, dir) =>
      ops.Clustering.semanticDedup(t(s, dir, "embeddings"), k = 8,
          threshold = 0.35)
        .orderBy("vec_id")),

    // Incremental SemDeDup (nearDupAgainst's embedding-space twin):
    // even vec_ids play the landed corpus, odd the incoming batch;
    // corpus-seeded centroids, incoming dropped on any >= 0.35 corpus
    // mate in its cluster. Same literal-tie rule as q_semantic_dedup.
    "q_semantic_incr" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      ops.Clustering.semanticDedupAgainst(
        emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1),
        k = 8, threshold = 0.35)
        .orderBy("vec_id")
    }),

    // Link-graph pre-flight: one-row census (nodes, edges, dangling
    // share, hub skew) of the co-purchase graph the authority rounds
    // will run on — read BEFORE paying for q_linkrank's iterations.
    "q_graph_audit" -> ((s, dir) =>
      ops.Graph.degreeAudit(
        t(s, dir, "part").select(col("p_partkey").as("node")),
        coPurchaseEdges(t(s, dir, "lineitem")))),

    // The whale-order cap's one-row audit: how many qualifying orders
    // the LrMaxItemsPerOrder guard drops from the co-purchase graph and
    // how many directed pairs that saves — read alongside q_graph_audit
    // before paying for rounds (0 capped on TPC-H-shaped fixtures, where
    // orders carry <= 7 lineitems; the count is the evidence, not an
    // assumption).
    "q_copurchase_cap" -> ((s, dir) => {
      val sizes = t(s, dir, "lineitem")
        .filter(col("l_quantity") >= LrMinQty)
        .groupBy("l_orderkey").agg(count(lit(1)).as("n_items"))
      sizes.agg(
        count(lit(1)).as("n_orders"),
        count(when(col("n_items") > LrMaxItemsPerOrder, 1)).as("n_capped"),
        coalesce(sum(when(col("n_items") > LrMaxItemsPerOrder,
          col("n_items") * (col("n_items") - 1))), lit(0L))
          .as("pairs_dropped"),
        max(col("n_items")).as("max_items"))
    }),

    // Damped integer-mass link authority (PageRank family) over the
    // co-purchase graph: LrIters rounds of Long floor-division
    // arithmetic, bit-identical across engines because every cross-row
    // sum is an integer sum. The oracle unrolls the rounds as chained
    // CTEs with // floor division.
    // Served from the shared authority trajectory (r16): the round-
    // LrIters tap IS linkRank(LrIters) bit-for-bit (GraphSpec
    // operator-vs-consumer equality — deterministic integer masses).
    "q_linkrank" -> ((s, dir) =>
      authorityTrajectory(s, dir).filter(col("round") === LrIters)
        .select(col("node"), col("mass"))
        .orderBy("node")),

    // Convergence post-flight: per round, max |Δmass| and changed-node
    // count over the same chain — did LrIters rounds suffice? (Integer
    // max/count: order-independent, replayed by diffing the oracle's
    // consecutive m_i CTEs.)
    "q_linkrank_residual" -> ((s, dir) =>
      ops.Graph.linkRankResidualFromTrajectory(
        authorityTrajectory(s, dir), iters = LrIters)
        .orderBy("round")),

    // Personalized (seeded) authority: teleport and the dangling pool
    // flow only to the trusted-seed set (p_partkey % 20 = 0 — the
    // deterministic membership the oracle replays as the same
    // predicate); non-seeds earn mass exclusively through in-edges.
    "q_linkrank_seeded" -> ((s, dir) => {
      val nodes = t(s, dir, "part").select(col("p_partkey").as("node"))
      ops.Graph.linkRankSeeded(nodes,
        coPurchaseEdges(t(s, dir, "lineitem")),
        nodes.filter(col("node") % 20 === 0),
        iters = LrIters, base = LrBase, dampNum = LrDampNum,
        dampDen = LrDampDen)
        .orderBy("node")
    }),

    // Exact triangle census over the undirected co-purchase graph:
    // degree-ordered orientation (each triangle found once, wedge
    // fan-out O(√m)), per-node counts + clustering coefficient — the
    // local-density signal. Two equi-joins, zero iteration.
    "q_triangles" -> ((s, dir) =>
      ops.Graph.triangles(
        t(s, dir, "part").select(col("p_partkey").as("node")),
        coPurchaseEdges(t(s, dir, "lineitem")))
        .orderBy("node")),

    // BFS hop distance from the trusted-seed set over the co-purchase
    // graph: frontier-based min-plus rounds, each edge relaxed at most
    // once across the whole run; unreachable-within-horizon stays NULL.
    // Early stop ≡ the oracle's fixed HopMaxHops unroll (idempotent
    // tail), so no stop decision needs replaying.
    "q_hops" -> ((s, dir) => {
      val nodes = t(s, dir, "part").select(col("p_partkey").as("node"))
      ops.Graph.hopDistance(nodes,
        coPurchaseEdges(t(s, dir, "lineitem")),
        nodes.filter(col("node") % HopSeedMod === 0),
        maxHops = HopMaxHops)
        .orderBy("node")
    }),

    // WEIGHTED hop distance (r15): min-plus relaxation rounds over the
    // weighted co-purchase edges from the same seed set — the cheapest
    // total edge weight within WHopMaxRounds edges, where q_hops counts
    // the fewest edges. Frontier Bellman-Ford equals the oracle's dense
    // per-round relaxation by the standard induction (a non-improved
    // source's contributions are already min-folded into state), and
    // the early stop is fixpoint-idempotent — no stop decision to
    // replay, the q_hops/q_kcore idiom.
    "q_hops_weighted" -> ((s, dir) => {
      val nodes = t(s, dir, "part").select(col("p_partkey").as("node"))
      ops.Graph.hopDistanceWeighted(nodes,
        coPurchaseEdges(t(s, dir, "lineitem")),
        nodes.filter(col("node") % HopSeedMod === 0),
        maxRounds = WHopMaxRounds)
        .orderBy("node")
    }),

    // Synchronous weighted label propagation (deterministic LPA):
    // LpRounds rounds of argmax-by-(incident weight, min label) over the
    // symmetrized co-purchase graph — integer totals, so the labeling
    // replays exactly; the oracle's per-round argmax is a node-
    // partitioned row_number.
    // Served from the shared community trajectory (r16): the round-
    // LpRounds tap IS labelPropagate(LpRounds) bit-for-bit (GraphSpec
    // operator-vs-consumer equality) — the five sync instruments read
    // one materialized trajectory instead of each unrolling its own.
    "q_communities" -> ((s, dir) =>
      communityTrajectory(s, dir).filter(col("round") === LpRounds)
        .select(col("node"), col("label"))
        .orderBy("node")),

    // The LPA residual ladder: per-round changed-label counts over
    // LpConvMaxRounds rounds — free at the operator's own cost (the
    // count rides each round's materializing action).
    "q_communities_residual" -> ((s, dir) =>
      ops.Graph.residualFromTrajectory(
        communityTrajectory(s, dir), rounds = LpConvMaxRounds)
        .orderBy("round")),

    // Convergence-GATED communities: stop at the first zero-change
    // round (LIVE on this fixture), else LpConvMaxRounds; labels equal
    // the fixed unroll by idempotence and `rounds` replays from the
    // same consecutive-round diffs.
    "q_communities_conv" -> ((s, dir) =>
      ops.Graph.convergedFromTrajectory(
        communityTrajectory(s, dir), maxRounds = LpConvMaxRounds)
        .orderBy("node")),

    // SEMI-synchronous LPA — the remedy for the non-convergence the
    // residual ladder above measures (sync LPA trades labels forever on
    // this dense graph): update one `node % SemiColors` class per
    // sub-step so a node never updates simultaneously with the
    // neighbors it reads. The stop is LIVE on this fixture (zero-change
    // at round 16 < SemiMaxRounds=17) and the oracle CERTIFIES it: the
    // replayed diff ladder must find d=0 at the same round for the
    // `rounds` column to match. Convergence ≠ quality: q_modularity's
    // instrument shows the converged labeling is near-trivial on this
    // dense graph (the monster-community sweep; labelPropSemiSync
    // scaladoc carries the measured numbers) — this row certifies the
    // TERMINATION device, the modularity row certifies which labeling
    // to ship.
    "q_communities_semisync" -> ((s, dir) =>
      ops.Graph.labelPropSemiSync(
        t(s, dir, "part").select(col("p_partkey").as("node")),
        coPurchaseEdges(t(s, dir, "lineitem")),
        maxRounds = SemiMaxRounds, numColors = SemiColors)
        .orderBy("node")),

    // Community QUALITY: Newman modularity of the sync labeling at the
    // 3-round and 6-round depths — the instrument that turns "more
    // rounds help" into a measured claim (exact integer/decimal
    // aggregates, ONE final division to double). Two cheap LPA runs +
    // two aggregate passes; no iteration beyond the labelings.
    "q_modularity" -> ((s, dir) =>
      // depths {3, 6} scored off the SHARED trajectory (r16 — the r15
      // per-query ladder generalized across the whole family): the
      // relabel rounds are amortized into the one materialized
      // trajectory; this query pays only the two exact-operand
      // modularity aggregates.
      ops.Graph.qualityLadderFromTrajectory(
        communityTrajectory(s, dir),
        coPurchaseEdges(t(s, dir, "lineitem")),
        depths = Seq(LpRounds, LpConvMaxRounds))),

    // Modularity-GATED communities with the QUALITY-PLATEAU stop — the
    // production recipe the two instruments above point at: budgeted
    // synchronous rounds, ship the labeling of the argmax-modularity
    // round, and STOP once LpGatePatience consecutive rounds fail to
    // improve the exact numerator (the sf0.01 ladder peaks at round 10
    // and falls after — the old budget-6 config truncated the climb at
    // Q = 0.297; this stops LIVE at round 12 and ships round 10,
    // Q = 0.3192). Selection AND stop compare exact DECIMAL numerators
    // (all rounds share the (2m)^2 denominator), so the oracle replays
    // the identical integer decisions from its own unrolled ladder —
    // earliest round on exact ties.
    // Served from the shared trajectory (r16): the per-round exact
    // DECIMAL numerators come out of ONE (endpoint, round) join-and-
    // aggregate pass instead of 12 live per-round aggregates, and the
    // plateau stop + argmax replay from that bounded ladder exactly as
    // the live loop decides them (GraphSpec operator-vs-consumer
    // equality; the oracle already replays the stop from its own
    // unrolled ladder, which is precisely this consumer's shape).
    "q_communities_gated" -> ((s, dir) =>
      ops.Graph.qualityGatedFromTrajectory(
        communityTrajectory(s, dir),
        coPurchaseEdges(t(s, dir, "lineitem")),
        maxRounds = LpGateMaxRounds, patience = LpGatePatience)
        .orderBy("node")),

    // k-core membership by iterative peeling: KcoreMaxRounds synchronized
    // peels of the undirected simple co-purchase graph (stable at round 5
    // on sf0.01 — a LIVE multi-round cascade, not a one-shot degree
    // filter); survivors with residual degree. Peeling is idempotent at
    // the fixpoint, so the early-stopped loop equals the oracle's fixed
    // unroll.
    "q_kcore" -> ((s, dir) =>
      ops.Graph.kcore(
        t(s, dir, "part").select(col("p_partkey").as("node")),
        coPurchaseEdges(t(s, dir, "lineitem")),
        k = KcoreK, maxRounds = KcoreMaxRounds)
        .orderBy("node")),

    // TextRank keyword extraction: the q_cooccur pair graph feeding the
    // q_linkrank rounds at term grain — top-30 terms by integer mass.
    // window/minPairCount mirror q_cooccur's literals; iters/base/damping
    // are the Lr* vals the oracle chain interpolates.
    "q_textrank" -> ((s, dir) =>
      Corpus.textRank(t(s, dir, "documents"), window = 3,
        minPairCount = 2, topK = 30, iters = LrIters, base = LrBase,
        dampNum = LrDampNum, dampDen = LrDampDen)
        .orderBy("rank"))
  )

  /** DuckDB CTE-materialization hint, applied uniformly to every oracle
    * statement: rewrite each non-recursive CTE head `name AS (` to
    * `name AS MATERIALIZED (`.
    *
    * Why this exists: DuckDB 1.0 INLINES a CTE at every reference site,
    * so an oracle whose final SELECT reads five funnel stages — each a
    * count over a CTE chain that shares the minhash-pair + reachability
    * prefix — re-executes that whole prefix once per reference, and the
    * optimizer occasionally picks a catastrophic join order for one of
    * the copies. The whole-DAG curation replays paid for this
    * multiplicatively: q_curation_budget alone cost 703 s at sf0.01 in
    * the r12 gate's budget (the round's official correctness file came
    * back EMPTY because the 175-query compare outgrew the driver's
    * window). `AS MATERIALIZED` is a pure evaluation fence — each CTE
    * runs once, results are provably identical (validated over all 172
    * r12 oracles: 0 diffs, 896.6 s -> 52.6 s total).
    *
    * Exclusions, both structural: (a) a RECURSIVE member (its body
    * references its own name — materialization is meaningless there and
    * DuckDB rejects it); (b) a named-WINDOW clause (`WINDOW w AS (...)`),
    * which shares the `name AS (` surface syntax but is not a CTE. CTE
    * bodies in this registry are sequential at the top level, so "body =
    * text up to the next head" is exact for the self-reference test.
    */
  private def materializeCtes(sql: String): String = {
    val head = """(\w+)\s+AS\s*\(""".r
    def isWindowClause(start: Int): Boolean =
      sql.substring(0, start).reverse.dropWhile(_.isWhitespace)
        .take(6).reverse.equalsIgnoreCase("WINDOW")
    // the CTE body ends at its own balanced close paren (quote-aware:
    // parens inside '...' literals don't count) — NOT at the next head
    // or end-of-statement. The earlier next-head heuristic over-extended
    // the LAST CTE's body into the final SELECT, which always references
    // it, so the last CTE of every statement was misread as recursive
    // and silently left unmaterialized (q_contain_served's self-joined
    // nz, q_kcore's twice-read u6 — exactly the double-inlining this
    // fence exists to stop).
    def bodyEnd(openEnd: Int): Int = {
      var depth = 1
      var i = openEnd
      var inQuote = false
      while (i < sql.length && depth > 0) {
        val c = sql.charAt(i)
        if (inQuote) { if (c == '\'') inQuote = false }
        else c match {
          case '\'' => inQuote = true
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
        }
        i += 1
      }
      i
    }
    val heads = head.findAllMatchIn(sql).toList
      .filterNot(m => isWindowClause(m.start))
    val recursive = heads.collect {
      case m if {
        ("""\b""" + java.util.regex.Pattern.quote(m.group(1)) + """\b""").r
          .findFirstIn(sql.substring(m.end, bodyEnd(m.end))).isDefined
      } => m.group(1)
    }.toSet
    head.replaceAllIn(sql, m =>
      scala.util.matching.Regex.quoteReplacement(
        if (recursive(m.group(1)) || isWindowClause(m.start)) m.matched
        else s"${m.group(1)} AS MATERIALIZED ("))
  }

  /** DuckDB-runnable oracle per query (same parquet tables, same aliases,
    * same ORDER BY). Decimal/rounding policy mirrors graft.package helpers.
    * Every statement passes through [[materializeCtes]] — a semantics-free
    * DuckDB evaluation hint; see its scaladoc.
    */
  def oracleSql: Map[String, String] =
    rawOracleSql.map { case (k, v) => k -> materializeCtes(v) }

  private def rawOracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | sum(l_quantity) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | avg(l_quantity) AS avg_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS avg_price,
        | count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_fact_enrich" ->
      """SELECT o_orderkey AS order_id, l_linenumber AS line_no,
        | o_custkey AS customer_id,
        | coalesce(c_mktsegment, 'UNKNOWN') AS customer_tier,
        | CAST(o_orderdate AS DATE) AS order_date,
        | CAST(month(o_orderdate) AS INTEGER) AS order_month,
        | l_partkey AS product_id, l_quantity AS quantity,
        | CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS line_total,
        | CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_amount,
        | o_orderstatus AS payment_status,
        | coalesce(n_name, 'NO NATION') AS nation,
        | coalesce(r_name, 'NO REGION') AS region,
        | CASE WHEN r_name IN ('AMERICA','EUROPE') THEN 'WEST'
        |      WHEN r_name IN ('ASIA','MIDDLE EAST') THEN 'EAST'
        |      ELSE 'OTHER' END AS trade_zone
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey
        |LEFT JOIN customer ON o_custkey = c_custkey
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |ORDER BY order_id, line_no, product_id, quantity, line_total""".stripMargin,

    "q_dup_check" ->
      """SELECT l_orderkey, count(*) AS cnt
        |FROM lineitem GROUP BY l_orderkey HAVING count(*) > 1
        |ORDER BY l_orderkey""".stripMargin,

    "q_amount_mismatch" ->
      """WITH calc AS (
        |  SELECT l_orderkey,
        |   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS calculated_total
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT o_orderkey AS order_id,
        | CAST(calculated_total AS DOUBLE) AS calculated_total,
        | CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_amount,
        | CAST(CAST(abs(calculated_total - CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS diff
        |FROM orders JOIN calc ON o_orderkey = l_orderkey
        |WHERE abs(calculated_total - CAST(o_totalprice AS DECIMAL(18,2))) > 0.01
        |ORDER BY order_id""".stripMargin,

    "q_orders_no_lineitem" ->
      """SELECT o_orderkey AS order_id,
        | CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_amount,
        | o_orderstatus AS payment_status
        |FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        |ORDER BY order_id""".stripMargin,

    "q_set_ops" ->
      """SELECT 'both_halves' AS set_kind, o_custkey AS customer_id FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 1)
        |UNION ALL
        |SELECT 'high_value_never_f', o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 200000
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |ORDER BY set_kind, customer_id""".stripMargin,

    // RANGE frame ordered on days-since-epoch — identical numeric frame
    // bounds on both sides; average = exact window sum / window count.
    "q_range_ma" ->
      """WITH daily AS (
        |  SELECT p_type AS category, l_shipdate AS ship_date,
        |   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2)
        |SELECT category, ship_date, CAST(revenue AS DOUBLE) AS revenue,
        | CAST(CAST(sum(revenue) OVER w AS DOUBLE) / count(*) OVER w AS DOUBLE) AS revenue_ma7d
        |FROM daily
        |WINDOW w AS (PARTITION BY category
        |             ORDER BY datediff('day', DATE '1970-01-01', ship_date)
        |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY category, ship_date""".stripMargin,

    "q_product_ranks" ->
      """WITH rev AS (
        |  SELECT l_partkey AS product_id,
        |   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1)
        |SELECT product_id, CAST(revenue AS DOUBLE) AS revenue,
        | CAST(dense_rank() OVER w AS INT) AS drank,
        | percent_rank() OVER w AS prank,
        | CAST(ntile(4) OVER w AS INT) AS quartile
        |FROM rev
        |WINDOW w AS (ORDER BY revenue DESC, product_id)
        |ORDER BY product_id""".stripMargin,

    // Pivot ≡ conditional aggregation (column-per-type counts).
    "q_pivot" ->
      """SELECT CAST(user_id % 10 AS INT) AS user_bucket,
        | CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view,
        | CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
        | CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
        | CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
        | CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // grouping_id bit order: first rollup column is the MSB in both
    // engines (explicit GROUPING arithmetic keeps it unambiguous).
    "q_rollup" ->
      """SELECT n_name AS nation, p_type AS category,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | count(*) AS n_lines,
        | CAST(GROUPING(n_name) * 2 + GROUPING(p_type) AS INT) AS grp
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, p_type)
        |ORDER BY grp, nation NULLS FIRST, category NULLS FIRST""".stripMargin,

    "q_cube" ->
      """SELECT n_name AS nation, p_type AS category,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | count(*) AS n_lines,
        | CAST(GROUPING(n_name) * 2 + GROUPING(p_type) AS INT) AS grp
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY CUBE (n_name, p_type)
        |ORDER BY grp, nation NULLS FIRST, category NULLS FIRST""".stripMargin,

    // stddev from exact integer sums of cent-scaled values: built-in
    // stddev merge orders differ across engines, and even wide-decimal →
    // double conversion rounds differently (1-ulp divergence measured) —
    // int64 sums + one shared double formula are bit-identical.
    "q_value_stats" ->
      """WITH s AS (
        |  SELECT event_type, count(*) AS n,
        |   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sx,
        |   CAST(sum(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sxx
        |  FROM events GROUP BY 1)
        |SELECT event_type, n,
        | CAST(sx AS DOUBLE) / 100.0 / n AS mean,
        | CASE WHEN n > 1 THEN
        |   sqrt((CAST(sxx AS DOUBLE) / 10000.0 -
        |         (CAST(sx AS DOUBLE) / 100.0) * (CAST(sx AS DOUBLE) / 100.0) / n)
        |        / (n - 1)) END AS stddev
        |FROM s ORDER BY event_type""".stripMargin,

    // Earliest-per-type chain funnel: min ts per (user, step type), then
    // strict-ordering reach conditions — identical fold on both sides.
    "q_funnel" ->
      """WITH m AS (
        |  SELECT user_id,
        |   min(CASE WHEN event_type = 'view' THEN ts END) AS t0,
        |   min(CASE WHEN event_type = 'click' THEN ts END) AS t1,
        |   min(CASE WHEN event_type = 'purchase' THEN ts END) AS t2
        |  FROM events GROUP BY user_id),
        |c AS (
        |  SELECT
        |   count(CASE WHEN t0 IS NOT NULL THEN 1 END) AS n0,
        |   count(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t0 < t1
        |              THEN 1 END) AS n1,
        |   count(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t0 < t1
        |               AND t2 IS NOT NULL AND t1 < t2 THEN 1 END) AS n2
        |  FROM m)
        |SELECT step, step_name,
        | CAST(CASE step WHEN 1 THEN n0 WHEN 2 THEN n1 ELSE n2 END AS BIGINT) AS n_users
        |FROM c, (VALUES (1, 'view'), (2, 'click'), (3, 'purchase')) AS s(step, step_name)
        |ORDER BY step""".stripMargin,

    // Greedy earliest-after fold, one CTE per step; counts of non-null
    // step timestamps from the final accumulator.
    "q_funnel_chain" ->
      """WITH f AS (
        |  SELECT user_id, event_type, ts FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        |a0 AS (
        |  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t0
        |  FROM f GROUP BY 1),
        |a1 AS (
        |  SELECT f.user_id, min(a0.t0) AS t0,
        |   min(CASE WHEN event_type = 'click' AND ts > a0.t0 THEN ts END) AS t1
        |  FROM f JOIN a0 ON f.user_id = a0.user_id GROUP BY 1),
        |a2 AS (
        |  SELECT f.user_id, min(a1.t0) AS t0, min(a1.t1) AS t1,
        |   min(CASE WHEN event_type = 'purchase' AND ts > a1.t1 THEN ts END) AS t2
        |  FROM f JOIN a1 ON f.user_id = a1.user_id GROUP BY 1),
        |c AS (SELECT count(t0) AS n0, count(t1) AS n1, count(t2) AS n2 FROM a2)
        |SELECT step, step_name,
        | CAST(CASE step WHEN 1 THEN n0 WHEN 2 THEN n1 ELSE n2 END AS BIGINT) AS n_users
        |FROM c, (VALUES (1, 'view'), (2, 'click'), (3, 'purchase')) AS s(step, step_name)
        |ORDER BY step""".stripMargin,

    // Millisecond arithmetic: unix_millis ≡ epoch_ms, one double division
    // + floor on both sides.
    "q_retention" ->
      """WITH f AS (
        |  SELECT user_id, min(ts) AS first_ts,
        |   date_trunc('week', min(ts)) AS cohort_week
        |  FROM events GROUP BY user_id)
        |SELECT f.cohort_week,
        | CAST(floor((epoch_ms(e.ts) - epoch_ms(f.first_ts)) / 604800000.0) AS INT) AS week_offset,
        | count(DISTINCT e.user_id) AS n_active
        |FROM events e JOIN f ON e.user_id = f.user_id
        |WHERE floor((epoch_ms(e.ts) - epoch_ms(f.first_ts)) / 604800000.0) BETWEEN 0 AND 8
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Same journey order (ts, then event_id for simultaneous events);
    // P(to|from) is one int/int double division in both engines.
    "q_transitions" ->
      """WITH j AS (
        |  SELECT event_type AS from_type,
        |   lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events)
        |SELECT from_type, to_type, count(*) AS n_transitions,
        | CAST(count(*) AS DOUBLE) /
        |   CAST(sum(count(*)) OVER (PARTITION BY from_type) AS DOUBLE) AS p_transition
        |FROM j WHERE to_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // generate_series is inclusive of both bounds, like Spark sequence().
    "q_gapfill" ->
      """WITH bounds AS (
        |  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
        |  FROM events),
        |grid AS (
        |  SELECT t.event_type, unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS metric_hour
        |  FROM (SELECT DISTINCT event_type FROM events) t, bounds b),
        |hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS metric_hour, count(*) AS n_events
        |  FROM events GROUP BY 1, 2)
        |SELECT g.event_type, g.metric_hour, coalesce(h.n_events, 0) AS n_events
        |FROM grid g LEFT JOIN hourly h USING (event_type, metric_hour)
        |ORDER BY 1, 2""".stripMargin,

    // q_gapfill's grid + one lag(24) per type; error sums stay integral
    // (HUGEINT sums cast back to DOUBLE only at the final division).
    "q_forecast_backtest" ->
      """WITH bounds AS (
        |  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
        |  FROM events),
        |grid AS (
        |  SELECT t.event_type, unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS metric_hour
        |  FROM (SELECT DISTINCT event_type FROM events) t, bounds b),
        |hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS metric_hour, count(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |filled AS (
        |  SELECT g.event_type, g.metric_hour, coalesce(h.n_events, 0) AS n_events
        |  FROM grid g LEFT JOIN hourly h USING (event_type, metric_hour)),
        |lagged AS (
        |  SELECT event_type, n_events,
        |    lag(n_events, 24) OVER (PARTITION BY event_type ORDER BY metric_hour) AS forecast
        |  FROM filled)
        |SELECT event_type, count(*) AS n_hours,
        |  CAST(sum(abs(n_events - forecast)) AS DOUBLE) / count(*) AS mae,
        |  CAST(sum(n_events - forecast) AS DOUBLE) / count(*) AS bias
        |FROM lagged WHERE forecast IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Mirrors rateAnomaly's exact expression tree: integer frame sums
    // (n, Σx, Σx²) then one shared IEEE double chain (divide, multiply,
    // sqrt are correctly rounded — bit parity without any rounding).
    "q_rate_anomaly" ->
      """WITH bounds AS (
        |  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
        |  FROM events),
        |grid AS (
        |  SELECT t.event_type, unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS metric_hour
        |  FROM (SELECT DISTINCT event_type FROM events) t, bounds b),
        |hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS metric_hour, count(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |filled AS (
        |  SELECT g.event_type, g.metric_hour, coalesce(h.n_events, 0) AS n_events
        |  FROM grid g LEFT JOIN hourly h USING (event_type, metric_hour)),
        |m AS (
        |  SELECT event_type, metric_hour, n_events,
        |   CAST(count(n_events) OVER w AS DOUBLE) AS nd,
        |   CAST(sum(n_events) OVER w AS DOUBLE) AS s1,
        |   CAST(sum(n_events * n_events) OVER w AS DOUBLE) AS s2
        |  FROM filled
        |  WINDOW w AS (PARTITION BY event_type ORDER BY metric_hour
        |               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        |z AS (
        |  SELECT event_type, metric_hour, n_events,
        |   CASE WHEN nd = 24.0 THEN s1 / nd END AS mean_trailing,
        |   CASE WHEN nd = 24.0
        |         AND sqrt(greatest((s2 - s1 * s1 / nd) / (nd - 1.0), 0.0)) > 0.0
        |    THEN (CAST(n_events AS DOUBLE) - s1 / nd)
        |           / sqrt(greatest((s2 - s1 * s1 / nd) / (nd - 1.0), 0.0))
        |   END AS z_score
        |  FROM m)
        |SELECT event_type, metric_hour, n_events, mean_trailing, z_score,
        | coalesce(abs(z_score) > 3.0, false) AS is_anomaly
        |FROM z ORDER BY 1, 2""".stripMargin,

    // One UNION ALL branch per profiled column; numeric min/max as
    // DOUBLE, NULL for non-numeric columns (never a string rendering —
    // engines disagree on double/timestamp to-string).
    "q_profile" -> {
      val branch = (c: String, numeric: Boolean) => {
        val mn = if (numeric) s"CAST(min($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
        val mx = if (numeric) s"CAST(max($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
   CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
   count(DISTINCT $c) AS n_distinct, $mn AS min_num, $mx AS max_num
 FROM events"""
      }
      Seq("event_id" -> true, "ts" -> false, "user_id" -> true,
        "event_type" -> false, "value" -> true, "props" -> false)
        .map((branch).tupled)
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },

    // Same bounds, same width, same floor/least tree; empty bins
    // restored from generate_series, max value in the last bin.
    "q_histogram" ->
      """WITH b AS (
        |  SELECT min(CAST(value AS DOUBLE)) AS lo, max(CAST(value AS DOUBLE)) AS hi
        |  FROM events WHERE value IS NOT NULL),
        |c AS (
        |  SELECT CAST(CASE WHEN b.hi = b.lo THEN 0.0
        |    ELSE least(floor((CAST(value AS DOUBLE) - b.lo) / ((b.hi - b.lo) / 12.0)), 11.0)
        |   END AS INT) AS bin, count(*) AS n
        |  FROM events, b WHERE value IS NOT NULL GROUP BY 1),
        |g AS (SELECT unnest(generate_series(0, 11)) AS bin, lo, hi FROM b)
        |SELECT g.bin,
        | g.lo + CAST(g.bin AS DOUBLE) * ((g.hi - g.lo) / 12.0) AS bin_lo,
        | CASE WHEN g.bin = 11 THEN g.hi
        |  ELSE g.lo + CAST(g.bin + 1 AS DOUBLE) * ((g.hi - g.lo) / 12.0) END AS bin_hi,
        | coalesce(c.n, 0) AS n
        |FROM g LEFT JOIN c USING (bin) ORDER BY bin""".stripMargin,

    // quantile_disc = approx_percentile in the exact n <= accuracy
    // regime (rank ⌈p·n⌉ both sides — verified across n and p); bin
    // membership and edges are element identity, not arithmetic.
    "q_hist_equidepth" ->
      """WITH v AS (SELECT CAST(n_chars AS DOUBLE) AS x FROM documents
        |           WHERE n_chars IS NOT NULL),
        |t AS (SELECT quantile_disc(x, [0.2, 0.4, 0.6, 0.8]) AS th FROM v),
        |b AS (SELECT len(list_filter(t.th, e -> v.x > e)) AS bin FROM v, t),
        |c AS (SELECT bin, count(*) AS n FROM b GROUP BY 1),
        |g AS (SELECT unnest(generate_series(0, 4)) AS bin, th FROM t)
        |SELECT CAST(g.bin AS INT) AS bin,
        | CASE WHEN g.bin >= 1 THEN th[CAST(g.bin AS INT)] END AS bin_lo,
        | CASE WHEN g.bin < 4 THEN th[CAST(g.bin AS INT) + 1] END AS bin_hi,
        | coalesce(c.n, 0) AS n
        |FROM g LEFT JOIN c USING (bin) ORDER BY bin""".stripMargin,

    // Shared union-wide bounds, the same bin tree per side, then pure
    // division/multiplication drift terms (TV and chi2; PSI's ln() is a
    // transcendental and stays out per the parity rule).
    "q_hist_drift" ->
      """WITH o AS (SELECT CAST(value AS DOUBLE) AS x FROM events
        |           WHERE ts < TIMESTAMP '2024-01-16' AND value IS NOT NULL),
        |nw AS (SELECT CAST(value AS DOUBLE) AS x FROM events
        |       WHERE ts >= TIMESTAMP '2024-01-16' AND value IS NOT NULL),
        |b AS (SELECT min(x) AS lo, max(x) AS hi
        |      FROM (SELECT x FROM o UNION ALL SELECT x FROM nw)),
        |oc AS (SELECT CAST(CASE WHEN b.hi = b.lo THEN 0.0
        |         ELSE least(floor((x - b.lo) / ((b.hi - b.lo) / 10.0)), 9.0)
        |        END AS INT) AS bin, count(*) AS n_old FROM o, b GROUP BY 1),
        |nc AS (SELECT CAST(CASE WHEN b.hi = b.lo THEN 0.0
        |         ELSE least(floor((x - b.lo) / ((b.hi - b.lo) / 10.0)), 9.0)
        |        END AS INT) AS bin, count(*) AS n_new FROM nw, b GROUP BY 1),
        |g AS (SELECT unnest(generate_series(0, 9)) AS bin, lo, hi FROM b),
        |j AS (SELECT g.bin,
        |       g.lo + CAST(g.bin AS DOUBLE) * ((g.hi - g.lo) / 10.0) AS bin_lo,
        |       CASE WHEN g.bin = 9 THEN g.hi
        |        ELSE g.lo + CAST(g.bin + 1 AS DOUBLE) * ((g.hi - g.lo) / 10.0) END AS bin_hi,
        |       coalesce(oc.n_old, 0) AS n_old, coalesce(nc.n_new, 0) AS n_new
        |      FROM g LEFT JOIN oc USING (bin) LEFT JOIN nc USING (bin)),
        |t AS (SELECT CAST(sum(n_old) AS BIGINT) AS tot_old,
        |             CAST(sum(n_new) AS BIGINT) AS tot_new FROM j)
        |SELECT j.bin, j.bin_lo, j.bin_hi, j.n_old, j.n_new,
        | CAST(j.n_old AS DOUBLE) / CAST(t.tot_old AS DOUBLE) AS p_old,
        | CAST(j.n_new AS DOUBLE) / CAST(t.tot_new AS DOUBLE) AS p_new,
        | abs(CAST(j.n_new AS DOUBLE) / CAST(t.tot_new AS DOUBLE)
        |   - CAST(j.n_old AS DOUBLE) / CAST(t.tot_old AS DOUBLE)) AS share_drift,
        | CASE WHEN CAST(j.n_old AS DOUBLE) / CAST(t.tot_old AS DOUBLE) > 0.0
        |  THEN (CAST(j.n_new AS DOUBLE) / CAST(t.tot_new AS DOUBLE)
        |        - CAST(j.n_old AS DOUBLE) / CAST(t.tot_old AS DOUBLE))
        |     * (CAST(j.n_new AS DOUBLE) / CAST(t.tot_new AS DOUBLE)
        |        - CAST(j.n_old AS DOUBLE) / CAST(t.tot_old AS DOUBLE))
        |     / (CAST(j.n_old AS DOUBLE) / CAST(t.tot_old AS DOUBLE))
        | END AS chi2_term
        |FROM j, t ORDER BY bin""".stripMargin,

    // Same md5 16-bit draw as the Spark side (hash-split convention,
    // numeric form); u and the quality score share one expression tree.
    "q_weighted_sample" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |   CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |   CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
        |   CAST(len(regexp_extract_all(text, '\b(the|and|of|is|in|to|a)\b')) AS INT) AS stopword_cnt
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, lang,
        |   least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
        |     + CAST(stopword_cnt AS DOUBLE) / n_tokens * 0.3
        |     + CAST(n_distinct AS DOUBLE) / n_tokens * 0.2 AS quality_score
        |  FROM b),
        |u AS (
        |  SELECT doc_id, lang, quality_score,
        |   CAST(CAST(concat('0x', substr(md5(concat('ws', ':', CAST(doc_id AS VARCHAR))), 1, 4)) AS BIGINT) AS DOUBLE)
        |     / 65536.0 AS sample_u
        |  FROM q)
        |SELECT doc_id, lang, quality_score, sample_u,
        | sample_u < quality_score AS is_sampled
        |FROM u ORDER BY doc_id""".stripMargin,

    // Discrete medians (quantile_disc = approx_percentile in the exact
    // regime); abs/subtract/divide are IEEE basic ops — bit parity.
    "q_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_disc(CAST(value AS DOUBLE), 0.5) AS med
        |  FROM events GROUP BY 1),
        |d AS (
        |  SELECT e.*, m.med, abs(CAST(e.value AS DOUBLE) - m.med) AS abs_dev
        |  FROM events e JOIN med m USING (event_type)),
        |mad AS (
        |  SELECT event_type, quantile_disc(abs_dev, 0.5) AS mad
        |  FROM d GROUP BY 1)
        |SELECT d.event_type, d.event_id, d.ts, d.user_id, d.value, d.props,
        | d.med, mad.mad,
        | CASE WHEN mad.mad > 0.0 THEN d.abs_dev / mad.mad END AS robust_z,
        | coalesce(CASE WHEN mad.mad > 0.0 THEN d.abs_dev / mad.mad END > 3.5,
        |          false) AS is_outlier
        |FROM d JOIN mad USING (event_type) ORDER BY event_id""".stripMargin,

    // Null-safe per-column comparison (IS DISTINCT FROM ≡ NOT(<=>));
    // presence flags, not data-column null probes.
    "q_snapshot_diff" ->
      """WITH old AS (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus, true AS in_old
        |  FROM orders WHERE o_orderkey % 5 <> 0),
        |nw AS (
        |  SELECT o_orderkey,
        |   CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice * 1.1
        |        ELSE o_totalprice END AS o_totalprice,
        |   o_orderstatus, true AS in_new
        |  FROM orders WHERE o_orderkey % 3 <> 0)
        |SELECT coalesce(old.o_orderkey, nw.o_orderkey) AS o_orderkey,
        | old.o_totalprice AS old_o_totalprice,
        | old.o_orderstatus AS old_o_orderstatus,
        | nw.o_totalprice AS new_o_totalprice,
        | nw.o_orderstatus AS new_o_orderstatus,
        | CASE WHEN old.in_old IS NULL THEN 'added'
        |      WHEN nw.in_new IS NULL THEN 'removed'
        |      WHEN old.o_totalprice IS DISTINCT FROM nw.o_totalprice
        |        OR old.o_orderstatus IS DISTINCT FROM nw.o_orderstatus
        |       THEN 'changed'
        |      ELSE 'unchanged' END AS change_type
        |FROM old FULL OUTER JOIN nw ON old.o_orderkey = nw.o_orderkey
        |ORDER BY o_orderkey""".stripMargin,

    // get_json_object('$.k') ≡ DuckDB json_extract_string(props, '$.k');
    // avg from exact sum / count so both engines do one IEEE division.
    "q_event_props" ->
      """SELECT event_type,
        | count(*) AS n_events,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
        |   / count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_supplier_geo" ->
      """SELECT r_name AS region,
        | count(*) AS n_suppliers,
        | CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Same oracle as q_orders_no_lineitem: the bloom route must be exact.
    "q_bloom_anti" ->
      """SELECT o_orderkey AS order_id,
        | CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_amount,
        | o_orderstatus AS payment_status
        |FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        |ORDER BY order_id""".stripMargin,

    "q_inactive_customers" ->
      """WITH last AS (
        |  SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_order_date
        |  FROM orders GROUP BY o_custkey)
        |SELECT c_custkey AS customer_id, c_name AS name, last_order_date
        |FROM customer LEFT JOIN last ON c_custkey = o_custkey
        |WHERE last_order_date IS NULL OR last_order_date < DATE '2000-01-01'
        |ORDER BY customer_id""".stripMargin,

    "q_hourly_metrics" ->
      """SELECT date_trunc('hour', ts) AS metric_hour,
        | count(DISTINCT event_id) AS total_events,
        | count(DISTINCT user_id) AS unique_users,
        | CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
        | CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)/count(*) AS avg_value
        |FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // The accuracy gates are literal TRUE here: the oracle pins the
    // deterministic column exactly and asserts Spark's in-plan HLL
    // accuracy booleans came out true (see the queries-side comment).
    "q_hourly_approx" ->
      """SELECT date_trunc('hour', ts) AS metric_hour,
        | CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
        | TRUE AS events_within_bound,
        | TRUE AS users_within_bound
        |FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_category_revenue" ->
      """SELECT p_type AS category,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | sum(l_quantity) AS units_sold
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_tier_aov" ->
      """SELECT coalesce(c_mktsegment, 'UNKNOWN') AS customer_tier,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS avg_order_value,
        | count(*) AS n_orders
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_geo_distribution" ->
      """SELECT r_name AS region,
        | count(*) AS total_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
        | count(DISTINCT o_custkey) AS unique_customers
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_top_products" ->
      """SELECT p_partkey AS product_id, p_name AS product_name,
        | sum(l_quantity) AS units_sold,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1, 2
        |ORDER BY units_sold DESC, product_id
        |LIMIT 10""".stripMargin,

    "q_revenue_trend" ->
      """WITH daily AS (
        |  SELECT p_type AS category, CAST(l_shipdate AS DATE) AS ship_date,
        |   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= DATE '2001-01-01'
        |  GROUP BY 1, 2)
        |SELECT category, ship_date, CAST(revenue AS DOUBLE) AS revenue,
        | CAST(sum(revenue) OVER w AS DOUBLE)/count(*) OVER w AS revenue_ma7
        |FROM daily
        |WINDOW w AS (PARTITION BY category ORDER BY ship_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY category, ship_date""".stripMargin,

    "q_merge_hourly" ->
      """WITH t AS (
        |  SELECT date_trunc('hour', ts) AS metric_hour, count(*) AS total_events,
        |   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS total_value
        |  FROM events WHERE event_id % 2 = 0 GROUP BY 1),
        |s AS (
        |  SELECT date_trunc('hour', ts) AS metric_hour, count(*) AS total_events,
        |   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS total_value
        |  FROM events WHERE event_id % 2 = 1 GROUP BY 1)
        |SELECT coalesce(t.metric_hour, s.metric_hour) AS metric_hour,
        | coalesce(t.total_events, 0) + coalesce(s.total_events, 0) AS total_events,
        | CAST(CAST(coalesce(t.total_value, 0) + coalesce(s.total_value, 0) AS DECIMAL(18,6)) AS DOUBLE) AS total_value
        |FROM t FULL OUTER JOIN s ON t.metric_hour = s.metric_hour
        |ORDER BY metric_hour""".stripMargin,

    // split(text,' ') ≡ string_split; regexp_extract_all full-match lists
    // have identical semantics in Spark (Java regex) and DuckDB (RE2) for
    // these patterns. avg_token_len derives from ints with one double
    // division — deterministic (graft.package policy).
    "q_token_stats" ->
      """SELECT doc_id, lang, n_chars,
        | CAST(length(text) AS INT) AS text_len,
        | CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        | CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct_tokens,
        | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_bpe_tokens,
        | CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |   / len(string_split(text, ' ')) AS avg_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_quality_score" ->
      """WITH b AS (
        |  SELECT doc_id,
        |   CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |   CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
        |   CAST(len(regexp_extract_all(text, '\b(the|and|of|is|in|to|a)\b')) AS INT) AS stopword_cnt,
        |   CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS INT) AS punct_cnt
        |  FROM documents)
        |SELECT doc_id, n_tokens, stopword_cnt, punct_cnt,
        | CAST(stopword_cnt AS DOUBLE) / n_tokens AS stopword_ratio,
        | CAST(n_distinct AS DOUBLE) / n_tokens AS type_token_ratio,
        | least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
        |   + CAST(stopword_cnt AS DOUBLE) / n_tokens * 0.3
        |   + CAST(n_distinct AS DOUBLE) / n_tokens * 0.2 AS quality_score
        |FROM b ORDER BY doc_id""".stripMargin,

    // Same score pipeline as q_quality_score (plus lang); the per-lang
    // median threshold is the DISCRETE quantile — an actual group
    // element, = approx_percentile in the exact n <= accuracy regime
    // (the q_corpus_stats_approx rank-convention equivalence).
    "q_quality_gate" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |   CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |   CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
        |   CAST(len(regexp_extract_all(text, '\b(the|and|of|is|in|to|a)\b')) AS INT) AS stopword_cnt,
        |   CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS INT) AS punct_cnt
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, lang, n_tokens, stopword_cnt, punct_cnt,
        |   CAST(stopword_cnt AS DOUBLE) / n_tokens AS stopword_ratio,
        |   CAST(n_distinct AS DOUBLE) / n_tokens AS type_token_ratio,
        |   least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
        |     + CAST(stopword_cnt AS DOUBLE) / n_tokens * 0.3
        |     + CAST(n_distinct AS DOUBLE) / n_tokens * 0.2 AS quality_score
        |  FROM b),
        |th AS (
        |  SELECT lang, quantile_disc(quality_score, 0.5) AS threshold
        |  FROM q GROUP BY lang)
        |SELECT q.lang, q.doc_id, q.n_tokens, q.stopword_cnt, q.punct_cnt,
        | q.stopword_ratio, q.type_token_ratio, q.quality_score,
        | th.threshold, q.quality_score >= th.threshold AS is_kept
        |FROM q JOIN th USING (lang) ORDER BY doc_id""".stripMargin,

    // Same b/q CTEs; the oracle affords the document-grain percent_rank
    // window directly — RANK-based tie semantics and the (below)/(n−1)
    // integer division match the class-relation computation exactly.
    "q_score_rank" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |   CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |   CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
        |   CAST(len(regexp_extract_all(text, '\b(the|and|of|is|in|to|a)\b')) AS INT) AS stopword_cnt,
        |   CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS INT) AS punct_cnt
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, lang, n_tokens, stopword_cnt, punct_cnt,
        |   CAST(stopword_cnt AS DOUBLE) / n_tokens AS stopword_ratio,
        |   CAST(n_distinct AS DOUBLE) / n_tokens AS type_token_ratio,
        |   least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
        |     + CAST(stopword_cnt AS DOUBLE) / n_tokens * 0.3
        |     + CAST(n_distinct AS DOUBLE) / n_tokens * 0.2 AS quality_score
        |  FROM b)
        |SELECT lang, doc_id, n_tokens, stopword_cnt, punct_cnt,
        | stopword_ratio, type_token_ratio, quality_score,
        | percent_rank() OVER (PARTITION BY lang ORDER BY quality_score) AS pct_rank
        |FROM q ORDER BY doc_id""".stripMargin,

    // Two document-grain percent_rank windows (the class-relation
    // computation's exact equal) + the identical literal-fold blend
    // tree: coalesce'd weighted ranks over CASE'd present weights.
    "q_score_fuse" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |   CAST(n_chars AS DOUBLE) AS v1,
        |   CAST(len(string_split(text, ' ')) AS DOUBLE) AS v2
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang,
        |   percent_rank() OVER (PARTITION BY lang ORDER BY v1) AS r1,
        |   percent_rank() OVER (PARTITION BY lang ORDER BY v2) AS r2
        |  FROM d)
        |SELECT doc_id, lang, r1 AS rank_n_chars, r2 AS rank_n_tokens,
        | (coalesce(2.0 * r1, 0.0) + coalesce(1.0 * r2, 0.0)) /
        | ((CASE WHEN r1 IS NOT NULL THEN 2.0 ELSE 0.0 END)
        |  + (CASE WHEN r2 IS NOT NULL THEN 1.0 ELSE 0.0 END)) AS fused_score
        |FROM r ORDER BY doc_id""".stripMargin,

    // Same b/q CTEs as q_quality_gate; score-classes (lang, score) with
    // their token mass, descending cumulative window over the CLASS
    // relation, threshold = smallest admitted class. LEFT join keeps
    // overflow-stratum rows visible as is_kept = false.
    "q_token_budget" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |   CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |   CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
        |   CAST(len(regexp_extract_all(text, '\b(the|and|of|is|in|to|a)\b')) AS INT) AS stopword_cnt,
        |   CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS INT) AS punct_cnt
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, lang, n_tokens, stopword_cnt, punct_cnt,
        |   CAST(stopword_cnt AS DOUBLE) / n_tokens AS stopword_ratio,
        |   CAST(n_distinct AS DOUBLE) / n_tokens AS type_token_ratio,
        |   least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
        |     + CAST(stopword_cnt AS DOUBLE) / n_tokens * 0.3
        |     + CAST(n_distinct AS DOUBLE) / n_tokens * 0.2 AS quality_score
        |  FROM b),
        |cls AS (
        |  SELECT lang, quality_score, sum(n_tokens) AS tok
        |  FROM q GROUP BY lang, quality_score),
        |cum AS (
        |  SELECT lang, quality_score,
        |   sum(tok) OVER (PARTITION BY lang ORDER BY quality_score DESC) AS cum
        |  FROM cls),
        |th AS (
        |  SELECT lang, min(quality_score) AS threshold,
        |   CAST(max(cum) AS BIGINT) AS kept_tokens
        |  FROM cum WHERE cum <= 2000 GROUP BY lang)
        |SELECT q.lang, q.doc_id, q.n_tokens, q.stopword_cnt, q.punct_cnt,
        | q.stopword_ratio, q.type_token_ratio, q.quality_score,
        | th.threshold, th.kept_tokens,
        | coalesce(q.quality_score >= th.threshold, false) AS is_kept
        |FROM q LEFT JOIN th USING (lang) ORDER BY doc_id""".stripMargin,

    // Same b/q CTEs as q_quality_gate; thresholds are the per-language
    // discrete quartiles (actual data values), bucket = # strictly
    // below — ties sit in the lower bucket on both engines.
    "q_score_buckets" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |   CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |   CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
        |   CAST(len(regexp_extract_all(text, '\b(the|and|of|is|in|to|a)\b')) AS INT) AS stopword_cnt,
        |   CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS INT) AS punct_cnt
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, lang, n_tokens, stopword_cnt, punct_cnt,
        |   CAST(stopword_cnt AS DOUBLE) / n_tokens AS stopword_ratio,
        |   CAST(n_distinct AS DOUBLE) / n_tokens AS type_token_ratio,
        |   least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
        |     + CAST(stopword_cnt AS DOUBLE) / n_tokens * 0.3
        |     + CAST(n_distinct AS DOUBLE) / n_tokens * 0.2 AS quality_score
        |  FROM b),
        |th AS (
        |  SELECT lang, quantile_disc(quality_score, [0.25, 0.5, 0.75]) AS ths
        |  FROM q GROUP BY lang)
        |SELECT q.lang, q.doc_id, q.n_tokens, q.stopword_cnt, q.punct_cnt,
        | q.stopword_ratio, q.type_token_ratio, q.quality_score,
        | CAST(len(list_filter(th.ths, t -> q.quality_score > t)) AS INT) AS bucket
        |FROM q JOIN th USING (lang) ORDER BY doc_id""".stripMargin,

    // Ten GD steps replayed in the recursive CTE; weights are exact
    // decimal gradient sums pushed through identical double arithmetic.
    "q_quality_model" -> (QualityModelCtes + s"""
      |SELECT CAST(j AS INT) AS j, list_extract(w, j + 1) AS weight
      |FROM rec, LATERAL (SELECT unnest(generate_series(0, $QmDim)) AS j) t
      |WHERE it = $QmIters ORDER BY j""".stripMargin),

    // Same recursion; scoring is the identical ordered z fold + rational
    // sigmoid on the final weights.
    "q_quality_predict" -> (QualityModelCtes + s"""
      |SELECT f.doc_id, f.y,
      | 0.5 + 0.5 * t.z / (1 + abs(t.z)) AS score,
      | CAST(0.5 + 0.5 * t.z / (1 + abs(t.z)) >= 0.5 AS INT) AS predicted
      |FROM feat f, (SELECT w FROM rec WHERE it = $QmIters) fw,
      | LATERAL (SELECT list_reduce(
      |   [list_extract(fw.w, ff + 1) FOR ff IN f.fs], (a, b) -> a + b) AS z) t
      |ORDER BY doc_id""".stripMargin),

    // The same scoring chain crossed with the threshold literals (the
    // SAME QmThresholds constants as the Spark call), exact confusion
    // counts, ratio = one double division guarded NULL on empty
    // denominators on both engines.
    "q_quality_sweep" -> (QualityModelCtes + s""",
      |sc AS (
      |  SELECT f.doc_id, f.y, 0.5 + 0.5 * t.z / (1 + abs(t.z)) AS score
      |  FROM feat f, (SELECT w FROM rec WHERE it = $QmIters) fw,
      |   LATERAL (SELECT list_reduce(
      |     [list_extract(fw.w, ff + 1) FOR ff IN f.fs], (a, b) -> a + b) AS z) t),
      |th(threshold) AS (VALUES ${QmThresholds.map(t => s"(CAST($t AS DOUBLE))").mkString(", ")}),
      |cm AS (
      |  SELECT threshold,
      |   CAST(sum(CASE WHEN score >= threshold AND y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
      |   CAST(sum(CASE WHEN score >= threshold AND y <> 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
      |   CAST(sum(CASE WHEN score < threshold AND y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
      |   CAST(sum(CASE WHEN score < threshold AND y <> 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
      |  FROM sc CROSS JOIN th GROUP BY threshold)
      |SELECT threshold, tp, fp, fn, tn,
      | CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) END AS precision,
      | CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) END AS recall
      |FROM cm ORDER BY threshold""".stripMargin),

    // The same scoring chain bucketed by score decile: DECIMAL(18,6)
    // score sums (the dec6 policy — matches Spark's sumMeasure), exact
    // 0/1 label sums, single-division ratios, gap one subtraction.
    "q_calibration" -> (CalModelCtes + s""",
      |sc AS (
      |  SELECT f.doc_id, f.y, 0.5 + 0.5 * t.z / (1 + abs(t.z)) AS score
      |  FROM feat f, (SELECT w FROM rec WHERE it = $QmIters) fw,
      |   LATERAL (SELECT list_reduce(
      |     [list_extract(fw.w, ff + 1) FOR ff IN f.fs], (a, b) -> a + b) AS z) t),
      |b AS (SELECT least(CAST(floor(score * 10) AS INT), 9) AS bin, y,
      |       CAST(score AS DECIMAL(18,6)) AS s6 FROM sc),
      |g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(s6) AS DECIMAL(18,6)) AS ssum, sum(y) AS ysum
      |      FROM b GROUP BY bin)
      |SELECT bin, n, CAST(ssum AS DOUBLE) / n AS mean_score,
      | ysum / n AS pos_rate,
      | CAST(ssum AS DOUBLE) / n - ysum / n AS gap
      |FROM g ORDER BY bin""".stripMargin),

    // norms are sqrt of the ordered-fold squared sum — both engines run
    // the identical IEEE sequence and sqrt is correctly rounded, so
    // min/max norms are bit-identical; all other columns are counts.
    "q_embedding_stats" ->
      """WITH v AS (
        |  SELECT label, embedding IS NULL AS is_null,
        |   CAST(len(embedding) AS INT) AS dim,
        |   sqrt(list_reduce([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
        |        for i in generate_series(1, len(embedding))], (x, y) -> x + y)) AS norm,
        |   CASE WHEN len(list_filter(embedding, x -> isnan(x) OR isinf(x))) > 0
        |        THEN 1 ELSE 0 END AS bad
        |  FROM embeddings)
        |SELECT label,
        | CAST(count(*) AS BIGINT) AS n_vectors,
        | CAST(sum(CASE WHEN is_null THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        | min(dim) AS min_dim, max(dim) AS max_dim,
        | CAST(sum(CASE WHEN norm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        | CAST(sum(bad) AS BIGINT) AS n_nonfinite,
        | min(norm) AS min_norm, max(norm) AS max_norm
        |FROM v GROUP BY label ORDER BY label""".stripMargin,

    // avg_quality follows the decimal-sum policy: per-doc scores are
    // bit-identical (int-ratio arithmetic), DECIMAL(18,6) sums are
    // order-independent, one double division at the end.
    "q_source_stats" ->
      """WITH q AS (
        |  SELECT doc_id,
        |   least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) * 0.5
        |     + CAST(len(regexp_extract_all(text, '\b(the|and|of|is|in|to|a)\b')) AS DOUBLE)
        |       / len(string_split(text, ' ')) * 0.3
        |     + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |       / len(string_split(text, ' ')) * 0.2 AS quality_score
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, source,
        |   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |   count(*) OVER (PARTITION BY md5(lower(text))) > 1
        |     AND doc_id <> min(doc_id) OVER (PARTITION BY md5(lower(text))) AS is_drop
        |  FROM documents)
        |SELECT source,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        | CAST(sum(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_quality,
        | CAST(sum(CASE WHEN is_drop THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
        | CAST(sum(CASE WHEN is_drop THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_ratio
        |FROM f JOIN q USING (doc_id)
        |GROUP BY source ORDER BY source""".stripMargin,

    // Domain family (r17): shared DomainCtes/DomainStatsCtes so the
    // extraction, rollup, decisions, and gate cannot drift.
    "q_domain_extract" ->
      (s"WITH $DomainCtes" + "\n" +
        "SELECT doc_id, url, domain FROM dom ORDER BY doc_id"),

    "q_domain_stats" ->
      (s"WITH $DomainStatsCtes" + "\n" +
        """SELECT domain, n_docs, total_tokens, avg_quality, n_dup_docs,
          | dup_ratio FROM st ORDER BY domain""".stripMargin),

    "q_domain_decisions" ->
      (s"WITH $DomainStatsCtes," + "\n" + DomainDecisionCte + "\n" +
        "SELECT domain, allowed, reason FROM dc ORDER BY domain"),

    "q_domain_gate" ->
      (s"WITH $DomainStatsCtes," + "\n" + DomainDecisionCte + "\n" +
        """SELECT dom.doc_id, dom.domain FROM dom JOIN dc USING (domain)
          | WHERE allowed ORDER BY dom.doc_id""".stripMargin),

    // Full-PSL extraction: candidate-key UNION joined to the generated
    // rule VALUES, struct-max prevailing fold (see DomainPslCtes).
    "q_domain_psl" ->
      (s"WITH $DomainPslCtes" + "\n" +
        "SELECT doc_id, url, domain FROM dompl ORDER BY doc_id"),

    // Per-domain cap: the DomainCtes extraction, a domain count, the
    // double-division rate, and the weightedSample md5 draw verbatim.
    "q_domain_cap" ->
      (s"WITH $DomainCtes," + "\n" +
        """cnt AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_domain_docs
          |  FROM dom GROUP BY domain),
          |rr AS (SELECT doc_id, dom.domain, n_domain_docs,
          |  least(1.0, 10.0 / n_domain_docs) AS keep_rate,
          |  CAST(CAST(concat('0x', substr(md5(concat('dcap', ':', CAST(doc_id AS VARCHAR))), 1, 4)) AS BIGINT) AS DOUBLE)
          |    / 65536.0 AS sample_u
          |  FROM dom JOIN cnt ON dom.domain = cnt.domain)
          |SELECT doc_id, domain, n_domain_docs, keep_rate, sample_u,
          | sample_u < keep_rate AS is_sampled
          |FROM rr ORDER BY doc_id""".stripMargin),

    // Noise-floor calibration: md5-ranked disjoint probe/sample slices,
    // per-probe max ordered-fold cosine, max + q90 selection (both are
    // selections, not accumulations — raw doubles replay exactly).
    "q_embed_noise" ->
      s"""WITH r AS (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, vec_id, embedding
FROM embeddings ORDER BY h, vec_id LIMIT 288),
p AS (SELECT vec_id AS probe_id, embedding AS p_emb FROM r ORDER BY h, vec_id LIMIT 32),
sm AS (SELECT vec_id AS sample_id, embedding AS s_emb FROM r
  WHERE vec_id NOT IN (SELECT probe_id FROM p)),
pp AS (SELECT probe_id,
    max(${duckDot("p_emb", "s_emb")} /
      (sqrt(${duckDot("p_emb", "p_emb")}) * sqrt(${duckDot("s_emb", "s_emb")}))) AS max_cos
  FROM p CROSS JOIN sm GROUP BY probe_id)
SELECT CAST(count(*) AS BIGINT) AS n_probes,
  (SELECT CAST(count(*) AS BIGINT) FROM sm) AS n_samples,
  max(max_cos) AS floor_max,
  list_sort(list(max_cos))[CAST(greatest(1, ceil(count(*) * 0.9)) AS INT)] AS floor_q90
FROM pp""",

    "q_lang_id" ->
      """WITH s AS (
        |  SELECT doc_id, lang,
        |   CAST(len(regexp_extract_all(text, '\b(the|and|of|is|in|to)\b')) AS INT) AS s_en,
        |   CAST(len(regexp_extract_all(text, '\b(el|la|de|que|los|una)\b')) AS INT) AS s_es,
        |   CAST(len(regexp_extract_all(text, '\b(der|die|und|das|ein|ist)\b')) AS INT) AS s_de,
        |   CAST(len(regexp_extract_all(text, '\b(le|la|et|les|des|une)\b')) AS INT) AS s_fr,
        |   CAST(len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS INT) AS s_zh
        |  FROM documents)
        |SELECT doc_id, lang, s_en, s_es, s_de, s_fr, s_zh,
        | CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |      WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |      WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |      WHEN s_fr >= s_zh THEN 'fr'
        |      ELSE 'zh' END AS predicted_lang
        |FROM s ORDER BY doc_id""".stripMargin,

    // Word-2-gram shingles: 1-based slice toks[i:i+1] (inclusive end) ≡
    // Spark slice(toks,i,2); md5 hex is lowercase in both engines, and min
    // over fixed-length hex ≡ min over the 128-bit value.
    "q_fingerprints" ->
      """SELECT doc_id,
        | md5(text) AS fp_exact,
        | md5(lower(text)) AS fp_norm,
        | md5(substring(text, 1, 64)) AS fp_prefix,
        | CASE WHEN len(string_split(text, ' ')) >= 2 THEN
        |   list_aggregate(
        |     [md5(array_to_string(toks[i:i+1], ' '))
        |      for i in generate_series(1, len(toks) - 1)], 'min')
        | ELSE NULL END AS fp_min_shingle
        |FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // Millisecond-epoch ordering and gap arithmetic on both sides; 30-min
    // gap = 1_800_000 ms.
    "q_session_stats" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value FROM events),
        |l AS (
        |  SELECT *, lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev_ms
        |  FROM e),
        |n AS (
        |  SELECT *, CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 1800000
        |                 THEN 1 ELSE 0 END AS is_new
        |  FROM l),
        |sess AS (
        |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
        |                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM n)
        |SELECT user_id, session_seq,
        | count(*) AS n_events,
        | min(ts_ms) AS session_start_ms,
        | max(ts_ms) - min(ts_ms) AS duration_ms,
        | CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM sess GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(lower(text)) AS fp_norm,
        | min(doc_id) AS keep_doc_id,
        | count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keep_doc_id""".stripMargin,

    // Replicates the Spark MinHash-LSH deterministically: one md5 per
    // shingle folded to a 60-bit int, the SAME arithmetic permutation
    // constants (generated below from Dedup.permA/permB so the two sides
    // cannot drift), same 8 bands x 4 rows, same bucket-join candidate
    // generation, same exact-Jaccard verify.
    "q_dedup_minhash" ->
      s"WITH $MinhashPairCtes\nSELECT doc_a, doc_b, jaccard FROM mpairs ORDER BY doc_a, doc_b",

    // The census over the SAME signature/band chain (unreferenced CTEs
    // prune away): per-band bucket counts → exact candidate volume.
    // c·(c−1)/2 sums exactly in double below 2^53 (the embed-census
    // argument); the per-doc ratio is one long/long double division.
    "q_minhash_audit" ->
      (s"WITH $MinhashPairCtes,\n" +
        """bkt AS (
          |  SELECT band_idx, band_key, count(*) AS c
          |  FROM bands GROUP BY band_idx, band_key)
          |SELECT band_idx,
          |  CAST(count(*) AS BIGINT) AS n_buckets,
          |  CAST(max(c) AS BIGINT) AS max_bucket,
          |  CAST(sum(c * (c - 1) / 2) AS BIGINT) AS candidate_pairs,
          |  CAST(CAST(sum(c * (c - 1) / 2) AS BIGINT) AS DOUBLE)
          |    / CAST(sum(c) AS BIGINT) AS candidates_per_doc
          |FROM bkt GROUP BY band_idx ORDER BY band_idx""".stripMargin),

    // The MinHash auto-banding dispatch replayed end-to-end (the
    // q_embed_auto idiom for the text family): one shared shingle/hash
    // head, the k=16 and k=32 signature chains each with its census cpd
    // (the same exact-long division the Spark dispatcher collects), all
    // THREE candidate+verify chains — 16, 32, and 32 under the ≤64
    // bucket cap — each gated on the identical census compares, so
    // exactly one branch emits rows.
    "q_minhash_auto" ->
      (s"WITH ${minhashBaseCtes("documents")},\n" +
        s"${minhashTierCtes(16, 8)},\n" +
        s"${minhashTierCtes(32, 8)},\n" +
        s"${minhashVerifyCtes("16", "bands16")},\n" +
        s"${minhashVerifyCtes("32", "bands32")},\n" +
        """bandsC AS (
          |  SELECT b.doc_id, b.band_idx, b.band_key
          |  FROM bands32 b JOIN bkt32 USING (band_idx, band_key)
          |  WHERE bkt32.c <= 64),
          |""".stripMargin +
        s"${minhashVerifyCtes("C", "bandsC")}\n" +
        """SELECT doc_a, doc_b, jaccard FROM p16
          |WHERE (SELECT cpd FROM cen16) <= 8.0
          |UNION ALL
          |SELECT doc_a, doc_b, jaccard FROM p32
          |WHERE (SELECT cpd FROM cen16) > 8.0
          |  AND (SELECT cpd FROM cen32) <= 8.0
          |UNION ALL
          |SELECT doc_a, doc_b, jaccard FROM pC
          |WHERE (SELECT cpd FROM cen16) > 8.0
          |  AND (SELECT cpd FROM cen32) > 8.0
          |ORDER BY doc_a, doc_b""".stripMargin),

    // Same shingle/signature construction as the minhash chains, on the
    // fixed doc_id < 400 slice: exact all-pairs Jaccard truth, the
    // (16, 8) band-cohabitation candidate set, and the three exact-count
    // aggregates crossed into one row. recall/precision are single
    // long/long IEEE divisions, NULL-guarded.
    "q_minhash_recall" ->
      (s"WITH smp AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),\n" +
        s"${minhashBaseCtes("smp")},\n" +
        s"${minhashTierCtes(16, 8)},\n" +
        """tr AS (
          |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
          |  FROM base x JOIN base y ON x.doc_id < y.doc_id
          |  WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
          |        / len(list_distinct(list_concat(x.sh, y.sh))) >= CAST(0.5 AS DOUBLE)),
          |cd AS (
          |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          |  FROM bands16 a JOIN bands16 b
          |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
          |   AND a.doc_id < b.doc_id),
          |th AS (SELECT count(*) AS n_truth, count(c.doc_a) AS n_hit
          |       FROM tr LEFT JOIN cd c
          |         ON tr.doc_a = c.doc_a AND tr.doc_b = c.doc_b),
          |nd AS (SELECT count(*) AS n_docs FROM base),
          |nc AS (SELECT count(*) AS n_cand FROM cd)
          |SELECT n_docs, n_truth, n_cand, n_hit,
          |  CASE WHEN n_truth > 0 THEN CAST(n_hit AS DOUBLE) / n_truth END AS recall,
          |  CASE WHEN n_cand > 0 THEN CAST(n_hit AS DOUBLE) / n_cand END AS "precision"
          |FROM nd, th, nc""".stripMargin),

    // The grid oracle: one shared shingle head + exact-truth CTE, one
    // signature/band chain and one count chain per config, rows
    // UNION ALLed. Same slice, same truth as q_minhash_recall.
    "q_minhash_sweep" -> {
      val configs = Seq((8, 4), (16, 8), (32, 8))
      val chains = configs.map { case (k, b) => minhashSweepChain(k, b) }
      s"WITH smp AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),\n" +
        s"${minhashBaseCtes("smp")},\n" +
        configs.map { case (k, b) => minhashTierCtes(k, b) }.mkString(",\n") +
        ",\n" +
        """tr AS (
          |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
          |  FROM base x JOIN base y ON x.doc_id < y.doc_id
          |  WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
          |        / len(list_distinct(list_concat(x.sh, y.sh))) >= CAST(0.5 AS DOUBLE)),
          |""".stripMargin +
        chains.map(_._1).mkString(",\n") + "\n" +
        chains.map(_._2).mkString("\nUNION ALL\n") +
        "\nORDER BY k, bands"
    },

    // One fp chain, sides split at candidate generation only — and the
    // registry round-trip changes nothing, so both asym queries share it.
    "q_simhash_incr" -> SimhashIncrOracleSql,
    "q_simhash_served" -> SimhashIncrOracleSql,

    // SimHash certificate replay: the q_dedup_simhash fingerprint chain
    // on the fixed slice, exact Hamming truth, the 4-band cohabitation
    // candidates, three exact-count aggregates crossed into one row.
    "q_simhash_recall" -> {
      val (ctes, row) = simhashRecallChain(4, 6)
      s"WITH smp AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),\n" +
        s"${simhashFpCtes("smp")},\n${simhashTruthCte(6)},\n$ctes\n$row"
    },

    // The band-grid oracle: one fingerprint head + Hamming-truth CTE,
    // one band/count chain per config, rows UNION ALLed.
    "q_simhash_sweep" -> {
      val chains = Seq(2, 4, 6).map(b => simhashRecallChain(b, 6))
      s"WITH smp AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),\n" +
        s"${simhashFpCtes("smp")},\n${simhashTruthCte(6)},\n" +
        chains.map(_._1).mkString(",\n") + "\n" +
        chains.map(_._2).mkString("\nUNION ALL\n") +
        "\nORDER BY bands"
    },

    // Per-source distinct-shingle inventory vs the cross-source df: a
    // shingle with n_src = 1 is unique to its source. Same 2-shingle
    // construction as the minhash base CTE.
    "q_source_novelty" ->
      """WITH srcsh AS (
        |  SELECT DISTINCT source, sh FROM (
        |    SELECT source, unnest([array_to_string(toks[i:i+1], ' ')
        |                           for i in generate_series(1, len(toks) - 1)]) AS sh
        |    FROM (SELECT source, string_split(text, ' ') AS toks FROM documents))),
        |df AS (SELECT sh, count(*) AS n_src FROM srcsh GROUP BY sh)
        |SELECT s.source,
        |  CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(sum(CASE WHEN df.n_src = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique_shingles,
        |  CAST(CAST(sum(CASE WHEN df.n_src = 1 THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
        |    / CAST(count(*) AS BIGINT) AS novelty
        |FROM srcsh s JOIN df USING (sh)
        |GROUP BY s.source ORDER BY s.source""".stripMargin,

    // Asymmetric twin of the minhash oracle (shared val — see
    // DedupIncrOracleSql).
    "q_dedup_incremental" -> DedupIncrOracleSql,

    // Registry round-trip serve ≡ inline probe: same oracle string.
    "q_minhash_served" -> DedupIncrOracleSql,

    // LEFT JOIN LATERAL unnest keeps itemless orders (J1 semantics);
    // decimal-first products keep the HOF total exact on both engines.
    "q_nested_roundtrip" ->
      """WITH nested AS (
        |  SELECT l_orderkey AS oid,
        |   list(struct_pack(line_no := l_linenumber, product_id := l_partkey,
        |                    quantity := l_quantity,
        |                    unit_price := CAST(l_extendedprice AS DECIMAL(18,2)))) AS items
        |  FROM lineitem GROUP BY 1),
        |j AS (
        |  SELECT o_orderkey AS order_id, CAST(len(items) AS INT) AS n_items,
        |   CAST(list_sum(list_transform(items,
        |     x -> CAST(CAST(x.quantity AS DECIMAL(18,2)) * x.unit_price AS DECIMAL(28,2)))) AS DECIMAL(18,2)) AS calc_total,
        |   CAST(o_totalprice AS DECIMAL(18,2)) AS total_amount, items
        |  FROM orders LEFT JOIN nested ON o_orderkey = oid)
        |SELECT order_id, n_items,
        | CAST(calc_total AS DOUBLE) AS calc_total,
        | CAST(total_amount AS DOUBLE) AS total_amount,
        | t.item.line_no AS line_no, t.item.product_id AS product_id,
        | t.item.quantity AS quantity,
        | CAST(t.item.unit_price AS DOUBLE) AS unit_price
        |FROM j LEFT JOIN LATERAL (SELECT unnest(items) AS item) t ON TRUE
        |ORDER BY order_id, line_no ASC NULLS FIRST, product_id, quantity, unit_price""".stripMargin,

    "q_quality_summary" ->
      """WITH dup AS (
        |  SELECT count(*) AS n FROM (
        |    SELECT l_orderkey, l_linenumber FROM lineitem
        |    GROUP BY 1, 2 HAVING count(*) > 1)),
        |mism AS (
        |  SELECT count(*) AS n FROM (
        |    SELECT 1
        |    FROM orders JOIN (
        |      SELECT l_orderkey,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS ct
        |      FROM lineitem GROUP BY 1) c ON o_orderkey = l_orderkey
        |    WHERE abs(ct - CAST(o_totalprice AS DECIMAL(18,2))) > 0.01)),
        |mc AS (
        |  SELECT count(*) AS n FROM orders
        |  WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)),
        |mp AS (
        |  SELECT count(*) AS n FROM lineitem
        |  WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey))
        |SELECT * FROM (
        |  SELECT 'duplicate_line_item' AS check_type, 'critical' AS severity,
        |         n AS n_violations FROM dup WHERE n > 0
        |  UNION ALL SELECT 'amount_mismatch', 'warning', n FROM mism WHERE n > 0
        |  UNION ALL SELECT 'missing_customer', 'warning', n FROM mc WHERE n > 0
        |  UNION ALL SELECT 'missing_product', 'warning', n FROM mp WHERE n > 0)
        |ORDER BY check_type, severity""".stripMargin,

    "q_low_stock" ->
      """WITH d AS (
        |  SELECT l_partkey, sum(l_quantity) AS units_sold
        |  FROM lineitem GROUP BY 1)
        |SELECT p_partkey AS product_id, p_name AS product_name,
        |       units_sold, p_size AS stock_level
        |FROM d JOIN part ON l_partkey = p_partkey
        |WHERE units_sold >= 800 AND p_size <= 10
        |ORDER BY product_id""".stripMargin,

    // Ordered left-fold inner sums via list_reduce — the exact IEEE
    // operation sequence of the Spark aggregate() HOF, so sim is
    // bit-identical. (0.0 + x == x, so Spark's 0-seeded fold matches
    // DuckDB's first-element-seeded list_reduce.)
    // Replicates simhashPairs deterministically: same 60-bit md5-prefix
    // feature hash, same ±1 bit votes, same 4×15-bit banding, same Hamming
    // verify — generated from Dedup's constants so the sides cannot drift.
    "q_dedup_simhash" ->
      s"""WITH ${simhashFpCtes("documents")},
bands AS (
  ${simhashBandSel("fps", 4)}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(bit_count(xor(x.fp, y.fp)) AS INT) AS hamming
FROM cand JOIN fps x ON doc_a = x.doc_id JOIN fps y ON doc_b = y.doc_id
WHERE bit_count(xor(x.fp, y.fp)) <= 6
ORDER BY doc_a, doc_b""",

    // Naive CROSS exact Jaccard (incoming odd × corpus even) — the
    // prefix-filtered asym plan is lossless, so outputs must agree.
    "q_jaccard_incr" ->
      """WITH base AS (
        |  SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
        |                  for i in generate_series(1, len(toks) - 2)]) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
        |nz AS (SELECT * FROM base WHERE len(sh) > 0)
        |SELECT a.doc_id AS doc_inc, b.doc_id AS doc_corp,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
        |FROM nz a JOIN nz b ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
        |  AND 5 * len(a.sh) >= 3 * len(b.sh)
        |  AND 5 * len(b.sh) >= 3 * len(a.sh)
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.6
        |ORDER BY doc_inc, doc_corp""".stripMargin,

    // The registry round-trip changes nothing (the single-side prefix
    // is lossless against full corpus postings), so the serve-path
    // oracle IS the inline statement — the q_contain_served precedent
    // at the jaccard family.
    "q_jaccard_served" ->
      """WITH base AS (
        |  SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
        |                  for i in generate_series(1, len(toks) - 2)]) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
        |nz AS (SELECT * FROM base WHERE len(sh) > 0)
        |SELECT a.doc_id AS doc_inc, b.doc_id AS doc_corp,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
        |FROM nz a JOIN nz b ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
        |  AND 5 * len(a.sh) >= 3 * len(b.sh)
        |  AND 5 * len(b.sh) >= 3 * len(a.sh)
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.6
        |ORDER BY doc_inc, doc_corp""".stripMargin,

    // Naive ALL-PAIRS exact Jaccard — deliberately not the prefix-filtered
    // plan: the Spark side's filter is lossless, so the outputs must agree.
    // The integer LENGTH filter in the join (5·min(|a|,|b|) >= 3·max —
    // the 3/5 form of min/max >= 0.6) is PROVABLY lossless for the
    // jaccard >= 0.6 cut (|A∩B| <= min, |A∪B| >= max), so it prunes
    // pairs BEFORE the expensive list_intersect without changing one
    // output row — it cut this statement from ~10 s (riding the oracle
    // budget ceiling) to well under.
    "q_jaccard_ngram" ->
      """WITH base AS (
        |  SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
        |                  for i in generate_series(1, len(toks) - 2)]) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
        |nz AS (SELECT * FROM base WHERE len(sh) > 0)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
        |FROM nz a JOIN nz b ON a.doc_id < b.doc_id
        |  AND 5 * len(a.sh) >= 3 * len(b.sh)
        |  AND 5 * len(b.sh) >= 3 * len(a.sh)
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.6
        |ORDER BY doc_a, doc_b""".stripMargin,

    // Directional containment over the same 3-gram shingle sets:
    // |A∩B|/|A| with a <> b ordered pairs.
    "q_containment" ->
      """WITH base AS (
        |  SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
        |                  for i in generate_series(1, len(toks) - 2)]) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
        |nz AS (SELECT * FROM base WHERE len(sh) > 0)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh) AS containment
        |FROM nz a JOIN nz b ON a.doc_id <> b.doc_id
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,

    // q_containment's shingle CTE with the sides split by id parity:
    // incoming (odd) contained in corpus (even) only.
    "q_contain_incr" ->
      """WITH base AS (
        |  SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
        |                  for i in generate_series(1, len(toks) - 2)]) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
        |nz AS (SELECT * FROM base WHERE len(sh) > 0)
        |SELECT a.doc_id AS doc_inc, b.doc_id AS doc_corp,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh) AS containment
        |FROM nz a JOIN nz b ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
        |  AND 5 * len(b.sh) >= 4 * len(a.sh)
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh) >= 0.8
        |ORDER BY doc_inc, doc_corp""".stripMargin,

    // The residual-gated rounds: unroll LrConvMaxIters chains, compute
    // every consecutive-round residual, pick k = first round under tol
    // (else maxIters), and emit exactly that round's masses — one
    // branch's WHERE is true, all others empty (the dispatch idiom).
    "q_linkrank_conv" -> {
      val rs = (1 to LrConvMaxIters).map { i =>
        s"""SELECT $i AS round,
          |  (SELECT CAST(coalesce(max(abs(a.mass - b.mass)), 0) AS BIGINT)
          |   FROM m$i a JOIN m${i - 1} b ON a.node = b.node) AS d""".stripMargin
      }.mkString("\nUNION ALL\n")
      val branches = (1 to LrConvMaxIters).map { i =>
        s"SELECT node, mass, $i AS rounds FROM m$i WHERE (SELECT k FROM kk) = $i"
      }.mkString("\nUNION ALL\n")
      s"""WITH ${lrChainCtes(LrConvMaxIters)},
        |rs AS (
        |$rs),
        |kk AS (SELECT coalesce(min(round), $LrConvMaxIters) AS k
        |       FROM rs WHERE d <= $LrConvTol)
        |SELECT * FROM (
        |$branches
        |) ORDER BY node""".stripMargin
    },

    // The registry round-trip changes nothing (losslessness is
    // prefix-order-free), so the serve-path oracle IS the inline
    // statement — the q_minhash_served precedent.
    "q_contain_served" ->
      """WITH base AS (
        |  SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
        |                  for i in generate_series(1, len(toks) - 2)]) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
        |nz AS (SELECT * FROM base WHERE len(sh) > 0)
        |SELECT a.doc_id AS doc_inc, b.doc_id AS doc_corp,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh) AS containment
        |FROM nz a JOIN nz b ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
        |  AND 5 * len(b.sh) >= 4 * len(a.sh)
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh) >= 0.8
        |ORDER BY doc_inc, doc_corp""".stripMargin,

    // Recall-certificate replay: string 3-gram shingles, the df window,
    // the (df, shingle) prefix order, and the two eps-loosened ceil
    // bounds — all replayed verbatim (ASCII shingles sort identically;
    // CAST(0.8 AS DOUBLE) keeps DuckDB out of DECIMAL arithmetic).
    "q_contain_recall" ->
      """WITH smp AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
        |base AS (
        |  SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
        |                  for i in generate_series(1, len(toks) - 2)]) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM smp)),
        |nz AS (SELECT * FROM base WHERE len(sh) > 0),
        |tr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM nz a JOIN nz b ON a.doc_id <> b.doc_id
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh)
        |        >= CAST(0.8 AS DOUBLE)),
        |ex AS (SELECT doc_id, len(sh) AS sz, unnest(sh) AS s FROM nz),
        |ix AS (SELECT doc_id, sz, s,
        |    count(*) OVER (PARTITION BY s) AS df
        |  FROM ex),
        |ix2 AS (SELECT doc_id, sz, s, df,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY df, s) AS rn
        |  FROM ix WHERE df <= 3),
        |pa AS (SELECT s, doc_id AS doc_a, sz AS sz_a FROM ix2
        |  WHERE rn <= sz - ceil(CAST(0.8 AS DOUBLE) * sz - 1e-9) + 1),
        |pb AS (SELECT s, doc_id AS doc_b, sz AS sz_b FROM ix2),
        |cd AS (SELECT DISTINCT doc_a, doc_b
        |  FROM pa JOIN pb USING (s)
        |  WHERE doc_a <> doc_b
        |    AND sz_b >= ceil(CAST(0.8 AS DOUBLE) * sz_a - 1e-9)),
        |th AS (SELECT count(*) AS n_truth, count(c.doc_a) AS n_hit
        |  FROM tr LEFT JOIN cd c
        |    ON tr.doc_a = c.doc_a AND tr.doc_b = c.doc_b),
        |nd AS (SELECT count(*) AS n_docs FROM nz),
        |nc AS (SELECT count(*) AS n_cand FROM cd)
        |SELECT CAST(3 AS BIGINT) AS max_df, n_docs, n_truth, n_cand, n_hit,
        |  CASE WHEN n_truth > 0 THEN CAST(n_hit AS DOUBLE) / n_truth END AS recall,
        |  CASE WHEN n_cand > 0 THEN CAST(n_hit AS DOUBLE) / n_cand END AS "precision"
        |FROM nd, th, nc""".stripMargin,

    // The maxDf-grid replay: shared smp/base/nz/tr/ex/ix head (df
    // computed once), one ix2/pa/pb/cd/th/nc chain per config, rows
    // UNION ALLed — configs generated from the same literals as Spark.
    "q_contain_sweep" -> {
      val dfs = Seq(2L, 3L, 400L)
      val chains = dfs.map { m =>
        (s"""ix2$m AS (SELECT doc_id, sz, s, df,
           |    row_number() OVER (PARTITION BY doc_id ORDER BY df, s) AS rn
           |  FROM ix WHERE df <= $m),
           |pa$m AS (SELECT s, doc_id AS doc_a, sz AS sz_a FROM ix2$m
           |  WHERE rn <= sz - ceil(CAST(0.8 AS DOUBLE) * sz - 1e-9) + 1),
           |pb$m AS (SELECT s, doc_id AS doc_b, sz AS sz_b FROM ix2$m),
           |cd$m AS (SELECT DISTINCT doc_a, doc_b
           |  FROM pa$m JOIN pb$m USING (s)
           |  WHERE doc_a <> doc_b
           |    AND sz_b >= ceil(CAST(0.8 AS DOUBLE) * sz_a - 1e-9)),
           |th$m AS (SELECT count(*) AS n_truth, count(c.doc_a) AS n_hit
           |  FROM tr LEFT JOIN cd$m c
           |    ON tr.doc_a = c.doc_a AND tr.doc_b = c.doc_b),
           |nc$m AS (SELECT count(*) AS n_cand FROM cd$m)""".stripMargin,
          s"""SELECT CAST($m AS BIGINT) AS max_df, n_docs, n_truth, n_cand, n_hit,
           |  CASE WHEN n_truth > 0 THEN CAST(n_hit AS DOUBLE) / n_truth END AS recall,
           |  CASE WHEN n_cand > 0 THEN CAST(n_hit AS DOUBLE) / n_cand END AS "precision"
           |FROM nd, th$m, nc$m""".stripMargin)
      }
      s"""WITH smp AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
        |base AS (
        |  SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
        |                  for i in generate_series(1, len(toks) - 2)]) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM smp)),
        |nz AS (SELECT * FROM base WHERE len(sh) > 0),
        |tr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM nz a JOIN nz b ON a.doc_id <> b.doc_id
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh)
        |        >= CAST(0.8 AS DOUBLE)),
        |ex AS (SELECT doc_id, len(sh) AS sz, unnest(sh) AS s FROM nz),
        |ix AS (SELECT doc_id, sz, s,
        |    count(*) OVER (PARTITION BY s) AS df
        |  FROM ex),
        |nd AS (SELECT count(*) AS n_docs FROM nz),
        |""".stripMargin +
        chains.map(_._1).mkString(",\n") + "\n" +
        chains.map(_._2).mkString("\nUNION ALL\n") +
        "\nORDER BY max_df"
    },

    // q_containment's pair CTE + the survivorship rule: drop strict
    // excerpts (no reverse pair) and the larger id of mutual pairs.
    "q_contain_resolve" ->
      """WITH base AS (
        |  SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
        |                  for i in generate_series(1, len(toks) - 2)]) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
        |nz AS (SELECT * FROM base WHERE len(sh) > 0),
        |p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM nz a JOIN nz b ON a.doc_id <> b.doc_id
        |    AND 5 * len(b.sh) >= 4 * len(a.sh)
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh) >= 0.8),
        |drops AS (
        |  SELECT DISTINCT p.doc_a AS doc_id
        |  FROM p LEFT JOIN p r ON p.doc_a = r.doc_b AND p.doc_b = r.doc_a
        |  WHERE r.doc_a IS NULL OR p.doc_a > p.doc_b)
        |SELECT d.doc_id, drops.doc_id IS NULL AS is_kept
        |FROM documents d LEFT JOIN drops ON d.doc_id = drops.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // Same pair list as q_jaccard_ngram's oracle, then connected
    // components as recursive-CTE reachability: reach(u,v) = "u reaches
    // v"; component = min reachable node. UNION (not ALL) dedups paths so
    // the recursion terminates.
    "q_dedup_clusters" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
        |                  for i in generate_series(1, len(toks) - 2)]) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
        |nz AS (SELECT * FROM base WHERE len(sh) > 0),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM nz a JOIN nz b ON a.doc_id < b.doc_id
        |    AND 5 * len(a.sh) >= 3 * len(b.sh)
        |    AND 5 * len(b.sh) >= 3 * len(a.sh)
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.6),
        |edges AS (
        |  SELECT doc_a AS u, doc_b AS v FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges)
        |  UNION
        |  SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u)
        |SELECT u AS doc_id, min(v) AS component
        |FROM reach GROUP BY u ORDER BY doc_id""".stripMargin,

    // hot_rank CAST AS INT (row_number is BIGINT in DuckDB, int32 in
    // Spark); share = one double division on both sides.
    "q_skew_audit" ->
      """WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
        |t AS (SELECT sum(cnt) AS total FROM c),
        |top AS (SELECT user_id, cnt FROM c ORDER BY cnt DESC, user_id LIMIT 20)
        |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, user_id) AS INT) AS hot_rank,
        |  user_id, cnt, CAST(cnt AS DOUBLE) / total AS share
        |FROM top, t ORDER BY hot_rank""".stripMargin,

    // DuckDB's native inequality join (IEJoin) is the oracle for the
    // bucket-expansion strategy.
    "q_interval_join" ->
      """WITH w AS (
        |  SELECT event_id AS window_id, ts AS w_start,
        |    ts + INTERVAL 10 MINUTE AS w_end
        |  FROM events WHERE event_id % 50 = 0)
        |SELECT window_id, count(*) AS n_events
        |FROM events e JOIN w ON e.ts >= w.w_start AND e.ts < w.w_end
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Decimal-exact discounted revenue (q1's pattern); revenue DESC with
    // order_id tie-break keeps the top-10 deterministic.
    "q_ship_priority" ->
      """SELECT l_orderkey AS order_id,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        | CAST(o_orderdate AS DATE) AS order_date,
        | o_orderpriority AS priority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, order_date, order_id LIMIT 10""".stripMargin,

    "q_local_volume" ->
      """SELECT n_name AS nation,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY revenue DESC, nation""".stripMargin,

    // Written AS the correlated scalar subquery (the engine's operator is
    // its decorrelated form); quantities are integral doubles so the avg
    // and 0.2x threshold are exact, revenue follows the DECIMAL policy.
    "q_small_qty" ->
      """SELECT p_brand AS brand, count(*) AS n_small_lines,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
        |   AS avg_yearly
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_quantity < 0.2 * (
        |  SELECT sum(l2.l_quantity) / count(*) FROM lineitem l2
        |  WHERE l2.l_partkey = lineitem.l_partkey)
        |GROUP BY 1 ORDER BY brand""".stripMargin,

    // The identical shift/mask ladder, generated from the same constants.
    "q_zorder" -> {
      def spread(c: String): String = Seq(
        (16, 0x0000FFFF0000FFFFL), (8, 0x00FF00FF00FF00FFL),
        (4, 0x0F0F0F0F0F0F0F0FL), (2, 0x3333333333333333L),
        (1, 0x5555555555555555L))
        .foldLeft(s"(CAST($c AS BIGINT) & 2147483647)") {
          case (x, (s, m)) => s"(($x | ($x << $s)) & $m)"
        }
      s"""SELECT p_partkey, p_size,
         |  ${spread("p_partkey")} | (${spread("p_size")} << 1) AS z
         |FROM part ORDER BY z, p_partkey""".stripMargin
    },

    // Flat OR of the same (bit << i*k+d) terms as zValueN.
    "q_zorder3" -> {
      val dims = Seq("CAST(p_partkey AS BIGINT)", "CAST(p_size AS BIGINT)",
        "CAST(floor(p_retailprice) AS BIGINT)")
      val terms = for {
        (x, d) <- dims.zipWithIndex
        i <- 0 until 20
      } yield s"((($x >> $i) & 1) << ${i * 3 + d})"
      s"""SELECT p_partkey, p_size,
         |  CAST(floor(p_retailprice) AS BIGINT) AS price_usd,
         |  ${terms.mkString(" | ")} AS z
         |FROM part ORDER BY z, p_partkey""".stripMargin
    },

    // Distinct 3-grams per doc (list_distinct mirrors array_distinct),
    // probed against the union of benchmark shingles.
    "q_decontaminate" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
        |          for i in generate_series(1, len(toks) - 2)]) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
        |bench AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id % 97 = 0),
        |train AS (SELECT doc_id, sh FROM sh WHERE doc_id % 97 <> 0),
        |ov AS (
        |  SELECT doc_id, count(*) AS n_overlap
        |  FROM (SELECT doc_id, unnest(sh) AS s FROM train) t
        |  JOIN bench USING (s) GROUP BY 1)
        |SELECT t.doc_id, CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap,
        |  coalesce(o.n_overlap, 0) >= 2 AS contaminated
        |FROM train t LEFT JOIN ov o ON t.doc_id = o.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    // The q_despan machinery re-pointed at the benchmark: train windows
    // joined to the DISTINCT benchmark window set (hash equality only —
    // md5 here, xxhash64 on the Spark side), islands merged at gap 4,
    // then the rebuild removes EVERY contaminated span (no
    // first-occurrence exemption).
    "q_decontaminate_spans" ->
      """WITH tr AS (SELECT doc_id, text, string_split(text, ' ') AS toks
        |            FROM documents WHERE doc_id % 97 <> 0),
        |be AS (SELECT string_split(text, ' ') AS toks
        |       FROM documents WHERE doc_id % 97 = 0),
        |bg AS (SELECT DISTINCT md5(array_to_string(toks[pos : pos + 3], ' ')) AS gram
        |       FROM (SELECT toks, unnest(generate_series(1, len(toks) - 3)) AS pos
        |             FROM be WHERE len(toks) >= 4)),
        |tw AS (SELECT doc_id, pos, md5(array_to_string(toks[pos : pos + 3], ' ')) AS gram
        |       FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 3)) AS pos
        |             FROM tr WHERE len(toks) >= 4)),
        |hit AS (SELECT tw.doc_id, tw.pos FROM tw JOIN bg USING (gram)),
        |brk AS (SELECT doc_id, pos,
        |          CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
        |                 OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 4
        |               THEN 1 ELSE 0 END AS b
        |        FROM hit),
        |isl AS (SELECT doc_id, pos,
        |          sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |        FROM brk),
        |rm AS (SELECT doc_id, min(pos) AS span_start, max(pos) + 3 AS span_end
        |       FROM isl GROUP BY doc_id, island),
        |tok AS (SELECT doc_id, unnest(toks) AS tok,
        |          generate_subscripts(toks, 1) AS pos
        |        FROM tr),
        |keep AS (SELECT k.doc_id, k.pos, k.tok FROM tok k
        |         WHERE NOT EXISTS (SELECT 1 FROM rm
        |            WHERE rm.doc_id = k.doc_id AND k.pos BETWEEN rm.span_start AND rm.span_end))
        |SELECT d.doc_id,
        | CAST(len(d.toks) - count(k.tok) AS INT) AS removed_tokens,
        | coalesce(string_agg(k.tok, ' ' ORDER BY k.pos), '') AS clean_text
        |FROM tr d LEFT JOIN keep k USING (doc_id)
        |GROUP BY d.doc_id, d.toks ORDER BY d.doc_id""".stripMargin,

    // The whole curation DAG in one SQL statement: pair CTEs over the
    // non-benchmark subset, recursive-CTE reachability for components,
    // the q_quality_gate score/threshold chain over the survivors, the
    // q_decontaminate overlap scan, and the hashSplit bucket CASE —
    // each stage's count compared against the Spark pipeline's funnel.
    "q_curation_batch" -> CurationBatchOracleSql,

    // The gated funnel: same chain with the domain-gate CTEs spliced
    // in front (see curationBatchOracleSql).
    "q_curation_domains" -> curationBatchOracleSql(domainGated = true),

    "q_curation_report" -> ("WITH RECURSIVE\n" +
      "csrc AS (SELECT * FROM documents WHERE doc_id % 97 <> 0),\n" +
      minhashPairCtes("csrc") + ",\n" +
      CurationHeadCtes + ",\n" + curationTailCtes(survivors = "kept2") + "\n" + """
SELECT * FROM (
  SELECT CAST(0 AS INT) AS stage_idx, 'input' AS stage,
         (SELECT count(*) FROM csrc) AS n_docs
  UNION ALL SELECT 1, 'near_dup_kept', (SELECT count(*) FROM kept1)
  UNION ALL SELECT 2, 'quality_kept', (SELECT count(*) FROM kept2)
  UNION ALL SELECT 3, 'decontaminated', (SELECT count(*) FROM kept3)
  UNION ALL SELECT 4, 'train', (SELECT count(*) FROM sp WHERE split = 'train')
  UNION ALL SELECT 5, 'val', (SELECT count(*) FROM sp WHERE split = 'val')
  UNION ALL SELECT 6, 'test', (SELECT count(*) FROM sp WHERE split = 'test')
) ORDER BY stage_idx"""),

    // The classified variant: the SAME DAG with the GD-replay CTEs
    // (feat/packed/rec — trained on the FULL documents table, matching
    // the Spark side's memoized model) spliced in, the rational-sigmoid
    // score gating kept2 -> kept2c, and the tail stages reading the
    // classifier survivors.
    "q_curation_classified" -> ("WITH RECURSIVE\n" +
      "csrc AS (SELECT * FROM documents WHERE doc_id % 97 <> 0),\n" +
      minhashPairCtes("csrc") + ",\n" +
      CurationHeadCtes + ",\n" +
      QualityModelCtes.stripPrefix("WITH RECURSIVE") + ",\n" + s"""
sc AS (
  SELECT f.doc_id, 0.5 + 0.5 * t.z / (1 + abs(t.z)) AS score
  FROM feat f, (SELECT w FROM rec WHERE it = $QmIters) fw,
   LATERAL (SELECT list_reduce(
     [list_extract(fw.w, ff + 1) FOR ff IN f.fs], (a, b) -> a + b) AS z) t),
kept2c AS (
  SELECT k.doc_id, k.canonical_id FROM kept2 k JOIN sc USING (doc_id)
  WHERE sc.score >= 0.5),""" + curationTailCtes(survivors = "kept2c") + "\n" + """
SELECT * FROM (
  SELECT CAST(0 AS INT) AS stage_idx, 'input' AS stage,
         (SELECT count(*) FROM csrc) AS n_docs
  UNION ALL SELECT 1, 'near_dup_kept', (SELECT count(*) FROM kept1)
  UNION ALL SELECT 2, 'quality_kept', (SELECT count(*) FROM kept2)
  UNION ALL SELECT 3, 'classifier_kept', (SELECT count(*) FROM kept2c)
  UNION ALL SELECT 4, 'decontaminated', (SELECT count(*) FROM kept3)
  UNION ALL SELECT 5, 'train', (SELECT count(*) FROM sp WHERE split = 'train')
  UNION ALL SELECT 6, 'val', (SELECT count(*) FROM sp WHERE split = 'val')
  UNION ALL SELECT 7, 'test', (SELECT count(*) FROM sp WHERE split = 'test')
) ORDER BY stage_idx"""),

    // The budget variant: decon CTEs over kept2, the token-budget stage
    // (class window, 800-token literal — mirror of the Spark call),
    // split over kept4, and the funnel gains a budget_kept row.
    "q_curation_budget" -> ("WITH RECURSIVE\n" +
      "csrc AS (SELECT * FROM documents WHERE doc_id % 97 <> 0),\n" +
      minhashPairCtes("csrc") + ",\n" +
      CurationHeadCtes + ",\n" + curationDeconCtes(survivors = "kept2") +
      ",\n" + curationBudgetCtes(800L) + ",\n" +
      curationSpCte("kept4") + "\n" + """
SELECT * FROM (
  SELECT CAST(0 AS INT) AS stage_idx, 'input' AS stage,
         (SELECT count(*) FROM csrc) AS n_docs
  UNION ALL SELECT 1, 'near_dup_kept', (SELECT count(*) FROM kept1)
  UNION ALL SELECT 2, 'quality_kept', (SELECT count(*) FROM kept2)
  UNION ALL SELECT 3, 'decontaminated', (SELECT count(*) FROM kept3)
  UNION ALL SELECT 4, 'budget_kept', (SELECT count(*) FROM kept4)
  UNION ALL SELECT 5, 'train', (SELECT count(*) FROM sp WHERE split = 'train')
  UNION ALL SELECT 6, 'val', (SELECT count(*) FROM sp WHERE split = 'val')
  UNION ALL SELECT 7, 'test', (SELECT count(*) FROM sp WHERE split = 'test')
) ORDER BY stage_idx"""),

    // tf·(N/df): division then multiplication, both IEEE basic ops —
    // identical expression tree on both sides → bit-identical doubles.
    "q_distinct_terms" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, tf.term, tf.tf, df.df,
        |    tf.tf * (CAST(n.n_docs AS DOUBLE) / df.df) AS score
        |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
        |r AS (
        |  SELECT *, CAST(row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, term) AS INT) AS term_rank
        |  FROM scored)
        |SELECT doc_id, term_rank, term, tf, df, score FROM r
        |WHERE term_rank <= 3 ORDER BY doc_id, term_rank""".stripMargin,

    // Positional self-join expresses the same pair set the Spark side
    // generates map-side with HOFs; totals are definitionally identical
    // (count over positions / over pairs). lift's division tree mirrors
    // the Scala expression token-for-token.
    "q_cooccur" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |pos AS (
        |  SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i
        |  FROM toks),
        |pr AS (
        |  SELECT least(a.w, b.w) AS w1, greatest(a.w, b.w) AS w2
        |  FROM pos a JOIN pos b
        |    ON a.doc_id = b.doc_id AND b.i > a.i AND b.i <= a.i + 3),
        |pc AS (SELECT w1, w2, count(*) AS pair_cnt FROM pr GROUP BY 1, 2),
        |uni AS (SELECT w AS term, count(*) AS c FROM pos GROUP BY 1),
        |tot AS (SELECT (SELECT count(*) FROM pos) AS n_pos,
        |               (SELECT count(*) FROM pr) AS p_slots)
        |SELECT w1, w2, pair_cnt, u1.c AS c1, u2.c AS c2,
        |  CAST(pair_cnt AS DOUBLE) * n_pos * n_pos /
        |    (CAST(p_slots AS DOUBLE) * u1.c * u2.c) AS lift
        |FROM pc CROSS JOIN tot
        |  JOIN uni u1 ON pc.w1 = u1.term
        |  JOIN uni u2 ON pc.w2 = u2.term
        |WHERE pair_cnt >= 2 ORDER BY w1, w2""".stripMargin,

    // VALUES generated from the same MixWeights constant as the Spark
    // side; same md5 16-bit bucket convention as q_hash_split.
    "q_mixture" -> {
      val vals = MixWeights.map { case (l, w) =>
        val base = math.floor(w).toLong
        val thresh = f"${(65536L * (w - math.floor(w))).toLong}%04x"
        s"('$l', $base, '$thresh')"
      }.mkString(", ")
      s"""WITH w(lang, base, thresh) AS (VALUES $vals),
         |d AS (
         |  SELECT doc_id, documents.lang,
         |    base + CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < thresh
         |                THEN 1 ELSE 0 END AS n_copies
         |  FROM documents JOIN w ON documents.lang = w.lang)
         |SELECT doc_id, lang, CAST(n_copies AS BIGINT) AS n_copies,
         |  CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS copy_idx
         |FROM d WHERE n_copies >= 1 ORDER BY doc_id, copy_idx""".stripMargin
    },

    // Same reachability CTE, then survivorship: left join back to the full
    // corpus, singletons are their own canonical.
    "q_dedup_resolve" ->
      s"""WITH RECURSIVE $MinhashPairCtes,
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM mpairs
  UNION ALL SELECT doc_b, doc_a FROM mpairs),
reach AS (
  SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u),
comp AS (SELECT u AS doc_id, min(v) AS component FROM reach GROUP BY u)
SELECT d.doc_id,
  coalesce(c.component, d.doc_id) AS canonical_id,
  d.doc_id = coalesce(c.component, d.doc_id) AS is_kept
FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
ORDER BY d.doc_id""",

    // Same reachability CTE, then the quality argmax: the curation
    // oracle's exact quality-score arithmetic (identical expression
    // tree, so scores are bit-equal), rank-1 per component by
    // (score DESC, doc_id) replacing the min-id policy.
    "q_dedup_best" ->
      s"""WITH RECURSIVE $MinhashPairCtes,
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM mpairs
  UNION ALL SELECT doc_b, doc_a FROM mpairs),
reach AS (
  SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u),
comp AS (SELECT u AS doc_id, min(v) AS component FROM reach GROUP BY u),
qb AS (
  SELECT doc_id,
   CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
   CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
   CAST(len(regexp_extract_all(text, '\b(the|and|of|is|in|to|a)\b')) AS INT) AS stopword_cnt
  FROM documents),
q AS (
  SELECT doc_id,
   least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
     + CAST(stopword_cnt AS DOUBLE) / n_tokens * 0.3
     + CAST(n_distinct AS DOUBLE) / n_tokens * 0.2 AS score
  FROM qb),
best AS (
  SELECT component, doc_id AS canonical_id FROM (
    SELECT c.component, c.doc_id,
      row_number() OVER (PARTITION BY c.component
                         ORDER BY q.score DESC, c.doc_id) AS rn
    FROM comp c JOIN q USING (doc_id))
  WHERE rn = 1)
SELECT d.doc_id,
  coalesce(b.canonical_id, d.doc_id) AS canonical_id,
  d.doc_id = coalesce(b.canonical_id, d.doc_id) AS is_kept
FROM documents d
LEFT JOIN comp c ON d.doc_id = c.doc_id
LEFT JOIN best b ON c.component = b.component
ORDER BY d.doc_id""",

    // Replicates embeddingNearDup via the shared embedBandCtes chain (SAME
    // hyperplane constants as SQL literals), so bucket bits — and therefore
    // the candidate set — match the Spark side exactly.
    "q_embed_neardup" ->
      s"""WITH ${embedBandCtes("", 16, 4)},
${embedPairCtes("")}
SELECT vec_a, vec_b, sim FROM s WHERE sim >= 0.35
ORDER BY vec_a, vec_b""",

    // One banding chain, sides split by id parity at candidate
    // generation only (see EmbedIncrOracleSql).
    "q_embed_incr" -> EmbedIncrOracleSql,

    // Registry round-trip serve ≡ inline probe: same oracle string.
    "q_embed_served" -> EmbedIncrOracleSql,

    // Same planes/bucket/band CTEs as q_embed_neardup, aggregated into the
    // per-band census instead of joined into pairs. The pair count uses
    // the identical c*(c-1)/2 double arithmetic (exact integers < 2^53)
    // cast back to BIGINT on both engines.
    "q_embed_audit" ->
      s"""WITH ${embedBandCtes("", 16, 4)},
bkt AS (
  SELECT band_idx, band_val, count(*) AS c
  FROM bands GROUP BY band_idx, band_val)
SELECT band_idx,
  CAST(count(*) AS BIGINT) AS n_buckets,
  CAST(max(c) AS BIGINT) AS max_bucket,
  CAST(sum(c * (c - 1) / 2) AS BIGINT) AS candidate_pairs,
  CAST(CAST(sum(c * (c - 1) / 2) AS BIGINT) AS DOUBLE) / CAST(sum(c) AS BIGINT)
    AS candidates_per_vector
FROM bkt GROUP BY band_idx
ORDER BY band_idx""",

    // The auto-banding dispatch replayed end-to-end: the default chain's
    // exact candidate census (cen — the same Σ c·(c−1)/2 / n the Spark
    // autoPlanes collect computes, one double division of exact longs),
    // then BOTH candidate chains (16 and 32 planes), each gated on the
    // identical threshold compare — exactly one branch emits rows.
    "q_embed_auto" ->
      s"""WITH ${embedBandCtes("16", 16, 4)},
${embedBandCtes("32", 32, 4)},
bkt16 AS (
  SELECT band_idx, band_val, count(*) AS c
  FROM bands16 GROUP BY band_idx, band_val),
cen AS (
  SELECT CAST(CAST(sum(c * (c - 1) / 2) AS BIGINT) AS DOUBLE) /
         (SELECT count(*) FROM buck16) AS cpv
  FROM bkt16),
bkt32 AS (
  SELECT band_idx, band_val, count(*) AS c
  FROM bands32 GROUP BY band_idx, band_val),
cen32 AS (
  SELECT CAST(CAST(sum(c * (c - 1) / 2) AS BIGINT) AS DOUBLE) /
         (SELECT count(*) FROM buck32) AS cpv
  FROM bkt32),
qq AS (
  SELECT vec_id, embedding,
    CASE WHEN list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) > 0
         THEN 127.0 / list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
         ELSE 0.0 END AS q_scale
  FROM embeddings),
qzv AS (SELECT vec_id,
        list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE) * q_scale + 0.5) AS BIGINT)) AS v
       FROM qq),
centq AS (SELECT vec_id AS cid, v AS cv FROM qzv ORDER BY vec_id LIMIT 8),
dq AS (SELECT qzv.vec_id, centq.cid,
        list_sum(list_transform(generate_series(1, len(qzv.v)),
          i -> (qzv.v[i] - centq.cv[i]) * (qzv.v[i] - centq.cv[i]))) AS dist
      FROM qzv CROSS JOIN centq),
asg AS (SELECT vec_id, cid FROM
          (SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
           FROM dq) WHERE rn = 1),
${embedPairCtes("16")},
${embedPairCtes("32")},
bandsC AS (
  SELECT b.vec_id, a.cid, b.band_idx, b.band_val
  FROM bands32 b JOIN asg a USING (vec_id)),
candC AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bandsC a JOIN bandsC b
    ON a.cid = b.cid AND a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.vec_id < b.vec_id),
sC AS (
  SELECT vec_a, vec_b,
    ${duckDot("x.embedding", "y.embedding")} /
      (sqrt(${duckDot("x.embedding", "x.embedding")}) * sqrt(${duckDot("y.embedding", "y.embedding")})) AS sim
  FROM candC JOIN embeddings x ON vec_a = x.vec_id
             JOIN embeddings y ON vec_b = y.vec_id)
SELECT vec_a, vec_b, sim FROM s16
WHERE sim >= 0.35 AND (SELECT cpv FROM cen) <= 64.0
UNION ALL
SELECT vec_a, vec_b, sim FROM s32
WHERE sim >= 0.35 AND (SELECT cpv FROM cen) > 64.0
                  AND (SELECT cpv FROM cen32) <= 64.0
UNION ALL
SELECT vec_a, vec_b, sim FROM sC
WHERE sim >= 0.35 AND (SELECT cpv FROM cen) > 64.0
                  AND (SELECT cpv FROM cen32) > 64.0
ORDER BY vec_a, vec_b""",

    // Replicates annTopK: the SAME 8 hyperplanes (seed 42) as literals,
    // full-bucket equality join, exact cosine, row_number rank.
    "q_ann_lsh" -> {
      val planes = ops.Similarity.hyperplanes(8, 64, 42L)
      val vals = planes.zipWithIndex.map { case (p, j) =>
        s"($j, CAST([${p.mkString(", ")}] AS DOUBLE[]))"
      }.mkString(",\n ")
      s"""WITH planes(j, p) AS (VALUES
 $vals),
dots AS (
  SELECT vec_id, j,
    list_reduce([CAST(embedding[i] AS DOUBLE) * p[i]
                 for i in generate_series(1, len(embedding))], (x, y) -> x + y) AS d
  FROM embeddings, planes),
buck AS (
  SELECT vec_id, CAST(sum(CASE WHEN d > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id),
q AS (
  SELECT b.vec_id AS q_id, e.embedding AS qe, b.bucket
  FROM buck b JOIN embeddings e ON b.vec_id = e.vec_id WHERE b.vec_id < 10),
s AS (
  SELECT q.q_id, v.vec_id AS neighbor_id,
    ${duckDot("q.qe", "v.embedding")} /
      (sqrt(${duckDot("q.qe", "q.qe")}) * sqrt(${duckDot("v.embedding", "v.embedding")})) AS sim
  FROM q JOIN buck cb ON q.bucket = cb.bucket
         JOIN embeddings v ON cb.vec_id = v.vec_id)
SELECT q_id,
  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank,
  neighbor_id, sim
FROM s
QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) <= 5
ORDER BY q_id, rank"""
    },

    // Both neighbor chains (the q_ann_lsh bucket search and the
    // q_similarity_topk brute scan) composed into the recall join —
    // exact sets on both engines, one double division per query.
    "q_ann_recall" -> {
      val planes = ops.Similarity.hyperplanes(8, 64, 42L)
      val vals = planes.zipWithIndex.map { case (p, j) =>
        s"($j, CAST([${p.mkString(", ")}] AS DOUBLE[]))"
      }.mkString(",\n ")
      s"""WITH planes(j, p) AS (VALUES
 $vals),
dots AS (
  SELECT vec_id, j,
    list_reduce([CAST(embedding[i] AS DOUBLE) * p[i]
                 for i in generate_series(1, len(embedding))], (x, y) -> x + y) AS d
  FROM embeddings, planes),
buck AS (
  SELECT vec_id, CAST(sum(CASE WHEN d > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id),
aq AS (
  SELECT b.vec_id AS q_id, e.embedding AS qe, b.bucket
  FROM buck b JOIN embeddings e ON b.vec_id = e.vec_id WHERE b.vec_id < 10),
asim AS (
  SELECT aq.q_id, v.vec_id AS neighbor_id,
    ${duckDot("aq.qe", "v.embedding")} /
      (sqrt(${duckDot("aq.qe", "aq.qe")}) * sqrt(${duckDot("v.embedding", "v.embedding")})) AS sim
  FROM aq JOIN buck cb ON aq.bucket = cb.bucket
          JOIN embeddings v ON cb.vec_id = v.vec_id),
approx AS (
  SELECT q_id, neighbor_id FROM asim
  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) <= 5),
bq AS (
  SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
bs AS (
  SELECT q_id, v.vec_id AS neighbor_id,
    ${duckDot("bq.qe", "v.embedding")} /
      (sqrt(${duckDot("bq.qe", "bq.qe")}) * sqrt(${duckDot("v.embedding", "v.embedding")})) AS sim
  FROM bq, embeddings v),
exact AS (
  SELECT q_id, neighbor_id FROM bs
  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) <= 5)
SELECT e.q_id AS q_id, CAST(count(*) AS BIGINT) AS n_exact,
  CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
  CAST(CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
    / CAST(count(*) AS BIGINT) AS recall
FROM exact e LEFT JOIN approx a
  ON e.q_id = a.q_id AND e.neighbor_id = a.neighbor_id
GROUP BY e.q_id ORDER BY e.q_id"""
    },

    // Replicates annProbeSweep over probes {1, 2, 4}: one shared
    // plane/bucket/flip head (q_ann_multiprobe's machinery), then per
    // config the probe set (own bucket + rn <= probes-1 margin flips —
    // empty flip set at probes = 1), the counted candidate join, the
    // top-5, and the recall aggregate against the shared brute baseline.
    "q_ann_sweep" -> {
      val planes = ops.Similarity.hyperplanes(8, 64, 42L)
      val vals = planes.zipWithIndex.map { case (p, j) =>
        s"($j, CAST([${p.mkString(", ")}] AS DOUBLE[]))"
      }.mkString(",\n ")
      def cfg(p: Int): String =
        s"""qp$p AS (
  SELECT vec_id AS q_id, bucket FROM buck WHERE vec_id < 10
  UNION ALL
  SELECT f.vec_id AS q_id, xor(b.bucket, CAST(1 AS BIGINT) << f.j) AS bucket
  FROM flips f JOIN buck b ON f.vec_id = b.vec_id
  WHERE f.rn <= ${p - 1}),
cand$p AS (
  SELECT qp.q_id, cb.vec_id AS neighbor_id
  FROM qp$p qp JOIN buck cb ON qp.bucket = cb.bucket),
s$p AS (
  SELECT c.q_id, c.neighbor_id,
    ${duckDot("q.qe", "v.embedding")} /
      (sqrt(${duckDot("q.qe", "q.qe")}) * sqrt(${duckDot("v.embedding", "v.embedding")})) AS sim
  FROM cand$p c JOIN q ON q.q_id = c.q_id
       JOIN embeddings v ON v.vec_id = c.neighbor_id),
ap$p AS (
  SELECT q_id, neighbor_id FROM s$p
  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) <= 5),
r$p AS (
  SELECT CAST($p AS INT) AS probes,
    (SELECT CAST(count(*) AS BIGINT) FROM cand$p) AS n_candidates,
    CAST(count(*) AS BIGINT) AS n_exact,
    CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
    CAST(CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
      / CAST(count(*) AS BIGINT) AS recall
  FROM exact e LEFT JOIN ap$p a
    ON e.q_id = a.q_id AND e.neighbor_id = a.neighbor_id)"""
      s"""WITH planes(j, p) AS (VALUES
 $vals),
dots AS (
  SELECT vec_id, j,
    list_reduce([CAST(embedding[i] AS DOUBLE) * p[i]
                 for i in generate_series(1, len(embedding))], (x, y) -> x + y) AS d
  FROM embeddings, planes),
buck AS (
  SELECT vec_id, CAST(sum(CASE WHEN d > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id),
flips AS (
  SELECT vec_id, j,
    row_number() OVER (PARTITION BY vec_id ORDER BY abs(d), j) AS rn
  FROM dots WHERE vec_id < 10),
q AS (
  SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
bs AS (
  SELECT q_id, v.vec_id AS neighbor_id,
    ${duckDot("q.qe", "v.embedding")} /
      (sqrt(${duckDot("q.qe", "q.qe")}) * sqrt(${duckDot("v.embedding", "v.embedding")})) AS sim
  FROM q, embeddings v),
exact AS (
  SELECT q_id, neighbor_id FROM bs
  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) <= 5),
${cfg(1)},
${cfg(2)},
${cfg(4)}
SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r4
ORDER BY probes"""
    },

    // Replicates ivfProbeSweep: q_ann_ivf's assignment chain shared by
    // the grid, per config the rn-filtered probe set, the counted
    // probe×cell-size join (exact BIGINT sums), the serve, and the
    // recall aggregate against the shared brute baseline.
    "q_ivf_sweep" -> {
      def cfg(p: Int): String =
        s"""s$p AS (
  SELECT pp.q_id, a.vec_id AS neighbor_id,
    ${duckDot("pp.qe", "a.embedding")} /
      (sqrt(${duckDot("pp.qe", "pp.qe")}) * sqrt(${duckDot("a.embedding", "a.embedding")})) AS sim
  FROM (SELECT q_id, qe, cell FROM pr WHERE rn <= $p) pp
       JOIN asg a USING (cell)),
ap$p AS (
  SELECT q_id, neighbor_id FROM s$p
  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) <= 5),
r$p AS (
  SELECT CAST($p AS INT) AS n_probe,
    (SELECT CAST(coalesce(sum(sz.cell_n), 0) AS BIGINT)
       FROM (SELECT cell FROM pr WHERE rn <= $p) pc JOIN sizes sz USING (cell))
      AS n_candidates,
    CAST(count(*) AS BIGINT) AS n_exact,
    CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
    CAST(CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
      / CAST(count(*) AS BIGINT) AS recall
  FROM exact e LEFT JOIN ap$p a
    ON e.q_id = a.q_id AND e.neighbor_id = a.neighbor_id)"""
      s"""WITH cent AS (
  SELECT vec_id AS cell, embedding AS ce FROM embeddings WHERE vec_id < 16),
q AS (
  SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
asg AS (
  SELECT vec_id, cell, embedding FROM (
    SELECT v.vec_id, c.cell, v.embedding,
      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        ${duckDot("v.embedding", "c.ce")} /
          (sqrt(${duckDot("v.embedding", "v.embedding")}) * sqrt(${duckDot("c.ce", "c.ce")})) DESC,
        c.cell) AS rn
    FROM embeddings v, cent c) WHERE rn = 1),
sizes AS (SELECT cell, CAST(count(*) AS BIGINT) AS cell_n FROM asg GROUP BY cell),
pr AS (
  SELECT q.q_id, q.qe, c.cell,
    row_number() OVER (PARTITION BY q.q_id ORDER BY
      ${duckDot("q.qe", "c.ce")} /
        (sqrt(${duckDot("q.qe", "q.qe")}) * sqrt(${duckDot("c.ce", "c.ce")})) DESC,
      c.cell) AS rn
  FROM q, cent c),
bs AS (
  SELECT q_id, v.vec_id AS neighbor_id,
    ${duckDot("q.qe", "v.embedding")} /
      (sqrt(${duckDot("q.qe", "q.qe")}) * sqrt(${duckDot("v.embedding", "v.embedding")})) AS sim
  FROM q, embeddings v),
exact AS (
  SELECT q_id, neighbor_id FROM bs
  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) <= 5),
${cfg(1)},
${cfg(2)},
${cfg(4)}
SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r4
ORDER BY n_probe"""
    },

    // Replicates annTopK(probes = 4): same planes/buckets as q_ann_lsh,
    // plus each query probes the 3 buckets reached by flipping its
    // smallest-|margin| sign bits (margin ties to the lower bit index —
    // the same total order as the Spark side's (abs(d), i) struct sort).
    // The margins are the identical ordered-fold doubles in both engines,
    // so the flip sequence — and hence the candidate set — matches exactly.
    "q_ann_multiprobe" -> {
      val planes = ops.Similarity.hyperplanes(8, 64, 42L)
      val vals = planes.zipWithIndex.map { case (p, j) =>
        s"($j, CAST([${p.mkString(", ")}] AS DOUBLE[]))"
      }.mkString(",\n ")
      s"""WITH planes(j, p) AS (VALUES
 $vals),
dots AS (
  SELECT vec_id, j,
    list_reduce([CAST(embedding[i] AS DOUBLE) * p[i]
                 for i in generate_series(1, len(embedding))], (x, y) -> x + y) AS d
  FROM embeddings, planes),
buck AS (
  SELECT vec_id, CAST(sum(CASE WHEN d > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id),
flips AS (
  SELECT vec_id, j,
    row_number() OVER (PARTITION BY vec_id ORDER BY abs(d), j) AS rn
  FROM dots WHERE vec_id < 10),
qprobe AS (
  SELECT vec_id AS q_id, bucket FROM buck WHERE vec_id < 10
  UNION ALL
  SELECT f.vec_id AS q_id, xor(b.bucket, CAST(1 AS BIGINT) << f.j) AS bucket
  FROM flips f JOIN buck b ON f.vec_id = b.vec_id
  WHERE f.rn <= 3),
q AS (
  SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
s AS (
  SELECT qp.q_id, v.vec_id AS neighbor_id,
    ${duckDot("q.qe", "v.embedding")} /
      (sqrt(${duckDot("q.qe", "q.qe")}) * sqrt(${duckDot("v.embedding", "v.embedding")})) AS sim
  FROM qprobe qp JOIN buck cb ON qp.bucket = cb.bucket
         JOIN embeddings v ON cb.vec_id = v.vec_id
         JOIN q ON q.q_id = qp.q_id)
SELECT q_id,
  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank,
  neighbor_id, sim
FROM s
QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) <= 5
ORDER BY q_id, rank"""
    },

    // Replicates ivfTopK: deterministic centroid seeds (vec_id < 16),
    // argmax assignment (ties to lowest cell), 4-probe, exact cosine rank.
    "q_ann_ivf" ->
      s"""WITH cent AS (
  SELECT vec_id AS cell, embedding AS ce FROM embeddings WHERE vec_id < 16),
q AS (
  SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
asg AS (
  SELECT vec_id, cell, embedding FROM (
    SELECT v.vec_id, c.cell, v.embedding,
      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        ${duckDot("v.embedding", "c.ce")} /
          (sqrt(${duckDot("v.embedding", "v.embedding")}) * sqrt(${duckDot("c.ce", "c.ce")})) DESC,
        c.cell) AS rn
    FROM embeddings v, cent c) WHERE rn = 1),
probes AS (
  SELECT q_id, qe, cell FROM (
    SELECT q.q_id, q.qe, c.cell,
      row_number() OVER (PARTITION BY q.q_id ORDER BY
        ${duckDot("q.qe", "c.ce")} /
          (sqrt(${duckDot("q.qe", "q.qe")}) * sqrt(${duckDot("c.ce", "c.ce")})) DESC,
        c.cell) AS rn
    FROM q, cent c) WHERE rn <= 4),
s AS (
  SELECT p.q_id, a.vec_id AS neighbor_id,
    ${duckDot("p.qe", "a.embedding")} /
      (sqrt(${duckDot("p.qe", "p.qe")}) * sqrt(${duckDot("a.embedding", "a.embedding")})) AS sim
  FROM probes p JOIN asg a USING (cell))
SELECT q_id,
  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank,
  neighbor_id, sim
FROM s
QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) <= 5
ORDER BY q_id, rank""",

    // The q_ann_ivf oracle verbatim, over the quantized table (q_quantize's
    // CTE emitting DOUBLE lists — int-valued, so float/double paths agree
    // bit for bit).
    "q_ann_quantized" ->
      s"""WITH qs AS (
  SELECT vec_id, embedding,
    CASE WHEN list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) > 0
         THEN 127.0 / list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
         ELSE 0.0 END AS q_scale
  FROM embeddings),
qe AS (
  SELECT vec_id,
    list_transform(embedding,
      x -> floor(CAST(x AS DOUBLE) * q_scale + 0.5)) AS embedding
  FROM qs),
cent AS (
  SELECT vec_id AS cell, embedding AS ce FROM qe WHERE vec_id < 16),
q AS (
  SELECT vec_id AS q_id, embedding AS qe FROM qe WHERE vec_id < 10),
asg AS (
  SELECT vec_id, cell, embedding FROM (
    SELECT v.vec_id, c.cell, v.embedding,
      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        ${duckDot("v.embedding", "c.ce")} /
          (sqrt(${duckDot("v.embedding", "v.embedding")}) * sqrt(${duckDot("c.ce", "c.ce")})) DESC,
        c.cell) AS rn
    FROM qe v, cent c) WHERE rn = 1),
probes AS (
  SELECT q_id, qe, cell FROM (
    SELECT q.q_id, q.qe, c.cell,
      row_number() OVER (PARTITION BY q.q_id ORDER BY
        ${duckDot("q.qe", "c.ce")} /
          (sqrt(${duckDot("q.qe", "q.qe")}) * sqrt(${duckDot("c.ce", "c.ce")})) DESC,
        c.cell) AS rn
    FROM q, cent c) WHERE rn <= 4),
s AS (
  SELECT p.q_id, a.vec_id AS neighbor_id,
    ${duckDot("p.qe", "a.embedding")} /
      (sqrt(${duckDot("p.qe", "p.qe")}) * sqrt(${duckDot("a.embedding", "a.embedding")})) AS sim
  FROM probes p JOIN asg a USING (cell))
SELECT q_id,
  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank,
  neighbor_id, sim
FROM s
QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) <= 5
ORDER BY q_id, rank""",

    // Replicates the trained-cell IVF end to end: the q_ann_quantized
    // quantize chain, then kmeansCellsExact's Lloyd loop unrolled (3
    // iterations of exact-integer-sum means — see lloydIterCtes), then
    // the q_ann_ivf serving chain over the TRAINED cent3 cells with 3
    // probes.
    "q_ann_ivf_trained" ->
      s"""WITH qs AS (
  SELECT vec_id, embedding,
    CASE WHEN list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) > 0
         THEN 127.0 / list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
         ELSE 0.0 END AS q_scale
  FROM embeddings),
qe AS (
  SELECT vec_id,
    list_transform(embedding,
      x -> floor(CAST(x AS DOUBLE) * q_scale + 0.5)) AS embedding
  FROM qs),
qn AS (SELECT vec_id, embedding, ${duckDot("embedding", "embedding")} AS n2 FROM qe),
cent0 AS (
  SELECT vec_id AS cell, embedding AS c, n2 AS cn2 FROM qn ORDER BY vec_id LIMIT 8),
${lloydIterCtes(1)},
${lloydIterCtes(2)},
${lloydIterCtes(3)},
q AS (SELECT vec_id AS q_id, embedding AS qe FROM qn WHERE vec_id < 10),
asgf AS (
  SELECT vec_id, cell, embedding FROM (
    SELECT v.vec_id, c.cell, v.embedding,
      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        ${duckDot("v.embedding", "c.c")} /
          (sqrt(${duckDot("v.embedding", "v.embedding")}) * sqrt(${duckDot("c.c", "c.c")})) DESC,
        c.cell) AS rn
    FROM qn v, cent3 c) WHERE rn = 1),
probes AS (
  SELECT q_id, qe, cell FROM (
    SELECT q.q_id, q.qe, c.cell,
      row_number() OVER (PARTITION BY q.q_id ORDER BY
        ${duckDot("q.qe", "c.c")} /
          (sqrt(${duckDot("q.qe", "q.qe")}) * sqrt(${duckDot("c.c", "c.c")})) DESC,
        c.cell) AS rn
    FROM q, cent3 c) WHERE rn <= 3),
s AS (
  SELECT p.q_id, a.vec_id AS neighbor_id,
    ${duckDot("p.qe", "a.embedding")} /
      (sqrt(${duckDot("p.qe", "p.qe")}) * sqrt(${duckDot("a.embedding", "a.embedding")})) AS sim
  FROM probes p JOIN asgf a USING (cell))
SELECT q_id,
  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank,
  neighbor_id, sim
FROM s
QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) <= 5
ORDER BY q_id, rank""",

    // The drift monitor: the q_ann_ivf_trained quantize + Lloyd prefix,
    // then the CLAMPED-L2 final assignment (kmeansSweep's asgf shape —
    // the geometry's own partition, not the serving cosine), occupancy
    // counts for the full corpus vs the odd-id batch, and the identical
    // NULL-guarded share/shift trees.
    "q_embed_drift" ->
      s"""WITH qs AS (
  SELECT vec_id, embedding,
    CASE WHEN list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) > 0
         THEN 127.0 / list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
         ELSE 0.0 END AS q_scale
  FROM embeddings),
qe AS (
  SELECT vec_id,
    list_transform(embedding,
      x -> floor(CAST(x AS DOUBLE) * q_scale + 0.5)) AS embedding
  FROM qs),
qn AS (SELECT vec_id, embedding, ${duckDot("embedding", "embedding")} AS n2 FROM qe),
cent0 AS (
  SELECT vec_id AS cell, embedding AS c, n2 AS cn2 FROM qn ORDER BY vec_id LIMIT 8),
${lloydIterCtes(1)},
${lloydIterCtes(2)},
${lloydIterCtes(3)},
asgf AS (
  SELECT vec_id, cell FROM (
    SELECT v.vec_id, c.cell,
      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        greatest(CAST(0.0 AS DOUBLE),
          v.n2 + c.cn2 - CAST(2.0 AS DOUBLE) * ${duckDot("v.embedding", "c.c")}) ASC,
        c.cell ASC) AS rn
    FROM qn v, cent3 c) WHERE rn = 1),
cr AS (SELECT cell, count(*) AS n_ref FROM asgf GROUP BY 1),
ci AS (SELECT cell, count(*) AS n_inc FROM asgf WHERE vec_id % 2 = 1 GROUP BY 1),
t AS (SELECT (SELECT count(*) FROM asgf) AS t_ref,
             (SELECT count(*) FROM asgf WHERE vec_id % 2 = 1) AS t_inc),
j AS (
  SELECT c.cell, coalesce(cr.n_ref, 0) AS n_ref, coalesce(ci.n_inc, 0) AS n_inc
  FROM cent3 c LEFT JOIN cr USING (cell) LEFT JOIN ci USING (cell))
SELECT j.cell, j.n_ref, j.n_inc,
  CASE WHEN t_ref > 0 THEN CAST(j.n_ref AS DOUBLE) / t_ref END AS share_ref,
  CASE WHEN t_inc > 0 THEN CAST(j.n_inc AS DOUBLE) / t_inc END AS share_inc,
  (CASE WHEN t_inc > 0 THEN CAST(j.n_inc AS DOUBLE) / t_inc END)
  - (CASE WHEN t_ref > 0 THEN CAST(j.n_ref AS DOUBLE) / t_ref END) AS shift
FROM j CROSS JOIN t ORDER BY cell""",

    // Replicates knnLabelAudit: full self-join minus self, exact cosine
    // (same ordered-fold dots), top-5 by (sim DESC, id), majority vote
    // with ties to the smallest label.
    "q_knn_label" ->
      s"""WITH s AS (
  SELECT q.vec_id AS q_id, v.vec_id AS neighbor_id, v.label AS n_label,
    ${duckDot("q.embedding", "v.embedding")} /
      (sqrt(${duckDot("q.embedding", "q.embedding")}) * sqrt(${duckDot("v.embedding", "v.embedding")})) AS sim
  FROM embeddings q JOIN embeddings v ON q.vec_id <> v.vec_id),
topk AS (
  SELECT q_id, n_label FROM s
  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) <= 5),
votes AS (
  SELECT q_id, n_label, count(*) AS n_votes FROM topk GROUP BY 1, 2),
win AS (
  SELECT q_id, n_label AS knn_label, n_votes FROM votes
  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY n_votes DESC, n_label) = 1)
SELECT w.q_id AS vec_id, e.label AS own_label, w.knn_label, w.n_votes,
  e.label = w.knn_label AS is_agree
FROM win w JOIN embeddings e ON w.q_id = e.vec_id
ORDER BY vec_id""",

    // The direct O(n·w) window fold — list_reduce's first-element seeding
    // matches the expression's H = h0; H = H*B + h accumulation, and the
    // rolling subtract-leading-term form is modularly identical to it.
    "q_rolling_fp" -> {
      val b = functions.RollingMinHash.B
      val m = functions.RollingMinHash.M
      s"""WITH lh AS (
  SELECT doc_id,
    [CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % $m
     for t in string_split(text, ' ')] AS lh
  FROM documents)
SELECT doc_id,
  CASE WHEN len(lh) = 0 THEN NULL
       WHEN len(lh) < 8 THEN list_reduce(lh, (a, b) -> (a * $b + b) % $m)
       ELSE list_min([list_reduce(lh[i:i+7], (a, b) -> (a * $b + b) % $m)
                      for i in generate_series(1, len(lh) - 7)])
  END AS fp_rolling
FROM lh ORDER BY doc_id"""
    },

    // sha256(VARCHAR) hashes the UTF-8 bytes — identical to Spark's
    // sha2(encode(text, 'UTF-8'), 256) over the synthesized payload.
    "q_media_stats" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS kind,
        |  octet_length(encode(text)) AS n_bytes,
        |  sha256(text) AS content_sha256
        |FROM documents ORDER BY media_id""".stripMargin,

    "q_similarity_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
        |p AS (
        |  SELECT q_id, v.vec_id AS neighbor_id,
        |   list_reduce([CAST(qe[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)
        |             for i in generate_series(1, len(qe))], (x, y) -> x + y) AS dot,
        |   list_reduce([CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)
        |             for i in generate_series(1, len(qe))], (x, y) -> x + y) AS nq,
        |   list_reduce([CAST(v.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)
        |             for i in generate_series(1, len(v.embedding))], (x, y) -> x + y) AS nv
        |  FROM q, embeddings v),
        |s AS (
        |  SELECT q_id, neighbor_id, dot / (sqrt(nq) * sqrt(nv)) AS sim
        |  FROM p)
        |SELECT q_id,
        | CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank,
        | neighbor_id, sim
        |FROM s
        |QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) <= 5
        |ORDER BY q_id, rank""".stripMargin,

    // Self-search top-2 (the q_similarity_topk chain over ALL vectors),
    // first non-self neighbor >= 0.8 as the positive; negatives = the
    // anchor's next 3 md5 buckets' min-md5 representatives, ordered-fold
    // cosine verified < 0.5. Same 60-bit md5 bucket family as minhash.
    "q_contrastive" ->
      """WITH p AS (
        |  SELECT q.vec_id AS q_id, v.vec_id AS neighbor_id,
        |   list_reduce([CAST(q.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)
        |             for i in generate_series(1, len(q.embedding))], (x, y) -> x + y) AS dot,
        |   list_reduce([CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)
        |             for i in generate_series(1, len(q.embedding))], (x, y) -> x + y) AS nq,
        |   list_reduce([CAST(v.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)
        |             for i in generate_series(1, len(v.embedding))], (x, y) -> x + y) AS nv
        |  FROM embeddings q, embeddings v),
        |s AS (SELECT q_id, neighbor_id, dot / (sqrt(nq) * sqrt(nv)) AS sim FROM p),
        |r AS (SELECT q_id, neighbor_id, sim,
        |       CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank
        |      FROM s
        |      QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) <= 2),
        |pos AS (
        |  SELECT q_id AS vec_id, 'pos' AS pair_type, neighbor_id AS partner_id, sim
        |  FROM (SELECT r.*, row_number() OVER (PARTITION BY q_id ORDER BY rank) AS rn
        |        FROM r WHERE neighbor_id <> q_id AND sim >= CAST(0.5 AS DOUBLE))
        |  WHERE rn = 1),
        |bk AS (SELECT vec_id, embedding,
        |        CAST(CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT) % 64 AS INT) AS b
        |       FROM embeddings),
        |reps AS (SELECT b AS rb, vec_id AS partner_id, embedding AS p_emb
        |         FROM (SELECT b, vec_id, embedding,
        |                row_number() OVER (PARTITION BY b
        |                  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        |               FROM bk) WHERE rn = 1),
        |negj AS (SELECT vec_id, embedding, CAST((b + j) % 64 AS INT) AS rb
        |         FROM bk, generate_series(1, 3) AS t(j)),
        |neg AS (
        |  SELECT n.vec_id, 'neg' AS pair_type, r.partner_id,
        |   list_reduce([CAST(n.embedding[i] AS DOUBLE) * CAST(r.p_emb[i] AS DOUBLE)
        |             for i in generate_series(1, len(n.embedding))], (x, y) -> x + y)
        |   / (sqrt(list_reduce([CAST(n.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE)
        |             for i in generate_series(1, len(n.embedding))], (x, y) -> x + y))
        |      * sqrt(list_reduce([CAST(r.p_emb[i] AS DOUBLE) * CAST(r.p_emb[i] AS DOUBLE)
        |             for i in generate_series(1, len(r.p_emb))], (x, y) -> x + y))) AS sim
        |  FROM negj n JOIN reps r USING (rb)
        |  WHERE r.partner_id <> n.vec_id)
        |SELECT * FROM pos
        |UNION ALL
        |SELECT * FROM neg WHERE sim < CAST(0.3 AS DOUBLE)
        |ORDER BY vec_id, pair_type, partner_id""".stripMargin,

    // q_contrastive's tail over the q_ann_lsh bucket search: positives
    // come only from bucket-cohabiting candidates (ANN recall
    // semantics, replayed identically); the negative chain is verbatim.
    "q_contrastive_ann" -> {
      val planes = ops.Similarity.hyperplanes(8, 64, 42L)
      val vals = planes.zipWithIndex.map { case (p, j) =>
        s"($j, CAST([${p.mkString(", ")}] AS DOUBLE[]))"
      }.mkString(",\n ")
      s"""WITH planes(j, p) AS (VALUES
 $vals),
dots AS (
  SELECT vec_id, j,
    list_reduce([CAST(embedding[i] AS DOUBLE) * p[i]
                 for i in generate_series(1, len(embedding))], (x, y) -> x + y) AS d
  FROM embeddings, planes),
buck AS (
  SELECT vec_id, CAST(sum(CASE WHEN d > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id),
q AS (
  SELECT b.vec_id AS q_id, e.embedding AS qe, b.bucket
  FROM buck b JOIN embeddings e ON b.vec_id = e.vec_id),
s AS (
  SELECT q.q_id, v.vec_id AS neighbor_id,
    ${duckDot("q.qe", "v.embedding")} /
      (sqrt(${duckDot("q.qe", "q.qe")}) * sqrt(${duckDot("v.embedding", "v.embedding")})) AS sim
  FROM q JOIN buck cb ON q.bucket = cb.bucket
         JOIN embeddings v ON cb.vec_id = v.vec_id),
r AS (
  SELECT q_id, neighbor_id, sim,
    CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank
  FROM s
  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) <= 2),
pos AS (
  SELECT q_id AS vec_id, 'pos' AS pair_type, neighbor_id AS partner_id, sim
  FROM (SELECT r.*, row_number() OVER (PARTITION BY q_id ORDER BY rank) AS rn
        FROM r WHERE neighbor_id <> q_id AND sim >= CAST(0.5 AS DOUBLE))
  WHERE rn = 1),
bk AS (SELECT vec_id, embedding,
        CAST(CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT) % 64 AS INT) AS b
       FROM embeddings),
reps AS (SELECT b AS rb, vec_id AS partner_id, embedding AS p_emb
         FROM (SELECT b, vec_id, embedding,
                row_number() OVER (PARTITION BY b
                  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
               FROM bk) WHERE rn = 1),
negj AS (SELECT vec_id, embedding, CAST((b + j) % 64 AS INT) AS rb
         FROM bk, generate_series(1, 3) AS t(j)),
neg AS (
  SELECT n.vec_id, 'neg' AS pair_type, r.partner_id,
    ${duckDot("n.embedding", "r.p_emb")} /
      (sqrt(${duckDot("n.embedding", "n.embedding")}) * sqrt(${duckDot("r.p_emb", "r.p_emb")})) AS sim
  FROM negj n JOIN reps r USING (rb)
  WHERE r.partner_id <> n.vec_id)
SELECT * FROM pos
UNION ALL
SELECT * FROM neg WHERE sim < CAST(0.3 AS DOUBLE)
ORDER BY vec_id, pair_type, partner_id"""
    },

    // Per-doc bigram counts + an argmax window (cnt DESC, ng DESC — the
    // max_by struct order), character share as exact integers into one
    // guarded division with the least(1.0, ·) cap.
    "q_ngram_top" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |pos AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks),
        |grams AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS ng FROM pos),
        |counts AS (SELECT doc_id, ng, count(*) AS cnt FROM grams GROUP BY 1, 2),
        |top AS (
        |  SELECT doc_id, ng AS top_ngram, cnt AS top_cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY doc_id) AS INT) AS n_ngrams
        |  FROM counts
        |  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, ng DESC) = 1),
        |chars AS (SELECT doc_id, len(array_to_string(t, '')) AS tok_chars FROM toks)
        |SELECT c.doc_id, top.n_ngrams, top.top_ngram, top.top_cnt,
        | CASE WHEN top.top_cnt IS NOT NULL AND c.tok_chars > 0 THEN
        |   least(1.0, CAST(len(replace(top.top_ngram, ' ', '')) * top.top_cnt AS DOUBLE)
        |     / c.tok_chars)
        | END AS top_char_frac
        |FROM chars c LEFT JOIN top ON c.doc_id = top.doc_id
        |ORDER BY c.doc_id""".stripMargin,

    "q_repetition" ->
      """WITH g AS (
        |  SELECT doc_id,
        |   CASE WHEN len(toks) >= 2 THEN
        |     [array_to_string(toks[i:i+1], ' ') for i in generate_series(1, len(toks) - 1)]
        |   ELSE [] END AS ng
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
        |SELECT doc_id,
        | CAST(len(ng) AS INT) AS n_ngrams,
        | CAST(len(list_distinct(ng)) AS INT) AS n_distinct_ngrams,
        | CASE WHEN len(ng) > 0
        |      THEN 1.0 - CAST(len(list_distinct(ng)) AS DOUBLE) / len(ng)
        |      ELSE 0.0 END AS dup_ngram_ratio
        |FROM g ORDER BY doc_id""".stripMargin,

    "q_vocab" ->
      """SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |GROUP BY term ORDER BY tf DESC, term LIMIT 100""".stripMargin,

    // Same tf table, ranked (cf DESC, term — binary collation on both
    // engines), all three cuts from ONE aggregate over the top rows;
    // coverage is one long/long double division per row.
    "q_vocab_coverage" ->
      """WITH tf AS (
        |  SELECT term, count(*) AS cf
        |  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |  GROUP BY term),
        |tot AS (SELECT count(*) AS n_types, CAST(sum(cf) AS BIGINT) AS total_cf FROM tf),
        |top AS (
        |  SELECT cf, row_number() OVER (ORDER BY cf DESC, term) AS rank
        |  FROM tf ORDER BY cf DESC, term LIMIT 32),
        |c AS (SELECT
        |  CAST(sum(CASE WHEN rank <= 8 THEN cf END) AS BIGINT) AS c_8,
        |  CAST(sum(CASE WHEN rank <= 16 THEN cf END) AS BIGINT) AS c_16,
        |  CAST(sum(CASE WHEN rank <= 32 THEN cf END) AS BIGINT) AS c_32
        |  FROM top),
        |v(vocab_size, covered_cf) AS (
        |  SELECT 8, c_8 FROM c UNION ALL
        |  SELECT 16, c_16 FROM c UNION ALL
        |  SELECT 32, c_32 FROM c)
        |SELECT CAST(v.vocab_size AS INT) AS vocab_size, tot.n_types,
        |  v.covered_cf, tot.total_cf,
        |  CAST(v.covered_cf AS DOUBLE) / tot.total_cf AS coverage
        |FROM v, tot ORDER BY vocab_size""".stripMargin,

    // Full BPE training replayed as a recursive CTE (BpeTrainCtes).
    "q_bpe_train" -> (BpeTrainCtes + """
      |SELECT DISTINCT CAST(it AS INT) AS merge_rank, ml AS lhs, mr AS rhs,
      | ml || mr AS merged, mc AS pair_count
      |FROM rec WHERE it >= 1 ORDER BY merge_rank""".stripMargin),

    // Same training recursion; the final iteration's word states are the
    // segmentation, joined back over each document's token stream in
    // position order.
    "q_bpe_segment" -> (BpeTrainCtes + """,
      |fin AS (SELECT word, replace(trim(syms), '  ', ' ') AS seg,
      |               len(string_split(trim(syms), '  ')) AS nseg
      |        FROM rec WHERE it = (SELECT max(it) FROM rec)),
      |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word,
      |               generate_subscripts(string_split(text, ' '), 1) AS i
      |        FROM documents)
      |SELECT doc_id, CAST(count(*) AS INT) AS n_tokens,
      |       CAST(sum(nseg) AS INT) AS n_bpe_tokens,
      |       md5(string_agg(seg, ' ' ORDER BY i)) AS bpe_fp
      |FROM tok JOIN fin USING (word)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // The compiled encoder's contract IS segment's: the same final-state
    // replay verifies it (empty tokens drop out via the wc filter + the
    // inner join on word).
    "q_bpe_encode" -> (BpeTrainCtes + """,
      |fin AS (SELECT word, replace(trim(syms), '  ', ' ') AS seg,
      |               len(string_split(trim(syms), '  ')) AS nseg
      |        FROM rec WHERE it = (SELECT max(it) FROM rec)),
      |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word,
      |               generate_subscripts(string_split(text, ' '), 1) AS i
      |        FROM documents)
      |SELECT doc_id, CAST(count(*) AS INT) AS n_tokens,
      |       CAST(sum(nseg) AS INT) AS n_bpe_tokens,
      |       md5(string_agg(seg, ' ' ORDER BY i)) AS bpe_fp
      |FROM tok JOIN fin USING (word)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // Vocabulary induced by the training recursion: distinct word
    // characters (binary-sorted — identical to the Spark sort on this
    // single-byte corpus) then first-producer merges by rank; ids by
    // that total order.
    "q_bpe_vocab" -> (BpeTrainCtes + """,
      |chars AS (
      |  SELECT DISTINCT unnest(regexp_extract_all(word, '(?s).')) AS token FROM wc),
      |mtok AS (
      |  SELECT ml || mr AS token, min(it) AS r FROM rec
      |  WHERE it >= 1 AND ml || mr NOT IN (SELECT token FROM chars)
      |  GROUP BY 1)
      |SELECT CAST(row_number() OVER (ORDER BY grp, st, r) - 1 AS INT) AS token_id,
      |       token, kind
      |FROM (
      |  SELECT token, 'char' AS kind, 0 AS grp, token AS st, 0 AS r FROM chars
      |  UNION ALL SELECT token, 'merge', 1, '', r FROM mtok)
      |ORDER BY token_id""".stripMargin),

    // Ids replay: the final word states unnested to per-token rows in
    // (word position, subword position) order, joined to the vocabulary,
    // fingerprinted exactly like the Spark id sequence.
    "q_bpe_ids" -> (BpeTrainCtes + """,
      |fin AS (SELECT word, replace(trim(syms), '  ', ' ') AS seg
      |        FROM rec WHERE it = (SELECT max(it) FROM rec)),
      |chars AS (
      |  SELECT DISTINCT unnest(regexp_extract_all(word, '(?s).')) AS token FROM wc),
      |mtok AS (
      |  SELECT ml || mr AS token, min(it) AS r FROM rec
      |  WHERE it >= 1 AND ml || mr NOT IN (SELECT token FROM chars)
      |  GROUP BY 1),
      |vocab AS (
      |  SELECT CAST(row_number() OVER (ORDER BY grp, st, r) - 1 AS INT) AS token_id,
      |         token
      |  FROM (
      |    SELECT token, 0 AS grp, token AS st, 0 AS r FROM chars
      |    UNION ALL SELECT token, 1, '', r FROM mtok)),
      |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word,
      |               generate_subscripts(string_split(text, ' '), 1) AS i
      |        FROM documents),
      |seg2 AS (SELECT word, string_split(seg, ' ') AS ts FROM fin),
      |flat AS (SELECT t.doc_id, t.i, unnest(s2.ts) AS tokstr,
      |                generate_subscripts(s2.ts, 1) AS j
      |         FROM tok t JOIN seg2 s2 USING (word))
      |SELECT doc_id, CAST(count(*) AS INT) AS n_bpe_tokens,
      |       md5(string_agg(CAST(v.token_id AS VARCHAR), ' ' ORDER BY i, j)) AS ids_fp
      |FROM flat JOIN vocab v ON v.token = flat.tokstr
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // Fertility: the segment-replay word states aggregated per language.
    // n_docs counts ALL docs of the language (empty docs join nothing
    // but still count); word/subword sums fold from the replay.
    "q_bpe_fertility" -> (BpeTrainCtes + """,
      |fin AS (SELECT word, len(string_split(trim(syms), '  ')) AS nseg
      |        FROM rec WHERE it = (SELECT max(it) FROM rec)),
      |base AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
      |agg AS (
      |  SELECT d.lang, count(*) AS n_words, sum(nseg) AS n_subwords
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |        FROM documents) t
      |  JOIN fin USING (word) JOIN documents d USING (doc_id)
      |  GROUP BY 1)
      |SELECT b.lang, CAST(b.n_docs AS BIGINT) AS n_docs,
      |       CAST(a.n_words AS BIGINT) AS n_words,
      |       CAST(a.n_subwords AS BIGINT) AS n_subwords,
      |       CAST(CAST(a.n_subwords AS BIGINT) AS DOUBLE) /
      |         CAST(a.n_words AS BIGINT) AS fertility
      |FROM base b JOIN agg a USING (lang) ORDER BY lang""".stripMargin),

    // window=32 stride=24; chunk i covers toks[i*24+1 : i*24+32] (inclusive
    // slice bounds = Spark's slice(toks, i*24+1, 32), both truncate at the
    // array end).
    "q_chunks" ->
      """WITH n AS (
        |  SELECT doc_id, toks,
        |   CASE WHEN len(toks) <= 32 THEN 1
        |        ELSE CAST(floor((len(toks) - 32 + 23) / CAST(24 AS DOUBLE)) AS INT) + 1
        |   END AS n_chunks
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
        |c AS (
        |  SELECT doc_id, toks, unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
        |  FROM n)
        |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
        | CAST(len(toks[chunk_idx*24+1 : chunk_idx*24+32]) AS INT) AS chunk_len,
        | md5(array_to_string(toks[chunk_idx*24+1 : chunk_idx*24+32], ' ')) AS chunk_fp
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    // thresholds: 80% -> 0xcccc, 90% -> 0xe666 of the 16-bit bucket space;
    // lowercase-hex lexicographic compare == numeric compare.
    "q_hash_split" ->
      """SELECT doc_id, substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS bucket,
        | CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
        |      WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
        |      ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    // The shared minhash pair CTEs + the q_hash_split bucket rule, then
    // one grouped count over (least, greatest) split combinations.
    "q_split_audit" ->
      (s"WITH $MinhashPairCtes,\n" +
        """sp AS (
          |  SELECT doc_id,
          |   CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
          |        WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
          |        ELSE 'test' END AS split
          |  FROM documents)
          |SELECT least(a.split, b.split) AS split_a,
          | greatest(a.split, b.split) AS split_b,
          | count(*) AS n_pairs,
          | least(a.split, b.split) <> greatest(a.split, b.split) AS is_leak
          |FROM mpairs p
          |JOIN sp a ON p.doc_a = a.doc_id
          |JOIN sp b ON p.doc_b = b.doc_id
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // Shared pair CTEs + the source dimension joined on both pair ends;
    // pair_rate divides exact longs through an engine-identical DOUBLE
    // tree (possible-pair volume overflows long arithmetic at scale).
    "q_source_overlap" ->
      (s"WITH $MinhashPairCtes,\n" +
        """sz AS (SELECT source AS src, count(*) AS n_docs
          |        FROM documents GROUP BY 1),
          |m AS (
          |  SELECT least(a.source, b.source) AS source_a,
          |   greatest(a.source, b.source) AS source_b,
          |   count(*) AS n_pairs
          |  FROM mpairs p
          |  JOIN documents a ON p.doc_a = a.doc_id
          |  JOIN documents b ON p.doc_b = b.doc_id
          |  GROUP BY 1, 2)
          |SELECT m.source_a, m.source_b, m.n_pairs,
          | sa.n_docs AS n_docs_a, sb.n_docs AS n_docs_b,
          | CAST(m.n_pairs AS DOUBLE) /
          |  (CASE WHEN m.source_a = m.source_b
          |        THEN CAST(sa.n_docs AS DOUBLE) * (sa.n_docs - 1) / 2
          |        ELSE CAST(sa.n_docs AS DOUBLE) * sb.n_docs END) AS pair_rate,
          | m.source_a <> m.source_b AS is_cross
          |FROM m
          |JOIN sz sa ON m.source_a = sa.src
          |JOIN sz sb ON m.source_b = sb.src
          |ORDER BY 1, 2""".stripMargin),

    "q_epoch_shuffle" ->
      """SELECT doc_id, md5('3:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        |FROM documents ORDER BY shuffle_key, doc_id""".stripMargin,

    // MinHash pair CTEs (shared with q_dedup_minhash) feed the
    // q_dedup_clusters-style reachability for the cluster canonical, then
    // the q_hash_split bucket thresholds keyed by canonical_id.
    "q_group_split" ->
      s"""WITH RECURSIVE $MinhashPairCtes,
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM mpairs
  UNION ALL SELECT doc_b, doc_a FROM mpairs),
reach AS (
  SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u),
comp AS (SELECT u AS doc_id, min(v) AS component FROM reach GROUP BY u),
canon AS (
  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS canonical_id
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
SELECT doc_id, canonical_id,
  CASE WHEN substring(md5(CAST(canonical_id AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
       WHEN substring(md5(CAST(canonical_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
       ELSE 'test' END AS split
FROM canon ORDER BY doc_id""",

    // row_number is BIGINT in DuckDB, int32 in Spark → CAST AS INT.
    "q_stratified" ->
      """SELECT lang, CAST(sample_rank AS INT) AS sample_rank, doc_id FROM (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5('ss:' || CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
        |  FROM documents)
        |WHERE sample_rank <= 20 ORDER BY lang, sample_rank""".stripMargin,

    // One aggregate row unpivoted by UNION ALL; HUGEINT sums cast back.
    "q_expectations" ->
      """WITH a AS (SELECT count(*) AS n,
        |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v0,
        |  CAST(sum(CASE WHEN o_totalprice IS NOT NULL
        |    AND (o_totalprice < 0 OR o_totalprice > 100000) THEN 1 ELSE 0 END) AS BIGINT) AS v1,
        |  CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
        |    AND o_orderstatus NOT IN ('F', 'O') THEN 1 ELSE 0 END) AS BIGINT) AS v2,
        |  CAST(sum(CASE WHEN o_orderpriority IS NOT NULL
        |    AND NOT regexp_matches(o_orderpriority, '^[1-3]-[A-Z]+$') THEN 1 ELSE 0 END) AS BIGINT) AS v3,
        |  count(o_orderkey) - count(DISTINCT o_orderkey) AS v4
        |  FROM orders)
        |SELECT rule, col_name, n AS n_rows, v AS n_violations, v = 0 AS pass FROM (
        |  SELECT 'not_null(o_custkey)' AS rule, 'o_custkey' AS col_name, n, v0 AS v FROM a
        |  UNION ALL SELECT 'in_range(o_totalprice,0.0,100000.0)', 'o_totalprice', n, v1 FROM a
        |  UNION ALL SELECT 'in_set(o_orderstatus,F|O)', 'o_orderstatus', n, v2 FROM a
        |  UNION ALL SELECT 'matches(o_orderpriority,^[1-3]-[A-Z]+$)', 'o_orderpriority', n, v3 FROM a
        |  UNION ALL SELECT 'unique(o_orderkey)', 'o_orderkey', n, v4 FROM a)
        |ORDER BY rule""".stripMargin,

    // Hamilton's method in pure integer SQL; DuckDB's HUGEINT-widened
    // window sums cast back to BIGINT at the end.
    "q_allocate" ->
      """WITH li AS (
        |  SELECT l_orderkey AS order_id, l_linenumber AS line_no,
        |    l_partkey AS part_id, l_suppkey AS supp_id,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS w_c
        |  FROM lineitem),
        |g AS (
        |  SELECT order_id, CAST(sum(w_c) AS BIGINT) AS W,
        |    CAST(sum(w_c) AS BIGINT) // 100 AS amount_c
        |  FROM li GROUP BY order_id),
        |j AS (
        |  SELECT li.order_id, li.line_no, li.part_id, li.supp_id, li.w_c, g.amount_c,
        |    (g.amount_c * li.w_c) // g.W AS base_c,
        |    (g.amount_c * li.w_c) % g.W AS rem
        |  FROM li JOIN g USING (order_id)),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY order_id
        |      ORDER BY rem DESC, line_no, part_id, supp_id) AS rk,
        |    sum(base_c) OVER (PARTITION BY order_id) AS used
        |  FROM j)
        |SELECT order_id, line_no, part_id, supp_id, w_c, amount_c,
        |  CAST(base_c + CASE WHEN rk <= amount_c - used THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM r ORDER BY order_id, line_no, part_id, supp_id""".stripMargin,

    // epoch-ms band arithmetic on both sides (identical integer compares,
    // no interval-semantics drift).
    "q_seq_match" ->
      """WITH e0 AS (SELECT user_id, epoch_ms(ts) AS t0 FROM events WHERE event_type = 'view'),
        |     e1 AS (SELECT user_id, epoch_ms(ts) AS t1 FROM events WHERE event_type = 'click'),
        |     e2 AS (SELECT user_id, epoch_ms(ts) AS t2 FROM events WHERE event_type = 'purchase')
        |SELECT a.user_id, count(*) AS n_matches
        |FROM e0 a
        |JOIN e1 b ON a.user_id = b.user_id AND b.t1 > a.t0 AND b.t1 - a.t0 <= 43200000
        |JOIN e2 c ON b.user_id = c.user_id AND c.t2 > b.t1 AND c.t2 - b.t1 <= 43200000
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,

    // abs/max/divide/multiply/floor are IEEE basic ops — bit-identical
    // cross-engine (round() stays banned); int8 values print identically.
    "q_quantize" ->
      """WITH q AS (
        |  SELECT vec_id, embedding,
        |    CASE WHEN list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) > 0
        |         THEN 127.0 / list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
        |         ELSE 0.0 END AS q_scale
        |  FROM embeddings)
        |SELECT vec_id, q_scale,
        |  array_to_string(list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * q_scale + 0.5) AS INT)), ',') AS q_str
        |FROM q ORDER BY vec_id""".stripMargin,

    // Replicates randomProject(outDim = 8, seed 11): the Gaussian rows
    // as literals, one ordered-fold dot per (vector, row). Literals
    // carry an EXPONENT ("…e0") so DuckDB types them DOUBLE at parse
    // time: a bare decimal literal goes through DECIMAL first, whose
    // decimal→double conversion is off by an ulp from the correctly
    // rounded string→double for about half of all values — invisible to
    // the sign/ordering plane oracles, fatal to a VALUE compare.
    "q_rand_project" -> {
      def dlit(v: Double): String = {
        val s = v.toString
        if (s.contains('E') || s.contains('e')) s else s + "e0"
      }
      val planes = ops.Similarity.hyperplanes(8, 64, 11L)
      val vals = planes.zipWithIndex.map { case (p, j) =>
        s"($j, [${p.map(dlit).mkString(", ")}])"
      }.mkString(",\n ")
      s"""WITH planes(j, p) AS (VALUES
 $vals)
SELECT vec_id, CAST(j AS INT) AS j, ${duckDot("embedding", "p")} AS y
FROM embeddings, planes
ORDER BY vec_id, j"""
    },

    // Naive all-pairs oracle for the prefix-filtered join; levenshtein is
    // BIGINT in DuckDB, int32 in Spark → CAST AS INT.
    "q_edit_pairs" ->
      """WITH s AS (SELECT doc_id, substring(text, 1, 20) AS s FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.s, b.s) AS INT) AS dist
        |FROM s a JOIN s b ON a.doc_id < b.doc_id
        |WHERE levenshtein(a.s, b.s) <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    // The segment-join twin returns the identical pair set, so it shares
    // the naive all-pairs oracle verbatim.
    "q_edit_seg" ->
      """WITH s AS (SELECT doc_id, substring(text, 1, 20) AS s FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.s, b.s) AS INT) AS dist
        |FROM s a JOIN s b ON a.doc_id < b.doc_id
        |WHERE levenshtein(a.s, b.s) <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    // Auto-dispatch picks one of the two lossless regimes — same
    // contract, same all-pairs oracle.
    "q_edit_auto" ->
      """WITH s AS (SELECT doc_id, substring(text, 1, 20) AS s FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.s, b.s) AS INT) AS dist
        |FROM s a JOIN s b ON a.doc_id < b.doc_id
        |WHERE levenshtein(a.s, b.s) <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    // Naive CROSS oracle (incoming odd × corpus even) for the asymmetric
    // Ed-Join — half the all-pairs statement's work.
    "q_edit_incr" ->
      """WITH s AS (SELECT doc_id, substring(text, 1, 20) AS s FROM documents)
        |SELECT a.doc_id AS id_inc, b.doc_id AS id_corp,
        |  CAST(levenshtein(a.s, b.s) AS INT) AS dist
        |FROM s a JOIN s b ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
        |WHERE levenshtein(a.s, b.s) <= 2
        |ORDER BY id_inc, id_corp""".stripMargin,

    // Both asym regimes are lossless with a shared exact verify, so the
    // segment twin's oracle is the same naive cross statement.
    "q_edit_incr_seg" ->
      """WITH s AS (SELECT doc_id, substring(text, 1, 20) AS s FROM documents)
        |SELECT a.doc_id AS id_inc, b.doc_id AS id_corp,
        |  CAST(levenshtein(a.s, b.s) AS INT) AS dist
        |FROM s a JOIN s b ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
        |WHERE levenshtein(a.s, b.s) <= 2
        |ORDER BY id_inc, id_corp""".stripMargin,

    // The segment-registry round-trip changes nothing either.
    "q_edit_served_seg" ->
      """WITH s AS (SELECT doc_id, substring(text, 1, 20) AS s FROM documents)
        |SELECT a.doc_id AS id_inc, b.doc_id AS id_corp,
        |  CAST(levenshtein(a.s, b.s) AS INT) AS dist
        |FROM s a JOIN s b ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
        |WHERE levenshtein(a.s, b.s) <= 2
        |ORDER BY id_inc, id_corp""".stripMargin,

    // Auto dispatches between two lossless regimes — same contract,
    // same cross oracle.
    "q_edit_incr_auto" ->
      """WITH s AS (SELECT doc_id, substring(text, 1, 20) AS s FROM documents)
        |SELECT a.doc_id AS id_inc, b.doc_id AS id_corp,
        |  CAST(levenshtein(a.s, b.s) AS INT) AS dist
        |FROM s a JOIN s b ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
        |WHERE levenshtein(a.s, b.s) <= 2
        |ORDER BY id_inc, id_corp""".stripMargin,

    // SNM replay: global row_number per pass order (ASCII sorts
    // identically in both engines), pairs within the window in either
    // pass, exact-Levenshtein verify. The operator's blocked-rank +
    // offset-cumsum positions equal this global order by construction.
    "q_snm_pairs" ->
      """WITH s AS (SELECT doc_id, substring(text, 1, 20) AS s FROM documents),
        |p1 AS (SELECT doc_id, row_number() OVER (ORDER BY s, doc_id) AS rn FROM s),
        |c1 AS (SELECT a.doc_id AS x, b.doc_id AS y
        |       FROM p1 a JOIN p1 b ON b.rn - a.rn BETWEEN 1 AND 10),
        |p2 AS (SELECT doc_id, row_number() OVER (ORDER BY reverse(s), doc_id) AS rn FROM s),
        |c2 AS (SELECT a.doc_id AS x, b.doc_id AS y
        |       FROM p2 a JOIN p2 b ON b.rn - a.rn BETWEEN 1 AND 10),
        |cd AS (SELECT DISTINCT least(x, y) AS id_a, greatest(x, y) AS id_b
        |       FROM (SELECT * FROM c1 UNION ALL SELECT * FROM c2))
        |SELECT id_a, id_b, CAST(levenshtein(xs.s, ys.s) AS INT) AS dist
        |FROM cd JOIN s xs ON id_a = xs.doc_id JOIN s ys ON id_b = ys.doc_id
        |WHERE levenshtein(xs.s, ys.s) <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    // Certificate replay: all-pairs truth + the same two-pass window
    // candidates on the slice, three exact counts crossed into one row.
    "q_snm_recall" ->
      """WITH s AS (SELECT doc_id, substring(text, 1, 20) AS s
        |           FROM documents WHERE doc_id < 400),
        |tr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |       FROM s a JOIN s b ON a.doc_id < b.doc_id
        |       WHERE levenshtein(a.s, b.s) <= 2),
        |p1 AS (SELECT doc_id, row_number() OVER (ORDER BY s, doc_id) AS rn FROM s),
        |c1 AS (SELECT a.doc_id AS x, b.doc_id AS y
        |       FROM p1 a JOIN p1 b ON b.rn - a.rn BETWEEN 1 AND 10),
        |p2 AS (SELECT doc_id, row_number() OVER (ORDER BY reverse(s), doc_id) AS rn FROM s),
        |c2 AS (SELECT a.doc_id AS x, b.doc_id AS y
        |       FROM p2 a JOIN p2 b ON b.rn - a.rn BETWEEN 1 AND 10),
        |cd AS (SELECT DISTINCT least(x, y) AS doc_a, greatest(x, y) AS doc_b
        |       FROM (SELECT * FROM c1 UNION ALL SELECT * FROM c2)),
        |th AS (SELECT count(*) AS n_truth, count(c.doc_a) AS n_hit
        |       FROM tr LEFT JOIN cd c
        |         ON tr.doc_a = c.doc_a AND tr.doc_b = c.doc_b),
        |nd AS (SELECT count(*) AS n_docs FROM s),
        |nc AS (SELECT count(*) AS n_cand FROM cd)
        |SELECT CAST(10 AS INT) AS "window", CAST(2 AS INT) AS max_dist,
        |  n_docs, n_truth, n_cand, n_hit,
        |  CASE WHEN n_truth > 0 THEN CAST(n_hit AS DOUBLE) / n_truth END AS recall,
        |  CASE WHEN n_cand > 0 THEN CAST(n_hit AS DOUBLE) / n_cand END AS "precision"
        |FROM nd, th, nc""".stripMargin,

    // The window-grid replay: per-pass position diffs at the MAX window,
    // min per pair, then one count chain per window — windows generated
    // from the same literals as the Spark query.
    "q_snm_sweep" -> {
      val windows = Seq(4, 10, 25)
      val wmax = windows.max
      val chains = windows.map { w =>
        (s"""cw$w AS (SELECT count(*) AS n_cand FROM dd WHERE d <= $w),
hw$w AS (SELECT count(*) AS n_hit
  FROM tr JOIN dd ON tr.doc_a = dd.doc_a AND tr.doc_b = dd.doc_b
  WHERE d <= $w)""",
          s"""SELECT CAST($w AS INT) AS "window", CAST(2 AS INT) AS max_dist,
  n_docs, n_truth, n_cand, n_hit,
  CASE WHEN n_truth > 0 THEN CAST(n_hit AS DOUBLE) / n_truth END AS recall,
  CASE WHEN n_cand > 0 THEN CAST(n_hit AS DOUBLE) / n_cand END AS "precision"
FROM nd, nt, cw$w, hw$w""")
      }
      s"""WITH s AS (SELECT doc_id, substring(text, 1, 20) AS s
           FROM documents WHERE doc_id < 400),
tr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       FROM s a JOIN s b ON a.doc_id < b.doc_id
       WHERE levenshtein(a.s, b.s) <= 2),
p1 AS (SELECT doc_id, row_number() OVER (ORDER BY s, doc_id) AS rn FROM s),
d1 AS (SELECT least(a.doc_id, b.doc_id) AS doc_a,
              greatest(a.doc_id, b.doc_id) AS doc_b, b.rn - a.rn AS d
       FROM p1 a JOIN p1 b ON b.rn - a.rn BETWEEN 1 AND $wmax),
p2 AS (SELECT doc_id, row_number() OVER (ORDER BY reverse(s), doc_id) AS rn FROM s),
d2 AS (SELECT least(a.doc_id, b.doc_id) AS doc_a,
              greatest(a.doc_id, b.doc_id) AS doc_b, b.rn - a.rn AS d
       FROM p2 a JOIN p2 b ON b.rn - a.rn BETWEEN 1 AND $wmax),
dd AS (SELECT doc_a, doc_b, min(d) AS d
       FROM (SELECT * FROM d1 UNION ALL SELECT * FROM d2)
       GROUP BY doc_a, doc_b),
nd AS (SELECT count(*) AS n_docs FROM s),
nt AS (SELECT count(*) AS n_truth FROM tr),
${chains.map(_._1).mkString(",\n")}
${chains.map(_._2).mkString("\nUNION ALL\n")}
ORDER BY "window""""
    },

    // Registry round-trip changes nothing (losslessness is prefix-order-
    // free) — the serve-path oracle IS the inline cross statement.
    "q_edit_served" ->
      """WITH s AS (SELECT doc_id, substring(text, 1, 20) AS s FROM documents)
        |SELECT a.doc_id AS id_inc, b.doc_id AS id_corp,
        |  CAST(levenshtein(a.s, b.s) AS INT) AS dist
        |FROM s a JOIN s b ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
        |WHERE levenshtein(a.s, b.s) <= 2
        |ORDER BY id_inc, id_corp""".stripMargin,

    // Change rows via null-safe lag compare (IS DISTINCT FROM ≡ Spark's
    // <=> negation), then validity intervals via lead over the survivors —
    // both windows share one (key, ts, tiebreak) order, as in the operator.
    "q_scd2" -> Scd2OracleSql,

    // Incremental ≡ full recompute under in-order arrival (the scd2Apply
    // contract, property-tested in TemporalSpec) — same oracle verbatim.
    "q_scd2_apply" -> Scd2OracleSql,

    // Same md5-hex bucket convention as q_hash_split; the running sum
    // partitions by bucket exactly like the Spark window, and the
    // double-divide floor is exact integer division below 2^53.
    "q_pack" ->
      """WITH d AS (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, h, n_tokens, substring(h, 1, 1) AS bucket,
        |         COALESCE(CAST(sum(n_tokens) OVER (
        |           PARTITION BY substring(h, 1, 1) ORDER BY h, doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
        |           0) AS tok_offset
        |  FROM d),
        |s AS (
        |  SELECT bucket, doc_id, tok_offset, n_tokens,
        |         unnest(generate_series(
        |           CAST(floor(tok_offset / 128.0) AS BIGINT),
        |           CAST(floor((tok_offset + n_tokens - 1) / 128.0) AS BIGINT))) AS seq_id
        |  FROM o)
        |SELECT bucket, CAST(seq_id AS BIGINT) AS seq_id, doc_id,
        |       CAST(greatest(tok_offset - seq_id * 128, 0) AS BIGINT) AS tok_start,
        |       CAST(least(tok_offset + n_tokens, (seq_id + 1) * 128) - seq_id * 128
        |            AS BIGINT) AS tok_end
        |FROM s ORDER BY bucket, seq_id, doc_id""".stripMargin,

    "q_corpus_filter" ->
      """WITH g AS (
        |  SELECT doc_id, toks,
        |   CASE WHEN len(toks) >= 2 THEN
        |     [array_to_string(toks[i:i+1], ' ') for i in generate_series(1, len(toks) - 1)]
        |   ELSE [] END AS ng
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
        |sig AS (
        |  SELECT doc_id,
        |   CAST(len(toks) AS INT) AS n_tokens,
        |   CASE WHEN len(ng) > 0
        |        THEN 1.0 - CAST(len(list_distinct(ng)) AS DOUBLE) / len(ng)
        |        ELSE 0.0 END AS dup_ngram_ratio,
        |   CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS type_token_ratio
        |  FROM g)
        |SELECT doc_id, n_tokens, dup_ngram_ratio, type_token_ratio,
        | concat_ws(',',
        |   CASE WHEN n_tokens < 20 THEN 'too_short' END,
        |   CASE WHEN n_tokens > 90 THEN 'too_long' END,
        |   CASE WHEN dup_ngram_ratio > 0.06 THEN 'repetitive' END,
        |   CASE WHEN type_token_ratio < 0.45 THEN 'low_diversity' END) = '' AS keep,
        | concat_ws(',',
        |   CASE WHEN n_tokens < 20 THEN 'too_short' END,
        |   CASE WHEN n_tokens > 90 THEN 'too_long' END,
        |   CASE WHEN dup_ngram_ratio > 0.06 THEN 'repetitive' END,
        |   CASE WHEN type_token_ratio < 0.45 THEN 'low_diversity' END) AS reasons
        |FROM sig ORDER BY doc_id""".stripMargin,

    "q_corpus_stats" ->
      """SELECT lang, count(*) AS n_docs,
        | quantile_cont(n_chars, 0.25) AS p25_chars,
        | median(n_chars) AS median_chars,
        | quantile_cont(n_chars, 0.9) AS p90_chars,
        | CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_topk_per_lang" ->
      """WITH b AS (
        |  SELECT lang, doc_id,
        |   CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
        |  FROM documents)
        |SELECT lang, doc_id, n_tokens,
        | CAST(row_number() OVER (PARTITION BY lang ORDER BY n_tokens DESC, doc_id) AS INT) AS rank
        |FROM b
        |QUALIFY row_number() OVER (PARTITION BY lang ORDER BY n_tokens DESC, doc_id) <= 5
        |ORDER BY lang, rank""".stripMargin,

    "q_asof" ->
      """WITH r AS (
        |  SELECT user_id, ts, value FROM events
        |  WHERE event_id % 2 = 0
        |  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1),
        |l AS (
        |  SELECT user_id, ts, event_id FROM events WHERE event_id % 2 = 1)
        |SELECT l.event_id, l.user_id, r.value AS asof_value,
        | epoch_ms(r.ts) AS asof_ts_ms
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND r.ts <= l.ts
        |ORDER BY l.event_id""".stripMargin,

    // Same derivation, same RE2-safe patterns, same replace order as the
    // Spark side; DuckDB regexp_replace needs the 'g' flag for replace-all.
    "q_pii_scrub" ->
      """WITH d AS (
        |  SELECT doc_id,
        |   'u' || CAST(doc_id AS VARCHAR) || '@ex-mail.org ip 10.0.' ||
        |   CAST(n_chars % 200 AS VARCHAR) || '.7 tel 416-555-' ||
        |   lpad(CAST(n_chars % 10000 AS VARCHAR), 4, '0') || ' ' || text AS text
        |  FROM documents)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        | CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ips,
        | CAST(len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS INT) AS n_phones,
        | md5(regexp_replace(regexp_replace(regexp_replace(text,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |   '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g')) AS scrub_md5
        |FROM d ORDER BY doc_id""".stripMargin,

    // quantile_disc == approx_percentile in the exact (n <= accuracy)
    // regime: both return the element at rank ceil(p*n) — see queries
    // note. Valid at any SF where no lang group exceeds 10000 docs.
    "q_corpus_stats_approx" ->
      """SELECT lang, count(*) AS n_docs,
        | quantile_disc(n_chars, 0.25) AS p25_chars,
        | quantile_disc(n_chars, 0.5) AS median_chars,
        | quantile_disc(n_chars, 0.9) AS p90_chars,
        | CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // Same per-char Shannon entropy; both engines round to 6 dp so libm
    // last-ulp log2 divergence can't break the hash (see queries note).
    "q_char_entropy" ->
      """WITH chars AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
        |counts AS (
        |  SELECT doc_id, ch, count(*) AS cnt FROM chars
        |  WHERE ch <> '' GROUP BY doc_id, ch),
        |probs AS (
        |  SELECT doc_id,
        |   CAST(cnt AS DOUBLE) / sum(cnt) OVER (PARTITION BY doc_id) AS p
        |  FROM counts)
        |SELECT doc_id, CAST(count(*) AS INT) AS n_distinct_chars,
        | round(-sum(p * log2(p)), 6) AS char_entropy_bits
        |FROM probs GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Bigram LM scoring: identical count/smoothing arithmetic, ln at the
    // 6-decimal stable rounding. α=0.4 must track lmScore's default.
    "q_lm_score" -> LmScoreOracleSql,

    // Interpolated Kneser–Ney: c(v) is the bigram-CONTEXT count (grams
    // grouped by w1, so Σ_w c(vw) = c(v)); the probability tree
    // parenthesizes exactly as the Spark expression — (greatest/cv) +
    // ((d·nf)/cv)·((np+αc)/(types+αc·V)) — so everything before ln is
    // bit-identical; ln compares at the 6-dp rounding.
    "q_kn_score" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |pos AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks),
        |grams AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS bg,
        |           t[i] AS w1, t[i + 1] AS w2 FROM pos),
        |bi AS (SELECT bg, count(*) AS c2 FROM grams GROUP BY bg),
        |ctx AS (SELECT w1, count(*) AS cv, count(DISTINCT w2) AS nf
        |        FROM grams GROUP BY w1),
        |pc AS (SELECT w2, count(DISTINCT w1) AS npc FROM grams GROUP BY w2),
        |sc AS (SELECT count(DISTINCT bg) AS types FROM grams),
        |voc AS (SELECT count(DISTINCT w) AS v FROM
        |         (SELECT unnest(t) AS w FROM toks)),
        |scored AS (
        |  SELECT g.doc_id, CAST(count(*) AS INT) AS n_bigrams,
        |    avg(ln(
        |      greatest(c2 - 0.75, 0.0) / cv +
        |      0.75 * nf / cv * ((npc + 0.4) / (types + 0.4 * v))
        |    )) AS avg_logp
        |  FROM grams g JOIN bi USING (bg) JOIN ctx USING (w1) JOIN pc USING (w2)
        |  CROSS JOIN sc CROSS JOIN voc
        |  GROUP BY g.doc_id)
        |SELECT d.doc_id, s.n_bigrams, round(s.avg_logp, 6) AS avg_logp
        |FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // Self-model serve ≡ fit+score: the oracle is q_lm_score's verbatim
    // (every serve-join hits on the training corpus; the OOV floor is
    // spec-pinned where the oracle cannot see it).
    "q_lm_serve" -> LmScoreOracleSql,

    // Trigram KN: q_kn_score's model CTEs plus the trigram tier (c3 per
    // trigram, (cuv, nf2) per two-word context), the two-tier tree
    // parenthesized exactly as the Spark expression —
    // (greatest/cuv) + ((d·nf2)/cuv)·(the verbatim bigram-tier tree) —
    // self-trained, so inner joins carry the seen branches everywhere.
    "q_kn3_score" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |pos AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks),
        |grams AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS bg,
        |           t[i] AS w1, t[i + 1] AS w2 FROM pos),
        |bi AS (SELECT bg, count(*) AS c2 FROM grams GROUP BY bg),
        |ctx AS (SELECT w1, count(*) AS cv, count(DISTINCT w2) AS nf
        |        FROM grams GROUP BY w1),
        |pc AS (SELECT w2, count(DISTINCT w1) AS npc FROM grams GROUP BY w2),
        |sc AS (SELECT count(DISTINCT bg) AS types FROM grams),
        |voc AS (SELECT count(DISTINCT w) AS v FROM
        |         (SELECT unnest(t) AS w FROM toks)),
        |pos3 AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM toks),
        |g3 AS (SELECT doc_id,
        |        t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS tg,
        |        t[i] || ' ' || t[i + 1] AS c2k,
        |        t[i + 1] || ' ' || t[i + 2] AS bg,
        |        t[i + 1] AS w1, t[i + 2] AS w2 FROM pos3),
        |tri AS (SELECT tg, count(*) AS c3 FROM g3 GROUP BY tg),
        |ctx2 AS (SELECT c2k, count(*) AS cuv, count(DISTINCT w2) AS nf2
        |         FROM g3 GROUP BY c2k),
        |scored AS (
        |  SELECT g.doc_id, CAST(count(*) AS INT) AS n_trigrams,
        |    avg(ln(
        |      greatest(c3 - 0.75, 0.0) / cuv +
        |      0.75 * nf2 / cuv * (
        |        greatest(c2 - 0.75, 0.0) / cv +
        |        0.75 * nf / cv * ((npc + 0.4) / (types + 0.4 * v)))
        |    )) AS avg_logp
        |  FROM g3 g JOIN tri USING (tg) JOIN ctx2 USING (c2k)
        |    JOIN bi USING (bg) JOIN ctx USING (w1) JOIN pc USING (w2)
        |  CROSS JOIN sc CROSS JOIN voc
        |  GROUP BY g.doc_id)
        |SELECT d.doc_id, s.n_trigrams, round(s.avg_logp, 6) AS avg_logp
        |FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // q_lm_lines' line CTEs + q_kn_score's model CTEs: within-line
    // bigrams of the doc-trained model always hit, so inner joins carry
    // the pSeen tree (identical parenthesization); ln at 6-dp.
    "q_kn_lines" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |nl AS (SELECT doc_id,
        |  [array_to_string(tk[i*8+1 : i*8+8], ' ')
        |   for i in generate_series(0, (len(tk)-1)//8)] AS lines
        |  FROM tk),
        |l AS (SELECT doc_id,
        |  unnest([{'pos': i - 1, 'line': lines[i]}
        |          for i in generate_series(1, len(lines))],
        |         recursive := true)
        |  FROM nl),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |posn AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks),
        |grams AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS bg,
        |           t[i] AS w1, t[i + 1] AS w2 FROM posn),
        |bi AS (SELECT bg, count(*) AS c2 FROM grams GROUP BY bg),
        |ctx AS (SELECT w1, count(*) AS cv, count(DISTINCT w2) AS nf
        |        FROM grams GROUP BY w1),
        |pc AS (SELECT w2, count(DISTINCT w1) AS npc FROM grams GROUP BY w2),
        |tys AS (SELECT count(DISTINCT bg) AS types FROM grams),
        |voc AS (SELECT count(DISTINCT w) AS v FROM
        |         (SELECT unnest(t) AS w FROM toks)),
        |lt AS (SELECT doc_id, pos, string_split(line, ' ') AS t FROM l),
        |lp AS (SELECT doc_id, pos, t, unnest(generate_series(1, len(t) - 1)) AS i
        |       FROM lt),
        |lg AS (SELECT doc_id, pos, t[i] || ' ' || t[i + 1] AS bg,
        |        t[i] AS w1, t[i + 1] AS w2 FROM lp),
        |sc AS (
        |  SELECT lg.doc_id, lg.pos, CAST(count(*) AS INT) AS n_bigrams,
        |    avg(ln(
        |      greatest(c2 - 0.75, 0.0) / cv +
        |      0.75 * nf / cv * ((npc + 0.4) / (types + 0.4 * v))
        |    )) AS avg_logp
        |  FROM lg JOIN bi USING (bg) JOIN ctx USING (w1) JOIN pc USING (w2)
        |  CROSS JOIN tys CROSS JOIN voc
        |  GROUP BY lg.doc_id, lg.pos)
        |SELECT l.doc_id, CAST(l.pos AS INT) AS pos, l.line,
        |  sc.n_bigrams, round(sc.avg_logp, 6) AS avg_logp
        |FROM l LEFT JOIN sc ON l.doc_id = sc.doc_id AND l.pos = sc.pos
        |ORDER BY l.doc_id, l.pos""".stripMargin,

    // q_kn_lines' line CTEs + q_kn3_score's two-tier model CTEs: every
    // within-line trigram of the doc-trained model hits, so inner joins
    // carry the seen branches (identical parenthesization); ln at 6-dp.
    "q_kn3_lines" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |nl AS (SELECT doc_id,
        |  [array_to_string(tk[i*8+1 : i*8+8], ' ')
        |   for i in generate_series(0, (len(tk)-1)//8)] AS lines
        |  FROM tk),
        |l AS (SELECT doc_id,
        |  unnest([{'pos': i - 1, 'line': lines[i]}
        |          for i in generate_series(1, len(lines))],
        |         recursive := true)
        |  FROM nl),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |posn AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks),
        |grams AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS bg,
        |           t[i] AS w1, t[i + 1] AS w2 FROM posn),
        |bi AS (SELECT bg, count(*) AS c2 FROM grams GROUP BY bg),
        |ctx AS (SELECT w1, count(*) AS cv, count(DISTINCT w2) AS nf
        |        FROM grams GROUP BY w1),
        |pc AS (SELECT w2, count(DISTINCT w1) AS npc FROM grams GROUP BY w2),
        |tys AS (SELECT count(DISTINCT bg) AS types FROM grams),
        |voc AS (SELECT count(DISTINCT w) AS v FROM
        |         (SELECT unnest(t) AS w FROM toks)),
        |pos3 AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM toks),
        |g3 AS (SELECT doc_id,
        |        t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS tg,
        |        t[i] || ' ' || t[i + 1] AS c2k,
        |        t[i + 2] AS w3 FROM pos3),
        |tri AS (SELECT tg, count(*) AS c3 FROM g3 GROUP BY tg),
        |ctx2 AS (SELECT c2k, count(*) AS cuv, count(DISTINCT w3) AS nf2
        |         FROM g3 GROUP BY c2k),
        |lt AS (SELECT doc_id, pos, string_split(line, ' ') AS t FROM l),
        |lp3 AS (SELECT doc_id, pos, t, unnest(generate_series(1, len(t) - 2)) AS i
        |        FROM lt),
        |lg3 AS (SELECT doc_id, pos,
        |         t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS tg,
        |         t[i] || ' ' || t[i + 1] AS c2k,
        |         t[i + 1] || ' ' || t[i + 2] AS bg,
        |         t[i + 1] AS w1, t[i + 2] AS w2 FROM lp3),
        |sc3 AS (
        |  SELECT lg3.doc_id, lg3.pos, CAST(count(*) AS INT) AS n_trigrams,
        |    avg(ln(
        |      greatest(c3 - 0.75, 0.0) / cuv +
        |      0.75 * nf2 / cuv * (
        |        greatest(c2 - 0.75, 0.0) / cv +
        |        0.75 * nf / cv * ((npc + 0.4) / (types + 0.4 * v)))
        |    )) AS avg_logp
        |  FROM lg3 JOIN tri USING (tg) JOIN ctx2 USING (c2k)
        |    JOIN bi USING (bg) JOIN ctx USING (w1) JOIN pc USING (w2)
        |  CROSS JOIN tys CROSS JOIN voc
        |  GROUP BY lg3.doc_id, lg3.pos)
        |SELECT l.doc_id, CAST(l.pos AS INT) AS pos, l.line,
        |  sc3.n_trigrams, round(sc3.avg_logp, 6) AS avg_logp
        |FROM l LEFT JOIN sc3 ON l.doc_id = sc3.doc_id AND l.pos = sc3.pos
        |ORDER BY l.doc_id, l.pos""".stripMargin,

    // 5-gram KN: the shared Kn5ModelCtes model tiers + the shared
    // Kn5ProbTree four-tier probability (both also composed into
    // q_kn5_lines, so the two oracles cannot drift) — self-trained,
    // so inner joins carry the seen branches everywhere.
    "q_kn5_score" ->
      (s"WITH $Kn5ModelCtes," + "\n" +
        s"""scored AS (
          |  SELECT g.doc_id, CAST(count(*) AS INT) AS n_5grams,
          |    avg(ln(
          |      $Kn5ProbTree
          |    )) AS avg_logp
          |  FROM g5d g JOIN q5 USING (fg) JOIN ctx4 USING (c4k)
          |    JOIN q4 USING (g4) JOIN ctx3 USING (c3k)
          |    JOIN tri USING (tg) JOIN ctx2 USING (c2k)
          |    JOIN bi USING (bg) JOIN ctx USING (w1) JOIN pc USING (w2)
          |  CROSS JOIN tys CROSS JOIN voc
          |  GROUP BY g.doc_id)
          |SELECT d.doc_id, s.n_5grams, round(s.avg_logp, 6) AS avg_logp
          |FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
          |ORDER BY d.doc_id""".stripMargin),

    // q_kn_lines' line CTEs + the shared Kn5ModelCtes/Kn5ProbTree:
    // every within-line 5-gram of the doc-trained model hits, so inner
    // joins carry the seen branches (identical parenthesization).
    "q_kn5_lines" ->
      ("""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |nl AS (SELECT doc_id,
        |  [array_to_string(tk[i*8+1 : i*8+8], ' ')
        |   for i in generate_series(0, (len(tk)-1)//8)] AS lines
        |  FROM tk),
        |l AS (SELECT doc_id,
        |  unnest([{'pos': i - 1, 'line': lines[i]}
        |          for i in generate_series(1, len(lines))],
        |         recursive := true)
        |  FROM nl),""".stripMargin + "\n" +
        s"$Kn5ModelCtes," + "\n" +
        s"""lt AS (SELECT doc_id, pos, string_split(line, ' ') AS t FROM l),
          |lp5 AS (SELECT doc_id, pos, t, unnest(generate_series(1, len(t) - 4)) AS i
          |        FROM lt),
          |lg5 AS (SELECT doc_id, pos,
          |         t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] || ' ' || t[i + 4] AS fg,
          |         t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] AS c4k,
          |         t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] || ' ' || t[i + 4] AS g4,
          |         t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] AS c3k,
          |         t[i + 2] || ' ' || t[i + 3] || ' ' || t[i + 4] AS tg,
          |         t[i + 2] || ' ' || t[i + 3] AS c2k,
          |         t[i + 3] || ' ' || t[i + 4] AS bg,
          |         t[i + 3] AS w1, t[i + 4] AS w2 FROM lp5),
          |sc5 AS (
          |  SELECT lg5.doc_id, lg5.pos, CAST(count(*) AS INT) AS n_5grams,
          |    avg(ln(
          |      $Kn5ProbTree
          |    )) AS avg_logp
          |  FROM lg5 JOIN q5 USING (fg) JOIN ctx4 USING (c4k)
          |    JOIN q4 USING (g4) JOIN ctx3 USING (c3k)
          |    JOIN tri USING (tg) JOIN ctx2 USING (c2k)
          |    JOIN bi USING (bg) JOIN ctx USING (w1) JOIN pc USING (w2)
          |  CROSS JOIN tys CROSS JOIN voc
          |  GROUP BY lg5.doc_id, lg5.pos)
          |SELECT l.doc_id, CAST(l.pos AS INT) AS pos, l.line,
          |  sc5.n_5grams, round(sc5.avg_logp, 6) AS avg_logp
          |FROM l LEFT JOIN sc5 ON l.doc_id = sc5.doc_id AND l.pos = sc5.pos
          |ORDER BY l.doc_id, l.pos""".stripMargin),

    // Count-pruned kn5 (r17): the SAME model CTEs thresholded per
    // tier (Kn5PrunedCtes), scored through the null-guarded tree
    // (Kn5BackoffTree) with LEFT joins on the prunable tiers — a
    // pruned row misses exactly like an unseen n-gram.
    "q_kn5_pruned" ->
      (s"WITH $Kn5ModelCtes," + "\n" + s"$Kn5PrunedCtes," + "\n" +
        s"""scored AS (
          |  SELECT g.doc_id, CAST(count(*) AS INT) AS n_5grams,
          |    avg(ln(
          |      $Kn5BackoffTree
          |    )) AS avg_logp
          |  FROM g5d g LEFT JOIN q5p USING (fg) LEFT JOIN ctx4p USING (c4k)
          |    LEFT JOIN q4p USING (g4) LEFT JOIN ctx3p USING (c3k)
          |    LEFT JOIN trip USING (tg) LEFT JOIN ctx2p USING (c2k)
          |    JOIN bi USING (bg) JOIN ctx USING (w1) JOIN pc USING (w2)
          |  CROSS JOIN tys CROSS JOIN voc
          |  GROUP BY g.doc_id)
          |SELECT d.doc_id, s.n_5grams, round(s.avg_logp, 6) AS avg_logp
          |FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
          |ORDER BY d.doc_id""".stripMargin),

    // The pruning price tag (r17): unpruned (Kn5ProbTree, inner
    // joins — self-trained, every join hits) vs pruned
    // (Kn5BackoffTree, left joins) scorings of the same corpus,
    // folded to one row of size-benefit + exact-decimal drift-cost.
    "q_kn5_drift" ->
      (s"WITH $Kn5ModelCtes," + "\n" + s"$Kn5PrunedCtes," + "\n" +
        s"""su AS (
          |  SELECT g.doc_id, round(avg(ln(
          |      $Kn5ProbTree
          |    )), 6) AS lp_full
          |  FROM g5d g JOIN q5 USING (fg) JOIN ctx4 USING (c4k)
          |    JOIN q4 USING (g4) JOIN ctx3 USING (c3k)
          |    JOIN tri USING (tg) JOIN ctx2 USING (c2k)
          |    JOIN bi USING (bg) JOIN ctx USING (w1) JOIN pc USING (w2)
          |  CROSS JOIN tys CROSS JOIN voc
          |  GROUP BY g.doc_id),
          |sp AS (
          |  SELECT g.doc_id, round(avg(ln(
          |      $Kn5BackoffTree
          |    )), 6) AS lp_pruned
          |  FROM g5d g LEFT JOIN q5p USING (fg) LEFT JOIN ctx4p USING (c4k)
          |    LEFT JOIN q4p USING (g4) LEFT JOIN ctx3p USING (c3k)
          |    LEFT JOIN trip USING (tg) LEFT JOIN ctx2p USING (c2k)
          |    JOIN bi USING (bg) JOIN ctx USING (w1) JOIN pc USING (w2)
          |  CROSS JOIN tys CROSS JOIN voc
          |  GROUP BY g.doc_id),
          |sz AS (SELECT
          |  (SELECT count(*) FROM bi) + (SELECT count(*) FROM ctx)
          |  + (SELECT count(*) FROM pc) + 2
          |  + (SELECT count(*) FROM tri) + (SELECT count(*) FROM ctx2)
          |  + (SELECT count(*) FROM q4) + (SELECT count(*) FROM ctx3)
          |  + (SELECT count(*) FROM q5) + (SELECT count(*) FROM ctx4) AS model_rows,
          |  (SELECT count(*) FROM bi) + (SELECT count(*) FROM ctx)
          |  + (SELECT count(*) FROM pc) + 2
          |  + (SELECT count(*) FROM trip) + (SELECT count(*) FROM ctx2p)
          |  + (SELECT count(*) FROM q4p) + (SELECT count(*) FROM ctx3p)
          |  + (SELECT count(*) FROM q5p) + (SELECT count(*) FROM ctx4p) AS pruned_rows),
          |dr AS (SELECT CAST(abs(sp.lp_pruned - su.lp_full) AS DECIMAL(18,6)) AS drift
          |       FROM su JOIN sp USING (doc_id))
          |SELECT sz.model_rows, sz.pruned_rows,
          |  CAST(count(*) AS INT) AS n_scored,
          |  CAST(CAST(sum(drift) AS DECIMAL(18,6)) AS DOUBLE) AS sum_abs_drift,
          |  CAST(max(drift) AS DOUBLE) AS max_abs_drift
          |FROM dr CROSS JOIN sz
          |GROUP BY sz.model_rows, sz.pruned_rows""".stripMargin),

    // The q_lm_score model CTEs (trained on FULL docs) scoring the
    // newline-ified corpus's lines: every within-line bigram also
    // occurs in its document, so the LEFT joins all hit here; pos is
    // 0-based on both sides.
    "q_lm_lines" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |nl AS (SELECT doc_id,
        |  [array_to_string(tk[i*8+1 : i*8+8], ' ')
        |   for i in generate_series(0, (len(tk)-1)//8)] AS lines
        |  FROM tk),
        |l AS (SELECT doc_id,
        |  unnest([{'pos': i - 1, 'line': lines[i]}
        |          for i in generate_series(1, len(lines))],
        |         recursive := true)
        |  FROM nl),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |posn AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks),
        |grams AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS bg, t[i] AS w1 FROM posn),
        |uni AS (SELECT w, count(*) AS c1 FROM
        |          (SELECT unnest(t) AS w FROM toks) GROUP BY w),
        |bi AS (SELECT bg, count(*) AS c2 FROM grams GROUP BY bg),
        |voc AS (SELECT count(*) AS v FROM uni),
        |lt AS (SELECT doc_id, pos, string_split(line, ' ') AS t FROM l),
        |lp AS (SELECT doc_id, pos, t, unnest(generate_series(1, len(t) - 1)) AS i
        |       FROM lt),
        |lg AS (SELECT doc_id, pos, t[i] || ' ' || t[i + 1] AS bg, t[i] AS w1 FROM lp),
        |sc AS (
        |  SELECT lg.doc_id, lg.pos, CAST(count(*) AS INT) AS n_bigrams,
        |    avg(ln((coalesce(c2, 0) + 0.4) / (coalesce(c1, 0) + 0.4 * voc.v))) AS avg_logp
        |  FROM lg LEFT JOIN bi USING (bg) LEFT JOIN uni ON lg.w1 = uni.w CROSS JOIN voc
        |  GROUP BY lg.doc_id, lg.pos)
        |SELECT l.doc_id, CAST(l.pos AS INT) AS pos, l.line,
        |  sc.n_bigrams, round(sc.avg_logp, 6) AS avg_logp
        |FROM l LEFT JOIN sc ON l.doc_id = sc.doc_id AND l.pos = sc.pos
        |ORDER BY l.doc_id, l.pos""".stripMargin,

    // Replicates dsirScore(target = lang 'en', dim 64, α 0.4): same
    // 16-bit-md5 bigram buckets (the QualityModelCtes hash family),
    // exact BIGINT histograms/totals, one shared ratio tree inside ln,
    // per-doc mean at the lmScore 6-dp rounding.
    "q_dsir_score" ->
      """WITH rawt AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |rawf AS (
        |  SELECT doc_id,
        |    (CAST(('0x' || substring(md5(t[i] || ' ' || t[i + 1]), 1, 4)) AS INT) % 64) + 1 AS b
        |  FROM rawt, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)),
        |tgtt AS (SELECT string_split(text, ' ') AS t FROM documents WHERE lang = 'en'),
        |tgtf AS (
        |  SELECT (CAST(('0x' || substring(md5(t[i] || ' ' || t[i + 1]), 1, 4)) AS INT) % 64) + 1 AS b
        |  FROM tgtt, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)),
        |hr AS (SELECT b, count(*) AS cr FROM rawf GROUP BY b),
        |ht AS (SELECT b, count(*) AS ct FROM tgtf GROUP BY b),
        |tr AS (SELECT CAST(sum(cr) AS BIGINT) AS nr FROM hr),
        |tt AS (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) AS nt FROM ht),
        |rat AS (
        |  SELECT hr.b,
        |    ln(((coalesce(ht.ct, 0) + CAST(0.4 AS DOUBLE)) * (tr.nr + CAST(25.6 AS DOUBLE))) /
        |       ((hr.cr + CAST(0.4 AS DOUBLE)) * (tt.nt + CAST(25.6 AS DOUBLE)))) AS logratio
        |  FROM hr LEFT JOIN ht USING (b) CROSS JOIN tr CROSS JOIN tt),
        |scored AS (
        |  SELECT f.doc_id, CAST(count(*) AS INT) AS n_features,
        |    avg(r.logratio) AS dsir_score
        |  FROM rawf f JOIN rat r USING (b) GROUP BY f.doc_id)
        |SELECT d.doc_id, s.n_features, round(s.dsir_score, 6) AS dsir_score
        |FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // Naive form of the sliding-window span dedup: md5 grams (hash
    // equality only — the Spark side uses xxhash64), lag-based island
    // breaks, integer-only output. l=8, minDocs=2.
    "q_dup_spans" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |w AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 7)) AS pos
        |      FROM t WHERE len(toks) >= 8),
        |g AS (SELECT doc_id, pos, md5(array_to_string(toks[pos : pos + 7], ' ')) AS gram FROM w),
        |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
        |hit AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
        |brk AS (SELECT doc_id, pos,
        |          CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
        |                 OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8
        |               THEN 1 ELSE 0 END AS b
        |        FROM hit),
        |isl AS (SELECT doc_id, pos,
        |          sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |        FROM brk)
        |SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
        | CAST(max(pos) + 7 AS INT) AS span_end,
        | CAST(max(pos) + 8 - min(pos) AS INT) AS span_tokens
        |FROM isl GROUP BY doc_id, island ORDER BY doc_id, span_start""".stripMargin,

    // Keep-first apply: canonical occurrence per span content
    // (row_number over md5 span fingerprint), every other occurrence
    // deleted; text rebuilt from the kept token positions. Untouched
    // docs pass through; a fully-duplicated doc yields clean_text = ''.
    "q_despan" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |w AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 7)) AS pos
        |      FROM t WHERE len(toks) >= 8),
        |g AS (SELECT doc_id, pos, md5(array_to_string(toks[pos : pos + 7], ' ')) AS gram FROM w),
        |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
        |hit AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
        |brk AS (SELECT doc_id, pos,
        |          CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
        |                 OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8
        |               THEN 1 ELSE 0 END AS b
        |        FROM hit),
        |isl AS (SELECT doc_id, pos,
        |          sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |        FROM brk),
        |spans AS (SELECT doc_id, min(pos) AS span_start, max(pos) + 7 AS span_end
        |          FROM isl GROUP BY doc_id, island),
        |sp AS (SELECT s.doc_id, s.span_start, s.span_end,
        |         md5(array_to_string(t.toks[s.span_start : s.span_end], ' ')) AS span_fp
        |       FROM spans s JOIN t USING (doc_id)),
        |rm AS (SELECT doc_id, span_start, span_end FROM
        |        (SELECT doc_id, span_start, span_end,
        |           row_number() OVER (PARTITION BY span_fp ORDER BY doc_id, span_start) AS rn
        |         FROM sp) WHERE rn > 1),
        |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        |          generate_subscripts(string_split(text, ' '), 1) AS pos
        |        FROM documents),
        |keep AS (SELECT k.doc_id, k.pos, k.tok FROM tok k
        |         WHERE NOT EXISTS (SELECT 1 FROM rm
        |            WHERE rm.doc_id = k.doc_id AND k.pos BETWEEN rm.span_start AND rm.span_end))
        |SELECT d.doc_id,
        | CAST(len(string_split(d.text, ' ')) - count(k.tok) AS INT) AS removed_tokens,
        | coalesce(string_agg(k.tok, ' ' ORDER BY k.pos), '') AS clean_text
        |FROM documents d LEFT JOIN keep k USING (doc_id)
        |GROUP BY d.doc_id, d.text ORDER BY d.doc_id""".stripMargin,

    // Inverted index: postings fingerprint is md5 over "doc:tf" pairs in
    // doc_id order on both sides.
    "q_inverted" ->
      """WITH tf AS (SELECT term, doc_id, count(*) AS tf FROM
        |   (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |  GROUP BY term, doc_id)
        |SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf,
        | md5(string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id)) AS postings_fp
        |FROM tf GROUP BY term ORDER BY term""".stripMargin,

    // BM25-rational: the SQL mirrors the Spark expression tree operation
    // for operation (left-assoc, same parenthesization, same fixed
    // term-fold order merge->sort->window->hash) so every double is
    // bit-identical. k1=1.2 b=0.75 topK=20.
    "q_bm25" -> Bm25OracleSql,

    // Index round-trip serve ≡ inline scoring: same oracle string (the
    // q_lm_serve / q_minhash_served pattern for retrieval).
    "q_bm25_served" -> Bm25OracleSql,

    // The q_bm25 scoring chain and the raw-tf chain, top-20 each, FULL
    // JOINed and fused with the identical coalesce'd 1/(60+rank) sum in
    // list order.
    "q_rrf" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |dl AS (SELECT doc_id, len(toks) AS dl FROM toks),
        |c AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
        |u AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf1 AS (SELECT doc_id, term, count(*) AS tf FROM u
        |        WHERE term IN ('merge', 'sort', 'window', 'hash')
        |        GROUP BY doc_id, term),
        |df1 AS (SELECT term, count(*) AS df FROM tf1 GROUP BY term),
        |s1 AS (SELECT tf1.doc_id, tf1.term,
        |        ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
        |        ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
        |         (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) /
        |            (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))) AS sc
        |       FROM tf1 JOIN df1 USING (term) JOIN dl USING (doc_id) CROSS JOIN c),
        |agg1 AS (SELECT doc_id,
        |         coalesce(max(CASE WHEN term = 'merge' THEN sc END), 0.0)
        |         + coalesce(max(CASE WHEN term = 'sort' THEN sc END), 0.0)
        |         + coalesce(max(CASE WHEN term = 'window' THEN sc END), 0.0)
        |         + coalesce(max(CASE WHEN term = 'hash' THEN sc END), 0.0) AS score
        |        FROM s1 GROUP BY doc_id),
        |bmr AS (SELECT doc_id,
        |         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS r
        |        FROM agg1 QUALIFY r <= 20),
        |tft AS (SELECT doc_id,
        |         CAST(row_number() OVER (ORDER BY tf_total DESC, doc_id) AS INT) AS r
        |        FROM (SELECT doc_id, count(*) AS tf_total FROM u
        |              WHERE term IN ('merge', 'sort', 'window', 'hash')
        |              GROUP BY doc_id)
        |        QUALIFY r <= 20),
        |f AS (SELECT coalesce(b.doc_id, t.doc_id) AS doc_id, b.r AS r0, t.r AS r1
        |      FROM bmr b FULL JOIN tft t ON b.doc_id = t.doc_id),
        |sc AS (SELECT doc_id,
        |        coalesce(CAST(1.0 AS DOUBLE) / (60 + r0), CAST(0 AS DOUBLE))
        |        + coalesce(CAST(1.0 AS DOUBLE) / (60 + r1), CAST(0 AS DOUBLE)) AS rrf_score
        |       FROM f)
        |SELECT CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS INT) AS rank,
        | doc_id, rrf_score
        |FROM sc QUALIFY rank <= 20 ORDER BY rank""".stripMargin,

    // The full RM3 chain: q_bm25's scoring tree (tf1/df1/s1/agg1) picks
    // the 5 feedback docs, selection scores tf_fb·idf_r over the
    // feedback vocabulary (exact ints into one rational product), and
    // the final pass folds per-term contributions with list_reduce in
    // position order — weight-1.0 terms keep the unweighted tree, so
    // skipping absent terms (vs Spark's literal 0.0 additions) cannot
    // change any sum.
    "q_bm25_rm3" -> Rm3OracleSql,

    // Served RM3 reads postings only; on the training corpus it must
    // equal inline row-for-row — the oracle string is shared.
    "q_rm3_served" -> Rm3OracleSql,

    // Three (BM25 truth, tf candidate) chain pairs from the SAME
    // RetrievalEvalQueries term sets, then the eval join: hits are the
    // (query_id, doc_id) intersection at k=10; recall and mrr are one
    // exact division each; dcg/idcg mirror the Spark expression
    // (gain / log2(rank + 1), 0.0 on misses) and compare at 6 dp.
    "q_retrieval_eval" ->
      (s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM toks),
c AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
""" +
        RetrievalEvalQueries.zipWithIndex.map { case ((qid, ts), i) =>
          retrievalEvalChain(('A' + i).toChar.toString, qid, ts, 10)
        }.mkString(",\n") + ",\n" +
        s"""ua AS (${RetrievalEvalQueries.indices
          .map(i => s"SELECT * FROM tru${('A' + i).toChar}")
          .mkString(" UNION ALL ")}),
ur AS (${RetrievalEvalQueries.indices
          .map(i => s"SELECT * FROM res${('A' + i).toChar}")
          .mkString(" UNION ALL ")}),
ideal AS (SELECT query_id, count(*) AS n_truth,
           sum(gain / log2(tru_rank + 1)) AS idcg
          FROM ua GROUP BY query_id),
got AS (SELECT r.query_id,
         count(t.tru_rank) AS n_hit,
         min(CASE WHEN t.tru_rank IS NOT NULL THEN r.res_rank END) AS first_hit,
         sum(CASE WHEN t.tru_rank IS NOT NULL
              THEN t.gain / log2(r.res_rank + 1)
              ELSE CAST(0 AS DOUBLE) END) AS dcg
        FROM ur r LEFT JOIN ua t USING (query_id, doc_id)
        GROUP BY r.query_id)
SELECT i.query_id, i.n_truth, coalesce(g.n_hit, CAST(0 AS BIGINT)) AS n_hit,
  CAST(coalesce(g.n_hit, CAST(0 AS BIGINT)) AS DOUBLE) / i.n_truth AS recall,
  coalesce(CAST(1.0 AS DOUBLE) / g.first_hit, CAST(0 AS DOUBLE)) AS mrr,
  round(coalesce(g.dcg, CAST(0 AS DOUBLE)), 6) AS dcg,
  round(CASE WHEN i.idcg > CAST(0 AS DOUBLE)
        THEN coalesce(g.dcg, CAST(0 AS DOUBLE)) / i.idcg END, 6) AS ndcg
FROM ideal i LEFT JOIN got g USING (query_id) ORDER BY query_id"""),

    // Per query: the BM25 top-10 chain (tru CTEs, gain = score), the
    // all-terms relevance proxy, NOT IN anti-filter, dense re-rank by
    // original BM25 rank, top-5. Scores are the rational-BM25 doubles
    // and compare raw.
    "q_hard_negatives" ->
      (s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM toks),
c AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
""" +
        RetrievalEvalQueries.zipWithIndex.map { case ((qid, ts), i) =>
          retrievalEvalChain(('A' + i).toChar.toString, qid, ts, 10)
        }.mkString(",\n") + ",\n" +
        RetrievalEvalQueries.zipWithIndex.map { case ((_, _), i) =>
          val sfx = ('A' + i).toChar
          s"""pos$sfx AS (SELECT doc_id FROM documents WHERE lang = 'en'),
neg$sfx AS (SELECT * FROM (
  SELECT query_id,
         CAST(row_number() OVER (ORDER BY tru_rank) AS INT) AS neg_rank,
         doc_id, gain AS score
  FROM tru$sfx WHERE doc_id NOT IN (SELECT doc_id FROM pos$sfx))
 WHERE neg_rank <= 5)"""
        }.mkString(",\n") + "\n" +
        s"""SELECT query_id, neg_rank, doc_id, score FROM (${RetrievalEvalQueries.indices
          .map(i => s"SELECT * FROM neg${('A' + i).toChar}")
          .mkString(" UNION ALL ")})
ORDER BY query_id, neg_rank"""),

    // The same 8-token newline-ification as the Spark wrapper, then C4
    // line rules as a list_filter; counts CAST to INT (Spark size() is
    // int32, DuckDB len() is int64).
    "q_clean_lines" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |nl AS (SELECT doc_id,
        |  [array_to_string(tk[i*8+1 : i*8+8], ' ')
        |   for i in generate_series(0, (len(tk)-1)//8)] AS lines
        |  FROM tk),
        |k AS (SELECT doc_id, lines,
        |  list_filter(lines, x -> len(list_filter(regexp_split_to_array(x, '\s+'), t -> t != '')) >= 3
        |    AND len(list_intersect(list_filter(regexp_split_to_array(x, '\s+'), t -> t != ''), ['the', 'a'])) = 0) AS kept
        | FROM nl)
        |SELECT doc_id, CAST(len(lines) AS INT) AS n_lines,
        |  CAST(len(kept) AS INT) AS n_kept,
        |  coalesce(array_to_string(kept, chr(10)), '') AS text_clean
        |FROM k ORDER BY doc_id""".stripMargin,

    // Same nl CTE; keep-first = row_number over (line) ordered by
    // (doc_id, pos) — the oracle affords the per-line window the Spark
    // side deliberately avoids (grouped min + keyed join there).
    "q_dedup_lines" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |nl AS (SELECT doc_id,
        |  [array_to_string(tk[i*8+1 : i*8+8], ' ')
        |   for i in generate_series(0, (len(tk)-1)//8)] AS lines
        |  FROM tk),
        |l AS (SELECT doc_id,
        |  unnest([{'pos': i, 'line': lines[i]}
        |          for i in generate_series(1, len(lines))],
        |         recursive := true)
        |  FROM nl),
        |k AS (SELECT doc_id, pos, line,
        |  row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
        |  FROM l),
        |r AS (SELECT doc_id, CAST(count(*) AS INT) AS n_kept,
        |  string_agg(line, chr(10) ORDER BY pos) AS text_dedup
        |  FROM k WHERE rn = 1 GROUP BY doc_id)
        |SELECT nl.doc_id, CAST(len(nl.lines) AS INT) AS n_lines,
        |  coalesce(r.n_kept, 0) AS n_kept,
        |  coalesce(r.text_dedup, '') AS text_dedup
        |FROM nl LEFT JOIN r ON nl.doc_id = r.doc_id
        |ORDER BY nl.doc_id""".stripMargin,

    // Same nl CTE; top-20 by count then line text, counts CAST per the
    // engine conventions (count_distinct is int64 both sides).
    "q_line_stats" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |nl AS (SELECT doc_id,
        |  [array_to_string(tk[i*8+1 : i*8+8], ' ')
        |   for i in generate_series(0, (len(tk)-1)//8)] AS lines
        |  FROM tk),
        |l AS (SELECT doc_id, unnest(lines) AS line FROM nl)
        |SELECT line, count(*) AS n_occurrences,
        |  count(DISTINCT doc_id) AS n_docs, min(doc_id) AS first_doc_id
        |FROM l GROUP BY line
        |ORDER BY n_occurrences DESC, line LIMIT 20""".stripMargin,

    // Same nl CTE; per-(doc, line) counts then the per-doc rollup. Both
    // fractions are single long/long double divisions; the char
    // denominator CASE-guards the all-empty-lines doc.
    "q_line_repetition" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |nl AS (SELECT doc_id,
        |  [array_to_string(tk[i*8+1 : i*8+8], ' ')
        |   for i in generate_series(0, (len(tk)-1)//8)] AS lines
        |  FROM tk),
        |l AS (SELECT doc_id, unnest(lines) AS line FROM nl),
        |c AS (SELECT doc_id, line, count(*) AS c, length(line) AS len
        |      FROM l GROUP BY doc_id, line)
        |SELECT doc_id,
        | CAST(sum(c) AS INT) AS n_lines,
        | CAST(count(*) AS INT) AS n_distinct_lines,
        | CAST(sum(c - 1) AS DOUBLE) / sum(c) AS dup_line_frac,
        | CASE WHEN sum(len * c) > 0
        |   THEN CAST(sum(len * (c - 1)) AS DOUBLE) / sum(len * c)
        | END AS dup_char_frac
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Same nl CTE split into the even-id registry (distinct md5 lines)
    // and the odd-id incoming batch; known = registry hit. pos is
    // 0-based on both sides (posexplode / i - 1), CAST INT.
    "q_dedup_lines_incr" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |nl AS (SELECT doc_id,
        |  [array_to_string(tk[i*8+1 : i*8+8], ' ')
        |   for i in generate_series(0, (len(tk)-1)//8)] AS lines
        |  FROM tk),
        |l AS (SELECT doc_id,
        |  unnest([{'pos': i - 1, 'line': lines[i]}
        |          for i in generate_series(1, len(lines))],
        |         recursive := true)
        |  FROM nl),
        |reg AS (SELECT DISTINCT md5(line) AS line_hash FROM l WHERE doc_id % 2 = 0),
        |inc AS (SELECT doc_id, pos, line, md5(line) AS line_hash
        |        FROM l WHERE doc_id % 2 = 1)
        |SELECT doc_id, CAST(pos AS INT) AS pos, line,
        |  r.line_hash IS NOT NULL AS known
        |FROM inc LEFT JOIN reg r USING (line_hash)
        |ORDER BY doc_id, pos""".stripMargin,

    // Per-k suffixed exact-Lloyd replays + final assignments, one row
    // per candidate (see kmeansSweepOracleSql).
    "q_kmeans_sweep" -> kmeansSweepOracleSql(Seq(2, 4, 8), 2),

    // Quantization CTE is q_quantize's verbatim; distances are exact
    // integer sums, ties break to the smaller cid on both sides.
    "q_kmeans_assign" ->
      """WITH q AS (
        |  SELECT vec_id, embedding,
        |    CASE WHEN list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) > 0
        |         THEN 127.0 / list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
        |         ELSE 0.0 END AS q_scale
        |  FROM embeddings),
        |qv AS (SELECT vec_id,
        |        list_transform(embedding,
        |          x -> CAST(floor(CAST(x AS DOUBLE) * q_scale + 0.5) AS BIGINT)) AS v
        |       FROM q),
        |cent AS (SELECT vec_id AS cid, v AS cv FROM qv ORDER BY vec_id LIMIT 8),
        |d AS (SELECT qv.vec_id, cent.cid,
        |        list_sum(list_transform(generate_series(1, len(qv.v)),
        |          i -> (qv.v[i] - cent.cv[i]) * (qv.v[i] - cent.cv[i]))) AS dist
        |      FROM qv CROSS JOIN cent)
        |SELECT vec_id, cid, CAST(dist AS BIGINT) AS dist
        |FROM (SELECT vec_id, cid, dist,
        |        row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d)
        |WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    // Assignment CTE is q_kmeans_assign's verbatim; the within-cluster
    // cosine uses the same ordered-fold dot + hoisted sqrt norms as the
    // Spark side, so the threshold compare is bit-exact. The `LIMIT 8`
    // and `>= 0.35` literals MUST track the k = 8 / threshold = 0.35
    // arguments at the q_semantic_dedup call site in `queries` — change
    // both together or the cross-engine compare silently diverges. The
    // `a.nrm * b.nrm > 0` conjunct is the Spark side's zero-norm guard.
    "q_semantic_dedup" ->
      """WITH q AS (
        |  SELECT vec_id, embedding,
        |    CASE WHEN list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) > 0
        |         THEN 127.0 / list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
        |         ELSE 0.0 END AS q_scale
        |  FROM embeddings),
        |qv AS (SELECT vec_id,
        |        list_transform(embedding,
        |          x -> CAST(floor(CAST(x AS DOUBLE) * q_scale + 0.5) AS BIGINT)) AS v
        |       FROM q),
        |cent AS (SELECT vec_id AS cid, v AS cv FROM qv ORDER BY vec_id LIMIT 8),
        |d AS (SELECT qv.vec_id, cent.cid,
        |        list_sum(list_transform(generate_series(1, len(qv.v)),
        |          i -> (qv.v[i] - cent.cv[i]) * (qv.v[i] - cent.cv[i]))) AS dist
        |      FROM qv CROSS JOIN cent),
        |asg AS (SELECT vec_id, cid FROM
        |          (SELECT vec_id, cid,
        |             row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |           FROM d) WHERE rn = 1),
        |n AS (SELECT e.vec_id, a.cid,
        |        list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v,
        |        sqrt(list_reduce(
        |          list_transform(generate_series(1, len(e.embedding)),
        |            i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
        |          (x, y) -> x + y)) AS nrm
        |      FROM embeddings e JOIN asg a USING (vec_id)),
        |dropped AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM n a JOIN n b ON a.cid = b.cid AND a.vec_id < b.vec_id
        |  WHERE a.nrm * b.nrm > 0
        |    AND list_reduce(
        |          list_transform(generate_series(1, least(len(a.v), len(b.v))),
        |            i -> a.v[i] * b.v[i]), (x, y) -> x + y)
        |        / (a.nrm * b.nrm) >= 0.35)
        |SELECT n.vec_id, n.cid, dropped.vec_id IS NULL AS kept
        |FROM n LEFT JOIN dropped ON n.vec_id = dropped.vec_id
        |ORDER BY n.vec_id""".stripMargin,

    // Incremental SemDeDup: quantize/assign CTEs as q_semantic_dedup but
    // centroids seeded from the even-id (corpus) side only; the drop
    // probe is corpus-vs-incoming, never a self-pair on either side.
    "q_semantic_incr" ->
      """WITH q AS (
        |  SELECT vec_id, embedding,
        |    CASE WHEN list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) > 0
        |         THEN 127.0 / list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
        |         ELSE 0.0 END AS q_scale
        |  FROM embeddings),
        |qv AS (SELECT vec_id,
        |        list_transform(embedding,
        |          x -> CAST(floor(CAST(x AS DOUBLE) * q_scale + 0.5) AS BIGINT)) AS v
        |       FROM q),
        |cent AS (SELECT vec_id AS cid, v AS cv FROM qv
        |         WHERE vec_id % 2 = 0 ORDER BY vec_id LIMIT 8),
        |d AS (SELECT qv.vec_id, cent.cid,
        |        list_sum(list_transform(generate_series(1, len(qv.v)),
        |          i -> (qv.v[i] - cent.cv[i]) * (qv.v[i] - cent.cv[i]))) AS dist
        |      FROM qv CROSS JOIN cent),
        |asg AS (SELECT vec_id, cid FROM
        |          (SELECT vec_id, cid,
        |             row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |           FROM d) WHERE rn = 1),
        |n AS (SELECT e.vec_id, a.cid,
        |        list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v,
        |        sqrt(list_reduce(
        |          list_transform(generate_series(1, len(e.embedding)),
        |            i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
        |          (x, y) -> x + y)) AS nrm
        |      FROM embeddings e JOIN asg a USING (vec_id)),
        |dropped AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM n a JOIN n b ON a.cid = b.cid
        |    AND a.vec_id % 2 = 0 AND b.vec_id % 2 = 1
        |  WHERE a.nrm * b.nrm > 0
        |    AND list_reduce(
        |          list_transform(generate_series(1, least(len(a.v), len(b.v))),
        |            i -> a.v[i] * b.v[i]), (x, y) -> x + y)
        |        / (a.nrm * b.nrm) >= 0.35)
        |SELECT n.vec_id, n.cid, dropped.vec_id IS NULL AS kept
        |FROM n LEFT JOIN dropped ON n.vec_id = dropped.vec_id
        |WHERE n.vec_id % 2 = 1
        |ORDER BY n.vec_id""".stripMargin,

    // One-row cap audit: count(CASE) / sum(CASE) in BIGINT like the
    // Spark aggregates (DuckDB sum widens to HUGEINT — cast back).
    "q_copurchase_cap" ->
      s"""WITH sizes AS (
        |  SELECT l_orderkey, count(*) AS n_items FROM lineitem
        |  WHERE l_quantity >= $LrMinQty GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(count(CASE WHEN n_items > $LrMaxItemsPerOrder THEN 1 END)
        |    AS BIGINT) AS n_capped,
        |  CAST(coalesce(sum(CASE WHEN n_items > $LrMaxItemsPerOrder
        |    THEN n_items * (n_items - 1) END), 0) AS BIGINT)
        |    AS pairs_dropped,
        |  CAST(max(n_items) AS BIGINT) AS max_items
        |FROM sizes""".stripMargin,

    "q_graph_audit" ->
      s"""WITH $LrLiCte,
        |e AS (SELECT a.l_partkey AS src, b.l_partkey AS dst,
        |        count(*) AS weight
        |      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |        AND a.l_partkey <> b.l_partkey
        |      GROUP BY 1, 2),
        |o AS (SELECT src, CAST(sum(weight) AS BIGINT) AS w_out
        |      FROM e GROUP BY 1),
        |ns AS (SELECT count(*) AS n_nodes,
        |         count(CASE WHEN o.src IS NULL THEN 1 END) AS n_dangling,
        |         CAST(coalesce(max(o.w_out), 0) AS BIGINT) AS max_out_weight
        |       FROM part LEFT JOIN o ON part.p_partkey = o.src),
        |es AS (SELECT count(*) AS n_edges,
        |         CAST(coalesce(sum(weight), 0) AS BIGINT) AS total_weight
        |       FROM e)
        |SELECT n_nodes, n_edges, total_weight, n_dangling, max_out_weight,
        |  CASE WHEN total_weight > 0 THEN
        |    CAST(max_out_weight AS DOUBLE) / CAST(total_weight AS DOUBLE)
        |  END AS top_hub_share
        |FROM ns CROSS JOIN es""".stripMargin,

    // Graph.linkRank's rounds unrolled as chained CTEs — same Long
    // floor-division arithmetic (DuckDB // ≡ Spark div on non-negative
    // operands), same teleport/damping constants interpolated from the
    // shared Scala vals, so every mass matches bit-for-bit.
    "q_linkrank" ->
      s"""WITH $LrChainCtes
        |SELECT node, mass FROM m$LrIters ORDER BY node""".stripMargin,

    // linkRankResidual: the SAME unrolled chain, then per consecutive
    // round pair the max |Δmass| and changed-node count — integer max
    // and count, so order-independent like every mass.
    "q_linkrank_residual" -> {
      val perRound = (1 to LrIters).map { i =>
        s"""SELECT $i AS round,
          |  (SELECT CAST(coalesce(max(abs(a.mass - b.mass)), 0) AS BIGINT)
          |   FROM m$i a JOIN m${i - 1} b ON a.node = b.node) AS max_abs_delta,
          |  (SELECT CAST(count(*) AS BIGINT)
          |   FROM m$i a JOIN m${i - 1} b ON a.node = b.node
          |   WHERE a.mass <> b.mass) AS n_changed""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $LrChainCtes
        |SELECT * FROM (
        |$perRound
        |) ORDER BY round""".stripMargin
    },

    // linkRankSeeded's rounds — the q_linkrank chain with the teleport
    // and dangling-share terms gated on the seed predicate (node % 20 =
    // 0), replayed verbatim on both engines.
    "q_linkrank_seeded" -> {
      val teleport = (LrDampDen - LrDampNum) * LrBase / LrDampDen
      val seedPred = "n.node % 20 = 0"
      val rounds = (1 to LrIters).map { i =>
        val prev = s"m${i - 1}"
        s"""i$i AS (SELECT e.dst AS node,
          |    CAST(sum((m.mass * e.weight) // o.w_out) AS BIGINT) AS in_mass
          |  FROM e JOIN $prev m ON e.src = m.node JOIN o ON e.src = o.src
          |  GROUP BY 1),
          |d$i AS (SELECT CAST(coalesce(sum(m.mass), 0) AS BIGINT) AS dang
          |  FROM $prev m LEFT JOIN o ON m.node = o.src
          |  WHERE o.src IS NULL),
          |m$i AS (SELECT n.node,
          |    CAST((CASE WHEN $seedPred THEN $teleport ELSE 0 END)
          |      + ($LrDampNum * (coalesce(s.in_mass, 0)
          |        + (CASE WHEN $seedPred THEN
          |            (SELECT dang FROM d$i) // (SELECT n FROM ns)
          |          ELSE 0 END)))
          |      // $LrDampDen AS BIGINT) AS mass
          |  FROM nodes n LEFT JOIN i$i s ON n.node = s.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH $LrLiCte,
        |e AS (SELECT a.l_partkey AS src, b.l_partkey AS dst,
        |        count(*) AS weight
        |      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |        AND a.l_partkey <> b.l_partkey
        |      GROUP BY 1, 2),
        |o AS (SELECT src, CAST(sum(weight) AS BIGINT) AS w_out
        |      FROM e GROUP BY 1),
        |nodes AS (SELECT p_partkey AS node FROM part),
        |ns AS (SELECT count(*) AS n FROM nodes n WHERE $seedPred),
        |m0 AS (SELECT n.node,
        |    CAST(CASE WHEN $seedPred THEN $LrBase ELSE 0 END AS BIGINT)
        |      AS mass FROM nodes n),
        |$rounds
        |SELECT node, mass FROM m$LrIters ORDER BY node""".stripMargin
    },

    // Graph.triangles' two joins replayed verbatim: same undirected
    // collapse, same (degree, node) orientation and wedge rank filter,
    // same 2·tri/(deg·(deg−1)) IEEE tree (e-notation literals so DuckDB
    // parses DOUBLE, not DECIMAL).
    "q_triangles" ->
      s"""WITH $LrLiCte,
        |e AS (SELECT a.l_partkey AS src, b.l_partkey AS dst
        |      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |        AND a.l_partkey <> b.l_partkey),
        |und AS (SELECT DISTINCT least(src, dst) AS u,
        |          greatest(src, dst) AS v FROM e),
        |deg AS (SELECT node, count(*) AS degree FROM (
        |          SELECT u AS node FROM und
        |          UNION ALL SELECT v AS node FROM und) GROUP BY 1),
        |ori AS (SELECT
        |    CASE WHEN du.degree < dv.degree
        |           OR (du.degree = dv.degree AND und.u < und.v)
        |      THEN und.u ELSE und.v END AS a,
        |    CASE WHEN du.degree < dv.degree
        |           OR (du.degree = dv.degree AND und.u < und.v)
        |      THEN und.v ELSE und.u END AS b,
        |    CASE WHEN du.degree < dv.degree
        |           OR (du.degree = dv.degree AND und.u < und.v)
        |      THEN dv.degree ELSE du.degree END AS db
        |  FROM und JOIN deg du ON und.u = du.node
        |    JOIN deg dv ON und.v = dv.node),
        |w AS (SELECT e1.a, e1.b AS wb, e2.b AS wc
        |      FROM ori e1 JOIN ori e2 ON e1.a = e2.a
        |      WHERE e1.db < e2.db OR (e1.db = e2.db AND e1.b < e2.b)),
        |tri AS (SELECT w.a, w.wb, w.wc
        |        FROM w JOIN ori ON ori.a = w.wb AND ori.b = w.wc),
        |pn AS (SELECT node, count(*) AS triangles FROM (
        |         SELECT a AS node FROM tri
        |         UNION ALL SELECT wb AS node FROM tri
        |         UNION ALL SELECT wc AS node FROM tri) GROUP BY 1)
        |SELECT n.node,
        |  CAST(coalesce(deg.degree, 0) AS BIGINT) AS degree,
        |  CAST(coalesce(pn.triangles, 0) AS BIGINT) AS triangles,
        |  CASE WHEN coalesce(deg.degree, 0) >= 2 THEN
        |    (2.0e0 * CAST(coalesce(pn.triangles, 0) AS DOUBLE)) /
        |      (CAST(deg.degree AS DOUBLE) *
        |        (CAST(deg.degree AS DOUBLE) - 1.0e0))
        |  END AS clustering_coeff
        |FROM (SELECT p_partkey AS node FROM part) n
        |  LEFT JOIN deg ON n.node = deg.node
        |  LEFT JOIN pn ON n.node = pn.node
        |ORDER BY n.node""".stripMargin,

    // hopDistance: HopMaxHops dense min-plus rounds unrolled — with
    // unit weights a node's hops is fixed the first round it is
    // reached, so rounds past settlement are no-ops and the fixed
    // unroll equals the operator's frontier loop regardless of where
    // the early stop fired.
    "q_hops" -> {
      val rounds = (1 to HopMaxHops).map { i =>
        val prev = s"h${i - 1}"
        s"""h$i AS (SELECT s.node,
          |    CAST(coalesce(s.hops,
          |      CASE WHEN c.node IS NOT NULL THEN $i END) AS BIGINT) AS hops
          |  FROM $prev s LEFT JOIN (
          |    SELECT DISTINCT e.dst AS node
          |    FROM e JOIN $prev p ON e.src = p.node
          |    WHERE p.hops = ${i - 1}) c ON s.node = c.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH $LrLiCte,
        |e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |        AND a.l_partkey <> b.l_partkey),
        |nodes AS (SELECT p_partkey AS node FROM part),
        |h0 AS (SELECT node, CASE WHEN node % $HopSeedMod = 0
        |         THEN CAST(0 AS BIGINT) END AS hops FROM nodes),
        |$rounds
        |SELECT node, hops FROM h$HopMaxHops ORDER BY node""".stripMargin
    },

    // Weighted min-plus replay: WHopMaxRounds DENSE relaxation rounds
    // (per round: min over in-edges of source dist + weight, folded
    // into the running per-node minimum) — equal to the operator's
    // frontier form by induction, and to its early-stopped run by
    // fixpoint idempotence. All-integer BIGINT arithmetic.
    "q_hops_weighted" -> {
      val rounds = (1 to WHopMaxRounds).map { i =>
        val prev = s"d${i - 1}"
        s"""c$i AS (SELECT e.dst AS node, min(p.dist + e.weight) AS c
          |  FROM e JOIN $prev p ON e.src = p.node
          |  WHERE p.dist IS NOT NULL GROUP BY 1),
          |d$i AS (SELECT s.node,
          |    CAST(CASE WHEN c.c IS NOT NULL
          |         AND (s.dist IS NULL OR c.c < s.dist)
          |      THEN c.c ELSE s.dist END AS BIGINT) AS dist
          |  FROM $prev s LEFT JOIN c$i c ON s.node = c.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH $LrLiCte,
        |e AS (SELECT a.l_partkey AS src, b.l_partkey AS dst,
        |        CAST(count(*) AS BIGINT) AS weight
        |      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |        AND a.l_partkey <> b.l_partkey
        |      GROUP BY 1, 2),
        |nodes AS (SELECT p_partkey AS node FROM part),
        |d0 AS (SELECT node, CASE WHEN node % $HopSeedMod = 0
        |         THEN CAST(0 AS BIGINT) END AS dist FROM nodes),
        |$rounds
        |SELECT node, dist FROM d$WHopMaxRounds ORDER BY node""".stripMargin
    },

    // labelPropagate: LpRounds synchronous rounds — per round one
    // (node, label) weight sum over the symmetrized edges, then the
    // argmax as a node-partitioned row_number by (w DESC, label ASC),
    // the window twin of the operator's combinable max-of-(w, -label)
    // struct. Integer weight totals keep every round order-independent.
    "q_communities" ->
      s"""WITH ${lpaPrologCtes()},
        |${lpaRoundCtes(LpRounds)}
        |SELECT node, label FROM l$LpRounds ORDER BY node""".stripMargin,

    // Residual replay: diff consecutive unrolled rounds — deterministic
    // integer counts, the q_linkrank_residual idiom at the label grain.
    "q_communities_residual" -> {
      val rs = (1 to LpConvMaxRounds).map { i =>
        s"""SELECT CAST($i AS INT) AS round,
          |  (SELECT count(*) FROM l$i a JOIN l${i - 1} b
          |   ON a.node = b.node AND a.label <> b.label) AS n_changed""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH ${lpaPrologCtes()},
        |${lpaRoundCtes(LpConvMaxRounds)}
        |$rs
        |ORDER BY round""".stripMargin
    },

    // Convergence-gated replay: same diffs pick k = first zero-change
    // round (else the budget); labels come from the DEEPEST unroll —
    // equal to round k's by idempotence, so no branch dispatch needed.
    "q_communities_conv" -> {
      val rs = (1 to LpConvMaxRounds).map { i =>
        s"""SELECT $i AS round,
          |  (SELECT count(*) FROM l$i a JOIN l${i - 1} b
          |   ON a.node = b.node AND a.label <> b.label) AS d""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH ${lpaPrologCtes()},
        |${lpaRoundCtes(LpConvMaxRounds)},
        |rs AS (
        |$rs),
        |kk AS (SELECT coalesce(min(round), $LpConvMaxRounds) AS k
        |       FROM rs WHERE d = 0)
        |SELECT node, label, CAST((SELECT k FROM kk) AS INT) AS rounds
        |FROM l$LpConvMaxRounds ORDER BY node""".stripMargin
    },

    // Semi-sync replay: SemiMaxRounds rounds of SemiColors sequential
    // per-color sub-steps unrolled, then the q_communities_conv idiom —
    // consecutive-round diffs pick k = first zero-change round, labels
    // from the deepest unroll (equal to round k's by idempotence). The
    // d=0 row is the oracle-side CERTIFICATE that the semi-sync ladder
    // reaches zero where the synchronous one plateaus.
    "q_communities_semisync" -> {
      val rs = (1 to SemiMaxRounds).map { i =>
        s"""SELECT $i AS round,
          |  (SELECT count(*) FROM l$i a JOIN l${i - 1} b
          |   ON a.node = b.node AND a.label <> b.label) AS d""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH ${lpaPrologCtes()},
        |${semiSyncRoundCtes(SemiMaxRounds, SemiColors)},
        |rs AS (
        |$rs),
        |kk AS (SELECT coalesce(min(round), $SemiMaxRounds) AS k
        |       FROM rs WHERE d = 0)
        |SELECT node, label, CAST((SELECT k FROM kk) AS INT) AS rounds
        |FROM l$SemiMaxRounds ORDER BY node""".stripMargin
    },

    // Modularity replay: per depth, one pass over labeled symmetrized
    // edges for per-community (in_c, tot_c), then the exact-integer
    // numerator in HUGEINT (Spark: DECIMAL(38,0)) and ONE division to
    // double — both engines round the same exact operands.
    "q_modularity" -> {
      val rows = Seq(LpRounds, LpConvMaxRounds).map { k =>
        s"""SELECT CAST($k AS INT) AS rounds,
          |  (SELECT CAST(coalesce(sum(tot_c), 0) AS BIGINT) FROM mc$k) AS two_m,
          |  (SELECT count(DISTINCT label) FROM l$k) AS n_communities,
          |  (SELECT CASE WHEN coalesce(sum(tot_c), 0) > 0 THEN
          |     CAST(CAST(sum(in_c) AS HUGEINT) * CAST(sum(tot_c) AS HUGEINT)
          |          - sum(CAST(tot_c AS HUGEINT) * CAST(tot_c AS HUGEINT))
          |       AS DOUBLE)
          |     / CAST(CAST(sum(tot_c) AS HUGEINT) * CAST(sum(tot_c) AS HUGEINT)
          |       AS DOUBLE)
          |   END FROM mc$k) AS modularity""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH ${lpaPrologCtes()},
        |${lpaRoundCtes(LpConvMaxRounds)},
        |${modularityMcCtes(Seq(LpRounds, LpConvMaxRounds))}
        |$rows
        |ORDER BY rounds""".stripMargin
    },

    // Gated replay with the PLATEAU stop: the same per-depth (in_c,
    // tot_c) passes for every round in the budget, then the integer
    // stop decision rebuilt from the exact HUGEINT numerators —
    // best_at(d) = earliest depth ≤ d with the running-max numerator
    // (ties to earliest — all depths share the (2m)^2 denominator so
    // the numerator IS the quality order), stop = first depth with
    // depth − best_at ≥ patience (else the budget), labels from
    // best_at(stop). Live operator and replay compute the same integer
    // function of the graph, so they pick the same round even though
    // the live loop never ran the rounds past the stop.
    "q_communities_gated" -> {
      val numRows = (1 to LpGateMaxRounds).map { k =>
        s"""SELECT $k AS depth,
          |  (SELECT CAST(coalesce(sum(in_c), 0) AS HUGEINT)
          |     * CAST(coalesce(sum(tot_c), 0) AS HUGEINT)
          |     - coalesce(sum(CAST(tot_c AS HUGEINT)
          |         * CAST(tot_c AS HUGEINT)), 0)
          |   FROM mc$k) AS num""".stripMargin
      }.mkString("\nUNION ALL\n")
      val labelUnion = (1 to LpGateMaxRounds).map(k =>
        s"SELECT $k AS depth, node, label FROM l$k")
        .mkString("\nUNION ALL\n")
      s"""WITH ${lpaPrologCtes()},
        |${lpaRoundCtes(LpGateMaxRounds)},
        |${modularityMcCtes(1 to LpGateMaxRounds)},
        |nums AS (
        |$numRows),
        |run AS (SELECT n.depth,
        |    (SELECT min(d2.depth) FROM nums d2 WHERE d2.depth <= n.depth
        |       AND d2.num = (SELECT max(d3.num) FROM nums d3
        |                     WHERE d3.depth <= n.depth)) AS best_at
        |  FROM nums n),
        |stopd AS (SELECT coalesce(min(depth), $LpGateMaxRounds) AS s
        |          FROM run WHERE depth - best_at >= $LpGatePatience),
        |kk AS (SELECT best_at AS k FROM run
        |       WHERE depth = (SELECT s FROM stopd)),
        |lab AS (
        |$labelUnion)
        |SELECT node, label, CAST((SELECT k FROM kk) AS INT) AS rounds
        |FROM lab WHERE depth = (SELECT k FROM kk)
        |ORDER BY node""".stripMargin
    },

    // kcore: KcoreMaxRounds peels unrolled — peeling is monotone and
    // idempotent at the fixpoint, so the operator's early-stopped loop
    // equals this fixed unroll whether or not the graph converged
    // inside the budget; the final census + >= k filter is replayed
    // verbatim.
    "q_kcore" -> {
      val rounds = (1 to KcoreMaxRounds).map { i =>
        val prev = s"u${i - 1}"
        s"""d$i AS (SELECT node, count(*) AS degree FROM (
          |    SELECT u AS node FROM $prev
          |    UNION ALL SELECT v AS node FROM $prev) GROUP BY 1),
          |u$i AS (SELECT pe.u, pe.v FROM $prev pe
          |  JOIN d$i da ON pe.u = da.node
          |  JOIN d$i db ON pe.v = db.node
          |  WHERE da.degree >= $KcoreK AND db.degree >= $KcoreK)""".stripMargin
      }.mkString(",\n")
      s"""WITH $LrLiCte,
        |e AS (SELECT a.l_partkey AS src, b.l_partkey AS dst
        |      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |        AND a.l_partkey <> b.l_partkey),
        |nodes AS (SELECT p_partkey AS node FROM part),
        |u0 AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |       FROM e
        |       WHERE least(src, dst) IN (SELECT node FROM nodes)
        |         AND greatest(src, dst) IN (SELECT node FROM nodes)),
        |$rounds
        |SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
        |  SELECT u AS node FROM u$KcoreMaxRounds
        |  UNION ALL SELECT v AS node FROM u$KcoreMaxRounds) GROUP BY 1
        |HAVING count(*) >= $KcoreK
        |ORDER BY node""".stripMargin
    },

    // q_cooccur's pair CTEs chained into q_linkrank's rounds at term
    // grain (VARCHAR nodes), then the rank window — rank CAST AS INT
    // (DuckDB row_number is BIGINT, Spark's is int).
    "q_textrank" -> {
      val teleport = (LrDampDen - LrDampNum) * LrBase / LrDampDen
      val rounds = (1 to LrIters).map { i =>
        val prev = s"m${i - 1}"
        s"""i$i AS (SELECT e.dst AS node,
          |    CAST(sum((m.mass * e.weight) // o.w_out) AS BIGINT) AS in_mass
          |  FROM e JOIN $prev m ON e.src = m.node JOIN o ON e.src = o.src
          |  GROUP BY 1),
          |d$i AS (SELECT CAST(coalesce(sum(m.mass), 0) AS BIGINT) AS dang
          |  FROM $prev m LEFT JOIN o ON m.node = o.src
          |  WHERE o.src IS NULL),
          |m$i AS (SELECT n.node,
          |    CAST($teleport + ($LrDampNum * (coalesce(s.in_mass, 0)
          |      + (SELECT dang FROM d$i) // (SELECT n FROM nn)))
          |      // $LrDampDen AS BIGINT) AS mass
          |  FROM nodes n LEFT JOIN i$i s ON n.node = s.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |pos AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i
        |        FROM toks),
        |pr AS (SELECT least(a.w, b.w) AS w1, greatest(a.w, b.w) AS w2
        |       FROM pos a JOIN pos b
        |         ON a.doc_id = b.doc_id AND b.i > a.i AND b.i <= a.i + 3),
        |pc AS (SELECT w1, w2, count(*) AS pair_cnt FROM pr
        |       GROUP BY 1, 2 HAVING count(*) >= 2),
        |e AS (SELECT w1 AS src, w2 AS dst, pair_cnt AS weight FROM pc
        |      UNION ALL
        |      SELECT w2 AS src, w1 AS dst, pair_cnt AS weight FROM pc),
        |o AS (SELECT src, CAST(sum(weight) AS BIGINT) AS w_out
        |      FROM e GROUP BY 1),
        |nodes AS (SELECT DISTINCT w AS node FROM pos),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |m0 AS (SELECT node, CAST($LrBase AS BIGINT) AS mass FROM nodes),
        |$rounds
        |SELECT CAST(row_number() OVER (ORDER BY mass DESC, node) AS INT)
        |    AS rank,
        |  node AS term, mass
        |FROM m$LrIters
        |ORDER BY mass DESC, term LIMIT 30""".stripMargin
    }
  )
}
