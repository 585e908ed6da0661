package graft

import java.nio.file.Files

import graft.datagen.DataGen
import graft.pipeline.Incremental
import org.apache.spark.sql.functions._

/** Plan-shape regression guards: catch scale hazards at spec time, before
  * they reach a cluster.
  */
class PlanGuardSpec extends SparkSpec {

  /** Queries whose plans legitimately contain a broadcast cross join: a
    * provably tiny build side scanned linearly against the corpus (the
    * brute-force similarity baseline, its self-kNN label audit, and
    * IVF/LSH centroid assignment — documented designs, not accidents),
    * the constant-size 1-row-counts × k-row-steps unpivot of the two
    * funnels, q_distinct_terms' 1-row corpus-count scalar joined to
    * every score, the gap-fill grid's |types| × 1-row-bounds build
    * (skewAudit's pattern, also inside q_rate_anomaly), and the
    * histogram's 1-row bounds broadcast over the value scan.
    */
  private val allowedCross =
    // q_ann_recall composes bruteForceTopK (the documented deliberate
    // broadcast linear scan, as in q_similarity_topk) as its exact side
    // q_contrastive's positives ride the brute self-search baseline
    Set("q_similarity_topk", "q_contrastive", "q_contrastive_ann",
      "q_ann_recall", "q_ann_ivf", "q_ann_lsh",
      "q_funnel",
      "q_funnel_chain", "q_distinct_terms", "q_skew_audit",
      "q_knn_label", "q_gapfill", "q_rate_anomaly", "q_histogram",
      "q_hist_drift",
      // q_ann_ivf's centroid cross-builds over the quantized table
      "q_ann_quantized",
      // the trained-cell serve: same broadcast k-row cell cross-build as
      // q_ann_ivf (router + assignment), over the quantized table
      "q_ann_ivf_trained",
      // drift monitor: 1-row occupancy totals broadcast over the k-row
      // cell relation (constant-size build, the skewAudit bounds shape)
      "q_embed_drift",
      // the probe-budget sweeps compose bruteForceTopK (the documented
      // broadcast linear-scan baseline) + constant-size 1-row × 1-row
      // aggregate cross-builds per config row (q_ivf_sweep adds the
      // k-row cell cross-builds of the q_ann_ivf family)
      "q_ann_sweep", "q_ivf_sweep",
      // the gap-fill grid build (types × 1-row bounds), like q_gapfill
      "q_forecast_backtest",
      // graph census: 1-row edge totals × 1-row node-side aggregate
      "q_graph_audit",
      // each linkRank round broadcasts its 1-row dangling-mass aggregate
      // over the node table (skewAudit's constant-size-build shape)
      "q_linkrank", "q_linkrank_seeded",
      // the residual-gated variant: same per-round 1-row dangling builds
      "q_linkrank_conv",
      // TextRank composes q_cooccur's 1-row totals build + the linkRank
      // dangling broadcasts
      "q_textrank",
      // the funnel-unpivot pattern: 1 counts row × |rules| constant build
      "q_expectations",
      // BM25's 1-row corpus-stats (N, sum dl) broadcast over postings
      "q_bm25",
      // the served twin: same 1-row stats build, read from the index
      "q_bm25_served",
      // RM3: two BM25 chains (first pass + weighted re-score) and the
      // 1-row n_docs build under the expansion selection
      "q_bm25_rm3",
      // the served twin: same 1-row builds, read from the index
      "q_rm3_served",
      // RRF fuses the BM25 chain (with its 1-row stats build) + raw tf
      "q_rrf",
      // the eval composes three BM25 truth chains — each carries q_bm25's
      // 1-row corpus-stats cross-build (the eval join itself is keyed)
      "q_retrieval_eval",
      // same three BM25 chains feed the miner (the anti-join and the
      // per-query re-rank window are keyed/eval-sized)
      "q_hard_negatives",
      // the coverage curve crosses the 1-row (n_types, total_cf) totals
      // into the 1-row cut aggregate (the corpus-stats pattern)
      "q_vocab_coverage",
      // modularity: the 1-row global (in_all, two_m, tot_sq) aggregate
      // crossed with the 1-row n_communities count, per labeling depth
      // (the q_graph_audit 1-row x 1-row census shape)
      "q_modularity",
      // lmScore's 1-row vocabulary-size scalar broadcast over the scored
      // bigram stream (BM25's corpus-stats pattern); the serve path
      // carries the same 1-row vocab cross from the model table
      "q_lm_score", "q_lm_serve", "q_lm_lines",
      // KN twins: the same 1-row scalar (types × vocab) cross-build
      "q_kn_score", "q_kn_lines",
      // the trigram tier carries the identical 1-row scalar cross-build
      "q_kn3_score", "q_kn3_lines",
      // ...as does the 5-gram tier (one scalar row regardless of order)
      "q_kn5_score", "q_kn5_lines",
      // the pruned twin scores through the same tree (same scalar cross)
      "q_kn5_pruned",
      // the drift instrument: both scorings' 1-row scalar builds plus
      // the final 1-row drift aggregate crossed with the 1-row
      // model-size counts (the q_graph_audit 1-row × 1-row census shape)
      "q_kn5_drift",
      // cooccurrence's 1-row (N positions, P pair slots) totals broadcast
      // over the pair-count table (the corpus-stats pattern again)
      "q_cooccur",
      // DSIR's two 1-row histogram totals broadcast into the dim-row
      // ratio table (the corpus-stats pattern)
      "q_dsir_score",
      // the 1-row quantile-threshold array broadcast over the value scan
      // (the equi-width histogram's bounds pattern)
      "q_hist_equidepth",
      // the recall audit's all-pairs exact truth over the FIXED eval
      // slice (documented eval-sized baseline, like q_knn_label) plus
      // its three 1-row count aggregates crossed into the result row
      "q_minhash_recall",
      // the same eval-sized truth cross + per-config 1-row count crosses
      "q_minhash_sweep",
      // the containment recall certificate: q_minhash_recall's shape at
      // the containment relation (eval-sized all-ordered-pairs truth +
      // 1-row count crosses) — and its maxDf grid
      "q_contain_recall", "q_contain_sweep",
      // the SimHash certificates: the same eval-sized all-pairs Hamming
      // truth cross + 1-row count crosses (per config for the sweep)
      "q_simhash_recall", "q_simhash_sweep",
      // the SNM certificate: eval-sized all-pairs Levenshtein truth
      // cross + 1-row count crosses (per window for the sweep)
      "q_snm_recall", "q_snm_sweep",
      // the noise-floor calibration: a caller-capped probe × sample
      // eval-slice cross (32×256 default, the q_knn_label shape) plus
      // the 1-row sample-count cross into the summary row
      "q_embed_noise")
  // NOTE: q_kmeans_assign / q_semantic_dedup no longer appear here — the
  // r8 literal-fold argmin removed the centroid crossJoin entirely, so
  // their plans must be join-free on the assignment side.

  test("no query plans a cartesian product or an unexpected nested-loop join") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      if (!allowedCross(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin — if intentional, allow-list it")
    }
  }

  test("q_kmeans_assign plans zero joins, windows, or hash shuffles (r8)") {
    // the literal-fold argmin must stay a pure projection: scan →
    // project → (range sort for the ORDER BY). Any Join/Window/hash
    // Exchange here means the centroid crossJoin crept back.
    val plan = SparkEntry.queries("q_kmeans_assign")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected hash shuffle:\n$plan")
  }

  test("fact table date partitioning prunes at the scan (S7)") {
    val root = Files.createTempDirectory("graft_prune").toString
    val landing = s"$root/landing"
    val wh = Incremental.Warehouse(s"$root/wh")
    DataGen.writeOrdersNdjson(spark, landing, n = 30, seed = 12L)
    Incremental.run(spark, landing, wh, "b1")
    val fact = spark.read.parquet(wh.factOrders)
    val aDate = fact.select("order_date").head().getDate(0)
    val q = fact.filter(col("order_date") === aDate)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [") &&
      scan.contains("order_date"),
      s"expected a partition filter on order_date in:\n$scan")
    // the filter must NOT appear as a data filter (it is a partition
    // column — pruned at listing, not scanned-and-filtered)
    val dataFilters = "DataFilters: \\[[^\\]]*\\]".r.findFirstIn(scan).getOrElse("")
    assert(!dataFilters.contains("order_date"),
      s"order_date leaked into data filters: $dataFilters")
  }
}
