package graft

import graft.pipeline.Curation
import org.apache.spark.sql.functions._

/** The composed curation DAG: each planted defect falls out at its own
  * stage, the funnel counts agree, and the output partitions cleanly.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val benchText =
    "the physics question is about the speed of light and the mass of the sun"

  // planted corpus: 1 keeps; 2 exact-dups 1; 3 near-dups 1; 4 keeps;
  // 5 is low quality (shortest, no stopwords); 6 copies the benchmark
  private def corpus = Seq(
    (1L, "the cat and the dog ran in the park with the red ball", "en"),
    (2L, "the cat and the dog ran in the park with the red ball", "en"),
    (3L, "the cat and the dog ran in the park with the red ball quickly", "en"),
    (4L, "a completely different document about weather patterns and the annual rainfall in the mountains", "en"),
    (5L, "zzz qqq xxx yyy", "en"),
    (6L, benchText, "en"))
    .toDF("doc_id", "text", "lang")

  private def benchmark = Seq((100L, benchText, "en"))
    .toDF("doc_id", "text", "lang")

  test("curate: every planted defect falls out at its own stage") {
    val (curated, report) = Curation.curate(corpus, benchmark)
    val stages = report.orderBy("stage_idx")
      .as[(Int, String, Long)].collect().toSeq
    // 6 in; 2 and 3 fold into 1's cluster (exact + near dup); 5 drops at
    // the per-lang median gate (strictly lowest score of the 4
    // survivors); 6 drops contaminated; splits partition the final 2
    // split literals are deterministic: md5("1")='c4ca', md5("4")='a87f',
    // both < 'cccc' (the 80% bucket) -> both survivors route to train
    assert(stages.map(s => s._2 -> s._3).toMap == Map(
      "input" -> 6L, "near_dup_kept" -> 4L, "quality_kept" -> 3L,
      "decontaminated" -> 2L,
      "train" -> 2L, "val" -> 0L, "test" -> 0L))
    val rows = curated
      .select("doc_id", "canonical_id", "split")
      .as[(Long, Long, String)].collect().toSeq
    assert(rows.map(_._1).toSet == Set(1L, 4L), s"survivors: $rows")
    assert(rows.forall(r => Set("train", "val", "test")(r._3)))
    // survivors are their own canonical (only canonicals survive dedup)
    assert(rows.forall(r => r._1 == r._2))
  }

  test("curate with classifier stage: a planted model-flagged doc falls " +
    "out at classifier_kept; weights=None leaves the funnel unchanged") {
    // Train the is-English model on a corpus where non-English docs use a
    // disjoint vocabulary — the planted defect (7: 'fr' vocabulary but
    // mislabeled lang='en') passes the near-dup and quality stages, then
    // drops ONLY at the classifier stage.
    val frText = "le chien et le chat dans le parc avec le ballon rouge le matin"
    val trainDocs = corpus.unionByName(
      Seq((7L, frText, "en"), // mislabeled: model sees 'fr' vocabulary
          (8L, frText, "fr"), (9L, frText, "fr"), (10L, frText, "fr"))
        .toDF("doc_id", "text", "lang"))
    val wRows = graft.ops.Classifier.fit(trainDocs, col("lang") === "en",
      dim = 16, iters = 10, lr = 0.5).collect()
    val w = new Array[Double](wRows.length)
    wRows.foreach(r => w(r.getInt(0)) = r.getDouble(1))
    // curate the en-labeled subset (7 included) with the heuristic gate
    // OPEN (p=0.01 ⇒ rank ⌈p·n⌉ = 1 ⇒ threshold = the min score — a
    // real group element, exact on both engines — so everything keeps): without the
    // classifier the mislabeled doc SURVIVES to the split...
    val enDocs = trainDocs.filter(col("lang") === "en")
    val (plainOut, plainReport) = Curation.curate(enDocs, benchmark,
      qualityP = 0.01)
    val plain = plainReport.as[(Int, String, Long)].collect()
      .map(s => s._2 -> s._3).toMap
    assert(!plain.contains("classifier_kept"),
      "weights=None must not add a funnel stage")
    assert(plainOut.filter(col("doc_id") === 7L).count() == 1,
      "the mislabeled doc passes the heuristic stages")
    // ...with it, the doc drops exactly at classifier_kept
    val (clsOut, clsReport) = Curation.curate(enDocs, benchmark,
      qualityP = 0.01, classifierWeights = Some(w))
    val cls = clsReport.orderBy("stage_idx")
      .as[(Int, String, Long)].collect().toSeq
    assert(cls.map(_._2) == Seq("input", "near_dup_kept", "quality_kept",
      "classifier_kept", "decontaminated", "train", "val", "test"),
      s"funnel stages: ${cls.map(_._2)}")
    val byStage = cls.map(s => s._2 -> s._3).toMap
    assert(byStage("classifier_kept") == byStage("quality_kept") - 1,
      s"exactly the planted doc drops at the classifier: $byStage")
    assert(clsOut.filter(col("doc_id") === 7L).count() == 0,
      "the mislabeled doc must not survive the model filter")
    // stages upstream of the new one are untouched by the extra stage
    Seq("input", "near_dup_kept", "quality_kept").foreach { st =>
      assert(byStage(st) == plain(st), s"$st changed with classifier on")
    }
  }

  test("curateBatch: each planted ingest defect falls out at its own " +
    "stage against the persisted artifacts") {
    import graft.ops.text.{Corpus, Dedup, TextStats}
    val corp = Seq(
      (10L, "the cat and the dog ran in the park with the red ball", "en"),
      (12L, "the fox and the hen sat in the barn with the old hat", "en"))
      .toDF("doc_id", "text", "lang")
    val goodText = "the weather in the mountains is mild and the rain " +
      "falls in the valley near the lake"
    val batch = Seq(
      (21L, goodText, "en"),                 // accepted
      (23L, goodText, "en"),                 // exact within-batch dup -> drop
      (25L, "the cat and the dog ran in the park with the red ball quickly",
        "en"),                               // near-dups corpus 10 -> drop
      (27L, "zzz qqq xxx yyy", "en"),        // below the corpus bar -> drop
      (29L, benchText, "en"))                // benchmark copy -> drop
      .toDF("doc_id", "text", "lang")
    val registry = Dedup.signatureTable(corp, k = 32, bands = 8)
    val thresholds = Corpus.quantileThresholds(
      TextStats.qualityScore(corp, Seq("lang")),
      "quality_score", "lang", p = 0.5)
    val (accepted, report) = Curation.curateBatch(
      batch, corp, registry, thresholds, benchmark)
    val stages = report.orderBy("stage_idx")
      .as[(Int, String, Long)].collect().toSeq
    assert(stages.map(s => s._2 -> s._3) == Seq(
      "input" -> 5L, "exact_kept" -> 4L, "near_dup_kept" -> 3L,
      "quality_kept" -> 2L, "accepted" -> 1L), s"funnel: $stages")
    assert(accepted.select("doc_id").as[Long].collect().toSeq == Seq(21L))
  }

  test("curateBatch domain gate: a blocklisted-domain doc drops at " +
    "domain_kept BEFORE any content stage; an unknown domain passes; " +
    "decisions=None leaves the funnel shape and results unchanged") {
    import graft.ops.text.{Corpus, Dedup, TextStats, Domains}
    val corp = Seq(
      (10L, "the cat and the dog ran in the park with the red ball",
        "en", "https://mirror1.com/a"),
      (12L, "the fox and the hen sat in the barn with the old hat",
        "en", "https://farm2.net/b"))
      .toDF("doc_id", "text", "lang", "url")
    val goodText = "the weather in the mountains is mild and the rain " +
      "falls in the valley near the lake"
    val batch = Seq(
      (21L, goodText, "en", "https://fresh9.org/x"), // unknown -> passes
      (23L, "the snow on the hills is deep and the wind blows over the " +
        "ridge near the cabin", "en", "https://www.mirror1.com/y"))
      .toDF("doc_id", "text", "lang", "url")
    val registry = Dedup.signatureTable(corp, k = 32, bands = 8)
    val thresholds = Corpus.quantileThresholds(
      TextStats.qualityScore(corp, Seq("lang")),
      "quality_score", "lang", p = 0.5)
    val dec = Domains.domainDecisions(Domains.domainStats(corp),
      blocklist = Seq("mirror1.com"))
    val (accepted, report) = Curation.curateBatch(
      batch, corp, registry, thresholds, benchmark,
      domainDecisions = Some(dec))
    val stages = report.orderBy("stage_idx")
      .as[(Int, String, Long)].collect().toSeq
    assert(stages.map(_._2) == Seq("input", "domain_kept", "exact_kept",
      "near_dup_kept", "quality_kept", "accepted"), s"funnel: $stages")
    val byStage = stages.map(s => s._2 -> s._3).toMap
    assert(byStage("input") == 2L && byStage("domain_kept") == 1L,
      s"exactly the blocklisted-domain doc drops at the gate: $byStage")
    assert(accepted.select("doc_id").as[Long].collect().toSeq == Seq(21L),
      "the unknown-domain doc must pass the gate and be accepted")
    // None leaves the default funnel: both docs enter the content stages
    val (_, plain) = Curation.curateBatch(
      batch, corp, registry, thresholds, benchmark)
    val p = plain.orderBy("stage_idx").as[(Int, String, Long)]
      .collect().toSeq
    assert(p.map(_._2) == Seq("input", "exact_kept", "near_dup_kept",
      "quality_kept", "accepted"), "decisions=None must not add a stage")
    assert(p.map(s => s._2 -> s._3).toMap.apply("exact_kept") == 2L,
      "without the gate the blocklisted-domain doc reaches the content stages")
  }

  test("curate with a persisted dedup resolution equals the inline build") {
    import graft.ops.text.Dedup
    val canon = Dedup.resolveCanonical(corpus,
      Dedup.nearDupPairs(corpus, k = 32, bands = 8, threshold = 0.5))
    val (outA, repA) = Curation.curate(corpus, benchmark)
    val (outB, repB) = Curation.curate(corpus, benchmark,
      resolvedCanon = Some(canon))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(outA) == rows(outB) && rows(repA) == rows(repB),
      "the persisted-resolution path must be byte-equivalent")
    // the ARTIFACT form: resolutionRefresh commits the same resolution
    // as a Manifest snapshot, and curating from the committed version is
    // still byte-equivalent — train once, curate from the snapshot
    val dir = java.nio.file.Files.createTempDirectory("graft_canon").toString
    val table = s"$dir/resolution"
    val v = Dedup.resolutionRefresh(corpus, table, k = 32, bands = 8,
      threshold = 0.5)
    val (outC, repC) = Curation.curate(corpus, benchmark,
      resolvedCanon = Some(graft.io.Manifest.readVersion(spark, table, v)))
    assert(rows(outA) == rows(outC) && rows(repA) == rows(repC),
      "the Manifest-committed resolution must serve byte-equivalently")
  }

  test("curate report funnel is monotone and consistent with the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (curated, report) = Curation.curate(
      docs.filter(col("doc_id") % 97 =!= 0),
      docs.filter(col("doc_id") % 97 === 0))
    val byStage = report.as[(Int, String, Long)].collect()
      .map(s => s._2 -> s._3).toMap
    assert(byStage("input") >= byStage("near_dup_kept"))
    assert(byStage("near_dup_kept") >= byStage("quality_kept"))
    assert(byStage("quality_kept") >= byStage("decontaminated"))
    assert(byStage("train") + byStage("val") + byStage("test") ==
      byStage("decontaminated"))
    assert(curated.count() == byStage("decontaminated"))
    // leakage safety: any surviving near-twins share their split (keyed
    // on the canonical id by construction)
    val perCanon = curated.groupBy("canonical_id")
      .agg(countDistinct("split").as("n"))
      .agg(max("n")).as[Long].head()
    assert(perCanon <= 1L)
  }

  test("curate with a token budget: the budget stage cuts between " +
    "decontamination and the split, splits partition the budgeted set") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (curated, report) = Curation.curate(
      docs.filter(col("doc_id") % 97 =!= 0),
      docs.filter(col("doc_id") % 97 === 0),
      tokenBudget = Some(300L))
    val byStage = report.as[(Int, String, Long)].collect()
      .map(s => s._2 -> s._3).toMap
    assert(byStage.contains("budget_kept"), s"funnel: $byStage")
    assert(byStage("decontaminated") >= byStage("budget_kept"))
    assert(byStage("budget_kept") > 0, "a 300-token budget keeps something")
    assert(byStage("budget_kept") < byStage("decontaminated"),
      "a 300-token budget cuts something at this corpus size")
    assert(byStage("train") + byStage("val") + byStage("test") ==
      byStage("budget_kept"))
    assert(curated.count() == byStage("budget_kept"))
  }
}
