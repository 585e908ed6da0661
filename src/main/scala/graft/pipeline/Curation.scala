package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.text.{Corpus, Dedup, TextStats}

/** The composed LLM-corpus curation pipeline — the end-to-end DAG a
  * training-data team actually runs, assembled from the operator
  * families the way [[Incremental]]/[[Daily]] compose the reference's
  * warehouse surface:
  *
  *   1. near-duplicate dedup (MinHash-LSH pairs → connected components →
  *      survivorship; exact duplicates are jaccard-1 pairs, so one pass
  *      covers both),
  *   2. per-language quality gate (heuristic blend scored per doc, keep
  *      at or above the language's p-quantile — a discrete threshold,
  *      so the gate is engine-portable),
  *   2b. OPTIONAL model-based filter (the GPT-3/LLaMA-style second
  *      pass): score the gate's survivors under trained
  *      [[graft.ops.Classifier]] weights — pure map work, stream-proven
  *      — and keep docs at or above the probability floor,
  *   3. benchmark decontamination (n-gram overlap against the held-out
  *      eval set),
  *   3b. OPTIONAL token-budget selection (the data-constrained step:
  *      per language keep the best whole score-classes of the cleaned
  *      survivors until `tokenBudget` tokens fill —
  *      [[graft.ops.text.Corpus.tokenBudgetSelect]]),
  *   4. leakage-safe train/val/test split (keyed on the near-dup
  *      CANONICAL id from stage 1, so near-twins never straddle splits).
  *
  * Returns the curated corpus (with canonical id, quality score, and
  * split) plus a stage-count report — the per-stage funnel the curation
  * dashboard shows, and the contract the DuckDB oracle verifies
  * end-to-end (q_curation_report replays the ENTIRE DAG in SQL).
  *
  * Scale posture: every stage is an already-audited operator (see each
  * op's scaladoc); the composition adds no new shuffles beyond theirs.
  * The internally-built canonical-id table is pinned — three downstream
  * stages and the report read it, and it is the product of the
  * pipeline's most expensive stage (a caller-provided resolvedCanon is
  * the caller's to persist). Session-owned lifetime, as with the other
  * pinned operator intermediates (on a real deployment it is the
  * persisted dedup-resolution table).
  */
object Curation {

  /** Run the full curation DAG. `documents` is the training corpus,
    * `benchmark` the held-out eval set to decontaminate against.
    * Returns (curated, report): curated = (doc_id, lang, canonical_id,
    * quality_score, split) for every surviving document; report = one
    * row per funnel stage (stage_idx, stage, n_docs).
    *
    * Pins its internally-built intermediates (canonical ids when not
    * provided, gate survivors, the curated output) for the funnel's
    * repeated reads; a PROVIDED `resolvedCanon` is read as-is — its
    * persistence (and the replay cost of not persisting it) is the
    * caller's. A driver looping
    * curate() over many corpora must release them once the report and
    * curated output are consumed — `graft.CacheScope.release(spark)`
    * (or `spark.catalog.clearCache()`) between corpora — or the pinned
    * executor blocks accumulate for the life of the session.
    */
  def curate(documents: DataFrame, benchmark: DataFrame,
             qualityP: Double = 0.5, ngram: Int = 3, minOverlap: Int = 2,
             trainPct: Int = 80, valPct: Int = 10,
             classifierWeights: Option[Array[Double]] = None,
             classifierMin: Double = 0.5,
             resolvedCanon: Option[DataFrame] = None,
             tokenBudget: Option[Long] = None): (DataFrame, DataFrame) = {
    // 1. near-dup resolution (covers exact dups too: identical docs are
    //    jaccard-1 pairs). k/bands pinned EXPLICITLY to the oracle
    //    contract (minhashPairCtes replays 32 signatures in 8 bands of
    //    4) — the operator default differs, and a banding mismatch makes
    //    moderate-jaccard candidate sets engine-dependent.
    //    `resolvedCanon` short-circuits the stage with a PERSISTED
    //    resolution table — the 100 TB deployment shape, where the dedup
    //    resolution materializes once and every curation run reads it
    //    (must be Dedup.resolveCanonical output over `documents` under
    //    the same banding; results are identical either way). A provided
    //    table is NOT pinned: the caller owns its persistence, and
    //    pinning it would let the documented release() boundary
    //    unpersist the caller's own table between corpora.
    val canon = resolvedCanon.getOrElse {
      val pairs = Dedup.nearDupPairs(documents, k = 32, bands = 8,
        threshold = 0.5)
      graft.CacheScope.pin(Dedup.resolveCanonical(documents, pairs))
    }
    // few-fat-files spread ONCE for every map-heavy consumer (r18 — the
    // shingleSets idiom at the pipeline head): un-spread, the quality
    // regex pass, the classifier scoring pass, and the decontamination
    // shingle pass each fuse into the corpus scan's own partitioning —
    // at fixture file counts, three ~3 s single-task serial walls that
    // were most of the funnel's wall (Prof, OPTIMIZATION_r18.md). The
    // spread's doc_id key is also every downstream join's key.
    val docs = documents.repartition(
      documents.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
    val kept1 = docs
      .join(canon.filter(col("is_kept")).select("doc_id", "canonical_id"),
        "doc_id")
    // 2. per-language quality gate at the p-quantile
    val gated = Corpus.quantileGate(
      TextStats.qualityScore(kept1, Seq("lang", "canonical_id")),
      "quality_score", "lang", qualityP)
    // pinned: stage-2's count and the two downstream stages all read it
    // (n_tokens rides along for the optional budget stage; dropped from
    // the curated output)
    val kept2 = graft.CacheScope.pin(gated.filter(col("is_kept"))
      .select("doc_id", "lang", "canonical_id", "quality_score", "n_tokens"))
    // 2b. optional model-based filter: score the gate survivors under the
    //     trained weights (one map pass; the label column only feeds the
    //     diagnostic y output, so serving passes a constant predicate)
    //     and keep probability >= classifierMin. Pinned like kept2: the
    //     funnel row and the downstream stages re-read it.
    val kept2c = classifierWeights match {
      case Some(w) =>
        val scored = graft.ops.Classifier.score(
          kept2.join(docs.select("doc_id", "text"), "doc_id"),
          lit(false), w, dim = w.length - 1)
        graft.CacheScope.pin(kept2.join(
          scored.filter(col("score") >= classifierMin).select("doc_id"),
          "doc_id"))
      case None => kept2
    }
    // 3. benchmark decontamination over the survivors
    val dec = Corpus.decontaminate(
      kept2c.join(docs.select("doc_id", "text"), "doc_id"),
      benchmark, ngram, minOverlap)
    val kept3 = kept2c
      .join(dec.filter(!col("contaminated")).select("doc_id"), "doc_id")
    // 3b. OPTIONAL token-budget stage: per language keep the best whole
    //     score-classes of the decontaminated survivors until `budget`
    //     tokens fill — the data-constrained selection step between
    //     cleaning and splitting (pinned like kept2c: the funnel row
    //     and the split both read it)
    val kept3b = tokenBudget match {
      case Some(b) =>
        graft.CacheScope.pin(
          Corpus.tokenBudgetSelect(kept3, "quality_score", "n_tokens",
            "lang", b)
            .filter(col("is_kept"))
            .select("doc_id", "lang", "canonical_id", "quality_score",
              "n_tokens"))
      case None => kept3
    }
    // 4. leakage-safe split on the stage-1 canonical
    // pinned: the funnel report reads it four times (stage 3 + three
    // split rows) and the caller consumes it after — without the pin
    // the decontamination join and gate subtrees replay per read
    val curated = graft.CacheScope.pin(Corpus.hashSplit(kept3b,
      idCol = "canonical_id", trainPct = trainPct, valPct = valPct)
      .select("doc_id", "lang", "canonical_id", "quality_score", "split"))
    def stage(i: Int, name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(i).as("stage_idx"), lit(name).as("stage"), col("n_docs"))
    val funnel =
      Seq(("input", documents), ("near_dup_kept", kept1),
        ("quality_kept", kept2)) ++
      (if (classifierWeights.isDefined) Seq(("classifier_kept", kept2c))
       else Nil) ++
      // without a budget stage, hashSplit is 1:1 with kept3 so the
      // pinned curated output doubles as the decontaminated count;
      // with one, kept3 is counted directly (one extra pass over the
      // pinned kept2c) and budget_kept = curated
      (if (tokenBudget.isDefined)
        Seq(("decontaminated", kept3), ("budget_kept", curated))
       else Seq(("decontaminated", curated))) ++
      Seq(("train", curated.filter(col("split") === "train")),
        ("val", curated.filter(col("split") === "val")),
        ("test", curated.filter(col("split") === "test")))
    val report = funnel.zipWithIndex
      .map { case ((name, df), i) => stage(i, name, df) }
      .reduce(_ unionByName _)
    (curated, report)
  }

  /** INGEST-time curation — the steady-state DAG an accepted corpus
    * runs on every incoming batch, where [[curate]] is the one-time
    * corpus-wide pass: every expensive stage reads a PERSISTED artifact
    * instead of recomputing it, so per-batch cost is O(batch +
    * candidates) regardless of corpus size:
    *
    *   0. (optional, r17) served DOMAIN gate
    *      ([[graft.ops.text.Domains.domainGateWith]] against a
    *      committed decision table — C4/RefinedWeb's pre-content
    *      filter: one broadcast dim join drops every doc from a
    *      blocklisted/dup-farmed/low-quality domain BEFORE any
    *      per-document work is spent; unknown domains pass),
    *   1. within-batch exact dedup ([[Dedup.exactDedup]] fingerprints,
    *      keep-first by doc_id),
    *   2. cross-corpus near-dup drop ([[Dedup.nearDupAgainstSigs]]
    *      probing the committed signature `registry` — only the batch
    *      is signed; corpus text is touched for candidate ids alone),
    *   3. served quality gate ([[Corpus.quantileGateWith]] against the
    *      committed `thresholds` — the REFERENCE distribution's bar, so
    *      a low-quality batch can never lower its own bar; unknown
    *      strata drop),
    *   4. benchmark decontamination (n-gram overlap, as in [[curate]]).
    *
    * Returns (accepted, report): accepted = (doc_id, lang,
    * quality_score) batch survivors; report = the 5-row ingest funnel
    * (input, exact_kept, near_dup_kept, quality_kept, accepted; with
    * the domain gate a `domain_kept` row follows `input`). On
    * acceptance the caller closes the maintenance loop —
    * `Dedup.signatureUpdate(table, accepted batch)` commits the next
    * registry version ([[graft.ops.text.Dedup.signatureRetract]] is
    * the delete side). Every stage is batch-sized map/join work against
    * broadcast or candidate-pruned relations — the identical call
    * shapes are the stream-proven ones where stages allow (gate,
    * decontamination), so this is also the foreachBatch body of a
    * streaming ingest.
    */
  def curateBatch(batch: DataFrame, corpus: DataFrame, registry: DataFrame,
                  thresholds: DataFrame, benchmark: DataFrame,
                  k: Int = 32, bands: Int = 8, dupThreshold: Double = 0.5,
                  ngram: Int = 3, minOverlap: Int = 2,
                  domainDecisions: Option[DataFrame] = None,
                  urlCol: String = "url")
  : (DataFrame, DataFrame) = {
    // 0. (optional) served domain gate — before any per-document work.
    // The decision table is pinned: it is domain-cardinality, and every
    // downstream funnel leg re-references the gate — without the pin an
    // INLINE-built decision table (stats rollup + window) would recompute
    // under each re-reference (the served Manifest path reads parquet
    // either way).
    // few-fat-files spread at the batch head (r18 — see curate()): the
    // exact-dedup fingerprint pass, the quality regex pass, and the
    // decontamination shingle pass otherwise fuse into the batch scan's
    // own partitioning and run serially at fixture file counts.
    val batchSpread = batch.repartition(
      batch.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
    val kept0 = domainDecisions match {
      case Some(dec) => graft.CacheScope.pin(
        graft.ops.text.Domains.domainGateWith(batchSpread,
          graft.CacheScope.pin(dec), urlCol)
          .drop("domain"))
      case None => batchSpread
    }
    // 1. within-batch exact dedup (keep-first)
    val kept1 = graft.CacheScope.pin(kept0.join(
      Dedup.exactDedup(kept0).select(col("keep_doc_id").as("doc_id")),
      "doc_id"))
    // 2. cross-corpus near-dup drop through the persisted registry
    val pairs = Dedup.nearDupAgainstSigs(registry, corpus, kept1,
      k = k, bands = bands, threshold = dupThreshold)
    val kept2 = graft.CacheScope.pin(kept1.join(
      pairs.select(col("doc_inc").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti"))
    // 3. served quality gate against the reference thresholds
    val gated = Corpus.quantileGateWith(
      TextStats.qualityScore(kept2, Seq("lang")),
      thresholds, "quality_score", "lang")
    val kept3 = graft.CacheScope.pin(gated.filter(col("is_kept"))
      .select("doc_id", "lang", "quality_score"))
    // 4. decontamination over the survivors
    val dec = Corpus.decontaminate(
      kept3.join(batchSpread.select("doc_id", "text"), "doc_id"),
      benchmark, ngram, minOverlap)
    val accepted = graft.CacheScope.pin(kept3.join(
      dec.filter(!col("contaminated")).select("doc_id"), "doc_id"))
    def stage(i: Int, name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(i).as("stage_idx"), lit(name).as("stage"), col("n_docs"))
    val report = (Seq(("input", batch)) ++
      (if (domainDecisions.isDefined) Seq(("domain_kept", kept0)) else Nil) ++
      Seq(("exact_kept", kept1), ("near_dup_kept", kept2),
        ("quality_kept", kept3), ("accepted", accepted)))
      .zipWithIndex
      .map { case ((name, df), i) => stage(i, name, df) }
      .reduce(_ unionByName _)
    (accepted, report)
  }
}
