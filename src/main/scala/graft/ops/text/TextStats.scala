package graft.ops.text

import graft.dec6
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextFns._

/** Text-analysis operators for the training-data pipeline surface
  * (builder prompt "Text analysis"): token stats, quality scoring,
  * language ID, document fingerprinting. All per-document map work —
  * no shuffle, scales linearly with document count.
  */
object TextStats {

  /** Token counting + basic shape stats per document. `avg_token_len`
    * derives from integer columns with one double division (cross-engine
    * deterministic; see graft.package rationale).
    */
  def tokenStats(documents: DataFrame): DataFrame = {
    // tokens staged as their own projection: inlining the split() would
    // re-tokenize the document once per referencing expression (see
    // Dedup.nearDupPairs).
    val toks = col("toks")
    documents
      .withColumn("toks", tokens(col("text")))
      .select(
        col("doc_id"),
        col("lang"),
        col("n_chars"),
        length(col("text")).as("text_len"),
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_distinct_tokens"),
        size(bpeTokens(col("text"))).as("n_bpe_tokens"),
        ((length(col("text")) - (size(toks) - lit(1))).cast("double") / size(toks))
          .as("avg_token_len"))
  }

  private val stopEn = "\\b(the|and|of|is|in|to|a)\\b"

  /** Quality scoring: length score, stopword ratio, punctuation density,
    * type-token ratio, blended into one deterministic double score.
    * Mirrors the common LLM-data quality heuristics (length/punct/stopword).
    */
  def qualityScore(documents: DataFrame,
                   passthrough: Seq[String] = Nil): DataFrame = {
    val toks = col("toks")
    val nTok = size(toks)
    val stopCnt = matchCount(col("text"), stopEn)
    val punctCnt = matchCount(col("text"), "[.,;:!?]")
    val ttr = size(array_distinct(toks)).cast("double") / nTok
    val stopRatio = stopCnt.cast("double") / nTok
    val lenScore = least(nTok.cast("double") / lit(100.0), lit(1.0))
    documents.withColumn("toks", tokens(col("text"))).select(
      col("doc_id") +: passthrough.map(col) :++ Seq(
        nTok.as("n_tokens"),
        stopCnt.as("stopword_cnt"),
        punctCnt.as("punct_cnt"),
        stopRatio.as("stopword_ratio"),
        ttr.as("type_token_ratio"),
        (lenScore * lit(0.5) + stopRatio * lit(0.3) + ttr * lit(0.2))
          .as("quality_score")): _*)
  }

  /** Character-distribution entropy per document — the classic gibberish /
    * boilerplate detector (natural prose sits near the language's
    * characteristic entropy; runs of one symbol, base64 blobs, and
    * keyboard mash sit far below or above it). Computed distributed:
    * explode characters, one (doc, char) count aggregate, then
    * -Σ p·log2(p) as a per-doc sum — two shuffles keyed on doc_id, both
    * map-side combinable, counts bounded by alphabet size per doc.
    *
    * log2 is a transcendental: its last ulp differs across libm builds,
    * so this column is NOT cross-engine hash-comparable (recorded oracle
    * rule) — the query ships with a rows-only check and the spec pins
    * exact values against the same JVM libm Spark uses.
    */
  def charEntropy(documents: DataFrame): DataFrame = {
    val counts = documents
      .select(col("doc_id"),
        explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("cnt"))
    val total = sum(col("cnt")).over(
      org.apache.spark.sql.expressions.Window.partitionBy("doc_id"))
    counts
      .withColumn("p", col("cnt").cast("double") / total)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("int").as("n_distinct_chars"),
        (-sum(col("p") * log(2.0, col("p")))).as("char_entropy_bits"))
  }

  /** Corpus-trained bigram LM document scoring — the CCNet
    * perplexity-filter shape (Wenzek et al., LREC 2020: score web text by
    * average token log-probability under a language model; low scores
    * flag gibberish, boilerplate, and OCR noise for removal or
    * down-sampling). The LM here is the corpus's own add-α-smoothed
    * bigram model: P(w₂|w₁) = (c(w₁w₂)+α) / (c(w₁)+α·V) with V the
    * corpus vocabulary size — self-trained scoring ranks documents by
    * in-corpus typicality, the same signal CCNet gets from a reference
    * LM without shipping one.
    *
    * `order` generalizes to n-gram models: P(wₙ|ctx) with the (n−1)-gram
    * context counts as denominator (order=2 ⇒ bigram/unigram, the
    * default; order=3 ⇒ trigram/bigram — closer to CCNet's 5-gram KenLM
    * in spirit, with the same smoothing).
    *
    * Output: (doc_id, n_bigrams, avg_logp) for EVERY input document —
    * docs with fewer than `order` tokens have no n-grams and carry
    * nulls. `avg_logp` is natural-log average token log-prob; callers
    * threshold or quantile-gate it (see [[graft.ops.text.Corpus]]
    * quantileGate).
    *
    * Cross-engine parity: probabilities are built from exact integer
    * counts with identical double arithmetic on both engines; `ln` is
    * libm-dependent at the last ulp, so the oracle-facing query compares
    * at the established stable 6-decimal rounding (charEntropy's
    * precedent).
    *
    * Scale posture (100 TB): two map-side-combinable count aggregates
    * (unigram, bigram) + one scalar vocab row; scoring is TWO equi-joins
    * of the per-position bigram stream against those count tables
    * (shuffle_hash — corpus-scale counts never broadcast) and one
    * combinable per-doc average. No windows, no all-pairs anywhere;
    * everything grows linearly with the token stream.
    */
  def lmScore(documents: DataFrame, alpha: Double = 0.4,
              order: Int = 2): DataFrame = {
    require(order >= 2, s"order=$order must be >= 2")
    val toks = documents.select(col("doc_id"), tokens(col("text")).as("t"))
    val grams = toks
      .select(col("doc_id"), explode(shingles(col("t"), order)).as("ng"))
      .withColumn("ctx", substring_index(col("ng"), " ", order - 1))
    // context counts over ALL (order-1)-gram positions (for order=2 this
    // is exactly the unigram count table)
    val ctxCounts = toks
      .select(explode(shingles(col("t"), order - 1)).as("cw"))
      .groupBy("cw").agg(count(lit(1)).as("c1"))
    val ngCounts = grams.groupBy("ng").agg(count(lit(1)).as("c2"))
    // smoothing mass is always over the UNIGRAM vocabulary (the
    // continuation word ranges over V regardless of order)
    val vocab = toks.select(explode(col("t")).as("w"))
      .agg(count_distinct(col("w")).as("v")) // 1 row — broadcast scalar
    val scored = grams
      .join(ngCounts.hint("shuffle_hash"), Seq("ng"))
      .join(ctxCounts.hint("shuffle_hash"), col("ctx") === col("cw"))
      .crossJoin(broadcast(vocab))
      .withColumn("logp",
        log((col("c2") + lit(alpha)) / (col("c1") + lit(alpha) * col("v"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_bigrams"),
        avg(col("logp")).as("avg_logp"))
    documents.select("doc_id").join(scored, Seq("doc_id"), "left")
  }

  /** Fit side of the [[lmScore]] split: the n-gram model's THREE count
    * relations as ONE persistable table — (kind 'ng'|'ctx'|'vocab', key,
    * cnt) — the artifact a pipeline trains once on a reference corpus
    * and serves everywhere (the dsirRatios / tokenizerRefresh pattern:
    * ship the model, not the training scan). Commit via [[lmRefresh]];
    * serve any committed version through [[lmScoreWith]].
    */
  def lmModel(documents: DataFrame, order: Int = 2): DataFrame = {
    require(order >= 2, s"order=$order must be >= 2")
    val toks = documents.select(col("doc_id"), tokens(col("text")).as("t"))
    val ng = toks.select(explode(shingles(col("t"), order)).as("key"))
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .select(lit("ng").as("kind"), col("key"), col("cnt"))
    val ctx = toks.select(explode(shingles(col("t"), order - 1)).as("key"))
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .select(lit("ctx").as("kind"), col("key"), col("cnt"))
    val v = toks.select(explode(col("t")).as("w"))
      .agg(count_distinct(col("w")).as("cnt"))
      .select(lit("vocab").as("kind"), lit("").as("key"), col("cnt"))
    ng.unionByName(ctx).unionByName(v)
  }

  /** Train-and-commit [[lmModel]] as a versioned Manifest snapshot —
    * returns the committed version (the resolutionRefresh idiom).
    */
  def lmRefresh(documents: DataFrame, table: String, order: Int = 2): Int =
    graft.io.Manifest.write(lmModel(documents, order), table)

  /** Serve side: score ANY documents under a persisted [[lmModel]] —
    * unlike self-trained [[lmScore]], grams the model never saw get the
    * smoothed floor (count → 0, P = α / (c1 + αV)) via LEFT joins
    * instead of silently dropping; on the model's own training corpus
    * every join hits and the output EQUALS lmScore bit-for-bit (the
    * oracle checks exactly that). Same scale posture as lmScore's
    * scoring half: two shuffle_hash equi-joins against the count
    * relations + one combinable per-doc average — the training scan is
    * gone, which is the point.
    */
  def lmScoreWith(documents: DataFrame, model: DataFrame,
                  alpha: Double = 0.4, order: Int = 2): DataFrame = {
    require(order >= 2, s"order=$order must be >= 2")
    val ngC = model.filter(col("kind") === "ng")
      .select(col("key").as("ng"), col("cnt").as("c2"))
    val ctxC = model.filter(col("kind") === "ctx")
      .select(col("key").as("cw"), col("cnt").as("c1"))
    val vocab = model.filter(col("kind") === "vocab")
      .select(col("cnt").as("v"))
    val toks = documents.select(col("doc_id"), tokens(col("text")).as("t"))
    val grams = toks
      .select(col("doc_id"), explode(shingles(col("t"), order)).as("ng"))
      .withColumn("ctx", substring_index(col("ng"), " ", order - 1))
    val scored = grams
      .join(ngC.hint("shuffle_hash"), Seq("ng"), "left")
      .join(ctxC.hint("shuffle_hash"), col("ctx") === col("cw"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("logp",
        log((coalesce(col("c2"), lit(0L)) + lit(alpha)) /
          (coalesce(col("c1"), lit(0L)) + lit(alpha) * col("v"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_bigrams"),
        avg(col("logp")).as("avg_logp"))
    documents.select("doc_id").join(scored, Seq("doc_id"), "left")
  }

  /** Per-LINE LM scoring under a served [[lmModel]] — CCNet's actual
    * filtering unit: the reference model scores each PARAGRAPH and the
    * pipeline drops the worst ones, keeping the document. Lines are
    * contiguous token runs, so every within-line n-gram also occurs in
    * its document — scoring lines under a model trained on the full
    * docs hits every join (the smoothed OOV floor still guards foreign
    * corpora). Output: (doc_id, pos, line, n_bigrams, avg_logp), NULL
    * score for lines shorter than `order` tokens; feed `avg_logp` to
    * [[graft.ops.text.Corpus.quantileGate]] for the keep/drop rule and
    * reassemble kept lines in `pos` order (the cleanLines shape).
    *
    * Scale posture: lmScoreWith's exactly — explode + two shuffle_hash
    * model joins + one combinable per-(doc, line) average; the group
    * key gains `pos`, nothing else changes.
    */
  def lmScoreLines(documents: DataFrame, model: DataFrame,
                   alpha: Double = 0.4, order: Int = 2,
                   delim: String = "\n"): DataFrame = {
    require(order >= 2, s"order=$order must be >= 2")
    val q = java.util.regex.Pattern.quote(delim)
    val ngC = model.filter(col("kind") === "ng")
      .select(col("key").as("ng"), col("cnt").as("c2"))
    val ctxC = model.filter(col("kind") === "ctx")
      .select(col("key").as("cw"), col("cnt").as("c1"))
    val vocab = model.filter(col("kind") === "vocab")
      .select(col("cnt").as("v"))
    val lines = documents
      .select(col("doc_id"), posexplode(split(col("text"), q))
        .as(Seq("pos", "line")))
    val grams = lines
      .select(col("doc_id"), col("pos"),
        explode(shingles(tokens(col("line")), order)).as("ng"))
      .withColumn("ctx", substring_index(col("ng"), " ", order - 1))
    val scored = grams
      .join(ngC.hint("shuffle_hash"), Seq("ng"), "left")
      .join(ctxC.hint("shuffle_hash"), col("ctx") === col("cw"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("logp",
        log((coalesce(col("c2"), lit(0L)) + lit(alpha)) /
          (coalesce(col("c1"), lit(0L)) + lit(alpha) * col("v"))))
      .groupBy("doc_id", "pos")
      .agg(count(lit(1)).cast("int").as("n_bigrams"),
        avg(col("logp")).as("avg_logp"))
    lines.join(scored, Seq("doc_id", "pos"), "left")
  }

  /** Interpolated Kneser–Ney bigram model — the smoothing KenLM (hence
    * CCNet's actual reference filter) uses, where [[lmScore]]'s add-α is
    * the teaching-grade baseline: absolute discounting plus a
    * CONTINUATION unigram (how many distinct contexts a word follows —
    * "Francisco" is frequent but only ever follows "San", so its
    * continuation mass is tiny and the model stops over-rewarding it in
    * novel contexts). All quantities are exact integer counts:
    *
    *   - `bi`    (key = bigram, cnt = c(vw))
    *   - `ctx`   (key = v, cnt = c(v·) positions, cnt2 = N1+(v·) distinct followers)
    *   - `np`    (key = w, cnt = N1+(·w) distinct preceders)
    *   - `types` (cnt = distinct bigram types), `vocab` (cnt = |V|)
    *
    * one kind-tagged relation (the [[lmModel]] idiom, plus a `cnt2`
    * column so the serve side pays ONE join for the two context
    * statistics). c(v) here is the bigram-CONTEXT count (positions
    * 1..n−1, so Σ_w c(vw) = c(v) — the identity discounting needs),
    * not lmScore's all-positions unigram count. Three combinable count
    * aggregates + two scalar rows; commit via [[knRefresh]], serve any
    * version through [[knScoreWith]].
    */
  def knModel(documents: DataFrame): DataFrame = {
    // inline tokenize per count branch, deliberately: both a pinned
    // toks AND a shared repartitioned toks were measured SLOWER at
    // sf0.1 (cache reads / exchange barriers lose to the concurrent
    // fused scan→tokenize→partial-agg pipelines the branches get when
    // left alone; r17 non-win, do not re-litigate). r18 re-litigated
    // two more shapes and REFUTED both (OPTIMIZATION_r18.md): (a)
    // deriving ctx/np/types as exact rollups of the gram-count
    // aggregate — neutral at sf0.1 (Prof build/optimize/execute all
    // within noise) because consumer-specific column pruning
    // de-canonicalizes the shared gram aggregate, so runtime
    // ReuseExchange consolidates almost nothing (2 of ~11 candidate
    // reuses fired; executed q_kn5_drift plan kept all 44 scans); (b)
    // CacheScope-pinning the assembled kn5Model for the drift
    // instrument — 29–59 s/rep vs 6.2 s baseline even WITH the r17
    // broadcast hints (cache materialization serializes the branch
    // pipelines and the cached union defeats kind-filter constant
    // folding on every one of the 11 consumer references).
    val toks = documents.select(col("doc_id"), tokens(col("text")).as("t"))
    val grams = toks.select(explode(shingles(col("t"), 2)).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
    val bi = grams.groupBy("bg").agg(count(lit(1)).as("cnt"))
      .select(lit("bi").as("kind"), col("bg").as("key"), col("cnt"),
        lit(null).cast("long").as("cnt2"))
    val ctx = grams.groupBy("w1")
      .agg(count(lit(1)).as("cnt"), count_distinct(col("w2")).as("cnt2"))
      .select(lit("ctx").as("kind"), col("w1").as("key"), col("cnt"),
        col("cnt2"))
    val np = grams.groupBy("w2")
      .agg(count_distinct(col("w1")).as("cnt"))
      .select(lit("np").as("kind"), col("w2").as("key"), col("cnt"),
        lit(null).cast("long").as("cnt2"))
    val types = grams.agg(count_distinct(col("bg")).as("cnt"))
      .select(lit("types").as("kind"), lit("").as("key"), col("cnt"),
        lit(null).cast("long").as("cnt2"))
    val v = toks.select(explode(col("t")).as("w"))
      .agg(count_distinct(col("w")).as("cnt"))
      .select(lit("vocab").as("kind"), lit("").as("key"), col("cnt"),
        lit(null).cast("long").as("cnt2"))
    bi.unionByName(ctx).unionByName(np).unionByName(types).unionByName(v)
  }

  /** Train-and-commit [[knModel]] as a versioned Manifest snapshot —
    * returns the committed version (the lmRefresh idiom).
    */
  def knRefresh(documents: DataFrame, table: String): Int =
    graft.io.Manifest.write(knModel(documents), table)

  /** Score documents under a persisted [[knModel]] — interpolated
    * Kneser–Ney with an add-α'd continuation floor so the probability
    * is positive EVERYWHERE (KenLM's OOV handling in spirit):
    *
    *   Pcont(w) = (N1+(·w) + αc) / (types + αc·V)
    *   P(w|v)   = max(c(vw) − d, 0)/c(v) + (d·N1+(v·)/c(v))·Pcont(w)
    *              ... or Pcont(w) alone when v was never a context
    *
    * (the pure-continuation backoff for unseen contexts; a seen context
    * with an unseen continuation keeps its full discount mass
    * d·N1+(v·)/c(v) on the floor'd Pcont, and a wholly unseen word
    * still gets αc's share — no zero probabilities, no ln domain
    * errors). The αc smoothing is the one departure from textbook KN,
    * which leaves unseen continuations at exactly zero; on the training
    * corpus it only perturbs Pcont's denominator, uniformly.
    *
    * Output: (doc_id, n_bigrams, avg_logp), nulls for docs under 2
    * tokens — [[lmScoreWith]]'s contract, so the two models swap behind
    * one quantile gate. Same scale posture: three shuffle_hash equi-
    * joins against count relations (bigram, context, preceder) + one
    * broadcast scalar row + one combinable per-doc average; the
    * probability tree is division/multiplication over exact longs, so
    * everything before `ln` is engine-identical (oracle compares at the
    * established 6-dp ln rounding).
    */
  def knScoreWith(documents: DataFrame, model: DataFrame,
                  discount: Double = 0.75, alphaC: Double = 0.4): DataFrame = {
    val toks = documents.select(col("doc_id"), tokens(col("text")).as("t"))
    val grams = toks
      .select(col("doc_id"), explode(shingles(col("t"), 2)).as("bg"))
    val scored = knScored(grams, model, Seq("doc_id"), discount, alphaC)
    documents.select("doc_id").join(scored, Seq("doc_id"), "left")
  }

  /** The shared KN scoring tail over a prepared bigram stream (`grams`:
    * groupCols + `bg`) — ONE expression tree for the document
    * ([[knScoreWith]]) and line ([[knScoreLines]]) grains, so they
    * cannot drift.
    */
  private def knScored(grams: DataFrame, model: DataFrame,
                       groupCols: Seq[String], discount: Double,
                       alphaC: Double): DataFrame = {
    require(discount > 0 && discount < 1, s"discount=$discount not in (0,1)")
    val biC = model.filter(col("kind") === "bi")
      .select(col("key").as("bg"), col("cnt").as("c2"))
    val ctxC = model.filter(col("kind") === "ctx")
      .select(col("key").as("cw"), col("cnt").as("cv"), col("cnt2").as("nf"))
    val npC = model.filter(col("kind") === "np")
      .select(col("key").as("pw"), col("cnt").as("np"))
    // both 1-row sides broadcast EXPLICITLY (r17): over a CACHED model
    // the kind filter no longer constant-folds the union down to one
    // 1-partition branch, and an unhinted crossJoin of two N-partition
    // cache reads plans as an N×N CartesianProduct (84,100 tasks at one
    // measured drift run) — broadcasting each side keeps it a trivial
    // nested-loop over however the model arrives
    val scalars = broadcast(model.filter(col("kind") === "types")
      .select(col("cnt").as("types")))
      .crossJoin(broadcast(model.filter(col("kind") === "vocab")
        .select(col("cnt").as("v")))) // 1 × 1 rows — broadcast scalar
    val pcont = (coalesce(col("np"), lit(0L)) + lit(alphaC)) /
      (col("types") + lit(alphaC) * col("v"))
    val pSeen = greatest(coalesce(col("c2"), lit(0L)) - lit(discount),
      lit(0.0)) / col("cv") +
      lit(discount) * col("nf") / col("cv") * pcont
    grams
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      .join(biC.hint("shuffle_hash"), Seq("bg"), "left")
      .join(ctxC.hint("shuffle_hash"), col("w1") === col("cw"), "left")
      .join(npC.hint("shuffle_hash"), col("w2") === col("pw"), "left")
      .crossJoin(broadcast(scalars))
      .withColumn("logp", log(when(col("cv").isNull, pcont).otherwise(pSeen)))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("int").as("n_bigrams"),
        avg(col("logp")).as("avg_logp"))
  }

  /** Per-LINE Kneser–Ney scoring under a served [[knModel]] — the
    * [[lmScoreLines]] shape with the KN probability: CCNet's filtering
    * unit under the better-calibrated smoothing. Lines are contiguous
    * token runs, so a model trained on the full docs hits every
    * within-line bigram join; the OOV floors still guard foreign
    * corpora. Output: (doc_id, pos, line, n_bigrams, avg_logp), NULL
    * score for lines under 2 tokens. Same scale posture as
    * lmScoreLines with one extra count join.
    */
  def knScoreLines(documents: DataFrame, model: DataFrame,
                   discount: Double = 0.75, alphaC: Double = 0.4,
                   delim: String = "\n"): DataFrame = {
    val q = java.util.regex.Pattern.quote(delim)
    val lines = documents
      .select(col("doc_id"), posexplode(split(col("text"), q))
        .as(Seq("pos", "line")))
    val grams = lines
      .select(col("doc_id"), col("pos"),
        explode(shingles(tokens(col("line")), 2)).as("bg"))
    val scored = knScored(grams, model, Seq("doc_id", "pos"),
      discount, alphaC)
    lines.join(scored, Seq("doc_id", "pos"), "left")
  }

  /** Self-trained Kneser–Ney scoring — fit ∘ serve of [[knModel]] /
    * [[knScoreWith]] on the corpus's own bigram statistics (every join
    * hits, the backoff branch never fires): [[lmScore]]'s drop-in
    * upgrade, ranking documents by in-corpus typicality under the
    * better-calibrated smoothing.
    */
  def knScore(documents: DataFrame, discount: Double = 0.75,
              alphaC: Double = 0.4): DataFrame =
    knScoreWith(documents, knModel(documents), discount, alphaC)

  /** TRIGRAM Kneser–Ney model (r15) — [[knModel]] extended one order:
    * the full bigram-tier relation (reused verbatim, so the two orders
    * cannot drift) plus two trigram-tier kinds in the same kind-tagged
    * layout, with the one-join `cnt2` trick at the new context grain:
    *
    *   - `tri`  (key = trigram, cnt = c(uvw))
    *   - `ctx2` (key = "u v", cnt = c(uv·) positions,
    *             cnt2 = N1+(uv·) distinct followers)
    *
    * c(uv) is the trigram-CONTEXT count (positions 1..n−2, so
    * Σ_w c(uvw) = c(uv) — the identity the top-tier discounting needs).
    * CCNet-class quality filters typically run a 5-gram model; the
    * construction generalizes the same way (one `kind` pair per extra
    * order), order 3 being where the backoff chain becomes non-trivial.
    */
  def kn3Model(documents: DataFrame, minCount3: Long = 1L): DataFrame = {
    val toks = documents.select(col("doc_id"), tokens(col("text")).as("t"))
    val tg = toks.select(explode(shingles(col("t"), 3)).as("tg"))
      .withColumn("c2k", substring_index(col("tg"), " ", 2))
      .withColumn("w3", substring_index(col("tg"), " ", -1))
    val tri = tg.groupBy("tg").agg(count(lit(1)).as("cnt"))
      .select(lit("tri").as("kind"), col("tg").as("key"), col("cnt"),
        lit(null).cast("long").as("cnt2"))
    val ctx2 = tg.groupBy("c2k")
      .agg(count(lit(1)).as("cnt"), count_distinct(col("w3")).as("cnt2"))
      .select(lit("ctx2").as("kind"), col("c2k").as("key"), col("cnt"),
        col("cnt2"))
    knPrune(knModel(documents).unionByName(tri).unionByName(ctx2),
      minCount3)
  }

  /** Train-and-commit [[kn3Model]] (the knRefresh idiom). */
  def kn3Refresh(documents: DataFrame, table: String,
                 minCount3: Long = 1L): Int =
    graft.io.Manifest.write(kn3Model(documents, minCount3), table)

  /** Count-pruning lever for the served KN artifacts (r17) — the
    * production KenLM-class size control: drop order-≥3 count rows
    * below a per-tier threshold. Pruning is a pure WHERE over the
    * kind-tagged relation, so it composes anywhere in the lifecycle:
    * before a [[kn3Refresh]]/[[kn5Refresh]] commit (smaller artifact)
    * or over an already-served snapshot (cheaper reader).
    *
    * Semantics are exactly the backoff contract: a pruned n-gram row
    * makes its count join miss, and the shared scoring trees
    * ([[kn3Scored]]/[[kn5Scored]]) already treat a missed count as
    * UNSEEN — `coalesce(cnt, 0)` zeroes the direct-mass term, so the
    * gram scores precisely `d·N1+(ctx·)/c(ctx) · P_lower`, the value
    * an unseen continuation of the same context gets. A context row
    * below threshold can only ever orphan grams that are themselves
    * pruned (c(ctx) = Σ_w c(ctx·w) ≥ every single gram count), so
    * pruning grams and contexts at one threshold is self-consistent:
    * the scoring tree then degrades that context's grams wholesale to
    * the committed lower order, the unseen-context branch.
    *
    * Two documented departures from textbook KenLM pruning, both in
    * the conservative direction: surviving context rows keep their
    * TRUE c(ctx)/N1+ statistics (computed before the WHERE), so the
    * discount mass routed to backoff stays sized by the full follower
    * diversity rather than being re-normalized over survivors; and
    * the bigram tier is never pruned (the chain must bottom out on a
    * positive floor — KenLM likewise refuses to prune unigrams).
    *
    * Thresholds are per order (order 3 / 4 / 5); `1` keeps every row
    * (cnt ≥ 1 always) so the default path is bit-identical to the
    * unpruned artifact and the standalone-order parity contract is
    * undisturbed. Kind names that a lower-order model lacks filter
    * vacuously, so one lever serves [[kn3Model]] and [[kn5Model]].
    */
  def knPrune(model: DataFrame, minCount3: Long,
              minCount4: Long = 1L, minCount5: Long = 1L): DataFrame = {
    require(minCount3 >= 1 && minCount4 >= 1 && minCount5 >= 1,
      s"minCounts ($minCount3,$minCount4,$minCount5) must be >= 1")
    if (minCount3 == 1 && minCount4 == 1 && minCount5 == 1) model
    else model.filter(knPruneKeep(minCount3, minCount4, minCount5))
  }

  /** [[knPrune]]'s keep predicate as a reusable Column — shared with
    * [[kn5PruneDrift]]'s single-pass survivor count so the two can
    * never disagree on what pruning keeps.
    */
  private[text] def knPruneKeep(minCount3: Long, minCount4: Long,
                                minCount5: Long): Column =
    when(col("kind").isin("tri", "ctx2"), col("cnt") >= minCount3)
      .when(col("kind").isin("g4", "ctx3"), col("cnt") >= minCount4)
      .when(col("kind").isin("g5", "ctx4"), col("cnt") >= minCount5)
      .otherwise(lit(true))

  /** Score documents under a persisted [[kn3Model]] — interpolated
    * trigram Kneser–Ney BACKING OFF THROUGH THE BIGRAM TIER:
    *
    *   P3(w|uv) = max(c(uvw) − d, 0)/c(uv) + (d·N1+(uv·)/c(uv))·P2(w|v)
    *              ... or P2(w|v) alone when uv was never a context,
    *
    * with P2 exactly [[knScoreWith]]'s tree (absolute discounting over
    * raw bigram counts, αc-floored continuation unigram at the bottom) —
    * so an unseen trigram degrades to precisely the bigram model this
    * family already serves, and a wholly unseen word still bottoms out
    * on the positive continuation floor. Like the αc floor, using RAW
    * counts in the middle tier (rather than textbook modified-KN's
    * continuation counts) is a documented departure: it makes the
    * bigram tier IDENTICAL to the committed [[knModel]] artifact, so
    * one backoff chain serves both orders and the order-2 scores never
    * disagree with the standalone bigram model.
    *
    * Output: (doc_id, n_trigrams, avg_logp), nulls for docs under 3
    * tokens. Scale posture: five shuffle_hash equi-joins against count
    * relations + one broadcast scalar row + one combinable per-doc
    * average; division/multiplication over exact longs before the one
    * `ln` (the knScoreWith parity contract, one tier taller).
    */
  def kn3ScoreWith(documents: DataFrame, model: DataFrame,
                   discount: Double = 0.75,
                   alphaC: Double = 0.4): DataFrame = {
    val toks = documents.select(col("doc_id"), tokens(col("text")).as("t"))
    val grams = toks
      .select(col("doc_id"), explode(shingles(col("t"), 3)).as("tg"))
    val scored = kn3Scored(grams, model, Seq("doc_id"), discount, alphaC)
    documents.select("doc_id").join(scored, Seq("doc_id"), "left")
  }

  /** The shared trigram-KN scoring tail over a prepared trigram stream
    * (`grams`: groupCols + `tg`) — ONE expression tree for the document
    * ([[kn3ScoreWith]]) and line ([[kn3ScoreLines]]) grains, so they
    * cannot drift (the [[knScored]] convention one order up).
    */
  private def kn3Scored(grams0: DataFrame, model: DataFrame,
                        groupCols: Seq[String], discount: Double,
                        alphaC: Double): DataFrame = {
    require(discount > 0 && discount < 1, s"discount=$discount not in (0,1)")
    val grams = grams0
      .withColumn("c2k", substring_index(col("tg"), " ", 2))
      .withColumn("bg", substring_index(col("tg"), " ", -2))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
    val triC = model.filter(col("kind") === "tri")
      .select(col("key").as("tg"), col("cnt").as("c3"))
    val ctx2C = model.filter(col("kind") === "ctx2")
      .select(col("key").as("c2k"), col("cnt").as("cuv"),
        col("cnt2").as("nf2"))
    val biC = model.filter(col("kind") === "bi")
      .select(col("key").as("bg"), col("cnt").as("c2"))
    val ctxC = model.filter(col("kind") === "ctx")
      .select(col("key").as("cw"), col("cnt").as("cv"), col("cnt2").as("nf"))
    val npC = model.filter(col("kind") === "np")
      .select(col("key").as("pw"), col("cnt").as("np"))
    // both 1-row sides broadcast EXPLICITLY (r17): over a CACHED model
    // the kind filter no longer constant-folds the union down to one
    // 1-partition branch, and an unhinted crossJoin of two N-partition
    // cache reads plans as an N×N CartesianProduct (84,100 tasks at one
    // measured drift run) — broadcasting each side keeps it a trivial
    // nested-loop over however the model arrives
    val scalars = broadcast(model.filter(col("kind") === "types")
      .select(col("cnt").as("types")))
      .crossJoin(broadcast(model.filter(col("kind") === "vocab")
        .select(col("cnt").as("v")))) // 1 × 1 rows — broadcast scalar
    // the bigram tier, knScored's tree verbatim
    val pcont = (coalesce(col("np"), lit(0L)) + lit(alphaC)) /
      (col("types") + lit(alphaC) * col("v"))
    val pSeen = greatest(coalesce(col("c2"), lit(0L)) - lit(discount),
      lit(0.0)) / col("cv") +
      lit(discount) * col("nf") / col("cv") * pcont
    val p2 = when(col("cv").isNull, pcont).otherwise(pSeen)
    val p3Seen = greatest(coalesce(col("c3"), lit(0L)) - lit(discount),
      lit(0.0)) / col("cuv") +
      lit(discount) * col("nf2") / col("cuv") * p2
    grams
      .join(triC.hint("shuffle_hash"), Seq("tg"), "left")
      .join(ctx2C.hint("shuffle_hash"), Seq("c2k"), "left")
      .join(biC.hint("shuffle_hash"), Seq("bg"), "left")
      .join(ctxC.hint("shuffle_hash"), col("w1") === col("cw"), "left")
      .join(npC.hint("shuffle_hash"), col("w2") === col("pw"), "left")
      .crossJoin(broadcast(scalars))
      .withColumn("logp", log(when(col("cuv").isNull, p2).otherwise(p3Seen)))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("int").as("n_trigrams"),
        avg(col("logp")).as("avg_logp"))
  }

  /** Per-LINE trigram-KN scoring under a served [[kn3Model]] —
    * [[knScoreLines]] one order up: CCNet's filtering unit under the
    * deeper backoff chain. Lines are contiguous token runs, so a model
    * trained on the full docs hits every within-line trigram join; the
    * backoff tiers still guard foreign corpora. Output: (doc_id, pos,
    * line, n_trigrams, avg_logp), NULL score for lines under 3 tokens.
    */
  def kn3ScoreLines(documents: DataFrame, model: DataFrame,
                    discount: Double = 0.75, alphaC: Double = 0.4,
                    delim: String = "\n"): DataFrame = {
    val q = java.util.regex.Pattern.quote(delim)
    val lines = documents
      .select(col("doc_id"), posexplode(split(col("text"), q))
        .as(Seq("pos", "line")))
    val grams = lines
      .select(col("doc_id"), col("pos"),
        explode(shingles(tokens(col("line")), 3)).as("tg"))
    val scored = kn3Scored(grams, model, Seq("doc_id", "pos"),
      discount, alphaC)
    lines.join(scored, Seq("doc_id", "pos"), "left")
  }

  /** Self-trained trigram KN — fit ∘ serve of [[kn3Model]] /
    * [[kn3ScoreWith]] (every join hits on the training corpus; the
    * backoff branches never fire — the knScore contract one order up).
    */
  def kn3Score(documents: DataFrame, discount: Double = 0.75,
               alphaC: Double = 0.4): DataFrame =
    kn3ScoreWith(documents, kn3Model(documents), discount, alphaC)

  /** 5-GRAM Kneser–Ney model (r16) — the production CCNet-class filter
    * order ([[kn3Model]]'s scaladoc promised the generalization: one
    * `kind` pair per extra order). The committed bigram AND trigram
    * tiers are reused verbatim — [[kn3Model]]'s rows unchanged inside
    * this artifact, so all three served orders share one backoff chain
    * and can never drift — plus four new kinds:
    *
    *   - `g4`   (key = 4-gram,          cnt = c(uvwx))
    *   - `ctx3` (key = "u v w",         cnt = c(uvw·) positions,
    *             cnt2 = N1+(uvw·) distinct followers)
    *   - `g5`   (key = 5-gram,          cnt = c(uvwxy))
    *   - `ctx4` (key = "u v w x",       cnt = c(uvwx·) positions,
    *             cnt2 = N1+(uvwx·) distinct followers)
    *
    * Each ctxN count is the (N+1)-gram-POSITION count (so the followers
    * of a context sum to exactly its count — the identity absolute
    * discounting needs at every tier). Scale: four more map-side-
    * combinable aggregates over exploded shingles, unioned into the
    * same kind-tagged layout; model size is bounded by the corpus's
    * distinct-5-gram count, the same envelope every KenLM build pays.
    */
  def kn5Model(documents: DataFrame, minCount3: Long = 1L,
               minCount4: Long = 1L, minCount5: Long = 1L): DataFrame = {
    val toks = documents.select(col("doc_id"), tokens(col("text")).as("t"))
    def tier(n: Int, gramKind: String, ctxKind: String): DataFrame = {
      val g = toks.select(explode(shingles(col("t"), n)).as("g"))
        .withColumn("ck", substring_index(col("g"), " ", n - 1))
        .withColumn("w", substring_index(col("g"), " ", -1))
      val gc = g.groupBy("g").agg(count(lit(1)).as("cnt"))
        .select(lit(gramKind).as("kind"), col("g").as("key"), col("cnt"),
          lit(null).cast("long").as("cnt2"))
      val cc = g.groupBy("ck")
        .agg(count(lit(1)).as("cnt"), count_distinct(col("w")).as("cnt2"))
        .select(lit(ctxKind).as("kind"), col("ck").as("key"), col("cnt"),
          col("cnt2"))
      gc.unionByName(cc)
    }
    knPrune(
      kn3Model(documents)
        .unionByName(tier(4, "g4", "ctx3"))
        .unionByName(tier(5, "g5", "ctx4")),
      minCount3, minCount4, minCount5)
  }

  /** [[kn5Model]] at the production pruning default — singletons
    * dropped at every order ≥ 3 (the KenLM `--prune 0 0 1 1 1`
    * posture). At 100 TB the unpruned upper tiers are themselves
    * corpus-scale relations dominated by hapax n-grams; this is the
    * standard size lever. Price the quality cost with
    * [[kn5PruneDrift]] rather than guessing.
    */
  def kn5ModelPruned(documents: DataFrame): DataFrame =
    kn5Model(documents, 2L, 2L, 2L)

  /** Train-and-commit [[kn5Model]] (the knRefresh idiom). */
  def kn5Refresh(documents: DataFrame, table: String,
                 minCount3: Long = 1L, minCount4: Long = 1L,
                 minCount5: Long = 1L): Int =
    graft.io.Manifest.write(
      kn5Model(documents, minCount3, minCount4, minCount5), table)

  /** Score documents under a persisted [[kn5Model]] — interpolated
    * 5-gram Kneser–Ney backing off order by order THROUGH THE COMMITTED
    * LOWER TIERS:
    *
    *   P5(y|uvwx) = max(c(uvwxy) − d, 0)/c(uvwx)
    *                + (d·N1+(uvwx·)/c(uvwx))·P4(y|vwx)
    *                ... or P4(y|vwx) alone when uvwx was never a context,
    *
    * and identically P4 → P3 → P2, with P3/P2 exactly
    * [[kn3ScoreWith]]/[[knScoreWith]]'s trees — an unseen 5-gram
    * context degrades to precisely the committed 4-gram tier, an
    * unseen 4-gram context to the committed trigram model, and a
    * wholly unseen word still bottoms out on the positive continuation
    * floor. Raw counts at every middle tier (the documented departure
    * from textbook modified-KN's continuation counts) keep each tier
    * IDENTICAL to the lower-order committed artifact, so one chain
    * serves all orders and order-k scores never disagree with the
    * standalone order-k model.
    *
    * Output: (doc_id, n_5grams, avg_logp), nulls for docs under 5
    * tokens. Scale posture: nine shuffle_hash equi-joins against count
    * relations + one broadcast scalar row + one combinable per-doc
    * average; division/multiplication over exact longs before the one
    * `ln` (the knScoreWith parity contract, three tiers taller).
    */
  def kn5ScoreWith(documents: DataFrame, model: DataFrame,
                   discount: Double = 0.75,
                   alphaC: Double = 0.4): DataFrame = {
    val toks = documents.select(col("doc_id"), tokens(col("text")).as("t"))
    val grams = toks
      .select(col("doc_id"), explode(shingles(col("t"), 5)).as("fg"))
    val scored = kn5Scored(grams, model, Seq("doc_id"), discount, alphaC)
    documents.select("doc_id").join(scored, Seq("doc_id"), "left")
  }

  /** The shared 5-gram-KN scoring tail over a prepared 5-gram stream
    * (`grams`: groupCols + `fg`) — ONE expression tree for the document
    * ([[kn5ScoreWith]]) and line ([[kn5ScoreLines]]) grains, so they
    * cannot drift (the [[knScored]] convention three orders up).
    */
  private def kn5Scored(grams0: DataFrame, model: DataFrame,
                        groupCols: Seq[String], discount: Double,
                        alphaC: Double): DataFrame = {
    require(discount > 0 && discount < 1, s"discount=$discount not in (0,1)")
    kn5JoinedCounts(grams0, model)
      .withColumn("logp", log(kn5Prob(discount, alphaC, col)))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("int").as("n_5grams"),
        avg(col("logp")).as("avg_logp"))
  }

  /** The nine count joins of the 5-gram scoring tail, without the
    * probability tree — every 5-gram row decorated with its model
    * counts (c5/cuvwx/nf4/c4/cuvw/nf3/c3/cuv/nf2/c2/cv/nf/np + the
    * types/vocab scalars), nulls where the model lacks the key. Split
    * out (r17) so [[kn5PruneDrift]] can score BOTH the full and the
    * pruned model from ONE joined pass — pruning is a WHERE on the
    * count relations, so a pruned row is exactly a null-guarded count.
    */
  private def kn5JoinedCounts(grams0: DataFrame,
                              model: DataFrame): DataFrame = {
    val grams = grams0
      .withColumn("c4k", substring_index(col("fg"), " ", 4))
      .withColumn("g4", substring_index(col("fg"), " ", -4))
      .withColumn("c3k", substring_index(col("g4"), " ", 3))
      .withColumn("tg", substring_index(col("fg"), " ", -3))
      .withColumn("c2k", substring_index(col("tg"), " ", 2))
      .withColumn("bg", substring_index(col("fg"), " ", -2))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
    val g5C = model.filter(col("kind") === "g5")
      .select(col("key").as("fg"), col("cnt").as("c5"))
    val ctx4C = model.filter(col("kind") === "ctx4")
      .select(col("key").as("c4k"), col("cnt").as("cuvwx"),
        col("cnt2").as("nf4"))
    val g4C = model.filter(col("kind") === "g4")
      .select(col("key").as("g4"), col("cnt").as("c4"))
    val ctx3C = model.filter(col("kind") === "ctx3")
      .select(col("key").as("c3k"), col("cnt").as("cuvw"),
        col("cnt2").as("nf3"))
    val triC = model.filter(col("kind") === "tri")
      .select(col("key").as("tg"), col("cnt").as("c3"))
    val ctx2C = model.filter(col("kind") === "ctx2")
      .select(col("key").as("c2k"), col("cnt").as("cuv"),
        col("cnt2").as("nf2"))
    val biC = model.filter(col("kind") === "bi")
      .select(col("key").as("bg"), col("cnt").as("c2"))
    val ctxC = model.filter(col("kind") === "ctx")
      .select(col("key").as("cw"), col("cnt").as("cv"), col("cnt2").as("nf"))
    val npC = model.filter(col("kind") === "np")
      .select(col("key").as("pw"), col("cnt").as("np"))
    // both 1-row sides broadcast EXPLICITLY (r17): over a CACHED model
    // the kind filter no longer constant-folds the union down to one
    // 1-partition branch, and an unhinted crossJoin of two N-partition
    // cache reads plans as an N×N CartesianProduct (84,100 tasks at one
    // measured drift run) — broadcasting each side keeps it a trivial
    // nested-loop over however the model arrives
    val scalars = broadcast(model.filter(col("kind") === "types")
      .select(col("cnt").as("types")))
      .crossJoin(broadcast(model.filter(col("kind") === "vocab")
        .select(col("cnt").as("v")))) // 1 × 1 rows — broadcast scalar
    grams
      .join(g5C.hint("shuffle_hash"), Seq("fg"), "left")
      .join(ctx4C.hint("shuffle_hash"), Seq("c4k"), "left")
      .join(g4C.hint("shuffle_hash"), Seq("g4"), "left")
      .join(ctx3C.hint("shuffle_hash"), Seq("c3k"), "left")
      .join(triC.hint("shuffle_hash"), Seq("tg"), "left")
      .join(ctx2C.hint("shuffle_hash"), Seq("c2k"), "left")
      .join(biC.hint("shuffle_hash"), Seq("bg"), "left")
      .join(ctxC.hint("shuffle_hash"), col("w1") === col("cw"), "left")
      .join(npC.hint("shuffle_hash"), col("w2") === col("pw"), "left")
      .crossJoin(broadcast(scalars))
  }

  /** The four-tier interpolated-KN probability over a
    * [[kn5JoinedCounts]] row, every count column read through the
    * resolver `c` — `col` gives the committed tree verbatim;
    * [[kn5PruneDrift]] passes a threshold-guarding resolver so a
    * pruned count degrades EXACTLY like an unseen one (null count →
    * backoff branch). Tiers 2 and 3 are knScored's / kn3Scored's
    * trees verbatim.
    */
  private def kn5Prob(discount: Double, alphaC: Double,
                      c: String => Column): Column = {
    val pcont = (coalesce(c("np"), lit(0L)) + lit(alphaC)) /
      (c("types") + lit(alphaC) * c("v"))
    val pSeen = greatest(coalesce(c("c2"), lit(0L)) - lit(discount),
      lit(0.0)) / c("cv") +
      lit(discount) * c("nf") / c("cv") * pcont
    val p2 = when(c("cv").isNull, pcont).otherwise(pSeen)
    val p3Seen = greatest(coalesce(c("c3"), lit(0L)) - lit(discount),
      lit(0.0)) / c("cuv") +
      lit(discount) * c("nf2") / c("cuv") * p2
    val p3 = when(c("cuv").isNull, p2).otherwise(p3Seen)
    val p4Seen = greatest(coalesce(c("c4"), lit(0L)) - lit(discount),
      lit(0.0)) / c("cuvw") +
      lit(discount) * c("nf3") / c("cuvw") * p3
    val p4 = when(c("cuvw").isNull, p3).otherwise(p4Seen)
    val p5Seen = greatest(coalesce(c("c5"), lit(0L)) - lit(discount),
      lit(0.0)) / c("cuvwx") +
      lit(discount) * c("nf4") / c("cuvwx") * p4
    when(c("cuvwx").isNull, p4).otherwise(p5Seen)
  }

  /** Per-LINE 5-gram-KN scoring under a served [[kn5Model]] —
    * [[kn3ScoreLines]] two orders up: CCNet's filtering unit at the
    * production model order. Lines are contiguous token runs, so a
    * model trained on the full docs hits every within-line 5-gram
    * join; the backoff tiers still guard foreign corpora. Output:
    * (doc_id, pos, line, n_5grams, avg_logp), NULL score for lines
    * under 5 tokens.
    */
  def kn5ScoreLines(documents: DataFrame, model: DataFrame,
                    discount: Double = 0.75, alphaC: Double = 0.4,
                    delim: String = "\n"): DataFrame = {
    val q = java.util.regex.Pattern.quote(delim)
    val lines = documents
      .select(col("doc_id"), posexplode(split(col("text"), q))
        .as(Seq("pos", "line")))
    val grams = lines
      .select(col("doc_id"), col("pos"),
        explode(shingles(tokens(col("line")), 5)).as("fg"))
    val scored = kn5Scored(grams, model, Seq("doc_id", "pos"),
      discount, alphaC)
    lines.join(scored, Seq("doc_id", "pos"), "left")
  }

  /** Self-trained 5-gram KN — fit ∘ serve of [[kn5Model]] /
    * [[kn5ScoreWith]] (every join hits on the training corpus; the
    * backoff branches never fire — the knScore contract at the
    * production order).
    */
  def kn5Score(documents: DataFrame, discount: Double = 0.75,
               alphaC: Double = 0.4): DataFrame =
    kn5ScoreWith(documents, kn5Model(documents), discount, alphaC)

  /** Price the [[knPrune]] lever instead of guessing (r17): ONE row
    * comparing the corpus self-scored under the unpruned vs the pruned
    * [[kn5Model]] — model size before/after (the lever's benefit) next
    * to the score drift it costs:
    *
    *   (model_rows, pruned_rows, n_scored,
    *    sum_abs_drift, max_abs_drift)
    *
    * Per-doc drift is |Δ| of the two 6-dp-rounded avg_logp values cast
    * through the exact-decimal sum policy (graft.sumMeasure's dec6
    * discipline), so the corpus total is order-independent and
    * hash-comparable cross-engine; n_scored counts docs long enough to
    * carry a 5-gram (both scorings agree on that set by construction).
    *
    * Scale posture: the pruned scoring is the SAME nine-join tree —
    * pruning shrinks the count relations it joins against, so the
    * instrument's cost is ≤ 2× one scoring pass plus two metadata
    * counts; nothing here is pairwise.
    */
  def kn5PruneDrift(documents: DataFrame, minCount3: Long = 2L,
                    minCount4: Long = 2L, minCount5: Long = 2L,
                    discount: Double = 0.75,
                    alphaC: Double = 0.4): DataFrame = {
    // r17 ADVICE: the single-pass path no longer routes through
    // knPrune/kn5Scored, so it must re-state their loud parameter
    // contracts — without these, discount=1.5 or minCount3=0 yields
    // silent NaN log-probs / meaningless survivor counts.
    require(discount > 0 && discount < 1, s"discount=$discount not in (0,1)")
    require(minCount3 >= 1 && minCount4 >= 1 && minCount5 >= 1,
      s"minCounts ($minCount3,$minCount4,$minCount5) must be >= 1")
    // ONE nine-join scoring pass for BOTH trees (r17; was two full
    // kn5ScoreWith passes — 17.4 s at sf0.1 vs ~1 s for one pass):
    // pruning is a WHERE on the count relations, so the pruned score
    // is computable from the SAME joined row by reading every order-≥3
    // count through a threshold guard — `when(cnt >= min, cnt)` is
    // null exactly where the pruned model's left join would have
    // missed, and [[kn5Prob]] then takes the identical backoff branch.
    // The context guards key on the CONTEXT row's own count (cuv/cuvw/
    // cuvwx), and the follower-diversity columns (nf2/nf3/nf4) ride
    // with their context row, matching knPrune dropping the whole row.
    val full = kn5Model(documents)
    val grams = documents
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(shingles(col("t"), 5)).as("fg"))
    val guard: String => Column = {
      case n @ "c3" => when(col(n) >= minCount3, col(n))
      case n @ ("cuv" | "nf2") => when(col("cuv") >= minCount3, col(n))
      case n @ "c4" => when(col(n) >= minCount4, col(n))
      case n @ ("cuvw" | "nf3") => when(col("cuvw") >= minCount4, col(n))
      case n @ "c5" => when(col(n) >= minCount5, col(n))
      case n @ ("cuvwx" | "nf4") => when(col("cuvwx") >= minCount5, col(n))
      case n => col(n) // bigram tier and scalars are never pruned
    }
    val perDoc = kn5JoinedCounts(grams, full)
      .withColumn("lp_f", log(kn5Prob(discount, alphaC, col)))
      .withColumn("lp_p", log(kn5Prob(discount, alphaC, guard)))
      .groupBy("doc_id")
      .agg(round(avg(col("lp_f")), 6).as("lp_full"),
        round(avg(col("lp_p")), 6).as("lp_pruned"))
    val drift = perDoc
      .select(graft.dec6(abs(col("lp_pruned") - col("lp_full"))).as("drift"))
    // both model sizes from ONE pass over the count relation — the
    // pruned survivor count is knPrune's own keep predicate
    val sizes = full.agg(count(lit(1)).as("model_rows"),
      count(when(knPruneKeep(minCount3, minCount4, minCount5), lit(1)))
        .as("pruned_rows")) // 1 row — broadcast scalar
    drift.agg(
      count(lit(1)).cast("int").as("n_scored"),
      graft.sumMeasure(col("drift")).as("sum_abs_drift"),
      max(col("drift")).as("max_abs_drift"))
      .crossJoin(sizes)
      .select(col("model_rows"), col("pruned_rows"), col("n_scored"),
        col("sum_abs_drift"), col("max_abs_drift"))
  }

  /** Language-ID heuristic: per-language stopword/character-class evidence
    * counts with a fixed-precedence argmax. Unigram variant of n-gram
    * profiling — pure codegen'd regex counting, no shuffle, and expressible
    * verbatim in the SQL oracle.
    */
  def langId(documents: DataFrame): DataFrame = {
    val scores = Map(
      "en" -> matchCount(col("text"), "\\b(the|and|of|is|in|to)\\b"),
      "es" -> matchCount(col("text"), "\\b(el|la|de|que|los|una)\\b"),
      "de" -> matchCount(col("text"), "\\b(der|die|und|das|ein|ist)\\b"),
      "fr" -> matchCount(col("text"), "\\b(le|la|et|les|des|une)\\b"),
      "zh" -> matchCount(col("text"), "[\\x{4e00}-\\x{9fff}]"))
    val Seq(en, es, de, fr, zh) = Seq("en", "es", "de", "fr", "zh").map(scores)
    val predicted =
      when(en >= es && en >= de && en >= fr && en >= zh, "en")
        .when(es >= de && es >= fr && es >= zh, "es")
        .when(de >= fr && de >= zh, "de")
        .when(fr >= zh, "fr")
        .otherwise("zh")
    documents.select(
      col("doc_id"), col("lang"),
      en.as("s_en"), es.as("s_es"), de.as("s_de"), fr.as("s_fr"), zh.as("s_zh"),
      predicted.as("predicted_lang"))
  }

  /** Document fingerprints: exact md5, case-normalized md5, 64-char-prefix
    * md5, and a 1-permutation min-shingle hash (rolling-hash-style content
    * fingerprint robust to local edits).
    */
  def fingerprints(documents: DataFrame): DataFrame = {
    documents
      .withColumn("toks", tokens(col("text")))
      .select(
        col("doc_id"),
        md5(col("text")).as("fp_exact"),
        md5(lower(col("text"))).as("fp_norm"),
        md5(substring(col("text"), 1, 64)).as("fp_prefix"),
        array_min(transform(shingles(col("toks"), 2), s => md5(s))).as("fp_min_shingle"))
  }

  /** Per-source corpus health — the curation dashboard that decides which
    * sources to keep, reweight, or drop: document and token volume, mean
    * quality score, and the exact-duplicate rate (docs that exact dedup
    * would drop, i.e. non-minimum members of a corpus-wide fingerprint
    * group — a high rate marks a mirror-heavy or boilerplate source).
    *
    * Mean quality routes through the exact-decimal sum policy
    * (graft.package): per-doc scores are bit-identical across engines
    * (int-ratio arithmetic only), and a DECIMAL(18,6) sum is
    * order-independent, so the per-source mean hash-matches the oracle.
    *
    * Scale: one shuffle on the content fingerprint (window count), one
    * doc_id join to attach scores, then a source-cardinality aggregate —
    * all map-side combinable; no per-pair work anywhere.
    */
  def sourceStats(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = qualityScore(documents).select(col("doc_id"), col("quality_score"))
    val w = Window.partitionBy("fp")
    val flagged = documents
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        md5(lower(col("text"))).as("fp"))
      .withColumn("is_drop",
        count(lit(1)).over(w) > 1 && col("doc_id") =!= min("doc_id").over(w))
    val nDrop = sum(when(col("is_drop"), 1L).otherwise(0L))
    flagged.join(scored, "doc_id")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        (sum(dec6(col("quality_score"))).cast("double") / count(lit(1)))
          .as("avg_quality"),
        nDrop.as("n_dup_docs"),
        (nDrop.cast("double") / count(lit(1))).as("dup_ratio"))
  }

  /** Vocabulary coverage curve — the tokenizer-design question "what
    * share of token OCCURRENCES does a top-V type vocabulary cover?"
    * answered for each candidate size in one pass: the OOV rate at size
    * V is `1 − coverage`, and the knee of this curve is where growing
    * the vocabulary stops paying (the sizing signal a BPE/unigram
    * budget decision reads BEFORE training — [[Bpe.vocabulary]] builds
    * the chosen size).
    *
    * `sizes` must be ascending and distinct. Output: one row per size —
    * (vocab_size, n_types, covered_cf, total_cf, coverage), coverage an
    * exact long/long division; types ranked by (cf DESC, term) so the
    * cut is deterministic on both engines (Spark's UTF8String ordering
    * = DuckDB's binary collation).
    *
    * Scale: one map-side-combinable term-frequency aggregate, a 1-row
    * totals aggregate, and a distributed top-max(sizes)
    * (TakeOrderedAndProject — never a global sort of the vocabulary);
    * the window ranks only those max(sizes) rows, and all size cuts
    * come out of ONE aggregate over them (stack fans the 1-row result
    * to the curve — no per-size rescan).
    */
  def vocabCoverage(documents: DataFrame,
                    sizes: Seq[Int] = Seq(8, 16, 32)): DataFrame = {
    require(sizes.nonEmpty && sizes == sizes.sorted && sizes.distinct == sizes,
      "sizes must be ascending and distinct")
    import org.apache.spark.sql.expressions.Window
    val tf = documents
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cf"))
    val totals = tf.agg(count(lit(1)).as("n_types"),
      sum(col("cf")).as("total_cf"))
    val top = tf.orderBy(desc("cf"), asc("term")).limit(sizes.max)
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("cf"), asc("term"))))
    val cuts = sizes.map(v =>
      sum(when(col("rank") <= v, col("cf"))).as(s"c_$v"))
    val covered = top.agg(cuts.head, cuts.tail: _*)
    covered.crossJoin(broadcast(totals))
      .select(
        expr("stack(" + sizes.length + ", " +
          sizes.map(v => s"$v, c_$v").mkString(", ") +
          ") as (vocab_size, covered_cf)"),
        col("n_types"), col("total_cf"))
      .select(col("vocab_size"), col("n_types"), col("covered_cf"),
        col("total_cf"),
        (col("covered_cf").cast("double") / col("total_cf")).as("coverage"))
  }
}
