package graft.ops.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextFns._

/** Lexical retrieval over the corpus: inverted-index construction and
  * BM25 scoring. The index is the classic term → postings shape; scoring
  * uses the rational-idf BM25 variant so every compared double is built
  * from integer counts with only +,−,×,÷ — bit-exact in any IEEE engine
  * (the log() of textbook BM25 is transcendental, and libm last-ulp
  * divergence breaks cross-engine hash parity; same policy as
  * [[Corpus.distinctiveTerms]]'s tf·N/df score).
  *
  * Scale posture (100 TB): both operators shuffle (term, doc_id, tf)
  * triples — ~30 bytes a row, never text. The index groupBy partial-
  * aggregates map-side; df is a second partial aggregate over the index
  * rows themselves. Query scoring touches only postings of the query's
  * terms (filter BEFORE the tf aggregation — the scan prunes everything
  * else), joins the |q|-row df table and the 1-row corpus-stats build by
  * broadcast, and the final top-k is a TakeOrderedAndProject, never a
  * global sort. A hot term (stopword-grade df) fattens one postings
  * group; that is inherent to the index shape and AQE-splittable since
  * rows are tiny.
  */
object Retrieval {

  /** Inverted index summary: one row per term with document frequency,
    * collection frequency, and an md5 fingerprint of the full postings
    * list in doc_id order ("doc:tf,doc:tf,..."). The fingerprint form
    * keeps the oracle comparable without hauling a variable-length
    * nested column through the compare; the un-fingerprinted postings
    * are the same relation one `collect_list` earlier.
    */
  def invertedIndex(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .groupBy("term").agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("cf"),
        md5(concat_ws(",",
          transform(
            sort_array(collect_list(struct(col("doc_id"), col("tf")))),
            p => concat_ws(":", p.getField("doc_id").cast("string"),
              p.getField("tf").cast("string"))))).as("postings_fp"))

  /** BM25 top-k with rational idf: per query term,
    * `idf_r = (N − df + 0.5) / (df + 0.5)` (the exponent of the textbook
    * log-idf — rank-equivalent per term and exactly representable), and
    * the standard saturated tf
    * `tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`.
    *
    * The per-document score folds the per-term contributions in FIXED
    * `terms` order (missing terms contribute literal 0.0): float addition
    * is not associative, so a deterministic fold order — not an unordered
    * SUM — is what makes the score reproducible run-to-run and engine-to-
    * engine. avgdl derives from an exact integer token-count sum.
    *
    * Output: (rank, doc_id, score) for the `topK` best documents,
    * ties broken by doc_id.
    */
  def bm25Rational(documents: DataFrame, terms: Seq[String],
                   k1: Double = 1.2, b: Double = 0.75,
                   topK: Int = 20): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms,
      "query terms must be non-empty and distinct")
    val toks = documents.select(col("doc_id"), tokens(col("text")).as("toks"))
    val dl = toks.select(col("doc_id"), size(col("toks")).as("dl"))
    // 1-row corpus stats: exact integer sums, broadcast-crossed below
    // (the allow-listed tiny-build pattern, like q_distinct_terms).
    val corpus = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    bm25Score(tf, df, dl, corpus, terms, k1, b, topK)
  }

  /** The shared BM25 scoring tail over prepared (tf, df, dl, corpus)
    * relations — ONE expression tree for the inline ([[bm25Rational]])
    * and served ([[bm25With]]) paths, so they cannot drift: serve ≡
    * fit+score bit-for-bit on the index's own corpus.
    */
  private def bm25Score(tf: DataFrame, df: DataFrame, dl: DataFrame,
                        corpus: DataFrame, terms: Seq[String],
                        k1: Double, b: Double, topK: Int): DataFrame =
    bm25ScoreWeighted(tf, df, dl, corpus, terms.map(_ -> 1.0), k1, b, topK)

  /** The weighted generalization of the shared scoring tail — per-term
    * contributions scale by their query weight before the fixed-order
    * fold ([[bm25Expanded]]'s expansion terms carry `expWeight`).
    * Weight-1.0 terms keep the exact unweighted expression tree, so the
    * unweighted paths ([[bm25Rational]]/[[bm25With]]) are bit-unchanged
    * through this delegation.
    */
  private def bm25ScoreWeighted(tf: DataFrame, df: DataFrame, dl: DataFrame,
                                corpus: DataFrame,
                                terms: Seq[(String, Double)],
                                k1: Double, b: Double, topK: Int): DataFrame = {
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = (col("n_docs").cast("double") - col("df").cast("double") + 0.5) /
      (col("df").cast("double") + 0.5)
    val tfn = (col("tf").cast("double") * (lit(k1) + lit(1.0))) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl))
    val scored = tf
      .join(broadcast(df), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(corpus))
      .select(col("doc_id"), col("term"), (idf * tfn).as("sc"))

    val score = terms.map { case (tm, w) =>
        val contrib =
          coalesce(max(when(col("term") === tm, col("sc"))), lit(0.0))
        if (w == 1.0) contrib else contrib * lit(w)
      }
      .reduceLeft(_ + _)
    val top = scored.groupBy("doc_id").agg(score.as("score"))
      .orderBy(desc("score"), asc("doc_id")).limit(topK)
    top.withColumn("rank",
        row_number().over(Window.orderBy(desc("score"), asc("doc_id")))
          .cast("int"))
      .select("rank", "doc_id", "score")
  }

  /** Pseudo-relevance-feedback expansion-term selection — the RM3 move
    * (Lavrenko & Croft 2001 relevance models, as deployed in Anserini/
    * Indri): the top `fbDocs` first-pass documents are ASSUMED relevant
    * and mined for the terms that characterize them. Selection score =
    * tf_fb · idf_r — total occurrences inside the feedback set times
    * BM25's own rational idf, so a term must be both feedback-frequent
    * AND corpus-rare ("the" never expands; the feedback docs' topical
    * vocabulary does). Deliberately an EXACT-arithmetic score (integer
    * counts into one rational product — RM1's per-doc length-normalized
    * mixture needs a cross-row double sum whose addition order no
    * engine replay can pin); original query terms are excluded. Ties
    * break to the lexicographically smaller term.
    *
    * Output: (rank, term, tf_fb, df, exp_score), `fbTerms` rows.
    *
    * Scale posture: the feedback-doc id set is fbDocs rows (broadcast);
    * candidate stats are two combinable count aggregates over one
    * corpus scan — the inline-BM25 economics (a deployment with a
    * committed [[searchIndex]] reads postings instead; same selection
    * tail).
    */
  def expansionTerms(documents: DataFrame, terms: Seq[String],
                     fbDocs: Int = 5, fbTerms: Int = 5,
                     k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(fbDocs > 0 && fbTerms > 0,
      s"need positive feedback sizes, got fbDocs=$fbDocs fbTerms=$fbTerms")
    val fb = bm25Rational(documents, terms, k1, b, topK = fbDocs)
      .select("doc_id")
    val toksE = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val cand = toksE.join(broadcast(fb), "doc_id")
      .filter(!col("term").isin(terms: _*))
      .groupBy("term").agg(count(lit(1)).as("tf_fb"))
    // corpus df restricted to the candidate terms (feedback-vocabulary
    // sized — broadcast), never a full-vocabulary df build
    val dfc = toksE.join(broadcast(cand.select("term")), "term")
      .groupBy("term").agg(count_distinct(col("doc_id")).as("df"))
    val corpus = documents.agg(count(lit(1)).as("n_docs"))
    selectExpansion(cand, dfc, corpus, fbTerms)
  }

  /** The shared selection tail over prepared (tf_fb, df, n_docs)
    * relations — one expression tree for the inline and served
    * expansion paths (the bm25Score delegation move), so they cannot
    * drift.
    */
  private def selectExpansion(cand: DataFrame, dfc: DataFrame,
                              corpus: DataFrame, fbTerms: Int): DataFrame =
    cand.join(dfc, "term")
      .crossJoin(broadcast(corpus))
      .withColumn("exp_score", col("tf_fb").cast("double") *
        ((col("n_docs").cast("double") - col("df").cast("double") + 0.5) /
          (col("df").cast("double") + 0.5)))
      .orderBy(desc("exp_score"), asc("term")).limit(fbTerms)
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("exp_score"), asc("term"))).cast("int"))
      .select("rank", "term", "tf_fb", "df", "exp_score")

  /** [[expansionTerms]] from a PERSISTED [[searchIndex]] — zero
    * tokenization, zero corpus text: tf_fb folds the feedback docs'
    * postings counts, candidate df counts postings rows, n_docs comes
    * precomputed. On the index's training corpus the selection EQUALS
    * inline (postings carry exactly the token stream's counts; shared
    * selection tail).
    */
  def expansionTermsWith(index: DataFrame, terms: Seq[String],
                         fbDocs: Int = 5, fbTerms: Int = 5,
                         k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(fbDocs > 0 && fbTerms > 0,
      s"need positive feedback sizes, got fbDocs=$fbDocs fbTerms=$fbTerms")
    val fb = bm25With(index, terms, k1, b, topK = fbDocs).select("doc_id")
    val tfAll = index.filter(col("kind") === "tf")
    val cand = tfAll.join(broadcast(fb), "doc_id")
      .filter(!col("term").isin(terms: _*))
      .groupBy("term").agg(sum(col("n")).as("tf_fb"))
    val dfc = tfAll.join(broadcast(cand.select("term")), "term")
      .groupBy("term").agg(count(lit(1)).as("df"))
    val corpus = index.filter(col("kind") === "stats")
      .agg(max(when(col("term") === "n_docs", col("n"))).as("n_docs"))
    selectExpansion(cand, dfc, corpus, fbTerms)
  }

  /** [[bm25Expanded]] served entirely from a PERSISTED [[searchIndex]]
    * — both retrieval passes AND the expansion selection read postings
    * only (the 100 TB shape: at no point does query-time work touch
    * corpus text). Identical output to inline on the training corpus —
    * the oracle string is shared.
    */
  def bm25ExpandedWith(index: DataFrame, terms: Seq[String],
                       fbDocs: Int = 5, fbTerms: Int = 5,
                       expWeight: Double = 0.5, k1: Double = 1.2,
                       b: Double = 0.75, topK: Int = 20): DataFrame = {
    require(expWeight > 0 && expWeight <= 1,
      s"expWeight=$expWeight not in (0,1]")
    val exp = expansionTermsWith(index, terms, fbDocs, fbTerms, k1, b)
      .orderBy("rank").select("term")
      .collect().map(_.getString(0)).toSeq // bounded: fbTerms rows
    val weighted = terms.map(_ -> 1.0) ++ exp.map(_ -> expWeight)
    val allTerms = weighted.map(_._1)
    val tf = index.filter(col("kind") === "tf" &&
        col("term").isin(allTerms: _*))
      .select(col("doc_id"), col("term"), col("n").as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val dl = index.filter(col("kind") === "dl")
      .select(col("doc_id"), col("n").as("dl"))
    val corpus = index.filter(col("kind") === "stats")
      .agg(max(when(col("term") === "n_docs", col("n"))).as("n_docs"),
        max(when(col("term") === "sum_dl", col("n"))).as("sum_dl"))
    bm25ScoreWeighted(tf, df, dl, corpus, weighted, k1, b, topK)
  }

  /** BM25 with pseudo-relevance-feedback query expansion — first pass,
    * [[expansionTerms]] selection, then ONE weighted re-scoring pass
    * over original ∪ expansion terms: originals keep weight 1.0 (their
    * contribution trees are bit-identical to plain [[bm25Rational]]),
    * expansion terms contribute at `expWeight` — RM3's interpolation as
    * a fixed per-term weight, which is what keeps the whole pipeline
    * deterministic and engine-replayable. The fbTerms selected terms
    * are collected (bounded — the seed-centroids pattern) so the final
    * fold order is original-query order then expansion rank order.
    *
    * The recall move a lexical first stage needs: a relevant doc using
    * a synonym the query never said now matches through the expansion
    * vocabulary; measure the trade with [[rankingEval]] before rollout.
    */
  def bm25Expanded(documents: DataFrame, terms: Seq[String],
                   fbDocs: Int = 5, fbTerms: Int = 5,
                   expWeight: Double = 0.5, k1: Double = 1.2,
                   b: Double = 0.75, topK: Int = 20): DataFrame = {
    require(expWeight > 0 && expWeight <= 1,
      s"expWeight=$expWeight not in (0,1]")
    val exp = expansionTerms(documents, terms, fbDocs, fbTerms, k1, b)
      .orderBy("rank").select("term")
      .collect().map(_.getString(0)).toSeq // bounded: fbTerms rows
    val weighted = terms.map(_ -> 1.0) ++ exp.map(_ -> expWeight)
    val allTerms = weighted.map(_._1)
    val toks = documents.select(col("doc_id"), tokens(col("text")).as("toks"))
    val dl = toks.select(col("doc_id"), size(col("toks")).as("dl"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .where(col("term").isin(allTerms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    bm25ScoreWeighted(tf, df, dl, corpus, weighted, k1, b, topK)
  }

  /** The search index as ONE persistable relation — the artifact a
    * retrieval deployment commits so query-time scoring never touches
    * corpus text (index once, query many; [[bm25Rational]] re-tokenizes
    * the corpus per query batch, which at 100 TB IS the cost). Kinds:
    * `tf` (term, doc_id, n = term frequency — the postings), `dl`
    * (doc_id, n = document length), `stats` (two scalar rows: n_docs,
    * sum_dl — precomputed so serving pays no corpus-wide aggregate).
    * Commit via [[searchIndexRefresh]] (the lmModel one-table idiom:
    * the relations are only meaningful as a unit — postings without
    * their dl/stats mis-score), serve via [[bm25With]].
    *
    * Scale posture: the tf/dl builds are [[invertedIndex]]'s combinable
    * aggregates; stats fold from dl with one extra 1-row pass. At
    * warehouse scale the committed table is bucketed by term hash so a
    * query's postings prune to few files.
    */
  def searchIndex(documents: DataFrame): DataFrame = {
    val toks = documents.select(col("doc_id"), tokens(col("text")).as("toks"))
    val dl = toks.select(col("doc_id"), size(col("toks")).cast("long").as("n"))
    val tf = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("n"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("n")).as("sum_dl"))
      .select(lit("stats").as("kind"),
        explode(map(lit("n_docs"), col("n_docs"),
          lit("sum_dl"), col("sum_dl"))).as(Seq("term", "n")))
      .select(col("kind"), col("term"),
        lit(null).cast("long").as("doc_id"), col("n"))
    tf.select(lit("tf").as("kind"), col("term"), col("doc_id"), col("n"))
      .unionByName(dl.select(lit("dl").as("kind"),
        lit(null).cast("string").as("term"), col("doc_id"), col("n")))
      .unionByName(stats)
  }

  /** Index-and-commit [[searchIndex]] as a versioned Manifest snapshot
    * — returns the committed version (the lmRefresh idiom).
    */
  def searchIndexRefresh(documents: DataFrame, table: String): Int =
    graft.io.Manifest.write(searchIndex(documents), table)

  /** BM25 served from a PERSISTED [[searchIndex]] — zero tokenization,
    * zero corpus text at query time: the scan prunes to the query
    * terms' postings, df folds from those postings alone, dl joins by
    * doc_id, and the 1-row stats build comes precomputed. The scoring
    * tail is [[bm25Rational]]'s own expression tree (shared private
    * core), so on the index's training corpus served output EQUALS
    * inline bit-for-bit — the oracle checks exactly that.
    */
  def bm25With(index: DataFrame, terms: Seq[String],
               k1: Double = 1.2, b: Double = 0.75,
               topK: Int = 20): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms,
      "query terms must be non-empty and distinct")
    val tf = index.filter(col("kind") === "tf" && col("term").isin(terms: _*))
      .select(col("doc_id"), col("term"), col("n").as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val dl = index.filter(col("kind") === "dl")
      .select(col("doc_id"), col("n").as("dl"))
    val corpus = index.filter(col("kind") === "stats")
      .agg(max(when(col("term") === "n_docs", col("n"))).as("n_docs"),
        max(when(col("term") === "sum_dl", col("n"))).as("sum_dl"))
    bm25Score(tf, df, dl, corpus, terms, k1, b, topK)
  }

  /** Raw term-frequency top-k — the CHEAP ranker a first-stage retriever
    * actually runs (no idf join, no length normalization, no corpus
    * stats): total occurrences of the query terms per document, ties by
    * doc_id. Exists to be evaluated against [[bm25Rational]] truth by
    * [[rankingEval]]; the same pruned-scan + TakeOrderedAndProject
    * posture as BM25 minus its two broadcast joins.
    *
    * Output: (rank, doc_id, tf_total) for the `topK` best documents.
    */
  def tfTopK(documents: DataFrame, terms: Seq[String],
             topK: Int = 20): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms,
      "query terms must be non-empty and distinct")
    val top = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy("doc_id").agg(count(lit(1)).as("tf_total"))
      .orderBy(desc("tf_total"), asc("doc_id")).limit(topK)
    top.withColumn("rank",
        row_number().over(Window.orderBy(desc("tf_total"), asc("doc_id")))
          .cast("int"))
      .select("rank", "doc_id", "tf_total")
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) —
    * the HYBRID-RETRIEVAL merge: rankings from incomparable scorers
    * (BM25's idf scale, a dense index's cosine, a raw tf count) fuse by
    * RANK alone, score(d) = Σ_lists 1/(kRrf + rank_list(d)), with an
    * absent list contributing 0 — no score normalization, no training,
    * and robust to one ranker's scale drifting. This is the standard
    * first-stage merge of a lexical + vector hybrid search (fuse
    * [[bm25Rational]] with [[graft.ops.Similarity.annTopK]] output via
    * `keyCols = Seq("q_id")`, `idCol = "neighbor_id"`).
    *
    * Cross-engine exactness: 1/(k+rank) is one IEEE division of exact
    * ints and the per-doc sum folds in LIST-INDEX order (the scoreFuse
    * pivot — one combinable aggregate, never a per-doc collection), so
    * fused scores compare without rounding. Ties break to the smaller
    * id. Scale posture: input lists are top-k tables (eval-sized); one
    * union + one combinable pivot aggregate + a per-key window over
    * ≤ Σ topK rows.
    *
    * Output: (keyCols..., rank, idCol, rrf_score), top `topK` per key.
    */
  def rrfFuse(rankings: Seq[DataFrame], kRrf: Int = 60, topK: Int = 20,
              idCol: String = "doc_id", rankCol: String = "rank",
              keyCols: Seq[String] = Nil): DataFrame = {
    require(rankings.nonEmpty, "at least one ranking required")
    require(kRrf > 0, s"kRrf must be positive, got $kRrf")
    val keyId = keyCols :+ idCol
    val tagged = rankings.zipWithIndex.map { case (df, i) =>
      df.select(keyId.map(col) :+ col(rankCol).cast("int").as("__r"): _*)
        .withColumn("__src", lit(i))
    }.reduce(_ unionByName _)
    val pivoted = tagged.groupBy(keyId.map(col): _*)
      .agg(max(when(col("__src") === 0, col("__r"))).as("__r0"),
        rankings.indices.tail.map(i =>
          max(when(col("__src") === i, col("__r"))).as(s"__r$i")): _*)
    val score = rankings.indices.map(i =>
        coalesce(lit(1.0) / (lit(kRrf) + col(s"__r$i")), lit(0.0)))
      .reduceLeft(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("rrf_score").desc, col(idCol).asc)
    pivoted.withColumn("rrf_score", score)
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= topK)
      .select(keyCols.map(col) ++
        Seq(col("rank"), col(idCol), col("rrf_score")): _*)
  }

  /** Graded ranking evaluation — recall@k, MRR, and nDCG@k of a candidate
    * ranking against a graded truth ranking, per query: the retrieval
    * twin of [[graft.ops.Similarity.recallAtK]], adding rank discounting
    * so a rollout gate can also see WHERE in the list the quality lives.
    *
    *   - `results`: (query_id, rank, doc_id) from the system under test;
    *   - `truth`:   (query_id, rank, doc_id, gain) — the ideal ranking
    *     with a positive graded gain (e.g. the exact BM25 score);
    *   - recall  = |results@k ∩ truth@k| / |truth@k|;
    *   - mrr     = 1 / (first result rank that hits truth@k), 0 if none;
    *   - dcg@k   = Σ over hits of gain / log2(result rank + 1), idcg@k
    *     the same sum over the truth ranking itself, ndcg = dcg / idcg
    *     (NULL when idcg is 0).
    *
    * log2 is transcendental → the oracled wrapper compares dcg/ndcg at
    * the stable 6-decimal rounding (charEntropy's precedent); recall and
    * mrr are single IEEE divisions of exact integers and compare raw.
    *
    * Scale posture: one (query_id, doc_id)-keyed left equi-join of two
    * k-row-per-query relations plus two combinable per-query aggregates —
    * eval-slice-sized by construction, flat in corpus size (the corpus
    * scan lives in the rankers that PRODUCE results/truth, not here).
    */
  def rankingEval(results: DataFrame, truth: DataFrame,
                  k: Int = 10): DataFrame = {
    val resK = results.filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank").as("res_rank"))
    val truK = truth.filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank").as("tru_rank"),
        col("gain"))
    val ideal = truK.groupBy("query_id").agg(
      count(lit(1)).as("n_truth"),
      sum(col("gain") / log2(col("tru_rank") + lit(1))).as("idcg"))
    val got = resK.join(truK, Seq("query_id", "doc_id"), "left")
      .groupBy("query_id").agg(
        count(col("tru_rank")).as("n_hit"),
        min(when(col("tru_rank").isNotNull, col("res_rank")))
          .as("first_hit"),
        sum(when(col("tru_rank").isNotNull,
          col("gain") / log2(col("res_rank") + lit(1)))
          .otherwise(lit(0.0))).as("dcg"))
    // Truth-side LEFT join: a query whose ranker retrieved NOTHING (no
    // `got` row at all) must still score recall/mrr/dcg 0 — an inner
    // join here would silently drop it from the eval table and a
    // rollout gate reading the mean would over-estimate quality.
    ideal.join(got, Seq("query_id"), "left")
      .select(col("query_id"), col("n_truth"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_truth"))
          .as("recall"),
        coalesce(lit(1.0) / col("first_hit"), lit(0.0)).as("mrr"),
        coalesce(col("dcg"), lit(0.0)).as("dcg"),
        when(col("idcg") > lit(0.0),
          coalesce(col("dcg"), lit(0.0)) / col("idcg")).as("ndcg"))
  }

  /** Hard-negative mining for retrieval/embedding training data: the
    * top-ranked documents a first-stage ranker retrieved that are NOT
    * judged relevant — exactly the "scored high but wrong" examples a
    * reranker or bi-encoder trains against (the in-batch-random
    * alternative teaches nothing the ranker doesn't already know).
    *
    *   - `ranked`: (query_id, rank, doc_id, score) — a per-query top-M
    *     candidate list (e.g. [[bm25Rational]] per query);
    *   - `positives`: (query_id, doc_id) — the judged-relevant set;
    *   - output: (query_id, neg_rank, doc_id, score) — the `k` best-
    *     scored non-relevant docs per query, re-ranked densely so a
    *     training loader can take "the top-k hard negatives" directly.
    *
    * Scale posture: `ranked` is already eval-sized (top-M per query —
    * the ranker did the corpus-scale pruning); this is one
    * (query_id, doc_id)-keyed anti-join plus a per-query window over
    * ≤ M rows. A query whose candidates are ALL relevant simply yields
    * no rows — correct here (there is nothing to train on), unlike
    * [[rankingEval]] where a missing query would silently inflate the
    * average.
    */
  def hardNegatives(ranked: DataFrame, positives: DataFrame,
                    k: Int = 5): DataFrame = {
    val neg = ranked.join(
      positives.select(col("query_id"), col("doc_id")),
      Seq("query_id", "doc_id"), "left_anti")
    val w = Window.partitionBy("query_id")
      .orderBy(col("rank"))
    neg.withColumn("neg_rank", row_number().over(w).cast("int"))
      .filter(col("neg_rank") <= k)
      .select(col("query_id"), col("neg_rank"), col("doc_id"), col("score"))
  }
}
