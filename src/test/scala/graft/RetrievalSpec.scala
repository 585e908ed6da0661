package graft

import graft.ops.text.Retrieval

/** Inverted index and BM25-rational semantics on hand-built docs. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark merge sort merge"),
    (2L, "sort sort sort plan plan plan plan plan"),
    (3L, "merge hash"),
    (4L, "plan scan filter join")
  ).toDF("doc_id", "text")

  test("invertedIndex: df, cf, and doc-ordered postings fingerprint") {
    val idx = Retrieval.invertedIndex(docs)
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(idx("merge") match { case (_, df, cf, _) => df == 2 && cf == 3 })
    assert(idx("sort") match { case (_, df, cf, _) => df == 2 && cf == 4 })
    assert(idx("plan") match { case (_, df, cf, _) => df == 2 && cf == 6 })
    // fingerprint is content-deterministic: same corpus, same fp
    val again = Retrieval.invertedIndex(docs)
      .as[(String, Long, Long, String)].collect().map(r => r._1 -> r._4).toMap
    assert(idx.view.mapValues(_._4).toMap == again)
  }

  test("bm25Rational: coverage beats repetition, non-matching docs absent") {
    val top = Retrieval.bm25Rational(docs, Seq("merge", "sort", "hash"))
      .as[(Int, Long, Double)].collect().toSeq
    // doc 4 has none of the query terms
    assert(!top.exists(_._2 == 4L))
    assert(top.map(_._1) == (1 to top.size))
    val byDoc = top.map(r => r._2 -> r._3).toMap
    // doc 1 (two distinct terms, short) outscores doc 2 (one term,
    // repeated but tf-saturated and length-normalized down)
    assert(byDoc(1L) > byDoc(2L))
    // every score is positive and rank order matches score order
    assert(top.forall(_._3 > 0))
    assert(top.sortBy(r => (-r._3, r._2)).map(_._1) == top.map(_._1))
  }

  test("bm25With: persisted-index serve equals inline, zero-text scoring") {
    val terms = Seq("merge", "sort", "hash")
    val inline = Retrieval.bm25Rational(docs, terms)
      .as[(Int, Long, Double)].collect().toSeq
    // across the artifact boundary: commit, read back, score
    val table = java.nio.file.Files
      .createTempDirectory("graft_sidx").toString + "/idx"
    val v = Retrieval.searchIndexRefresh(docs, table)
    assert(v == 1)
    val served = Retrieval.bm25With(
      graft.io.Manifest.read(spark, table), terms)
      .as[(Int, Long, Double)].collect().toSeq
    assert(served == inline, s"served=$served inline=$inline")
    // terms absent from the index score nothing, same as inline
    assert(Retrieval.bm25With(graft.io.Manifest.read(spark, table),
      Seq("absentterm")).count() == 0)
  }

  test("tfTopK: raw term-count ranking, ties to the smaller doc_id") {
    val top = Retrieval.tfTopK(docs, Seq("merge", "sort"))
      .as[(Int, Long, Long)].collect().toSeq
    // doc 2: three 'sort'; doc 1: two 'merge' + one 'sort'; tie at 3
    // breaks to doc 1; doc 3 one 'merge'; doc 4 absent
    assert(top.map(r => (r._1, r._2, r._3)) ==
      Seq((1, 1L, 3L), (2, 2L, 3L), (3, 3L, 1L)))
  }

  test("rankingEval: hand-computed recall, MRR, and nDCG on a 3-doc list") {
    // truth: docs 10 (gain 4.0), 20 (2.0), 30 (1.0); candidate ranks
    // 20 first, then a miss, then 10 — doc 30 never retrieved
    val truth = Seq(("q", 1, 10L, 4.0), ("q", 2, 20L, 2.0), ("q", 3, 30L, 1.0))
      .toDF("query_id", "rank", "doc_id", "gain")
    val results = Seq(("q", 1, 20L), ("q", 2, 99L), ("q", 3, 10L))
      .toDF("query_id", "rank", "doc_id")
    val r = Retrieval.rankingEval(results, truth, k = 3).head()
    assert(r.getLong(r.fieldIndex("n_truth")) == 3)
    assert(r.getLong(r.fieldIndex("n_hit")) == 2)
    assert(r.getDouble(r.fieldIndex("recall")) == 2.0 / 3)
    assert(r.getDouble(r.fieldIndex("mrr")) == 1.0) // first result hits
    val lg = (x: Double) => math.log(x) / math.log(2)
    val dcg = 2.0 / lg(2) + 4.0 / lg(4)
    val idcg = 4.0 / lg(2) + 2.0 / lg(3) + 1.0 / lg(4)
    assert(math.abs(r.getDouble(r.fieldIndex("dcg")) - dcg) < 1e-12)
    assert(math.abs(r.getDouble(r.fieldIndex("ndcg")) - dcg / idcg) < 1e-12)
  }

  test("rankingEval: zero hits give recall 0, mrr 0, dcg 0") {
    val truth = Seq(("q", 1, 10L, 1.0)).toDF("query_id", "rank", "doc_id", "gain")
    val results = Seq(("q", 1, 99L)).toDF("query_id", "rank", "doc_id")
    val r = Retrieval.rankingEval(results, truth, k = 5).head()
    assert(r.getLong(r.fieldIndex("n_hit")) == 0)
    assert(r.getDouble(r.fieldIndex("recall")) == 0.0)
    assert(r.getDouble(r.fieldIndex("mrr")) == 0.0)
    assert(r.getDouble(r.fieldIndex("dcg")) == 0.0)
    assert(r.getDouble(r.fieldIndex("ndcg")) == 0.0)
  }

  test("rankingEval: a truth query missing from results still gets a zero row") {
    // query 'q2' has truth but the ranker retrieved NOTHING for it —
    // the eval table must score it 0, not drop it (ADVICE r11).
    val truth = Seq(("q1", 1, 10L, 1.0), ("q2", 1, 20L, 2.0))
      .toDF("query_id", "rank", "doc_id", "gain")
    val results = Seq(("q1", 1, 10L)).toDF("query_id", "rank", "doc_id")
    val rows = Retrieval.rankingEval(results, truth, k = 5)
      .orderBy("query_id").collect()
    assert(rows.length == 2)
    val r2 = rows(1)
    assert(r2.getString(r2.fieldIndex("query_id")) == "q2")
    assert(r2.getLong(r2.fieldIndex("n_hit")) == 0L)
    assert(r2.getDouble(r2.fieldIndex("recall")) == 0.0)
    assert(r2.getDouble(r2.fieldIndex("mrr")) == 0.0)
    assert(r2.getDouble(r2.fieldIndex("dcg")) == 0.0)
    assert(r2.getDouble(r2.fieldIndex("ndcg")) == 0.0)
  }

  test("bm25Rational: rarer terms contribute more (rational idf)") {
    // 'hash' df=1 vs 'sort' df=2: single-occurrence docs of equal
    // length isolate the idf factor
    val d = Seq(
      (1L, "hash x y z"), (2L, "sort x y z"),
      (3L, "sort a b c"), (4L, "q r s t")
    ).toDF("doc_id", "text")
    val scores = Retrieval.bm25Rational(d, Seq("hash", "sort"))
      .as[(Int, Long, Double)].collect().map(r => r._2 -> r._3).toMap
    assert(scores(1L) > scores(2L))
  }

  test("expansionTerms: feedback-frequent AND corpus-rare terms expand; " +
    "corpus-wide terms are idf-suppressed; originals excluded") {
    // "merge" retrieves docs 1-5; they share "compaction" (rare);
    // "the" occurs EVERYWHERE so its idf_r collapses toward 0
    val docs = ((1L to 5L).map(i =>
      (i, "the merge compaction compaction step")) ++ Seq(
      (6L, "the compaction compaction compaction log"),
      (7L, "the alpha beta gamma delta"),
      (8L, "the epsilon zeta eta theta")))
      .toDF("doc_id", "text")
    val exp = Retrieval.expansionTerms(docs, Seq("merge"),
      fbDocs = 5, fbTerms = 2)
      .orderBy("rank").collect()
    assert(exp.length == 2)
    assert(exp(0).getString(1) == "compaction",
      s"rare feedback term must rank first: ${exp.toSeq}")
    assert(exp.forall(_.getString(1) != "merge"), "originals never expand")
    assert(exp.forall(_.getString(1) != "the"),
      s"everywhere-term must be idf-suppressed below rank 2: ${exp.toSeq}")
  }

  test("bm25Expanded: expansion recalls a synonym-only doc the plain " +
    "query misses; original top doc survives") {
    val docs = ((1L to 5L).map(i =>
      (i, "the merge compaction compaction step")) ++ Seq(
      (6L, "the compaction compaction compaction log"),
      (7L, "the alpha beta gamma delta"),
      (8L, "the epsilon zeta eta theta")))
      .toDF("doc_id", "text")
    val plain = Retrieval.bm25Rational(docs, Seq("merge"), topK = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(!plain.contains(6L), "doc 6 has no query term")
    val expanded = Retrieval.bm25Expanded(docs, Seq("merge"),
      fbDocs = 5, fbTerms = 1, expWeight = 0.5, topK = 10)
      .collect().map(r => r.getLong(1) -> r.getInt(0)).toMap
    assert(expanded.contains(6L),
      s"expansion must recall the compaction-only doc: $expanded")
    assert(plain.subsetOf(expanded.keySet),
      "original matches survive the expanded query")
  }

  test("rrfFuse: rank-only fusion with exact 1/(k+r) scores; absent " +
    "lists contribute zero; ties break to the smaller id") {
    val r0 = Seq((1, 100L), (2, 200L), (3, 300L)).toDF("rank", "doc_id")
    val r1 = Seq((1, 200L), (2, 400L)).toDF("rank", "doc_id")
    val got = Retrieval.rrfFuse(Seq(r0, r1), kRrf = 60, topK = 10)
      .orderBy("rank").as[(Int, Long, Double)].collect().toSeq
    // B(200): 1/61+1/62; A(100): 1/61; D(400): 1/62; C(300): 1/63
    assert(got.map(_._2) == Seq(200L, 100L, 400L, 300L), s"got $got")
    assert(got(0)._3 == 1.0 / 61 + 1.0 / 62,
      "fold must run in list-index order (r0's term first)")
    assert(got(1)._3 == 1.0 / 61 && got(2)._3 == 1.0 / 62 &&
      got(3)._3 == 1.0 / 63)
    // keyed form: per-query fusion partitions independently
    val k0 = Seq((7L, 1, 100L), (7L, 2, 200L), (8L, 1, 300L))
      .toDF("q_id", "rank", "doc_id")
    val k1 = Seq((7L, 1, 200L), (8L, 1, 100L))
      .toDF("q_id", "rank", "doc_id")
    val keyed = Retrieval.rrfFuse(Seq(k0, k1), keyCols = Seq("q_id"))
      .orderBy("q_id", "rank").as[(Long, Int, Long, Double)].collect().toSeq
    assert(keyed.map(r => (r._1, r._2, r._3)) ==
      Seq((7L, 1, 200L), (7L, 2, 100L), (8L, 1, 100L), (8L, 2, 300L)),
      s"keyed: $keyed")
  }

  test("bm25ExpandedWith: postings-only RM3 equals inline on the " +
    "training corpus (selection and both passes)") {
    val docs = ((1L to 5L).map(i =>
      (i, "the merge compaction compaction step")) ++ Seq(
      (6L, "the compaction compaction compaction log"),
      (7L, "the alpha beta gamma delta"),
      (8L, "the epsilon zeta eta theta")))
      .toDF("doc_id", "text")
    val idx = Retrieval.searchIndex(docs)
    val selInline = Retrieval.expansionTerms(docs, Seq("merge"),
      fbDocs = 5, fbTerms = 2).collect().map(_.toSeq).toSeq
    val selServed = Retrieval.expansionTermsWith(idx, Seq("merge"),
      fbDocs = 5, fbTerms = 2).collect().map(_.toSeq).toSeq
    assert(selServed == selInline,
      s"selection must match: $selServed vs $selInline")
    val inline = Retrieval.bm25Expanded(docs, Seq("merge"),
      fbDocs = 5, fbTerms = 1, topK = 10).collect().map(_.toSeq).toSeq
    val served = Retrieval.bm25ExpandedWith(idx, Seq("merge"),
      fbDocs = 5, fbTerms = 1, topK = 10).collect().map(_.toSeq).toSeq
    assert(served == inline, "served RM3 must equal inline bit-for-bit")
  }

  test("hardNegatives: top-scored non-relevant docs, densely re-ranked") {
    val ranked = Seq(
      ("q1", 1, 10L, 5.0), ("q1", 2, 20L, 4.0), ("q1", 3, 30L, 3.0),
      ("q1", 4, 40L, 2.0),
      ("q2", 1, 50L, 9.0)
    ).toDF("query_id", "rank", "doc_id", "score")
    val positives = Seq(("q1", 10L), ("q1", 30L), ("q2", 50L))
      .toDF("query_id", "doc_id")
    val neg = Retrieval.hardNegatives(ranked, positives, k = 5)
      .as[(String, Int, Long, Double)].collect().toSeq.sorted
    // q1: 20 and 40 survive, re-ranked 1,2; q2: all candidates relevant -> none
    assert(neg == Seq(("q1", 1, 20L, 4.0), ("q1", 2, 40L, 2.0)))
  }

  test("hardNegatives: k truncates below the candidate count") {
    val ranked = Seq(("q", 1, 1L, 3.0), ("q", 2, 2L, 2.0), ("q", 3, 3L, 1.0))
      .toDF("query_id", "rank", "doc_id", "score")
    val positives = Seq(("q", 99L)).toDF("query_id", "doc_id")
    val neg = Retrieval.hardNegatives(ranked, positives, k = 2)
    assert(neg.count() == 2)
  }
}
