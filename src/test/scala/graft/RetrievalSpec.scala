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
}
