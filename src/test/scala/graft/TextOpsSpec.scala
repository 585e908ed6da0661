package graft

import graft.ops.text.{Dedup, TextFns, TextStats}
import org.apache.spark.sql.functions._

/** Text-pipeline operators: shingles, dedup (exact + MinHash-LSH +
  * SimHash), language ID — unit semantics on hand-built docs.
  */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different content about spark engines"),
    (4L, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG"), // case-dup of 1
    (5L, "tiny")
  ).toDF("doc_id", "text")

  test("shingles: n-grams, short docs yield empty array") {
    val sh = docs.select($"doc_id",
      TextFns.shingles(TextFns.tokens($"text"), 2).as("sh"))
    val m = sh.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(m(5L).isEmpty)
    assert(m(1L).head == "the quick" && m(1L).size == 8)
  }

  test("exact dedup groups case-normalized duplicates") {
    val d = Dedup.exactDedup(docs)
    assert(d.count() == 4) // 1 and 4 collapse
    val grp = d.filter($"n_copies" === 2).head()
    assert(grp.getLong(grp.fieldIndex("keep_doc_id")) == 1L)
  }

  test("minhash-LSH finds the near-dup pair and no false positives") {
    val pairs = Dedup.nearDupPairs(docs, k = 16, bands = 8, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical docs hash equal, near-dups are close in Hamming distance") {
    val fp = Dedup.simhashDocs(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc4 is uppercase → different shingles → different fingerprint; doc1
    // vs doc2 differ by one token (two of eight 2-gram shingles).
    assert(!fp.contains(5L)) // "tiny" has no 2-gram shingles
    val hamming12 = java.lang.Long.bitCount(fp(1L) ^ fp(2L))
    val hamming13 = java.lang.Long.bitCount(fp(1L) ^ fp(3L))
    assert(hamming12 < hamming13, s"near-dup hamming $hamming12 !< unrelated $hamming13")
  }

  test("simhashPairs: identical-fingerprint pair surfaces at hamming 0") {
    val two = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(two)
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs.contains((1L, 2L, 0)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("jaccardNearDup: prefix-filtered result equals naive all-pairs Jaccard") {
    val pairs = Dedup.jaccardNearDup(docs, n = 2, threshold = 0.5)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect().map { case (a, b, j) => ((a, b), j) }.toMap
    // Naive reference computed by hand: doc1/doc2 share 7 of 9 distinct
    // 2-gram shingles → J = 7/9; no other pair overlaps at all.
    assert(pairs.keySet == Set((1L, 2L)))
    assert(math.abs(pairs((1L, 2L)) - 7.0 / 9.0) < 1e-15)
  }

  test("language ID picks the dominant stopword profile") {
    val sample = Seq(
      (1L, "en", "the cat and the dog is in to the house of things"),
      (2L, "es", "el gato de la casa que los perros una vez"),
      (3L, "de", "der hund und die katze das ist ein haus"),
      (4L, "fr", "le chien et les chats des maisons une fois")
    ).toDF("doc_id", "lang", "text")
    val out = TextStats.langId(sample).select("doc_id", "predicted_lang")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "fr"))
  }

  test("token stats: counts line up on a known doc") {
    val one = Seq((1L, "en", 11L, "a bb ccc")).toDF("doc_id", "lang", "n_chars", "text")
    val r = TextStats.tokenStats(one).head()
    assert(r.getInt(r.fieldIndex("n_tokens")) == 3)
    assert(r.getInt(r.fieldIndex("n_distinct_tokens")) == 3)
    assert(r.getInt(r.fieldIndex("text_len")) == 8)
  }
}
