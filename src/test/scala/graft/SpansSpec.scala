package graft

import graft.ops.text.Spans

/** Substring-span dedup: window chaining into maximal spans, island
  * breaks, keep-first apply semantics — on hand-built docs with disjoint
  * token alphabets so every expectation is enumerable by eye.
  */
class SpansSpec extends SparkSpec {
  import spark.implicits._

  // S (10 tokens) shared by docs 1/2/5; T (9 tokens) shared by 5/6;
  // docs 3/4 are exact copies (12 tokens); 7 is unique; 8 is short.
  private val S = (1 to 10).map(i => s"s$i").mkString(" ")
  private val T = (1 to 9).map(i => s"t$i").mkString(" ")
  private val D = (1 to 12).map(i => s"d$i").mkString(" ")

  private def docs = Seq(
    (1L, s"a1 a2 a3 $S a4 a5"),
    (2L, s"b1 b2 $S b3 b4 b5 b6"),
    (3L, D),
    (4L, D),
    (5L, s"e1 e2 $S e3 e4 e5 e6 e7 e8 e9 e10 e11 $T e12"),
    (6L, s"$T f1 f2 f3"),
    (7L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"),
    (8L, "x1 x2")
  ).toDF("doc_id", "text")

  test("dupSpans: maximal spans with correct 1-based bounds") {
    val got = Spans.dupSpans(docs, l = 8, minDocs = 2)
      .orderBy("doc_id", "span_start")
      .as[(Long, Int, Int, Int)].collect().toSeq
    assert(got == Seq(
      (1L, 4, 13, 10),  // S inside unique context
      (2L, 3, 12, 10),
      (3L, 1, 12, 12),  // whole-doc exact dup
      (4L, 1, 12, 12),
      (5L, 3, 12, 10),  // two regions split by a >l unique gap
      (5L, 22, 30, 9),
      (6L, 1, 9, 9)))
  }

  test("dupSpans: a run below l tokens shared across docs is not a span") {
    val short = Seq(
      (1L, "p1 p2 p3 p4 p5 p6 p7 q1 q2 q3"),
      (2L, "p1 p2 p3 p4 p5 p6 p7 r1 r2 r3") // 7-token shared prefix < l
    ).toDF("doc_id", "text")
    assert(Spans.dupSpans(short, l = 8, minDocs = 2).count() == 0)
  }

  test("despan: keep-first removal, pass-through, and full-dup emptying") {
    val got = Spans.despan(docs, l = 8, minDocs = 2)
      .orderBy("doc_id")
      .as[(Long, Int, String)].collect().toSeq
    val byId = got.map(r => r._1 -> r).toMap
    // canonical occurrences keep their text untouched
    assert(byId(1L) == (1L, 0, s"a1 a2 a3 $S a4 a5"))
    assert(byId(3L) == (3L, 0, D))
    assert(byId(7L)._2 == 0 && byId(8L)._2 == 0)
    // doc 2 and doc 5 lose S (doc 1 is canonical); doc 5 keeps T
    assert(byId(2L) == (2L, 10, "b1 b2 b3 b4 b5 b6"))
    assert(byId(5L) ==
      (5L, 10, s"e1 e2 e3 e4 e5 e6 e7 e8 e9 e10 e11 $T e12"))
    // doc 6 loses T (doc 5 is canonical); doc 4 empties entirely
    assert(byId(6L) == (6L, 9, "f1 f2 f3"))
    assert(byId(4L) == (4L, 12, ""))
    assert(got.size == 8)
  }

  test("decontaminateSpans: benchmark spans redact EVERYWHERE " +
    "(no first-occurrence exemption), clean docs pass through") {
    val train = Seq(
      (1L, "alpha beta gamma delta unique tail words here"),
      (2L, "prefix words alpha beta gamma delta more alpha beta gamma delta"),
      (3L, "totally different content nothing shared at all")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "intro alpha beta gamma delta outro"))
      .toDF("doc_id", "text")
    val got = Spans.decontaminateSpans(train, bench, l = 4)
      .orderBy("doc_id").as[(Long, Int, String)].collect().toSeq
    assert(got == Seq(
      (1L, 4, "unique tail words here"),
      // BOTH occurrences redact — islands [3,6] and [8,11]
      (2L, 8, "prefix words more"),
      (3L, 0, "totally different content nothing shared at all")))
  }
}
