package graft

import graft.ops.text.Bpe
import org.apache.spark.sql.functions._

/** BPE tokenizer training: merge order, tie-breaks, greedy application
  * semantics, early stop, and determinism under repartitioning.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  // Sennrich's ACL-2016 running example vocabulary, reweighted so every
  // merge choice is unique except the deliberate tie at rank 1/2.
  private val sennrich = docs(
    1L -> "low low low lower lower newest newest newest newest",
    2L -> "widest widest newest low")

  test("bpeTrain: merge sequence matches the hand-computed reference") {
    val out = Bpe.bpeTrain(sennrich, numMerges = 6)
      .as[(Int, String, String, String, Long)].collect().toSeq
    // pair counts round 1: (e,s)=7 [4+1 newest, 2 widest], (s,t)=7,
    // (l,o)=6, (o,w)=6, (w,e)=5, ... argmax ties (e,s)/(s,t) at 7 →
    // lexicographic tie-break picks (e,s); after that merge (es,t)=7.
    assert(out == Seq(
      (1, "e", "s", "es", 7L),
      (2, "es", "t", "est", 7L),
      (3, "l", "o", "lo", 6L),
      (4, "lo", "w", "low", 6L),
      (5, "e", "w", "ew", 5L),
      (6, "ew", "est", "ewest", 5L)))
  }

  test("bpeTrain: stops early when no pair reaches minPairCount") {
    val out = Bpe.bpeTrain(sennrich, numMerges = 50, minPairCount = 6)
      .as[(Int, String, String, String, Long)].collect().toSeq
    // only the >=6 merges survive: es(7), est(7), lo(6), low(6); after
    // those, the best remaining pair is (e,w)=5 < 6 -> stop at rank 4.
    assert(out.map(_._4) == Seq("es", "est", "lo", "low"))
    assert(out.forall(_._5 >= 6L))
  }

  test("applyMerge: greedy left-to-right fold equals regex-replace semantics") {
    val cases = Seq(
      (Seq("a", "a", "a"), ("a", "a"), Seq("aa", "a")),
      (Seq("a", "b", "a", "b"), ("a", "b"), Seq("ab", "ab")),
      (Seq("a", "a", "b"), ("a", "b"), Seq("a", "ab")),
      (Seq("ab", "b", "b"), ("ab", "b"), Seq("abb", "b")),
      (Seq("x"), ("a", "b"), Seq("x")),
      (Seq.empty[String], ("a", "b"), Seq.empty[String]))
    cases.foreach { case (in, (a, b), want) =>
      val got = Seq(in).toDF("s")
        .select(Bpe.applyMerge(col("s"), a, b))
        .as[Seq[String]].head()
      assert(got == want, s"applyMerge($in, $a+$b)")
    }
  }

  test("bpeTrain is partition-order independent and deterministic") {
    val base = Bpe.bpeTrain(sennrich, numMerges = 5).collect().toSeq
    val shuffled = Bpe.bpeTrain(sennrich.repartition(7), numMerges = 5)
      .collect().toSeq
    assert(base == shuffled)
  }

  test("segment: replaying merges reproduces subword counts and content") {
    val merges = Bpe.bpeTrain(sennrich, numMerges = 6)
      .orderBy("merge_rank")
      .as[(Int, String, String, String, Long)].collect()
      .map(m => (m._2, m._3)).toSeq
    val out = Bpe.segment(docs(10L -> "newest low lowest"), merges)
      .as[(Long, Int, Int, String)].head()
    // merges in order: es, est, lo, low, ew, ewest
    // newest: es -> est -> ew leaves [n, ew, est]; ew+est adjacent, so
    // the final ewest merge fires -> [n, ewest]
    // low -> [low]; lowest -> [low, est] (no e left for ew)
    val expected = Seq(Seq("n", "ewest"), Seq("low"), Seq("low", "est"))
    assert(out._2 == 3)                       // whitespace tokens
    assert(out._3 == expected.map(_.size).sum) // bpe tokens
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.flatten.mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out._4 == fp)
  }

  test("property: bpeTrain == sequential reference on random corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def refBpe(words: Seq[String], nMerges: Int,
               minCount: Long): Seq[(Int, String, String, String, Long)] = {
      val wc = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
      var syms = wc.keys.map(w => w -> w.split("").toVector).toMap
      val out = Seq.newBuilder[(Int, String, String, String, Long)]
      var rank = 1
      var done = false
      while (rank <= nMerges && !done) {
        val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((w, c) <- wc; s = syms(w); i <- 0 until s.size - 1)
          pc((s(i), s(i + 1))) = pc.getOrElse((s(i), s(i + 1)), 0L) + c
        val cands = pc.toSeq.filter(_._2 >= minCount)
        if (cands.isEmpty) done = true
        else {
          val ((a, b), c) = cands.minBy { case ((x, y), n) => (-n, x, y) }
          out += ((rank, a, b, a + b, c))
          syms = syms.view.mapValues { s =>
            val acc = Vector.newBuilder[String]
            var i = 0
            while (i < s.size) {
              if (i + 1 < s.size && s(i) == a && s(i + 1) == b) {
                acc += a + b; i += 2
              } else { acc += s(i); i += 1 }
            }
            acc.result()
          }.toMap
          rank += 1
        }
      }
      out.result()
    }
    val wordGen = Gen.choose(1, 6)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    val corpusGen = Gen.nonEmptyListOf(Gen.nonEmptyListOf(wordGen).map(_.mkString(" ")))
    (0 until 6).foreach { i =>
      val texts = corpusGen.apply(Gen.Parameters.default, Seed(100L + i)).get
      val expected = refBpe(texts.flatMap(_.split(" ").toSeq), 5, 2L)
      val got = Bpe.bpeTrain(
        texts.zipWithIndex.map { case (t, id) => (id.toLong, t) }
          .toDF("doc_id", "text"), numMerges = 5)
        .as[(Int, String, String, String, Long)].collect().toSeq
      assert(got == expected, s"seed $i corpus $texts")
    }
  }

  test("encode == segment: the compiled automaton replays the fold chain " +
    "exactly, including merge-result collisions and multi-space text") {
    val merges6 = Bpe.bpeTrain(sennrich, numMerges = 6)
      .orderBy("merge_rank")
      .as[(Int, String, String, String, Long)].collect()
      .map(m => (m._2, m._3)).toSeq
    // corpus with repeats (memo path), words sharing no merge (prune to
    // zero candidates), multi-space + leading/trailing space text (empty
    // -token contract), and the fixture-style vocabulary
    val corpus = docs(
      1L -> "newest low lowest newest newest",
      2L -> "zzz qqq",
      3L -> "  low  newest ",
      4L -> "widest es t est sest")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").as[(Long, Int, Int, String)].collect().toSeq
    assert(rows(Bpe.encode(corpus, merges6)) ==
      rows(Bpe.segment(corpus, merges6)))
    // adversarial table: rank j merges a token that rank i < j could
    // recombine with ((a,b) before (p,q) with pq = a) — sequential
    // replay deliberately does NOT revisit rank i, and the automaton
    // must not either (the candidate schedule stays rank-ordered)
    val tricky = Seq(("ab", "c"), ("a", "b"), ("b", "c"))
    val trickyCorpus = docs(1L -> "abc abcc ab bc")
    assert(rows(Bpe.encode(trickyCorpus, tricky)) ==
      rows(Bpe.segment(trickyCorpus, tricky)))
    // property: equality on random corpora under trained tables
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val wordGen = Gen.choose(1, 6)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    val corpusGen = Gen.nonEmptyListOf(
      Gen.nonEmptyListOf(wordGen).map(_.mkString(" ")))
    (0 until 4).foreach { i =>
      val texts = corpusGen.apply(Gen.Parameters.default, Seed(500L + i)).get
      val df = texts.zipWithIndex.map { case (t, id) => (id.toLong, t) }
        .toDF("doc_id", "text")
      val m = Bpe.bpeTrain(df, numMerges = 6).orderBy("merge_rank")
        .as[(Int, String, String, String, Long)].collect()
        .map(x => (x._2, x._3)).toSeq
      assert(rows(Bpe.encode(df, m)) == rows(Bpe.segment(df, m)),
        s"seed $i corpus $texts merges $m")
    }
  }

  test("encode: per-word work prunes to the word's occurring merges — a " +
    "vocabulary of irrelevant merges costs nothing") {
    // 500 merges that can never occur in the corpus + the 6 real ones:
    // output must be identical to the 6-merge table (irrelevant merges
    // are no-ops), which is exactly the flat-in-merge-count property —
    // the automaton schedules only merges whose merged string occurs.
    val merges6 = Bpe.bpeTrain(sennrich, numMerges = 6)
      .orderBy("merge_rank")
      .as[(Int, String, String, String, Long)].collect()
      .map(m => (m._2, m._3)).toSeq
    val noise = (0 until 500).map(i => (s"x$i", s"y$i"))
    val corpus = docs(1L -> "newest low lowest", 2L -> "widest newest")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").as[(Long, Int, Int, String)].collect().toSeq
    // interleave noise BEFORE and AFTER the real merges: rank order of
    // the real merges is preserved either way
    assert(rows(Bpe.encode(corpus, noise ++ merges6)) ==
      rows(Bpe.segment(corpus, merges6)))
    assert(rows(Bpe.encode(corpus, merges6 ++ noise)) ==
      rows(Bpe.segment(corpus, merges6)))
  }

  test("vocab: chars-then-merges id order; duplicate-producing merges " +
    "keep the first id; encodeIds fingerprints the exact id sequence") {
    // merges 2 and 3 both produce "abc" — the vocab must keep ONE "abc"
    // (first producer, rank 2) and skip the later duplicate
    val merges = Seq(("a", "b"), ("ab", "c"), ("a", "bc"), ("b", "c"))
    val corpus = docs(1L -> "abc bc ab", 2L -> "cab")
    val v = Bpe.vocab(corpus, merges)
      .as[(Int, String, String)].collect().toSeq.sortBy(_._1)
    // chars a,b,c -> ids 0,1,2; merges ab, abc (first producer), bc
    assert(v == Seq((0, "a", "char"), (1, "b", "char"), (2, "c", "char"),
      (3, "ab", "merge"), (4, "abc", "merge"), (5, "bc", "merge")),
      s"vocab was $v")
    // encodeIds == encode's surface forms mapped through the vocab
    val idOf = v.map(x => x._2 -> x._1).toMap
    val surface = Bpe.encode(corpus, merges).orderBy("doc_id")
      .as[(Long, Int, Int, String)].collect()
    val ids = Bpe.encodeIds(corpus, merges, Bpe.vocab(corpus, merges))
      .orderBy("doc_id").as[(Long, Int, String)].collect()
    assert(ids.map(_._2).toSeq == surface.map(_._3).toSeq,
      "subword counts must agree between encode and encodeIds")
    // doc 1: abc->[abc], bc->[bc] (b,c merge: a,b consumed first? no —
    // word "bc" chars [b,c]: merge (a,b) no-op, (ab,c) no-op, (a,bc)
    // no-op, (b,c)->[bc]); ab->[ab] => ids [4, 5, 3]
    val fp1 = java.security.MessageDigest.getInstance("MD5")
      .digest("4 5 3".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(ids(0)._3 == fp1, "doc 1 id sequence must be [abc, bc, ab]")
    // foreign character maps to the documented -1 UNK sentinel
    val unk = Bpe.encodeIds(docs(9L -> "xyz"), merges,
      Bpe.vocab(corpus, merges)).as[(Long, Int, String)].head()
    val fpUnk = java.security.MessageDigest.getInstance("MD5")
      .digest("-1 -1 -1".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(unk._2 == 3 && unk._3 == fpUnk)
  }

  test("fertility: per-language subwords-per-word under the learned merges") {
    val merges = Bpe.bpeTrain(sennrich, numMerges = 6)
      .orderBy("merge_rank")
      .as[(Int, String, String, String, Long)].collect()
      .map(m => (m._2, m._3)).toSeq
    val corpus = Seq(
      (1L, "newest low", "en"),   // newest->[n,ewest]=2, low->[low]=1
      (2L, "lowest", "en"),       // -> [low, est] = 2
      (3L, "zz qq", "xx"))        // no merges fire: 2+2 subwords
      .toDF("doc_id", "text", "lang")
    val out = Bpe.fertility(corpus, merges).orderBy("lang")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("en", 2L, 3L, 5L, 5.0 / 3),
      ("xx", 1L, 2L, 4L, 2.0)), s"fertility was $out")
  }

  test("tokenizer artifact: a committed snapshot serves without the " +
    "training corpus, a refresh changes ids, and the superseded version " +
    "replays its id stream bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tok").toString
    val table = s"$dir/tokenizer"
    val probe = docs(100L -> "newest low lowest widest")
    def idRows(merges: Seq[(String, String)],
               voc: org.apache.spark.sql.DataFrame) =
      Bpe.encodeIds(probe, merges, voc).as[(Long, Int, String)]
        .collect().toSeq

    val v1 = Bpe.tokenizerRefresh(sennrich, table, numMerges = 6)
    // the artifact round-trip is lossless: persisted merges/vocab ==
    // direct in-memory training on the same corpus
    val m1 = Bpe.readMerges(spark, table)
    assert(m1 == Bpe.bpeTrain(sennrich, numMerges = 6).orderBy("merge_rank")
      .as[(Int, String, String, String, Long)].collect()
      .map(x => (x._2, x._3)).toSeq)
    val vocDirect = Bpe.vocab(sennrich, m1)
      .as[(Int, String, String)].collect().toSeq.sortBy(_._1)
    val vocRead = Bpe.readVocab(spark, table)
      .as[(Int, String, String)].collect().toSeq.sortBy(_._1)
    assert(vocRead == vocDirect)
    val ids1 = idRows(m1, Bpe.readVocab(spark, table))

    // drifted corpus -> refreshed tokenizer: new committed version, and
    // the served id stream changes (different merges AND char ids)
    val drifted = docs(1L -> "wide wide wider widest widest widest")
    val v2 = Bpe.tokenizerRefresh(drifted, table, numMerges = 6)
    assert(v2 > v1)
    val ids2 = idRows(Bpe.readMerges(spark, table),
      Bpe.readVocab(spark, table))
    assert(ids2 != ids1, "a refreshed tokenizer must change the id stream")

    // time travel: the superseded version reproduces the original ids
    val replay = idRows(Bpe.readMerges(spark, table, Some(v1)),
      Bpe.readVocab(spark, table, Some(v1)))
    assert(replay == ids1, "old tokenizer version must replay bit-for-bit")
  }

  test("bpeTrain on an empty or pairless corpus returns zero merges") {
    assert(Bpe.bpeTrain(docs(), numMerges = 3).isEmpty)
    // single-char words have no adjacent pairs
    assert(Bpe.bpeTrain(docs(1L -> "a b a b"), numMerges = 3).isEmpty)
  }

  test("segment with no merges counts characters") {
    val out = Bpe.segment(docs(1L -> "ab cde"), Seq.empty)
      .as[(Long, Int, Int, String)].head()
    assert(out._2 == 2 && out._3 == 5)
  }
}
