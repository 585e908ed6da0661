package graft.ops.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import TextFns._

/** Byte-pair-encoding tokenizer TRAINING — the missing piece between the
  * corpus operators (vocab, token counts) and an actual subword
  * vocabulary: learn the merge table that turns characters into subword
  * units (Sennrich et al., ACL 2016 — the algorithm behind the GPT-2/
  * RoBERTa/Llama tokenizer families).
  *
  * Scale design: the training state is the DISTINCT-WORD table (word,
  * count, symbol array), not the token stream — the standard trick
  * (sentencepiece, HF tokenizers): the corpus is scanned ONCE for word
  * counts, and every merge iteration runs over the vocabulary-sized
  * state, which is orders of magnitude smaller than the corpus and
  * independent of document count. Each iteration is one
  * map-side-combinable pair-count aggregate (adjacent symbol pairs
  * weighted by word count), one driver-side argmax of a single row
  * (bounded collect), and one map-only merge application — the
  * O(vocab) greedy fold below, with `localCheckpoint` truncating
  * lineage per round exactly like Dedup.clusterComponents.
  */
object Bpe {

  /** Greedy left-to-right application of ONE merge (a,b)→ab to a symbol
    * array: scan symbols, and whenever the accumulator ends with `a` and
    * the next symbol is `b`, replace the tail with the merged token.
    * This fold is exactly Sennrich's regex-replace semantics: a token
    * produced by a merge never serves as the LEFT side of another match
    * in the same pass (the merged tail a+b can only equal `a` if `b`
    * were empty), and overlapping runs resolve left-to-right
    * ([a,a,a] merging (a,a) → [aa, a]). Interpreted HOF, run over the
    * vocabulary-sized state — the documented quantize-pass trade.
    */
  private[graft] def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) >= 1 && element_at(acc, -1) === lit(a) && (x === lit(b)),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Learn `numMerges` BPE merges from the corpus. Deterministic: the
    * winning pair each round is the highest weighted count with a
    * lexicographic (lhs, rhs) tie-break — no RNG, no partition-order
    * dependence (the count aggregate is exact, the argmax total-ordered).
    * Stops early when no pair reaches `minPairCount`.
    *
    * Output: (merge_rank, lhs, rhs, merged, pair_count) — rank 1 is the
    * first merge learned; replaying ranks in order reproduces the
    * segmentation (see [[segment]]).
    */
  def bpeTrain(documents: DataFrame, numMerges: Int,
               minPairCount: Long = 2): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    val spark = documents.sparkSession
    import spark.implicits._
    // ONE corpus scan: the token stream collapses to (word, cnt) — all
    // merge iterations below run on this vocabulary-sized state.
    var state = documents
      .select(explode(tokens(col("text"))).as("word"))
      // empty tokens (multi-spaced / empty text) carry zero symbols and
      // can never merge; they are filtered HERE and in the oracle's wc
      // CTE alike so the trained state never carries a '' row the two
      // engines would segment differently
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(col("word"), col("cnt"),
        filter(split(col("word"), ""), e => e =!= "").as("syms"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var exhausted = false
    try while (rank <= numMerges && !exhausted) {
      val s = col("syms")
      val best = state
        .filter(size(s) >= 2)
        .select(col("cnt"),
          explode(transform(sequence(lit(1), size(s) - 1), i =>
            struct(element_at(s, i).as("a"),
              element_at(s, i + lit(1)).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("c"))
        .filter(col("c") >= minPairCount)
        .orderBy(desc("c"), asc("a"), asc("b"))
        .limit(1).collect() // bounded: exactly one row
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((rank, a, b, a + b, c))
        // localCheckpoint per round: bounds lineage AND stops later
        // rounds from replaying every earlier merge fold. The superseded
        // round's blocks are freed eagerly (clusterComponents' pattern) —
        // otherwise every round pins another vocab-sized copy until the
        // session ends.
        val next = state
          .withColumn("syms", applyMerge(col("syms"), a, b))
          .localCheckpoint()
        graft.unpersistCheckpoint(state)
        state = next
        rank += 1
      }
    } finally graft.unpersistCheckpoint(state) // free blocks even on failure
    merges.result()
      .toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
  }

  /** Apply a learned merge list to the corpus: per-token character split,
    * then every merge replayed in rank order — the reference
    * segmentation. Empty tokens (multi-spaced text) are dropped, the
    * [[bpeTrain]] / oracle-wc contract: n_tokens counts NONEMPTY
    * whitespace tokens. Output per document: whitespace token count, BPE
    * token count, and an md5 fingerprint of the full space-joined
    * segmentation (enough to verify exact subword content without
    * shipping the arrays — the chunk_fp convention).
    *
    * This replay chains one interpreted fold per merge over the full
    * token stream — correct but O(merges · tokens): it is the
    * VERIFICATION path (the oracle replays the identical folds).
    * [[encode]] is the serving path — the compiled-automaton encoder
    * with per-word cost independent of merge count — and BpeSpec pins
    * the two equal on every corpus.
    */
  def segment(documents: DataFrame,
              merges: Seq[(String, String)]): DataFrame = {
    val charsOf: Column => Column =
      w => filter(split(w, ""), e => e =!= "")
    val toks = filter(tokens(col("text")), t => t =!= "")
    val segmented = merges.foldLeft[Column](transform(toks, charsOf)) {
      case (acc, (a, b)) => transform(acc, w => applyMerge(w, a, b))
    }
    documents
      .withColumn("seg", segmented)
      .select(
        col("doc_id"),
        size(col("seg")).as("n_tokens"),
        aggregate(col("seg"), lit(0),
          (acc, w) => acc + size(w)).as("n_bpe_tokens"),
        md5(concat_ws(" ", flatten(col("seg")))).as("bpe_fp"))
  }

  /** The learned merge table COMPILED for serving: an Aho–Corasick
    * automaton over the merged strings, built once on the driver and
    * broadcast. Matching a word against the automaton yields exactly
    * the merges that can ever fire on it — a token is always a
    * contiguous substring of its word, so merge (a,b) can only apply if
    * a+b occurs in the word — and replaying just those, in rank order,
    * is observably identical to replaying the full table ([[segment]]'s
    * semantics; skipped merges are no-ops by construction). Per-word
    * cost is O(len + occurring-merges · len), INDEPENDENT of vocabulary
    * size — the property that makes a 30k-merge tokenizer servable
    * where the fold chain is O(merges · tokens).
    */
  private[graft] final class MergeAutomaton(
      val merges: Array[(String, String)]) extends Serializable {
    import scala.collection.mutable
    private val children =
      mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    private val outs = mutable.ArrayBuffer(List.empty[Int])
    merges.zipWithIndex.foreach { case ((a, b), rank) =>
      var node = 0
      (a + b).foreach { c =>
        node = children(node).getOrElseUpdate(c, {
          children += mutable.HashMap.empty[Char, Int]
          outs += Nil
          children.size - 1
        })
      }
      outs(node) ::= rank
    }
    private val fail = new Array[Int](children.size)
    locally { // classic BFS fail-link construction
      val queue = mutable.Queue.empty[Int]
      children(0).values.foreach { v => fail(v) = 0; queue += v }
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        outs(u) = outs(u) ++ outs(fail(u))
        children(u).foreach { case (c, v) =>
          var f = fail(u)
          while (f != 0 && !children(f).contains(c)) f = fail(f)
          fail(v) = children(f).getOrElse(c, 0)
          queue += v
        }
      }
    }

    /** Ranks of every merge whose merged string occurs in `word`,
      * ascending — the word's full replay schedule.
      */
    private def candidateRanks(word: String): Array[Int] = {
      val acc = mutable.SortedSet.empty[Int]
      var node = 0
      var i = 0
      while (i < word.length) {
        val c = word.charAt(i)
        while (node != 0 && !children(node).contains(c)) node = fail(node)
        node = children(node).getOrElse(c, 0)
        outs(node).foreach(acc += _)
        i += 1
      }
      acc.toArray
    }

    /** [[applyMerge]]'s greedy left-to-right fold, in JVM arrays. */
    private def applyOne(syms: Array[String], a: String,
                         b: String): Array[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        val x = syms(i)
        if (out.nonEmpty && out.last == a && x == b)
          out(out.length - 1) = a + b
        else out += x
        i += 1
      }
      out.toArray
    }

    /** Segment one word: code-point split (the exact split(w, "")
      * semantics), then the word's candidate merges in rank order.
      */
    def encodeWord(word: String): Array[String] = {
      var syms = word.split("").filter(_.nonEmpty)
      candidateRanks(word).foreach { r =>
        val (a, b) = merges(r)
        syms = applyOne(syms, a, b)
      }
      syms
    }
  }

  /** Serving-path encoder — [[segment]]'s contract at automaton speed:
    * the merge table compiles to a broadcast [[MergeAutomaton]], each
    * partition segments its documents through a local word memo (word
    * frequencies are Zipfian — the overwhelming share of tokens hit the
    * memo), and per-word work does not grow with merge count. Output is
    * IDENTICAL to [[segment]] row for row — same (doc_id, n_tokens,
    * n_bpe_tokens, bpe_fp) schema, same md5-of-UTF-8 fingerprint — so
    * the training-CTE oracle verifies this path too. Pure map work: no
    * shuffle, applies unchanged to streams.
    */
  def encode(documents: DataFrame,
             merges: Seq[(String, String)]): DataFrame = {
    val bc = documents.sparkSession.sparkContext
      .broadcast(new MergeAutomaton(merges.toArray))
    fingerprintDocs(documents, () => {
      val auto = bc.value
      memoized(auto.encodeWord)
    }).withColumnRenamed("fp", "bpe_fp")
  }

  /** Entry cap for the per-partition word memo in [[encode]]/
    * [[encodeIds]]. Word frequencies are Zipfian, so the memo's hot head
    * absorbs the overwhelming share of tokens — but a partition with a
    * heavy DISTINCT-word tail (URLs, hashes, code) would otherwise grow
    * the map for the task's whole lifetime, unbounded executor memory on
    * the 100 TB posture the encoder targets.
    */
  private val MemoCap = 1 << 16

  /** The bounded per-partition word memo: clear-on-cap (misses only
    * recompute `f`, and the Zipfian hot head re-enters within a few
    * hundred tokens of a clear, so the fast path survives; an LRU would
    * buy little over that for its per-hit bookkeeping cost).
    */
  private def memoized(f: String => Array[String]): String => Array[String] = {
    val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
    w => memo.getOrElse(w, {
      if (memo.size >= MemoCap) memo.clear()
      val r = f(w)
      memo.update(w, r)
      r
    })
  }

  /** The shared partition loop of [[encode]] and [[encodeIds]]: one
    * null-text/word-split/fingerprint contract in one place (a fix to
    * either must hit both, or the two oracles drift apart).
    * `mkSegmenter` builds the per-partition word segmenter — returning
    * the RENDERED token strings (surface forms or ids) — so the memo
    * and the automaton/broadcast state live inside it.
    * Output: (doc_id, n_tokens, n_bpe_tokens, fp).
    */
  private def fingerprintDocs(documents: DataFrame,
      mkSegmenter: () => (String => Array[String])): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        val segOf = mkSegmenter()
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, text) =>
          if (text == null)
            // segment's null contract: size/aggregate of a null seg are
            // null; concat_ws skips nulls, so the fp is md5 of ""
            (id, None: Option[Int], None: Option[Int], md5Hex(md, ""))
          else {
            val words = text.split(" ", -1).filter(_.nonEmpty)
            var nSeg = 0
            val sb = new java.lang.StringBuilder
            words.foreach { w =>
              val seg = segOf(w)
              nSeg += seg.length
              seg.foreach { t =>
                if (sb.length > 0) sb.append(' ')
                sb.append(t)
              }
            }
            (id, Some(words.length), Some(nSeg), md5Hex(md, sb.toString))
          }
        }
      }.toDF("doc_id", "n_tokens", "n_bpe_tokens", "fp")
  }

  private def md5Hex(md: java.security.MessageDigest, s: String): String = {
    md.reset()
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Per-language tokenizer FERTILITY — subwords per whitespace word,
    * the standard tokenizer-evaluation statistic (a language whose
    * fertility under a shared vocabulary is 2× another's pays 2× the
    * sequence length for the same text; multilingual-vocab sizing reads
    * exactly this table). One [[encode]] pass + one lang join + one
    * combinable aggregate; the ratio is a single double division of
    * exact longs (engine-portable). Output: (lang, n_docs, n_words,
    * n_subwords, fertility).
    */
  def fertility(documents: DataFrame,
                merges: Seq[(String, String)]): DataFrame =
    encode(documents, merges)
      .join(documents.select("doc_id", "lang"), "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("n_words"),
        sum(col("n_bpe_tokens").cast("long")).as("n_subwords"))
      .withColumn("fertility",
        col("n_subwords").cast("double") / col("n_words"))

  /** The serving VOCABULARY a trained merge table induces — what a model
    * pipeline actually consumes: base symbols (the corpus's distinct
    * characters, sorted) take ids 0..C-1, merged tokens follow in rank
    * order. A merged string already present (two merges can produce the
    * same token — e.g. "ab"+"c" and "a"+"bc" both → "abc") keeps its
    * FIRST id and later producers are skipped, so token → id is a
    * function. The id table is alphabet+vocab-sized (the one bounded
    * collect); at 100 TB it is a broadcast artifact, like the merge
    * table itself. Character order: base symbols sort by CODE POINT —
    * each is one code point by construction (the split(w, "")
    * semantics), and code-point order equals the oracle's binary UTF-8
    * collation on every input (plain JVM string order would diverge
    * past the BMP, where UTF-16 puts surrogates below U+E000).
    *
    * Output: (token_id, token, kind = 'char' | 'merge').
    */
  def vocab(documents: DataFrame,
            merges: Seq[(String, String)]): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val chars = documents
      .select(explode(tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .select(explode(filter(split(col("word"), ""), c => c =!= "")).as("c"))
      .distinct().as[String].collect() // bounded: alphabet-sized
      .sortBy(c => c.codePointAt(0))
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    chars.foreach(seen += _)
    val out = Seq.newBuilder[(Int, String, String)]
    chars.zipWithIndex.foreach { case (c, i) => out += ((i, c, "char")) }
    merges.foreach { case (a, b) =>
      val m = a + b
      if (seen.add(m)) out += ((seen.size - 1, m, "merge"))
    }
    out.result().toDF("token_id", "token", "kind")
  }

  /** [[encode]] down to MODEL INPUT: the id sequence under [[vocab]].
    * Same broadcast automaton + per-partition word memo; the id map
    * rides in the same broadcast. Output per document: subword count
    * and an md5 fingerprint of the space-joined id sequence (the
    * bpe_fp convention, over ids instead of surface forms — enough to
    * verify the exact model input without shipping the arrays).
    * Unknown symbols cannot occur when the vocab derives from the
    * corpus being encoded; on foreign text a missing char maps to -1
    * (the conventional UNK sentinel, documented rather than silent).
    */
  def encodeIds(documents: DataFrame, merges: Seq[(String, String)],
                vocabTable: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val ids = vocabTable.select(col("token"), col("token_id"))
      .as[(String, Int)].collect().toMap // bounded: vocab-sized
    val bc = spark.sparkContext.broadcast(
      (new MergeAutomaton(merges.toArray), ids))
    fingerprintDocs(documents, () => {
      val (auto, idOf) = bc.value
      memoized(w =>
        auto.encodeWord(w).map(t => idOf.getOrElse(t, -1).toString))
    }).select(col("doc_id"), col("n_bpe_tokens"), col("fp").as("ids_fp"))
  }

  /** Train a tokenizer on `documents` and COMMIT it as a versioned
    * [[graft.io.Manifest]] snapshot — the artifact boundary a real
    * pipeline has between training and serving: train once, serve from
    * the committed snapshot in any later session, and time-travel
    * superseded versions so every historical id stream stays
    * reproducible bit-for-bit (the SemDeDup centroid-model pattern,
    * [[graft.ops.Clustering.centroidModelRefresh]], applied to the
    * tokenizer). ONE snapshot holds BOTH halves — the rank-ordered
    * merge table and the induced id vocabulary — because they are only
    * meaningful as a unit: ids shift whenever merges change, so
    * versioning them separately invites exactly the train/serve skew
    * this artifact exists to prevent. Vocab-sized rows, a broadcast
    * artifact at read time. Returns the committed version.
    */
  def tokenizerRefresh(documents: DataFrame, table: String,
                       numMerges: Int, minPairCount: Long = 2): Int = {
    val spark = documents.sparkSession
    import spark.implicits._
    val merges = bpeTrain(documents, numMerges, minPairCount)
      .orderBy("merge_rank")
      .as[(Int, String, String, String, Long)].collect().toSeq
    val voc = vocab(documents, merges.map(m => (m._2, m._3)))
      .as[(Int, String, String)].collect().toSeq
    val rows: Seq[(String, Option[Int], Option[String], Option[String],
      Option[String], Option[Long], Option[Int], Option[String],
      Option[String])] =
      merges.map { case (r, l, rr, m, c) =>
        ("merge", Some(r), Some(l), Some(rr), Some(m), Some(c),
          None, None, None)
      } ++
        voc.map { case (id, tok, kind) =>
          ("vocab", None, None, None, None, None, Some(id), Some(tok),
            Some(kind))
        }
    graft.io.Manifest.write(
      rows.toDF("part", "merge_rank", "lhs", "rhs", "merged",
        "pair_count", "token_id", "token", "kind"), table)
  }

  private def tokenizerSnapshot(spark: SparkSession, table: String,
                                version: Option[Int]): DataFrame =
    version match {
      case Some(v) => graft.io.Manifest.readVersion(spark, table, v)
      case None    => graft.io.Manifest.read(spark, table)
    }

  /** The committed tokenizer's merge list in rank order — the exact
    * `Seq` every serving entry point ([[encode]]/[[encodeIds]]/
    * [[segment]]/[[fertility]]) takes, read back from the snapshot so
    * serving never depends on still having the training corpus (or the
    * training session). Current version by default; pass `version` to
    * replay a superseded tokenizer. Bounded collect, merge-table-sized.
    */
  def readMerges(spark: SparkSession, table: String,
                 version: Option[Int] = None): Seq[(String, String)] = {
    import spark.implicits._
    tokenizerSnapshot(spark, table, version)
      .filter(col("part") === "merge").orderBy("merge_rank")
      .select("lhs", "rhs").as[(String, String)].collect().toSeq
  }

  /** The committed tokenizer's id vocabulary — [[vocab]]'s
    * (token_id, token, kind) contract read from the snapshot instead of
    * rederived, so [[encodeIds]] under a given version reproduces that
    * version's model input exactly.
    */
  def readVocab(spark: SparkSession, table: String,
                version: Option[Int] = None): DataFrame =
    tokenizerSnapshot(spark, table, version)
      .filter(col("part") === "vocab")
      .select(col("token_id"), col("token"), col("kind"))
}
