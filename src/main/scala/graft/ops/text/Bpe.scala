package graft.ops.text

import org.apache.spark.sql.{Column, DataFrame}
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
    * segmentation. Output per document: whitespace token count, BPE
    * token count, and an md5 fingerprint of the full space-joined
    * segmentation (enough to verify exact subword content without
    * shipping the arrays — the chunk_fp convention).
    *
    * This replay chains one interpreted fold per merge over the full
    * token stream — correct but O(merges · tokens); a production encoder
    * at 100 TB compiles the merge table into a longest-match automaton
    * broadcast to executors. The training loop above is the scale path;
    * this replay is the verification path.
    */
  def segment(documents: DataFrame,
              merges: Seq[(String, String)]): DataFrame = {
    val charsOf: Column => Column =
      w => filter(split(w, ""), e => e =!= "")
    val segmented = merges.foldLeft[Column](
      transform(tokens(col("text")), charsOf)) {
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
}
