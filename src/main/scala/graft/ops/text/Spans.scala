package graft.ops.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextFns._

/** Substring-level (span) deduplication: find runs of `l` or more tokens
  * that repeat across documents, and optionally remove every repeat but
  * one. This is the span-granular complement to the whole-document dedup
  * family in [[Dedup]] — boilerplate headers, license blocks, and quoted
  * passages survive document-level near-dup (the containing docs differ)
  * but still flood a training corpus with verbatim repetition; the
  * published mitigation is exact substring dedup over the corpus
  * (suffix-array ExactSubstr in Lee et al., "Deduplicating Training Data
  * Makes Language Models Better", ACL 2022). A distributed suffix array
  * is not Spark-shaped; the equivalent fixed-granularity formulation is:
  * every duplicated maximal span is a union of duplicated `l`-token
  * windows, so sliding-window fingerprints + per-doc interval merge
  * recover maximal duplicated regions with only embarrassingly-parallel
  * map work plus one aggregation keyed on the window hash.
  *
  * Scale posture (100 TB): window fingerprinting is per-document map work
  * (codegen'd HOFs — no UDFs, no explode of token rows). The shuffles
  * are (a) the window table keyed on the 64-bit gram hash — one ~24-byte
  * row per token, never the text; (b) the hash-join of windows against
  * the duplicated-gram set (AQE broadcasts it when the duplicated
  * fraction is small, the common case); (c) the per-doc interval merge
  * keyed on doc_id. A viral span (site chrome shared by millions of
  * pages) makes a hot gram hash — the groupBy side is safe (partial
  * aggregation), and the join side skew is AQE-splittable because the
  * hits table only carries (doc_id, pos). Reference behavior anchor:
  * the repetition rule at README.md:134-143 of the reference counts
  * duplicate n-grams per document; this operator is the cross-document
  * extension of that check.
  */
object Spans {

  /** Maximal cross-document duplicated token spans.
    *
    * A window of `l` consecutive tokens is *duplicated* when its exact
    * token sequence occurs in at least `minDocs` distinct documents.
    * Overlapping and adjacent duplicated windows within a document merge
    * into maximal spans (gaps-and-islands over window start positions:
    * consecutive hits at distance ≤ `l` chain into one island, so a
    * duplicated run of any length ≥ `l` comes back as ONE row).
    *
    * Output: (doc_id, span_start, span_end, span_tokens), positions
    * 1-based inclusive. Integer-only columns — bit-exact in any engine.
    *
    * Window hashing is xxhash64 over the joined token run: 64-bit
    * collisions are negligible at corpus scale (the DuckDB oracle uses
    * md5 — both sides only use hash EQUALITY, so the results agree).
    */
  def dupSpans(documents: DataFrame, l: Int = 8, minDocs: Int = 2): DataFrame = {
    // sequence(1, n) with n < 1 would generate a DESCENDING sequence in
    // Spark — the length guard is load-bearing, not cosmetic.
    val toks = documents
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= l)
    val wins = toks
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), size(col("toks")) - l + 1)).as("pos"))
      .select(col("doc_id"), col("pos"),
        xxhash64(concat_ws(" ", slice(col("toks"), col("pos"), lit(l))))
          .as("gram"))
    val dup = wins.groupBy("gram")
      .agg(count_distinct(col("doc_id")).as("ndocs"))
      .where(col("ndocs") >= minDocs)
      .select("gram")
    val hits = wins.join(dup, "gram").select("doc_id", "pos")

    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val prev = lag(col("pos"), 1).over(byDoc)
    hits
      .withColumn("brk",
        when(prev.isNull || col("pos") > prev + l, 1).otherwise(0))
      .withColumn("island", sum(col("brk")).over(byDoc))
      .groupBy("doc_id", "island")
      .agg(min(col("pos")).as("span_start"), max(col("pos")).as("max_pos"))
      .select(col("doc_id"), col("span_start"),
        (col("max_pos") + l - 1).as("span_end"),
        (col("max_pos") + l - col("span_start")).as("span_tokens"))
  }

  /** Apply-side of span dedup: remove duplicated spans, keeping the first
    * occurrence of each distinct span content.
    *
    * Spans with identical token content (same content fingerprint) form a
    * group; the occurrence with the smallest (doc_id, span_start) is
    * canonical and keeps its text, every other occurrence is deleted from
    * its document. Maximal spans that merged differently in different
    * docs (a doc with a LONGER duplicated region than its peers) have
    * distinct fingerprints and each group keeps its own first occurrence —
    * deletion never orphans content that exists nowhere else.
    *
    * Output: (doc_id, removed_tokens, clean_text) for EVERY input
    * document (untouched docs pass through with removed_tokens = 0; a
    * fully-duplicated doc comes back with clean_text = ""). The rebuild
    * is a per-doc indexed HOF filter over the token array — content
    * never shuffles on the span side; only (doc_id, start, end) triples
    * move, and the final join back to documents is keyed on doc_id.
    */
  def despan(documents: DataFrame, l: Int = 8, minDocs: Int = 2): DataFrame = {
    val spans = dupSpans(documents, l, minDocs)
    val toks = documents.select(col("doc_id"), tokens(col("text")).as("toks"))
    val fp = spans.join(toks, "doc_id")
      .select(col("doc_id"), col("span_start"), col("span_end"),
        md5(concat_ws(" ",
          slice(col("toks"), col("span_start"), col("span_tokens")))).as("span_fp"))
    val byFp = Window.partitionBy("span_fp").orderBy("doc_id", "span_start")
    val rm = fp
      .withColumn("rn", row_number().over(byFp))
      .where(col("rn") > 1)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("span_start").as("s"), col("span_end").as("e")))
        .as("rm"))

    toks.join(rm, Seq("doc_id"), "left")
      .select(col("doc_id"), col("toks"),
        coalesce(col("rm"), array().cast("array<struct<s:int,e:int>>")).as("rm"))
      .withColumn("clean", filter(col("toks"),
        (tk, i) => !exists(col("rm"),
          r => (i + 1) >= r.getField("s") && (i + 1) <= r.getField("e"))))
      .select(col("doc_id"),
        (size(col("toks")) - size(col("clean"))).as("removed_tokens"),
        array_join(col("clean"), " ").as("clean_text"))
  }

  /** Span-level decontamination: REDACT every maximal train-side token
    * run whose `l`-token windows appear verbatim anywhere in the
    * benchmark set, instead of dropping whole documents
    * ([[graft.ops.text.Corpus.decontaminate]]'s doc-level gate) — the
    * surgical policy when a long document quotes one benchmark item but
    * is otherwise good training data. Unlike [[despan]] there is NO
    * "first occurrence kept": benchmark text must never survive in the
    * training corpus, so every contaminated span redacts.
    *
    * Same machinery as [[dupSpans]]/[[despan]]: window hashes, hash-
    * equality hits, gaps-and-islands merge to maximal spans, per-doc
    * indexed HOF rebuild. Output: (doc_id, removed_tokens, clean_text)
    * for EVERY train document (clean docs pass through unchanged).
    *
    * Scale: the benchmark window table BROADCASTS — eval sets are small
    * by definition (swap in [[Corpus.decontaminateBloom]]'s sketch as a
    * pre-filter if a benchmark union ever outgrows the broadcast
    * threshold); the train side is one window explode and two
    * doc_id-keyed hops — document content never shuffles on the span
    * side, only (doc_id, pos) pairs move.
    */
  def decontaminateSpans(train: DataFrame, benchmark: DataFrame,
                         l: Int = 8): DataFrame = {
    val toks = train.select(col("doc_id"), tokens(col("text")).as("toks"))
    val tw = toks.where(size(col("toks")) >= l)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), size(col("toks")) - l + 1)).as("pos"))
      .select(col("doc_id"), col("pos"),
        xxhash64(concat_ws(" ", slice(col("toks"), col("pos"), lit(l))))
          .as("gram"))
    val bg = benchmark.select(tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= l)
      .select(col("toks"),
        explode(sequence(lit(1), size(col("toks")) - l + 1)).as("pos"))
      .select(xxhash64(concat_ws(" ", slice(col("toks"), col("pos"), lit(l))))
        .as("gram"))
      .distinct()
    val hits = tw.join(broadcast(bg), "gram").select("doc_id", "pos")

    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val prev = lag(col("pos"), 1).over(byDoc)
    val rm = hits
      .withColumn("brk",
        when(prev.isNull || col("pos") > prev + l, 1).otherwise(0))
      .withColumn("island", sum(col("brk")).over(byDoc))
      .groupBy("doc_id", "island")
      .agg(min(col("pos")).as("s"), (max(col("pos")) + l - 1).as("e"))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("s"), col("e"))).as("rm"))

    toks.join(rm, Seq("doc_id"), "left")
      .select(col("doc_id"), col("toks"),
        coalesce(col("rm"), array().cast("array<struct<s:int,e:int>>")).as("rm"))
      .withColumn("clean", filter(col("toks"),
        (tk, i) => !exists(col("rm"),
          r => (i + 1) >= r.getField("s") && (i + 1) <= r.getField("e"))))
      .select(col("doc_id"),
        (size(col("toks")) - size(col("clean"))).as("removed_tokens"),
        array_join(col("clean"), " ").as("clean_text"))
  }
}
