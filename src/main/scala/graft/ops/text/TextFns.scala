package graft.ops.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column-level text primitives. All codegen'd built-ins — no UDFs —
  * so they stay inside whole-stage codegen and need no shuffle (SURVEY.md
  * §7.4 "shuffle-minimal" posture: per-document work is embarrassingly
  * parallel map work).
  */
object TextFns {

  /** Whitespace tokenization (single-space contract of the synthetic docs). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles as an array column, computed with higher-order
    * functions (no explode, no shuffle). Docs shorter than n shingle to an
    * empty array. 1-based `sequence` start mirrors the SQL oracle exactly.
    * Built from O(1) `element_at` lookups — `slice` would copy an n-element
    * array per shingle, which measurably drags the dedup pipeline.
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + lit(o))): _*)))
      .otherwise(array().cast("array<string>"))

  /** Word n-gram shingle HASHES from a pre-hashed token array (one
    * xxhash64 per token, done by the caller as its own staged projection):
    * each shingle is the chained xxhash64 of its n token hashes — fixed
    * 8-byte inputs, no per-shingle string allocation. ~3× cheaper than
    * `xxhash64(concat_ws(" ", ...))` on the dedup pipelines where shingle
    * identity is internal (the exact-Jaccard verify is over these longs;
    * 64-bit collisions are negligible at any realistic cardinality).
    * Same empty-array contract as [[shingles]].
    */
  def hashedShingles(tokenHashes: Column, n: Int): Column =
    when(size(tokenHashes) >= n,
      transform(sequence(lit(1), size(tokenHashes) - lit(n - 1)),
        i => xxhash64((0 until n).map(o => element_at(tokenHashes, i + lit(o))): _*)))
      .otherwise(array().cast("array<bigint>"))

  /** BPE-ish sub-token split: letter runs, digit runs, single punctuation. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  /** Count of regex matches (codegen'd; used for stopword/punct ratios). */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))
}
