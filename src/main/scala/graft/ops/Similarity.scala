package graft.ops

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a linear scan of the corpus against
  * a small broadcast query set. The per-(query, candidate) scores are
  * reduced map-side by a custom `Aggregator` keeping only the k best per
  * query inside each partition, so the shuffle carries ≤ k rows per
  * (query, partition) instead of |corpus| rows per query. At 100 TB that is
  * the difference between shuffling kilobytes and shuffling the corpus.
  *
  * Scale path beyond brute force: `hyperplaneBuckets` gives random-
  * hyperplane (SimHash-family) LSH bucketing — corpus and queries hash to
  * sign-bit buckets, candidates are generated only inside matching buckets
  * (equi-join on bucket id, multi-probe via bit flips for recall). Brute
  * force stays the correctness oracle; the bucketed form is the 100 TB ANN.
  *
  * Numeric policy (oracle parity): dot products and squared norms are
  * sequential left folds over the array in element order — Spark's
  * `aggregate` HOF and DuckDB's `list_reduce` both evaluate strictly
  * left-to-right, so the IEEE operation sequence (and hence every bit of
  * the result) is identical across engines. Note this is the one place the
  * graft.package decimal-sum policy does NOT apply: double→decimal
  * conversion itself is engine-dependent at the last unit (exact-expansion
  * rounding vs scaled-double rounding), so exact decimal terms would
  * *break* parity here, while the ordered fold keeps it.
  */
object Similarity {

  /** One scored candidate; `ord` sorts best-first (sim desc, id asc).
    * NaN similarity (a zero-norm vector that slipped past
    * [[embeddingStats]]) ranks FIRST, matching SQL-engine sort semantics
    * (Spark and the oracle both treat NaN as greater than every value,
    * so `sim DESC` puts it on top) — Scala's total ordering alone would
    * sort `-NaN` last and silently evict the row the window/oracle form
    * ranks first.
    */
  case class Scored(id: Long, sim: Double)
  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) =>
      (if (s.sim.isNaN) Double.NegativeInfinity else -s.sim, s.id))

  /** Map-side-combinable top-k: buffers hold at most k candidates, so
    * partial aggregation bounds both memory and shuffle volume.
    */
  class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    require(k >= 1, s"top-k needs k >= 1, got $k") // fail at construction,
    // not as an executor-side empty.last crash mid-aggregate
    def zero: Seq[Scored] = Vector.empty
    def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] =
      if (buf.size < k) (buf :+ x).sorted(ord)
      else if (ord.lt(x, buf.last)) (buf.init :+ x).sorted(ord)
      else buf
    def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      (a ++ b).sorted(ord).take(k)
    def finish(r: Seq[Scored]): Seq[Scored] = r
    def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
    def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  }

  /** Ordered left-fold dot product: per-element double products (exact for
    * float inputs — 24-bit × 24-bit mantissas fit in 53 bits), summed
    * strictly left-to-right. Deterministic and engine-portable. Backed by
    * the codegen'd [[graft.functions.DotOrdered]] expression — identical
    * IEEE sequence to the aggregate/zip_with HOF form, ~100× faster.
    */
  private def dotOrdered(a: Column, b: Column): Column =
    graft.functions.DotOrdered(a, b)

  /** Cosine similarity of two float-array columns (ordered-fold inner sums). */
  def cosine(a: Column, b: Column): Column =
    dotOrdered(a, b) /
      (sqrt(dotOrdered(a, a)) * sqrt(dotOrdered(b, b)))

  /** Embedding-table health check — the validation pass run before
    * spending a cluster on ANN indexing or near-dup: per label, vector
    * count, dimensionality spread (min ≠ max ⇒ ragged table, which would
    * silently truncate ordered dot products), zero vectors (cosine is
    * undefined — they poison normalization), non-finite elements, and the
    * norm range. Pure map + one small aggregate; no pairwise work.
    *
    * Deliberately no mean norm: min/max/counts are order-independent and
    * bit-identical cross-engine, while any double summation is
    * order-dependent and a decimal detour is off-limits here (see the
    * module's numeric-policy note) — a mean would cost hash parity for
    * little diagnostic value over the range.
    */
  def embeddingStats(embeddings: DataFrame): DataFrame = {
    val norm = sqrt(dotOrdered(col("embedding"), col("embedding")))
    val nonfinite = exists(col("embedding"), x =>
      isnan(x) || x === lit(Float.PositiveInfinity) || x === lit(Float.NegativeInfinity))
    embeddings
      .select(col("label"), col("embedding").isNull.as("is_null"),
        // explicit null guard: legacy sizeOfNull confs return -1 for
        // size(NULL), which would poison min_dim instead of being skipped
        when(col("embedding").isNull, lit(null))
          .otherwise(size(col("embedding"))).as("dim"),
        norm.as("norm"), nonfinite.as("bad"))
      .groupBy("label")
      .agg(
        count(lit(1)).as("n_vectors"),
        // NULL vectors are their own defect class (n_zero/n_nonfinite
        // must not silently absorb or miss them); dim/norm aggregates
        // skip them via null propagation
        sum(when(col("is_null"), 1L).otherwise(0L)).as("n_null"),
        min(col("dim")).as("min_dim"),
        max(col("dim")).as("max_dim"),
        sum(when(col("norm") === 0.0, 1L).otherwise(0L)).as("n_zero"),
        sum(when(col("bad"), 1L).otherwise(0L)).as("n_nonfinite"),
        min(col("norm")).as("min_norm"),
        max(col("norm")).as("max_norm"))
  }

  /** Majority-vote label agreement over ANY neighbor table — the standard
    * embedding-space label audit: a vector whose k nearest neighbors
    * mostly carry a different label is either mislabeled or sits on a
    * class boundary, and LLM-data runs use exactly this signal to rank
    * label noise for review. Composable by construction: feed it
    * [[bruteForceTopK]] output for the exact audit, or [[annTopK]] /
    * [[ivfTopK]] output when the corpus is too big to brute-force — the
    * vote is oblivious to how neighbors were found.
    *
    * Ties break to the smallest label (deterministic, engine-portable).
    * Output: (vec_id, own_label, knn_label, n_votes, is_agree).
    *
    * Shape: one equi-join attaching neighbor labels (AQE broadcasts the
    * label table when it fits), then two map-side-combinable aggregates
    * keyed on q_id — rows in = n·k, never n². No windows.
    */
  def labelAgreement(neighbors: DataFrame, labeled: DataFrame): DataFrame = {
    val votes = neighbors
      .join(labeled.select(col("vec_id").as("neighbor_id"),
        col("label").as("n_label")), "neighbor_id")
      .groupBy("q_id", "n_label")
      .agg(count(lit(1)).as("n_votes"))
      .groupBy("q_id")
      // min over (−votes, label): most votes first, then the SMALLEST
      // label — lexicographic struct order works for ANY orderable label
      // type (negating the label itself would null out on strings and
      // silently break the tie contract for non-numeric label columns)
      .agg(min_by(struct(col("n_label"), col("n_votes")),
        struct((-col("n_votes")).as("nv"), col("n_label"))).as("m"))
      .select(col("q_id"), col("m.n_label").as("knn_label"),
        col("m.n_votes").as("n_votes"))
    votes
      .join(labeled.select(col("vec_id").as("q_id"),
        col("label").as("own_label")), "q_id")
      .select(col("q_id").as("vec_id"), col("own_label"), col("knn_label"),
        col("n_votes"),
        (col("own_label") === col("knn_label")).as("is_agree"))
  }

  /** Exact self-kNN label audit: every vector against the full table,
    * self excluded, majority vote via [[labelAgreement]]. This is the
    * exactness BASELINE (O(n²) dot products, query side broadcast) —
    * at corpus scale run the same vote over [[annTopK]]/[[ivfTopK]]
    * neighbors instead; the brute-force form is for eval-sized label
    * sets and for measuring the ANN variants' audit recall.
    */
  def knnLabelAudit(embeddings: DataFrame, k: Int = 5): DataFrame = {
    val topk = udaf(new TopK(k))
    // Norms once per VECTOR, not per pair: cosine() inside the n² scan
    // would run three ordered dots per candidate; hoisting the two
    // self-dots cuts the hot loop's CPU 3x. sqrt(dot(v,v)) is the same
    // double wherever it's computed, so scores are unchanged bit-for-bit.
    val withNorm = embeddings.withColumn("nrm",
      sqrt(dotOrdered(col("embedding"), col("embedding"))))
    val queries = withNorm.select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val neighbors = withNorm
      .crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id")) // self never votes
      .withColumn("sim", dotOrdered(col("q_emb"), col("embedding")) /
        (col("q_nrm") * col("nrm")))
      .select(col("q_id"), col("vec_id").as("id"), col("sim"))
      .groupBy("q_id")
      .agg(topk(col("id"), col("sim")).as("topk"))
      .select(col("q_id"), explode(col("topk")).as("s"))
      .select(col("q_id"), col("s.id").as("neighbor_id"))
    labelAgreement(neighbors, embeddings)
  }

  /** Brute-force cosine top-k: for each row of `queries` (q_id, q_emb),
    * the k nearest corpus rows (vec_id, embedding) by cosine.
    * Output: (q_id, rank, neighbor_id, sim), rank 1-based best-first.
    *
    * Plan shape: BroadcastNestedLoopJoin (the deliberate linear scan) →
    * partial TopK per partition → single k-row-per-query shuffle → explode.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopK(k))
    // norms hoisted out of the n×q scan (one dot per pair, not three);
    // sqrt(dot(v,v)) is the same double wherever computed — scores are
    // bit-identical to the cosine() form
    corpus
      .withColumn("nrm", sqrt(dotOrdered(col("embedding"), col("embedding"))))
      .crossJoin(broadcast(queries
        .withColumn("q_nrm", sqrt(dotOrdered(col("q_emb"), col("q_emb"))))))
      .withColumn("sim", dotOrdered(col("q_emb"), col("embedding")) /
        (col("q_nrm") * col("nrm")))
      .select(col("q_id"), col("vec_id").as("id"), col("sim"))
      .groupBy("q_id")
      .agg(topk(col("id"), col("sim")).as("topk"))
      .select(col("q_id"), posexplode(col("topk")).as(Seq("pos", "s")))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rank"),
        col("s.id").as("neighbor_id"), col("s.sim").as("sim"))
  }

  /** Deterministic pseudo-random unit-free hyperplanes for LSH bucketing.
    * Public so the oracle-SQL generator can embed the SAME plane constants
    * as literals — both engines then compute identical sign bits.
    */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rng.nextGaussian())
  }

  /** Deterministic Gaussian random projection (Johnson–Lindenstrauss):
    * map `dim`-wide vectors to `outDim` coordinates y_j = x · g_j with
    * seed-derived Gaussian directions — the standard pre-ANN compression
    * when upstream embeddings are wider than the index needs (a 1024-d
    * encoder output projected to 64-d before bucketing/quantizing cuts
    * index scan bytes 16× while JL preserves pairwise geometry to
    * O(1/√outDim)). Pure map work: the projection matrix rides as
    * LITERALS (outDim × dim doubles — not even a broadcast), each output
    * coordinate is one ordered-fold dot, so the projection is
    * bit-reproducible cross-engine and composes with everything
    * downstream ([[quantizeEmbeddings]], [[hyperplaneBucket]],
    * [[ivfAssign]]) — the LSH bucketing here is itself the SIGN of this
    * projection. Output: input columns + `proj` (array<double>).
    */
  def randomProject(df: DataFrame, outDim: Int, dim: Int = 64,
                    seed: Long = 11L,
                    vecCol: String = "embedding"): DataFrame = {
    require(outDim >= 1, s"outDim must be >= 1, got $outDim")
    val planes = hyperplanes(outDim, dim, seed)
    df.withColumn("proj",
      array(planes.toIndexedSeq.map(p =>
        dotOrdered(col(vecCol), typedLit(p.toSeq))): _*))
  }

  /** Sign-bit LSH bucket id of an embedding column: bit i set iff
    * dot(embedding, plane_i) > 0. Embeddings with high cosine similarity
    * collide with high probability; bucket count = 2^nPlanes.
    *
    * INVARIANT: must stay bit-identical to `bucketFromDots(planeDots(
    * emb, ...))` — annTopK hashes the corpus side here and the query
    * side there, and any drift (e.g. `>= 0`, bit order) silently
    * collapses recall. The two are deliberately NOT unified: this form
    * is a codegen'd when/sum chain on the corpus-scale hot path, while
    * bucketFromDots works over the already-materialized dots array via
    * interpreted HOFs (fine on the query side, where the dots must exist
    * anyway for the probe margins). SimilaritySpec's ANN self-match test
    * fails on any desync (self stops colliding with its own bucket).
    */
  def hyperplaneBucket(emb: Column, nPlanes: Int, dim: Int, seed: Long = 42L): Column = {
    val planes = hyperplanes(nPlanes, dim, seed)
    planes.zipWithIndex.map { case (p, i) =>
      val dot = dotOrdered(emb, typedLit(p.toSeq))
      when(dot > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** The hyperplane dots a bucket id is derived from, as an array column —
    * shared by the bucket bits and the multi-probe margins so the nPlanes
    * ordered-fold dot products run once per row.
    */
  private def planeDots(emb: Column, nPlanes: Int, dim: Int, seed: Long): Column = {
    val planes = hyperplanes(nPlanes, dim, seed)
    array(planes.toIndexedSeq.map(p => dotOrdered(emb, typedLit(p.toSeq))): _*)
  }

  private def bitValues(nPlanes: Int): Column =
    typedLit((0 until nPlanes).map(i => 1L << i))

  private def bucketFromDots(dots: Column, nPlanes: Int): Column =
    aggregate(
      zip_with(dots, bitValues(nPlanes), (d, p) => when(d > 0, p).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)

  /** The `probes` bucket ids a query should search under multi-probe LSH
    * (Lv et al., VLDB'07, restricted to single-bit perturbations): the
    * query's own bucket first, then the buckets reached by flipping the
    * sign bit whose margin |dot(q, plane_i)| is smallest — the planes the
    * query sits closest to are exactly the bits a true near neighbor on
    * the other side most likely differs in — in increasing-margin order
    * (margin ties break to the lower bit index; deterministic). Distinct
    * by construction, so a downstream bucket equi-join never produces a
    * duplicate (query, candidate) pair.
    *
    * Self-contained column (dots recomputed per reference) — intended for
    * the small query side or diagnostics; [[annTopK]] stages the dots
    * through a projection so they run once per query row.
    */
  def probeBuckets(emb: Column, nPlanes: Int, dim: Int, seed: Long,
                   probes: Int): Column = {
    val dots = planeDots(emb, nPlanes, dim, seed)
    probesFromDots(dots, bucketFromDots(dots, nPlanes), nPlanes, probes)
  }

  private def probesFromDots(dots: Column, b0: Column, nPlanes: Int,
                             probes: Int): Column = {
    require(probes >= 1 && probes <= nPlanes + 1,
      s"probes=$probes outside [1, nPlanes+1=${nPlanes + 1}]")
    // (margin, bit) per plane; array_sort's struct order = margin asc then
    // bit asc, so the flip sequence is the least-confident bits first
    val ranked = array_sort(transform(dots, (d, i) =>
      struct(abs(d).as("m"), i.as("i"))))
    concat(array(b0), transform(slice(ranked, 1, probes - 1), s =>
      b0.bitwiseXOR(element_at(bitValues(nPlanes), s("i") + 1))))
  }

  /** LSH-bucketed ANN top-k: candidates only where query and corpus share a
    * bucket (equi-join on bucket id — a hash shuffle, never a cross join),
    * then exact cosine + TopK within candidates. Recall < 1.0 by
    * construction; the knobs trade it against candidate volume: raise
    * `nPlanes` to shrink buckets (each bit halves random collisions), raise
    * `probes` to search the query's `probes` most-likely buckets
    * ([[probeBuckets]] — its own plus minimal-margin bit flips). The
    * standard multi-probe configuration (more planes + a few probes) beats
    * single-probe recall at comparable candidate count — SimilaritySpec
    * measures exactly that against `bruteForceTopK`, the exactness
    * baseline this trades against. Corpus rows still carry ONE bucket
    * (the index is unchanged and partitionable by bucket at 100 TB);
    * only the query side fans out, by a factor of `probes`.
    */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nPlanes: Int = 8, dim: Int = 64, seed: Long = 42L,
              probes: Int = 1): DataFrame = {
    val topk = udaf(new TopK(k))
    val c = corpus.withColumn("bucket", hyperplaneBucket(col("embedding"), nPlanes, dim, seed))
    // dots staged through a projection: CollapseProject keeps the non-cheap
    // fold expressions from being re-inlined into each consumer, so the
    // nPlanes dot products run once per query row, not once per probe
    val q = queries
      .withColumn("_dots", planeDots(col("q_emb"), nPlanes, dim, seed))
      .withColumn("_b0", bucketFromDots(col("_dots"), nPlanes))
      .withColumn("bucket",
        explode(probesFromDots(col("_dots"), col("_b0"), nPlanes, probes)))
      .drop("_dots", "_b0")
    c.join(q, Seq("bucket"))
      .withColumn("sim", cosine(col("q_emb"), col("embedding")))
      .select(col("q_id"), col("vec_id").as("id"), col("sim"))
      .groupBy("q_id")
      .agg(topk(col("id"), col("sim")).as("topk"))
      .select(col("q_id"), posexplode(col("topk")).as(Seq("pos", "s")))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rank"),
        col("s.id").as("neighbor_id"), col("s.sim").as("sim"))
  }

  /** Embedding-cosine near-duplicate pairs, LSH-banded: hash every vector
    * to an `nPlanes`-bit hyperplane signature, band the signature, generate
    * candidates only inside matching (band_idx, band_val) buckets (equi-join
    * — never an all-pairs cross join), then verify candidates with exact
    * cosine and keep pairs >= threshold.
    *
    * Output: (vec_a, vec_b, sim), vec_a < vec_b. Recall < 1 by design —
    * a near-dup pair is missed iff every band has a flipped sign bit; with
    * r = nPlanes/bands bits per band and per-bit collision prob 1 - θ/π,
    * recall = 1 - (1 - (1-θ/π)^r)^bands. Raise `bands` (or lower `r`) for
    * recall, raise `r` for candidate pruning: at 100 TB the knob to turn is
    * r (each extra bit halves random-pair candidates). Price the banding
    * BEFORE paying for the verify with [[embedNearDupAudit]] — the sf1
    * sweep measured the defaults' blocking collapsing near 20k
    * direction-random vectors, and the audit detects exactly that for a
    * fraction of the verify's cost.
    */
  def embeddingNearDup(corpus: DataFrame, nPlanes: Int = 16, bands: Int = 4,
                       threshold: Double = 0.35, dim: Int = 64,
                       seed: Long = 7L): DataFrame = {
    require(nPlanes % bands == 0, s"nPlanes=$nPlanes not divisible by bands=$bands")
    val r = nPlanes / bands
    val mask = (1L << r) - 1
    val spark = corpus.sparkSession
    // Signature computation is the expensive per-row map stage (nPlanes
    // ordered-fold dot products); repartition for parallelism on few-file
    // inputs and pin — the band self-join and both verify joins reuse it
    // (release boundary: graft.CacheScope.release(spark)).
    // norm is precomputed per vector, not per pair: sim below is then
    // dot/(norm_a*norm_b) — the identical IEEE ops to cosine() (sqrt each,
    // then multiply), at a third of the per-candidate fold work.
    val bucketed = graft.CacheScope.pin(corpus
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
      .select(col("vec_id"), col("embedding"),
        hyperplaneBucket(col("embedding"), nPlanes, dim, seed).as("bucket"),
        sqrt(dotOrdered(col("embedding"), col("embedding"))).as("norm")))
    val bandCols = (0 until bands).map { j =>
      shiftright(col("bucket"), j * r).bitwiseAND(lit(mask))
    }
    val bandTable = bucketed
      .select(col("vec_id"), posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_val")))
    // shuffle_hash hints: the band table and the bucketed corpus must never
    // broadcast (driver collect of corpus-scale relations at 100 TB).
    val a = bandTable.select(col("band_idx"), col("band_val"), col("vec_id").as("vec_a"))
    val b = bandTable.select(col("band_idx"), col("band_val"), col("vec_id").as("vec_b"))
    val candidates = a.join(b.hint("shuffle_hash"), Seq("band_idx", "band_val"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b")
      .distinct()
    candidates
      .join(bucketed.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"),
        col("norm").as("norm_a")).hint("shuffle_hash"), "vec_a")
      .join(bucketed.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"),
        col("norm").as("norm_b")).hint("shuffle_hash"), "vec_b")
      .withColumn("sim", dotOrdered(col("emb_a"), col("emb_b")) / (col("norm_a") * col("norm_b")))
      .filter(col("sim") >= threshold)
      .select("vec_a", "vec_b", "sim")
  }

  /** The corpus hyperplane band table as a STANDALONE artifact —
    * (vec_id, band_idx, band_val), `bands` short rows per vector: the
    * embedding-space twin of [[graft.ops.text.Dedup.signatureTable]].
    * Commit via [[embedSignatureRefresh]], probe any committed version
    * through [[embeddingNearDupAgainstSigs]] — per ingest batch only
    * the batch computes its nPlanes dot products; corpus embeddings
    * are read for candidate ids alone.
    */
  def embedSignatures(corpus: DataFrame, nPlanes: Int = 16,
                      bands: Int = 4, dim: Int = 64,
                      seed: Long = 7L): DataFrame = {
    require(nPlanes % bands == 0, s"nPlanes=$nPlanes not divisible by bands=$bands")
    val r = nPlanes / bands
    val mask = (1L << r) - 1
    val spark = corpus.sparkSession
    val bandCols = (0 until bands).map { j =>
      shiftright(col("bucket"), j * r).bitwiseAND(lit(mask))
    }
    corpus
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
      .select(col("vec_id"),
        hyperplaneBucket(col("embedding"), nPlanes, dim, seed).as("bucket"))
      .select(col("vec_id"),
        posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_val")))
  }

  /** Sign-and-commit [[embedSignatures]] as a versioned Manifest
    * snapshot (the signatureRefresh idiom in embedding space).
    */
  def embedSignatureRefresh(corpus: DataFrame, table: String,
                            nPlanes: Int = 16, bands: Int = 4,
                            dim: Int = 64, seed: Long = 7L): Int =
    graft.io.Manifest.write(
      embedSignatures(corpus, nPlanes, bands, dim, seed), table)

  /** The band-registry MAINTENANCE step — the embedding twin of
    * [[graft.ops.text.Dedup.signatureUpdate]]: append an ACCEPTED
    * batch's own band rows (only the batch pays the nPlanes-fold
    * hashing; band values are per-vector, so append IS the merge —
    * same banding required) and commit the next version. Returns the
    * new version.
    */
  def embedSignatureUpdate(table: String, accepted: DataFrame,
                           nPlanes: Int = 16, bands: Int = 4,
                           dim: Int = 64, seed: Long = 7L,
                           tag: Option[String] = None): Int = {
    val spark = accepted.sparkSession
    val next = graft.io.Manifest.read(spark, table)
      .unionByName(embedSignatures(accepted, nPlanes, bands, dim, seed))
    tag match {
      case Some(t) => graft.io.Manifest.writeTagged(next, table, t)
      case None    => graft.io.Manifest.write(next, table)
    }
  }

  /** The band-registry DELETE step — the embedding twin of
    * [[graft.ops.text.Dedup.signatureRetract]]: drop removed vectors'
    * band rows (id-keyed anti-join; band values are per-vector, so the
    * anti-join IS the retraction) and commit the next version. The
    * removed-id set broadcasts; the registry never moves.
    */
  def embedSignatureRetract(table: String, removedIds: DataFrame): Int = {
    val spark = removedIds.sparkSession
    graft.io.Manifest.write(
      graft.io.Manifest.read(spark, table)
        .join(broadcast(removedIds.select(col("vec_id"))), Seq("vec_id"),
          "left_anti"),
      table)
  }

  /** Asymmetric embedding near-dup: flag INCOMING vectors that
    * near-duplicate an EXISTING corpus — [[graft.ops.text.Dedup.nearDupAgainst]]'s
    * embedding twin at band grain (the BATCH form of
    * [[graft.streaming.IncrementalStream]]'s embedNearDupStream;
    * [[graft.ops.Clustering.semanticDedupAgainst]] is the
    * cluster-first alternative). Output: (vec_inc, vec_corp, sim) for
    * every cross pair at or above `threshold` — no corpus×corpus
    * candidate generation at all.
    */
  def embeddingNearDupAgainst(corpus: DataFrame, incoming: DataFrame,
                              nPlanes: Int = 16, bands: Int = 4,
                              threshold: Double = 0.35, dim: Int = 64,
                              seed: Long = 7L): DataFrame =
    embeddingNearDupAgainstSigs(
      embedSignatures(corpus, nPlanes, bands, dim, seed), corpus, incoming,
      nPlanes, bands, threshold, dim, seed)

  /** [[embeddingNearDupAgainst]] served from a PERSISTED
    * [[embedSignatures]] registry (any Manifest version, same
    * (nPlanes, bands, seed)): only the incoming batch pays the
    * nPlanes-fold hashing; corpus embeddings are touched for candidate
    * vec_ids only (one left-semi join), with norms recomputed for just
    * those rows. Identical output to the inline form on the registry's
    * training corpus (SimilaritySpec pins the equality; the shared
    * oracle string proves the round-trip changes nothing).
    *
    * Scale posture: the registry is corpus-sized — always
    * shuffle_hash-joined, never broadcast; candidate pairs pinned
    * (read by the semi-join and the verify), batch-sized at steady
    * state.
    */
  def embeddingNearDupAgainstSigs(registry: DataFrame, corpus: DataFrame,
                                  incoming: DataFrame, nPlanes: Int = 16,
                                  bands: Int = 4, threshold: Double = 0.35,
                                  dim: Int = 64,
                                  seed: Long = 7L): DataFrame = {
    require(nPlanes % bands == 0, s"nPlanes=$nPlanes not divisible by bands=$bands")
    val r = nPlanes / bands
    val mask = (1L << r) - 1
    val spark = incoming.sparkSession
    val bucketedI = graft.CacheScope.pin(incoming
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
      .select(col("vec_id"), col("embedding"),
        hyperplaneBucket(col("embedding"), nPlanes, dim, seed).as("bucket"),
        sqrt(dotOrdered(col("embedding"), col("embedding"))).as("norm")))
    val bandCols = (0 until bands).map { j =>
      shiftright(col("bucket"), j * r).bitwiseAND(lit(mask))
    }
    val bandsI = bucketedI.select(col("vec_id"),
      posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_val")))
    val candidates = graft.CacheScope.pin(bandsI
      .select(col("band_idx"), col("band_val"), col("vec_id").as("vec_inc"))
      .join(registry
        .select(col("band_idx"), col("band_val"), col("vec_id").as("vec_corp"))
        .hint("shuffle_hash"), Seq("band_idx", "band_val"))
      .select("vec_inc", "vec_corp")
      .distinct())
    val touched = corpus.join(
      candidates.select(col("vec_corp").as("vec_id")).distinct(),
      Seq("vec_id"), "left_semi")
      .select(col("vec_id").as("vec_corp"), col("embedding").as("emb_b"),
        sqrt(dotOrdered(col("embedding"), col("embedding"))).as("norm_b"))
    candidates
      .join(bucketedI.select(col("vec_id").as("vec_inc"),
        col("embedding").as("emb_a"), col("norm").as("norm_a"))
        .hint("shuffle_hash"), "vec_inc")
      .join(touched.hint("shuffle_hash"), "vec_corp")
      .withColumn("sim",
        dotOrdered(col("emb_a"), col("emb_b")) / (col("norm_a") * col("norm_b")))
      .filter(col("sim") >= threshold)
      .select("vec_inc", "vec_corp", "sim")
  }

  /** Blocking-quality audit for [[embeddingNearDup]] — the candidate
    * census to run BEFORE paying for the verify join on an unknown
    * corpus (the [[graft.ops.Distribution.skewAudit]] pattern in LSH
    * space). Per band: bucket count, largest bucket, exact candidate
    * pairs the band would emit (Σ c·(c−1)/2 over its bucket sizes), and
    * candidates per vector — the collapse signal.
    *
    * Scale guidance (measured, sf1 sweep): a band with r bits splits a
    * DIRECTION-RANDOM corpus into ≤ 2^r useful buckets, so expected
    * candidates per band grow ~ n²/2^(r+1): with the defaults (r = 4,
    * τ = 0.35 ≈ 2.8σ at dim 64) blocking stops pruning near n ≈ 20k
    * random vectors. When `candidates_per_vector` rivals the corpus
    * size the banding has collapsed: RAISE r (each extra bit/band
    * halves random collisions; recall on true near-dups stays high —
    * they collide on angle, not chance), and keep overall recall by
    * adding bands. Real embedding corpora are far from
    * direction-random (that is why SemDeDup clusters first), so the
    * audit, costing one map + one key shuffle of (band, val) longs, is
    * how a 100× run finds out which regime it is in.
    */
  def embedNearDupAudit(corpus: DataFrame, nPlanes: Int = 16,
                        bands: Int = 4, dim: Int = 64,
                        seed: Long = 7L): DataFrame =
    bandCensus(corpus, nPlanes, bands, dim, seed)
      .withColumn("candidates_per_vector",
        col("candidate_pairs").cast("double") / col("n_vectors"))
      .select("band_idx", "n_buckets", "max_bucket", "candidate_pairs",
        "candidates_per_vector")

  /** Random-cosine noise-floor calibration (r17) — the measured lesson
    * of the embed-ingest sweep made an operator: the max of n random
    * cosines GROWS with n (extreme-value, ≈ √(2·ln n / dim) for
    * direction-random vectors), so a verify threshold that cleanly
    * separates near-dups from noise at a 1k corpus silently rejects
    * every fresh document against a 20k one. This estimates the floor
    * empirically from the table itself: `nProbes` probe vectors × a
    * DISJOINT `nSamples`-vector sample (both picked by the stable md5
    * order — deterministic, engine-portable, no rand()), per-probe max
    * cosine, and the distribution's top — ONE row
    * (n_probes, n_samples, floor_max, floor_q90). Size ingest verify
    * thresholds ABOVE `floor_max` at the SERVING candidate count: the
    * floor scales with how many corpus vectors a probe is compared
    * against, so calibrate with `nSamples` at (or extrapolate to) the
    * registry's per-probe candidate volume.
    *
    * Scale: the expensive part is a (nProbes × nSamples) bounded
    * eval-slice cross — caller-capped like every recall certificate in
    * this repo, never corpus×corpus; the candidates ride one
    * TakeOrderedAndProject over the scan.
    */
  def embedNoiseFloor(embeddings: DataFrame, nProbes: Int = 32,
                      nSamples: Int = 256): DataFrame = {
    require(nProbes >= 1 && nProbes <= 1024,
      s"nProbes must be in [1, 1024], got $nProbes")
    require(nSamples >= 1 && nSamples <= 8192,
      s"nSamples must be in [1, 8192], got $nSamples")
    val ranked = embeddings
      .select(md5(col("vec_id").cast("string")).as("h"),
        col("vec_id"), col("embedding"))
      .orderBy("h", "vec_id").limit(nProbes + nSamples)
    val probes = ranked.orderBy("h", "vec_id").limit(nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
    val samples = ranked
      .join(probes.select(col("probe_id")),
        col("vec_id") === col("probe_id"), "left_anti")
      .select(col("vec_id").as("sample_id"), col("embedding").as("s_emb"))
    val perProbe = probes.crossJoin(broadcast(samples))
      .select(col("probe_id"), cosine(col("p_emb"), col("s_emb")).as("cos"))
      .groupBy("probe_id").agg(max(col("cos")).as("max_cos"))
    val sCount = samples.agg(count(lit(1)).as("n_samples"))
    perProbe
      .agg(
        count(lit(1)).as("n_probes"),
        max(col("max_cos")).as("floor_max"),
        sort_array(collect_list(col("max_cos"))).as("sorted"))
      .crossJoin(broadcast(sCount))
      .withColumn("q_idx",
        greatest(lit(1L), ceil(col("n_probes") * lit(0.9)).cast("long")))
      .select(col("n_probes"), col("n_samples"), col("floor_max"),
        element_at(col("sorted"), col("q_idx").cast("int")).as("floor_q90"))
  }

  /** The audit's pre-projection census — keeps `n_vectors`, which
    * [[autoPlanes]] needs in the same collect (the public audit schema
    * is oracle-locked without it).
    */
  private def bandCensus(corpus: DataFrame, nPlanes: Int,
                         bands: Int, dim: Int, seed: Long): DataFrame = {
    require(nPlanes % bands == 0, s"nPlanes=$nPlanes not divisible by bands=$bands")
    val r = nPlanes / bands
    val mask = (1L << r) - 1
    // the nPlanes-fold hashing is the audit's dominant cost; on FEW-FILE
    // inputs repartition so the map runs at core count (embeddingNearDup's
    // pattern) — but only when there is real work to spread, decided from
    // the optimizer's SIZE ESTIMATE alone (no .rdd conversion, no job):
    // below 8 MB a (vec_id, embedding) shuffle costs more than the
    // hashing it parallelizes, and past para × maxPartitionBytes the
    // file scan already splits into >= para input partitions — a
    // well-partitioned 100 TB corpus must NOT pay a full shuffle for an
    // audit whose advertised price is one map + one small band-key
    // shuffle. Only the mid-band (one-big-file / few-file inputs, where
    // the scan cannot split wide enough on its own) repartitions.
    val para = corpus.sparkSession.sparkContext.defaultParallelism
    val estBytes = corpus.queryExecution.optimizedPlan.stats.sizeInBytes
    val maxPart =
      corpus.sparkSession.sessionState.conf.filesMaxPartitionBytes
    // An UNKNOWN estimate (DSv2 sources without stats report
    // spark.sql.defaultSizeInBytes, effectively Long.MaxValue) must not
    // masquerade as "huge, already splits wide" — that would serialize
    // the nPlanes-fold hashing on however few partitions the source
    // happens to expose. Treat unknown as mid-band: repartition.
    val known =
      estBytes < BigInt(corpus.sparkSession.sessionState.conf.defaultSizeInBytes)
    val wide =
      if (known && (estBytes < (8L << 20) || estBytes > BigInt(maxPart) * para))
        corpus
      else corpus.repartition(para, col("vec_id"))
    val sig = wide
      .select(col("vec_id"),
        hyperplaneBucket(col("embedding"), nPlanes, dim, seed).as("bucket"))
    val bandCols = (0 until bands).map { j =>
      shiftright(col("bucket"), j * r).bitwiseAND(lit(mask))
    }
    sig.select(posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_val")))
      .groupBy("band_idx", "band_val").agg(count(lit(1)).as("c"))
      .groupBy("band_idx").agg(
        count(lit(1)).as("n_buckets"),
        max("c").as("max_bucket"),
        // c·(c−1) is even and the double sum is exact below 2^53
        sum(col("c") * (col("c") - lit(1)) / lit(2)).cast("long")
          .as("candidate_pairs"),
        sum("c").as("n_vectors"))
  }

  /** Has the banding at `nPlanes` collapsed on this corpus? The signal
    * is the audit's EXACT total candidate volume: Σ over bands of
    * Σ c·(c−1)/2, divided by the corpus size — the number of
    * verify-join probes per vector the banding would actually emit.
    * ONE job per call: the pre-projection census still carries
    * n_vectors (the public audit drops it), so total pairs and the
    * corpus size come out of the same bounded collect — no second
    * corpus scan. The long/long division replays bit-identically in
    * the oracle's cen CTEs (both are exact longs; one IEEE division).
    */
  private def censusCollapsed(corpus: DataFrame, nPlanes: Int, bands: Int,
                              dim: Int, seed: Long,
                              maxCandidatesPerVector: Double): Boolean = {
    val census = bandCensus(corpus, nPlanes, bands, dim, seed)
      .agg(sum("candidate_pairs").as("pairs"), max("n_vectors").as("n"))
      .collect()(0) // bounded: one row
    !census.isNullAt(0) && census.getLong(1) > 0 &&
      census.getLong(0).toDouble / census.getLong(1) > maxCandidatesPerVector
  }

  /** [[embeddingNearDupAuto]]'s FIRST escalation step as a testable/
    * loggable decision (the [[graft.ops.text.Fuzzy.autoRegime]]
    * convention): the configured `nPlanes`, or its double when the
    * audit census says the configured banding has collapsed. One
    * bounded collect. The full three-tier decision — including the
    * clustered fallback when even the doubled census floods — is
    * [[autoBandingTier]].
    */
  def autoPlanes(corpus: DataFrame, nPlanes: Int = 16, bands: Int = 4,
                 dim: Int = 64, seed: Long = 7L,
                 maxCandidatesPerVector: Double = 64.0): Int =
    if (censusCollapsed(corpus, nPlanes, bands, dim, seed,
      maxCandidatesPerVector)) nPlanes * 2
    else nPlanes

  /** The complete dispatch decision [[embeddingNearDupAuto]] runs, as
    * testable data: (tier, planes) where tier is `"banded"` (the
    * configured census blocks — run [[embeddingNearDup]] as
    * configured), `"banded2x"` (configured collapsed, the doubled
    * census blocks — run it at 2× planes), or `"clustered"` (BOTH
    * censuses flooded — [[embeddingNearDupClustered]] at the doubled
    * planes: the corpus is direction-dense enough that no global
    * banding prunes, which is exactly SemDeDup's cluster-first
    * regime). Each census is one bounded collect, and the second runs
    * only when the first collapses — a healthy corpus pays exactly
    * the old single audit.
    */
  def autoBandingTier(corpus: DataFrame, nPlanes: Int = 16, bands: Int = 4,
                      dim: Int = 64, seed: Long = 7L,
                      maxCandidatesPerVector: Double = 64.0): (String, Int) =
    if (!censusCollapsed(corpus, nPlanes, bands, dim, seed,
      maxCandidatesPerVector)) ("banded", nPlanes)
    else if (!censusCollapsed(corpus, nPlanes * 2, bands, dim, seed,
      maxCandidatesPerVector)) ("banded2x", nPlanes * 2)
    else ("clustered", nPlanes * 2)

  /** [[embeddingNearDup]] with AUTOMATIC escalation — the
    * editDistanceJoinAuto pattern applied to the one measured scale
    * collapse left in the module, now in TWO tiers ([[autoBandingTier]]
    * is the whole decision as data):
    *
    *  1. run [[embedNearDupAudit]]'s exact per-band candidate census at
    *     the configured banding; if candidates per vector clear
    *     `maxCandidatesPerVector` (the sf1 sweep measured r = 4
    *     bits/band stop blocking near 20k direction-random vectors),
    *     DOUBLE nPlanes at the same band count: each extra bit/band
    *     halves random collisions (the audit's n²/2^(r+1) law ⇒
    *     doubling r takes candidate volume from ~n²/32 to ~n²/512 at
    *     the defaults), while true near-dups keep colliding — they
    *     agree on sign bits by ANGLE, not chance;
    *  2. RE-audit at the doubled banding; if that census STILL floods —
    *     the pathological direction-dense corpus that used to be a
    *     scaladoc recipe — fall through to
    *     [[embeddingNearDupClustered]]: within-cluster banding at the
    *     doubled planes, SemDeDup's cluster-first regime, which prunes
    *     by cell when no global banding can.
    *
    * The dispatch threshold is the verify join's per-vector probe
    * count: past ~64 candidate probes per vector the extra signature
    * pass (2× the hashing, the audit's own dominant cost) is noise
    * against the verify work it prunes; far below it the configured
    * banding is already blocking and re-hashing would cost more than
    * it saves. A healthy corpus pays ONE audit (a map + a (band, val)
    * key shuffle, ~1/30 of the verify cost at the sf1 sweep point);
    * the second census only runs on a collapsed first. Every branch of
    * the decision is replayed by the SQL oracle (two census gates,
    * three candidate chains).
    *
    * Output contract is [[embeddingNearDup]]'s: (vec_a, vec_b, sim),
    * vec_a < vec_b, sim ≥ threshold — only the CANDIDATE SET (recall)
    * depends on the dispatched tier, exactly as with the manual knobs
    * (the clustered tier additionally misses pairs straddling cluster
    * boundaries — [[embeddingNearDupClustered]]'s documented trade).
    */
  def embeddingNearDupAuto(corpus: DataFrame, nPlanes: Int = 16,
                           bands: Int = 4, threshold: Double = 0.35,
                           dim: Int = 64, seed: Long = 7L,
                           maxCandidatesPerVector: Double = 64.0): DataFrame =
    autoBandingTier(corpus, nPlanes, bands, dim, seed,
      maxCandidatesPerVector) match {
      case ("clustered", np) =>
        embeddingNearDupClustered(corpus, np, bands, threshold, dim, seed)
      case (_, np) =>
        embeddingNearDup(corpus, np, bands, threshold, dim, seed)
    }

  /** Within-cluster banded near-dup — [[embeddingNearDupAuto]]'s third
    * tier, standalone: SemDeDup's move (cluster first, pair only inside
    * cells) fused with the banded candidate scheme — candidates must
    * collide on (cluster id, band_idx, band_val), never band alone, so
    * a direction-dense corpus that floods every global banding still
    * prunes by cell. Cluster geometry is the exact-integer
    * nearest-centroid partition over the k lowest-id quantized seeds
    * ([[graft.ops.Clustering]] — bit-reproducible cross-engine), which
    * is what keeps the whole dispatch chain SQL-replayable. Same plan
    * shape as [[embeddingNearDup]] (pinned signature table, banded
    * equi-join — now keyed by cid too — exact-cosine verify), same
    * output contract: (vec_a, vec_b, sim), vec_a < vec_b. Additional
    * recall trade: a true pair straddling a cluster boundary is missed
    * — the standard SemDeDup price for Σ|c|² blocking; raise k with
    * corpus size to hold cell sizes constant.
    */
  def embeddingNearDupClustered(corpus: DataFrame, nPlanes: Int = 32,
                                bands: Int = 4, threshold: Double = 0.35,
                                dim: Int = 64, seed: Long = 7L,
                                k: Int = 8): DataFrame = {
    require(nPlanes % bands == 0, s"nPlanes=$nPlanes not divisible by bands=$bands")
    val r = nPlanes / bands
    val mask = (1L << r) - 1
    val spark = corpus.sparkSession
    val bucketed = graft.CacheScope.pin(
      Clustering.withClusterId(corpus, k)
        .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
        .select(col("vec_id"), col("cid"), col("embedding"),
          hyperplaneBucket(col("embedding"), nPlanes, dim, seed).as("bucket"),
          sqrt(dotOrdered(col("embedding"), col("embedding"))).as("norm")))
    val bandCols = (0 until bands).map { j =>
      shiftright(col("bucket"), j * r).bitwiseAND(lit(mask))
    }
    val bandTable = bucketed.select(col("cid"), col("vec_id"),
      posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_val")))
    val a = bandTable.select(col("cid"), col("band_idx"), col("band_val"),
      col("vec_id").as("vec_a"))
    val b = bandTable.select(col("cid"), col("band_idx"), col("band_val"),
      col("vec_id").as("vec_b"))
    val candidates = a.join(b.hint("shuffle_hash"),
        Seq("cid", "band_idx", "band_val"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b")
      .distinct()
    candidates
      .join(bucketed.select(col("vec_id").as("vec_a"),
        col("embedding").as("emb_a"), col("norm").as("norm_a"))
        .hint("shuffle_hash"), "vec_a")
      .join(bucketed.select(col("vec_id").as("vec_b"),
        col("embedding").as("emb_b"), col("norm").as("norm_b"))
        .hint("shuffle_hash"), "vec_b")
      .withColumn("sim", dotOrdered(col("emb_a"), col("emb_b")) /
        (col("norm_a") * col("norm_b")))
      .filter(col("sim") >= threshold)
      .select("vec_a", "vec_b", "sim")
  }

  /** [[annProbeSweep]]'s IVF twin: evaluate an nProbe grid for
    * [[ivfTopKIndexed]] against the exact baseline, over ONE shared
    * index build ([[ivfAssign]] runs once — the sweep prices probe
    * budgets, not index construction). Per config: n_candidates = the
    * exact sum of probed cell sizes (the rows the config's verify/rank
    * stage reads — IVF's cost axis) and aggregate recall@k (the
    * quality axis). The knob an IVF rollout actually tunes: more
    * probes buy recall linearly in scanned cells; this table says
    * where the recall floor is crossed cheapest.
    *
    * Output: (n_probe, n_candidates, n_exact, n_hit, recall).
    */
  def ivfProbeSweep(corpus: DataFrame, queries: DataFrame, k: Int,
                    centroids: DataFrame,
                    nProbeGrid: Seq[Int] = Seq(1, 2, 4)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nProbeGrid.nonEmpty, "ivfProbeSweep needs a non-empty grid")
    // shared subtrees pinned across the grid (annProbeSweep's note): the
    // brute baseline and the ONE index build every config serves from —
    // "built once" must hold in execution, not just in the plan text.
    // Session-owned lifetime; release() once the sweep table is consumed.
    val exact = graft.CacheScope.pin(bruteForceTopK(corpus, queries, k))
    val assigned = graft.CacheScope.pin(ivfAssign(corpus, centroids))
    val sizes = assigned.groupBy("cell").agg(count(lit(1)).as("cell_n"))
    // probe ranking computed once for the whole grid; each config is a
    // filter on rn — identical ordering to ivfTopKIndexed's router
    val probesAll = queries
      .crossJoin(broadcast(centroids))
      .withColumn("csim", cosine(col("q_emb"), col("c_emb")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("csim").desc, col("cell"))))
      .select("q_id", "cell", "rn")
    nProbeGrid.map { p =>
      val nCand = probesAll.filter(col("rn") <= p)
        .join(broadcast(sizes), "cell")
        .agg(coalesce(sum("cell_n"), lit(0L)).as("n_candidates"))
      val rec = recallAtK(
        ivfTopKIndexed(assigned, queries, k, centroids, nProbe = p), exact)
        .agg(sum("n_exact").as("n_exact"), sum("n_hit").as("n_hit"))
      nCand.crossJoin(rec) // two 1-row aggregates — constant-size build
        .select(lit(p).as("n_probe"), col("n_candidates"),
          col("n_exact"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_exact")).as("recall"))
    }.reduce(_ unionByName _)
  }

  /** IVF (inverted-file) ANN top-k — the partition-pruning scale path.
    *
    * "Training" is deterministic: the first `nCells` corpus vectors (by
    * vec_id) seed the cells. Every corpus vector is assigned to its highest-
    * cosine centroid via a map-side-combinable `max_by` aggregate (partial
    * argmax per partition — the shuffle carries one row per vector, never
    * the corpus × nCells cross product; ties break to the lowest cell id).
    * Queries probe their `nProbe` nearest cells; exact cosine + rank runs
    * only inside probed cells. At 100 TB the cell assignment is the
    * partition key of the stored index — probing prunes (nCells - nProbe) /
    * nCells of the corpus from the scan, the IVF trade: recall < 1 when a
    * true neighbor lives in an unprobed cell.
    *
    * Output: (q_id, rank, neighbor_id, sim), rank 1-based best-first.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    // genuinely the FIRST nCells vectors by vec_id (distributed top-k,
    // nCells rows collected) — the old filter(vec_id < nCells) silently
    // yielded zero cells (and an empty result) on any corpus whose ids
    // don't start densely at 0, e.g. a filtered or offset split
    val centroids = corpus.orderBy("vec_id").limit(nCells)
      .select(col("vec_id").as("cell"), col("embedding").as("c_emb"))
    ivfTopKWith(corpus, queries, k, centroids, nProbe)
  }

  /** [[ivfTopK]] with a CALLER-PROVIDED cell table (cell, c_emb float
    * array) — the production IVF shape: the routing geometry is a
    * trained artifact ([[graft.ops.Clustering.kmeansCells]], or a
    * persisted model), not a property of whichever ids came first.
    * Trained cells follow corpus density, so the same nProbe budget
    * recovers more true neighbors; measure the trade with
    * [[recallAtK]] before rollout (SimilaritySpec does exactly that).
    * Same plan shape as [[ivfTopK]]: the cell table broadcasts, the
    * assignment is one map-side-combinable argmax, candidates stay
    * inside probed cells.
    */
  def ivfTopKWith(corpus: DataFrame, queries: DataFrame, k: Int,
                  centroids: DataFrame, nProbe: Int = 4): DataFrame =
    ivfTopKIndexed(ivfAssign(corpus, centroids), queries, k, centroids,
      nProbe)

  /** The IVF INDEX build, standalone — every corpus vector assigned to
    * its highest-cosine cell (one map-side-combinable argmax; ties to
    * the lowest cell id): the (cell, vec_id, embedding) table a real
    * deployment PERSISTS, partitioned by cell, so serving prunes scans
    * by cell without re-assigning the corpus on every query batch.
    * Commit it with [[graft.io.Manifest]] for a versioned index
    * artifact (the tokenizer / centroid-model pattern — the third leg
    * of the persisted-artifact trio), then serve any committed version
    * through [[ivfTopKIndexed]]; SimilaritySpec proves the round trip
    * serves identically to inline assignment.
    */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame =
    corpus
      .crossJoin(broadcast(centroids))
      .withColumn("csim", cosine(col("embedding"), col("c_emb")))
      .groupBy("vec_id")
      .agg(max_by(struct(col("cell"), col("embedding")),
        struct(col("csim"), (-col("cell")).as("tie"))).as("m"))
      .select(col("m.cell").as("cell"), col("vec_id"), col("m.embedding").as("embedding"))

  /** Serve top-k from a PREBUILT index ([[ivfAssign]] output — usually
    * read back from its persisted snapshot): probe routing against the
    * broadcast cell table + exact cosine + TopK inside probed cells
    * only. Zero corpus-assignment work at query time — the steady-state
    * serving cost is the probe scan alone.
    */
  def ivfTopKIndexed(assigned: DataFrame, queries: DataFrame, k: Int,
                     centroids: DataFrame, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val probes = queries
      .crossJoin(broadcast(centroids))
      .withColumn("csim", cosine(col("q_emb"), col("c_emb")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("csim").desc, col("cell"))))
      .filter(col("rn") <= nProbe)
      .select(col("cell"), col("q_id"), col("q_emb"))
    // final ranking through the map-side-combinable TopK aggregator, not
    // a per-query window: the probed candidate set is ~corpus·nProbe/
    // nCells rows PER QUERY, and a window would shuffle all of them to
    // one partition per query — the exact hot-partition shape the module
    // exists to avoid. TopK's order (sim desc, id asc) matches the old
    // window's (sim desc, vec_id) tie-break bit-for-bit.
    val topk = udaf(new TopK(k))
    probes.join(assigned, "cell")
      .withColumn("sim", cosine(col("q_emb"), col("embedding")))
      .select(col("q_id"), col("vec_id").as("id"), col("sim"))
      .groupBy("q_id")
      .agg(topk(col("id"), col("sim")).as("topk"))
      .select(col("q_id"), posexplode(col("topk")).as(Seq("pos", "s")))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rank"),
        col("s.id").as("neighbor_id"), col("s.sim").as("sim"))
  }

  /** Build-and-commit [[ivfAssign]] as a versioned Manifest snapshot —
    * returns the committed version (the signatureRefresh / lmRefresh
    * idiom applied to the ANN family's index). Serve any committed
    * version through [[ivfTopKIndexed]] with the SAME cell table the
    * index was assigned under — cells and assignment are only
    * meaningful as a pair, so a deployment versions the cell model
    * (e.g. [[graft.ops.Clustering.kmeansCellsExact]] committed via
    * Manifest) alongside the index it routed.
    */
  def ivfIndexRefresh(corpus: DataFrame, table: String,
                      centroids: DataFrame): Int =
    graft.io.Manifest.write(ivfAssign(corpus, centroids), table)

  /** The index MAINTENANCE step for the ANN family: assign an ACCEPTED
    * ingest batch against the SAME cell geometry and append its
    * (cell, vec_id, embedding) rows to the current index snapshot,
    * committing the next version — the probe(vN) → accept → update(vN+1)
    * loop [[graft.ops.text.Dedup.signatureUpdate]] closes for MinHash
    * signatures, closed here for the IVF index. Cell assignment depends
    * only on a vector's own embedding and the broadcast cell table, so
    * append IS the correct merge (no existing row changes); only the
    * batch pays assignment work, and in-flight readers of vN stay
    * undisturbed. Returns the new version.
    *
    * The one maintenance read this append does NOT cover is cell DRIFT:
    * a corpus whose density moves away from the trained geometry fills
    * few cells disproportionately — watch [[ivfProbeSweep]]'s cell
    * balance (or re-run the elbow sweep) and retrain + full
    * [[ivfIndexRefresh]] when the whale-cell share grows.
    */
  def ivfIndexUpdate(table: String, accepted: DataFrame,
                     centroids: DataFrame): Int = {
    val spark = accepted.sparkSession
    graft.io.Manifest.write(
      graft.io.Manifest.read(spark, table)
        .unionByName(ivfAssign(accepted, centroids)),
      table)
  }

  /** The index DELETE step — [[ivfIndexUpdate]]'s inverse: drop removed
    * vectors' assignment rows and commit the next version (one row per
    * vector, so the id-keyed anti-join IS the retraction; cell
    * geometry is untouched — retraction never changes WHERE the
    * surviving vectors live, only drift does, and [[graft.ops
    * .Clustering.embeddingDrift]] is the read for that). The removed-id
    * set broadcasts; the index never moves.
    */
  def ivfIndexRetract(table: String, removedIds: DataFrame): Int = {
    val spark = removedIds.sparkSession
    graft.io.Manifest.write(
      graft.io.Manifest.read(spark, table)
        .join(broadcast(removedIds.select(col("vec_id"))), Seq("vec_id"),
          "left_anti"),
      table)
  }

  /** Recall@k of an APPROXIMATE neighbor table against the EXACT one —
    * the evaluation every ANN deployment runs before trusting a recall
    * trade at scale: per query, the share of true top-k neighbors the
    * approximate search recovered. Both inputs are this module's
    * (q_id, rank, neighbor_id, ...) shape ([[annTopK]]/[[ivfTopK]]
    * output vs [[bruteForceTopK]] on an eval slice); ranks and sims are
    * ignored — recall is SET overlap, so the measure is insensitive to
    * tie-ordering differences inside the hit set. One left equi-join +
    * one combinable aggregate; at corpus scale the exact side is the
    * eval-sized baseline, never the full corpus. SimilaritySpec's
    * recall measurements and the multi-probe comparison are exactly
    * this computation — exposed as the first-class operator so
    * pipelines can gate an index rollout on it.
    *
    * Output: (q_id, n_exact, n_hit, recall).
    */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame =
    exact.select(col("q_id"), col("neighbor_id"))
      .join(approx.select(col("q_id"), col("neighbor_id"), lit(1L).as("hit")),
        Seq("q_id", "neighbor_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("recall", col("n_hit").cast("double") / col("n_exact"))

  /** Recall-gated serving-config sweep — the
    * [[graft.ops.Classifier.thresholdSweep]] pattern applied to ANN
    * serving: evaluate a PROBE-BUDGET grid for [[annTopK]] on an eval
    * query slice against the exact baseline, one row per config with
    * the COST axis (n_candidates — the rows the config feeds the
    * verify/rank stage, an exact long both engines count identically)
    * and the QUALITY axis (aggregate recall@k vs [[bruteForceTopK]],
    * the long/long set-overlap [[recallAtK]] reduces to). An index
    * rollout reads this table to pick the cheapest config above its
    * recall floor — the eval-slice measurement that decides the probe
    * budget BEFORE a 100 TB serving deployment pays it. One brute
    * baseline shared across the grid; per config one bucket equi-join
    * (counting) + one [[annTopK]]+[[recallAtK]] chain; the per-config
    * frames are constant-size aggregates, so the union is cheap.
    *
    * Output: (probes, n_candidates, n_exact, n_hit, recall).
    */
  def annProbeSweep(corpus: DataFrame, queries: DataFrame, k: Int,
                    probesGrid: Seq[Int] = Seq(1, 2, 4), nPlanes: Int = 8,
                    dim: Int = 64, seed: Long = 42L): DataFrame = {
    require(probesGrid.nonEmpty, "annProbeSweep needs a non-empty grid")
    // shared subtrees pinned across the grid: every config's recall join
    // reads the brute baseline and every config's candidate count reads
    // the bucketed corpus — without the pins each config re-executes the
    // corpus scan + hashing (and the brute O(n·q) baseline) from scratch.
    // Session-owned lifetime, the operator-pin convention (release with
    // graft.CacheScope.release(spark) once the sweep table is consumed).
    val exact = graft.CacheScope.pin(bruteForceTopK(corpus, queries, k))
    val c = graft.CacheScope.pin(corpus.withColumn("bucket",
      hyperplaneBucket(col("embedding"), nPlanes, dim, seed)))
    probesGrid.map { p =>
      val qb = queries.withColumn("bucket",
        explode(probeBuckets(col("q_emb"), nPlanes, dim, seed, p)))
      val nCand = c.select("bucket")
        .join(qb.select("bucket"), "bucket")
        .agg(count(lit(1)).as("n_candidates"))
      val rec = recallAtK(
        annTopK(corpus, queries, k, nPlanes, dim, seed, probes = p), exact)
        .agg(sum("n_exact").as("n_exact"), sum("n_hit").as("n_hit"))
      nCand.crossJoin(rec) // two 1-row aggregates — constant-size build
        .select(lit(p).as("probes"), col("n_candidates"),
          col("n_exact"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_exact")).as("recall"))
    }.reduce(_ unionByName _)
  }

  /** Symmetric int8 scalar quantization of the embedding column — the
    * standard 4× memory/IO compression before ANN serving (a 100 TB
    * embedding table becomes 25 TB; bucket probes read a quarter of the
    * bytes). Per vector: `q_scale = 127 / max(|x|)` and
    * `q_i = floor(x_i · q_scale + 0.5)` ∈ [−127, 127] (round-half-up via
    * floor — `round()` is banned by the cross-engine parity rules, while
    * abs/max/division/multiplication/floor are IEEE basic ops, correctly
    * rounded everywhere, so the quantized table is bit-identical in any
    * engine). The all-zero vector gets `q_scale = 0` and a zero q-vector
    * (it has no direction — [[embeddingStats]] flags such rows upstream;
    * same contract for non-finite elements, which that pass must remove).
    *
    * Quantized cosine needs no dequantization: the scales cancel, and
    * int8 dots over ≤ 2^37 dims are EXACT in double arithmetic, so
    * quantized scores are deterministic — SimilaritySpec bounds their
    * error against exact cosine. Pure map work, zero shuffle.
    */
  def quantizeEmbeddings(df: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val emb = col(vecCol)
    // hoist the |x|-max into its own column so the interpreted
    // transform() pass over the array runs once, not once per reference
    // (HOFs are CodegenFallback; the duplicated evaluation was ~40% of
    // the quantize family's per-row cost)
    val maxAbs = array_max(transform(emb, x => abs(x.cast("double"))))
    df.withColumn("_q_maxabs", maxAbs)
      .withColumn("q_scale",
        when(col("_q_maxabs") > 0, lit(127.0) / col("_q_maxabs"))
          .otherwise(lit(0.0)))
      .drop("_q_maxabs")
      .withColumn("q_vec", transform(emb, x =>
        floor(x.cast("double") * col("q_scale") + lit(0.5)).cast("int")))
  }

  /** Contrastive training-pair mining — (anchor, positive, negatives)
    * triplets for bi-encoder / SimCSE-style embedding training:
    *
    *   - POSITIVE: the anchor's best non-self neighbor from a
    *     caller-provided `neighbors` table ((q_id, rank, neighbor_id,
    *     sim) — [[bruteForceTopK]] on an eval slice, [[annTopK]] /
    *     [[ivfTopKIndexed]] at corpus scale, so the mining INHERITS the
    *     index's scale posture), kept only above `simFloor` (an anchor
    *     with no strong neighbor yields no positive — nothing to learn
    *     from a forced weak pair);
    *   - NEGATIVES: `nNeg` deterministic pseudo-random partners per
    *     anchor — the per-bucket min-md5 representative of the anchor's
    *     next `nNeg` md5-derived buckets — exact-cosine VERIFIED below
    *     `simCeil` (a random draw that happens to be a near-dup would
    *     be a false negative and actively harm training). The
    *     representative table is `nBuckets` rows → broadcast; negative
    *     mining is one map + one broadcast join + nNeg exact dots per
    *     anchor, flat in corpus size.
    *
    * Output: (vec_id, pair_type 'pos'|'neg', partner_id, sim). The
    * HARD-negative alternative (top-scored wrong answers, not random) is
    * [[graft.ops.text.Retrieval.hardNegatives]] over a retrieval run.
    */
  def contrastivePairs(neighbors: DataFrame, corpus: DataFrame,
                       nNeg: Int = 3, simFloor: Double = 0.8,
                       simCeil: Double = 0.5,
                       nBuckets: Int = 64): DataFrame = {
    require(nNeg >= 1 && nNeg < nBuckets, s"need 1 <= nNeg=$nNeg < nBuckets=$nBuckets")
    val bucketOf = (c: Column) =>
      (conv(substring(md5(c.cast("string")), 1, 15), 16, 10)
        .cast("long") % nBuckets).cast("int")
    val w = Window.partitionBy("q_id").orderBy(col("rank"))
    val pos = neighbors
      .filter(col("neighbor_id") =!= col("q_id") && col("sim") >= simFloor)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("q_id").as("vec_id"), lit("pos").as("pair_type"),
        col("neighbor_id").as("partner_id"), col("sim"))
    val reps = corpus
      .withColumn("b", bucketOf(col("vec_id")))
      .groupBy("b")
      .agg(min_by(struct(col("vec_id"), col("embedding")),
        md5(col("vec_id").cast("string"))).as("r"))
      .select(col("b").as("rb"), col("r.vec_id").as("partner_id"),
        col("r.embedding").as("p_emb"))
    val neg = corpus
      .select(col("vec_id"), col("embedding"),
        explode(array((1 to nNeg).map(j =>
          (bucketOf(col("vec_id")) + lit(j)) % nBuckets): _*)).as("rb"))
      .join(broadcast(reps), "rb")
      .filter(col("partner_id") =!= col("vec_id"))
      .withColumn("sim", cosine(col("embedding"), col("p_emb")))
      .filter(col("sim") < simCeil)
      .select(col("vec_id"), lit("neg").as("pair_type"),
        col("partner_id"), col("sim"))
    pos.unionByName(neg)
  }
}
