package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear quality-classifier training — the model-based
  * document filter of the large-scale curation pipelines (GPT-3's
  * WebText-similarity filter, LLaMA's Wikipedia-reference classifier):
  * train a linear model over hashed bag-of-tokens features, score every
  * document, keep the high scorers. The heuristic scorers
  * ([[graft.ops.text.TextStats]] qualityScore, lmScore) are the
  * label-free first pass; this is the supervised second pass once seed
  * labels exist.
  *
  * Numeric policy (the repo's parity rules, applied to TRAINING):
  *  - The link is the RATIONAL fast sigmoid s(z) = 0.5 + 0.5·z/(1+|z|) —
  *    division and abs only, so every score and gradient is built from
  *    correctly-rounded IEEE ops and reproduces bit-identically on any
  *    engine; exp-based σ would put a libm transcendental inside the
  *    training loop where its last-ulp drift COMPOUNDS across
  *    iterations.
  *  - Per-document gradient contributions quantize to DECIMAL(18,6)
  *    before the per-feature sum (the dec6 policy), making each
  *    iteration's gradient exactly order-independent: training is
  *    bit-reproducible under any partitioning, executor count, or
  *    scheduling — and equal to the oracle's sequential replay.
  *
  * Scale posture (100 TB): featurization is one scan of per-document
  * map work (hash, distinct, sort — no shuffle), materialized once via
  * localCheckpoint; each full-batch GD iteration is ONE
  * map-side-combinable aggregate producing dim+1 rows (the gradient)
  * plus a bounded driver-side weight update — no joins, no windows, no
  * corpus-sized state on the driver. The hashing trick bounds the model
  * at dim+1 weights regardless of vocabulary size.
  */
object Classifier {

  /** 16-bit md5 bucket of a token, folded to 1..dim — the engine-portable
    * hash family every split/sample operator here uses (hashSplit's
    * convention), so the oracle buckets identically.
    */
  private def bucket(tok: Column, dim: Int): Column =
    (conv(substring(md5(tok), 1, 4), 16, 10).cast("int") % dim) + 1

  /** Per-document presence features: bias index 0 plus the SORTED
    * distinct hashed buckets of the document's tokens. Sorting fixes the
    * dot-product fold order, which keeps z bit-identical everywhere.
    * Output: (doc_id, y, fs array<int>).
    */
  def featurize(documents: DataFrame, label: Column, dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    // NULL text is excluded OUTRIGHT (not featurized as empty): a NULL
    // fs would silently vanish from every gradient via explode while
    // still emitting a NULL-scored row from score() — the oracle's
    // unnest-based featurization drops such rows, so both engines and
    // both paths agree on the row set.
    documents.filter(col("text").isNotNull).select(
      col("doc_id"),
      // CASE-style label: a NULL predicate (e.g. null lang) is a
      // negative, never a NULL y (which would silently drop the doc
      // from every gradient)
      when(label, lit(1.0)).otherwise(lit(0.0)).as("y"),
      concat(array(lit(0)),
        sort_array(array_distinct(
          transform(graft.ops.text.TextFns.tokens(col("text")),
            t => bucket(t, dim)))))
        .as("fs"))
  }

  /** The rational fast sigmoid — transcendental-free link. */
  private[graft] def fastSigmoid(z: Column): Column =
    lit(0.5) + lit(0.5) * z / (lit(1.0) + abs(z))

  /** Ordered dot product of the presence features against a weight
    * literal: left fold in ascending feature order, starting at 0.0 —
    * the exact sequence the oracle's list_reduce replays.
    */
  private def zOf(fs: Column, w: Array[Double]): Column = {
    val wlit = array(w.map(lit).toIndexedSeq: _*)
    aggregate(fs, lit(0.0), (acc, j) => acc + element_at(wlit, j + 1))
  }

  /** Full-batch gradient-descent fit. Returns the (j, weight) table,
    * j = 0 the bias. Deterministic and partition-order independent: the
    * per-feature gradient is an exact decimal sum of per-document
    * dec6-quantized residuals, the weight update plain driver-side
    * doubles. Iterations are fixed-count (no data-dependent stop), so
    * the plan and the oracle replay the same loop.
    */
  def fit(documents: DataFrame, label: Column, dim: Int = 8,
          iters: Int = 10, lr: Double = 0.5): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = documents.sparkSession
    import spark.implicits._
    // featurization is static across iterations: materialize once
    val feats = featurize(documents, label, dim).localCheckpoint()
    val w = Array.fill(dim + 1)(0.0)
    try {
      for (_ <- 1 to iters) {
        // residual e = s(z) - y is shared by every presence feature of the
        // doc (x = 1), quantized once, then summed exactly per feature
        val grads = feats
          .withColumn("e",
            graft.dec6(fastSigmoid(zOf(col("fs"), w)) - col("y")))
          .select(explode(col("fs")).as("j"), col("e"))
          .groupBy("j").agg(sum(col("e")).as("g"))
          .collect() // bounded: at most dim+1 rows
        grads.foreach { r =>
          val j = r.getInt(0)
          w(j) = w(j) - lr * r.getDecimal(1).doubleValue()
        }
      }
    } finally graft.unpersistCheckpoint(feats) // free blocks even on failure
    w.toIndexedSeq.zipWithIndex
      .map { case (wt, j) => (j, wt) }
      .toDF("j", "weight")
  }

  /** Score documents under a trained weight vector: (doc_id, y, score,
    * predicted). Pure map work — the serving path.
    */
  def score(documents: DataFrame, label: Column, weights: Array[Double],
            dim: Int): DataFrame = {
    require(weights.length == dim + 1,
      s"weights length ${weights.length} != dim+1 ${dim + 1}")
    featurize(documents, label, dim)
      .select(col("doc_id"), col("y"),
        fastSigmoid(zOf(col("fs"), weights)).as("score"))
      .withColumn("predicted", (col("score") >= 0.5).cast("int"))
  }

  /** Operating-point selection for the trained filter: exact confusion
    * counts (tp/fp/fn/tn) and precision/recall at each candidate
    * threshold — the table a curation team reads to pick the keep
    * cutoff (precision = how clean the kept set is, recall = how much
    * wanted data survives). One scoring pass; each row fans out to
    * |thresholds| rows (a constant) into ONE map-side-combinable
    * aggregate — never a per-threshold rescan. Ratios are single double
    * divisions of exact longs, NULL (not NaN) on empty denominators —
    * engine-portable.
    */
  def thresholdSweep(documents: DataFrame, label: Column,
                     weights: Array[Double], dim: Int,
                     thresholds: Seq[Double] = (1 to 9).map(_ / 10.0))
      : DataFrame = {
    require(thresholds.nonEmpty, "thresholds must be non-empty")
    val scored = score(documents, label, weights, dim)
    val keep = col("score") >= col("threshold")
    val pos = col("y") === 1.0
    def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    scored
      .select(col("y"), col("score"),
        explode(typedLit(thresholds)).as("threshold"))
      .groupBy("threshold")
      .agg(cnt(keep && pos).as("tp"), cnt(keep && !pos).as("fp"),
        cnt(!keep && pos).as("fn"), cnt(!keep && !pos).as("tn"))
      .withColumn("precision",
        when(col("tp") + col("fp") > 0,
          col("tp").cast("double") / (col("tp") + col("fp"))))
      .withColumn("recall",
        when(col("tp") + col("fn") > 0,
          col("tp").cast("double") / (col("tp") + col("fn"))))
  }

  /** Reliability table for the trained filter: documents bucketed by
    * predicted score into `nBins` equal-width bins, each bin reporting
    * its mean predicted score against the empirical positive rate — the
    * calibration read a curation team does before treating scores as
    * probabilities (a filter that says "0.9" for documents that are
    * positive 60% of the time needs recalibration or a threshold chosen
    * from [[thresholdSweep]], not from the raw score). `gap` =
    * mean_score − pos_rate per bin; the n-weighted |gap| average is ECE
    * if the reader wants one number.
    *
    * Numeric policy: scores quantize to DECIMAL(18,6) before the bin
    * sum (the dec6 policy — order-independent, oracle-replayable);
    * labels are 0/1 doubles whose sums are exact integers; each
    * reported ratio is a single IEEE division, and `gap` one
    * subtraction of the two. One scoring pass into one
    * map-side-combinable aggregate of ≤ nBins rows.
    */
  def calibrationCurve(documents: DataFrame, label: Column,
                       weights: Array[Double], dim: Int,
                       nBins: Int = 10): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    score(documents, label, weights, dim)
      .withColumn("bin",
        least(floor(col("score") * nBins).cast("int"), lit(nBins - 1)))
      .groupBy("bin").agg(
        count(lit(1)).as("n"),
        graft.sumMeasure(col("score")).as("ssum"),
        sum(col("y")).as("ysum"))
      .select(col("bin"), col("n"),
        (col("ssum").cast("double") / col("n")).as("mean_score"),
        (col("ysum") / col("n")).as("pos_rate"))
      .withColumn("gap", col("mean_score") - col("pos_rate"))
  }
}
