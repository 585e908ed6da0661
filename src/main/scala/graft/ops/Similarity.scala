package graft.ops

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
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

  /** One scored candidate; `Ord` sorts best-first (sim desc, id asc). */
  case class Scored(id: Long, sim: Double)
  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.sim, s.id))

  /** Map-side-combinable top-k: buffers hold at most k candidates, so
    * partial aggregation bounds both memory and shuffle volume.
    */
  class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
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
    * strictly left-to-right. Deterministic and engine-portable.
    */
  private def dotOrdered(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Cosine similarity of two float-array columns (ordered-fold inner sums). */
  def cosine(a: Column, b: Column): Column =
    dotOrdered(a, b) /
      (sqrt(dotOrdered(a, a)) * sqrt(dotOrdered(b, b)))

  /** Brute-force cosine top-k: for each row of `queries` (q_id, q_emb),
    * the k nearest corpus rows (vec_id, embedding) by cosine.
    * Output: (q_id, rank, neighbor_id, sim), rank 1-based best-first.
    *
    * Plan shape: BroadcastNestedLoopJoin (the deliberate linear scan) →
    * partial TopK per partition → single k-row-per-query shuffle → explode.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopK(k))
    corpus
      .crossJoin(broadcast(queries))
      .withColumn("sim", cosine(col("q_emb"), col("embedding")))
      .select(col("q_id"), col("vec_id").as("id"), col("sim"))
      .groupBy("q_id")
      .agg(topk(col("id"), col("sim")).as("topk"))
      .select(col("q_id"), posexplode(col("topk")).as(Seq("pos", "s")))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rank"),
        col("s.id").as("neighbor_id"), col("s.sim").as("sim"))
  }

  /** Deterministic pseudo-random unit-free hyperplanes for LSH bucketing. */
  private def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rng.nextGaussian())
  }

  /** Sign-bit LSH bucket id of an embedding column: bit i set iff
    * dot(embedding, plane_i) > 0. Embeddings with high cosine similarity
    * collide with high probability; bucket count = 2^nPlanes.
    */
  def hyperplaneBucket(emb: Column, nPlanes: Int, dim: Int, seed: Long = 42L): Column = {
    val planes = hyperplanes(nPlanes, dim, seed)
    planes.zipWithIndex.map { case (p, i) =>
      val dot = aggregate(
        zip_with(emb, typedLit(p.toSeq), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(dot > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** LSH-bucketed ANN top-k: candidates only where query and corpus share a
    * bucket (equi-join on bucket id — a hash shuffle, never a cross join),
    * then exact cosine + TopK within candidates. Recall < 1.0 by
    * construction; raise nPlanes for precision, lower for recall, or probe
    * neighboring buckets (bit flips) for multi-probe recall. Brute force
    * (`bruteForceTopK`) is the exactness baseline this trades against.
    */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nPlanes: Int = 8, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val topk = udaf(new TopK(k))
    val c = corpus.withColumn("bucket", hyperplaneBucket(col("embedding"), nPlanes, dim, seed))
    val q = queries.withColumn("bucket", hyperplaneBucket(col("q_emb"), nPlanes, dim, seed))
    c.join(q, Seq("bucket"))
      .withColumn("sim", cosine(col("q_emb"), col("embedding")))
      .select(col("q_id"), col("vec_id").as("id"), col("sim"))
      .groupBy("q_id")
      .agg(topk(col("id"), col("sim")).as("topk"))
      .select(col("q_id"), posexplode(col("topk")).as(Seq("pos", "s")))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rank"),
        col("s.id").as("neighbor_id"), col("s.sim").as("sim"))
  }
}
