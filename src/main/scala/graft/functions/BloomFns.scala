package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL bindings for Spark's internal runtime-filter bloom expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the codegen'd
  * machinery behind InjectRuntimeFilter, which Spark does not expose in
  * the public function registry). Registering them lets the library build
  * a bloom sketch as an ordinary distributed aggregate (map-side partial
  * blooms, one merged row out) and probe it as a codegen'd scalar against
  * a constant — no UDF in the hot path. Used by
  * [[graft.ops.Distribution.bloomAntiJoin]].
  */
object BloomFns {

  val aggFnName = "graft_bloom_agg"
  val mightContainFnName = "graft_bloom_might_contain"

  /** graft_bloom_agg(xxhash64(key) [, estimatedItems [, numBits]]) */
  def aggBuilder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(child) => new BloomFilterAggregate(child)
    case Seq(child, est) => new BloomFilterAggregate(child, est)
    case Seq(child, est, bits) => new BloomFilterAggregate(child, est, bits)
    case _ => throw new IllegalArgumentException(
      s"$aggFnName expects 1-3 arguments (hash, estimatedItems, numBits), got ${exprs.length}")
  }

  /** graft_bloom_might_contain(bloomConstant, xxhash64(key)) */
  def mightContainBuilder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"$mightContainFnName expects exactly 2 arguments (bloom, hash), got ${exprs.length}")
    BloomFilterMightContain(exprs.head, exprs(1))
  }

  /** Quiet idempotent registration of both bloom bindings — see
    * [[FnRegistry.ensure]].
    */
  def register(spark: SparkSession): Unit = {
    FnRegistry.ensure(spark, aggFnName, aggBuilder)
    FnRegistry.ensure(spark, mightContainFnName, mightContainBuilder)
  }
}
