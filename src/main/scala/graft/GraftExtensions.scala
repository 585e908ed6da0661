package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

import graft.functions.{BloomFns, BqFloatStr, DotOrdered, RollingMinHash}
import graft.plans.DateFilterRewrite

/** SparkSessionExtensions hook — registers graft's custom Catalyst
  * expressions at session build time, so a cluster deployment enables the
  * library's functions with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * and SQL users can call them directly (`SELECT graft_dot_ordered(a, b)`).
  * Interactive/embedded sessions that were built without the extension get
  * the same functions lazily via [[graft.functions.DotOrdered.register]]
  * (called on first Column-API use); both paths install the identical
  * builder, so the routes can mix freely.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Builders are shared with the temp-function registration path
    // (DotOrdered.register / RollingMinHash.register) and validate arity
    // and literal-ness with descriptive errors.
    ext.injectFunction((
      new FunctionIdentifier(DotOrdered.fnName),
      new ExpressionInfo(classOf[DotOrdered].getName, DotOrdered.fnName),
      DotOrdered.builder))
    ext.injectFunction((
      new FunctionIdentifier(RollingMinHash.fnName),
      new ExpressionInfo(classOf[RollingMinHash].getName, RollingMinHash.fnName),
      RollingMinHash.builder))
    ext.injectFunction((
      new FunctionIdentifier(BqFloatStr.fnName),
      new ExpressionInfo(classOf[BqFloatStr].getName, BqFloatStr.fnName),
      BqFloatStr.builder))
    ext.injectFunction((
      new FunctionIdentifier(BloomFns.aggFnName),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, BloomFns.aggFnName),
      BloomFns.aggBuilder))
    ext.injectFunction((
      new FunctionIdentifier(BloomFns.mightContainFnName),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, BloomFns.mightContainFnName),
      BloomFns.mightContainBuilder))
    // Sargable date filters: rewrites to_date(ts) ⋈ literal into timestamp
    // ranges inside the operator-optimization batch, BEFORE filter pushdown
    // and partition pruning see the plan.
    ext.injectOptimizerRule(_ => DateFilterRewrite)
  }
}
