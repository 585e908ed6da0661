package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Quiet, idempotent temp-function registration shared by the lazy
  * Column-API hooks ([[DotOrdered.apply]] and friends). A bare
  * `createOrReplaceTempFunction` on every Column construction is
  * semantically idempotent but logs a
  * `SimpleFunctionRegistry ... replaced a previously registered function`
  * WARN per call — thousands of lines through a bench run. Checking
  * `functionExists` first registers exactly once per session (whether the
  * first registration came from this hook or from
  * [[graft.GraftExtensions]]' session-build injection — both install the
  * identical builder, so skipping the replace is always safe).
  *
  * A concurrent first use from two threads can each miss the exists check
  * and both register; `createOrReplaceTempFunction` makes the race
  * harmless (last write wins, same builder), costing at most one WARN.
  *
  * Name-collision stance: if a user registered their OWN function under a
  * `graft_`-prefixed name first, ensure() keeps theirs (the old
  * unconditional replace silently stomped it — equally wrong in the other
  * direction). The `graft_` prefix exists to make that collision
  * effectively impossible; a user who creates one deliberately gets
  * their own function, as temp-function precedence normally works.
  */
private[functions] object FnRegistry {
  def ensure(spark: SparkSession, name: String,
             builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!reg.functionExists(new FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "built-in")
  }
}
