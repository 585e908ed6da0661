package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Rolling-hash document fingerprint: the minimum over all `window`-length
  * sliding windows of a polynomial hash of pre-hashed tokens —
  * Rabin-Karp content fingerprinting, robust to edits outside the
  * minimizing window.
  *
  * Window hash: H(i) = Σ_{j<w} h[i+j]·B^{w-1-j} mod M, with B = 257 and
  * M = 2³¹−1 (products stay under 2⁶³). The codegen path maintains H
  * incrementally — H(i+1) = (H(i) − h[i]·B^{w-1})·B + h[i+w] mod M — so
  * the scan is O(n), not O(n·w); modular identities make it equal the
  * direct left fold `(acc·B + h) mod M` the oracle computes, element for
  * element. Arrays shorter than the window hash as one window over all
  * elements (matching list_reduce's first-element seeding); empty arrays
  * yield NULL. Inputs are normalized into [0, M) on read — full-range
  * hashes (raw xxhash64, negatives) would otherwise overflow the
  * leading-term product and break the rolling == fold identity; callers
  * that pre-reduce mod M (like q_rolling_fp and its oracle twin) see
  * identical results with or without the normalization.
  */
case class RollingMinHash(child: Expression, window: Int) extends UnaryExpression {

  import RollingMinHash.{B, M}

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if window > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"rolling_min_hash expects array<bigint> and a positive window, got " +
        s"${child.dataType.catalogString} / window=$window")
  }

  /** B^(w-1) mod M, for the rolling leading-term subtraction. */
  private lazy val bPowW1: Long = {
    var p = 1L
    (1 until window).foreach(_ => p = p * B % M)
    p
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    def at(i: Int): Long = (arr.getLong(i) % M + M) % M
    val w = math.min(window, n)
    var h = 0L
    var i = 0
    while (i < w) { h = (h * B + at(i)) % M; i += 1 }
    var min = h
    i = w
    while (i < n) {
      h = ((h - at(i - w) * bPowW1 % M) % M + M) % M
      h = (h * B + at(i)) % M
      if (h < min) min = h
      i += 1
    }
    min
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val arr = childGen.value
    val n = ctx.freshName("n")
    val w = ctx.freshName("w")
    val h = ctx.freshName("h")
    val min = ctx.freshName("min")
    val i = ctx.freshName("i")
    val body =
      s"""
         |boolean ${ev.isNull} = ${childGen.isNull};
         |long ${ev.value} = 0L;
         |if (!${ev.isNull}) {
         |  final int $n = $arr.numElements();
         |  if ($n == 0) { ${ev.isNull} = true; } else {
         |    final int $w = java.lang.Math.min($window, $n);
         |    long $h = 0L;
         |    for (int $i = 0; $i < $w; $i++) {
         |      $h = ($h * ${B}L + ($arr.getLong($i) % ${M}L + ${M}L) % ${M}L) % ${M}L;
         |    }
         |    long $min = $h;
         |    for (int $i = $w; $i < $n; $i++) {
         |      $h = (($h - ($arr.getLong($i - $w) % ${M}L + ${M}L) % ${M}L * ${bPowW1}L % ${M}L) % ${M}L + ${M}L) % ${M}L;
         |      $h = ($h * ${B}L + ($arr.getLong($i) % ${M}L + ${M}L) % ${M}L) % ${M}L;
         |      if ($h < $min) { $min = $h; }
         |    }
         |    ${ev.value} = $min;
         |  }
         |}
       """.stripMargin
    ev.copy(code = code"${childGen.code}\n$body")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingMinHash {
  /** Polynomial base and Mersenne modulus, shared with the oracle SQL. */
  val B = 257L
  val M: Long = (1L << 31) - 1

  val fnName = "graft_rolling_min_hash"

  /** SQL-path expression builder, shared by the temp-function registry and
    * [[graft.GraftExtensions]]. The window argument must be a foldable
    * integral literal (`8`, `8L`, CAST(8 AS INT)...); anything else —
    * wrong arity, a column reference, a string — fails here with a
    * descriptive message instead of a ClassCastException deep in analysis.
    */
  def builder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"$fnName expects exactly 2 arguments (array<bigint>, window), " +
          s"got ${exprs.length}")
    val winExpr = exprs(1)
    if (!winExpr.foldable)
      throw new IllegalArgumentException(
        s"$fnName window must be a literal integer, got non-foldable ${winExpr.sql}")
    val window = winExpr.eval() match {
      case i: Int => i
      case l: Long if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$fnName window must be an integer literal, got " +
          s"${if (other == null) "NULL" else other.getClass.getSimpleName}: ${winExpr.sql}")
    }
    RollingMinHash(exprs.head, window)
  }

  /** Idempotent session registration (window arrives as a foldable int);
    * quiet on re-registration via [[FnRegistry.ensure]].
    */
  def register(spark: SparkSession): Unit =
    FnRegistry.ensure(spark, fnName, builder)

  /** Column-API entry point; registers on the active session on first use.
    * Single-session assumption as [[DotOrdered.apply]]: multi-session
    * applications should install `graft.GraftExtensions` at build time.
    */
  def apply(tokenHashes: Column, window: Int): Column = {
    register(SparkSession.active)
    call_function(fnName, tokenHashes, org.apache.spark.sql.functions.lit(window))
  }
}
