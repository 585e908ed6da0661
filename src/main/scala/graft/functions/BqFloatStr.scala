package graft.functions

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BigQuery-parity FLOAT64 → STRING rendering (SURVEY §2.7 note; reference
  * order_processing_incremental.py:108 — `CONCAT('Calculated: ',
  * calculated_total, ...)` implicitly casts FLOAT64 to STRING with
  * GoogleSQL's renderer, which differs from Spark's Java
  * `Double.toString`: BigQuery prints `100.0` as `"100"` where Spark
  * prints `"100.0"`, and `1e20` as `"1e+20"` where Spark prints
  * `"1.0E20"`).
  *
  * Semantics follow GoogleSQL's public engine (ZetaSQL,
  * github.com/google/zetasql — zetasql/public/functions/convert_string.cc
  * `RoundTripDoubleToString`): the shortest `%g`-style rendering at
  * significand precision 15, then 16, then 17 that parses back to the
  * exact input bits; scientific notation (`e±NN`, two-digit minimum
  * exponent) when the decimal exponent is < -4 or >= the chosen
  * precision; `nan` / `inf` / `-inf` for the specials; zero is never
  * signed (GoogleSQL conversion rules: "A returned NaN or 0 will not be
  * signed").
  */
object BqFloatFormat {

  /** Static entry point shared by the interpreted and codegen paths. */
  def format(d: Double): UTF8String = UTF8String.fromString(render(d))

  def render(d: Double): String = {
    if (java.lang.Double.isNaN(d)) return "nan"
    if (d == java.lang.Double.POSITIVE_INFINITY) return "inf"
    if (d == java.lang.Double.NEGATIVE_INFINITY) return "-inf"
    if (d == 0.0) return "0" // covers -0.0: unsigned zero per GoogleSQL
    var prec = 15
    while (prec < 17) {
      val s = renderAt(d, prec)
      if (java.lang.Double.parseDouble(s) == d) return s
      prec += 1
    }
    renderAt(d, 17) // 17 significant digits always round-trip a double
  }

  /** `%.<prec>g` with C semantics: round-half-even to `prec` significant
    * digits of the EXACT binary value, strip trailing zeros, place the
    * point per the %g rule (scientific iff exponent < -4 or >= prec).
    */
  private def renderAt(d: Double, prec: Int): String = {
    val rounded = new JBigDecimal(d)
      .round(new MathContext(prec, RoundingMode.HALF_EVEN))
      .stripTrailingZeros()
    // decimal exponent: digits left of the point minus one
    val exp = rounded.precision() - rounded.scale() - 1
    if (exp >= -4 && exp < prec) {
      rounded.toPlainString
    } else {
      val mantissa = rounded.movePointLeft(exp).toPlainString
      f"${mantissa}e$exp%+03d"
    }
  }
}

/** `bq_float_str(double)` — the ZetaSQL rendering above as a codegen'd
  * unary expression (one static call in generated code; stays inside
  * whole-stage codegen like the other graft functions).
  */
case class BqFloatStr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bq_float_str expects a float/double input, got ${t.catalogString}")
  }

  private def toDouble(v: Any): Double = child.dataType match {
    case FloatType => v.asInstanceOf[Float].toDouble
    case _ => v.asInstanceOf[Double]
  }

  override protected def nullSafeEval(v: Any): Any = BqFloatFormat.format(toDouble(v))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BqFloatFormat.format((double) $c)")

  override protected def withNewChildInternal(newChild: Expression): BqFloatStr =
    copy(child = newChild)
}

object BqFloatStr {

  val fnName = "graft_bq_float_str"

  /** SQL-path builder shared with [[graft.GraftExtensions]]. */
  def builder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 1)
      throw new IllegalArgumentException(
        s"$fnName expects exactly 1 argument (float|double), got ${exprs.length}")
    BqFloatStr(exprs.head)
  }

  /** Idempotent temp-function registration (same seam as DotOrdered);
    * quiet on re-registration via [[FnRegistry.ensure]].
    */
  def register(spark: SparkSession): Unit =
    FnRegistry.ensure(spark, fnName, builder)

  /** Column-API entry point; registers on the active session on first use
    * (single-session assumption — see DotOrdered.apply's scaladoc).
    */
  def apply(c: Column): Column = {
    register(SparkSession.active)
    call_function(fnName, c)
  }
}
