package graft.plans

import java.time.{ZonedDateTime, ZoneId}

import scala.util.Try

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.types.{DateType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Makes truncated-timestamp filters sargable.
  *
  * The reference keys its incremental MERGE on
  * `TIMESTAMP_TRUNC(order_timestamp, HOUR)`
  * (order_processing_incremental.py:185 — operators A4/S5/J5), so the
  * natural warehouse read-back is `WHERE date_trunc('hour', ts) = h`.
  * Spark 4 already rewrites `to_date(ts) ⋈ d` (a bare cast) into pushable
  * timestamp ranges, but `date_trunc(unit, ts) ⋈ T` and `year(ts) ⋈ y`
  * reach the parquet scan as opaque residual filters — `PushedFilters: []`
  * — so at 100 TB the scan reads every row group and throws away all but
  * one hour.
  *
  * This rule rewrites comparisons of a truncation against an ALIGNED
  * literal (one that is its own truncation — anything else is left
  * untouched) into half-open ranges on the bare column:
  *
  *   date_trunc(u, ts) =  T  →  ts >= T AND ts < next_u(T)
  *   date_trunc(u, ts) >= T  →  ts >= T            (>  → next_u(T))
  *   date_trunc(u, ts) <  T  →  ts <  T            (<= → next_u(T))
  *   year(ts) = y            →  ts >= jan1(y) AND ts < jan1(y+1)
  *
  * (and the literal-on-left mirrors). Boundaries are computed in the
  * expression's own timezone (falling back to the session's) with local
  * calendar arithmetic, so month lengths, leap years, and DST-shifted
  * midnights match what the truncation itself produces. Sub-day units
  * (HOUR/MINUTE/SECOND) are rewritten only under fixed-offset zones: in a
  * DST zone a repeated local hour maps two absolute intervals onto one
  * truncated value, which a single range cannot represent — those filters
  * are left alone rather than risk dropping the ambiguous hour.
  * NULL semantics are preserved exactly (truncation ⋈ literal is NULL iff
  * ts is NULL, same as the range), so the rewrite is valid in any boolean
  * context (under NOT, in OR branches, ...).
  *
  * Installed by [[graft.GraftExtensions]] via `injectOptimizerRule` (runs
  * inside the operator-optimization batch, before filter pushdown and
  * partition pruning) or per-session via
  * `spark.experimental.extraOptimizations`.
  */
object DateFilterRewrite extends Rule[LogicalPlan] {

  /** `date_trunc(unit, ts)` with a foldable unit over a timestamp column. */
  private object TruncTs {
    def unapply(e: Expression): Option[(String, Expression, Option[String])] = e match {
      case TruncTimestamp(Literal(fmt: UTF8String, StringType), ts, tz)
        if ts.dataType == TimestampType => Some((fmt.toString.toUpperCase, ts, tz))
      case _ => None
    }
  }

  /** `year(ts)` on a timestamp: analyzed as Year(Cast(ts AS DATE)). */
  private object YearOfTs {
    def unapply(e: Expression): Option[(Expression, Option[String])] = e match {
      case Year(Cast(ts, DateType, tz, _)) if ts.dataType == TimestampType =>
        Some((ts, tz))
      case _ => None
    }
  }

  private def zoneOf(tz: Option[String]): ZoneId =
    DateTimeUtils.getZoneId(tz.getOrElse(conf.sessionLocalTimeZone))

  /** T truncated to `unit` equals T? Delegates to TruncTimestamp's own
    * evaluation so alignment agrees with Spark bit-for-bit.
    */
  private def aligned(unit: String, micros: Long, tz: Option[String]): Boolean =
    Try(TruncTimestamp(Literal(UTF8String.fromString(unit), StringType),
      Literal(micros, TimestampType), Some(zoneOf(tz).getId)).eval())
      .toOption.contains(micros)

  /** The boundary one `unit` after an aligned T, as a timestamp literal.
    * None → unsupported unit, unaligned input, sub-day unit in a DST zone,
    * or out-of-range arithmetic; caller leaves the predicate unrewritten.
    */
  private def nextBoundary(unit: String, micros: Long, tz: Option[String]): Option[Literal] = {
    val zone = zoneOf(tz)
    def local(f: ZonedDateTime => ZonedDateTime): Option[Long] = Try {
      val z = ZonedDateTime.ofInstant(DateTimeUtils.microsToInstant(micros), zone)
      // re-resolve through the local date so a DST-gapped midnight lands
      // exactly where the truncation itself would
      DateTimeUtils.instantToMicros(f(z).toInstant)
    }.toOption
    def fixed(unitMicros: Long): Option[Long] =
      if (zone.getRules.isFixedOffset) Try(Math.addExact(micros, unitMicros)).toOption
      else None
    val next = unit match {
      case "YEAR" | "YYYY" | "YY" => local(z => z.toLocalDate.plusYears(1).atStartOfDay(zone))
      case "QUARTER" => local(z => z.toLocalDate.plusMonths(3).atStartOfDay(zone))
      case "MONTH" | "MON" | "MM" => local(z => z.toLocalDate.plusMonths(1).atStartOfDay(zone))
      case "WEEK" => local(z => z.toLocalDate.plusWeeks(1).atStartOfDay(zone))
      case "DAY" | "DD" => local(z => z.toLocalDate.plusDays(1).atStartOfDay(zone))
      case "HOUR" => fixed(3600L * 1000000L)
      case "MINUTE" => fixed(60L * 1000000L)
      case "SECOND" => fixed(1000000L)
      case _ => None
    }
    next.map(Literal(_, TimestampType))
  }

  /** Jan 1 midnight of `y` in the zone, as a timestamp literal. */
  private def jan1(y: Int, tz: Option[String]): Option[Literal] = Try {
    val zone = zoneOf(tz)
    Literal(DateTimeUtils.instantToMicros(
      java.time.LocalDate.of(y, 1, 1).atStartOfDay(zone).toInstant), TimestampType)
  }.toOption

  /** (lower, upper) bounds of the aligned-T bucket, if rewritable. */
  private def truncBounds(unit: String, t: Long,
                          tz: Option[String]): Option[(Literal, Literal)] =
    if (!aligned(unit, t, tz)) None
    else nextBoundary(unit, t, tz).map(hi => (Literal(t, TimestampType), hi))

  def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, _) =>
      val rewritten = cond transform {
        // ---- date_trunc(unit, ts) ⋈ aligned timestamp literal ----
        // Equality rewrites DUPLICATE the ts operand (ts >= lo AND ts < hi):
        // a non-deterministic operand would be evaluated twice with
        // different values, changing semantics — gate on ts.deterministic,
        // as Spark's own operand-duplicating rewrites do. The single-
        // comparison rewrites below keep one occurrence and need no guard.
        case e @ EqualTo(TruncTs(u, ts, tz), Literal(t: Long, TimestampType))
            if ts.deterministic =>
          truncBounds(u, t, tz).fold(e: Expression) { case (lo, hi) =>
            And(GreaterThanOrEqual(ts, lo), LessThan(ts, hi)) }
        case e @ EqualTo(Literal(t: Long, TimestampType), TruncTs(u, ts, tz))
            if ts.deterministic =>
          truncBounds(u, t, tz).fold(e: Expression) { case (lo, hi) =>
            And(GreaterThanOrEqual(ts, lo), LessThan(ts, hi)) }

        case e @ GreaterThanOrEqual(TruncTs(u, ts, tz), Literal(t: Long, TimestampType)) =>
          if (aligned(u, t, tz)) GreaterThanOrEqual(ts, Literal(t, TimestampType)) else e
        case e @ GreaterThan(TruncTs(u, ts, tz), Literal(t: Long, TimestampType)) =>
          truncBounds(u, t, tz).fold(e: Expression) { case (_, hi) => GreaterThanOrEqual(ts, hi) }
        case e @ LessThan(TruncTs(u, ts, tz), Literal(t: Long, TimestampType)) =>
          if (aligned(u, t, tz)) LessThan(ts, Literal(t, TimestampType)) else e
        case e @ LessThanOrEqual(TruncTs(u, ts, tz), Literal(t: Long, TimestampType)) =>
          truncBounds(u, t, tz).fold(e: Expression) { case (_, hi) => LessThan(ts, hi) }

        // literal-on-left mirrors (T ⋈ trunc(ts) flips the comparison)
        case e @ GreaterThanOrEqual(Literal(t: Long, TimestampType), TruncTs(u, ts, tz)) =>
          truncBounds(u, t, tz).fold(e: Expression) { case (_, hi) => LessThan(ts, hi) }
        case e @ GreaterThan(Literal(t: Long, TimestampType), TruncTs(u, ts, tz)) =>
          if (aligned(u, t, tz)) LessThan(ts, Literal(t, TimestampType)) else e
        case e @ LessThan(Literal(t: Long, TimestampType), TruncTs(u, ts, tz)) =>
          truncBounds(u, t, tz).fold(e: Expression) { case (_, hi) => GreaterThanOrEqual(ts, hi) }
        case e @ LessThanOrEqual(Literal(t: Long, TimestampType), TruncTs(u, ts, tz)) =>
          if (aligned(u, t, tz)) GreaterThanOrEqual(ts, Literal(t, TimestampType)) else e

        // ---- year(ts) ⋈ integer literal ----
        case e @ EqualTo(YearOfTs(ts, tz), Literal(y: Int, _))
            if ts.deterministic =>
          (for (lo <- jan1(y, tz); hi <- jan1(y + 1, tz))
            yield And(GreaterThanOrEqual(ts, lo), LessThan(ts, hi))).getOrElse(e)
        case e @ EqualTo(Literal(y: Int, _), YearOfTs(ts, tz))
            if ts.deterministic =>
          (for (lo <- jan1(y, tz); hi <- jan1(y + 1, tz))
            yield And(GreaterThanOrEqual(ts, lo), LessThan(ts, hi))).getOrElse(e)
        case e @ GreaterThanOrEqual(YearOfTs(ts, tz), Literal(y: Int, _)) =>
          jan1(y, tz).map(GreaterThanOrEqual(ts, _)).getOrElse(e)
        case e @ GreaterThan(YearOfTs(ts, tz), Literal(y: Int, _)) =>
          jan1(y + 1, tz).map(GreaterThanOrEqual(ts, _)).getOrElse(e)
        case e @ LessThan(YearOfTs(ts, tz), Literal(y: Int, _)) =>
          jan1(y, tz).map(LessThan(ts, _)).getOrElse(e)
        case e @ LessThanOrEqual(YearOfTs(ts, tz), Literal(y: Int, _)) =>
          jan1(y + 1, tz).map(LessThan(ts, _)).getOrElse(e)
        case e @ GreaterThanOrEqual(Literal(y: Int, _), YearOfTs(ts, tz)) =>
          jan1(y + 1, tz).map(LessThan(ts, _)).getOrElse(e)
        case e @ GreaterThan(Literal(y: Int, _), YearOfTs(ts, tz)) =>
          jan1(y, tz).map(LessThan(ts, _)).getOrElse(e)
        case e @ LessThan(Literal(y: Int, _), YearOfTs(ts, tz)) =>
          jan1(y + 1, tz).map(GreaterThanOrEqual(ts, _)).getOrElse(e)
        case e @ LessThanOrEqual(Literal(y: Int, _), YearOfTs(ts, tz)) =>
          jan1(y, tz).map(GreaterThanOrEqual(ts, _)).getOrElse(e)
      }
      if (rewritten fastEquals cond) f else f.copy(condition = rewritten)
  }
}
