package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.plans.DateFilterRewrite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DateFilterRewrite: date_trunc(unit, ts) ⋈ aligned literal and
  * year(ts) ⋈ y become sargable timestamp ranges — identical results, and
  * the predicate reaches the parquet scan as PushedFilters (which Spark 4
  * does natively for to_date casts but NOT for these shapes).
  */
class DateFilterRewriteSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_dfr").toString
    // 2h-spaced timestamps from 2020-01-01 across ~5.5 months (UTC session)
    (0 until 2000).map { i =>
      (i.toLong, new Timestamp(1577836800000L /* 2020-01-01 */ + i * 7200_000L))
    }.toDF("id", "ts").write.mode("overwrite").parquet(d)
    d
  }

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations = Seq(DateFilterRewrite)
    try body finally spark.experimental.extraOptimizations = Nil
  }

  private def tsLit(s: String) = lit(s).cast("timestamp")

  private val predicates: Seq[(String, DataFrame => DataFrame)] = Seq(
    "hour_eq" -> (_.filter(date_trunc("hour", $"ts") === tsLit("2020-01-03 04:00:00"))),
    "hour_eq_flipped" -> (_.filter(tsLit("2020-01-03 04:00:00") === date_trunc("hour", $"ts"))),
    "day_eq" -> (_.filter(date_trunc("day", $"ts") === tsLit("2020-01-03 00:00:00"))),
    "month_eq" -> (_.filter(date_trunc("month", $"ts") === tsLit("2020-02-01 00:00:00"))),
    "day_ge" -> (_.filter(date_trunc("day", $"ts") >= tsLit("2020-05-10 00:00:00"))),
    "day_gt" -> (_.filter(date_trunc("day", $"ts") > tsLit("2020-01-02 00:00:00"))),
    "hour_lt" -> (_.filter(date_trunc("hour", $"ts") < tsLit("2020-01-02 06:00:00"))),
    "day_le" -> (_.filter(date_trunc("day", $"ts") <= tsLit("2020-01-02 00:00:00"))),
    "day_ge_flipped" -> (_.filter(tsLit("2020-01-05 00:00:00") >= date_trunc("day", $"ts"))),
    "day_lt_flipped" -> (_.filter(tsLit("2020-05-01 00:00:00") < date_trunc("day", $"ts"))),
    "unaligned_eq" -> (_.filter(date_trunc("day", $"ts") === tsLit("2020-01-03 05:00:00"))),
    "year_eq" -> (_.filter(year($"ts") === 2020)),
    "year_ge" -> (_.filter(year($"ts") >= 2020)),
    "year_lt_flipped" -> (_.filter(lit(2021) > year($"ts"))),
    "under_not" -> (_.filter(!(date_trunc("day", $"ts") === tsLit("2020-01-03 00:00:00")))),
    "in_or" -> (_.filter(date_trunc("day", $"ts") === tsLit("2020-01-03 00:00:00") ||
      $"id" === 1999L)))

  test("rewritten predicates return exactly the unrewritten results") {
    val df = spark.read.parquet(dir)
    predicates.foreach { case (name, p) =>
      val plain = p(df).select("id").as[Long].collect().sorted.toSeq
      val rewritten = withRule(p(df).select("id").as[Long].collect().sorted.toSeq)
      if (name != "unaligned_eq")
        assert(plain.nonEmpty, s"$name must select some rows to be a real test")
      assert(rewritten == plain, s"$name diverged under the rewrite")
    }
  }

  test("the hour-equality filter pushes to the parquet scan as a ts range") {
    val df = spark.read.parquet(dir)
    def pushed(q: DataFrame): String = {
      val scan = q.queryExecution.executedPlan.collectLeaves().mkString("\n")
      scan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    }
    def q(d: DataFrame) = d.filter(date_trunc("hour", $"ts") === tsLit("2020-01-03 04:00:00"))
    // native Spark 4: the date_trunc form stays an opaque residual filter
    assert(!pushed(q(df)).contains("GreaterThanOrEqual(ts"),
      s"expected NO ts range pushed without the rule, got: ${pushed(q(df))}")
    withRule {
      val p = pushed(q(df))
      assert(p.contains("GreaterThanOrEqual(ts") && p.contains("LessThan(ts"),
        s"expected pushed ts range, got: $p")
    }
  }

  test("non-deterministic ts operands suppress the duplicating equality rewrite") {
    // the equality rewrite expands to (ts >= lo AND ts < hi) — TWO
    // evaluations of ts. A non-deterministic operand would see two
    // different values, so the rule must leave such filters alone.
    val ndTs = timestamp_seconds((rand(7) * lit(1e9)).cast("long"))
    val detTs = timestamp_seconds($"id" * 7200L)
    def optimized(q: org.apache.spark.sql.Dataset[_]): String =
      q.queryExecution.optimizedPlan.toString
    withRule {
      val nd = spark.range(100)
        .filter(date_trunc("hour", ndTs) === tsLit("2020-01-03 04:00:00"))
      assert(optimized(nd).contains("date_trunc"),
        s"non-deterministic operand must stay unrewritten:\n${optimized(nd)}")
      val ndYear = spark.range(100).filter(year(ndTs) === 2020)
      assert(optimized(ndYear).contains("year"),
        s"non-deterministic year operand must stay unrewritten:\n${optimized(ndYear)}")
      // deterministic inline expressions still rewrite (guard is precise)
      val det = spark.range(100)
        .filter(date_trunc("hour", detTs) === tsLit("1970-01-03 04:00:00"))
      assert(!optimized(det).contains("date_trunc"),
        s"deterministic operand should rewrite:\n${optimized(det)}")
      assert(det.count() == 1L) // id=26 → 52h = 1970-01-03 04:00 UTC exactly
    }
  }

  test("timezone- and DST-awareness") {
    val rows = Seq(
      // 23:00Z on Jan 2 = Jan 3 01:00 in Helsinki (UTC+2 in winter)
      (1L, Timestamp.from(java.time.Instant.parse("2020-01-02T23:00:00Z"))),
      (2L, Timestamp.from(java.time.Instant.parse("2020-01-03T12:00:00Z"))))
      .toDF("id", "ts")
    def inTz[A](tz: String)(body: => A): A = {
      val prev = spark.conf.get("spark.sql.session.timeZone")
      spark.conf.set("spark.sql.session.timeZone", tz)
      try body finally spark.conf.set("spark.sql.session.timeZone", prev)
    }
    // day-level rewrite uses the session zone's local midnight
    inTz("Europe/Helsinki") {
      def q() = rows.filter(date_trunc("day", $"ts") === tsLit("2020-01-03 00:00:00")).count()
      assert(q() == 2L)
      assert(withRule(q()) == 2L)
      // hour-level in a DST zone: NOT rewritten (ambiguous repeated hours),
      // but must still answer correctly through the unrewritten path
      def qh() = rows.filter(date_trunc("hour", $"ts") === tsLit("2020-01-03 01:00:00")).count()
      assert(qh() == 1L)
      assert(withRule(qh()) == 1L)
    }
    inTz("UTC") {
      def q() = rows.filter(date_trunc("day", $"ts") === tsLit("2020-01-03 00:00:00")).count()
      assert(q() == 1L)
      assert(withRule(q()) == 1L)
    }
  }
}
