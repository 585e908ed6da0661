package graft

import graft.functions.DotOrdered
import org.apache.spark.sql.functions._

/** Custom Catalyst expression semantics: the codegen'd ordered dot product
  * must be bit-identical to the interpreted HOF fold it replaced (that
  * equivalence is what keeps the DuckDB oracle parity intact).
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("dot_ordered: known values via Column API and SQL registration") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val viaColumn = df.select(DotOrdered($"a", $"b")).head.getDouble(0)
    assert(viaColumn == 32.0)
    DotOrdered.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_dot_ordered(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head.getDouble(0)
    assert(viaSql == 11.0)
  }

  test("rolling_min_hash: equals the direct window fold; edge cases") {
    import graft.functions.RollingMinHash
    import RollingMinHash.{B, M}
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(30)(Array.fill(rng.nextInt(20) + 1)(rng.nextLong().abs % M)) ++
      Seq(Array.empty[Long], Array(5L), Array(1L, 2L, 3L)) // shorter than window
    val df = rows.zipWithIndex.map { case (a, i) => (i, a) }.toDF("id", "lh")
    val got = df.select($"id", RollingMinHash($"lh", 8).as("fp"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    def fold(xs: Seq[Long]): Long = xs.tail.foldLeft(xs.head)((a, b) => (a * B + b) % M)
    rows.zipWithIndex.foreach { case (a, i) =>
      val expected =
        if (a.isEmpty) None
        else if (a.length <= 8) Some(fold(a.toSeq))
        else Some(a.toSeq.sliding(8).map(w => fold(w)).min)
      assert(got(i) == expected, s"row $i: ${got(i)} != $expected")
    }
  }

  test("SQL-path builders: BIGINT window literal accepted, bad calls fail clearly") {
    import graft.functions.{DotOrdered, RollingMinHash}
    DotOrdered.register(spark)
    RollingMinHash.register(spark)
    val df = Seq((0, Array(1L, 2L, 3L))).toDF("id", "lh")
    df.createOrReplaceTempView("fn_builder_t")
    // 8 parses as an INT literal; 8L-equivalent BIGINT must also work
    // (pre-fix this threw ClassCastException: Long cannot be cast to Int)
    val viaBigint = spark.sql(
      s"SELECT ${RollingMinHash.fnName}(lh, CAST(8 AS BIGINT)) FROM fn_builder_t")
      .collect().head.getLong(0)
    val viaInt = spark.sql(
      s"SELECT ${RollingMinHash.fnName}(lh, 8) FROM fn_builder_t")
      .collect().head.getLong(0)
    assert(viaBigint == viaInt)
    // wrong arity and non-literal window fail with descriptive messages,
    // not IndexOutOfBounds / ClassCastException
    def failsWith(sql: String, fragment: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).collect())
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
      assert(chain(e).exists(_.contains(fragment)),
        s"expected '$fragment' in error chain, got: ${chain(e).mkString(" | ")}")
    }
    failsWith(s"SELECT ${RollingMinHash.fnName}(lh) FROM fn_builder_t",
      "exactly 2 arguments")
    failsWith(s"SELECT ${RollingMinHash.fnName}(lh, id) FROM fn_builder_t",
      "literal integer")
    failsWith(s"SELECT ${DotOrdered.fnName}(lh) FROM fn_builder_t",
      "exactly 2 arguments")
  }

  test("rolling_min_hash: full-range and negative inputs normalize like pre-reduced ones") {
    import graft.functions.RollingMinHash
    import RollingMinHash.M
    val rng = new scala.util.Random(11)
    val raw = Array.fill(20)(rng.nextLong()) // full int64 range, negatives included
    val reduced = raw.map(x => ((x % M) + M) % M)
    val df = Seq((0, raw), (1, reduced)).toDF("id", "lh")
    val fps = df.select($"id", RollingMinHash($"lh", 8).as("fp"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(fps(0) == fps(1))
  }

  test("dot_ordered: bit-identical to the ordered HOF fold on random float vectors") {
    val rng = new scala.util.Random(2026)
    val rows = Seq.fill(50)((
      Array.fill(64)(rng.nextFloat() * 20f - 10f),
      Array.fill(64)(rng.nextFloat() * 20f - 10f)))
    val df = rows.toDF("a", "b")
    val both = df.select(
      DotOrdered($"a", $"b").as("fast"),
      aggregate(
        zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("hof"))
      .as[(Double, Double)].collect()
    both.foreach { case (fast, hof) =>
      // exact equality required: same IEEE operation sequence
      assert(java.lang.Double.doubleToLongBits(fast) ==
        java.lang.Double.doubleToLongBits(hof))
    }
  }

  test("bq_float_str: pinned ZetaSQL renderings (FLOAT64→STRING parity)") {
    import graft.functions.BqFloatFormat.render
    // GoogleSQL/ZetaSQL shortest-round-trip %g: integral doubles drop the
    // ".0" Spark would print; scientific uses lowercase e with a signed
    // two-digit-minimum exponent; nan/inf lowercase; zero never signed.
    val pinned = Seq(
      100.0 -> "100", 123.45 -> "123.45", 0.1 -> "0.1", -2.5 -> "-2.5",
      0.0 -> "0", -0.0 -> "0", 0.0001 -> "0.0001", 0.00001 -> "1e-05",
      1e20 -> "1e+20", 1e15 -> "1e+15", 1.5e-5 -> "1.5e-05",
      // 16 significant digits with exponent 15: %.15g fails round-trip,
      // %.16g places it as plain notation (exp < precision)
      1234567890123456.0 -> "1234567890123456",
      Double.MaxValue -> "1.7976931348623157e+308",
      Double.NaN -> "nan",
      Double.PositiveInfinity -> "inf",
      Double.NegativeInfinity -> "-inf")
    pinned.foreach { case (d, want) =>
      assert(render(d) == want, s"render($d) = ${render(d)}, want $want")
    }
  }

  test("bq_float_str: round-trips every double; codegen and SQL paths agree") {
    import graft.functions.{BqFloatFormat, BqFloatStr}
    val rng = new scala.util.Random(612)
    val doubles = Seq.fill(300)(rng.nextDouble() * math.pow(10, rng.nextInt(41) - 20) *
      (if (rng.nextBoolean()) 1 else -1)) ++
      Seq.fill(100)(java.lang.Double.longBitsToDouble(rng.nextLong()))
        .filterNot(_.isNaN)
    // shortest-round-trip guarantee: parse(render(d)) is bit-identical
    doubles.foreach { d =>
      val s = BqFloatFormat.render(d)
      val back = java.lang.Double.parseDouble(s)
      assert(java.lang.Double.doubleToRawLongBits(back) ==
        java.lang.Double.doubleToRawLongBits(if (d == 0.0) math.abs(d) else d),
        s"$d -> $s -> $back does not round-trip")
    }
    // expression (codegen) and SQL registration match the static renderer
    val df = doubles.toDF("d")
    df.select($"d", BqFloatStr($"d").as("s")).collect().foreach { r =>
      assert(r.getString(1) == BqFloatFormat.render(r.getDouble(0)))
    }
    BqFloatStr.register(spark)
    val viaSql = spark.sql("SELECT graft_bq_float_str(100.0D) AS s").head.getString(0)
    assert(viaSql == "100")
    // float input widens like a FLOAT64 cast would
    val f = Seq(2.5f).toDF("f").select(BqFloatStr($"f")).head.getString(0)
    assert(f == "2.5")
  }
}
