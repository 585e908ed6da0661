package graft

import org.scalatest.funsuite.AnyFunSuite

/** The official bench line is the round's only persistent perf artifact
  * and must stay valid JSON on ANY box — including comma-decimal locales,
  * where a default-locale float format emits "12,34" (the historical
  * "parsed": null failure). No Spark session needed: the formatting
  * helpers are pure.
  */
class LocaleSpec extends AnyFunSuite {

  private def withLocale[A](l: java.util.Locale)(body: => A): A = {
    val prev = java.util.Locale.getDefault
    java.util.Locale.setDefault(l)
    try body finally java.util.Locale.setDefault(prev)
  }

  test("num emits dot decimals under a comma-decimal default locale") {
    withLocale(java.util.Locale.GERMANY) {
      assert(Bench.num(12.34, 2) == "12.34")
      assert(Bench.num(1234.5, 2) == "1234.5", "no thousands separators either")
      // the contrast this guards against: the default-locale formatter
      // really does emit a comma here
      assert(String.format("%.2f", Double.box(12.34)) == "12,34")
    }
  }

  test("num trims trailing zeros without corrupting the value") {
    assert(Bench.num(0.50, 2) == "0.5")
    assert(Bench.num(2.00, 2) == "2")
    assert(Bench.num(0.0, 1) == "0")
    assert(Bench.num(-1.0, 2) == "-1")
    assert(Bench.num(49.064, 3) == "49.064")
  }

  test("jstr escapes quotes, backslashes, and control chars") {
    assert(Bench.jstr("plain") == "\"plain\"")
    assert(Bench.jstr("a\"b\\c") == "\"a\\\"b\\\\c\"")
    assert(Bench.jstr("x\ny") == "\"x\\u000ay\"")
  }
}
