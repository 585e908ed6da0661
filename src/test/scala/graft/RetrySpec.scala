package graft

import java.nio.file.{Files, Paths}

import graft.datagen.DataGen
import graft.pipeline.{Incremental, Retry, RetryAttempt, RetryPolicy}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** Retry/backoff semantics (reference order_processing_incremental.py:20-21:
  * retries=2, retry_delay=5 min). The generic loop is asserted with a fake
  * sleeper; the pipeline-level test proves the property that makes retrying
  * sound — a transiently-failed tick completes exactly once on retry.
  */
class RetrySpec extends SparkSpec {

  private class Boom(n: Int) extends RuntimeException(s"boom $n")

  test("default policy matches the reference DAG: 2 retries, fixed 5-min delay") {
    val p = RetryPolicy()
    assert(p.retries == 2)
    assert(p.delayMillis == 5L * 60 * 1000)
    assert(p.delayBefore(1) == p.delayMillis && p.delayBefore(2) == p.delayMillis)
  }

  test("flaky body succeeds on the final allowed attempt; delays follow the policy") {
    val slept = ArrayBuffer.empty[Long]
    val seen = ArrayBuffer.empty[RetryAttempt]
    var calls = 0
    val out = Retry.withRetries(RetryPolicy(retries = 2, delayMillis = 1000), slept.append, seen.append) { attempt =>
      calls += 1
      if (attempt < 3) throw new Boom(attempt)
      s"ok@$attempt"
    }
    assert(out == "ok@3" && calls == 3)
    assert(slept.toSeq == Seq(1000L, 1000L), "fixed delay before each retry, none before the first attempt")
    assert(seen.map(_.attempt).toSeq == Seq(1, 2, 3))
    assert(seen.map(_.error.isDefined).toSeq == Seq(true, true, false))
    assert(seen.map(_.delayBeforeMillis).toSeq == Seq(0L, 1000L, 1000L))
  }

  test("exhaustion rethrows the last error with earlier ones suppressed") {
    val e = intercept[Boom] {
      Retry.withRetries(RetryPolicy(retries = 2, delayMillis = 0), _ => ()) { attempt =>
        throw new Boom(attempt)
      }
    }
    assert(e.getMessage == "boom 3", "the LAST failure is the thrown one")
    assert(e.getSuppressed.map(_.getMessage).toSeq == Seq("boom 1", "boom 2"))
  }

  test("exponential backoff grows per retry and caps at maxDelayMillis") {
    val p = RetryPolicy(retries = 4, delayMillis = 100, backoffFactor = 2.0, maxDelayMillis = 350)
    assert(Seq(1, 2, 3, 4).map(p.delayBefore) == Seq(100L, 200L, 350L, 350L))
    val slept = ArrayBuffer.empty[Long]
    intercept[Boom] {
      Retry.withRetries(p, slept.append) { attempt => throw new Boom(attempt) }
    }
    assert(slept.toSeq == Seq(100L, 200L, 350L, 350L))
  }

  test("a throwing onAttempt observer neither aborts retries nor fails a success") {
    var calls = 0
    val out = Retry.withRetries(RetryPolicy(retries = 2, delayMillis = 0), _ => (),
      _ => throw new RuntimeException("audit sink down")) { attempt =>
      calls += 1
      if (attempt < 2) throw new Boom(attempt)
      "ok"
    }
    assert(out == "ok" && calls == 2)
  }

  test("fatal errors are not retried") {
    var calls = 0
    intercept[InterruptedException] {
      Retry.withRetries(RetryPolicy(retries = 5, delayMillis = 0)) { _ =>
        calls += 1
        throw new InterruptedException("worker killed")
      }
    }
    assert(calls == 1, "a fatal error must propagate without retry")
    Thread.interrupted() // clear any stray flag for later suites
  }

  test("pipeline tick: a transiently-corrupt landing completes exactly once on retry") {
    val root = Files.createTempDirectory("graft_retry").toString
    val landing = s"$root/landing"
    val wh = Incremental.Warehouse(s"$root/wh")
    DataGen.writeOrdersNdjson(spark, landing, n = 30, seed = 11L)
    // A partially-uploaded file: malformed NDJSON that fails the schema
    // gate BEFORE any write. The retry handler simulates the upload
    // completing (the transient cause clearing) by removing it.
    val partial = Paths.get(landing, "partial.json")
    Files.write(partial, "{\"order_id\": \"OR".getBytes("UTF-8"))

    val attempts = ArrayBuffer.empty[RetryAttempt]
    val slept = ArrayBuffer.empty[Long]
    val r = Incremental.runWithRetries(spark, landing, wh, "b1",
      policy = RetryPolicy(retries = 2, delayMillis = 7),
      sleep = slept.append,
      onAttempt = { a =>
        attempts.append(a)
        if (a.attempt == 1) Files.delete(partial)
      })

    assert(attempts.size == 2 && attempts.head.error.exists(_.contains("schema_violations")))
    assert(slept.toSeq == Seq(7L), "one delay before the single retry")
    assert(r.stagedOrders == 30 && r.newFactRows > 0)
    // exactly-once: the retried tick wrote the fact exactly once
    val fact = spark.read.parquet(wh.factOrders)
    assert(fact.count() == r.newFactRows)
    assert(fact.groupBy("order_id", "product_id").count().filter(col("count") > 1).count() == 0)
  }
}
