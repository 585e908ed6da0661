package graft.pipeline

import scala.util.control.NonFatal

/** Task-level retry/backoff semantics from the reference DAG's
  * `default_args` (order_processing_incremental.py:20-21: `retries: 2`,
  * `retry_delay: timedelta(minutes=5)`). The reference delegates this to
  * Airflow; here it is an engine-level primitive so a pipeline run carries
  * the same at-least-once contract without an orchestrator.
  *
  * Retrying a whole pipeline tick is only sound because the pipeline is
  * idempotent by construction: the fact append is anti-join guarded (J4,
  * Incremental.run) and the hourly aggregate is a keyed overwrite (S5), so
  * a re-run after a mid-flight failure re-stages the same files and writes
  * nothing twice. `RetrySpec` measures exactly that, not just the loop.
  *
  * The sleeper is injected (default `Thread.sleep`) so specs assert the
  * delay schedule without waiting 5 real minutes, and so a cluster job can
  * substitute an interruptible wait.
  */
final case class RetryPolicy(
    retries: Int = 2,
    delayMillis: Long = 5L * 60 * 1000,
    /** 1.0 = Airflow's fixed delay; >1 = exponential backoff. */
    backoffFactor: Double = 1.0,
    maxDelayMillis: Long = Long.MaxValue) {
  require(retries >= 0, s"retries must be >= 0, got $retries")
  require(delayMillis >= 0, s"delayMillis must be >= 0, got $delayMillis")
  require(backoffFactor >= 1.0, s"backoffFactor must be >= 1, got $backoffFactor")

  /** Delay before retry attempt `n` (n=1 is the first RETRY, i.e. the
    * second execution). Fixed when backoffFactor == 1.
    */
  def delayBefore(n: Int): Long = {
    val d = delayMillis * math.pow(backoffFactor, (n - 1).toDouble)
    math.min(if (d > Long.MaxValue.toDouble) Long.MaxValue else d.toLong, maxDelayMillis)
  }
}

/** One execution of the task body: `attempt` counts from 1; `error` is the
  * failure that triggered the NEXT attempt (None on success).
  */
final case class RetryAttempt(attempt: Int, delayBeforeMillis: Long, error: Option[String])

object Retry {

  /** Run `body` under `policy`: up to `1 + policy.retries` executions,
    * sleeping the policy's delay between them. Only non-fatal errors are
    * retried (a fatal JVM error propagates immediately, as Airflow's worker
    * death would). On exhaustion the LAST error is thrown with the earlier
    * ones attached as suppressed, so the failure report shows the whole
    * history. `onAttempt` observes each execution (for audit logging) and
    * is BEST-EFFORT: an observer that itself throws (a flaky audit sink —
    * exactly the environment retries exist for) must neither abort the
    * remaining retries nor turn a committed success into a failure, so
    * its non-fatal errors are swallowed (Airflow's callback contract).
    */
  def withRetries[T](policy: RetryPolicy = RetryPolicy(),
                     sleep: Long => Unit = Thread.sleep,
                     onAttempt: RetryAttempt => Unit = _ => ())(body: Int => T): T = {
    def observe(a: RetryAttempt): Unit =
      try onAttempt(a) catch { case NonFatal(_) => () }
    var previous: List[Throwable] = Nil
    var attempt = 1
    while (true) {
      val delay = if (attempt == 1) 0L else policy.delayBefore(attempt - 1)
      if (delay > 0) sleep(delay)
      try {
        val out = body(attempt)
        observe(RetryAttempt(attempt, delay, None))
        return out
      } catch {
        case NonFatal(e) =>
          observe(RetryAttempt(attempt, delay, Some(e.toString)))
          if (attempt > policy.retries) {
            previous.reverse.foreach(e.addSuppressed)
            throw e
          }
          previous = e :: previous
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
