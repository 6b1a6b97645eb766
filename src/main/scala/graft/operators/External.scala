package graft.operators

/** Rate-limit + retry machinery for the external-call operators (X1/X2 —
  * SURVEY.md §2.9): the reference throttles the metrics API to 2 req/s
  * with a min-interval sleep (`journal_metrics.py:80-90`) and retries LLM
  * calls with exponential backoff 2^attempt (`llm_api.py:178-201`).
  *
  * Both live INSIDE mapPartitions on the executor: each partition owns a
  * bucket, so cluster-wide rate = partitions × bucket rate — size the
  * partition count of the distinct-key frame to the service's budget.
  * The clock is injected so specs can drive time deterministically.
  */
object External {

  trait Clock extends Serializable {
    def nanoTime(): Long
    def sleep(millis: Long): Unit
  }

  object SystemClock extends Clock {
    def nanoTime(): Long = System.nanoTime()
    def sleep(millis: Long): Unit = Thread.sleep(millis)
  }

  /** Deterministic test clock: sleeping advances virtual time. */
  final class FakeClock(startNanos: Long = 0L) extends Clock {
    private var now = startNanos
    val sleeps = collection.mutable.Buffer[Long]()
    def nanoTime(): Long = now
    def sleep(millis: Long): Unit = { sleeps += millis; now += millis * 1000000L }
    def advance(millis: Long): Unit = now += millis * 1000000L
  }

  /** Token bucket: at most `ratePerSec` acquisitions per second, with a
    * burst of `burst`. The reference's 0.5s-min-interval throttle is
    * TokenBucket(2, 1). */
  final class TokenBucket(ratePerSec: Double, burst: Int,
                          clock: Clock = SystemClock) extends Serializable {
    private var tokens: Double = burst.toDouble
    private var last: Long = clock.nanoTime()

    def acquire(): Unit = synchronized {
      refill()
      while (tokens < 1.0) {
        val needMs = math.ceil((1.0 - tokens) / ratePerSec * 1000).toLong
        clock.sleep(needMs)
        refill()
      }
      tokens -= 1.0
    }

    private def refill(): Unit = {
      val now = clock.nanoTime()
      tokens = math.min(burst.toDouble,
        tokens + (now - last) / 1e9 * ratePerSec)
      last = now
    }
  }

  /** Exponential backoff retry: attempts at 0,1,..,maxRetries; sleep
    * base * 2^attempt between failures (reference `llm_api.py:196-201`).
    * The last failure propagates. `retryIf` classifies failures:
    * non-retryable ones (e.g. HTTP 401 — the request will never succeed)
    * propagate immediately instead of burning the backoff budget. */
  def retryWithBackoff[T](maxRetries: Int, baseMillis: Long = 1000,
                          clock: Clock = SystemClock,
                          retryIf: Throwable => Boolean = _ => true)
                         (f: => T): T = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        // NonFatal only: fatal errors (OOM) and InterruptedException from
        // Spark task kills must propagate immediately, not be slept on
        // and retried
        case scala.util.control.NonFatal(e) =>
          if (attempt >= maxRetries || !retryIf(e)) throw e
          clock.sleep(baseMillis * (1L << attempt))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
