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

  /** Token bucket: at most `ratePerSec` acquisition-units per second,
    * with a burst of `burst`. The reference's 0.5s-min-interval throttle
    * is TokenBucket(2, 1). `acquire(n)` is the WEIGHTED draw (n units at
    * once — the tpm accounting of [[DualBudget]]); a draw larger than
    * the burst can never be satisfied and fails loudly instead of
    * sleeping forever. */
  final class TokenBucket(ratePerSec: Double, burst: Int,
                          clock: Clock = SystemClock) extends Serializable {
    private var tokens: Double = burst.toDouble
    private var last: Long = clock.nanoTime()

    def acquire(): Unit = acquire(1.0)

    def acquire(n: Double): Unit = synchronized {
      require(n <= burst,
        s"TokenBucket.acquire($n) exceeds burst=$burst — the draw can " +
          "never be satisfied; raise the budget or shrink the request")
      refill()
      while (tokens < n) {
        val needMs = math.ceil((n - tokens) / ratePerSec * 1000).toLong
        clock.sleep(needMs)
        refill()
      }
      tokens -= n
    }

    /** Post-hoc correction of an earlier draw: positive `delta`
      * refunds unused reservation (capped at the burst), negative
      * debits an under-reserve — the balance may go NEGATIVE, which
      * simply makes the next `acquire` wait the shortfall out. The
      * reconciliation half of reserve-then-reconcile metering. */
    def adjust(delta: Double): Unit = synchronized {
      refill()
      tokens = math.min(burst.toDouble, tokens + delta)
    }

    private def refill(): Unit = {
      val now = clock.nanoTime()
      tokens = math.min(burst.toDouble,
        tokens + (now - last) / 1e9 * ratePerSec)
      last = now
    }
  }

  /** Dual per-minute budget — the reference's SiliconFlow client
    * DECLARES rpm (requests/minute) and tpm (tokens/minute) limits
    * (`llm_api.py:279`, config `siliconflow_rpm`/`siliconflow_tpm`) but
    * never enforces them, leaning on the server's RateLimitError +
    * exponential backoff instead (`llm_api.py:348-357`). This enforces
    * the declared contract client-side so a well-sized job never trips
    * the server limit at all: one bucket per unit, each refilling
    * continuously at budget/60 per second with a full minute's budget
    * as burst. `acquire(tokens)` draws 1 request-unit AND `tokens`
    * token-units, sleeping until BOTH budgets allow (requests first —
    * the cheaper bucket gates before the expensive one is debited).
    * A non-positive budget disables that unit. Per-partition like every
    * throttle here: cluster-wide budget = partitions × (rpm, tpm). */
  final class DualBudget(rpm: Int, tpm: Int,
                         clock: Clock = SystemClock) extends Serializable {
    private val req =
      if (rpm > 0) new TokenBucket(rpm / 60.0, rpm, clock) else null
    private val tok =
      if (tpm > 0) new TokenBucket(tpm / 60.0, tpm, clock) else null

    def acquire(tokens: Long): Unit = {
      if (req != null) req.acquire()
      if (tok != null) tok.acquire(tokens.toDouble)
    }

    /** Reconcile a completed call against the server's metered actuals
      * (the `usage` object of a chat-completions response): the
      * request-time draw is a worst-case RESERVE (prompt estimate +
      * full completion cap — the safe direction for a throttle), and
      * without reconciliation a long-running job under-utilizes the
      * declared tpm by the unused completion headroom. Refunds
      * `charged - actual` when the reserve was high; debits the
      * difference (possibly below zero — the next acquire waits it
      * out) when the server metered more than estimated. Calls with no
      * usable `usage` simply keep the conservative reserve. */
    def reconcile(charged: Long, actual: Long): Unit =
      if (tok != null && actual >= 0)
        tok.adjust(charged.toDouble - actual.toDouble)
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
