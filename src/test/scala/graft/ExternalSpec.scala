package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.External
import graft.operators.External.{FakeClock, TokenBucket}

class ExternalSpec extends AnyFunSuite {

  test("token bucket enforces the reference's 2 req/s throttle shape") {
    val clock = new FakeClock()
    val tb = new TokenBucket(2.0, 1, clock) // = 0.5s min interval
    tb.acquire()                  // burst token, no sleep
    tb.acquire()                  // must wait ~500ms
    tb.acquire()                  // another ~500ms
    assert(clock.sleeps.sum >= 1000 && clock.sleeps.sum <= 1100)
  }

  test("token bucket refills while caller works") {
    val clock = new FakeClock()
    val tb = new TokenBucket(2.0, 1, clock)
    tb.acquire()
    clock.advance(600) // caller spent 600ms working — token refilled
    tb.acquire()
    assert(clock.sleeps.isEmpty)
  }

  test("retry backs off 2^attempt and returns first success") {
    val clock = new FakeClock()
    var calls = 0
    val out = External.retryWithBackoff(maxRetries = 3, baseMillis = 1000,
      clock = clock) {
      calls += 1
      if (calls < 3) throw new RuntimeException("flaky")
      "ok"
    }
    assert(out === "ok")
    assert(calls === 3)
    assert(clock.sleeps.toSeq === Seq(1000L, 2000L)) // 2^0, 2^1 seconds
  }

  test("retry exhausts and rethrows the last failure") {
    val clock = new FakeClock()
    var calls = 0
    val e = intercept[RuntimeException] {
      External.retryWithBackoff(maxRetries = 2, baseMillis = 10,
        clock = clock) { calls += 1; throw new RuntimeException(s"n$calls") }
    }
    assert(e.getMessage === "n3") // attempts 0,1,2
    assert(clock.sleeps.toSeq === Seq(10L, 20L))
  }
}
