package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.External
import graft.operators.External.{DualBudget, FakeClock, TokenBucket}

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

  test("dual budget: the rpm unit saturates — a full minute's burst " +
    "fires instantly, the next request waits a refill interval") {
    val clock = new FakeClock()
    val b = new DualBudget(rpm = 3, tpm = 0, clock) // tpm disabled
    (1 to 3).foreach(_ => b.acquire(999999L)) // token charge ignored
    assert(clock.sleeps.isEmpty)
    b.acquire(1L) // 4th request: 1 unit at 3/60 per sec = 20s
    assert(clock.sleeps.sum >= 20000 && clock.sleeps.sum <= 20100)
  }

  test("dual budget: the tpm unit saturates independently of request " +
    "count — the wait is proportional to the token charge") {
    val clock = new FakeClock()
    val b = new DualBudget(rpm = 0, tpm = 1200, clock) // rpm disabled
    b.acquire(1000L) // burst covers it
    assert(clock.sleeps.isEmpty)
    b.acquire(1000L) // 200 left, need 800 more at 20/s = 40s
    assert(clock.sleeps.sum >= 40000 && clock.sleeps.sum <= 40100)
  }

  test("dual budget: both units gate — rpm spaces small requests even " +
    "when tokens abound, and a charge above the tpm burst is refused " +
    "loudly instead of sleeping forever") {
    val clock = new FakeClock()
    val b = new DualBudget(rpm = 2, tpm = 1000000, clock)
    b.acquire(10L); b.acquire(10L)
    assert(clock.sleeps.isEmpty)
    b.acquire(10L) // rpm=2 → 1 unit at 2/60 per sec = 30s
    assert(clock.sleeps.sum >= 30000 && clock.sleeps.sum <= 30100)
    val e = intercept[IllegalArgumentException] {
      new DualBudget(rpm = 0, tpm = 100, clock).acquire(101L)
    }
    assert(e.getMessage.contains("exceeds burst"))
  }

  test("reconcile pacing property: over random acquire/reconcile " +
    "sequences the ACTUAL metered token volume never exceeds " +
    "tpm/60 x elapsed + burst — refunds can't inflate the real budget") {
    import org.scalacheck.{Gen, Prop, Test => SchkTest}
    val tpm = 6000
    val callGen = Gen.zip(Gen.chooseNum(1L, 3000L), Gen.chooseNum(0L, 4000L))
    val prop = Prop.forAll(Gen.listOfN(40, callGen)) { calls =>
      val clock = new FakeClock()
      val b = new DualBudget(rpm = 0, tpm = tpm, clock)
      var actualTotal = 0L
      calls.foreach { case (charge, actual) =>
        b.acquire(charge)
        b.reconcile(charge, actual)
        actualTotal += actual
      }
      val elapsedSec = clock.nanoTime() / 1e9
      // the real consumption must fit the declared budget plus the
      // initial burst of credit plus at most ONE un-waited over-meter
      // debit (the final reconcile's debt is only collected by the
      // NEXT acquire, which this sequence never makes)
      actualTotal <= tpm / 60.0 * elapsedSec + tpm + 4000 + 1e-6
    }
    val res = SchkTest.check(
      SchkTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, res.status.toString)
  }

  test("token bucket adjust: refunds are capped at the burst, debits " +
    "may drive the balance negative and the next acquire waits it out") {
    val clock = new FakeClock()
    val tb = new TokenBucket(1.0, 10, clock)
    tb.acquire(10.0)       // drained
    tb.adjust(8.0)         // refund 8
    tb.acquire(8.0)        // covered — no sleep
    assert(clock.sleeps.isEmpty)
    tb.adjust(100.0)       // refund far beyond capacity → capped at 10
    tb.acquire(10.0)
    assert(clock.sleeps.isEmpty)
    tb.adjust(-5.0)        // debit below zero (balance −5)
    tb.acquire(1.0)        // needs 6 units at 1/s = 6s
    assert(clock.sleeps.sum >= 6000 && clock.sleeps.sum <= 6100)
  }

  test("dual budget reconcile: refunding the unused completion " +
    "headroom sustains tpm/actual throughput instead of " +
    "tpm/(estimate+cap)") {
    val clock = new FakeClock()
    val b = new DualBudget(rpm = 0, tpm = 600, clock)
    // reserve-only metering admits exactly 2×300 charges per burst;
    // with actuals of 50 reconciled back each call nets 50, so six
    // calls leave 600 − 6·50 = 300 — all sleep-free
    (1 to 6).foreach { _ =>
      b.acquire(300L)
      b.reconcile(charged = 300L, actual = 50L)
    }
    assert(clock.sleeps.isEmpty, clock.sleeps.toString)
    b.acquire(300L) // drains the remaining 300, still no sleep
    assert(clock.sleeps.isEmpty)
    // an UNDER-estimate debits: the server metered 200 MORE than the
    // reserve, driving the balance to −200; the next 200-token draw
    // must wait the full 400-token shortfall out at 10/s = 40s
    b.reconcile(charged = 300L, actual = 500L)
    b.acquire(200L)
    assert(clock.sleeps.sum >= 40000 && clock.sleeps.sum <= 40100)
  }
}
