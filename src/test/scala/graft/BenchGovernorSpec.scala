package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench wall-clock governor's degradation ORDER: as the
  * budget shrinks, repeat passes shed before rechecks would at the
  * same elapsed point, warmup is capped at a quarter of the budget,
  * and pass 1 is unconditional — the record degrades stepwise and
  * loudly instead of the driver killing the process with NO record
  * (the r12 rc=124 failure mode).
  */
class BenchGovernorSpec extends AnyFunSuite {
  import Bench.Governor._

  test("pass 1 always runs, even with the budget already blown") {
    assert(passAllowed(1, elapsed = 99999, lastPassSecs = 500, budget = 100))
  }

  test("repeat passes shed when the projected repeat no longer fits 85% of budget") {
    // plenty of room: 100s elapsed + 110s projected < 0.85*1500
    assert(passAllowed(2, elapsed = 100, lastPassSecs = 100, budget = 1500))
    // tight: 1100 + 1.1*200 = 1320 > 0.85*1500 = 1275 -> shed
    assert(!passAllowed(3, elapsed = 1100, lastPassSecs = 200, budget = 1500))
  }

  test("rechecks shed only at full budget — later than passes (degradation order)") {
    // same state: a repeat PASS is already disallowed...
    val (el, last, b) = (1300.0, 150.0, 1500.0)
    assert(!passAllowed(2, el, last, b))
    // ...but a cheap single-query recheck still fits
    assert(recheckAllowed(el, querySecs = 5, budget = b))
    // and rechecks shed once even the single re-run would overrun
    assert(!recheckAllowed(1490, querySecs = 10, budget = b))
  }

  test("warmup is capped at a quarter of the budget") {
    assert(warmupAllowed(elapsed = 300, budget = 1500))
    assert(!warmupAllowed(elapsed = 380, budget = 1500))
  }

  test("recheck verdict: rerun back under 1.3x prior is transient") {
    assert(verdict(prior = 1.0, interleaved = 2.0, rerun = 1.1,
      runMedianDelta = 1.0) == "transient")
    // min(interleaved, rerun) decides — a fast interleaved sample also clears it
    assert(verdict(prior = 1.0, interleaved = 1.2, rerun = 9.0,
      runMedianDelta = 1.0) == "transient")
  }

  test("recheck verdict: persistent delta on an idle box is reproduced") {
    assert(verdict(prior = 1.0, interleaved = 2.0, rerun = 1.9,
      runMedianDelta = 1.05) == "reproduced")
  }

  test("recheck verdict: persistent delta on a contended box is box-noise, not reproduced") {
    // the r13 driver-run condition: q_chunk 0.39s prior, ~51s samples,
    // with the WHOLE run's median sitting 2.06x over prior — the old
    // verdict said "reproduced"; box-relative reading says box-noise
    assert(verdict(prior = 0.39, interleaved = 51.3, rerun = 48.0,
      runMedianDelta = 2.06) == "box-noise")
    // threshold: at exactly 1.5x run-median the box still counts as credible
    assert(verdict(prior = 1.0, interleaved = 2.0, rerun = 1.9,
      runMedianDelta = 1.5) == "reproduced")
    assert(verdict(prior = 1.0, interleaved = 2.0, rerun = 1.9,
      runMedianDelta = 1.51) == "box-noise")
  }
}
