package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness must fail loudly: a query that throws is recorded as an
  * error, never as a time-to-exception "result" (round 5 shipped 11 broken
  * queries posting 0.04 s crash latencies as wins). */
class BenchSpec extends AnyFunSuite {

  test("timeOne records a successful run's time with no error") {
    val (name, t, err) = Bench.timeOne("ok", () => 42L)
    assert(name == "ok")
    assert(t >= 0.0)
    assert(err.isEmpty)
  }

  test("timeOne records a throwing query as an error, not a time") {
    val (_, _, err) =
      Bench.timeOne("boom", () => throw new IllegalStateException("DATATYPE_MISMATCH"))
    assert(err.isDefined)
    assert(err.get.contains("IllegalStateException"))
    assert(err.get.contains("DATATYPE_MISMATCH"))
  }

  test("timeOne truncates the error to one bounded line") {
    val msg = "line1 " + ("x" * 500) + "\nline2 secret"
    val (_, _, err) = Bench.timeOne("big", () => throw new RuntimeException(msg))
    assert(err.isDefined)
    assert(!err.get.contains("line2"))
    assert(err.get.length <= "RuntimeException: ".length + 160)
  }

  test("timeOne reports an error even when only the second run throws") {
    var calls = 0
    val (_, _, err) = Bench.timeOne("flaky", () => {
      calls += 1
      if (calls >= 2) throw new RuntimeException("second run dies") else 1L
    })
    assert(err.isDefined)
  }

  test("a sweep breach that survives isolation is a regression; one that doesn't is noise") {
    // q_real genuinely slowed (isolation still shows 4x prev); q_noise only
    // looked slow inside the sweep (isolation returns to baseline) — the
    // round-6 q57/x10 shape, which must NOT reach the regressions array
    val results = Seq("q_real" -> 2.0, "q_noise" -> 2.0, "q_fine" -> 0.4)
    val prev = Map("q_real" -> 0.5, "q_noise" -> 0.5, "q_fine" -> 0.4)
    var isolated = List.empty[String]
    val (regs, noise) = Bench.adjudicateBreaches(results, prev, 0.5, {
      name => isolated ::= name
        if (name == "q_real") 2.0 else 0.55
    })
    assert(isolated.toSet === Set("q_real", "q_noise"),
      "only sweep breaches get isolation re-times")
    assert(regs.size === 1 && regs.head.contains("\"q_real\""))
    assert(regs.head.contains("\"swept\":2.000") && regs.head.contains("\"now\":2.000"))
    assert(noise.size === 1 && noise.head.contains("\"q_noise\""))
    assert(noise.head.contains("\"isolated\":0.550"))
  }

  test("adjudication respects the noise floor and missing-prev queries") {
    // breaches under the absolute floor, or with no previous record, never
    // reach isolation at all
    var calls = 0
    val (regs, noise) = Bench.adjudicateBreaches(
      Seq("tiny" -> 0.4, "new_query" -> 9.9),
      Map("tiny" -> 0.1), 0.5, { _ => calls += 1; 99.0 })
    assert(calls === 0)
    assert(regs.isEmpty && noise.isEmpty)
  }
}
