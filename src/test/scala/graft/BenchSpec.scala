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
}
