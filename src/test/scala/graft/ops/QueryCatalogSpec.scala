package graft.ops

import graft.SparkTestBase

/** Smoke: every catalog query runs on sf0.001 and returns rows with the
  * aliased schema. Exact value matching happens against the DuckDB oracle
  * (scripts/check.py locally; the driver's t2 gate per-round). */
class QueryCatalogSpec extends SparkTestBase {

  (QueryCatalog.entries ++ AnalyticsCatalog.entries).foreach { e =>
    test(s"${e.name} runs and returns rows") {
      val df = e.fn(spark, sfDir)
      val n = df.count()
      assert(n > 0, s"${e.name} returned no rows")
      assert(df.columns.distinct.length === df.columns.length,
        s"${e.name} has duplicate column names: ${df.columns.mkString(",")}")
    }
  }

  test("catalog names are unique and oracle keys match query keys") {
    val names = (QueryCatalog.entries ++ AnalyticsCatalog.entries).map(_.name)
    assert(names.distinct.length === names.length)
  }
}
