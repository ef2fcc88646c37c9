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

  test("t15 mixture sampler: every stratum covers its budget slice or exhausts its language") {
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, sfDir, "documents")
    val budget = docs.agg(sum("n_chars")).head.getLong(0) * 0.25
    val avail = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val weights = Map("en" -> 0.5, "de" -> 0.125, "es" -> 0.125,
      "fr" -> 0.125, "zh" -> 0.125)
    AnalyticsCatalog.entries.find(_.name == "t15_domain_mixture_sampler").get
      .fn(spark, sfDir).collect().foreach { r =>
        val (lang, n, kept) = (r.getString(0), r.getLong(1), r.getLong(2))
        val slice = weights(lang) * budget
        assert(kept >= slice || n == avail(lang),
          s"$lang kept $kept chars < slice $slice without exhausting its ${avail(lang)} docs")
      }
  }

  test("catalog names are unique and oracle keys match query keys") {
    val names = (QueryCatalog.entries ++ AnalyticsCatalog.entries).map(_.name)
    assert(names.distinct.length === names.length)
  }
}
