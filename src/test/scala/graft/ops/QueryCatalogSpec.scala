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

  test("round-10: doc_id graph fixtures survive the rehearsal's STRIPED id space") {
    // Regression pin for the round-10 striping pitfall: ScaleRehearsal
    // shifts each documents replica by k·1e6, so naive `% n` / `< n`
    // neighbor arithmetic left every non-base replica edge-free and the
    // sf10 timings measured mostly-edgeless graphs (caught by gds.kcore's
    // loud non-convergence cap). This drives the REAL entries against a
    // synthetic two-stripe fixture and asserts the per-stripe closed
    // forms — on contiguous ids the same arithmetic is oracle-verified,
    // so this pins exactly the striped branch.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("striped_docs").toString
    val ids = (0L until 16L) ++ (1000000L until 1000016L)
    ids.map(i => (i, s"w$i x y", "en", s"src${i % 3}", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // c66: per stripe, ids 0..15 = two blocks of 8 (5-clique core 4 +
    // 3-chain core 1) → across both stripes: 20 nodes at core 4, 12 at 1
    val core = AnalyticsCatalog.entries
      .find(_.name == "c66_cypher_gds_kcore").get.fn(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(core === Map(4L -> 20L, 1L -> 12L), core)
    // c67: per stripe, blocks of 5 → community = stripeBase + (pos/5)*5;
    // the pos-15 straggler is a singleton (its block is incomplete, so no
    // bridge reaches it)
    val lv = AnalyticsCatalog.entries
      .find(_.name == "c67_cypher_gds_louvain").get.fn(spark, dir)
      .as[(String, String)].collect().toMap
    val want = ids.map(i =>
      i.toString -> ((i - i % 1000000L) + (i % 1000000L) / 5 * 5).toString).toMap
    assert(lv === want)
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
