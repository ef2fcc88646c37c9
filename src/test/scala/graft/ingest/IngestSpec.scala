package graft.ingest

import graft.SparkTestBase
import graft.graph.{GraphStore, PropertyGraph}
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

class IngestSpec extends SparkTestBase {
  import spark.implicits._

  /** Dirty variants from the reference's own failure modes
    * (/root/reference/src/crwling.py:37-43,146-153,165-170). */
  private def raw = Seq(
    ("<b>Real\tTitle</b>", "http://news/1", "Daily", "<p>body\none</p>"),
    ("zero​width title", "http://news/2", null, "content two"),
    ("ok title", "http://google.com/x", "Daily", "filtered by link"),
    ("abc", "http://news/3", "Daily", "filtered by short title"),
    ("연예 기사 제목", "http://news/4", "연합뉴스", "한국어 본문"),   // Korean path
    (null, "http://news/5", "Daily", "null title"),
    ("valid title", null, "Daily", "null link")
  ).toDF("title", "link", "publisher", "content")

  test("pipeline cleans surviving records and defaults the publisher") {
    val out = ArticleIngest.accepted(raw).orderBy("link")
      .as[(String, String, String, String)].collect().toSeq
    assert(out === Seq(
      ("Real Title", "http://news/1", "Daily", "body one"),
      ("zerowidth title", "http://news/2", "Google News", "content two"),
      ("연예 기사 제목", "http://news/4", "연합뉴스", "한국어 본문")))
  }

  test("dead letter captures each rejected row with its reason") {
    val dl = ArticleIngest.deadLetter(raw)
      .select($"link", $"reject_reason").collect()
      .map(r => (Option(r.getString(0)), r.getString(1))).toSet
    assert(dl === Set(
      (Some("http://google.com/x"), "bad_link"),
      (Some("http://news/3"), "short_title"),
      (Some("http://news/5"), "short_title"),
      (None, "bad_link")))
  }

  test("upsert is idempotent and counts are observable") {
    val g1 = ArticleIngest.upsert(PropertyGraph.empty(spark), raw)
    // 3 articles + 3 publishers (Daily, Google News, 연합뉴스)
    assert(g1.matchLabel("Article").count() === 3)
    assert(g1.matchLabel("Publisher").count() === 3)
    assert(g1.edges.count() === 3)
    val g2 = ArticleIngest.upsert(g1, raw)
    assert(g2.nodes.count() === g1.nodes.count())
    assert(g2.edges.count() === 3)

    val obs = Observation("ingest_test")
    ArticleIngest.accepted(raw).observe(obs, count(lit(1)).as("n_saved")).collect()
    assert(obs.get("n_saved") === 3L)
  }

  test("enrichment: per-partition client, selector fallback chain, failure degradation") {
    val inits = spark.sparkContext.longAccumulator("client_inits")
    val reqs = Seq(
      DetailRequest(0, "http://x/0"),   // dic_area
      DetailRequest(1, "http://x/1"),   // articleBodyContents
      DetailRequest(2, "http://x/2"),   // se-main-container
      DetailRequest(7, "http://x/7"),   // articleBody (7 % 4 = 3)
      DetailRequest(3, "http://x/3"),   // 3 % 13 = 3 → timeout
      DetailRequest(22, "http://x/22")  // 22 % 17 = 5 → page without containers
    ).toDS().repartition(3)
    val out = Enrichment.enrichArticles(reqs,
        clientFactory = () => { inits.add(1); new Enrichment.FakeDetailClient })
      .collect().map(r => r.doc_id -> r).toMap
    assert(out(0).content === "Body 0 via dic_area" && out(0).fetch_status === "ok")
    assert(out(1).content === "Body 1 via articleBodyContents")
    assert(out(2).content === "Body 2 via se-main-container")
    assert(out(7).content === "Body 7 via articleBody")
    // the reference degrades EVERY failure to empty content (crwling.py:86-87)
    assert(out(3).content === "" && out(3).fetch_status === "timeout")
    assert(out(22).content === "" && out(22).fetch_status === "no_content")
    assert(inits.value === 3L, "client must be constructed once per partition")
  }

  test("enrichment: a throwing client is isolated per row, task survives") {
    val reqs = Seq(
      DetailRequest(13, "http://x/13"), // FlakyClient throws on this one
      DetailRequest(4, "http://x/4")
    ).toDS().coalesce(1) // same partition: the throw must not kill its neighbor
    val out = Enrichment.enrichArticles(reqs, clientFactory = () => new FlakyClient)
      .collect().map(r => r.doc_id -> r).toMap
    assert(out(13).content === "" && out(13).fetch_status === "error")
    assert(out(4).content === "ok" && out(4).fetch_status === "ok")
  }

  test("enrichment: HttpDetailClient fetches real HTTP over loopback") {
    // The real-network implementation of the DetailClient seam, exercised
    // against a JDK HttpServer on 127.0.0.1 (no egress): 200 + selector →
    // ok, 200 without a known container → no_content, 500 → timeout-class
    // degradation (None from the client), socket read timeout → timeout.
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes); ex.close()
    }
    server.createContext("/article", (ex: com.sun.net.httpserver.HttpExchange) =>
      respond(ex, 200, """<html><div id="dic_area">Loopback body</div></html>"""))
    server.createContext("/bare", (ex: com.sun.net.httpserver.HttpExchange) =>
      respond(ex, 200, """<html><div id="unrelated">no container</div></html>"""))
    server.createContext("/boom", (ex: com.sun.net.httpserver.HttpExchange) =>
      respond(ex, 500, "err"))
    server.createContext("/slow", (ex: com.sun.net.httpserver.HttpExchange) => {
      Thread.sleep(2000); respond(ex, 200, "late")
    })
    // one thread per request: fast endpoints must never queue behind /slow
    // on the single default dispatcher (that queuing time counts against
    // the CLIENT's read timeout and flakes the fast assertions under load)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    val port = server.getAddress.getPort
    try {
      val reqs = Seq(
        DetailRequest(1L, s"http://127.0.0.1:$port/article"),
        DetailRequest(2L, s"http://127.0.0.1:$port/bare"),
        DetailRequest(3L, s"http://127.0.0.1:$port/boom"),
        DetailRequest(4L, s"http://127.0.0.1:$port/slow")).toDS()
      val out = Enrichment.enrichArticles(reqs, timeoutMs = 250L,
          clientFactory = () => new Enrichment.HttpDetailClient())
        .collect().map(r => r.doc_id -> (r.content, r.fetch_status)).toMap
      assert(out(1L) == (("Loopback body", "ok")))
      assert(out(2L) == (("", "no_content")))
      assert(out(3L) == (("", "timeout"))) // non-200 → None, same degradation
      // the slow page must DEGRADE (empty content, partition not hung) —
      // whether the client's read timeout fires ("timeout") or the JDK's
      // idempotent-GET retry lands the late container-free body
      // ("no_content") is scheduler-dependent; both honor the contract
      assert(out(4L)._1 == "" && out(4L)._2 != "ok", out(4L))
    } finally server.stop(0)
  }

  test("GraphStore round-trips and label scans prune partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_store").toString
    val g = ArticleIngest.upsert(PropertyGraph.empty(spark), raw)
    GraphStore.write(g, dir)
    val g2 = GraphStore.read(spark, dir)
    assert(g2.nodes.count() === g.nodes.count())
    assert(g2.edges.count() === g.edges.count())
    val scan = g2.matchLabel("Article")
    assert(scan.count() === 3)
    // partition pruning: label=Article reaches the scan as a partition filter
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("label"), plan)
  }

  test("PERMISSIVE csv keeps corrupted rows with partial fields; DROPMALFORMED loses them") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_i11_spec").toString
    val lines = Seq("1,en,100", "2,de,oops", "3,en,300") // row 2: bad n_chars
    lines.toDF("value").coalesce(1).write.mode("overwrite").text(s"$dir/csv")
    val schema = "doc_id LONG, lang STRING, n_chars LONG, _corrupt STRING"
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(s"$dir/csv")
    val rows = permissive.orderBy("doc_id")
      .select("doc_id", "lang", "n_chars", "_corrupt")
      .collect()
    assert(rows.length === 3) // nothing dropped
    val bad = rows(1)
    assert(bad.getString(1) === "de") // parseable fields survive
    assert(bad.isNullAt(2)) // unparseable field nulled
    assert(bad.getString(3) === "2,de,oops") // raw line captured
    // the silent-data-loss mode this entry exists to warn against. NOTE:
    // counted via collect — a bare count() column-prunes the scan to zero
    // parsed columns, so conversion never fails and NOTHING is dropped
    // (the row count literally depends on which columns downstream reads —
    // one more way DROPMALFORMED loses data unobservably)
    val dropped = spark.read
      .schema("doc_id LONG, lang STRING, n_chars LONG")
      .option("mode", "DROPMALFORMED").csv(s"$dir/csv")
    assert(dropped.collect().length === 2)
    assert(dropped.count() === 3) // the pruned-scan count sees all rows
  }

  test("small-file compaction reduces file count and preserves content") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val rows = (1 to 200).map(i => (i.toLong, s"doc $i")).toDF("id", "body")
    rows.repartition(32).write.mode("overwrite").parquet(s"$dir/landing")
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$dir/landing") === 32)
    spark.read.parquet(s"$dir/landing").coalesce(2)
      .write.mode("overwrite").parquet(s"$dir/compacted")
    assert(parquetFiles(s"$dir/compacted") === 2)
    val back = spark.read.parquet(s"$dir/compacted")
    assert(back.count() === 200)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).as[Long].head()
      === (1 to 200).map(_.toLong).sum)
  }
}

/** Client whose fetch throws on one URL — the row-isolation fixture. */
private class FlakyClient extends Enrichment.DetailClient {
  override def fetchHtml(url: String, timeoutMs: Long): Option[String] =
    if (url.endsWith("/13")) throw new RuntimeException("connection reset")
    else Some("""<div id="dic_area">ok</div>""")
}
