package graft.ingest

import org.apache.spark.sql.Dataset
import scala.util.matching.Regex

/** Request/result rows for detail-page enrichment (I5). */
final case class DetailRequest(doc_id: Long, link: String)
final case class DetailResult(doc_id: Long, link: String, content: String,
  fetch_status: String)

/** Per-row detail-page enrichment (I5) — the reference fetches each article
  * body in a fresh tab with a 4-selector fallback chain and returns an empty
  * string on ANY failure (/root/reference/src/crwling.py:71-87; selectors
  * :77-79; empty-on-failure :86-87).
  *
  * Spark shape: `mapPartitions` with ONE client initialized per partition
  * (the reference reuses one Playwright page across its loop — connection
  * reuse is the point of partition-level init), a per-fetch timeout, and
  * row-level fault isolation: a failed fetch yields `content = ""` plus a
  * `fetch_status` column, and the partition keeps going — one bad article
  * never fails the task (crwling.py:177-179).
  *
  * The network is stubbed with a deterministic local "server" (zero-egress
  * container, same stand-in discipline as the NewsFeed source): page HTML is
  * a pure function of the URL, and the selector-extraction walk over that
  * HTML is real string parsing, exercised end to end.
  */
object Enrichment {

  /** One client per partition; `close()` runs when the partition ends. */
  trait DetailClient extends AutoCloseable {
    /** Raw page HTML, or None on timeout / HTTP failure. */
    def fetchHtml(url: String, timeoutMs: Long): Option[String]
    override def close(): Unit = ()
  }

  /** The reference's fallback chain, in priority order
    * (/root/reference/src/crwling.py:77-79). */
  val selectorChain: Seq[String] =
    Seq("dic_area", "articleBodyContents", "se-main-container", "articleBody")

  private val selectorPatterns: Seq[Regex] =
    selectorChain.map(sel => ("(?s)<div id=\"" + Regex.quote(sel) + "\">(.*?)</div>").r)

  /** First selector in the chain that matches the page, like the
    * reference's `for selector in selectors: try page.locator(...)`. */
  def extractBody(html: String): Option[String] =
    selectorPatterns.view.flatMap(_.findFirstMatchIn(html).map(_.group(1).trim))
      .headOption

  /** Deterministic stand-in for the article site: body container rotates
    * through the selector chain by id, some ids time out, some pages carry
    * none of the known containers — the failure modes of crwling.py:73-87. */
  final class FakeDetailClient extends DetailClient {
    override def fetchHtml(url: String, timeoutMs: Long): Option[String] = {
      val id = url.reverse.takeWhile(_.isDigit).reverse match {
        case "" => 0L
        case ds => ds.toLong
      }
      if (id % 13 == 3) None // page never loads within the timeout
      else if (id % 17 == 5)
        Some(s"""<html><body><div id="unrelated">ad $id</div></body></html>""")
      else {
        val sel = selectorChain((id % 4).toInt)
        Some(s"""<html><body><div id="$sel">Body $id via $sel</div></body></html>""")
      }
    }
  }

  /** REAL network client for the seam — plain JDK HttpURLConnection, no
    * extra dependency. NOT the default: the sandbox is zero-egress, so every
    * shipped entry keeps the deterministic [[FakeDetailClient]]; deployments
    * opt in with `enrichArticles(reqs, clientFactory = () => new
    * HttpDetailClient)`. Contract matches the reference's fetch loop
    * (crwling.py:71-87): timeout → None, any non-200 / connect failure →
    * None, the caller's selector walk decides ok vs no_content. One instance
    * per partition (the mapPartitions factory) so connection keep-alive
    * pools per task, like the reference's reused page. Loopback-tested in
    * IngestSpec — no external egress in CI either. */
  final class HttpDetailClient(connectTimeoutMs: Int = 5000,
      userAgent: String = "graft-enrichment/1.0") extends DetailClient {
    override def fetchHtml(url: String, timeoutMs: Long): Option[String] = {
      var conn: java.net.HttpURLConnection = null
      try {
        conn = new java.net.URL(url).openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setConnectTimeout(connectTimeoutMs)
        // clamp BEFORE .toInt: a timeout past Int.MaxValue would overflow
        // negative and make setReadTimeout throw — silently turning every
        // fetch into None via the NonFatal catch below
        conn.setReadTimeout(math.min(math.max(1L, timeoutMs), Int.MaxValue.toLong).toInt)
        conn.setRequestProperty("User-Agent", userAgent)
        if (conn.getResponseCode == 200) {
          val in = conn.getInputStream
          try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
        } else None
      } catch {
        case scala.util.control.NonFatal(_) => None // timeout/refused/dns → degrade
      } finally if (conn != null) conn.disconnect()
    }
  }

  /** Enrich each request with its fetched article body. `clientFactory`
    * runs once per partition (real deployments build the HTTP session /
    * browser page there); per the reference, every failure mode degrades to
    * an empty `content`, tagged by `fetch_status` ∈ ok | timeout |
    * no_content | error. */
  def enrichArticles(requests: Dataset[DetailRequest],
      timeoutMs: Long = 10000L,
      clientFactory: () => DetailClient = () => new FakeDetailClient)
      : Dataset[DetailResult] = {
    import requests.sparkSession.implicits._
    requests.mapPartitions { it =>
      val client = clientFactory()
      // close when the task ends, drained or not (limits, failures)
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => client.close()))
      it.map { req =>
        val (content, status) =
          try {
            client.fetchHtml(req.link, timeoutMs) match {
              case None => ("", "timeout")
              case Some(html) => extractBody(html) match {
                case Some(body) => (body, "ok")
                case None => ("", "no_content")
              }
            }
          } catch { // row-level isolation: a throwing fetch never fails the task
            case scala.util.control.NonFatal(_) => ("", "error")
          }
        DetailResult(req.doc_id, req.link, content, status)
      }
    }
  }
}
