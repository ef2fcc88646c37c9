package graft.streaming.newsfeed

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom streaming source mirroring the reference's paginated crawl (I1,
  * /root/reference/src/crwling.py:89-190): article pages arrive
  * `pagesPerTrigger` at a time (the crawler's `start=(p*10)+1` stride), each
  * page yielding `articlesPerPage` candidate records — including the dirty
  * variants the downstream filters must drop (google.com links, short
  * titles), so `readStream → ArticleIngest → foreachBatch MERGE` exercises
  * the whole reference dataflow.
  *
  * Deterministic generator stands in for the network fetch (zero-egress
  * container); the source machinery — offsets, per-page partitions,
  * admission control via paced latestOffset — is the real thing.
  *
  * Usage:
  * {{{
  * spark.readStream.format("graft.streaming.newsfeed.NewsFeedProvider")
  *   .option("pages", 3).option("articlesPerPage", 10)
  *   .option("pagesPerTrigger", 1).load()
  * }}}
  */
class NewsFeedProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NewsFeed.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // getTable properties are case-PRESERVING; normalize before lookup
    val opts = new CaseInsensitiveStringMap(properties)
    new NewsFeedTable(opts.getOrDefault("pages", "3").toLong,
      opts.getOrDefault("articlesPerPage", "10").toInt,
      opts.getOrDefault("pagesPerTrigger", "1").toLong,
      FetchPolicy(
        opts.getOrDefault("failPages", ""),
        opts.getOrDefault("retries", "2").toInt,
        opts.getOrDefault("backoffMs", "10").toLong))
  }
}

/** Page-level error policy (I10 — /root/reference/src/crwling.py:119-133):
  * HTTP 429 aborts the whole crawl; transient errors (503) retry with
  * exponential backoff up to `retries`, then the page dead-letters; a page
  * missing its results container (parse failure) dead-letters immediately —
  * deterministic, so no retry. `failPages` injects failures for tests:
  * "1:429,2:503,4:parse" (page index : mode); a 503 is transient — it
  * succeeds on the first retry. */
final case class FetchPolicy(failPages: String, retries: Int, backoffMs: Long) {
  private val modes: Map[Long, String] =
    failPages.split(",").filter(_.nonEmpty).map { kv =>
      val Array(p, m) = kv.split(":"); p.trim.toLong -> m.trim
    }.toMap

  /** Simulated HTTP status of `page` at retry attempt `attempt`. */
  def statusFor(page: Long, attempt: Int): String = modes.get(page) match {
    case Some("429") => "429"
    case Some("503") if attempt == 0 => "503"
    case Some("parse") => "parse"
    case _ => "200"
  }
}

/** Thrown on HTTP 429 — fails the streaming query, the set-oriented version
  * of the reference's abort-the-crawl branch (crwling.py:121-123). */
final class NewsFeedRateLimitedException(page: Long)
  extends RuntimeException(
    s"HTTP 429 on page $page: rate limited, aborting crawl")

object NewsFeed {
  val schema: StructType = StructType(Seq(
    StructField("page", IntegerType, nullable = false),
    StructField("title", StringType, nullable = true),
    StructField("link", StringType, nullable = true),
    StructField("publisher", StringType, nullable = true),
    StructField("content", StringType, nullable = true),
    // "ok" on article rows; a failed-but-skipped page emits ONE marker row
    // "dead_letter:<reason>" with null fields — the stream-side analogue of
    // the reference's save_debug_info artifact (crwling.py:23-32,132)
    StructField("page_status", StringType, nullable = false)))

  /** Deterministic page content; every 7th record is a google.com link and
    * every 5th has a too-short title (the reference's filter fodder). */
  def article(page: Long, i: Int): (Int, String, String, String, String) = {
    val id = page * 1000 + i
    val link =
      if (id % 7 == 0) s"http://google.com/rel/$id" else s"http://feed.example/a/$id"
    val title = if (id % 5 == 0) "abc" else s"<b>Article $id</b> headline"
    val publisher = if (id % 3 == 0) null else s"Pub${id % 4}"
    (page.toInt, title, link, publisher, s"<p>Body of article $id</p>")
  }
}

private final class NewsFeedTable(pages: Long, perPage: Int, perTrigger: Long,
    policy: FetchPolicy)
  extends Table with SupportsRead {
  override def name(): String = s"newsfeed($pages pages)"
  override def schema(): StructType = NewsFeed.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = NewsFeed.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new NewsFeedStream(pages, perPage, perTrigger, policy)
      }
    }
}

private final case class PageOffset(page: Long) extends Offset {
  override def json(): String = page.toString
}

private final class NewsFeedStream(pages: Long, perPage: Int, perTrigger: Long,
    policy: FetchPolicy)
  extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  // Rate-limited pagination via ADMISSION CONTROL: each trigger admits at
  // most `perTrigger` new pages past the engine-supplied START offset (the
  // reference fetches pages one by one with backoff on 429,
  // /root/reference/src/crwling.py:109-133). Computing the end offset from
  // the passed start — not from a mutable counter — makes restart
  // correctness structural: the first post-recovery trigger receives the
  // COMMITTED offset as its start, so the stream can never plan an end
  // below it or replay a committed page (a counter-based latestOffset()
  // did exactly that when the engine's recovery called it before the
  // checkpointed offset had been replayed through deserializeOffset).
  override def initialOffset(): Offset = PageOffset(0L)
  override def getDefaultReadLimit:
      org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val s = start.asInstanceOf[PageOffset].page
    PageOffset(math.min(s + perTrigger, pages))
  }
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: the engine calls latestOffset(start, limit)")
  override def deserializeOffset(json: String): Offset = PageOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PageOffset].page
    val e = end.asInstanceOf[PageOffset].page
    (s until e).map(p => NewsFeedPartition(p, perPage, policy): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val part = partition.asInstanceOf[NewsFeedPartition]
        new PartitionReader[InternalRow] {
          // fetch-with-policy happens once, lazily, on first advance — the
          // retry loop and failure branches of crwling.py:119-133
          private lazy val rows: IndexedSeq[InternalRow] = fetchPage()
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow = rows(i)
          override def close(): Unit = ()

          private def fetchPage(): IndexedSeq[InternalRow] = {
            var attempt = 0
            while (true) {
              part.policy.statusFor(part.page, attempt) match {
                case "429" => // the reference aborts the whole crawl
                  throw new NewsFeedRateLimitedException(part.page)
                case "503" if attempt < part.policy.retries =>
                  Thread.sleep(part.policy.backoffMs << attempt) // exp backoff
                  attempt += 1
                case "503" | "parse" => // exhausted retries / deterministic parse failure
                  val reason =
                    if (part.policy.statusFor(part.page, attempt) == "parse") "parse_failure"
                    else "http_503"
                  return IndexedSeq(InternalRow(part.page.toInt, null, null, null,
                    null, utf8(s"dead_letter:$reason")))
                case _ =>
                  return (0 until part.perPage).map { j =>
                    val (page, title, link, publisher, content) = NewsFeed.article(part.page, j)
                    InternalRow(page, utf8(title), utf8(link), utf8(publisher),
                      utf8(content), utf8("ok"))
                  }
              }
            }
            IndexedSeq.empty // unreachable
          }

          private def utf8(s: String): UTF8String =
            if (s == null) null else UTF8String.fromString(s)
        }
      }
    }
}

private final case class NewsFeedPartition(page: Long, perPage: Int,
  policy: FetchPolicy) extends InputPartition
