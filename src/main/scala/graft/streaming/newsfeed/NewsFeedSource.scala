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
      properties: util.Map[String, String]): Table =
    new NewsFeedTable(properties.getOrDefault("pages", "3").toLong,
      properties.getOrDefault("articlesperpage", "10").toInt,
      properties.getOrDefault("pagespertrigger", "1").toLong)
}

object NewsFeed {
  val schema: StructType = StructType(Seq(
    StructField("page", IntegerType, nullable = false),
    StructField("title", StringType, nullable = true),
    StructField("link", StringType, nullable = true),
    StructField("publisher", StringType, nullable = true),
    StructField("content", StringType, nullable = true)))

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

private final class NewsFeedTable(pages: Long, perPage: Int, perTrigger: Long)
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
          new NewsFeedStream(pages, perPage, perTrigger)
      }
    }
}

private final case class PageOffset(page: Long) extends Offset {
  override def json(): String = page.toString
}

private final class NewsFeedStream(pages: Long, perPage: Int, perTrigger: Long)
  extends MicroBatchStream {
  // rate-limited pagination: each trigger admits at most `perTrigger` new
  // pages (the reference fetches pages one by one with backoff on 429,
  // /root/reference/src/crwling.py:109-133)
  @volatile private var planned = 0L

  override def initialOffset(): Offset = PageOffset(0L)
  override def latestOffset(): Offset = {
    planned = math.min(planned + perTrigger, pages)
    PageOffset(planned)
  }
  // On restart the engine replays the checkpointed offset through
  // deserializeOffset before asking for latestOffset; fast-forward the
  // admission counter so we never plan an end offset below the committed
  // start (which would stall the stream until the counter caught up).
  override def deserializeOffset(json: String): Offset = {
    val p = json.toLong
    if (p > planned) planned = p
    PageOffset(p)
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PageOffset].page
    val e = end.asInstanceOf[PageOffset].page
    (s until e).map(p => NewsFeedPartition(p, perPage): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val part = partition.asInstanceOf[NewsFeedPartition]
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < part.perPage }
          override def get(): InternalRow = {
            val (page, title, link, publisher, content) = NewsFeed.article(part.page, i)
            InternalRow(page, utf8(title), utf8(link), utf8(publisher), utf8(content))
          }
          override def close(): Unit = ()
          private def utf8(s: String): UTF8String =
            if (s == null) null else UTF8String.fromString(s)
        }
      }
    }
}

private final case class NewsFeedPartition(page: Long, perPage: Int) extends InputPartition
