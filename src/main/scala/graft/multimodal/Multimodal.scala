package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video carried as opaque `binary` columns
  * with typed metadata, processed by per-partition batch functions.
  *
  * The decode step is STUBBED — this container has no image/audio codecs —
  * with a deterministic fake (bytes → derived features). Everything around
  * it is real and load-bearing: the binary schema, the partition-parallel
  * execution shape (`mapPartitions`, one codec init per partition, batched
  * rows), and the feature-column contract a real decoder would fill.
  */
final case class MediaRecord(id: Long, kind: String, payload: Array[Byte],
  meta: Map[String, String])

final case class MediaFeatures(id: Long, kind: String, n_bytes: Int,
  features: Array[Float])

object Multimodal {

  /** Wrap a text column as a binary media payload (fixture adapter: real
    * pipelines read image/audio bytes from object storage the same way). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      lit(kind).as("kind"),
      col(payloadCol).cast("binary").as("payload"),
      map(lit("codec"), lit("raw"),
        lit("n_bytes"), length(col(payloadCol).cast("binary")).cast("string")).as("meta"))

  /** STUB decoder: a real implementation opens a codec per partition and
    * decodes each payload; this fake derives `dim` deterministic features
    * from payload bytes so the plumbing (partitioning, batching, schema) is
    * exercised end-to-end without the codec library. */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init happens here (codec handle, model session, ...)
      it.map { m =>
        val feats = Array.tabulate(dim) { i =>
          if (m.payload.isEmpty) 0f
          else {
            var acc = i + 1
            var j = i
            while (j < m.payload.length) { acc = acc * 31 + m.payload(j); j += dim }
            (acc % 1000) / 1000.0f
          }
        }
        MediaFeatures(m.id, m.kind, m.payload.length, feats)
      }
    }
  }

  /** Frame sampling: split the payload into `n` evenly-spaced binary chunks
    * (for video this is keyframe sampling; here pure byte slicing). */
  def sampleFrames(df: DataFrame, n: Int): DataFrame = {
    val chunkLen = floor((length(col("payload")) + (n - 1)) / n).cast("int")
    df.withColumn("__chunk", chunkLen)
      .withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame",
        col("payload").substr(col("frame_idx") * col("__chunk") + 1, col("__chunk")))
      .filter(length(col("frame")) > 0)
      .select(col("id"), col("frame_idx"), col("frame"))
  }
}
