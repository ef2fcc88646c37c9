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

  /** WebDataset-style shard PACK: rows (modality, shard, id, payload,
    * n_bytes) → one physical blob per (modality, shard) with payloads
    * concatenated in id order, plus the (id, n_bytes) index that makes the
    * blob random-accessible — the tar + .idx pair. Per-shard state is
    * bounded by the caller's shard-size constant (the `shard` column comes
    * from a running byte sum), never by corpus size, so the collect_list
    * is safe at any scale. */
  def packShards(sharded: DataFrame): DataFrame =
    sharded.groupBy("modality", "shard").agg(
      expr("""aggregate(
             |  transform(array_sort(collect_list(struct(id, payload))),
             |            s -> s.payload),
             |  CAST('' AS BINARY), (acc, p) -> concat(acc, p))""".stripMargin)
        .as("blob"),
      sort_array(collect_list(struct(col("id"), col("n_bytes")))).as("idx"))

  /** Shard UNPACK: slice each record back out of the blob at its index
    * offset — one row per record, byte-exact (MultimodalSpec asserts
    * unpack(pack(x)) == x including boundary-crossing records). */
  def unpackShards(packed: DataFrame): DataFrame =
    packed
      .withColumn("__offs", expr(
        """aggregate(idx, array(CAST(0 AS BIGINT)),
          |  (acc, s) -> array_append(acc, element_at(acc, -1) + s.n_bytes))""".stripMargin))
      .select(col("modality"), col("shard"),
        expr("""inline(transform(sequence(0, size(idx) - 1), i ->
               |  struct(idx[i].id AS id,
               |    substr(blob, CAST(element_at(__offs, i + 1) + 1 AS INT),
               |           CAST(idx[i].n_bytes AS INT)) AS payload)))""".stripMargin))

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
