package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def mediaDf = Multimodal.asMedia(
    Seq((1L, "hello world"), (2L, ""), (3L, "binary payload content here"))
      .toDF("doc_id", "text"),
    "doc_id", "text", "image")

  test("asMedia produces binary payload with typed metadata") {
    val rows = mediaDf.select($"id", $"kind", length($"payload"), $"meta")
      .as[(Long, String, Int, Map[String, String])].collect().sortBy(_._1)
    assert(rows.map(_._2).forall(_ == "image"))
    assert(rows(0)._3 === 11)
    assert(rows(0)._4("n_bytes") === "11")
  }

  test("feature extraction is deterministic, partition-parallel, right shape") {
    val media = mediaDf.as[MediaRecord]
    val a = Multimodal.extractFeatures(media.repartition(4), dim = 8).collect().sortBy(_.id)
    val b = Multimodal.extractFeatures(media.repartition(1), dim = 8).collect().sortBy(_.id)
    assert(a.length === 3)
    assert(a.forall(_.features.length === 8))
    // partitioning must not change results
    assert(a.map(_.features.toSeq).toSeq === b.map(_.features.toSeq).toSeq)
    // empty payload → zero features, not a crash
    assert(a.find(_.id == 2L).get.features.forall(_ == 0f))
  }

  test("shard pack/unpack round trip is byte-exact, including boundary-crossing records") {
    import org.apache.spark.sql.expressions.Window
    // tiny shard budget (12 bytes) so records CROSS shard boundaries:
    // modality b (odd ids 1,3,5; sizes 11,9,1) cums 0/11/20 → shards 0,0,1;
    // modality a (even ids 2,4; sizes 20,30) cums 0/20 → shards 0,1 —
    // id 3 straddles the 12-byte mark inside shard 0, id 2 exceeds the
    // budget alone (the packing law: the CROSSING record starts the next)
    val src = Seq(
      (1L, "hello world"), (2L, "twenty bytes exactly"), (3L, "nine byte"),
      (4L, "thirty bytes of payload please"), (5L, "x"))
      .toDF("doc_id", "text")
      .select(col("doc_id").as("id"), encode(col("text"), "UTF-8").as("payload"))
      .withColumn("modality", when(col("id") % 2 === 0, "a").otherwise("b"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
    val w = Window.partitionBy("modality").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val sharded = src
      .withColumn("__cum", coalesce(sum(col("n_bytes")).over(w), lit(0L)))
      .withColumn("shard", floor(col("__cum") / 12L).cast("long"))
    val packed = Multimodal.packShards(sharded)
    // a blob physically concatenates its records' bytes
    val blobBytes = packed.agg(sum(length(col("blob")))).head().getLong(0)
    assert(blobBytes === 11 + 20 + 9 + 30 + 1)
    val back = Multimodal.unpackShards(packed)
      .select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .collect().map { case (i, p) => i -> new String(p, "UTF-8") }.toMap
    val want = src.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .collect().map { case (i, p) => i -> new String(p, "UTF-8") }.toMap
    assert(back === want)
    // every (modality, shard) holds the ids its running byte sum assigned
    val byShard = Multimodal.unpackShards(packed)
      .groupBy("modality", "shard").agg(sort_array(collect_list("id")).as("ids"))
      .as[(String, Long, Seq[Long])].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(byShard(("b", 0L)) === Seq(1L, 3L))
    assert(byShard(("b", 1L)) === Seq(5L))
    assert(byShard(("a", 0L)) === Seq(2L))
    assert(byShard(("a", 1L)) === Seq(4L))
  }

  test("frame sampling slices payload into n chunks covering all bytes") {
    val frames = Multimodal.sampleFrames(mediaDf.filter($"id" === 3L), 4)
      .select($"frame_idx", length($"frame").as("len"))
      .as[(Int, Int)].collect().sortBy(_._1)
    assert(frames.map(_._2).sum === 27) // "binary payload content here".length
  }
}
