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

  test("frame sampling slices payload into n chunks covering all bytes") {
    val frames = Multimodal.sampleFrames(mediaDf.filter($"id" === 3L), 4)
      .select($"frame_idx", length($"frame").as("len"))
      .as[(Int, Int)].collect().sortBy(_._1)
    assert(frames.map(_._2).sum === 27) // "binary payload content here".length
  }
}
