package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CentroidAggSpec extends SparkTestBase {
  import spark.implicits._

  test("typed Aggregator centroid matches the decimal-routed SQL centroid") {
    val emb = graft.ops.Tables(spark, sfDir, "embeddings")
    val agg = emb.select(col("label"), col("embedding").as("vec"))
      .as[(Int, Seq[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(CentroidAgg.toColumn.name("centroid"))
      .toDF("label", "centroid")
    val fromAgg = agg.select(col("label"), posexplode(col("centroid")).as(Seq("dim", "v")))
      .as[(Int, Int, Double)].collect()
      .map { case (l, d, v) => (l, d) -> v }.toMap
    val reference = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg((sum(col("v").cast("decimal(20,10)")).cast("double") / count(lit(1))).as("cv"))
      .as[(Int, Int, Double)].collect()
      .map { case (l, d, v) => (l, d) -> v }.toMap
    assert(fromAgg.keySet === reference.keySet)
    reference.foreach { case (k, v) =>
      assert(math.abs(fromAgg(k) - v) < 1e-9, s"key=$k agg=${fromAgg(k)} ref=$v")
    }
  }
}
