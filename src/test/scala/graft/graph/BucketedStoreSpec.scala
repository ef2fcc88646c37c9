package graft.graph

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The 100 TB MERGE story: against a bucketed catalog table, the stored
  * graph side of the anti-join is read pre-partitioned — only the incoming
  * batch shuffles. Verified by counting exchanges against the same join on
  * a plain (unbucketed) store.
  */
class BucketedStoreSpec extends SparkTestBase {
  import spark.implicits._

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).size

  test("bucketed store joins without shuffling the stored side") {
    val nodes = (1L to 500L).map(i => ("Article", s"k$i", Map("t" -> s"v$i")))
      .toDF("label", "key", "props")
    val g = PropertyGraph.empty(spark).mergeNodes(nodes)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      GraphStore.writeBucketed(g, "bspec", buckets = 4)
      val stored = GraphStore.readBucketed(spark, "bspec")
      val batch = (400L to 600L).toDF("id")

      val bucketed = stored.nodes.join(batch, Seq("id"), "left_anti")

      assert(bucketed.count() === 500 - g.nodes.join(batch, Seq("id"), "left_semi").count())
      val plan = bucketed.queryExecution.executedPlan.toString
      // stored side read pre-partitioned from bucket metadata...
      assert(plan.contains("Bucketed: true"), plan)
      // ...so the ONLY exchange in the join is the incoming batch side
      assert(exchanges(bucketed) === 1, plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bspec_nodes")
      spark.sql("DROP TABLE IF EXISTS bspec_edges")
    }
  }

  test("bucketed store round-trips relationship properties bit-for-bit") {
    // The c11 surface: edges carrying property bags. A store layout that
    // drops them silently corrupts any graph that round-trips through it.
    val nodes = Seq(
      ("Article", "a1", Map("t" -> "x")),
      ("Article", "a2", Map("t" -> "y")),
      ("Publisher", "p1", Map.empty[String, String]))
      .toDF("label", "key", "props")
    val edges = Seq(
      ("Article", "a1", "Publisher", "p1", "WRITTEN_BY", Map("since" -> "2020", "w" -> "0.5")),
      ("Article", "a2", "Publisher", "p1", "WRITTEN_BY", Map("since" -> "2021")))
      .toDF("srcLabel", "srcKey", "dstLabel", "dstKey", "relType", "props")
    val g = PropertyGraph.empty(spark).mergeNodes(nodes).mergeEdgesByKey(edges)
    try {
      GraphStore.writeBucketed(g, "bspec_rt", buckets = 2)
      val stored = GraphStore.readBucketed(spark, "bspec_rt")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select(col("srcId"), col("dstId"), col("relType"),
            map_entries(col("props")).cast("array<struct<key:string,value:string>>").as("pe"))
          .withColumn("pe", array_sort(col("pe")))
          .collect().toSet
      assert(canon(stored.edges) === canon(g.edges))
      assert(stored.nodes.count() === 3)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bspec_rt_nodes")
      spark.sql("DROP TABLE IF EXISTS bspec_rt_edges")
    }
  }
}
