package graft.model

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Labeled-property-graph data model.
  *
  * Mirrors the reference's Neo4j model (nodes with one label + flat property
  * map, directed typed relationships; /root/reference/src/crwling.py:48-54,
  * /root/reference/src/ingest.py:5-7) as two columnar Datasets.
  *
  * Identity: the reference relies on MERGE-by-key (`MERGE (a:Article {link:
  * $link})`, /root/reference/src/crwling.py:48). We derive a stable 64-bit id
  * as xxhash64(label, key) so upsert becomes a deterministic set operation —
  * no `monotonically_increasing_id` nondeterminism, and the same logical node
  * hashes to the same id on every executor of a 1000-node cluster without
  * coordination.
  */
final case class Node(id: Long, label: String, key: String, props: Map[String, String])

/** Directed typed relationship with a flat property map (Neo4j
  * relationships carry properties; the reference's own edges happen to use
  * none — /root/reference/src/crwling.py:54, /root/reference/src/ingest.py:7
  * — so `props` defaults to empty).
  */
final case class Edge(srcId: Long, dstId: Long, relType: String,
  props: Map[String, String] = Map.empty)

object GraphSchema {
  val nodeSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("label", StringType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("props", MapType(StringType, StringType), nullable = true)))

  val edgeSchema: StructType = StructType(Seq(
    StructField("srcId", LongType, nullable = false),
    StructField("dstId", LongType, nullable = false),
    StructField("relType", StringType, nullable = false),
    StructField("props", MapType(StringType, StringType), nullable = true)))

  /** Deterministic node identity: same (label, key) → same id everywhere. */
  def stableId(label: Column, key: Column): Column = xxhash64(label, key)

  def emptyNodes(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], nodeSchema)

  def emptyEdges(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], edgeSchema)
}
