package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Builds the reference's Article/Publisher graph from the `documents`
  * fixture — the Spark equivalent of the crawler's upsert dataflow
  * (/root/reference/src/crwling.py:45-69): each document becomes an
  * `Article` node, each source a `Publisher` node, linked by `WRITTEN_BY`
  * (/root/reference/src/crwling.py:54).
  */
object GraphIngest {

  def articleNodes(docs: DataFrame): DataFrame =
    docs.select(
      lit("Article").as("label"),
      col("doc_id").cast("string").as("key"),
      map(
        lit("title"), substring(col("text"), 1, 30),
        lit("lang"), col("lang")).as("props"))

  def publisherNodes(docs: DataFrame): DataFrame =
    docs.select(
      lit("Publisher").as("label"),
      col("source").as("key"),
      typedlit(Map.empty[String, String]).as("props"))

  def writtenByEdges(docs: DataFrame): DataFrame =
    docs.select(
      lit("Article").as("srcLabel"),
      col("doc_id").cast("string").as("srcKey"),
      lit("WRITTEN_BY").as("relType"),
      lit("Publisher").as("dstLabel"),
      col("source").as("dstKey"),
      // relationship property: the language the article was written in
      map(lit("lang"), col("lang")).as("props"))

  /** Full ingest: one node MERGE batch + one edge MERGE batch. */
  def fromDocuments(docs: DataFrame): PropertyGraph =
    PropertyGraph.empty(docs.sparkSession)
      .mergeNodes(articleNodes(docs).unionByName(publisherNodes(docs)))
      .mergeEdgesByKey(writtenByEdges(docs))
}
