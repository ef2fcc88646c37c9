package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bulk-import rehearsal for `CALL { } IN TRANSACTIONS` (VERDICT r9 #1's
  * "done" bar): drive ≥500k rows — the sf10 rehearsal documents table —
  * through the batched import path end to end, the workload the statement
  * exists for (Neo4j's huge-CSV imports).
  *
  * The shape mirrors the Neo4j docs' canonical import loop:
  *
  * {{{
  *   LOAD CSV WITH HEADERS FROM 'file://…' AS row
  *   CALL { WITH row MERGE (a:Article {doc_id: row.doc_id})
  *          SET a.source = row.source }
  *   IN TRANSACTIONS OF n ROWS
  * }}}
  *
  * What this measures: (1) the TxBatches staging — batch-id assignment
  * with no single-partition exchange plus the bid-partitioned stage whose
  * per-batch filters prune to their own files (O(N) total staging scan,
  * not O(batches × N)); (2) the per-batch set-oriented MERGE commits,
  * which are inherently sequential (each batch observes the previous
  * batches' writes, as Neo4j transactions do) — so total MERGE work grows
  * with batches × store size; batch size is the user's knob for that
  * trade, exactly as it is in Neo4j.
  *
  * Usage: `runMain graft.ImportRehearsal [sfDir] [batchRows]`
  * (defaults: target/sf10_rehearsal, 25000 → 20 batches over 500k rows).
  * If the rehearsal fixture is missing, derive it first with a cheap
  * query arg: `SPARK_GRAFT_REPLICAS=100 runMain graft.ScaleRehearsal
  * /root/testdata/sf0.1 target/sf10_rehearsal q01_scan_filter_project`.
  */
object ImportRehearsal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf10_rehearsal")
    val batchRows = if (args.length > 1) args(1).toLong else 25000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    require(new java.io.File(s"$dir/documents.parquet").exists(),
      s"$dir/documents.parquet missing — derive it with ScaleRehearsal " +
        "(see the scaladoc)")
    // the import's CSV: (doc_id, source) per document, as a crawl-export
    // CSV would arrive
    val docs = ops.Tables(spark, dir, "documents")
      .select(col("doc_id").cast("string").as("doc_id"), col("source"))
    val csvDir = java.nio.file.Files
      .createTempDirectory("graft_import_csv").toString
    docs.coalesce(8).write.mode("overwrite")
      .option("header", "true").csv(csvDir)
    val total = spark.read.option("header", "true").csv(csvDir).count()

    val sess = new cypher.CypherSession(
      graph.PropertyGraph.empty(spark),
      keyProps = Map("Article" -> "doc_id"))
    val t0 = System.nanoTime()
    val mut = sess.run(
      s"""LOAD CSV WITH HEADERS FROM 'file://$csvDir' AS row
         |CALL { WITH row MERGE (a:Article {doc_id: row.doc_id})
         |       SET a.source = row.source }
         |IN TRANSACTIONS OF $batchRows ROWS""".stripMargin)
      .asInstanceOf[cypher.CypherMutation]
    val importSecs = (System.nanoTime() - t0) / 1e9

    // read-back verification: every distinct doc_id is a node
    val nodes = sess.graph.nodes.filter(col("label") === "Article").count()
    val distinctIds = docs.select("doc_id").distinct().count()
    require(nodes == distinctIds,
      s"import read-back mismatch: $nodes nodes vs $distinctIds distinct ids")
    val nBatches = (total + batchRows - 1) / batchRows
    println(s"""{"metric":"import_rehearsal","rows":$total,""" +
      s""""batchRows":$batchRows,"batches":$nBatches,""" +
      s""""created":${mut.nodesCreated},"matched":${mut.nodesMatched},""" +
      s""""nodes":$nodes,"sec":${f"$importSecs%.2f"}}""")
    cypher.TxBatches.deleteRecursively(java.nio.file.Paths.get(csvDir))
    spark.stop()
  }
}
