package graft.cypher

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scale-safe batch staging for `CALL { } IN TRANSACTIONS [OF n ROWS]`
  * (VERDICT r9 #1 — /root/reference/src/crwling.py's per-record writes are
  * the degenerate 1-row case; Neo4j ships this statement for
  * multi-million-row CSV imports).
  *
  * Two plan properties make it survive a real bulk import:
  *
  *   1. Batch ids are assigned by per-partition-offset `zipWithIndex`
  *      (one lightweight count job), NOT a no-partition `row_number`
  *      window — nothing ever funnels the full driving set through a
  *      single partition. Input order (partition order, then row order
  *      within a partition) is exactly the order
  *      `row_number().over(orderBy(monotonically_increasing_id()))`
  *      produced, so batch MEMBERSHIP — the only observable — is
  *      unchanged from the r9 implementation (c56's oracle hash pins it).
  *
  *   2. The tagged set is persisted to parquet PARTITIONED BY the batch
  *      id, so each batch's `filter(bid = b)` prunes to its own files:
  *      total scan work across the import is O(N), not O(batches × N).
  *
  * Row order WITHIN a batch is not preserved by the parquet round trip
  * and does not need to be: the mutation machinery is set-oriented and
  * breaks within-batch duplicate keys deterministically by content
  * (canonical props rendering in `PropertyGraph.dedupOne`, all-columns
  * ordering for CREATE row tags), never by physical row order.
  */
object TxBatches {
  val BidCol = "__graft_bid"

  /** The staged import: `batches(b)` is batch b's driving rows (bid column
    * already dropped), backed by a bid-partitioned parquet stage the
    * caller must [[cleanup]] after pinning any graph state derived from
    * it (the per-batch frames are lazy over the staged files). */
  final case class Staged(nBatches: Long, stageDir: java.nio.file.Path,
      private val batched: DataFrame) {
    def batches(b: Long): DataFrame = {
      import org.apache.spark.sql.functions.col
      batched.filter(col(BidCol) === b).drop(BidCol)
    }
    /** The bid-partitioned frame, exposed for plan assertions. */
    def taggedFrame: DataFrame = batched
    def cleanup(): Unit = TxBatches.deleteRecursively(stageDir)
  }

  /** Tag `driving` with input-order batch ids of size `batchRows` and
    * persist it partitioned by batch id. Returns None for an empty
    * driving set (nothing staged, nothing to clean up). */
  def stage(driving: DataFrame, batchRows: Long): Option[Staged] = {
    require(batchRows > 0, s"IN TRANSACTIONS OF n ROWS needs n > 0, got $batchRows")
    val spark = driving.sparkSession
    val total = driving.count()
    if (total == 0L) return None
    val nBatches = (total + batchRows - 1) / batchRows
    val schema = StructType(driving.schema.fields :+
      StructField(BidCol, LongType, nullable = false))
    val tagged = spark.createDataFrame(
      driving.rdd.zipWithIndex().map { case (row, i) =>
        Row.fromSeq(row.toSeq :+ i / batchRows)
      }, schema)
    val dir = java.nio.file.Files.createTempDirectory("graft-txbatch-")
    tagged.write.mode("overwrite").partitionBy(BidCol).parquet(dir.toString)
    // explicit schema on read: the bid stays LongType instead of relying
    // on partition-value type inference
    Some(Staged(nBatches, dir, spark.read.schema(schema).parquet(dir.toString)))
  }

  def deleteRecursively(dir: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    if (Files.exists(dir)) {
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    }
  }
}
