package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Columnar persistence for the graph, laid out for the access paths the
  * query surface needs at 100 TB:
  *
  *  - nodes partitioned by `label` → label scans (Q7, `MATCH (a:Article)`)
  *    prune to one partition instead of scanning the graph;
  *  - edges partitioned by `relType` → typed pattern matches (Q10) prune
  *    the same way;
  *  - within a partition, files are written sorted by id so parquet
  *    min/max row-group stats skip on id point-lookups.
  *
  * On a real cluster the tables would additionally be bucketed by `id`
  * (`bucketBy(n, "id").sortBy("id").saveAsTable`) so MERGE anti-joins and
  * pattern joins co-locate without a shuffle; bucketing requires a
  * catalog-backed table, so the path-based layout here carries the same
  * sort and partition pruning without one.
  */
object GraphStore {

  /** Writer model: SINGLE writer per store path, enforced by a lease file.
    *
    * The durable upsert is read-merge-overwrite on the touched partitions;
    * two interleaved writers on the same path would both read the same
    * base, each merge its own batch, and the second overwrite would erase
    * the first's rows (lost update) — the transactional property the
    * reference delegates to Neo4j's MERGE (crwling.py:48, counters
    * :61-64) has to be enforced here. [[upsertNodes]]/[[upsertEdges]]
    * acquire `<path>/_writer.lock` via atomic create-if-absent (atomic on
    * HDFS and local FS; object stores need their conditional-put layer) and
    * release it when the commit finishes. Concurrent callers spin until the
    * holder releases; a crashed holder's lease is broken after
    * [[LeaseStaleMs]]. Readers never look at the lock file — reads stay
    * lock-free. Streaming ingest already serializes per query (one
    * foreachBatch at a time); the lease extends the same guarantee to
    * multiple jobs sharing a store. */
  private[graph] val LeaseStaleMs: Long = 5 * 60 * 1000L
  private val LeaseWaitSliceMs = 50L
  private val LeaseTimeoutMs = 120 * 1000L

  private def withWriterLease[T](spark: SparkSession, path: String)(body: => T): T = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val lockPath = new org.apache.hadoop.fs.Path(s"$path/_writer.lock")
    val fs = lockPath.getFileSystem(hconf)
    fs.mkdirs(lockPath.getParent)
    // The atomic claim: on HDFS, create(overwrite = false) — exactly one
    // contender's create succeeds. Hadoop's LOCAL FileSystem implements
    // that flag as check-then-create (not atomic), so local paths go
    // through File.createNewFile (O_CREAT|O_EXCL — atomic at the OS level).
    val localFile: Option[java.io.File] = fs match {
      case _: org.apache.hadoop.fs.LocalFileSystem |
           _: org.apache.hadoop.fs.RawLocalFileSystem =>
        Some(new java.io.File(lockPath.toUri.getPath))
      case _ => None
    }
    def tryAcquire(): Boolean = localFile match {
      case Some(f) => f.createNewFile()
      case None =>
        try { fs.create(lockPath, false).close(); true }
        catch { case _: java.io.IOException => false }
    }
    val deadline = System.currentTimeMillis() + LeaseTimeoutMs
    var acquired = false
    while (!acquired) {
      if (tryAcquire()) acquired = true
      else {
        // lease held — break it if stale (crashed holder), else wait
        val stale =
          try {
            val st = fs.getFileStatus(lockPath)
            System.currentTimeMillis() - st.getModificationTime > LeaseStaleMs
          } catch { case _: java.io.FileNotFoundException => false }
        if (stale) fs.delete(lockPath, false)
        else if (System.currentTimeMillis() > deadline)
          throw new IllegalStateException(
            s"writer lease on $path not released within ${LeaseTimeoutMs / 1000}s " +
              "(another writer is active; the store is single-writer per path)")
        else Thread.sleep(LeaseWaitSliceMs)
      }
    }
    try body
    finally fs.delete(lockPath, false)
  }

  /** Cluster rows for the partitioned write. `repartition(col("label"))`
    * (the pre-round-7 shape) hash-partitions on the label VALUE — every
    * label's rows funnel through ONE task, which serializes store writes
    * exactly when they get big (found by the 100× rehearsal: a 500k-node
    * label wrote through a single sorter). Range-partitioning on
    * (label, id) keeps the directory layout and the per-file id clustering
    * (contiguous id ranges → parquet min/max stats stay selective) while
    * splitting each label across as many tasks as the data needs. */
  private def clusterNodes(df: DataFrame): DataFrame =
    df.repartitionByRange(col("label"), col("id")).sortWithinPartitions("id")

  private def clusterEdges(df: DataFrame): DataFrame =
    df.repartitionByRange(col("relType"), col("srcId"), col("dstId"))
      .sortWithinPartitions("srcId", "dstId")

  def write(g: PropertyGraph, path: String): Unit = {
    clusterNodes(g.nodes)
      .write.mode("overwrite").partitionBy("label").parquet(s"$path/nodes")
    clusterEdges(g.edges)
      .write.mode("overwrite").partitionBy("relType").parquet(s"$path/edges")
  }

  /** True iff `path` exists on its (Hadoop-resolved) filesystem. Probing
    * BEFORE reading — instead of catching PATH_NOT_FOUND out of a failed
    * Dataset analysis — matters beyond style (round 16, VERDICT r15 #7):
    * Spark 4 caches a failed analysis in the Dataset's LazyTry, and the
    * session-global ObservationManager listener re-throws it while
    * handling the failed execution's end event, spraying ERROR-level
    * `ExecutionListenerBus` traces into the log of every later suite. */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** True iff `path` exists AND holds data beyond commit markers — an
    * EMPTY partitioned write commits a directory containing only
    * `_SUCCESS` (zero partition dirs), which a parquet read rejects with
    * UNABLE_TO_INFER_SCHEMA just as loudly as a missing path. */
  private def hasContent(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(p) && fs.listStatus(p).exists(
      s => !s.getPath.getName.startsWith("_"))
  }

  def read(spark: SparkSession, path: String): PropertyGraph = {
    import org.apache.spark.sql.functions.typedlit
    // nodes first: a missing/unreadable node layout fails the whole read
    // (the caller's empty-store fallback). Edges tolerate ABSENCE —
    // writing an edge-free graph commits zero partition directories, and
    // a node-only store must not be dropped because its edge side is
    // empty (found live: Serve's flush-then-reboot of a nodes-only graph).
    val nodes = spark.read.parquet(s"$path/nodes")
      .select("id", "label", "key", "props")
    val e =
      if (hasContent(spark, s"$path/edges")) spark.read.parquet(s"$path/edges")
      else graft.model.GraphSchema.emptyEdges(spark)
    val ewp = // tolerate prop-less layouts written before edge properties
      if (e.columns.contains("props")) e
      else e.withColumn("props", typedlit(Map.empty[String, String]))
    PropertyGraph(nodes, ewp.select("srcId", "dstId", "relType", "props"))
  }

  /** Durable micro-batch node upsert — the streaming `foreachBatch` write
    * path (the reference's per-record Bolt MERGE, as one partition-scoped
    * job per batch). Reads ONLY the label partitions the batch touches
    * (partition-pruned scan), merges set-oriented, and rewrites ONLY those
    * partitions via dynamic partition overwrite — the rest of the store is
    * never read or written, which is what makes a durable upsert viable
    * when the store dwarfs every batch. Returns (created, matched).
    *
    * The touched-label `collect` is a per-batch driver list of label
    * STRINGS (bounded by the schema, not the data) — not a data collect. */
  def upsertNodes(spark: SparkSession, path: String, batch: DataFrame): (Long, Long) =
    withWriterLease(spark, path) { upsertNodesLocked(spark, path, batch) }

  private def upsertNodesLocked(spark: SparkSession, path: String, batch: DataFrame): (Long, Long) = {
    val nodesPath = s"$path/nodes"
    val touched = batch.select("label").distinct()
      // bounded: schema-bounded label partition list of the batch
      .collect().map(_.getString(0)).toSeq
    val existing =
      try spark.read.parquet(nodesPath)
        .select("id", "label", "key", "props")
        .filter(col("label").isin(touched.map(x => x: Any): _*))
      catch { case _: org.apache.spark.sql.AnalysisException =>
        graft.model.GraphSchema.emptyNodes(spark) // first batch: empty store
      }
    val scoped = PropertyGraph(existing, graft.model.GraphSchema.emptyEdges(spark))
    val counts = scoped.mergeNodeCounts(batch)
    // localCheckpoint cuts lineage from the files being overwritten (Spark
    // refuses to overwrite a path it is still reading from)
    val merged = scoped.mergeNodes(batch).nodes.localCheckpoint(true)
    clusterNodes(merged)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("label").parquet(nodesPath)
    counts
  }

  /** Durable micro-batch edge upsert: same partition-scoped shape as
    * [[upsertNodes]], keyed by the batch's relType partitions. */
  def upsertEdges(spark: SparkSession, path: String, batch: DataFrame): Unit =
    withWriterLease(spark, path) { upsertEdgesLocked(spark, path, batch) }

  private def upsertEdgesLocked(spark: SparkSession, path: String, batch: DataFrame): Unit = {
    val edgesPath = s"$path/edges"
    val withProps =
      if (batch.columns.contains("props")) batch
      else batch.withColumn("props", typedlit(Map.empty[String, String]))
    val touched = withProps.select("relType").distinct()
      // bounded: schema-bounded relType partition list of the batch
      .collect().map(_.getString(0)).toSeq
    val existing =
      try {
        val e = spark.read.parquet(edgesPath)
        (if (e.columns.contains("props")) e
         else e.withColumn("props", typedlit(Map.empty[String, String])))
          .select("srcId", "dstId", "relType", "props")
          .filter(col("relType").isin(touched.map(x => x: Any): _*))
      } catch { case _: org.apache.spark.sql.AnalysisException =>
        graft.model.GraphSchema.emptyEdges(spark)
      }
    val scoped = PropertyGraph(graft.model.GraphSchema.emptyNodes(spark), existing)
    val merged = scoped.mergeEdges(withProps).edges.localCheckpoint(true)
    clusterEdges(merged)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("relType").parquet(edgesPath)
  }

  /** Catalog-backed bucketed layout: nodes and edges hash-bucketed (and
    * sorted) by their join keys, so MERGE anti-joins and pattern joins read
    * both sides already co-partitioned — no shuffle of the stored graph at
    * all, the property that matters most at 100 TB (the store dwarfs every
    * incoming batch). Requires a metastore table (bucket metadata lives in
    * the catalog, not the files). */
  def writeBucketed(g: PropertyGraph, tablePrefix: String, buckets: Int): Unit = {
    g.nodes.write.mode("overwrite")
      .bucketBy(buckets, "id").sortBy("id")
      .saveAsTable(s"${tablePrefix}_nodes")
    g.edges.write.mode("overwrite")
      .bucketBy(buckets, "srcId").sortBy("srcId")
      .saveAsTable(s"${tablePrefix}_edges")
  }

  def readBucketed(spark: SparkSession, tablePrefix: String): PropertyGraph = {
    import org.apache.spark.sql.functions.typedlit
    val e = spark.table(s"${tablePrefix}_edges")
    val ewp = // tolerate prop-less layouts written before edge properties
      if (e.columns.contains("props")) e
      else e.withColumn("props", typedlit(Map.empty[String, String]))
    PropertyGraph(
      spark.table(s"${tablePrefix}_nodes").select("id", "label", "key", "props"),
      ewp.select("srcId", "dstId", "relType", "props"))
  }
}
