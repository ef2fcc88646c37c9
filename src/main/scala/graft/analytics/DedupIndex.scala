package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** PERSISTED, incrementally-maintained near-duplicate index (VERDICT r7 #1)
  * — the write-once/read-many form of [[Dedup.incrementalNearDups]] and the
  * embedding LSH matcher. Until round 8 every LSH/ANN entry re-derived
  * signatures, buckets, and codes from raw data per query, so the sf10
  * rehearsal's per-arrival cost grew with HISTORY size (240.6 s) — exactly
  * what a 100 TB ingest cannot run. Here the history side is computed once
  * at `build`, stored as parquet store tables, kept current by idempotent
  * `append` merges as batches land, and every `query` reads the persisted
  * tables: per-arrival cost = the arrival's own signature derivation +
  * bucket collisions + exact verification on candidates — a function of
  * true-match volume, never of history size.
  *
  * Layout under `path` (same dynamic-overwrite-free posture as
  * [[graft.graph.GraphStore]]: append-only tables, MERGE semantics by
  * anti-joining already-indexed ids):
  *
  *   text_base/    (id LONG, sh ARRAY<LONG>)                — portable
  *                 hashed shingle sets ([[Dedup.portableHashedShingles]])
  *   text_buckets/ (band INT, bucket LONG, id LONG, bks ARRAY<LONG>) —
  *                 one row per (doc, band); `bks` carries the doc's full
  *                 bucket array for first-collision dedup at query time
  *   emb_vectors/  (id LONG, vec ARRAY<DOUBLE>, nrm DOUBLE)
  *   emb_buckets/  (t INT, bucket LONG, id LONG, bkts ARRAY<LONG>) —
  *                 sign-LSH over the portable plane family
  *                 ([[Similarity.portableLshBucketArray]])
  *
  * Both bucket tables are written `repartitionByRange(bucket)` + sorted, so
  * the query-side equi-join probes a clustered layout on a narrow 8-byte
  * key; the base/vector tables are ranged on id for the verification join.
  * All hash derivations are the PORTABLE md5 family, so query results
  * hash-match the DuckDB oracle exactly like the derive-per-query entries
  * they replace (d03/d17/d15/d19 lineage).
  */
object DedupIndex {

  // ----------------------------------------------------- geometry manifest --

  /** Geometry manifest (ADVICE r8 #1). The hash geometry (shingleN/k/bands;
    * tables/nBits/dim) is part of the STORE's identity: querying or
    * appending with a different geometry than the build's produces bucket
    * keys from a different hash family — candidates silently miss and a
    * dedup pipeline reports false "clean" verdicts. Build writes the
    * geometry as a properties file; query/append re-derive their geometry
    * and FAIL LOUDLY on mismatch instead of returning wrong zeros. Stores
    * written before the manifest existed validate as legacy (append
    * retrofits the manifest from ITS parameters on first touch). Same
    * local-filesystem scope as the pq codebook artifact below. */
  private def writeManifest(path: String, name: String,
      geom: Seq[(String, Int)]): Unit = {
    val p = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(p)
    val body = geom.map { case (k, v) => s"$k=$v" }.mkString("", "\n", "\n")
    java.nio.file.Files.write(p.resolve(name), body.getBytes("UTF-8"))
  }

  private def checkManifest(path: String, name: String,
      geom: Seq[(String, Int)]): Unit = {
    val f = java.nio.file.Paths.get(path).resolve(name)
    if (java.nio.file.Files.exists(f)) {
      val stored = java.nio.file.Files.readAllLines(f).toArray(Array.empty[String])
        .iterator.map(_.trim).filter(_.nonEmpty)
        .map { l => val Array(k, v) = l.split("=", 2); k -> v.toInt }.toMap
      val mismatches = geom.collect {
        case (k, v) if stored.get(k).exists(_ != v) =>
          s"$k: store=${stored(k)} caller=$v"
      }
      require(mismatches.isEmpty,
        s"index at $path was built with a different geometry than this call " +
          s"— ${mismatches.mkString(", ")}. Querying across geometries " +
          "produces silent false negatives; rebuild the index or pass the " +
          s"store's geometry (see $name).")
    }
  }

  private def textGeom(shingleN: Int, k: Int, bands: Int) =
    Seq("shingleN" -> shingleN, "k" -> k, "bands" -> bands)
  private def embGeom(tables: Int, nBits: Int, dim: Int) =
    Seq("tables" -> tables, "nBits" -> nBits, "dim" -> dim)

  /** Atomic directory swap (ADVICE r8 #2): `tmp` (a fully-written new
    * layout) replaces `live` via two same-filesystem renames. The store of
    * record is never the only copy mid-operation: until the first rename
    * the old layout is live and untouched; between the renames both layouts
    * exist on disk (a crash leaves `<live>.__old` to recover from — see
    * [[recoverIfNeeded]]); the old copy is deleted only after the new one
    * is in place.
    *
    * CONCURRENCY CONTRACT (ADVICE r9 #3): between the two renames the live
    * path briefly does not exist — compaction requires the SINGLE-WRITER /
    * NO-CONCURRENT-READER discipline the store already demands of appends
    * (one maintenance owner; quiesce queries across the swap, as the
    * composed streaming loop does by compacting between micro-batches on
    * the stream's own thread). Readers that still race a crash or an
    * external compactor recover via [[recoverIfNeeded]] at open. */
  private def swapIn(live: String, tmp: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    def deleteRec(p: java.nio.file.Path): Unit =
      if (Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
      }
    val liveP = Paths.get(live); val tmpP = Paths.get(tmp)
    val oldP = Paths.get(live + ".__old")
    deleteRec(oldP)
    Files.move(liveP, oldP, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmpP, liveP, StandardCopyOption.ATOMIC_MOVE)
    deleteRec(oldP)
  }

  /** Startup recovery for a crash inside [[swapIn]]'s rename window
    * (ADVICE r9 #3): if the live layout is missing but `<live>.__old`
    * exists, the crash happened after the first rename — restore the old
    * layout (it was complete and untouched). Called by every open path
    * (query/append/compact), so a crashed compaction never needs manual
    * surgery. A leftover `.__old` NEXT TO a live layout is the post-swap
    * crash case — the live copy is the newer truth; leave deletion to the
    * next swap. */
  private def recoverIfNeeded(live: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val liveP = Paths.get(live); val oldP = Paths.get(live + ".__old")
    if (!Files.exists(liveP) && Files.exists(oldP)) {
      System.err.println(s"[dedup-index] $live missing with .__old present " +
        "(crash inside a compaction swap) — restoring the pre-compaction layout")
      Files.move(oldP, liveP, StandardCopyOption.ATOMIC_MOVE)
    }
  }

  private def recoverText(path: String): Unit = {
    recoverIfNeeded(s"$path/text_base"); recoverIfNeeded(s"$path/text_buckets")
  }
  private def recoverEmbedding(path: String): Unit = {
    recoverIfNeeded(s"$path/emb_vectors"); recoverIfNeeded(s"$path/emb_buckets")
  }

  // ------------------------------------------------------------ text side --

  /** Build (overwrite) the MinHash+LSH text index for `df` at `path`. */
  def buildText(df: DataFrame, idCol: String, textCol: String, path: String,
      shingleN: Int = 1, k: Int = 64, bands: Int = 8): Unit = {
    val (base, buckets) =
      Dedup.portableBaseAndBuckets(df, idCol, textCol, shingleN, k, bands)
    base.repartitionByRange(col("id")).sortWithinPartitions("id")
      .write.mode("overwrite").parquet(s"$path/text_base")
    buckets.select(col("band"), col("bucket"), col("id"), col("bks"))
      .repartitionByRange(col("bucket")).sortWithinPartitions("bucket", "id")
      .write.mode("overwrite").parquet(s"$path/text_buckets")
    writeManifest(path, "text_manifest.properties", textGeom(shingleN, k, bands))
  }

  /** Incrementally merge `newDocs` into the persisted text index: ids
    * already indexed are skipped (idempotent — re-appending a batch after a
    * crash or a replayed micro-batch is a no-op), the rest derive signatures
    * ONCE and append. Cost is O(batch) + one anti-join probe against the
    * indexed id set — never a re-derivation of history. */
  def appendText(spark: SparkSession, path: String, newDocs: DataFrame,
      idCol: String, textCol: String,
      shingleN: Int = 1, k: Int = 64, bands: Int = 8): Unit = {
    recoverText(path)
    checkManifest(path, "text_manifest.properties", textGeom(shingleN, k, bands))
    // legacy (pre-manifest) store: VERIFY the derivable geometry BEFORE
    // appending (ADVICE r9 #4) — the bks array length IS the build's
    // bands. Without this, a wrong-bands append would both write
    // mixed-geometry bucket rows and then enshrine the wrong geometry as
    // the store's manifest truth. shingleN/k are not derivable from the
    // layout; the retrofit below records the caller's values for them.
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path)
        .resolve("text_manifest.properties"))) {
      val storedBands = spark.read.parquet(s"$path/text_buckets")
        .select(size(col("bks")).as("n")).limit(1).collect()
        .headOption.map(_.getInt(0))
      storedBands.foreach(b => require(b == bands,
        s"legacy index at $path was built with bands=$b but this append " +
          s"passes bands=$bands — appending would mix hash geometries; " +
          "rebuild the index or pass the store's geometry"))
    }
    val existing = spark.read.parquet(s"$path/text_base").select(col("id"))
    val fresh = newDocs
      .join(existing.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
      // cut lineage from the files about to be appended to (same
      // read-then-write discipline as GraphStore's upsert)
      .localCheckpoint(true)
    val (base, buckets) =
      Dedup.portableBaseAndBuckets(fresh, idCol, textCol, shingleN, k, bands)
    base.write.mode("append").parquet(s"$path/text_base")
    buckets.select(col("band"), col("bucket"), col("id"), col("bks"))
      .repartitionByRange(col("bucket")).sortWithinPartitions("bucket", "id")
      .write.mode("append").parquet(s"$path/text_buckets")
    // legacy (pre-manifest) store: retrofit from this call's geometry —
    // later appends/queries then validate against it
    writeManifest(path, "text_manifest.properties", textGeom(shingleN, k, bands))
  }

  /** Match `arrivals` against the PERSISTED text index — identical output
    * contract to [[Dedup.incrementalNearDups]] (one row per arrival:
    * verified match count, best history match by (jaccard DESC, id), or
    * (-1, 0.0) when clean), but the history side is the stored tables: the
    * only per-query work proportional to anything is the arrival batch
    * itself and its true bucket collisions. */
  def queryText(spark: SparkSession, path: String, arrivals: DataFrame,
      idCol: String, textCol: String, shingleN: Int = 1, k: Int = 64,
      bands: Int = 8, threshold: Double = 0.9): DataFrame = {
    recoverText(path)
    checkManifest(path, "text_manifest.properties", textGeom(shingleN, k, bands))
    val hBuckets = spark.read.parquet(s"$path/text_buckets")
    val hBase = spark.read.parquet(s"$path/text_base")
    val (aBase, aBuckets) =
      Dedup.portableBaseAndBuckets(arrivals, idCol, textCol, shingleN, k, bands)
    val cand = aBuckets
      .select(col("band"), col("bucket"), col("id").as("id_n"), col("bks").as("bks_n"))
      .join(hBuckets.select(col("band"), col("bucket"), col("id").as("id_h"),
        col("bks").as("bks_h")), Seq("band", "bucket"))
      // self-exclusion: under at-least-once delivery a replayed batch is
      // already IN the index, and a doc is never its own duplicate
      .filter(col("id_n") =!= col("id_h"))
      .filter(!graft.functions.NativeExpressions.earlierArrayMatch(
        col("bks_n"), col("bks_h"), col("band")))
      .select("id_n", "id_h")
    val verified = cand
      .join(aBase.select(col("id").as("id_n"), col("sh").as("sh_n")), Seq("id_n"))
      .join(hBase.select(col("id").as("id_h"), col("sh").as("sh_h")), Seq("id_h"))
      .withColumn("jaccard",
        graft.functions.NativeExpressions.jaccardSortedLong(col("sh_n"), col("sh_h")))
      .filter(col("jaccard") >= threshold)
    val w = Window.partitionBy("id_n")
    val wOrd = w.orderBy(col("jaccard").desc, col("id_h"))
    val best = verified
      .withColumn("n_matches", count(lit(1)).over(w))
      .withColumn("__rn", row_number().over(wOrd))
      .filter(col("__rn") === 1)
      .select(col("id_n"), col("n_matches"),
        col("id_h").as("best_match_id"), col("jaccard").as("best_jaccard"))
    arrivals.select(col(idCol).as("id_n"))
      .join(best, Seq("id_n"), "left")
      .select(col("id_n").as(idCol),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        coalesce(col("best_match_id"), lit(-1L)).as("best_match_id"),
        coalesce(col("best_jaccard"), lit(0.0)).as("best_jaccard"))
  }

  /** Per-band occupancy statistics of the persisted text index, READ BACK
    * from disk (not from the build-side plan — the d23 entry hashes these,
    * so a build that wrote wrong/partial tables cannot pass). `max_bucket`
    * is the hottest bucket's size: the quantity that prices worst-case
    * per-arrival candidate volume, which is what an operator reviews before
    * pointing a 100 TB ingest at the index. */
  def textIndexStats(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/text_buckets")
      .groupBy("band", "bucket").agg(count(lit(1)).as("sz"))
      .groupBy("band")
      .agg(sum("sz").cast("long").as("n_entries"),
        count(lit(1)).as("n_buckets"),
        max("sz").cast("long").as("max_bucket"))
      .orderBy("band")

  // ------------------------------------------------------- embedding side --

  /** Build (overwrite) the sign-LSH ANN index for `df` at `path` —
    * `tables`×`nBits` portable hyperplanes, the d19 production-threshold
    * geometry. Vectors are stored as double arrays with their norms so
    * query-side verification never recomputes either. */
  def buildEmbedding(df: DataFrame, idCol: String, vecCol: String,
      path: String, tables: Int, nBits: Int, dim: Int): Unit = {
    val v = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("vec"))
      .withColumn("nrm", VectorFunctions.norm(col("vec")))
      .withColumn("bkts",
        Similarity.portableLshBucketArray(col("vec"), tables, nBits, dim))
    v.select("id", "vec", "nrm")
      .repartitionByRange(col("id")).sortWithinPartitions("id")
      .write.mode("overwrite").parquet(s"$path/emb_vectors")
    v.select(col("id"), col("bkts"),
        posexplode(col("bkts")).as(Seq("t", "bucket")))
      .select(col("t"), col("bucket"), col("id"), col("bkts"))
      .repartitionByRange(col("bucket")).sortWithinPartitions("bucket", "id")
      .write.mode("overwrite").parquet(s"$path/emb_buckets")
    writeManifest(path, "emb_manifest.properties", embGeom(tables, nBits, dim))
  }

  /** Idempotent incremental merge into the persisted ANN index — the
    * [[appendText]] contract for vectors. */
  def appendEmbedding(spark: SparkSession, path: String, newVecs: DataFrame,
      idCol: String, vecCol: String, tables: Int, nBits: Int, dim: Int): Unit = {
    recoverEmbedding(path)
    checkManifest(path, "emb_manifest.properties", embGeom(tables, nBits, dim))
    // legacy (pre-manifest) store: verify the derivable geometry before
    // appending (ADVICE r9 #4) — bkts length = tables, vec length = dim.
    // nBits is not derivable; the retrofit records the caller's value.
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path)
        .resolve("emb_manifest.properties"))) {
      val stored = spark.read.parquet(s"$path/emb_buckets")
        .select(size(col("bkts")).as("t")).limit(1).collect().headOption
      stored.foreach(r => require(r.getInt(0) == tables,
        s"legacy index at $path was built with tables=${r.getInt(0)} but " +
          s"this append passes tables=$tables — appending would mix hash " +
          "geometries; rebuild the index or pass the store's geometry"))
      val storedDim = spark.read.parquet(s"$path/emb_vectors")
        .select(size(col("vec")).as("d")).limit(1).collect().headOption
      storedDim.foreach(r => require(r.getInt(0) == dim,
        s"legacy index at $path stores dim=${r.getInt(0)} vectors but this " +
          s"append passes dim=$dim — rebuild or pass the store's geometry"))
    }
    val existing = spark.read.parquet(s"$path/emb_vectors").select(col("id"))
    val fresh = newVecs
      .join(existing.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
      .localCheckpoint(true)
    val v = fresh.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("vec"))
      .withColumn("nrm", VectorFunctions.norm(col("vec")))
      .withColumn("bkts",
        Similarity.portableLshBucketArray(col("vec"), tables, nBits, dim))
    v.select("id", "vec", "nrm").write.mode("append").parquet(s"$path/emb_vectors")
    v.select(col("id"), col("bkts"),
        posexplode(col("bkts")).as(Seq("t", "bucket")))
      .select(col("t"), col("bucket"), col("id"), col("bkts"))
      .repartitionByRange(col("bucket")).sortWithinPartitions("bucket", "id")
      .write.mode("append").parquet(s"$path/emb_buckets")
    writeManifest(path, "emb_manifest.properties", embGeom(tables, nBits, dim))
  }

  /** COMPACT the text index: appends accumulate small unclustered files
    * (each batch writes its own ranged set), so a standing index that
    * takes many batches degrades toward one file per batch per partition
    * — the classic streaming-sink small-file problem (i08's compaction,
    * applied to the index store). Rewrites both tables as one globally
    * range-clustered layout; content is untouched (spec asserts query
    * results identical and file count reduced). Run it on the maintenance
    * cadence, not per batch — the query path works either way, compaction
    * buys back scan locality and file-listing overhead. */
  def compactText(spark: SparkSession, path: String): Unit = {
    recoverText(path)
    // ADVICE r8 #2: compact into a FRESH directory, then atomically swap —
    // never overwrite the live store in place. The old read-checkpoint-
    // overwrite form held the only copy in executor storage with truncated
    // lineage mid-rewrite: a failure (or lost checkpoint block) after the
    // delete destroyed the store of record. Here the source files are
    // untouched until the replacement layout is fully committed.
    spark.read.parquet(s"$path/text_base")
      .repartitionByRange(col("id")).sortWithinPartitions("id")
      .write.mode("overwrite").parquet(s"$path/text_base.__compact")
    spark.read.parquet(s"$path/text_buckets")
      .repartitionByRange(col("bucket")).sortWithinPartitions("bucket", "id")
      .write.mode("overwrite").parquet(s"$path/text_buckets.__compact")
    swapIn(s"$path/text_base", s"$path/text_base.__compact")
    swapIn(s"$path/text_buckets", s"$path/text_buckets.__compact")
  }

  /** [[compactText]] for the embedding store (same write-to-temp + atomic
    * swap posture). */
  def compactEmbedding(spark: SparkSession, path: String): Unit = {
    recoverEmbedding(path)
    spark.read.parquet(s"$path/emb_vectors")
      .repartitionByRange(col("id")).sortWithinPartitions("id")
      .write.mode("overwrite").parquet(s"$path/emb_vectors.__compact")
    spark.read.parquet(s"$path/emb_buckets")
      .repartitionByRange(col("bucket")).sortWithinPartitions("bucket", "id")
      .write.mode("overwrite").parquet(s"$path/emb_buckets.__compact")
    swapIn(s"$path/emb_vectors", s"$path/emb_vectors.__compact")
    swapIn(s"$path/emb_buckets", s"$path/emb_buckets.__compact")
  }

  // ------------------------------------------------------------- PQ side --

  /** Persist the PQ half of the ANN store (VERDICT r7 #1's "PQ codes as
    * store tables"): the deterministic codebook (first-`ksub`-by-id sample
    * policy — [[Similarity.pqCodebook]]) serialized as a text artifact,
    * and every corpus vector encoded ONCE into its m sub-space codes.
    * Queries then read m small ints per corpus row and never touch raw
    * vectors — the memory-bandwidth posture PQ exists for, now paying its
    * encode cost at build time instead of per query. */
  def buildPq(df: DataFrame, idCol: String, vecCol: String, path: String,
      m: Int, ksub: Int, dim: Int): Unit = {
    val cb = Similarity.pqCodebook(df, idCol, vecCol, m, ksub, dim)
    df.select(col(idCol).as("id"),
        cb.codesCol(col(vecCol).cast("array<double>")).as("codes"))
      .repartitionByRange(col("id")).sortWithinPartitions("id")
      .write.mode("overwrite").parquet(s"$path/pq_codes")
    // codebook artifact: header "m dsub", then one line per (subspace,
    // code): "s c cc v1 v2 …". Doubles render via Double.toString, which
    // round-trips bit-exactly through parseDouble.
    val sb = new StringBuilder
    sb.append(cb.m).append(' ').append(cb.dsub).append('\n')
    for (s <- 0 until cb.m; c <- cb.book(s).indices) {
      val (cen, cc) = cb.book(s)(c)
      sb.append(s).append(' ').append(c).append(' ').append(cc)
      cen.foreach(v => sb.append(' ').append(v))
      sb.append('\n')
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/pq_codebook.txt"),
      sb.toString.getBytes("UTF-8"))
  }

  private[analytics] def loadPqCodebook(path: String): Similarity.PqCodebook = {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$path/pq_codebook.txt"))
    val Array(m, dsub) = lines.get(0).split(' ').map(_.toInt)
    val book = Array.fill(m)(
      scala.collection.mutable.ArrayBuffer.empty[(Array[Double], Double)])
    for (i <- 1 until lines.size) {
      val parts = lines.get(i).split(' ')
      val s = parts(0).toInt
      val cc = parts(2).toDouble
      val cen = parts.drop(3).map(_.toDouble)
      require(cen.length == dsub, s"codebook row $i: ${cen.length} != dsub $dsub")
      book(s) += ((cen, cc))
    }
    Similarity.PqCodebook(m, dsub, book.map(_.toArray))
  }

  /** ADC top-k against the PERSISTED codes — [[Similarity.pqTopK]] with
    * the corpus side served from the store: the query batch builds its
    * distance tables from the LOADED codebook (bit-identical to the
    * build-time one: Double.toString round-trips), broadcasts them, and
    * the scan reads only (id, codes). Same output contract as pqTopK:
    * (q_id, rank, id, score), ADC score ascending, ties to smallest id. */
  def queryPqTopK(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, queryId: String = "q_id", queryVec: String = "q_vec"): DataFrame = {
    val cb = loadPqCodebook(path)
    val codes = spark.read.parquet(s"$path/pq_codes")
      .select(col("id"), col("codes").as("__codes"))
    val q = queries.select(col(queryId),
      cb.dtabCol(col(queryVec).cast("array<double>")).as("__dtab"))
    val scored = codes.join(broadcast(q))
      .filter(col(queryId) =!= col("id"))
      .withColumn("score", cb.adcScore)
    val w = Window.partitionBy(col(queryId)).orderBy(col("score"), col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col("rank"), col("id"), col("score"))
  }

  /** Match arriving vectors against the PERSISTED ANN index at a cosine
    * threshold — the at-ingest form of
    * [[Similarity.embeddingNearDupPairsLSHPortable]], one row per arrival:
    * (id, n_matches, best_match_id, best_cosine), best by (cosine DESC,
    * id), (-1, 0.0) when clean. Candidates are per-table bucket equi-joins
    * against the stored layout; stored vectors are only touched for
    * verified candidates. */
  def queryEmbedding(spark: SparkSession, path: String, arrivals: DataFrame,
      idCol: String, vecCol: String, threshold: Double,
      tables: Int, nBits: Int, dim: Int): DataFrame = {
    recoverEmbedding(path)
    checkManifest(path, "emb_manifest.properties", embGeom(tables, nBits, dim))
    val hBuckets = spark.read.parquet(s"$path/emb_buckets")
    val hVecs = spark.read.parquet(s"$path/emb_vectors")
    val a = arrivals.select(col(idCol).as("id_n"),
      col(vecCol).cast("array<double>").as("vec_n"))
      .withColumn("nrm_n", VectorFunctions.norm(col("vec_n")))
      .withColumn("bkts_n",
        Similarity.portableLshBucketArray(col("vec_n"), tables, nBits, dim))
    // Vectors RIDE THROUGH the bucket join so verification runs INSIDE the
    // joined stage and sub-threshold candidates die before any further
    // shuffle. The first cut materialized (id_n, id_h) candidates and
    // joined vectors back — at the sf10 rehearsal the near-orthogonal
    // cross-cluster collision floor is ~116M candidate rows, and shuffling
    // them through two join-backs cost 188 s where this shape (the d19
    // join) verifies the same 116M inline in under 10 s. The history side
    // re-attaches its vectors with ONE id equi-join at tables×|index| rows
    // — linear, vector payloads shuffled once, never per candidate.
    val hB = hBuckets.select(col("t"), col("bucket"), col("id").as("id_h"),
        col("bkts").as("bkts_h"))
      .join(hVecs.select(col("id").as("id_h"), col("vec").as("vec_h"),
        col("nrm").as("nrm_h")), Seq("id_h"))
    val denom = col("nrm_n") * col("nrm_h")
    val verified = a.select(col("id_n"), col("vec_n"), col("nrm_n"),
        col("bkts_n"), posexplode(col("bkts_n")).as(Seq("t", "bucket")))
      .join(hB, Seq("t", "bucket"))
      .filter(col("id_n") =!= col("id_h")) // replay-safe: never self-match
      .filter(!graft.functions.NativeExpressions.earlierArrayMatch(
        col("bkts_n"), col("bkts_h"), col("t")))
      .withColumn("cosine",
        when(denom === 0.0, 0.0)
          .otherwise(VectorFunctions.dot(col("vec_n"), col("vec_h")) / denom))
      .filter(col("cosine") >= threshold)
      .select("id_n", "id_h", "cosine")
    val w = Window.partitionBy("id_n")
    val wOrd = w.orderBy(col("cosine").desc, col("id_h"))
    val best = verified
      .withColumn("n_matches", count(lit(1)).over(w))
      .withColumn("__rn", row_number().over(wOrd))
      .filter(col("__rn") === 1)
      .select(col("id_n"), col("n_matches"),
        col("id_h").as("best_match_id"), col("cosine").as("best_cosine"))
    arrivals.select(col(idCol).as("id_n"))
      .join(best, Seq("id_n"), "left")
      .select(col("id_n").as(idCol),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        coalesce(col("best_match_id"), lit(-1L)).as("best_match_id"),
        coalesce(col("best_cosine"), lit(0.0)).as("best_cosine"))
  }
}
