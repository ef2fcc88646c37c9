package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Baseline: brute-force cosine top-k with the query side broadcast — the
  * corpus is never shuffled, scan stays embarrassingly parallel. Scale path:
  * random-hyperplane LSH bucketing turns the cross product into an equi-join
  * on bucket ids (tunable recall/cost via nBits).
  */
object Similarity {

  /** Brute-force cosine top-k. `queries` must be dim-table-sized (it is
    * broadcast to every corpus partition); corpus side streams. Returns
    * (q_id, rank, id, cosine) with rank 1..k per query. */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      corpusId: String = "id", corpusVec: String = "vec",
      queryId: String = "q_id", queryVec: String = "q_vec"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col(queryId) =!= col(corpusId))
      .withColumn("cosine", VectorFunctions.cosine(col(queryVec), col(corpusVec)))
    val w = Window.partitionBy(col(queryId)).orderBy(col("cosine").desc, col(corpusId))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col("rank"), col(corpusId), col("cosine"))
  }

  /** Deterministic random hyperplanes (fixed seed → same planes on every
    * executor and every run). */
  def randomHyperplanes(nBits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits, dim)(rnd.nextGaussian())
  }

  /** Sign-of-projection LSH bucket id for a vector column (one codegen'd
    * dot product per plane against a literal array). */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val proj = graft.functions.NativeExpressions.dotProduct(vec, typedlit(p.toSeq))
      when(proj >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** LSH-bucketed ANN top-k: candidates = same-bucket corpus rows only.
    * Recall is governed by nBits (fewer bits → bigger buckets → higher
    * recall, more compute). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, nBits: Int,
      dim: Int, seed: Long = 42L,
      corpusId: String = "id", corpusVec: String = "vec",
      queryId: String = "q_id", queryVec: String = "q_vec"): DataFrame = {
    val planes = randomHyperplanes(nBits, dim, seed)
    val c = corpus.withColumn("__bucket", lshBucket(col(corpusVec), planes))
    val q = queries.withColumn("__bucket", lshBucket(col(queryVec), planes))
    val scored = c.join(broadcast(q), Seq("__bucket"))
      .filter(col(queryId) =!= col(corpusId))
      .withColumn("cosine", VectorFunctions.cosine(col(queryVec), col(corpusVec)))
    val w = Window.partitionBy(col(queryId)).orderBy(col("cosine").desc, col(corpusId))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col("rank"), col(corpusId), col("cosine"))
  }

  /** IVF (inverted-file) ANN top-k — the other standard scale path next to
    * [[lshTopK]]: the corpus is partitioned into `nlist` Voronoi cells
    * around centroids, each query probes only its `nprobe` nearest cells, so
    * scored candidates shrink by ~nprobe/nlist. Centroids here are a
    * deterministic sample (first `nlist` corpus vectors by id — a real
    * deployment trains k-means; the partition/probe machinery is identical).
    * Cell assignment is a broadcast argmin, candidate generation an
    * equi-join on cell id — never a corpus×corpus product. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nlist: Int, nprobe: Int,
      corpusId: String = "id", corpusVec: String = "vec",
      queryId: String = "q_id", queryVec: String = "q_vec"): DataFrame = {
    val centroids = broadcast(
      corpus.orderBy(col(corpusId)).limit(nlist)
        .select(col(corpusId).as("__cent_id"), col(corpusVec).as("__cent_vec")))
    def nearestCells(df: DataFrame, idC: String, vecC: String, n: Int): DataFrame = {
      val scored = df.crossJoin(centroids)
        .withColumn("__sim", VectorFunctions.cosine(col(vecC), col("__cent_vec")))
      val w = Window.partitionBy(col(idC)).orderBy(col("__sim").desc, col("__cent_id"))
      scored.withColumn("__cr", row_number().over(w)).filter(col("__cr") <= n)
        .select(df.columns.toIndexedSeq.map(col) :+ col("__cent_id").as("__cell"): _*)
    }
    val corpusCells = nearestCells(corpus, corpusId, corpusVec, 1)
    val queryProbes = nearestCells(queries, queryId, queryVec, nprobe)
    val scored = corpusCells.join(broadcast(queryProbes), Seq("__cell"))
      .filter(col(queryId) =!= col(corpusId))
      .withColumn("cosine", VectorFunctions.cosine(col(queryVec), col(corpusVec)))
    val w = Window.partitionBy(col(queryId)).orderBy(col("cosine").desc, col(corpusId))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col("rank"), col(corpusId), col("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs (all pairs above threshold within
    * the full corpus — use only when corpus fits a blocked strategy; the
    * LSH variant is the scale path). */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", VectorFunctions.cosine(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
