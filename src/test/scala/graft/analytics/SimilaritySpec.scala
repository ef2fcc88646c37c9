package graft.analytics

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  /** Clustered synthetic vectors: 4 well-separated centroids + small
    * deterministic noise, so nearest neighbors are in-cluster. */
  private def clustered = {
    val dim = 16
    val rnd = new scala.util.Random(7)
    val centroids = Array.fill(4, dim)(rnd.nextGaussian() * 5)
    val rows = (0 until 80).map { i =>
      val c = centroids(i % 4)
      val v = c.map(x => (x + rnd.nextGaussian() * 0.1).toFloat)
      (i.toLong, v, i % 4)
    }
    rows.toDF("id", "vec", "cluster")
  }

  test("brute-force cosine top-k returns in-cluster neighbors, ranked") {
    val corpus = clustered
    val queries = corpus.filter($"id" < 4)
      .select($"id".as("q_id"), $"vec".as("q_vec"), $"cluster".as("q_cluster"))
    val top = Similarity.cosineTopK(corpus, queries.drop("q_cluster"), k = 5)
    val joined = top.join(corpus.select($"id", $"cluster"), "id")
      .join(queries.select($"q_id", $"q_cluster"), "q_id")
    // every neighbor of query q is in q's cluster
    assert(joined.filter($"cluster" =!= $"q_cluster").count() === 0)
    // ranks are 1..5 per query
    val ranks = top.groupBy("q_id").agg(collect_list("rank").as("rs"))
      .select("rs").as[Seq[Int]].collect()
    assert(ranks.forall(_.sorted == Seq(1, 2, 3, 4, 5)))
  }

  test("round-10: filtered ANN filters inside candidate generation, never post-filter") {
    // tenant must alternate WITHIN a cluster (cluster = id%4, so id%2 would
    // make every cluster single-tenant and the under-delivery case vacuous)
    val corpus = clustered.select($"id", $"vec",
      (($"id" / 4).cast("long") % 2).cast("int").as("tenant"))
    val queries = corpus.filter($"id" < 6)
      .select($"id".as("q_id"), $"vec".as("q_vec"), $"tenant")
    val filtered = Similarity.lshTopKFilteredPortable(corpus, queries, k = 3,
      nBits = 4, dim = 16, filterCols = Seq("tenant"))
    // every hit shares the query's tenant
    val joined = filtered.withColumnRenamed("tenant", "q_tenant")
      .join(corpus.select($"id", $"tenant".as("c_tenant")), "id")
    assert(joined.filter($"q_tenant" =!= $"c_tenant").count() === 0)
    // semantics ≡ per-tenant pre-filtered corpora searched independently
    val perTenant = Seq(0, 1).map { t =>
      Similarity.lshTopKPortable(
        corpus.filter($"tenant" === t).select($"id", $"vec"),
        queries.filter($"tenant" === t).select($"q_id", $"q_vec"),
        k = 3, nBits = 4, dim = 16)
    }.reduce(_ unionByName _)
      .select($"q_id", $"rank", $"id").as[(Long, Int, Long)].collect().toSet
    val got = filtered.select($"q_id", $"rank", $"id")
      .as[(Long, Int, Long)].collect().toSet
    assert(got === perTenant)
    // the naive composition — post-filtering an UNFILTERED top-k — must
    // under-deliver k for at least one query on this fixture (its ranked
    // hits include the other tenant's vectors, which the filter then
    // removes); the in-join form keeps delivering from the filtered pool
    val post = Similarity.lshTopKPortable(corpus.select($"id", $"vec"),
        queries.select($"q_id", $"q_vec"), k = 3, nBits = 4, dim = 16)
      .join(corpus.select($"id", $"tenant".as("c_tenant")), "id")
      .join(queries.select($"q_id", $"tenant".as("q_tenant")), "q_id")
      .filter($"c_tenant" === $"q_tenant")
      .groupBy("q_id").count().as[(Long, Long)].collect().toMap
    val full = filtered.groupBy("q_id").count().as[(Long, Long)].collect().toMap
    assert(full.exists { case (q, n) => post.getOrElse(q, 0L) < n },
      s"expected post-filter under-delivery somewhere: post=$post full=$full")
  }

  test("MMR: λ=1 equals plain top-k; λ=0.5 swaps a redundant hit for a diverse one") {
    val corpus = clustered
    val queries = corpus.filter($"id" < 4)
      .select($"id".as("q_id"), $"vec".as("q_vec"))
    // λ=1 removes the redundancy penalty → selection IS relevance order
    val plain = Similarity.cosineTopK(corpus.select($"id", $"vec"), queries, k = 3)
      .select($"q_id", $"rank", $"id").as[(Long, Int, Long)].collect().toSet
    val mmr1 = Similarity.mmrTopK(corpus.select($"id", $"vec"), queries,
        k = 3, poolSize = 10, lambda = 1.0)
      .select($"q_id", $"rank", $"id").as[(Long, Int, Long)].collect().toSet
    assert(mmr1 === plain)
    // hand fixture: q=(1,0); a and b equally relevant and nearly parallel
    // to EACH OTHER (cos(a,b)≈0.9998); c a hair less relevant but on the
    // other side of q (cos(c,a)≈0.585). Relevance order (a,b,c); MMR at
    // λ=0.5 picks a, then c — b's mmr 0.5·(0.89−0.9998)<0 loses to c's
    // 0.5·(0.88−0.585)>0 by a wide margin — then b.
    val tiny = Seq(
      (10L, Array(1f, 0f)), (11L, Array(0.9f, 0.4359f)),
      (12L, Array(0.89f, 0.456f)), (13L, Array(0.88f, -0.475f)))
      .toDF("id", "vec")
    val q = tiny.filter($"id" === 10L).select($"id".as("q_id"), $"vec".as("q_vec"))
    val sel = Similarity.mmrTopK(tiny, q, k = 3, poolSize = 3, lambda = 0.5)
      .orderBy("rank").select("id").as[Long].collect().toSeq
    assert(sel === Seq(11L, 13L, 12L))
  }

  test("LSH top-k achieves high recall vs brute force on clustered data") {
    val corpus = clustered
    val queries = corpus.filter($"id" < 8)
      .select($"id".as("q_id"), $"vec".as("q_vec"))
    val brute = Similarity.cosineTopK(corpus, queries, k = 3)
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(corpus, queries, k = 3, nBits = 4, dim = 16)
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    val recall = brute.count(lsh.contains).toDouble / brute.size
    assert(recall >= 0.8, s"LSH recall $recall too low")
  }

  test("IVF top-k achieves high recall vs brute force on clustered data") {
    val corpus = clustered
    val queries = corpus.filter($"id" < 8)
      .select($"id".as("q_id"), $"vec".as("q_vec"))
    val brute = Similarity.cosineTopK(corpus, queries, k = 3)
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(corpus, queries, k = 3, nlist = 8, nprobe = 3)
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    val recall = brute.count(ivf.contains).toDouble / brute.size
    assert(recall >= 0.8, s"IVF recall $recall too low")
  }

  test("IVF with trained k-means centroids achieves high recall vs brute force") {
    val corpus = clustered
    val queries = corpus.filter($"id" < 8)
      .select($"id".as("q_id"), $"vec".as("q_vec"))
    val brute = Similarity.cosineTopK(corpus, queries, k = 3)
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopKTrained(corpus, queries, k = 3, nlist = 8, nprobe = 3)
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    val recall = brute.count(ivf.contains).toDouble / brute.size
    assert(recall >= 0.8, s"trained-IVF recall $recall too low")
  }

  test("IVF with deterministic Lloyd's centroids achieves high recall vs brute force") {
    val corpus = clustered
    val queries = corpus.filter($"id" < 8)
      .select($"id".as("q_id"), $"vec".as("q_vec"))
    val brute = Similarity.cosineTopK(corpus, queries, k = 3)
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopKLloyd(corpus, queries, k = 3, nlist = 8,
        nprobe = 3, iters = 2)
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    val recall = brute.count(ivf.contains).toDouble / brute.size
    assert(recall >= 0.8, s"Lloyd-IVF recall $recall too low")
  }

  test("Lloyd's centroids: deterministic bits, converge to cluster means") {
    val corpus = clustered
    def run() = Similarity.lloydCentroids(corpus, "id", "vec", k = 4, iters = 2)
      .select($"__cent_id".as[Long], $"__cent_vec".as[Seq[Double]])
      .collect().sortBy(_._1)
    val a = run()
    val b = run()
    // bitwise-identical across runs — the property the oracle hash needs
    assert(a.map(_._2).toSeq == b.map(_._2).toSeq)
    // ids 0..3 are one per cluster (id % 4), so each learned centroid should
    // land on its cluster's mean direction after the assign/avg rounds
    val means = corpus.select($"cluster", posexplode($"vec".cast("array<double>")).as(Seq("d", "v")))
      .groupBy("cluster", "d").agg(avg($"v").as("m"))
      .groupBy($"cluster").agg(
        transform(array_sort(collect_list(struct($"d", $"m"))),
          x => x.getField("m")).as("mean"))
      .select($"cluster".as[Int], $"mean".as[Seq[Double]])
      .collect().toMap
    def cos(x: Seq[Double], y: Seq[Double]): Double = {
      val dot = x.lazyZip(y).map(_ * _).sum
      dot / (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum))
    }
    a.foreach { case (cid, cvec) =>
      val c = cos(cvec, means(cid.toInt % 4))
      assert(c > 0.999, s"centroid $cid drifted from its cluster mean (cos=$c)")
    }
  }

  test("Lloyd's centroids: a cell that loses all members keeps its previous centroid") {
    // vec0 == vec1, so every row assigns to cent 0 or 2 (ties break to the
    // lower cent id) and cent 1 is empty from round 1 on — it must survive
    // with its init vector, keeping k stable
    val dup = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 1f, 0f, 0.1f)),
      (4L, Array(1f, 0.1f, 0f, 0f))).toDF("id", "vec")
    val cent = Similarity.lloydCentroids(dup, "id", "vec", k = 3, iters = 2)
      .select($"__cent_id".as[Long], $"__cent_vec".as[Seq[Double]])
      .collect().sortBy(_._1).toMap
    assert(cent.keySet === Set(0L, 1L, 2L))
    assert(cent(1L) === Seq(1.0, 0.0, 0.0, 0.0), "empty cell lost its centroid")
  }

  test("PQ (ADC) top-k: all neighbors in-cluster, deterministic re-encode") {
    // With ksub=8 sampled codes over 4 clusters, every member of a cluster
    // quantizes to (nearly) the same code word, so ADC guarantees CLUSTER
    // fidelity — in-cluster members tie and cannot be ranked within the
    // cluster (that is the accuracy/memory trade PQ makes; the exact
    // intra-cluster ranking is what v02's brute force or an exact re-rank
    // stage provides). The invariant spec'd here is the one the method
    // actually offers at this codebook size.
    val corpus = clustered
    val queries = corpus.filter($"id" < 8)
      .select($"id".as("q_id"), $"vec".as("q_vec"), $"cluster".as("q_cluster"))
    val pq = Similarity.pqTopK(corpus, queries.drop("q_cluster"),
      k = 3, m = 4, ksub = 8, dim = 16)
    val joined = pq.join(corpus.select($"id", $"cluster"), "id")
      .join(queries.select($"q_id", $"q_cluster"), "q_id")
    assert(joined.count() === 8 * 3)
    assert(joined.filter($"cluster" =!= $"q_cluster").count() === 0,
      "a PQ neighbor left the query's cluster")
    // deterministic: two runs encode and rank identically
    val a = pq.select("q_id", "rank", "id").as[(Long, Int, Long)].collect().toSet
    val b = Similarity.pqTopK(corpus, queries.drop("q_cluster"),
      k = 3, m = 4, ksub = 8, dim = 16)
      .select("q_id", "rank", "id").as[(Long, Int, Long)].collect().toSet
    assert(a === b)
  }

  test("PQ re-rank with a full candidate pool equals brute-force top-k exactly") {
    // with n = corpus size the ADC stage prunes nothing, so the exact
    // re-rank must reproduce cosineTopK bit-for-bit (same cosines, same
    // tie order) — the property that makes the two-stage ladder safe: ADC
    // only bounds RECALL, the re-rank owns the ordering
    val corpus = clustered
    val queries = corpus.filter($"id" < 8)
      .select($"id".as("q_id"), $"vec".as("q_vec"))
    val brute = Similarity.cosineTopK(corpus, queries, k = 3)
      .select("q_id", "rank", "id", "cosine")
      .as[(Long, Int, Long, Double)].collect().toSet
    val rr = Similarity.pqRerankTopK(corpus, queries, k = 3, n = 80,
        m = 4, ksub = 8, dim = 16)
      .select("q_id", "rank", "id", "cosine")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(rr === brute)
    // and a realistic pool still keeps every neighbor in the query's cluster
    val narrow = Similarity.pqRerankTopK(corpus, queries, k = 3, n = 10,
        m = 4, ksub = 8, dim = 16)
      .join(corpus.select($"id", $"cluster"), "id")
      .join(corpus.select($"id".as("q_id"), $"cluster".as("q_cluster")), "q_id")
    assert(narrow.count() === 8 * 3)
    assert(narrow.filter($"cluster" =!= $"q_cluster").count() === 0)
  }

  test("IVF-PQ top-k: cell pruning composes with ADC, neighbors stay in-cluster") {
    val corpus = clustered
    val queries = corpus.filter($"id" < 8)
      .select($"id".as("q_id"), $"vec".as("q_vec"), $"cluster".as("q_cluster"))
    val r = Similarity.ivfPqTopK(corpus, queries.drop("q_cluster"),
      k = 3, nlist = 8, nprobe = 3, m = 4, ksub = 8, dim = 16)
    val joined = r.join(corpus.select($"id", $"cluster"), "id")
      .join(queries.select($"q_id", $"q_cluster"), "q_id")
    assert(joined.count() === 8 * 3)
    assert(joined.filter($"cluster" =!= $"q_cluster").count() === 0,
      "an IVF-PQ neighbor left the query's cluster")
    val again = Similarity.ivfPqTopK(corpus, queries.drop("q_cluster"),
      k = 3, nlist = 8, nprobe = 3, m = 4, ksub = 8, dim = 16)
      .select("q_id", "rank", "id").as[(Long, Int, Long)].collect().toSet
    assert(again === r.select("q_id", "rank", "id")
      .as[(Long, Int, Long)].collect().toSet)
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val pairs = Similarity.embeddingNearDupPairs(
      clustered.select($"id", $"vec"), "id", "vec", 0.99)
    val rows = pairs.select("id_a", "id_b", "cosine")
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (a, b, c) => a < b && c >= 0.99 })
  }

  test("blocked pair join equals the naive all-pairs cross join exactly") {
    val df = clustered.select($"id", $"vec")
    def naive(threshold: Double) = {
      val a = df.select($"id".as("id_a"), $"vec".as("vec_a"))
      val b = df.select($"id".as("id_b"), $"vec".as("vec_b"))
      a.crossJoin(b).filter($"id_a" < $"id_b")
        .withColumn("cosine",
          graft.functions.VectorFunctions.cosine($"vec_a", $"vec_b"))
        .filter($"cosine" >= threshold)
        .select("id_a", "id_b", "cosine")
    }
    for (threshold <- Seq(0.4, 0.99); blocks <- Seq(1, 3, 16)) {
      val expected = naive(threshold)
        .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
      val got = Similarity.embeddingNearDupPairs(df, "id", "vec", threshold, blocks)
        .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
      // bit-exact: same pairs, same cosine doubles
      assert(got.toSeq == expected.toSeq,
        s"blocked(blocks=$blocks, t=$threshold) diverges from all-pairs")
    }
  }

  test("LSH near-dup pairs recall the exact pairs at a high threshold") {
    val df = clustered.select($"id", $"vec")
    val exact = Similarity.embeddingNearDupPairs(df, "id", "vec", 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.embeddingNearDupPairsLSH(df, "id", "vec", 0.99,
        tables = 6, nBits = 8, dim = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    // no false positives possible (exact verify); recall is the LSH risk
    assert(lsh.subsetOf(exact))
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.9, s"LSH pair recall $recall too low")
  }

  test("portable-plane LSH pairs: no false positives, useful recall, deterministic planes") {
    val df = clustered.select($"id", $"vec")
    val exact = Similarity.embeddingNearDupPairs(df, "id", "vec", 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val portable = Similarity.embeddingNearDupPairsLSHPortable(df, "id", "vec",
        0.99, tables = 6, nBits = 8, dim = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(portable.subsetOf(exact)) // exact verify kills false positives
    val recall = exact.count(portable.contains).toDouble / exact.size
    assert(recall >= 0.9, s"portable LSH pair recall $recall too low")
    // plane weights are a pure function of (table, bit, dim): same values
    // on every call, every JVM — the property the cross-engine oracle needs
    val p1 = Similarity.portablePlanes(3, 4, 16)
    val p2 = Similarity.portablePlanes(3, 4, 16)
    assert(p1.flatten.toSeq == p2.flatten.toSeq)
    assert(p1.flatten.forall(w => w >= -1.0 && w < 1.0))
    assert(p1.flatten.distinct.length == 64) // not degenerate
  }

  test("int8 quantization: codes stay in [-127, 127], error bounded by scale/2") {
    // the v07 catalog shape, checked against its mathematical guarantees:
    // symmetric scale = max|x|/127 keeps every floor(x/scale + 0.5) code in
    // the int8 range, and reconstruction error is at most half a step
    val rows = graft.ops.AnalyticsCatalog.entries
      .find(_.name == "v07_int8_quantization").get
      .fn(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getAs[Double]("scale")
      val qFirst = r.getAs[Long]("q_first")
      val maxErr = r.getAs[Double]("max_err")
      assert(scale > 0.0)
      assert(math.abs(qFirst) <= 127, s"code $qFirst out of int8 range")
      assert(maxErr <= scale / 2 + 1e-12,
        s"max_err $maxErr exceeds half-step ${scale / 2}")
      assert(r.getAs[Double]("mean_err") <= maxErr + 1e-12)
    }
  }
}
