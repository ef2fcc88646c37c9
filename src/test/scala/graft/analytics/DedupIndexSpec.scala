package graft.analytics

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Persisted dedup/ANN index: the stored path must serve EXACTLY what the
  * derive-per-query operators compute, appends must be idempotent merges,
  * and a query after append must equal a from-scratch build over the
  * union — the maintenance contract that lets a 100 TB ingest never
  * rebuild its index. */
class DedupIndexSpec extends SparkTestBase {

  private def freshPath(tag: String): String = {
    val p = java.nio.file.Files
      .createTempDirectory(s"graft_idxspec_$tag").toString
    p
  }

  test("persisted text index serves incrementalNearDups' exact answer") {
    val docs = graft.ops.Tables(spark, sfDir, "documents")
    val history = docs.filter(col("doc_id") % 5 =!= 0)
    val arrivals = docs.filter(col("doc_id") % 5 === 0)
    val p = freshPath("text")
    DedupIndex.buildText(history, "doc_id", "text", p)
    val fromIndex = DedupIndex.queryText(spark, p, arrivals, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val direct = Dedup.incrementalNearDups(history, arrivals, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(fromIndex === direct)
    assert(fromIndex.exists(_.getLong(1) > 0),
      "fixture should contain at least one near-dup match or the test is vacuous")
  }

  test("appendText is an idempotent merge and equals a from-scratch build") {
    val docs = graft.ops.Tables(spark, sfDir, "documents")
    val a = docs.filter(col("doc_id") % 5 =!= 0)
    val b = docs.filter(col("doc_id") % 10 === 0)
    val arrivals = docs.filter(col("doc_id") % 10 === 5)

    val incr = freshPath("incr")
    DedupIndex.buildText(a, "doc_id", "text", incr)
    DedupIndex.appendText(spark, incr, b, "doc_id", "text")
    // replayed batch (crash recovery / at-least-once ingest): no-op
    DedupIndex.appendText(spark, incr, b, "doc_id", "text")
    // a batch overlapping already-indexed ids: only the new ids land
    DedupIndex.appendText(spark, incr, a.unionByName(b), "doc_id", "text")

    val scratch = freshPath("scratch")
    DedupIndex.buildText(a.unionByName(b), "doc_id", "text", scratch)

    val incrBase = spark.read.parquet(s"$incr/text_base")
    val scratchBase = spark.read.parquet(s"$scratch/text_base")
    assert(incrBase.count() === scratchBase.count(), "double-append duplicated rows")
    assert(incrBase.join(scratchBase, Seq("id"), "left_anti").isEmpty)

    val fromIncr = DedupIndex.queryText(spark, incr, arrivals, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val fromScratch = DedupIndex.queryText(spark, scratch, arrivals, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(fromIncr === fromScratch)
  }

  test("persisted ANN index finds each jittered twin's original at θ=0.9") {
    val emb = graft.ops.Tables(spark, sfDir, "embeddings")
    val orig = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val twin = emb.select((col("vec_id") + (1L << 40)).as("vec_id"),
      transform(col("embedding").cast("array<double>"),
        (x, i) => x * when(i % 2 === 0, lit(1.02)).otherwise(lit(0.98)))
        .as("embedding"))
    val p = freshPath("ann")
    DedupIndex.buildEmbedding(orig, "vec_id", "embedding", p,
      tables = 8, nBits = 12, dim = 64)
    val res = DedupIndex.queryEmbedding(spark, p, twin, "vec_id", "embedding",
        threshold = 0.9, tables = 8, nBits = 12, dim = 64)
      .collect()
    assert(res.nonEmpty)
    // the ~1.1° jitter keeps cosine ≈ 0.9998: every twin must match, and
    // its best match must be its own original
    res.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) >= 1L, s"twin $id found no match")
      assert(r.getLong(2) === id - (1L << 40), s"twin $id best-matched ${r.getLong(2)}")
      assert(r.getDouble(3) > 0.999)
    }
  }

  test("compactText merges append-accumulated small files without changing answers") {
    val docs = graft.ops.Tables(spark, sfDir, "documents")
    val p = freshPath("compact")
    DedupIndex.buildText(docs.filter(col("doc_id") % 5 === 1), "doc_id", "text", p)
    // three appended batches → three extra file sets per table
    for (r <- Seq(2, 3, 4))
      DedupIndex.appendText(spark, p,
        docs.filter(col("doc_id") % 5 === r), "doc_id", "text")
    val arrivals = docs.filter(col("doc_id") % 5 === 0)
    def files(t: String) = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$p/$t")).toArray
      .map(_.toString).count(_.endsWith(".parquet"))
    val before = DedupIndex.queryText(spark, p, arrivals, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val filesBefore = files("text_buckets")
    DedupIndex.compactText(spark, p)
    val after = DedupIndex.queryText(spark, p, arrivals, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(after === before)
    assert(files("text_buckets") < filesBefore,
      s"compaction did not reduce files (${files("text_buckets")} vs $filesBefore)")
    assert(spark.read.parquet(s"$p/text_base").count() ===
      docs.filter(col("doc_id") % 5 =!= 0).count())
    // atomic-swap hygiene (ADVICE r8 #2): no temp/old layouts left behind
    val leftovers = java.nio.file.Files.list(java.nio.file.Paths.get(p))
      .toArray.map(_.toString)
      .filter(f => f.contains(".__compact") || f.contains(".__old"))
    assert(leftovers.isEmpty, leftovers.mkString(", "))
  }

  test("geometry manifest: query/append with a different geometry fails loudly") {
    // ADVICE r8 #1: a geometry mismatch used to silently probe the wrong
    // bucket keys and report false "clean" verdicts
    val docs = graft.ops.Tables(spark, sfDir, "documents").limit(50)
    val p = freshPath("geom")
    DedupIndex.buildText(docs, "doc_id", "text", p, shingleN = 2, k = 64, bands = 8)
    val e1 = intercept[IllegalArgumentException] {
      DedupIndex.queryText(spark, p, docs, "doc_id", "text",
        shingleN = 1, k = 64, bands = 8)
    }
    assert(e1.getMessage.contains("shingleN") && e1.getMessage.contains("geometry"))
    val e2 = intercept[IllegalArgumentException] {
      DedupIndex.appendText(spark, p, docs, "doc_id", "text",
        shingleN = 2, k = 32, bands = 8)
    }
    assert(e2.getMessage.contains("k: store=64 caller=32"))
    // matching geometry still works
    assert(DedupIndex.queryText(spark, p, docs, "doc_id", "text",
      shingleN = 2, k = 64, bands = 8).count() === 50)

    val emb = graft.ops.Tables(spark, sfDir, "embeddings").limit(50)
    val pe = freshPath("geomEmb")
    DedupIndex.buildEmbedding(emb, "vec_id", "embedding", pe, tables = 4, nBits = 8, dim = 64)
    val e3 = intercept[IllegalArgumentException] {
      DedupIndex.queryEmbedding(spark, pe, emb, "vec_id", "embedding", 0.9,
        tables = 8, nBits = 8, dim = 64)
    }
    assert(e3.getMessage.contains("tables: store=4 caller=8"))
  }

  test("crash inside the compaction swap window recovers at next open (ADVICE r9 #3)") {
    val docs = graft.ops.Tables(spark, sfDir, "documents").limit(60)
    val p = freshPath("swapcrash")
    DedupIndex.buildText(docs, "doc_id", "text", p)
    val arrivals = graft.ops.Tables(spark, sfDir, "documents")
      .filter(col("doc_id") % 7 === 0).limit(20)
    val before = DedupIndex.queryText(spark, p, arrivals, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    // simulate the crash between swapIn's two renames: live moved to
    // .__old, replacement never arrived
    import java.nio.file.{Files, Paths, StandardCopyOption}
    Files.move(Paths.get(s"$p/text_buckets"),
      Paths.get(s"$p/text_buckets.__old"), StandardCopyOption.ATOMIC_MOVE)
    // every open path self-heals: query restores the pre-compaction layout
    val after = DedupIndex.queryText(spark, p, arrivals, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(after === before)
    assert(Files.exists(Paths.get(s"$p/text_buckets")))
    assert(!Files.exists(Paths.get(s"$p/text_buckets.__old")))
    // append and compact also recover (crash on the other table)
    Files.move(Paths.get(s"$p/text_base"),
      Paths.get(s"$p/text_base.__old"), StandardCopyOption.ATOMIC_MOVE)
    DedupIndex.compactText(spark, p)
    assert(DedupIndex.queryText(spark, p, arrivals, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq === before)
  }

  test("legacy (pre-manifest) append verifies derivable geometry BEFORE touching the store (ADVICE r9 #4)") {
    val docs = graft.ops.Tables(spark, sfDir, "documents").limit(50)
    val p = freshPath("legacy")
    DedupIndex.buildText(docs, "doc_id", "text", p, bands = 8)
    // age the store into a legacy one: drop its manifest
    val manifest = java.nio.file.Paths.get(p).resolve("text_manifest.properties")
    java.nio.file.Files.delete(manifest)
    val rowsBefore = spark.read.parquet(s"$p/text_buckets").count()
    // a wrong-bands append on the legacy store must FAIL (bks length is
    // the derivable truth), not write mixed-geometry rows and then
    // enshrine bands=4 as the manifest
    val e = intercept[IllegalArgumentException] {
      DedupIndex.appendText(spark, p,
        graft.ops.Tables(spark, sfDir, "documents").limit(80),
        "doc_id", "text", bands = 4)
    }
    assert(e.getMessage.contains("bands=8") && e.getMessage.contains("bands=4"))
    assert(spark.read.parquet(s"$p/text_buckets").count() === rowsBefore)
    assert(!java.nio.file.Files.exists(manifest)) // nothing enshrined
    // a matching-geometry append retrofits the manifest as before
    DedupIndex.appendText(spark, p,
      graft.ops.Tables(spark, sfDir, "documents").limit(80),
      "doc_id", "text", bands = 8)
    assert(java.nio.file.Files.exists(manifest))

    // embedding side: wrong tables and wrong dim both fail pre-append
    val emb = graft.ops.Tables(spark, sfDir, "embeddings").limit(50)
    val pe = freshPath("legacyEmb")
    DedupIndex.buildEmbedding(emb, "vec_id", "embedding", pe,
      tables = 4, nBits = 8, dim = 64)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(pe).resolve("emb_manifest.properties"))
    val e2 = intercept[IllegalArgumentException] {
      DedupIndex.appendEmbedding(spark, pe, emb, "vec_id", "embedding",
        tables = 8, nBits = 8, dim = 64)
    }
    assert(e2.getMessage.contains("tables=4"))
  }

  test("streaming at-ingest loop: query-then-append per micro-batch, replay-safe") {
    // The production shape ask #1 exists for: each arriving batch is
    // matched against the standing store, then merged in — across
    // batches, later arrivals match earlier ones; a replayed batch
    // (at-least-once delivery, already indexed) self-excludes.
    import spark.implicits._
    val p = freshPath("loop")
    // seed the store with an empty corpus
    DedupIndex.buildText(Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text", p)
    val b1 = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val b2 = Seq((2L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val b3 = Seq((3L, "alpha beta gamma delta epsilon"),
      (4L, "unrelated words entirely here")).toDF("doc_id", "text")
    def step(b: org.apache.spark.sql.DataFrame) = {
      val res = DedupIndex.queryText(spark, p, b, "doc_id", "text",
          threshold = 0.9)
        .orderBy("doc_id")
        .select("doc_id", "n_matches", "best_match_id").as[(Long, Long, Long)]
        .collect().toSeq
      DedupIndex.appendText(spark, p, b, "doc_id", "text")
      res
    }
    assert(step(b1) === Seq((1L, 0L, -1L)))          // empty store: clean
    assert(step(b2) === Seq((2L, 1L, 1L)))           // matches batch-1 doc
    // MID-LOOP compaction (VERDICT r9 #5): the atomic swap happens between
    // two micro-batches — answers across it are IDENTICAL to the no-
    // compaction run (b3's assertion is the same either way)
    DedupIndex.compactText(spark, p)
    assert(step(b3) === Seq((3L, 2L, 1L), (4L, 0L, -1L))) // matches both
    // replay batch 2: already indexed — append is a no-op and the query
    // self-excludes, so doc 2 reports its true duplicates (1 and 3)
    assert(step(b2) === Seq((2L, 2L, 1L)))
    assert(spark.read.parquet(s"$p/text_base").count() === 4)
  }

  test("persisted PQ store serves pqTopK's exact answer (codebook round-trips bit-exactly)") {
    val emb = graft.ops.Tables(spark, sfDir, "embeddings")
    val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val p = freshPath("pq")
    DedupIndex.buildPq(corpus, "id", "vec", p, m = 8, ksub = 16, dim = 64)
    val fromStore = DedupIndex.queryPqTopK(spark, p, queries, k = 3)
      .orderBy("q_id", "rank").collect().toSeq
    val direct = Similarity.pqTopK(corpus, queries, k = 3, m = 8, ksub = 16, dim = 64)
      .orderBy("q_id", "rank").collect().toSeq
    assert(fromStore === direct) // includes the raw ADC doubles — bit-exact
    assert(fromStore.nonEmpty)
  }

  test("appendEmbedding is idempotent and the appended batch becomes findable") {
    val emb = graft.ops.Tables(spark, sfDir, "embeddings")
    val orig = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val half1 = orig.filter(col("vec_id") % 2 === 0)
    val half2 = orig.filter(col("vec_id") % 2 =!= 0)
    val p = freshPath("annapp")
    DedupIndex.buildEmbedding(half1, "vec_id", "embedding", p, 8, 12, 64)
    DedupIndex.appendEmbedding(spark, p, half2, "vec_id", "embedding", 8, 12, 64)
    DedupIndex.appendEmbedding(spark, p, half2, "vec_id", "embedding", 8, 12, 64)
    assert(spark.read.parquet(s"$p/emb_vectors").count() === orig.count())
    // a twin of an odd (appended) vector must now match it
    val probe = half2.limit(1)
      .select((col("vec_id") + (1L << 40)).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x * when(i % 2 === 0, lit(1.02)).otherwise(lit(0.98)))
          .as("embedding"))
    val r = DedupIndex.queryEmbedding(spark, p, probe, "vec_id", "embedding",
      0.9, 8, 12, 64).head()
    assert(r.getLong(1) >= 1L && r.getLong(2) === r.getLong(0) - (1L << 40))
  }
}
