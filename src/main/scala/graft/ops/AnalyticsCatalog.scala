package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.analytics.{Dedup, DedupIndex, GraphAlgorithms, Similarity, TextAnalysis}
import graft.graph.GraphIngest
import graft.multimodal.Multimodal
import graft.streaming.EventWindows
import QueryCatalog.Entry

/** Catalog part 2: graph operators (over the documents-derived
  * Article/Publisher graph), text analysis, dedup, similarity search,
  * windowed event aggregation (batch-equivalent of the streaming plans),
  * and multimodal binary plumbing. Same determinism policy as
  * [[QueryCatalog]].
  */
object AnalyticsCatalog {

  /** One document-graph per fixture dir, ingested once and round-tripped
    * through [[graft.graph.GraphStore]]: every graph-backed query reads the
    * PERSISTED layout — nodes partitioned by label, edges by relType — so
    * label scans and typed pattern matches prune partitions exactly as they
    * would against the production store (asserted in PlanSpec). This also
    * replaces the old never-unpersisted in-memory cache: the parquet store
    * is the materialization. */
  private val graphCache =
    new java.util.concurrent.ConcurrentHashMap[String, graft.graph.PropertyGraph]()
  private def docGraph(s: org.apache.spark.sql.SparkSession, dir: String): graft.graph.PropertyGraph =
    graphCache.computeIfAbsent(dir, d => {
      val store = System.getProperty("java.io.tmpdir") +
        "/graft_docgraph_" + d.replaceAll("[^A-Za-z0-9]", "_")
      val g = GraphIngest.fromDocuments(Tables(s, d, "documents"))
      graft.graph.GraphStore.write(g, store)
      graft.graph.GraphStore.read(s, store)
    })

  /** The rehearsal derivation's replica stride (ScaleRehearsal shifts each
    * documents replica by k·1e6): doc_ids are CONTIGUOUS 0..n−1 at the gate
    * fixtures but STRIPED (k·1e6 + 0..per−1) at the derived sf1/sf10 dirs.
    * doc_id-arithmetic graph fixtures must therefore compute neighbors and
    * existence WITHIN the stripe — naive `(doc_id+k) % n` / `doc_id+k < n`
    * silently leaves every non-base replica edge-free at rehearsal (found
    * by gds.kcore's loud non-convergence cap in the round-10 GDS rehearsal)
    * and a "100×" timing then measures a mostly-edgeless graph. With one
    * stripe (the gate) these forms reduce EXACTLY to the naive ones, so
    * oracle hashes are untouched. */
  private val RehearsalStride = 1000000L

  /** Fan a small unsplittable scan out to the session's parallelism
    * BEFORE per-row-heavy compute (round 16, guide §2.5 "input skew: one
    * huge unsplittable file … repartition immediately after the read"):
    * the gate fixtures are single parquet files with one row group, so
    * without this every shingle-hash/n-gram-explode stage runs in ONE
    * task while 31 cores idle — d03's md5 pass and t24/t26/d16's gram
    * explosions were single-task for their whole 2–4 s. Hash-partitioned
    * on `key` (deterministic; no round-robin and therefore none of the
    * sort-before-repartition cost), and a NO-OP whenever the scan
    * already carries at least the session's parallelism — the cluster
    * case, where a 100 TB scan has thousands of splits and an extra
    * exchange of raw text would be pure waste. Results are unaffected:
    * only the partitioning of a pre-aggregation/pre-join stage moves. */
  private def fanOut(df: org.apache.spark.sql.DataFrame,
      s: org.apache.spark.sql.SparkSession, key: String)
      : org.apache.spark.sql.DataFrame = {
    val par = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par, col(key)) else df
  }
  /** (stripe base, position, per-stripe size) for doc_id fixture math.
    *
    * ADVICE r10 #5: when the id range spans more than one stride the
    * striping is VERIFIED, not assumed — every inferred stripe must hold
    * exactly `n / stripes` contiguous positions starting at 0, the shape
    * the rehearsal derivation (ScaleRehearsal's k·1e6 shifts) produces. A
    * gate fixture that merely has ≥1e6 CONTIGUOUS doc_ids would otherwise
    * be silently misread as multiple stripes, changing c61/c66/c67's graph
    * construction under an unchanged oracle — that mismatch now fails
    * loudly here instead of at the hash gate. */
  /** (doc_id, rk) with rk the dense 0-based rank of doc_id — computed
    * via a distributed sort + zipWithIndex (the s13 move, VERDICT r14
    * #3): ranks are derivation-proof (contiguous on ANY id
    * distribution, striped or not) where modular doc_id arithmetic
    * degenerates under the rehearsal's shifted ids. The oracle replays
    * the same ranks as `row_number() OVER (ORDER BY doc_id) - 1`. */
  private def docRanks(s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    s.createDataFrame(
      docs.select(col("doc_id")).orderBy("doc_id")
        .rdd.map(_.getLong(0)).zipWithIndex())
      .toDF("doc_id", "rk")

  private def stripeParts(docs: org.apache.spark.sql.DataFrame, n: Long)
      : (org.apache.spark.sql.Column, org.apache.spark.sql.Column, Long) = {
    val base = col("doc_id") - col("doc_id") % RehearsalStride
    val pos = col("doc_id") % RehearsalStride
    val perStripe = docs.groupBy(base.as("b"))
      .agg(count(lit(1)).as("c"), min(pos).as("lo"), max(pos).as("hi"))
      // bounded: one row per RehearsalStride stripe, never per doc
      .collect()
    val stripes = math.max(1L, perStripe.length.toLong)
    if (stripes > 1L) {
      val per = n / stripes
      val bad = perStripe.filter(r =>
        r.getLong(1) != per || r.getLong(2) != 0L || r.getLong(3) != per - 1)
      require(bad.isEmpty,
        s"doc_id range spans $stripes stride blocks but is NOT the " +
          s"rehearsal striping (expected $per contiguous positions 0..${per - 1} " +
          "per stripe; offending stripe bases: " +
          bad.map(_.getLong(0)).sorted.take(3).mkString(", ") +
          ") — refusing to re-stripe a contiguous fixture silently")
    }
    (base, pos, n / stripes)
  }

  /** Materialize the shared document graph (runs the ingest and writes the
    * store). Bench calls this before timing so graph queries measure query
    * cost against a populated store — the reference's analytics likewise
    * run against an already-loaded Neo4j; upsert cost itself is what i03
    * measures. */
  def warmGraph(s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val g = docGraph(s, dir)
    g.nodes.count(); g.edges.count()
  }

  // ---------------------------------------------------------------- graph --

  /** Shared oracle for the indexed top-k surface: c68 (build-once)
    * and s13 (streamed micro-batches through the live-index patch
    * path) converge to the SAME index state over the same corpus, so
    * one replay prices both — the hash match on s13 PROVES the
    * incremental path lands byte-identically to the one-shot build. */
  private val vectorIndexTopkOracleSql: String =
    """WITH v AS (
           |  SELECT vec_id,
           |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dvec,
           |    sqrt(list_reduce(list_transform(embedding,
           |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
           |      (a,b) -> a + b)) AS nrm
           |  FROM embeddings),
           |planes AS (
           |  SELECT t.t, i.i,
           |    list_transform(range(0, 64), j ->
           |      CAST(CAST('0x' || substr(md5(t.t || ':' || i.i || ':' || j),
           |        1, 15) AS BIGINT) AS DOUBLE) / 576460752303423488 - 1) AS w
           |  FROM range(0, 8) t(t), range(0, 12) i(i)),
           |bits AS (
           |  SELECT v.vec_id, p.t,
           |    CAST(SUM(CASE WHEN list_reduce(list_transform(
           |        list_zip(p.w, v.dvec),
           |        x -> x[1] * x[2]), (a,b) -> a + b) >= 0
           |      THEN 1 << p.i ELSE 0 END) AS BIGINT) AS bucket
           |  FROM v, planes p GROUP BY v.vec_id, p.t),
           |q AS (SELECT * FROM (VALUES (0), (7), (42), (99), (123),
           |  (250), (381), (499)) AS t(qid)),
           |cand AS (
           |  SELECT DISTINCT q.qid, b2.vec_id
           |  FROM q
           |  JOIN bits b1 ON b1.vec_id = q.qid
           |  JOIN bits b2 ON b2.t = b1.t AND b2.bucket = b1.bucket),
           |scored AS (
           |  SELECT c.qid, c.vec_id,
           |    (1.0 + list_reduce(list_transform(list_zip(x.dvec, y.dvec),
           |      p -> p[1] * p[2]), (a,b) -> a + b) / (x.nrm * y.nrm)) / 2.0
           |      AS score
           |  FROM cand c
           |  JOIN v x ON x.vec_id = c.qid
           |  JOIN v y ON y.vec_id = c.vec_id),
           |top AS (
           |  SELECT qid, vec_id, score,
           |    row_number() OVER (PARTITION BY qid
           |      ORDER BY score DESC, vec_id) AS rn
           |  FROM scored)
           |SELECT CAST(qid AS BIGINT) AS qid, vec_id AS hit, score
           |FROM top WHERE rn <= 10
           |ORDER BY qid, score DESC, hit""".stripMargin

  private val g01 = Entry("g01_graph_label_scan",
    (s, dir) => {
      val g = docGraph(s, dir)
      g.matchLabel("Article")
        .select(col("key"),
          col("props").getItem("title").as("title"),
          col("props").getItem("lang").as("lang"))
        .orderBy("key").limit(25)
    },
    Some("""SELECT CAST(doc_id AS VARCHAR) AS key, substring(text, 1, 30) AS title, lang
           |FROM documents ORDER BY key LIMIT 25""".stripMargin))

  private val g02 = Entry("g02_graph_merge_idempotent",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val batch = GraphIngest.articleNodes(docs)
        .unionByName(GraphIngest.publisherNodes(docs))
      // MERGE twice: second merge must match, not create (Q1 semantics)
      val g = GraphIngest.fromDocuments(docs).mergeNodes(batch)
      g.nodes.groupBy("label").agg(count(lit(1)).as("n_nodes")).orderBy("label")
    },
    Some("""SELECT 'Article' AS label, COUNT(DISTINCT doc_id) AS n_nodes FROM documents
           |UNION ALL
           |SELECT 'Publisher' AS label, COUNT(DISTINCT source) AS n_nodes FROM documents
           |ORDER BY label""".stripMargin))

  private val g03 = Entry("g03_graph_one_hop",
    (s, dir) => {
      val g = docGraph(s, dir)
      g.oneHop("Article", "WRITTEN_BY", "Publisher")
        .groupBy(col("dst_key").as("publisher"))
        .agg(count(lit(1)).as("n_articles"))
        .orderBy("publisher")
    },
    Some("""SELECT source AS publisher, COUNT(*) AS n_articles
           |FROM documents GROUP BY source ORDER BY publisher""".stripMargin))

  private val g04 = Entry("g04_graph_two_hop",
    (s, dir) => {
      // Count-only sibling aggregate → degree identity (VERDICT r8 #1):
      // the per-publisher pair count is (S1²−S2)/2 over the degree
      // distribution — one linear edge aggregation, hash-identical to
      // grouping the Σdeg² enumeration this entry ran through round 8
      // (15.65 s at sf10; the identity is milliseconds). The enumeration
      // exemplar lives on in g06's bounded top-k pair listing.
      val g = docGraph(s, dir)
      g.siblingPairCounts("Article", "WRITTEN_BY", "Publisher")
        .select(col("b_key").as("publisher"), col("n_pairs"))
        .orderBy("publisher")
    },
    Some("""SELECT d1.source AS publisher, COUNT(*) AS n_pairs
           |FROM documents d1 JOIN documents d2
           |  ON d1.source = d2.source
           | AND CAST(d1.doc_id AS VARCHAR) < CAST(d2.doc_id AS VARCHAR)
           |GROUP BY d1.source ORDER BY publisher""".stripMargin))

  private val g05 = Entry("g05_graph_two_hop_anchored",
    (s, dir) => {
      // Anchored count-only sibling aggregate → degree identity (VERDICT
      // r8 #1). Through round 8 this anchored the Σdeg² enumeration on
      // src10 and still materialized C(25k, 2) ≈ 312M pair rows at sf10
      // (19.3 s) to answer a COUNT — the degree identity computes the same
      // count from src10's edge list alone, with the (label, key) anchor
      // broadcast INTO the edge scan (PlanSpec: no pair join anywhere in
      // the count path).
      val g = docGraph(s, dir)
      g.siblingPairCounts("Article", "WRITTEN_BY", "Publisher", Some("src10"))
        .select(col("b_key").as("publisher"), col("n_pairs"))
        .orderBy("publisher")
    },
    Some("""SELECT d1.source AS publisher, COUNT(*) AS n_pairs
           |FROM documents d1 JOIN documents d2
           |  ON d1.source = d2.source
           | AND CAST(d1.doc_id AS VARCHAR) < CAST(d2.doc_id AS VARCHAR)
           |WHERE d1.source = 'src10'
           |GROUP BY d1.source ORDER BY publisher""".stripMargin))

  private val g06 = Entry("g06_graph_sibling_pairs_topk",
    (s, dir) => {
      // The honest pair-LISTING exemplar next to g04/g05's degree-identity
      // counts (VERDICT r8 #1): when the user wants pair rows, bound FIRST.
      // Top-k pairs under (a_key, c_key) order only ever touch the anchor's
      // k+1 smallest neighbor keys, so the plan prunes each anchor's
      // neighbor list with one window top-k BEFORE the self-join —
      // enumeration cost C(k+1, 2) per anchor, never C(deg, 2).
      val g = docGraph(s, dir)
      g.siblingPairsTopK("Article", "WRITTEN_BY", "Publisher", "src10", 10)
        .select(col("b_key").as("publisher"), col("a_key"), col("c_key"))
    },
    Some("""SELECT d1.source AS publisher,
           |       CAST(d1.doc_id AS VARCHAR) AS a_key,
           |       CAST(d2.doc_id AS VARCHAR) AS c_key
           |FROM documents d1 JOIN documents d2
           |  ON d1.source = d2.source
           | AND CAST(d1.doc_id AS VARCHAR) < CAST(d2.doc_id AS VARCHAR)
           |WHERE d1.source = 'src10'
           |ORDER BY publisher, a_key, c_key LIMIT 10""".stripMargin))

  // -------------------------------------------------------- text analysis --

  private val t01 = Entry("t01_token_stats",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      docs.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).as("n_chars_measured"),
        TextAnalysis.avgTokenLen(col("text")).as("avg_token_len"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
           |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_tokens,
           |  CAST(length(text) AS INT) AS n_chars_measured,
           |  CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
           |    / len(regexp_split_to_array(trim(text), '\s+')) AS avg_token_len
           |FROM documents ORDER BY doc_id""".stripMargin))

  private val t02 = Entry("t02_quality_score",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      docs.select(col("doc_id"),
        TextAnalysis.dictHits(TextAnalysis.tokens(col("text")), TextAnalysis.enStopwords).as("stop_hits"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS toks,
           |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
           |      x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS stop_hits,
           |    len(regexp_extract_all(text, '[.,!?;:]')) AS punct
           |  FROM documents)
           |SELECT doc_id, CAST(stop_hits AS INT) AS stop_hits,
           |  0.5 * (CAST(stop_hits AS DOUBLE) / len(toks))
           |  + 0.3 * least(CAST(len(toks) AS DOUBLE) / 200.0, 1.0)
           |  + 0.2 * (1.0 - least(CAST(punct AS DOUBLE) / greatest(length(text), 1) * 10.0, 1.0))
           |  AS quality
           |FROM t ORDER BY doc_id""".stripMargin))

  private val t03 = Entry("t03_lang_guess",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      docs.select(col("doc_id"), col("lang"),
        TextAnalysis.langGuess(col("text")).as("guess"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
           |h AS (
           |  SELECT doc_id, lang,
           |    len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS en,
           |    len(list_filter(toks, x -> list_contains(['el','la','los','de','que','y'], x))) AS es,
           |    len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ein'], x))) AS de,
           |    len(list_filter(toks, x -> list_contains(['le','les','des','et','est','une'], x))) AS fr
           |  FROM t)
           |SELECT doc_id, lang,
           |  CASE WHEN en >= es AND en >= de AND en >= fr THEN 'en'
           |       WHEN es >= de AND es >= fr THEN 'es'
           |       WHEN de >= fr THEN 'de'
           |       ELSE 'fr' END AS guess
           |FROM h ORDER BY doc_id""".stripMargin))

  private val t04 = Entry("t04_fingerprint",
    (s, dir) => {
      Tables(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
           |  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
           |FROM documents ORDER BY doc_id""".stripMargin))

  private val t06 = Entry("t06_pii_scrub",
    (s, dir) => {
      // PII redaction over the corpus — emails/URLs/long digit runs to
      // typed placeholders; fingerprint of the scrubbed text proves the
      // transform byte-identically against the oracle without shipping the
      // full scrubbed body through the hash compare.
      val docs = Tables(s, dir, "documents")
      val scrubbed = TextAnalysis.redactPII(col("text"))
      docs.select(col("doc_id"),
        md5(scrubbed).as("scrubbed_md5"),
        (length(col("text")) - length(scrubbed)).as("chars_removed"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
           |  md5(regexp_replace(regexp_replace(regexp_replace(text,
           |    'https?://[^\s]+', '<URL>', 'g'),
           |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           |    '[0-9][0-9 ()+.-]{7,}[0-9]', '<NUMBER>', 'g')) AS scrubbed_md5,
           |  CAST(length(text) - length(regexp_replace(regexp_replace(regexp_replace(text,
           |    'https?://[^\s]+', '<URL>', 'g'),
           |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           |    '[0-9][0-9 ()+.-]{7,}[0-9]', '<NUMBER>', 'g')) AS INT) AS chars_removed
           |FROM documents ORDER BY doc_id""".stripMargin))

  // ---------------------------------------------------------------- dedup --

  private val d01 = Entry("d01_exact_dedup_stats",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      docs.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(Dedup.contentHash(col("text"))).as("n_uniq"))
        .withColumn("n_dups", col("n_docs") - col("n_uniq"))
        .orderBy("lang")
    },
    Some("""SELECT lang, COUNT(*) AS n_docs,
           |  COUNT(DISTINCT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))) AS n_uniq,
           |  COUNT(*) - COUNT(DISTINCT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))) AS n_dups
           |FROM documents GROUP BY lang ORDER BY lang""".stripMargin))

  private val d02 = Entry("d02_approx_distinct",
    (s, dir) => {
      // HLL sketch vs exact. The raw estimate is engine-specific (DuckDB's
      // HLL differs from Spark's), but Spark's HLL is a deterministic,
      // order-independent function of the input set — so the *error bound*
      // is a stable, hashable fact: |approx - exact| <= 20% of exact (rsd
      // is 0.05; 20% is 4 sigma of slack). The oracle asserts the bound as
      // a constant TRUE and hash-matches the exact count, keeping the
      // sketch in the checked path without chasing cross-engine registers.
      Tables(s, dir, "documents").groupBy("lang")
        .agg(approx_count_distinct(col("text"), 0.05).as("approx_uniq"),
          countDistinct(col("text")).as("exact_uniq"))
        .select(col("lang"), col("exact_uniq"),
          (abs(col("approx_uniq") - col("exact_uniq")) <=
            col("exact_uniq") * 0.2).as("approx_within_20pct"))
        .orderBy("lang")
    },
    Some("""SELECT lang, COUNT(DISTINCT text) AS exact_uniq,
           |  TRUE AS approx_within_20pct
           |FROM documents GROUP BY lang ORDER BY lang""".stripMargin))

  private val d03 = Entry("d03_minhash_lsh_pairs",
    (s, dir) => {
      // MinHash+LSH near-dup pairs in the PORTABLE hash family (md5-60
      // base + affine mixes mod a 30-bit prime): the full banded pipeline
      // — shingle → signature → band bucket → bucket equi-join → exact
      // Jaccard verify — reproduced statement-for-statement by the DuckDB
      // oracle, so the LSH pair set itself is hash-checked cross-engine
      // (the xxhash64 family variant stays in Dedup for raw speed;
      // recall equivalence asserted in DedupSpec).
      Dedup.nearDupPairsMinhashPortable(
          fanOut(Tables(s, dir, "documents"), s, "doc_id"),
          "doc_id", "text", shingleN = 1, k = 64, bands = 8, threshold = 0.9)
        .orderBy("id_a", "id_b")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, list_sort(list_distinct(list_transform(
           |    list_distinct(regexp_split_to_array(trim(text), '\s+')),
           |    s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % 1073741789))) AS sh
           |  FROM documents),
           |sig AS (
           |  SELECT t.doc_id, r.i,
           |    list_aggregate(list_transform(t.sh,
           |      x -> ((48271 * (r.i + 1)) % 1073741789 * x
           |            + (16807 * r.i + 12345) % 1073741789) % 1073741789),
           |      'min') AS mv
           |  FROM t, range(0, 64) r(i)),
           |bk AS (
           |  SELECT doc_id, CAST('0x' || substr(md5(
           |      CAST(i // 8 AS VARCHAR) || ':' ||
           |      string_agg(CAST(mv AS VARCHAR), ':' ORDER BY i)
           |    ), 1, 15) AS BIGINT) AS bucket
           |  FROM sig GROUP BY doc_id, i // 8),
           |cand AS (
           |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id)
           |SELECT c.id_a, c.id_b,
           |  CAST(len(list_intersect(ta.sh, tb.sh)) AS DOUBLE)
           |    / len(list_distinct(list_concat(ta.sh, tb.sh))) AS jaccard
           |FROM cand c
           |JOIN t ta ON ta.doc_id = c.id_a
           |JOIN t tb ON tb.doc_id = c.id_b
           |WHERE CAST(len(list_intersect(ta.sh, tb.sh)) AS DOUBLE)
           |    / len(list_distinct(list_concat(ta.sh, tb.sh))) >= 0.9
           |ORDER BY id_a, id_b""".stripMargin))

  private val d04 = Entry("d04_jaccard_pairs",
    (s, dir) => {
      Dedup.nearDupPairsExact(fanOut(Tables(s, dir, "documents"), s, "doc_id"),
          "doc_id", "text", blockCol = "source", shingleN = 1, threshold = 0.9)
        .orderBy("id_a", "id_b")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, source,
           |    list_distinct(regexp_split_to_array(trim(text), '\s+')) AS sh
           |  FROM documents)
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           |    / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
           |FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
           |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           |    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.9
           |ORDER BY id_a, id_b""".stripMargin))

  private val d11 = Entry("d11_dup_cluster_histogram",
    (s, dir) => {
      // Duplicate-depth profile — the dedup telemetry table: how many
      // content clusters have exactly k copies, and how many documents
      // that accounts for. The fixture corpus is dup-free, so the
      // re-crawl is simulated: every 10th doc arrives twice and every
      // 20th three times, with whitespace mangled — the canonical
      // content hash must see through that (normText), which is the
      // point. Two hash aggregates on uniform keys; the histogram
      // decides whether a corpus needs cluster-level dedup (d08) or
      // exact is enough.
      val docs = Tables(s, dir, "documents")
      val second = docs.filter(col("doc_id") % 10 === 0)
        .withColumn("text", concat(lit("  "), col("text"), lit(" ")))
      val third = docs.filter(col("doc_id") % 20 === 0)
        .withColumn("text", regexp_replace(col("text"), " ", "   "))
      docs.unionByName(second).unionByName(third)
        .groupBy(Dedup.contentHash(col("text")).as("h"))
        .agg(count(lit(1)).as("k"))
        .groupBy("k")
        .agg(count(lit(1)).as("n_clusters"),
          (col("k") * count(lit(1))).as("n_docs"))
        .orderBy("k")
    },
    Some("""WITH crawl AS (
           |  SELECT text FROM documents
           |  UNION ALL SELECT text FROM documents WHERE doc_id % 10 = 0
           |  UNION ALL SELECT text FROM documents WHERE doc_id % 20 = 0),
           |c AS (
           |  SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h,
           |    COUNT(*) AS k
           |  FROM crawl GROUP BY 1)
           |SELECT k, COUNT(*) AS n_clusters,
           |  CAST(k * COUNT(*) AS BIGINT) AS n_docs
           |FROM c GROUP BY k ORDER BY k""".stripMargin))

  private val d18 = Entry("d18_semantic_dedup_lsh",
    (s, dir) => {
      // d12's documented 100 TB swap-in, itself gate-verified: the pair
      // source is the PORTABLE-plane LSH (d15's operator — bucket
      // equi-joins, no tiled n²), and the cluster/survivor stages are
      // unchanged. Since the portable planes made the LSH pair set
      // deterministic, the whole approximate SemDeDup pipeline — pairs →
      // transitive closure → min-id survivors → per-label pruning
      // summary — now hash-matches the oracle (d15's CTEs composed with
      // d12's recursive closure). Missed-recall pairs simply yield more
      // surviving clusters on BOTH sides identically; approximation
      // changes the answer, not the verifiability. Measured honestly: at
      // the fixture's moderate θ=0.4 the 4-bit buckets stay dense and
      // this costs about the same as d12's exact tiling (the d06
      // docstring's point — LSH pays at HIGH thresholds, where more bits
      // per table shrink buckets); the gate value here is verifying the
      // composition, the perf value arrives with production thresholds.
      val emb = Tables(s, dir, "embeddings")
      Dedup.semanticDedup(emb, "vec_id", "embedding", threshold = 0.4,
          pairSource = Dedup.LshPairs(tables = 8, nBits = 4, dim = 64))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("is_survivor"), 1L).otherwise(0L)).as("n_kept"),
          countDistinct(when(not(col("is_survivor")), col("component")))
            .as("n_pruned_clusters"))
        .orderBy("label")
    },
    Some("""WITH RECURSIVE v AS (
           |  SELECT vec_id, embedding,
           |    sqrt(list_reduce(list_transform(embedding,
           |      x -> CAST(x AS DOUBLE) * x), (p,q) -> p + q)) AS nrm
           |  FROM embeddings),
           |planes AS (
           |  SELECT t.t, i.i,
           |    list_transform(range(0, 64), j ->
           |      CAST(CAST('0x' || substr(md5(t.t || ':' || i.i || ':' || j),
           |        1, 15) AS BIGINT) AS DOUBLE) / 576460752303423488 - 1) AS w
           |  FROM range(0, 8) t(t), range(0, 4) i(i)),
           |bits AS (
           |  SELECT v.vec_id, p.t,
           |    CAST(SUM(CASE WHEN list_reduce(list_transform(
           |        list_zip(p.w, v.embedding),
           |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)),
           |        (a,b) -> a + b) >= 0
           |      THEN 1 << p.i ELSE 0 END) AS BIGINT) AS bucket
           |  FROM v, planes p GROUP BY v.vec_id, p.t),
           |cand AS (
           |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
           |  FROM bits a JOIN bits b
           |    ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
           |pairs AS (
           |  SELECT c.id_a, c.id_b FROM cand c
           |  JOIN v x ON c.id_a = x.vec_id
           |  JOIN v y ON c.id_b = y.vec_id
           |  WHERE list_reduce(list_transform(list_zip(x.embedding, y.embedding),
           |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
           |      (a,b) -> a + b) / (x.nrm * y.nrm) >= 0.4),
           |sym AS (
           |  SELECT id_a AS a, id_b AS b FROM pairs
           |  UNION SELECT id_b, id_a FROM pairs),
           |reach AS (
           |  SELECT a, b FROM sym
           |  UNION
           |  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
           |comp AS (
           |  SELECT e.vec_id, e.label,
           |    LEAST(e.vec_id, COALESCE(MIN(r.b), e.vec_id)) AS component
           |  FROM embeddings e LEFT JOIN reach r ON r.a = e.vec_id
           |  GROUP BY e.vec_id, e.label)
           |SELECT label, COUNT(*) AS n_vecs,
           |  CAST(SUM(CASE WHEN vec_id = component THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_kept,
           |  COUNT(DISTINCT CASE WHEN vec_id <> component THEN component END)
           |    AS n_pruned_clusters
           |FROM comp GROUP BY label ORDER BY label""".stripMargin))

  private val d12 = Entry("d12_semantic_dedup",
    (s, dir) => {
      // SemDeDup (semantic dedup over embeddings): near-dup pairs in
      // embedding space (exact cosine >= θ via the tiled pair join, no
      // CartesianProduct), transitive clusters by min-label propagation,
      // one survivor per cluster (min id), pruning summarized per label —
      // the embedding-space twin of d08's text-cluster dedup, and the
      // third member of the dedup ladder (exact d01 → fuzzy-text d03/d08
      // → semantic d12). At 100 TB the pair source swaps for
      // [[Similarity.embeddingNearDupPairsLSH]] (recall-spec'd vs this
      // exact form); cluster and survivor stages are unchanged.
      val emb = Tables(s, dir, "embeddings")
      Dedup.semanticDedup(emb, "vec_id", "embedding", threshold = 0.4,
          pairSource = Dedup.ExactPairs)
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("is_survivor"), 1L).otherwise(0L)).as("n_kept"),
          countDistinct(when(not(col("is_survivor")), col("component")))
            .as("n_pruned_clusters"))
        .orderBy("label")
    },
    Some("""WITH RECURSIVE v AS (
           |  SELECT vec_id, embedding,
           |    sqrt(list_reduce(list_transform(embedding,
           |      x -> CAST(x AS DOUBLE) * x), (p,q) -> p + q)) AS nrm
           |  FROM embeddings),
           |pairs AS (
           |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
           |  FROM v a JOIN v b ON a.vec_id < b.vec_id
           |  WHERE list_reduce(list_transform(list_zip(a.embedding, b.embedding),
           |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p,q) -> p + q)
           |    / (a.nrm * b.nrm) >= 0.4),
           |sym AS (
           |  SELECT id_a AS a, id_b AS b FROM pairs
           |  UNION SELECT id_b, id_a FROM pairs),
           |reach AS (
           |  SELECT a, b FROM sym
           |  UNION
           |  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
           |comp AS (
           |  SELECT e.vec_id, e.label,
           |    LEAST(e.vec_id, COALESCE(MIN(r.b), e.vec_id)) AS component
           |  FROM embeddings e LEFT JOIN reach r ON r.a = e.vec_id
           |  GROUP BY e.vec_id, e.label)
           |SELECT label, COUNT(*) AS n_vecs,
           |  CAST(SUM(CASE WHEN vec_id = component THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_kept,
           |  COUNT(DISTINCT CASE WHEN vec_id <> component THEN component END)
           |    AS n_pruned_clusters
           |FROM comp GROUP BY label ORDER BY label""".stripMargin))

  private val d05 = Entry("d05_simhash_pairs",
    (s, dir) => {
      // SimHash near-dups in the PORTABLE hash family: 48-bit packed
      // vote signatures over md5-60 token hashes, blocked Hamming join —
      // the oracle rebuilds identical signatures with md5 + bit
      // arithmetic, so the pair set hash-checks cross-engine (the
      // xxhash64 SimHash64 variant stays in Dedup; DedupSpec asserts
      // both track exact Jaccard).
      Dedup.nearDupPairsSimhashPortable(
          fanOut(Tables(s, dir, "documents"), s, "doc_id"),
          "doc_id", "text", blockCol = "source", bits = 48, maxHamming = 16)
        .orderBy("id_a", "id_b")
    },
    Some("""WITH tok AS (
           |  SELECT doc_id, source,
           |    unnest(regexp_split_to_array(trim(text), '\s+')) AS w
           |  FROM documents),
           |tv AS (
           |  SELECT doc_id, source,
           |    CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS v
           |  FROM tok),
           |bitv AS (
           |  SELECT doc_id, source, r.b,
           |    CASE WHEN SUM(CASE WHEN ((v >> r.b) & 1) = 1 THEN 1 ELSE -1 END) >= 0
           |      THEN CAST(1 AS BIGINT) << r.b ELSE 0 END AS bitval
           |  FROM tv, range(0, 48) r(b) GROUP BY doc_id, source, r.b),
           |sg AS (
           |  SELECT doc_id, source, CAST(SUM(bitval) AS BIGINT) AS sig
           |  FROM bitv GROUP BY doc_id, source)
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
           |FROM sg a JOIN sg b ON a.source = b.source AND a.doc_id < b.doc_id
           |WHERE bit_count(xor(a.sig, b.sig)) <= 16
           |ORDER BY id_a, id_b""".stripMargin))

  private val d06 = Entry("d06_embedding_near_dup",
    (s, dir) => {
      // Exact near-dup pairs over the FULL corpus via the blocked pair
      // equi-join (matrix tiling — no CartesianProduct in the plan, asserted
      // in PlanSpec; work spreads over blocks²/2 shuffle keys).
      Similarity.embeddingNearDupPairs(
          Tables(s, dir, "embeddings"),
          "vec_id", "embedding", threshold = 0.4)
        .orderBy("id_a", "id_b")
    },
    Some("""WITH v AS (
           |  SELECT vec_id, embedding,
           |    sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * x),
           |         (p,q) -> p + q)) AS nrm
           |  FROM embeddings)
           |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           |  list_reduce(list_transform(list_zip(a.embedding, b.embedding),
           |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p,q) -> p + q)
           |    / (a.nrm * b.nrm) AS cosine
           |FROM v a JOIN v b ON a.vec_id < b.vec_id
           |WHERE list_reduce(list_transform(list_zip(a.embedding, b.embedding),
           |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p,q) -> p + q)
           |    / (a.nrm * b.nrm) >= 0.4
           |ORDER BY id_a, id_b""".stripMargin))

  private val d07 = Entry("d07_hll_sketch_union",
    (s, dir) => {
      // Mergeable HLL sketches (Apache DataSketches): per-source sketch,
      // global estimate from sketch UNION only — the roll-up never re-reads
      // raw data. Raw estimates are sketch-impl specific, but the sketch is
      // a deterministic, order-independent function of the input SET (HLL
      // registers are maxes over hash values), so the error bound vs the
      // exact count is a stable, hashable fact — same promotion trick as
      // d02: hash the exact counts, assert the bound as constant TRUE.
      val docs = Tables(s, dir, "documents")
      val sketches = Dedup.hllPerGroup(docs, "source", "text")
      val perGroup = sketches
        .join(docs.groupBy("source")
          .agg(countDistinct(col("text")).as("exact_uniq")), Seq("source"))
        .select(col("source"), col("exact_uniq"),
          (abs(col("estimate") - col("exact_uniq")) <=
            col("exact_uniq") * 0.2).as("sketch_within_20pct"))
      val merged = Dedup.hllMergedEstimate(sketches)
        .crossJoin(docs.agg(countDistinct(col("text")).as("exact_uniq")))
        .select(lit("__ALL__").as("source"), col("exact_uniq"),
          (abs(col("merged_estimate") - col("exact_uniq")) <=
            col("exact_uniq") * 0.2).as("sketch_within_20pct"))
      perGroup.unionByName(merged).orderBy("source")
    },
    Some("""SELECT source, COUNT(DISTINCT text) AS exact_uniq,
           |  TRUE AS sketch_within_20pct
           |FROM documents GROUP BY source
           |UNION ALL
           |SELECT '__ALL__', COUNT(DISTINCT text), TRUE FROM documents
           |ORDER BY source""".stripMargin))

  private val d08 = Entry("d08_neardup_cluster_dedup",
    (s, dir) => {
      // Pairs → transitive clusters → one survivor per cluster (min id):
      // the dedup decision a pipeline actually ships. Components via
      // DataFrame min-label propagation; the oracle recomputes the
      // transitive closure with a recursive CTE from the same exact-Jaccard
      // pair set, independently.
      val docs = Tables(s, dir, "documents")
      val pairs = Dedup.nearDupPairsExact(docs, "doc_id", "text",
        blockCol = "source", shingleN = 1, threshold = 0.9)
      Dedup.clusterSurvivors(docs, "doc_id", pairs.select("id_a", "id_b"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("is_survivor"), 1)).as("n_kept"))
        .orderBy("lang")
    },
    Some("""WITH RECURSIVE t AS (
           |  SELECT doc_id, source,
           |    list_distinct(regexp_split_to_array(trim(text), '\s+')) AS sh
           |  FROM documents),
           |pairs AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
           |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.9),
           |sym AS (
           |  SELECT id_a AS a, id_b AS b FROM pairs
           |  UNION SELECT id_b, id_a FROM pairs),
           |reach AS (
           |  SELECT a, b FROM sym
           |  UNION
           |  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
           |comp AS (
           |  SELECT d.doc_id, d.lang,
           |    LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS component
           |  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
           |  GROUP BY d.doc_id, d.lang)
           |SELECT lang, COUNT(*) AS n_docs,
           |  COUNT(*) FILTER (doc_id = component) AS n_kept
           |FROM comp GROUP BY lang ORDER BY lang""".stripMargin))

  private val d26 = Entry("d26_cluster_best_survivor",
    (s, dir) => {
      // Quality-RANKED survivor selection (round 10) — the dedup decision
      // production pipelines actually ship next to d08's min-id form:
      // within each near-dup cluster keep the BEST document (here the
      // longest — the standard "keep the longest duplicate" heuristic),
      // ties to the smallest id. One max(struct(len, -id)) per component
      // — a map-side-combining argmax, never a window over the cluster
      // key (the d20/t20 skew lesson: a hot cluster would single-task a
      // window). Output: every non-singleton cluster with its kept doc.
      // The oracle recomputes the transitive closure independently
      // (d08's recursive CTE) and replays the same argmax.
      val docs = Tables(s, dir, "documents")
      val pairs = Dedup.nearDupPairsExact(docs, "doc_id", "text",
        blockCol = "source", shingleN = 1, threshold = 0.9)
      // round 16: alternating CC — identical min-id components in
      // O(log n) rounds instead of O(diameter) (see clusterSurvivors)
      val comps = GraphAlgorithms.alternatingComponents(
        docs.select("doc_id"), pairs.select("id_a", "id_b"))
      docs.select(col("doc_id"), length(col("text")).cast("long").as("len"))
        .join(comps.withColumnRenamed("id", "doc_id"), Seq("doc_id"))
        .groupBy("component")
        .agg(count(lit(1)).as("n_members"),
          max(struct(col("len"), (-col("doc_id")).as("negid"))).as("__b"))
        .filter(col("n_members") >= 2)
        .select(col("component"), col("n_members"),
          col("__b.len").as("kept_len"), (-col("__b.negid")).as("kept_id"))
        .orderBy("component")
    },
    Some("""WITH RECURSIVE t AS (
           |  SELECT doc_id, source,
           |    list_distinct(regexp_split_to_array(trim(text), '\s+')) AS sh
           |  FROM documents),
           |pairs AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
           |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.9),
           |sym AS (
           |  SELECT id_a AS a, id_b AS b FROM pairs
           |  UNION SELECT id_b, id_a FROM pairs),
           |reach AS (
           |  SELECT a, b FROM sym
           |  UNION
           |  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
           |comp AS (
           |  SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS len,
           |    LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS component
           |  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
           |  GROUP BY d.doc_id, d.text),
           |b AS (
           |  SELECT component, CAST(COUNT(*) AS BIGINT) AS n_members,
           |    MAX(len) AS kept_len
           |  FROM comp GROUP BY component),
           |k AS (
           |  SELECT comp.component, MIN(comp.doc_id) AS kept_id
           |  FROM comp JOIN b ON comp.component = b.component
           |    AND comp.len = b.kept_len
           |  GROUP BY comp.component)
           |SELECT b.component, b.n_members, b.kept_len, k.kept_id
           |FROM b JOIN k USING (component)
           |WHERE b.n_members >= 2 ORDER BY b.component""".stripMargin))

  private val d13 = Entry("d13_cms_heavy_hitters",
    (s, dir) => {
      // Count-Min Sketch heavy hitters — the mergeable FREQUENCY sketch
      // next to d02/d07's cardinality ones: per-source token sketches
      // merge into a corpus sketch (shard → corpus roll-up without a raw
      // re-count), and the exact top-20 words are checked against it. CMS
      // guarantees estimate >= exact and, at confidence 0.99, estimate <=
      // exact + eps·N — a deterministic bound with the fixed seed, so the
      // d02/d07 promotion applies: hash the exact counts, assert the
      // bound as a constant-TRUE column. The merge + 20 point estimates
      // are driver-side over 5 sketch blobs (bounded by the source
      // cardinality — the roll-up contract, not a data-size collect).
      import org.apache.spark.sql.Row
      val docs = Tables(s, dir, "documents")
      val toks = docs.select(col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("w"))
      val eps = 0.001
      val sketches = Dedup.cmsPerGroup(toks, "source", "w", eps = eps)
      val merged = Dedup.cmsMerge(
        // bounded: one mergeable sketch blob per source group
        sketches.collect().map(_.getAs[Array[Byte]]("cms")).toSeq)
      val top = toks.groupBy("w").agg(count(lit(1)).as("n_exact"))
        .orderBy(desc("n_exact"), asc("w")).limit(20).collect()
      val total = merged.totalCount()
      val rows = top.map { r =>
        val w = r.getString(0); val n = r.getLong(1)
        val est = merged.estimateCount(w)
        Row(w, n, est >= n && est <= n + math.ceil(eps * total).toLong)
      }
      s.createDataFrame(
        new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("w",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n_exact",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("cms_within_bound",
            org.apache.spark.sql.types.BooleanType))))
    },
    Some("""WITH u AS (
           |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
           |  FROM documents)
           |SELECT w, COUNT(*) AS n_exact, TRUE AS cms_within_bound
           |FROM u GROUP BY w ORDER BY n_exact DESC, w LIMIT 20""".stripMargin))

  private val d14 = Entry("d14_simhash_banded_pairs",
    (s, dir) => {
      // d05's SCALE PATH: pigeonhole chunk banding replaces the within-block
      // all-pairs Hamming join (quadratic in the hottest block) with
      // maxHamming+1 equi-joins on (block, chunk index, chunk value) — any
      // pair within the radius agrees exactly on >=1 of the 8 six-bit
      // chunks, so the pair set is IDENTICAL to the blocked form's at the
      // same radius (exact bound, not probabilistic; DedupSpec property-
      // tests the equality and PlanSpec asserts equi-join-only). The oracle
      // computes the blocked all-pairs form — a hash match here IS the
      // gate-level proof that banding loses nothing. Radius 7-of-48: tight
      // enough that each chunk join sees ~1/64 of the block's pair volume.
      Dedup.nearDupPairsSimhashBanded(
          fanOut(Tables(s, dir, "documents"), s, "doc_id"),
          "doc_id", "text", blockCol = "source", bits = 48, maxHamming = 7)
        .orderBy("id_a", "id_b")
    },
    Some("""WITH tok AS (
           |  SELECT doc_id, source,
           |    unnest(regexp_split_to_array(trim(text), '\s+')) AS w
           |  FROM documents),
           |tv AS (
           |  SELECT doc_id, source,
           |    CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS v
           |  FROM tok),
           |bitv AS (
           |  SELECT doc_id, source, r.b,
           |    CASE WHEN SUM(CASE WHEN ((v >> r.b) & 1) = 1 THEN 1 ELSE -1 END) >= 0
           |      THEN CAST(1 AS BIGINT) << r.b ELSE 0 END AS bitval
           |  FROM tv, range(0, 48) r(b) GROUP BY doc_id, source, r.b),
           |sg AS (
           |  SELECT doc_id, source, CAST(SUM(bitval) AS BIGINT) AS sig
           |  FROM bitv GROUP BY doc_id, source)
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
           |FROM sg a JOIN sg b ON a.source = b.source AND a.doc_id < b.doc_id
           |WHERE bit_count(xor(a.sig, b.sig)) <= 7
           |ORDER BY id_a, id_b""".stripMargin))

  private val d16 = Entry("d16_repeated_span_stats",
    (s, dir) => {
      // Repeated-SPAN duplication — the finer-grained member of the dedup
      // ladder next to t12/t20's fixed chunks: every rolling 8-token
      // window (NOT distinct — position-level multiplicity is the signal)
      // is hashed portable (md5-60 of the space-joined window, the d03
      // base hash), counted corpus-wide, and rolled up per language:
      // how much of each language's token stream sits in spans that occur
      // more than once anywhere (what span-level dedup would cut), and
      // how many docs are majority-duplicated. The 100 TB shape: strings
      // leave the pipeline at the hash step, the corpus-wide count is one
      // map-side-combinable groupBy on a uniform 8-byte key, and the
      // rejoin is gram-hash equi — no pair joins anywhere. Docs shorter
      // than the window carry no spans and drop out on both sides.
      val n = 8
      val toks = fanOut(Tables(s, dir, "documents"), s, "doc_id")
        .select(col("doc_id"), col("lang"), TextAnalysis.tokens(col("text")).as("ts"))
      val grams = toks.select(col("doc_id"), col("lang"),
        explode(when(size(col("ts")) >= n,
            transform(sequence(lit(0), size(col("ts")) - n),
              i => Dedup.md5Base60(concat_ws(" ", slice(col("ts"), i + 1, lit(n))))))
          .otherwise(array().cast("array<long>"))).as("gh"))
      val counts = grams.groupBy("gh").agg(count(lit(1)).as("cnt"))
      val perDoc = grams.join(counts, Seq("gh"))
        .groupBy("doc_id", "lang")
        .agg(count(lit(1)).as("n_spans"),
          count(when(col("cnt") > 1, 1)).as("dup_spans"))
      perDoc.groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          sum("n_spans").cast("long").as("total_spans"),
          sum("dup_spans").cast("long").as("total_dup_spans"),
          count(when(col("dup_spans") * 2 > col("n_spans"), 1)).as("heavy_dup_docs"))
        .orderBy("lang")
    },
    Some("""WITH tok AS (
           |  SELECT doc_id, lang,
           |    regexp_split_to_array(trim(text), '\s+') AS ts
           |  FROM documents),
           |g AS (
           |  SELECT doc_id, lang,
           |    CAST('0x' || substr(md5(array_to_string(ts[i.i:i.i+7], ' ')),
           |      1, 15) AS BIGINT) AS gh
           |  FROM tok, LATERAL unnest(range(1, len(ts) - 8 + 2)) i(i)
           |  WHERE len(ts) >= 8),
           |c AS (SELECT gh, COUNT(*) AS cnt FROM g GROUP BY gh),
           |pd AS (
           |  SELECT doc_id, lang, COUNT(*) AS n_spans,
           |    COUNT(*) FILTER (cnt > 1) AS dup_spans
           |  FROM g JOIN c USING (gh) GROUP BY doc_id, lang)
           |SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(n_spans) AS BIGINT) AS total_spans,
           |  CAST(SUM(dup_spans) AS BIGINT) AS total_dup_spans,
           |  COUNT(*) FILTER (dup_spans * 2 > n_spans) AS heavy_dup_docs
           |FROM pd GROUP BY lang ORDER BY lang""".stripMargin))

  private val d17 = Entry("d17_incremental_neardup",
    (s, dir) => {
      // At-INGEST dedup — the incremental form every streaming pipeline
      // actually runs: each arriving batch (here: doc_id % 5 == 0, ~20%)
      // is matched against the standing corpus (the other 80%) through
      // the portable banded MinHash index, never re-pairing history with
      // itself. Per arrival: verified match count and the best history
      // match (highest Jaccard, ties to the smallest id), (-1, 0.0) when
      // clean. At 100 TB the history (band, bucket) index is computed
      // once and persisted; per-batch cost is bucket collisions +
      // verification on candidates only. The oracle reruns the d03 CTEs
      // with the same split.
      val docs = Tables(s, dir, "documents")
      Dedup.incrementalNearDups(
          docs.filter(col("doc_id") % 5 =!= 0),
          docs.filter(col("doc_id") % 5 === 0),
          "doc_id", "text", shingleN = 1, k = 64, bands = 8, threshold = 0.9)
        .orderBy("doc_id")
    },
    Some(d17OracleSql))

  /** The d17 oracle — shared verbatim by d24 (same semantics, history side
    * served from the PERSISTED index instead of re-derived): a hash match
    * on BOTH is the gate-level proof that persisting loses nothing.
    * `lazy` because d17 above initializes first in declaration order. */
  private lazy val d17OracleSql = ("""WITH t AS (
           |  SELECT doc_id, list_sort(list_distinct(list_transform(
           |    list_distinct(regexp_split_to_array(trim(text), '\s+')),
           |    s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % 1073741789))) AS sh
           |  FROM documents),
           |sig AS (
           |  SELECT t.doc_id, r.i,
           |    list_aggregate(list_transform(t.sh,
           |      x -> ((48271 * (r.i + 1)) % 1073741789 * x
           |            + (16807 * r.i + 12345) % 1073741789) % 1073741789),
           |      'min') AS mv
           |  FROM t, range(0, 64) r(i)),
           |bk AS (
           |  SELECT doc_id, CAST('0x' || substr(md5(
           |      CAST(i // 8 AS VARCHAR) || ':' ||
           |      string_agg(CAST(mv AS VARCHAR), ':' ORDER BY i)
           |    ), 1, 15) AS BIGINT) AS bucket
           |  FROM sig GROUP BY doc_id, i // 8),
           |cand AS (
           |  SELECT DISTINCT a.doc_id AS id_n, h.doc_id AS id_h
           |  FROM bk a JOIN bk h ON a.bucket = h.bucket
           |  WHERE a.doc_id % 5 = 0 AND h.doc_id % 5 <> 0),
           |ver AS (
           |  SELECT c.id_n, c.id_h,
           |    CAST(len(list_intersect(ta.sh, th.sh)) AS DOUBLE)
           |      / len(list_distinct(list_concat(ta.sh, th.sh))) AS jaccard
           |  FROM cand c
           |  JOIN t ta ON ta.doc_id = c.id_n
           |  JOIN t th ON th.doc_id = c.id_h
           |  WHERE CAST(len(list_intersect(ta.sh, th.sh)) AS DOUBLE)
           |      / len(list_distinct(list_concat(ta.sh, th.sh))) >= 0.9),
           |best AS (
           |  SELECT id_n, id_h, jaccard,
           |    COUNT(*) OVER (PARTITION BY id_n) AS n_matches,
           |    row_number() OVER (PARTITION BY id_n
           |      ORDER BY jaccard DESC, id_h) AS rn
           |  FROM ver)
           |SELECT a.doc_id,
           |  CAST(COALESCE(b.n_matches, 0) AS BIGINT) AS n_matches,
           |  COALESCE(b.id_h, -1) AS best_match_id,
           |  COALESCE(b.jaccard, 0.0) AS best_jaccard
           |FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) a
           |LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.id_n = a.doc_id
           |ORDER BY doc_id""").stripMargin

  private val d15 = Entry("d15_embedding_lsh_pairs",
    (s, dir) => {
      // Embedding near-dup via sign-LSH in the PORTABLE plane family —
      // the approximate operator itself oracle-hashed, not just
      // recall-spec'd: plane weight (t,i,j) = md5-60("t:i:j")/2^59 − 1 is
      // reproducible by any engine with md5, the projection fold is the
      // same in-order float→double walk on both sides (the d06-proven
      // arithmetic), so bucket ids, candidate set, first-collision dedup
      // and verified cosines all match bit-for-bit. 8 tables × 4 bits is
      // tuned to the fixture's moderate-cosine clusters (θ≈66° →
      // per-bit collision 0.63); production corpora with near-dup pairs
      // at cosine ≥0.9 run more bits per table and fewer tables — the
      // s-curve tuning, same as d03's bands. The join shape is the 100 TB
      // one: per-table bucket equi-joins, exact verification on
      // candidates only, vectors never shuffled in the candidate step.
      Similarity.embeddingNearDupPairsLSHPortable(
          Tables(s, dir, "embeddings"), "vec_id", "embedding",
          threshold = 0.4, tables = 8, nBits = 4, dim = 64)
        .orderBy("id_a", "id_b")
    },
    Some("""WITH v AS (
           |  SELECT vec_id, embedding,
           |    sqrt(list_reduce(list_transform(embedding,
           |      x -> CAST(x AS DOUBLE) * x), (p,q) -> p + q)) AS nrm
           |  FROM embeddings),
           |planes AS (
           |  SELECT t.t, i.i,
           |    list_transform(range(0, 64), j ->
           |      CAST(CAST('0x' || substr(md5(t.t || ':' || i.i || ':' || j),
           |        1, 15) AS BIGINT) AS DOUBLE) / 576460752303423488 - 1) AS w
           |  FROM range(0, 8) t(t), range(0, 4) i(i)),
           |bits AS (
           |  SELECT v.vec_id, p.t,
           |    CAST(SUM(CASE WHEN list_reduce(list_transform(
           |        list_zip(p.w, v.embedding),
           |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)),
           |        (a,b) -> a + b) >= 0
           |      THEN 1 << p.i ELSE 0 END) AS BIGINT) AS bucket
           |  FROM v, planes p GROUP BY v.vec_id, p.t),
           |cand AS (
           |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
           |  FROM bits a JOIN bits b
           |    ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
           |SELECT * FROM (
           |  SELECT c.id_a, c.id_b,
           |    list_reduce(list_transform(list_zip(x.embedding, y.embedding),
           |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
           |      (a,b) -> a + b) / (x.nrm * y.nrm) AS cosine
           |  FROM cand c
           |  JOIN v x ON c.id_a = x.vec_id
           |  JOIN v y ON c.id_b = y.vec_id)
           |WHERE cosine >= 0.4
           |ORDER BY id_a, id_b""".stripMargin))

  /** Doubled high-threshold dedup corpus shared by d19/d20/d21: every
    * fixture embedding plus a deterministically jittered twin (id + 2^40,
    * each element × 1.02 or 0.98 by dimension parity — a ~1.1° angular
    * perturbation, cosine ≈ 0.9998, modeling a re-encoded/re-normalized
    * copy). The fixture's own pairs all sit in [0.4, 0.6] (measured), so at
    * θ=0.9 the expected pair set is EXACTLY the orig↔twin pairs — which is
    * what a production near-dup threshold looks like, and where LSH bucket
    * pruning actually pays (the d15 docstring's s-curve point). The jitter
    * is plain IEEE arithmetic reproducible by the oracle (both factors are
    * exact decimal→double literals on both engines). */
  private def hiDupOrig(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables(s, dir, "embeddings").select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("embedding"))

  /** The jittered-twin half of [[hiDupCorpus]] — also the ARRIVAL side of
    * v15's persisted-index query (twin ids live 2^40 up — far above any
    * fixture/rehearsal id range; ScaleRehearsal replicas shift by k·10^6,
    * so a 10^6 offset would collide with replica 1 at sf1). */
  private def hiDupTwin(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables(s, dir, "embeddings")
      .select((col("vec_id") + (1L << 40)).as("vec_id"), col("label"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => x * when(i % 2 === 0, lit(1.02)).otherwise(lit(0.98)))
          .as("embedding"))

  private def hiDupCorpus(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    hiDupOrig(s, dir).unionByName(hiDupTwin(s, dir))

  /** The corpus CTE mirroring [[hiDupCorpus]] for the d19/d20/d21 oracles. */
  private val hiDupCorpusSql =
    """corpus AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dvec
      |  FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1099511627776, label,
      |    list_transform(list_zip(embedding, range(0, len(embedding))),
      |      p -> CAST(p[1] AS DOUBLE) *
      |        (CASE WHEN p[2] % 2 = 0 THEN CAST(1.02 AS DOUBLE)
      |              ELSE CAST(0.98 AS DOUBLE) END)) AS dvec
      |  FROM embeddings),
      |v AS (
      |  SELECT vec_id, label, dvec,
      |    sqrt(list_reduce(list_transform(dvec, x -> x * x), (p,q) -> p + q)) AS nrm
      |  FROM corpus)""".stripMargin

  private val d19 = Entry("d19_embedding_lsh_hi_threshold",
    (s, dir) => {
      // d15 at PRODUCTION settings — the measurement VERDICT r6 asked for:
      // θ=0.9 with 12-bit buckets × 8 tables (per-bit collision at the
      // twin's ~1.1° angle is 0.994, so table collision ≈ 0.93 and 8-table
      // recall ≈ 1 − 7e-10; for non-dup pairs at cosine ≤ 0.62 a 12-bit
      // agreement has probability ≈ 0.8^12 ≈ 0.07 per table — buckets stay
      // SPARSE and candidates track the true pairs, not n²). Same portable
      // planes, so the whole thing hash-matches the oracle; d20 is the
      // exact tiling on the identical corpus — the rehearsal pair that
      // turns the "LSH pays at production thresholds" claim into a number.
      Similarity.embeddingNearDupPairsLSHPortable(
          hiDupCorpus(s, dir), "vec_id", "embedding",
          threshold = 0.9, tables = 8, nBits = 12, dim = 64)
        .orderBy("id_a", "id_b")
    },
    Some(s"""WITH $hiDupCorpusSql,
           |planes AS (
           |  SELECT t.t, i.i,
           |    list_transform(range(0, 64), j ->
           |      CAST(CAST('0x' || substr(md5(t.t || ':' || i.i || ':' || j),
           |        1, 15) AS BIGINT) AS DOUBLE) / 576460752303423488 - 1) AS w
           |  FROM range(0, 8) t(t), range(0, 12) i(i)),
           |bits AS (
           |  SELECT v.vec_id, p.t,
           |    CAST(SUM(CASE WHEN list_reduce(list_transform(
           |        list_zip(p.w, v.dvec),
           |        x -> x[1] * x[2]), (a,b) -> a + b) >= 0
           |      THEN 1 << p.i ELSE 0 END) AS BIGINT) AS bucket
           |  FROM v, planes p GROUP BY v.vec_id, p.t),
           |cand AS (
           |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
           |  FROM bits a JOIN bits b
           |    ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
           |SELECT * FROM (
           |  SELECT c.id_a, c.id_b,
           |    list_reduce(list_transform(list_zip(x.dvec, y.dvec),
           |      p -> p[1] * p[2]), (a,b) -> a + b) / (x.nrm * y.nrm) AS cosine
           |  FROM cand c
           |  JOIN v x ON c.id_a = x.vec_id
           |  JOIN v y ON c.id_b = y.vec_id)
           |WHERE cosine >= 0.9
           |ORDER BY id_a, id_b""".stripMargin))

  private val d20 = Entry("d20_embedding_exact_hi_threshold",
    (s, dir) => {
      // The EXACT reference on d19's corpus: tiled O(n²) pair join at the
      // same θ=0.9 — the comparator that prices what d19's bucket pruning
      // saves (sf1 rehearsal row in BASELINE.md), and the recall oracle
      // DedupSpec checks d19 against. Same tile decomposition as d06.
      Similarity.embeddingNearDupPairs(
          hiDupCorpus(s, dir), "vec_id", "embedding", threshold = 0.9)
        .orderBy("id_a", "id_b")
    },
    Some(s"""WITH $hiDupCorpusSql
           |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           |  list_reduce(list_transform(list_zip(a.dvec, b.dvec),
           |    x -> x[1] * x[2]), (p,q) -> p + q) / (a.nrm * b.nrm) AS cosine
           |FROM v a JOIN v b ON a.vec_id < b.vec_id
           |WHERE list_reduce(list_transform(list_zip(a.dvec, b.dvec),
           |    x -> x[1] * x[2]), (p,q) -> p + q) / (a.nrm * b.nrm) >= 0.9
           |ORDER BY id_a, id_b""".stripMargin))

  private val d21 = Entry("d21_semantic_dedup_hi_threshold",
    (s, dir) => {
      // d18's SemDeDup composition at d19's production thresholds: the
      // LSH pair source feeds the same transitive-closure/min-survivor
      // stages, so each orig↔twin near-dup cluster collapses to the
      // original and the per-label summary shows exactly half the corpus
      // pruned. Candidates stay sparse (12-bit buckets), so unlike d18's
      // demo-threshold economics this composition is STRICTLY cheaper
      // than exact d12 on the same input — the claim is priced by the
      // d19/d20 rehearsal rows.
      val corpus = hiDupCorpus(s, dir)
      Dedup.semanticDedup(corpus, "vec_id", "embedding", threshold = 0.9,
          pairSource = Dedup.LshPairs(tables = 8, nBits = 12, dim = 64))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("is_survivor"), 1L).otherwise(0L)).as("n_kept"),
          countDistinct(when(not(col("is_survivor")), col("component")))
            .as("n_pruned_clusters"))
        .orderBy("label")
    },
    Some(s"""WITH RECURSIVE $hiDupCorpusSql,
           |planes AS (
           |  SELECT t.t, i.i,
           |    list_transform(range(0, 64), j ->
           |      CAST(CAST('0x' || substr(md5(t.t || ':' || i.i || ':' || j),
           |        1, 15) AS BIGINT) AS DOUBLE) / 576460752303423488 - 1) AS w
           |  FROM range(0, 8) t(t), range(0, 12) i(i)),
           |bits AS (
           |  SELECT v.vec_id, p.t,
           |    CAST(SUM(CASE WHEN list_reduce(list_transform(
           |        list_zip(p.w, v.dvec),
           |        x -> x[1] * x[2]), (a,b) -> a + b) >= 0
           |      THEN 1 << p.i ELSE 0 END) AS BIGINT) AS bucket
           |  FROM v, planes p GROUP BY v.vec_id, p.t),
           |cand AS (
           |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
           |  FROM bits a JOIN bits b
           |    ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
           |pairs AS (
           |  SELECT c.id_a, c.id_b FROM cand c
           |  JOIN v x ON c.id_a = x.vec_id
           |  JOIN v y ON c.id_b = y.vec_id
           |  WHERE list_reduce(list_transform(list_zip(x.dvec, y.dvec),
           |      p -> p[1] * p[2]), (a,b) -> a + b) / (x.nrm * y.nrm) >= 0.9),
           |sym AS (
           |  SELECT id_a AS a, id_b AS b FROM pairs
           |  UNION SELECT id_b, id_a FROM pairs),
           |reach AS (
           |  SELECT a, b FROM sym
           |  UNION
           |  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
           |comp AS (
           |  SELECT e.vec_id, e.label,
           |    LEAST(e.vec_id, COALESCE(MIN(r.b), e.vec_id)) AS component
           |  FROM corpus e LEFT JOIN reach r ON r.a = e.vec_id
           |  GROUP BY e.vec_id, e.label)
           |SELECT label, COUNT(*) AS n_vecs,
           |  CAST(SUM(CASE WHEN vec_id = component THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_kept,
           |  COUNT(DISTINCT CASE WHEN vec_id <> component THEN component END)
           |    AS n_pruned_clusters
           |FROM comp GROUP BY label ORDER BY label""".stripMargin))

  private val d27 = Entry("d27_semantic_dedup_recall",
    (s, dir) => {
      // The recall CONTRACT of the d12→d18/d21 pair-source swap,
      // oracle-checked at the gate SF every round (VERDICT r12 #8): the
      // production configuration — θ=0.9 on the orig↔twin corpus, the
      // 8×12-bit planes d19 runs — measured against the exact tiled form
      // (d20), as pair counts, intersection and recall in ONE hashable
      // row. Both engines rebuild both pair sets deterministically, so
      // the recall is a verified FACT of the configuration, not a
      // narrative claim; DedupSpec asserts the ≥0.95 floor, this entry
      // records the exact value per round. (At the fixture's moderate
      // θ=0.4 the same planes measure ~0.65 recall — the d15 docstring's
      // s-curve point; the exact source is the right config there, which
      // is why d12 defaults to it.)
      val corpus = hiDupCorpus(s, dir)
      val exact = Similarity.embeddingNearDupPairs(
        corpus, "vec_id", "embedding", threshold = 0.9).select("id_a", "id_b")
      val lsh = Similarity.embeddingNearDupPairsLSHPortable(
        corpus, "vec_id", "embedding", threshold = 0.9,
        tables = 8, nBits = 12, dim = 64).select("id_a", "id_b")
      val common = exact.join(lsh, Seq("id_a", "id_b"), "left_semi")
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(lsh.agg(count(lit(1)).as("n_lsh")))
        .crossJoin(common.agg(count(lit(1)).as("n_common")))
        .withColumn("recall",
          round(col("n_common").cast("double") / col("n_exact"), 4))
    },
    Some(s"""WITH $hiDupCorpusSql,
           |exact AS (
           |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
           |  FROM v a JOIN v b ON a.vec_id < b.vec_id
           |  WHERE list_reduce(list_transform(list_zip(a.dvec, b.dvec),
           |      x -> x[1] * x[2]), (p,q) -> p + q) / (a.nrm * b.nrm) >= 0.9),
           |planes AS (
           |  SELECT t.t, i.i,
           |    list_transform(range(0, 64), j ->
           |      CAST(CAST('0x' || substr(md5(t.t || ':' || i.i || ':' || j),
           |        1, 15) AS BIGINT) AS DOUBLE) / 576460752303423488 - 1) AS w
           |  FROM range(0, 8) t(t), range(0, 12) i(i)),
           |bits AS (
           |  SELECT v.vec_id, p.t,
           |    CAST(SUM(CASE WHEN list_reduce(list_transform(
           |        list_zip(p.w, v.dvec),
           |        x -> x[1] * x[2]), (a,b) -> a + b) >= 0
           |      THEN 1 << p.i ELSE 0 END) AS BIGINT) AS bucket
           |  FROM v, planes p GROUP BY v.vec_id, p.t),
           |cand AS (
           |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
           |  FROM bits a JOIN bits b
           |    ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
           |lsh AS (
           |  SELECT c.id_a, c.id_b FROM cand c
           |  JOIN v x ON c.id_a = x.vec_id
           |  JOIN v y ON c.id_b = y.vec_id
           |  WHERE list_reduce(list_transform(list_zip(x.dvec, y.dvec),
           |      p -> p[1] * p[2]), (a,b) -> a + b) / (x.nrm * y.nrm) >= 0.9),
           |common AS (
           |  SELECT e.id_a FROM exact e JOIN lsh l
           |    ON e.id_a = l.id_a AND e.id_b = l.id_b)
           |SELECT (SELECT COUNT(*) FROM exact) AS n_exact,
           |  (SELECT COUNT(*) FROM lsh) AS n_lsh,
           |  (SELECT COUNT(*) FROM common) AS n_common,
           |  ROUND(CAST((SELECT COUNT(*) FROM common) AS DOUBLE)
           |    / (SELECT COUNT(*) FROM exact), 4) AS recall""".stripMargin))

  private val d28 = Entry("d28_sampled_recall_estimate",
    (s, dir) => {
      // d27's recall audit at SCALE (VERDICT r13 #5): the exact pair
      // source costs O(n²) — 14.9 s at sf1, hours at 100× — so beyond
      // the gate SF the per-round audit runs on a deterministic
      // md5-bucket SAMPLE instead. Sampling is by CLUSTER (the md5
      // bucket of the BASE vec_id, so an original and its jittered twin
      // land in or out together): every true pair is kept or dropped
      // whole, which makes the sampled recall an unbiased estimate of
      // d27's — variance shrinks with sample size, bias is zero by
      // construction. At keep rate p the exact side costs p² of the full
      // audit (1/16 at the 1/4 rate here), so the estimator stays
      // affordable at any corpus size; d27 remains the gate-SF exact
      // audit and DedupSpec pins this estimate within ±0.05 of it.
      import graft.analytics.IterCheckpoint.IterCheckpointOps
      val corpus = hiDupCorpus(s, dir)
      val keep = conv(substring(
          md5(pmod(col("vec_id"), lit(1099511627776L)).cast("string")),
          1, 2), 16, 10).cast("int") < 64 // 64/256 = 1/4 of the clusters
      // pins: the count aggregates below each re-execute their subtree,
      // so without them every side recomputes ~3× (measured at sf1:
      // 13.0 s unpinned → 8.4 s pinned, vs d27's exact audit at 20.6 s;
      // the asymptotic win is the exact side's p² shrink — at 100× that
      // side alone is hours exact vs minutes sampled). The pinned frames
      // are the p-sampled corpus and two candidate-pair sets — all
      // sample-bounded.
      val sample = corpus.filter(keep).iterCheckpoint()
      val exact = Similarity.embeddingNearDupPairs(
        sample, "vec_id", "embedding", threshold = 0.9).select("id_a", "id_b")
        .iterCheckpoint()
      val lsh = Similarity.embeddingNearDupPairsLSHPortable(
        sample, "vec_id", "embedding", threshold = 0.9,
        tables = 8, nBits = 12, dim = 64).select("id_a", "id_b")
        .iterCheckpoint()
      val common = exact.join(lsh, Seq("id_a", "id_b"), "left_semi")
      sample.agg(count(lit(1)).as("n_sampled_vecs"))
        .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
        .crossJoin(lsh.agg(count(lit(1)).as("n_lsh")))
        .crossJoin(common.agg(count(lit(1)).as("n_common")))
        .withColumn("recall_est",
          round(col("n_common").cast("double") / col("n_exact"), 4))
    },
    Some(s"""WITH $hiDupCorpusSql,
           |samp AS (
           |  SELECT * FROM v
           |  WHERE CAST(CAST('0x' || substr(md5(CAST(vec_id % 1099511627776
           |    AS VARCHAR)), 1, 2) AS BIGINT) AS INT) < 64),
           |exact AS (
           |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
           |  FROM samp a JOIN samp b ON a.vec_id < b.vec_id
           |  WHERE list_reduce(list_transform(list_zip(a.dvec, b.dvec),
           |      x -> x[1] * x[2]), (p,q) -> p + q) / (a.nrm * b.nrm) >= 0.9),
           |planes AS (
           |  SELECT t.t, i.i,
           |    list_transform(range(0, 64), j ->
           |      CAST(CAST('0x' || substr(md5(t.t || ':' || i.i || ':' || j),
           |        1, 15) AS BIGINT) AS DOUBLE) / 576460752303423488 - 1) AS w
           |  FROM range(0, 8) t(t), range(0, 12) i(i)),
           |bits AS (
           |  SELECT sv.vec_id, p.t,
           |    CAST(SUM(CASE WHEN list_reduce(list_transform(
           |        list_zip(p.w, sv.dvec),
           |        x -> x[1] * x[2]), (a,b) -> a + b) >= 0
           |      THEN 1 << p.i ELSE 0 END) AS BIGINT) AS bucket
           |  FROM samp sv, planes p GROUP BY sv.vec_id, p.t),
           |cand AS (
           |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
           |  FROM bits a JOIN bits b
           |    ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
           |lsh AS (
           |  SELECT c.id_a, c.id_b FROM cand c
           |  JOIN samp x ON c.id_a = x.vec_id
           |  JOIN samp y ON c.id_b = y.vec_id
           |  WHERE list_reduce(list_transform(list_zip(x.dvec, y.dvec),
           |      p -> p[1] * p[2]), (a,b) -> a + b) / (x.nrm * y.nrm) >= 0.9),
           |common AS (
           |  SELECT e.id_a FROM exact e JOIN lsh l
           |    ON e.id_a = l.id_a AND e.id_b = l.id_b)
           |SELECT (SELECT COUNT(*) FROM samp) AS n_sampled_vecs,
           |  (SELECT COUNT(*) FROM exact) AS n_exact,
           |  (SELECT COUNT(*) FROM lsh) AS n_lsh,
           |  (SELECT COUNT(*) FROM common) AS n_common,
           |  ROUND(CAST((SELECT COUNT(*) FROM common) AS DOUBLE)
           |    / (SELECT COUNT(*) FROM exact), 4) AS recall_est""".stripMargin))

  private val d22 = Entry("d22_bloom_decontamination",
    (s, dir) => {
      // Bloom-prefiltered benchmark decontamination — d10's semantics with
      // the 100 TB shuffle economics. d10 ships EVERY corpus shingle into
      // the broadcast semi-join's hash probe; here the benchmark set's
      // xxhash64 fingerprints compact into a Bloom filter (built
      // distributed via DataFrameStatFunctions.bloomFilter — ~1.2 KB/1000
      // items at 1% fpp, vs the strings themselves) that rides the task
      // binary and kills non-matching shingles INSIDE the scan stage
      // (BloomMightContainLong, codegen'd bit-test), before the explode
      // output reaches any join. Same pattern Spark's runtime bloom-filter
      // join injects for shuffle joins; made explicit here because the
      // small side is an ARBITRARY curated eval set, not a join input.
      // Bloom false positives survive the prefilter, so an exact broadcast
      // semi-join on the shingle string re-verifies survivors: the result
      // is EXACT (no false negatives by construction) and hash-matches the
      // same plain-SQL oracle shape as d10 — at 4-gram granularity, the
      // stricter overlap test a production decontamination pass uses.
      val docs = Tables(s, dir, "documents")
      val bench = docs.filter(col("doc_id") < 25)
        .select(explode(Dedup.shingles(col("text"), 4)).as("sh")).distinct()
      val bloom = bench.select(xxhash64(col("sh")).as("h"))
        .stat.bloomFilter("h", math.max(bench.count(), 1L), 0.01)
      val bloomBytes = {
        val bos = new java.io.ByteArrayOutputStream()
        bloom.writeTo(bos); bos.toByteArray
      }
      val corpus = docs.filter(col("doc_id") >= 25)
      val flagged = corpus
        .select(col("doc_id"), explode(Dedup.shingles(col("text"), 4)).as("sh"))
        .filter(graft.functions.NativeExpressions.bloomMightContainLong(
          xxhash64(col("sh")), bloomBytes))
        .join(broadcast(bench), Seq("sh"), "left_semi")
        .select("doc_id").distinct()
      corpus.join(flagged.withColumn("__hit", lit(1)), Seq("doc_id"), "left")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          count(col("__hit")).as("n_contaminated"))
        .orderBy("lang")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS tk
           |  FROM documents),
           |sh AS (
           |  SELECT doc_id, lang,
           |    list_distinct([array_to_string(tk[i:i+3], ' ')
           |      for i in range(1, greatest(len(tk) - 3, 1) + 1)]) AS shingles
           |  FROM toks),
           |bench AS (
           |  SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id < 25),
           |flagged AS (
           |  SELECT DISTINCT c.doc_id
           |  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh WHERE doc_id >= 25) c
           |  JOIN bench ON c.s = bench.s)
           |SELECT lang, COUNT(*) AS n_docs,
           |  COUNT(*) FILTER (doc_id IN (SELECT doc_id FROM flagged)) AS n_contaminated
           |FROM sh WHERE doc_id >= 25
           |GROUP BY lang ORDER BY lang""".stripMargin))

  // ------------------------------------------- persisted dedup/ANN index --

  /** Build-once guard for the persisted index entries (VERDICT r7 #1).
    * Keyed per (fixture dir, variant) like [[graphCache]]: the first entry
    * that needs an index builds it (and, for the append variant, merges the
    * second batch in — idempotently, so a crashed/replayed run converges to
    * the same store); every later query in the same JVM — and every
    * re-timed bench iteration — READS the persisted tables, which is the
    * write-once/read-many economics the index exists to prove. A fresh JVM
    * over an existing store skips the build (parquet `_SUCCESS` marker). */
  private val idxCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def idxBuilt(path: String, table: String): Boolean =
    new java.io.File(s"$path/$table/_SUCCESS").exists()

  /** Content stamp of a fixture table (max mtime ⊕ total bytes), baked
    * into every index path: if the driver ever regenerates testdata, the
    * stamp changes and a FRESH store is built instead of silently serving
    * answers derived from the previous fixture. */
  private def srcStamp(dir: String, table: String): String = {
    val f = new java.io.File(s"$dir/$table.parquet")
    val (m, l) =
      if (f.isDirectory) {
        val fs = f.listFiles()
        if (fs == null || fs.isEmpty) (f.lastModified, 0L)
        else (fs.map(_.lastModified).max, fs.map(_.length).sum)
      } else (f.lastModified, f.length)
    java.lang.Long.toHexString(m ^ (l * 1000003L))
  }

  /** Text index over the d17 history corpus (doc_id % 5 != 0). */
  private def textIndex(s: org.apache.spark.sql.SparkSession, dir: String): String =
    idxCache.computeIfAbsent("text:" + dir, _ => {
      val p = System.getProperty("java.io.tmpdir") + "/graft_ddidx_r8_" +
        dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + srcStamp(dir, "documents")
      if (!idxBuilt(p, "text_buckets"))
        DedupIndex.buildText(Tables(s, dir, "documents")
          .filter(col("doc_id") % 5 =!= 0), "doc_id", "text", p)
      p
    })

  /** The append variant's OWN store (d25 mutates it — sharing d24's would
    * silently widen d24's history contract): base build on doc_id % 5 != 0,
    * then an incremental merge of the doc_id % 10 == 0 batch. */
  private def textIndexApp(s: org.apache.spark.sql.SparkSession, dir: String): String =
    idxCache.computeIfAbsent("textapp:" + dir, _ => {
      val p = System.getProperty("java.io.tmpdir") + "/graft_ddidx_r8_app_" +
        dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + srcStamp(dir, "documents")
      val docs = Tables(s, dir, "documents")
      if (!idxBuilt(p, "text_buckets"))
        DedupIndex.buildText(docs.filter(col("doc_id") % 5 =!= 0),
          "doc_id", "text", p)
      // idempotent (anti-join on already-indexed ids): re-running after a
      // crash or in a fresh JVM over the same store is a no-op
      DedupIndex.appendText(s, p, docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text")
      p
    })

  /** ANN index over the ORIGINAL embeddings at d19's production-threshold
    * geometry (8 tables × 12 bits); v15 queries the jittered twins. */
  private def embIndex(s: org.apache.spark.sql.SparkSession, dir: String): String =
    idxCache.computeIfAbsent("emb:" + dir, _ => {
      val p = System.getProperty("java.io.tmpdir") + "/graft_annidx_r8_" +
        dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + srcStamp(dir, "embeddings")
      if (!idxBuilt(p, "emb_buckets"))
        DedupIndex.buildEmbedding(hiDupOrig(s, dir), "vec_id", "embedding",
          p, tables = 8, nBits = 12, dim = 64)
      p
    })

  private val d23 = Entry("d23_dedup_index_build",
    (s, dir) => {
      // The index BUILD as an oracle-hashed operator: write the banded
      // MinHash store tables for the history corpus, then report per-band
      // occupancy READ BACK FROM DISK — n_entries (rows indexed), distinct
      // buckets, and the hottest bucket's size (the quantity that prices
      // worst-case per-arrival candidate volume). The oracle re-derives
      // the same (band, bucket) assignment from raw text, so a build that
      // wrote wrong, partial, or stale tables hash-fails. Write-once: the
      // bench re-times of this entry measure the read-back stats scan, the
      // build itself runs once per store — which is the deployment shape
      // (index maintenance is amortized across every query it serves).
      DedupIndex.textIndexStats(s, textIndex(s, dir))
    },
    Some("""WITH t AS (
           |  SELECT doc_id, list_sort(list_distinct(list_transform(
           |    list_distinct(regexp_split_to_array(trim(text), '\s+')),
           |    s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % 1073741789))) AS sh
           |  FROM documents WHERE doc_id % 5 <> 0),
           |sig AS (
           |  SELECT t.doc_id, r.i,
           |    list_aggregate(list_transform(t.sh,
           |      x -> ((48271 * (r.i + 1)) % 1073741789 * x
           |            + (16807 * r.i + 12345) % 1073741789) % 1073741789),
           |      'min') AS mv
           |  FROM t, range(0, 64) r(i)),
           |bk AS (
           |  SELECT doc_id, CAST(i // 8 AS INT) AS band,
           |    CAST('0x' || substr(md5(
           |      CAST(i // 8 AS VARCHAR) || ':' ||
           |      string_agg(CAST(mv AS VARCHAR), ':' ORDER BY i)
           |    ), 1, 15) AS BIGINT) AS bucket
           |  FROM sig GROUP BY doc_id, i // 8),
           |bs AS (SELECT band, bucket, COUNT(*) AS sz FROM bk GROUP BY 1, 2)
           |SELECT band, CAST(SUM(sz) AS BIGINT) AS n_entries,
           |  COUNT(*) AS n_buckets, CAST(MAX(sz) AS BIGINT) AS max_bucket
           |FROM bs GROUP BY band ORDER BY band""".stripMargin))

  private val d24 = Entry("d24_dedup_index_query",
    (s, dir) => {
      // d17's at-ingest matcher served from the PERSISTED index — the form
      // that replaces d17's 240.6 s sf10 posture: the history side is the
      // stored (band, bucket) tables and shingle sets, never re-derived,
      // so per-arrival cost tracks the arrival batch + its true bucket
      // collisions, not history size. Output and oracle are d17's
      // VERBATIM — the hash match is the proof that the persisted path
      // loses nothing vs deriving from raw data.
      DedupIndex.queryText(s, textIndex(s, dir),
          Tables(s, dir, "documents").filter(col("doc_id") % 5 === 0),
          "doc_id", "text", shingleN = 1, k = 64, bands = 8, threshold = 0.9)
        .orderBy("doc_id")
    },
    Some(d17OracleSql))

  private val d25 = Entry("d25_dedup_index_append",
    (s, dir) => {
      // INCREMENTAL MAINTENANCE: the store built on doc_id % 5 != 0 takes
      // an appended batch (doc_id % 10 == 0 — yesterday's arrivals becoming
      // today's history) through the idempotent anti-join merge, then a new
      // batch (doc_id % 10 == 5) queries the UPDATED index. The oracle
      // recomputes from raw text with history = original ∪ appended — a
      // hash match proves the append left the store exactly equal to a
      // from-scratch build over the union, which is the index-maintenance
      // contract (and what lets a 100 TB ingest never rebuild).
      DedupIndex.queryText(s, textIndexApp(s, dir),
          Tables(s, dir, "documents").filter(col("doc_id") % 10 === 5),
          "doc_id", "text", shingleN = 1, k = 64, bands = 8, threshold = 0.9)
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, list_sort(list_distinct(list_transform(
           |    list_distinct(regexp_split_to_array(trim(text), '\s+')),
           |    s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % 1073741789))) AS sh
           |  FROM documents),
           |sig AS (
           |  SELECT t.doc_id, r.i,
           |    list_aggregate(list_transform(t.sh,
           |      x -> ((48271 * (r.i + 1)) % 1073741789 * x
           |            + (16807 * r.i + 12345) % 1073741789) % 1073741789),
           |      'min') AS mv
           |  FROM t, range(0, 64) r(i)),
           |bk AS (
           |  SELECT doc_id, CAST('0x' || substr(md5(
           |      CAST(i // 8 AS VARCHAR) || ':' ||
           |      string_agg(CAST(mv AS VARCHAR), ':' ORDER BY i)
           |    ), 1, 15) AS BIGINT) AS bucket
           |  FROM sig GROUP BY doc_id, i // 8),
           |cand AS (
           |  SELECT DISTINCT a.doc_id AS id_n, h.doc_id AS id_h
           |  FROM bk a JOIN bk h ON a.bucket = h.bucket
           |  WHERE a.doc_id % 10 = 5
           |    AND (h.doc_id % 5 <> 0 OR h.doc_id % 10 = 0)),
           |ver AS (
           |  SELECT c.id_n, c.id_h,
           |    CAST(len(list_intersect(ta.sh, th.sh)) AS DOUBLE)
           |      / len(list_distinct(list_concat(ta.sh, th.sh))) AS jaccard
           |  FROM cand c
           |  JOIN t ta ON ta.doc_id = c.id_n
           |  JOIN t th ON th.doc_id = c.id_h
           |  WHERE CAST(len(list_intersect(ta.sh, th.sh)) AS DOUBLE)
           |      / len(list_distinct(list_concat(ta.sh, th.sh))) >= 0.9),
           |best AS (
           |  SELECT id_n, id_h, jaccard,
           |    COUNT(*) OVER (PARTITION BY id_n) AS n_matches,
           |    row_number() OVER (PARTITION BY id_n
           |      ORDER BY jaccard DESC, id_h) AS rn
           |  FROM ver)
           |SELECT a.doc_id,
           |  CAST(COALESCE(b.n_matches, 0) AS BIGINT) AS n_matches,
           |  COALESCE(b.id_h, -1) AS best_match_id,
           |  COALESCE(b.jaccard, 0.0) AS best_jaccard
           |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 5) a
           |LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.id_n = a.doc_id
           |ORDER BY doc_id""".stripMargin))

  private val t07 = Entry("t07_train_val_test_split",
    (s, dir) => {
      // Deterministic document-level split: bucket = first md5 byte of the
      // id — stable across runs, engines, partitionings and scale-ups (a
      // held-out set that stays held out). test ≈ 20/256, val ≈ 40/256.
      val h = substring(md5(col("doc_id").cast("string")), 1, 2)
      Tables(s, dir, "documents")
        .select(col("lang"),
          when(h < "14", "test").when(h < "3c", "validation")
            .otherwise("train").as("split"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("split", "lang")
    },
    Some("""WITH s AS (
           |  SELECT lang,
           |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '14' THEN 'test'
           |         WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '3c' THEN 'validation'
           |         ELSE 'train' END AS split
           |  FROM documents)
           |SELECT split, lang, COUNT(*) AS n_docs
           |FROM s GROUP BY split, lang ORDER BY split, lang""".stripMargin))

  private val t08 = Entry("t08_sequence_packing",
    (s, dir) => {
      // Token-budget sequence packing (the pre-tokenization batching step):
      // docs stream per language in id order into 4096-token sequences;
      // a doc's sequence = exclusive running token count ÷ budget. One
      // window per language — integer arithmetic end to end, and division
      // by 2^12 is exact in doubles, so the bucket ids hash-match.
      val docs = Tables(s, dir, "documents")
      val toks = TextAnalysis.tokenCount(col("text"))
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      docs.select(col("lang"), col("doc_id"), toks.as("n_toks"))
        .withColumn("seq_id",
          floor(coalesce(sum(col("n_toks")).over(w), lit(0L)).cast("double") / 4096.0)
            .cast("long"))
        .groupBy("lang", "seq_id")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).cast("long").as("total_tokens"))
        .orderBy("lang", "seq_id")
    },
    Some("""WITH d AS (
           |  SELECT lang, doc_id,
           |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_toks
           |  FROM documents),
           |p AS (
           |  SELECT lang, n_toks,
           |    CAST(FLOOR(CAST(COALESCE(SUM(n_toks) OVER (
           |      PARTITION BY lang ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
           |      / 4096.0) AS BIGINT) AS seq_id
           |  FROM d)
           |SELECT lang, seq_id, COUNT(*) AS n_docs,
           |  CAST(SUM(n_toks) AS BIGINT) AS total_tokens
           |FROM p GROUP BY lang, seq_id ORDER BY lang, seq_id""".stripMargin))

  private val d09 = Entry("d09_approx_quantile_sketch",
    (s, dir) => {
      // Mergeable quantile sketch next to d07's HLL: approx_percentile per
      // event_type with the exact percentiles beside it, exploded to one
      // scalar row per (event_type, p) — array columns crash the driver's
      // row canonicalization, and scalars are what a sketch consumer reads
      // anyway. Oracle-checkable because at harness scale (n_group <<
      // accuracy=10000) Greenwald–Khanna keeps every sample, so the
      // estimate IS the exact order statistic — which DuckDB's
      // quantile_disc reproduces bitwise, as does quantile_cont for the
      // interpolated exact percentile (probed at sf0.01: all 30 values
      // equal to full double precision). At cluster scale the estimate
      // degrades gracefully to the epsilon-rank guarantee; DedupSpec
      // bounds that gap independently of the oracle.
      Tables(s, dir, "events")
        .groupBy("event_type")
        .agg(
          percentile_approx(col("value"), array(lit(0.25), lit(0.5), lit(0.75)),
            lit(10000)).as("aq"),
          expr("percentile(value, array(0.25, 0.5, 0.75))").as("eq"))
        .select(col("event_type"),
          expr("""stack(3,
                 |  0.25D, aq[0], eq[0],
                 |  0.5D,  aq[1], eq[1],
                 |  0.75D, aq[2], eq[2]) AS (p, approx_value, exact_value)"""
            .stripMargin))
        .orderBy("event_type", "p")
    },
    Some("""WITH q AS (
           |  SELECT event_type,
           |    quantile_disc(value, 0.25) AS a25, quantile_cont(value, 0.25) AS e25,
           |    quantile_disc(value, 0.5)  AS a50, quantile_cont(value, 0.5)  AS e50,
           |    quantile_disc(value, 0.75) AS a75, quantile_cont(value, 0.75) AS e75
           |  FROM events GROUP BY event_type)
           |SELECT event_type, CAST(0.25 AS DOUBLE) AS p,
           |       a25 AS approx_value, e25 AS exact_value FROM q
           |UNION ALL
           |SELECT event_type, CAST(0.5 AS DOUBLE), a50, e50 FROM q
           |UNION ALL
           |SELECT event_type, CAST(0.75 AS DOUBLE), a75, e75 FROM q
           |ORDER BY event_type, p""".stripMargin))

  private val d10 = Entry("d10_benchmark_decontamination",
    (s, dir) => {
      // Benchmark decontamination: flag corpus documents sharing any
      // 3-gram shingle with a held-out "benchmark" set (first 25 docs stand
      // in for the eval set). Benchmark shingles broadcast into a left-semi
      // join over the corpus's exploded shingles — the standard n-gram
      // overlap pass every training pipeline runs before shipping data.
      val docs = Tables(s, dir, "documents")
      val bench = docs.filter(col("doc_id") < 25)
        .select(explode(Dedup.shingles(col("text"), 3)).as("sh")).distinct()
      val corpus = docs.filter(col("doc_id") >= 25)
      val flagged = corpus
        .select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("sh"))
        .join(broadcast(bench), Seq("sh"), "left_semi")
        .select("doc_id").distinct()
      corpus.join(flagged.withColumn("__hit", lit(1)), Seq("doc_id"), "left")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          count(col("__hit")).as("n_contaminated"))
        .orderBy("lang")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS tk
           |  FROM documents),
           |sh AS (
           |  SELECT doc_id, lang,
           |    list_distinct([array_to_string(tk[i:i+2], ' ')
           |      for i in range(1, greatest(len(tk) - 2, 1) + 1)]) AS shingles
           |  FROM toks),
           |bench AS (
           |  SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id < 25),
           |flagged AS (
           |  SELECT DISTINCT c.doc_id
           |  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh WHERE doc_id >= 25) c
           |  JOIN bench ON c.s = bench.s)
           |SELECT lang, COUNT(*) AS n_docs,
           |  COUNT(*) FILTER (doc_id IN (SELECT doc_id FROM flagged)) AS n_contaminated
           |FROM sh WHERE doc_id >= 25
           |GROUP BY lang ORDER BY lang""".stripMargin))

  private val t10 = Entry("t10_lexical_diversity",
    (s, dir) => {
      // Type-token ratio per document (repetition signal — the quality
      // heuristic that catches boilerplate/template spam): distinct tokens
      // over total tokens, one IEEE division.
      val toks = TextAnalysis.tokens(col("text"))
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(toks).as("n_tokens"),
          size(array_distinct(toks)).as("n_unique"),
          (size(array_distinct(toks)).cast("double") / size(toks)).as("diversity"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
           |  FROM documents)
           |SELECT doc_id,
           |  CAST(len(tk) AS INT) AS n_tokens,
           |  CAST(len(list_distinct(tk)) AS INT) AS n_unique,
           |  CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) AS diversity
           |FROM t ORDER BY doc_id""".stripMargin))

  private val t11 = Entry("t11_stratified_sample",
    (s, dir) => {
      // Deterministic stratified (quota) sampling — the data-mixing step of
      // corpus assembly: keep the 50 docs per language with the lowest
      // md5(id), a sample that is reproducible across runs, engines,
      // partitionings and scale-ups (same property as t07's splits). One
      // window per stratum; id_sum proves the sample identity, not just
      // its size.
      val w = Window.partitionBy("lang")
        .orderBy(col("__h"), col("doc_id"))
      Tables(s, dir, "documents")
        .withColumn("__h", md5(col("doc_id").cast("string")))
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= 50)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"),
          sum(col("doc_id")).cast("long").as("id_sum"))
        .orderBy("lang")
    },
    Some("""WITH r AS (
           |  SELECT lang, doc_id,
           |    row_number() OVER (PARTITION BY lang
           |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
           |  FROM documents)
           |SELECT lang, COUNT(*) AS n_sampled,
           |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
           |FROM r WHERE rk <= 50
           |GROUP BY lang ORDER BY lang""".stripMargin))

  private val t12 = Entry("t12_chunk_dedup",
    (s, dir) => {
      // Chunk-level exact dedup (finer than d01's whole-doc digests, the
      // pass that catches shared boilerplate across otherwise-distinct
      // docs): split every document into fixed 32-token chunks, count
      // duplicate chunks corpus-wide. Explode + hash-groupBy — map-side
      // partial aggregation, shuffles only (chunk, count) pairs; the same
      // plan at 100 TB, with the chunk text replaced by its hash if the
      // shuffle width ever mattered.
      val chunked = Tables(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tk"))
        .select(col("doc_id"), explode(expr(
          """transform(sequence(0, CAST(ceil(size(tk) / 32.0) AS INT) - 1),
            |          i -> array_join(slice(tk, i * 32 + 1, 32), ' '))"""
            .stripMargin)).as("chunk"))
      chunked.groupBy("chunk").agg(count(lit(1)).as("cnt"))
        .agg(sum(col("cnt")).cast("long").as("n_chunks"),
          count(lit(1)).as("n_distinct_chunks"),
          sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_dup_chunks"),
          sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("dup_occurrences"))
    },
    Some("""WITH t AS (
           |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
           |  FROM documents),
           |u AS (SELECT doc_id, unnest(tk) AS w,
           |        generate_subscripts(tk, 1) AS i FROM t),
           |c AS (SELECT doc_id, (i - 1) // 32 AS chunk_id,
           |        string_agg(w, ' ' ORDER BY i) AS chunk
           |      FROM u GROUP BY doc_id, (i - 1) // 32),
           |g AS (SELECT chunk, COUNT(*) AS cnt FROM c GROUP BY chunk)
           |SELECT CAST(SUM(cnt) AS BIGINT) AS n_chunks,
           |  COUNT(*) AS n_distinct_chunks,
           |  CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
           |  CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup_occurrences
           |FROM g""".stripMargin))

  private val t13 = Entry("t13_repetition_signals",
    (s, dir) => {
      // Gopher-style repetition quality signals, word-level (the fixture
      // corpus is single-line): duplicate-word fraction (1 − distinct/total),
      // top-unigram mass, and mean word length — the cheap filters a
      // training pipeline applies before any fuzzy dedup. Two chained hash
      // aggregates over the exploded token stream: per-(doc, word) counts
      // partial-aggregate map-side, so the shuffle carries (doc, word,
      // count) — never a word instance twice. All fractions are one IEEE
      // division of exact integers, written in the same operation order as
      // the oracle.
      val words = Tables(s, dir, "documents")
        .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("word"))
      words.groupBy("doc_id", "word")
        .agg(count(lit(1)).as("c"), sum(length(col("word"))).as("chars"))
        .groupBy("doc_id")
        .agg(sum(col("c")).cast("long").as("n_words"),
          count(lit(1)).as("n_distinct"),
          max(col("c")).as("top_c"),
          sum(col("chars")).cast("long").as("n_chars"))
        .select(col("doc_id"), col("n_words"),
          ((col("n_words") - col("n_distinct")).cast("double") /
            col("n_words").cast("double")).as("dup_word_frac"),
          (col("top_c").cast("double") /
            col("n_words").cast("double")).as("top_word_frac"),
          (col("n_chars").cast("double") /
            col("n_words").cast("double")).as("mean_word_len"))
        .orderBy("doc_id")
    },
    Some("""WITH w AS (
           |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS word
           |  FROM documents),
           |pc AS (SELECT doc_id, word, COUNT(*) AS c, SUM(length(word)) AS chars
           |       FROM w GROUP BY 1, 2),
           |a AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
           |        COUNT(*) AS n_distinct, MAX(c) AS top_c,
           |        CAST(SUM(chars) AS BIGINT) AS n_chars
           |      FROM pc GROUP BY 1)
           |SELECT doc_id, n_words,
           |  CAST(n_words - n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) AS dup_word_frac,
           |  CAST(top_c AS DOUBLE) / CAST(n_words AS DOUBLE) AS top_word_frac,
           |  CAST(n_chars AS DOUBLE) / CAST(n_words AS DOUBLE) AS mean_word_len
           |FROM a ORDER BY doc_id""".stripMargin))

  private val t16 = Entry("t16_filter_funnel",
    (s, dir) => {
      // The quality-gate FUNNEL AUDIT every production corpus pipeline
      // ships next to its filters: per-stage in/out/rejected counts for a
      // sequential filter chain. ONE scan computes all stage flags, ONE
      // aggregate row holds the conditional sums, and stack() unpivots it
      // to the per-stage report — no re-scan per filter, which is the
      // difference between 1× and 4× the corpus read at 100 TB.
      val toks = TextAnalysis.tokens(col("text"))
      val flagged = Tables(s, dir, "documents").select(
        (length(col("text")) >= 200).as("f1"),
        (size(toks) >= 30).as("f2"),
        (TextAnalysis.punctCount(col("text")) * 10 <= length(col("text"))).as("f3"),
        (size(array_distinct(toks)) * 10 >= size(toks) * 3).as("f4"))
      flagged.agg(
          count(lit(1)).as("n0"),
          sum(when(col("f1"), 1L).otherwise(0L)).as("s1"),
          sum(when(col("f1") && col("f2"), 1L).otherwise(0L)).as("s2"),
          sum(when(col("f1") && col("f2") && col("f3"), 1L).otherwise(0L)).as("s3"),
          sum(when(col("f1") && col("f2") && col("f3") && col("f4"), 1L)
            .otherwise(0L)).as("s4"))
        .selectExpr("""stack(4,
          1L, 'min_length',        n0, s1,
          2L, 'min_tokens',        s1, s2,
          3L, 'punct_ratio',       s2, s3,
          4L, 'lexical_diversity', s3, s4) AS (stage_idx, stage, n_in, n_out)""")
        .withColumn("n_rejected", col("n_in") - col("n_out"))
        .orderBy("stage_idx")
    },
    Some("""WITH f AS (
           |  SELECT length(text) >= 200 AS f1,
           |    len(regexp_split_to_array(trim(text), '\s+')) >= 30 AS f2,
           |    len(regexp_extract_all(text, '[.,!?;:]')) * 10 <= length(text) AS f3,
           |    len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) * 10
           |      >= len(regexp_split_to_array(trim(text), '\s+')) * 3 AS f4
           |  FROM documents),
           |a AS (SELECT COUNT(*) AS n0,
           |  CAST(SUM(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
           |  CAST(SUM(CASE WHEN f1 AND f2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
           |  CAST(SUM(CASE WHEN f1 AND f2 AND f3 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
           |  CAST(SUM(CASE WHEN f1 AND f2 AND f3 AND f4 THEN 1 ELSE 0 END) AS BIGINT) AS s4
           |  FROM f)
           |SELECT * FROM (
           |  SELECT CAST(1 AS BIGINT) AS stage_idx, 'min_length' AS stage,
           |    n0 AS n_in, s1 AS n_out, n0 - s1 AS n_rejected FROM a
           |  UNION ALL SELECT 2, 'min_tokens', s1, s2, s1 - s2 FROM a
           |  UNION ALL SELECT 3, 'punct_ratio', s2, s3, s2 - s3 FROM a
           |  UNION ALL SELECT 4, 'lexical_diversity', s3, s4, s3 - s4 FROM a)
           |ORDER BY stage_idx""".stripMargin))

  private val t17 = Entry("t17_char_entropy",
    (s, dir) => {
      // Perplexity-proxy quality signal: Shannon entropy of the character
      // distribution (CCNet's cheap stand-in), bucketed head/middle/tail
      // per language by fixed thresholds. charEntropy is map-only and
      // codegen'd (native CharEntropy expression — one sort per row, no
      // interpreted HOF chain); the only shuffle here is the final
      // per-(lang, bucket) count.
      val docs = Tables(s, dir, "documents")
      val ent = round(TextAnalysis.charEntropy(substring(col("text"), 1, 120)), 6)
      docs.select(col("lang"), ent.as("h"))
        .withColumn("bucket",
          when(col("h") < 3.7, "tail")
            .when(col("h") < 4.0, "middle").otherwise("head"))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n_docs"), round(avg(col("h")), 6).as("mean_entropy"))
        .orderBy("lang", "bucket")
    },
    Some("""WITH d AS (
           |  SELECT lang, regexp_split_to_array(substring(text, 1, 120), '') AS cs,
           |    length(substring(text, 1, 120)) AS n
           |  FROM documents),
           |e AS (
           |  SELECT lang, round(-list_reduce(
           |    list_prepend(0.0, list_transform(list_sort(list_distinct(cs)),
           |      c -> (CAST(len(list_filter(cs, x -> x = c)) AS DOUBLE) / n)
           |           * log2(CAST(len(list_filter(cs, x -> x = c)) AS DOUBLE) / n))),
           |    (a, b) -> a + b), 6) AS h
           |  FROM d),
           |b AS (SELECT lang, h,
           |  CASE WHEN h < 3.7 THEN 'tail' WHEN h < 4.0 THEN 'middle'
           |    ELSE 'head' END AS bucket FROM e)
           |SELECT lang, bucket, COUNT(*) AS n_docs,
           |  round(AVG(h), 6) AS mean_entropy
           |FROM b GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin))

  private val t18 = Entry("t18_ngram_novelty",
    (s, dir) => {
      // Corpus-order n-gram novelty: per document, how many of its
      // distinct 3-grams are FIRST seen at this document (first
      // occurrence = min doc_id corpus-wide) — the marginal-contribution
      // curve dedup curricula read to decide when more same-source data
      // stops adding anything. One explode, two hash aggregates
      // (gram → first doc, then (lang, half) → rates); the early/late
      // split threshold is a broadcast scalar, and novelty decaying from
      // the early to the late half is the expected signature.
      val docs = Tables(s, dir, "documents")
      val grams = docs.select(col("doc_id"), col("lang"),
        explode(Dedup.shingles(col("text"), 3)).as("g"))
      val mx = docs.agg(max("doc_id").as("__mx"))
      // first occurrence via ONE window shuffle on the gram key — a
      // groupBy + join-back would shuffle the same rows twice and scan
      // the corpus twice (the explode recomputes per branch)
      val wFirst = Window.partitionBy("g")
      grams.withColumn("first_doc", min("doc_id").over(wFirst))
        .crossJoin(broadcast(mx))
        .withColumn("half",
          when(col("doc_id") * 2 <= col("__mx"), "early").otherwise("late"))
        .groupBy("lang", "half")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
            .cast("long").as("n_novel"))
        .withColumn("novelty_rate",
          col("n_novel").cast("double") / col("n_grams"))
        .orderBy("lang", "half")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS tk
           |  FROM documents),
           |sh AS (
           |  SELECT doc_id, lang,
           |    list_distinct([array_to_string(tk[i:i+2], ' ')
           |      for i in range(1, greatest(len(tk) - 2, 1) + 1)]) AS shingles
           |  FROM toks),
           |gr AS (SELECT doc_id, lang, unnest(shingles) AS g FROM sh),
           |fs AS (SELECT g, MIN(doc_id) AS first_doc FROM gr GROUP BY g),
           |mx AS (SELECT MAX(doc_id) AS mx FROM documents)
           |SELECT gr.lang,
           |  CASE WHEN gr.doc_id * 2 <= mx.mx THEN 'early' ELSE 'late' END AS half,
           |  COUNT(*) AS n_grams,
           |  CAST(SUM(CASE WHEN fs.first_doc = gr.doc_id THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_novel,
           |  CAST(SUM(CASE WHEN fs.first_doc = gr.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
           |    / COUNT(*) AS novelty_rate
           |FROM gr JOIN fs ON fs.g = gr.g, mx
           |GROUP BY 1, 2 ORDER BY lang, half""".stripMargin))

  private val t19 = Entry("t19_tokenizer_fertility",
    (s, dir) => {
      // Tokenizer-fertility profile per language: characters per word
      // and tokenizer pieces per word (pieces = whitespace words +
      // punctuation marks, the t05 BPE-ish segmentation law) — the
      // numbers that decide per-language token budgets. Pure column
      // arithmetic over one scan; ratios are single divisions of exact
      // integer sums. No lookaround regexes: the piece law is
      // arithmetic, so it runs identically on RE2-only engines.
      val docs = Tables(s, dir, "documents")
      val words = TextAnalysis.tokenCount(col("text")).cast("long")
      val pieces = (TextAnalysis.tokenCount(col("text")) +
        TextAnalysis.punctCount(col("text"))).cast("long")
      docs.select(col("lang"), length(col("text")).cast("long").as("chars"),
          words.as("words"), pieces.as("pieces"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("chars")).as("total_chars"),
          sum(col("words")).as("total_words"),
          sum(col("pieces")).as("total_pieces"),
          (sum(col("chars")).cast("double") / sum(col("words")))
            .as("chars_per_word"),
          (sum(col("pieces")).cast("double") / sum(col("words")))
            .as("fertility"))
        .orderBy("lang")
    },
    Some("""WITH d AS (
           |  SELECT lang, CAST(length(text) AS BIGINT) AS chars,
           |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS words,
           |    CAST(len(regexp_split_to_array(trim(text), '\s+'))
           |      + len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS pieces
           |  FROM documents)
           |SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(chars) AS BIGINT) AS total_chars,
           |  CAST(SUM(words) AS BIGINT) AS total_words,
           |  CAST(SUM(pieces) AS BIGINT) AS total_pieces,
           |  CAST(SUM(chars) AS DOUBLE) / SUM(words) AS chars_per_word,
           |  CAST(SUM(pieces) AS DOUBLE) / SUM(words) AS fertility
           |FROM d GROUP BY lang ORDER BY lang""".stripMargin))

  private val t21 = Entry("t21_salient_terms",
    (s, dir) => {
      // Per-document top-3 salient terms by TF×IDF — the keyword-extraction
      // pass a corpus pipeline runs for topical tagging / mixture audits.
      // IDF is the BM25 smoothed form WITHOUT the log: (N − df + 0.5) /
      // (df + 0.5). The log is monotone so top-k membership is unchanged,
      // and dropping it keeps the score BIT-DETERMINISTIC cross-engine —
      // integer adds then ONE correctly-rounded IEEE division and multiply,
      // where libm `ln` implementations may legally differ by an ulp and
      // flip a rank-boundary tie. Shapes: tf is a (doc, term) groupBy
      // (map-side combining; uniform keys), df aggregates the tf output
      // (terms skew like Zipf, but count-distinct-by-doc is already
      // pre-grouped so the hot term carries one row per doc, not per
      // token), top-k is a per-doc window — partitioned, never global.
      val docs = Tables(s, dir, "documents")
      val toks = docs.select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("term"))
      val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val nDf = docs.agg(count(lit(1)).as("n"))
      val scored = tf.join(dfreq, Seq("term"))
        .crossJoin(broadcast(nDf))
        .withColumn("score",
          col("tf") * ((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("term"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("term"), col("score"), col("rk"))
        .orderBy("doc_id", "rk")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
           |  FROM documents),
           |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
           |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
           |n AS (SELECT COUNT(*) AS n FROM documents),
           |scored AS (
           |  SELECT tf.doc_id, tf.term,
           |    tf.tf * ((n.n - df.df + 0.5) / (df.df + 0.5)) AS score
           |  FROM tf JOIN df USING (term) CROSS JOIN n),
           |ranked AS (
           |  SELECT doc_id, term, score,
           |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
           |  FROM scored)
           |SELECT doc_id, term, score, CAST(rk AS INT) AS rk
           |FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin))

  private val t20 = Entry("t20_chunk_dedup_reassembly",
    (s, dir) => {
      // C4-style shared-chunk REMOVAL with reassembly accounting — t12
      // counts duplicate chunks; this op performs the edit a pipeline
      // actually ships: every 32-token chunk keeps only its FIRST corpus
      // occurrence (min (doc_id, position)), and each document's retained
      // token mass is re-totalled from its surviving chunks. The winner
      // per chunk comes from a hash-groupBy `min(struct(doc_id, pos))` —
      // NOT a row_number window — because min() partial-aggregates
      // map-side: a boilerplate chunk repeated 10^9 times at 100 TB
      // arrives at the reducer as one pre-combined row per map partition,
      // where a window over the same key would funnel every occurrence
      // into one task. The join back is on the chunk's md5 (16 bytes),
      // never the text; AQE skew-join splits any residual hot hash.
      val docs = Tables(s, dir, "documents")
      val occ = docs
        .select(col("doc_id"), col("lang"), TextAnalysis.tokens(col("text")).as("tk"))
        .filter(size(col("tk")) > 0)
        .select(col("doc_id"), col("lang"), posexplode(expr(
          """transform(sequence(0, CAST(ceil(size(tk) / 32.0) AS INT) - 1),
            |          i -> array_join(slice(tk, i * 32 + 1, 32), ' '))"""
            .stripMargin)).as(Seq("pos", "chunk")))
        .select(col("doc_id"), col("lang"), col("pos"),
          md5(col("chunk")).as("h"),
          size(split(col("chunk"), " ")).cast("long").as("n_tok"))
      val winners = occ.groupBy("h")
        .agg(min(struct(col("doc_id"), col("pos"))).as("w"))
        .select(col("h"), col("w.doc_id").as("w_doc"), col("w.pos").as("w_pos"))
      val perDoc = occ.join(winners, Seq("h"))
        .withColumn("kept",
          col("doc_id") === col("w_doc") && col("pos") === col("w_pos"))
        .groupBy("doc_id", "lang")
        .agg(count(lit(1)).as("chunks"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("kept_chunks"),
          sum(col("n_tok")).as("toks"),
          sum(when(col("kept"), col("n_tok")).otherwise(0L)).as("kept_toks"))
      perDoc.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("kept_chunks") === col("chunks"), 1L).otherwise(0L))
            .as("n_intact"),
          sum(col("chunks")).as("n_chunks"),
          sum(col("kept_chunks")).as("n_kept"),
          sum(col("toks")).as("n_toks"),
          sum(col("kept_toks")).as("kept_toks"))
        .orderBy("lang")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS tk
           |  FROM documents
           |  WHERE len(regexp_split_to_array(trim(text), '\s+')) > 0),
           |u AS (SELECT doc_id, lang, unnest(tk) AS w,
           |        generate_subscripts(tk, 1) AS i FROM t),
           |c AS (SELECT doc_id, lang, (i - 1) // 32 AS pos,
           |        string_agg(w, ' ' ORDER BY i) AS chunk,
           |        CAST(COUNT(*) AS BIGINT) AS n_tok
           |      FROM u GROUP BY doc_id, lang, (i - 1) // 32),
           |r AS (SELECT doc_id, lang, n_tok,
           |        ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
           |      FROM c),
           |d AS (SELECT doc_id, lang, COUNT(*) AS chunks,
           |        SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS kept_chunks,
           |        SUM(n_tok) AS toks,
           |        SUM(CASE WHEN rn = 1 THEN n_tok ELSE 0 END) AS kept_toks
           |      FROM r GROUP BY doc_id, lang)
           |SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(CASE WHEN kept_chunks = chunks THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_intact,
           |  CAST(SUM(chunks) AS BIGINT) AS n_chunks,
           |  CAST(SUM(kept_chunks) AS BIGINT) AS n_kept,
           |  CAST(SUM(toks) AS BIGINT) AS n_toks,
           |  CAST(SUM(kept_toks) AS BIGINT) AS kept_toks
           |FROM d GROUP BY lang ORDER BY lang""".stripMargin))

  private val t15 = Entry("t15_domain_mixture_sampler",
    (s, dir) => {
      // Domain-mixture sampling — the data-mixing op of corpus assembly:
      // hit a target per-language share of a global character budget
      // (en 50%, the rest 12.5% each, budget = 25% of the corpus), taking
      // each language's lowest-md5 docs until its budget slice is spent.
      // The exclusive running sum admits the first doc that crosses the
      // line (deterministic overshoot ≤ 1 doc, same property as t08's
      // packing). The budget is a broadcast 1-row scalar (q51's idiom);
      // weights/fractions are binary fractions so the double math is
      // bit-exact cross-engine. At 100 TB the per-stratum sort window
      // becomes an approximate md5 *threshold* (percentile of the hash) —
      // same sample up to the boundary doc, no global sort.
      val docs = Tables(s, dir, "documents")
      val budget = docs.agg((sum(col("n_chars")) * lit(0.25)).as("__budget"))
      val weights = typedlit(Map(
        "en" -> 0.5, "de" -> 0.125, "es" -> 0.125, "fr" -> 0.125, "zh" -> 0.125))
      val w = Window.partitionBy("lang")
        .orderBy(col("__h"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      docs
        .withColumn("__h", md5(col("doc_id").cast("string")))
        .withColumn("__cum", coalesce(sum(col("n_chars")).over(w), lit(0L)))
        .crossJoin(broadcast(budget))
        .filter(col("__cum") < element_at(weights, col("lang")) * col("__budget"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("chars_kept"))
        .orderBy("lang")
    },
    Some("""WITH b AS (SELECT 0.25 * SUM(n_chars) AS budget FROM documents),
           |r AS (SELECT lang, doc_id, n_chars,
           |  COALESCE(SUM(n_chars) OVER (PARTITION BY lang
           |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
           |  FROM documents)
           |SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(n_chars) AS BIGINT) AS chars_kept
           |FROM r, b
           |WHERE cum < (CASE lang WHEN 'en' THEN 0.5 ELSE 0.125 END) * budget
           |GROUP BY lang ORDER BY lang""".stripMargin))

  private val t14 = Entry("t14_corpus_pipeline",
    (s, dir) => {
      // The composed training-corpus pipeline, end to end in ONE plan:
      // quality gate → exact dup collapse (min-id survivor per
      // normalized-content hash) → deterministic split assignment →
      // per-(split, lang) doc and token budget. Each stage is an already
      // verified operator (t02 / d01 / t07 / t01) — this entry checks their
      // COMPOSITION, the shape a real pipeline deploys. One scan, one
      // window shuffle on the content hash, one aggregate shuffle; the
      // quality gate prunes before any shuffle, so the expensive stages see
      // only survivors. At 100 TB every stage is hash-partitioned on
      // uniformly distributed keys — no skew, no driver state.
      val docs = Tables(s, dir, "documents")
      val scored = docs
        .withColumn("quality", TextAnalysis.qualityScore(col("text")))
        .filter(col("quality") >= 0.3)
      val survivors = scored
        .withColumn("h", Dedup.contentHash(col("text")))
        .withColumn("rk", row_number().over(
          Window.partitionBy("h").orderBy("doc_id")))
        .filter(col("rk") === 1)
      val bucket = substring(md5(col("doc_id").cast("string")), 1, 2)
      survivors
        .select(col("lang"),
          when(bucket < "14", "test").when(bucket < "3c", "validation")
            .otherwise("train").as("split"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
        .orderBy("split", "lang")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, text, lang,
           |    regexp_split_to_array(trim(text), '\s+') AS toks,
           |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
           |      x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS stop_hits,
           |    len(regexp_extract_all(text, '[.,!?;:]')) AS punct
           |  FROM documents),
           |q AS (
           |  SELECT doc_id, text, lang, len(toks) AS n_tokens,
           |    0.5 * (CAST(stop_hits AS DOUBLE) / len(toks))
           |    + 0.3 * least(CAST(len(toks) AS DOUBLE) / 200.0, 1.0)
           |    + 0.2 * (1.0 - least(CAST(punct AS DOUBLE) / greatest(length(text), 1) * 10.0, 1.0))
           |    AS quality
           |  FROM t),
           |f AS (SELECT * FROM q WHERE quality >= 0.3),
           |s AS (
           |  SELECT *, row_number() OVER (
           |    PARTITION BY md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
           |    ORDER BY doc_id) AS rk
           |  FROM f)
           |SELECT
           |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '14' THEN 'test'
           |       WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '3c' THEN 'validation'
           |       ELSE 'train' END AS split,
           |  lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
           |FROM s WHERE rk = 1
           |GROUP BY 1, 2 ORDER BY split, lang""".stripMargin))

  // ------------------------------------------------------------- vectors --

  private val v01 = Entry("v01_vector_norms",
    (s, dir) => {
      import graft.functions.VectorFunctions
      Tables(s, dir, "embeddings").select(col("vec_id"),
        size(col("embedding")).as("dim"),
        VectorFunctions.norm(col("embedding")).as("l2_norm"),
        element_at(col("embedding"), 1).cast("double").as("first_val"))
        .orderBy("vec_id")
    },
    Some("""SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
           |  sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * x),
           |       (p,q) -> p + q)) AS l2_norm,
           |  CAST(embedding[1] AS DOUBLE) AS first_val
           |FROM embeddings ORDER BY vec_id""".stripMargin))

  private val v08 = Entry("v08_matryoshka_energy",
    (s, dir) => {
      // Matryoshka-style truncation audit: how much L2 energy the first 16
      // dimensions of each embedding retain — the go/no-go check before
      // serving truncated vectors from an MRL-trained model. Pure per-row
      // arithmetic over the codegen'd dot-product expression; at 100 TB
      // this is a map-only pass, no shuffle before the presentation sort.
      import graft.functions.VectorFunctions
      val emb = Tables(s, dir, "embeddings")
      val t16 = slice(col("embedding"), 1, 16)
      emb.select(col("vec_id"),
        VectorFunctions.norm(col("embedding")).as("norm_full"),
        VectorFunctions.norm(t16).as("norm_16"),
        (VectorFunctions.normSq(t16) / VectorFunctions.normSq(col("embedding")))
          .as("energy_16"))
        .orderBy("vec_id")
    },
    Some("""SELECT vec_id,
           |  sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * x),
           |       (p,q) -> p + q)) AS norm_full,
           |  sqrt(list_reduce(list_transform(embedding[1:16], x -> CAST(x AS DOUBLE) * x),
           |       (p,q) -> p + q)) AS norm_16,
           |  list_reduce(list_transform(embedding[1:16], x -> CAST(x AS DOUBLE) * x),
           |       (p,q) -> p + q)
           |  / list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * x),
           |       (p,q) -> p + q) AS energy_16
           |FROM embeddings ORDER BY vec_id""".stripMargin))

  private val v02 = Entry("v02_cosine_topk",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.cosineTopK(corpus, queries, k = 3)
        .orderBy("q_id", "rank")
    },
    Some("""WITH v AS (
           |  SELECT vec_id, embedding,
           |    sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * x),
           |         (p,q) -> p + q)) AS nrm
           |  FROM embeddings),
           |scored AS (
           |  SELECT q.vec_id AS q_id, c.vec_id AS id,
           |    list_reduce(list_transform(list_zip(q.embedding, c.embedding),
           |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p,q2) -> p + q2)
           |      / (q.nrm * c.nrm) AS cosine
           |  FROM v q JOIN v c ON q.vec_id < 5 AND q.vec_id <> c.vec_id)
           |SELECT q_id,
           |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, id) AS INT) AS rank,
           |  id, cosine
           |FROM scored
           |QUALIFY rank <= 3
           |ORDER BY q_id, rank""".stripMargin))

  private val v14 = Entry("v14_mmr_diversified_topk",
    (s, dir) => {
      // MMR diversified top-3 over a 10-candidate ANN pool
      // (Similarity.mmrTopK, λ=0.5): the post-retrieval pass that stops
      // near-duplicate hits crowding a result list. The greedy selection
      // is bounded (k=3), so the oracle unrolls each step as a CTE: pool
      // → argmax relevance → anti-join + max-sim-to-selected → argmax
      // MMR, twice. Scores are the d06-proven left-fold cosine plus
      // scalar mults — ranks AND raw double scores hash-match.
      val emb = Tables(s, dir, "embeddings")
      val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.mmrTopK(corpus, queries, k = 3, poolSize = 10, lambda = 0.5)
        .orderBy("q_id", "rank")
    },
    Some("""WITH v AS (
           |  SELECT vec_id, embedding,
           |    sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * x),
           |         (p,q) -> p + q)) AS nrm
           |  FROM embeddings),
           |scored AS (
           |  SELECT q.vec_id AS q_id, c.vec_id AS id, c.embedding AS vec, c.nrm AS cnrm,
           |    list_reduce(list_transform(list_zip(q.embedding, c.embedding),
           |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p,q2) -> p + q2)
           |      / (q.nrm * c.nrm) AS cosine
           |  FROM v q JOIN v c ON q.vec_id < 3 AND q.vec_id <> c.vec_id),
           |pool AS (SELECT * FROM (
           |  SELECT q_id, id, vec, cnrm, cosine,
           |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, id) AS rn
           |  FROM scored) WHERE rn <= 10),
           |s1 AS (SELECT q_id, id, vec, cnrm, 1 AS rank, 0.5 * cosine AS mmr
           |  FROM pool WHERE rn = 1),
           |x2 AS (
           |  SELECT c.q_id, c.id, c.vec, c.cnrm, c.cosine,
           |    MAX(list_reduce(list_transform(list_zip(c.vec, s.vec),
           |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p,q2) -> p + q2)
           |      / (c.cnrm * s.cnrm)) AS max_sim
           |  FROM pool c JOIN s1 s ON c.q_id = s.q_id AND c.id <> s.id
           |  GROUP BY c.q_id, c.id, c.vec, c.cnrm, c.cosine),
           |s2 AS (SELECT q_id, id, vec, cnrm, 2 AS rank, mmr FROM (
           |  SELECT q_id, id, vec, cnrm, 0.5 * cosine - 0.5 * max_sim AS mmr,
           |    row_number() OVER (PARTITION BY q_id
           |      ORDER BY (0.5 * cosine - 0.5 * max_sim) DESC, id) AS prn
           |  FROM x2) WHERE prn = 1),
           |sel2 AS (SELECT q_id, id, vec, cnrm FROM s1
           |  UNION ALL SELECT q_id, id, vec, cnrm FROM s2),
           |x3 AS (
           |  SELECT c.q_id, c.id, c.cosine,
           |    MAX(list_reduce(list_transform(list_zip(c.vec, s.vec),
           |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p,q2) -> p + q2)
           |      / (c.cnrm * s.cnrm)) AS max_sim
           |  FROM pool c JOIN sel2 s ON c.q_id = s.q_id
           |  WHERE NOT EXISTS (SELECT 1 FROM sel2 z
           |    WHERE z.q_id = c.q_id AND z.id = c.id)
           |  GROUP BY c.q_id, c.id, c.cosine),
           |s3 AS (SELECT q_id, id, 3 AS rank, mmr FROM (
           |  SELECT q_id, id, 0.5 * cosine - 0.5 * max_sim AS mmr,
           |    row_number() OVER (PARTITION BY q_id
           |      ORDER BY (0.5 * cosine - 0.5 * max_sim) DESC, id) AS prn
           |  FROM x3) WHERE prn = 1)
           |SELECT q_id, CAST(rank AS INT) AS rank, id, mmr FROM (
           |  SELECT q_id, rank, id, mmr FROM s1
           |  UNION ALL SELECT q_id, rank, id, mmr FROM s2
           |  UNION ALL SELECT q_id, rank, id, mmr FROM s3)
           |ORDER BY q_id, rank""".stripMargin))

  private val v05 = Entry("v05_label_centroid",
    (s, dir) => {
      // per-label embedding centroid, one row per (label, dimension) —
      // element sums route through DECIMAL(20,10) so accumulation order
      // can't change the result (the typed Aggregator variant of this op,
      // CentroidAgg, is spec-checked against it to fp tolerance)
      val emb = Tables(s, dir, "embeddings")
      // float → DOUBLE first (exact binary widening on both engines), THEN
      // decimal — a direct float→decimal cast rounds differently across
      // engines (shortest-repr vs exact expansion)
      emb.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("label", "dim")
        .agg((sum(col("v").cast("double").cast(org.apache.spark.sql.types.DecimalType(20, 10)))
          .cast("double") / count(lit(1))).as("centroid_v"))
        .filter(col("dim") < 8) // hash-check a slice; full width in specs
        .orderBy("label", "dim")
    },
    Some("""WITH e AS (
           |  SELECT label, unnest(embedding) AS v,
           |    unnest(range(len(embedding))) AS dim
           |  FROM embeddings)
           |SELECT label, CAST(dim AS INT) AS dim,
           |  CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS centroid_v
           |FROM e WHERE dim < 8
           |GROUP BY label, dim ORDER BY label, dim""".stripMargin))

  private val v07 = Entry("v07_int8_quantization",
    (s, dir) => {
      // Per-vector symmetric int8 quantization (scale = max|x| / 127) with
      // its reconstruction-error profile — the storage-shrink pass an
      // embedding pipeline runs before ANN indexing (4x smaller vectors,
      // bounded error). Everything is per-row higher-order column
      // expressions inside whole-stage codegen — no shuffle at all until
      // the final presentation sort, and at 100 TB the quantized arrays
      // write straight back to parquet partition-parallel. Rounding is
      // floor(x + 0.5) on BOTH engines (sidesteps HALF_UP-vs-banker's
      // divergence); folds are left folds; zero cross-row double sums, so
      // every double is bitwise-reproducible.
      Tables(s, dir, "embeddings")
        .withColumn("scale", expr(
          """aggregate(transform(embedding, v -> abs(CAST(v AS DOUBLE))),
            |          0D, (s, v) -> greatest(s, v))""".stripMargin) / 127.0)
        .withColumn("qs", expr(
          "transform(embedding, v -> floor(CAST(v AS DOUBLE) / scale + 0.5D))"))
        .withColumn("errs", expr(
          "zip_with(qs, embedding, (q, v) -> abs(q * scale - CAST(v AS DOUBLE)))"))
        .select(col("vec_id"), col("scale"),
          element_at(col("qs"), 1).cast("long").as("q_first"),
          expr("aggregate(errs, 0D, (s, e) -> greatest(s, e))").as("max_err"),
          (expr("aggregate(errs, 0D, (s, e) -> s + e)") /
            size(col("embedding")).cast("double")).as("mean_err"))
        .orderBy("vec_id")
    },
    Some("""WITH b AS (
           |  SELECT vec_id, embedding,
           |    list_reduce(list_transform(embedding, v -> abs(CAST(v AS DOUBLE))),
           |                (p, q) -> greatest(p, q)) / 127.0 AS scale
           |  FROM embeddings),
           |q AS (
           |  SELECT vec_id, scale, embedding,
           |    list_transform(embedding,
           |                   v -> floor(CAST(v AS DOUBLE) / scale + 0.5)) AS qs
           |  FROM b),
           |e AS (
           |  SELECT vec_id, scale, qs, embedding,
           |    list_transform(list_zip(qs, embedding),
           |      x -> abs(CAST(x[1] AS DOUBLE) * scale - CAST(x[2] AS DOUBLE))) AS errs
           |  FROM q)
           |SELECT vec_id, scale, CAST(qs[1] AS BIGINT) AS q_first,
           |  list_reduce(errs, (p, q2) -> greatest(p, q2)) AS max_err,
           |  list_reduce(errs, (p, q2) -> p + q2)
           |    / CAST(len(embedding) AS DOUBLE) AS mean_err
           |FROM e ORDER BY vec_id""".stripMargin))

  private val v15 = Entry("v15_persisted_ann_query",
    (s, dir) => {
      // The d19 production-threshold matcher served from the PERSISTED ANN
      // index: originals are indexed once (8 tables × 12-bit sign-LSH over
      // the portable planes, vectors + norms stored alongside — embIndex),
      // and the jittered twins arrive as a query batch. Per arrival:
      // bucket probes against the stored layout, exact cosine verification
      // against stored vectors only for candidates — at θ=0.9 the expected
      // match set is exactly each twin's own original (cosine ≈ 0.9998;
      // fixture cross-pairs all sit in [0.4, 0.6]). The oracle re-derives
      // everything from raw embeddings; the hash match proves the stored
      // index serves the identical answer, completing the d23/d24/d25
      // build–query–append triple for the embedding side.
      DedupIndex.queryEmbedding(s, embIndex(s, dir), hiDupTwin(s, dir),
          "vec_id", "embedding", threshold = 0.9,
          tables = 8, nBits = 12, dim = 64)
        .orderBy("vec_id")
    },
    Some(s"""WITH $hiDupCorpusSql,
           |planes AS (
           |  SELECT t.t, i.i,
           |    list_transform(range(0, 64), j ->
           |      CAST(CAST('0x' || substr(md5(t.t || ':' || i.i || ':' || j),
           |        1, 15) AS BIGINT) AS DOUBLE) / 576460752303423488 - 1) AS w
           |  FROM range(0, 8) t(t), range(0, 12) i(i)),
           |bits AS (
           |  SELECT v.vec_id, p.t,
           |    CAST(SUM(CASE WHEN list_reduce(list_transform(
           |        list_zip(p.w, v.dvec),
           |        x -> x[1] * x[2]), (a,b) -> a + b) >= 0
           |      THEN 1 << p.i ELSE 0 END) AS BIGINT) AS bucket
           |  FROM v, planes p GROUP BY v.vec_id, p.t),
           |cand AS (
           |  SELECT DISTINCT a.vec_id AS id_n, h.vec_id AS id_h
           |  FROM bits a JOIN bits h ON a.t = h.t AND a.bucket = h.bucket
           |  WHERE a.vec_id >= 1099511627776 AND h.vec_id < 1099511627776),
           |ver AS (
           |  SELECT c.id_n, c.id_h,
           |    list_reduce(list_transform(list_zip(x.dvec, y.dvec),
           |      p -> p[1] * p[2]), (a,b) -> a + b) / (x.nrm * y.nrm) AS cosine
           |  FROM cand c
           |  JOIN v x ON c.id_n = x.vec_id
           |  JOIN v y ON c.id_h = y.vec_id
           |  WHERE list_reduce(list_transform(list_zip(x.dvec, y.dvec),
           |      p -> p[1] * p[2]), (a,b) -> a + b) / (x.nrm * y.nrm) >= 0.9),
           |best AS (
           |  SELECT id_n, id_h, cosine,
           |    COUNT(*) OVER (PARTITION BY id_n) AS n_matches,
           |    row_number() OVER (PARTITION BY id_n
           |      ORDER BY cosine DESC, id_h) AS rn
           |  FROM ver)
           |SELECT a.vec_id,
           |  CAST(COALESCE(b.n_matches, 0) AS BIGINT) AS n_matches,
           |  COALESCE(b.id_h, -1) AS best_match_id,
           |  COALESCE(b.cosine, 0.0) AS best_cosine
           |FROM (SELECT vec_id + 1099511627776 AS vec_id FROM embeddings) a
           |LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.id_n = a.vec_id
           |ORDER BY vec_id""".stripMargin))

  // -------------------------------------------- streaming (batch-checked) --

  private val s01 = Entry("s01_tumbling_window",
    (s, dir) => {
      EventWindows.tumbling(Tables(s, dir, "events"), "1 hour")
        .orderBy("window_start", "event_type")
    },
    Some("""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type,
           |  COUNT(*) AS n_events,
           |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
           |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin))

  private val s02 = Entry("s02_sliding_window",
    (s, dir) => {
      EventWindows.sliding(Tables(s, dir, "events"), "1 hour", "30 minutes")
        .orderBy("window_start", "event_type")
    },
    Some("""WITH x AS (
           |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS ws, event_type, value FROM events
           |  UNION ALL
           |  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', event_type, value FROM events)
           |SELECT ws AS window_start, event_type, COUNT(*) AS n_events,
           |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
           |FROM x GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin))

  private val s03 = Entry("s03_session_window",
    (s, dir) => {
      EventWindows.sessions(Tables(s, dir, "events"), "30 minutes")
        .orderBy("user_id", "session_start")
    },
    Some("""WITH e AS (
           |  SELECT user_id, ts, value,
           |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
           |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           |              >= INTERVAL '30 minutes'
           |         THEN 1 ELSE 0 END AS new_s
           |  FROM events),
           |s AS (
           |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM e)
           |SELECT min(ts) AS session_start, user_id, COUNT(*) AS n_events,
           |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
           |FROM s GROUP BY user_id, sid
           |ORDER BY user_id, session_start""".stripMargin))

  private val s04 = Entry("s04_interval_join_batch",
    (s, dir) => {
      // Batch-equivalent of the stream-stream interval join (StreamingSpec
      // runs the watermarked streaming twin): each click paired with the
      // same user's purchases in the preceding 30 minutes. Equi-join on
      // user_id with the range riding as a post-join filter — never a
      // nested-loop range probe.
      val ev = Tables(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
      clicks.join(purchases, Seq("user_id"))
        .filter(col("p_ts") >= col("ts") - expr("INTERVAL 30 MINUTES") &&
          col("p_ts") <= col("ts"))
        .select("click_id", "purchase_id")
        .orderBy("click_id", "purchase_id")
    },
    Some("""SELECT c.event_id AS click_id, p.event_id AS purchase_id
           |FROM events c JOIN events p
           |  ON c.event_type = 'click' AND p.event_type = 'purchase'
           | AND c.user_id = p.user_id
           | AND p.ts BETWEEN c.ts - INTERVAL 30 MINUTE AND c.ts
           |ORDER BY click_id, purchase_id""".stripMargin))

  private val s05 = Entry("s05_interval_join_outer",
    (s, dir) => {
      // Batch twin of the stream-stream LEFT OUTER interval join (the
      // watermark-bounded outer join Structured Streaming emits once the
      // unmatched side expires): every click, matched purchases within the
      // trailing 30 minutes or NULL — rolled up per user so the output is
      // small and total-ordered. Same equi-join + range-filter shape as
      // s04; the outer rows are what the streaming engine holds in state.
      val ev = Tables(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user_id"), col("ts").as("p_ts"),
          col("event_id").as("purchase_id"))
      clicks.join(purchases,
          col("user_id") === col("p_user_id") &&
            col("p_ts") >= col("ts") - expr("INTERVAL 30 MINUTES") &&
            col("p_ts") <= col("ts"),
          "left")
        .groupBy("user_id")
        .agg(count_distinct(col("click_id")).as("n_clicks"),
          count(col("purchase_id")).as("n_matched_purchases"))
        .orderBy("user_id")
    },
    Some("""SELECT c.user_id, COUNT(DISTINCT c.event_id) AS n_clicks,
           |  COUNT(p.event_id) AS n_matched_purchases
           |FROM (SELECT * FROM events WHERE event_type = 'click') c
           |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
           |  ON c.user_id = p.user_id
           | AND p.ts BETWEEN c.ts - INTERVAL 30 MINUTE AND c.ts
           |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin))

  private val s06 = Entry("s06_funnel_steps",
    (s, dir) => {
      // Sequential funnel over the event stream: users who clicked, then
      // purchased strictly after their first click, then signed up strictly
      // after that first qualifying purchase. Each step is one aggregate +
      // one equi-join on user_id — the strictly-ordered semantics (NOT
      // min-per-type, which miscounts users whose purchases straddle the
      // first click) without any per-user sequence scan.
      val ev = Tables(s, dir, "events")
      def step(evType: String) = ev.filter(col("event_type") === evType)
      val s1 = step("click").groupBy("user_id").agg(min(col("ts")).as("t1"))
      val s2 = step("purchase").join(s1, Seq("user_id"))
        .filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min(col("ts")).as("t2"))
      val s3 = step("signup").join(s2, Seq("user_id"))
        .filter(col("ts") > col("t2"))
        .groupBy("user_id").agg(min(col("ts")).as("t3"))
      val one = (df: org.apache.spark.sql.DataFrame, n: Int, label: String) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(n).as("step"), lit(label).as("event"), col("n_users"))
      one(s1, 1, "click")
        .unionByName(one(s2, 2, "purchase"))
        .unionByName(one(s3, 3, "signup"))
        .orderBy("step")
    },
    Some("""WITH s1 AS (
           |  SELECT user_id, MIN(ts) AS t1 FROM events
           |  WHERE event_type = 'click' GROUP BY user_id),
           |s2 AS (
           |  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
           |  JOIN s1 ON e.user_id = s1.user_id
           |  WHERE e.event_type = 'purchase' AND e.ts > s1.t1
           |  GROUP BY e.user_id),
           |s3 AS (
           |  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
           |  JOIN s2 ON e.user_id = s2.user_id
           |  WHERE e.event_type = 'signup' AND e.ts > s2.t2
           |  GROUP BY e.user_id)
           |SELECT 1 AS step, 'click' AS event, COUNT(*) AS n_users FROM s1
           |UNION ALL
           |SELECT 2, 'purchase', COUNT(*) FROM s2
           |UNION ALL
           |SELECT 3, 'signup', COUNT(*) FROM s3
           |ORDER BY step""".stripMargin))

  private val s07 = Entry("s07_cumulative_users",
    (s, dir) => {
      // Daily active users + running cumulative distinct users — the
      // growth dashboard every event stream feeds. The cumulative count
      // is NOT a running count-distinct (unbounded state): each user
      // collapses to a first-seen day (exactly the state a streaming
      // `dropDuplicates("user_id")` would keep), then a per-day new-user
      // count and a running sum. The only window runs over the per-DAY
      // rows — ~30 here, bounded by the calendar at any scale — so the
      // single-partition window is a non-issue; everything user-sized is
      // a hash aggregate.
      val ev = Tables(s, dir, "events")
        .select(to_date(col("ts")).as("day"), col("user_id"))
      val dau = ev.groupBy("day").agg(count_distinct(col("user_id")).as("dau"))
      val newUsers = ev.groupBy("user_id").agg(min(col("day")).as("day"))
        .groupBy("day").agg(count(lit(1)).as("new_users"))
      dau.join(newUsers, Seq("day"), "left")
        .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
        .withColumn("cum_users", sum(col("new_users")).over(
          Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy("day")
    },
    Some("""WITH ev AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
           |dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM ev GROUP BY 1),
           |fs AS (SELECT user_id, MIN(day) AS day FROM ev GROUP BY 1),
           |nu AS (SELECT day, COUNT(*) AS new_users FROM fs GROUP BY 1)
           |SELECT d.day, d.dau, COALESCE(nu.new_users, 0) AS new_users,
           |  CAST(SUM(COALESCE(nu.new_users, 0)) OVER (ORDER BY d.day
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
           |FROM dau d LEFT JOIN nu ON d.day = nu.day
           |ORDER BY d.day""".stripMargin))

  private val s09 = Entry("s09_late_data_audit",
    (s, dir) => {
      // Watermark late-data accounting, batch twin: how many rows would a
      // streaming watermark have dropped? Arrival is simulated with a
      // deterministic per-event network delay (event_id % 37 minutes) and
      // bucketed into hourly arrival batches; the watermark advances
      // per batch exactly as Structured Streaming's does — max event time
      // seen in PRIOR batches minus the 10-minute delay. The running max
      // runs over the tiny per-batch summary (one row per hour), never
      // over events, and broadcasts back — the only per-event work is a
      // batch-key join and a comparison.
      val ev = Tables(s, dir, "events")
        .withColumn("batch", date_trunc("hour",
          expr("ts + (event_id % 37) * INTERVAL '1' MINUTE")))
      val perBatch = ev.groupBy("batch").agg(max("ts").as("bmax"))
      val wmW = Window.orderBy("batch")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wm = perBatch
        .withColumn("wm", max(col("bmax")).over(wmW) - expr("INTERVAL '10' MINUTE"))
        .select("batch", "wm")
      ev.join(broadcast(wm), Seq("batch"))
        .withColumn("late", col("wm").isNotNull && col("ts") < col("wm"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("late"), 1L).otherwise(0L)).as("n_late"))
        .orderBy("event_type")
    },
    Some("""WITH b AS (
           |  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts,
           |    date_trunc('hour', CAST(ts AS TIMESTAMP)
           |      + (event_id % 37) * INTERVAL 1 MINUTE) AS batch
           |  FROM events),
           |m AS (SELECT batch, MAX(ts) AS bmax FROM b GROUP BY batch),
           |w AS (SELECT batch, MAX(bmax) OVER (ORDER BY batch
           |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           |  - INTERVAL 10 MINUTE AS wm FROM m)
           |SELECT event_type, COUNT(*) AS n_events,
           |  CAST(SUM(CASE WHEN w.wm IS NOT NULL AND b.ts < w.wm
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_late
           |FROM b JOIN w USING (batch)
           |GROUP BY event_type ORDER BY event_type""".stripMargin))

  private val s08 = Entry("s08_stream_static_enrich",
    (s, dir) => {
      // Stream-static enrichment, batch twin: each event joined to the
      // static customer dimension (user_id = custkey) and rolled up per
      // (market segment, event type). The dim side is BROADCAST — in the
      // streaming form (StreamingSpec runs the readStream twin) Spark
      // re-broadcasts the static side per micro-batch and the stream side
      // never shuffles, which is exactly the 100 TB shape: a fact stream
      // enriched by a small dimension must never hash-partition the fact.
      val ev = Tables(s, dir, "events")
      val dim = Tables(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      ev.join(broadcast(dim), Seq("user_id"))
        .groupBy(col("c_mktsegment").as("segment"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
        .orderBy("segment", "event_type")
    },
    Some("""SELECT c.c_mktsegment AS segment, e.event_type,
           |  COUNT(*) AS n_events,
           |  CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
           |FROM events e JOIN customer c ON e.user_id = c.c_custkey
           |GROUP BY 1, 2 ORDER BY segment, event_type""".stripMargin))

  // ----------------------------------------------------- ingest dataflow --

  /** Deterministic crawler-shaped raw records synthesized from `documents`:
    * some google.com links (filtered, I3), some null links, some too-short
    * titles (I4), HTML tags + control chars to clean (I6), null publishers
    * defaulting to "Google News" (I7). */
  private def rawArticles(docs: org.apache.spark.sql.DataFrame) =
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 13 === 1, lit(null).cast("string"))
        .when(col("doc_id") % 10 === 0, concat(lit("http://google.com/"), col("doc_id")))
        .otherwise(concat(lit("http://news.example/"), col("doc_id"))).as("link"),
      when(col("doc_id") % 11 === 2, lit("abc "))
        .otherwise(concat(lit("<b>"), substring(col("text"), 1, 40), lit("</b>\t"))).as("title"),
      when(col("source") === "src0", lit(null).cast("string"))
        .otherwise(col("source")).as("publisher"),
      concat(lit("<p>"), col("text"), lit("</p>\n")).as("content"))

  private val rawSql =
    """raw AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 13 = 1 THEN NULL
      |         WHEN doc_id % 10 = 0 THEN 'http://google.com/' || CAST(doc_id AS VARCHAR)
      |         ELSE 'http://news.example/' || CAST(doc_id AS VARCHAR) END AS link,
      |    CASE WHEN doc_id % 11 = 2 THEN 'abc '
      |         ELSE '<b>' || substring(text, 1, 40) || '</b>' || chr(9) END AS title,
      |    CASE WHEN source = 'src0' THEN NULL ELSE source END AS publisher,
      |    '<p>' || text || '</p>' || chr(10) AS content
      |  FROM documents)""".stripMargin

  private val cleanSqlTitle =
    "trim(regexp_replace(regexp_replace(regexp_replace(title, '<[^>]*>', '', 'g'), '[\\n\\t\\r]', ' ', 'g'), chr(8203), '', 'g'))"
  private val cleanSqlContent =
    "trim(regexp_replace(regexp_replace(regexp_replace(COALESCE(content, ''), '<[^>]*>', '', 'g'), '[\\n\\t\\r]', ' ', 'g'), chr(8203), '', 'g'))"

  private val i01 = Entry("i01_ingest_pipeline",
    (s, dir) => {
      graft.ingest.ArticleIngest.accepted(rawArticles(Tables(s, dir, "documents")))
        .orderBy("link")
    },
    Some(s"""WITH $rawSql
            |SELECT $cleanSqlTitle AS title, link,
            |  COALESCE(publisher, 'Google News') AS publisher,
            |  $cleanSqlContent AS content
            |FROM raw
            |WHERE link IS NOT NULL AND NOT contains(link, 'google.com')
            |  AND length(trim(COALESCE(title, ''))) >= 5
            |ORDER BY link""".stripMargin))

  private val i02 = Entry("i02_dead_letter",
    (s, dir) => {
      graft.ingest.ArticleIngest.deadLetter(rawArticles(Tables(s, dir, "documents")))
        .select(col("doc_id"), col("reject_reason"))
        .orderBy("doc_id")
    },
    Some(s"""WITH $rawSql
            |SELECT doc_id,
            |  CASE WHEN link IS NULL OR contains(link, 'google.com') THEN 'bad_link'
            |       WHEN length(trim(COALESCE(title, ''))) < 5 THEN 'short_title' END AS reject_reason
            |FROM raw
            |WHERE link IS NULL OR contains(link, 'google.com')
            |   OR length(trim(COALESCE(title, ''))) < 5
            |ORDER BY doc_id""".stripMargin))

  private val i03 = Entry("i03_ingest_upsert",
    (s, dir) => {
      val g = graft.ingest.ArticleIngest.upsert(
        graft.graph.PropertyGraph.empty(s),
        rawArticles(Tables(s, dir, "documents")))
      g.nodes.groupBy("label").agg(count(lit(1)).as("n")).orderBy("label")
    },
    Some(s"""WITH $rawSql,
            |acc AS (
            |  SELECT link, COALESCE(publisher, 'Google News') AS publisher FROM raw
            |  WHERE link IS NOT NULL AND NOT contains(link, 'google.com')
            |    AND length(trim(COALESCE(title, ''))) >= 5)
            |SELECT 'Article' AS label, COUNT(DISTINCT link) AS n FROM acc
            |UNION ALL
            |SELECT 'Publisher' AS label, COUNT(DISTINCT publisher) AS n FROM acc
            |ORDER BY label""".stripMargin))

  private val i04 = Entry("i04_detail_enrichment",
    (s, dir) => {
      // I5 per-row detail-page enrichment: mapPartitions with one client per
      // partition, timeout, the reference's 4-selector fallback chain, and
      // empty-content degradation on every failure mode
      // (/root/reference/src/crwling.py:71-87). The stand-in server derives
      // page HTML deterministically from the URL, so the enriched output has
      // a closed relational form the oracle reproduces.
      import s.implicits._
      val reqs = Tables(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"),
          concat(lit("http://news.example/"), col("doc_id")).as("link"))
        .as[graft.ingest.DetailRequest]
      graft.ingest.Enrichment.enrichArticles(reqs).toDF().orderBy("doc_id")
    },
    Some("""SELECT CAST(doc_id AS BIGINT) AS doc_id,
           |  'http://news.example/' || CAST(doc_id AS VARCHAR) AS link,
           |  CASE WHEN doc_id % 13 = 3 OR doc_id % 17 = 5 THEN ''
           |       ELSE 'Body ' || CAST(doc_id AS VARCHAR) || ' via ' ||
           |            CASE CAST(doc_id % 4 AS INT)
           |                 WHEN 0 THEN 'dic_area'
           |                 WHEN 1 THEN 'articleBodyContents'
           |                 WHEN 2 THEN 'se-main-container'
           |                 ELSE 'articleBody' END
           |       END AS content,
           |  CASE WHEN doc_id % 13 = 3 THEN 'timeout'
           |       WHEN doc_id % 17 = 5 THEN 'no_content'
           |       ELSE 'ok' END AS fetch_status
           |FROM documents ORDER BY doc_id""".stripMargin))

  private val i05 = Entry("i05_format_roundtrip",
    (s, dir) => {
      // Source/sink breadth beyond parquet: the same records written to and
      // read back from JSON-lines and CSV (quoted/escaped, multiline-safe),
      // unioned, then aggregated — the oracle sees exactly double the
      // parquet-side counts iff both round trips preserve every row and
      // every text byte.
      val docs = Tables(s, dir, "documents").select("doc_id", "lang", "text")
      val tmp = System.getProperty("java.io.tmpdir") +
        "/graft_roundtrip_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      docs.write.mode("overwrite").json(tmp + "/json")
      docs.write.mode("overwrite")
        .option("header", "true").option("escape", "\"")
        .csv(tmp + "/csv")
      val j = s.read.schema(docs.schema).json(tmp + "/json")
      val c = s.read.schema(docs.schema)
        .option("header", "true").option("multiLine", "true").option("escape", "\"")
        .csv(tmp + "/csv")
      j.unionByName(c)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).cast("long").as("total_chars"))
        .orderBy("lang")
    },
    Some("""SELECT lang, 2 * COUNT(*) AS n_docs,
           |  CAST(2 * SUM(length(text)) AS BIGINT) AS total_chars
           |FROM documents GROUP BY lang ORDER BY lang""".stripMargin))

  private val i10 = Entry("i10_text_binary_roundtrip",
    (s, dir) => {
      // The remaining built-in source pair beyond i05/i06's
      // JSON/CSV/ORC: line-oriented `text` (write + read) and the
      // `binaryFile` whole-file reader (the raw-bytes entry point the
      // multimodal m-series assumes upstream of parquet). Every output
      // fact is partitioning-independent — line count, character count,
      // and TOTAL file bytes (= Σ utf-8 bytes + one newline per line;
      // how many files the writer produced is deliberately NOT a fact,
      // it changes with parallelism) — so the oracle reconstructs all
      // three from the documents table alone. The corpus is single-line
      // by construction, which is exactly the text source's contract.
      val docs = Tables(s, dir, "documents")
      val tmp = System.getProperty("java.io.tmpdir") +
        "/graft_textdir_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      docs.select(col("text")).write.mode("overwrite").text(tmp)
      val lines = s.read.text(tmp)
        .agg(count(lit(1)).as("n_lines"),
          sum(length(col("value"))).cast("long").as("total_chars"))
      val bytes = s.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt").load(tmp)
        .agg(sum(col("length")).cast("long").as("total_file_bytes"))
      lines.crossJoin(bytes)
    },
    Some("""SELECT COUNT(*) AS n_lines,
           |  CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           |  CAST(SUM(strlen(text)) + COUNT(*) AS BIGINT) AS total_file_bytes
           |FROM documents""".stripMargin))

  private val s10 = Entry("s10_two_level_window",
    (s, dir) => {
      // Chained windowed aggregation: 5-minute partials → hourly
      // re-aggregate (sum/max/count over the fine windows). The batch
      // twin of the streaming ladder StreamingSpec runs with a
      // watermark; the coarse stage reads one row per fine window, not
      // per event — the 100 TB pre-aggregation shape.
      EventWindows.twoLevel(Tables(s, dir, "events"), "5 minutes", "1 hour")
        .orderBy("window_start", "event_type")
    },
    Some("""WITH f AS (
           |  SELECT time_bucket(INTERVAL '5 minutes', ts) AS fw, event_type,
           |    COUNT(*) AS n_fine_events,
           |    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS fine_value
           |  FROM events GROUP BY 1, 2)
           |SELECT CAST(time_bucket(INTERVAL '1 hour', fw) AS TIMESTAMP) AS window_start,
           |  event_type,
           |  CAST(SUM(n_fine_events) AS BIGINT) AS n_events,
           |  CAST(SUM(CAST(fine_value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
           |  COUNT(*) AS n_fine_windows,
           |  MAX(n_fine_events) AS peak_fine_events
           |FROM f GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin))

  private val s11 = Entry("s11_stream_dedup_batch",
    (s, dir) => {
      // Batch twin of streaming dropDuplicates-within-watermark: the
      // fixture re-delivers every 5th event 7 minutes later; dedup keeps
      // the FIRST arrival per event_id (exactly the state the streaming
      // operator holds until the watermark passes). The report carries
      // both the ingested and the deduped counts so the dedup is
      // observable, not assumed. One window shuffle on event_id.
      val ev = Tables(s, dir, "events")
      val redelivered = ev.filter(col("event_id") % 5 === 0)
        .withColumn("ts", col("ts") + expr("interval 7 minutes"))
      val all = ev.unionByName(redelivered)
      val w = Window.partitionBy("event_id").orderBy(col("ts"))
      val deduped = all.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
      deduped.groupBy("event_type")
        .agg(count(lit(1)).as("n_unique"),
          sum(col("value").cast(
            org.apache.spark.sql.types.DataTypes.createDecimalType(12, 2)))
            .cast("double").as("total_value"))
        .join(all.groupBy("event_type").agg(count(lit(1)).as("n_ingested")),
          Seq("event_type"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, COUNT(*) AS n_unique,
           |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
           |  COUNT(*) + COUNT(CASE WHEN event_id % 5 = 0 THEN 1 END) AS n_ingested
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  private val s12 = Entry("s12_custom_state_sessions",
    (s, dir) => {
      // Gap sessionization as an EXPLICIT flatMapGroupsWithState state
      // machine (graft.streaming.Sessionize) — the custom-state streaming
      // path, batch-checked: s03 covers the built-in session_window; this
      // entry covers the API a pipeline reaches for when per-session
      // logic needs ordered iteration (here: integer session span in
      // minutes). The SAME step function runs incrementally under
      // Structured Streaming with state carried across micro-batches
      // (StreamingSpec asserts batch ≡ streamed-in-batches). Output: the
      // session-size histogram + total span minutes — bounded by the
      // distinct session sizes. All compared values are exact integers.
      import s.implicits._
      // tz-free µs: wall-clock delta from the epoch NTZ literal —
      // unix_micros() would re-interpret the NTZ value in the session
      // timezone, which Bench/Verify don't pin identically
      val ev = Tables(s, dir, "events")
        .select(col("user_id"),
          expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
            .as("tu"),
          col("event_id"))
        .as[graft.streaming.Sessionize.EvRow]
      val sessions = graft.streaming.Sessionize.sessions(
        graft.streaming.Sessionize.withSentinels(s, ev))
      sessions.toDF()
        .groupBy("n_events")
        .agg(count(lit(1)).as("n_sessions"),
          sum("span_min").cast("long").as("total_span_min"))
        .orderBy("n_events")
    },
    Some("""WITH e AS (
           |  SELECT user_id, epoch_us(ts) AS tu, event_id,
           |    CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
           |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           |              >= 1800000000 THEN 1 ELSE 0 END AS new_s
           |  FROM events),
           |s AS (
           |  SELECT user_id, tu,
           |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY tu, event_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM e),
           |g AS (
           |  SELECT user_id, sid, COUNT(*) AS n_events,
           |    (MAX(tu) - MIN(tu)) // 60000000 AS span FROM s GROUP BY 1, 2)
           |SELECT CAST(n_events AS INT) AS n_events, COUNT(*) AS n_sessions,
           |  CAST(SUM(span) AS BIGINT) AS total_span_min
           |FROM g GROUP BY 1 ORDER BY 1""".stripMargin))

  private val s13 = Entry("s13_streaming_live_index",
    (s, dir) => {
      // Streamed ingest against a LIVE vector index (round 13 — the
      // integration the reference's crawler loop actually is: a
      // continuous per-batch MERGE+embed feeding retrieval): the index is
      // created over an EMPTY corpus, the embeddings arrive in fixed
      // 1000-row micro-batches through LangChain's batched add_embeddings
      // statement, and a retrieval probe runs BETWEEN batches — every
      // maintenance step is the incremental patch (StreamingSpec pins
      // exactly one full build and per-batch patches; the true
      // foreachBatch wiring is spec'd there too). The final 8-query
      // top-k hashes against c68's oracle VERBATIM: the streamed,
      // patched index state is byte-identical to the one-shot build.
      val emb = Tables(s, dir, "embeddings")
      val sess = new graft.cypher.CypherSession(
        graft.graph.PropertyGraph.empty(s),
        keyProps = Map("Doc" -> "vec_id"))
      sess.run(
        """CREATE VECTOR INDEX docEmb FOR (d:Doc) ON d.embedding
          |OPTIONS {indexConfig: {`vector.dimensions`: 64,
          |  `vector.similarity_function`: 'cosine'}}""".stripMargin)
      val qids = Seq(0L, 7L, 42L, 99L, 123L, 250L, 381L, 499L)
      val byId = emb.filter(col("vec_id").isin(qids: _*))
        // bounded: the 8 fixed query ids
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
      // CONSTANT micro-batch size (VERDICT r13 #3): each per-batch collect
      // is bounded by BatchRows — a fixed client-batch constant, never a
      // corpus fraction — so the entry's driver-side $data stays honest at
      // any fixture scale (a LangChain client embeds and hands over rows
      // in bounded chunks; the corpus only decides HOW MANY chunks).
      // Batches slice by ROW RANK, not id arithmetic: the sf1 derivation
      // shifts replica ids by 1e6·k, so id-range slices would mostly be
      // empty (9000+ no-op statements at sf1) while rank bounds always
      // yield ceil(N/BatchRows) full batches on any id distribution.
      val BatchRows = 1000
      // Rank via sorted zipWithIndex, NOT row_number over a global
      // Window (VERDICT r14 #4: an unpartitioned window funnels every
      // vec_id through ONE task — at 10⁹ vectors that's the whole id
      // column in a single partition). The sort is a distributed
      // range-partitioned exchange and zipWithIndex assigns the global
      // rank per-partition from partition sizes; per-batch (lo, hi)
      // reduce map-side. Same ranks, same bounds, hash-identical.
      val bounds = emb.select(col("vec_id")).orderBy("vec_id")
        .rdd.map(_.getLong(0)).zipWithIndex()
        .map { case (id, idx) => (idx / BatchRows, (id, id)) }
        .reduceByKey((a: (Long, Long), b: (Long, Long)) =>
          (math.min(a._1, b._1), math.max(a._2, b._2)))
        // bounded: one (lo, hi) pair per 1000-row batch — batch METADATA,
        // ~N/1000 longs, never the rows themselves
        .collect().sortBy(_._1)
      bounds.foreach { case (_, (lo, hi)) =>
        // bounded: one fixed-size client batch (≤ BatchRows rows)
        val batch = emb.filter(col("vec_id") >= lo && col("vec_id") <= hi)
          .select(col("vec_id"), col("embedding")).collect().map(r2 =>
            Map("id" -> r2.getLong(0).toString,
              "embedding" -> r2.getSeq[Float](1).map(_.toDouble)))
        sess.run(
          """UNWIND $data AS row
            |MERGE (d:Doc {vec_id: row.id})
            |WITH d, row
            |CALL db.create.setNodeVectorProperty(d, 'embedding', row.embedding)"""
            .stripMargin, Map("data" -> batch.toSeq))
        // the add→query loop: retrieval stays LIVE between batches
        sess.run(
          "CALL db.index.vector.queryNodes('docEmb', 3, $q) " +
            "YIELD node, score RETURN node.vec_id AS hit",
          Map("q" -> byId(0L)))
          // bounded: top-k probe rows (k=3)
          .asInstanceOf[graft.cypher.CypherRows].df.collect()
      }
      qids.map { qid =>
        sess.run(
          """CALL db.index.vector.queryNodes('docEmb', 10, $q)
            |YIELD node, score
            |RETURN node.vec_id AS hit, score""".stripMargin,
          Map("q" -> byId(qid)))
          .asInstanceOf[graft.cypher.CypherRows].df
          .select(lit(qid).as("qid"), col("hit").cast("long").as("hit"),
            col("score"))
      }.reduce(_ unionByName _)
        .orderBy(col("qid"), col("score").desc, col("hit"))
    },
    Some(vectorIndexTopkOracleSql))

  private val i06 = Entry("i06_orc_roundtrip",
    (s, dir) => {
      // Columnar-sink breadth: ORC (Spark's second first-class columnar
      // format — predicate pushdown, column pruning, zlib). Write the
      // fact slice to ORC, read it back, aggregate — counts and exact
      // decimal sums survive iff the round trip preserves every row and
      // the timestamp/decimal encodings agree.
      val li = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1998-06-01").cast("timestamp"))
        .select("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice")
      val tmp = System.getProperty("java.io.tmpdir") +
        "/graft_orc_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      li.write.mode("overwrite").orc(tmp)
      s.read.orc(tmp)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast("long")).as("total_qty"),
          sum(col("l_extendedprice").cast(
            org.apache.spark.sql.types.DataTypes.createDecimalType(12, 2)))
            .cast("double").as("total_price"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, COUNT(*) AS n_lines,
           |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
           |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-06-01'
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  private val i07 = Entry("i07_partitioned_sink",
    (s, dir) => {
      // Hive-style partitioned sink + partition-pruned read-back: orders
      // written partitionBy(o_orderpriority), then ONE priority read
      // back — the scan touches only that partition directory
      // (PartitionFilters asserted in PlanSpec). This is the layout
      // every warehouse fact table ships with; at 100 TB the prune is
      // the difference between reading 1/5th and reading everything.
      val ord = Tables(s, dir, "orders")
      val tmp = System.getProperty("java.io.tmpdir") +
        "/graft_part_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      ord.write.mode("overwrite").partitionBy("o_orderpriority").parquet(tmp)
      s.read.parquet(tmp)
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(
            org.apache.spark.sql.types.DataTypes.createDecimalType(12, 2)))
            .cast("double").as("total_price"))
        .orderBy("o_orderstatus")
    },
    Some("""SELECT o_orderstatus, COUNT(*) AS n_orders,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
           |FROM orders WHERE o_orderpriority = '1-URGENT'
           |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))

  private val i08 = Entry("i08_small_file_compaction",
    (s, dir) => {
      // The small-files problem, end to end: a fragmented landing zone
      // (64 shuffle-partition files for a tiny table — exactly what a
      // high-parallelism streaming sink leaves behind) compacted to
      // size-appropriate files, then read back. Correctness = the
      // compacted store returns byte-identical aggregates; the file-count
      // drop itself is asserted in IngestSpec. At 100 TB compaction is a
      // maintenance pass every table needs or NameNode/listing costs eat
      // the cluster.
      val docs = Tables(s, dir, "documents")
      val tmp = System.getProperty("java.io.tmpdir") +
        "/graft_compact_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      docs.repartition(64).write.mode("overwrite").parquet(tmp + "/landing")
      s.read.parquet(tmp + "/landing")
        .coalesce(1) // fixture-sized target; real stores size by bytes
        .write.mode("overwrite").parquet(tmp + "/compacted")
      s.read.parquet(tmp + "/compacted")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).cast("long").as("total_chars"))
        .orderBy("lang")
    },
    Some("""SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(length(text)) AS BIGINT) AS total_chars
           |FROM documents GROUP BY lang ORDER BY lang""".stripMargin))

  private val i09 = Entry("i09_schema_evolution",
    (s, dir) => {
      // Schema evolution across landing batches: batch 1 wrote the
      // original 3 columns, batch 2 arrives with two new ones
      // (n_chars, source). mergeSchema reconciles the union schema at
      // read time; old rows surface NULLs for the new columns and the
      // aggregate COALESCEs around them — the additive-evolution
      // contract a long-lived lakehouse table lives by.
      val docs = Tables(s, dir, "documents")
      val tmp = System.getProperty("java.io.tmpdir") +
        "/graft_evol_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      docs.filter(col("doc_id") % 2 === 0)
        .select("doc_id", "lang", "text")
        .write.mode("overwrite").parquet(tmp + "/b1")
      docs.filter(col("doc_id") % 2 === 1)
        .select("doc_id", "lang", "text", "n_chars", "source")
        .write.mode("overwrite").parquet(tmp + "/b2")
      s.read.option("mergeSchema", "true").parquet(tmp + "/b1", tmp + "/b2")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          count(col("source")).as("n_with_source"),
          sum(coalesce(col("n_chars"), length(col("text")).cast("long")))
            .cast("long").as("chars_est"))
        .orderBy("lang")
    },
    Some("""SELECT lang, COUNT(*) AS n_docs,
           |  COUNT(CASE WHEN doc_id % 2 = 1 THEN 1 END) AS n_with_source,
           |  CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars
           |    ELSE length(text) END) AS BIGINT) AS chars_est
           |FROM documents GROUP BY lang ORDER BY lang""".stripMargin))

  private val i11 = Entry("i11_malformed_ingest",
    (s, dir) => {
      // File-level parse-fault isolation — the landing-zone twin of i02's
      // dataflow dead-letter: a CSV batch arrives with deterministically
      // corrupted rows (every doc_id % 50 == 0 carries a non-numeric
      // n_chars), and the PERMISSIVE reader must keep every row, null the
      // unparseable field, and capture the raw line in the corrupt-record
      // column — per-file fault isolation without failing the batch or
      // silently dropping rows (DROPMALFORMED's failure mode at 100 TB:
      // data loss nobody alarms on). The oracle recomputes good/bad per
      // language from the injection rule.
      val docs = Tables(s, dir, "documents")
      val tmp = System.getProperty("java.io.tmpdir") +
        "/graft_malformed_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      docs.select(concat(
          col("doc_id"), lit(","), col("lang"), lit(","),
          when(col("doc_id") % 50 === 0, lit("oops"))
            .otherwise(col("n_chars").cast("string"))).as("value"))
        .write.mode("overwrite").text(tmp)
      s.read
        .schema("doc_id LONG, lang STRING, n_chars LONG, _corrupt STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(tmp)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_rows"),
          count(when(col("_corrupt").isNull, 1)).as("n_good"),
          count(col("_corrupt")).as("n_bad"),
          sum(coalesce(col("n_chars"), lit(0L))).as("chars_parsed"))
        .orderBy("lang")
    },
    Some("""SELECT lang, COUNT(*) AS n_rows,
           |  COUNT(CASE WHEN doc_id % 50 <> 0 THEN 1 END) AS n_good,
           |  COUNT(CASE WHEN doc_id % 50 = 0 THEN 1 END) AS n_bad,
           |  CAST(SUM(CASE WHEN doc_id % 50 <> 0 THEN n_chars ELSE 0 END)
           |    AS BIGINT) AS chars_parsed
           |FROM documents GROUP BY lang ORDER BY lang""".stripMargin))

  // ------------------------------------------------------- cypher front end --

  private val c01 = Entry("c01_cypher_label_scan",
    (s, dir) => {
      // The reference's read-back query shape (/root/reference/main.py:17,
      // LIMIT 25 per cypher.txt:8) through the Cypher front end — must
      // hash-match the same oracle as the DSL version (g01).
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (a:Article)
                 |RETURN a.doc_id AS key, a.title AS title, a.lang AS lang
                 |ORDER BY key LIMIT 25""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT CAST(doc_id AS VARCHAR) AS key, substring(text, 1, 30) AS title, lang
           |FROM documents ORDER BY key LIMIT 25""".stripMargin))

  private val c02 = Entry("c02_cypher_one_hop",
    (s, dir) => {
      // Q10 pattern-match join through the front end: article→publisher
      // pairs, oracle-checked against a plain SQL join.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (a:Article)-[:WRITTEN_BY]->(p:Publisher)
                 |RETURN a.doc_id AS doc_key, p.name AS publisher
                 |ORDER BY doc_key""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT CAST(doc_id AS VARCHAR) AS doc_key, source AS publisher
           |FROM documents ORDER BY doc_key""".stripMargin))

  private val c03 = Entry("c03_cypher_where",
    (s, dir) => {
      // WHERE + AND predicates through the front end (property comparison
      // lowered to pushed-down column filters on the node scan).
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (a:Article)
                 |WHERE a.lang = 'en' AND a.doc_id < '2000'
                 |RETURN a.doc_id AS key, a.lang AS lang
                 |ORDER BY key LIMIT 100""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT CAST(doc_id AS VARCHAR) AS key, lang
           |FROM documents
           |WHERE lang = 'en' AND CAST(doc_id AS VARCHAR) < '2000'
           |ORDER BY key LIMIT 100""".stripMargin))

  private val c04 = Entry("c04_cypher_var_length",
    (s, dir) => {
      // Variable-length pattern -[:WRITTEN_BY*1..2]-> through the front end:
      // hop-union expansion (one equi-join per extra hop). On the bipartite
      // doc graph the 2-hop term is empty, which the oracle verifies — the
      // result must be exactly the 1-hop pairs, with no spurious walks.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (a:Article)-[:WRITTEN_BY*1..2]->(p)
                 |RETURN a.doc_id AS doc_key, p.name AS target
                 |ORDER BY doc_key, target""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT CAST(doc_id AS VARCHAR) AS doc_key, source AS target
           |FROM documents ORDER BY doc_key, target""".stripMargin))

  private val c05 = Entry("c05_cypher_count",
    (s, dir) => {
      // count() with Cypher's implicit grouping (articles per publisher) —
      // lowers to groupBy + count; the aggregate pushes partial map-side.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (a:Article)-[:WRITTEN_BY]->(p:Publisher)
                 |RETURN p.name AS publisher, count(a) AS n_articles
                 |ORDER BY n_articles DESC, publisher""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT source AS publisher, count(*) AS n_articles
           |FROM documents GROUP BY source
           |ORDER BY n_articles DESC, publisher""".stripMargin))

  private val c06 = Entry("c06_cypher_with_having",
    (s, dir) => {
      // WITH aggregation pipeline: boolean WHERE tree (OR) on the scan,
      // implicit grouping at the WITH horizon, alias HAVING after it — the
      // aggregate runs partial map-side like any groupBy.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (a:Article)-[:WRITTEN_BY]->(p:Publisher)
                 |WHERE a.lang = 'en' OR a.lang = 'de'
                 |WITH p.name AS publisher, count(a) AS n_articles
                 |WHERE n_articles >= 15 OR publisher = 'src10'
                 |RETURN publisher, n_articles
                 |ORDER BY n_articles DESC, publisher""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""WITH g AS (
           |  SELECT source AS publisher, COUNT(*) AS n_articles
           |  FROM documents WHERE lang = 'en' OR lang = 'de'
           |  GROUP BY source)
           |SELECT publisher, n_articles FROM g
           |WHERE n_articles >= 15 OR publisher = 'src10'
           |ORDER BY n_articles DESC, publisher""".stripMargin))

  private val c07 = Entry("c07_cypher_pipeline_collect",
    (s, dir) => {
      // MATCH…WITH…MATCH pipeline: the publisher binding carries across the
      // WITH horizon and the second MATCH extends from it (no re-scan
      // cross join — the pattern join starts at the bound id); NOT/OR
      // predicate tree; sum routes the string property bag through DOUBLE
      // (integer-valued, so order-independent); collect is canonical-sorted.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (p:Publisher)
                 |WITH p
                 |MATCH (p)<-[:WRITTEN_BY]-(a:Article)
                 |WHERE NOT (a.lang = 'fr' OR a.lang = 'es')
                 |RETURN p.name AS publisher, count(a) AS n_docs,
                 |       sum(a.doc_id) AS id_sum,
                 |       collect(DISTINCT a.lang) AS langs
                 |ORDER BY publisher""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
        // The Cypher surface returns collect() as a real array; the catalog
        // entry flattens it to a joined string because the driver's row
        // canonicalization cannot sort array cells. collect is already
        // canonical-sorted, so the join is deterministic.
        .withColumn("langs", array_join(col("langs"), ","))
    },
    Some("""SELECT source AS publisher, COUNT(*) AS n_docs,
           |  SUM(CAST(doc_id AS DOUBLE)) AS id_sum,
           |  array_to_string(list_sort(list(DISTINCT lang)), ',') AS langs
           |FROM documents WHERE NOT (lang = 'fr' OR lang = 'es')
           |GROUP BY source ORDER BY publisher""".stripMargin))

  private val c08 = Entry("c08_cypher_merge_on_paths",
    (s, dir) => {
      // ON CREATE SET / ON MATCH SET through the front end, set-oriented
      // (runBatch over the whole publisher dim): first batch takes the
      // create path everywhere, the identical second batch the match path —
      // the observable generation counters of the reference's
      // created-vs-updated branch (crwling.py:61-64), as data.
      val pubs = Tables(s, dir, "documents")
        .select(col("source").as("name")).distinct()
      val sess = new graft.cypher.CypherSession(
        graft.graph.PropertyGraph.empty(s))
      val q = """MERGE (p:Publisher {name: $name})
                |ON CREATE SET p.status = 'created'
                |ON MATCH SET p.status = 'matched'""".stripMargin
      def statusCounts(phase: String) =
        sess.graph.matchLabel("Publisher")
          .groupBy(col("props").getItem("status").as("status"))
          .agg(count(lit(1)).as("n"))
          .select(lit(phase).as("phase"), col("status"), col("n"))
      sess.runBatch(q, pubs)
      val first = statusCounts("after_first")
      sess.runBatch(q, pubs)
      val second = statusCounts("after_second")
      first.unionByName(second).orderBy("phase", "status")
    },
    Some("""SELECT 'after_first' AS phase, 'created' AS status,
           |       COUNT(DISTINCT source) AS n FROM documents
           |UNION ALL
           |SELECT 'after_second', 'matched', COUNT(DISTINCT source) FROM documents
           |ORDER BY phase, status""".stripMargin))

  private val c09 = Entry("c09_cypher_unwind_skip",
    (s, dir) => {
      // UNWIND a literal language list into a per-element pipeline (alias
      // joins against the label scan), aggregate per element, then paginate
      // with ORDER BY + SKIP + LIMIT.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""UNWIND ['en', 'de', 'fr', 'es'] AS lang_code
                 |MATCH (a:Article) WHERE a.lang = lang_code
                 |RETURN lang_code, count(a) AS n_docs
                 |ORDER BY lang_code SKIP 1 LIMIT 2""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT lang AS lang_code, COUNT(*) AS n_docs
           |FROM documents WHERE lang IN ('en', 'de', 'fr', 'es')
           |GROUP BY lang ORDER BY lang_code LIMIT 2 OFFSET 1""".stripMargin))

  private val c10 = Entry("c10_cypher_write_surface",
    (s, dir) => {
      // The full MATCH-driven write surface against a seeded store: SET +
      // REMOVE rewrite the matched subset's property bags, DETACH DELETE
      // removes a different subset — final state oracle-checked, all
      // operations set-oriented joins over the pre-statement state.
      val pubs = Tables(s, dir, "documents")
        .select(col("source").as("name")).distinct()
      val sess = new graft.cypher.CypherSession(
        graft.graph.PropertyGraph.empty(s))
      sess.runBatch("MERGE (p:Publisher {name: $name}) SET p.seeded = 'y'", pubs)
      sess.run("MATCH (p:Publisher) WHERE p.name CONTAINS '1' SET p.flagged = 'y' REMOVE p.seeded")
      sess.run("MATCH (p:Publisher) WHERE p.name CONTAINS '9' DETACH DELETE p")
      sess.graph.matchLabel("Publisher")
        .select(col("key").as("name"),
          col("props").getItem("flagged").as("flagged"),
          col("props").getItem("seeded").as("seeded"))
        .orderBy("name")
    },
    Some("""WITH p AS (SELECT DISTINCT source AS name FROM documents)
           |SELECT name,
           |  CASE WHEN contains(name, '1') THEN 'y' END AS flagged,
           |  CASE WHEN contains(name, '1') THEN NULL ELSE 'y' END AS seeded
           |FROM p WHERE NOT contains(name, '9')
           |ORDER BY name""".stripMargin))

  private val c11 = Entry("c11_cypher_rel_props",
    (s, dir) => {
      // Relationship properties end to end: the ingested WRITTEN_BY edges
      // carry {lang}; the pattern-prop filter pushes onto the (relType-
      // partition-pruned) edge scan before the pattern joins.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (a:Article)-[r:WRITTEN_BY {lang: 'en'}]->(p:Publisher)
                 |RETURN p.name AS publisher, count(a) AS n_en
                 |ORDER BY publisher""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT source AS publisher, COUNT(*) AS n_en
           |FROM documents WHERE lang = 'en'
           |GROUP BY source ORDER BY publisher""".stripMargin))

  private val c12 = Entry("c12_cypher_optional_is_null",
    (s, dir) => {
      // The Cypher anti-join idiom: OPTIONAL MATCH then IS NULL on the
      // optional binding — publishers with no French articles. Lowers to a
      // left join + null filter, which Catalyst turns into an anti
      // semantics plan; the oracle is NOT EXISTS.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (p:Publisher)
                 |OPTIONAL MATCH (p)<-[:WRITTEN_BY {lang: 'fr'}]-(a:Article)
                 |WHERE a.doc_id IS NULL
                 |RETURN count(p) AS n_without_fr""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT COUNT(*) AS n_without_fr
           |FROM (SELECT DISTINCT source FROM documents) s
           |WHERE NOT EXISTS (SELECT 1 FROM documents d
           |  WHERE d.source = s.source AND d.lang = 'fr')""".stripMargin))

  private val c13 = Entry("c13_cypher_undirected_siblings",
    (s, dir) => {
      // Undirected pattern semantics: sibling articles reached by walking
      // WRITTEN_BY in both orientations through the shared publisher —
      // the co-authorship idiom `(a)-[:R]-(p)-[:R]-(b)` on a graph whose
      // edges all point one way; equals g04's directed formulation.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (a:Article)-[:WRITTEN_BY]-(p:Publisher)-[:WRITTEN_BY]-(b:Article)
                 |WHERE a.doc_id < b.doc_id
                 |RETURN p.name AS publisher, count(a) AS n_pairs
                 |ORDER BY publisher""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT d1.source AS publisher, COUNT(*) AS n_pairs
           |FROM documents d1 JOIN documents d2
           |  ON d1.source = d2.source
           | AND CAST(d1.doc_id AS VARCHAR) < CAST(d2.doc_id AS VARCHAR)
           |GROUP BY d1.source ORDER BY publisher""".stripMargin))

  private val c14 = Entry("c14_cypher_scalar_fns",
    (s, dir) => {
      // Scalar functions as WITH grouping keys: toUpper over the property
      // feeds the implicit grouping; size() in the final projection.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (a:Article)
                 |WITH toUpper(a.lang) AS lang_uc, count(a) AS n_docs
                 |RETURN lang_uc, size(lang_uc) AS code_len, n_docs
                 |ORDER BY lang_uc""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT upper(lang) AS lang_uc,
           |  CAST(length(upper(lang)) AS INT) AS code_len,
           |  COUNT(*) AS n_docs
           |FROM documents GROUP BY lang ORDER BY lang_uc""".stripMargin))

  private val c15 = Entry("c15_cypher_case_arith",
    (s, dir) => {
      // Expression depth round 3: searched CASE as an implicit grouping
      // key, arithmetic in WHERE (modulo over a string-bag property via
      // the DOUBLE read policy) and over an aggregate (`count(a)*2+1`).
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (a:Article)
                 |WHERE a.doc_id % 2 = 0
                 |RETURN a.lang AS lang,
                 |  CASE WHEN a.lang = 'en' THEN 'core'
                 |       WHEN a.lang = 'de' OR a.lang = 'fr' THEN 'eu'
                 |       ELSE 'other' END AS bucket,
                 |  count(a) AS n_docs,
                 |  count(a) * 2 + 1 AS n_scaled
                 |ORDER BY lang""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT lang,
           |  CASE WHEN lang = 'en' THEN 'core'
           |       WHEN lang = 'de' OR lang = 'fr' THEN 'eu'
           |       ELSE 'other' END AS bucket,
           |  COUNT(*) AS n_docs,
           |  CAST(COUNT(*) * 2 + 1 AS BIGINT) AS n_scaled
           |FROM documents WHERE doc_id % 2 = 0
           |GROUP BY 1, 2 ORDER BY lang""".stripMargin))

  private val c16 = Entry("c16_cypher_string_predicates",
    (s, dir) => {
      // STARTS WITH / ENDS WITH / CONTAINS in a boolean tree, plus the `+`
      // concatenation overload building the grouping key.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (a:Article)-[:WRITTEN_BY]->(p:Publisher)
                 |WHERE a.title STARTS WITH 'the '
                 |   OR (a.title CONTAINS 'spark' AND a.title ENDS WITH 'a')
                 |RETURN p.name + ':' + a.lang AS pub_lang, count(a) AS n_docs
                 |ORDER BY pub_lang""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT source || ':' || lang AS pub_lang, COUNT(*) AS n_docs
           |FROM documents
           |WHERE substring(text, 1, 30) LIKE 'the %'
           |   OR (substring(text, 1, 30) LIKE '%spark%'
           |       AND substring(text, 1, 30) LIKE '%a')
           |GROUP BY 1 ORDER BY pub_lang""".stripMargin))

  private val c17 = Entry("c17_cypher_path_length",
    (s, dir) => {
      // Path variables over an undirected variable-length pattern:
      // `p = (a:Article)-[:WRITTEN_BY*1..2]-(x)` walks article→publisher
      // (1 hop) and article→publisher→article (2 hops, walk semantics —
      // includes the return to the start, as Neo4j's walk counting does
      // for distinct relationships per step... here steps reuse the edge
      // table so counts follow the closed form: Σ_pub deg² at 2 hops).
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH p = (a:Article)-[:WRITTEN_BY*1..2]-(x)
                 |RETURN length(p) AS hops, count(*) AS n_walks
                 |ORDER BY hops""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT CAST(1 AS INT) AS hops, COUNT(*) AS n_walks FROM documents
           |UNION ALL
           |SELECT CAST(2 AS INT),
           |       CAST(SUM(cnt * cnt) AS BIGINT)
           |FROM (SELECT COUNT(*) AS cnt FROM documents GROUP BY source)
           |ORDER BY hops""".stripMargin))

  private val c18 = Entry("c18_cypher_with_topk",
    (s, dir) => {
      // Pipeline top-k: aggregate at a WITH horizon, ORDER BY + LIMIT the
      // aggregated rows, project past the page. Compiles to
      // TakeOrderedAndProject over the partial-combining aggregate — the
      // pagination never materializes the full group list.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (a:Article)-[:WRITTEN_BY]->(p:Publisher)
                 |WITH p.name AS publisher, count(a) AS n_docs
                 |ORDER BY n_docs DESC, publisher LIMIT 3
                 |RETURN publisher, n_docs""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT source AS publisher, COUNT(*) AS n_docs
           |FROM documents GROUP BY source
           |ORDER BY n_docs DESC, publisher LIMIT 3""".stripMargin))

  private val c19 = Entry("c19_cypher_shortest_path",
    (s, dir) => {
      // shortestPath() over an undirected *1..3 expansion: per endpoint
      // pair, the walk multiplicity collapses to the minimum hop count
      // (articles reach their publisher at 1 hop — the 3-hop revisit walks
      // collapse — and same-publisher articles, themselves included, at
      // 2). Closed-form oracle on the publisher-star topology. The anchor
      // side carries an inline property predicate (zh articles, ~15% of
      // the corpus): anchored-endpoint seeding pushes label AND inline
      // props into the BFS seed set, so every frontier level is bounded by
      // pairs-from-zh, not all Σdeg² pairs — the entry measures the
      // frontier engine, not the output's quadratic volume (that was the
      // bench's single biggest line item, ~12 s of answer-set writing).
      // The one-free-endpoint form stays exercised (x is unbound); c23 is
      // the fully-anchored variant users actually write.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH p = shortestPath(
                 |    (a:Article {lang: 'zh'})-[:WRITTEN_BY*1..3]-(x))
                 |RETURN length(p) AS hops, count(*) AS n_pairs
                 |ORDER BY hops""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT CAST(1 AS INT) AS hops, COUNT(*) AS n_pairs FROM documents
           |WHERE lang = 'zh'
           |UNION ALL
           |SELECT CAST(2 AS INT), CAST(SUM(zh_cnt * cnt) AS BIGINT)
           |FROM (SELECT COUNT(*) AS cnt,
           |        COUNT(*) FILTER (lang = 'zh') AS zh_cnt
           |      FROM documents GROUP BY source)
           |ORDER BY hops""".stripMargin))

  private val c20 = Entry("c20_cypher_union",
    (s, dir) => {
      // Statement-level UNION ALL with string-literal projections and a
      // trailing ORDER BY spanning the combined result — the node
      // directory-listing idiom.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (p:Publisher) RETURN p.name AS name, 'publisher' AS kind
                 |UNION ALL
                 |MATCH (a:Article) WHERE a.lang = 'en'
                 |RETURN a.doc_id AS name, 'article' AS kind
                 |ORDER BY kind, name""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT name, kind FROM (
           |  SELECT DISTINCT source AS name, 'publisher' AS kind FROM documents
           |  UNION ALL
           |  SELECT CAST(doc_id AS VARCHAR) AS name, 'article' AS kind
           |  FROM documents WHERE lang = 'en')
           |ORDER BY kind, name""".stripMargin))

  private val c21 = Entry("c21_cypher_create",
    (s, dir) => {
      // Plain CREATE — the append-only twin of MERGE (c08 is the
      // idempotent path): the same Tag batch CREATEd twice yields TWO node
      // instances per name with distinct ids; MATCH…CREATE then wires
      // every instance to a CREATE-built hub, one edge per matched row.
      // count(DISTINCT t) proves the duplicate instances carry distinct
      // identities, count(*) that each got its own relationship.
      val pubs = Tables(s, dir, "documents")
        .select(col("source").as("name")).distinct()
      val sess = new graft.cypher.CypherSession(
        graft.graph.PropertyGraph.empty(s),
        keyProps = Map("Tag" -> "name", "Hub" -> "name"))
      sess.runBatch("CREATE (t:Tag {name: $name})", pubs)
      sess.runBatch("CREATE (t:Tag {name: $name})", pubs)
      sess.run("CREATE (h:Hub {name: 'root'})")
      sess.run("MATCH (t:Tag), (h:Hub) CREATE (t)-[:POINTS_AT]->(h)")
      sess.run("""MATCH (t:Tag)-[:POINTS_AT]->(h:Hub)
                 |RETURN t.name AS name, count(DISTINCT t) AS n_nodes,
                 |       count(*) AS n_links
                 |ORDER BY name""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT source AS name, CAST(2 AS BIGINT) AS n_nodes,
           |  CAST(2 AS BIGINT) AS n_links
           |FROM documents GROUP BY source ORDER BY name""".stripMargin))

  private val c22 = Entry("c22_cypher_optional_unanchored",
    (s, dir) => {
      // Free-standing OPTIONAL MATCH (no variable shared with the bound
      // rows): every publisher row survives null-extended when the
      // pattern matches nothing — count(g) sees zero ghosts while the
      // publisher cardinality is intact (Neo4j's unanchored semantics).
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (p:Publisher)
                 |OPTIONAL MATCH (g:Ghost)
                 |RETURN count(DISTINCT p) AS n_pubs, count(g) AS n_ghosts""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT COUNT(DISTINCT source) AS n_pubs,
           |  CAST(0 AS BIGINT) AS n_ghosts FROM documents""".stripMargin))

  private val c23 = Entry("c23_cypher_anchored_shortest",
    (s, dir) => {
      // shortestPath anchored on a selective label+key: the BFS frontier
      // seeds from the ONE anchored publisher instead of every edge — the
      // landmark shape whose per-level work is bounded by the anchor's
      // reach (src10's star: its articles at 1 hop, itself at 2, nothing
      // new at 3). The unanchored c19 stays the all-pairs reference.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH p = shortestPath((pub:Publisher {name: 'src10'})-[:WRITTEN_BY*1..3]-(x))
                 |RETURN length(p) AS hops, count(*) AS n_pairs
                 |ORDER BY hops""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT CAST(1 AS INT) AS hops, COUNT(*) AS n_pairs
           |FROM documents WHERE source = 'src10'
           |UNION ALL
           |SELECT CAST(2 AS INT), CAST(1 AS BIGINT)
           |ORDER BY hops""".stripMargin))

  private val c24 = Entry("c24_cypher_string_toolkit",
    (s, dir) => {
      // The remaining string toolkit a browser user reaches for next:
      // substring (0-based in Cypher), left/right, literal replace, split
      // (literal delimiter) and toString — all lowered to codegen'd
      // column expressions over the label-pruned scan.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (a:Article)
                 |RETURN a.doc_id AS key, substring(a.title, 0, 8) AS prefix8,
                 |  left(a.title, 3) AS l3, right(a.title, 4) AS r4,
                 |  replace(a.lang, 'e', 'E') AS lang_up,
                 |  toString(size(split(a.title, ' '))) AS n_tokens
                 |ORDER BY key LIMIT 200""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""WITH t AS (SELECT CAST(doc_id AS VARCHAR) AS key,
           |  substring(text, 1, 30) AS title, lang FROM documents)
           |SELECT key, substring(title, 1, 8) AS prefix8,
           |  left(title, 3) AS l3, right(title, 4) AS r4,
           |  replace(lang, 'e', 'E') AS lang_up,
           |  CAST(len(string_split(title, ' ')) AS VARCHAR) AS n_tokens
           |FROM t ORDER BY key LIMIT 200""".stripMargin))

  private val c25 = Entry("c25_cypher_expression_set",
    (s, dir) => {
      // Expression-valued SET across the whole label: the assigned values
      // are computed per matched row by the same compiler that lowers
      // RETURN (toUpper / size over the bound node), then merged back by
      // id in ONE join — the reference's per-record SET loop
      // (crwling.py:50-52), set-oriented and content-derived.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (a:Article)
                 |SET a.caps_lang = toUpper(a.lang), a.title_len = size(a.title)""".stripMargin)
      sess.run("""MATCH (a:Article)
                 |RETURN a.caps_lang AS caps_lang, count(a) AS n_docs,
                 |       sum(a.title_len) AS total_len
                 |ORDER BY caps_lang""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT upper(lang) AS caps_lang, COUNT(*) AS n_docs,
           |  CAST(SUM(length(substring(text, 1, 30))) AS DOUBLE) AS total_len
           |FROM documents GROUP BY upper(lang) ORDER BY caps_lang""".stripMargin))

  private val c26 = Entry("c26_cypher_exists_subquery",
    (s, dir) => {
      // EXISTS { } / NOT EXISTS { } pattern predicates (Neo4j 5 subquery
      // syntax): publishers with at least one English article, minus the
      // one that published document 0. Each conjunct lowers to a
      // semi/anti join whose probe side is the DISTINCT shared-id list —
      // at scale the join ships a key set, never the subquery's
      // expansion. (Predicates chosen scale-invariant: every publisher
      // has an English article at every SF and doc 0 always exists, so
      // the semi-join keeps all rows and the anti-join prunes exactly
      // one, at any scale.)
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (p:Publisher)
                 |WHERE EXISTS { (a:Article)-[:WRITTEN_BY]->(p) WHERE a.lang = 'en' }
                 |  AND NOT EXISTS { (b:Article {doc_id: '0'})-[:WRITTEN_BY]->(p) }
                 |RETURN p.name AS name
                 |ORDER BY name""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT source AS name FROM documents GROUP BY source
           |HAVING COUNT(*) FILTER (lang = 'en') > 0
           |   AND COUNT(*) FILTER (doc_id = 0) = 0
           |ORDER BY name""".stripMargin))

  private val c27 = Entry("c27_cypher_count_subquery",
    (s, dir) => {
      // COUNT { } subquery expression + simple-form CASE + keys():
      // per-publisher English-article count (0 when none — the subquery
      // pre-materializes as ONE grouped count left-joined back on the
      // shared id, never a per-row re-execution), a value-matched CASE
      // bucket, and the sorted property-key list's size (the merge-key
      // property folds back into the bag).
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (p:Publisher)
                 |RETURN p.name AS name,
                 |  COUNT { (a:Article)-[:WRITTEN_BY]->(p) WHERE a.lang = 'en' } AS n_en,
                 |  CASE p.name WHEN 'src0' THEN 'zero' WHEN 'src1' THEN 'one'
                 |    ELSE 'rest' END AS bucket,
                 |  size(keys(p)) AS n_props
                 |ORDER BY name""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT source AS name, COUNT(*) FILTER (lang = 'en') AS n_en,
           |  CASE source WHEN 'src0' THEN 'zero' WHEN 'src1' THEN 'one'
           |    ELSE 'rest' END AS bucket,
           |  CAST(1 AS INT) AS n_props
           |FROM documents GROUP BY source ORDER BY name""".stripMargin))

  private val c28 = Entry("c28_cypher_list_comprehension",
    (s, dir) => {
      // List comprehension + reduce(): `[w IN split(…) WHERE … | …]`
      // compiles to Spark's higher-order filter/transform and the fold to
      // `aggregate` — per-row lambdas that stay inside codegen (no UDF, no
      // explode/re-group round trip). Consecutive WITH horizons re-shape
      // without a fresh MATCH, as in Neo4j.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (a:Article)
                 |WITH a.lang AS lang,
                 |  [w IN split(a.title, ' ') WHERE size(w) > 3 | toUpper(w)] AS big
                 |WITH lang, size(big) AS n_big,
                 |  reduce(acc = 0, w IN big | acc + size(w)) AS chars
                 |RETURN lang, sum(n_big) AS n_big_words, sum(chars) AS n_big_chars
                 |ORDER BY lang""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT lang,
           |  CAST(sum(len(list_filter(string_split(substring(text,1,30), ' '),
           |    w -> len(w) > 3))) AS DOUBLE) AS n_big_words,
           |  CAST(sum(COALESCE(list_sum(list_transform(
           |    list_filter(string_split(substring(text,1,30), ' '), w -> len(w) > 3),
           |    w -> len(w))), 0)) AS DOUBLE) AS n_big_chars
           |FROM documents GROUP BY lang ORDER BY lang""".stripMargin))

  private val c29 = Entry("c29_cypher_regex_head_last",
    (s, dir) => {
      // `=~` whole-string regex (compiled to an anchored regexp_like) with
      // head()/last() over a split list inside general-expression
      // aggregates (min/max over a computed argument).
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (a:Article)
                 |WHERE a.title =~ '(the|a) .*'
                 |WITH a.lang AS lang, split(a.title, ' ') AS ws
                 |RETURN lang, count(*) AS n_match,
                 |  min(head(ws)) AS first_word, max(last(ws)) AS last_word
                 |ORDER BY lang""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT lang, count(*) AS n_match,
           |  min(string_split(substring(text,1,30), ' ')[1]) AS first_word,
           |  max(string_split(substring(text,1,30), ' ')[-1]) AS last_word
           |FROM documents
           |WHERE regexp_full_match(substring(text,1,30), '(the|a) .*')
           |GROUP BY lang ORDER BY lang""".stripMargin))

  private val c31 = Entry("c31_cypher_call_subquery",
    (s, dir) => {
      // CALL { } subqueries, both workhorse shapes chained in one query:
      // a correlated aggregate (per-publisher English count — grouped once
      // by the imported ids and left-joined back, count 0 on empty groups)
      // and a correlated top-k (first 2 titles per publisher — a window
      // over the imported id, the distributed form of "top N per group";
      // never a per-row re-execution).
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (p:Publisher)
                 |CALL { WITH p MATCH (a:Article)-[:WRITTEN_BY]->(p)
                 |       WHERE a.lang = 'en' RETURN count(a) AS n_en }
                 |CALL { WITH p MATCH (b:Article)-[:WRITTEN_BY]->(p)
                 |       RETURN b.title AS title ORDER BY title LIMIT 2 }
                 |RETURN p.name AS pub, n_en, title
                 |ORDER BY pub, title""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""WITH en AS (
           |  SELECT source, COUNT(*) FILTER (lang = 'en') AS n_en
           |  FROM documents GROUP BY source),
           |top2 AS (
           |  SELECT source, title FROM (
           |    SELECT source, substring(text, 1, 30) AS title,
           |      row_number() OVER (PARTITION BY source
           |        ORDER BY substring(text, 1, 30)) AS rn
           |    FROM documents) WHERE rn <= 2)
           |SELECT e.source AS pub, e.n_en, t.title
           |FROM en e JOIN top2 t ON e.source = t.source
           |ORDER BY pub, title""".stripMargin))

  private val c32 = Entry("c32_cypher_foreach_conditional",
    (s, dir) => {
      // FOREACH's conditional-write idiom (the empty-list skip), then a
      // read-back: tag English articles, count by tag. The FOREACH
      // desugars to an UNWIND stage feeding the set-oriented SET merge —
      // one id-keyed join against the store, never per-row round trips.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (a:Article)
                 |FOREACH (x IN CASE WHEN a.lang = 'en' THEN [1] ELSE [] END |
                 |  SET a.is_en = 'y')""".stripMargin)
      sess.run("""MATCH (a:Article)
                 |RETURN coalesce(a.is_en, 'n') AS is_en, count(*) AS n_docs
                 |ORDER BY is_en""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT CASE WHEN lang = 'en' THEN 'y' ELSE 'n' END AS is_en,
           |  COUNT(*) AS n_docs
           |FROM documents GROUP BY 1 ORDER BY is_en""".stripMargin))

  private val c33 = Entry("c33_cypher_index_order_expr",
    (s, dir) => {
      // List indexing (`ws[0]`) feeding an implicit group key, ordered by
      // an aggregate EXPRESSION (`ORDER BY count(*) DESC`) — the sort key
      // rides the aggregated output column, no recomputation, hidden sort
      // columns dropped from the projection.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (a:Article)
                 |WITH split(a.title, ' ') AS ws, a.lang AS lang
                 |RETURN lang, ws[0] AS first_word, count(*) AS n
                 |ORDER BY count(*) DESC, lang, first_word
                 |LIMIT 20""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT lang, string_split(substring(text, 1, 30), ' ')[1] AS first_word,
           |  COUNT(*) AS n
           |FROM documents GROUP BY 1, 2
           |ORDER BY n DESC, lang, first_word LIMIT 20""".stripMargin))

  private val c34 = Entry("c34_cypher_statistical_aggregates",
    (s, dir) => {
      // Neo4j's statistical aggregate family: stDev/stDevP (sample and
      // population), percentileCont (exact linear interpolation — Spark's
      // `percentile`, not the approx sketch) and percentileDisc
      // (nearest-rank, matching DuckDB quantile_disc). Doubles quantized
      // to 6 dp on both engines (x02's policy).
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (a:Article)
                 |WITH a.lang AS lang, size(a.title) AS len
                 |RETURN lang, count(*) AS n,
                 |  round(stDev(len), 6) AS sd,
                 |  round(stDevP(len), 6) AS sdp,
                 |  round(percentileCont(len, 0.5), 6) AS p50,
                 |  percentileDisc(len, 0.9) AS p90
                 |ORDER BY lang""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT lang, COUNT(*) AS n,
           |  round(stddev_samp(len), 6) AS sd,
           |  round(stddev_pop(len), 6) AS sdp,
           |  round(quantile_cont(len, 0.5), 6) AS p50,
           |  quantile_disc(len, 0.9) AS p90
           |FROM (SELECT lang,
           |        CAST(length(substring(text, 1, 30)) AS DOUBLE) AS len
           |      FROM documents)
           |GROUP BY lang ORDER BY lang""".stripMargin))

  private val c35 = Entry("c35_cypher_all_shortest_paths",
    (s, dir) => {
      // allShortestPaths(): every tying minimum-hop walk survives as its
      // own row (shortestPath collapses to one). A per-source diamond —
      // start → mid_<source> → end — gives exactly one 2-hop tying walk
      // per distinct publisher; a 3-hop decoy chain start→d1→d2→end
      // proves longer walks are filtered by the per-pair window min.
      // Fixture construction is batched set-oriented (one CREATE batch for
      // ALL nodes, one statement per edge family, the 3-hop decoy chain as
      // ONE comma-separated MATCH…CREATE) — each statement is a full write
      // pass over the graph, so statement count, not row count, is the
      // fixture-build cost.
      val mids = Tables(s, dir, "documents")
        .select(concat(lit("mid_"), col("source")).as("name")).distinct()
      val specials = s.createDataFrame(
        Seq("start", "end", "d1", "d2").map(Tuple1.apply)).toDF("name")
      val sess = new graft.cypher.CypherSession(
        graft.graph.PropertyGraph.empty(s),
        keyProps = Map("N" -> "name"))
      sess.runBatch("CREATE (m:N {name: $name})", mids.unionByName(specials))
      sess.run("""MATCH (a:N {name: 'start'}), (m:N) WHERE m.name STARTS WITH 'mid_'
                 |CREATE (a)-[:HOP]->(m)""".stripMargin)
      sess.run("""MATCH (m:N), (e:N {name: 'end'}) WHERE m.name STARTS WITH 'mid_'
                 |CREATE (m)-[:HOP]->(e)""".stripMargin)
      sess.run("""MATCH (a:N {name: 'start'}), (d1:N {name: 'd1'}),
                 |      (d2:N {name: 'd2'}), (e:N {name: 'end'})
                 |CREATE (a)-[:HOP]->(d1), (d1)-[:HOP]->(d2), (d2)-[:HOP]->(e)""".stripMargin)
      sess.run("""MATCH p = allShortestPaths((a:N {name: 'start'})-[:HOP*1..4]->(e:N {name: 'end'}))
                 |RETURN length(p) AS len, count(*) AS n_paths""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT CAST(2 AS INT) AS len, COUNT(DISTINCT source) AS n_paths
           |FROM documents""".stripMargin))

  private val c36 = Entry("c36_cypher_set_property_maps",
    (s, dir) => {
      // SET += (merge a property map; values are full expressions over
      // the bound row) then SET = (replace — the bag is cleared before the
      // map applies; the merge key survives out-of-band). The read-back
      // groups the replaced subset under 'cleared' via its vanished lang.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (a:Article)
                 |SET a += {nw: toString(size(split(a.title, ' ')))}""".stripMargin)
      sess.run("MATCH (a:Article) WHERE a.lang = 'zh' SET a = {nw: '-1'}")
      sess.run("""MATCH (a:Article)
                 |RETURN coalesce(a.lang, 'cleared') AS lang,
                 |  sum(toInteger(a.nw)) AS words, count(*) AS n
                 |ORDER BY lang""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT CASE WHEN lang = 'zh' THEN 'cleared' ELSE lang END AS lang,
           |  CAST(SUM(CASE WHEN lang = 'zh' THEN -1 ELSE
           |    length(string_split(substring(text, 1, 30), ' ')) END) AS DOUBLE) AS words,
           |  COUNT(*) AS n
           |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin))

  private val c37 = Entry("c37_cypher_list_predicates",
    (s, dir) => {
      // Cypher's four list quantifiers — any/all/none/single(x IN list
      // WHERE pred) — as CASE conditions over the title's word list.
      // Each lowers to a higher-order exists/forall/filter lambda — a
      // native Catalyst expression, no UDF, nothing leaves the row.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (a:Article)
                 |WITH a.lang AS lang, split(a.title, ' ') AS ws
                 |RETURN lang,
                 |  sum(CASE WHEN any(w IN ws WHERE size(w) > 6) THEN 1 ELSE 0 END) AS has_long,
                 |  sum(CASE WHEN all(w IN ws WHERE size(w) > 1) THEN 1 ELSE 0 END) AS all_gt1,
                 |  sum(CASE WHEN none(w IN ws WHERE w = 'the') THEN 1 ELSE 0 END) AS no_the,
                 |  sum(CASE WHEN single(w IN ws WHERE size(w) = 3) THEN 1 ELSE 0 END) AS one_len3,
                 |  count(*) AS n
                 |ORDER BY lang""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""WITH d AS (
           |  SELECT lang, string_split(substring(text, 1, 30), ' ') AS ws
           |  FROM documents)
           |SELECT lang,
           |  CAST(SUM(CASE WHEN len(list_filter(ws, w -> length(w) > 6)) > 0
           |    THEN 1 ELSE 0 END) AS DOUBLE) AS has_long,
           |  CAST(SUM(CASE WHEN len(list_filter(ws, w -> NOT length(w) > 1)) = 0
           |    THEN 1 ELSE 0 END) AS DOUBLE) AS all_gt1,
           |  CAST(SUM(CASE WHEN len(list_filter(ws, w -> w = 'the')) = 0
           |    THEN 1 ELSE 0 END) AS DOUBLE) AS no_the,
           |  CAST(SUM(CASE WHEN len(list_filter(ws, w -> length(w) = 3)) = 1
           |    THEN 1 ELSE 0 END) AS DOUBLE) AS one_len3,
           |  COUNT(*) AS n
           |FROM d GROUP BY lang ORDER BY lang""".stripMargin))

  private val c38 = Entry("c38_cypher_math_fns",
    (s, dir) => {
      // The math scalar family: sqrt/log/log10/exp/ceil/floor/sign plus
      // the pi()/e() constants and toBoolean — aggregated so the result
      // is one row, with irrational sums pinned to 6 dp on both engines
      // (x02's cross-engine float policy). ceil/floor stay DOUBLE
      // (Neo4j's contract; Spark's ceil would narrow to LONG).
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (a:Article)
                 |WITH toFloat(size(a.title)) AS len
                 |RETURN count(*) AS n,
                 |  round(sum(sqrt(len)), 6) AS s_sqrt,
                 |  round(sum(log(len + 1)), 6) AS s_log,
                 |  round(sum(log10(len + 1)), 6) AS s_log10,
                 |  round(sum(exp(len / 30.0)), 6) AS s_exp,
                 |  sum(ceil(len / 7.0)) AS s_ceil,
                 |  sum(floor(len / 7.0)) AS s_floor,
                 |  sum(sign(len - 15.0)) AS s_sign,
                 |  round(pi() * e(), 6) AS pi_e,
                 |  sum(toInteger(toBoolean('true'))) AS n_true""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""WITH d AS (
           |  SELECT CAST(length(substring(text, 1, 30)) AS DOUBLE) AS len
           |  FROM documents)
           |SELECT COUNT(*) AS n,
           |  round(SUM(sqrt(len)), 6) AS s_sqrt,
           |  round(SUM(ln(len + 1)), 6) AS s_log,
           |  round(SUM(log10(len + 1)), 6) AS s_log10,
           |  round(SUM(exp(len / 30.0)), 6) AS s_exp,
           |  CAST(SUM(ceil(len / 7.0)) AS DOUBLE) AS s_ceil,
           |  CAST(SUM(floor(len / 7.0)) AS DOUBLE) AS s_floor,
           |  CAST(SUM(sign(len - 15.0)) AS DOUBLE) AS s_sign,
           |  round(pi() * exp(1.0), 6) AS pi_e,
           |  CAST(SUM(1) AS DOUBLE) AS n_true
           |FROM d""".stripMargin))

  private val c39 = Entry("c39_cypher_pattern_where",
    (s, dir) => {
      // Modern Cypher inline pattern predicates — `(n:L WHERE <pred>)`
      // inside the MATCH pattern. Desugared at parse time into the stage
      // WHERE, so Catalyst still pushes each predicate below the pattern
      // joins (same plan as the post-pattern spelling).
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (a:Article WHERE a.lang IN ['en', 'de'])
                 |      -[:WRITTEN_BY]->
                 |      (p:Publisher WHERE p.name ENDS WITH '1')
                 |RETURN p.name AS publisher, a.lang AS lang, count(*) AS n
                 |ORDER BY publisher, lang""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT source AS publisher, lang, COUNT(*) AS n
           |FROM documents
           |WHERE lang IN ('en', 'de') AND source LIKE '%1'
           |GROUP BY source, lang ORDER BY publisher, lang""".stripMargin))

  private val c40 = Entry("c40_cypher_parameters",
    (s, dir) => {
      // Named parameters through the public API — the reference's own
      // calling convention (kwargs → $params, ingest.py:4-8): a list
      // parameter behind IN, a scalar behind a comparison, and a string
      // inside CONTAINS, all supplied at run() time (no re-parse per
      // value set; literals stay out of the query text).
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (a:Article)
                 |WHERE a.lang IN $langs AND size(a.title) >= $minlen
                 |  AND a.title CONTAINS $needle
                 |RETURN a.lang AS lang, count(*) AS n
                 |ORDER BY lang""".stripMargin,
        Map("langs" -> Seq("en", "fr", "de"), "minlen" -> 10, "needle" -> "e"))
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT lang, COUNT(*) AS n FROM documents
           |WHERE lang IN ('en', 'fr', 'de')
           |  AND length(substring(text, 1, 30)) >= 10
           |  AND substring(text, 1, 30) LIKE '%e%'
           |GROUP BY lang ORDER BY lang""".stripMargin))

  private val c41 = Entry("c41_cypher_exists_expression",
    (s, dir) => {
      // EXISTS { } as a boolean EXPRESSION (Neo4j 5) — in RETURN
      // position, not a WHERE conjunct. Rides the COUNT { }
      // pre-materialization: one grouped count per subquery left-joined
      // back on the shared ids, read as count > 0 — never a per-row
      // re-match.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (p:Publisher)
                 |RETURN p.name AS publisher,
                 |  EXISTS { (a:Article)-[:WRITTEN_BY]->(p) WHERE a.lang = 'zh' } AS has_zh,
                 |  EXISTS { (a:Article)-[:WRITTEN_BY]->(p)
                 |           WHERE size(a.title) > 28 } AS has_long
                 |ORDER BY publisher""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT source AS publisher,
           |  COUNT(CASE WHEN lang = 'zh' THEN 1 END) > 0 AS has_zh,
           |  COUNT(CASE WHEN length(substring(text, 1, 30)) > 28 THEN 1 END) > 0
           |    AS has_long
           |FROM documents GROUP BY source ORDER BY publisher""".stripMargin))

  private val c30 = Entry("c30_cypher_unwind_range",
    (s, dir) => {
      // UNWIND over a general list expression — range() compiles to
      // Spark's sequence() (closed interval, like Neo4j) and explodes;
      // no driver-side list construction.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""UNWIND range(1, 100) AS n
                 |WITH n WHERE n % 7 = 0
                 |RETURN sum(n) AS s_mult7, count(*) AS n_mult7,
                 |  min(n) AS lo, max(n) AS hi""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT CAST(sum(n) AS DOUBLE) AS s_mult7, count(*) AS n_mult7,
           |  min(n) AS lo, max(n) AS hi
           |FROM range(1, 101) t(n) WHERE n % 7 = 0""".stripMargin))

  private val c42 = Entry("c42_cypher_temporal",
    (s, dir) => {
      // Temporal function breadth (the browser workflow's next reach after
      // datetime(), cypher.txt:1-8): map-form constructors
      // datetime({epochMillis}), date() conversion, duration({...}) as a
      // native DayTimeIntervalType value, timestamp ± duration arithmetic,
      // and duration.between comparison — all deterministic (epoch inputs,
      // no wall clock), so the full oracle hash applies. Intervals stay
      // INTERNAL (comparisons/arithmetic); projected columns are
      // timestamp/date/long, the types every engine renders identically.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""UNWIND range(0, 9) AS i
                 |WITH i, datetime({epochMillis: 1700000000000 + i * 5400000}) AS t
                 |RETURN i, t AS ts, date(t) AS d,
                 |  t + duration({days: 1, hours: 6}) AS shifted,
                 |  t - duration({minutes: 90}) AS back,
                 |  CASE WHEN duration.between(t, datetime({epochMillis: 1700020000000}))
                 |            > duration({hours: 2}) THEN 1 ELSE 0 END AS long_gap
                 |ORDER BY i""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT i,
           |  epoch_ms(1700000000000 + i * 5400000) AS ts,
           |  CAST(epoch_ms(1700000000000 + i * 5400000) AS DATE) AS d,
           |  epoch_ms(1700000000000 + i * 5400000) + INTERVAL 30 HOUR AS shifted,
           |  epoch_ms(1700000000000 + i * 5400000) - INTERVAL 90 MINUTE AS back,
           |  CAST(CASE WHEN (epoch_ms(1700020000000)
           |                  - epoch_ms(1700000000000 + i * 5400000))
           |                 > INTERVAL 2 HOUR THEN 1 ELSE 0 END AS BIGINT) AS long_gap
           |FROM range(0, 10) t(i) ORDER BY i""".stripMargin))

  private val c43 = Entry("c43_cypher_pattern_comprehension",
    (s, dir) => {
      // Pattern comprehension `[(a)-[:R]->(p) WHERE … | proj]` — the list
      // of projections over a subpattern per outer row. Pre-materializes
      // exactly like COUNT { }: ONE grouped collect_list left-joined back
      // on the shared id — never a per-row re-match; no matches reads as
      // Cypher's empty list (zh articles are absent for some publishers —
      // that branch is exercised, not just declared). List order is
      // Neo4j-unspecified; the engine pins it sorted (keys()'s policy), so
      // the full oracle hash applies. The list column itself is projected
      // through array_join for the gate: the driver's hash harness can't
      // hash a list cell (pandas: unhashable ndarray), so both sides emit
      // the '|'-joined canonical string — same information, hashable.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (p:Publisher)
                 |RETURN p.name AS publisher,
                 |  [(a:Article)-[:WRITTEN_BY]->(p) WHERE a.lang = 'zh'
                 |    | a.title] AS zh_titles,
                 |  size([(a:Article)-[:WRITTEN_BY]->(p) | a.lang]) AS n_articles
                 |ORDER BY publisher""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
        .withColumn("zh_titles", array_join(col("zh_titles"), "|"))
    },
    Some("""SELECT source AS publisher,
           |  COALESCE(array_to_string(list_sort(list(substring(text, 1, 30))
           |    FILTER (lang = 'zh')), '|'), '') AS zh_titles,
           |  COUNT(*) AS n_articles
           |FROM documents GROUP BY source ORDER BY publisher""".stripMargin))

  private val c44 = Entry("c44_cypher_load_csv",
    (s, dir) => {
      // LOAD CSV — Neo4j's bulk-import clause, here the read form: the csv
      // scan is a distributed Spark source bound as one struct row
      // variable, fields all strings (Neo4j's contract), converted with
      // toInteger() and aggregated. The import-loop form (LOAD CSV +
      // MERGE, executed set-oriented over the csv rows as the parameter
      // batch) is CypherSpec-covered; this entry oracle-checks the scan +
      // conversion path end to end.
      val docs = Tables(s, dir, "documents")
      val tmp = System.getProperty("java.io.tmpdir") +
        "/graft_loadcsv_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      docs.select(col("doc_id"), col("lang"), col("n_chars"))
        .write.mode("overwrite").option("header", "true").csv(tmp)
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run(s"""LOAD CSV WITH HEADERS FROM '$tmp' AS row
                  |RETURN row.lang AS lang, count(*) AS n_docs,
                  |  sum(toInteger(row.n_chars)) AS total_chars
                  |ORDER BY lang""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(n_chars) AS DOUBLE) AS total_chars
           |FROM documents GROUP BY lang ORDER BY lang""".stripMargin))

  // ------------------------------------------------- graph analytics (x) --

  private val c45 = Entry("c45_cypher_procedures",
    (s, dir) => {
      // The schema-introspection procedures drivers and the Neo4j browser
      // issue on connect — CALL db.labels()/db.relationshipTypes() as row
      // sources composing through YIELD → RETURN → UNION ALL → trailing
      // ORDER BY. Label/relType rows read the store's partition columns
      // (schema cardinality, no full scan). The oracle is the fixture's
      // known graph schema — engine-independent by construction since the
      // docGraph ingest always writes Article/Publisher + WRITTEN_BY.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""CALL db.labels() YIELD label
                 |RETURN 'label' AS kind, label AS name
                 |UNION ALL
                 |CALL db.relationshipTypes() YIELD relationshipType AS rt
                 |RETURN 'relType' AS kind, rt AS name
                 |ORDER BY kind, name""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT kind, name FROM (
           |  SELECT 'label' AS kind, 'Article' AS name
           |  UNION ALL SELECT 'label', 'Publisher'
           |  UNION ALL SELECT 'relType', 'WRITTEN_BY')
           |ORDER BY kind, name""".stripMargin))

  private val c46 = Entry("c46_cypher_gds_pagerank",
    (s, dir) => {
      // The GDS `.stream` procedure surface — graph ALGORITHMS invoked
      // through Cypher CALL, the way Neo4j users actually run them
      // (CALL gds.pageRank.stream() YIELD ...). The procedure wraps
      // GraphAlgorithms.pageRank under x02's determinism contract (10
      // fixed supersteps, 6-dp quantization, node identity by KEY), and
      // the yielded columns compose through RETURN/ORDER BY/LIMIT like
      // any binding. Top-10 by score: publishers only at the fixture
      // (a publisher with d≥1 articles always outranks an article), so
      // x02's closed-form oracle applies with the same tie order.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""CALL gds.pageRank.stream() YIELD key, score
                 |RETURN key AS publisher, score
                 |ORDER BY score DESC, publisher LIMIT 10""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""WITH d AS (SELECT source, COUNT(*) AS deg FROM documents GROUP BY source),
           |n AS (SELECT (SELECT COUNT(*) FROM documents) AS n_art,
           |             COUNT(*) AS n_pub,
           |             SUM(0.15 + 0.85*0.15*deg) AS s_pub
           |      FROM d)
           |SELECT d.source AS publisher,
           |  round((0.15 + 0.85*0.15*d.deg) * (n_art + n_pub)
           |        / (s_pub + 0.15*n_art), 6) AS score
           |FROM d, n
           |ORDER BY score DESC, publisher LIMIT 10""".stripMargin))

  private val c47 = Entry("c47_cypher_gds_wcc",
    (s, dir) => {
      // gds.wcc.stream() composed with a Cypher aggregation horizon: the
      // procedure yields (key, componentKey) — component identity is the
      // MIN MEMBER KEY, engine-independent where internal component ids
      // are not — and the WITH groups it into component sizes. On the
      // publisher-star fixture each component is one publisher + its
      // articles, so the oracle is x01's closed form re-ranked by size.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""CALL gds.wcc.stream() YIELD componentKey
                 |WITH componentKey, count(*) AS size
                 |RETURN componentKey, size
                 |ORDER BY size DESC, componentKey LIMIT 10""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT least(source, min(CAST(doc_id AS VARCHAR))) AS componentKey,
           |  COUNT(*) + 1 AS size
           |FROM documents GROUP BY source
           |ORDER BY size DESC, componentKey LIMIT 10""".stripMargin))

  private val c48 = Entry("c48_cypher_gds_node_similarity",
    (s, dir) => {
      // gds.nodeSimilarity.stream() — pairwise Jaccard of out-neighbor
      // sets surfaced through Cypher CALL, BOUNDED BY DEFAULT as GDS
      // bounds it (VERDICT r8 #2): the unconfigured call now applies
      // GDS's own defaults topK=10 / degreeCutoff=1 / similarityCutoff≈0,
      // so this entry's answer set is |V|·10, never Σdeg² — the shape
      // whose sf10 row can exist. The unbounded full-pair stream remains
      // an explicit opt-in ({topK: 0}); degree/similarity cutoffs ride
      // the same config map (c53 exercises topK=1). On the bipartite
      // article→publisher graph every same-publisher article pair shares
      // its single out-neighbor exactly (similarity 1.0), so each node's
      // top-10 is its publisher's 10 smallest OTHER article keys — the
      // closed form the oracle replays.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""CALL gds.nodeSimilarity.stream() YIELD key1, key2, similarity
                 |RETURN key1, key2, similarity
                 |ORDER BY key1, key2 LIMIT 200""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""WITH a AS (SELECT CAST(doc_id AS VARCHAR) AS k, source FROM documents),
           |p AS (
           |  SELECT a.k AS key1, b.k AS key2, 1.0 AS similarity,
           |    ROW_NUMBER() OVER (PARTITION BY a.k ORDER BY b.k) AS rn
           |  FROM a JOIN a b ON a.source = b.source AND b.k <> a.k)
           |SELECT key1, key2, similarity FROM p WHERE rn <= 10
           |ORDER BY key1, key2 LIMIT 200""".stripMargin))

  private val c49 = Entry("c49_cypher_gds_label_propagation",
    (s, dir) => {
      // gds.labelPropagation.stream() — x15's deterministic synchronous
      // LPA through the procedure surface, labels propagating over node
      // KEYS so min-tie-breaks are string-ordered on both engines. The
      // unconfigured round budget is GDS's default maxIterations=10
      // (ADVICE r8 #4; was 2). On the publisher stars synchronous LPA
      // 2-cycles with period 2 (articles alternate publisher-key /
      // min-article-key, publishers echo back), so every EVEN budget —
      // 10 included — lands on the same state as 2 rounds: one size-n
      // article community per publisher plus a singleton per publisher
      // node, which is what the oracle replays.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""CALL gds.labelPropagation.stream() YIELD communityKey
                 |WITH communityKey, count(*) AS size
                 |RETURN communityKey, size
                 |ORDER BY size DESC, communityKey LIMIT 10""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT communityKey, size FROM (
           |  SELECT min(CAST(doc_id AS VARCHAR)) AS communityKey,
           |    COUNT(*) AS size
           |  FROM documents GROUP BY source
           |  UNION ALL
           |  SELECT DISTINCT source, CAST(1 AS BIGINT) FROM documents)
           |ORDER BY size DESC, communityKey LIMIT 10""".stripMargin))

  private val c50 = Entry("c50_cypher_gds_fastrp",
    (s, dir) => {
      // gds.fastRP.stream() — x18's exact-integer FastRP through CALL:
      // md5-derived ±1-sparse init over the KEY strings, two integer
      // propagation hops, dim 4. The dimension is now EXPLICIT in the
      // call (ADVICE r8 #4: GDS has no default embeddingDimension — it is
      // mandatory there too — so the unconfigured form is rejected).
      // Every yielded component is an exact long the oracle replays
      // CTE-for-CTE (same md5 derivation as the portable plane family),
      // composed through ORDER BY/LIMIT.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""CALL gds.fastRP.stream({embeddingDimension: 4})
                 |YIELD key, e0, e1, e2, e3
                 |RETURN key, e0, e1, e2, e3
                 |ORDER BY key LIMIT 25""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""WITH e0 AS (
           |  SELECT DISTINCT CAST(doc_id AS VARCHAR) AS u, source AS v
           |  FROM documents),
           |sym AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
           |n AS (SELECT DISTINCT u AS id FROM sym),
           |r0 AS (SELECT id,
           |  CASE CAST('0x' || substr(md5(id || ':0'), 1, 8) AS BIGINT) % 4
           |    WHEN 0 THEN -1 WHEN 1 THEN 1 ELSE 0 END AS e0,
           |  CASE CAST('0x' || substr(md5(id || ':1'), 1, 8) AS BIGINT) % 4
           |    WHEN 0 THEN -1 WHEN 1 THEN 1 ELSE 0 END AS e1,
           |  CASE CAST('0x' || substr(md5(id || ':2'), 1, 8) AS BIGINT) % 4
           |    WHEN 0 THEN -1 WHEN 1 THEN 1 ELSE 0 END AS e2,
           |  CASE CAST('0x' || substr(md5(id || ':3'), 1, 8) AS BIGINT) % 4
           |    WHEN 0 THEN -1 WHEN 1 THEN 1 ELSE 0 END AS e3
           |  FROM n),
           |r1 AS (SELECT sym.v AS id, SUM(r0.e0) AS e0, SUM(r0.e1) AS e1,
           |    SUM(r0.e2) AS e2, SUM(r0.e3) AS e3
           |  FROM sym JOIN r0 ON sym.u = r0.id GROUP BY 1),
           |r2 AS (SELECT sym.v AS id, SUM(r1.e0) AS e0, SUM(r1.e1) AS e1,
           |    SUM(r1.e2) AS e2, SUM(r1.e3) AS e3
           |  FROM sym JOIN r1 ON sym.u = r1.id GROUP BY 1)
           |SELECT id AS key, CAST(e0 AS BIGINT) AS e0, CAST(e1 AS BIGINT) AS e1,
           |  CAST(e2 AS BIGINT) AS e2, CAST(e3 AS BIGINT) AS e3
           |FROM r2 ORDER BY key LIMIT 25""".stripMargin))

  private val c51 = Entry("c51_cypher_gds_hits",
    (s, dir) => {
      // gds.hits.stream() — x19's exact-integer HITS through CALL over
      // the directed article→publisher edges (keys as identity). The
      // round budget is now EXPLICIT in the call (ADVICE r8 #4: GDS's
      // default 20 rounds is unrepresentable in the exact-integer design,
      // so the unconfigured form is rejected rather than silently running
      // a different geometry). Two rounds have a closed form on the
      // stars: a2(pub) = deg², h2(art) = deg(its pub)², everything else 0
      // — so authority = deg²/max(deg²) for publishers, hub likewise for
      // articles, exactly two IEEE divisions the oracle replays. Top-25
      // by (authority, hub, key).
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""CALL gds.hits.stream({hitsIterations: 2}) YIELD key, authority, hub
                 |RETURN key, authority, hub
                 |ORDER BY authority DESC, hub DESC, key LIMIT 25""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""WITH d AS (SELECT source, COUNT(*) AS k FROM documents GROUP BY source),
           |mx AS (SELECT MAX(k * k) AS m FROM d),
           |rows_ AS (
           |  SELECT source AS key,
           |    CAST(d.k * d.k AS DOUBLE) / mx.m AS authority,
           |    0.0 AS hub
           |  FROM d, mx
           |  UNION ALL
           |  SELECT CAST(doc_id AS VARCHAR),
           |    0.0,
           |    CAST(d.k * d.k AS DOUBLE) / mx.m
           |  FROM documents JOIN d USING (source), mx)
           |SELECT key, authority, hub FROM rows_
           |ORDER BY authority DESC, hub DESC, key LIMIT 25""".stripMargin))

  private val c52 = Entry("c52_cypher_spatial_point",
    (s, dir) => {
      // The spatial value surface: point({x, y}) constructs a cartesian
      // SRID-7203 point (a struct column — composes through WITH like any
      // scalar) and point.distance computes euclidean distance. sqrt is
      // IEEE-correctly-rounded and both operands derive from exact integer
      // modulo, so the raw doubles hash-match the oracle. Bolt encodes
      // the same struct as the published Point2D ('X') — BoltServerSpec.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (a:Article)
                 |WITH toInteger(a.doc_id) AS id
                 |RETURN id,
                 |  point.distance(point({x: id % 13, y: id % 7}),
                 |                 point({x: 3, y: 4})) AS dist
                 |ORDER BY id LIMIT 200""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT doc_id AS id,
           |  sqrt((CAST(doc_id % 13 AS DOUBLE) - 3.0) * (CAST(doc_id % 13 AS DOUBLE) - 3.0)
           |      + (CAST(doc_id % 7 AS DOUBLE) - 4.0) * (CAST(doc_id % 7 AS DOUBLE) - 4.0)) AS dist
           |FROM documents ORDER BY id LIMIT 200""".stripMargin))

  private val c54 = Entry("c54_cypher_spatial_geographic",
    (s, dir) => {
      // Geographic WGS-84 points (VERDICT r8 #6): point({latitude,
      // longitude}) constructs an SRID-4326 point (stored x=longitude /
      // y=latitude, Neo4j's convention) and point.distance dispatches on
      // the SRID to great-circle haversine METERS on the pinned IUGG
      // mean radius (CypherSession.EarthRadiusMeters — the oracle
      // replays the identical formula and constant). sin/cos are libm-
      // level (not correctly-rounded), so the hashed value quantizes at
      // 6 dp — noise is ~1e-8 m, eight orders below the quantum (x02's
      // posture). Distances measured from each synthetic article
      // coordinate to Seoul, the reference crawler's home market
      // (/root/reference/src/crwling.py:112 crawls Korean Google News).
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (a:Article)
                 |WITH toInteger(a.doc_id) AS id
                 |RETURN id,
                 |  round(point.distance(
                 |    point({latitude: id % 120 - 60, longitude: id % 300 - 150}),
                 |    point({latitude: 37.5665, longitude: 126.978})), 6) AS dist_m,
                 |  point.distance(
                 |    point({latitude: 37.5665, longitude: 126.978}),
                 |    point({x: 1, y: 2})) AS crs_mismatch
                 |ORDER BY id LIMIT 200""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT doc_id AS id,
           |  round(2 * 6371008.7714150598 * asin(least(sqrt(
           |      sin(radians(37.5665 - (CAST(doc_id % 120 AS DOUBLE) - 60)) / 2)
           |        * sin(radians(37.5665 - (CAST(doc_id % 120 AS DOUBLE) - 60)) / 2)
           |      + cos(radians(CAST(doc_id % 120 AS DOUBLE) - 60)) * cos(radians(37.5665))
           |        * sin(radians(126.978 - (CAST(doc_id % 300 AS DOUBLE) - 150)) / 2)
           |        * sin(radians(126.978 - (CAST(doc_id % 300 AS DOUBLE) - 150)) / 2)
           |    ), 1.0)), 6) AS dist_m,
           |  CAST(NULL AS DOUBLE) AS crs_mismatch
           |FROM documents ORDER BY id LIMIT 200""".stripMargin))

  private val c53 = Entry("c53_cypher_gds_config_topk",
    (s, dir) => {
      // The GDS procedure CONFIG surface: CALL gds.x.stream({key: lit})
      // — here nodeSimilarity bounded to each node's top-1 most similar
      // neighbor (GDS's per-node stream shape, ties to the smallest key).
      // This is c48's ANSWER-SET-BOUND remedy as the user writes it: the
      // unbounded form's output is Σdeg² pairs by definition (6.2B at the
      // sf10 star graph), the topK form's is |V|·k. The intersection JOIN
      // itself remains co-occurrence-bound (exact Jaccard must see every
      // co-neighbor pair — true in GDS too); when the WORK must be
      // bounded at scale, the approximate dedup family (d03/d15's banded
      // LSH) is the engine's answer, not a knob here. On the fixture every
      // article's top-1 is its publisher's minimum-keyed OTHER article —
      // a closed form the oracle replays.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""CALL gds.nodeSimilarity.stream({topK: 1}) YIELD key1, key2, similarity
                 |RETURN key1, key2, similarity
                 |ORDER BY key1 LIMIT 200""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""WITH a AS (SELECT CAST(doc_id AS VARCHAR) AS k, source FROM documents)
           |SELECT a.k AS key1, MIN(b.k) AS key2, 1.0 AS similarity
           |FROM a JOIN a b ON a.source = b.source AND b.k <> a.k
           |GROUP BY a.k ORDER BY key1 LIMIT 200""".stripMargin))

  private val c56 = Entry("c56_cypher_call_in_transactions",
    (s, dir) => {
      // `UNWIND $ids AS nm CALL { WITH nm MERGE … } IN TRANSACTIONS OF n
      // ROWS` — Neo4j's bulk-import batching. Every publisher name is
      // imported TWICE (the duplicate always lands ≥1 batch after its
      // first occurrence when |sources| ≥ batch size), so the per-batch
      // commit semantics are pinned by the counters: created = matched =
      // |distinct sources|, which the oracle derives from the data. The
      // final graph state is batch-invariant (idempotent MERGE), asserted
      // by the read-back rows themselves.
      // bounded: distinct sources are schema-cardinality (~20) —
      // they ARE the import's parameter batch, the same bounded class as
      // the label lists GraphStore collects
      val srcs = Tables(s, dir, "documents").select(col("source")).distinct()
        .orderBy("source").collect().map(_.getString(0)).toSeq
      val sess = new graft.cypher.CypherSession(
        graft.graph.PropertyGraph.empty(s),
        keyProps = Map("Publisher" -> "name"))
      val mut = sess.run(
        """UNWIND $ids AS nm
          |CALL { WITH nm MERGE (p:Publisher {name: nm}) }
          |IN TRANSACTIONS OF 7 ROWS""".stripMargin,
        Map("ids" -> (srcs ++ srcs)))
        .asInstanceOf[graft.cypher.CypherMutation]
      sess.run("MATCH (p:Publisher) RETURN p.name AS name ORDER BY name")
        .asInstanceOf[graft.cypher.CypherRows].df
        .withColumn("created_total", lit(mut.nodesCreated))
        .withColumn("matched_total", lit(mut.nodesMatched))
    },
    Some("""SELECT source AS name,
           |  (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) FROM documents)
           |    AS created_total,
           |  (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) FROM documents)
           |    AS matched_total
           |FROM (SELECT DISTINCT source FROM documents)
           |ORDER BY name""".stripMargin))

  private val c57 = Entry("c57_cypher_gds_named_projection",
    (s, dir) => {
      // GDS named graph projections (VERDICT r9 #2) — the first line of
      // every GDS tutorial: CALL gds.graph.project(name, nodeLabels,
      // relTypes) snapshots a label/relType-filtered subgraph into the
      // session's graph catalog, and the algorithm streams take the graph
      // name as their first argument. The doc graph is enriched with a
      // third label (Lang) and second relType (IN_LANG, Article→Lang);
      // projecting ['Article','Lang'] / 'IN_LANG' excludes every
      // Publisher node and WRITTEN_BY edge, leaving the article→language
      // bipartite star — so pageRank over the projection has c46's exact
      // closed form with the LANGUAGE as the hub (5 langs at every
      // fixture SF, so LIMIT 5 returns exactly the language hubs).
      val docs = Tables(s, dir, "documents")
      val langNodes = docs.select(
        lit("Lang").as("label"), col("lang").as("key"),
        typedlit(Map.empty[String, String]).as("props"))
      val inLang = docs.select(
        lit("Article").as("srcLabel"),
        col("doc_id").cast("string").as("srcKey"),
        lit("IN_LANG").as("relType"),
        lit("Lang").as("dstLabel"), col("lang").as("dstKey"))
      val g = docGraph(s, dir).mergeNodes(langNodes).mergeEdgesByKey(inLang)
      val sess = new graft.cypher.CypherSession(g, keyProps = Map(
        "Article" -> "doc_id", "Publisher" -> "name", "Lang" -> "name"))
      sess.run("CALL gds.graph.project('bylang', ['Article', 'Lang'], 'IN_LANG')")
      sess.run("""CALL gds.pageRank.stream('bylang') YIELD key, score
                 |RETURN key AS lang, score
                 |ORDER BY score DESC, lang LIMIT 5""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""WITH d AS (SELECT lang, COUNT(*) AS deg FROM documents GROUP BY lang),
           |n AS (SELECT (SELECT COUNT(*) FROM documents) AS n_art,
           |             COUNT(*) AS n_lang,
           |             SUM(0.15 + 0.85*0.15*deg) AS s_lang
           |      FROM d)
           |SELECT d.lang AS lang,
           |  round((0.15 + 0.85*0.15*d.deg) * (n_art + n_lang)
           |        / (s_lang + 0.15*n_art), 6) AS score
           |FROM d, n
           |ORDER BY score DESC, lang LIMIT 5""".stripMargin))

  private val c58 = Entry("c58_cypher_temporal_components",
    (s, dir) => {
      // Temporal COMPONENT access + truncation (VERDICT r9 #3): the
      // `e.ts.hour` / `e.ts.dayOfWeek` accessors filter in WHERE and
      // `datetime.truncate('day', …)` is the WITH grouping key — the
      // first query shape a Neo4j user writes after constructing a
      // datetime. Components are integers and the truncated instant is
      // rendered via toString, so everything hashes; dayOfWeek is ISO
      // (1=Monday..7=Sunday) on both engines (DuckDB isodow).
      val ev = Tables(s, dir, "events")
      val nodes = ev.select(lit("Event").as("label"),
        col("event_id").cast("string").as("key"),
        map(lit("ts"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
          lit("etype"), col("event_type")).as("props"))
      val g = graft.graph.PropertyGraph.empty(s).mergeNodes(nodes)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Event" -> "event_id"))
      sess.run(
        """MATCH (e:Event)
          |WHERE e.ts.dayOfWeek <= 5 AND e.ts.hour >= 6
          |WITH datetime.truncate('day', e.ts) AS d, count(*) AS n
          |RETURN toString(d) AS day_start, n
          |ORDER BY day_start""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS VARCHAR)
           |    AS day_start,
           |  COUNT(*) AS n
           |FROM events
           |WHERE isodow(ts) <= 5 AND EXTRACT(hour FROM ts) >= 6
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  private val c55 = Entry("c55_cypher_count_sibling_rewrite",
    (s, dir) => {
      // COUNT { } over a count-only sibling pattern routes through the
      // degree-identity rewrite (VERDICT r8 #1, same math as g04/g05):
      // the enumeration would be Σdeg² rows per correlated publisher; the
      // rewrite answers from per-(publisher, value) multiplicities —
      // n_pairs over the UNIQUE key prop, n_lang over the NON-unique lang
      // prop where (T²−ΣM_v²)/2 is what stays exact. CypherSpec proves
      // rewrite ≡ enumeration; this entry pins the oracle hash.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("""MATCH (p:Publisher)
                 |RETURN p.name AS name,
                 |  COUNT { (a:Article)-[:WRITTEN_BY]->(p)<-[:WRITTEN_BY]-(c:Article)
                 |          WHERE a.doc_id < c.doc_id } AS n_pairs,
                 |  COUNT { (a:Article)-[:WRITTEN_BY]->(p)<-[:WRITTEN_BY]-(c:Article)
                 |          WHERE a.lang < c.lang } AS n_lang
                 |ORDER BY name""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""WITH d AS (SELECT source, CAST(doc_id AS VARCHAR) AS k, lang FROM documents),
           |pairs AS (
           |  SELECT d1.source, COUNT(*) AS n_pairs
           |  FROM d d1 JOIN d d2 ON d1.source = d2.source AND d1.k < d2.k
           |  GROUP BY d1.source),
           |lp AS (
           |  SELECT d1.source, COUNT(*) AS n_lang
           |  FROM d d1 JOIN d d2 ON d1.source = d2.source AND d1.lang < d2.lang
           |  GROUP BY d1.source)
           |SELECT s.source AS name, COALESCE(pairs.n_pairs, 0) AS n_pairs,
           |       COALESCE(lp.n_lang, 0) AS n_lang
           |FROM (SELECT DISTINCT source FROM documents) s
           |LEFT JOIN pairs USING (source) LEFT JOIN lp USING (source)
           |ORDER BY name""".stripMargin))

  private val c59 = Entry("c59_cypher_gds_write_mode",
    (s, dir) => {
      // GDS write-mode procedures (the persist half of the lifecycle,
      // round 10): gds.degree.write / gds.wcc.write compute over the
      // graph and write the result back into the store's property bag by
      // internal node id — ONE set-oriented left join + map rewrite per
      // write, never a per-row update. The follow-up MATCH reads the
      // written properties like any user property, which is the point of
      // write mode in a Neo4j workflow: compute once, query many times.
      // Both writes touch every node (articles + publishers); each
      // publisher star is one WCC component whose identity is the min
      // member key (gds.wcc.stream's existing contract).
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      val dw = sess.run("CALL gds.degree.write({writeProperty: 'deg'})")
        // bounded: single procedure summary row
        .asInstanceOf[graft.cypher.CypherRows].df.collect().head
      val cw = sess.run("CALL gds.wcc.write({writeProperty: 'comp'})")
        // bounded: single procedure summary row
        .asInstanceOf[graft.cypher.CypherRows].df.collect().head
      sess.run(
        """MATCH (p:Publisher)
          |RETURN p.name AS name, toInteger(p.deg) AS degree,
          |  p.comp AS component
          |ORDER BY name""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
        .withColumn("deg_written", lit(dw.getLong(0)))
        .withColumn("comp_written", lit(cw.getLong(0)))
        .withColumn("n_components", lit(cw.getLong(1)))
    },
    Some("""WITH s AS (
           |  SELECT source, CAST(COUNT(*) AS BIGINT) AS deg,
           |    least(MIN(CAST(doc_id AS VARCHAR)), source) AS component
           |  FROM documents GROUP BY source),
           |tot AS (SELECT
           |  CAST((SELECT COUNT(*) FROM documents)
           |    + (SELECT COUNT(DISTINCT source) FROM documents) AS BIGINT)
           |    AS n_nodes,
           |  (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) FROM documents)
           |    AS n_comp)
           |SELECT s.source AS name, s.deg AS degree, s.component AS component,
           |  tot.n_nodes AS deg_written, tot.n_nodes AS comp_written,
           |  tot.n_comp AS n_components
           |FROM s, tot ORDER BY name""".stripMargin))

  private val c60 = Entry("c60_cypher_gds_dijkstra",
    (s, dir) => {
      // gds.allShortestPaths.dijkstra.stream over a NAMED projection with
      // a relationship weight property (round 10) — the GDS single-source
      // shortest-path surface. The graph is x07's deterministic
      // two-out-degree expander (successor ring + ×3 skip edge, integer
      // weights from id residues) rebuilt as a property graph whose NEXT
      // edges carry the weight in props.w, so the oracle replays it as the
      // same recursive CTE. {maxIterations: 6} selects the bounded
      // ≤6-edge-path semantics x07 pins (the replayable form); the
      // unconfigured call runs frontier rounds to the dijkstra fixpoint
      // (CypherSpec proves the two agree on a converged fixture).
      val docs = Tables(s, dir, "documents")
      val n = docs.count()
      val nodes = docs.select(lit("Doc").as("label"),
        col("doc_id").cast("string").as("key"),
        typedlit(Map.empty[String, String]).as("props"))
      val ring = docs.select(lit("Doc").as("srcLabel"),
        col("doc_id").cast("string").as("srcKey"),
        lit("NEXT").as("relType"), lit("Doc").as("dstLabel"),
        ((col("doc_id") + 1) % n).cast("string").as("dstKey"),
        map(lit("w"), (col("doc_id") % 7 + 1).cast("string")).as("props"))
      // the skip edge gets its OWN relType: at doc_id 0 (and n/2) the ring
      // and skip edges share (src, dst), and a same-relType MERGE would
      // collapse the parallel pair to one weight — the projection takes
      // both types, so the algorithm sees both edges, as x07's union does
      val skip = docs.select(lit("Doc").as("srcLabel"),
        col("doc_id").cast("string").as("srcKey"),
        lit("SKIP3").as("relType"), lit("Doc").as("dstLabel"),
        ((col("doc_id") * 3 + 1) % n).cast("string").as("dstKey"),
        map(lit("w"), (col("doc_id") % 5 + 2).cast("string")).as("props"))
      val g = graft.graph.PropertyGraph.empty(s)
        .mergeNodes(nodes).mergeEdgesByKey(ring).mergeEdgesByKey(skip)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Doc" -> "doc_id"))
      sess.run("CALL gds.graph.project('ring', 'Doc', ['NEXT', 'SKIP3'])")
      sess.run(
        """CALL gds.allShortestPaths.dijkstra.stream('ring',
          |  {sourceNode: '0', relationshipWeightProperty: 'w',
          |   maxIterations: 6})
          |YIELD targetKey, totalCost
          |RETURN targetKey, totalCost
          |ORDER BY totalCost, targetKey LIMIT 25""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""WITH RECURSIVE
           |n AS (SELECT COUNT(*) AS n FROM documents),
           |e AS (
           |  SELECT doc_id AS src, (doc_id + 1) % n.n AS dst,
           |    doc_id % 7 + 1 AS w FROM documents, n
           |  UNION ALL
           |  SELECT doc_id, (doc_id * 3 + 1) % n.n, doc_id % 5 + 2
           |  FROM documents, n),
           |p(node, dist, hops) AS (
           |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0
           |  UNION ALL
           |  SELECT e.dst, p.dist + e.w, p.hops + 1
           |  FROM p JOIN e ON e.src = p.node WHERE p.hops < 6)
           |SELECT CAST(node AS VARCHAR) AS targetKey, MIN(dist) AS totalCost
           |FROM p GROUP BY node
           |ORDER BY totalCost, targetKey LIMIT 25""".stripMargin))

  private val c61 = Entry("c61_cypher_gds_triangles",
    (s, dir) => {
      // gds.triangleCount.stream + gds.localClusteringCoefficient.stream
      // (round 10) — the triangle-census pair of every GDS tutorial, over
      // a named projection. The graph is a deterministic ring + skip-2
      // lattice over the doc_ids (every {i, i+1, i+2} is a triangle → 3
      // per node) plus a sparse skip-5 perturbation on doc_id % 97 == 0
      // that leaves triangle counts alone but varies degrees, so the
      // coefficient column carries real signal. The kernel is the
      // canonical a<b<c listing join (Σ co-degree work, no cartesian —
      // PlanSpec) and both engines replay the identical integer algebra;
      // lcc = 2T/(d(d−1)) is one IEEE division of exact integers.
      val docs = Tables(s, dir, "documents")
      val n = docs.count()
      // RANK-keyed graph (round 15, VERDICT r14 #3): node identity is the
      // doc's dense rank, so the `% n` ring wrap is exact on ANY id
      // distribution — the striped rehearsal ids included. The skip-5
      // perturbation still selects by doc_id % 97 (identical SQL both
      // sides); only the graph keys are ranks.
      val ranked = docRanks(s, docs)
      def link(off: Int, filt: Option[org.apache.spark.sql.Column]) = {
        val base = filt.fold(ranked)(ranked.filter(_))
        base.select(lit("Doc").as("srcLabel"),
          col("rk").cast("string").as("srcKey"),
          lit("LINK").as("relType"), lit("Doc").as("dstLabel"),
          ((col("rk") + off) % n).cast("string").as("dstKey"))
      }
      val nodes = ranked.select(lit("Doc").as("label"),
        col("rk").cast("string").as("key"),
        typedlit(Map.empty[String, String]).as("props"))
      val g = graft.graph.PropertyGraph.empty(s)
        .mergeNodes(nodes)
        .mergeEdgesByKey(link(1, None))
        .mergeEdgesByKey(link(2, None))
        .mergeEdgesByKey(link(5, Some(col("doc_id") % 97 === 0)))
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Doc" -> "doc_id"))
      sess.run("CALL gds.graph.project('tri', 'Doc', 'LINK')")
      val tc = sess.run(
        """CALL gds.triangleCount.stream('tri') YIELD key, triangleCount
          |RETURN key, triangleCount""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
      val lcc = sess.run(
        """CALL gds.localClusteringCoefficient.stream('tri')
          |YIELD key, localClusteringCoefficient
          |RETURN key, localClusteringCoefficient""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
      tc.join(lcc, Seq("key")).orderBy(col("key")).limit(50)
    },
    Some("""WITH n AS (SELECT COUNT(*) AS n FROM documents),
           |r AS (SELECT doc_id,
           |        CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT)
           |          AS rk
           |      FROM documents),
           |e0 AS (
           |  SELECT rk AS s, (rk + 1) % n.n AS d FROM r, n
           |  UNION ALL
           |  SELECT rk, (rk + 2) % n.n FROM r, n
           |  UNION ALL
           |  SELECT rk, (rk + 5) % n.n FROM r, n
           |  WHERE doc_id % 97 = 0),
           |e AS (SELECT DISTINCT
           |        least(CAST(s AS VARCHAR), CAST(d AS VARCHAR)) AS a,
           |        greatest(CAST(s AS VARCHAR), CAST(d AS VARCHAR)) AS b
           |      FROM e0 WHERE s <> d),
           |tri AS (SELECT ab.a AS x, ab.b AS y, bc.b AS z
           |        FROM e ab JOIN e bc ON ab.b = bc.a
           |        JOIN e ac ON ac.a = ab.a AND ac.b = bc.b),
           |t AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS t FROM (
           |        SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
           |        UNION ALL SELECT z FROM tri) GROUP BY node),
           |deg AS (SELECT node, COUNT(*) AS d FROM (
           |        SELECT a AS node FROM e UNION ALL SELECT b FROM e)
           |      GROUP BY node)
           |SELECT k.key, COALESCE(t.t, 0) AS triangleCount,
           |  CASE WHEN deg.d >= 2 THEN CAST(COALESCE(t.t, 0) * 2 AS DOUBLE)
           |         / CAST(deg.d * (deg.d - 1) AS DOUBLE) ELSE 0.0 END
           |    AS localClusteringCoefficient
           |FROM (SELECT CAST(rk AS VARCHAR) AS key FROM r) k
           |LEFT JOIN t ON t.node = k.key
           |LEFT JOIN deg ON deg.node = k.key
           |ORDER BY key LIMIT 50""".stripMargin))

  private val c62 = Entry("c62_cypher_constraints",
    (s, dir) => {
      // Uniqueness-constraint DDL (round 10) — the statement every Neo4j
      // import script opens with: CREATE CONSTRAINT … REQUIRE … IS UNIQUE
      // on both labels' key properties (satisfied by construction — the
      // key IS the MERGE identity, so no validation scan), then SHOW
      // CONSTRAINTS read back joined with the VALIDATED population per
      // label, which ties the result to the data. The enforcement path
      // (CREATE of a duplicate key fails loudly) and the live-data
      // validation scan for non-key properties are CypherSpec-pinned.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("CREATE CONSTRAINT FOR (a:Article) REQUIRE a.doc_id IS UNIQUE")
      sess.run(
        "CREATE CONSTRAINT pub_name FOR (p:Publisher) REQUIRE p.name IS UNIQUE")
      val shown = sess.run("SHOW CONSTRAINTS")
        .asInstanceOf[graft.cypher.CypherRows].df
      val counts = g.nodes.groupBy("label").agg(count(lit(1)).as("n_nodes"))
      shown.join(counts.withColumnRenamed("label", "labelOrType"),
          Seq("labelOrType"), "left")
        .select(col("name"), col("type"), col("entityType"),
          col("labelOrType"), col("property"), col("n_nodes"))
        .orderBy("name")
    },
    Some("""SELECT * FROM (
           |  SELECT 'pub_name' AS name, 'UNIQUENESS' AS type,
           |    'NODE' AS entityType, 'Publisher' AS labelOrType,
           |    'name' AS property,
           |    (SELECT CAST(COUNT(DISTINCT source) AS BIGINT)
           |     FROM documents) AS n_nodes
           |  UNION ALL
           |  SELECT 'uniq_Article_doc_id', 'UNIQUENESS', 'NODE', 'Article',
           |    'doc_id',
           |    (SELECT CAST(COUNT(*) AS BIGINT) FROM documents))
           |ORDER BY name""".stripMargin))

  private val c63 = Entry("c63_cypher_schema_introspection",
    (s, dir) => {
      // db.schema.nodeTypeProperties (round 10) — the introspection call
      // schema-inference/modeling tools issue on connect: the property
      // inventory per label with a MANDATORY flag computed from the DATA
      // (present on every node of the label; the out-of-band key property
      // always is). A partial property is SET first so the flag carries
      // real signal: `flagged` exists only on English articles, so its
      // mandatory value is data-derived, not a constant — the oracle
      // derives it the same way.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("MATCH (a:Article) WHERE a.lang = 'en' SET a.flagged = 'y'")
      sess.run(
        """CALL db.schema.nodeTypeProperties()
          |YIELD nodeType, nodeLabels, propertyName, propertyTypes, mandatory
          |RETURN nodeType, nodeLabels, propertyName, propertyTypes, mandatory
          |ORDER BY nodeType, propertyName""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT * FROM (
           |  SELECT ':`Article`' AS nodeType, 'Article' AS nodeLabels,
           |    'doc_id' AS propertyName, 'String' AS propertyTypes,
           |    TRUE AS mandatory
           |  UNION ALL SELECT ':`Article`', 'Article', 'flagged', 'String',
           |    (SELECT COUNT(*) FILTER (lang = 'en') FROM documents)
           |      = (SELECT COUNT(*) FROM documents)
           |  UNION ALL SELECT ':`Article`', 'Article', 'lang', 'String', TRUE
           |  UNION ALL SELECT ':`Article`', 'Article', 'title', 'String', TRUE
           |  UNION ALL SELECT ':`Publisher`', 'Publisher', 'name', 'String',
           |    TRUE)
           |ORDER BY nodeType, propertyName""".stripMargin))

  private val c64 = Entry("c64_cypher_gds_betweenness",
    (s, dir) => {
      // gds.betweenness.stream (round 10) — x12's sampled Brandes surfaced
      // through the procedure registry: {samplingSize: 64} picks the 64
      // md5-lowest node KEYS as sources (deterministic where GDS samples
      // randomly — documented divergence) and rescales by |V|/64, the
      // unbiased estimator. The whole-store projection mixes Articles and
      // Publishers into the sample; sampled publishers contribute 0 (their
      // BFS has no intermediates on a star), so the x12 closed form holds:
      // score(pub) = |sampled articles of pub| · (k−1) · |V|/64, articles 0.
      // |V|/64 is a power-of-two division — exact doubles, full hash.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run(
        """CALL gds.betweenness.stream({samplingSize: 64}) YIELD key, score
          |RETURN key, score ORDER BY key""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""WITH keys AS (
           |  SELECT CAST(doc_id AS VARCHAR) AS key, source, TRUE AS is_art
           |  FROM documents
           |  UNION ALL
           |  SELECT DISTINCT source, source, FALSE FROM documents),
           |samp AS (SELECT key, source, is_art FROM keys
           |         ORDER BY md5(key), key LIMIT 64),
           |deg AS (SELECT source, COUNT(*) AS k FROM documents GROUP BY source),
           |sp AS (SELECT source, COUNT(*) AS n_samp FROM samp
           |       WHERE is_art GROUP BY source),
           |tot AS (SELECT COUNT(*) AS n FROM keys)
           |SELECT keys.key,
           |  CASE WHEN keys.is_art THEN 0.0
           |       ELSE round(CAST(COALESCE(sp.n_samp, 0) * (deg.k - 1) AS DOUBLE)
           |            * (CAST(tot.n AS DOUBLE) / LEAST(64, tot.n)), 6) END
           |    AS score
           |FROM keys
           |LEFT JOIN deg ON keys.key = deg.source AND NOT keys.is_art
           |LEFT JOIN sp ON keys.key = sp.source AND NOT keys.is_art
           |CROSS JOIN tot
           |ORDER BY key""".stripMargin))

  private val c65 = Entry("c65_cypher_gds_closeness",
    (s, dir) => {
      // gds.closeness.stream + gds.closeness.harmonic.stream (round 10)
      // over a named projection of a SMALL graph — the honest contract for
      // all-pairs centralities: the distance table is inherently quadratic
      // in component size (GDS computes these on its in-memory projection
      // for the same reason), so the projection bound is the scale knob.
      // Fixture: the 20 publishers on a ring + skip-3 chord lattice over
      // their alphabetical rank — connected, diameter ~4, fixed size at
      // every SF. The oracle replays the BFS as a recursive CTE and both
      // formulas exactly: closeness = r/Σd, harmonic = Σ(1/d)/(|V|−1),
      // 6-dp pinned (x10's float posture).
      val pubs = Tables(s, dir, "documents").select(col("source")).distinct()
      val ranked = pubs.select(col("source"),
        (row_number().over(Window.orderBy("source")) - 1).cast("long").as("r"))
      val nP = ranked.count()
      def chord(off: Int) = ranked
        .select(col("source").as("srcKey"), ((col("r") + off) % nP).as("dr"))
        .join(ranked.select(col("source").as("dstKey"), col("r").as("dr")),
          Seq("dr"))
        .select(lit("Pub").as("srcLabel"), col("srcKey"),
          lit("NEXT").as("relType"), lit("Pub").as("dstLabel"), col("dstKey"))
      val nodes = pubs.select(lit("Pub").as("label"), col("source").as("key"),
        typedlit(Map.empty[String, String]).as("props"))
      val g = graft.graph.PropertyGraph.empty(s)
        .mergeNodes(nodes)
        .mergeEdgesByKey(chord(1))
        .mergeEdgesByKey(chord(3))
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Pub" -> "name"))
      sess.run("CALL gds.graph.project('pubnet', 'Pub', 'NEXT')")
      val cl = sess.run(
        """CALL gds.closeness.stream('pubnet') YIELD key, score
          |RETURN key, score""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
      val hm = sess.run(
        """CALL gds.closeness.harmonic.stream('pubnet') YIELD key, centrality
          |RETURN key, centrality""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
      cl.join(hm, Seq("key")).orderBy("key")
    },
    Some("""WITH RECURSIVE
           |p AS (SELECT source, CAST(ROW_NUMBER() OVER (ORDER BY source) - 1
           |        AS BIGINT) AS r
           |      FROM (SELECT DISTINCT source FROM documents)),
           |n AS (SELECT COUNT(*) AS n FROM p),
           |e0 AS (
           |  SELECT a.source AS s, b.source AS d FROM p a, p b, n
           |  WHERE b.r = (a.r + 1) % n.n
           |  UNION ALL
           |  SELECT a.source, b.source FROM p a, p b, n
           |  WHERE b.r = (a.r + 3) % n.n),
           |e AS (SELECT s, d FROM e0 UNION SELECT d, s FROM e0),
           |walk(src, node, dist) AS (
           |  SELECT s, d, CAST(1 AS BIGINT) FROM e
           |  UNION
           |  SELECT w.src, e.d, w.dist + 1 FROM walk w JOIN e ON e.s = w.node
           |  WHERE w.dist < 8),
           |dmin AS (SELECT src, node, MIN(dist) AS dist FROM walk
           |         WHERE src <> node GROUP BY src, node),
           |agg AS (SELECT src, COUNT(*) AS r, SUM(dist) AS sd,
           |          SUM(1.0 / dist) AS h
           |        FROM dmin GROUP BY src)
           |SELECT agg.src AS key,
           |  round(CAST(agg.r AS DOUBLE) / CAST(agg.sd AS DOUBLE), 6) AS score,
           |  round(agg.h / (n.n - 1), 6) AS centrality
           |FROM agg, n ORDER BY key""".stripMargin))

  private val c66 = Entry("c66_cypher_gds_kcore",
    (s, dir) => {
      // gds.kcore.stream (round 10) — FULL core decomposition (coreness
      // per node) by iterated neighborhood h-index, where x14 answers only
      // fixed-k membership. Fixture: doc_ids in blocks of 8 — a 5-clique
      // (coreness 4) with a 3-node chain tail (coreness 1) hanging off the
      // clique; straggler blocks shrink the clique (coreness m−1). The
      // h-index erosion depth is CONSTANT by construction (the x20 lesson:
      // bound structure depth, not node count — a long chain would erode
      // one hop per round), so rounds stay ~4 at every SF. The oracle is
      // the closed form of the construction; the engine runs the real
      // fixpoint iteration and must land on it.
      val docs = Tables(s, dir, "documents")
      val n = docs.count()
      // RANK-keyed graph (round 15, VERDICT r14 #3): blocks of 8 over the
      // dense rank, so block arithmetic is exact on ANY id distribution —
      // the striped rehearsal ids included
      val ranked = docRanks(s, docs)
      val r = col("rk") % 8
      def edge(dstOff: org.apache.spark.sql.Column) = Seq(
        lit("Doc").as("srcLabel"), col("rk").cast("string").as("srcKey"),
        lit("E").as("relType"), lit("Doc").as("dstLabel"),
        (col("rk") + dstOff).cast("string").as("dstKey"))
      val clique = ranked.filter(r <= 3)
        .select(col("rk"), explode(sequence(lit(1L), lit(4L) - r)).as("off"))
        .filter(col("rk") + col("off") < n)
        .select(edge(col("off")): _*)
      val chain = ranked.filter(r.isin(4, 5, 6) && col("rk") + 1 < n)
        .select(edge(lit(1L)): _*)
      val nodes = ranked.select(lit("Doc").as("label"),
        col("rk").cast("string").as("key"),
        typedlit(Map.empty[String, String]).as("props"))
      val g = graft.graph.PropertyGraph.empty(s)
        .mergeNodes(nodes)
        .mergeEdgesByKey(clique)
        .mergeEdgesByKey(chain)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Doc" -> "doc_id"))
      sess.run("CALL gds.graph.project('kc', 'Doc', 'E')")
      sess.run(
        """CALL gds.kcore.stream('kc') YIELD key, coreValue
          |WITH coreValue, count(*) AS n_nodes
          |RETURN coreValue, n_nodes ORDER BY coreValue""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""WITH n AS (SELECT COUNT(*) AS n FROM documents),
           |rr AS (SELECT CAST(row_number() OVER (ORDER BY doc_id) - 1
           |         AS BIGINT) AS rk FROM documents),
           |c AS (SELECT rk % 8 AS r,
           |        LEAST(CAST(5 AS BIGINT),
           |              n.n - (rk // 8) * 8) AS s
           |      FROM rr, n),
           |core AS (
           |  SELECT CASE WHEN r < s
           |           THEN CASE WHEN s >= 2 THEN s - 1 ELSE 0 END
           |           ELSE 1 END AS coreValue
           |  FROM c)
           |SELECT coreValue, CAST(COUNT(*) AS BIGINT) AS n_nodes
           |FROM core GROUP BY coreValue ORDER BY coreValue""".stripMargin))

  private val c67 = Entry("c67_cypher_gds_louvain",
    (s, dir) => {
      // gds.louvain.stream (round 10) — modularity-optimizing community
      // detection as DETERMINISTIC single-level synchronous local moving
      // (exact integer gain comparisons, min-label admissibility breaking
      // singleton swaps; GraphAlgorithms.louvainLocalMoving). Fixture:
      // doc_ids in 5-cliques (blocks of 5) chained by single bridge edges
      // between consecutive COMPLETE blocks — the bridge must never beat a
      // clique's internal mass, so the converged communities are exactly
      // the blocks and the oracle is the construction's closed form:
      // community(min member key) = (doc_id div 5)·5. Local-moving round
      // count is set by intra-clique consolidation (~4), independent of
      // block count — the same constant-depth posture as c66/x20.
      val docs = Tables(s, dir, "documents")
      val n = docs.count()
      val r5 = col("doc_id") % 5
      // existence = within the id STRIPE (≡ doc_id+off < n at the gate's
      // single contiguous stripe — see stripeParts)
      val (_, lPos, lPer) = stripeParts(docs, n)
      def edge(dstOff: org.apache.spark.sql.Column) = Seq(
        lit("Doc").as("srcLabel"), col("doc_id").cast("string").as("srcKey"),
        lit("E").as("relType"), lit("Doc").as("dstLabel"),
        (col("doc_id") + dstOff).cast("string").as("dstKey"))
      val clique = docs.filter(r5 <= 3)
        .select(col("doc_id"), explode(sequence(lit(1L), lit(4L) - r5)).as("off"))
        .filter(lPos + col("off") < lPer)
        .select(edge(col("off")): _*)
      // bridge only between COMPLETE blocks: a size-1 straggler would
      // otherwise be pulled into its neighbor (its only edge IS the bridge)
      val bridge = docs.filter(r5 === 0 && lPos + 9 < lPer)
        .select(edge(lit(5L)): _*)
      val nodes = docs.select(lit("Doc").as("label"),
        col("doc_id").cast("string").as("key"),
        typedlit(Map.empty[String, String]).as("props"))
      val g = graft.graph.PropertyGraph.empty(s)
        .mergeNodes(nodes)
        .mergeEdgesByKey(clique)
        .mergeEdgesByKey(bridge)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Doc" -> "doc_id"))
      sess.run("CALL gds.graph.project('lv', 'Doc', 'E')")
      sess.run(
        """CALL gds.louvain.stream('lv') YIELD key, communityKey
          |RETURN key, communityKey ORDER BY key""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT CAST(doc_id AS VARCHAR) AS key,
           |  CAST((doc_id // 5) * 5 AS VARCHAR) AS communityKey
           |FROM documents ORDER BY key""".stripMargin))

  private val c68 = Entry("c68_cypher_vector_index",
    (s, dir) => {
      // Neo4j 5 vector index surface (VERDICT r10 #1) — the GraphRAG
      // statements LangChain's Neo4jVector issues on first use (the
      // reference's requirements.txt:2-4 declares exactly that stack):
      // CREATE VECTOR INDEX + db.index.vector.queryNodes(name, k, $emb).
      // Backed by the v15 sign-LSH layout (8 tables × 12-bit portable
      // planes): the ONE query vector buckets driver-side, candidates come
      // off the snapshot as a literal bucket-equality filter pushed into
      // the scan — no join, no shuffle beyond the top-k — and exact cosine
      // re-scores candidates; score = (1 + cos)/2, Neo4j's normalization,
      // left-fold dot products so the doubles replay in DuckDB. Three
      // query vectors (corpus members 0/7/42) probe the indexed 500.
      val emb = Tables(s, dir, "embeddings")
      val nodes = emb.select(lit("Doc").as("label"),
        col("vec_id").cast("string").as("key"),
        map(lit("embedding"), concat_ws(",",
          transform(col("embedding"),
            x => x.cast("double").cast("string")))).as("props"))
      val g = graft.graph.PropertyGraph.empty(s).mergeNodes(nodes)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Doc" -> "vec_id"))
      sess.run(
        """CREATE VECTOR INDEX docEmb FOR (d:Doc) ON d.embedding
          |OPTIONS {indexConfig: {`vector.dimensions`: 64,
          |  `vector.similarity_function`: 'cosine'}}""".stripMargin)
      val qids = Seq(0L, 7L, 42L, 99L, 123L, 250L, 381L, 499L)
      val byId = emb.filter(col("vec_id").isin(qids: _*))
        // bounded: the 8 fixed query ids
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
      qids.map { qid =>
        sess.run(
          """CALL db.index.vector.queryNodes('docEmb', 10, $q)
            |YIELD node, score
            |RETURN node.vec_id AS hit, score""".stripMargin,
          Map("q" -> byId(qid)))
          .asInstanceOf[graft.cypher.CypherRows].df
          .select(lit(qid).as("qid"), col("hit").cast("long").as("hit"),
            col("score"))
      }.reduce(_ unionByName _)
        .orderBy(col("qid"), col("score").desc, col("hit"))
    },
    Some(vectorIndexTopkOracleSql))

  private val c69 = Entry("c69_cypher_fulltext_index",
    (s, dir) => {
      // Full-text index surface (VERDICT r10 #4) — the hybrid-search
      // sibling of c68 in the same LangChain tutorials: CREATE FULLTEXT
      // INDEX over Article.title + db.index.fulltext.queryNodes with the
      // minimal grammar (terms, AND, OR, quoted phrase). Scoring is the
      // LOG-FREE BM25 (t21's bit-determinism posture: idf without the
      // monotone ln, Lucene-default k1/b length correction), summed per
      // doc in CLAUSE ORDER via a sorted-array left fold — so the DuckDB
      // oracle replays every double exactly. Three queries: a conjunction,
      // a phrase, a disjunction.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run(
        "CREATE FULLTEXT INDEX titles FOR (a:Article) ON EACH [a.title]")
      val queries = Seq(
        (1L, "table AND value"),
        (2L, "\"agg row\""),
        (3L, "window OR spark"))
      queries.map { case (qid, q) =>
        sess.run(
          s"""CALL db.index.fulltext.queryNodes('titles', '$q')
             |YIELD node, score
             |RETURN node.doc_id AS hit, score""".stripMargin)
          .asInstanceOf[graft.cypher.CypherRows].df
          .select(lit(qid).as("qid"), col("hit").cast("long").as("hit"),
            col("score"))
      }.reduce(_ unionByName _)
        .orderBy(col("qid"), col("score").desc, col("hit"))
    },
    Some("""WITH d AS (
           |  SELECT CAST(doc_id AS VARCHAR) AS key, doc_id,
           |    substr(text, 1, 30) AS title
           |  FROM documents),
           |tk AS (SELECT key, doc_id,
           |    regexp_split_to_array(lower(title), '[^a-z0-9]+') AS t
           |  FROM d),
           |post AS (
           |  SELECT key, doc_id, term,
           |    row_number() OVER (PARTITION BY key ORDER BY pos) AS pos
           |  FROM (SELECT key, doc_id, unnest(t) AS term,
           |          generate_subscripts(t, 1) AS pos FROM tk) z
           |  WHERE term <> ''),
           |doclen AS (SELECT key, doc_id, CAST(COUNT(*) AS BIGINT) AS dl
           |  FROM post GROUP BY key, doc_id),
           |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM doclen),
           |tf1 AS (
           |  SELECT key, 0 AS cid, CAST(COUNT(*) AS BIGINT) AS tf
           |  FROM post WHERE term = 'table' GROUP BY key
           |  UNION ALL
           |  SELECT key, 1, CAST(COUNT(*) AS BIGINT)
           |  FROM post WHERE term = 'value' GROUP BY key),
           |m1 AS (SELECT key FROM tf1 GROUP BY key HAVING COUNT(*) = 2),
           |tf2 AS (
           |  SELECT p1.key, 0 AS cid, CAST(COUNT(*) AS BIGINT) AS tf
           |  FROM post p1 JOIN post p2
           |    ON p2.key = p1.key AND p2.pos = p1.pos + 1
           |  WHERE p1.term = 'agg' AND p2.term = 'row'
           |  GROUP BY p1.key),
           |m2 AS (SELECT DISTINCT key FROM tf2),
           |tf3 AS (
           |  SELECT key, 0 AS cid, CAST(COUNT(*) AS BIGINT) AS tf
           |  FROM post WHERE term = 'window' GROUP BY key
           |  UNION ALL
           |  SELECT key, 1, CAST(COUNT(*) AS BIGINT)
           |  FROM post WHERE term = 'spark' GROUP BY key),
           |m3 AS (SELECT DISTINCT key FROM tf3),
           |allq AS (
           |  SELECT 1 AS qid, t.key, t.cid, t.tf FROM tf1 t JOIN m1 USING (key)
           |  UNION ALL
           |  SELECT 2, t.key, t.cid, t.tf FROM tf2 t JOIN m2 USING (key)
           |  UNION ALL
           |  SELECT 3, t.key, t.cid, t.tf FROM tf3 t JOIN m3 USING (key)),
           |dfs AS (SELECT qid, cid, CAST(COUNT(*) AS BIGINT) AS df
           |  FROM (SELECT 1 AS qid, cid, key FROM tf1
           |        UNION ALL SELECT 2, cid, key FROM tf2
           |        UNION ALL SELECT 3, cid, key FROM tf3) u
           |  GROUP BY qid, cid),
           |contribs AS (
           |  SELECT a.qid, a.key, a.cid,
           |    ((CAST(a.tf AS DOUBLE) * (1.2 + 1.0)) /
           |      (CAST(a.tf AS DOUBLE) + 1.2 *
           |        ((1.0 - 0.75) +
           |          (0.75 * CAST(l.dl AS DOUBLE)) / s.avgdl))) *
           |    (((CAST(s.n AS DOUBLE) - CAST(f.df AS DOUBLE)) + 0.5) /
           |      (CAST(f.df AS DOUBLE) + 0.5)) AS contrib
           |  FROM allq a
           |  JOIN dfs f ON f.qid = a.qid AND f.cid = a.cid
           |  JOIN doclen l USING (key)
           |  CROSS JOIN stats s),
           |scored AS (
           |  SELECT qid, key,
           |    list_reduce(list(contrib ORDER BY cid), (a,b) -> a + b)
           |      AS score
           |  FROM contribs GROUP BY qid, key)
           |SELECT CAST(s.qid AS BIGINT) AS qid, l.doc_id AS hit, s.score
           |FROM scored s JOIN doclen l USING (key)
           |ORDER BY qid, score DESC, hit""".stripMargin))

  private val c70 = Entry("c70_cypher_show_procedures",
    (s, dir) => {
      // SHOW PROCEDURES (VERDICT r10 #6) — Browser and cypher-shell issue
      // it on connect. Rows project the procedure REGISTRY (signature from
      // the registered YIELD schema, mode from the side-effect classifier
      // EXPLAIN trusts), so there is no second list to drift; CypherSpec
      // derives the full-listing expectations from the registry. The
      // oracle hashes the STABLE subset — the db.*/dbms.* introspection
      // and index procedures, which are Neo4j's own surface (the gds.*
      // tail grows round over round and is spec-verified instead).
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run("SHOW PROCEDURES").asInstanceOf[graft.cypher.CypherRows].df
        .filter(col("name").startsWith("db.") ||
          col("name").startsWith("dbms."))
        .select(col("name"), col("mode"))
        .orderBy("name")
    },
    Some("""SELECT * FROM (VALUES
           |  ('db.create.setNodeVectorProperty', 'WRITE'),
           |  ('db.index.fulltext.queryNodes', 'READ'),
           |  ('db.index.fulltext.queryRelationships', 'READ'),
           |  ('db.index.vector.createNodeIndex', 'WRITE'),
           |  ('db.index.vector.queryNodes', 'READ'),
           |  ('db.index.vector.queryRelationships', 'READ'),
           |  ('db.labels', 'READ'),
           |  ('db.propertyKeys', 'READ'),
           |  ('db.relationshipTypes', 'READ'),
           |  ('db.schema.nodeTypeProperties', 'READ'),
           |  ('db.schema.relTypeProperties', 'READ'),
           |  ('dbms.components', 'READ')) AS t(name, mode)
           |ORDER BY name""".stripMargin))

  private val c71 = Entry("c71_cypher_vector_lifecycle",
    (s, dir) => {
      // The COMPLETE LangChain Neo4jVector lifecycle as Cypher statements
      // (round 11): add chunks (one set-oriented UNWIND+MERGE batch), set
      // each embedding via db.create.setNodeVectorProperty — the
      // per-record write style of the reference's own crawler — then
      // CREATE VECTOR INDEX and retrieve with queryNodes for three query
      // vectors. 24 chunks off the embeddings fixture; the oracle
      // re-derives candidates and scores from the raw floats, proving the
      // setter's string rendering round-trips exactly.
      val emb = Tables(s, dir, "embeddings")
      val rows = emb.filter(col("vec_id") < 24)
        // bounded: the declared 24-chunk lifecycle fixture
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
        .sortBy(_._1)
      val sess = new graft.cypher.CypherSession(
        graft.graph.PropertyGraph.empty(s), keyProps = Map("Chunk" -> "id"))
      sess.run("UNWIND $ids AS id MERGE (c:Chunk {id: id})",
        Map("ids" -> rows.map(_._1.toString).toSeq))
      rows.foreach { case (id, v) =>
        sess.run(
          s"""MATCH (c:Chunk {id: '$id'})
             |CALL db.create.setNodeVectorProperty(c, 'embedding', $$v)
             |YIELD nodePropertiesWritten RETURN nodePropertiesWritten"""
            .stripMargin,
          Map("v" -> v))
      }
      sess.run(
        """CREATE VECTOR INDEX chunks FOR (c:Chunk) ON c.embedding
          |OPTIONS {indexConfig: {`vector.dimensions`: 64,
          |  `vector.similarity_function`: 'cosine'}}""".stripMargin)
      Seq(5L, 11L, 23L).map { qid =>
        sess.run(
          """CALL db.index.vector.queryNodes('chunks', 5, $q)
            |YIELD node, score
            |RETURN node.id AS hit, score""".stripMargin,
          Map("q" -> rows(qid.toInt)._2))
          .asInstanceOf[graft.cypher.CypherRows].df
          .select(lit(qid).as("qid"), col("hit").cast("long").as("hit"),
            col("score"))
      }.reduce(_ unionByName _)
        .orderBy(col("qid"), col("score").desc, col("hit"))
    },
    Some("""WITH v AS (
           |  SELECT vec_id,
           |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dvec,
           |    sqrt(list_reduce(list_transform(embedding,
           |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
           |      (a,b) -> a + b)) AS nrm
           |  FROM embeddings WHERE vec_id < 24),
           |planes AS (
           |  SELECT t.t, i.i,
           |    list_transform(range(0, 64), j ->
           |      CAST(CAST('0x' || substr(md5(t.t || ':' || i.i || ':' || j),
           |        1, 15) AS BIGINT) AS DOUBLE) / 576460752303423488 - 1) AS w
           |  FROM range(0, 8) t(t), range(0, 12) i(i)),
           |bits AS MATERIALIZED (
           |  SELECT v.vec_id, p.t,
           |    CAST(SUM(CASE WHEN list_reduce(list_transform(
           |        list_zip(p.w, v.dvec),
           |        x -> x[1] * x[2]), (a,b) -> a + b) >= 0
           |      THEN 1 << p.i ELSE 0 END) AS BIGINT) AS bucket
           |  FROM v, planes p GROUP BY v.vec_id, p.t),
           |q AS (SELECT * FROM (VALUES (5), (11), (23)) AS t(qid)),
           |cand AS (
           |  SELECT DISTINCT q.qid, b2.vec_id
           |  FROM q
           |  JOIN bits b1 ON b1.vec_id = q.qid
           |  JOIN bits b2 ON b2.t = b1.t AND b2.bucket = b1.bucket),
           |scored AS (
           |  SELECT c.qid, c.vec_id,
           |    (1.0 + list_reduce(list_transform(list_zip(x.dvec, y.dvec),
           |      p -> p[1] * p[2]), (a,b) -> a + b) / (x.nrm * y.nrm)) / 2.0
           |      AS score
           |  FROM cand c
           |  JOIN v x ON x.vec_id = c.qid
           |  JOIN v y ON y.vec_id = c.vec_id),
           |top AS (
           |  SELECT qid, vec_id, score,
           |    row_number() OVER (PARTITION BY qid
           |      ORDER BY score DESC, vec_id) AS rn
           |  FROM scored)
           |SELECT CAST(qid AS BIGINT) AS qid, vec_id AS hit, score
           |FROM top WHERE rn <= 5
           |ORDER BY qid, score DESC, hit""".stripMargin))

  private val c72 = Entry("c72_cypher_hybrid_search",
    (s, dir) => {
      // LangChain Neo4jVector HYBRID retrieval (round 11): the vector and
      // fulltext indexes queried over the SAME nodes, each side's scores
      // normalized by its own max, union'd, per-node max, top-k — exactly
      // the combination formula Neo4jVector's hybrid mode computes (its
      // retrieval_query template). Articles carry both a title and an
      // embedding (vec_id = doc_id); the combination runs as DataFrame
      // ops over the two queryNodes results — the full collect-of-node-
      // maps Cypher statement form is out of scope, documented.
      val docs = Tables(s, dir, "documents")
      val emb = Tables(s, dir, "embeddings")
      val nodes = docs.join(emb, docs("doc_id") === emb("vec_id"))
        .select(lit("Doc").as("label"),
          docs("doc_id").cast("string").as("key"),
          map(lit("title"), substring(col("text"), 1, 30),
            lit("embedding"), concat_ws(",",
              transform(col("embedding"),
                x => x.cast("double").cast("string")))).as("props"))
      val g = graft.graph.PropertyGraph.empty(s).mergeNodes(nodes)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Doc" -> "doc_id"))
      sess.run(
        """CREATE VECTOR INDEX ve FOR (d:Doc) ON d.embedding
          |OPTIONS {indexConfig: {`vector.dimensions`: 64}}""".stripMargin)
      sess.run("CREATE FULLTEXT INDEX fe FOR (d:Doc) ON EACH [d.title]")
      val q = emb.filter(col("vec_id") === 3)
        .select(col("embedding")).head.getSeq[Float](0).map(_.toDouble)
      val vq = sess.run(
        """CALL db.index.vector.queryNodes('ve', 10, $q)
          |YIELD node, score
          |RETURN node.doc_id AS hit, score""".stripMargin, Map("q" -> q))
        .asInstanceOf[graft.cypher.CypherRows].df
        .select(col("hit").cast("long").as("hit"), col("score"))
      val fq = sess.run(
        """CALL db.index.fulltext.queryNodes('fe', 'table value')
          |YIELD node, score
          |RETURN node.doc_id AS hit, score""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
        .select(col("hit").cast("long").as("hit"), col("score"))
      def normalized(df: org.apache.spark.sql.DataFrame) =
        df.crossJoin(broadcast(df.agg(max(col("score")).as("__mx"))))
          .select(col("hit"), (col("score") / col("__mx")).as("score"))
      normalized(vq).unionByName(normalized(fq))
        .groupBy("hit").agg(max(col("score")).as("score"))
        .orderBy(col("score").desc, col("hit"))
        .limit(10)
    },
    Some("""WITH pop AS MATERIALIZED (
           |  SELECT e.vec_id AS id,
           |    list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS dvec,
           |    sqrt(list_reduce(list_transform(e.embedding,
           |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
           |      (a,b) -> a + b)) AS nrm,
           |    substr(d.text, 1, 30) AS title
           |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
           |planes AS (
           |  SELECT t.t, i.i,
           |    list_transform(range(0, 64), j ->
           |      CAST(CAST('0x' || substr(md5(t.t || ':' || i.i || ':' || j),
           |        1, 15) AS BIGINT) AS DOUBLE) / 576460752303423488 - 1) AS w
           |  FROM range(0, 8) t(t), range(0, 12) i(i)),
           |bits AS MATERIALIZED (
           |  SELECT v.id, p.t,
           |    CAST(SUM(CASE WHEN list_reduce(list_transform(
           |        list_zip(p.w, v.dvec),
           |        x -> x[1] * x[2]), (a,b) -> a + b) >= 0
           |      THEN 1 << p.i ELSE 0 END) AS BIGINT) AS bucket
           |  FROM pop v, planes p GROUP BY v.id, p.t),
           |vcand AS (
           |  SELECT DISTINCT b2.id
           |  FROM bits b1 JOIN bits b2 ON b2.t = b1.t AND b2.bucket = b1.bucket
           |  WHERE b1.id = 3),
           |vscored AS (
           |  SELECT c.id,
           |    (1.0 + list_reduce(list_transform(list_zip(x.dvec, y.dvec),
           |      p -> p[1] * p[2]), (a,b) -> a + b) / (x.nrm * y.nrm)) / 2.0
           |      AS score
           |  FROM vcand c
           |  JOIN pop x ON x.id = 3
           |  JOIN pop y ON y.id = c.id),
           |vtop AS MATERIALIZED (
           |  SELECT id, score FROM (
           |    SELECT id, score,
           |      row_number() OVER (ORDER BY score DESC, id) AS rn
           |    FROM vscored) z
           |  WHERE rn <= 10),
           |vnorm AS (
           |  SELECT id, score / (SELECT MAX(score) FROM vtop) AS score
           |  FROM vtop),
           |tk AS (SELECT CAST(id AS VARCHAR) AS key, id,
           |    regexp_split_to_array(lower(title), '[^a-z0-9]+') AS t
           |  FROM pop),
           |post AS MATERIALIZED (
           |  SELECT key, id, term,
           |    row_number() OVER (PARTITION BY key ORDER BY pos) AS pos
           |  FROM (SELECT key, id, unnest(t) AS term,
           |          generate_subscripts(t, 1) AS pos FROM tk) z
           |  WHERE term <> ''),
           |doclen AS (SELECT key, id, CAST(COUNT(*) AS BIGINT) AS dl
           |  FROM post GROUP BY key, id),
           |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM doclen),
           |ftf AS (
           |  SELECT key, 0 AS cid, CAST(COUNT(*) AS BIGINT) AS tf
           |  FROM post WHERE term = 'table' GROUP BY key
           |  UNION ALL
           |  SELECT key, 1, CAST(COUNT(*) AS BIGINT)
           |  FROM post WHERE term = 'value' GROUP BY key),
           |fdf AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS df
           |  FROM ftf GROUP BY cid),
           |fm AS (SELECT DISTINCT key FROM ftf),
           |fc AS (
           |  SELECT t.key, t.cid,
           |    ((CAST(t.tf AS DOUBLE) * (1.2 + 1.0)) /
           |      (CAST(t.tf AS DOUBLE) + 1.2 *
           |        ((1.0 - 0.75) +
           |          (0.75 * CAST(l.dl AS DOUBLE)) / s.avgdl))) *
           |    (((CAST(s.n AS DOUBLE) - CAST(f.df AS DOUBLE)) + 0.5) /
           |      (CAST(f.df AS DOUBLE) + 0.5)) AS contrib
           |  FROM ftf t
           |  JOIN fdf f USING (cid)
           |  JOIN doclen l USING (key)
           |  CROSS JOIN stats s),
           |fs AS MATERIALIZED (
           |  SELECT c.key,
           |    list_reduce(list(c.contrib ORDER BY c.cid), (a,b) -> a + b)
           |      AS score
           |  FROM fc c JOIN fm USING (key) GROUP BY c.key),
           |fnorm AS (
           |  SELECT l.id, s2.score / (SELECT MAX(score) FROM fs) AS score
           |  FROM fs s2 JOIN doclen l USING (key)),
           |u AS (SELECT * FROM vnorm UNION ALL SELECT * FROM fnorm),
           |agg AS (SELECT id, MAX(score) AS score FROM u GROUP BY id)
           |SELECT id AS hit, score FROM agg
           |ORDER BY score DESC, hit LIMIT 10""".stripMargin))

  private val c73 = Entry("c73_cypher_vector_batch_ingest",
    (s, dir) => {
      // The BATCHED LangChain add_embeddings statement (VERDICT r11 #1):
      // `UNWIND $data AS row MERGE (c:Chunk {id: row.id}) WITH c, row
      // CALL db.create.setNodeVectorProperty(c, 'embedding',
      // row.embedding)` — ONE statement ingests the whole batch through
      // ONE set-oriented MERGE + ONE property-write join + ONE store pin
      // + ONE index patch. c71's per-record form pays an O(N) store pin
      // PER CHUNK (quadratic total ingest); this is the amortized shape
      // the reference's declared stack (requirements.txt:2-4) emits on
      // every add_texts call. The index is created via the PROCEDURE
      // form (db.index.vector.createNodeIndex — the pre-5.15 statement
      // LangChain issued for years, VERDICT r11 #3) and queried for
      // three query vectors; the oracle re-derives candidates and scores
      // from the raw floats, proving the batched write's string
      // rendering round-trips exactly like the per-record setter's.
      val emb = Tables(s, dir, "embeddings")
      val rows = emb.filter(col("vec_id") < 24)
        // bounded: the declared 24-chunk batch fixture
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
        .sortBy(_._1)
      val sess = new graft.cypher.CypherSession(
        graft.graph.PropertyGraph.empty(s), keyProps = Map("Chunk" -> "id"))
      sess.run(
        """UNWIND $data AS row
          |MERGE (c:Chunk {id: row.id})
          |WITH c, row
          |CALL db.create.setNodeVectorProperty(c, 'embedding', row.embedding)"""
          .stripMargin,
        Map("data" -> rows.toSeq.map { case (id, v) =>
          Map("id" -> id.toString, "embedding" -> v) }))
      sess.run("CALL db.index.vector.createNodeIndex(" +
        "'chunks', 'Chunk', 'embedding', 64, 'cosine')")
      Seq(2L, 9L, 17L).map { qid =>
        sess.run(
          """CALL db.index.vector.queryNodes('chunks', 5, $q)
            |YIELD node, score
            |RETURN node.id AS hit, score""".stripMargin,
          Map("q" -> rows(qid.toInt)._2))
          .asInstanceOf[graft.cypher.CypherRows].df
          .select(lit(qid).as("qid"), col("hit").cast("long").as("hit"),
            col("score"))
      }.reduce(_ unionByName _)
        .orderBy(col("qid"), col("score").desc, col("hit"))
    },
    Some("""WITH v AS (
           |  SELECT vec_id,
           |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dvec,
           |    sqrt(list_reduce(list_transform(embedding,
           |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
           |      (a,b) -> a + b)) AS nrm
           |  FROM embeddings WHERE vec_id < 24),
           |planes AS (
           |  SELECT t.t, i.i,
           |    list_transform(range(0, 64), j ->
           |      CAST(CAST('0x' || substr(md5(t.t || ':' || i.i || ':' || j),
           |        1, 15) AS BIGINT) AS DOUBLE) / 576460752303423488 - 1) AS w
           |  FROM range(0, 8) t(t), range(0, 12) i(i)),
           |bits AS MATERIALIZED (
           |  SELECT v.vec_id, p.t,
           |    CAST(SUM(CASE WHEN list_reduce(list_transform(
           |        list_zip(p.w, v.dvec),
           |        x -> x[1] * x[2]), (a,b) -> a + b) >= 0
           |      THEN 1 << p.i ELSE 0 END) AS BIGINT) AS bucket
           |  FROM v, planes p GROUP BY v.vec_id, p.t),
           |q AS (SELECT * FROM (VALUES (2), (9), (17)) AS t(qid)),
           |cand AS (
           |  SELECT DISTINCT q.qid, b2.vec_id
           |  FROM q
           |  JOIN bits b1 ON b1.vec_id = q.qid
           |  JOIN bits b2 ON b2.t = b1.t AND b2.bucket = b1.bucket),
           |scored AS (
           |  SELECT c.qid, c.vec_id,
           |    (1.0 + list_reduce(list_transform(list_zip(x.dvec, y.dvec),
           |      p -> p[1] * p[2]), (a,b) -> a + b) / (x.nrm * y.nrm)) / 2.0
           |      AS score
           |  FROM cand c
           |  JOIN v x ON x.vec_id = c.qid
           |  JOIN v y ON y.vec_id = c.vec_id),
           |top AS (
           |  SELECT qid, vec_id, score,
           |    row_number() OVER (PARTITION BY qid
           |      ORDER BY score DESC, vec_id) AS rn
           |  FROM scored)
           |SELECT CAST(qid AS BIGINT) AS qid, vec_id AS hit, score
           |FROM top WHERE rn <= 5
           |ORDER BY qid, score DESC, hit""".stripMargin))

  private val c74 = Entry("c74_cypher_hybrid_statement",
    (s, dir) => {
      // The LITERAL Neo4jVector hybrid retrieval_query statement (VERDICT
      // r11 #4): ONE Cypher statement — procedure calls inside CALL { },
      // per-arm collect/max normalization through a map literal, UNWIND
      // of the collected rows, statement-level UNION, and a per-node max
      // over the yielded node map (grouping by a MAP value — canonical
      // sorted-entries grouping under the hood). Reproduces c72's rows —
      // c72 computes the same combination as DataFrame ops; this is the
      // statement form LangChain actually emits — so the oracle is c72's
      // verbatim.
      val docs = Tables(s, dir, "documents")
      val emb = Tables(s, dir, "embeddings")
      val nodes = docs.join(emb, docs("doc_id") === emb("vec_id"))
        .select(lit("Doc").as("label"),
          docs("doc_id").cast("string").as("key"),
          map(lit("title"), substring(col("text"), 1, 30),
            lit("embedding"), concat_ws(",",
              transform(col("embedding"),
                x => x.cast("double").cast("string")))).as("props"))
      val g = graft.graph.PropertyGraph.empty(s).mergeNodes(nodes)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Doc" -> "doc_id"))
      sess.run(
        """CREATE VECTOR INDEX ve FOR (d:Doc) ON d.embedding
          |OPTIONS {indexConfig: {`vector.dimensions`: 64}}""".stripMargin)
      sess.run("CREATE FULLTEXT INDEX fe FOR (d:Doc) ON EACH [d.title]")
      val q = emb.filter(col("vec_id") === 3)
        .select(col("embedding")).head.getSeq[Float](0).map(_.toDouble)
      sess.run(
        """CALL {
          |  CALL db.index.vector.queryNodes('ve', 10, $q)
          |  YIELD node, score
          |  WITH collect({node: node, score: score}) AS nodes,
          |       max(score) AS max
          |  UNWIND nodes AS n
          |  RETURN n.node AS node, (n.score / max) AS score
          |  UNION
          |  CALL db.index.fulltext.queryNodes('fe', $text)
          |  YIELD node, score
          |  WITH collect({node: node, score: score}) AS nodes,
          |       max(score) AS max
          |  UNWIND nodes AS n
          |  RETURN n.node AS node, (n.score / max) AS score
          |}
          |WITH node, max(score) AS score
          |ORDER BY score DESC, toInteger(node.doc_id) ASC
          |LIMIT 10
          |RETURN node.doc_id AS hit, score""".stripMargin,
        Map("q" -> q, "text" -> "table value"))
        .asInstanceOf[graft.cypher.CypherRows].df
        .select(col("hit").cast("long").as("hit"), col("score"))
        .orderBy(col("score").desc, col("hit"))
    },
    Some("""WITH pop AS MATERIALIZED (
           |  SELECT e.vec_id AS id,
           |    list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS dvec,
           |    sqrt(list_reduce(list_transform(e.embedding,
           |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
           |      (a,b) -> a + b)) AS nrm,
           |    substr(d.text, 1, 30) AS title
           |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
           |planes AS (
           |  SELECT t.t, i.i,
           |    list_transform(range(0, 64), j ->
           |      CAST(CAST('0x' || substr(md5(t.t || ':' || i.i || ':' || j),
           |        1, 15) AS BIGINT) AS DOUBLE) / 576460752303423488 - 1) AS w
           |  FROM range(0, 8) t(t), range(0, 12) i(i)),
           |bits AS MATERIALIZED (
           |  SELECT v.id, p.t,
           |    CAST(SUM(CASE WHEN list_reduce(list_transform(
           |        list_zip(p.w, v.dvec),
           |        x -> x[1] * x[2]), (a,b) -> a + b) >= 0
           |      THEN 1 << p.i ELSE 0 END) AS BIGINT) AS bucket
           |  FROM pop v, planes p GROUP BY v.id, p.t),
           |vcand AS (
           |  SELECT DISTINCT b2.id
           |  FROM bits b1 JOIN bits b2 ON b2.t = b1.t AND b2.bucket = b1.bucket
           |  WHERE b1.id = 3),
           |vscored AS (
           |  SELECT c.id,
           |    (1.0 + list_reduce(list_transform(list_zip(x.dvec, y.dvec),
           |      p -> p[1] * p[2]), (a,b) -> a + b) / (x.nrm * y.nrm)) / 2.0
           |      AS score
           |  FROM vcand c
           |  JOIN pop x ON x.id = 3
           |  JOIN pop y ON y.id = c.id),
           |vtop AS MATERIALIZED (
           |  SELECT id, score FROM (
           |    SELECT id, score,
           |      row_number() OVER (ORDER BY score DESC, id) AS rn
           |    FROM vscored) z
           |  WHERE rn <= 10),
           |vnorm AS (
           |  SELECT id, score / (SELECT MAX(score) FROM vtop) AS score
           |  FROM vtop),
           |tk AS (SELECT CAST(id AS VARCHAR) AS key, id,
           |    regexp_split_to_array(lower(title), '[^a-z0-9]+') AS t
           |  FROM pop),
           |post AS MATERIALIZED (
           |  SELECT key, id, term,
           |    row_number() OVER (PARTITION BY key ORDER BY pos) AS pos
           |  FROM (SELECT key, id, unnest(t) AS term,
           |          generate_subscripts(t, 1) AS pos FROM tk) z
           |  WHERE term <> ''),
           |doclen AS (SELECT key, id, CAST(COUNT(*) AS BIGINT) AS dl
           |  FROM post GROUP BY key, id),
           |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM doclen),
           |ftf AS (
           |  SELECT key, 0 AS cid, CAST(COUNT(*) AS BIGINT) AS tf
           |  FROM post WHERE term = 'table' GROUP BY key
           |  UNION ALL
           |  SELECT key, 1, CAST(COUNT(*) AS BIGINT)
           |  FROM post WHERE term = 'value' GROUP BY key),
           |fdf AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS df
           |  FROM ftf GROUP BY cid),
           |fm AS (SELECT DISTINCT key FROM ftf),
           |fc AS (
           |  SELECT t.key, t.cid,
           |    ((CAST(t.tf AS DOUBLE) * (1.2 + 1.0)) /
           |      (CAST(t.tf AS DOUBLE) + 1.2 *
           |        ((1.0 - 0.75) +
           |          (0.75 * CAST(l.dl AS DOUBLE)) / s.avgdl))) *
           |    (((CAST(s.n AS DOUBLE) - CAST(f.df AS DOUBLE)) + 0.5) /
           |      (CAST(f.df AS DOUBLE) + 0.5)) AS contrib
           |  FROM ftf t
           |  JOIN fdf f USING (cid)
           |  JOIN doclen l USING (key)
           |  CROSS JOIN stats s),
           |fs AS MATERIALIZED (
           |  SELECT c.key,
           |    list_reduce(list(c.contrib ORDER BY c.cid), (a,b) -> a + b)
           |      AS score
           |  FROM fc c JOIN fm USING (key) GROUP BY c.key),
           |fnorm AS (
           |  SELECT l.id, s2.score / (SELECT MAX(score) FROM fs) AS score
           |  FROM fs s2 JOIN doclen l USING (key)),
           |u AS (SELECT * FROM vnorm UNION ALL SELECT * FROM fnorm),
           |agg AS (SELECT id, MAX(score) AS score FROM u GROUP BY id)
           |SELECT id AS hit, score FROM agg
           |ORDER BY score DESC, hit LIMIT 10""".stripMargin))

  private val c75 = Entry("c75_cypher_fulltext_boolean",
    (s, dir) => {
      // Fulltext boolean grammar beyond the LangChain templates (VERDICT
      // r11 #7): NOT (Lucene's prohibit — one anti-condition on the
      // clause's doc set, and the prohibited clause never scores),
      // parentheses grouping, and the `-term` prefix form. Scores stay
      // the c69 log-free BM25, summed over the POSITIVE clauses present
      // in clause order, so the DuckDB oracle replays every double.
      val g = docGraph(s, dir)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Article" -> "doc_id", "Publisher" -> "name"))
      sess.run(
        "CREATE FULLTEXT INDEX titles FOR (a:Article) ON EACH [a.title]")
      val queries = Seq(
        (1L, "table AND NOT value"),
        (2L, "(table OR value) AND row"),
        (3L, "window AND -spark"))
      queries.map { case (qid, q) =>
        sess.run(
          s"""CALL db.index.fulltext.queryNodes('titles', '$q')
             |YIELD node, score
             |RETURN node.doc_id AS hit, score""".stripMargin)
          .asInstanceOf[graft.cypher.CypherRows].df
          .select(lit(qid).as("qid"), col("hit").cast("long").as("hit"),
            col("score"))
      }.reduce(_ unionByName _)
        .orderBy(col("qid"), col("score").desc, col("hit"))
    },
    Some("""WITH d AS (
           |  SELECT CAST(doc_id AS VARCHAR) AS key, doc_id,
           |    substr(text, 1, 30) AS title
           |  FROM documents),
           |tk AS (SELECT key, doc_id,
           |    regexp_split_to_array(lower(title), '[^a-z0-9]+') AS t
           |  FROM d),
           |post AS (
           |  SELECT key, doc_id, term
           |  FROM (SELECT key, doc_id, unnest(t) AS term FROM tk) z
           |  WHERE term <> ''),
           |doclen AS (SELECT key, doc_id, CAST(COUNT(*) AS BIGINT) AS dl
           |  FROM post GROUP BY key, doc_id),
           |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM doclen),
           |tf AS (SELECT key, term, CAST(COUNT(*) AS BIGINT) AS tf
           |  FROM post
           |  WHERE term IN ('table', 'value', 'row', 'window', 'spark')
           |  GROUP BY key, term),
           |dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
           |  FROM tf GROUP BY term),
           |contrib AS (
           |  SELECT t.key, t.term,
           |    ((CAST(t.tf AS DOUBLE) * (1.2 + 1.0)) /
           |      (CAST(t.tf AS DOUBLE) + 1.2 *
           |        ((1.0 - 0.75) +
           |          (0.75 * CAST(l.dl AS DOUBLE)) / s.avgdl))) *
           |    (((CAST(s.n AS DOUBLE) - CAST(f.df AS DOUBLE)) + 0.5) /
           |      (CAST(f.df AS DOUBLE) + 0.5)) AS contrib
           |  FROM tf t
           |  JOIN dfq f USING (term)
           |  JOIN doclen l USING (key)
           |  CROSS JOIN stats s),
           |m1 AS (SELECT DISTINCT key FROM tf WHERE term = 'table'
           |  AND key NOT IN (SELECT key FROM tf WHERE term = 'value')),
           |s1 AS (SELECT c.key, SUM(c.contrib) AS score
           |  FROM contrib c JOIN m1 USING (key)
           |  WHERE c.term = 'table' GROUP BY c.key),
           |m2 AS (SELECT DISTINCT key FROM tf t2
           |  WHERE (t2.term = 'table' OR t2.term = 'value')
           |    AND key IN (SELECT key FROM tf WHERE term = 'row')),
           |s2 AS (SELECT c.key,
           |    list_reduce(list(c.contrib ORDER BY
           |      CASE c.term WHEN 'table' THEN 0 WHEN 'value' THEN 1
           |        ELSE 2 END), (a,b) -> a + b) AS score
           |  FROM contrib c JOIN m2 USING (key)
           |  WHERE c.term IN ('table', 'value', 'row') GROUP BY c.key),
           |m3 AS (SELECT DISTINCT key FROM tf WHERE term = 'window'
           |  AND key NOT IN (SELECT key FROM tf WHERE term = 'spark')),
           |s3 AS (SELECT c.key, SUM(c.contrib) AS score
           |  FROM contrib c JOIN m3 USING (key)
           |  WHERE c.term = 'window' GROUP BY c.key),
           |allq AS (
           |  SELECT 1 AS qid, key, score FROM s1
           |  UNION ALL SELECT 2, key, score FROM s2
           |  UNION ALL SELECT 3, key, score FROM s3)
           |SELECT CAST(a.qid AS BIGINT) AS qid, l.doc_id AS hit, a.score
           |FROM allq a JOIN doclen l USING (key)
           |ORDER BY qid, score DESC, hit""".stripMargin))

  private val c76 = Entry("c76_cypher_vector_euclidean",
    (s, dir) => {
      // Euclidean vector indexes (round 12 — the other half of Neo4j 5's
      // vector.similarity_function surface; LangChain selects it via
      // distance_strategy=EUCLIDEAN). Same sign-LSH candidate generation
      // as cosine (the engine's documented approximate candidate step),
      // exact re-scoring with Neo4j's euclidean normalization
      // score = 1 / (1 + squaredDistance) — left-fold arithmetic so the
      // DuckDB oracle replays every double.
      val emb = Tables(s, dir, "embeddings")
      val nodes = emb.select(lit("Doc").as("label"),
        col("vec_id").cast("string").as("key"),
        map(lit("embedding"), concat_ws(",",
          transform(col("embedding"),
            x => x.cast("double").cast("string")))).as("props"))
      val g = graft.graph.PropertyGraph.empty(s).mergeNodes(nodes)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Doc" -> "vec_id"))
      sess.run(
        """CREATE VECTOR INDEX docL2 FOR (d:Doc) ON d.embedding
          |OPTIONS {indexConfig: {`vector.dimensions`: 64,
          |  `vector.similarity_function`: 'euclidean'}}""".stripMargin)
      val qids = Seq(1L, 33L, 77L)
      val byId = emb.filter(col("vec_id").isin(qids: _*))
        // bounded: the 3 fixed query ids
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
      qids.map { qid =>
        sess.run(
          """CALL db.index.vector.queryNodes('docL2', 5, $q)
            |YIELD node, score
            |RETURN node.vec_id AS hit, score""".stripMargin,
          Map("q" -> byId(qid)))
          .asInstanceOf[graft.cypher.CypherRows].df
          .select(lit(qid).as("qid"), col("hit").cast("long").as("hit"),
            col("score"))
      }.reduce(_ unionByName _)
        .orderBy(col("qid"), col("score").desc, col("hit"))
    },
    Some("""WITH v AS (
           |  SELECT vec_id,
           |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dvec
           |  FROM embeddings),
           |planes AS (
           |  SELECT t.t, i.i,
           |    list_transform(range(0, 64), j ->
           |      CAST(CAST('0x' || substr(md5(t.t || ':' || i.i || ':' || j),
           |        1, 15) AS BIGINT) AS DOUBLE) / 576460752303423488 - 1) AS w
           |  FROM range(0, 8) t(t), range(0, 12) i(i)),
           |bits AS MATERIALIZED (
           |  SELECT v.vec_id, p.t,
           |    CAST(SUM(CASE WHEN list_reduce(list_transform(
           |        list_zip(p.w, v.dvec),
           |        x -> x[1] * x[2]), (a,b) -> a + b) >= 0
           |      THEN 1 << p.i ELSE 0 END) AS BIGINT) AS bucket
           |  FROM v, planes p GROUP BY v.vec_id, p.t),
           |q AS (SELECT * FROM (VALUES (1), (33), (77)) AS t(qid)),
           |cand AS (
           |  SELECT DISTINCT q.qid, b2.vec_id
           |  FROM q
           |  JOIN bits b1 ON b1.vec_id = q.qid
           |  JOIN bits b2 ON b2.t = b1.t AND b2.bucket = b1.bucket),
           |scored AS (
           |  SELECT c.qid, c.vec_id,
           |    1.0 / (1.0 + list_reduce(list_transform(
           |      list_zip(x.dvec, y.dvec),
           |      p -> (p[1] - p[2]) * (p[1] - p[2])), (a,b) -> a + b))
           |      AS score
           |  FROM cand c
           |  JOIN v x ON x.vec_id = c.qid
           |  JOIN v y ON y.vec_id = c.vec_id),
           |top AS (
           |  SELECT qid, vec_id, score,
           |    row_number() OVER (PARTITION BY qid
           |      ORDER BY score DESC, vec_id) AS rn
           |  FROM scored)
           |SELECT CAST(qid AS BIGINT) AS qid, vec_id AS hit, score
           |FROM top WHERE rn <= 5
           |ORDER BY qid, score DESC, hit""".stripMargin))

  private val c77 = Entry("c77_cypher_apoc_meta_data",
    (s, dir) => {
      // LangChain Neo4jGraph's refresh_schema (round 12): the three
      // statements langchain-neo4j — the reference's declared stack,
      // /root/reference/requirements.txt:3 — issues on EVERY Neo4jGraph
      // init (node properties, relationship properties, relationship
      // topology), all reading apoc.meta.data(), run VERBATIM including
      // the $EXCLUDED_LABELS parameter. Neo4jGraph raises and refuses to
      // construct when these fail, so this is the entry ticket for every
      // LangChain graph application. The fixture is DATA-derived:
      // customers are labeled by market segment, so the label inventory
      // and the topology fan come from the data, not fixture constants.
      val cust = Tables(s, dir, "customer")
      val nat = Tables(s, dir, "nation")
      val custNodes = cust.select(col("c_mktsegment").as("label"),
        col("c_custkey").cast("string").as("key"),
        map(lit("cname"), col("c_name")).as("props"))
      val natNodes = nat.select(lit("Nation").as("label"),
        col("n_name").as("key"),
        map(lit("regionkey"), col("n_regionkey").cast("string")).as("props"))
      val edges = cust.join(nat, cust("c_nationkey") === nat("n_nationkey"))
        .select(col("c_mktsegment").as("srcLabel"),
          col("c_custkey").cast("string").as("srcKey"),
          lit("Nation").as("dstLabel"), col("n_name").as("dstKey"),
          lit("FROM").as("relType"),
          map(lit("w"), lit("1")).as("props"))
      val g = graft.graph.PropertyGraph.empty(s)
        .mergeNodes(custNodes).mergeNodes(natNodes).mergeEdgesByKey(edges)
      // bounded: schema-bounded (5 market segments)
      val segs = cust.select("c_mktsegment").distinct().collect()
        .map(_.getString(0)) // schema-bounded (5 market segments)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = segs.map(_ -> "custkey").toMap + ("Nation" -> "name"))
      val p = Map("EXCLUDED_LABELS" ->
        Seq("_Bloom_Perspective_", "_Bloom_Scene_"))
      val np = sess.run(
        """CALL apoc.meta.data()
          |YIELD label, other, elementType, type, property
          |WHERE NOT type = "RELATIONSHIP" AND elementType = "node"
          |  AND NOT label IN $EXCLUDED_LABELS
          |WITH label AS nodeLabels, collect({property:property, type:type}) AS properties
          |RETURN {labels: nodeLabels, properties: properties} AS output""".stripMargin,
        p).asInstanceOf[graft.cypher.CypherRows].df
        .select(lit("node").as("section"), col("output.labels").as("label"),
          explode(col("output.properties")).as("pp"))
        .select(col("section"), col("label"),
          col("pp.property").as("property"), col("pp.type").as("ptype"))
      val rp = sess.run(
        """CALL apoc.meta.data()
          |YIELD label, other, elementType, type, property
          |WHERE NOT type = "RELATIONSHIP" AND elementType = "relationship"
          |  AND NOT label in $EXCLUDED_LABELS
          |WITH label AS nodeLabels, collect({property:property, type:type}) AS properties
          |RETURN {type: nodeLabels, properties: properties} AS output""".stripMargin,
        p).asInstanceOf[graft.cypher.CypherRows].df
        .select(lit("rel_prop").as("section"), col("output.type").as("label"),
          explode(col("output.properties")).as("pp"))
        .select(col("section"), col("label"),
          col("pp.property").as("property"), col("pp.type").as("ptype"))
      val rl = sess.run(
        """CALL apoc.meta.data()
          |YIELD label, other, elementType, type, property
          |WHERE type = "RELATIONSHIP" AND elementType = "node"
          |UNWIND other AS other_node
          |WITH label, elementType, type, property, toString(other_node) AS other_node
          |WHERE NOT label IN $EXCLUDED_LABELS AND NOT other_node IN $EXCLUDED_LABELS
          |RETURN {start: label, type: property, end: other_node} AS output""".stripMargin,
        p).asInstanceOf[graft.cypher.CypherRows].df
        .select(lit("rel").as("section"), col("output.start").as("label"),
          col("output.type").as("property"), col("output.end").as("ptype"))
      np.unionByName(rp).unionByName(rl)
        .orderBy("section", "label", "property", "ptype")
    },
    Some("""WITH segs AS (SELECT DISTINCT c_mktsegment AS seg FROM customer)
           |SELECT * FROM (
           |  SELECT 'node' AS section, seg AS label,
           |    'custkey' AS property, 'STRING' AS ptype FROM segs
           |  UNION ALL SELECT 'node', seg, 'cname', 'STRING' FROM segs
           |  UNION ALL SELECT 'node', 'Nation', 'regionkey', 'STRING'
           |  UNION ALL SELECT 'node', 'Nation', 'name', 'STRING'
           |  UNION ALL SELECT 'rel_prop', 'FROM', 'w', 'STRING'
           |  UNION ALL SELECT 'rel', seg, 'FROM', 'Nation' FROM segs
           |) ORDER BY section, label, property, ptype""".stripMargin))

  private val c78 = Entry("c78_cypher_default_retrieval",
    (s, dir) => {
      // Neo4jVector's DEFAULT retrieval statement, verbatim (round 12):
      // LangChain's similarity_search runs queryNodes then projects
      // `node {.*, `text`: Null, `embedding`: Null, id: Null}` — a map
      // projection with literal-entry OVERRIDES that null the payload
      // columns out of the returned metadata (the text rides its own
      // column; the embedding never leaves the store). c68/c71 proved
      // queryNodes; this proves the projection LangChain wraps it in.
      // The hash flattens the metadata map: its sorted key list plus one
      // kept entry (source), the key entry (doc_id), and the two nulled
      // payload entries.
      val docs = Tables(s, dir, "documents")
      val emb = Tables(s, dir, "embeddings")
      val nodes = docs.join(emb, docs("doc_id") === emb("vec_id"))
        .select(lit("Chunk").as("label"),
          docs("doc_id").cast("string").as("key"),
          map(lit("text"), substring(col("text"), 1, 40),
            lit("source"), col("source"),
            lit("embedding"), concat_ws(",",
              transform(col("embedding"),
                x => x.cast("double").cast("string")))).as("props"))
      val g = graft.graph.PropertyGraph.empty(s).mergeNodes(nodes)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Chunk" -> "doc_id"))
      sess.run(
        """CREATE VECTOR INDEX chunks FOR (c:Chunk) ON c.embedding
          |OPTIONS {indexConfig: {`vector.dimensions`: 64}}""".stripMargin)
      val q = emb.filter(col("vec_id") === 7)
        .select(col("embedding")).head.getSeq[Float](0).map(_.toDouble)
      sess.run(
        """CALL db.index.vector.queryNodes($index, $k, $embedding)
          |YIELD node, score
          |RETURN node.`text` AS text, score, node {.*, `text`: Null, `embedding`: Null, id: Null } AS metadata""".stripMargin,
        Map("index" -> "chunks", "k" -> 8, "embedding" -> q))
        .asInstanceOf[graft.cypher.CypherRows].df
        .select(col("text"), col("score"),
          concat_ws("|", sort_array(map_keys(col("metadata")))).as("mkeys"),
          element_at(col("metadata"), "doc_id").as("doc_id"),
          element_at(col("metadata"), "source").as("source"),
          element_at(col("metadata"), "embedding").as("emb_nulled"),
          element_at(col("metadata"), "id").as("id_nulled"))
        .orderBy(col("score").desc, col("doc_id").cast("long"))
    },
    Some("""WITH pop AS MATERIALIZED (
           |  SELECT e.vec_id AS id,
           |    list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS dvec,
           |    sqrt(list_reduce(list_transform(e.embedding,
           |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
           |      (a,b) -> a + b)) AS nrm,
           |    substr(d.text, 1, 40) AS text, d.source AS source
           |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
           |planes AS (
           |  SELECT t.t, i.i,
           |    list_transform(range(0, 64), j ->
           |      CAST(CAST('0x' || substr(md5(t.t || ':' || i.i || ':' || j),
           |        1, 15) AS BIGINT) AS DOUBLE) / 576460752303423488 - 1) AS w
           |  FROM range(0, 8) t(t), range(0, 12) i(i)),
           |bits AS MATERIALIZED (
           |  SELECT v.id, p.t,
           |    CAST(SUM(CASE WHEN list_reduce(list_transform(
           |        list_zip(p.w, v.dvec),
           |        x -> x[1] * x[2]), (a,b) -> a + b) >= 0
           |      THEN 1 << p.i ELSE 0 END) AS BIGINT) AS bucket
           |  FROM pop v, planes p GROUP BY v.id, p.t),
           |cand AS (
           |  SELECT DISTINCT b2.id
           |  FROM bits b1 JOIN bits b2 ON b2.t = b1.t AND b2.bucket = b1.bucket
           |  WHERE b1.id = 7),
           |scored AS (
           |  SELECT c.id,
           |    (1.0 + list_reduce(list_transform(list_zip(x.dvec, y.dvec),
           |      p -> p[1] * p[2]), (a,b) -> a + b) / (x.nrm * y.nrm)) / 2.0
           |      AS score
           |  FROM cand c
           |  JOIN pop x ON x.id = 7
           |  JOIN pop y ON y.id = c.id),
           |top AS (
           |  SELECT id, score,
           |    row_number() OVER (ORDER BY score DESC, id) AS rn
           |  FROM scored)
           |SELECT p.text AS text, t.score AS score,
           |  'doc_id|embedding|id|source|text' AS mkeys,
           |  CAST(t.id AS VARCHAR) AS doc_id, p.source AS source,
           |  CAST(NULL AS VARCHAR) AS emb_nulled,
           |  CAST(NULL AS VARCHAR) AS id_nulled
           |FROM top t JOIN pop p ON p.id = t.id
           |WHERE rn <= 8 ORDER BY t.score DESC, t.id""".stripMargin))

  private val c79 = Entry("c79_cypher_show_indexes_yield",
    (s, dir) => {
      // Neo4jVector's index-EXISTENCE statements (round 12): before
      // creating anything, LangChain runs `SHOW INDEXES YIELD … WHERE …
      // RETURN …` to find an existing vector / fulltext index either BY
      // NAME or by (label, property) — list indexing (labelsOrTypes[0]),
      // list equality against a LIST parameter (properties =
      // $text_node_properties), and the options map, in one statement.
      // Both statements run verbatim; the hash flattens the Neo4j-shaped
      // list/struct columns. Index names 'vector'/'keyword' are
      // LangChain's defaults.
      val docs = Tables(s, dir, "documents")
      val emb = Tables(s, dir, "embeddings")
      val nodes = docs.join(emb, docs("doc_id") === emb("vec_id"))
        .select(lit("Chunk").as("label"),
          docs("doc_id").cast("string").as("key"),
          map(lit("text"), substring(col("text"), 1, 40),
            lit("embedding"), concat_ws(",",
              transform(col("embedding"),
                x => x.cast("double").cast("string")))).as("props"))
      val g = graft.graph.PropertyGraph.empty(s).mergeNodes(nodes)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Chunk" -> "doc_id"))
      sess.run(
        """CREATE VECTOR INDEX vector FOR (c:Chunk) ON c.embedding
          |OPTIONS {indexConfig: {`vector.dimensions`: 64}}""".stripMargin)
      sess.run("CREATE FULLTEXT INDEX keyword FOR (c:Chunk) ON EACH [c.text]")
      def flat(df0: org.apache.spark.sql.DataFrame, section: String) =
        df0.select(lit(section).as("section"), col("name"),
          element_at(col("labelsOrTypes"), 1).as("label0"),
          element_at(col("properties"), 1).as("prop0"),
          col("options").getField("indexConfig")
            .getField("vector.dimensions").as("dims"),
          col("options").getField("indexConfig")
            .getField("vector.similarity_function").as("simfn"))
      val vi = sess.run(
        """SHOW INDEXES YIELD name, type, labelsOrTypes, properties, options
          |WHERE type = 'VECTOR' AND (name = $index_name
          |OR (labelsOrTypes[0] = $node_label
          |AND properties[0] = $embedding_node_property))
          |RETURN name, labelsOrTypes, properties, options""".stripMargin,
        Map("index_name" -> "some_other_name", "node_label" -> "Chunk",
          "embedding_node_property" -> "embedding"))
        .asInstanceOf[graft.cypher.CypherRows].df
      val fi = sess.run(
        """SHOW INDEXES YIELD name, type, labelsOrTypes, properties, options
          |WHERE type = 'FULLTEXT' AND (name = $keyword_index_name
          |OR (labelsOrTypes = [$node_label]
          |AND properties = $text_node_properties))
          |RETURN name, labelsOrTypes, properties, options""".stripMargin,
        Map("keyword_index_name" -> "some_other_name", "node_label" -> "Chunk",
          "text_node_properties" -> Seq("text")))
        .asInstanceOf[graft.cypher.CypherRows].df
      flat(vi, "vector").unionByName(flat(fi, "fulltext"))
        .orderBy("section", "name")
    },
    Some("""SELECT * FROM (VALUES
           |  ('fulltext', 'keyword', 'Chunk', 'text',
           |    CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR)),
           |  ('vector', 'vector', 'Chunk', 'embedding',
           |    CAST(64 AS BIGINT), 'cosine')
           |) AS t(section, name, label0, prop0, dims, simfn)
           |ORDER BY section, name""".stripMargin))

  private val c80 = Entry("c80_cypher_fulltext_relationships",
    (s, dir) => {
      // RELATIONSHIP fulltext indexes (round 12 — the other half of
      // Neo4j 5's fulltext surface; VERDICT r11 noted queryRelationships
      // as the remaining index gap): `CREATE FULLTEXT INDEX … FOR
      // ()-[r:T]-() ON EACH [r.p]` + db.index.fulltext.queryRelationships.
      // Postings build from the relType's EDGE rows (partition-pruned)
      // keyed on the engine-independent 'srcKey->dstKey' identity; the
      // scoring is the same log-free BM25 the node side hashes (c69).
      val docs = Tables(s, dir, "documents")
      val docNodes = docs.select(lit("Doc").as("label"),
        col("doc_id").cast("string").as("key"),
        map().cast("map<string,string>").as("props"))
      val pubNodes = docs.select(col("source")).distinct()
        .select(lit("Pub").as("label"), col("source").as("key"),
          map().cast("map<string,string>").as("props"))
      val edges = docs.select(lit("Doc").as("srcLabel"),
        col("doc_id").cast("string").as("srcKey"),
        lit("Pub").as("dstLabel"), col("source").as("dstKey"),
        lit("WRITTEN_BY").as("relType"),
        map(lit("note"),
          concat(col("doc_id").cast("string"), lit(" "),
            substring(col("text"), 1, 50))).as("props"))
      val g = graft.graph.PropertyGraph.empty(s)
        .mergeNodes(docNodes).mergeNodes(pubNodes).mergeEdgesByKey(edges)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Doc" -> "doc_id", "Pub" -> "name"))
      sess.run("CREATE FULLTEXT INDEX notes FOR ()-[r:WRITTEN_BY]-() " +
        "ON EACH [r.note]")
      sess.run(
        """CALL db.index.fulltext.queryRelationships('notes', $q)
          |YIELD relationship, score
          |RETURN relationship.note AS note, score""".stripMargin,
        Map("q" -> "table value"))
        .asInstanceOf[graft.cypher.CypherRows].df
        .orderBy(col("score").desc, col("note"))
    },
    Some("""WITH tk AS (
           |  SELECT CAST(doc_id AS VARCHAR) || '->' || source AS key,
           |    CAST(doc_id AS VARCHAR) || ' ' || substr(text, 1, 50) AS note
           |  FROM documents),
           |post AS MATERIALIZED (
           |  SELECT key, note, term,
           |    row_number() OVER (PARTITION BY key ORDER BY pos) AS pos
           |  FROM (SELECT key, note, unnest(t) AS term,
           |          generate_subscripts(t, 1) AS pos
           |        FROM (SELECT key, note,
           |                regexp_split_to_array(lower(note),
           |                  '[^a-z0-9]+') AS t FROM tk) z0) z
           |  WHERE term <> ''),
           |doclen AS (SELECT key, any_value(note) AS note,
           |    CAST(COUNT(*) AS BIGINT) AS dl
           |  FROM post GROUP BY key),
           |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM doclen),
           |ftf AS (
           |  SELECT key, 0 AS cid, CAST(COUNT(*) AS BIGINT) AS tf
           |  FROM post WHERE term = 'table' GROUP BY key
           |  UNION ALL
           |  SELECT key, 1, CAST(COUNT(*) AS BIGINT)
           |  FROM post WHERE term = 'value' GROUP BY key),
           |fdf AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS df
           |  FROM ftf GROUP BY cid),
           |fc AS (
           |  SELECT t.key, t.cid,
           |    ((CAST(t.tf AS DOUBLE) * (1.2 + 1.0)) /
           |      (CAST(t.tf AS DOUBLE) + 1.2 *
           |        ((1.0 - 0.75) +
           |          (0.75 * CAST(l.dl AS DOUBLE)) / s.avgdl))) *
           |    (((CAST(s.n AS DOUBLE) - CAST(f.df AS DOUBLE)) + 0.5) /
           |      (CAST(f.df AS DOUBLE) + 0.5)) AS contrib
           |  FROM ftf t
           |  JOIN fdf f USING (cid)
           |  JOIN doclen l USING (key)
           |  CROSS JOIN stats s),
           |fs AS (
           |  SELECT key,
           |    list_reduce(list(contrib ORDER BY cid), (a,b) -> a + b)
           |      AS score
           |  FROM fc GROUP BY key)
           |SELECT l.note AS note, s2.score AS score
           |FROM fs s2 JOIN doclen l USING (key)
           |ORDER BY score DESC, note""".stripMargin))

  private val c81 = Entry("c81_cypher_vector_relationships",
    (s, dir) => {
      // RELATIONSHIP vector indexes (round 12): `CREATE VECTOR INDEX …
      // FOR ()-[r:T]-() ON r.p` + db.index.vector.queryRelationships —
      // the same sign-LSH candidate step and exact (1+cos)/2 rescoring as
      // the node side (c68), over the relType's edge rows. Edges carry an
      // `eid` property so the hash identifies rows engine-independently.
      val docs = Tables(s, dir, "documents")
      val emb = Tables(s, dir, "embeddings")
      val joined = docs.join(emb, docs("doc_id") === emb("vec_id"))
      val docNodes = docs.select(lit("Doc").as("label"),
        col("doc_id").cast("string").as("key"),
        map().cast("map<string,string>").as("props"))
      val pubNodes = docs.select(col("source")).distinct()
        .select(lit("Pub").as("label"), col("source").as("key"),
          map().cast("map<string,string>").as("props"))
      val edges = joined.select(lit("Doc").as("srcLabel"),
        docs("doc_id").cast("string").as("srcKey"),
        lit("Pub").as("dstLabel"), col("source").as("dstKey"),
        lit("EMBEDS").as("relType"),
        map(lit("eid"), col("vec_id").cast("string"),
          lit("vec"), concat_ws(",", transform(col("embedding"),
            x => x.cast("double").cast("string")))).as("props"))
      val g = graft.graph.PropertyGraph.empty(s)
        .mergeNodes(docNodes).mergeNodes(pubNodes).mergeEdgesByKey(edges)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Doc" -> "doc_id", "Pub" -> "name"))
      sess.run(
        """CREATE VECTOR INDEX rvec FOR ()-[r:EMBEDS]-() ON r.vec
          |OPTIONS {indexConfig: {`vector.dimensions`: 64}}""".stripMargin)
      val q = emb.filter(col("vec_id") === 5)
        .select(col("embedding")).head.getSeq[Float](0).map(_.toDouble)
      sess.run(
        """CALL db.index.vector.queryRelationships('rvec', 6, $q)
          |YIELD relationship, score
          |RETURN relationship.eid AS eid, score""".stripMargin,
        Map("q" -> q))
        .asInstanceOf[graft.cypher.CypherRows].df
        .select(col("eid").cast("long").as("eid"), col("score"))
        .orderBy(col("score").desc, col("eid"))
    },
    Some("""WITH v AS (
           |  SELECT vec_id,
           |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dvec,
           |    sqrt(list_reduce(list_transform(embedding,
           |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
           |      (a,b) -> a + b)) AS nrm
           |  FROM embeddings),
           |planes AS (
           |  SELECT t.t, i.i,
           |    list_transform(range(0, 64), j ->
           |      CAST(CAST('0x' || substr(md5(t.t || ':' || i.i || ':' || j),
           |        1, 15) AS BIGINT) AS DOUBLE) / 576460752303423488 - 1) AS w
           |  FROM range(0, 8) t(t), range(0, 12) i(i)),
           |bits AS MATERIALIZED (
           |  SELECT v.vec_id, p.t,
           |    CAST(SUM(CASE WHEN list_reduce(list_transform(
           |        list_zip(p.w, v.dvec),
           |        x -> x[1] * x[2]), (a,b) -> a + b) >= 0
           |      THEN 1 << p.i ELSE 0 END) AS BIGINT) AS bucket
           |  FROM v, planes p GROUP BY v.vec_id, p.t),
           |cand AS (
           |  SELECT DISTINCT b2.vec_id
           |  FROM bits b1 JOIN bits b2 ON b2.t = b1.t AND b2.bucket = b1.bucket
           |  WHERE b1.vec_id = 5),
           |scored AS (
           |  SELECT c.vec_id,
           |    (1.0 + list_reduce(list_transform(list_zip(x.dvec, y.dvec),
           |      p -> p[1] * p[2]), (a,b) -> a + b) / (x.nrm * y.nrm)) / 2.0
           |      AS score
           |  FROM cand c
           |  JOIN v x ON x.vec_id = 5
           |  JOIN v y ON y.vec_id = c.vec_id),
           |top AS (
           |  SELECT vec_id, score,
           |    row_number() OVER (ORDER BY score DESC, vec_id) AS rn
           |  FROM scored)
           |SELECT vec_id AS eid, score FROM top WHERE rn <= 6
           |ORDER BY score DESC, eid""".stripMargin))

  private val c82 = Entry("c82_cypher_from_existing_graph",
    (s, dir) => {
      // Neo4jVector.from_existing_graph's FETCH statement, verbatim
      // (round 12): the entry point that embeds an EXISTING graph —
      // LangChain selects the not-yet-embedded nodes that carry at least
      // one of the text properties, concatenating them with reduce() for
      // the embedder. Exercises DYNAMIC property access `n[k]` (computed
      // key from a list parameter) in both any() and reduce() lambdas,
      // and '\n' escape sequences in string literals. elementId(n) is
      // computed by the statement but projected out of the hash (it is
      // the engine's internal stable id — the oracle identifies rows by
      // the text payload, which embeds the doc identity).
      // ONE fetch batch (round 15, VERDICT r14 #3): the statement's
      // verbatim LIMIT 1000 means LangChain processes ≤1000 rows per
      // loop pass; the entry pins one pass, so its graph is the 1600
      // lowest doc_ids (≤800 un-embedded candidates — under the batch
      // limit at EVERY SF, where the full corpus would truncate
      // nondeterministically past sf0.01 and break the oracle).
      val docs = Tables(s, dir, "documents").orderBy("doc_id").limit(1600)
      val base = map(lit("name"),
        concat(lit("d"), col("doc_id").cast("string")),
        lit("summary"), col("source"))
      val nodes = docs.select(lit("Chunk").as("label"),
        col("doc_id").cast("string").as("key"),
        when(col("doc_id") % 2 === 0,
          map_concat(base, map(lit("embedding"), lit("0.1,0.2"))))
          .otherwise(base).as("props"))
      val g = graft.graph.PropertyGraph.empty(s).mergeNodes(nodes)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Chunk" -> "id"))
      sess.run(
        """MATCH (n:`Chunk`)
          |WHERE n.embedding IS null
          |AND any(k in $props WHERE n[k] IS NOT null)
          |RETURN elementId(n) AS id, reduce(str='', k IN $props |
          |  str + '\n' + k + ': ' + coalesce(n[k], '')) AS text
          |LIMIT 1000""".stripMargin,
        Map("props" -> Seq("name", "summary")))
        .asInstanceOf[graft.cypher.CypherRows].df
        .select(col("text")).orderBy("text")
    },
    Some("""SELECT chr(10) || 'name: d' || CAST(doc_id AS VARCHAR) ||
           |  chr(10) || 'summary: ' || source AS text
           |FROM (SELECT doc_id, source FROM documents
           |      ORDER BY doc_id LIMIT 1600)
           |WHERE doc_id % 2 = 1
           |ORDER BY text""".stripMargin))

  private val c83 = Entry("c83_cypher_apoc_merge_import",
    (s, dir) => {
      // LangChain Neo4jGraph.add_graph_documents, verbatim (round 12):
      // the statements that import an LLM-EXTRACTED knowledge graph —
      // `UNWIND $data AS row CALL apoc.merge.node([row.type], {id:
      // row.id}, row.properties, {}) YIELD node …` and the chained
      // merge.node → merge.relationship form. Labels, key property names
      // and relationship types arrive WITH the data; execution is
      // set-oriented (one existence probe + one node merge per
      // statement, one edge merge for the relationship form). $data is
      // driver-side by construction — it is the LLM's output in the real
      // workload; here it derives from supplier/nation rows. The hash
      // reads the imported graph back through an ordinary MATCH.
      val sup = Tables(s, dir, "supplier")
      val nat = Tables(s, dir, "nation")
      val nodeData: Seq[Map[String, Any]] =
        // bounded: the import payload is the LLM's own output — driver-sized by declaration
        sup.select(col("s_name"), col("s_acctbal")).collect().toSeq.map(r =>
          Map[String, Any]("id" -> r.getString(0), "type" -> "Supplier",
            "properties" -> Map("acctbal" -> r.getDouble(1).toString))) ++
        // bounded: 25 nations
        nat.select(col("n_name")).collect().toSeq.map(r =>
          Map[String, Any]("id" -> r.getString(0), "type" -> "Nation",
            "properties" -> Map[String, Any]()))
      val relData: Seq[Map[String, Any]] = sup
        .join(nat, sup("s_nationkey") === nat("n_nationkey"))
        // bounded: one edge per declared import-payload supplier
        .select(col("s_name"), col("n_name")).collect().toSeq.map(r =>
          Map[String, Any]("source" -> r.getString(0),
            "source_label" -> "Supplier", "target" -> r.getString(1),
            "target_label" -> "Nation", "type" -> "LOCATED_IN",
            "properties" -> Map("via" -> "tpch")))
      val sess = new graft.cypher.CypherSession(
        graft.graph.PropertyGraph.empty(s))
      sess.run(
        "UNWIND $data AS row CALL apoc.merge.node([row.type], " +
          "{id: row.id}, row.properties, {}) YIELD node " +
          "RETURN distinct 'done' AS result",
        Map("data" -> nodeData))
      sess.run(
        "UNWIND $data AS row " +
          "CALL apoc.merge.node([row.source_label], {id: row.source},{},{}) " +
          "YIELD node as source " +
          "CALL apoc.merge.node([row.target_label], {id: row.target},{},{}) " +
          "YIELD node as target " +
          "CALL apoc.merge.relationship(source, row.type, {}, " +
          "row.properties, target) YIELD rel RETURN distinct 'done'",
        Map("data" -> relData))
      sess.run(
        """MATCH (s:Supplier)-[r:LOCATED_IN]->(n:Nation)
          |WHERE r.via = 'tpch'
          |RETURN n.id AS nation, count(*) AS suppliers,
          |  min(toFloat(s.acctbal)) AS min_acct
          |ORDER BY nation""".stripMargin)
        .asInstanceOf[graft.cypher.CypherRows].df
    },
    Some("""SELECT n.n_name AS nation,
           |  CAST(COUNT(*) AS BIGINT) AS suppliers,
           |  MIN(CAST(CAST(s.s_acctbal AS VARCHAR) AS DOUBLE)) AS min_acct
           |FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
           |GROUP BY n.n_name ORDER BY nation""".stripMargin))

  private val c84 = Entry("c84_cypher_vector_similarity_fn",
    (s, dir) => {
      // Neo4j 5's vector.similarity.cosine() function (round 12): the
      // NON-indexed retrieval idiom — `MATCH … RETURN
      // vector.similarity.cosine(n.embedding, $q) AS score ORDER BY score
      // DESC LIMIT k` — the exact brute-force baseline next to the c68
      // index path, scoring every row with the index's own normalization.
      // At 100 TB this is the shape you run when recall must be 1.0 (one
      // scan, no candidates step); the index path is the latency shape.
      val emb = Tables(s, dir, "embeddings")
      val nodes = emb.select(lit("Chunk").as("label"),
        col("vec_id").cast("string").as("key"),
        map(lit("embedding"), concat_ws(",",
          transform(col("embedding"),
            x => x.cast("double").cast("string")))).as("props"))
      val g = graft.graph.PropertyGraph.empty(s).mergeNodes(nodes)
      val sess = new graft.cypher.CypherSession(g,
        keyProps = Map("Chunk" -> "vec_id"))
      val q = emb.filter(col("vec_id") === 11)
        .select(col("embedding")).head.getSeq[Float](0).map(_.toDouble)
      sess.run(
        """MATCH (c:Chunk)
          |RETURN c.vec_id AS hit,
          |  vector.similarity.cosine(c.embedding, $q) AS score
          |ORDER BY score DESC, toInteger(c.vec_id) LIMIT 5""".stripMargin,
        Map("q" -> q))
        .asInstanceOf[graft.cypher.CypherRows].df
        .select(col("hit").cast("long").as("hit"), col("score"))
    },
    Some("""WITH v AS (
           |  SELECT vec_id,
           |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dvec,
           |    sqrt(list_reduce(list_transform(embedding,
           |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
           |      (a,b) -> a + b)) AS nrm
           |  FROM embeddings),
           |q AS (SELECT dvec AS qv, nrm AS qn FROM v WHERE vec_id = 11),
           |scored AS (
           |  SELECT v.vec_id,
           |    (1.0 + list_reduce(list_transform(list_zip(v.dvec, q.qv),
           |      p -> p[1] * p[2]), (a,b) -> a + b) / (v.nrm * q.qn)) / 2.0
           |      AS score
           |  FROM v, q)
           |SELECT vec_id AS hit, score FROM scored
           |ORDER BY score DESC, hit LIMIT 5""".stripMargin))

  private val x12 = Entry("x12_betweenness_sampled",
    (s, dir) => {
      // Sampled Brandes betweenness — the centrality missing from x01-x11:
      // exact all-sources betweenness is O(V·E), so the scalable form
      // accumulates over a BOUNDED deterministic source sample (the K=64
      // md5-lowest Articles — stable across runs, engines, partitionings)
      // and rescales by |sources|/K, the standard unbiased estimator. At
      // 100 TB the sample IS the algorithm: per-level frontier size is
      // K·avg-degree^depth, not |V|·…, so K is the knob that keeps the
      // (source, vertex) state bounded. Both Brandes phases run
      // set-oriented over (source, vertex) pairs — one job per BFS level
      // for the WHOLE sample, never a per-source loop. Cross-engine oracle
      // via the closed form on the publisher-star graph: a star center
      // with k articles, n of them sampled, lies on exactly n·(k-1)
      // sampled-source shortest paths; articles accumulate nothing;
      // publishers with no sampled article accumulate 0 (the left join —
      // that branch is exercised at the gate SF). The n_art/K scale is a
      // power-of-two division (or exactly 1.0 when n_art <= K), so the
      // rescaled doubles are exact and the full oracle hash applies.
      val g = docGraph(s, dir)
      val K = 64
      val articles = g.nodes.filter(col("label") === "Article")
        .select(col("id"), col("key"))
      val sample = articles.orderBy(md5(col("key")), col("key"))
        .limit(K).select(col("id"))
      val nArt = articles.count()
      val scale = nArt.toDouble / math.min(K.toLong, nArt)
      val bc = GraphAlgorithms.betweennessFromSources(
        g.edges.select(col("srcId"), col("dstId")), sample)
      g.nodes.filter(col("label") === "Publisher").select(col("id"), col("key"))
        .join(bc, Seq("id"), "left")
        .select(col("key").as("publisher"),
          (coalesce(col("betweenness"), lit(0.0)) * lit(scale)).as("betweenness"))
        .orderBy("publisher")
    },
    Some("""WITH samp AS (
           |  SELECT doc_id, source FROM documents
           |  ORDER BY md5(CAST(doc_id AS VARCHAR)), CAST(doc_id AS VARCHAR)
           |  LIMIT 64),
           |deg AS (SELECT source, COUNT(*) AS k FROM documents GROUP BY source),
           |sp AS (SELECT source, COUNT(*) AS n_samp FROM samp GROUP BY source),
           |tot AS (SELECT COUNT(*) AS n_art FROM documents)
           |SELECT deg.source AS publisher,
           |  CAST(COALESCE(sp.n_samp, 0) * (deg.k - 1) AS DOUBLE)
           |    * (CAST(tot.n_art AS DOUBLE) / LEAST(64, tot.n_art)) AS betweenness
           |FROM deg LEFT JOIN sp ON deg.source = sp.source CROSS JOIN tot
           |ORDER BY publisher""".stripMargin))

  private val x13 = Entry("x13_cc_alternating",
    (s, dir) => {
      // Connected components by alternating large-star/small-star rounds
      // (GraphAlgorithms.alternatingComponents) — the O(log n)-round CC
      // that is immune to graph diameter, where x01's label propagation
      // pays one shuffle per hop. On the publisher-star fixture both
      // converge to identical components (same oracle as x01); the spec
      // proves equality on high-diameter chains/rings where the round
      // counts diverge (log n vs n). Per round: two groupBy-min +
      // join-back stages over the edge list only — no per-vertex state,
      // no neighborhood collect_list, driver holds a 2-long fingerprint.
      val g = docGraph(s, dir)
      val comps = GraphAlgorithms.alternatingComponents(
        g.nodes.select("id"), g.edges.select(col("srcId"), col("dstId")))
      comps.join(g.nodes.select(col("id"), col("key")), Seq("id"))
        .groupBy("component")
        .agg(min(col("key")).as("min_key"), count(lit(1)).as("size"))
        .select("min_key", "size")
        .orderBy("min_key")
    },
    Some("""SELECT least(source, min(CAST(doc_id AS VARCHAR))) AS min_key,
           |  COUNT(*) + 1 AS size
           |FROM documents GROUP BY source ORDER BY min_key""".stripMargin))

  private val x14 = Entry("x14_kcore",
    (s, dir) => {
      // k-core (k=3) of the customer–supplier purchase graph (an order
      // line is an edge; ids disambiguated by 'c'/'s' prefixes), peeled
      // for a FIXED 3 rounds so the oracle can unroll the identical
      // rounds as CTEs — at the fixture the peel reaches its fixpoint
      // inside the budget (spec asserts round 3 == round 4), so this IS
      // the true 3-core there. Peeling is the canonical
      // degeneracy/community-strength primitive d08-style cluster dedup
      // doesn't cover: it prunes by LOCAL density, not connectivity.
      val orders = Tables(s, dir, "orders")
      val lineitem = Tables(s, dir, "lineitem")
      val e = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("u"),
          concat(lit("s"), col("l_suppkey")).as("v"))
        .distinct()
      GraphAlgorithms.kCorePeel(e, k = 3, rounds = 3).orderBy("id")
    },
    Some("""WITH e0 AS (
           |  SELECT DISTINCT 'c' || o_custkey AS u, 's' || l_suppkey AS v
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
           |d1 AS (SELECT id, COUNT(*) AS deg FROM
           |  (SELECT u AS id FROM e0 UNION ALL SELECT v FROM e0) GROUP BY id),
           |a1 AS (SELECT id FROM d1 WHERE deg >= 3),
           |e1 AS (SELECT u, v FROM e0
           |  WHERE u IN (SELECT id FROM a1) AND v IN (SELECT id FROM a1)),
           |d2 AS (SELECT id, COUNT(*) AS deg FROM
           |  (SELECT u AS id FROM e1 UNION ALL SELECT v FROM e1) GROUP BY id),
           |a2 AS (SELECT id FROM d2 WHERE deg >= 3),
           |e2 AS (SELECT u, v FROM e1
           |  WHERE u IN (SELECT id FROM a2) AND v IN (SELECT id FROM a2)),
           |d3 AS (SELECT id, COUNT(*) AS deg FROM
           |  (SELECT u AS id FROM e2 UNION ALL SELECT v FROM e2) GROUP BY id)
           |SELECT id FROM d3 WHERE deg >= 3 ORDER BY id""".stripMargin))

  private val x15 = Entry("x15_label_propagation",
    (s, dir) => {
      // Community detection by deterministic synchronous LPA
      // (GraphAlgorithms.labelPropagation: 2 fixed rounds, argmax-count
      // label adoption, min-label tie break) over the same
      // customer–supplier purchase graph x14 peels. Classic LPA is
      // nondeterministic (random order/ties); pinning both makes the
      // result a pure function the oracle unrolls round-for-round with
      // window argmax. Report: the 20 largest communities (size desc,
      // then label — both pinned).
      val orders = Tables(s, dir, "orders")
      val lineitem = Tables(s, dir, "lineitem")
      val e = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("u"),
          concat(lit("s"), col("l_suppkey")).as("v"))
        .distinct()
      GraphAlgorithms.labelPropagation(e, rounds = 2)
        .groupBy("community").agg(count(lit(1)).as("size"))
        .orderBy(col("size").desc, col("community")).limit(20)
    },
    Some("""WITH e0 AS (
           |  SELECT DISTINCT 'c' || o_custkey AS u, 's' || l_suppkey AS v
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
           |sym AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
           |m1 AS (SELECT v AS id, u AS lbl, COUNT(*) AS n FROM sym GROUP BY 1, 2),
           |r1 AS (SELECT id, lbl AS community FROM (
           |  SELECT id, lbl, ROW_NUMBER() OVER (PARTITION BY id ORDER BY n DESC, lbl) AS rn
           |  FROM m1) WHERE rn = 1),
           |m2 AS (SELECT sym.v AS id, r1.community AS lbl, COUNT(*) AS n
           |  FROM sym JOIN r1 ON sym.u = r1.id GROUP BY 1, 2),
           |r2 AS (SELECT id, lbl AS community FROM (
           |  SELECT id, lbl, ROW_NUMBER() OVER (PARTITION BY id ORDER BY n DESC, lbl) AS rn
           |  FROM m2) WHERE rn = 1)
           |SELECT community, COUNT(*) AS size FROM r2
           |GROUP BY 1 ORDER BY size DESC, community LIMIT 20""".stripMargin))

  private val x16 = Entry("x16_personalized_pagerank",
    (s, dir) => {
      // Personalized PageRank from a deterministic 10-article source set
      // (the x12 md5-sample trick) over the article→publisher edge list —
      // sparse power iteration, 5 fixed rounds
      // (GraphAlgorithms.personalizedPageRank). On the bipartite graph
      // ranks hit their fixpoint at round 2, giving the closed form the
      // oracle replays: publisher PPR = 0.85·(0.15/|S|)·(its sampled
      // articles). Quantized to 6 dp (x02's posture) so float association
      // order cannot flip the hash; fixture values are multiples of
      // 0.01275 — ≥5e-7 from every rounding boundary.
      val docs = Tables(s, dir, "documents")
      val edges = docs.select(col("doc_id").cast("string").as("src"),
        col("source").as("dst"))
      val sources = docs.select(col("doc_id").cast("string").as("id"))
        .orderBy(md5(col("id")), col("id")).limit(10)
      val ppr = GraphAlgorithms.personalizedPageRank(edges, sources, iters = 5)
      docs.select(col("source")).distinct()
        .join(ppr.withColumnRenamed("id", "source"), Seq("source"), "left")
        .select(col("source").as("publisher"),
          round(coalesce(col("rank"), lit(0.0)), 6).as("ppr"))
        .orderBy(col("ppr").desc, col("publisher"))
    },
    Some("""WITH tot AS (SELECT LEAST(10, COUNT(*)) AS ns FROM documents),
           |samp AS (
           |  SELECT CAST(doc_id AS VARCHAR) AS id, source FROM documents
           |  ORDER BY md5(CAST(doc_id AS VARCHAR)), CAST(doc_id AS VARCHAR)
           |  LIMIT 10),
           |cnt AS (SELECT source, COUNT(*) AS c FROM samp GROUP BY source)
           |SELECT d.source AS publisher,
           |  round(COALESCE(0.85 * (0.15 / tot.ns) * cnt.c, 0.0), 6) AS ppr
           |FROM (SELECT DISTINCT source FROM documents) d
           |CROSS JOIN tot
           |LEFT JOIN cnt ON d.source = cnt.source
           |ORDER BY ppr DESC, publisher""".stripMargin))

  private val x17 = Entry("x17_eigenvector_centrality",
    (s, dir) => {
      // Eigenvector centrality over the deterministic ring +
      // quadratic-skip multigraph on doc_ids (x07's replayable-fixture
      // trick, with a quadratic skip so in-degrees VARY — a 2-regular
      // graph would score every node identically). 3 integer
      // power-iteration rounds + ONE end division
      // (GraphAlgorithms.eigenvectorCentrality): every compared value is
      // an exact long or the identical IEEE quotient of two longs, so
      // the full hash applies with no quantization at all.
      val docs = Tables(s, dir, "documents")
      val ids = docs.select(col("doc_id").as("id"))
      val n = docs.count()
      val edges = ids.select(col("id").as("src"), ((col("id") + 1) % n).as("dst"))
        .unionByName(ids.select(col("id").as("src"),
          ((col("id") * col("id") + 1) % n).as("dst")))
      GraphAlgorithms.eigenvectorCentrality(edges, rounds = 3)
        .orderBy(col("centrality").desc, col("id")).limit(25)
    },
    Some("""WITH n AS (SELECT COUNT(*) AS n FROM documents),
           |e AS (
           |  SELECT doc_id AS src, (doc_id + 1) % n.n AS dst FROM documents, n
           |  UNION ALL
           |  SELECT doc_id, (doc_id * doc_id + 1) % n.n FROM documents, n),
           |s1 AS (SELECT dst AS id, COUNT(*) AS score FROM e GROUP BY 1),
           |s2 AS (SELECT e.dst AS id, SUM(s1.score) AS score
           |  FROM e JOIN s1 ON e.src = s1.id GROUP BY 1),
           |s3 AS (SELECT e.dst AS id, SUM(s2.score) AS score
           |  FROM e JOIN s2 ON e.src = s2.id GROUP BY 1),
           |mx AS (SELECT MAX(score) AS mx FROM s3)
           |SELECT s3.id, CAST(s3.score AS DOUBLE) / CAST(mx.mx AS DOUBLE) AS centrality
           |FROM s3, mx ORDER BY centrality DESC, id LIMIT 25""".stripMargin))

  private val x18 = Entry("x18_fastrp_embedding",
    (s, dir) => {
      // FastRP graph embedding (GraphAlgorithms.fastRPEmbedding) of the
      // customer–supplier purchase graph: portable md5-derived ±1-sparse
      // init, 2 integer sum-propagation hops, dim 4. Every embedding
      // component is an exact long (the x17 posture — no float noise to
      // quantize away), and the oracle replays init + both hops as CTEs
      // with the same md5 derivation the v03 planes use. Report: the
      // first 20 supplier embeddings by id.
      val orders = Tables(s, dir, "orders")
      val lineitem = Tables(s, dir, "lineitem")
      val e = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("u"),
          concat(lit("s"), col("l_suppkey")).as("v"))
        .distinct()
      GraphAlgorithms.fastRPEmbedding(e, dim = 4, rounds = 2)
        .filter(col("id").startsWith("s"))
        .orderBy("id").limit(20)
    },
    Some("""WITH e0 AS (
           |  SELECT DISTINCT 'c' || o_custkey AS u, 's' || l_suppkey AS v
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
           |sym AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
           |n AS (SELECT DISTINCT u AS id FROM sym),
           |r0 AS (SELECT id,
           |  CASE CAST('0x' || substr(md5(id || ':0'), 1, 8) AS BIGINT) % 4
           |    WHEN 0 THEN -1 WHEN 1 THEN 1 ELSE 0 END AS e0,
           |  CASE CAST('0x' || substr(md5(id || ':1'), 1, 8) AS BIGINT) % 4
           |    WHEN 0 THEN -1 WHEN 1 THEN 1 ELSE 0 END AS e1,
           |  CASE CAST('0x' || substr(md5(id || ':2'), 1, 8) AS BIGINT) % 4
           |    WHEN 0 THEN -1 WHEN 1 THEN 1 ELSE 0 END AS e2,
           |  CASE CAST('0x' || substr(md5(id || ':3'), 1, 8) AS BIGINT) % 4
           |    WHEN 0 THEN -1 WHEN 1 THEN 1 ELSE 0 END AS e3
           |  FROM n),
           |r1 AS (SELECT sym.v AS id, SUM(r0.e0) AS e0, SUM(r0.e1) AS e1,
           |    SUM(r0.e2) AS e2, SUM(r0.e3) AS e3
           |  FROM sym JOIN r0 ON sym.u = r0.id GROUP BY 1),
           |r2 AS (SELECT sym.v AS id, SUM(r1.e0) AS e0, SUM(r1.e1) AS e1,
           |    SUM(r1.e2) AS e2, SUM(r1.e3) AS e3
           |  FROM sym JOIN r1 ON sym.u = r1.id GROUP BY 1)
           |SELECT id, CAST(e0 AS BIGINT) AS e0, CAST(e1 AS BIGINT) AS e1,
           |  CAST(e2 AS BIGINT) AS e2, CAST(e3 AS BIGINT) AS e3
           |FROM r2 WHERE id LIKE 's%' ORDER BY id LIMIT 20""".stripMargin))

  private val x19 = Entry("x19_hits",
    (s, dir) => {
      // HITS hubs & authorities over the x17 ring+quadratic-skip
      // multigraph (GraphAlgorithms.hits): 2 exact-integer rounds, two
      // end divisions — the hub/authority decomposition PageRank doesn't
      // give (a node can be a strong hub and a weak authority), with the
      // same zero-quantization hash posture as x17. Top-25 by
      // (authority, hub, id), all orders pinned.
      val docs = Tables(s, dir, "documents")
      val ids = docs.select(col("doc_id").as("id"))
      val n = docs.count()
      val edges = ids.select(col("id").as("src"), ((col("id") + 1) % n).as("dst"))
        .unionByName(ids.select(col("id").as("src"),
          ((col("id") * col("id") + 1) % n).as("dst")))
      GraphAlgorithms.hits(edges, rounds = 2)
        .orderBy(col("authority").desc, col("hub").desc, col("id")).limit(25)
    },
    Some("""WITH n AS (SELECT COUNT(*) AS n FROM documents),
           |e AS (
           |  SELECT doc_id AS src, (doc_id + 1) % n.n AS dst FROM documents, n
           |  UNION ALL
           |  SELECT doc_id, (doc_id * doc_id + 1) % n.n FROM documents, n),
           |v AS (SELECT DISTINCT src AS id FROM e UNION SELECT dst FROM e),
           |a1s AS (SELECT dst AS id, COUNT(*) AS a FROM e GROUP BY 1),
           |a1 AS (SELECT v.id, COALESCE(a1s.a, 0) AS a FROM v
           |  LEFT JOIN a1s ON v.id = a1s.id),
           |h1s AS (SELECT e.src AS id, SUM(a1.a) AS h FROM e
           |  JOIN a1 ON e.dst = a1.id GROUP BY 1),
           |h1 AS (SELECT v.id, COALESCE(h1s.h, 0) AS h FROM v
           |  LEFT JOIN h1s ON v.id = h1s.id),
           |a2s AS (SELECT e.dst AS id, SUM(h1.h) AS a FROM e
           |  JOIN h1 ON e.src = h1.id GROUP BY 1),
           |a2 AS (SELECT v.id, COALESCE(a2s.a, 0) AS a FROM v
           |  LEFT JOIN a2s ON v.id = a2s.id),
           |h2s AS (SELECT e.src AS id, SUM(a2.a) AS h FROM e
           |  JOIN a2 ON e.dst = a2.id GROUP BY 1),
           |h2 AS (SELECT v.id, COALESCE(h2s.h, 0) AS h FROM v
           |  LEFT JOIN h2s ON v.id = h2s.id),
           |mx AS (SELECT MAX(a) AS ma FROM a2),
           |mh AS (SELECT MAX(h) AS mh FROM h2)
           |SELECT a2.id,
           |  CAST(a2.a AS DOUBLE) / CAST(mx.ma AS DOUBLE) AS authority,
           |  CAST(h2.h AS DOUBLE) / CAST(mh.mh AS DOUBLE) AS hub
           |FROM a2 JOIN h2 ON a2.id = h2.id, mx, mh
           |ORDER BY authority DESC, hub DESC, a2.id LIMIT 25""".stripMargin))

  private val x20 = Entry("x20_strongly_connected",
    (s, dir) => {
      // Directed SCC (round 10) — the directed twin of x01's WCC, via
      // GraphX stronglyConnectedComponents (coloring/peel). The graph:
      // a directed ring inside each DECADE of doc_ids (one mutual-reach
      // class of 10); decades with decade % 7 == 3 carry NO edges (their
      // nodes are singleton SCCs), and sparse decade→decade+1 DAG edges
      // (only from every 10th decade — cross-chains of length 2) which
      // must NOT merge components — the case that separates SCC from
      // WCC. Labels are min member ids, so the oracle is the closed form
      // of the construction. Integer modulo stands in for decade
      // arithmetic on BOTH engines (base % 70 == 30 ⇔ decade % 7 == 3)
      // because plain division is float division on both. SCC's peel
      // loop cost is a SUPERSTEP-COUNT floor set by the structure's
      // depth — this fixture keeps that depth CONSTANT (10-cycles,
      // length-2 chains, 1-round trims), so rounds don't grow with |V|;
      // the first cut's 10-node chains + 5-decade cross-chains measured
      // 267 s at sf10 purely from depth (PROGRESS r10 negative result).
      import s.implicits._
      val ids = Tables(s, dir, "documents").select(col("doc_id").as("id"))
      val n = ids.count()
      val base = col("id") - col("id") % 10
      val ring = ids
        .filter((base % 70) =!= 30)
        .select(col("id").as("src"),
          (base + ((col("id") % 10 + 1) % 10)).as("dst"))
      val cross = ids.filter(col("id") % 100 === 0)
        .filter(col("id") + 10 < n)
        .select(col("id").as("src"), (col("id") + 10).as("dst"))
      // round 15 (VERDICT r14 #6): the warmed sf1 re-measure showed the
      // 13× slope was GraphX's SCC itself, not JIT — replaced by the
      // DataFrame forward-backward coloring (sccColoringDF), whose
      // supersteps are the x01 join+aggregate cost model
      graft.analytics.GraphAlgorithms
        .sccColoringDF(ids, ring.unionByName(cross))
        .groupBy("component").agg(count(lit(1)).as("size"))
        .orderBy("component").limit(50)
    },
    Some("""WITH c AS (
           |  SELECT CASE WHEN (doc_id - doc_id % 10) % 70 = 30 THEN doc_id
           |              ELSE doc_id - doc_id % 10 END AS component
           |  FROM documents)
           |SELECT component, CAST(COUNT(*) AS BIGINT) AS size
           |FROM c GROUP BY component ORDER BY component LIMIT 50""".stripMargin))

  private val x01 = Entry("x01_connected_components",
    (s, dir) => {
      // Pregel min-id propagation; reported per component as (min member
      // key, size) so identity is engine-independent. The doc graph is a
      // union of per-publisher stars → one component per publisher.
      val g = docGraph(s, dir)
      graft.analytics.GraphAlgorithms.componentSummary(g).orderBy("min_key")
    },
    Some("""SELECT least(source, min(CAST(doc_id AS VARCHAR))) AS min_key,
           |  COUNT(*) + 1 AS size
           |FROM documents GROUP BY source ORDER BY min_key""".stripMargin))

  private val x02 = Entry("x02_pagerank",
    (s, dir) => {
      // Iterative Pregel PageRank (GraphX: VertexRDD keeps one partitioning
      // across supersteps, where the DataFrame formulation re-shuffles ranks
      // every iteration — both exist, spec'd equal to 1e-9). Cross-engine
      // oracle: on the bipartite article→publisher star graph the 10-iter
      // static PageRank has a CLOSED FORM — articles hold the reset mass
      // 0.15, a publisher with in-degree d holds 0.15 + 0.85·0.15·d, and
      // GraphX rescales final ranks to sum to the vertex count. Ranks are
      // quantized to 6 decimals on both sides so iterative fp noise (~1e-10)
      // cannot flip the hash; fixture values sit ≥0.25e-6 from every
      // rounding boundary.
      val g = docGraph(s, dir)
      graft.analytics.GraphAlgorithms.pageRank(g, numIter = 10)
        .filter(col("label") === "Publisher")
        .select(col("key"), round(col("rank"), 6).as("rank"))
        .orderBy(col("rank").desc, col("key"))
    },
    Some("""WITH d AS (SELECT source, COUNT(*) AS deg FROM documents GROUP BY source),
           |n AS (SELECT (SELECT COUNT(*) FROM documents) AS n_art,
           |             COUNT(*) AS n_pub,
           |             SUM(0.15 + 0.85*0.15*deg) AS s_pub
           |      FROM d)
           |SELECT d.source AS key,
           |  round((0.15 + 0.85*0.15*d.deg) * (n_art + n_pub)
           |        / (s_pub + 0.15*n_art), 6) AS rank
           |FROM d, n
           |ORDER BY rank DESC, key""".stripMargin))

  private val x03 = Entry("x03_shortest_paths",
    (s, dir) => {
      // Pregel hop counts to every Publisher landmark, in bounded landmark
      // batches (ids stream to the driver via toLocalIterator — never an
      // unbounded collect; per-vertex superstep state is capped at the batch
      // size). The oracle reconstructs hops relationally from the bipartite
      // WRITTEN_BY graph: each publisher 0 from itself, each article 1 from
      // its publisher.
      val g = docGraph(s, dir)
      val pubs = g.matchLabel("Publisher").select(col("id"), col("key"))
      graft.analytics.GraphAlgorithms.shortestPathLengthsFrom(g, pubs.select("id"))
        .join(pubs.select(col("id").as("landmark"), col("key").as("landmark_key")),
          Seq("landmark"))
        .select(col("key"), col("landmark_key"), col("hops"))
        .orderBy("key", "landmark_key")
    },
    Some("""SELECT CAST(doc_id AS VARCHAR) AS key, source AS landmark_key, 1 AS hops
           |FROM documents
           |UNION ALL
           |SELECT DISTINCT source, source, 0 FROM documents
           |ORDER BY key, landmark_key""".stripMargin))

  private val x04 = Entry("x04_degree_distribution",
    (s, dir) => {
      // in-degree histogram via GraphX degrees (how many publishers have d
      // articles), exact oracle from the relational formulation
      val g = docGraph(s, dir)
      val spark = s
      import spark.implicits._
      val inDeg = g.toGraphX(GraphAlgorithms.sizedPartitions(g))
        .inDegrees.toDF("id", "deg")
      inDeg.join(g.matchLabel("Publisher").select(col("id")), Seq("id"))
        .groupBy("deg").agg(count(lit(1)).as("n_publishers"))
        .select(col("deg"), col("n_publishers"))
        .orderBy("deg")
    },
    Some("""WITH d AS (SELECT source, COUNT(*) AS deg FROM documents GROUP BY source)
           |SELECT CAST(deg AS INT) AS deg, COUNT(*) AS n_publishers
           |FROM d GROUP BY deg ORDER BY deg""".stripMargin))

  private val x05 = Entry("x05_triangle_count",
    (s, dir) => {
      // Triangle counting (GraphX TriangleCount over the exact near-dup
      // pair graph — dedup output feeding graph analytics). The oracle
      // recounts triangles relationally: a 3-way self-join over the ordered
      // pair list. GraphX reports per-vertex membership; total = sum / 3.
      val spark = s
      import spark.implicits._
      val docs = Tables(s, dir, "documents")
      val pairs = Dedup.nearDupPairsExact(docs, "doc_id", "text",
        blockCol = "source", shingleN = 1, threshold = 0.9)
        .select(col("id_a").cast("long"), col("id_b").cast("long"))
      val gx = org.apache.spark.graphx.Graph.fromEdgeTuples(
        pairs.as[(Long, Long)].rdd, defaultValue = 1)
        .partitionBy(org.apache.spark.graphx.PartitionStrategy.RandomVertexCut)
      val perVertex = org.apache.spark.graphx.lib.TriangleCount.run(gx)
        .vertices.map(_._2.toLong).toDF("n")
      perVertex.agg((sum(col("n")) / 3).cast("long").as("n_triangles"))
    },
    Some("""WITH t AS (
           |  SELECT doc_id, source,
           |    list_distinct(regexp_split_to_array(trim(text), '\s+')) AS sh
           |  FROM documents),
           |pairs AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
           |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.9)
           |SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
           |FROM pairs ab
           |JOIN pairs bc ON ab.id_b = bc.id_a
           |JOIN pairs ac ON ac.id_a = ab.id_a AND ac.id_b = bc.id_b""".stripMargin))

  private val x07 = Entry("x07_weighted_sssp",
    (s, dir) => {
      // Weighted single-source shortest paths (≤6 edges) via
      // GraphAlgorithms.weightedSSSP — frontier-only Bellman-Ford
      // relaxation, the delta form whose per-round shuffle tracks the
      // improving edge set. The graph is a deterministic two-out-degree
      // expander over the contiguous doc_ids (successor ring + ×3 skip
      // edge, weights from id residues) so the oracle can replay it as a
      // recursive CTE; the relaxation itself never assumes that shape.
      val ids = Tables(s, dir, "documents").select(col("doc_id").as("id"))
      val n = ids.count()
      val edges = ids.select(col("id").as("src"),
          ((col("id") + 1) % n).as("dst"), (col("id") % 7 + 1).as("w"))
        .unionByName(ids.select(col("id").as("src"),
          ((col("id") * 3 + 1) % n).as("dst"), (col("id") % 5 + 2).as("w")))
      GraphAlgorithms.weightedSSSP(edges, source = 0L, rounds = 6)
        .orderBy("dist", "node").limit(25)
    },
    Some("""WITH RECURSIVE
           |n AS (SELECT COUNT(*) AS n FROM documents),
           |e AS (
           |  SELECT doc_id AS src, (doc_id + 1) % n.n AS dst,
           |    doc_id % 7 + 1 AS w FROM documents, n
           |  UNION ALL
           |  SELECT doc_id, (doc_id * 3 + 1) % n.n, doc_id % 5 + 2
           |  FROM documents, n),
           |p(node, dist, hops) AS (
           |  SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist, 0 AS hops
           |  UNION ALL
           |  SELECT e.dst, p.dist + e.w, p.hops + 1
           |  FROM p JOIN e ON e.src = p.node WHERE p.hops < 6)
           |SELECT node, MIN(dist) AS dist FROM p
           |GROUP BY node ORDER BY dist, node LIMIT 25""".stripMargin))

  private val x08 = Entry("x08_node_similarity",
    (s, dir) => {
      // GDS-style nodeSimilarity: pairwise Jaccard of out-neighbor sets.
      // Here the bipartite projection publisher → title-vocabulary word:
      // two publishers are similar when their articles share opening
      // vocabulary. The kernel (GraphAlgorithms.nodeSimilarity) joins on
      // the SHARED neighbor — work is Σ co-degree², the co-occurrence
      // bound — then one degree aggregate; the division is exact IEEE.
      val edges = Tables(s, dir, "documents")
        .select(col("source").as("src"),
          explode(split(substring(col("text"), 1, 30), " ")).as("dst"))
        .filter(col("dst") =!= "")
      GraphAlgorithms.nodeSimilarity(edges).orderBy("n1", "n2")
    },
    Some("""WITH e AS (
           |  SELECT DISTINCT source AS src, w AS dst
           |  FROM (SELECT source, unnest(string_split(substring(text, 1, 30), ' ')) AS w
           |        FROM documents)
           |  WHERE w <> ''),
           |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
           |i AS (SELECT a.src AS n1, b.src AS n2, COUNT(*) AS inter
           |      FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
           |      GROUP BY 1, 2)
           |SELECT i.n1, i.n2,
           |  CAST(i.inter AS DOUBLE) / (d1.deg + d2.deg - i.inter) AS jaccard
           |FROM i JOIN deg d1 ON d1.src = i.n1 JOIN deg d2 ON d2.src = i.n2
           |ORDER BY n1, n2""".stripMargin))

  private val x09 = Entry("x09_modularity",
    (s, dir) => {
      // Community-quality metric: Newman modularity of the publisher
      // partition over the Article—Publisher graph (each star is one
      // community — the x01 components). Generic operator: edge list +
      // assignment in, one (Q, n_communities, n_edges) row out; every
      // term is a ratio of integer counts, no libm.
      val docs = Tables(s, dir, "documents")
      val edges = docs.select(
        concat(lit("a"), col("doc_id")).as("src"),
        concat(lit("p"), col("source")).as("dst"))
      val assign = docs.select(
          concat(lit("a"), col("doc_id")).as("node"), col("source").as("community"))
        .unionByName(docs.select(
          concat(lit("p"), col("source")).as("node"), col("source").as("community"))
          .distinct())
      GraphAlgorithms.modularity(edges, assign)
    },
    Some("""WITH pub AS (SELECT source, COUNT(*) AS k FROM documents GROUP BY source),
           |tot AS (SELECT CAST(SUM(k) AS DOUBLE) AS m FROM pub)
           |SELECT round(SUM(k / m - (2.0 * k / (2.0 * m)) * (2.0 * k / (2.0 * m))), 6)
           |    AS modularity,
           |  COUNT(*) AS n_communities,
           |  CAST(MAX(m) AS BIGINT) AS n_edges
           |FROM pub, tot""".stripMargin))

  private val x10 = Entry("x10_harmonic_closeness",
    (s, dir) => {
      // Harmonic closeness of a source node: Σ 1/d over nodes reachable
      // within 6 hops — the centrality that stays defined on
      // disconnected graphs. Distances come from the same frontier
      // relaxation as x07 with unit weights (hop counts); the aggregate
      // is one pass over the distance table. Same deterministic
      // expander, so the oracle replays it as a recursive CTE.
      val ids = Tables(s, dir, "documents").select(col("doc_id").as("id"))
      val n = ids.count()
      val edges = ids.select(col("id").as("src"),
          ((col("id") + 1) % n).as("dst"), lit(1L).as("w"))
        .unionByName(ids.select(col("id").as("src"),
          ((col("id") * 3 + 1) % n).as("dst"), lit(1L).as("w")))
      GraphAlgorithms.weightedSSSP(edges, source = 0L, rounds = 6)
        .filter(col("dist") > 0)
        .agg(count(lit(1)).as("n_reached"),
          round(sum(lit(1.0) / col("dist")), 6).as("harmonic"),
          max(col("dist")).as("eccentricity_6"))
    },
    Some("""WITH RECURSIVE
           |n AS (SELECT COUNT(*) AS n FROM documents),
           |e AS (
           |  SELECT doc_id AS src, (doc_id + 1) % n.n AS dst FROM documents, n
           |  UNION ALL
           |  SELECT doc_id, (doc_id * 3 + 1) % n.n FROM documents, n),
           |p(node, dist, hops) AS (
           |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0
           |  UNION ALL
           |  SELECT e.dst, p.dist + 1, p.hops + 1
           |  FROM p JOIN e ON e.src = p.node WHERE p.hops < 6),
           |d AS (SELECT node, MIN(dist) AS dist FROM p GROUP BY node)
           |SELECT COUNT(*) AS n_reached,
           |  round(SUM(1.0 / dist), 6) AS harmonic,
           |  MAX(dist) AS eccentricity_6
           |FROM d WHERE dist > 0""".stripMargin))

  private val x11 = Entry("x11_degree_assortativity",
    (s, dir) => {
      // Degree assortativity: Pearson correlation of endpoint total
      // degrees over the edge list — do high-degree nodes attach to each
      // other? One degree aggregate joined twice onto the edge stream,
      // then a single corr() pass (Spark's distributed co-moment
      // aggregation); 6-dp pinned for the cross-engine compare. The
      // graph is ring + hub edges (every node also points at id % 50):
      // hubs accumulate ~n/50 in-edges, so degrees VARY — x07's expander
      // is 2-in/2-out regular, where the statistic is undefined (zero
      // variance; ANSI corr correctly refuses to divide).
      val ids = Tables(s, dir, "documents").select(col("doc_id").as("id"))
      val n = ids.count()
      val edges = ids.select(col("id").as("src"), ((col("id") + 1) % n).as("dst"))
        .unionByName(ids.select(col("id").as("src"),
          (col("id") % 50).as("dst")))
      val deg = edges.select(col("src").as("node"))
        .unionAll(edges.select(col("dst").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      edges
        .join(deg.select(col("node").as("src"), col("deg").as("sdeg")), Seq("src"))
        .join(deg.select(col("node").as("dst"), col("deg").as("ddeg")), Seq("dst"))
        .agg(round(corr(col("sdeg").cast("double"), col("ddeg").cast("double")), 6)
            .as("assortativity"),
          count(lit(1)).as("n_edges"))
    },
    Some("""WITH n AS (SELECT COUNT(*) AS n FROM documents),
           |e AS (
           |  SELECT doc_id AS src, (doc_id + 1) % n.n AS dst FROM documents, n
           |  UNION ALL
           |  SELECT doc_id, doc_id % 50 FROM documents),
           |d AS (SELECT node, COUNT(*) AS deg FROM
           |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
           |  GROUP BY node)
           |SELECT round(corr(CAST(d1.deg AS DOUBLE), CAST(d2.deg AS DOUBLE)), 6)
           |    AS assortativity,
           |  COUNT(*) AS n_edges
           |FROM e JOIN d d1 ON d1.node = e.src JOIN d d2 ON d2.node = e.dst""".stripMargin))

  private val x06 = Entry("x06_local_clustering",
    (s, dir) => {
      // Per-node local clustering coefficient over the exact near-dup pair
      // graph: 2·t(u) / (deg(u)·(deg(u)−1)), where t(u) counts connected
      // neighbor pairs. Pure DataFrame joins — the neighbor-pair candidate
      // join keys on the hub node and the closing edge probes the ORDERED
      // pair list, so work is Σ deg² (the same bound as any triangle
      // enumeration), hash-partitioned on node id at every step; no
      // GraphX round trip, no driver state. deg<2 nodes report 0.0, as
      // networkx does.
      val docs = Tables(s, dir, "documents")
      val pairs = Dedup.nearDupPairsExact(docs, "doc_id", "text",
        blockCol = "source", shingleN = 1, threshold = 0.9)
        .select(col("id_a").cast("long"), col("id_b").cast("long"))
      val und = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
        .unionByName(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
      val deg = und.groupBy("u").agg(count(lit(1)).as("deg"))
      val cand = und.select(col("u"), col("v").as("n1"))
        .join(und.select(col("u"), col("v").as("n2")), Seq("u"))
        .filter(col("n1") < col("n2"))
      val tri = cand.join(pairs,
          cand("n1") === pairs("id_a") && cand("n2") === pairs("id_b"))
        .groupBy("u").agg(count(lit(1)).as("tri"))
      deg.join(tri, Seq("u"), "left")
        .withColumn("tri", coalesce(col("tri"), lit(0L)))
        .select(col("u").as("doc_id"), col("deg"), col("tri"),
          when(col("deg") < 2, lit(0.0))
            .otherwise((col("tri") * 2).cast("double") /
              (col("deg") * (col("deg") - 1)).cast("double"))
            .as("clustering"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, source,
           |    list_distinct(regexp_split_to_array(trim(text), '\s+')) AS sh
           |  FROM documents),
           |pairs AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
           |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.9),
           |und AS (
           |  SELECT id_a AS u, id_b AS v FROM pairs
           |  UNION ALL SELECT id_b, id_a FROM pairs),
           |deg AS (SELECT u, COUNT(*) AS deg FROM und GROUP BY u),
           |tri AS (
           |  SELECT a.u, COUNT(*) AS tri
           |  FROM und a JOIN und b ON a.u = b.u AND a.v < b.v
           |  JOIN pairs p ON p.id_a = a.v AND p.id_b = b.v
           |  GROUP BY a.u)
           |SELECT d.u AS doc_id, d.deg, COALESCE(tri.tri, 0) AS tri,
           |  CASE WHEN d.deg < 2 THEN 0.0
           |       ELSE CAST(COALESCE(tri.tri, 0) * 2 AS DOUBLE)
           |            / CAST(d.deg * (d.deg - 1) AS DOUBLE) END AS clustering
           |FROM deg d LEFT JOIN tri ON d.u = tri.u
           |ORDER BY doc_id""".stripMargin))

  private val t09 = Entry("t09_vocabulary_doc_freq",
    (s, dir) => {
      // Vocabulary extraction: document frequency per term (distinct tokens
      // per doc → explode → count docs), top 20 — the df side of tf-idf and
      // the first pass of every tokenizer-training pipeline.
      Tables(s, dir, "documents")
        .select(explode(array_distinct(TextAnalysis.tokens(col("text")))).as("term"))
        .groupBy("term")
        .agg(count(lit(1)).as("doc_freq"))
        .orderBy(col("doc_freq").desc, col("term"))
        .limit(20)
    },
    Some("""WITH t AS (
           |  SELECT doc_id,
           |    unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS term
           |  FROM documents)
           |SELECT term, COUNT(*) AS doc_freq
           |FROM t GROUP BY term
           |ORDER BY doc_freq DESC, term LIMIT 20""".stripMargin))

  // ----------------------------------------------------------- multimodal --

  private val m01 = Entry("m01_binary_media_meta",
    (s, dir) => {
      val media = Multimodal.asMedia(Tables(s, dir, "documents"), "doc_id", "text", "text")
      media.select(col("id"), col("kind"),
        length(col("payload")).as("n_bytes"),
        col("meta").getItem("codec").as("codec"))
        .orderBy("id")
    },
    Some("""SELECT doc_id AS id, 'text' AS kind,
           |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           |  'raw' AS codec
           |FROM documents ORDER BY id""".stripMargin))

  private val m02 = Entry("m02_frame_sample",
    (s, dir) => {
      // Frame sampling over binary payloads: 4 evenly-spaced byte chunks per
      // payload (video keyframe-sampling shape; byte slicing stands in for
      // the codec). Oracle checks the chunk geometry arithmetically — DuckDB
      // has no BLOB substring, but chunk lengths are fully determined by
      // payload length.
      val media = Multimodal.asMedia(Tables(s, dir, "documents"), "doc_id", "text", "video")
      Multimodal.sampleFrames(media, 4)
        .select(col("id"), col("frame_idx"), length(col("frame")).as("n_bytes"))
        .orderBy("id", "frame_idx")
    },
    Some("""WITH m AS (
           |  SELECT doc_id AS id, octet_length(encode(text)) AS len FROM documents),
           |f AS (SELECT id, len, CAST(floor((len + 3) / 4) AS BIGINT) AS chunk FROM m)
           |SELECT id, CAST(i.frame_idx AS INT) AS frame_idx,
           |  CAST(LEAST(chunk, len - frame_idx * chunk) AS INT) AS n_bytes
           |FROM f, (SELECT unnest(range(4)) AS frame_idx) i
           |WHERE len - frame_idx * chunk > 0
           |ORDER BY id, frame_idx""".stripMargin))

  private val m03 = Entry("m03_binary_payload_dedup",
    (s, dir) => {
      // Exact dedup over OPAQUE binary payloads (the multimodal variant of
      // d01): duplicates detected by content digest of the bytes — the same
      // groupBy-on-hash shape a real pipeline runs over image/audio blobs,
      // where no text-side normalization exists.
      val media = Multimodal.asMedia(Tables(s, dir, "documents"),
        "doc_id", "text", "blob")
      media.groupBy("kind")
        .agg(count(lit(1)).as("n_payloads"),
          countDistinct(md5(col("payload"))).as("n_unique"))
        .withColumn("n_dups", col("n_payloads") - col("n_unique"))
        .orderBy("kind")
    },
    Some("""SELECT 'blob' AS kind, COUNT(*) AS n_payloads,
           |  COUNT(DISTINCT md5(text)) AS n_unique,
           |  COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dups
           |FROM documents""".stripMargin))

  private val m04 = Entry("m04_training_manifest",
    (s, dir) => {
      // Cross-modality manifest assembly — the "build the training shard
      // index" step: text docs LEFT JOIN their embedding (by id) LEFT JOIN
      // the binary payload stats, rolled up per language with modality
      // coverage counts and total payload bytes. Both joins are on the id
      // key a real manifest would carry; the embedding side broadcasts at
      // fixture scale and hash-joins at 100 TB.
      val docs = Tables(s, dir, "documents")
      val emb = Tables(s, dir, "embeddings")
        .select(col("vec_id"), lit(1).as("__has_vec"))
      val payloadBytes = Multimodal.asMedia(docs, "doc_id", "text", "blob")
        .select(col("id").as("doc_id"), length(col("payload")).as("n_bytes"))
      docs.join(emb, col("doc_id") === col("vec_id"), "left")
        .join(payloadBytes, Seq("doc_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          count(col("__has_vec")).as("n_with_embedding"),
          sum(col("n_bytes")).cast("long").as("total_payload_bytes"))
        .orderBy("lang")
    },
    Some("""SELECT d.lang, COUNT(*) AS n_docs,
           |  COUNT(e.vec_id) AS n_with_embedding,
           |  CAST(SUM(octet_length(CAST(d.text AS BLOB))) AS BIGINT)
           |    AS total_payload_bytes
           |FROM documents d
           |LEFT JOIN embeddings e ON e.vec_id = d.doc_id
           |GROUP BY d.lang ORDER BY d.lang""".stripMargin))

  private val m05 = Entry("m05_shard_packing",
    (s, dir) => {
      // WebDataset-style shard assembly: binary payloads packed into
      // ~16 KiB shards per modality by an exclusive running byte sum
      // (t08's packing law on bytes — the doc that crosses the boundary
      // starts the next shard deterministically). The window partitions
      // by modality, so at 100 TB each modality stream packs
      // independently; report is per-shard payload count and bytes.
      val media = Multimodal.asMedia(Tables(s, dir, "documents"),
        "doc_id", "text", "blob")
        .withColumn("modality",
          when(col("id") % 2 === 0, "image").otherwise("audio"))
        .withColumn("n_bytes", length(col("payload")).cast("long"))
      val w = Window.partitionBy("modality").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
      media
        .withColumn("__cum", coalesce(sum(col("n_bytes")).over(w), lit(0L)))
        .withColumn("shard", floor(col("__cum") / 16384L).cast("long"))
        .groupBy("modality", "shard")
        .agg(count(lit(1)).as("n_payloads"),
          sum(col("n_bytes")).cast("long").as("shard_bytes"))
        .orderBy("modality", "shard")
    },
    Some("""WITH m AS (
           |  SELECT doc_id AS id,
           |    CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS modality,
           |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
           |  FROM documents),
           |c AS (
           |  SELECT modality, n_bytes,
           |    COALESCE(SUM(n_bytes) OVER (PARTITION BY modality ORDER BY id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
           |  FROM m)
           |SELECT modality, CAST(floor(cum / 16384) AS BIGINT) AS shard,
           |  COUNT(*) AS n_payloads, CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes
           |FROM c GROUP BY 1, 2 ORDER BY modality, shard""".stripMargin))

  private val m06 = Entry("m06_shard_roundtrip",
    (s, dir) => {
      // The READ half m05's packing promises: physically BUILD each
      // shard blob (payloads concatenated in id order) plus its
      // (id, n_bytes) index — the WebDataset tar + .idx pair — then
      // UNPACK by slicing the blob with index offsets and fingerprint
      // every recovered record. The output chain is md5 over the
      // UNPACKED slices' digests, while the oracle computes the same
      // chain from the SOURCE payloads — they match iff the pack/unpack
      // round trip is byte-exact. Per-shard state is one ~16 KiB blob +
      // its index (bounded by the shard size constant, not the data),
      // so the groupBy collect is safe at any corpus scale.
      val docs = Tables(s, dir, "documents")
      val media = docs
        .select(col("doc_id").as("id"), encode(col("text"), "UTF-8").as("payload"))
        .withColumn("modality",
          when(col("id") % 2 === 0, "image").otherwise("audio"))
        .withColumn("n_bytes", length(col("payload")).cast("long"))
      val w = Window.partitionBy("modality").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val sharded = media
        .withColumn("__cum", coalesce(sum(col("n_bytes")).over(w), lit(0L)))
        .withColumn("shard", floor(col("__cum") / 16384L).cast("long"))
      val unpacked = Multimodal.unpackShards(Multimodal.packShards(sharded))
      unpacked.groupBy("modality", "shard")
        .agg(count(lit(1)).as("n_records"),
          sum(length(col("payload")).cast("long")).cast("long").as("shard_bytes"),
          md5(concat_ws("|", expr(
            """transform(array_sort(collect_list(struct(id, md5(payload) AS d))),
              |          s -> s.d)""".stripMargin))).as("chain"))
        .orderBy("modality", "shard")
    },
    Some("""WITH m AS (
           |  SELECT doc_id AS id,
           |    CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS modality,
           |    text, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
           |  FROM documents),
           |c AS (
           |  SELECT *, COALESCE(SUM(n_bytes) OVER (PARTITION BY modality ORDER BY id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
           |  FROM m)
           |SELECT modality, CAST(floor(cum / 16384) AS BIGINT) AS shard,
           |  COUNT(*) AS n_records, CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes,
           |  md5(string_agg(md5(text), '|' ORDER BY id)) AS chain
           |FROM c GROUP BY 1, 2 ORDER BY modality, shard""".stripMargin))

  /** Sign-bit word: dims [from, from+32) packed little-endian into one
    * long — a static fold of 32 conditional adds (exact powers of two, no
    * libm), codegen-friendly, identical on any engine. */
  private def packWord(vec: org.apache.spark.sql.Column, from: Int) =
    (0 until 32).map(i =>
      when(element_at(vec, from + i) > 0f, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)

  private val v09 = Entry("v09_binary_hamming_topk",
    (s, dir) => {
      // Binary embedding compression + Hamming ANN: 64 float dims pack
      // into two 32-bit sign words (64 B → 8 B, the 32× compression that
      // makes billion-vector indexes RAM-resident), and the distance
      // becomes two XOR+popcount integer ops — exact, deterministic,
      // orders of magnitude cheaper than float dot products. Query side
      // broadcasts (v02's shape); the scan stays linear in the corpus.
      val emb = Tables(s, dir, "embeddings")
      val packed = emb.select(col("vec_id").as("id"),
        packWord(col("embedding"), 1).as("w0"),
        packWord(col("embedding"), 33).as("w1"))
      val qs = packed.filter(col("id") < 5)
        .select(col("id").as("q_id"), col("w0").as("q0"), col("w1").as("q1"))
      val w = Window.partitionBy("q_id").orderBy(col("hamming"), col("id"))
      packed.crossJoin(broadcast(qs))
        .filter(col("id") =!= col("q_id"))
        .withColumn("hamming",
          (bit_count(col("w0").bitwiseXOR(col("q0"))) +
            bit_count(col("w1").bitwiseXOR(col("q1")))).cast("long"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("rank"), col("id"), col("hamming"))
        .orderBy("q_id", "rank")
    },
    Some("""WITH p AS (
           |  SELECT vec_id AS id,
           |    CAST(list_sum([CASE WHEN embedding[i+1] > 0 THEN 2**i ELSE 0 END
           |      for i in range(0, 32)]) AS BIGINT) AS w0,
           |    CAST(list_sum([CASE WHEN embedding[i+33] > 0 THEN 2**i ELSE 0 END
           |      for i in range(0, 32)]) AS BIGINT) AS w1
           |  FROM embeddings),
           |q AS (SELECT id AS q_id, w0 AS q0, w1 AS q1 FROM p WHERE id < 5),
           |h AS (
           |  SELECT q.q_id, p.id,
           |    CAST(bit_count(xor(p.w0, q.q0)) + bit_count(xor(p.w1, q.q1)) AS BIGINT)
           |      AS hamming
           |  FROM p CROSS JOIN q WHERE p.id <> q.q_id),
           |r AS (SELECT q_id, id, hamming,
           |  row_number() OVER (PARTITION BY q_id ORDER BY hamming, id) AS rnk
           |  FROM h)
           |SELECT q_id, CAST(rnk AS INT) AS rank, id, hamming
           |FROM r WHERE rnk <= 3 ORDER BY q_id, rank""".stripMargin))

  private val v03 = Entry("v03_ann_lsh",
    (s, dir) => {
      // LSH-bucketed ANN — the scale path for v02's brute force: candidates
      // come from an equi-join on sign-of-projection buckets instead of a
      // cross join. Round 6 moved the entry to the PORTABLE plane family
      // (md5-60("0:i:j")/2^59 − 1), which makes bucket ids, the candidate
      // set, and the ranked result reproducible by the DuckDB oracle — the
      // approximate top-k is now a full hash check, not just recall-spec'd
      // (the Gaussian-seeded lshTopK stays in Similarity for workloads that
      // want the angle-exact family). The result is top-k WITHIN each
      // query's bucket: fewer than k rows for sparse buckets is correct
      // output, and the oracle reproduces exactly that.
      val emb = Tables(s, dir, "embeddings")
      val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.lshTopKPortable(corpus, queries, k = 3, nBits = 4, dim = 64)
        .orderBy("q_id", "rank")
    },
    Some("""WITH v AS (
           |  SELECT vec_id, embedding,
           |    sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * x),
           |         (p,q) -> p + q)) AS nrm
           |  FROM embeddings),
           |planes AS (
           |  SELECT i.i, list_transform(range(0, 64), j ->
           |    CAST(CAST('0x' || substr(md5('0:' || i.i || ':' || j), 1, 15)
           |      AS BIGINT) AS DOUBLE) / 576460752303423488 - 1) AS w
           |  FROM range(0, 4) i(i)),
           |b AS (
           |  SELECT v.vec_id,
           |    CAST(SUM(CASE WHEN list_reduce(list_transform(
           |        list_zip(p.w, v.embedding),
           |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)),
           |        (a,b2) -> a + b2) >= 0
           |      THEN 1 << p.i ELSE 0 END) AS BIGINT) AS bucket
           |  FROM v, planes p GROUP BY v.vec_id),
           |scored AS (
           |  SELECT q.vec_id AS q_id, c.vec_id AS id,
           |    list_reduce(list_transform(list_zip(q.embedding, c.embedding),
           |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p,q2) -> p + q2)
           |      / (q.nrm * c.nrm) AS cosine
           |  FROM v q
           |  JOIN b bq ON bq.vec_id = q.vec_id
           |  JOIN b bc ON bc.bucket = bq.bucket
           |  JOIN v c ON c.vec_id = bc.vec_id
           |  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id)
           |SELECT q_id,
           |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, id) AS INT) AS rank,
           |  id, cosine
           |FROM scored
           |QUALIFY rank <= 3
           |ORDER BY q_id, rank""".stripMargin))

  private val v17 = Entry("v17_filtered_ann",
    (s, dir) => {
      // Metadata-FILTERED vector search (round 10) — the production
      // retrieval shape (per-tenant corpora, label-scoped RAG,
      // quality-gated candidates): the metadata column joins as PART OF
      // the candidate key (bucket + label), so the filter acts INSIDE
      // candidate generation. Post-filtering an unfiltered top-k — the
      // naive composition of v03 + WHERE — silently under-delivers k
      // whenever the filter removes ranked hits (spec-pinned in
      // SimilaritySpec); here every returned rank is within the filtered
      // corpus by construction. Same portable plane family as v03, so the
      // oracle replays buckets, candidates and ranking exactly.
      val emb = Tables(s, dir, "embeddings")
      val corpus = emb.select(col("vec_id").as("id"),
        col("embedding").as("vec"), col("label"))
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
          col("label"))
      Similarity.lshTopKFilteredPortable(corpus, queries, k = 3, nBits = 4,
          dim = 64, filterCols = Seq("label"))
        .orderBy("q_id", "rank")
    },
    Some("""WITH v AS (
           |  SELECT vec_id, embedding, label,
           |    sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * x),
           |         (p,q) -> p + q)) AS nrm
           |  FROM embeddings),
           |planes AS (
           |  SELECT i.i, list_transform(range(0, 64), j ->
           |    CAST(CAST('0x' || substr(md5('0:' || i.i || ':' || j), 1, 15)
           |      AS BIGINT) AS DOUBLE) / 576460752303423488 - 1) AS w
           |  FROM range(0, 4) i(i)),
           |b AS (
           |  SELECT v.vec_id,
           |    CAST(SUM(CASE WHEN list_reduce(list_transform(
           |        list_zip(p.w, v.embedding),
           |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)),
           |        (a,b2) -> a + b2) >= 0
           |      THEN 1 << p.i ELSE 0 END) AS BIGINT) AS bucket
           |  FROM v, planes p GROUP BY v.vec_id),
           |scored AS (
           |  SELECT q.vec_id AS q_id, c.vec_id AS id, q.label AS label,
           |    list_reduce(list_transform(list_zip(q.embedding, c.embedding),
           |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p,q2) -> p + q2)
           |      / (q.nrm * c.nrm) AS cosine
           |  FROM v q
           |  JOIN b bq ON bq.vec_id = q.vec_id
           |  JOIN b bc ON bc.bucket = bq.bucket
           |  JOIN v c ON c.vec_id = bc.vec_id AND c.label = q.label
           |  WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id)
           |SELECT q_id,
           |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, id) AS INT) AS rank,
           |  id, cosine, label
           |FROM scored
           |QUALIFY rank <= 3
           |ORDER BY q_id, rank""".stripMargin))

  private val v04 = Entry("v04_ann_ivf",
    (s, dir) => {
      // IVF-partitioned ANN (Voronoi cells + nprobe search). The centroid
      // policy is a deterministic sample (first nlist corpus vectors by
      // id), cell assignment is argmax cosine with an (sim desc, cent_id)
      // tie-break, and candidate ranking is the v02 window — every step is
      // plain relational algebra over the d06-proven cosine arithmetic, so
      // since round 6 the WHOLE approximate pipeline is oracle-hashed
      // (cells, probes, candidate set, ranks), not just recall-spec'd.
      // The k-means-trained variant (v06) unrolls its bounded Lloyd's
      // rounds into the same CTE vocabulary since round 7.
      val emb = Tables(s, dir, "embeddings")
      val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.ivfTopK(corpus, queries, k = 3, nlist = 16, nprobe = 4)
        .orderBy("q_id", "rank")
    },
    Some("""WITH v AS (
           |  SELECT vec_id, embedding,
           |    sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * x),
           |         (p,q) -> p + q)) AS nrm
           |  FROM embeddings),
           |cent AS (
           |  SELECT vec_id AS cent_id, embedding AS cvec, nrm AS cnrm
           |  FROM v ORDER BY vec_id LIMIT 16),
           |sim AS (
           |  SELECT v.vec_id, cent.cent_id,
           |    list_reduce(list_transform(list_zip(v.embedding, cent.cvec),
           |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p,q2) -> p + q2)
           |      / (v.nrm * cent.cnrm) AS sim,
           |    row_number() OVER (PARTITION BY v.vec_id
           |      ORDER BY list_reduce(list_transform(list_zip(v.embedding, cent.cvec),
           |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p,q2) -> p + q2)
           |        / (v.nrm * cent.cnrm) DESC, cent.cent_id) AS rn
           |  FROM v CROSS JOIN cent),
           |ccell AS (SELECT vec_id, cent_id AS cell FROM sim WHERE rn = 1),
           |qcell AS (SELECT vec_id, cent_id AS cell FROM sim
           |          WHERE rn <= 4 AND vec_id < 5),
           |scored AS (
           |  SELECT q.vec_id AS q_id, c.vec_id AS id,
           |    list_reduce(list_transform(list_zip(q.embedding, c.embedding),
           |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p,q2) -> p + q2)
           |      / (q.nrm * c.nrm) AS cosine
           |  FROM qcell
           |  JOIN ccell ON ccell.cell = qcell.cell
           |  JOIN v q ON q.vec_id = qcell.vec_id
           |  JOIN v c ON c.vec_id = ccell.vec_id
           |  WHERE q.vec_id <> c.vec_id)
           |SELECT q_id,
           |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, id) AS INT) AS rank,
           |  id, cosine
           |FROM scored
           |QUALIFY rank <= 3
           |ORDER BY q_id, rank""".stripMargin))

  private val v06 = Entry("v06_ann_ivf_kmeans",
    (s, dir) => {
      // IVF with k-means-TRAINED centroids — v04's sampled cells refined by
      // two deterministic Lloyd's rounds (Similarity.lloydCentroids): assign
      // is the shared broadcast-argmin, the mean update routes element sums
      // through DECIMAL(20,10) (the v05 trick) so accumulation order can't
      // move a bit, and empty cells keep their previous centroid. That makes
      // the TRAINING itself cross-engine-reproducible: the oracle below
      // unrolls both rounds as assign/avg CTEs, so cells, probes, candidate
      // set and ranks all hash-match — closing the last no_oracle entry.
      // The MLlib-trained variant (ivfTopKTrained) remains in Similarity for
      // workloads that want converged centroids; SimilaritySpec asserts both
      // variants' recall vs brute force.
      val emb = Tables(s, dir, "embeddings")
      val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.ivfTopKLloyd(corpus, queries, k = 3, nlist = 16, nprobe = 4,
          iters = 2)
        .orderBy("q_id", "rank")
    },
    Some("""WITH v AS (
           |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dvec
           |  FROM embeddings),
           |vn AS (
           |  SELECT vec_id, dvec,
           |    sqrt(list_reduce(list_transform(dvec, x -> x * x), (p,q) -> p + q)) AS nrm
           |  FROM v),
           |c0 AS (
           |  SELECT vec_id AS cent_id, dvec AS cvec,
           |    sqrt(list_reduce(list_transform(dvec, x -> x * x), (p,q) -> p + q)) AS cnrm
           |  FROM v ORDER BY vec_id LIMIT 16),
           |a1 AS (
           |  SELECT vec_id, cent_id AS cell FROM (
           |    SELECT vn.vec_id, c.cent_id,
           |      row_number() OVER (PARTITION BY vn.vec_id ORDER BY
           |        list_reduce(list_transform(list_zip(vn.dvec, c.cvec),
           |          x -> x[1] * x[2]), (p,q) -> p + q) / (vn.nrm * c.cnrm)
           |        DESC, c.cent_id) AS rn
           |    FROM vn CROSS JOIN c0 c) WHERE rn = 1),
           |x1 AS (
           |  SELECT a1.cell AS cent_id, unnest(v.dvec) AS val,
           |    unnest(range(len(v.dvec))) AS dim
           |  FROM a1 JOIN v USING (vec_id)),
           |u1 AS (
           |  SELECT cent_id, dim,
           |    CAST(SUM(CAST(val AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS cv
           |  FROM x1 GROUP BY cent_id, dim),
           |c1 AS (
           |  SELECT c0.cent_id, COALESCE(u.cvec, c0.cvec) AS cvec
           |  FROM c0 LEFT JOIN (
           |    SELECT cent_id, list(cv ORDER BY dim) AS cvec
           |    FROM u1 GROUP BY cent_id) u USING (cent_id)),
           |c1n AS (
           |  SELECT cent_id, cvec,
           |    sqrt(list_reduce(list_transform(cvec, x -> x * x), (p,q) -> p + q)) AS cnrm
           |  FROM c1),
           |a2 AS (
           |  SELECT vec_id, cent_id AS cell FROM (
           |    SELECT vn.vec_id, c.cent_id,
           |      row_number() OVER (PARTITION BY vn.vec_id ORDER BY
           |        list_reduce(list_transform(list_zip(vn.dvec, c.cvec),
           |          x -> x[1] * x[2]), (p,q) -> p + q) / (vn.nrm * c.cnrm)
           |        DESC, c.cent_id) AS rn
           |    FROM vn CROSS JOIN c1n c) WHERE rn = 1),
           |x2 AS (
           |  SELECT a2.cell AS cent_id, unnest(v.dvec) AS val,
           |    unnest(range(len(v.dvec))) AS dim
           |  FROM a2 JOIN v USING (vec_id)),
           |u2 AS (
           |  SELECT cent_id, dim,
           |    CAST(SUM(CAST(val AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS cv
           |  FROM x2 GROUP BY cent_id, dim),
           |c2 AS (
           |  SELECT c1.cent_id, COALESCE(u.cvec, c1.cvec) AS cvec
           |  FROM c1 LEFT JOIN (
           |    SELECT cent_id, list(cv ORDER BY dim) AS cvec
           |    FROM u2 GROUP BY cent_id) u USING (cent_id)),
           |c2n AS (
           |  SELECT cent_id, cvec,
           |    sqrt(list_reduce(list_transform(cvec, x -> x * x), (p,q) -> p + q)) AS cnrm
           |  FROM c2),
           |fa AS (
           |  SELECT vn.vec_id, c.cent_id,
           |    row_number() OVER (PARTITION BY vn.vec_id ORDER BY
           |      list_reduce(list_transform(list_zip(vn.dvec, c.cvec),
           |        x -> x[1] * x[2]), (p,q) -> p + q) / (vn.nrm * c.cnrm)
           |      DESC, c.cent_id) AS rn
           |  FROM vn CROSS JOIN c2n c),
           |ccell AS (SELECT vec_id, cent_id AS cell FROM fa WHERE rn = 1),
           |qcell AS (SELECT vec_id, cent_id AS cell FROM fa
           |          WHERE rn <= 4 AND vec_id < 5),
           |scored AS (
           |  SELECT q.vec_id AS q_id, c.vec_id AS id,
           |    list_reduce(list_transform(list_zip(q.dvec, c.dvec),
           |        x -> x[1] * x[2]), (p,q2) -> p + q2) / (q.nrm * c.nrm) AS cosine
           |  FROM qcell
           |  JOIN ccell ON ccell.cell = qcell.cell
           |  JOIN vn q ON q.vec_id = qcell.vec_id
           |  JOIN vn c ON c.vec_id = ccell.vec_id
           |  WHERE q.vec_id <> c.vec_id)
           |SELECT q_id,
           |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, id) AS INT) AS rank,
           |  id, cosine
           |FROM scored
           |QUALIFY rank <= 3
           |ORDER BY q_id, rank""".stripMargin))

  private val v10 = Entry("v10_ann_pq",
    (s, dir) => {
      // Product-quantization ANN — the MEMORY-compressed member of the ANN
      // trio (v03 LSH prunes by bucket, v04/v06 IVF prune by cell, v10
      // shrinks every vector to m=8 one-byte codes and scores via an ADC
      // table without touching raw vectors). Codebook is the deterministic
      // sample policy of v04, so since round 6 the whole pipeline is
      // oracle-hashed: the oracle rebuilds the codebook (sub-vectors of
      // the first ksub corpus vectors, ‖c‖² as the same in-order fold),
      // re-derives every code as argmin ‖c‖²−2·x·c with the (d, c)
      // tie-break, assembles per-query ADC tables, and folds the m score
      // terms in sub-space order — every double bit-identical because
      // both sides run identical IEEE op sequences. ADC scores remain
      // APPROXIMATE squared-L2 surrogates (that's PQ); "approximate" no
      // longer means "unverifiable".
      val emb = Tables(s, dir, "embeddings")
      val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.pqTopK(corpus, queries, k = 3, m = 8, ksub = 16, dim = 64)
        .orderBy("q_id", "rank")
    },
    Some(v10OracleSql))

  /** v10's oracle — shared verbatim by v16 (same ADC semantics, corpus
    * codes served from the PERSISTED store): the hash match is the proof
    * that encode-at-build loses nothing vs encode-per-query. `lazy`
    * because v10 above initializes first in declaration order. */
  private lazy val v10OracleSql = ("""WITH v AS (SELECT vec_id, embedding FROM embeddings),
           |smp AS (
           |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, embedding
           |  FROM v ORDER BY vec_id LIMIT 16),
           |book AS (
           |  SELECT s.s, smp.c,
           |    list_slice(smp.embedding, s.s * 8 + 1, s.s * 8 + 8) AS cen,
           |    list_reduce(list_transform(
           |      list_slice(smp.embedding, s.s * 8 + 1, s.s * 8 + 8),
           |      x -> CAST(x AS DOUBLE) * x), (a,b) -> a + b) AS cc
           |  FROM smp, range(0, 8) s(s)),
           |dist AS (
           |  SELECT x.vec_id, b.s, b.c,
           |    b.cc - 2.0 * list_reduce(list_transform(
           |      list_zip(list_slice(x.embedding, b.s * 8 + 1, b.s * 8 + 8), b.cen),
           |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
           |      (a,b2) -> a + b2) AS d
           |  FROM v x, book b),
           |codes AS (
           |  SELECT vec_id, list(c ORDER BY s) AS codes FROM (
           |    SELECT vec_id, s, c,
           |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d, c) AS rn
           |    FROM dist) WHERE rn = 1 GROUP BY vec_id),
           |dtab AS (
           |  SELECT vec_id AS q_id, list(ds ORDER BY s) AS dtab FROM (
           |    SELECT vec_id, s, list(d ORDER BY c) AS ds
           |    FROM dist WHERE vec_id < 5 GROUP BY vec_id, s) GROUP BY vec_id),
           |scored AS (
           |  SELECT q.q_id, c.vec_id AS id,
           |    list_reduce(list_transform(range(0, 8),
           |      s -> q.dtab[s + 1][c.codes[s + 1] + 1]), (a,b) -> a + b) AS score
           |  FROM dtab q CROSS JOIN codes c WHERE q.q_id <> c.vec_id)
           |SELECT q_id,
           |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY score, id) AS INT) AS rank,
           |  id, score
           |FROM scored
           |QUALIFY rank <= 3
           |ORDER BY q_id, rank""").stripMargin

  private val v16 = Entry("v16_persisted_pq_topk",
    (s, dir) => {
      // v10's ADC search with the corpus side served from the PERSISTED
      // PQ store (DedupIndex.buildPq): codebook + per-vector codes are
      // written once — the store table form of "PQ codes" the round-7
      // verdict asked for — and the query reads (id, m codes) only,
      // never raw corpus vectors. The query batch re-derives its ADC
      // distance tables from the codebook LOADED off disk, so a hash
      // match against v10's oracle proves the full persist/load round
      // trip (Double.toString ↔ parseDouble) is bit-exact.
      val p = pqIndex(s, dir)
      DedupIndex.queryPqTopK(s,
          p, Tables(s, dir, "embeddings").filter(col("vec_id") < 5)
            .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
          k = 3)
        .orderBy("q_id", "rank")
    },
    Some(v10OracleSql))

  /** PQ store over the embeddings corpus (v10's m=8 / ksub=16 geometry). */
  private def pqIndex(s: org.apache.spark.sql.SparkSession, dir: String): String =
    idxCache.computeIfAbsent("pq:" + dir, _ => {
      val p = System.getProperty("java.io.tmpdir") + "/graft_pqidx_r8_" +
        dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + srcStamp(dir, "embeddings")
      if (!idxBuilt(p, "pq_codes"))
        DedupIndex.buildPq(Tables(s, dir, "embeddings")
            .select(col("vec_id").as("id"), col("embedding").as("vec")),
          "id", "vec", p, m = 8, ksub = 16, dim = 64)
      p
    })

  private val v13 = Entry("v13_ann_recall_eval",
    (s, dir) => {
      // Recall@3 of the LSH index (v03) against the exact ranking (v02) —
      // the audit a pipeline runs BEFORE trusting an approximate index at
      // 100 TB, as a catalog operator rather than a test: per query,
      // |ANN top-k ∩ exact top-k| / k. Both sides are the already-gated
      // deterministic pipelines, so even this evaluation is oracle-hashed
      // (the oracle re-derives exact + LSH candidates and intersects —
      // approximate never means unverifiable, including its metrics).
      // The hit check is a (q_id, id) semi-join on two k-row-per-query
      // sets — trivially broadcastable at any corpus size since k is
      // constant and queries are the small side.
      val emb = Tables(s, dir, "embeddings")
      val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val exact = Similarity.cosineTopK(corpus, queries, k = 3)
        .select(col("q_id"), col("id"))
      val ann = Similarity.lshTopKPortable(corpus, queries, k = 3, nBits = 4, dim = 64)
        .select(col("q_id"), col("id"))
      val hits = exact.join(ann, Seq("q_id", "id"), "left_semi")
        .groupBy("q_id").agg(count(lit(1)).as("n_hit"))
      queries.select("q_id").join(hits, Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          (coalesce(col("n_hit"), lit(0L)) / lit(3.0)).as("recall"))
        .orderBy("q_id")
    },
    Some("""WITH v AS (
           |  SELECT vec_id, embedding,
           |    sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * x),
           |         (p,q) -> p + q)) AS nrm
           |  FROM embeddings),
           |planes AS (
           |  SELECT i.i, list_transform(range(0, 64), j ->
           |    CAST(CAST('0x' || substr(md5('0:' || i.i || ':' || j), 1, 15)
           |      AS BIGINT) AS DOUBLE) / 576460752303423488 - 1) AS w
           |  FROM range(0, 4) i(i)),
           |b AS (
           |  SELECT v.vec_id,
           |    CAST(SUM(CASE WHEN list_reduce(list_transform(
           |        list_zip(p.w, v.embedding),
           |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)),
           |        (a,b2) -> a + b2) >= 0
           |      THEN 1 << p.i ELSE 0 END) AS BIGINT) AS bucket
           |  FROM v, planes p GROUP BY v.vec_id),
           |ex AS (
           |  SELECT q_id, id FROM (
           |    SELECT q.vec_id AS q_id, c.vec_id AS id,
           |      list_reduce(list_transform(list_zip(q.embedding, c.embedding),
           |          x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p,q2) -> p + q2)
           |        / (q.nrm * c.nrm) AS cosine
           |    FROM v q JOIN v c ON q.vec_id < 5 AND q.vec_id <> c.vec_id)
           |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, id) <= 3),
           |ann AS (
           |  SELECT q_id, id FROM (
           |    SELECT q.vec_id AS q_id, c.vec_id AS id,
           |      list_reduce(list_transform(list_zip(q.embedding, c.embedding),
           |          x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p,q2) -> p + q2)
           |        / (q.nrm * c.nrm) AS cosine
           |    FROM v q
           |    JOIN b bq ON bq.vec_id = q.vec_id
           |    JOIN b bc ON bc.bucket = bq.bucket
           |    JOIN v c ON c.vec_id = bc.vec_id
           |    WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id)
           |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, id) <= 3),
           |hits AS (
           |  SELECT e.q_id, COUNT(*) AS n_hit
           |  FROM ex e JOIN ann a ON a.q_id = e.q_id AND a.id = e.id
           |  GROUP BY e.q_id)
           |SELECT q.vec_id AS q_id,
           |  COALESCE(h.n_hit, 0) AS n_hit,
           |  COALESCE(h.n_hit, 0) / 3.0 AS recall
           |FROM (SELECT vec_id FROM embeddings WHERE vec_id < 5) q
           |LEFT JOIN hits h ON h.q_id = q.vec_id
           |ORDER BY q_id""".stripMargin))

  private val v12 = Entry("v12_ann_pq_rerank",
    (s, dir) => {
      // Two-stage PQ: ADC top-10 candidates (codes only) exact-re-ranked
      // by true cosine to top-3 — the composition v10's doc names as the
      // answer to ADC's tie-heavy intra-cluster order (quantized cluster
      // members score identically; the re-rank touches only the 10 raw
      // candidate vectors per query and restores the exact order v02
      // would produce on that pool). Oracle = v10's codebook/ADC CTEs
      // capped at 10, composed with the exact-cosine re-rank.
      val emb = Tables(s, dir, "embeddings")
      val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.pqRerankTopK(corpus, queries, k = 3, n = 10, m = 8,
          ksub = 16, dim = 64)
        .orderBy("q_id", "rank")
    },
    Some("""WITH v AS (SELECT vec_id, embedding FROM embeddings),
           |vn AS (
           |  SELECT vec_id, embedding,
           |    sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * x),
           |         (p,q) -> p + q)) AS nrm
           |  FROM v),
           |smp AS (
           |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, embedding
           |  FROM v ORDER BY vec_id LIMIT 16),
           |book AS (
           |  SELECT s.s, smp.c,
           |    list_slice(smp.embedding, s.s * 8 + 1, s.s * 8 + 8) AS cen,
           |    list_reduce(list_transform(
           |      list_slice(smp.embedding, s.s * 8 + 1, s.s * 8 + 8),
           |      x -> CAST(x AS DOUBLE) * x), (a,b) -> a + b) AS cc
           |  FROM smp, range(0, 8) s(s)),
           |dist AS (
           |  SELECT x.vec_id, b.s, b.c,
           |    b.cc - 2.0 * list_reduce(list_transform(
           |      list_zip(list_slice(x.embedding, b.s * 8 + 1, b.s * 8 + 8), b.cen),
           |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
           |      (a,b2) -> a + b2) AS d
           |  FROM v x, book b),
           |codes AS (
           |  SELECT vec_id, list(c ORDER BY s) AS codes FROM (
           |    SELECT vec_id, s, c,
           |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d, c) AS rn
           |    FROM dist) WHERE rn = 1 GROUP BY vec_id),
           |dtab AS (
           |  SELECT vec_id AS q_id, list(ds ORDER BY s) AS dtab FROM (
           |    SELECT vec_id, s, list(d ORDER BY c) AS ds
           |    FROM dist WHERE vec_id < 5 GROUP BY vec_id, s) GROUP BY vec_id),
           |adc AS (
           |  SELECT q.q_id, c.vec_id AS id,
           |    list_reduce(list_transform(range(0, 8),
           |      s -> q.dtab[s + 1][c.codes[s + 1] + 1]), (a,b) -> a + b) AS score
           |  FROM dtab q CROSS JOIN codes c WHERE q.q_id <> c.vec_id),
           |cand AS (
           |  SELECT q_id, id FROM (
           |    SELECT q_id, id,
           |      row_number() OVER (PARTITION BY q_id ORDER BY score, id) AS rn
           |    FROM adc) WHERE rn <= 10),
           |rerank AS (
           |  SELECT cand.q_id, cand.id,
           |    list_reduce(list_transform(list_zip(q.embedding, c.embedding),
           |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p,q2) -> p + q2)
           |      / (q.nrm * c.nrm) AS cosine
           |  FROM cand
           |  JOIN vn q ON q.vec_id = cand.q_id
           |  JOIN vn c ON c.vec_id = cand.id)
           |SELECT q_id,
           |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, id) AS INT) AS rank,
           |  id, cosine
           |FROM rerank
           |QUALIFY rank <= 3
           |ORDER BY q_id, rank""".stripMargin))

  private val v11 = Entry("v11_ann_ivf_pq",
    (s, dir) => {
      // IVF-PQ — the composed 100 TB shape the v04/v10 docs each point at:
      // the cell equi-join prunes candidates to nprobe/nlist of the
      // corpus, then ADC scoring reads only the m-byte codes of what
      // remains. Both corpus passes are map-only against broadcast
      // centroid literals. Oracle-hashed since round 6 by composing the
      // v04 cell/probe CTEs with the v10 codebook/ADC CTEs — the composed
      // approximate pipeline verifies end to end.
      val emb = Tables(s, dir, "embeddings")
      val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.ivfPqTopK(corpus, queries, k = 3, nlist = 16, nprobe = 4,
          m = 8, ksub = 16, dim = 64)
        .orderBy("q_id", "rank")
    },
    Some("""WITH v AS (
           |  SELECT vec_id, embedding,
           |    sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * x),
           |         (p,q) -> p + q)) AS nrm
           |  FROM embeddings),
           |cent AS (
           |  SELECT vec_id AS cent_id, embedding AS cvec, nrm AS cnrm
           |  FROM v ORDER BY vec_id LIMIT 16),
           |sim AS (
           |  SELECT v.vec_id, cent.cent_id,
           |    row_number() OVER (PARTITION BY v.vec_id
           |      ORDER BY list_reduce(list_transform(list_zip(v.embedding, cent.cvec),
           |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p,q2) -> p + q2)
           |        / (v.nrm * cent.cnrm) DESC, cent.cent_id) AS rn
           |  FROM v CROSS JOIN cent),
           |ccell AS (SELECT vec_id, cent_id AS cell FROM sim WHERE rn = 1),
           |qcell AS (SELECT vec_id, cent_id AS cell FROM sim
           |          WHERE rn <= 4 AND vec_id < 5),
           |smp AS (
           |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, embedding
           |  FROM v ORDER BY vec_id LIMIT 16),
           |book AS (
           |  SELECT s.s, smp.c,
           |    list_slice(smp.embedding, s.s * 8 + 1, s.s * 8 + 8) AS cen,
           |    list_reduce(list_transform(
           |      list_slice(smp.embedding, s.s * 8 + 1, s.s * 8 + 8),
           |      x -> CAST(x AS DOUBLE) * x), (a,b) -> a + b) AS cc
           |  FROM smp, range(0, 8) s(s)),
           |dist AS (
           |  SELECT x.vec_id, b.s, b.c,
           |    b.cc - 2.0 * list_reduce(list_transform(
           |      list_zip(list_slice(x.embedding, b.s * 8 + 1, b.s * 8 + 8), b.cen),
           |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
           |      (a,b2) -> a + b2) AS d
           |  FROM v x, book b),
           |codes AS (
           |  SELECT vec_id, list(c ORDER BY s) AS codes FROM (
           |    SELECT vec_id, s, c,
           |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d, c) AS rn
           |    FROM dist) WHERE rn = 1 GROUP BY vec_id),
           |dtab AS (
           |  SELECT vec_id AS q_id, list(ds ORDER BY s) AS dtab FROM (
           |    SELECT vec_id, s, list(d ORDER BY c) AS ds
           |    FROM dist WHERE vec_id < 5 GROUP BY vec_id, s) GROUP BY vec_id),
           |scored AS (
           |  SELECT q.q_id, cc2.vec_id AS id,
           |    list_reduce(list_transform(range(0, 8),
           |      s -> q.dtab[s + 1][cc2.codes[s + 1] + 1]), (a,b) -> a + b) AS score
           |  FROM dtab q
           |  JOIN qcell ON qcell.vec_id = q.q_id
           |  JOIN ccell ON ccell.cell = qcell.cell
           |  JOIN codes cc2 ON cc2.vec_id = ccell.vec_id
           |  WHERE q.q_id <> cc2.vec_id)
           |SELECT q_id,
           |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY score, id) AS INT) AS rank,
           |  id, score
           |FROM scored
           |QUALIFY rank <= 3
           |ORDER BY q_id, rank""".stripMargin))

  private val t05 = Entry("t05_bpe_token_count",
    (s, dir) => {
      // BPE-ish subword pretokenization (GPT-2-style pattern: contractions,
      // letter runs, digit runs, punctuation runs with optional leading
      // space) — the token-budget estimator a training pipeline runs before
      // the real tokenizer.
      val pat = "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          regexp_count(col("text"), lit(pat)).as("n_bpe_tokens"),
          TextAnalysis.tokenCount(col("text")).as("n_ws_tokens"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
           |  CAST(len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+')) AS INT) AS n_bpe_tokens,
           |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_ws_tokens
           |FROM documents ORDER BY doc_id""".stripMargin))

  private val t22 = Entry("t22_unicode_nfc_normalize",
    (s, dir) => {
      // Unicode NFC normalization (codegen'd NfcNormalize) — the pass a
      // pipeline runs BEFORE hashing so 'é' and 'e'+COMBINING ACUTE hash
      // identically. The fixture text is already composed, so a DECOMPOSED
      // suffix (e + U+0301) is appended to exercise real folding: every
      // row must report already_nfc = false and exactly one code point
      // folded. DuckDB's nfc_normalize implements the same Unicode
      // algorithm, so lengths and flags hash-match.
      val raw = concat(col("text"), lit(" cafe\u0301")) // DECOMPOSED e + U+0301
      val nfc = graft.functions.NativeExpressions.nfcNormalize(raw)
      Tables(s, dir, "documents").select(col("doc_id"),
          length(raw).as("raw_len"),
          length(nfc).as("nfc_len"),
          (nfc === raw).as("already_nfc"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
           |  CAST(length(text || ' cafe' || chr(769)) AS INT) AS raw_len,
           |  CAST(length(nfc_normalize(text || ' cafe' || chr(769))) AS INT) AS nfc_len,
           |  nfc_normalize(text || ' cafe' || chr(769)) = (text || ' cafe' || chr(769))
           |    AS already_nfc
           |FROM documents ORDER BY doc_id""".stripMargin))

  private val t23 = Entry("t23_url_canonicalize",
    (s, dir) => {
      // URL canonicalization + URL-level dedup — the pass a crawl pipeline
      // runs BEFORE any content fetch/dedup (the same page arrives as
      // HTTP://WWW.Example.COM:80/x?utm_source=f&id=1#frag and
      // http://www.example.com/x?id=1): lowercase scheme+host, strip the
      // default port and the fragment, drop tracking params (utm_*/
      // fbclid/gclid), sort what remains. All pure column expressions
      // (parse_url + higher-order filter/array_sort — codegen'd, no UDF),
      // so the canonicalizer runs at scan speed over 100 TB of crawl logs.
      // Messy inputs are constructed deterministically from doc_id; the
      // ORACLE derives the expected canonical form analytically, so a
      // canonicalizer that mishandles any rule (case, port, fragment,
      // tracking params) hash-mismatches.
      val d = col("doc_id")
      val url = concat(
        when(d % 2 === 0, lit("HTTP://")).otherwise(lit("http://")),
        when(d % 3 === 0, lit("WWW.Example.COM"))
          .otherwise(concat(lit("CDN"), (d % 4).cast("string"),
            lit(".Example.com"))),
        when(d % 5 === 0, lit(":80")).otherwise(lit("")),
        lit("/Articles/"), (d % 50).cast("string"),
        lit("?utm_source=feed&id="), (d % 25).cast("string"),
        lit("&utm_campaign=news"),
        lit("#sec"), (d % 7).cast("string"))
      val noFrag = substring_index(url, "#", 1)
      val kept = array_sort(filter(split(parse_url(noFrag, lit("QUERY")), "&"),
        p => !(p.startsWith("utm_") || p.startsWith("fbclid") ||
          p.startsWith("gclid"))))
      val canonical = concat(
        lower(parse_url(noFrag, lit("PROTOCOL"))), lit("://"),
        lower(parse_url(noFrag, lit("HOST"))),
        parse_url(noFrag, lit("PATH")),
        when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
          .otherwise(lit("")))
      Tables(s, dir, "documents").select(d, canonical.as("canonical_url"))
        .groupBy("canonical_url")
        .agg(count(lit(1)).as("n_dups"), min("doc_id").as("first_doc"))
        .orderBy("canonical_url").limit(200)
    },
    Some("""SELECT canonical_url, COUNT(*) AS n_dups, MIN(doc_id) AS first_doc
           |FROM (
           |  SELECT doc_id,
           |    'http://' ||
           |    CASE WHEN doc_id % 3 = 0 THEN 'www.example.com'
           |         ELSE 'cdn' || CAST(doc_id % 4 AS VARCHAR) || '.example.com'
           |    END || '/Articles/' || CAST(doc_id % 50 AS VARCHAR)
           |        || '?id=' || CAST(doc_id % 25 AS VARCHAR) AS canonical_url
           |  FROM documents)
           |GROUP BY canonical_url ORDER BY canonical_url LIMIT 200""".stripMargin))

  private val t25 = Entry("t25_bpe_encode",
    (s, dir) => {
      // True fixed-merges BPE ENCODING (VERDICT r9 #6): the codegen'd
      // Bpe.encode kernel applies the ordered merges table (the task's
      // tokenizer artifact) per word in one array pass — where t05 merely
      // COUNTS pretokens, this materializes the subword stream every
      // training pipeline ships to the trainer. The census (top 100
      // subwords) is the vocabulary-coverage check run right after. The
      // DuckDB oracle replays the merge loop UNROLLED (two replace()
      // passes per rule on the spaced-symbol form — see Bpe's scaladoc
      // for why two passes ≡ the kernel's greedy array pass).
      Tables(s, dir, "documents")
        .select(explode(
          graft.functions.NativeExpressions.bpeEncode(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(100)
    },
    Some(s"""WITH words AS (
            |  SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
            |  FROM documents),
            |nz AS (SELECT w FROM words WHERE w <> ''),
            |enc AS (SELECT ${graft.functions.Bpe.oracleSqlExpr("w")} AS s FROM nz),
            |tok AS (SELECT unnest(string_split(trim(s), ' ')) AS token FROM enc)
            |SELECT token, COUNT(*) AS n FROM tok
            |GROUP BY token ORDER BY n DESC, token LIMIT 100""".stripMargin))

  private val t28 = Entry("t28_bpe_train",
    (s, dir) => {
      // BPE merge-table LEARNING (VERDICT r10 #3) — t25 applies a fixed
      // merges table; this learns one: 20 rounds of corpus-wide pair-count
      // aggregates with a deterministic argmax (max count, ties to the
      // lexicographically smallest pair — classic BPE's hash-map-order tie
      // break pinned for a distributed engine). The corpus is touched ONCE
      // (the word-frequency groupBy); every round after is vocabulary-
      // sized. All integer counts and a-z strings — full hash. The oracle
      // unrolls the same three steps per round over spaced-symbol strings
      // (t25's two-replace ≡ greedy-pass equivalence).
      // fanOut measured 1.3x SLOWER here (round 16): the word-frequency
      // groupBy already exchanges by word, so the extra doc_id exchange
      // buys nothing the 20 driver rounds notice — left on one scan task.
      val (merges, _) = graft.analytics.BpeTrain.train(
        Tables(s, dir, "documents"), "text", rounds = 20)
      import s.implicits._
      merges.map(m => (m.rank, m.x, m.y, m.count))
        .toDF("rank", "x", "y", "cnt")
        .orderBy("rank")
    },
    Some(graft.analytics.BpeTrain.oracleSql("documents", "text", rounds = 20)))

  private val t26 = Entry("t26_ngram_repetition",
    (s, dir) => {
      // Gopher-style N-GRAM repetition signals (round 10; t13 covers the
      // unigram family, t24 the cross-doc boilerplate census): per doc,
      // the fraction of content characters claimed by the single most
      // frequent 2-/3-/4-gram (top-n-gram mass) and by ALL occurrences of
      // duplicated 5-grams (dup-5-gram mass) — the repetition filters a
      // Gopher-class pipeline applies before any fuzzy dedup. One explode
      // + one (doc, gram) hash aggregate per n — map-side combined,
      // linear in token count, never a self-join — then a per-doc
      // max/conditional-sum. Gram mass counts token characters (gram
      // string length minus its n−1 separators) × occurrence count;
      // overlapping occurrences each count (the cheap sliding-window
      // definition), replayed identically in the oracle; every fraction
      // is one IEEE division of exact integers in the same operation
      // order on both engines.
      // ONE documents scan: the four gram families ride a single tagged
      // explode (struct(n, gram)), one (doc, n, gram) count, one per-doc
      // conditional aggregate — no joins anywhere, so the plan is a
      // straight-line explode→combine pipeline at 100 TB AND the
      // count()-timed gate measures the real work (a join-recombination
      // form lets Catalyst eliminate outer joins under count()). Docs too
      // short for any 2-gram union in as zero rows.
      val docs = fanOut(Tables(s, dir, "documents"), s, "doc_id")
      val base = docs
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .select(col("doc_id"), col("t"),
          aggregate(transform(col("t"), w => length(w).cast("long")),
            lit(0L), (a, x) => a + x).as("chars"))
      def gramsArr(nv: Int) = when(size(col("t")) >= nv,
          transform(sequence(lit(1), size(col("t")) - (nv - 1)),
            i => struct(lit(nv).as("n"),
              concat_ws(" ", slice(col("t"), i, lit(nv))).as("g"))))
        .otherwise(array().cast("array<struct<n:int,g:string>>"))
      val counts = base
        .select(col("doc_id"), col("chars"),
          explode(concat(gramsArr(2), gramsArr(3), gramsArr(4), gramsArr(5)))
            .as("gr"))
        .select(col("doc_id"), col("chars"), col("gr.n").as("n"),
          col("gr.g").as("g"))
        .groupBy(col("doc_id"), col("chars"), col("n"), col("g"))
        .agg(count(lit(1)).as("c"))
      val stats = counts
        .groupBy(col("doc_id"), col("chars"))
        .agg(
          max(when(col("n") === 2, col("c") * (length(col("g")) - 1))).as("m2"),
          max(when(col("n") === 3, col("c") * (length(col("g")) - 2))).as("m3"),
          max(when(col("n") === 4, col("c") * (length(col("g")) - 3))).as("m4"),
          coalesce(sum(when(col("n") === 5 && col("c") >= 2,
            col("c") * (length(col("g")) - 4))), lit(0L)).as("d5"))
      val withFracs = stats.select(col("doc_id"), col("chars").as("n_chars"),
        coalesce(col("m2").cast("double") / col("chars").cast("double"),
          lit(0.0)).as("top2_frac"),
        coalesce(col("m3").cast("double") / col("chars").cast("double"),
          lit(0.0)).as("top3_frac"),
        coalesce(col("m4").cast("double") / col("chars").cast("double"),
          lit(0.0)).as("top4_frac"),
        (col("d5").cast("double") / col("chars").cast("double"))
          .as("dup5_frac"))
      val tooShort = base.filter(size(col("t")) < 2)
        .select(col("doc_id"), col("chars").as("n_chars"),
          lit(0.0).as("top2_frac"), lit(0.0).as("top3_frac"),
          lit(0.0).as("top4_frac"), lit(0.0).as("dup5_frac"))
      withFracs.unionByName(tooShort).orderBy("doc_id")
    },
    Some("""WITH b AS (
           |  SELECT doc_id, string_split(text, ' ') AS t,
           |    CAST(list_sum(list_transform(string_split(text, ' '),
           |      w -> length(w))) AS BIGINT) AS chars
           |  FROM documents),
           |g AS (
           |  SELECT doc_id, chars, 2 AS n, unnest(CASE WHEN len(t) >= 2 THEN
           |      list_transform(range(1, len(t)), i -> array_to_string(t[i:i+1], ' '))
           |    ELSE [] END) AS g FROM b
           |  UNION ALL
           |  SELECT doc_id, chars, 3, unnest(CASE WHEN len(t) >= 3 THEN
           |      list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
           |    ELSE [] END) FROM b
           |  UNION ALL
           |  SELECT doc_id, chars, 4, unnest(CASE WHEN len(t) >= 4 THEN
           |      list_transform(range(1, len(t) - 2), i -> array_to_string(t[i:i+3], ' '))
           |    ELSE [] END) FROM b
           |  UNION ALL
           |  SELECT doc_id, chars, 5, unnest(CASE WHEN len(t) >= 5 THEN
           |      list_transform(range(1, len(t) - 3), i -> array_to_string(t[i:i+4], ' '))
           |    ELSE [] END) FROM b),
           |c AS (SELECT doc_id, chars, n, g, COUNT(*) AS c
           |      FROM g GROUP BY 1, 2, 3, 4),
           |st AS (SELECT doc_id, chars,
           |    MAX(CASE WHEN n = 2 THEN c * (length(g) - 1) END) AS m2,
           |    MAX(CASE WHEN n = 3 THEN c * (length(g) - 2) END) AS m3,
           |    MAX(CASE WHEN n = 4 THEN c * (length(g) - 3) END) AS m4,
           |    COALESCE(SUM(CASE WHEN n = 5 AND c >= 2
           |      THEN c * (length(g) - 4) END), 0) AS d5
           |  FROM c GROUP BY doc_id, chars)
           |SELECT doc_id, chars AS n_chars,
           |  COALESCE(CAST(m2 AS DOUBLE) / CAST(chars AS DOUBLE), 0.0) AS top2_frac,
           |  COALESCE(CAST(m3 AS DOUBLE) / CAST(chars AS DOUBLE), 0.0) AS top3_frac,
           |  COALESCE(CAST(m4 AS DOUBLE) / CAST(chars AS DOUBLE), 0.0) AS top4_frac,
           |  CAST(d5 AS DOUBLE) / CAST(chars AS DOUBLE) AS dup5_frac
           |FROM st
           |UNION ALL
           |SELECT doc_id, chars, 0.0, 0.0, 0.0, 0.0 FROM b WHERE len(t) < 2
           |ORDER BY doc_id""".stripMargin))

  private val t27 = Entry("t27_vocab_coverage",
    (s, dir) => {
      // Vocabulary-coverage quality filter (round 10) — the C4/Gopher-class
      // signal "what fraction of a document's tokens are in the corpus's
      // top-K vocabulary": low coverage flags lorem-ipsum, foreign-language
      // leakage, and OCR noise. The vocabulary is the corpus's own top-K
      // terms by total frequency (ties to the lexicographically smallest
      // term — deterministic), BROADCAST onto the token stream: one
      // explode, one broadcast left join, one map-side-combined per-doc
      // aggregate — linear in token count, no shuffle wider than the final
      // per-doc rollup. K = 10 here because the fixture corpus has only 31
      // distinct terms (any K >= 31 makes every coverage 1.0 and tests
      // nothing); production K is 10^3-10^5 and still broadcast-sized —
      // the plan is identical. Report: coverage-decile histogram with
      // exact integer columns only (bucket = in_vocab*10 div total,
      // capped at 9; no float sums to hash).
      val docs = Tables(s, dir, "documents")
      val tok = docs.select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("term"))
      val vocab = tok.groupBy("term").agg(count(lit(1)).as("tf"))
        .orderBy(col("tf").desc, col("term")).limit(10)
        .select(col("term"), lit(1).as("__v"))
      val cov = tok.join(broadcast(vocab), Seq("term"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("total"), count(col("__v")).as("in_vocab"))
      cov.select(
          least(lit(9L), expr("in_vocab * 10 div total")).as("bucket"),
          col("total"), col("in_vocab"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), sum("total").as("sum_tokens"),
          sum("in_vocab").as("sum_in_vocab"))
        .orderBy("bucket")
    },
    Some("""WITH tok AS (
           |  SELECT doc_id,
           |    unnest(regexp_split_to_array(trim(text), '\s+')) AS term
           |  FROM documents),
           |vocab AS (
           |  SELECT term FROM tok GROUP BY term
           |  ORDER BY COUNT(*) DESC, term LIMIT 10),
           |cov AS (
           |  SELECT doc_id, COUNT(*) AS total,
           |    COUNT(*) FILTER (term IN (SELECT term FROM vocab)) AS in_vocab
           |  FROM tok GROUP BY doc_id)
           |SELECT LEAST(9, in_vocab * 10 // total) AS bucket,
           |  CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(total) AS BIGINT) AS sum_tokens,
           |  CAST(SUM(in_vocab) AS BIGINT) AS sum_in_vocab
           |FROM cov GROUP BY bucket ORDER BY bucket""".stripMargin))

  private val t24 = Entry("t24_boilerplate_ngrams",
    (s, dir) => {
      // Boilerplate n-gram detection (the CCNet/RefinedWeb-style pass that
      // strips nav bars, cookie banners, and template headers): a 5-gram
      // that appears VERBATIM in more than one document of the same source
      // is boilerplate, not content. One explode (distinct 5-grams per
      // doc) + one (source, gram) hash aggregate — map-side combined, no
      // self-join, linear in corpus token count, so the plan holds at
      // 100 TB where per-doc dedup cannot. Output: per-source boilerplate
      // census (distinct boilerplate grams, their doc hits, total distinct
      // gram volume) — all exact integers.
      val w = split(col("text"), " ")
      val grams = fanOut(Tables(s, dir, "documents"), s, "doc_id")
        .select(col("doc_id"), col("source"), w.as("w"))
        .withColumn("g", when(size(col("w")) >= 5,
          array_distinct(transform(sequence(lit(0), size(col("w")) - 5),
            i => array_join(slice(col("w"), i + 1, lit(5)), " "))))
          .otherwise(array().cast("array<string>")))
        .select(col("doc_id"), col("source"), explode(col("g")).as("gram"))
      val docFreq = grams.groupBy("source", "gram")
        .agg(count(lit(1)).as("df")) // grams are distinct per doc already
      docFreq.groupBy("source").agg(
          sum(when(col("df") >= 2, lit(1)).otherwise(lit(0))).as("n_boiler_grams"),
          sum(when(col("df") >= 2, col("df")).otherwise(lit(0))).as("boiler_doc_hits"),
          sum(col("df")).as("total_gram_occurrences"))
        .orderBy("source")
    },
    Some("""WITH g AS (
           |  SELECT doc_id, source, unnest(list_distinct(
           |    CASE WHEN len(w) >= 5 THEN
           |      list_transform(range(1, len(w) - 3),
           |        i -> array_to_string(w[i:i+4], ' '))
           |    ELSE [] END)) AS gram
           |  FROM (SELECT doc_id, source, string_split(text, ' ') AS w
           |        FROM documents)),
           |df AS (SELECT source, gram, COUNT(*) AS df FROM g GROUP BY 1, 2)
           |SELECT source,
           |  CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler_grams,
           |  CAST(SUM(CASE WHEN df >= 2 THEN df ELSE 0 END) AS BIGINT) AS boiler_doc_hits,
           |  CAST(SUM(df) AS BIGINT) AS total_gram_occurrences
           |FROM df GROUP BY source ORDER BY source""".stripMargin))

  val entries: Seq[Entry] = Seq(
    g01, g02, g03, g04, g05, g06,
    t01, t02, t03, t04, t05, t06, t07, t08, t09, t10, t11, t12, t13, t14, t15,
    t16, t17, t18, t19, t20, t21, t22, t23, t24, t25, t26, t27, t28,
    d01, d02, d03, d04, d05, d06, d07, d08, d09, d10, d11, d12, d13, d14, d15,
    d16, d17, d18, d19, d20, d21, d22, d23, d24, d25, d26, d27, d28,
    v01, v02, v03, v04, v05, v06, v07, v08, v09, v10, v11, v12, v13, v14, v15,
    v16, v17,
    s01, s02, s03, s04, s05, s06, s07, s08, s09, s10, s11, s12, s13,
    i01, i02, i03, i04, i05, i06, i07, i08, i09, i10, i11,
    c01, c02, c03, c04, c05, c06, c07, c08, c09, c10, c11, c12, c13, c14,
    c15, c16, c17, c18, c19, c20, c21, c22, c23, c24, c25, c26, c27,
    c28, c29, c30, c31, c32, c33, c34, c35, c36, c37, c38, c39, c40, c41, c42,
    c43, c44, c45, c46, c47, c48, c49, c50, c51, c52, c53, c54, c55, c56,
    c57, c58, c59, c60, c61, c62, c63, c64, c65, c66, c67, c68, c69, c70,
    c71, c72, c73, c74, c75, c76, c77, c78, c79, c80, c81, c82, c83, c84,
    x01, x02, x03, x04, x05, x06, x07, x08, x09, x10, x11, x12, x13, x14,
    x15, x16, x17, x18, x19, x20,
    m01, m02, m03, m04, m05, m06)
}
