package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** GDS-session scale rehearsal (round 10): the project-once / stream-many
  * contract every real GDS session follows, measured at the 100×-the-gate
  * fixture through the PROCEDURE surface (not the algorithm internals).
  *
  * Builds one store from the rehearsal documents — Doc nodes on a ring +
  * skip-2 lattice (the c61 shape: dense triangles, bounded co-degree) plus
  * Doc→Pub star edges that pin the undirected diameter at ~4 (BFS-family
  * procedures need bounded depth; a bare 500k-ring has diameter 250k and
  * would loudly exceed any budget — the x20 depth lesson applied at
  * fixture-design time) — projects it ONCE, then times each algorithm
  * procedure against the same projection snapshot.
  *
  * gds.scc.stream is deliberately absent: the ring is one 500k-node cycle,
  * and SCC's peel cost is floored by cycle LENGTH (x20's negative result —
  * 267 s on a deep fixture); its scale row lives with x20's constant-depth
  * fixture instead.
  *
  * Usage: `runMain graft.GdsRehearsal [rehearsalDir]`
  * (default target/sf10_rehearsal — derive it with graft.ScaleRehearsal).
  */
object GdsRehearsal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf10_rehearsal")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    // Rehearsal doc_ids are STRIPED per replica (ScaleRehearsal shifts by
    // k·1e6); ring arithmetic must wrap WITHIN the stripe or every
    // non-base replica is silently edge-free — gds.kcore's loud
    // non-convergence cap caught exactly that on this rehearsal's first
    // run. One contiguous stripe (a gate dir) reduces to (doc_id+off) % n.
    val stride = 1000000L
    val nStripes = math.max(1L, docs
      .select((col("doc_id") - col("doc_id") % stride).as("b"))
      .distinct().count())
    val per = n / nStripes
    val sBase = col("doc_id") - col("doc_id") % stride
    def link(off: Int) = docs.select(
      lit("Doc").as("srcLabel"), col("doc_id").cast("string").as("srcKey"),
      lit("LINK").as("relType"), lit("Doc").as("dstLabel"),
      (sBase + (col("doc_id") % stride + off) % per).cast("string").as("dstKey"))
    val star = docs.select(
      lit("Doc").as("srcLabel"), col("doc_id").cast("string").as("srcKey"),
      lit("LINK").as("relType"), lit("Pub").as("dstLabel"),
      col("source").as("dstKey"))
    val nodes = docs.select(lit("Doc").as("label"),
        col("doc_id").cast("string").as("key"),
        typedlit(Map.empty[String, String]).as("props"))
      .unionByName(docs.select(col("source")).distinct()
        .select(lit("Pub").as("label"), col("source").as("key"),
          typedlit(Map.empty[String, String]).as("props")))
    val t0 = System.nanoTime()
    val g = graft.graph.PropertyGraph.empty(spark)
      .mergeNodes(nodes)
      .mergeEdgesByKey(link(1))
      .mergeEdgesByKey(link(2))
      .mergeEdgesByKey(star)
    val nN = g.nodes.count(); val nE = g.edges.count()
    val buildSec = (System.nanoTime() - t0) / 1e9
    val sess = new graft.cypher.CypherSession(g,
      keyProps = Map("Doc" -> "doc_id", "Pub" -> "name"))

    def run(label: String, q: String): (String, Double, Long) = {
      System.err.println(s"[gds-rehearsal] $label …")
      val s0 = System.nanoTime()
      val rows = sess.run(q).asInstanceOf[graft.cypher.CypherRows].df.count()
      (label, (System.nanoTime() - s0) / 1e9, rows)
    }
    // Two projections from one store, each shaped for its algorithm class:
    // 'g' keeps the star (bounded diameter — what the BFS/propagation
    // family needs); 'tri' is the Doc-only lattice (the label filter drops
    // every pub-endpoint edge), because a 25k-degree pub hub would put
    // Σ co-degree² ≈ 6B wedge rows through the triangle listing join —
    // choosing the projection IS the GDS-native way to bound that work.
    val project = run("project",
      "CALL gds.graph.project('g', '*', 'LINK')")
    val projectTri = run("project_doc_only",
      "CALL gds.graph.project('tri', 'Doc', 'LINK')")
    val timed = Seq(
      project, projectTri,
      run("degree", "CALL gds.degree.stream('g') YIELD key RETURN key"),
      run("pageRank",
        "CALL gds.pageRank.stream('g') YIELD key, score RETURN key, score"),
      run("wcc",
        "CALL gds.wcc.stream('g') YIELD key, componentKey RETURN componentKey"),
      run("triangleCount",
        "CALL gds.triangleCount.stream('tri') YIELD key, triangleCount RETURN triangleCount"),
      run("kcore",
        "CALL gds.kcore.stream('g') YIELD key, coreValue RETURN coreValue"),
      run("betweenness_s64",
        """CALL gds.betweenness.stream('g', {samplingSize: 64})
          |YIELD key, score RETURN score""".stripMargin),
      run("louvain",
        """CALL gds.louvain.stream('g') YIELD key, communityKey
          |RETURN communityKey""".stripMargin))
    val qs = timed.map { case (k, s, r) =>
      s"\"" + k + "\":{\"sec\":" + f"$s%.2f" + ",\"rows\":" + r + "}"
    }.mkString("{", ",", "}")
    println(s"""{"metric":"gds_rehearsal","nodes":$nN,"edges":$nE,""" +
      f""""build_sec":$buildSec%.2f,"procedures":$qs}""")
    spark.stop()
  }
}
