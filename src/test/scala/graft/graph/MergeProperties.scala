package graft.graph

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Property-based MERGE algebra (SURVEY.md §5.3): idempotence, batch-order
  * commutativity of node creation, and cleaning-expression equivalence to a
  * model implementation. Uses raw ScalaCheck generators with fixed seeds
  * (deterministic; the scalatest-scalacheck bridge isn't on the offline
  * classpath).
  */
class MergeProperties extends SparkTestBase {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val nodeGen = for {
    label <- Gen.oneOf("Article", "Publisher", "User", "Tech")
    key <- Gen.alphaNumStr.map(s => "k" + s.take(7))
    props <- Gen.mapOf(Gen.zip(
      Gen.oneOf("title", "content", "lang"), Gen.alphaNumStr.map(_.take(12))))
  } yield (label, key, props)

  private val batchGen = Gen.listOfN(12, nodeGen)

  private val edgeGen = for {
    src <- Gen.choose(1, 6).map(i => s"u$i")
    dst <- Gen.choose(1, 6).map(i => s"t$i")
    lvl <- Gen.oneOf("low", "mid", "high")
  } yield ("User", src, "INTERESTED_IN", "Tech", dst, Map("level" -> lvl))

  private val edgeBatchGen = Gen.listOfN(15, edgeGen)

  test("mergeEdges with props is idempotent and batch-order independent") {
    (1L to 5L).foreach { seed =>
      val batch = sample(edgeBatchGen, seed)
      val df = batch.toDF("srcLabel", "srcKey", "relType", "dstLabel", "dstKey", "props")
      val g1 = PropertyGraph.empty(spark).mergeEdgesByKey(df)
      val g2 = g1.mergeEdgesByKey(df)
      // idempotent: second merge changes nothing, including the prop bags
      def canon(g: PropertyGraph) = g.edges
        .select(col("srcId"), col("dstId"), col("relType"),
          to_json(map_entries(col("props"))).as("p"))
        .orderBy("srcId", "dstId", "relType").collect().toSeq
      assert(canon(g2) === canon(g1), s"seed=$seed")
      // batch order never changes the merged edge set (dedup tie-break is
      // canonical, not positional)
      val shuffled = scala.util.Random.javaRandomToRandom(
        new java.util.Random(seed)).shuffle(batch)
      val g3 = PropertyGraph.empty(spark).mergeEdgesByKey(
        shuffled.toDF("srcLabel", "srcKey", "relType", "dstLabel", "dstKey", "props"))
      assert(canon(g3) === canon(g1), s"seed=$seed (order dependence)")
    }
  }

  test("mergeNodes is idempotent: merge(merge(g, b), b) == merge(g, b)") {
    (1L to 5L).foreach { seed =>
      val batch = sample(batchGen, seed)
      val df = batch.toDF("label", "key", "props")
      val g1 = PropertyGraph.empty(spark).mergeNodes(df)
      val g2 = g1.mergeNodes(df)
      assert(g2.nodes.count() === g1.nodes.count(), s"seed=$seed")
      val a = g1.nodes.orderBy("id").select("id", "label", "key").collect().toSeq
      val b = g2.nodes.orderBy("id").select("id", "label", "key").collect().toSeq
      assert(a === b, s"seed=$seed")
    }
  }

  test("node-set after merging two batches is order-independent") {
    (10L to 14L).foreach { seed =>
      val d1 = sample(batchGen, seed).toDF("label", "key", "props")
      val d2 = sample(batchGen, seed + 100).toDF("label", "key", "props")
      val ab = PropertyGraph.empty(spark).mergeNodes(d1).mergeNodes(d2)
      val ba = PropertyGraph.empty(spark).mergeNodes(d2).mergeNodes(d1)
      val idsAb = ab.nodes.select("id").as[Long].collect().sorted.toSeq
      val idsBa = ba.nodes.select("id").as[Long].collect().sorted.toSeq
      assert(idsAb === idsBa, s"seed=$seed") // identity set commutes
    }
  }

  test("cleanText column expression equals the model implementation") {
    def model(s: String): String =
      s.replaceAll("<[^>]*>", "").replaceAll("[\\n\\t\\r]", " ")
        .replace("​", "").trim
    val dirtyGen = Gen.listOfN(20, Gen.oneOf(
      Gen.alphaNumStr,
      Gen.const("<b>tag</b>"), Gen.const("a\tb\nc\rd"),
      Gen.const("z​w"), Gen.const("  pad  "),
      Gen.const("<div class='x'>nested <i>tags</i></div>")))
      .map(_.mkString(" "))
    (20L to 29L).foreach { seed =>
      val s = sample(dirtyGen, seed)
      val got = Seq(s).toDF("t")
        .select(graft.ingest.TextClean.cleanText($"t")).as[String].head()
      assert(got === model(s), s"seed=$seed input=$s")
    }
  }
}
