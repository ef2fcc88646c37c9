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
