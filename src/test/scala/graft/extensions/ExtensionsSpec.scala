package graft.extensions

import graft.SparkTestBase
import graft.analytics.Dedup
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  test("registered SQL functions evaluate the native expressions") {
    GraftRuntime.register(spark)
    val row = spark.sql(
      """SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       jaccard_sim(array('a','b'), array('b','c')) AS j,
        |       simhash64(array('x','y')) AS s,
        |       size(minhash_sig(array('x','y'), 16)) AS m""".stripMargin).head()
    assert(row.getAs[Double]("d") === 11.0)
    assert(row.getAs[Double]("j") === 1.0 / 3.0)
    assert(row.getAs[Long]("s") !== 0L)
    assert(row.getAs[Int]("m") === 16)
  }

  test("typed centroid Aggregator is callable from SQL") {
    GraftRuntime.register(spark)
    Seq((0, Seq(1f, 2f)), (0, Seq(3f, 4f)), (1, Seq(10f, 20f)))
      .toDF("label", "vec").createOrReplaceTempView("vecs")
    val rows = spark.sql(
      "SELECT label, centroid(vec) AS c FROM vecs GROUP BY label ORDER BY label")
      .as[(Int, Seq[Double])].collect().toSeq
    assert(rows === Seq((0, Seq(2.0, 3.0)), (1, Seq(10.0, 20.0))))
  }

  test("optimizer rule rewrites the stock Jaccard idiom to JaccardSim") {
    GraftRuntime.register(spark)
    // non-foldable input (parquet scan) so the idiom survives to the
    // optimizer instead of being constant-folded away
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val t = docs.select($"doc_id", Dedup.shingles($"text", 1).as("sh"))
    val df = t.as("x").join(t.as("y"), $"x.doc_id" < $"y.doc_id")
      .select((size(array_intersect($"x.sh", $"y.sh")).cast("double") /
        size(array_union($"x.sh", $"y.sh"))).as("j"))
    assert(df.queryExecution.optimizedPlan.toString.toLowerCase.contains("jaccardsim"),
      df.queryExecution.optimizedPlan.toString)
  }

  test("rewrite preserves results on fixture shingle pairs") {
    GraftRuntime.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val t = docs.select($"doc_id", Dedup.shingles($"text", 1).as("sh"), $"source")
    val pairs = t.as("x").join(t.as("y"),
        $"x.source" === $"y.source" && $"x.doc_id" < $"y.doc_id")
      .select(
        (size(array_intersect($"x.sh", $"y.sh")).cast("double") /
          size(array_union($"x.sh", $"y.sh"))).as("stock"),
        Dedup.jaccard($"x.sh", $"y.sh").as("native"))
    assert(pairs.filter(not($"stock" === $"native")).count() === 0)
  }
}
