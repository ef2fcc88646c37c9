package graft.ops

import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("banded: bucketized equi-join matches brute-force BETWEEN semantics") {
    val probe = Seq((1L, 5.0), (2L, 10.0), (3L, 99.9), (4L, 250.0), (5L, -7.0))
      .toDF("id", "v")
    // overlapping bands; band 'c' overlaps 'b'; nothing covers -7
    val bands = Seq(("a", 0.0, 9.9), ("b", 10.0, 99.9), ("c", 50.0, 300.0))
      .toDF("band", "lo", "hi")
    val got = RangeJoin.banded(probe, "v", bands, "lo", "hi", bucketWidth = 25.0)
      .select($"id", $"band").as[(Long, String)].collect().toSet
    val want = Set(
      (1L, "a"),            // 5.0 in [0, 9.9]
      (2L, "b"),            // 10.0 inclusive lower bound
      (3L, "b"), (3L, "c"), // 99.9 inclusive upper bound; overlap matches both
      (4L, "c"))            // -7 matches nothing
    assert(got === want)
    // bucket width much larger than every band still yields exact results
    val wide = RangeJoin.banded(probe, "v", bands, "lo", "hi", bucketWidth = 1e6)
      .select($"id", $"band").as[(Long, String)].collect().toSet
    assert(wide === want)
    // negative values bucket correctly (floor, not truncate-toward-zero)
    val negBands = Seq(("n", -10.0, -1.0)).toDF("band", "lo", "hi")
    val neg = RangeJoin.banded(probe, "v", negBands, "lo", "hi", bucketWidth = 4.0)
      .select($"id", $"band").as[(Long, String)].collect().toSet
    assert(neg === Set((5L, "n")))
  }

  test("banded equals brute-force BETWEEN on randomized bands (fixed seeds)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genCase = for {
      values <- Gen.listOfN(40, Gen.chooseNum(-100.0, 100.0))
      nBands <- Gen.chooseNum(1, 8)
      los <- Gen.listOfN(nBands, Gen.chooseNum(-120.0, 110.0))
      widths <- Gen.listOfN(nBands, Gen.chooseNum(0.0, 60.0))
      bw <- Gen.oneOf(3.0, 17.5, 64.0, 1e5)
    } yield (values, los.zip(widths).map { case (lo, w) => (lo, lo + w) }, bw)
    (1L to 12L).foreach { seed =>
      val (values, bands, bw) = genCase(Gen.Parameters.default, Seed(seed)).get
      val probe = values.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val bandDf = bands.zipWithIndex.map { case ((lo, hi), i) =>
        (s"b$i", lo, hi) }.toDF("band", "lo", "hi")
      val got = RangeJoin.banded(probe, "v", bandDf, "lo", "hi", bw)
        .select($"id", $"band").as[(Long, String)].collect().toSet
      val want = (for {
        (v, i) <- values.zipWithIndex
        ((lo, hi), bi) <- bands.zipWithIndex
        if v >= lo && v <= hi
      } yield (i.toLong, s"b$bi")).toSet
      assert(got === want, s"seed $seed (bucketWidth $bw)")
    }
  }

  test("modularity: perfect partition of two cliques scores higher than a merge") {
    import graft.analytics.GraphAlgorithms
    // two triangles; perfect communities {1,2,3} {4,5,6}
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
      .toDF("src", "dst")
    val perfect = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "y"), (5L, "y"), (6L, "y"))
      .toDF("node", "community")
    val merged = perfect.withColumn("community", org.apache.spark.sql.functions.lit("z"))
    val qP = GraphAlgorithms.modularity(edges, perfect).collect().head
    val qM = GraphAlgorithms.modularity(edges, merged).collect().head
    // Q = 2 * (3/6 - (6/12)^2) = 0.5 for the perfect split; 0 for one blob
    assert(qP.getDouble(0) === 0.5 && qP.getLong(1) === 2L && qP.getLong(2) === 6L)
    assert(qM.getDouble(0) === 0.0 && qM.getLong(1) === 1L)
  }
}
