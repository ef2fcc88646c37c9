package graft.functions

import graft.SparkTestBase
import graft.analytics.Dedup
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Property-based equivalence for the codegen'd kernels against their
  * built-in-function formulations on random inputs (fixed seeds — the
  * scalatest-scalacheck bridge isn't on the offline classpath).
  */
class ExpressionProperties extends SparkTestBase {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val tokenGen = Gen.listOfN(24, Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
    "iota", "kappa", "lam", "mu"))
  private val pairGen = Gen.zip(tokenGen, tokenGen)
  private val batch = Gen.listOfN(40, pairGen)

  test("BpeEncode kernel == exhaustive reference BPE and == the oracle's double-replace form on random words") {
    // reference implementation: per rule, loop replace-the-leftmost-pair
    // until fixpoint — the textbook exhaustive form
    def reference(word: String): Seq[String] = {
      var syms = word.map(String.valueOf(_)).toVector
      Bpe.Merges.foreach { case (x, y) =>
        var changed = true
        while (changed) {
          val i = syms.indices.dropRight(1)
            .find(i => syms(i) == x && syms(i + 1) == y)
          i match {
            case Some(j) =>
              syms = (syms.take(j) :+ (x + y)) ++ syms.drop(j + 2)
            case None => changed = false
          }
        }
      }
      syms
    }
    // the oracle's formulation: spaced string, TWO non-overlapping
    // replaces per rule (see Bpe's scaladoc)
    def doubleReplace(word: String): Seq[String] = {
      var s = " " + word.mkString(" ") + " "
      Bpe.Merges.foreach { case (x, y) =>
        s = s.replace(s" $x $y ", s" $x$y ")
        s = s.replace(s" $x $y ", s" $x$y ")
      }
      s.trim.split(" ").toSeq
    }
    def kernel(word: String): Seq[String] = {
      val arr = Bpe.encode(org.apache.spark.unsafe.types.UTF8String.fromString(word))
      (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
    }
    // fixture vocabulary: full-word merges cascade to single tokens
    assert(kernel("table") === Seq("table"))
    assert(kernel("spark window hash") === Seq("spark", "window", "hash"))
    // adjacent same-rule occurrences ("papa" — the shared-delimiter case
    // the double-replace exists for)
    for (w <- Seq("papa", "papapapa", "tata", "aaa", "rorort", "thethe")) {
      assert(kernel(w) === reference(w), s"kernel vs reference on '$w'")
      assert(doubleReplace(w) === reference(w), s"doubleReplace vs reference on '$w'")
    }
    // random lowercase words over the merge alphabet
    val gen = Gen.listOfN(12, Gen.oneOf("tablehrowkyvus cnfmpgdiw".toSeq))
      .map(_.mkString.trim)
    var seed = Seed(42L)
    (1 to 300).foreach { _ =>
      val w = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val words = w.split(" ").filter(_.nonEmpty).toSeq
      val expect = words.flatMap(reference)
      assert(kernel(w) === expect, s"kernel on '$w'")
      assert(words.flatMap(doubleReplace) === expect, s"doubleReplace on '$w'")
    }
    // uppercase folds, punctuation separates
    assert(kernel("Table, SPARK! 42 value") === Seq("table", "spark", "value"))
  }

  test("hashed merge-walk Jaccard equals string-set Jaccard on random token sets") {
    (1L to 5L).foreach { seed =>
      val rows = sample(batch, seed).map { case (a, b) => (a.mkString(" "), b.mkString(" ")) }
      val df = rows.toDF("ta", "tb")
      val out = df.select(
        NativeExpressions.jaccardSortedLong(
          Dedup.hashedShingles(col("ta"), 1), Dedup.hashedShingles(col("tb"), 1)).as("hashed"),
        (size(array_intersect(Dedup.shingles(col("ta"), 1), Dedup.shingles(col("tb"), 1))).cast("double") /
          size(array_union(Dedup.shingles(col("ta"), 1), Dedup.shingles(col("tb"), 1)))).as("strings"))
        .as[(Double, Double)].collect()
      out.foreach { case (h, s) => assert(h === s, s"seed=$seed") }
    }
  }

  test("EarlierArrayMatch equals the exists(zip_with(slice)) formulation") {
    val arrGen = Gen.listOfN(8, Gen.choose(0, 5)) // small domain → frequent matches
    val rowGen = Gen.zip(arrGen, arrGen, Gen.choose(0, 8))
    (1L to 5L).foreach { seed =>
      val rows = sample(Gen.listOfN(60, rowGen), seed)
      val df = rows.toDF("a", "b", "n")
      val out = df.select(
        NativeExpressions.earlierArrayMatch(col("a"), col("b"), col("n")).as("native"),
        coalesce(exists(zip_with(slice(col("a"), lit(1), col("n")),
          slice(col("b"), lit(1), col("n")), (x, y) => x === y), x => x), lit(false)).as("hof"))
        .as[(Boolean, Boolean)].collect()
      out.foreach { case (n, h) => assert(n === h, s"seed=$seed") }
    }
  }

  test("MinHashSig on pre-hashed longs: signature agreement tracks Jaccard") {
    // near-identical sets must agree on most signature components;
    // disjoint sets on almost none.
    val df = Seq(
      ("a b c d e f g h i j", "a b c d e f g h i j"),
      ("a b c d e f g h i j", "a b c d e f g h i k"),
      ("a b c d e", "v w x y z")
    ).toDF("ta", "tb")
    val agree = df.select(
      aggregate(zip_with(
        NativeExpressions.minHashSignature(Dedup.hashedShingles(col("ta"), 1), 64),
        NativeExpressions.minHashSignature(Dedup.hashedShingles(col("tb"), 1), 64),
        (x, y) => when(x === y, 1).otherwise(0)), lit(0), (s, x) => s + x))
      .as[Int].collect()
    assert(agree(0) === 64)              // identical sets → identical signature
    assert(agree(1) > 40 && agree(1) < 64) // j≈0.82
    assert(agree(2) < 10)                // disjoint → chance agreement only
  }
}
