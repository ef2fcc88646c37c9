package graft.functions

import graft.SparkTestBase
import graft.analytics.Dedup
import org.apache.spark.sql.functions._

/** Native expressions must be bitwise-equal to their HOF/built-in reference
  * formulations — that equivalence is what keeps the oracle hash-matches
  * valid after the codegen swap. */
class NativeExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  test("DotProduct == HOF aggregate(zip_with) bitwise on fixture embeddings") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val a = emb.select($"vec_id", $"embedding")
    val pairs = a.as("x").join(a.as("y"), $"x.vec_id" < $"y.vec_id")
      .limit(2000)
      .select(
        VectorFunctions.dot($"x.embedding", $"y.embedding").as("native"),
        VectorFunctions.dotHof($"x.embedding", $"y.embedding").as("hof"))
    val diff = pairs.filter(not($"native" === $"hof")).count()
    assert(diff === 0)
  }

  test("NfcNormalize: folds decomposed sequences, identity on NFC text, equals JDK normalizer") {
    val cases = Seq(
      "plain ascii stays put",
      "cafe\u0301",            // e + combining acute, decomposed
      "caf\u00e9",             // already composed
      "A\u030angstro\u0308m", // A + ring, o + diaeresis via combining marks
      "d\u0307\u0323",        // dot-above then dot-below: canonical reorder
      "\ud55c\uad6d\uc5b4", // precomposed Hangul untouched
      "")
    val df = cases.toDF("s")
      .select(col("s"), NativeExpressions.nfcNormalize(col("s")).as("n"))
    val got = df.collect().map(r => (r.getString(0), r.getString(1)))
    got.foreach { case (str, n) =>
      assert(n === java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC),
        s"mismatch for ${str.codePoints().toArray.mkString(",")}")
    }
    // the decomposed and composed spellings converge to the same bytes —
    // the property dedup hashing relies on
    assert(got(1)._2 === got(2)._2 && got(1)._2 === "caf\u00e9")
    // identity on already-normalized text (no silent rewrites)
    assert(got(0)._2 === got(0)._1 && got(5)._2 === got(5)._1)
  }

  test("BloomMightContainLong: no false negatives; prefiltered pipeline is exact") {
    val members = (1L to 500L).map(_ * 7919L)
    val bloom = members.toDF("h").stat.bloomFilter("h", members.size.toLong, 0.01)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos); bos.toByteArray
    }
    val probe = ((1L to 500L).map(_ * 7919L) ++ (1L to 2000L).map(_ * 104729L + 13L))
      .toDF("h")
    // every member passes — bloom's one-sided guarantee
    val dropped = probe.filter($"h".isin(members: _*))
      .filter(not(NativeExpressions.bloomMightContainLong($"h", bytes)))
      .count()
    assert(dropped === 0)
    // bloom-prefilter + exact verify == plain exact semi-join (the d22 shape)
    val memDf = members.toDF("m")
    val exact = probe.join(memDf, $"h" === $"m", "left_semi")
      .as[Long].collect().sorted.toSeq
    val prefiltered = probe
      .filter(NativeExpressions.bloomMightContainLong($"h", bytes))
      .join(memDf, $"h" === $"m", "left_semi")
      .as[Long].collect().sorted.toSeq
    assert(prefiltered === exact)
    // and the prefilter actually prunes: most non-members die map-side
    val passed = probe.filter(NativeExpressions.bloomMightContainLong($"h", bytes)).count()
    assert(passed < 700) // 500 members + ~1% of 2000 non-members
  }

  test("DotProduct codegen and interpreted paths agree") {
    val df = Seq((Array(1.5f, -2.25f, 3f), Array(0.5f, 4f, -1f)))
      .toDF("a", "b")
      .select(VectorFunctions.dot($"a", $"b").as("d"))
    // 1.5*0.5 + (-2.25*4) + (3*-1) = 0.75 - 9 - 3 = -11.25
    assert(df.as[Double].head() === -11.25)
  }

  test("PortableLshBuckets kernel == compositional per-plane dot formulation bitwise") {
    // the fused kernel must reproduce the tables×nBits literal-dot
    // formulation exactly — float AND double inputs, at the d15 (8×4) and
    // d19 (8×12) geometries — or every LSH oracle hash-match silently breaks
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    for ((tables, nBits) <- Seq((8, 4), (8, 12), (3, 7))) {
      val f = emb.select(
        graft.analytics.Similarity
          .portableLshBucketArray($"embedding", tables, nBits, 64).as("native"),
        graft.analytics.Similarity
          .portableLshBucketArrayComposed($"embedding", tables, nBits, 64).as("composed"))
      assert(f.filter(not($"native" === $"composed")).count() === 0,
        s"geometry ${tables}x$nBits diverged on float input")
      val d = emb.select($"embedding".cast("array<double>").as("e"))
        .select(
          graft.analytics.Similarity
            .portableLshBucketArray($"e", tables, nBits, 64).as("native"),
          graft.analytics.Similarity
            .portableLshBucketArrayComposed($"e", tables, nBits, 64).as("composed"))
      assert(d.filter(not($"native" === $"composed")).count() === 0,
        s"geometry ${tables}x$nBits diverged on double input")
    }
  }

  test("PqCodes/PqDtab kernels == compositional literal-dot formulation bitwise") {
    import org.apache.spark.sql.Column
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val m = 8; val dsub = 8
    // the v10 codebook policy: sub-vectors of the first 16 corpus vectors
    val sample = emb.orderBy($"vec_id").limit(16)
      .select($"embedding".cast("array<double>")).as[Seq[Double]].collect()
    val cen = Array.tabulate(m)(s =>
      sample.map(v => v.slice(s * dsub, (s + 1) * dsub).toArray))
    val cc = Array.tabulate(m)(s => sample.map { v =>
      val sub = v.slice(s * dsub, (s + 1) * dsub); sub.map(x => x * x).sum })
    def composedCodes(e: Column): Column = array((0 until m).map { s =>
      val sub = slice(e, s * dsub + 1, dsub)
      array_min(array(cen(s).indices.map { c =>
        struct((lit(cc(s)(c)) - lit(2.0) *
          VectorFunctions.dot(sub, typedlit(cen(s)(c).toSeq))).as("d"),
          lit(c).as("c"))
      }: _*)).getField("c")
    }: _*)
    def composedDtab(e: Column): Column = array((0 until m).map { s =>
      val sub = slice(e, s * dsub + 1, dsub)
      array(cen(s).indices.map { c =>
        lit(cc(s)(c)) - lit(2.0) * VectorFunctions.dot(sub, typedlit(cen(s)(c).toSeq))
      }: _*)
    }: _*)
    val d = emb.select($"embedding".cast("array<double>").as("e"))
      .select(
        NativeExpressions.pqCodes($"e", cen, cc).as("kc"),
        composedCodes($"e").as("cmpc"),
        NativeExpressions.pqDtab($"e", cen, cc).as("kd"),
        composedDtab($"e").as("cmpd"))
    assert(d.filter(not($"kc" === $"cmpc") || not($"kd" === $"cmpd")).count() === 0)
    // float input path too (the corpus columns are array<float>)
    val f = emb.select(
      NativeExpressions.pqCodes($"embedding", cen, cc).as("kc"),
      composedCodes($"embedding".cast("array<double>")).as("cmpc"))
    assert(f.filter(not($"kc" === $"cmpc")).count() === 0)
  }

  test("JaccardSim == size(intersect)/size(union) on fixture shingles") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val t = docs.select($"doc_id", Dedup.shingles($"text", 1).as("sh"), $"source")
    val pairs = t.as("x").join(t.as("y"),
        $"x.source" === $"y.source" && $"x.doc_id" < $"y.doc_id")
      .select(
        Dedup.jaccard($"x.sh", $"y.sh").as("native"),
        Dedup.jaccardHof($"x.sh", $"y.sh").as("ref"))
    assert(pairs.filter(not($"native" === $"ref")).count() === 0)
  }

  test("JaccardSim handles duplicates and disjoint sets") {
    val df = Seq(
      (Seq("a", "b", "b", "c"), Seq("b", "c", "d")),  // inter {b,c}=2, union {a,b,c,d}=4
      (Seq("x"), Seq("y"))
    ).toDF("a", "b").select(Dedup.jaccard($"a", $"b").as("j"))
    assert(df.as[Double].collect().toSeq === Seq(0.5, 0.0))
  }

  // Adversarial strings for the text kernels: empty, all-space, unicode
  // (incl. a non-BMP code point that must count as ONE symbol), interior
  // tabs/newlines that trim() must NOT strip, repeated tokens, < n tokens.
  private val trickyTexts = Seq(
    "", " ", "   ", "a", "aا", "héllo wörld", "x🙂y",
    "a b", "a b c", "a b c d e", "a  b\tc\nd", " a b ", "a b\n",
    "\ta b", "same same same same", "the quick brown fox", "a.b,c!d",
    "ab " * 50, "tail of document with many words " * 8)

  test("CharEntropy == HOF formulation bitwise on fixture docs + tricky strings") {
    import graft.analytics.TextAnalysis
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(substring($"text", 1, 120).as("t"))
      .union(trickyTexts.toDF("t"))
    val cmp = docs.select(
      TextAnalysis.charEntropy($"t").as("native"),
      TextAnalysis.charEntropyHof($"t").as("hof"))
      .as[(Double, Double)].collect()
    // raw-bits comparison — catches 0.0 vs -0.0 and NaN payloads, the
    // cases <=> cannot see
    val diff = cmp.count { case (n, h) =>
      java.lang.Double.doubleToRawLongBits(n) !=
        java.lang.Double.doubleToRawLongBits(h) }
    assert(diff === 0)
  }

  test("WordShingles == HOF formulation exactly (order included) for n=1,2,3") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"text".as("t"))
      .union(trickyTexts.toDF("t"))
    for (n <- Seq(1, 2, 3)) {
      val cmp = docs.select(
        Dedup.shingles($"t", n).as("native"),
        Dedup.shinglesHof($"t", n).as("hof"))
      val diff = cmp.filter(not($"native" <=> $"hof")).count()
      assert(diff === 0, s"shingle width $n diverged from HOF reference")
    }
  }

  test("Md5Base60Array == conv(substring(md5)) column formulation, both mod paths") {
    import graft.analytics.{Dedup, TextAnalysis}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"text".as("t"))
      .union(trickyTexts.toDF("t"))
    val toks = TextAnalysis.tokens($"t")
    val P = graft.functions.PortableHashFamily.P
    val cmp = docs.select(
      graft.functions.NativeExpressions
        .md5Base60Array(toks, modP = true).as("native_p"),
      transform(toks, s => Dedup.md5Base60(s) % P).as("hof_p"),
      graft.functions.NativeExpressions.md5Base60Array(toks, modP = false).as("native_raw"),
      transform(toks, s => Dedup.md5Base60(s)).as("hof_raw"))
    assert(cmp.filter(not($"native_p" <=> $"hof_p") ||
      not($"native_raw" <=> $"hof_raw")).count() === 0)
  }

  test("MinHashAffine Barrett reduction equals plain % across the input domain") {
    val P = graft.functions.PortableHashFamily.P
    val rnd = new scala.util.Random(42)
    val edge = Seq(0L, 1L, P - 1, P - 2)
    val xs = (edge ++ Seq.fill(5000)(rnd.nextLong(P))).toArray
    val k = 64
    val df = Seq(Tuple1(xs)).toDF("sh")
      .select(graft.functions.NativeExpressions.minHashAffine($"sh", k).as("sig"))
    val sig = df.as[Seq[Long]].head()
    val expected = (0 until k).map { j =>
      val a = graft.functions.PortableHashFamily.a(j)
      val b = graft.functions.PortableHashFamily.b(j)
      xs.map(x => (a * x + b) % P).min
    }
    assert(sig === expected)
  }

  test("t17/t18 text kernels run inside whole-stage codegen") {
    import graft.analytics.TextAnalysis
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = docs.select(TextAnalysis.charEntropy($"text").as("h"),
      Dedup.shingles($"text", 3).as("sh"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), p) // WholeStageCodegen marker — no fallback
  }

  test("portable dedup kernels (md5-60 / minhash / simhash) codegen, no fallback") {
    import graft.analytics.{Dedup, TextAnalysis}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = docs.select(
      graft.functions.NativeExpressions.minHashAffine(
        Dedup.portableHashedShingles($"text", 1), 64).as("sig"),
      graft.functions.NativeExpressions.simHashBits(
        graft.functions.NativeExpressions.md5Base60Array(
          TextAnalysis.tokens($"text"), modP = false), 48).as("sim"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), p)
  }
}
