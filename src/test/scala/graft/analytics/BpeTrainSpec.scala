package graft.analytics

import graft.SparkTestBase
import graft.analytics.BpeTrain.Merge

/** BPE merge learning (round 11): closed-form merge sequences, the
  * deterministic tie-break, overlap-counted pairs, early exhaustion, and
  * the train/encode agreement contract (applying the learned table with
  * the shared Bpe greedy pass reproduces the trainer's final vocabulary
  * state — what shipping a learned tokenizer relies on). */
class BpeTrainSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(texts: String*) = texts.toDF("text")

  test("closed form: a single-word corpus learns the lex-tie chain and stops when merged out") {
    val (merges, state) = BpeTrain.train(docs("table table", "table"), "text", 10)
    // all four pairs tie at count 3 each round; the lexicographically
    // smallest wins: (a,b) → (ab,l) → (abl,e) → (t,able); round 5 has no
    // pairs left and training stops early
    assert(merges === Seq(
      Merge(1, "a", "b", 3), Merge(2, "ab", "l", 3),
      Merge(3, "abl", "e", 3), Merge(4, "t", "able", 3)))
    val fin = state.as[(String, Seq[String], Long)].collect()
      .map { case (w, syms, _) => w -> syms }.toMap
    assert(fin === Map("table" -> Seq("table")))
  }

  test("counts beat lex order; frequencies weight pairs; overlaps count per position") {
    // aa×2 contributes (a,a)=2; ab×1 contributes (a,b)=1 → (a,a) first
    val (m1, _) = BpeTrain.train(docs("aa aa ab"), "text", 2)
    assert(m1 === Seq(Merge(1, "a", "a", 2), Merge(2, "a", "b", 1)))
    // 'aaa' has TWO (a,a) positions; three 'ab's outvote them
    val (m2, _) = BpeTrain.train(docs("aaa ab ab ab"), "text", 1)
    assert(m2 === Seq(Merge(1, "a", "b", 3)))
    // greedy non-overlapping application: after merging (a,a), 'aaa' is
    // [aa, a] — the trailing 'a' does NOT re-merge within the same rule
    val (m3, s3) = BpeTrain.train(docs("aaa aaa"), "text", 1)
    assert(m3 === Seq(Merge(1, "a", "a", 4)))
    val syms3 = s3.as[(String, Seq[String], Long)].collect()
      .map { case (w, syms, _) => w -> syms }.toMap
    assert(syms3("aaa") === Seq("aa", "a"))
  }

  test("train/encode agreement: applying the learned merges reproduces the trainer's final state") {
    val corpus = docs(
      "the table value hash scan part spark window",
      "the the table table value merge batch line",
      "fast slow sort row key agg spark spark window value")
    val (merges, state) = BpeTrain.train(corpus, "text", 12)
    assert(merges.size === 12)
    // ranks are 1..12 with monotonically non-increasing counts? counts
    // need not be monotone (a merge can CREATE a popular pair), but ranks
    // must be sequential
    assert(merges.map(_.rank) === (1 to 12))
    val pairs = merges.map(m => (m.x, m.y))
    state.as[(String, Seq[String], Long)].collect().foreach {
      case (w, syms, _) =>
        assert(graft.functions.Bpe.applyMerges(w, pairs) === syms,
          s"train/encode disagreement on '$w'")
    }
    // the shared kernel contract: Bpe.encode ≡ applyMerges with the fixed
    // table, word by word
    val sample = "the spark table rows"
    val enc = graft.functions.Bpe.encode(
      org.apache.spark.unsafe.types.UTF8String.fromString(sample))
    val viaApply = sample.split(' ').toSeq
      .flatMap(w => graft.functions.Bpe.applyMerges(w, graft.functions.Bpe.Merges))
    assert((0 until enc.numElements()).map(i =>
      enc.getUTF8String(i).toString) === viaApply)
  }
}
