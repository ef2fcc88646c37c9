package graft.analytics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines, all as
  * pure column expressions (whole-stage-codegen friendly, no UDFs): token
  * counting, quality scoring, language-ID heuristic, fingerprinting.
  *
  * Generalizes the reference's text-cleaning path (`clean_text`,
  * /root/reference/src/crwling.py:37-43) from one scrubbing function to a
  * pipeline-grade feature set.
  */
object TextAnalysis {

  /** Whitespace tokenizer (the BPE-ish regex split). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Canonical form used for fingerprinting / exact dedup. */
  def normText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Document fingerprint over the canonical form. */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** Count of tokens present in `words`. */
  def dictHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))

  val enStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  val esStopwords: Seq[String] = Seq("el", "la", "los", "de", "que", "y")
  val deStopwords: Seq[String] = Seq("der", "die", "das", "und", "ist", "ein")
  val frStopwords: Seq[String] = Seq("le", "les", "des", "et", "est", "une")

  /** Stopword-dictionary language-ID heuristic: argmax of per-language
    * stopword hits with fixed precedence en > es > de > fr on ties. */
  def langGuess(c: Column): Column = {
    val toks = tokens(c)
    val en = dictHits(toks, enStopwords)
    val es = dictHits(toks, esStopwords)
    val de = dictHits(toks, deStopwords)
    val fr = dictHits(toks, frStopwords)
    when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")
  }

  def punctCount(c: Column): Column = size(regexp_extract_all(c, lit("[.,!?;:]"), lit(0)))

  /** Composite quality score in [0,1]: stopword density + length credit +
    * punctuation-noise penalty. The formula is fixed double arithmetic so it
    * reproduces bit-exactly across engines. */
  def qualityScore(c: Column): Column = {
    val toks = tokens(c)
    val n = size(toks)
    val stopRatio = dictHits(toks, enStopwords).cast("double") / n
    val lenCredit = least(n.cast("double") / 200.0, lit(1.0))
    val punctRatio = punctCount(c).cast("double") / greatest(length(c), lit(1))
    lit(0.5) * stopRatio + lit(0.3) * lenCredit +
      lit(0.2) * (lit(1.0) - least(punctRatio * 10.0, lit(1.0)))
  }

  /** Mean token length: chars-without-whitespace / token count. */
  def avgTokenLen(c: Column): Column =
    length(regexp_replace(c, "\\s+", "")).cast("double") / tokenCount(c)

  /** Shannon entropy (bits per character) of the character distribution —
    * the perplexity-proxy quality signal (CCNet-style): low-entropy text
    * is repetitive/boilerplate, suspiciously high entropy is noise.
    * Map-only — a per-row HOF fold over the SORTED distinct character
    * list (identical left-fold order on any engine, so results are
    * cross-engine stable up to one libm log2 ulp), no shuffle, no UDF.
    * Spark evaluates HOFs as CodegenFallback (interpreted) — still
    * native ArrayData, no serialization boundary. */
  def charEntropy(c: Column): Column =
    graft.functions.NativeExpressions.charEntropy(c)

  /** Reference HOF formulation of [[charEntropy]] (equivalence spec): the
    * native kernel must reproduce this bitwise, including the ascending
    * code-point fold order and the -0.0 of degenerate input. */
  def charEntropyHof(c: Column): Column = {
    val cs = split(c, "")
    val n = size(cs).cast("double")
    val terms = transform(array_sort(array_distinct(cs)), ch => {
      val p = size(filter(cs, x => x === ch)).cast("double") / n
      p * log(2.0, p)
    })
    -aggregate(terms, lit(0.0), (a, b) => a + b)
  }

  /** PII scrub for training corpora: emails, URLs, and long digit runs
    * (phone/account-shaped) replaced by typed placeholder tokens. Patterns
    * stay in the RE2-compatible subset so the same regexes run on any
    * engine. Order matters: URLs first (they may embed @ and digits). */
  def redactPII(c: Column): Column = {
    val url = regexp_replace(c, "https?://[^\\s]+", "<URL>")
    val email = regexp_replace(url,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    regexp_replace(email, "[0-9][0-9 ()+.-]{7,}[0-9]", "<NUMBER>")
  }
}
