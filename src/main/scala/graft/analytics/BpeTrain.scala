package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE merge-table LEARNING (VERDICT r10 #3) — the corpus-scale half of
  * the tokenizer stack the reference declares via tiktoken
  * (/root/reference/requirements.txt:6): t25 APPLIES a fixed merges table;
  * this learns the table itself, classic Sennrich BPE made deterministic.
  *
  * Shape for 100 TB: the corpus is touched ONCE — a word-frequency
  * groupBy (map-side combined; the only corpus-sized pass). Every
  * training round then works on the VOCABULARY table (words × counts),
  * which is Zipf-bounded and orders of magnitude smaller:
  *
  *   1. pair counts = one explode + map-side-combining sum over the
  *      vocabulary's adjacent symbol pairs, weighted by word frequency;
  *   2. the argmax is one `min(struct(-cnt, x, y))` aggregate — max
  *      count, ties to the LEXICOGRAPHICALLY SMALLEST pair (classic BPE
  *      breaks ties by insertion order of a hash map, i.e.
  *      nondeterministically; a distributed engine must pin this) —
  *      collected as a single driver row per round;
  *   3. the merge applies as a greedy left-to-right non-overlapping fold
  *      over each word's symbol array (`aggregate`, the exact semantics
  *      of [[graft.functions.Bpe]]'s per-rule array pass), pinned per
  *      round through the iterCheckpoint seam so 20 rounds do not stack
  *      20 lazy plans.
  *
  * Everything is integer counts and a-z strings — no floats anywhere —
  * so the learned table hash-matches the DuckDB oracle, which unrolls
  * the same three steps per round ([[oracleSql]]).
  */
object BpeTrain {

  /** One learned merge: 1-based rank, the pair, its count at selection. */
  final case class Merge(rank: Int, x: String, y: String, count: Long)

  /** Lowercased ASCII-letter pretokenization — t25's word extraction. */
  private def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "[^a-z]+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))

  /** Learn `rounds` merges. Returns the merge table plus the final
    * vocabulary state (word, symbols, n) — the spec uses the latter to
    * prove train/encode agreement. Stops early if the vocabulary runs
    * out of adjacent pairs. */
  def train(docs: DataFrame, textCol: String, rounds: Int)
      : (Seq[Merge], DataFrame) = {
    import graft.analytics.IterCheckpoint.IterCheckpointOps
    require(rounds > 0 && rounds <= 1000,
      s"merge round budget must be in 1..1000, got $rounds")
    var words = wordFreq(docs, textCol)
      .select(col("w"),
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
          .as("syms"),
        col("n"))
      .iterCheckpoint()
    val learned = Seq.newBuilder[Merge]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      // adjacent pairs weighted by word frequency; a 1-symbol word has
      // none (guard: sequence(1, 0) would DESCEND, not return empty)
      val pairs = words
        .filter(size(col("syms")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(syms[i-1] AS x, syms[i] AS y))")).as("pr"))
        .groupBy(col("pr.x").as("x"), col("pr.y").as("y"))
        .agg(sum(col("n")).as("cnt"))
      val top = pairs
        .agg(min(struct((-col("cnt")).as("nc"), col("x"), col("y"))).as("m"))
        .select(col("m.nc"), col("m.x"), col("m.y"))
        // bounded: single row — the global top-1 merge aggregate
        .collect()
      if (top.isEmpty || top.head.isNullAt(0)) exhausted = true
      else {
        val (cnt, x, y) = (-top.head.getLong(0), top.head.getString(1),
          top.head.getString(2))
        learned += Merge(r + 1, x, y, cnt)
        // greedy left-to-right non-overlapping merge — the Bpe.encodeWord
        // pass as an array fold (corpus is a-z only; literals are safe)
        val merged = s"'${x + y}'"
        words = words.select(col("w"), expr(
          s"""aggregate(syms, cast(array() as array<string>),
             |  (acc, s) -> if(size(acc) > 0
             |      AND element_at(acc, -1) = '$x' AND s = '$y',
             |    concat(slice(acc, 1, size(acc) - 1), array($merged)),
             |    concat(acc, array(s))))""".stripMargin).as("syms"),
          col("n"))
          .iterCheckpoint()
      }
      r += 1
    }
    (learned.result(), words)
  }

  /** The DuckDB replay of [[train]], UNROLLED per round over `table`'s
    * `textCol`: spaced-symbol strings (t25's representation — two
    * replace() passes per merge ≡ the greedy array pass, see
    * [[graft.functions.Bpe]]), a self-join on adjacent positions for the
    * pair census, ORDER BY cnt DESC, x, y LIMIT 1 for the argmax. */
  def oracleSql(table: String, textCol: String, rounds: Int): String = {
    // every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and each
    // round references its predecessor three times (the pair self-join
    // plus the rewrite), so an inlined 20-round chain expands 3^20 scans
    // of the source table — materialization makes it the linear chain
    // the Spark side runs
    val w0 =
      s"""w0 AS MATERIALIZED (
         |  SELECT ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS s, n
         |  FROM (SELECT w, CAST(COUNT(*) AS BIGINT) AS n
         |        FROM (SELECT unnest(regexp_split_to_array(lower($textCol),
         |                '[^a-z]+')) AS w FROM $table) z
         |        WHERE w <> '' GROUP BY w))""".stripMargin
    val roundCtes = (0 until rounds).map { r =>
      s"""u$r AS MATERIALIZED (
         |  SELECT s, n, unnest(string_split(trim(s), ' ')) AS sym,
         |    generate_subscripts(string_split(trim(s), ' '), 1) AS i
         |  FROM w$r),
         |p$r AS (
         |  SELECT a.sym AS x, b.sym AS y, CAST(SUM(a.n) AS BIGINT) AS cnt
         |  FROM u$r a JOIN u$r b ON b.s = a.s AND b.i = a.i + 1
         |  GROUP BY a.sym, b.sym),
         |b$r AS MATERIALIZED (
         |  SELECT x, y, cnt FROM p$r ORDER BY cnt DESC, x, y LIMIT 1),
         |w${r + 1} AS MATERIALIZED (
         |  SELECT replace(replace(w.s,
         |      ' ' || b.x || ' ' || b.y || ' ', ' ' || b.x || b.y || ' '),
         |      ' ' || b.x || ' ' || b.y || ' ', ' ' || b.x || b.y || ' ') AS s,
         |    w.n
         |  FROM w$r w CROSS JOIN b$r b)""".stripMargin
    }
    val ranks = (0 until rounds).map { r =>
      s"SELECT CAST(${r + 1} AS INT) AS rank, x, y, cnt FROM b$r"
    }
    s"""WITH $w0,
       |${roundCtes.mkString(",\n")}
       |${ranks.mkString("\nUNION ALL\n")}
       |ORDER BY rank""".stripMargin
  }
}
