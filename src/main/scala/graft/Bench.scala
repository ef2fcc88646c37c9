package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Populate the shared document-graph store outside the timed loop —
    // graph queries measure query cost, not store load; i03 times the upsert.
    graft.ops.AnalyticsCatalog.warmGraph(spark, sfDir)
    // The previous run's per-query times, for the regression guard below.
    // bench.json holds the LATEST completed run (bench_prev.json is rotated
    // to two-runs-ago at write time), so it must be the preferred base —
    // preferring bench_prev compared each run against its grandparent,
    // which manufactured a stale-prev false regression in round 10 (t26
    // flagged 8.8x against an anomalous two-generations-old 0.18 s row
    // that the intervening round-close artifact had already superseded at
    // 1.75 s).
    val prevPath = java.nio.file.Paths.get("target", "bench_prev.json")
    val outPath = java.nio.file.Paths.get("target", "bench.json")
    val prev: Map[String, Double] =
      if (java.nio.file.Files.exists(outPath)) parseQueryTimes(outPath)
      else if (java.nio.file.Files.exists(prevPath)) parseQueryTimes(prevPath)
      else Map.empty
    // Optional args (dev only; the driver passes none): comma-separated
    // query names — time only those, print, and DON'T touch the artifacts.
    val only: Option[Set[String]] = args.headOption.map(_.split(',').toSet)
    // min of two runs per query: steady-state cost, not first-run JIT/IO noise.
    // A query that throws is recorded as an ERROR, not a (meaningless)
    // time-to-exception — round 5 closed "faster than ever" because 11 broken
    // streaming queries posted their 0.04 s crash latency as wins. Errors go
    // in the artifact, count as regressions, and fail the run.
    val timed = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => only.forall(_.contains(kv._1)))
      .map { case (name, fn) =>
        timeOne(name, () => fn(spark, sfDir).count(),
          warmups = warmupsFor(name), timed = timedRunsFor(name)) }
    val results = timed.collect { case (n, t, None) => n -> t }
    val errors = timed.collect { case (n, _, Some(msg)) => n -> msg }
    if (only.isDefined) {
      results.foreach { case (n, t) => println(f"$n $t%.2f s") }
      errors.foreach { case (n, msg) => println(s"$n ERROR $msg") }
      spark.stop()
      if (errors.nonEmpty) sys.exit(1)
      return
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // Per-query regression guard: any query >=2x slower than the previous
    // recorded run AND past the noise floor is listed in the artifact —
    // the same keep-the-record-honest role the driver artifact plays for
    // correctness counts. Empty array = clean round.
    val noiseFloorSec = 0.5
    val (slowed, noise) = adjudicateBreaches(results, prev, noiseFloorSec,
      name => timeOne(name, () => SparkEntry.queries(name)(spark, sfDir).count())._2)
    // error→anything IS a regression: a query that ran before (or is declared
    // at all) and now throws must redden the record, same as a 2x slowdown.
    val broke = errors.map { case (name, msg) =>
      val p = prev.getOrElse(name, -1.0)
      f"""{"query":"$name","prev":$p%.3f,"now":"ERROR","ratio":null}"""
    }
    val regressions = slowed ++ broke
    val errJson = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "}")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""errors":$errJson,"regressions":[${regressions.mkString(",")}],""" +
      s""""noise":[${noise.mkString(",")}],"sf":"$sfDir"}"""
    // Durable artifact FIRST (VERDICT r13 #8): the full JSON line is ~9 KB
    // with 270+ queries, so any fixed-size stdout tail capture truncates it
    // mid-object ("parsed": null in BENCH_r13.json). Write target/bench.json
    // before any printing, emit the full line, then END stdout with a
    // compact self-contained summary line (slowest-5 only) that fits well
    // inside a 2000-byte tail — whichever line a harness grabs, it parses.
    java.nio.file.Files.createDirectories(outPath.getParent)
    if (java.nio.file.Files.exists(outPath))
      java.nio.file.Files.copy(outPath, prevPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    java.nio.file.Files.write(outPath, (json + "\n").getBytes("UTF-8"))
    println(json)
    if (errors.nonEmpty)
      System.err.println(s"[bench] ${errors.size} quer(ies) ERRORED — see the " +
        "errors object in target/bench.json; run exits nonzero")
    if (slowed.nonEmpty)
      System.err.println(s"[bench] ${slowed.size} quer(ies) regressed >=2x " +
        "vs target/bench_prev.json AND survived isolation re-timing — see the " +
        "regressions array in target/bench.json")
    if (noise.nonEmpty)
      System.err.println(s"[bench] ${noise.size} sweep breach(es) did NOT " +
        "survive isolation re-timing — recorded as noise, not regressions")
    // the LAST stdout line: compact, parseable, < 1 KB — the full map
    // lives in target/bench.json (written above, before any stdout)
    val slowest = results.sortBy(-_._2).take(5)
      .map { case (k, v) => f""""$k":$v%.2f""" }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""queries":$slowest,"n_queries":${results.size},""" +
      s""""n_errors":${errors.size},"n_regressions":${regressions.size},""" +
      s""""full":"target/bench.json","sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }

  /** Self-adjudicating sweep-breach guard (round 7): a >=2x breach measured
    * inside the full same-JVM sweep can be GC/cache interference from the
    * queries that ran before it — round 6's artifact flagged two such false
    * regressions (q57 4.94x swept vs 0.72 s isolated; x10 2.90x vs 1.62 s)
    * and each cost a manual re-time to adjudicate. So: every sweep breach is
    * re-timed in ISOLATION (via `isolate` — a fresh timing loop at the end
    * of the run, same JVM) before it may enter the record. Only a breach
    * that still holds on the isolated number is a regression; the rest land
    * in `noise` with all three numbers so the artifact self-explains.
    * Returns (regressions, noise) as JSON object strings. */
  def adjudicateBreaches(results: Seq[(String, Double)],
      prev: Map[String, Double], noiseFloorSec: Double,
      isolate: String => Double): (Seq[String], Seq[String]) = {
    def breach(p: Double, t: Double): Boolean =
      p > 0 && t >= 2.0 * p && t > noiseFloorSec
    val swept = results.filter { case (name, t) =>
      prev.get(name).exists(breach(_, t)) }
    val adj = swept.map { case (name, t) => (name, t, isolate(name)) }
    val (real, interference) = adj.partition { case (name, _, iso) =>
      breach(prev(name), iso) }
    (real.map { case (n, s, iso) =>
      f"""{"query":"$n","prev":${prev(n)}%.3f,"swept":$s%.3f,"now":$iso%.3f,"ratio":${iso / prev(n)}%.2f}""" },
     interference.map { case (n, s, iso) =>
      f"""{"query":"$n","prev":${prev(n)}%.3f,"swept":$s%.3f,"isolated":$iso%.3f}""" })
  }

  /** The GraphX-backed x-family rows drifted 1.3–1.5x across r8/r9 with no
    * code change on their paths (VERDICT r9 #7): their first execution pays
    * Pregel JIT + RDD materialization, and the per-run scheduler noise on
    * this VM is wide enough that even min-of-2 wobbles. They get one
    * discarded warm-up + min-of-THREE timed runs (measured r10: warm-up +
    * min-of-2 still left x02 at a 1.53x same-code spread; the extra timed
    * sample tightens the min). Everything else keeps the plain min-of-2 —
    * extra runs on all 240+ rows would multiply the sweep's wall for rows
    * that were already stable. */
  def warmupsFor(name: String): Int = if (name.startsWith("x")) 1 else 0
  def timedRunsFor(name: String): Int = if (name.startsWith("x")) 3 else 2

  /** Run one query `timed` times (min = steady-state cost) after `warmups`
    * discarded executions; an exception on any run yields `Some(message)` in
    * the third slot and the query is recorded as an error, never as a
    * time — a crash latency is not a result. */
  def timeOne(name: String, run: () => Long,
      warmups: Int = 0, timed: Int = 2): (String, Double, Option[String]) = {
    val runs = (1 to (warmups + timed)).map { _ =>
      val t0 = System.nanoTime()
      val err = try { run(); None } catch {
        case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")
            .linesIterator.take(1).mkString.take(160)}")
      }
      ((System.nanoTime() - t0) / 1e9, err)
    }
    // an error on ANY run (warm-up included) reddens the record; only the
    // post-warm-up runs are timed
    (name, runs.drop(warmups).map(_._1).min, runs.flatMap(_._2).headOption)
  }

  /** Minimal extraction of the `"queries":{...}` object from a prior bench
    * artifact — flat `"name":seconds` pairs, no nested objects. */
  private def parseQueryTimes(p: java.nio.file.Path): Map[String, Double] = {
    val s = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val at = s.indexOf("\"queries\":{")
    if (at < 0) return Map.empty
    val body = s.substring(at + 11, s.indexOf('}', at))
    val entry = """"([^"]+)":([0-9.Ee+-]+)""".r
    entry.findAllMatchIn(body).map(m => m.group(1) -> m.group(2).toDouble).toMap
  }
}
