package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (round 16): dump `.explain("formatted")` for declared queries
  * to files — the before/after plan evidence the optimization rounds
  * commit under plans/rNN/. Usage:
  *
  *   runMain graft.PlanDump <outDir> <suffix> <name>[,<name>...]
  *
  * writes <outDir>/<name>_<suffix>.txt for each declared query name.
  * Uses the same session shape as Bench (local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions = cpus) so plans match what the bench executes.
  * The dataframe is built but NOT executed (explain is plan-time only) —
  * entries whose builder itself runs jobs (writes, collects) still pay
  * those, which is unavoidable: the plan of interest is the final one. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <names,comma-separated>")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args(2).split(',').toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ops.AnalyticsCatalog.warmGraph(spark, sfDir)
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandump] wrote ${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
