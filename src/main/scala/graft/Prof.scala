package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Scratch profiler (round 16, dev only — not part of the driver surface):
  * times each declared query once with a job-level listener so the
  * per-statement job breakdown is visible. Usage:
  *   runMain graft.Prof <name>[,<name>...]
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ops.AnalyticsCatalog.warmGraph(spark, sfDir)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var collecting = false
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = js.stageInfos.lastOption.map(_.name).getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null && collecting)
          jobs.add((je.jobId, (System.nanoTime() - s._1) / 1e6, s._2))
      }
    })
    val execs = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        val head = qe.logical.toString.linesIterator.take(2).mkString(" | ").take(180)
        execs.add((durationNs / 1000000, s"$funcName: $head"))
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    })
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm once
      fn(spark, sfDir).count()
      execs.clear()
      jobs.clear()
      collecting = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      collecting = false
      Thread.sleep(300)
      val all = jobs.toArray(Array.empty[(Int, Double, String)]).sortBy(_._1)
      println(f"== $name wall=$wall%.2f s, jobs=${all.length}, jobMs=${all.map(_._2).sum}%.0f")
      all.groupBy(_._3).toSeq.sortBy(-_._2.map(_._2).sum).foreach { case (site, js) =>
        println(f"  ${js.length}%4d jobs ${js.map(_._2).sum}%8.1f ms  $site")
      }
      Thread.sleep(200)
      val es = execs.toArray(Array.empty[(Long, String)])
      println(f"  -- ${es.length} tracked actions, ${es.map(_._1).sum} ms total --")
      es.sortBy(-_._1).take(25).foreach { case (ms, d) =>
        println(f"  act $ms%6d ms  $d") }
    }
    spark.stop()
  }
}
