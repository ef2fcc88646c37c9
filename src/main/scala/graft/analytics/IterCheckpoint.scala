package graft.analytics

import org.apache.spark.sql.DataFrame

/** Iteration-boundary lineage truncation for the iterative algorithms
  * (VERDICT r8 #4).
  *
  * Default mode is the eager `localCheckpoint` the algorithms always used:
  * blocks live in executor storage with TRUNCATED lineage — fastest, and
  * fine on local mode. On a real cluster, though, a lost executor holding
  * the only copy of iteration state kills the whole job mid-iteration
  * (there is no lineage left to recompute from). Opting in with
  *
  * {{{
  *   spark.sparkContext.setCheckpointDir("hdfs://.../checkpoints")
  *   spark.conf.set("spark.graft.iterCheckpoint", "reliable")
  * }}}
  *
  * routes the SAME boundaries through reliable `checkpoint()` — blocks in
  * the fault-tolerant store, so iteration state survives executor loss.
  * Results are identical in both modes (spec-pinned: LPA and CC rerun
  * under `reliable` must match the default bit-for-bit); the trade is
  * write latency per iteration against mid-job fault tolerance, which is
  * the right default to expose rather than decide globally.
  */
object IterCheckpoint {
  val ModeKey = "spark.graft.iterCheckpoint"

  implicit class IterCheckpointOps(private val df: DataFrame) extends AnyVal {
    /** Truncate lineage at an iteration boundary, honoring [[ModeKey]]. */
    def iterCheckpoint(): DataFrame = {
      val spark = df.sparkSession
      if (spark.conf.get(ModeKey, "local") == "reliable") {
        require(spark.sparkContext.getCheckpointDir.isDefined,
          s"$ModeKey=reliable requires spark.sparkContext.setCheckpointDir " +
            "(a fault-tolerant location the blocks outlive executors in)")
        df.checkpoint(true)
      } else df.localCheckpoint(true)
    }
  }
}
