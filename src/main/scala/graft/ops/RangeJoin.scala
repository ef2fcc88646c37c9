package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded (range-condition) join at scale: `left.value BETWEEN band.lo AND
  * band.hi`. Spark's native plan for that predicate is a
  * BroadcastNestedLoopJoin (acceptable only while the band table
  * broadcasts) or, unhinted, a cartesian product — both collapse at 100 TB
  * when the band table itself is large.
  *
  * The scalable form BUCKETIZES the range dimension: every band explodes
  * into the fixed-width buckets it overlaps, the probe side computes its
  * single containing bucket, and the join becomes a hash equi-join on
  * bucket id with a residual BETWEEN filter. Shuffle volume is
  * |probe| + Σ ceil(band_width / bucketWidth) — linear in both inputs,
  * hash-partitioned, AQE-skew-splittable like any equi-join. Pick
  * `bucketWidth` near the median band width: each band then explodes into
  * ~2 rows and each probe row meets only bands it could match.
  */
object RangeJoin {

  /** Inner banded join. `bands` must carry `loCol`/`hiCol` (inclusive
    * bounds); overlapping bands yield one output row per matching band. */
  def banded(probe: DataFrame, valueCol: String, bands: DataFrame,
      loCol: String, hiCol: String, bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: Column): Column = floor(c / lit(bucketWidth)).cast("long")
    val exploded = bands.withColumn("__bucket",
      explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    probe.withColumn("__bucket", bucketOf(col(valueCol)))
      .join(exploded, Seq("__bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__bucket")
  }
}
