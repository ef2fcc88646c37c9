package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual key-salting for joins whose key distribution is too skewed for a
  * plain shuffle join even after AQE's skew-split (AQE splits oversized
  * partitions, but a SINGLE giant key still lands in one task's hash bucket
  * on the build side).
  *
  * The skewed (large) side gets a deterministic per-row salt in [0, salt);
  * the other side is replicated once per salt value, so each of the giant
  * key's rows meets a 1/salt slice of the replicated side and the key's work
  * spreads over `salt` tasks. Replication multiplies the small side by
  * `salt` — size it so (small side × salt) stays shuffle-friendly.
  */
object SkewJoin {

  /** Inner equi-join on `on`, with `left` as the skewed side. The salt is a
    * per-row round-robin over `monotonically_increasing_id()` (partition id ‖
    * row index), NOT a content hash: a hot key made of IDENTICAL duplicate
    * rows still spreads across all `salt` buckets, and no column needs to be
    * hashable (maps are fine). The salt only routes rows — join results never
    * depend on its value — so mid-join determinism of the id is irrelevant. */
  def saltedInner(left: DataFrame, right: DataFrame, on: Seq[String],
      salt: Int): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, on :+ "__salt").drop("__salt")
  }
}
