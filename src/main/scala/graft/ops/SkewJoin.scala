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

  /** Inner equi-join on `on`, with `left` as the skewed side. Deterministic:
    * the salt is a hash of the full left row, not a random number. */
  def saltedInner(left: DataFrame, right: DataFrame, on: Seq[String],
      salt: Int): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(xxhash64(left.columns.toIndexedSeq.map(col): _*), lit(salt)).cast("int"))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, on :+ "__salt").drop("__salt")
  }
}
