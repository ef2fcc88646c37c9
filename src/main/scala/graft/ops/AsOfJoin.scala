package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal alignment) join: for every left row, the most recent right
  * row with `right.ts <= left.ts` within the same key — the primitive behind
  * feature/event alignment in training-data pipelines.
  *
  * Formulated as union + running `last(ignoreNulls)` window rather than a
  * range-condition theta join: one shuffle + one sort per key column set, no
  * nested-loop range probe, no build-side explosion. This is the plan shape
  * that survives 100 TB — a range join would fall back to
  * BroadcastNestedLoopJoin or a cartesian product per key.
  *
  * Right payload columns ride in ONE struct so all matched fields come from
  * the same right row (per-column `last` could mix rows when payloads hold
  * nulls). Ties (`right.ts == left.ts`) match — right rows sort before left
  * rows at equal timestamps.
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      prefix: String = "r_"): DataFrame = {
    val reserved = Seq("__ts", "__src", "__payload", "__match")
    require(!left.columns.exists(reserved.contains),
      s"left side must not contain reserved columns ${reserved.mkString(", ")}")
    val rightSel = right.select(
      (on.map(col) :+ col(rightTs).as("__ts") :+
        struct(payload.map(col): _*).as("__payload")): _*)
      .withColumn("__src", lit(0))
    val leftTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__src", lit(1))
    val all = leftTagged.unionByName(rightSel, allowMissingColumns = true)
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__ts"), col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    all.withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        payload.map(p => col(s"__match.$p").as(prefix + p)): _*)
  }

  /** Forward as-of: for every left row, the EARLIEST right row with
    * `right.ts >= left.ts` within the same key. Same union+window shape as
    * [[backward]], mirrored: at equal timestamps left rows sort before right
    * rows so ties match, and the frame looks forward. */
  def forward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      prefix: String = "r_"): DataFrame = {
    val reserved = Seq("__ts", "__src", "__payload", "__match")
    require(!left.columns.exists(reserved.contains),
      s"left side must not contain reserved columns ${reserved.mkString(", ")}")
    val rightSel = right.select(
      (on.map(col) :+ col(rightTs).as("__ts") :+
        struct(payload.map(col): _*).as("__payload")): _*)
      .withColumn("__src", lit(0))
    val leftTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__src", lit(1))
    val all = leftTagged.unionByName(rightSel, allowMissingColumns = true)
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__ts"), col("__src").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    all.withColumn("__match", first(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        payload.map(p => col(s"__match.$p").as(prefix + p)): _*)
  }
}
