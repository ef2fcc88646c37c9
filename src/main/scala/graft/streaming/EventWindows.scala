package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-window aggregations over the `events` shape, written once and used
  * from BOTH batch and Structured Streaming plans (the same function applies
  * to a `readStream` DataFrame — streaming tests assert batch≡stream).
  *
  * Value sums route through DECIMAL(12,2) so results are order-independent
  * and reproduce exactly against the oracle.
  */
object EventWindows {

  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Tumbling window per event_type: count + exact value sum. */
  def tumbling(events: DataFrame, duration: String): DataFrame =
    events.groupBy(window(col("ts"), duration), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Sliding window (duration, slide) per event_type. */
  def sliding(events: DataFrame, duration: String, slide: String): DataFrame =
    events.groupBy(window(col("ts"), duration, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Session windows per user: gap-merged activity bursts. */
  def sessions(events: DataFrame, gap: String): DataFrame =
    events.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .select(col("session_window.start").as("session_start"), col("user_id"),
        col("n_events"), col("total_value"))

  /** Streaming variant with a watermark for late data — the batch functions
    * above compose on top unchanged. */
  def withLateDataBound(stream: DataFrame, delay: String): DataFrame =
    stream.withWatermark("ts", delay)
}
