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

  /** Two-level windowed reaggregation: fine-grain partial windows
    * re-windowed to a coarser grain through `window_time()` — the chained
    * stateful-aggregation shape Structured Streaming executes natively
    * (each level keeps its own state, keyed by its window; the fine level
    * emits on watermark close and feeds the coarse level's event time).
    * At scale this is the pre-aggregation ladder: the coarse shuffle sees
    * one row per (fine window × key), not one per event. The coarse
    * re-sum routes back through DECIMAL so accumulation order still
    * cannot matter. */
  def twoLevel(events: DataFrame, fine: String, coarse: String): DataFrame = {
    val fineAgg = events
      .groupBy(window(col("ts"), fine), col("event_type"))
      .agg(count(lit(1)).as("n_fine_events"),
        sum(dec(col("value"))).cast("double").as("fine_value"))
    fineAgg
      .groupBy(window(window_time(col("window")), coarse), col("event_type"))
      .agg(sum(col("n_fine_events")).as("n_events"),
        sum(dec(col("fine_value"))).cast("double").as("total_value"),
        count(lit(1)).as("n_fine_windows"),
        max(col("n_fine_events")).as("peak_fine_events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"), col("n_fine_windows"),
        col("peak_fine_events"))
  }

  /** Streaming variant with a watermark for late data — the batch functions
    * above compose on top unchanged. */
  def withLateDataBound(stream: DataFrame, delay: String): DataFrame =
    stream.withWatermark("ts", delay)
}
