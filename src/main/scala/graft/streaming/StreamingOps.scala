package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming surface. The reference is batch-only (SURVEY
  * §2.9 — `schedule_interval=None`), so streaming is extension scope: the
  * same windowed rollup the batch engine exposes, expressed so one
  * definition serves `read` and `readStream` inputs unchanged.
  */
object StreamingOps {

  /** Tumbling-window rollup (count + sum) keyed by event_type. On a
    * streaming frame the watermark bounds state: late rows beyond
    * `lateness` are dropped and window state is evicted — the property
    * that keeps an always-on 100 TB/day ingest from accumulating
    * unbounded state.
    */
  def windowedRollup(events: DataFrame, window_ : String = "1 hour",
                     lateness: String = "30 minutes"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", lateness)
      else events
    withWm
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("v"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
                .as("hour_start"),
              col("event_type"), col("n"), col("v"))
  }
}
