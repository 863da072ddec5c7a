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

  /** Streaming dedup on key columns. On a stream, state is bounded by the
    * watermark (`dropDuplicatesWithinWatermark`): a duplicate arriving
    * within `lateness` of the original is dropped, and state for expired
    * event-times is evicted — the only dedup that survives an unbounded
    * ingest. On a batch frame it degrades to plain dropDuplicates.
    */
  def dedupStream(events: DataFrame, keys: Seq[String],
                  lateness: String = "30 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", lateness)
        .dropDuplicatesWithinWatermark(keys)
    else events.dropDuplicates(keys)
}
