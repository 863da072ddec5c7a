package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key trailing-window (rolling) aggregates over an event stream —
  * the time-series staple (7-day moving average, trailing error rate)
  * expressed as a VALUE-RANGE window frame, not a row frame: the frame
  * is "every event of this key within the last N hours", so irregular
  * event spacing and timestamp ties are handled by definition (a row
  * frame of k rows silently changes meaning with event density).
  *
  * Physical shape: one shuffle keyed by the partition key, one ordered
  * scan per key group with an incrementally-maintained frame — no
  * self-join (the naive trailing join is |events|·|window| rows), no
  * global sort, per-key groups bounded. The frame orders by epoch
  * MICROS (the full timestamp precision) so engine boundaries cannot
  * disagree on membership at sub-second spacings.
  */
object TimeSeries {

  /** Trailing count + mean of `valCol` over the last `hours` hours
    * (inclusive of the current instant; ties share a frame), per key.
    * Output: input row id, key, epoch-ms instant, trail_n, trail_avg
    * (round 6; null when the frame holds only null values).
    */
  def rollingAgg(events: DataFrame, idCol: String, keyCol: String,
                 tsCol: String, valCol: String, hours: Int): DataFrame = {
    require(hours >= 1, s"hours must be >= 1, got $hours")
    val micros = hours.toLong * 3600L * 1000000L
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__us"))
      .rangeBetween(-micros, 0L)
    events
      .filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select(col(idCol), col(keyCol),
              unix_millis(col(tsCol)).as("ts_ms"),
              col(valCol).as("__v"),
              unix_micros(col(tsCol)).as("__us"))
      .withColumn("trail_n", count(col("__v")).over(w))
      .withColumn("trail_avg", round(avg(col("__v")).over(w), 6))
      .select(col(idCol), col(keyCol), col("ts_ms"), col("trail_n"),
              col("trail_avg"))
  }
}
