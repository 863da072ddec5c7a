package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HllExpressions.{hllAgg, hllCount, hllMerge}

/** Persistable-sketch operators: turn "distinct over an ever-growing
  * history" from a rescan problem into a merge problem.
  *
  * The day-2 shape (mirrors `appendIndex` / `incrementalRefresh`): each
  * batch folds to a few 2^p-byte HLL rows; the SKETCH TABLE is what
  * persists. Any later question that is a union of already-sketched
  * slices — users to date, rolling 7-day actives, cross-segment
  * overlap ceilings — is answered by merging kilobytes, never by
  * rescanning the 100 TB event history. Register-wise max is exactly
  * the union sketch, so incremental ≡ one-shot bit-for-bit (HllSpec
  * pins it).
  */
object SketchOps {

  /** Per-(day, key) HLL sketch table: the persistable unit. One
    * map-side-combined aggregate over the batch; output is |days| rows
    * of 2^p bytes. xxhash64 (not an oracle coin — sketches have no SQL
    * twin anyway) feeds the registers the 64-bit uniform hash HLL
    * assumes.
    */
  def dailySketches(events: DataFrame, keyCol: String = "user_id",
                    tsCol: String = "ts", p: Int = 12): DataFrame =
    events
      // a NULL key is no observation (the approx_count_distinct rule) —
      // and xxhash64(NULL) is a seed constant, not NULL, so filter
      // BEFORE hashing or every null row would count as one phantom key
      .filter(col(keyCol).isNotNull)
      .select(to_date(col(tsCol)).as("day"), xxhash64(col(keyCol)).as("__h"))
      .groupBy(col("day"))
      .agg(hllAgg(col("__h"), p).as("sketch"))

  /** Distinct-count timeline from the sketch table ALONE: per-day
    * actives plus running to-date distinct via a cumulative register
    * merge. The unpartitioned window is safe by construction — its
    * frame is the |days|-row sketch table, not the event history.
    */
  def distinctTimeline(sketches: DataFrame, p: Int = 12): DataFrame = {
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sketches
      .select(col("day"),
              hllCount(col("sketch"), p).as("daily_users"),
              hllCount(hllMerge(col("sketch"), p).over(w), p)
                .as("users_to_date"))
  }

  /** Merge a set of sketch rows to one union estimate (e.g. a rolling
    * window or an ad-hoc slice union): one scalar from kilobytes.
    */
  def unionEstimate(sketches: DataFrame, p: Int = 12): DataFrame =
    sketches.agg(hllCount(hllMerge(col("sketch"), p), p).as("distinct_est"))

  /** Day-2 maintenance: fold a new batch of events into the PERSISTED
    * daily sketch table at `path`. Days already present MERGE by
    * register max — so late-arriving events extend their day and
    * re-delivered batches are exact no-ops (at-least-once ingestion
    * needs no dedup ledger; union can never double-count) — and new
    * days insert. Every stage is bounded by batch volume: only the
    * batch is aggregated, only the affected days' existing rows are
    * read back (a handful of KB rows), and the crash-safe
    * [[graft.io.Sinks.mergeByKey]] swap rewrites the kilobyte-scale
    * sketch table, never the event history. Incremental ≡ one-shot
    * bit-for-bit (HllSpec pins it).
    */
  def appendDailySketches(spark: org.apache.spark.sql.SparkSession,
                          path: String, batch: DataFrame,
                          keyCol: String = "user_id",
                          tsCol: String = "ts", p: Int = 12): Unit = {
    val fresh = dailySketches(batch, keyCol, tsCol, p)
    val merged = scala.util.Try(spark.read.parquet(path)) match {
      case scala.util.Failure(_) => fresh // bootstrap: no standing table
      case scala.util.Success(standing) =>
        // affected days only: a tiny driver-side list, folded as isin
        // (partition-prunable if the sketch table is day-partitioned)
        val days = fresh.select(col("day")).collect().map(_.getDate(0))
        standing.filter(col("day").isin(days.toIndexedSeq: _*))
          .unionByName(fresh)
          .groupBy(col("day"))
          .agg(hllMerge(col("sketch"), p).as("sketch"))
    }
    graft.io.Sinks.mergeByKey(merged, Seq("day"), path)
  }
}
