package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-interval range self-join: all ordered pairs of rows whose
  * timestamps are within `deltaMs` of each other.
  *
  * A naive theta-join (`a.ts ≤ b.ts ≤ a.ts + δ`) is a cartesian product
  * with a post-filter — Spark plans BroadcastNestedLoopJoin, O(n²). The
  * composition here buckets rows into δ-wide time bins: a qualifying pair
  * can only span the same or adjacent bins, so an equi-join on
  * `bin ∈ {b, b+1}` (two shuffle-hash/SMJ joins unioned by a disjunctive
  * key) reduces candidates to O(n · density) — the standard interval-join
  * binning every stream processor uses.
  *
  * Timestamps are compared at millisecond precision (ns parquet sources
  * truncate identically on every engine).
  */
object RangeJoin {

  def pairsWithin(events: DataFrame, idCol: String, tsCol: String,
                  deltaMs: Long): DataFrame = {
    val base = events.select(
      col(idCol).as("id"),
      unix_millis(date_trunc("millisecond", col(tsCol))).as("ms"))
      .withColumn("bin", expr(s"ms div $deltaMs")) // integral division
    val a = base.select(col("id").as("id_a"), col("ms").as("ms_a"),
                        col("bin").as("bin_a"))
    val b = base.select(col("id").as("id_b"), col("ms").as("ms_b"),
                        col("bin").as("bin_b"))
    // A disjunctive key (`bin_b === bin_a || bin_b === bin_a+1`) defeats
    // Catalyst's equi-key extraction and degenerates to a nested-loop
    // join — so run TWO equi-joins (same bin, next bin) and union them.
    val bound =
      (col("ms_a") < col("ms_b") ||
        (col("ms_a") === col("ms_b") && col("id_a") < col("id_b"))) &&
        col("ms_b") - col("ms_a") <= deltaMs
    val sameBin = a.join(b, col("bin_b") === col("bin_a") && bound)
    val nextBin = a.join(b, col("bin_b") === col("bin_a") + 1 && bound)
    sameBin.unionByName(nextBin)
      .select(col("id_a"), col("id_b"),
              (col("ms_b") - col("ms_a")).as("gap_ms"))
  }
}
