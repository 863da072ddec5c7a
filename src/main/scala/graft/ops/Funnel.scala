package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Ordered conversion-funnel analysis over an event stream — the
  * product-analytics staple (view → click → purchase): how many users
  * reach each step, where a step only counts if it happens STRICTLY
  * AFTER the user's entry into the previous step (earliest qualifying
  * time, the standard "first touch" semantics), optionally within a
  * bounded gap.
  *
  * Physical shape at scale: the event stream reduces to a narrow
  * (user, type, ts) projection (persisted once, shared by every step);
  * each step is one min-aggregate with map-side combine joined to the
  * previous step's per-user entry times on the user key — k steps cost
  * k narrow hash-joins/aggregates over step-filtered slices, never a
  * per-user event-list collect and never a window over whole user
  * histories (a skewed power user costs nothing: the aggregate
  * combines partials). The census is k one-row aggregates unioned —
  * deliberately NOT a groupBy over per-user rows, so a step reached by
  * zero users still reports n_users = 0 (the engine and the SQL twin
  * agree on empty levels).
  *
  * Output: (step 1-based, event_type, n_users, conversion) where
  * conversion = n_step / n_prev rounded 6 (step 1 converts at 1.0;
  * null when the previous step is empty — no 0/0 NaN can cross the
  * oracle boundary).
  */
object Funnel {

  def funnel(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type",
             maxGapHours: Option[Int] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
            s"repeated step types not supported: $steps")
    val ev = events
      .filter(col(typeCol).isin(steps: _*) &&
              col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"), col(typeCol).as("__t"),
              col(tsCol).as("__ts"))
      .persist(StorageLevel.MEMORY_AND_DISK)
      .transform(graft.CacheScope.register)
    var prev: DataFrame = null
    val censusLevels = steps.zipWithIndex.map { case (s, i) =>
      val cur =
        if (i == 0)
          ev.filter(col("__t") === s)
            .groupBy(col("__u")).agg(min(col("__ts")).as("__pts"))
        else {
          val gap: Column = maxGapHours
            .map(h => col("__ts") <= col("__pts") +
                        expr(s"INTERVAL $h HOURS"))
            .getOrElse(lit(true))
          ev.filter(col("__t") === s)
            .join(prev.select(col("__u"), col("__pts")), "__u")
            .filter(col("__ts") > col("__pts") && gap)
            .groupBy(col("__u")).agg(min(col("__ts")).as("__pts"))
        }
      // each level feeds the next AND its own 1-row census
      val level = cur.persist(StorageLevel.MEMORY_AND_DISK)
        .transform(graft.CacheScope.register)
      prev = level
      level.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(s).as("event_type"),
                col("n_users"))
    }
    val census = censusLevels.reduce(_ unionByName _)
    census.as("c")
      .join(census.select((col("step") + 1).as("step"),
                          col("n_users").as("__prev_n")),
            Seq("step"), "left")
      .withColumn("conversion",
        round(col("n_users").cast("double") /
              nullif(coalesce(col("__prev_n"), col("n_users"))
                       .cast("double"), lit(0.0)), 6))
      .select(col("step"), col("event_type"), col("n_users"),
              col("conversion"))
  }
}
