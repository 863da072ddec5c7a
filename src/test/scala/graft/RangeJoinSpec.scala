package graft

import java.sql.Timestamp

import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("range join finds exactly the pairs within delta, incl. bin edges") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:00:30")), // 30s after 1
      (3L, ts("2024-01-01 10:01:00")), // 60s after 1 (inclusive), 30s after 2
      (4L, ts("2024-01-01 10:02:30")), // 90s after 3 → out
      (5L, ts("2024-01-01 10:00:30"))  // equal ts to 2 → tie pair (2,5)
    ).toDF("event_id", "ts")
    val got = RangeJoin.pairsWithin(events, "event_id", "ts", 60000L)
      .select($"id_a", $"id_b", $"gap_ms").as[(Long, Long, Long)]
      .collect().toSet
    assert(got === Set(
      (1L, 2L, 30000L), (1L, 3L, 60000L), (1L, 5L, 30000L),
      (2L, 3L, 30000L), (5L, 3L, 30000L), (2L, 5L, 0L)))
  }

  test("range join equals brute force on the real events table") {
    // deterministic subset: an unordered limit() can pick different rows
    // across the two independent jobs below
    val events = Tables.load(spark, sfDir, "events")
      .orderBy("event_id").limit(300)
    val binned = RangeJoin.pairsWithin(events, "event_id", "ts", 60000L)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    import org.apache.spark.sql.functions._
    val e = events.select($"event_id",
      unix_millis(date_trunc("millisecond", $"ts")).as("ms"))
    val brute = e.as("a").crossJoin(e.as("b"))
      .filter((col("a.ms") < col("b.ms") ||
        (col("a.ms") === col("b.ms") &&
          col("a.event_id") < col("b.event_id"))) &&
        col("b.ms") - col("a.ms") <= 60000L)
      .select(col("a.event_id"), col("b.event_id")).as[(Long, Long)]
      .collect().toSet
    assert(binned === brute)
  }
}
