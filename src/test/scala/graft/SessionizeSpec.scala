package graft

import java.sql.Timestamp

import graft.streaming.Sessionize

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("batch sessionization splits on the gap") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:05:00")),
      (1L, ts("2024-01-01 10:50:00")), // 45min gap → new session
      (2L, ts("2024-01-01 09:00:00"))
    ).toDF("user_id", "ts")
    val got = Sessionize.batch(events, 30)
      .select($"user_id", $"session_seq", $"n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("streaming mapGroupsWithState matches batch on one batch") {
    val dir = "/root/repo/target/scratch/session_stream"
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:05:00")),
      (1L, ts("2024-01-01 10:50:00")),
      (2L, ts("2024-01-01 09:00:00"))
    ).toDF("user_id", "ts")
    events.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(events.schema).parquet(dir)
    Sessionize.runStreamingDemo(spark, stream, 30, "sess_test")
    val got = spark.table("sess_test")
      .select($"user_id", $"n_events", $"closed")
      .as[(Long, Long, Boolean)].collect().toSet
    // user 1: first session (2 events) closed by the 45-min gap;
    // the open session (1 event) stays in state. user 2: open single.
    assert(got === Set((1L, 2L, true), (2L, 1L, false)))
  }
}
