package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.streaming.{Sessionize, StreamingOps}

/** Native session_window sessionization: hand-pinned sessions, the
  * documented boundary divergence from the lag/cumsum form, and the
  * streaming twin (same definition over readStream ≡ batch).
  */
class SessionWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def rows(r: (Long, Timestamp)*) = r.toDF("user_id", "ts")

  private def sessions(r: (Long, Timestamp)*):
      Set[(Long, Long, Long, Long)] =
    StreamingOps.sessionWindowRollup(rows(r: _*), 30)
      .as[(Long, Long, Long, Long)].collect().toSet

  test("hand-pinned sessions: merge within gap, end = last + gap") {
    val got = sessions(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:10:00")),
      (1L, ts("2024-01-01 11:30:00")), // 80 min after -> new session
      (2L, ts("2024-01-01 09:00:00")))
    def ms(s: String) = ts(s).getTime
    assert(got === Set(
      (1L, ms("2024-01-01 10:00:00"), ms("2024-01-01 10:40:00"), 2L),
      (1L, ms("2024-01-01 11:30:00"), ms("2024-01-01 12:00:00"), 1L),
      (2L, ms("2024-01-01 09:00:00"), ms("2024-01-01 09:30:00"), 1L)))
  }

  test("boundary: exactly-gap event MERGES (closed-interval fold), " +
       "agreeing with Sessionize; one tick past the gap splits") {
    val atGap = Seq((1L, ts("2024-01-01 10:00:00")),
                    (1L, ts("2024-01-01 10:30:00"))) // exactly 30 min
    assert(sessions(atGap: _*).size === 1)
    assert(Sessionize.batch(rows(atGap: _*), 30).count() === 1)
    val pastGap = Seq((1L, ts("2024-01-01 10:00:00")),
                      (1L, ts("2024-01-01 10:30:00.001")))
    assert(sessions(pastGap: _*).size === 2)
  }

  test("chained events extend one session transitively") {
    // each 20 min apart: 10:00, 10:20, 10:40 — one session though the
    // first and last are beyond the gap from each other
    val got = sessions(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:20:00")),
      (1L, ts("2024-01-01 10:40:00")))
    assert(got === Set((1L, ts("2024-01-01 10:00:00").getTime,
      ts("2024-01-01 11:10:00").getTime, 3L)))
  }

  test("session boundaries agree with Sessionize.batch on real events") {
    val events = Tables.load(spark, sfDir, "events")
    val native = StreamingOps.sessionWindowRollup(events, 30)
      .select(col("user_id"), col("session_start_ms"), col("n_events"))
    val lagForm = Sessionize.batch(events, 30)
      .select(col("user_id"), col("session_start_ms"), col("n_events"))
    // symmetric difference empty <=> identical session sets
    assert(native.exceptAll(lagForm).isEmpty &&
           lagForm.exceptAll(native).isEmpty)
  }

  test("streaming twin: readStream over files ≡ batch") {
    val root = s"${graft.io.Sinks.scratchRoot}/session_window_stream"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    val in = s"$root/in"
    val data = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:10:00")),
      (1L, ts("2024-01-01 11:30:00")), (2L, ts("2024-01-01 09:00:00")))
    rows(data: _*).coalesce(1).write.parquet(in)
    val stream = spark.readStream.schema(rows().schema).parquet(in)
    val q = StreamingOps.sessionWindowRollup(stream, 30)
      .writeStream.outputMode("complete")
      .format("memory").queryName("session_window_mem").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("session_window_mem")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === sessions(data: _*))
  }

  test("null user/ts rows excluded — row-identical to Sessionize.batch " +
       "on dirty input (native session_window dropped null ts on its " +
       "own but KEPT a null-user session)") {
    import org.apache.spark.sql.functions.col
    val dirty = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:00"))),
      (Some(1L), None),
      (None, Some(ts("2024-01-01 10:00:00"))),
      (None, None)
    ).toDF("user_id", "ts")
    val sw = StreamingOps.sessionWindowRollup(dirty, 30)
      .select(col("user_id"), col("n_events"))
      .as[(Long, Long)].collect().toSet
    val lag = Sessionize.batch(dirty, 30)
      .select(col("user_id"), col("n_events"))
      .as[(Long, Long)].collect().toSet
    assert(sw === Set((1L, 1L)))
    assert(sw === lag)
  }
}
