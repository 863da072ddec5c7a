package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.TimeSeries
import graft.streaming.StreamingOps

/** Hopping-window rollups and value-range rolling aggregates. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("hopping rollup: every event lands in exactly window/slide " +
       "windows; the tumbling rollup is the slide=window special case") {
    val events = Tables.load(spark, sfDir, "events")
      .select($"ts", $"event_type", $"value")
    val hop = StreamingOps.hoppingRollup(events, "1 hour", "30 minutes")
    val nEvents = events.filter($"ts".isNotNull).count()
    val massed = hop.agg(sum($"n")).as[Long].head()
    assert(massed === 2 * nEvents, "each event must hit exactly 2 windows")
    // slide = window degenerates to the tumbling rollup
    val tumbleViaHop = StreamingOps
      .hoppingRollup(events, "1 hour", "1 hour")
      .as[(String, String, Long, Double)].collect().toSet
    val tumble = StreamingOps.windowedRollup(events)
      .as[(String, String, Long, Double)].collect().toSet
    assert(tumbleViaHop === tumble)
  }

  test("streaming hopping rollup equals the batch rollup") {
    val events = Tables.load(spark, sfDir, "events")
      .select($"ts", $"event_type", $"value")
    val dir = "/root/repo/target/scratch/hop_stream_in"
    events.write.mode("overwrite").parquet(dir)
    val batch = StreamingOps.hoppingRollup(events)
      .orderBy($"win_start", $"event_type")
      .as[(String, String, Long, Double)].collect().toSeq
    val stream = spark.readStream.schema(events.schema).parquet(dir)
    val q = StreamingOps.hoppingRollup(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hop_test").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("hop_test")
      .orderBy($"win_start", $"event_type")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got === batch)
  }

  test("rollingAgg equals a driver-side trailing-window walk; frame is " +
       "value-based (ties share a frame), not row-based") {
    val events = Tables.load(spark, sfDir, "events")
    val got = TimeSeries
      .rollingAgg(events, "event_id", "user_id", "ts", "value", hours = 24)
      .as[(Long, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> (r._4, r._5)).toMap
    val rows = events
      .filter($"ts".isNotNull && $"user_id".isNotNull)
      .select($"event_id", $"user_id", unix_micros($"ts"),
              $"value")
      .as[(Long, Long, Long, Option[Double])].collect()
    val byUser = rows.groupBy(_._2)
    val win = 24L * 3600 * 1000000
    var checked = 0
    byUser.values.foreach { us =>
      us.foreach { case (id, _, t, _) =>
        val frame = us.filter(r => r._3 >= t - win && r._3 <= t)
        val vals = frame.flatMap(_._4)
        val wantN = vals.length.toLong
        val wantAvg =
          if (vals.isEmpty) None
          else Some(math.rint(vals.sum / vals.length * 1e6) / 1e6)
        val (gotN, gotAvg) = got(id)
        assert(gotN === wantN, s"event $id trail_n")
        (gotAvg, wantAvg) match {
          case (Some(g), Some(w)) => assert(math.abs(g - w) < 1e-6)
          case (g, w) => assert(g === w)
        }
        checked += 1
      }
    }
    assert(checked === got.size && checked > 0)
    spark.catalog.clearCache()
  }

  test("activeUsers equals a brute-force trailing-window distinct count " +
       "on the real events table; dau <= wau; stickiness in (0, 1]") {
    val events = Tables.load(spark, sfDir, "events")
    val got = TimeSeries.activeUsers(events, days = 7)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val pairs = events
      .filter($"user_id".isNotNull && $"ts".isNotNull)
      .select($"user_id", to_date($"ts").as("d"))
      .distinct()
      .as[(Long, java.sql.Date)].collect()
      .map { case (u, d) => (u, d.toLocalDate) }
    val days = pairs.map(_._2).distinct
    assert(got.keySet === days.map(_.toString).toSet)
    days.foreach { d =>
      val dau = pairs.count(_._2 == d).toLong
      val wau = pairs.filter { case (_, a) =>
        !a.isAfter(d) && a.isAfter(d.minusDays(7)) }
        .map(_._1).distinct.length.toLong
      val (gd, gw, gs) = got(d.toString)
      assert(gd === dau && gw === wau, s"day $d")
      assert(gd <= gw && gs > 0.0 && gs <= 1.0)
      assert(math.abs(gs - math.rint(dau.toDouble / wau * 1e6) / 1e6)
               < 1e-12)
    }
    assert(days.length > 7, "degenerate: need more than one window span")
    spark.catalog.clearCache()
  }

  test("rollingAgg on a hand-built tie: equal timestamps share one frame") {
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val ev = Seq((1L, 7L, t0, 10.0), (2L, 7L, t0, 30.0))
      .toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries
      .rollingAgg(ev, "event_id", "user_id", "ts", "value", hours = 1)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    val ms = t0.getTime
    assert(got === Set((1L, 7L, ms, 2L, 20.0), (2L, 7L, ms, 2L, 20.0)))
  }
}
