package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Funnel

/** Conversion-funnel semantics: first-touch ordering, bounded gaps,
  * zero-user levels, and null hygiene — each pinned on hand-built
  * event streams where the expected census is computable by eye.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  private def ev(rows: (Long, String, Int)*) =
    rows.map { case (u, t, m) => (u, t, ts(m)) }
      .toDF("user_id", "event_type", "ts")

  test("steps only count strictly after the user's previous-step entry") {
    val events = ev(
      (1L, "view", 1), (1L, "click", 2), (1L, "purchase", 3), // full
      (2L, "click", 1), (2L, "view", 2),                      // click BEFORE view
      (3L, "view", 5),                                        // view only
      (4L, "view", 4), (4L, "purchase", 5))                   // skips click
    val got = Funnel.funnel(events, Seq("view", "click", "purchase"))
      .as[(Int, String, Long, Double)].collect().toSet
    assert(got === Set(
      (1, "view", 4L, 1.0),
      (2, "click", 1L, 0.25),
      (3, "purchase", 1L, 1.0)))
  }

  test("a click at the same instant as the view does NOT convert " +
       "(strictly-after), and a later one does") {
    val events = ev((1L, "view", 1), (1L, "click", 1),
                    (2L, "view", 1), (2L, "click", 1), (2L, "click", 2))
    val got = Funnel.funnel(events, Seq("view", "click"))
      .as[(Int, String, Long, Double)].collect().toSet
    assert(got === Set((1, "view", 2L, 1.0), (2, "click", 1L, 0.5)))
  }

  test("maxGap bounds each hop inclusively; first-touch means a second " +
       "faster path cannot rescue a user") {
    val events = ev(
      (1L, "view", 0), (1L, "click", 60),   // exactly at the 1 h gap: counts
      (2L, "view", 0), (2L, "click", 61),   // one minute past: dropped
      // user 3's FIRST view is at 0; the gap is measured from it, so the
      // view at 30 does not reopen the window for the click at 75
      (3L, "view", 0), (3L, "view", 30), (3L, "click", 75))
    val got = Funnel.funnel(events, Seq("view", "click"),
                            maxGapHours = Some(1))
      .as[(Int, String, Long, Double)].collect().toSet
    assert(got === Set((1, "view", 3L, 1.0), (2, "click", 1L, 0.333333)))
  }

  test("an unreached step reports n_users = 0 with null conversion; " +
       "downstream steps stay 0; null users/ts are ignored") {
    val events = Seq(
      (Some(1L), "view", Some(ts(1))),
      (None, "click", Some(ts(2))),        // null user: no ghost click
      (Some(1L), "click", None))           // null ts: ignored
      .toDF("user_id", "event_type", "ts")
    val got = Funnel.funnel(events, Seq("view", "click", "purchase"))
      .as[(Int, String, Long, Option[Double])].collect().toSet
    assert(got === Set(
      (1, "view", 1L, Some(1.0)),
      (2, "click", 0L, Some(0.0)),
      (3, "purchase", 0L, None)))  // 0/0: null, never NaN
  }

  test("linearAttribution splits credit equally inside the window, " +
       "ignores out-of-window touches, and conserves total value") {
    import graft.ops.Funnel
    val events = Seq(
      // purchase u1@10:00 value 100: clicks chA@09:30, chB@09:45 → 50/50
      (1L, 1L, "click", "2024-01-01 09:30:00", 0.0, "chA"),
      (2L, 1L, "click", "2024-01-01 09:45:00", 0.0, "chB"),
      (3L, 1L, "purchase", "2024-01-01 10:00:00", 100.0, null),
      // u2: click 73h before → OUTSIDE the 72h window → direct
      (4L, 2L, "click", "2023-12-29 08:00:00", 0.0, "chA"),
      (5L, 2L, "purchase", "2024-01-01 09:00:00", 40.0, null),
      // u3: one in-window click chA gets the whole 60
      (6L, 3L, "click", "2024-01-01 01:00:00", 0.0, "chA"),
      (7L, 3L, "purchase", "2024-01-01 02:00:00", 60.0, null))
      .map { case (id, u, t, s, v, ch) =>
        (id, u, t, java.sql.Timestamp.valueOf(s), v, ch) }
      .toDF("event_id", "user_id", "event_type", "ts", "value", "chan")
    val got = Funnel.linearAttribution(events, windowHours = 72,
                                       channelCol = col("chan"))
      .as[(String, Long, Option[Double])].collect().toSet
    assert(got === Set(
      ("chA", 2L, Some(110.0)),  // 50 from u1 + 60 from u3
      ("chB", 1L, Some(50.0)),
      ("direct", 1L, Some(40.0))))
    // conservation: channel credits + direct = total purchase value
    val total = got.flatMap(_._3).sum
    assert(math.abs(total - 200.0) < 1e-9)
  }

  test("linearAttribution credit conserves on the real events table") {
    import graft.ops.Funnel
    val events = Tables.load(spark, sfDir, "events")
    val chan = concat(lit("ch"),
      pmod(get_json_object(col("props"), "$.k").cast("long"),
           lit(4)).cast("string"))
    val rows = Funnel.linearAttribution(events, 72, chan)
      .as[(String, Long, Option[Double])].collect()
    val credited = rows.flatMap(_._3).sum
    val totalVal = events
      .filter($"event_type" === "purchase" && $"user_id".isNotNull &&
              $"ts".isNotNull)
      .agg(sum(coalesce($"value", lit(0.0)))).as[Double].head()
    // rounding at 1e-4 per channel row bounds the drift
    assert(math.abs(credited - totalVal) < 1e-2 * rows.length)
    assert(rows.exists(_._1 == "direct"))
    spark.catalog.clearCache()
  }

  test("funnel on the events table matches an independent per-user walk") {
    val events = Tables.load(spark, sfDir, "events")
    val got = Funnel.funnel(events, Seq("view", "click", "purchase"),
                            maxGapHours = Some(72))
      .as[(Int, String, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    // independent truth: collect per-user (type, ts) lists and walk them
    val byUser = events
      .filter($"user_id".isNotNull && $"ts".isNotNull &&
              $"event_type".isin("view", "click", "purchase"))
      .select($"user_id", $"event_type", $"ts")
      .as[(Long, String, Timestamp)].collect()
      .groupBy(_._1)
    val gapMs = 72L * 3600 * 1000
    var (n1, n2, n3) = (0L, 0L, 0L)
    byUser.values.foreach { rows =>
      def earliest(tp: String, after: Option[Long]): Option[Long] = {
        val cand = rows.filter(_._2 == tp).map(_._3.getTime)
          .filter(t => after.forall(a => t > a && t <= a + gapMs))
        if (cand.isEmpty) None else Some(cand.min)
      }
      earliest("view", None).foreach { t1 =>
        n1 += 1
        earliest("click", Some(t1)).foreach { t2 =>
          n2 += 1
          earliest("purchase", Some(t2)).foreach { _ => n3 += 1 }
        }
      }
    }
    assert(got === Map(1 -> n1, 2 -> n2, 3 -> n3))
    assert(n1 > 0 && n2 > 0 && n3 > 0, "degenerate event stream")
    spark.catalog.clearCache()
  }
}
