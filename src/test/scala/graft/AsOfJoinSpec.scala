package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join picks latest quote at-or-before, per key") {
    val probes = Seq(
      ("A", ts("2024-01-01 10:00:00"), "p1"),
      ("A", ts("2024-01-01 12:00:00"), "p2"),
      ("B", ts("2024-01-01 10:30:00"), "p3"),
      ("C", ts("2024-01-01 10:00:00"), "p4") // key with no quotes
    ).toDF("k", "pts", "probe_id")
    val quotes = Seq(
      ("A", ts("2024-01-01 09:00:00"), 1L),
      ("A", ts("2024-01-01 10:00:00"), 2L), // equal ts → inclusive
      ("A", ts("2024-01-01 11:00:00"), 3L),
      ("B", ts("2024-01-01 11:00:00"), 4L)  // after the probe → no match
    ).toDF("k", "qts", "quote_id")

    val got = AsOfJoin.asofJoin(probes, quotes, "k", "pts", "qts",
                                "quote_id")
      .select($"probe_id", $"quote_id").as[(String, Option[Long])]
      .collect().toMap
    assert(got("p1") === Some(2L)) // inclusive: equal-ts quote wins
    assert(got("p2") === Some(3L))
    assert(got("p3") === None)     // only future quotes
    assert(got("p4") === None)     // no quotes at all
  }

  test("asof join output carries ONE copy of the join key — by-name " +
       "references to it resolve") {
    val probes = Seq(("A", ts("2024-01-01 10:00:00"), "p1"))
      .toDF("k", "pts", "probe_id")
    val quotes = Seq(("A", ts("2024-01-01 09:00:00"), 1L))
      .toDF("k", "qts", "quote_id")
    val out = AsOfJoin.asofJoin(probes, quotes, "k", "pts", "qts",
                                "quote_id")
    // both inputs carry `k`; emitting both made groupBy("k") an
    // AMBIGUOUS_REFERENCE — the probe-side copy wins
    assert(out.columns.count(_ == "k") === 1, out.columns.mkString(","))
    assert(out.groupBy("k").count().head().getLong(1) === 1L)
  }

  test("asof join tie-break: max tiebreak among equal-ts quotes") {
    val probes = Seq(("A", ts("2024-01-01 10:00:00"), "p")).toDF("k", "pts", "pid")
    val quotes = Seq(
      ("A", ts("2024-01-01 09:00:00"), 7L),
      ("A", ts("2024-01-01 09:00:00"), 9L),
      ("A", ts("2024-01-01 09:00:00"), 8L)
    ).toDF("k", "qts", "quote_id")
    val got = AsOfJoin.asofJoin(probes, quotes, "k", "pts", "qts",
                                "quote_id")
      .select($"quote_id").as[Long].head()
    assert(got === 9L)
  }

  test("last-touch attribution composition: latest at-or-before click " +
       "wins, no prior click credits 'direct'") {
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // purchase u1@5: clicks chA@1, chB@3 → chB; purchase u2@2: click
    // chC@2 (same instant, inclusive) → chC; purchase u3@1: click only
    // AFTER (@2) → direct
    val purchases = Seq((100L, 1L, ts(5), 10.0), (101L, 2L, ts(2), 20.0),
                        (102L, 3L, ts(1), 40.0))
      .toDF("event_id", "user_id", "pts", "value")
    val clicks = Seq((1L, ts(1), 11L, "chA"), (1L, ts(3), 12L, "chB"),
                     (2L, ts(2), 13L, "chC"), (3L, ts(2), 14L, "chD"))
      .toDF("user_id", "cts", "click_id", "channel")
    val got = AsOfJoin
      .asofJoin(purchases, clicks, "user_id", "pts", "cts", "click_id")
      .groupBy(coalesce($"channel", lit("direct")).as("channel"))
      .agg(sum($"value").as("revenue"))
      .as[(String, Double)].collect().toSet
    assert(got === Set(("chB", 10.0), ("chC", 20.0), ("direct", 40.0)))
  }

  test("non-key name collision fails fast instead of silently dropping " +
       "the right copy (both sides carrying a 'px' payload)") {
    val probes = Seq(("A", ts("2024-01-01 10:00:00"), 1.0))
      .toDF("k", "pts", "px")
    val quotes = Seq(("A", ts("2024-01-01 09:00:00"), 2.0, 1L))
      .toDF("k", "qts", "px", "quote_id")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(probes, quotes, "k", "pts", "qts", "quote_id")
    }
    assert(e.getMessage.contains("px"))
    // the join KEY itself stays shareable (left copy emitted once)
    val ok = AsOfJoin.asofJoin(
      probes, quotes.drop("px"), "k", "pts", "qts", "quote_id")
    assert(ok.columns.count(_ == "k") === 1)
    assert(ok.select($"quote_id").as[Option[Long]].head() === Some(1L))
  }
}
