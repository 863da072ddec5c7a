package graft

import java.sql.Timestamp

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
}
