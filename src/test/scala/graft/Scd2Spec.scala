package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Scd2

/** SCD Type-2 builder: null-safe change detection, interval tiling,
  * tiebreak determinism — pinned on hand-built change streams.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("consecutive identical attributes collapse; null→value, " +
       "value→null, and null→null are handled null-safely") {
    val changes = Seq(
      (1L, Option("a"), ts(1), 10L),
      (1L, Option("a"), ts(2), 11L),  // no change: collapses
      (1L, Option.empty[String], ts(3), 12L), // a→null: new version
      (1L, Option.empty[String], ts(4), 13L), // null→null: collapses
      (1L, Option("b"), ts(5), 14L),  // null→b: new version
      (2L, Option("x"), ts(1), 15L))  // second key, independent
      .toDF("k", "attr", "ts", "id")
    val got = Scd2.scd2(changes, Seq("k"), Seq("attr"), "ts", "id")
      .as[(Long, Option[String], Timestamp, Option[Timestamp], Boolean)]
      .collect().toSet
    assert(got === Set(
      (1L, Some("a"), ts(1), Some(ts(3)), false),
      (1L, None, ts(3), Some(ts(5)), false),
      (1L, Some("b"), ts(5), None, true),
      (2L, Some("x"), ts(1), None, true)))
  }

  test("intervals tile each key's history: valid_to equals the next " +
       "valid_from, exactly one current version per key") {
    val ev = Tables.load(spark, sfDir, "events")
      .withColumn("tier", floor($"value" / 40).cast("int"))
    val got = Scd2.scd2(ev, Seq("user_id"), Seq("tier"), "ts", "event_id")
      .as[(Long, Option[Int], Timestamp, Option[Timestamp], Boolean)]
      .collect()
    val byKey = got.groupBy(_._1)
    byKey.values.foreach { rows =>
      assert(rows.count(_._5) === 1, "exactly one current per key")
      val sorted = rows.sortBy(_._3.getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), "valid_to must meet next valid_from")
        case _ => ()
      }
      assert(sorted.last._4.isEmpty && sorted.last._5)
      // a version never repeats the previous version's attribute
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._2 !== b._2)
        case _ => ()
      }
    }
    assert(got.length > byKey.size, "degenerate: no attribute changes")
    spark.catalog.clearCache()
  }

  test("equal timestamps order by the tiebreak column deterministically") {
    val changes = Seq(
      (1L, "a", ts(1), 20L),
      (1L, "b", ts(1), 21L)) // same instant: id 21 wins the later slot
      .toDF("k", "attr", "ts", "id")
    val got = Scd2.scd2(changes, Seq("k"), Seq("attr"), "ts", "id")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().sortBy(_._5)
    assert(got.map(r => (r._2, r._5)).toSeq === Seq(("a", false), ("b", true)))
    // null-ts rows are dropped entirely
    val withNull = Seq((1L, "a", Option(ts(1)), 1L),
                       (1L, "zz", Option.empty[Timestamp], 2L))
      .toDF("k", "attr", "ts", "id")
    val got2 = Scd2.scd2(withNull, Seq("k"), Seq("attr"), "ts", "id")
      .select($"attr").as[String].collect().toSeq
    assert(got2 === Seq("a"))
  }
}
