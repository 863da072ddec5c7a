package graft

import org.apache.spark.sql.functions._

import graft.quality.Quality
import graft.quality.Quality.FkConstraint
import graft.text.{Hashing, TextOps}

class AuditOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  // ------------------------------------------------------------ sourceCap

  test("sourceCap: no source exceeds the cap; survivors are a subset") {
    val capped = TextOps.sourceCap(docs, cap = 5)
    val bySource = capped.groupBy("source").count().collect()
    assert(bySource.nonEmpty)
    assert(bySource.forall(_.getLong(1) <= 5))
    val orphan = capped.join(docs.select("doc_id"), Seq("doc_id"),
                             "left_anti").count()
    assert(orphan === 0L)
  }

  test("sourceCap: cap above every group size keeps everything") {
    val n = docs.count()
    assert(TextOps.sourceCap(docs, cap = Int.MaxValue).count() === n)
  }

  test("sourceCap: deterministic — reruns elect identical survivors") {
    val a = TextOps.sourceCap(docs, cap = 3).select("doc_id")
      .as[Long].collect().sorted.toSeq
    val b = TextOps.sourceCap(docs, cap = 3).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(a === b)
    // a different seed elects a different (equally-sized) sample
    val c = TextOps.sourceCap(docs, cap = 3, seed = "other")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(c.size === a.size)
    assert(c !== a)
  }

  test("sourceCap: production hash mode preserves the contract") {
    val capped = TextOps.sourceCap(docs, cap = 4,
                                   mode = Hashing.Production)
    assert(capped.groupBy("source").count().collect()
      .forall(_.getLong(1) <= 4))
    val again = TextOps.sourceCap(docs, cap = 4, mode = Hashing.Production)
    assert(capped.select("doc_id").as[Long].collect().sorted.toSeq ===
           again.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("sourceCap: rank filter plans as WindowGroupLimit (partial, below the exchange)") {
    val plan = TextOps.sourceCap(docs, cap = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"plan was:\n$plan")
  }

  // ---------------------------------------------------- referentialOrphans

  test("fkOrphans: the star schema audits clean") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val rows = Quality.referentialOrphans(Seq(
      FkConstraint("li_orders", li, "l_orderkey", o, "o_orderkey")))
      .collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("orphan_rows") === 0L)
    assert(rows.head.getAs[Boolean]("ok"))
    assert(rows.head.getAs[Long]("child_rows") === li.count())
  }

  test("fkOrphans: planted orphans and null keys are told apart") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(2L), Some(99L), Some(98L), None)
      .toDF("fk_key")
    val r = Quality.referentialOrphans(Seq(
      FkConstraint("t", child, "fk_key", parent, "pk"))).head()
    assert(r.getAs[Long]("child_rows") === 5L)
    assert(r.getAs[Long]("null_keys") === 1L)   // NULL asserts nothing
    assert(r.getAs[Long]("orphan_rows") === 2L) // 99 and 98
    assert(!r.getAs[Boolean]("ok"))
  }

  test("fkOrphans: duplicate parent keys don't double-count children") {
    val parent = Seq(1L, 1L, 2L).toDF("pk")
    val child = Seq(1L, 1L, 2L, 7L).toDF("fk_key")
    val r = Quality.referentialOrphans(Seq(
      FkConstraint("t", child, "fk_key", parent, "pk"))).head()
    assert(r.getAs[Long]("orphan_rows") === 1L)
  }

  // ---------------------------------------------------- distributionShift

  test("distShift: identical snapshots show zero divergence") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val rows = Quality.distributionShift(ev, ev, "event_type",
                                         count(lit(1))).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("share_a") === r.getAs[Double]("share_b"))
      assert(math.abs(r.getAs[Double]("js_bits")) < 1e-9)
    }
  }

  test("distShift: disjoint supports sum to JSD = 1 bit") {
    val a = Seq("x", "x", "y").toDF("k")
    val b = Seq("z", "w").toDF("k")
    val rows = Quality.distributionShift(a, b, "k", count(lit(1)))
      .collect()
    assert(rows.length === 4)
    val total = rows.map(_.getAs[Double]("js_bits")).sum
    assert(math.abs(total - 1.0) < 1e-6, s"total JSD was $total")
    // absent categories read as share 0, never null
    rows.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("share_a")))
      assert(!r.isNullAt(r.fieldIndex("share_b")))
    }
  }

  test("distShift: shares are distributions (each side sums to 1)") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val rows = Quality.distributionShift(
      ev.filter(dayofmonth(col("ts")) <= 15),
      ev.filter(dayofmonth(col("ts")) > 15),
      "event_type", count(lit(1))).collect()
    assert(math.abs(rows.map(_.getAs[Double]("share_a")).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getAs[Double]("share_b")).sum - 1.0) < 1e-4)
    // JSD is bounded in [0, 1] — portable alarm thresholds
    val total = rows.map(_.getAs[Double]("js_bits")).sum
    assert(total >= -1e-9 && total <= 1.0 + 1e-9)
  }

  // ------------------------------------------------------- corpusDiff

  test("corpusDiff classifies added/removed/changed/unchanged with " +
       "null-safe fingerprints and signed char deltas") {
    val v1 = Seq((1L, Option("a"), "s1"), (2L, Option("b"), "s1"),
                 (3L, Option.empty[String], "s2"), (4L, Option("gone"), "s2"))
      .toDF("doc_id", "text", "source")
    val v2 = Seq((1L, Option("a"), "s1"),   // unchanged
                 (2L, Option("b2"), "s1"),  // changed, +1 char
                 (3L, Option.empty[String], "s2"), // null == null: unchanged
                 (5L, Option("new!"), "s2")) // added; 4 is removed
      .toDF("doc_id", "text", "source")
    val got = TextOps.corpusDiff(v1, v2)
      .as[(String, String, Long, Long)].collect().toSet
    assert(got === Set(
      ("s1", "unchanged", 1L, 0L), ("s1", "changed", 1L, 1L),
      ("s2", "unchanged", 1L, 0L), ("s2", "removed", 1L, -4L),
      ("s2", "added", 1L, 4L)))
  }

  test("corpusDiff: a doc that moves sources reports under its new home; " +
       "null→text and text→null count as changed") {
    val v1 = Seq((1L, Option("x"), "sA"), (2L, Option.empty[String], "sA"),
                 (3L, Option("y"), "sA"))
      .toDF("doc_id", "text", "source")
    val v2 = Seq((1L, Option("x"), "sB"), (2L, Option("now!"), "sA"),
                 (3L, Option.empty[String], "sA"))
      .toDF("doc_id", "text", "source")
    val got = TextOps.corpusDiff(v1, v2)
      .as[(String, String, Long, Long)].collect().toSet
    assert(got === Set(
      ("sB", "unchanged", 1L, 0L),
      ("sA", "changed", 2L, 4L - 1L))) // +4 (null→"now!") −1 ("y"→null)
  }

  // --------------------------------------------------- crossSourceDup

  test("crossSourceDup counts distinct shared fingerprints and per-side " +
       "doc mass; null text carries no evidence") {
    val docs = Seq(
      (1L, Option("d"), "s1"), (2L, Option("d"), "s1"),
      (3L, Option("e"), "s1"),
      (4L, Option("d"), "s2"), (5L, Option("e"), "s2"),
      (6L, Option("e"), "s2"),
      (7L, Option("solo"), "s3"), (8L, Option.empty[String], "s3"),
      (9L, Option.empty[String], "s1")) // null-null never pairs
      .toDF("doc_id", "text", "source")
    val got = TextOps.crossSourceDup(docs)
      .as[(String, String, Long, Long, Long)].collect().toSet
    // s1 vs s2 share {d, e}: s1 carries 2 d's + 1 e, s2 1 d + 2 e's
    assert(got === Set(("s1", "s2", 2L, 3L, 3L)))
  }
}
