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
}
