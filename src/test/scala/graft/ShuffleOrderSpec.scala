package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Deterministic global shuffle order: range-partition + offset rank
  * assembly vs the naive single-partition global window.
  */
class ShuffleOrderSpec extends SparkSpec {

  test("positions are a bijection onto [0, n)") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pos = TextOps.shuffleOrder(df, seed = "7", partitions = 8)
      .select(col("pos")).as[Long].collect().sorted
    assert(pos.toSeq === (0L until 500L))
  }

  test("assembled rank equals the naive global-window rank") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val got = TextOps.shuffleOrder(df, seed = "42", partitions = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = df
      .select(col("doc_id"),
              md5(concat_ws("|", lit("42"), col("doc_id").cast("string")))
                .as("k"))
      .withColumn("pos",
        row_number().over(Window.orderBy(col("k"), col("doc_id")))
          .cast("long") - 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === naive)
  }

  test("same seed reproduces the order; different seeds permute " +
       "differently (epoch reshuffle)") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, s"x$i")).toDF("doc_id", "text")
    val e0 = TextOps.shuffleOrder(df, seed = "epoch-0")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e0b = TextOps.shuffleOrder(df, seed = "epoch-0")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e1 = TextOps.shuffleOrder(df, seed = "epoch-1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e0 === e0b)
    assert(e0 !== e1)
    assert(e1.values.toSeq.sorted === (0L until 200L))
  }

  test("the big frame is range-partitioned, never single-partition") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val plan = TextOps.shuffleOrder(df, partitions = 8)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("rangepartitioning"))
    // the only single-partition exchange allowed is the <= P-row offsets
    // cumsum; the keyed frame's window partitions by the stamped pid
    assert(plan.contains("partitionby".toLowerCase) ||
           plan.contains("__pid"))
  }

  test("lengthBatches equals the naive global-window twin") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
    val got = TextOps.lengthBatches(docs, batchSize = 32)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    val naive = docs
      .select($"doc_id",
              greatest(TextOps.tokenCount($"text"), lit(0)).cast("long")
                .as("n"))
      .withColumn("pos", row_number().over(
        Window.orderBy($"n", $"doc_id")).cast("long") - 1L)
      .withColumn("batch_id", expr("pos div 32"))
      .groupBy($"batch_id")
      .agg(count(lit(1)).as("n_seqs"), min($"n").as("mn"),
           max($"n").as("mx"), sum($"n").as("sm"))
      .withColumn("pf", when($"mx" === 0L, lit(0.0))
        .otherwise(round(lit(1.0) -
          $"sm".cast("double") / ($"mx" * $"n_seqs"), 6)))
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(got === naive)
    // batches tile the corpus: all full except possibly the highest id
    val n = docs.count()
    val sizes = got.toSeq.sortBy(_._1).map(_._2)
    assert(sizes.init.forall(_ === 32L) &&
           sizes.last === (n - 32 * (sizes.size - 1)))
  }

  test("lengthBatches: contiguous length runs; bimodal corpus packs " +
       "with zero padding") {
    import spark.implicits._
    val docs = ((1L to 64L).map(i => (i, Seq.fill(5)("w").mkString(" "))) ++
                (65L to 128L).map(i => (i, Seq.fill(50)("w").mkString(" "))))
      .toDF("doc_id", "text")
    val got = TextOps.lengthBatches(docs, batchSize = 32)
      .orderBy($"batch_id")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got.size === 4)
    // each batch is length-pure -> padding-free
    assert(got.forall(b => b._3 === b._4 && b._6 === 0.0))
    // batch length ranges are non-overlapping and monotone
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(a._4 <= b._3)
    case _ => ()
    }
  }

  test("curriculumOrder equals the naive two-window twin; tiers are " +
       "contiguous equal cuts; within-tier order is the seeded coin") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
    val got = TextOps.curriculumOrder(docs, "doc_id", "n_chars",
                                      nTiers = 4, seed = "7")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    // naive twin: global windows (fine at spec scale)
    val naive = docs
      .withColumn("rk", row_number().over(
        Window.orderBy($"n_chars", $"doc_id")).cast("long") - 1L)
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy()))
      .withColumn("tier", expr("(rk * 4L) div n").cast("int"))
      .withColumn("pos", row_number().over(
        Window.orderBy($"tier",
          md5(concat_ws("|", lit("7"), $"doc_id".cast("string"))),
          $"doc_id")).cast("long") - 1L)
      .select($"doc_id", $"tier", $"pos")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(got === naive)
    // pos is a bijection onto [0, n)
    val n = got.length
    assert(got.map(_._3).sorted.toSeq === (0L until n).toSeq)
    // tiers tile pos contiguously in tier order, sizes within 1 of n/4
    val byTier = got.groupBy(_._2).toSeq.sortBy(_._1)
    assert(byTier.map(_._1) === Seq(0, 1, 2, 3))
    byTier.foreach { case (_, rows) =>
      assert(math.abs(rows.length - n / 4.0) <= 1.0)
      val ps = rows.map(_._3).sorted
      assert(ps.last - ps.head === ps.length - 1, "tier not contiguous")
    }
    // a tier boundary respects difficulty: every tier-0 doc's n_chars <=
    // every tier-3 doc's n_chars
    val chars = docs.select($"doc_id", $"n_chars")
      .as[(Long, Long)].collect().toMap
    val t0max = got.filter(_._2 == 0).map(r => chars(r._1)).max
    val t3min = got.filter(_._2 == 3).map(r => chars(r._1)).min
    assert(t0max <= t3min)
    spark.catalog.clearCache()
  }
}
