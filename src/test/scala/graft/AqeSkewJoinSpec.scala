package graft

import org.apache.spark.sql.functions._

/** The OTHER half of the skew story: `SkewOps.saltedJoin` handles skew the
  * writer knows about; AQE's skew-join split handles skew discovered at
  * RUNTIME. This spec proves the engine's plans actually let AQE do that —
  * a skewed shuffle join re-plans with the hot partition split instead of
  * one straggler task sorting the whole hot key (the 100 TB failure mode).
  *
  * Runs in an isolated `newSession` so the lowered skew thresholds (needed
  * to trigger the optimization at test scale) never leak into the shared
  * spec session.
  */
class AqeSkewJoinSpec extends SparkSpec {

  test("AQE splits a runtime-skewed sort-merge join") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // test-scale thresholds: a partition is "skewed" past ~64 KB and 2×
    // the median, and splits target ~16 KB — tiny on purpose
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s.conf.set("spark.sql.shuffle.partitions", "8")
    import s.implicits._

    // one pathological key carrying ~97% of the fact rows
    val fact = s.range(0, 150000)
      .select(when($"id" % 30 =!= 0, lit(7L)).otherwise($"id" % 29)
                .as("k"),
              concat(lit("payload_payload_payload_"), $"id").as("v"))
    val dim = s.range(0, 30).select($"id".as("k"), ($"id" * 10).as("w"))

    // consume with a GLOBAL aggregate: a groupBy on the join key would
    // reuse the join's partitioning, and AQE (correctly) refuses to split
    // a skewed join whose output distribution a parent still requires.
    // sum(length(v)) keeps the wide payload alive through column pruning
    // so the hot partition is actually hot.
    val joined = fact.join(dim, "k")
      .agg(count(lit(1)).as("n"), sum(length($"v")).as("sv"))
    val row = joined.collect().head
    assert(row.getLong(0) === 150000L)

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("isSkewJoin=true") || plan.contains("skewed"),
      s"AQE did not split the skewed join:\n$plan")
    // do NOT close() the child session: newSession shares the global
    // SparkContext, and close() == sparkContext.stop() — it would kill
    // every later suite in this JVM. The SQL confs are already isolated.
  }

  test("skewReport ranks heavy keys first with exact share/skew " +
       "arithmetic and a bounded top-k") {
    import spark.implicits._
    val df = (Seq.fill(8)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d"))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }
      .toDF("row_id", "k")
    val got = graft.ops.SkewOps.skewReport(df, "k", topK = 2)
      .as[(String, Long, Double, Double)].collect().toSeq
    // total 12 rows over 4 keys → mean 3; 'a' owns 8 (skew 8/3)
    assert(got === Seq(("a", 8L, 0.666667, 2.666667),
                       ("b", 2L, 0.166667, 0.666667)))
  }
}
