package graft

import org.apache.spark.sql.functions._

import graft.pipeline.TaxiPipeline

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("flagship runs end-to-end with rows > 0 (driver smoke contract)") {
    val df = TaxiPipeline.flagship(spark, sfDir)
    assert(df.count() > 0)
  }

  test("time_bucket is total: every row lands in one of three buckets") {
    val events = Tables.load(spark, sfDir, "events")
    val enriched = TaxiPipeline.enrich(TaxiPipeline.clean(events))
    val buckets = enriched.select($"time_bucket").distinct()
      .as[String].collect().toSet
    assert(buckets.subsetOf(Set("Morning Rush", "Evening Rush", "Other")))
    assert(enriched.filter($"time_bucket".isNull).isEmpty)
  }

  test("flagship plan broadcasts the dim join and prunes scan columns") {
    val plan = TaxiPipeline.flagship(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast join in:\n$plan")
    assert(!plan.contains("SortMergeJoin"))
  }

  test("clean stage: no nulls and no duplicate rows survive") {
    val events = Tables.load(spark, sfDir, "events")
    val cleaned = TaxiPipeline.clean(events)
    assert(cleaned.count() === cleaned.distinct().count())
    val anyNull = cleaned.columns.map(col(_).isNull).reduce(_ || _)
    assert(cleaned.filter(anyNull).isEmpty)
  }
}
