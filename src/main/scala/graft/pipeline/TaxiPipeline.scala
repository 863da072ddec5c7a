package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.CoreOps

/** The reference's whole 7-task DAG collapsed into ONE Spark logical plan
  * (SURVEY.md §3.1 "engine translation"): what Airflow runs as
  *
  *   download → spark_clean → postgres load → quality checks →
  *   SQL enrichment → BigQuery sync
  *
  * with file/JDBC handoffs between every stage becomes a single declarative
  * dataflow `scan → dropna → dedup → derive month → CASE time_bucket →
  * broadcast dim join → aggregate`. Catalyst then plans it as one job:
  * IsNotNull pushdown into the scan, one shuffle for the dedup, a broadcast
  * hash join (no shuffle for the 25-row dim), and partial+final hash
  * aggregation — the shape that scales to 1000 executors, because the only
  * all-to-all exchange is the dedup and the dim never moves more than once.
  *
  * Table casting (FIXTURES.md §B): `events` plays the trip table
  * (ts ≙ tpep_pickup_datetime, value ≙ fare_amount, user_id % 25 ≙
  * PULocationID), `nation` plays the 265-row taxi-zone lookup
  * (data/taxi_zone_lookup.csv).
  */
object TaxiPipeline {

  /** Cleaning stage — the Spark job at
    * spark-apps/clean_nyc_taxi_pipeline.py:7-13 verbatim semantics:
    * dropna → dropDuplicates → derive month.
    */
  def clean(trips: DataFrame, tsCol: String = "ts"): DataFrame = {
    val c = CoreOps.dedupFullRow(CoreOps.dropNulls(trips))
    CoreOps.deriveMonth(c, tsCol)
  }

  /** Enrichment stage — the Postgres ALTER+UPDATE CASE WHEN
    * (dags/nyc_taxi_pipeline_dag.py:253-261) as a projection.
    */
  def enrich(trips: DataFrame, tsCol: String = "ts"): DataFrame =
    CoreOps.timeBucket(trips, tsCol)

  /** Zone-dimension join (SURVEY §2.6) — the join the reference's data
    * model declares (FK-typed PULocationID → zone LocationID). Broadcast:
    * the dim is 25 rows here / 265 in the reference / rarely more than a
    * few thousand for any geo dimension, so at 100 TB the fact table never
    * shuffles for this join.
    */
  def joinZones(trips: DataFrame, zones: DataFrame): DataFrame =
    trips
      // pmod, not %: Scala/Spark % truncates toward zero, so a negative
      // user_id would derive a zone_key outside [0,25) and silently fall out
      // of the left join into a null zone
      .withColumn("zone_key", pmod(col("user_id"), lit(25)).cast("int"))
      .join(broadcast(zones), col("zone_key") === col("n_nationkey"), "left")

  /** Analytics aggregate — "trip volume, average fare by time buckets"
    * (README.md:198, A5), by zone group. Partial aggregation (map-side
    * combine) happens automatically; output cardinality is
    * |time_bucket| × |zones| = tiny, so the final shuffle is negligible.
    */
  def aggregate(enriched: DataFrame): DataFrame =
    enriched
      .groupBy(col("time_bucket"), col("n_name").as("zone"))
      .agg(
        count(lit(1)).as("trips"),
        round(avg(col("value")), 6).as("avg_fare"),
        round(sum(col("value")), 4).as("total_fare"))

  /** The full flagship pipeline over a scale-factor dir. */
  def flagship(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    val zones  = Tables.load(spark, dir, "nation")
    aggregate(joinZones(enrich(clean(events)), zones))
  }
}
