package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.Tables

/** Typed veneer over the engine's DataFrame core (SURVEY §1.3: the
  * reference is dynamically typed end-to-end, so `DataFrame` is the
  * faithful surface; `Dataset[T]` is offered where compile-time field
  * checks help).
  */

/** The reference's trip fact schema — Postgres DDL
  * dags/nyc_taxi_pipeline_dag.py:31-53 mapped per SURVEY §1.2
  * (`store_and_fwd_flag` kept String: TLC data is 'N'/'Y' despite the
  * DDL's BOOLEAN — the documented type clash).
  */
case class TaxiTrip(
    VendorID: Option[Int],
    tpep_pickup_datetime: Option[Timestamp],
    tpep_dropoff_datetime: Option[Timestamp],
    passenger_count: Option[Int],
    trip_distance: Option[Double],
    RatecodeID: Option[Int],
    store_and_fwd_flag: Option[String],
    PULocationID: Option[Int],
    DOLocationID: Option[Int],
    payment_type: Option[Int],
    fare_amount: Option[Double],
    extra: Option[Double],
    mta_tax: Option[Double],
    tip_amount: Option[Double],
    tolls_amount: Option[Double],
    improvement_surcharge: Option[Double],
    total_amount: Option[Double],
    congestion_surcharge: Option[Double],
    Airport_fee: Option[Double],
    pickup_month: Option[Int])

/** Zone dimension (data/taxi_zone_lookup.csv). */
case class Zone(LocationID: Int, Borough: String, Zone: String,
                service_zone: String)

/** Legacy TLD row (recovered bytecode DAGs, SURVEY §1.4). */
case class TopLevelDomain(domain: String, `type`: String,
                          sponsoring_organization: Option[String],
                          date: Option[String])

// testdata tables (FIXTURES.md §B)
case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                 event_type: String, value: Double, props: String)
case class Document(doc_id: Long, text: String, lang: String,
                    source: String, n_chars: Long)
case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)
case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)

object TypedTables {
  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    Tables.load(spark, dir, "events").as[Event]
  }
  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents").as[Document]
  }
  def embeddings(spark: SparkSession, dir: String): Dataset[Embedding] = {
    import spark.implicits._
    Tables.load(spark, dir, "embeddings").as[Embedding]
  }
  def nations(spark: SparkSession, dir: String): Dataset[Nation] = {
    import spark.implicits._
    Tables.load(spark, dir, "nation").as[Nation]
  }
}
