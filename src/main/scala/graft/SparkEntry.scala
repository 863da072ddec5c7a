package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.Sinks
import graft.ops.CoreOps
import graft.pipeline.TaxiPipeline

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (+ the LLM-pipeline extension ops), each with an ANSI/DuckDB
  * oracle twin in `oracleSql` where SQL-expressible.
  *
  * Conventions keeping the DuckDB hash-compare exact (SURVEY §7.4):
  *  - never output raw `events.ts` (parquet ns vs Spark µs truncation) —
  *    derive month/hour/bucket or format to a string instead;
  *  - aliases identical in Spark and SQL, all lowercase (DuckDB folds
  *    unquoted identifiers);
  *  - integer aggregates exact; floating aggregates wrapped in round(·, k)
  *    in BOTH engines to absorb summation-order ulps;
  *  - every query's output is a deterministic SET (no order-dependent
  *    nondeterminism, ties broken by keys).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TaxiPipeline.flagship(spark, "/root/testdata/sf0.001")

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Scratch dir for sink round-trip queries, keyed so concurrent sf runs
    * don't collide.
    */
  private def scratch(dir: String, q: String): String =
    s"${Sinks.scratchRoot}/${dir.replaceAll("[^A-Za-z0-9.]", "_")}/$q"

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §3.1 — the whole reference DAG as one plan (see TaxiPipeline).
    "q_flagship_pipeline" -> ((s, dir) => TaxiPipeline.flagship(s, dir)),

    // P1 dropna (spark-apps/clean_nyc_taxi_pipeline.py:10)
    "q_dropna" -> ((s, dir) =>
      CoreOps.dropNulls(t(s, dir, "events"))
        .select(col("event_id"), col("user_id"), col("event_type"),
                col("value"))),

    // D1 dropDuplicates ≡ DISTINCT (clean_nyc_taxi_pipeline.py:10)
    "q_dedup_distinct" -> ((s, dir) =>
      CoreOps.dedupFullRow(
        t(s, dir, "lineitem").select(col("l_returnflag"),
                                     col("l_linestatus")))),

    // P2 month() derive (clean_nyc_taxi_pipeline.py:13)
    "q_derive_month" -> ((s, dir) =>
      CoreOps.deriveMonth(t(s, dir, "events"), "ts")
        .groupBy(col("pickup_month"))
        .agg(count(lit(1)).as("n"))),

    // C1 CASE WHEN time-bucket enrichment (nyc_taxi_pipeline_dag.py:253-261)
    "q_time_bucket" -> ((s, dir) =>
      CoreOps.timeBucket(t(s, dir, "events"), "ts")
        .groupBy(col("time_bucket"))
        .agg(count(lit(1)).as("n"),
             round(avg(col("value")), 6).as("avg_fare"))),

    // P9 rush-hour range predicate on derived hour (…dag.py:257-258)
    "q_hour_filter" -> ((s, dir) =>
      t(s, dir, "events")
        .filter(hour(col("ts")).between(7, 9))
        .agg(count(lit(1)).as("morning_rows"))),

    // §3.3 legacy pandas ETL chain: rename (P5) → filter (P3) → const col (P4)
    "q_legacy_etl" -> ((s, dir) => {
      val docs = CoreOps.trimHeaders(t(s, dir, "documents"))
      val renamed = CoreOps.renameColumn(docs, "source",
                                         "sponsoring_organization")
      val filtered = CoreOps.filterEq(renamed, "lang", "en")
      CoreOps.constantColumn(filtered, "date_added", "2025-08-29")
        .select(col("doc_id"), col("sponsoring_organization"), col("lang"),
                col("date_added"))
    }),

    // P6 column drop (…dag.py:87-88)
    "q_drop_col" -> ((s, dir) =>
      CoreOps.dropColumns(t(s, dir, "documents"), "text", "n_chars")),

    // P8/A2 null-quality violation count (…dag.py:195-201)
    "q_quality_nulls" -> ((s, dir) =>
      CoreOps.nullViolationCount(t(s, dir, "events"), Seq("ts", "value"))),

    // A1 COUNT(*) gate (…dag.py:188-192)
    "q_row_count" -> ((s, dir) => CoreOps.rowCount(t(s, dir, "lineitem"))),

    // A3 null census (…dag.py:95-96)
    "q_null_matrix" -> ((s, dir) =>
      CoreOps.nullMatrix(
        t(s, dir, "events").select(col("ts"), col("user_id"), col("value"),
                                   col("props")))),

    // §2.6 broadcast dim join, 2-hop star (zone-lookup pattern)
    "q_zone_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("customers"),
             round(avg(col("c_acctbal")), 6).as("avg_bal"))
    }),

    // P3/P10 equality filter on a string column
    "q_filter_eq" -> ((s, dir) =>
      CoreOps.filterEq(t(s, dir, "part"), "p_brand", "Brand#1")
        .select(col("p_partkey"), col("p_name"), col("p_brand"),
                col("p_size"))),

    // S5+S3 — single-file CSV sink then schema'd re-read (engine-boundary
    // round trip); aggregate must equal the parquet-direct oracle.
    "q_csv_roundtrip" -> ((s, dir) => {
      val path = scratch(dir, "csv_roundtrip")
      val src = t(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("user_id"))
      Sinks.writeSingleCsv(src, path)
      val schema = StructType(Seq(
        StructField("event_id", LongType),
        StructField("event_type", StringType),
        StructField("user_id", LongType)))
      Sinks.readCsv(s, path, schema)
        .agg(count(lit(1)).as("n"),
             sum(col("event_id")).as("id_sum"),
             countDistinct(col("event_type")).as("n_types"))
    }),

    // S6 — partitioned parquet sink + partition-pruned re-read (the
    // at-scale replacement for the reference's B-tree indexes, S9).
    "q_partitioned_write" -> ((s, dir) => {
      val path = scratch(dir, "part_parquet")
      val li = t(s, dir, "lineitem")
        .withColumn("ship_month", month(col("l_shipdate")))
      Sinks.writePartitioned(li, "ship_month", path)
      s.read.parquet(path)
        .filter(col("ship_month") === 3) // prunes to 1/12 of files
        .agg(count(lit(1)).as("n"),
             round(sum(col("l_extendedprice")), 2).as("revenue"))
    }),

    // S7/S8 — append vs overwrite write dispositions (incremental loading)
    "q_append_load" -> ((s, dir) => {
      val path = scratch(dir, "append_load")
      val src = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"))
      Sinks.replaceLoad(src, path)  // full refresh…
      Sinks.appendLoad(src, path)   // …then one incremental append
      s.read.parquet(path)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
    }),

    // Window function with deterministic total order (extension beyond
    // reference parity, oracle-checked as SURVEY §2.7 requires).
    "q_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
                 col("l_linenumber").asc)
      t(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("l_returnflag"), col("rn"), col("l_orderkey"),
                col("l_linenumber"), col("l_extendedprice"))
    }),

    // Tumbling-window hourly rollup over the events table (batch form of
    // the streaming demo, SURVEY §2.9).
    "q_hourly_rollup" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("v"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
                  .as("hour_start"),
                col("n"), col("v")))
  )

  // -------------------------------------------------------------- oracles

  /** DuckDB twins over the same parquet tables (driver resolves bare table
    * names). Aliases/casts mirror the Spark outputs exactly.
    */
  def oracleSql: Map[String, String] = Map(

    "q_flagship_pipeline" ->
      """SELECT time_bucket, n_name AS zone, count(*) AS trips,
        |       round(avg(value), 6) AS avg_fare,
        |       round(sum(value), 4) AS total_fare
        |FROM (
        |  SELECT CASE WHEN date_part('hour', ts) BETWEEN 7 AND 9
        |                THEN 'Morning Rush'
        |              WHEN date_part('hour', ts) BETWEEN 17 AND 19
        |                THEN 'Evening Rush'
        |              ELSE 'Other' END AS time_bucket,
        |         value, user_id % 25 AS zone_key
        |  FROM (SELECT DISTINCT * FROM events
        |        WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |          AND user_id IS NOT NULL AND event_type IS NOT NULL
        |          AND value IS NOT NULL AND props IS NOT NULL)
        |) e LEFT JOIN nation ON e.zone_key = nation.n_nationkey
        |GROUP BY time_bucket, n_name""".stripMargin,

    "q_dropna" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |  AND user_id IS NOT NULL AND event_type IS NOT NULL
        |  AND value IS NOT NULL AND props IS NOT NULL""".stripMargin,

    "q_dedup_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",

    "q_derive_month" ->
      """SELECT CAST(date_part('month', ts) AS INTEGER) AS pickup_month,
        |       count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,

    "q_time_bucket" ->
      """SELECT CASE WHEN date_part('hour', ts) BETWEEN 7 AND 9
        |              THEN 'Morning Rush'
        |            WHEN date_part('hour', ts) BETWEEN 17 AND 19
        |              THEN 'Evening Rush'
        |            ELSE 'Other' END AS time_bucket,
        |       count(*) AS n, round(avg(value), 6) AS avg_fare
        |FROM events GROUP BY 1""".stripMargin,

    "q_hour_filter" ->
      """SELECT count(*) AS morning_rows FROM events
        |WHERE date_part('hour', ts) BETWEEN 7 AND 9""".stripMargin,

    "q_legacy_etl" ->
      """SELECT doc_id, source AS sponsoring_organization, lang,
        |       '2025-08-29' AS date_added
        |FROM documents WHERE lang = 'en'""".stripMargin,

    "q_drop_col" ->
      "SELECT doc_id, lang, source FROM documents",

    "q_quality_nulls" ->
      """SELECT count(*) AS null_violations FROM events
        |WHERE ts IS NULL OR value IS NULL""".stripMargin,

    "q_row_count" ->
      "SELECT count(*) AS n FROM lineitem",

    "q_null_matrix" ->
      """SELECT CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS nulls_ts,
        |       CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS nulls_user_id,
        |       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS nulls_value,
        |       CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS nulls_props
        |FROM events""".stripMargin,

    "q_zone_join" ->
      """SELECT r_name, count(*) AS customers,
        |       round(avg(c_acctbal), 6) AS avg_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "q_filter_eq" ->
      """SELECT p_partkey, p_name, p_brand, p_size FROM part
        |WHERE p_brand = 'Brand#1'""".stripMargin,

    "q_csv_roundtrip" ->
      """SELECT count(*) AS n, CAST(sum(event_id) AS BIGINT) AS id_sum,
        |       count(DISTINCT event_type) AS n_types
        |FROM events""".stripMargin,

    "q_partitioned_write" ->
      """SELECT count(*) AS n, round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem WHERE date_part('month', l_shipdate) = 3""".stripMargin,

    "q_append_load" ->
      """SELECT o_orderstatus, CAST(count(*) * 2 AS BIGINT) AS n
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q_topk_per_group" ->
      """SELECT l_returnflag, rn, l_orderkey, l_linenumber, l_extendedprice
        |FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |         CAST(row_number() OVER (
        |           PARTITION BY l_returnflag
        |           ORDER BY l_extendedprice DESC, l_orderkey ASC,
        |                    l_linenumber ASC) AS INTEGER) AS rn
        |  FROM lineitem)
        |WHERE rn <= 3""".stripMargin,

    "q_hourly_rollup" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
        |         AS hour_start,
        |       count(*) AS n, round(sum(value), 4) AS v
        |FROM events GROUP BY 1""".stripMargin
  )
}
