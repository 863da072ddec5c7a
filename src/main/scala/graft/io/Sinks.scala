package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The reference's source/sink surface (SURVEY.md §2.1), modeled as
  * parquet/CSV in this env (no Postgres/BigQuery network): write
  * dispositions append/overwrite (S7/S8/S10), single-file CSV handoff
  * (S5→S3/S4), partitioned parquet (S6).
  */
object Sinks {

  /** Scratch root for sink round-trip queries. Absolute (driver may invoke
    * from any cwd) and inside the repo per the env contract.
    */
  val scratchRoot = "/root/repo/target/scratch"

  /** S5 — single-file CSV sink with header, overwrite.
    * Ref: spark-apps/clean_nyc_taxi_pipeline.py:19
    * (`coalesce(1).write...csv`). `coalesce(1)` narrows only the final
    * write task (README.md:112-113 rationale: one exchange file for the
    * downstream pandas loader); upstream stages keep full parallelism.
    * Timestamp format pinned so the S3 re-read is lossless to the second.
    */
  def writeSingleCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1)
      .write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(path)

  /** S3/S4 — CSV scan with declared schema; unparseable timestamps coerce
    * to NULL, matching `pd.to_datetime(errors="coerce")`
    * (dags/nyc_taxi_pipeline_dag.py:91-92). Spark reads the whole part-file
    * directory natively (the reference globs, :16,66-68), and partitioned
    * reading subsumes the 100k-row chunking (:70-75).
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .option("mode", "PERMISSIVE") // bad cells → null, not error
      .schema(schema)
      .csv(path)

  /** S10 — schema-inference CSV read (`autodetect=True`,
    * dags/nyc_taxi_pipeline_dag.py:119,154): header names + inferred
    * column types, no declared StructType. Inference costs one extra pass
    * over the files at read time — the declared-schema `readCsv` is the
    * production path; this is the ad-hoc/autodetect fidelity twin.
    */
  def readCsvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(path)

  /** S6 — partitioned parquet sink (hive-style month dirs).
    * Ref: spark-apps/clean_nyc_taxi_pipeline.py:16 (design intent) +
    * README.md:116-119 (`repartition("year","month")`). Partition-by-month
    * is the reference's substitute for the Postgres B-tree indexes (S9):
    * at 100 TB a month predicate prunes ~97% of files before any IO.
    */
  def writePartitioned(df: DataFrame, partCol: String, path: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(path)

  /** S7/S10/S14 — append disposition (`if_exists="append"` /
    * `WRITE_APPEND`, dags/nyc_taxi_pipeline_dag.py:99,120,157): the
    * "Incremental Loading Mechanism" of README.md:220-222.
    */
  def appendLoad(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** S8 — replace disposition (`if_exists="replace"`,
    * extract_dag.cpython-311.pyc decompiled): full-refresh load.
    */
  def replaceLoad(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** S9 — the engine's answer to the reference's B-tree indexes
    * (`CREATE INDEX … USING BTREE` on the datetime columns,
    * dags/nyc_taxi_pipeline_dag.py:56-58). Spark has no secondary indexes;
    * the equivalent physical design is partition dirs for coarse pruning
    * plus `sortWithinPartitions` on the indexed column so parquet
    * row-group min/max statistics give fine-grained skipping on range
    * predicates — zero lookup structure to maintain, same IO effect.
    */
  def writeSortedPartitioned(df: DataFrame, partCol: String,
                             sortCol: String, path: String): Unit =
    // sort by (partCol, sortCol), not sortCol alone: the partitioned file
    // writer requires partition columns to lead the ordering and would
    // otherwise insert its OWN sort keyed only on partCol — whose
    // stability w.r.t. our sortCol order is not contractual, silently
    // un-sorting rows inside each partition dir and defeating the
    // row-group min/max skipping this layout exists for. Leading with
    // partCol satisfies the writer's requirement, so no second sort.
    df.repartition(col(partCol))
      .sortWithinPartitions(col(partCol), col(sortCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(path)

  /** S13 — console sink (`df.show()`, spark-apps/test_spark.py:13). */
  def console(df: DataFrame, rows: Int = 20): Unit = df.show(rows, false)

  /** The reference's "Incremental Loading Mechanism" (README.md:220-222)
    * done right at scale: idempotent month loads via DYNAMIC partition
    * overwrite — re-running a month replaces exactly that month's
    * partition directory and touches nothing else, so retries and
    * backfills cannot duplicate rows (plain `mode("append")`, the
    * reference's actual disposition, duplicates on retry).
    */
  def upsertPartition(df: DataFrame, partCol: String, path: String): Unit =
    // writer-scoped option: no session-global conf mutation, so a
    // concurrent plain overwrite on the same session keeps its semantics
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(path)
}
