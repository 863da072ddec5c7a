package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's runtime data-quality gates as first-class values
  * (SURVEY.md §5 item 2). The reference `raise`s inside Airflow task
  * callables (dags/nyc_taxi_pipeline_dag.py:188-201); here a failed gate is
  * a `Left(QualityError)` so pipelines can compose checks without
  * exceptions-as-control-flow.
  *
  * Each check costs exactly one aggregation job over the frame; checks never
  * collect row data to the driver, only the already-scalar aggregate.
  */
final case class QualityError(check: String, detail: String)

object Quality {

  /** A1 — fail if the table is empty.
    * Ref: dags/nyc_taxi_pipeline_dag.py:188-192 ("No data found in table").
    */
  def requireNonEmpty(df: DataFrame): Either[QualityError, DataFrame] = {
    // limit(1) before the count: existence, not a full scan.
    val any = df.limit(1).count()
    if (any > 0) Right(df)
    else Left(QualityError("non_empty", "No data found in table!"))
  }

  /** A2/P8 — fail if any key column holds a NULL.
    * Ref: dags/nyc_taxi_pipeline_dag.py:195-201 ("rows with NULL values in
    * key fields").
    */
  def requireNoNulls(df: DataFrame,
                     cols: Seq[String]): Either[QualityError, DataFrame] = {
    val anyNull = cols.map(c => col(c).isNull).reduce(_ || _)
    val bad = df.filter(anyNull).limit(1).count()
    if (bad == 0) Right(df)
    else Left(QualityError("no_nulls", s"NULL values in key fields: ${cols.mkString(",")}"))
  }

  /** A3 — warn-level null census; never fails (the reference only logs it,
    * dags/nyc_taxi_pipeline_dag.py:95-96). Returns (columnName -> nullCount).
    */
  def nullCensus(df: DataFrame): Map[String, Long] = {
    // coalesce: sum() over ZERO rows is NULL, and getLong on it throws —
    // the census must return all-zeros on an empty table, which is
    // exactly when a quality check is most likely to be consulted
    val exprs = df.columns.map(c =>
      coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(c))
    val row = df.agg(exprs.head, exprs.tail: _*).head()
    df.columns.zipWithIndex.map { case (c, i) => c -> row.getLong(i) }.toMap
  }
}
