package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension Type 2 history builder: collapse a change
  * stream (key, attrs, ts) into validity intervals — one row per
  * version with [valid_from, valid_to) bounds and a current flag, the
  * warehouse-history shape every dimension table ships with (Kimball
  * SCD2). A new version opens exactly when ANY tracked attribute IS
  * DISTINCT FROM the previous row's for that key (null-safe: null→null
  * is no change, null→value and value→null are changes); consecutive
  * rows with identical attributes collapse into one interval.
  *
  * Physical shape at scale: one narrow projection, one shuffle keyed by
  * the dimension key, two per-key windows (change detection on the full
  * stream, interval close on the filtered version rows) — groups are
  * bounded by per-key history length, there is no global sort and no
  * cross-key state. Rows with a null timestamp are dropped (no position
  * in history); ties on the timestamp order by `tiebreakCol` so reruns
  * are deterministic.
  */
object Scd2 {

  def scd2(changes: DataFrame, keyCols: Seq[String],
           attrCols: Seq[String], tsCol: String,
           tiebreakCol: String): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty,
            "scd2 needs at least one key and one tracked attribute")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tiebreakCol))
    val anyChanged = attrCols
      .map(a => not(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val versions = changes
      .filter(col(tsCol).isNotNull)
      .select((keyCols ++ attrCols).map(col) :+ col(tsCol) :+
              col(tiebreakCol): _*)
      .withColumn("__opens",
        row_number().over(w) === 1 || anyChanged)
      .filter(col("__opens"))
    val w2 = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tiebreakCol))
    versions
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols ++ attrCols).map(col) :+ col("valid_from") :+
              col("valid_to") :+ col("is_current"): _*)
  }
}
