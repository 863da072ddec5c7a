package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the LATEST right row
  * with `rightTs ≤ leftTs` within the same key — the canonical
  * market-data / feature-store lookup Spark lacks as a built-in.
  *
  * Implementation is the scalable union-sort-carry composition, not a
  * windowed theta-join: tag both inputs, union them, sort each key's
  * timeline once, and carry the last-seen right payload forward
  * (`last(_, ignoreNulls)` over an unbounded-preceding row frame). One
  * shuffle + one sort over |L|+|R| rows, versus the naive
  * join-then-rank which materializes |L|×|R per key| intermediates —
  * the difference between linear and quadratic when a hot key holds
  * millions of quotes.
  *
  * Determinism: right rows that share a timestamp are ordered by
  * `rightTiebreak` ascending, so the carried payload is the max-tiebreak
  * quote; right rows sort before left rows at the same timestamp
  * (inclusive ≤ semantics).
  *
  * Output = every left column plus the matched right row's columns,
  * MINUS the right copy of the join key (the two agree on every matched
  * row; emitting both made any later by-name reference
  * AMBIGUOUS_REFERENCE). Any OTHER name shared by both sides is
  * rejected up front: silently preferring the left copy would vanish
  * the matched quote's value (e.g. both frames carrying a 'ts' payload
  * column), and emitting both copies positionally is a trap for every
  * by-name consumer — rename before joining, as pandas merge_asof's
  * suffixes force explicitly.
  */
object AsOfJoin {

  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightTiebreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightCols = right.columns.toSeq
    val clashes = rightCols.filter(leftCols.contains).filterNot(_ == key)
    require(clashes.isEmpty,
      s"asofJoin: right columns ${clashes.mkString(", ")} collide with " +
        "left columns; rename them before joining (only the join key " +
        s"'$key' may be shared)")
    val leftStruct = org.apache.spark.sql.types.StructType(
      leftCols.map(left.schema(_)))
    val rightStruct = org.apache.spark.sql.types.StructType(
      rightCols.map(right.schema(_)))

    // SQL as-of semantics: a NULL key or NULL timestamp never matches —
    // drop such right rows (a null-ts quote would otherwise sort
    // nulls-first and be carried into early probes). Left rows with null
    // key/ts fall out naturally: their partition holds no quotes / they
    // sort before every quote, so the carried payload is null.
    val taggedLeft = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__side"),
      lit(null).cast(rightStruct).as("__quote"),
      struct(leftCols.map(col): _*).as("__probe"))
    val taggedRight = right
      .filter(col(key).isNotNull && col(rightTs).isNotNull)
      .select(
        col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
        struct(rightCols.map(col): _*).as("__quote"),
        lit(null).cast(leftStruct).as("__probe"))

    // quotes (side 0) sort before probes (side 1) at equal ts → inclusive;
    // equal-ts quotes resolve by tiebreak ascending so `last` is the max
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__side").asc,
               col("__quote").getField(rightTiebreak).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)

    taggedLeft.unionByName(taggedRight)
      .withColumn("__carried", last(col("__quote"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col("__probe").getField(c).as(c)) ++
        rightCols.filterNot(_ == key)
          .map(c => col("__carried").getField(c).as(c)): _*)
  }
}
