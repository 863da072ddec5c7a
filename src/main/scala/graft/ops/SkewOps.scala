package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is pathological
  * (one zone / one user owning a large fraction of a 100 TB fact table).
  *
  * First line of defense is AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default with AQE) — it
  * needs no code. `saltedJoin` is the explicit fallback for engines or
  * joins AQE can't split (e.g. the build side must stay intact): the fact
  * side gets a deterministic salt in [0, n), the dimension side is
  * replicated n× with every salt value, and the join key becomes
  * (key, salt) — a hot key's rows now land on n reducers instead of one.
  *
  * Cost model: dimension inflates n× (fine for dims; that's the side you
  * replicate), fact rows move once either way. Result is row-identical to
  * the plain join.
  */
object SkewOps {

  /** Inner equi-join of `fact` to `dim` on `key`, salted `n` ways.
    *
    * Salt derivation must be DETERMINISTIC UNDER TASK RETRY: a re-run
    * map task that salts the same row differently than its first attempt
    * can duplicate or drop rows when reducers have already fetched part
    * of the first attempt's output (the SPARK-23207 failure class —
    * exactly why round-robin repartition sorts). So the salt never mixes
    * `monotonically_increasing_id`/`rand` (both attempt-dependent on
    * post-shuffle inputs):
    *
    *  - `rowIdCol = Some(id)`: salt = hash(id). The caller names a
    *    unique row id (most fact tables have one) — retry-stable AND
    *    exact-duplicate rows of a hot key spread across reducers.
    *  - `rowIdCol = None`: salt = hash(whole row) — retry-stable with no
    *    precondition, but EXACT-duplicate rows share a salt. Fine when
    *    duplicates are rare; for duplicate-heavy skew (retried/replayed
    *    log events) supply the id column instead.
    *
    * The join RESULT is salt-invariant either way (the dim side carries
    * every salt value) — the choice only affects reducer placement.
    */
  /** Join-key SKEW DIAGNOSTIC — the measurement that decides between a
    * plain shuffle join, AQE's skew split, and `saltedJoin`: the top-k
    * heaviest keys with their row share and skew factor (key rows ÷
    * mean rows per key; a factor ≫ tasks means one task owns the key's
    * whole shuffle partition). One partial→final count aggregate + a
    * 1-row global census broadcast + TakeOrderedAndProject — the
    * report costs one pass regardless of key cardinality.
    */
  def skewReport(df: DataFrame, key: String, topK: Int = 10): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
    val census = counts.agg(sum(col("n")).as("__total"),
                            count(lit(1)).as("__keys"))
    counts.crossJoin(broadcast(census))
      .select(col(key), col("n"),
              round(col("n").cast("double") / col("__total"), 6)
                .as("share"),
              round(col("n").cast("double") * col("__keys") /
                    col("__total"), 6).as("skew"))
      .orderBy(col("n").desc, col(key).asc)
      .limit(topK)
  }

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 n: Int = 8, rowIdCol: Option[String] = None): DataFrame = {
    // n = 0 would make pmod null on every fact row and the salt
    // sequence step DOWNWARD — an empty join result with no error
    require(n >= 1, s"salt count n must be >= 1 (got $n)")
    val saltSrc = rowIdCol match {
      case Some(id) => xxhash64(col(id))
      case None     => xxhash64(fact.columns.map(col): _*)
    }
    val saltedFact = fact.withColumn("__salt",
      pmod(saltSrc, lit(n)).cast("int"))
    val salts = explode(sequence(lit(0), lit(n - 1)))
    val saltedDim = dim.withColumn("__salt", salts)
    saltedFact
      .join(saltedDim, Seq(key, "__salt"), "inner")
      .drop("__salt")
  }
}
