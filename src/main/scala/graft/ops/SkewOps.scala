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
    * The salt mixes the whole fact row with a per-partition-disambiguated
    * row id: row-content alone would give EXACT-DUPLICATE rows of a hot
    * key the same salt — and duplicate-heavy hot keys (retried/replayed
    * log events) are precisely the common real-world skew shape, which a
    * content-only salt silently fails to spread. The join RESULT is salt-
    * invariant (the dim side carries every salt), so the id's run-to-run
    * instability is confined to which reducer a row lands on — the thing
    * salting exists to randomize.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 n: Int = 8): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id() +:
                      fact.columns.map(col): _*), lit(n)).cast("int"))
    val salts = explode(sequence(lit(0), lit(n - 1)))
    val saltedDim = dim.withColumn("__salt", salts)
    saltedFact
      .join(saltedDim, Seq(key, "__salt"), "inner")
      .drop("__salt")
  }
}
