package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.StringDistance

/** Entity resolution by blocked fuzzy matching — the record-linkage
  * staple (variant spellings of the same real-world entity: "cold
  * widget" / "old widget"). The classic two-phase shape:
  *
  *  1. BLOCK: a cheap deterministic key buckets candidates (default:
  *     lowercased last whitespace token — "same head noun, variant
  *     qualifier"). Blocking is the recall/cost dial: pairs in
  *     different blocks are never compared BY DESIGN (at corpus scale
  *     an unblocked fuzzy join is n² string comparisons; the key
  *     bounds the quadratic to Σ block², the SemDeDup/LSH-bucket
  *     argument).
  *  2. VERIFY: native codegen'd Jaro–Winkler (DuckDB-identical
  *     semantics, so the whole operator is oracle-checkable) on the
  *     blocked pairs, keep rounded jw ≥ tau.
  *
  * Runs on the DISTINCT name strings (entity resolution is a property
  * of the string domain, not the row count — dedupe the corpus's
  * billions of rows down to its distinct entities FIRST, then map the
  * match table back), so the join input is vocabulary-sized.
  */
object FuzzyMatch {

  /** Canonical blocking key: lowercased last whitespace token. */
  def lastTokenBlock(c: Column): Column =
    lower(element_at(split(c, " "), -1))

  /** Undirected fuzzy match pairs over one table's distinct names:
    * (name_a < name_b, rounded jw ≥ tau), compared only within a block.
    */
  def fuzzyPairs(df: DataFrame, nameCol: String, tau: Double,
                 blockKey: Column => Column = lastTokenBlock)
      : DataFrame = {
    require(tau >= 0.0 && tau <= 1.0, s"tau in [0,1], got $tau")
    val names = df.select(col(nameCol).as("name"))
      .filter(col("name").isNotNull).distinct()
      .select(col("name"), blockKey(col("name")).as("blk"))
    val a = names.select(col("name").as("name_a"), col("blk"))
    val b = names.select(col("name").as("name_b"), col("blk"))
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("jw", round(
        StringDistance.jaroWinkler(col("name_a"), col("name_b")), 6))
      .filter(col("jw") >= tau)
      .select(col("name_a"), col("name_b"), col("jw"))
  }
}
